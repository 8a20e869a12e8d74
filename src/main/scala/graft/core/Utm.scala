package graft.core

import GeoMath._

/** UTM coordinate (zone 1..60, hemisphere 'N'/'S', easting/northing metres). */
final case class UtmCoord(zone: Int, hemisphere: Char, easting: Double, northing: Double,
                          convergence: Double = Double.NaN, scale: Double = Double.NaN)

/** MGRS grid reference: zone, lat band C..X, 100km square letters, offsets
  * within the square. */
final case class MgrsCoord(zone: Int, band: Char, e100k: Char, n100k: Char,
                           easting: Double, northing: Double)

/** WGS84 (or any ellipsoid) <-> UTM via Karney's method, Krüger series to
  * order n^6 (Karney 2011, public). The reference implements the same method
  * but all series coefficients collapse to zero through D integer division
  * (reference: source/coordinate/conv.d:50, 183-189 — quirk Q2), and its
  * Norway/Svalbard zone exceptions are dead code through a case mismatch
  * (conv.d:154-161 vs utm.d:33 — quirk Q3). We implement the correct float
  * coefficients and live exception rules; `compat = true` reproduces the
  * reference's Gauss-Schreiber behavior for parity testing.
  */
object Utm {

  final val K0 = 0.9996
  final val FalseEasting = 500e3
  final val FalseNorthing = 10000e3
  /** Latitude bands C..X (8° each, 80°S..84°N; X repeated for 80-84°N). */
  final val MgrsBands = "CDEFGHJKLMNPQRSTUVWXX"
  /** 100km column letters, repeating every 3rd zone (utm.d:36). */
  final val E100kLetters = Array("ABCDEFGH", "JKLMNPQR", "STUVWXYZ")
  /** 100km row letters, repeating every other zone (utm.d:39). */
  final val N100kLetters = Array("ABCDEFGHJKLMNPQRSTUV", "FGHJKLMNPQRSTUVABCDE")

  /** MGRS latitude band for a latitude; '?' when out of -80..84. */
  def latBand(lat: Double): Char = {
    val idx = math.floor(lat / 8.0 + 10.0).toInt
    if (idx < 0 || idx >= MgrsBands.length) '?' else MgrsBands.charAt(idx)
  }

  /** Hemisphere from a band letter: band >= 'N' is north (utm.d:118). */
  def bandToHemisphere(band: Char): Char =
    if (Character.toUpperCase(band) >= 'N') 'N' else 'S'

  /** UTM longitudinal zone for a lon/lat incl. Norway/Svalbard exceptions. */
  def zoneFor(lat: Double, lon: Double): Int = {
    var zone = (math.floor((lon + 180.0) / 6.0) + 1.0).toInt
    if (zone > 60) zone = 60 // lon == +180 wraps into zone 60
    val band = latBand(lat)
    if (zone == 31 && band == 'V' && lon >= 3) zone += 1
    if (zone == 32 && band == 'X' && lon < 9) zone -= 1
    if (zone == 32 && band == 'X' && lon >= 9) zone += 1
    if (zone == 34 && band == 'X' && lon < 21) zone -= 1
    if (zone == 34 && band == 'X' && lon >= 21) zone += 1
    if (zone == 36 && band == 'X' && lon < 33) zone -= 1
    if (zone == 36 && band == 'X' && lon >= 33) zone += 1
    zone
  }

  private[graft] def kruegerAlpha(n: Double): Array[Double] = {
    val n2 = n * n; val n3 = n * n2; val n4 = n * n3; val n5 = n * n4; val n6 = n * n5
    Array(0.0,
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
  }

  private[graft] def kruegerBeta(n: Double): Array[Double] = {
    val n2 = n * n; val n3 = n * n2; val n4 = n * n3; val n5 = n * n4; val n6 = n * n5
    Array(0.0,
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
  }

  /** Geographic -> UTM. Null outside the UTM latitude domain [-80, 84] in
    * strict terms is not enforced — callers get the projected value anyway;
    * invalid lat/lon (NaN, |lat|>90) yields null at the expression layer. */
  def geoToUtm(lat: Double, lon: Double, a: Double, f: Double,
               compat: Boolean = false): UtmCoord = {
    val zone = zoneFor(lat, lon)
    val lambda0 = toRadians((zone - 1) * 6.0 - 180.0 + 3.0)

    val phi = toRadians(lat)
    val lambda = toRadians(lon) - lambda0

    val e = math.sqrt(f * (2.0 - f))
    val n = f / (2.0 - f)
    val alpha = if (compat) Array.fill(7)(0.0) else kruegerAlpha(n)
    val bigA =
      if (compat) a / (1.0 + n)
      else {
        val n2 = n * n; val n4 = n2 * n2; val n6 = n4 * n2
        a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
      }

    val clambda = math.cos(lambda); val slambda = math.sin(lambda); val tlambda = math.tan(lambda)
    val tau = math.tan(phi)
    val sigma = math.sinh(e * atanh(e * tau / math.sqrt(1.0 + tau * tau)))
    val tauP = tau * math.sqrt(1.0 + sigma * sigma) - sigma * math.sqrt(1.0 + tau * tau)
    val zetaP = math.atan2(tauP, clambda)
    val etaP = asinh(slambda / math.sqrt(tauP * tauP + clambda * clambda))

    var zeta = zetaP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      zeta += alpha(j) * math.sin(2.0 * j * zetaP) * math.cosh(2.0 * j * etaP)
      eta += alpha(j) * math.cos(2.0 * j * zetaP) * math.sinh(2.0 * j * etaP)
      j += 1
    }

    var x = K0 * bigA * eta
    var y = K0 * bigA * zeta

    // convergence + scale (Karney 2011 Eq 23-25)
    var p = 1.0; var q = 0.0
    j = 1
    while (j <= 6) {
      p += 2.0 * j * alpha(j) * math.cos(2.0 * j * zetaP) * math.cosh(2.0 * j * etaP)
      q += 2.0 * j * alpha(j) * math.sin(2.0 * j * zetaP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    val gamma = math.atan(tauP / math.sqrt(1.0 + tauP * tauP) * tlambda) + math.atan2(q, p)
    val sphi = math.sin(phi)
    val k = K0 *
      (math.sqrt(1.0 - e * e * sphi * sphi) * math.sqrt(1.0 + tau * tau) /
        math.sqrt(tauP * tauP + clambda * clambda)) *
      (bigA / a * math.sqrt(p * p + q * q))

    x += FalseEasting
    if (y < 0) y += FalseNorthing
    val hemisphere = if (lat >= 0) 'N' else 'S'
    UtmCoord(zone, hemisphere, x, y, toDegrees(gamma), k)
  }

  /** UTM -> geographic. Returns Array(lat, lon, convergence, scale); null on
    * zone out of range. Newton iteration on tau to 1e-12 (Karney 2011). */
  def utmToGeo(zone: Int, hemisphere: Char, easting: Double, northing: Double,
               a: Double, f: Double, compat: Boolean = false): Array[Double] = {
    if (zone < 1 || zone > 60) return null
    val south = Character.toUpperCase(hemisphere) == 'S'
    val x = easting - FalseEasting
    val y = if (south) northing - FalseNorthing else northing

    val e = math.sqrt(f * (2.0 - f))
    val n = f / (2.0 - f)
    val beta = if (compat) Array.fill(7)(0.0) else kruegerBeta(n)
    val bigA =
      if (compat) a / (1.0 + n)
      else {
        val n2 = n * n; val n4 = n2 * n2; val n6 = n4 * n2
        a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
      }

    val eta = x / (K0 * bigA)
    val zeta = y / (K0 * bigA)

    var zetaP = zeta
    var etaP = eta
    var j = 1
    while (j <= 6) {
      zetaP -= beta(j) * math.sin(2.0 * j * zeta) * math.cosh(2.0 * j * eta)
      etaP -= beta(j) * math.cos(2.0 * j * zeta) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val sinhEtaP = math.sinh(etaP)
    val szetaP = math.sin(zetaP); val czetaP = math.cos(zetaP)
    val tauP = szetaP / math.sqrt(sinhEtaP * sinhEtaP + czetaP * czetaP)

    var tauI = tauP
    var dTauI = 0.0
    do {
      val sigmaI = math.sinh(e * atanh(e * tauI / math.sqrt(1.0 + tauI * tauI)))
      val tauIp = tauI * math.sqrt(1.0 + sigmaI * sigmaI) - sigmaI * math.sqrt(1.0 + tauI * tauI)
      dTauI = (tauP - tauIp) / math.sqrt(1.0 + tauIp * tauIp) *
        (1.0 + (1.0 - e * e) * tauIp * tauIp) / ((1.0 - e * e) * math.sqrt(1.0 + tauIp * tauIp))
      tauI += dTauI
    } while (math.abs(dTauI) > 1e-12)

    val phi = math.atan(tauI)
    var lambda = math.atan2(sinhEtaP, czetaP)
    val lambda0 = toRadians((zone - 1) * 6.0 - 180.0 + 3.0)
    lambda += lambda0

    var p = 1.0; var q = 0.0
    j = 1
    while (j <= 6) {
      p -= 2.0 * j * beta(j) * math.cos(2.0 * j * zeta) * math.cosh(2.0 * j * eta)
      q += 2.0 * j * beta(j) * math.sin(2.0 * j * zeta) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val gamma = math.atan(math.tan(zetaP) * math.tanh(etaP)) + math.atan2(q, p)
    val sphi = math.sin(phi)
    val k = K0 *
      (math.sqrt(1.0 - e * e * sphi * sphi) * math.sqrt(1.0 + tauI * tauI) *
        math.sqrt(sinhEtaP * sinhEtaP + czetaP * czetaP)) *
      (bigA / a / math.sqrt(p * p + q * q))

    Array(toDegrees(phi), wrap180(toDegrees(lambda)), toDegrees(gamma), k)
  }

  /** UTM -> MGRS (reference algorithm conv.d:324-346; letter tables are the
    * grid letters the baseline byte-matches). */
  def utmToMgrs(zone: Int, hemisphere: Char, easting: Double, northing: Double,
                a: Double, f: Double): MgrsCoord = {
    val geo = utmToGeo(zone, hemisphere, easting, northing, a, f)
    if (geo == null) return null
    val band = latBand(geo(0))
    val col = math.floor(easting / 100e3).toInt
    if (col < 1 || col > 8) return null
    val e100k = E100kLetters((zone - 1) % 3).charAt(col - 1)
    val row = (math.floor(northing / 100e3) % 20).toInt
    if (row < 0 || row > 19) return null
    val n100k = N100kLetters((zone - 1) % 2).charAt(row)
    MgrsCoord(zone, band, e100k, n100k, easting % 100e3, northing % 100e3)
  }

  /** MGRS -> UTM (reference algorithm conv.d:292-315): find the 2,000km block
    * by walking up from the band's bottom northing. */
  def mgrsToUtm(zone: Int, band0: Char, e100k0: Char, n100k0: Char,
                easting: Double, northing: Double,
                a: Double, f: Double): UtmCoord = {
    val band = Character.toUpperCase(band0)
    val e100k = Character.toUpperCase(e100k0)
    val n100k = Character.toUpperCase(n100k0)
    if (zone < 1 || zone > 60) return null
    val hemisphere = bandToHemisphere(band)
    val colIdx = E100kLetters((zone - 1) % 3).indexOf(e100k)
    if (colIdx < 0) return null
    val col = colIdx + 1 // eastings start at 166km due to the 500km false origin
    val e100kNum = col * 100e3
    val row = N100kLetters((zone - 1) % 2).indexOf(n100k)
    if (row < 0) return null
    val n100kNum = row * 100e3
    val bandIdx = MgrsBands.indexOf(band)
    if (bandIdx < 0) return null
    val latBandDeg = (bandIdx - 10) * 8.0
    // northing of the bottom of the band, snapped down to a whole 100km square
    val nBand = math.floor(geoToUtm(latBandDeg, 3.0, a, f).northing / 100e3) * 100e3
    var n2M = 0.0 // 100km row letters repeat every 2,000km
    while (n2M + n100kNum + northing < nBand) n2M += 2000e3
    UtmCoord(zone, hemisphere, e100kNum + easting, n2M + n100kNum + northing)
  }
}
