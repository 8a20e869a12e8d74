package graft.core

/** Decoded Open Location Code cell: half-open box [south,west) .. (north,east). */
final case class CodeArea(south: Double, west: Double, north: Double, east: Double,
                          codeLength: Int) {
  def centerLat: Double = (south + north) / 2.0
  def centerLon: Double = (west + east) / 2.0
  /** Half-open containment test (reference: openlocationcode.d:491-498) —
    * the reference's only point-in-region predicate; generalized by Pip. */
  def contains(lat: Double, lon: Double): Boolean =
    south <= lat && lat < north && west <= lon && lon < east
}

/** Open Location Code (plus code) encode/decode/shorten/recover/validate.
  *
  * Pure Long integer arithmetic per Google's public OLC spec, matching the
  * reference bit-for-bit (reference: source/coordinate/openlocationcode.d).
  * Relaxed mode: invalid inputs return null/None instead of throwing.
  */
object Olc {

  final val Alphabet = "23456789CFGHJMPQRVWX"
  final val Separator = '+'
  final val Padding = '0'
  private final val SeparatorPosition = 8
  private final val Base = 20
  private final val MaxDigits = 15
  private final val PairCodeLength = 10
  private final val GridCodeLength = MaxDigits - PairCodeLength // 5
  private final val GridColumns = 4
  private final val GridRows = 5
  private final val GridRowsMult = 3125L    // 5^5
  private final val GridColsMult = 1024L    // 4^5
  private final val LatIntMult = 8000L * GridRowsMult // 25,000,000
  private final val LonIntMult = 8000L * GridColsMult // 8,192,000
  private final val LatMsp = LatIntMult * 400L
  private final val LonMsp = LonIntMult * 400L

  private def digitValue(c: Char): Int = Alphabet.indexOf(Character.toUpperCase(c))

  private def clipLatitude(lat: Double): Double = math.min(math.max(lat, -90.0), 90.0)

  private def normalizeLongitude(lon0: Double): Double = {
    var lon = lon0
    while (lon < -180.0) lon += 360.0
    while (lon >= 180.0) lon -= 360.0
    lon
  }

  /** Latitude precision in degrees for a code length
    * (openlocationcode.d:183-189). */
  def computeLatitudePrecision(codeLength: Int): Double =
    if (codeLength <= PairCodeLength) math.pow(Base, codeLength / -2.0 + 2)
    else math.pow(Base, -3) / math.pow(GridRows, codeLength - PairCodeLength)

  /** Encode to a plus code of `codeLength` significant digits (2..15).
    * Null on illegal code length (odd < 10 or < 2). */
  def encode(latitude0: Double, longitude0: Double, codeLength0: Int): String = {
    val codeLength = math.min(codeLength0, MaxDigits)
    if (codeLength < 2 || (codeLength < PairCodeLength && codeLength % 2 == 1)) return null
    var latitude = clipLatitude(latitude0)
    val longitude = normalizeLongitude(longitude0)
    if (latitude == 90.0) latitude -= 0.9 * computeLatitudePrecision(codeLength)

    // Degrees -> scaled Long; the 1e6 round/unscale dance matches the
    // reference exactly (openlocationcode.d:210-211) for bit parity.
    var latVal = (math.round((latitude + 90.0) * LatIntMult * 1e6).toDouble / 1e6).toLong
    var lonVal = (math.round((longitude + 180.0) * LonIntMult * 1e6).toDouble / 1e6).toLong

    val code = new java.lang.StringBuilder(MaxDigits + 1)
    if (codeLength > PairCodeLength) {
      var i = 0
      while (i < GridCodeLength) {
        val latDigit = (latVal % GridRows).toInt
        val lonDigit = (lonVal % GridColumns).toInt
        code.append(Alphabet.charAt(latDigit * GridColumns + lonDigit))
        latVal /= GridRows
        lonVal /= GridColumns
        i += 1
      }
    } else {
      latVal /= GridRowsMult
      lonVal /= GridColsMult
    }
    var i = 0
    while (i < PairCodeLength / 2) {
      code.append(Alphabet.charAt((lonVal % Base).toInt))
      code.append(Alphabet.charAt((latVal % Base).toInt))
      latVal /= Base
      lonVal /= Base
      if (i == 0) code.append(Separator)
      i += 1
    }
    code.reverse()
    var out = code.toString
    if (codeLength < SeparatorPosition) {
      val sb = new java.lang.StringBuilder(out.substring(0, codeLength))
      var j = codeLength
      while (j < SeparatorPosition) { sb.append(Padding); j += 1 }
      sb.append(Separator)
      out = sb.toString
    }
    out.substring(0, math.max(SeparatorPosition + 1, codeLength + 1))
  }

  def encode(latitude: Double, longitude: Double): String =
    encode(latitude, longitude, PairCodeLength)

  /** Strip separator + padding, upper-case (openlocationcode.d:162-172). */
  private def trimCode(code: String): String = {
    val sb = new java.lang.StringBuilder(code.length)
    var i = 0
    while (i < code.length) {
      val c = code.charAt(i)
      if (c != Separator) sb.append(Character.toUpperCase(c))
      i += 1
    }
    val s = sb.toString
    val p = s.indexOf(Padding)
    if (p > 0) s.substring(0, p) else s
  }

  /** Decode a full code to its cell. None when not a valid full code. */
  def decode(code: String): Option[CodeArea] = {
    if (!isFull(code)) return None
    val digits = trimCode(code)
    var latVal = -90L * LatIntMult
    var lonVal = -180L * LonIntMult
    var latPlace = LatMsp
    var lonPlace = LonMsp
    val pairPart = math.min(digits.length, PairCodeLength)
    val codeLength = math.min(digits.length, MaxDigits)
    var i = 0
    while (i < pairPart) {
      latPlace /= Base
      lonPlace /= Base
      latVal += digitValue(digits.charAt(i)) * latPlace
      lonVal += digitValue(digits.charAt(i + 1)) * lonPlace
      i += 2
    }
    i = PairCodeLength
    while (i < codeLength) {
      latPlace /= GridRows
      lonPlace /= GridColumns
      val digit = digitValue(digits.charAt(i))
      latVal += (digit / GridColumns) * latPlace
      lonVal += (digit % GridColumns) * lonPlace
      i += 1
    }
    Some(CodeArea(
      latVal.toDouble / LatIntMult,
      lonVal.toDouble / LonIntMult,
      (latVal + latPlace).toDouble / LatIntMult,
      (lonVal + lonPlace).toDouble / LonIntMult,
      codeLength))
  }

  /** Remove 2/4/6/8 leading digits given a nearby reference point; None when
    * the reference is too far or the code is short/padded. */
  def shorten(code: String, refLat: Double, refLon: Double): Option[String] = {
    if (!isFull(code) || isPadded(code)) return None
    decode(code).flatMap { area =>
      val range = math.max(
        math.abs(refLat - area.centerLat),
        math.abs(refLon - area.centerLon))
      var i = 4
      while (i >= 1) {
        if (range < computeLatitudePrecision(i * 2) * 0.3)
          return Some(code.substring(i * 2))
        i -= 1
      }
      None
    }
  }

  /** Recover the nearest full code to a reference point. None on invalid
    * short code. Mirrors openlocationcode.d:327-357 including the pole clamp. */
  def recoverNearest(shortCode: String, refLat0: Double, refLon0: Double): Option[String] = {
    if (!isShort(shortCode)) return if (isFull(shortCode)) Some(shortCode.toUpperCase) else None
    val refLat = clipLatitude(refLat0)
    val refLon = normalizeLongitude(refLon0)
    val digitsToRecover = SeparatorPosition - shortCode.indexOf(Separator)
    val prefixPrecision = math.pow(Base, 2 - digitsToRecover / 2.0)
    val recoveredPrefix = encode(refLat, refLon).substring(0, digitsToRecover)
    val recovered = recoveredPrefix + shortCode
    val areaOpt = decode(recovered)
    if (areaOpt.isEmpty) return None
    val area = areaOpt.get
    var recLat = area.centerLat
    var recLon = area.centerLon
    val latDiff = recLat - refLat
    if (latDiff > prefixPrecision / 2 && recLat - prefixPrecision > -90.0) recLat -= prefixPrecision
    else if (latDiff < -prefixPrecision / 2 && recLat + prefixPrecision < 90.0) recLat += prefixPrecision
    val lonDiff = area.centerLon - refLon
    if (lonDiff > prefixPrecision / 2) recLon -= prefixPrecision
    else if (lonDiff < -prefixPrecision / 2) recLon += prefixPrecision
    Some(encode(recLat, recLon, trimCode(recovered).length))
  }

  /** Full validity grammar (openlocationcode.d:364-406). */
  def isValid(code: String): Boolean = {
    if (code == null || code.length < 2) return false
    val separatorIndex = code.indexOf(Separator)
    if (separatorIndex == -1) return false
    if (code.indexOf(Separator, separatorIndex + 1) != -1) return false
    if (separatorIndex % 2 != 0 || separatorIndex > SeparatorPosition) return false
    if (separatorIndex == SeparatorPosition) {
      if (digitValue(code.charAt(0)) > 8) return false   // first lat digit <= 8
      if (digitValue(code.charAt(1)) > 17) return false  // first lon digit <= 17
    }
    var paddingStarted = false
    var i = 0
    while (i < separatorIndex) {
      val c = code.charAt(i)
      if (paddingStarted) {
        if (c != Padding) return false
      } else if (c == Padding) {
        paddingStarted = true
        if (separatorIndex < SeparatorPosition) return false // short codes can't pad
        if (i != 2 && i != 4 && i != 6) return false
      } else if (digitValue(c) == -1) return false
      i += 1
    }
    if (code.length > separatorIndex + 1) {
      if (paddingStarted) return false
      if (code.length == separatorIndex + 2) return false // exactly one digit after '+'
      i = separatorIndex + 1
      while (i < code.length) {
        if (digitValue(code.charAt(i)) == -1) return false
        i += 1
      }
    }
    true
  }

  def isShort(code: String): Boolean =
    isValid(code) && code.indexOf(Separator) < SeparatorPosition

  def isFull(code: String): Boolean =
    isValid(code) && code.indexOf(Separator) == SeparatorPosition

  def isPadded(code: String): Boolean =
    isValid(code) && code.indexOf(Padding) >= 0
}
