package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Pure-kernel tests: reference golden fixtures (bit-exact classes) +
  * reference unit vectors + independent public vectors. No Spark needed. */
class CoreKernelSpec extends AnyFunSuite {

  private def fixtureLines(name: String): Seq[Array[String]] = {
    val src = scala.io.Source.fromFile(s"/root/reference/test_data/$name", "UTF-8")
    try src.getLines().filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split(",", -1)).toVector
    finally src.close()
  }

  // ---- GeoMath ----------------------------------------------------------

  test("wrap functions match reference semantics and fix Q7") {
    assert(GeoMath.wrap360(240.0) == 240.0)
    assert(GeoMath.wrap360(-1.0) == 359.0)
    assert(GeoMath.wrap360(361.0) == 1.0)
    assert(GeoMath.wrap180(170.0) == 170.0)
    assert(GeoMath.wrap180(-181.0) == 179.0)
    assert(GeoMath.wrap180(181.0) == -179.0)
    assert(GeoMath.wrap90(45.0) == 45.0)
    assert(GeoMath.wrap90(91.0) == 89.0)
    assert(GeoMath.wrap90(-91.0) == -89.0)
    assert(GeoMath.wrap90(-315.0) == 45.0) // reference's own formula fails here (Q7)
    assert(GeoMath.roundTo(1.123456789, 5) == 1.12346)
  }

  test("quirk compat: Q7 wrap90 formula reproduces the reference's bug") {
    assert(GeoMath.wrap90Compat(91.0) == 89.0)   // works in the simple range
    assert(GeoMath.wrap90Compat(-315.0) == 135.0) // broken (out of [-90,90]) — Q7
    assert(GeoMath.wrap90(-315.0) == 45.0)        // correct mode fixes it
  }

  test("quirk compat: Q2 zeroed Krueger series = Gauss-Schreiber TM") {
    val a = 6378137.0; val f = 1 / 298.257223563
    val correct = Utm.geoToUtm(52.2, 0.12, a, f)
    val compat = Utm.geoToUtm(52.2, 0.12, a, f, compat = true)
    // D integer division zeroes every series coefficient (conv.d:50,183-189):
    // metre-level divergence from the correct projection, same zone/hemisphere
    assert(compat.zone == correct.zone && compat.hemisphere == correct.hemisphere)
    val dE = math.abs(compat.easting - correct.easting)
    val dN = math.abs(compat.northing - correct.northing)
    assert(dE + dN > 10 && dE + dN < 20000, s"dE=$dE dN=$dN")
    // compat round-trips against itself (same zeroed series both ways)
    val g = Utm.utmToGeo(compat.zone, compat.hemisphere, compat.easting,
      compat.northing, a, f, compat = true)
    assert(math.abs(g(0) - 52.2) < 1e-9 && math.abs(g(1) - 0.12) < 1e-9)
  }

  // ---- Registry ---------------------------------------------------------

  test("registry loads EPSG data, WGS84 constants correct") {
    assert(Registry.ellipsoids.size >= 50)
    assert(Registry.datums.size >= 400)
    val wgs = Registry.wgs84
    assert(wgs.a == 6378137.0)
    assert(math.abs(wgs.invF - 298.257223563) < 1e-9)
    assert(math.abs(wgs.e2 - 0.00669437999014) < 1e-12)
    assert(Registry.wgs84Datum.shortName == "wgs84" || Registry.wgs84Datum.epsg == 6326L)
    assert(Registry.resolveDatum("wgs84").exists(_.epsg == 6326L))
    assert(Registry.resolveDatum("epsg:6326").exists(_.epsg == 6326L))
    assert(Registry.helmert7.nonEmpty && Registry.helmert3.size >= 250)
  }

  // ---- Geohash ----------------------------------------------------------

  test("geohash encode/decode canonical vectors") {
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(52.205, 0.119, 7) == "u120fxw")
    val c = Geohash.decode("u120fxw")
    assert(math.abs(c(0) - 52.205) < 0.001 && math.abs(c(1) - 0.119) < 0.001)
    val b = Geohash.bounds("u120fxw")
    assert(b(0) <= 52.205 && 52.205 <= b(2) && b(1) <= 0.119 && 0.119 <= b(3))
  }

  test("geohash adjacency matches reference asserts") {
    assert(Geohash.adjacent("gbsuv", 'n') == "gbsvj") // geohash.d:236-238
    // full 8-neighbour map (geohash.d:258-260), order n, ne, e, se, s, sw, w, nw
    assert(Geohash.neighbours("gbsuv").toSeq ==
      Seq("gbsvj", "gbsvn", "gbsuy", "gbsuw", "gbsut", "gbsus", "gbsuu", "gbsvh"))
    assert(Geohash.adjacent("u120fxw", 'x') == null)
    assert(Geohash.adjacent("", 'n') == null)
  }

  test("geohash round-trip property at several precisions") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val lat = rnd.nextDouble() * 170 - 85
      val lon = rnd.nextDouble() * 360 - 180
      for (p <- Seq(4, 6, 9)) {
        val h = Geohash.encode(lat, lon, p)
        val b = Geohash.bounds(h)
        assert(b(0) <= lat && lat <= b(2) && b(1) <= lon && lon <= b(3),
          s"bounds of $h do not contain ($lat,$lon)")
      }
    }
  }

  // ---- OLC golden fixtures (bit-exact) -----------------------------------

  test("olc encoding fixture byte-exact") {
    for (f <- fixtureLines("olc_encoding.csv")) {
      val lat = f(0).toDouble; val lon = f(1).toDouble
      val len = f(2).toInt; val expected = f(3)
      val got = Olc.encode(lat, lon, len)
      assert(got == expected, s"encode($lat,$lon,$len) = $got, want $expected")
    }
  }

  test("olc decoding fixture at reference tolerance") {
    for (f <- fixtureLines("olc_decoding.csv")) {
      val code = f(0); val len = f(1).toInt
      val area = Olc.decode(code).getOrElse(fail(s"decode($code) failed"))
      assert(area.codeLength == len)
      // reference tolerance: round(11)/round(10) (olc_test.d:47-50); the
      // fixture longitudes are printed at 10 decimals, so lons gate at 10
      assert(GeoMath.roundTo(area.south, 11) == GeoMath.roundTo(f(2).toDouble, 11), s"$code south")
      assert(GeoMath.roundTo(area.west, 10) == GeoMath.roundTo(f(3).toDouble, 10), s"$code west")
      assert(GeoMath.roundTo(area.north, 11) == GeoMath.roundTo(f(4).toDouble, 11), s"$code north")
      assert(GeoMath.roundTo(area.east, 10) == GeoMath.roundTo(f(5).toDouble, 10), s"$code east")
    }
  }

  test("olc shorten/recover fixture") {
    for (f <- fixtureLines("olc_shorten.csv")) {
      val full = f(0); val lat = f(1).toDouble; val lon = f(2).toDouble
      val short = f(3); val typ = f(4)
      if (typ == "B" || typ == "S")
        assert(Olc.shorten(full, lat, lon).contains(short), s"shorten($full) != $short")
      if (typ == "B" || typ == "R")
        assert(Olc.recoverNearest(short, lat, lon).contains(full),
          s"recover($short) != $full")
    }
  }

  test("olc validity fixture (enabled; reference had it commented out)") {
    for (f <- fixtureLines("olc_valid.csv")) {
      val code = f(0)
      assert(Olc.isValid(code) == f(1).toBoolean, s"isValid($code)")
      assert(Olc.isShort(code) == f(2).toBoolean, s"isShort($code)")
      assert(Olc.isFull(code) == f(3).toBoolean, s"isFull($code)")
    }
  }

  test("olc code area contains/center") {
    val area = Olc.decode("8FVC2222+22").get
    assert(area.contains(47.00005, 8.00005))
    assert(!area.contains(47.1, 8.0))
    assert(math.abs(area.centerLat - 47.0000625) < 1e-9)
  }

  // ---- UTM / MGRS --------------------------------------------------------

  test("utm forward matches public CN Tower vector (Wikipedia UTM article)") {
    val u = Utm.geoToUtm(43.642566667, -79.387138889, 6378137.0, 1 / 298.257223563)
    assert(u.zone == 17 && u.hemisphere == 'N')
    assert(math.abs(u.easting - 630084) < 1.0, s"easting ${u.easting}")
    assert(math.abs(u.northing - 4833438) < 1.0, s"northing ${u.northing}")
  }

  test("utm central meridian anchor: easting exactly 500km") {
    val u = Utm.geoToUtm(45.0, 3.0, 6378137.0, 1 / 298.257223563)
    assert(u.zone == 31)
    assert(math.abs(u.easting - 500000.0) < 1e-6)
    assert(math.abs(u.scale - 0.9996) < 1e-9) // k0 on the central meridian
  }

  test("utm southern hemisphere false northing") {
    val u = Utm.geoToUtm(-33.9, 18.4, 6378137.0, 1 / 298.257223563)
    assert(u.hemisphere == 'S' && u.northing > 6e6 && u.northing < 1e7)
    val g = Utm.utmToGeo(u.zone, 'S', u.easting, u.northing, 6378137.0, 1 / 298.257223563)
    assert(math.abs(g(0) - -33.9) < 1e-9 && math.abs(g(1) - 18.4) < 1e-9)
  }

  test("utm round-trip property < 1e-9 deg") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val lat = rnd.nextDouble() * 160 - 80
      val lon = rnd.nextDouble() * 360 - 180
      val u = Utm.geoToUtm(lat, lon, 6378137.0, 1 / 298.257223563)
      val g = Utm.utmToGeo(u.zone, u.hemisphere, u.easting, u.northing,
        6378137.0, 1 / 298.257223563)
      assert(math.abs(g(0) - lat) < 1e-9, s"lat $lat -> ${g(0)}")
      assert(math.abs(g(1) - lon) < 1e-9, s"lon $lon -> ${g(1)}")
    }
  }

  test("norway/svalbard zone exceptions are live (reference Q3 fixed)") {
    assert(Utm.zoneFor(60.0, 4.0) == 32)  // Norway: zone 31 V -> 32 for lon >= 3
    assert(Utm.zoneFor(60.0, 2.9) == 31)
    assert(Utm.zoneFor(78.0, 8.0) == 31)  // Svalbard X band
    assert(Utm.zoneFor(78.0, 10.0) == 33)
    assert(Utm.zoneFor(78.0, 22.0) == 35)
    assert(Utm.zoneFor(78.0, 34.0) == 37)
  }

  test("mgrs letters: reference reciprocal example 31U DQ 48251 11932") {
    val a = 6378137.0; val f = 1 / 298.257223563
    val m = Utm.utmToMgrs(31, 'N', 448251, 5411932, a, f) // conv.d:348-351
    assert(m.zone == 31 && m.band == 'U' && m.e100k == 'D' && m.n100k == 'Q')
    assert(math.abs(m.easting - 48251) < 1e-6 && math.abs(m.northing - 11932) < 1e-6)
    val u = Utm.mgrsToUtm(31, 'U', 'D', 'Q', 48251, 11932, a, f) // conv.d:317-321
    assert(u.zone == 31 && u.hemisphere == 'N')
    assert(math.abs(u.easting - 448251) < 1e-6 && math.abs(u.northing - 5411932) < 1e-6)
  }

  test("mgrs round-trip property") {
    val a = 6378137.0; val f = 1 / 298.257223563
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val lat = rnd.nextDouble() * 150 - 75
      val lon = rnd.nextDouble() * 360 - 180
      val u = Utm.geoToUtm(lat, lon, a, f)
      val m = Utm.utmToMgrs(u.zone, u.hemisphere, u.easting, u.northing, a, f)
      assert(m != null, s"($lat,$lon)")
      val u2 = Utm.mgrsToUtm(m.zone, m.band, m.e100k, m.n100k, m.easting, m.northing, a, f)
      assert(u2 != null && u2.zone == u.zone && u2.hemisphere == u.hemisphere)
      assert(math.abs(u2.easting - u.easting) < 1e-6, s"($lat,$lon) easting")
      assert(math.abs(u2.northing - u.northing) < 1e-6, s"($lat,$lon) northing")
    }
  }

  test("band letters and band->hemisphere rule") {
    assert(Utm.latBand(52.2) == 'U')
    assert(Utm.latBand(-33.9) == 'H')
    assert(Utm.latBand(82.0) == 'X') // X repeated for 80..84
    assert(Utm.bandToHemisphere('U') == 'N' && Utm.bandToHemisphere('h') == 'S')
  }

  // ---- ECEF -------------------------------------------------------------

  test("ecef round trip and known vector") {
    val a = 6378137.0; val f = 1 / 298.257223563
    // equator/prime meridian at h=0 -> (a, 0, 0)
    val e0 = Ecef.geoToEcef(0, 0, 0, a, f)
    assert(math.abs(e0(0) - a) < 1e-6 && math.abs(e0(1)) < 1e-6 && math.abs(e0(2)) < 1e-6)
    // north pole -> (0, 0, b)
    val ep = Ecef.geoToEcef(90, 0, 0, a, f)
    assert(math.abs(ep(2) - a * (1 - f)) < 1e-6)
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val lat = rnd.nextDouble() * 180 - 90
      val lon = rnd.nextDouble() * 360 - 180
      val h = rnd.nextDouble() * 10000
      val e = Ecef.geoToEcef(lat, lon, h, a, f)
      val g = Ecef.ecefToGeo(e(0), e(1), e(2), a, f)
      assert(math.abs(g(0) - lat) < 1e-7, s"lat $lat -> ${g(0)}")
      assert(math.abs(GeoMath.wrap180(g(1) - lon)) < 1e-7, s"lon $lon -> ${g(1)}")
      assert(math.abs(g(2) - h) < 1e-2, s"h $h -> ${g(2)}")
    }
  }

  // ---- Transforms --------------------------------------------------------

  test("helmert7 Potsdam vector (transform.d:101-109)") {
    val r = Transform.helmert7(4156305.34, 671404.31, 4774508.25,
      -581.99, -105.01, -414.00, 1.04, 0.35, -3.08, 1.0 - 8.3e-6)
    assert(math.abs(r(0) - 4155670.725617266) < 1e-6)
    assert(math.abs(r(1) - 671379.863034969) < 1e-6)
    assert(math.abs(r(2) - 4774058.288906659) < 1e-6)
  }

  test("datum-shift inverse: negated-parameter reversal round-trips within O(|X|*(rot+ds)^2) (Q6)") {
    val (x0, y0, z0) = (3875000.0, -110000.0, 5100000.0)
    def roundTrip(dx: Double, dy: Double, dz: Double,
                  rx: Double, ry: Double, rz: Double, ds: Double): Double = {
      val f = Transform.helmert7Ppm(x0, y0, z0, dx, dy, dz, rx, ry, rz, ds)
      val b = Transform.helmert7Ppm(f(0), f(1), f(2), -dx, -dy, -dz, -rx, -ry, -rz, -ds)
      math.sqrt(math.pow(b(0) - x0, 2) + math.pow(b(1) - y0, 2) + math.pow(b(2) - z0, 2))
    }
    // published-magnitude parameters (Potsdam): arcsec-scale rotations,
    // ppm-scale ds -> the first-order inverse round-trips to centimetres
    // (the rot*|T| cross term dominates: ~1.5e-5 rad * 700 m ~ 1 cm), and
    // is genuinely nonzero (it is NOT the matrix inverse)
    val sane = roundTrip(-581.99, -105.01, -414.0, 1.04, 0.35, -3.08, -8.3)
    assert(sane < 5e-2, s"round-trip residual $sane m exceeds the Q6 envelope")
    assert(sane > 1e-9, s"residual $sane suspiciously zero — exact inverse?")
    // registry rows inherited VERBATIM from the reference CSV (its loader
    // ingests unscaled values — hundreds of arcsec, 10^4 ppm): the same
    // second-order law scales the residual to |X|*(rot+ds)^2 ~ kilometres.
    // The inverse mirrors the convention regardless; this pins the LAW.
    val p = Registry.helmert7ByDatum(6277L) // osgb1970, quirk magnitudes
    val rotRad = Seq(p.rx, p.ry, p.rz).map(a => math.abs(a) / 3600.0 * math.Pi / 180.0).max
    val tNorm = math.sqrt(p.dx * p.dx + p.dy * p.dy + p.dz * p.dz)
    val bound = rotRad * tNorm + 6.4e6 * math.pow(rotRad + math.abs(p.ds) * 1e-6, 2) * 4
    val quirk = roundTrip(p.dx, p.dy, p.dz, p.rx, p.ry, p.rz, p.ds)
    assert(quirk < bound, s"quirk-magnitude residual $quirk m exceeds law bound $bound m")
  }

  test("helmert3 and molodensky-badekas basics") {
    val r3 = Transform.helmert3(1, 2, 3, 10, 20, 30)
    assert(r3.toSeq == Seq(11.0, 22.0, 33.0))
    // MB with origin 0 == helmert7
    val h = Transform.helmert7(100, 200, 300, 1, 2, 3, 0.1, 0.2, 0.3, 1.000001)
    val mb = Transform.molodenskyBadekas(100, 200, 300, 1, 2, 3, 0.1, 0.2, 0.3, 0, 0, 0, 1.000001)
    assert(h.zip(mb).forall { case (x, y) => math.abs(x - y) < 1e-9 })
  }

  // ---- Parsers ----------------------------------------------------------

  test("parse point: reference vectors (latlon.d:211-217)") {
    val p1 = Parsers.parsePoint("13.453056,-16.5775")
    assert(p1 != null && math.abs(p1(0) - 13.453056) < 1e-12 && math.abs(p1(1) + 16.5775) < 1e-12)
    val p2 = Parsers.parsePoint("31.635278°, -8.000278°")
    assert(p2 != null && math.abs(p2(0) - 31.635278) < 1e-12 && math.abs(p2(1) + 8.000278) < 1e-12)
    val p3 = Parsers.parsePoint("N 14° 29.8586', W 4°11.9383'")
    assert(p3 != null && math.abs(p3(0) - (14 + 29.8586 / 60)) < 1e-9)
    assert(math.abs(p3(1) + (4 + 11.9383 / 60)) < 1e-9) // W negative in correct mode
    val p4 = Parsers.parsePoint("6° 7′ 55″ N, 1° 13′ 22″ O")
    assert(p4 != null && math.abs(p4(0) - (6 + 7 / 60.0 + 55 / 3600.0)) < 1e-9)
    assert(p4(1) < 0) // 'O' treated as Ouest (matches reference sign)
    assert(Parsers.parsePoint("abc") == null)
    assert(Parsers.parsePoint("95.0, 0.0") == null)  // out of bounds -> null
    assert(Parsers.parsePoint("0.0, 185.0") == null)
  }

  test("parse point: compat mode reproduces quirk Q1 (east negative)") {
    val p = Parsers.parsePoint("10.0 N, 20.0 E", compat = true)
    assert(p != null && p(1) == -20.0)
    val pc = Parsers.parsePoint("10.0 N, 20.0 E")
    assert(pc != null && pc(1) == 20.0)
  }

  test("splitLatLon variants (latlon.d:246-257)") {
    assert(Parsers.splitLatLon("S 33.92584, O 18.42322").toSeq == Seq("S 33.92584", " O 18.42322"))
    assert(Parsers.parsePoint("S 33,92584, O 18,42322") != null)
    assert(Parsers.parsePoint("33,92584 S, 18,42322 E") != null)
    assert(Parsers.parsePoint("S 33,92584 E 18,42322") != null)
    assert(Parsers.parsePoint("33.92584 S 18.42322 E") != null)
    val dms = Parsers.parsePoint("N 33 deg 9 min 25.84 sec S 18 deg 42 min 3.22 sec")
    assert(dms != null && math.abs(dms(0) - (33 + 9 / 60.0 + 25.84 / 3600.0)) < 1e-9)
  }

  test("parse UTM strings (utm.d:178-181)") {
    val u1 = Parsers.parseUtm("10T 384085.536 4480405.310")
    assert(u1 == ((10, 'T', 384085.536, 4480405.310)))
    val u2 = Parsers.parseUtm("56S 335003.521 6252510.623")
    assert(u2 == ((56, 'S', 335003.521, 6252510.623)))
    val u3 = Parsers.parseUtm("30 N 699327.19 5710155.50")
    assert(u3 == ((30, 'N', 699327.19, 5710155.50)))
    assert(Parsers.parseUtm("garbage") == null)
  }

  test("parse MGRS strings incl. compact form (utm.d:278-332)") {
    val m1 = Parsers.parseMgrs("15S WC 80817 51205")
    assert(m1 == ((15, 'S', "WC", 80817.0, 51205.0)))
    val m2 = Parsers.parseMgrs("15SWC8081751205")
    assert(m2 == ((15, 'S', "WC", 80817.0, 51205.0)))
    val m3 = Parsers.parseMgrs("31U DQ 48251 11932")
    assert(m3 == ((31, 'U', "DQ", 48251.0, 11932.0)))
  }

  // ---- Distances ---------------------------------------------------------

  test("haversine and vincenty sanity") {
    // 1 degree of latitude ~ 111.19 km on the sphere
    val d1 = Dist.haversine(0, 0, 1, 0)
    assert(math.abs(d1 - 111195.0) < 10)
    assert(Dist.haversine(52.205, 0.119, 48.857, 2.351) > 400e3)
    // Vincenty flattening effect: equator degree is longer on the ellipsoid
    val dv = Dist.vincentyWgs84(0, 0, 0, 1)
    assert(math.abs(dv - 111319.49) < 1.0) // a * pi/180 at equator
    assert(Dist.vincentyWgs84(10, 20, 10, 20) == 0.0)
    // vincenty vs haversine within 0.6% for mid-range distances
    val dh = Dist.haversine(52.205, 0.119, 48.857, 2.351)
    val dv2 = Dist.vincentyWgs84(52.205, 0.119, 48.857, 2.351)
    assert(math.abs(dh - dv2) / dv2 < 0.006)
  }

  // ---- Pip / Cells -------------------------------------------------------

  test("point in polygon: square and concave") {
    val square = Array(0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0)
    assert(Pip.contains(5, 5, square))
    assert(!Pip.contains(15, 5, square))
    assert(!Pip.contains(-1, 5, square))
    // concave "L" shape
    val l = Array(0.0, 0.0, 0.0, 4.0, 2.0, 4.0, 2.0, 2.0, 4.0, 2.0, 4.0, 0.0)
    assert(Pip.contains(1, 3, l))
    assert(!Pip.contains(3, 3, l))
    assert(Pip.contains(3, 1, l))
  }

  test("cell disk/ring sizes and containment") {
    val d1 = Cells.cellDisk("gbsuv", 1)
    assert(d1.length == 9 && d1.contains("gbsuv") && d1.contains("gbsvj"))
    val r1 = Cells.cellRing("gbsuv", 1)
    assert(r1.length == 8 && !r1.contains("gbsuv"))
    val d2 = Cells.cellDisk("gbsuv", 2)
    assert(d2.length == 25)
  }

  test("cell disk truncates at the poles instead of wrapping over them") {
    // the table algorithm's adjacent() WRAPS +90 -> -90 (geohash-js
    // behavior, kept for reference parity) — the disk must not follow it
    val top = Geohash.encode(89.99, 0.0, 5) // top row: latMax == 90
    assert(Geohash.bounds(top)(2) >= 90.0)
    assert(Geohash.bounds(Geohash.adjacent(top, 'n'))(0) <= -90.0 + 1e-9) // the wrap
    val disk = Cells.cellDisk(top, 2)
    // truncated grid: (0 north rows + 2 south + centre) x (2k+1) columns
    assert(disk.length == 3 * 5, s"expected 15 cells, got ${disk.length}")
    assert(disk.contains(top))
    assert(disk.contains(Geohash.adjacent(top, 's')))
    assert(disk.contains(Geohash.adjacent(top, 'e')))
    assert(disk.contains(Geohash.adjacent(Geohash.adjacent(top, 'w'), 'w')))
    // no disk member sits in the southern hemisphere (no pole wrap-through)
    assert(disk.forall(c => Geohash.bounds(c)(0) > 0.0))
    // south pole symmetric
    val bot = Geohash.encode(-89.99, 0.0, 5)
    val botDisk = Cells.cellDisk(bot, 1)
    assert(botDisk.length == 2 * 3, s"expected 6 cells, got ${botDisk.length}")
    assert(botDisk.forall(c => Geohash.bounds(c)(2) < 0.0))
  }

  test("coverBox covers all points of the box") {
    val cells = Cells.coverBox(50.0, 10.0, 50.5, 11.0, 4)
    assert(cells != null && cells.nonEmpty)
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 100) {
      val lat = 50.0 + rnd.nextDouble() * 0.5
      val lon = 10.0 + rnd.nextDouble() * 1.0
      assert(cells.contains(Geohash.encode(lat, lon, 4)), s"($lat,$lon)")
    }
  }

  test("coverRing is a superset of cells containing in-polygon points") {
    // pentagon around (48, 11), radius ~0.5 deg
    val n = 5
    val ring = (0 until n).flatMap { i =>
      val a = 2 * math.Pi * i / n
      Seq(48.0 + 0.5 * math.cos(a), 11.0 + 0.5 * math.sin(a))
    }.toArray
    val cells = Cells.coverRing(ring, 5).toSet
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 300) {
      val lat = 47.4 + rnd.nextDouble() * 1.2
      val lon = 10.4 + rnd.nextDouble() * 1.2
      if (Pip.contains(lat, lon, ring))
        assert(cells.contains(Geohash.encode(lat, lon, 5)), s"($lat,$lon)")
    }
  }

  test("tile ids match slippy formula vector and pack/unpack") {
    assert(Cells.tileX(0.12, 10) == 512)
    assert(Cells.tileY(52.2, 10) == 337)
    val id = Cells.tileId(52.2, 0.12, 10)
    assert(Cells.tileIdZ(id) == 10 && Cells.tileIdX(id) == 512 && Cells.tileIdY(id) == 337)
    val tb = Cells.tileBounds(10, 512, 337)
    assert(tb(0) <= 52.2 && 52.2 <= tb(2) && tb(1) <= 0.12 && 0.12 <= tb(3))
  }

  test("tilePolyfill covers polygon points") {
    val ring = Array(48.0, 10.0, 48.0, 12.0, 49.5, 12.0, 49.5, 10.0)
    val tiles = Cells.tilePolyfill(ring, 8).toSet
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      val lat = 48.0 + rnd.nextDouble() * 1.5
      val lon = 10.0 + rnd.nextDouble() * 2.0
      assert(tiles.contains(Cells.tileId(lat, lon, 8)), s"($lat,$lon)")
    }
  }

  test("geohash adjacent equals integer +-1 (mod axis) re-encode — the q52 oracle identity") {
    // The neighbour lookup tables implement binary increment with carry on
    // the de-interleaved (x, y) integers; the q52 SQL oracle relies on this.
    def xy(h: String): (Long, Long) = {
      val bits = 5 * h.length
      val lonBits = bits - bits / 2
      val latBits = bits / 2
      var gx = 0L; var gy = 0L
      var even = true
      for (c <- h; k <- 4 to 0 by -1) {
        val b = (Geohash.Base32.indexOf(c) >> k) & 1
        if (even) gx = gx * 2 + b else gy = gy * 2 + b
        even = !even
      }
      (gx, gy)
    }
    def enc(gx: Long, gy: Long, p: Int): String = {
      val bits = 5 * p
      val lonBits = bits - bits / 2
      val latBits = bits / 2
      val sb = new StringBuilder
      var idx = 0
      var xi = lonBits - 1; var yi = latBits - 1
      var even = true
      var bit = 0
      while (sb.length < p) {
        val b = if (even) { val v = ((gx >> xi) & 1).toInt; xi -= 1; v }
                else { val v = ((gy >> yi) & 1).toInt; yi -= 1; v }
        idx = idx * 2 + b
        even = !even
        bit += 1
        if (bit == 5) { sb.append(Geohash.Base32.charAt(idx)); bit = 0; idx = 0 }
      }
      sb.toString
    }
    val rnd = new scala.util.Random(77)
    for (p <- 1 to 6; _ <- 1 to 120) {
      val lat = rnd.nextDouble() * 180 - 90
      val lon = rnd.nextDouble() * 360 - 180
      val h = Geohash.encode(lat, lon, p)
      val bits = 5 * p
      val lonN = 1L << (bits - bits / 2)
      val latN = 1L << (bits / 2)
      val (gx, gy) = xy(h)
      assert(Geohash.adjacent(h, 'e') == enc((gx + 1) % lonN, gy, p), s"e of $h")
      assert(Geohash.adjacent(h, 'w') == enc((gx + lonN - 1) % lonN, gy, p), s"w of $h")
      assert(Geohash.adjacent(h, 'n') == enc(gx, (gy + 1) % latN, p), s"n of $h")
      assert(Geohash.adjacent(h, 's') == enc(gx, (gy + latN - 1) % latN, p), s"s of $h")
    }
    // explicit pole/date-line wrap rows
    assert(Geohash.adjacent("zzzzz", 'n') == {
      val (gx, _) = xy("zzzzz"); enc(gx, 0L, 5)
    })
    assert(Geohash.adjacent("pzzzz", 'e') != null)
  }

  test("multi-ring even-odd PIP: holes subtract, multipolygon components add") {
    val outer = Array(0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0)
    val hole = Array(4.0, 4.0, 4.0, 6.0, 6.0, 6.0, 6.0, 4.0)
    val island = Array(20.0, 20.0, 20.0, 25.0, 25.0, 25.0, 25.0, 20.0)
    val holed = Array(outer, hole)
    assert(Pip.containsRings(2.0, 2.0, holed))      // in ring, outside hole
    assert(!Pip.containsRings(5.0, 5.0, holed))     // punched out by the hole
    assert(!Pip.containsRings(11.0, 5.0, holed))    // outside everything
    val multi = Array(outer, island)
    assert(Pip.containsRings(5.0, 5.0, multi))
    assert(Pip.containsRings(22.0, 22.0, multi))
    assert(!Pip.containsRings(15.0, 15.0, multi))
    // degenerate rings are ignored, single-ring agrees with Pip.contains
    assert(Pip.containsRings(2.0, 2.0, Array(outer, Array(1.0, 1.0))) ==
      Pip.contains(2.0, 2.0, outer))
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 400) {
      val lat = rnd.nextDouble() * 30 - 2
      val lon = rnd.nextDouble() * 30 - 2
      val expect = Pip.contains(lat, lon, outer) ^ Pip.contains(lat, lon, hole)
      assert(Pip.containsRings(lat, lon, holed) == expect, s"($lat,$lon)")
    }
  }

  test("abridged Molodensky: identity at zero params, agrees with ECEF translation") {
    val id = Transform.molodenskyAbridged(47.5, 11.25, 300.0, 0, 0, 0,
      6378137.0, 1.0 / 298.257223563, 0, 0)
    assert(id(0) == 47.5 && id(1) == 11.25 && id(2) == 300.0)
    // against the exact route: ECEF translate + Bowring inverse. The
    // abridged form drops the h/M, h/N terms -> sub-metre agreement.
    val rnd = new scala.util.Random(21)
    for (_ <- 1 to 50) {
      val lat = rnd.nextDouble() * 160 - 80
      val lon = rnd.nextDouble() * 360 - 180
      val (dx, dy, dz) = (87.0, -98.0, 121.0)
      val m = Transform.molodenskyAbridged(lat, lon, 0.0, dx, dy, dz,
        6378137.0, 1.0 / 298.257223563, 0, 0)
      val e = Ecef.geoToEcef(lat, lon, 0.0, 6378137.0, 1.0 / 298.257223563)
      val g = Ecef.ecefToGeo(e(0) + dx, e(1) + dy, e(2) + dz, 6378137.0, 1.0 / 298.257223563)
      assert(math.abs(m(0) - g(0)) < 2e-5, s"dlat at ($lat,$lon): ${m(0)} vs ${g(0)}")
      assert(math.abs(m(1) - g(1)) < 2e-5, s"dlon at ($lat,$lon): ${m(1)} vs ${g(1)}")
      assert(math.abs(m(2) - g(2)) < 1.0, s"dh at ($lat,$lon): ${m(2)} vs ${g(2)}")
    }
  }
}
