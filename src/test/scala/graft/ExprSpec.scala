package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.GraftFunctions

/** Expression-layer tests: SQL registration, null propagation, struct
  * results, and codegen (factoryMode=CODEGEN_ONLY makes a non-codegen
  * expression fail loudly instead of silently falling back). */
class ExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-expr-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }

  test("st_vecsum_q40: exact, partitioning-invariant, null/ragged skip law") {
    import spark.implicits._
    val rows = (0 until 1000).map { i =>
      (i % 7, Seq(math.sin(i * 0.37), math.cos(i * 1.13), (i % 5) * 0.1 - 0.2))
    }
    def sums(parts: Int): Map[Int, Seq[Long]] =
      rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(call_function("st_vecsum_q40", col("v"), lit(3)).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val a = sums(2)
    val b = sums(13)
    assert(a == b, "vecsum not partitioning-invariant")
    // exactness vs a driver-side fixed-point reference
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (0 until 3).map(d =>
        rs.map(r => math.round(r._2(d) * graft.expr.VectorSumQ40.Q)).sum)
    }
    assert(a == want, "vecsum diverged from the driver fixed-point reference")
    // ragged rows contribute nothing; a wrong-arity call fails loudly
    val ragged = Seq((1, Seq(1.0, 2.0))).toDF("g", "v")
      .groupBy("g").agg(call_function("st_vecsum_q40", col("v"), lit(3)).as("s"))
      .head.getSeq[Long](1)
    assert(ragged == Seq(0L, 0L, 0L))
    intercept[Exception] { spark.sql("SELECT st_vecsum_q40(array(1.0d))").collect() }
    // domain is ENFORCED: out-of-range / NaN elements throw rather than
    // silently saturating the fixed-point accumulator; bad dim literals are
    // rejected at analysis
    intercept[Exception] {
      spark.sql("SELECT st_vecsum_q40(array(1e10d), 1)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT st_vecsum_q40(array(CAST('NaN' AS DOUBLE)), 1)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT st_vecsum_q40(array(1.0d), 3.7)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT st_vecsum_q40(array(1.0d), CAST(NULL AS INT))").collect()
    }
  }

  test("st_winnow / st_langid iterate CODEPOINTS: non-BMP parity with the SQL-oracle pipeline") {
    // the q67 oracle hashes unicode(substr(t, i, 1)) — CODEPOINTS. A
    // UTF-16-unit kernel loop would hash each surrogate half separately and
    // diverge on any astral character. Expected fingerprints computed by
    // running the exact q67 CTE pipeline (k=5, w=4, BIGINT-cast) in DuckDB
    // over this string (U+1D11E musical symbol + U+1F600 emoji, both
    // surrogate pairs in UTF-16):
    val text = "the quick 𝄞 brown fox 😀 jumps"
    val want = Seq(141270121178L, 141337823629L, 141406115548L, 141524936658L,
      429464565032L, 433733565740L, 446864223341L, 480421696731L, 486306306855L)
    val got = spark.sql(s"SELECT st_winnow('$text', 5, 4) AS fp")
      .collect()(0).getSeq[Long](0)
    assert(got == want, s"non-BMP winnow diverged from the oracle pipeline: $got")
    // langid trigram counting is substring-literal based, so astral noise
    // between words must not disturb the scores (BMP trigrams cannot match
    // inside a surrogate pair)
    val lang = spark.sql(
      "SELECT st_langid('the 😀 house and the 𝄞 dog of the king') AS l")
      .collect()(0).getString(0)
    assert(lang == "en", s"non-BMP noise broke language id: $lang")
  }

  test("st_geohash + decode round trip via SQL, codegen only") {
    val rows = spark.sql(
      """SELECT st_geohash(52.205, 0.119, 7) AS h,
        |       st_geohash_decode('u120fxw').lat AS lat,
        |       st_geohash_adjacent('gbsuv', 'n') AS adj,
        |       st_geohash(NULL, 0.119, 7) AS nullh
        |""".stripMargin).collect()
    assert(rows(0).getString(0) == "u120fxw")
    assert(math.abs(rows(0).getDouble(1) - 52.205) < 0.001)
    assert(rows(0).getString(2) == "gbsvj")
    assert(rows(0).isNullAt(3))
  }

  test("olc functions via SQL") {
    val r = spark.sql(
      """SELECT olc_encode(20.3701125, 2.782234375, 11) AS c,
        |       olc_decode('7FG49Q00+').south AS s,
        |       olc_is_valid('8FWC2345+G6') AS v,
        |       olc_is_valid('garbage') AS iv,
        |       olc_shorten('9C3W9QCJ+2VX', 51.3701125, -1.217765625) AS sh,
        |       olc_recover('CJ+2VX', 51.3708675, -1.217765625) AS rec
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "7FG49QCJ+2VX")
    assert(r.getDouble(1) == 20.35)
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getString(4) == "+2VX")
    assert(r.getString(5) == "9C3W9QCJ+2VX")
  }

  test("utm/mgrs conversions via SQL") {
    val r = spark.sql(
      """SELECT st_geo_to_utm(43.642566667, -79.387138889) AS u,
        |       st_utm_to_mgrs(31, 'N', 448251d, 5411932d) AS m,
        |       st_mgrs_to_utm(31, 'U', 'D', 'Q', 48251d, 11932d) AS mu,
        |       st_utm_zone(60.0, 4.0) AS nor,
        |       st_band(52.2) AS band
        |""".stripMargin).collect()(0)
    val u = r.getStruct(0)
    assert(u.getInt(0) == 17 && u.getString(1) == "N")
    assert(math.abs(u.getDouble(2) - 630084) < 1.0)
    val m = r.getStruct(1)
    assert(m.getInt(0) == 31 && m.getString(1) == "U" && m.getString(2) == "D" && m.getString(3) == "Q")
    val mu = r.getStruct(2)
    assert(math.abs(mu.getDouble(2) - 448251) < 1e-6)
    assert(r.getInt(3) == 32) // Norway exception live
    assert(r.getString(4) == "U")
  }

  test("parse functions and null propagation on garbage") {
    val df = spark.createDataFrame(Seq(
      (1, "13.453056,-16.5775"),
      (2, "N 14° 29.8586', W 4°11.9383'"),
      (3, "not a coordinate"),
      (4, "95.0, 0.0"))).toDF("id", "txt")
    df.createOrReplaceTempView("texts")
    val got = spark.sql(
      "SELECT id, st_parse_point(txt) AS pt FROM texts ORDER BY id").collect()
    assert(got(0).getStruct(1).getDouble(0) == 13.453056)
    assert(math.abs(got(1).getStruct(1).getDouble(1) + (4 + 11.9383 / 60)) < 1e-9)
    assert(got(2).isNullAt(1))
    assert(got(3).isNullAt(1)) // out-of-bounds lat -> null
  }

  test("point in polygon + cover cells over array<struct> column") {
    val r = spark.sql(
      """SELECT st_point_in_polygon(1.0, 1.0,
        |         array(named_struct('lat', 0d, 'lon', 0d),
        |               named_struct('lat', 0d, 'lon', 3d),
        |               named_struct('lat', 3d, 'lon', 3d),
        |               named_struct('lat', 3d, 'lon', 0d))) AS inside,
        |       st_point_in_polygon(5.0, 5.0,
        |         array(named_struct('lat', 0d, 'lon', 0d),
        |               named_struct('lat', 0d, 'lon', 3d),
        |               named_struct('lat', 3d, 'lon', 3d),
        |               named_struct('lat', 3d, 'lon', 0d))) AS outside,
        |       size(st_cover_cells(
        |         array(named_struct('lat', 48d, 'lon', 10d),
        |               named_struct('lat', 48d, 'lon', 12d),
        |               named_struct('lat', 49.5d, 'lon', 12d),
        |               named_struct('lat', 49.5d, 'lon', 10d)), 4)) AS ncells,
        |       st_cell_disk('gbsuv', 1) AS disk
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getInt(2) > 0)
    assert(r.getSeq[String](3).length == 9)
  }

  test("ring metrics: 1-degree equatorial square area/perimeter/centroid") {
    val ring = "array(" +
      "struct(0.0d AS lat, 0.0d AS lon), struct(0.0d AS lat, 1.0d AS lon), " +
      "struct(1.0d AS lat, 1.0d AS lon), struct(1.0d AS lat, 0.0d AS lon))"
    val r = spark.sql(
      s"""SELECT st_ring_area_m2($ring) AS a, st_ring_perimeter_m($ring) AS p,
        st_ring_centroid($ring) AS c""").collect()(0)
    // independent small-square estimate: (R*dPhi) * (R*dLam*cos(midLat))
    val rM = 6371008.8
    val deg = math.Pi / 180.0
    val expArea = (rM * deg) * (rM * deg * math.cos(0.5 * deg))
    assert(math.abs(r.getDouble(0) - expArea) / expArea < 0.005,
      s"area ${r.getDouble(0)} vs ~$expArea")
    val expPerim = 4 * rM * deg // two meridians exact, two parallels ~cos(lat)
    assert(math.abs(r.getDouble(1) - expPerim) / expPerim < 0.01,
      s"perimeter ${r.getDouble(1)} vs ~$expPerim")
    val c = r.getStruct(2)
    assert(math.abs(c.getDouble(0) - 0.5) < 1e-9 && math.abs(c.getDouble(1) - 0.5) < 1e-9)
    // degenerate + null discipline
    val d2 = spark.sql(
      "SELECT st_ring_area_m2(array(struct(0.0d AS lat, 0.0d AS lon))) AS a, " +
        "st_ring_centroid(array(struct(2.0d AS lat, 3.0d AS lon))) AS c").collect()(0)
    assert(d2.isNullAt(0))
    assert(d2.getStruct(1).getDouble(0) == 2.0 && d2.getStruct(1).getDouble(1) == 3.0)
  }

  test("distances, tiles, wraps, helmert via SQL") {
    val r = spark.sql(
      """SELECT st_haversine(0d, 0d, 1d, 0d) AS hav,
        |       st_vincenty(0d, 0d, 0d, 1d) AS vin,
        |       st_tile_id(52.2, 0.12, 10) AS tid,
        |       st_tile(52.2, 0.12, 10).x AS tx,
        |       st_wrap90(-315d) AS w90,
        |       st_helmert7(4156305.34, 671404.31, 4774508.25,
        |                   -581.99, -105.01, -414.00, 1.04, 0.35, -3.08, -8.3).x AS hx,
        |       st_ellipsoid_a('wgs84') AS wa,
        |       st_geo_to_ecef(0d, 0d, 0d).x AS ex
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 111195.0) < 10)
    assert(math.abs(r.getDouble(1) - 111319.49) < 1.0)
    assert(r.getLong(2) == ((10L << 58) | (512L << 29) | 337L))
    assert(r.getLong(3) == 512L)
    assert(r.getDouble(4) == 45.0)
    assert(math.abs(r.getDouble(5) - 4155670.725617266) < 1e-6)
    assert(r.getDouble(6) == 6378137.0)
    assert(math.abs(r.getDouble(7) - 6378137.0) < 1e-6)
  }

  test("st_cover_cells_gen generator works via LATERAL VIEW and matches the array form") {
    spark.sql(
      """SELECT 'p1' AS poly_id,
        |  array(named_struct('lat', 48d, 'lon', 10d),
        |        named_struct('lat', 48d, 'lon', 12d),
        |        named_struct('lat', 49.5d, 'lon', 12d),
        |        named_struct('lat', 49.5d, 'lon', 10d)) AS ring
        |""".stripMargin).createOrReplaceTempView("one_poly")
    val viaGen = spark.sql(
      """SELECT poly_id, cell FROM one_poly
        |LATERAL VIEW st_cover_cells_gen(ring, 5, 1024) t AS cell
        |""".stripMargin).collect().map(_.getString(1)).sorted
    val viaArray = spark.sql(
      "SELECT explode(st_cover_cells_adaptive(ring, 5, 1024)) FROM one_poly")
      .collect().map(_.getString(0)).sorted
    assert(viaGen.nonEmpty && viaGen.sameElements(viaArray))
  }

  test("st_utm_band implements the reference's TODO accessor") {
    val r = spark.sql(
      "SELECT st_utm_band(31, 'N', 448251d, 5411932d) AS b, " +
        "st_utm_band(31, 'X', 448251d, 5411932d) AS bad").collect()(0)
    assert(r.getString(0) == "U")
    assert(r.isNullAt(1))
  }

  test("strict mode: invalid input throws typed CoordException; relaxed is null") {
    import graft.core._
    // each case: (SQL expression, expected exception class fragment)
    val cases = Seq(
      ("st_parse_point('garbage, text')", "LatLonException"),
      ("st_parse_coord('not a coord')", "LatLonException"),
      ("st_parse_utm('nonsense')", "UtmException"),
      ("st_parse_mgrs('@@')", "MgrsException"),
      ("st_geo(95.0, 0.0)", "LatLonException"),
      ("st_geo(0.0, 200.0)", "LatLonException"),
      ("st_geo(0.0, 0.0, 100.0, -1.0, 0.0)", "LatLonException"),
      ("st_utm(0, 'N', 500000d, 0d)", "UtmException"),
      ("st_utm(31, 'Q', 500000d, 0d)", "UtmException"),
      ("st_geohash(95.0, 0.0, 5)", "LatLonException"),
      ("st_geohash_decode('ilo')", "GeohashException"),
      ("st_cell(99.0, 0.0, 5)", "LatLonException"),
      ("st_geo_to_utm(95.0, 0.0)", "LatLonException"),
      ("st_utm_to_geo(99, 'N', 500000d, 0d)", "UtmException"),
      ("st_utm_to_geo(31, 'Z', 500000d, 0d)", "UtmException"),
      ("st_geo_to_mgrs(89.0, 0.0)", "MgrsException"),
      ("st_mgrs_to_utm(31, '9', 'D', 'Q', 0d, 0d)", "MgrsException"),
      ("st_geo_to_ecef(95.0, 0.0, 0.0)", "LatLonException"),
      ("olc_encode(1.0, 2.0, 3)", "OlcException"),
      ("olc_decode('not-a-code')", "OlcException"),
      ("olc_shorten('9C3W9QCJ+2VX', -40.0, -100.0)", "OlcException"), // reference too far
      ("olc_recover('garbage+!', 0.0, 0.0)", "OlcException"),
      ("st_datum_shift(1d, 2d, 3d, 'no_such_datum')", "DatumException"),
      ("st_ellipsoid_a('no_such_ellipsoid')", "DatumException"))
    for ((expr, exc) <- cases) {
      // relaxed (default): NULL
      spark.conf.set("spark.graft.strict", "false")
      assert(spark.sql(s"SELECT $expr").collect()(0).isNullAt(0), s"$expr not null relaxed")
      // strict: throws the typed exception
      spark.conf.set("spark.graft.strict", "true")
      val thrown = intercept[Throwable] { spark.sql(s"SELECT $expr").collect() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(thrown).exists(t => t.getClass.getSimpleName == exc),
        s"$expr: expected $exc, got $thrown")
      spark.conf.set("spark.graft.strict", "false")
    }
    // NULL input stays NULL even in strict mode (SQL null semantics)
    spark.conf.set("spark.graft.strict", "true")
    assert(spark.sql("SELECT st_parse_point(NULL)").collect()(0).isNullAt(0))
    spark.conf.set("spark.graft.strict", "false")
  }

  test("validating constructors, auto-precision geohash, full variants, helmert flags") {
    val r = spark.sql(
      """SELECT st_geo(52.205, 0.119, 10.5, 3.0, 1.0) AS g,
        |       st_geo_valid(52.205, 0.119) AS gv, st_geo_valid(95.0, 0.0) AS gi,
        |       st_utm(31, 'n', 448251.0, 5411932.0, 25.0) AS u,
        |       st_utm_valid(31, 'N') AS uv, st_utm_valid(61, 'N') AS ui,
        |       st_geohash_auto(57.64911, 10.40744) AS ga,
        |       st_geohash(57.64911, 10.40744, 0) AS g0,
        |       st_geo_to_utm_full(52.205, 0.119, 10.5) AS uf,
        |       st_utm_to_geo_full(31, 'N', 448251.0, 5411932.0, 10.5) AS gf
        |""".stripMargin).collect()(0)
    val g = r.getStruct(0)
    assert(g.getDouble(0) == 52.205 && g.getDouble(2) == 10.5 && g.getDouble(3) == 3.0)
    assert(r.getBoolean(1) && !r.getBoolean(2))
    val u = r.getStruct(3)
    assert(u.getInt(0) == 31 && u.getString(1) == "N" && u.getDouble(4) == 25.0)
    assert(r.getBoolean(4) && !r.getBoolean(5))
    // auto-precision: shortest round-tripping hash; precision 0 = auto
    assert(r.getString(6) == r.getString(7))
    val dec = graft.core.Geohash.decode(r.getString(6))
    assert(math.abs(dec(0) - 57.64911) < 1e-6 && math.abs(dec(1) - 10.40744) < 1e-6)
    val uf = r.getStruct(8)
    assert(uf.getInt(0) == 31 && uf.getDouble(4) == 10.5)
    val gf = r.getStruct(9)
    assert(math.abs(gf.getDouble(0) - 48.858222) < 0.01 && gf.getDouble(2) == 10.5)

    // helmert7_ex: position-vector forward == st_helmert7; coordinateFrame
    // flips rotation signs; inverse negates everything (reference semantics)
    val h = spark.sql(
      """SELECT st_helmert7(4000000d, 3000000d, 2000000d, -582d, -105d, -414d,
        |         1.04, 0.35, -3.08, -8.3) AS pv,
        |       st_helmert7_ex(4000000d, 3000000d, 2000000d, -582d, -105d, -414d,
        |         1.04, 0.35, -3.08, -8.3, false, false) AS ex,
        |       st_helmert7_ex(4000000d, 3000000d, 2000000d, -582d, -105d, -414d,
        |         -1.04, -0.35, 3.08, -8.3, true, false) AS cf
        |""".stripMargin).collect()(0)
    assert(h.getStruct(0) == h.getStruct(1), "ex(false,false) != helmert7")
    assert(h.getStruct(1) == h.getStruct(2), "coordinateFrame flag != negated rotations")
  }

  test("column API works and folds literals at plan time") {
    import graft.expr.GraftFunctions._
    val df = spark.range(1).select(
      st_geohash(lit(57.64911), lit(10.40744), lit(11)).as("h"),
      st_haversine(lit(0), lit(0), lit(1), lit(0)).as("d"))
    val row = df.collect()(0)
    assert(row.getString(0) == "u4pruydqqvj")
    // literal-only call must constant-fold (no StaticInvoke left in the plan)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("staticinvoke"), s"not folded:\n$optimized")
  }

  test("st_box_center is the box midpoint; st_datum resolves the registry") {
    val r = spark.sql(
      """SELECT st_box_center(10.0, 20.0, 11.0, 22.0) AS c,
        |       st_datum('wgs84') AS d, st_datum('epsg:6326') AS d2,
        |       st_datum('no-such-datum') AS bad""".stripMargin).collect()(0)
    val c = r.getStruct(0)
    assert(c.getDouble(0) == 10.5 && c.getDouble(1) == 21.0)
    val d = r.getStruct(1)
    assert(d.getLong(0) == 6326L && d.getLong(3) == 7030L)
    assert(d.getDouble(4) == 6378137.0)
    assert(math.abs(d.getDouble(5) - 1.0 / 298.257223563) < 1e-15)
    assert(r.getStruct(2) == d, "epsg form resolves to the same datum")
    assert(r.isNullAt(3), "unknown datum -> NULL in relaxed mode")
  }

  test("st_matmul: corrected reference cross product (m x p dot-product grid)") {
    val r = spark.sql(
      """SELECT st_matmul(array(array(1.0d, 2.0d), array(3.0d, 4.0d)),
        |                 array(array(5.0d, 6.0d), array(7.0d, 8.0d), array(9.0d, 10.0d))) AS m,
        |       st_matmul(array(array(1.0d, 2.0d)), array(array(1.0d))) AS ragged
        |""".stripMargin).collect()(0)
    val m = r.getSeq[Seq[Double]](0)
    // result[i][j] = dot(a row i, b row j): rows (1,2),(3,4) x cols (5,6),(7,8),(9,10)
    assert(m == Seq(Seq(17.0, 23.0, 29.0), Seq(39.0, 53.0, 67.0)), m.toString)
    assert(r.isNullAt(1), "shape mismatch -> NULL")
  }
}
