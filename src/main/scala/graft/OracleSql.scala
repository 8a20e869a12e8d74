package graft

import graft.engine.Corpus

/** DuckDB oracle SQL for the engine-layer queries (q30-q44).
  *
  * Each generator re-implements the operator's semantics in plain ANSI-ish
  * SQL over the same parquet inputs — the driver's tables plus the stored
  * synthetic corpus written by [[Corpus.ensure]] — so every engine query gets
  * an independent rows/schema/hash check, not just a rows-only count.
  *
  * The mechanical rule for float parity (proven by q09-q22 in round 1):
  * mirror the kernel's expression tree operation-for-operation in the same
  * association order, CAST literals to DOUBLE where DuckDB would otherwise
  * run exact DECIMAL arithmetic, and add `+ 0.0` after round() to normalize
  * -0.0. Where the kernels use md5-derived hashing (dedup, media, ANN
  * planes), the SQL recomputes the identical md5 slices.
  */
object OracleSql {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** A Scala double as an exact DOUBLE literal (string cast is a correctly
    * rounded parse, recovering the identical bits). */
  private def d(v: Double): String = s"CAST('${v}' AS DOUBLE)"

  def docsGlob(nDocs: Long): String = s"${Corpus.corpusBase(nDocs)}/docs/*.parquet"
  def polysGlob(nDocs: Long): String = s"${Corpus.corpusBase(nDocs)}/polys/*.parquet"

  /** hex value of md5-style hex `expr`'s [from, from+len) slice (1-based
    * `from`), as a BIGINT sum of digit * 16^k terms. */
  private def hexVal(expr: String, from: Int, len: Int): String =
    (0 until len).map { k =>
      val mult = math.pow(16.0, (len - 1 - k).toDouble).toLong
      s"(strpos('0123456789abcdef', substr($expr, ${from + k}, 1)) - 1) * $mult"
    }.mkString("(", " + ", ")")

  // ---- corpus parse (mirror of Parsers.parsePoint on the corpus grammars) --

  // The corpus renders exactly five coordinate grammars (Corpus.renderCoord)
  // plus poison/prose spans. The oracle parses each grammar with an anchored
  // regex and mirrors toDecimalDegree's association order; out-of-bounds and
  // non-matching spans fall out exactly like the kernel's null path.
  private val F0 = """^(-?\d+\.\d{6}), (-?\d+\.\d{6})$"""
  private val F1 = """^(-?\d+\.\d{6})°, (-?\d+\.\d{6})°$"""
  private val F2 = """^(\d+)° (\d+)' (\d+\.\d{3})'' ([NS]), (\d+)° (\d+)' (\d+\.\d{3})'' ([EW])$"""
  private val F3 = """^(-?\d+),(\d{6}), (-?\d+),(\d{6})$"""
  private val F4 = """^(\d+\.\d{6}) ([NS]), (\d+\.\d{6}) ([EW])$"""

  /** lat (first=true) or lon (first=false) expression over span text `t`. */
  private def coordExpr(first: Boolean): String = {
    val (g0, dmsOff, dmsCard, posCard) = if (first) (1, 0, "N", 2) else (2, 4, "E", 4)
    val dms = s"(CAST(regexp_extract(t, ${q(F2)}, ${dmsOff + 1}) AS DOUBLE) + " +
      s"(CAST(regexp_extract(t, ${q(F2)}, ${dmsOff + 2}) AS DOUBLE) + " +
      s"CAST(regexp_extract(t, ${q(F2)}, ${dmsOff + 3}) AS DOUBLE) / 60.0) / 60.0) * " +
      s"(CASE WHEN regexp_extract(t, ${q(F2)}, ${dmsOff + 4}) = '$dmsCard' THEN 1.0 ELSE -1.0 END)"
    val f3 = s"CAST(regexp_extract(t, ${q(F3)}, ${2 * g0 - 1}) || '.' || " +
      s"regexp_extract(t, ${q(F3)}, ${2 * g0}) AS DOUBLE)"
    val f4 = s"CAST(regexp_extract(t, ${q(F4)}, ${2 * g0 - 1}) AS DOUBLE) * " +
      s"(CASE WHEN regexp_extract(t, ${q(F4)}, ${2 * g0}) = '$dmsCard' THEN 1.0 ELSE -1.0 END)"
    s"""CASE
      WHEN regexp_matches(t, ${q(F0)}) THEN CAST(regexp_extract(t, ${q(F0)}, $g0) AS DOUBLE)
      WHEN regexp_matches(t, ${q(F1)}) THEN CAST(regexp_extract(t, ${q(F1)}, $g0) AS DOUBLE)
      WHEN regexp_matches(t, ${q(F2)}) THEN $dms
      WHEN regexp_matches(t, ${q(F3)}) THEN $f3
      WHEN regexp_matches(t, ${q(F4)}) THEN $f4
      ELSE NULL END"""
  }

  /** CTEs: parsed(doc_id, offset, lat, lon) from the stored corpus.
    * `capDoc`: optional exclusive upper bound on doc_id. */
  def parsedCte(glob: String, capDoc: Option[String] = None): String = {
    val cap = capDoc.map(c => s"WHERE doc_id < ${q(c)}").getOrElse("")
    s"""spans_t AS (
      SELECT doc_id, UNNEST(spans) AS s FROM read_parquet(${q(glob)}) $cap
    ), raw_t AS (
      SELECT doc_id, s."offset" AS "offset", s.text AS t FROM spans_t WHERE s.kind = 'text'
    ), parsed0 AS (
      SELECT doc_id, "offset", ${coordExpr(first = true)} AS lat, ${coordExpr(first = false)} AS lon
      FROM raw_t
    ), parsed AS (
      SELECT doc_id, "offset", lat, lon FROM parsed0
      WHERE lat IS NOT NULL AND lon IS NOT NULL
        AND lat >= -90 AND lat <= 90 AND lon >= -180 AND lon <= 180
    )"""
  }

  // ---- geohash / OLC scalar encoders (shared with the round-1 oracles) -----

  /** Geohash is interleaved binary bisection — mechanically expressible as
    * floor/div/mod bit extraction. X/Y are clamped at the top edge (lat=90 /
    * lon=180) to match the bisection's all-ones path. */
  def geohashSql(lat: String, lon: String, p: Int): String = {
    val bits = 5 * p
    val latBits = bits / 2
    val lonBits = bits - latBits
    val x = s"LEAST(CAST(floor(($lon + 180.0)/360.0 * ${1L << lonBits}) AS BIGINT), ${(1L << lonBits) - 1})"
    val y = s"LEAST(CAST(floor(($lat + 90.0)/180.0 * ${1L << latBits}) AS BIGINT), ${(1L << latBits) - 1})"
    geohashFromXY(x, y, p)
  }

  /** Geohash string from the integer (x, y) cell indices at precision p —
    * the bit-interleave half of geohashSql, reusable for adjacency
    * (neighbour = +-1 mod 2^bits on one axis, re-encode). */
  def geohashFromXY(xE: String, yE: String, p: Int): String = {
    val bits = 5 * p
    val latBits = bits / 2
    val lonBits = bits - latBits
    def bit(pos: Int): String =
      if (pos % 2 == 0) s"((gx // ${1L << (lonBits - 1 - pos / 2)}) % 2)"
      else s"((gy // ${1L << (latBits - 1 - (pos - 1) / 2)}) % 2)"
    val chars = (0 until p).map { c =>
      val idx = (0 until 5).map(k => s"${bit(5 * c + k)} * ${1 << (4 - k)}").mkString(" + ")
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST($idx AS INT) + 1, 1)"
    }
    s"(SELECT concat(${chars.mkString(", ")}) FROM (SELECT $xE AS gx, $yE AS gy) g)"
  }

  /** OLC pair/grid encoding in SQL: the same Long arithmetic as the kernel
    * (scaled integers, base-20 pair digits lat/lon interleaved MSB-first,
    * '+' after 8, grid refinement digit for length 11). Valid for in-range
    * lat/lon (no clip/nudge/wrap needed for the tested lattices). */
  def olcSql(lat: String, lon: String, len: Int): String = {
    require(len == 10 || len == 11, "olcSql supports lengths 10 and 11")
    val latFull = s"CAST(floor(round(($lat + 90.0) * 25000000 * 1000000)/1000000) AS BIGINT)"
    val lonFull = s"CAST(floor(round(($lon + 180.0) * 8192000 * 1000000)/1000000) AS BIGINT)"
    def digit(v: String, i: Int): String = // i = 0 is the most significant of 5
      s"substr('23456789CFGHJMPQRVWX', CAST(($v // ${math.pow(20, 4 - i).toLong}) % 20 AS INT) + 1, 1)"
    val interleaved = (0 until 5).flatMap(i => Seq(digit("ov", i), digit("oo", i)))
    val grid = // kept grid digit is the most significant (i = 4 of the loop)
      "substr('23456789CFGHJMPQRVWX', CAST(((olat // 625) % 5) * 4 + ((olon // 256) % 4) AS INT) + 1, 1)"
    val code = interleaved.take(8) ++ Seq("'+'") ++ interleaved.drop(8) ++
      (if (len == 11) Seq(grid) else Nil)
    s"(SELECT concat(${code.mkString(", ")}) FROM (SELECT $latFull AS olat, $lonFull AS olon, " +
      s"$latFull // 3125 AS ov, $lonFull // 1024 AS oo) o)"
  }

  // ---- per-query oracles ---------------------------------------------------

  /** q30: parse + cell assignment over the stored corpus. */
  def q30(nDocs: Long): String =
    s"""WITH ${parsedCte(docsGlob(nDocs))}
    SELECT doc_id, "offset", lat, lon,
      ${geohashSql("lat", "lon", 5)} AS cell
    FROM parsed ORDER BY doc_id, "offset""""

  /** CTE: edges(poly_id, yi, xi, yj, xj) — each ring edge (vertex i with its
    * predecessor j, closed ring), mirroring Pip.contains' traversal. */
  private def edgesCte(glob: String): String =
    s"""edges0 AS (
      SELECT poly_id, UNNEST(list_transform(range(1, len(ring) + 1), i -> {
        'yi': ring[i].lat, 'xi': ring[i].lon,
        'yj': ring[CASE WHEN i = 1 THEN len(ring) ELSE i - 1 END].lat,
        'xj': ring[CASE WHEN i = 1 THEN len(ring) ELSE i - 1 END].lon})) AS e
      FROM read_parquet(${q(glob)})
    ), edges AS (
      SELECT poly_id, e.yi AS yi, e.xi AS xi, e.yj AS yj, e.xj AS xj FROM edges0
    )"""

  /** Even-odd crossing predicate fragment over a (point p x edge ed) row;
    * same expression tree as Pip.contains (double div-by-zero yields NULL in
    * DuckDB, which the AND treats as the kernel's short-circuit false). */
  private val CrossingCond =
    "((ed.yi > p.lat) != (ed.yj > p.lat)) AND " +
      "p.lon < (ed.xj - ed.xi) * (p.lat - ed.yi) / (ed.yj - ed.yi) + ed.xi"

  /** q31: spatial join (point-in-polygon pairs) — brute-force PIP in SQL.
    * The engine's multi-resolution cell covering is superset-exact, so its
    * output equals the full PIP cross product. */
  def q31(nDocs: Long): String =
    s"""WITH ${parsedCte(docsGlob(nDocs))}, ${edgesCte(polysGlob(nDocs))}, hits AS (
      SELECT p.doc_id, p."offset", ed.poly_id,
        count(*) FILTER (WHERE $CrossingCond) AS cr
      FROM parsed p CROSS JOIN edges ed
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, "offset", poly_id FROM hits WHERE cr % 2 = 1
    ORDER BY doc_id, "offset", poly_id"""

  /** q32: salted spatial join = same pairs, grouped per polygon. */
  def q32(nDocs: Long): String =
    s"""WITH ${parsedCte(docsGlob(nDocs))}, ${edgesCte(polysGlob(nDocs))}, hits AS (
      SELECT p.doc_id, p."offset", ed.poly_id,
        count(*) FILTER (WHERE $CrossingCond) AS cr
      FROM parsed p CROSS JOIN edges ed
      GROUP BY 1, 2, 3
    )
    SELECT poly_id, count(*) AS n_points FROM hits WHERE cr % 2 = 1
    GROUP BY poly_id ORDER BY poly_id"""

  /** q73: doc-level containment semi/anti — EXISTS / NOT EXISTS over the
    * q31 pair machinery, one row per doc that has >= 1 parsed point. */
  def q73(nDocs: Long): String =
    s"""WITH ${parsedCte(docsGlob(nDocs))}, ${edgesCte(polysGlob(nDocs))}, hits AS (
      SELECT p.doc_id, p."offset", ed.poly_id,
        count(*) FILTER (WHERE $CrossingCond) AS cr
      FROM parsed p CROSS JOIN edges ed
      GROUP BY 1, 2, 3
    ), hitdocs AS (
      SELECT DISTINCT doc_id FROM hits WHERE cr % 2 = 1
    ), pdocs AS (SELECT DISTINCT doc_id FROM parsed)
    SELECT d.doc_id,
      CASE WHEN EXISTS (SELECT 1 FROM hitdocs h WHERE h.doc_id = d.doc_id)
        THEN 'in' ELSE 'out' END AS status
    FROM pdocs d ORDER BY doc_id"""

  /** Slippy tile x/y expressions mirroring Cells.tileX/tileY (incl. the
    * Mercator lat clamp and 0..n-1 clamps). */
  private def tileXExpr(lon: String, z: Int): String = {
    val n = 1L << z
    s"LEAST(GREATEST(CAST(floor(($lon + 180.0) / 360.0 * $n.0) AS BIGINT), 0), ${n - 1})"
  }
  private def tileYExpr(lat: String, z: Int): String = {
    val n = 1L << z
    val latc = s"radians(LEAST(GREATEST($lat, -85.05112878), 85.05112878))"
    s"LEAST(GREATEST(CAST(floor((1.0 - ln(tan($latc) + 1.0/cos($latc)) / pi()) / 2.0 * $n.0) AS BIGINT), 0), ${n - 1})"
  }

  /** q33: per-tile histogram at z=7 with exact distinct doc counts. */
  def q33(nDocs: Long): String = {
    val z = 7
    s"""WITH ${parsedCte(docsGlob(nDocs))}, tiled AS (
      SELECT doc_id, ${tileXExpr("lon", z)} AS x, ${tileYExpr("lat", z)} AS y FROM parsed
    )
    SELECT ${z.toLong << 58} + x * ${1L << 29} + y AS tile_id, $z AS z, x, y,
      count(*) AS n_points, count(DISTINCT doc_id) AS n_docs
    FROM tiled GROUP BY 1, 2, 3, 4 ORDER BY tile_id"""
  }

  /** q76: multi-zoom rollup — per-zoom packed tile ids under GROUP BY
    * ROLLUP, mirroring Tiler.multiZoomHistogram(zooms = 4, 7). */
  def q76(nDocs: Long): String = {
    def tid(z: Int): String =
      s"${z.toLong << 58} + ${tileXExpr("lon", z)} * ${1L << 29} + ${tileYExpr("lat", z)}"
    s"""WITH ${parsedCte(docsGlob(nDocs))}, tiled AS (
      SELECT ${tid(4)} AS tile_z4, ${tid(7)} AS tile_z7 FROM parsed
    )
    SELECT tile_z4, tile_z7, count(*) AS n_points FROM tiled
    GROUP BY ROLLUP(tile_z4, tile_z7) ORDER BY tile_z4, tile_z7"""
  }

  /** q81: ring metrics — Chamberlain-Duquette spherical area, haversine
    * perimeter, planar shoelace centroid, per polygon over the SAME edge
    * pairing edgesCte gives the PIP oracles (vertex i with predecessor j).
    * SUM reassociation vs the kernel loop drifts <= ~1e-12 relative —
    * orders of magnitude below every rounding step used here. */
  def q81(nDocs: Long): String = {
    val r = d(6371008.8)
    s"""WITH ${edgesCte(polysGlob(nDocs))}, m AS (
      SELECT poly_id,
        abs(SUM((radians(xi) - radians(xj)) * (sin(radians(yj)) + sin(radians(yi)))))
          * $r * $r / 2.0 AS area_m2,
        SUM(${haversineSql("yj", "xj", "yi", "xi")}) AS perim,
        SUM(xj * yi - xi * yj) AS a2,
        SUM((xj + xi) * (xj * yi - xi * yj)) AS cx,
        SUM((yj + yi) * (xj * yi - xi * yj)) AS cy,
        SUM(yi) AS sy, SUM(xi) AS sx, count(*) AS nv
      FROM edges GROUP BY poly_id
    )
    SELECT poly_id, round(area_m2 / ${d(1e6)}, 4) + 0.0 AS area_km2,
      round(perim, 2) + 0.0 AS perim_m,
      round(CASE WHEN abs(a2) < 1e-12 THEN sy / nv ELSE cy / (3.0 * a2) END, 6) + 0.0 AS clat,
      round(CASE WHEN abs(a2) < 1e-12 THEN sx / nv ELSE cx / (3.0 * a2) END, 6) + 0.0 AS clon,
      nv
    FROM m ORDER BY poly_id"""
  }

  /** q85: fixed-radius distance join — brute-force cross join + haversine
    * threshold (the engine's sufficient cell disk makes its candidate set a
    * superset of every true match, so equi-join + refine equals this).
    * The threshold compares the engines' last-ulp-different haversines
    * directly; a boundary flip needs a pair within ~1e-9 m of exactly
    * 25 km — the same accepted trig-drift envelope as the q34 ranks. */
  def q85(nDocs: Long): String = {
    s"""WITH ${parsedCte(docsGlob(nDocs), capDoc = Some(f"doc-${SparkEntry.KnnDocCap}%09d"))},
    hubs(qid, qlat, qlon) AS (VALUES $hubsValues)
    SELECT h.qid, p.doc_id || ':' || CAST(p."offset" AS VARCHAR) AS pid,
      round(${haversineSql("h.qlat", "h.qlon", "p.lat", "p.lon")}, 3) + 0.0 AS dist
    FROM parsed p CROSS JOIN hubs h
    WHERE ${haversineSql("h.qlat", "h.qlon", "p.lat", "p.lon")} <= 25000.0
    ORDER BY qid, pid"""
  }

  /** q90: DBSCAN vs first principles — brute-force O(n²) haversine
    * neighbors, core = degree+1 >= minPts, core clusters by recursive-CTE
    * reachability (min reachable core pid — the engine's CC label), border
    * = minimum core-neighbor label, noise NULL. The engine's cell-disk
    * candidate set provably contains every true eps-pair, so equi-join +
    * refine equals this. Same boundary envelope as q85: a flip needs a
    * pair within ~1e-9 m of exactly eps. */
  def q90(nDocs: Long): String = {
    val eps = "3000.0"
    s"""WITH RECURSIVE ${parsedCte(docsGlob(nDocs), capDoc = Some(f"doc-${SparkEntry.DbscanDocCap}%09d"))},
    p AS (
      SELECT doc_id || ':' || CAST("offset" AS VARCHAR) AS pid, lat, lon FROM parsed
    ), nb AS MATERIALIZED (
      SELECT a.pid AS pa, b.pid AS pb
      FROM p a JOIN p b ON a.pid <> b.pid
        AND ${haversineSql("a.lat", "a.lon", "b.lat", "b.lon")} <= $eps
    ), deg AS (
      SELECT pa AS pid, count(*) + 1 AS n FROM nb GROUP BY 1
    ), core AS (
      SELECT p.pid FROM p LEFT JOIN deg ON p.pid = deg.pid
      WHERE COALESCE(deg.n, 1) >= 10
    ), ce AS (
      SELECT pa AS src, pb AS dst FROM nb
      WHERE pa IN (SELECT pid FROM core) AND pb IN (SELECT pid FROM core)
    ), reach AS (
      SELECT pid AS id, pid AS r FROM core
      UNION
      SELECT ce.dst AS id, reach.r AS r FROM reach JOIN ce ON ce.src = reach.id
    ), lbl AS (
      SELECT id AS pid, min(r) AS cluster FROM reach GROUP BY 1
    ), border AS (
      SELECT nb.pa AS pid, min(lbl.cluster) AS cluster
      FROM nb JOIN lbl ON nb.pb = lbl.pid
      WHERE nb.pa NOT IN (SELECT pid FROM core)
      GROUP BY 1
    ), asg AS (
      SELECT pid, cluster FROM lbl UNION ALL SELECT pid, cluster FROM border
    )
    SELECT p.pid, asg.cluster, (c.pid IS NOT NULL) AS is_core
    FROM p LEFT JOIN asg ON p.pid = asg.pid
      LEFT JOIN core c ON p.pid = c.pid
    ORDER BY p.pid"""
  }

  /** q91: binomial focal smoothing vs first principles — tile counts at
    * z=6, then the 3×3 weighted neighbor sum with integer weights
    * (1,2,1)⊗(1,2,1), x wrapping mod 2^z and y clamped. All-integer
    * arithmetic end to end, so the compare is exact. */
  def q91(nDocs: Long): String = {
    val z = 6
    val n = 1L << z
    s"""WITH ${parsedCte(docsGlob(nDocs))},
    t AS (
      SELECT ${tileXExpr("lon", z)} AS x, ${tileYExpr("lat", z)} AS y,
        count(*) AS v
      FROM parsed GROUP BY 1, 2
    ), o(dx, dy, w) AS (VALUES
      (-1,-1,1),(-1,0,2),(-1,1,1),(0,-1,2),(0,0,4),(0,1,2),(1,-1,1),(1,0,2),(1,1,1)
    ), s AS (
      SELECT (x + dx + $n) % $n AS nx, y + dy AS ny, v * w AS c
      FROM t CROSS JOIN o
      WHERE y + dy BETWEEN 0 AND ${n - 1}
    )
    SELECT ${z.toLong << 58} + nx * ${1L << 29} + ny AS tile_id, $z AS z,
      CAST(sum(c) AS BIGINT) AS sm
    FROM s GROUP BY 1, 2 ORDER BY tile_id"""
  }

  /** q79: tile pyramid — every zoom computed DIRECTLY from the points
    * (the engine derives coarser zooms from the finer level's tiles; slippy
    * nesting makes the two equal exactly). */
  def q79(nDocs: Long): String = {
    val zs = 4 to 7
    val selects = zs.map { z =>
      s"""SELECT ${z.toLong << 58} + ${tileXExpr("lon", z)} * ${1L << 29} + ${tileYExpr("lat", z)} AS tile_id,
        $z AS z, count(*) AS n_points FROM parsed GROUP BY 1, 2"""
    }.mkString("\n    UNION ALL\n    ")
    s"""WITH ${parsedCte(docsGlob(nDocs))}
    $selects
    ORDER BY tile_id"""
  }

  /** The 20 hotspot hubs as VALUES rows — shared by the q34/q85 oracles. */
  private def hubsValues: String = Corpus.Hotspots.zipWithIndex.map { case ((la, lo), i) =>
    s"('hub-${"%02d".format(i)}', ${d(la)}, ${d(lo)})"
  }.mkString(", ")

  /** Haversine fragment mirroring Dist.haversine(lat1, lon1, lat2, lon2). */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2.0 * 6371008.8 * asin(LEAST(1.0, sqrt(" +
      s"pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2))))"

  /** q34: kNN = brute-force top-k per hotspot query (the engine's ring
    * expansion + residual brute-force completion is provably exact). */
  def q34(nDocs: Long): String = {
    s"""WITH ${parsedCte(docsGlob(nDocs), capDoc = Some(f"doc-${SparkEntry.KnnDocCap}%09d"))},
    hubs(qid, qlat, qlon) AS (VALUES $hubsValues),
    cand AS (
      SELECT h.qid, p.doc_id || ':' || CAST(p."offset" AS VARCHAR) AS pid,
        ${haversineSql("h.qlat", "h.qlon", "p.lat", "p.lon")} AS dist
      FROM parsed p CROSS JOIN hubs h
    ), ranked AS (
      SELECT qid, pid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, pid) AS rank
      FROM cand
    )
    SELECT qid, pid, round(dist, 3) + 0.0 AS dist, rank FROM ranked
    WHERE rank <= 10 ORDER BY qid, rank"""
  }

  // ---- q35: geohash-7 / OLC-11 / MGRS letters over customer points --------

  private val CustomerPointsSql =
    "SELECT c_custkey, CAST(c_custkey % 1640 AS DOUBLE)/10.0 - 80.0 AS lat, " +
      "CAST((c_custkey*7) % 3600 AS DOUBLE)/10.0 - 180.0 AS lon FROM customer"

  /** UTM zone CASE (Norway/Svalbard exceptions), mirroring Utm.zoneFor —
    * the q10 pattern, parameterized over the source row alias. */
  private val ZoneSql =
    "CASE WHEN z0=31 AND band='V' AND lon>=3 THEN 32 " +
      "WHEN z0=32 AND band='X' AND lon<9 THEN 31 " +
      "WHEN z0=32 AND band='X' AND lon>=9 THEN 33 " +
      "WHEN z0=34 AND band='X' AND lon<21 THEN 33 " +
      "WHEN z0=34 AND band='X' AND lon>=21 THEN 35 " +
      "WHEN z0=36 AND band='X' AND lon<33 THEN 35 " +
      "WHEN z0=36 AND band='X' AND lon>=33 THEN 37 ELSE z0 END"

  /** sinh/cosh via exp (DuckDB has no hyperbolics). The composed form can
    * differ from Java's Math.sinh in the last ulp — harmless here because
    * the Krüger outputs feed 100 km letter-bucket floors only. */
  private def sinhSql(x: String): String = s"((exp($x) - exp(-($x))) / 2.0)"
  private def coshSql(x: String): String = s"((exp($x) + exp(-($x))) / 2.0)"

  // ---- Krüger forward/inverse series as reusable CTE chains ----------------
  // (Karney 2011, transcribed term-for-term from core.Utm.geoToUtm/utmToGeo;
  // hyperbolics via exp — last-ulp drift only, absorbed by the letter
  // buckets / the 1e-6-degree output rounding.)

  private val KA = 6378137.0
  private val KF = 1.0 / 298.257223563
  private val KE = math.sqrt(KF * (2.0 - KF))
  private val KN = KF / (2.0 - KF)
  private val KBigA = { val n2 = KN * KN; val n4 = n2 * n2; val n6 = n4 * n2
    KA / (1.0 + KN) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0) }
  /** K0 * A — the exact product the kernels multiply/divide by. */
  private val KKa = 0.9996 * KBigA

  /** Forward Krüger CTE chain: `src` must provide the `carry` columns plus
    * lat, lon, zone; appends CTEs ${p}1..${p}9 — ${p}9 exposes carry + zone +
    * easting + northing. */
  def kruegerForwardCtes(src: String, p: String, carry: Seq[String]): String = {
    val alpha = graft.core.Utm.kruegerAlpha(KN)
    val cs = carry.mkString(", ")
    val zetaTerms = (1 to 6).map(j =>
      s" + ${d(alpha(j))} * sin(2.0 * $j.0 * zetap) * ${coshSql(s"2.0 * $j.0 * etap")}").mkString
    val etaTerms = (1 to 6).map(j =>
      s" + ${d(alpha(j))} * cos(2.0 * $j.0 * zetap) * ${sinhSql(s"2.0 * $j.0 * etap")}").mkString
    s"""${p}1 AS (
      SELECT $cs, zone,
        lat * pi() / 180.0 AS phi,
        lon * pi() / 180.0 - ((zone - 1) * 6.0 - 180.0 + 3.0) * pi() / 180.0 AS lambda
      FROM $src
    ), ${p}2 AS (
      SELECT *, tan(phi) AS tau, cos(lambda) AS cl, sin(lambda) AS sl FROM ${p}1
    ), ${p}3 AS (
      SELECT *, ${d(KE)} * (0.5 * ln((1.0 + ${d(KE)} * tau / sqrt(1.0 + tau * tau)) /
        (1.0 - ${d(KE)} * tau / sqrt(1.0 + tau * tau)))) AS sa FROM ${p}2
    ), ${p}4 AS (
      SELECT *, ${sinhSql("sa")} AS sigma FROM ${p}3
    ), ${p}5 AS (
      SELECT *, tau * sqrt(1.0 + sigma * sigma) - sigma * sqrt(1.0 + tau * tau) AS taup FROM ${p}4
    ), ${p}6 AS (
      SELECT *, atan2(taup, cl) AS zetap, sl / sqrt(taup * taup + cl * cl) AS sx FROM ${p}5
    ), ${p}7 AS (
      SELECT *, CASE WHEN sx < 0 THEN -(ln(-sx + sqrt(sx * sx + 1.0)))
        ELSE ln(sx + sqrt(sx * sx + 1.0)) END AS etap FROM ${p}6
    ), ${p}8 AS (
      SELECT *, zetap$zetaTerms AS zeta, etap$etaTerms AS eta FROM ${p}7
    ), ${p}9 AS (
      SELECT $cs, zone,
        ${d(KKa)} * eta + 500000.0 AS easting,
        CASE WHEN ${d(KKa)} * zeta < 0 THEN ${d(KKa)} * zeta + 10000000.0
          ELSE ${d(KKa)} * zeta END AS northing
      FROM ${p}8
    )"""
  }

  /** Inverse Krüger + Newton-on-tau CTE chain (recursive — the caller's WITH
    * must be declared RECURSIVE): `src` must provide the `carry` columns plus
    * zone, hemi, easting, northing. Appends ${p}1..${p}f — ${p}f exposes
    * carry + zone + lat + lon. The Newton do-while mirrors core.Utm.utmToGeo
    * step-for-step: each recursive row computes dTau from the pre-update
    * tau, adds it, and finishes when |dTau| <= 1e-12 (same convergence test;
    * a 100-iteration guard that neither side reaches). */
  def kruegerInverseCtes(src: String, p: String, carry: Seq[String],
                         compat: Boolean = false): String = {
    // compat = quirk Q2's zeroed integer-division series (Gauss-Schreiber):
    // no beta terms at all (the kernel's beta == 0 makes zetaP = zeta
    // bit-exactly) and A = a/(1+n) — mirrors core.Utm.utmToGeo(compat=true)
    val kka = if (compat) d(0.9996 * (KA / (1.0 + KN))) else d(KKa)
    val cs = carry.mkString(", ")
    val eL = d(KE)
    lazy val beta = graft.core.Utm.kruegerBeta(KN)
    val zetapTerms = if (compat) "" else (1 to 6).map(j =>
      s" - ${d(beta(j))} * sin(2.0 * $j.0 * izeta) * ${coshSql(s"2.0 * $j.0 * ieta")}").mkString
    val etapTerms = if (compat) "" else (1 to 6).map(j =>
      s" - ${d(beta(j))} * cos(2.0 * $j.0 * izeta) * ${sinhSql(s"2.0 * $j.0 * ieta")}").mkString
    val atanhArg = s"$eL * taui / sqrt(1.0 + taui * taui)"
    val sigmaExpr = sinhSql(s"($eL * (0.5 * ln((1.0 + $atanhArg) / (1.0 - $atanhArg))))")
    s"""${p}1 AS (
      SELECT $cs, zone,
        (easting - 500000.0) / $kka AS ieta,
        (CASE WHEN hemi = 'S' THEN northing - 10000000.0 ELSE northing END) / $kka AS izeta
      FROM $src
    ), ${p}2 AS (
      SELECT *, izeta$zetapTerms AS zetap, ieta$etapTerms AS etap FROM ${p}1
    ), ${p}3 AS (
      SELECT *, ${sinhSql("etap")} AS sinhetap, sin(zetap) AS szetap, cos(zetap) AS czetap FROM ${p}2
    ), ${p}4 AS (
      SELECT $cs, zone, sinhetap, czetap,
        szetap / sqrt(sinhetap * sinhetap + czetap * czetap) AS taup
      FROM ${p}3
    ), ${p}it AS (
      SELECT $cs, zone, sinhetap, czetap, taup,
        taup AS taui, false AS done, 0 AS iter
      FROM ${p}4
      UNION ALL
      SELECT $cs, zone, sinhetap, czetap, taup,
        taui + s_dtaui AS taui, abs(s_dtaui) <= 1e-12 AS done, iter + 1 AS iter
      FROM (
        SELECT *, (taup - s_tauip) / sqrt(1.0 + s_tauip * s_tauip) *
            (1.0 + (1.0 - $eL * $eL) * s_tauip * s_tauip) /
            ((1.0 - $eL * $eL) * sqrt(1.0 + s_tauip * s_tauip)) AS s_dtaui
        FROM (
          SELECT *, taui * sqrt(1.0 + s_sigmai * s_sigmai) -
              s_sigmai * sqrt(1.0 + taui * taui) AS s_tauip
          FROM (
            SELECT *, $sigmaExpr AS s_sigmai FROM ${p}it WHERE NOT done AND iter < 100
          )
        )
      )
    ), ${p}5 AS (
      SELECT $cs, zone,
        atan(taui) * 180.0 / pi() AS lat,
        (atan2(sinhetap, czetap) + ((zone - 1) * 6.0 - 180.0 + 3.0) * pi() / 180.0)
          * 180.0 / pi() AS lon0
      FROM ${p}it WHERE done
    ), ${p}f AS (
      SELECT $cs, zone, lat,
        CASE WHEN lon0 >= -180.0 AND lon0 <= 180.0 THEN lon0
          ELSE ((lon0 % 360.0) + 540.0) % 360.0 - 180.0 END AS lon
      FROM ${p}5
    )"""
  }

  /** MGRS 100km letter-table fragments (zone-cycled, utm.d:36-39). */
  private def e100kSql(zoneE: String, eastingE: String): String =
    s"substr(CASE ($zoneE - 1) % 3 WHEN 0 THEN 'ABCDEFGH' WHEN 1 THEN 'JKLMNPQR' ELSE 'STUVWXYZ' END, " +
      s"CAST(floor($eastingE / 100000.0) AS INT), 1)"
  private def n100kSql(zoneE: String, northingE: String): String =
    s"substr(CASE ($zoneE - 1) % 2 WHEN 0 THEN 'ABCDEFGHJKLMNPQRSTUV' ELSE 'FGHJKLMNPQRSTUVABCDE' END, " +
      s"CAST(floor($northingE / 100000.0) % 20 AS INT) + 1, 1)"

  /** CTEs z/zz: customer points annotated with band + (exception-corrected)
    * UTM zone — the shared head of q35/q49. */
  private val PointsZoneCtes =
    s"""pts AS ($CustomerPointsSql), z AS (
      SELECT c_custkey, lat, lon, CAST(floor((lon+180.0)/6.0) + 1 AS INT) AS z0,
        substr('CDEFGHJKLMNPQRSTUVWXX', CAST(floor(lat/8.0 + 10.0) AS INT) + 1, 1) AS band
      FROM pts
    ), zz AS (
      SELECT c_custkey, lat, lon, band, $ZoneSql AS zone FROM z
    )"""

  /** q35: geohash(7), OLC(11), and MGRS zone/band/e100k/n100k — the MGRS
    * letters via the full Krüger n^6 forward series. */
  def q35: String = {
    s"""WITH $PointsZoneCtes, ${kruegerForwardCtes("zz", "k", Seq("c_custkey", "lat", "lon", "band"))}
    SELECT c_custkey, ${geohashSql("lat", "lon", 7)} AS gh, ${olcSql("lat", "lon", 11)} AS olc,
      zone AS mz, band AS mb,
      ${e100kSql("zone", "easting")} AS me,
      ${n100kSql("zone", "northing")} AS mn
    FROM k9 ORDER BY c_custkey"""
  }

  // ---- q48-q55: inverse / parse surface oracles -----------------------------

  /** q48: UTM -> geographic over synthesized UTM positions — inverse Krüger
    * + the Newton loop as a recursive CTE. */
  def q48: String =
    s"""WITH RECURSIVE base AS (
      SELECT c_custkey,
        CAST(c_custkey % 60 AS INT) + 1 AS zone,
        CASE WHEN c_custkey % 2 = 0 THEN 'N' ELSE 'S' END AS hemi,
        CAST(200000.0 AS DOUBLE) + CAST(c_custkey * 13 % 600000 AS DOUBLE) AS easting,
        CAST(1000000.0 AS DOUBLE) + CAST(c_custkey * 7 % 8000000 AS DOUBLE) AS northing
      FROM customer
    ), ${kruegerInverseCtes("base", "ki", Seq("c_custkey", "hemi"))}
    SELECT c_custkey, zone, hemi, round(lat, 6) + 0.0 AS lat, round(lon, 6) + 0.0 AS lon
    FROM kif ORDER BY c_custkey"""

  /** q49: geo -> MGRS -> UTM -> geo round trip: forward Krüger for the
    * letters, the reference's band-bottom 2000km walk (conv.d:292-315) as
    * ceil arithmetic, then the inverse-Newton chain for the recovered geo.
    * The per-band bottom northing is computed INDEPENDENTLY by a second
    * forward-Krüger pass over the 20 band latitudes at lon=3. */
  def q49: String = {
    val bands = (0 until 20).map { i =>
      s"('${graft.core.Utm.MgrsBands.charAt(i)}', CAST(${(i - 10) * 8}.0 AS DOUBLE))"
    }.mkString(", ")
    s"""WITH RECURSIVE $PointsZoneCtes,
    ${kruegerForwardCtes("zz", "k", Seq("c_custkey", "lat", "lon", "band"))},
    m AS (
      SELECT c_custkey, band, zone,
        ${e100kSql("zone", "easting")} AS me, ${n100kSql("zone", "northing")} AS mn,
        easting % 100000.0 AS meast, northing % 100000.0 AS mnorth
      FROM k9
    ), bands0(band, blat) AS (VALUES $bands),
    bands1 AS (
      SELECT band, blat AS lat, CAST(3.0 AS DOUBLE) AS lon,
        CASE WHEN band = 'V' THEN 32 ELSE 31 END AS zone
      FROM bands0
    ), ${kruegerForwardCtes("bands1", "bk", Seq("band"))},
    nb AS (SELECT band, floor(northing / 100000.0) * 100000.0 AS nband FROM bk9),
    mu AS (
      SELECT m.c_custkey, m.band, m.zone AS zone, m.me, m.mn, m.meast, m.mnorth,
        CASE WHEN m.band >= 'N' THEN 'N' ELSE 'S' END AS hemi,
        CAST(strpos(CASE (m.zone - 1) % 3 WHEN 0 THEN 'ABCDEFGH' WHEN 1 THEN 'JKLMNPQR' ELSE 'STUVWXYZ' END, m.me) AS DOUBLE) * 100000.0 AS e100knum,
        CAST(strpos(CASE (m.zone - 1) % 2 WHEN 0 THEN 'ABCDEFGHJKLMNPQRSTUV' ELSE 'FGHJKLMNPQRSTUVABCDE' END, m.mn) - 1 AS DOUBLE) * 100000.0 AS n100knum,
        nb.nband AS nband
      FROM m JOIN nb ON m.band = nb.band
    ), mu2 AS (
      SELECT *, 2000000.0 * GREATEST(CAST(0.0 AS DOUBLE),
        ceil((nband - n100knum - mnorth) / 2000000.0)) AS n2m FROM mu
    ), uu AS (
      SELECT c_custkey, band, me, mn, hemi, zone,
        e100knum + meast AS easting, n2m + n100knum + mnorth AS northing,
        e100knum + meast AS ueast, n2m + n100knum + mnorth AS unorth
      FROM mu2
    ), ${kruegerInverseCtes("uu", "ri", Seq("c_custkey", "band", "me", "mn", "hemi", "ueast", "unorth"))}
    SELECT c_custkey, zone AS mz, band AS mb, me, mn, hemi AS uhemi,
      round(ueast, 3) + 0.0 AS ueast, round(unorth, 3) + 0.0 AS unorth,
      round(lat, 6) + 0.0 AS rlat, round(lon, 6) + 0.0 AS rlon
    FROM rif ORDER BY c_custkey"""
  }

  /** q50: geo -> ECEF (with altitude) -> geo via Bowring's closed form,
    * mirroring core.Ecef term-for-term (0/0 -> NULL stands in for the
    * kernel's NaN polar-branch guard). */
  def q50: String = {
    val e2 = KF * (2.0 - KF)
    val b = KA * (1.0 - KF)
    val ep2 = e2 / ((1.0 - KF) * (1.0 - KF))
    s"""WITH pts AS ($CustomerPointsSql), pa AS (
      SELECT c_custkey, lat, lon, CAST(c_custkey % 5000 AS DOUBLE) AS alt FROM pts
    ), c1 AS (
      SELECT c_custkey, alt, lat * pi() / 180.0 AS phi, lon * pi() / 180.0 AS lam FROM pa
    ), c2 AS (
      SELECT *, sin(phi) AS sphi, cos(phi) AS cphi, sin(lam) AS slam, cos(lam) AS clam,
        ${d(KA)} / sqrt(1.0 - ${d(e2)} * sin(phi) * sin(phi)) AS nu
      FROM c1
    ), e AS (
      SELECT c_custkey, (nu + alt) * cphi * clam AS x, (nu + alt) * cphi * slam AS y,
        (nu * (1.0 - ${d(e2)}) + alt) * sphi AS z
      FROM c2
    ), g1 AS (
      SELECT *, sqrt(x * x + y * y) AS p FROM e
    ), g2 AS (
      SELECT *, sqrt(p * p + z * z) AS r FROM g1
    ), g3 AS (
      SELECT *, (${d(b)} * z) / (${d(KA)} * p) * (1.0 + ${d(ep2)} * ${d(b)} / r) AS tbeta FROM g2
    ), g4 AS (
      SELECT *, tbeta / sqrt(1.0 + tbeta * tbeta) AS sbeta FROM g3
    ), g5 AS (
      SELECT *, sbeta / tbeta AS cbeta FROM g4
    ), g6 AS (
      SELECT *, CASE WHEN cbeta IS NULL THEN 0.0
        ELSE atan2(z + ${d(ep2)} * ${d(b)} * sbeta * sbeta * sbeta,
                   p - ${d(e2)} * ${d(KA)} * cbeta * cbeta * cbeta) END AS phi2,
        atan2(y, x) AS lam2
      FROM g5
    ), g7 AS (
      SELECT *, ${d(KA)} / sqrt(1.0 - ${d(e2)} * sin(phi2) * sin(phi2)) AS nu2 FROM g6
    )
    SELECT c_custkey,
      round(phi2 * 180.0 / pi(), 6) + 0.0 AS rlat,
      round(lam2 * 180.0 / pi(), 6) + 0.0 AS rlon,
      round(p * cos(phi2) + z * sin(phi2) - ${d(KA)} * ${d(KA)} / nu2, 4) + 0.0 AS rh
    FROM g7 ORDER BY c_custkey"""
  }

  /** q51: free-text UTM/MGRS parsing — the reference grammars (utm.d:192,
    * 297) as RE2 regexes plus the comma/space/compact split rules mirrored
    * in SQL over identically synthesized strings. */
  def q51: String = {
    val utmRx = """(?i)(\d{1,2})\s*([c-x]{1,2}?)\s*(\d+(?:[.,]?\d+))\s(\d+(?:[.,]?\d+))"""
    val mgrsRx = """(?i)(\d{1,2})\s*([c-x])\s*([a-z]{2})\s*([\d,.\s]*)"""
    s"""WITH base AS (
      SELECT c_custkey,
        CAST(c_custkey % 60 AS INT) + 1 AS zone,
        substr('CDEFGHJKLMNPQRSTUVWX', CAST(c_custkey % 20 AS INT) + 1, 1) AS letter,
        200000 + c_custkey * 13 % 600000 AS e_int,
        c_custkey * 7 % 9000000 AS n_int,
        substr('ABCDEFGH', CAST(c_custkey % 8 AS INT) + 1, 1) AS ge,
        substr('ABCDEFGHJKLMNPQRSTUV', CAST(c_custkey % 20 AS INT) + 1, 1) AS gn,
        c_custkey * 3 % 100000 AS me_int,
        c_custkey * 11 % 100000 AS mn_int
      FROM customer
    ), strs AS (
      SELECT c_custkey,
        CAST(zone AS VARCHAR) || ' ' || letter || ' ' || CAST(e_int AS VARCHAR) || '.25 ' ||
          CAST(n_int AS VARCHAR) || '.75' AS utm_str,
        CASE WHEN c_custkey % 2 = 0
          THEN CAST(zone AS VARCHAR) || ' ' || letter || ' ' || ge || gn || ' ' ||
            CAST(me_int AS VARCHAR) || '.5 ' || CAST(mn_int AS VARCHAR) || '.25'
          ELSE CAST(zone AS VARCHAR) || letter || ge || gn ||
            lpad(CAST(me_int AS VARCHAR), 5, '0') || lpad(CAST(mn_int AS VARCHAR), 5, '0')
        END AS mgrs_str
      FROM base
    ), pu AS (
      SELECT c_custkey, mgrs_str,
        CAST(regexp_extract(utm_str, ${q(utmRx)}, 1) AS INT) AS u_zone,
        upper(regexp_extract(utm_str, ${q(utmRx)}, 2)) AS u_letter,
        CAST(replace(regexp_extract(utm_str, ${q(utmRx)}, 3), ',', '.') AS DOUBLE) AS u_east,
        CAST(replace(regexp_extract(utm_str, ${q(utmRx)}, 4), ',', '.') AS DOUBLE) AS u_north
      FROM strs
    ), pm0 AS (
      SELECT *, CAST(regexp_extract(mgrs_str, ${q(mgrsRx)}, 1) AS INT) AS m_zone,
        upper(regexp_extract(mgrs_str, ${q(mgrsRx)}, 2)) AS m_band,
        upper(regexp_extract(mgrs_str, ${q(mgrsRx)}, 3)) AS grid,
        regexp_extract(mgrs_str, ${q(mgrsRx)}, 4) AS rest
      FROM pu
    ), pm1 AS (
      SELECT *, string_split(rest, ' ') AS parts FROM pm0
    ), pm2 AS (
      -- parts[1:0] (the single-token compact case) slices to NULL in DuckDB,
      -- where the kernel's slice(0,0).mkString is '' — normalize with COALESCE
      SELECT *, COALESCE(array_to_string(parts[1:len(parts)//2], ' '), '') AS e0,
        array_to_string(parts[len(parts)//2+1:len(parts)], ' ') AS n0
      FROM pm1
    ), pm3 AS (
      SELECT *, CASE WHEN e0 = '' THEN substr(n0, 1, len(n0)//2) ELSE e0 END AS e1,
        CASE WHEN e0 = '' THEN substr(n0, len(n0)//2 + 1) ELSE n0 END AS n1
      FROM pm2
    )
    SELECT c_custkey, u_zone,
      CASE WHEN u_letter IN ('N','S') THEN u_letter
           WHEN u_letter >= 'N' THEN 'N' ELSE 'S' END AS u_hemi,
      u_east, u_north,
      m_zone, m_band, substr(grid, 1, 1) AS m_e100k, substr(grid, 2, 1) AS m_n100k,
      CAST(replace(trim(e1), ',', '.') AS DOUBLE) AS m_east,
      CAST(replace(trim(n1), ',', '.') AS DOUBLE) AS m_north
    FROM pm3 ORDER BY c_custkey"""
  }

  /** q52: geohash decode / bounds / adjacent at precision 5. Decode is bit
    * extraction back to the integer (gx, gy) cell — every bound is an exact
    * dyadic rational, so the outputs compare RAW. Adjacency = +-1 modulo the
    * axis size, re-encoded; equivalent to the lookup-table carry walk (the
    * tables implement binary increment with carry — property-tested in
    * CoreKernelSpec). */
  def q52: String = {
    val B32 = "'0123456789bcdefghjkmnpqrstuvwxyz'"
    def idx(i: Int) = s"(strpos($B32, substr(gh, ${i + 1}, 1)) - 1)"
    def bit(pos: Int) = s"((i${pos / 5} // ${1 << (4 - pos % 5)}) % 2)"
    val gx = (0 until 13).map(j => s"${bit(2 * j)} * ${1L << (12 - j)}").mkString(" + ")
    val gy = (0 until 12).map(j => s"${bit(2 * j + 1)} * ${1L << (11 - j)}").mkString(" + ")
    s"""WITH pts AS ($CustomerPointsSql), g0 AS (
      SELECT c_custkey, ${geohashSql("lat", "lon", 5)} AS gh FROM pts
    ), g1 AS (
      SELECT c_custkey, gh, ${(0 until 5).map(i => s"${idx(i)} AS i$i").mkString(", ")} FROM g0
    ), g2 AS (
      SELECT c_custkey, gh, CAST($gx AS BIGINT) AS gx, CAST($gy AS BIGINT) AS gy FROM g1
    ), g3 AS (
      SELECT c_custkey, gh, gx, gy,
        CAST(gy AS DOUBLE) * CAST(180.0 AS DOUBLE) / 4096.0 - 90.0 AS bs,
        CAST(gx AS DOUBLE) * CAST(360.0 AS DOUBLE) / 8192.0 - 180.0 AS bw,
        CAST(gy + 1 AS DOUBLE) * CAST(180.0 AS DOUBLE) / 4096.0 - 90.0 AS bn,
        CAST(gx + 1 AS DOUBLE) * CAST(360.0 AS DOUBLE) / 8192.0 - 180.0 AS be
      FROM g2
    )
    SELECT c_custkey, gh, (bs + bn) / 2.0 AS clat, (bw + be) / 2.0 AS clon,
      bs, bw, bn, be,
      ${geohashFromXY("g3.gx", "(g3.gy + 1) % 4096", 5)} AS adj_n,
      ${geohashFromXY("(g3.gx + 1) % 8192", "g3.gy", 5)} AS adj_e,
      ${geohashFromXY("g3.gx", "(g3.gy + 4095) % 4096", 5)} AS adj_s,
      ${geohashFromXY("(g3.gx + 8191) % 8192", "g3.gy", 5)} AS adj_w
    FROM g3 ORDER BY c_custkey"""
  }

  // OLC decode of an 11-digit separator-stripped code column: scaled-integer
  // accumulation identical to core.Olc.decode (pair digits MSB-first, grid
  // digit //4 and %4, final places 625 / 256).
  private def olcDigit(dg: String, pos1: Int): String =
    s"CAST(strpos('23456789CFGHJMPQRVWX', substr($dg, $pos1, 1)) - 1 AS BIGINT)"
  private def olcLatValExpr(dg: String): String = {
    val places = (0 until 5).map(k => (25000000L * 400L) / math.pow(20, k + 1).toLong)
    val pairs = (0 until 5).map(k => s"${olcDigit(dg, 2 * k + 1)} * ${places(k)}")
    // -90 * LatIntMult precomputed: the 2-literal product overflows INT32
    s"(${-90L * 25000000L} + ${pairs.mkString(" + ")} + (${olcDigit(dg, 11)} // 4) * 625)"
  }
  private def olcLonValExpr(dg: String): String = {
    val places = (0 until 5).map(k => (8192000L * 400L) / math.pow(20, k + 1).toLong)
    val pairs = (0 until 5).map(k => s"${olcDigit(dg, 2 * k + 2)} * ${places(k)}")
    s"(${-180L * 8192000L} + ${pairs.mkString(" + ")} + (${olcDigit(dg, 11)} % 4) * 256)"
  }

  /** q53: OLC decode / shorten / recover — the full integer decode, the
    * shorten precision ladder (openlocationcode.d:254-290), and
    * recoverNearest's prefix + nudge logic (openlocationcode.d:327-357)
    * mirrored per tier (the per-row offset selects the tier). */
  def q53: String = {
    import graft.core.Olc
    val shortThresh = (1 to 4).map(i => Olc.computeLatitudePrecision(i * 2) * 0.3)
    val prefPrec = (1 to 4).map(i => math.pow(20.0, 2 - (i * 2) / 2.0))
    s"""WITH pts AS ($CustomerPointsSql), b0 AS (
      SELECT c_custkey, lat, lon, ${olcSql("lat", "lon", 11)} AS code,
        CASE WHEN c_custkey % 4 = 0 THEN 0.0002 WHEN c_custkey % 4 = 1 THEN 0.002
             WHEN c_custkey % 4 = 2 THEN 0.02 ELSE 0.5 END AS off
      FROM pts
    ), b1 AS (
      SELECT c_custkey, code, lat + off AS ref_lat, lon + off AS ref_lon,
        replace(code, '+', '') AS dg
      FROM b0
    ), b2 AS (
      SELECT *, ${olcLatValExpr("dg")} AS latval, ${olcLonValExpr("dg")} AS lonval FROM b1
    ), b3 AS (
      SELECT c_custkey, code, ref_lat, ref_lon,
        CAST(latval AS DOUBLE) / 25000000.0 AS ds, CAST(lonval AS DOUBLE) / 8192000.0 AS dw,
        CAST(latval + 625 AS DOUBLE) / 25000000.0 AS dn,
        CAST(lonval + 256 AS DOUBLE) / 8192000.0 AS de
      FROM b2
    ), b4 AS (
      SELECT *, GREATEST(abs(ref_lat - (ds + dn) / 2.0),
        abs(ref_lon - (dw + de) / 2.0)) AS rng FROM b3
    ), b5 AS (
      SELECT *, CASE WHEN rng < ${d(shortThresh(3))} THEN 4
        WHEN rng < ${d(shortThresh(2))} THEN 3
        WHEN rng < ${d(shortThresh(1))} THEN 2
        WHEN rng < ${d(shortThresh(0))} THEN 1 ELSE 0 END AS si
      FROM b4
    ), b6 AS (
      SELECT *, CASE WHEN si > 0 THEN substr(code, 2 * si + 1) ELSE NULL END AS short,
        LEAST(GREATEST(ref_lat, -90.0), 90.0) AS rfc_lat,
        CASE WHEN ref_lon >= 180.0 THEN ref_lon - 360.0
             WHEN ref_lon < -180.0 THEN ref_lon + 360.0 ELSE ref_lon END AS rfc_lon,
        CASE si WHEN 4 THEN ${d(prefPrec(3))} WHEN 3 THEN ${d(prefPrec(2))}
                WHEN 2 THEN ${d(prefPrec(1))} WHEN 1 THEN ${d(prefPrec(0))} END AS pp
      FROM b5
    ), b7 AS (
      SELECT *, substr(${olcSql("rfc_lat", "rfc_lon", 10)}, 1, 2 * si) || short AS recovered
      FROM b6
    ), b8 AS (
      SELECT *, replace(recovered, '+', '') AS rdg FROM b7
    ), b9 AS (
      SELECT *, ${olcLatValExpr("rdg")} AS rlatval, ${olcLonValExpr("rdg")} AS rlonval FROM b8
    ), b10 AS (
      SELECT *,
        (CAST(rlatval AS DOUBLE) / 25000000.0 +
         CAST(rlatval + 625 AS DOUBLE) / 25000000.0) / 2.0 AS rc_lat0,
        (CAST(rlonval AS DOUBLE) / 8192000.0 +
         CAST(rlonval + 256 AS DOUBLE) / 8192000.0) / 2.0 AS rc_lon0
      FROM b9
    ), b11 AS (
      SELECT *,
        CASE WHEN rc_lat0 - rfc_lat > pp / 2.0 AND rc_lat0 - pp > -90.0 THEN rc_lat0 - pp
             WHEN rc_lat0 - rfc_lat < -(pp / 2.0) AND rc_lat0 + pp < 90.0 THEN rc_lat0 + pp
             ELSE rc_lat0 END AS rc_lat,
        CASE WHEN rc_lon0 - rfc_lon > pp / 2.0 THEN rc_lon0 - pp
             WHEN rc_lon0 - rfc_lon < -(pp / 2.0) THEN rc_lon0 + pp
             ELSE rc_lon0 END AS rc_lon
      FROM b10
    ), b12 AS (
      SELECT *, LEAST(GREATEST(rc_lat, -90.0), 90.0) AS e_lat,
        CASE WHEN rc_lon >= 180.0 THEN rc_lon - 360.0
             WHEN rc_lon < -180.0 THEN rc_lon + 360.0 ELSE rc_lon END AS e_lon
      FROM b11
    )
    SELECT c_custkey, code, ds, dw, dn, de, 11 AS dlen, short,
      ${olcSql("e_lat", "e_lon", 11)} AS rec
    FROM b12 ORDER BY c_custkey"""
  }

  /** q54: helmert3 / helmert7 with convention flags / Molodensky-Badekas /
    * registry datum shift (osgb1970) — pure arithmetic mirrors of
    * core.Transform over derived ECEF positions. */
  def q54: String = {
    val e2 = KF * (2.0 - KF)
    val p7 = graft.core.Registry.helmert7ByDatum(6277L)
    val s0 = 1.0 + (-8.3) * 1e-6
    val sMb = 1.0 + (-5.109) * 1e-6
    val sDs = 1.0 + p7.ds * 1e-6
    def arc(vE: String): String = s"($vE / 3600.0) * pi() / 180.0"
    val mbOx = 2464351.59; val mbOy = -5783466.61; val mbOz = 974809.81
    s"""WITH pts AS ($CustomerPointsSql), c1 AS (
      SELECT c_custkey, lat * pi() / 180.0 AS phi, lon * pi() / 180.0 AS lam FROM pts
    ), c2 AS (
      SELECT *, sin(phi) AS sphi, cos(phi) AS cphi,
        ${d(KA)} / sqrt(1.0 - ${d(e2)} * sin(phi) * sin(phi)) AS nu
      FROM c1
    ), e AS (
      SELECT c_custkey, (nu + 0.0) * cphi * cos(lam) AS x, (nu + 0.0) * cphi * sin(lam) AS y,
        (nu * (1.0 - ${d(e2)}) + 0.0) * sphi AS z,
        c_custkey % 2 = 0 AS inv
      FROM c2
    ), hx AS (
      SELECT *,
        CASE WHEN inv THEN 581.99 ELSE -581.99 END AS dx2,
        CASE WHEN inv THEN 105.01 ELSE -105.01 END AS dy2,
        CASE WHEN inv THEN 414.0 ELSE -414.0 END AS dz2,
        ${arc("CASE WHEN inv THEN 1.04 ELSE -1.04 END")} AS rx,
        ${arc("CASE WHEN inv THEN 0.35 ELSE -0.35 END")} AS ry,
        ${arc("CASE WHEN inv THEN -3.08 ELSE 3.08 END")} AS rz,
        CASE WHEN inv THEN ${d(-s0)} ELSE ${d(s0)} END AS sc
      FROM e
    ), mb AS (
      SELECT *, x - ${d(mbOx)} AS sx, y - ${d(mbOy)} AS sy, z - ${d(mbOz)} AS sz,
        ${arc(d(-5.266))} AS mrx, ${arc(d(-1.238))} AS mry, ${arc(d(2.381))} AS mrz
      FROM hx
    ), ds AS (
      SELECT *, ${arc(d(p7.rx))} AS prx, ${arc(d(p7.ry))} AS pry, ${arc(d(p7.rz))} AS prz
      FROM mb
    )
    SELECT c_custkey,
      round(x + 100.5, 4) + 0.0 AS h3x,
      round(dx2 + sc * (x + rz * y - ry * z), 4) + 0.0 AS h7x,
      round(dy2 + sc * (-(rz) * x + y + rx * z), 4) + 0.0 AS h7y,
      round(dz2 + sc * (ry * x - rx * y + z), 4) + 0.0 AS h7z,
      round(${d(-270.933 + mbOx)} + ${d(sMb)} * (sx + mrz * sy - mry * sz), 4) + 0.0 AS mbx,
      round(${d(115.599 + mbOy)} + ${d(sMb)} * (-(mrz) * sx + sy + mrx * sz), 4) + 0.0 AS mby,
      round(${d(-360.226 + mbOz)} + ${d(sMb)} * (mry * sx - mrx * sy + sz), 4) + 0.0 AS mbz,
      round(${d(p7.dx)} + ${d(sDs)} * (x + prz * y - pry * z), 4) + 0.0 AS dsx,
      round(${d(p7.dy)} + ${d(sDs)} * (-(prz) * x + y + prx * z), 4) + 0.0 AS dsy,
      round(${d(p7.dz)} + ${d(sDs)} * (pry * x - prx * y + z), 4) + 0.0 AS dsz
    FROM ds ORDER BY c_custkey"""
  }

  /** q86: registry datum-shift round trip — forward (datum -> WGS84) then
    * the approximate inverse (all seven p7 parameters negated, quirk Q6)
    * mirrored as plain arithmetic over the same derived ECEF positions.
    * The inverse consumes the UNROUNDED forward result, exactly like the
    * engine's chained kernels. */
  def q86: String = {
    val e2 = KF * (2.0 - KF)
    val p7 = graft.core.Registry.helmert7ByDatum(6277L)
    val sF = 1.0 + p7.ds * 1e-6
    val sI = 1.0 + (-p7.ds) * 1e-6
    def arc(v: Double): String = s"(${d(v)} / 3600.0) * pi() / 180.0"
    s"""WITH pts AS ($CustomerPointsSql), c1 AS (
      SELECT c_custkey, lat * pi() / 180.0 AS phi, lon * pi() / 180.0 AS lam FROM pts
    ), c2 AS (
      SELECT *, sin(phi) AS sphi, cos(phi) AS cphi,
        ${d(KA)} / sqrt(1.0 - ${d(e2)} * sin(phi) * sin(phi)) AS nu
      FROM c1
    ), e AS (
      SELECT c_custkey, (nu + 0.0) * cphi * cos(lam) AS x, (nu + 0.0) * cphi * sin(lam) AS y,
        (nu * (1.0 - ${d(e2)}) + 0.0) * sphi AS z
      FROM c2
    ), rr AS (
      SELECT *, ${arc(p7.rx)} AS frx, ${arc(p7.ry)} AS fry, ${arc(p7.rz)} AS frz,
        ${arc(-p7.rx)} AS irx, ${arc(-p7.ry)} AS iry, ${arc(-p7.rz)} AS irz
      FROM e
    ), f AS (
      SELECT c_custkey, irx, iry, irz,
        ${d(p7.dx)} + ${d(sF)} * (x + frz * y - fry * z) AS fx,
        ${d(p7.dy)} + ${d(sF)} * (-(frz) * x + y + frx * z) AS fy,
        ${d(p7.dz)} + ${d(sF)} * (fry * x - frx * y + z) AS fz
      FROM rr
    )
    SELECT c_custkey,
      round(fx, 4) + 0.0 AS fx, round(fy, 4) + 0.0 AS fy, round(fz, 4) + 0.0 AS fz,
      round(${d(-p7.dx)} + ${d(sI)} * (fx + irz * fy - iry * fz), 4) + 0.0 AS ix,
      round(${d(-p7.dy)} + ${d(sI)} * (-(irz) * fx + fy + irx * fz), 4) + 0.0 AS iy,
      round(${d(-p7.dz)} + ${d(sI)} * (iry * fx - irx * fy + fz), 4) + 0.0 AS iz
    FROM f ORDER BY c_custkey"""
  }

  /** q55: abridged Molodensky direct geodetic shift — published formula
    * mirror (Transform.molodenskyAbridged), WGS84 -> International 1924. */
  def q55: String = {
    val e2 = KF * (2.0 - KF)
    val adffda = KA * SparkEntry.MolodenskyDf + KF * 251.0
    s"""WITH pts AS ($CustomerPointsSql), c1 AS (
      SELECT c_custkey, lat, lon, CAST(c_custkey % 3000 AS DOUBLE) AS alt,
        lat * pi() / 180.0 AS phi, lon * pi() / 180.0 AS lam
      FROM pts
    ), c2 AS (
      SELECT *, sin(phi) AS sphi, cos(phi) AS cphi, sin(lam) AS slam, cos(lam) AS clam,
        1.0 - ${d(e2)} * sin(phi) * sin(phi) AS s2
      FROM c1
    ), c3 AS (
      SELECT *, ${d(KA)} / sqrt(s2) AS nn,
        ${d(KA)} * (1.0 - ${d(e2)}) / (s2 * sqrt(s2)) AS m FROM c2
    ), c4 AS (
      SELECT *,
        (-(87.0) * sphi * clam - 98.0 * sphi * slam + 121.0 * cphi +
          ${d(adffda)} * sin(2.0 * phi)) / m AS dphi,
        (-(87.0) * slam + 98.0 * clam) / (nn * cphi) AS dlam,
        87.0 * cphi * clam + 98.0 * cphi * slam + 121.0 * sphi +
          ${d(adffda)} * sphi * sphi - 251.0 AS dh
      FROM c3
    )
    SELECT c_custkey, round(lat + dphi * 180.0 / pi(), 6) + 0.0 AS mlat,
      round(lon + dlam * 180.0 / pi(), 6) + 0.0 AS mlon,
      round(alt + dh, 4) + 0.0 AS mh
    FROM c4 ORDER BY c_custkey"""
  }

  def polysHoledGlob(nDocs: Long): String =
    s"${Corpus.corpusBase(nDocs)}/polys_holed/*.parquet"

  /** q56: spatial join against the multi-ring layer — brute-force even-odd
    * crossing count over ALL rings of each polygon (holes subtract,
    * multipolygon components add, uniformly). */
  def q56(nDocs: Long): String =
    s"""WITH ${parsedCte(docsGlob(nDocs))}, r0 AS (
      SELECT poly_id, UNNEST(rings) AS ring FROM read_parquet(${q(polysHoledGlob(nDocs))})
    ), edges0 AS (
      SELECT poly_id, UNNEST(list_transform(range(1, len(ring) + 1), i -> {
        'yi': ring[i].lat, 'xi': ring[i].lon,
        'yj': ring[CASE WHEN i = 1 THEN len(ring) ELSE i - 1 END].lat,
        'xj': ring[CASE WHEN i = 1 THEN len(ring) ELSE i - 1 END].lon})) AS e
      FROM r0
    ), edges AS (
      SELECT poly_id, e.yi AS yi, e.xi AS xi, e.yj AS yj, e.xj AS xj FROM edges0
    ), hits AS (
      SELECT p.doc_id, p."offset", ed.poly_id,
        count(*) FILTER (WHERE $CrossingCond) AS cr
      FROM parsed p CROSS JOIN edges ed
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, "offset", poly_id FROM hits WHERE cr % 2 = 1
    ORDER BY doc_id, "offset", poly_id"""

  /** q57: streaming tile assignment (Trigger.AvailableNow) == the batch tile
    * assignment — parse + slippy tile id per span. */
  def q57(nDocs: Long): String = {
    val z = 7
    s"""WITH ${parsedCte(docsGlob(nDocs))}
    SELECT doc_id, "offset",
      ${z.toLong << 58} + ${tileXExpr("lon", z)} * ${1L << 29} + ${tileYExpr("lat", z)} AS tile_id
    FROM parsed ORDER BY doc_id, "offset", tile_id"""
  }

  /** q58: n-gram Jaccard over all pairs of the first 20 docs (BIGINT ids —
    * the dedup oracles' shingle CTEs use string ids, so this is standalone). */
  def q58: String =
    s"""WITH d AS (
      SELECT doc_id, $WordsExpr AS words FROM documents WHERE doc_id < 20
    ), s AS (
      SELECT doc_id, CASE WHEN len(words) >= 3
        THEN list_distinct(list_transform(range(1, len(words) - 1), i ->
          concat_ws(' ', words[i], words[i+1], words[i+2])))
        ELSE [array_to_string(words, ' ')] END AS sh
      FROM d
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        GREATEST(CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 1.0), 6) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b"""

  /** q59: streaming tumbling-window counts == the batch aggregation (epoch-
    * aligned 5-minute windows; the DECIMAL-routed sum is exact on both
    * sides, so totals compare raw). */
  def q59: String =
    s"""SELECT (epoch_us(ts) // 300000000) * 300000000 AS ws_us,
      (epoch_us(ts) // 300000000) * 300000000 + 300000000 AS we_us,
      event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2, 3 ORDER BY ws_us, event_type"""

  /** q60: streaming sessionize (flatMapGroupsWithState) == the batch
    * 30-minute gap rule — identical to q18's oracle by construction. */
  def q60: String =
    """WITH x AS (SELECT user_id, epoch_us(ts) AS us,
      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events)
    SELECT user_id, CAST(1 + sum(CASE WHEN prev_us IS NOT NULL AND us - prev_us > 1800000000
      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM x GROUP BY user_id ORDER BY user_id"""

  /** q61: IVF-flat ANN modelled exactly — centroids = vec_id < 16,
    * list assignment by argmax cosine (ties -> smallest cid), queries probe
    * their 4 nearest lists, exact cosine top-10 within the probed lists.
    * Same cosSql accumulation as q43/q44 so ranks are bit-deterministic. */
  def q61: String =
    s"""WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), cent AS (
      SELECT vec_id AS cid, emb AS cemb FROM e ORDER BY vec_id LIMIT 16
    ), assign AS (
      SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${cosSql("e.emb", "c.cemb")} DESC, c.cid) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1
    ), qs AS (
      SELECT 'q' || CAST(vec_id AS VARCHAR) AS qid, emb AS q_emb FROM e WHERE vec_id < 8
    ), probes AS (
      SELECT qid, q_emb, cid FROM (
        SELECT qs.qid, qs.q_emb, c.cid,
          row_number() OVER (PARTITION BY qs.qid
            ORDER BY ${cosSql("qs.q_emb", "c.cemb")} DESC, c.cid) AS crn
        FROM qs CROSS JOIN cent c) WHERE crn <= 4
    ), ranked AS (
      SELECT p.qid, a.vec_id, ${cosSql("a.emb", "p.q_emb")} AS sim,
        row_number() OVER (PARTITION BY p.qid
          ORDER BY ${cosSql("a.emb", "p.q_emb")} DESC, a.vec_id) AS rank
      FROM probes p JOIN assign a ON a.cid = p.cid
    )
    SELECT qid, vec_id, round(sim, 6) + 0.0 AS sim, rank FROM ranked
    WHERE rank <= 10 ORDER BY qid, rank"""

  /** q62: cell/geohash/tile scalar surface. All cell arithmetic is exact
    * dyadic (RAW compare): packed long ids are the base-32 digit value
    * shifted 6 with the level tag; neighbors/ring are +-1 mod the axis size
    * re-encoded (the kernel's lookup-table walk, q52-equivalent); auto
    * precision of a level-5 cell CENTRE is provably 5 (an odd numerator
    * over 2^k is no coarser cell's centre); cover_box of the cell's closed
    * bounds extended one exact cell north/east is the 2x2 walk
    * [cell, E, N, NE]. Tile lat bounds and the derived centre lat are trig
    * (sinh via exp in DuckDB) -> 6dp. */
  def q62: String = {
    val B32 = "'0123456789bcdefghjkmnpqrstuvwxyz'"
    def b32val(colE: String, n: Int): String =
      (0 until n).map { i =>
        s"(strpos($B32, substr($colE, ${i + 1}, 1)) - 1) * ${math.pow(32.0, (n - 1 - i).toDouble).toLong}"
      }.mkString("(", " + ", ")")
    // neighbour cells in the kernel's order [n, ne, e, se, s, sw, w, nw]
    val offs = Seq(
      ("g0.gx", "(g0.gy + 1) % 4096"), ("(g0.gx + 1) % 8192", "(g0.gy + 1) % 4096"),
      ("(g0.gx + 1) % 8192", "g0.gy"), ("(g0.gx + 1) % 8192", "(g0.gy + 4095) % 4096"),
      ("g0.gx", "(g0.gy + 4095) % 4096"), ("(g0.gx + 8191) % 8192", "(g0.gy + 4095) % 4096"),
      ("(g0.gx + 8191) % 8192", "g0.gy"), ("(g0.gx + 8191) % 8192", "(g0.gy + 1) % 4096"))
    val nbCells = offs.map { case (x, y) => geohashFromXY(x, y, 5) }
    def latOf(yy: String): String = {
      val n = s"(pi() - 2.0 * pi() * CAST($yy AS DOUBLE) / 512.0)"
      s"degrees(atan((exp($n) - exp(-$n)) / 2.0))"
    }
    s"""WITH pts AS ($CustomerPointsSql), g0 AS (
      SELECT c_custkey, lat, lon,
        LEAST(CAST(floor((lon + 180.0)/360.0 * 8192) AS BIGINT), 8191) AS gx,
        LEAST(CAST(floor((lat + 90.0)/180.0 * 4096) AS BIGINT), 4095) AS gy,
        ${tileXExpr("lon", 9)} AS tx, ${tileYExpr("lat", 9)} AS ty
      FROM pts
    ), g1 AS (
      SELECT *, ${geohashFromXY("g0.gx", "g0.gy", 5)} AS gh5,
        list_value(${nbCells.mkString(", ")}) AS nbl,
        ${geohashFromXY("(g0.gx + 1)", "g0.gy", 5)} AS ce,
        ${geohashFromXY("g0.gx", "(g0.gy + 1)", 5)} AS cn,
        ${geohashFromXY("(g0.gx + 1)", "(g0.gy + 1)", 5)} AS cne,
        CAST(tx AS DOUBLE) / 512.0 * 360.0 - 180.0 AS tbw_r,
        CAST(tx + 1 AS DOUBLE) / 512.0 * 360.0 - 180.0 AS tbe_r,
        ${latOf("ty + 1")} AS tbs_r, ${latOf("ty")} AS tbn_r
      FROM g0
    )
    SELECT c_custkey, gh5, substr(gh5, 1, 3) AS parent3,
      CAST(${b32val("gh5", 5)} * 64 + 5 AS BIGINT) AS cl5,
      CAST(${b32val("gh5", 3)} * 64 + 3 AS BIGINT) AS c2l3,
      array_to_string(nbl, ',') AS nb,
      array_to_string(list_sort(nbl), ',') AS ring1,
      gh5 AS auto5,
      concat_ws(',', gh5, ce, cn, cne) AS cb,
      round(tbs_r, 6) + 0.0 AS tbs, tbw_r AS tbw,
      round(tbn_r, 6) + 0.0 AS tbn, tbe_r AS tbe,
      round((tbs_r + tbn_r) / 2.0, 6) + 0.0 AS bclat,
      (tbw_r + tbe_r) / 2.0 AS bclon
    FROM g1 ORDER BY c_custkey"""
  }

  /** q63: UTM/registry/validity scalar surface. Forward Krüger (q35's CTE
    * chain) for easting/northing; convergence + scale continue off the kf8
    * intermediates with the Karney eq 23-25 sums term-for-term; st_utm_band
    * is the inverse-Newton chain's lat pushed through the band substr (8°
    * boundary rows filtered identically on both sides — the round trip is
    * within 1e-9°, a boundary-exact lat could floor apart); the registry
    * columns compare against independent EPSG literals (incl. the
    * dropped-decimal bessel1841 semi-major axis the reference also loads
    * unscaled, registry CSV quirk). */
  def q63: String = {
    val alpha = graft.core.Utm.kruegerAlpha(KN)
    val pTerms = (1 to 6).map(j =>
      s" + 2.0 * $j.0 * ${d(alpha(j))} * cos(2.0 * $j.0 * zetap) * ${coshSql(s"2.0 * $j.0 * etap")}").mkString
    val qTerms = (1 to 6).map(j =>
      s" + 2.0 * $j.0 * ${d(alpha(j))} * sin(2.0 * $j.0 * zetap) * ${sinhSql(s"2.0 * $j.0 * etap")}").mkString
    s"""WITH RECURSIVE pts AS ($CustomerPointsSql), p0 AS (
      SELECT * FROM pts WHERE lat % 8 <> 0
    ), z AS (
      SELECT c_custkey, lat, lon, CAST(floor((lon+180.0)/6.0) + 1 AS INT) AS z0,
        substr('CDEFGHJKLMNPQRSTUVWXX', CAST(floor(lat/8.0 + 10.0) AS INT) + 1, 1) AS band
      FROM p0
    ), zz AS (
      SELECT c_custkey, lat, lon, band, $ZoneSql AS zone FROM z
    ), ${kruegerForwardCtes("zz", "kf", Seq("c_custkey", "lat", "lon", "band"))},
    kc AS (
      SELECT c_custkey, lat, zone, tau, cl, lambda, phi, taup, zetap, etap,
        1.0$pTerms AS pp, 0.0$qTerms AS qq
      FROM kf8
    ), kg AS (
      SELECT c_custkey,
        degrees(atan(taup / sqrt(1.0 + taup * taup) * tan(lambda)) + atan2(qq, pp)) AS conv_r,
        ${d(0.9996)} * (sqrt(1.0 - ${d(KE * KE)} * sin(phi) * sin(phi)) *
          sqrt(1.0 + tau * tau) / sqrt(taup * taup + cl * cl)) *
          (${d(KBigA / KA)} * sqrt(pp * pp + qq * qq)) AS k_r,
        ${d(0.9996 * (KA / (1.0 + KN)))} * etap + 500000.0 AS ce_r,
        CASE WHEN ${d(0.9996 * (KA / (1.0 + KN)))} * zetap < 0
          THEN ${d(0.9996 * (KA / (1.0 + KN)))} * zetap + 10000000.0
          ELSE ${d(0.9996 * (KA / (1.0 + KN)))} * zetap END AS cn_r
      FROM kc
    ), ib AS (
      SELECT c_custkey, zone,
        CASE WHEN lat >= 0 THEN 'N' ELSE 'S' END AS hemi, easting, northing
      FROM kf9
    ), ${kruegerInverseCtes("ib", "ki", Seq("c_custkey", "hemi"))}
    SELECT f.c_custkey, f.zone,
      CASE WHEN f.lat >= 0 THEN 'N' ELSE 'S' END AS hemi,
      round(f.easting, 4) + 0.0 AS easting,
      round(f.northing, 4) + 0.0 AS northing,
      round(g.conv_r, 6) + 0.0 AS conv,
      round(g.k_r, 9) + 0.0 AS kscale,
      substr('CDEFGHJKLMNPQRSTUVWXX', CAST(floor(i.lat/8.0 + 10.0) AS INT) + 1, 1) AS band,
      CASE WHEN substr('CDEFGHJKLMNPQRSTUVWXX',
        CAST(floor(f.lat/8.0 + 10.0) AS INT) + 1, 1) >= 'N' THEN 'N' ELSE 'S' END AS bh,
      CAST(123.25 AS DOUBLE) AS ualt,
      f.zone BETWEEN 1 AND 60 AS v_ok,
      (f.zone + 61) BETWEEN 1 AND 60 AS v_zone,
      f.lat BETWEEN -90.0 AND 90.0 AS g_ok,
      (f.lat + 200.0) BETWEEN -90.0 AND 90.0 AS g_lat,
      (f.lat + 200.0) > 90.0 AS gnull,
      TRUE AS unull,
      CAST(6378137.0 AS DOUBLE) AS wa,
      1.0 / CAST('298.257223563' AS DOUBLE) AS wf,
      CAST(6377397155.0 AS DOUBLE) AS ba,
      CAST(6326 AS BIGINT) AS depsg,
      CAST(7030 AS BIGINT) AS deell,
      round(g.ce_r, 4) + 0.0 AS ceasting,
      round(g.cn_r, 4) + 0.0 AS cnorthing
    FROM kf9 f
    JOIN kg g ON g.c_custkey = f.c_custkey
    JOIN kif i ON i.c_custkey = f.c_custkey
    ORDER BY f.c_custkey"""
  }

  /** q64: OLC validity family (outcomes decided by each code's construction
    * per openlocationcode.d:103-152's rules, derived here as constants of
    * the construction — the codes themselves come from the independently
    * verified encoder mirror), st_parse_coord (exact d + (m + s/60)/60 and
    * decimal-comma forms; sign from the cardinal suffix, negatives s/w/o),
    * and the corrected matmul toy (raw per-element dot products,
    * transform.d:38-50 with quirk Q8 fixed). */
  def q64: String =
    s"""WITH pts AS ($CustomerPointsSql), b AS (
      SELECT c_custkey, lat, lon,
        CAST(c_custkey % 90 AS INT) AS dd,
        CAST(c_custkey * 3 % 60 AS INT) AS mm,
        CAST(c_custkey * 7 % 60 AS INT) AS ss,
        ['N','S','E','W'][CAST(c_custkey % 4 AS INT) + 1] AS card
      FROM pts
    )
    SELECT c_custkey,
      TRUE AS v_full, TRUE AS f_full, FALSE AS s_full, FALSE AS p_full,
      TRUE AS v_short, TRUE AS s_short,
      TRUE AS v_pad, TRUE AS p_pad, TRUE AS f_pad,
      FALSE AS v_nosep, FALSE AS v_twosep, FALSE AS v_onedigit,
      (CAST(dd AS DOUBLE) + (CAST(mm AS DOUBLE) + CAST(ss AS DOUBLE) / 60.0) / 60.0) *
        (CASE WHEN card IN ('S','W') THEN -1.0 ELSE 1.0 END) AS pc_dms,
      CAST(replace(CASE WHEN c_custkey % 2 = 0 THEN '-' ELSE '' END ||
        CAST(dd AS VARCHAR) || ',' ||
        lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0'), ',', '.') AS DOUBLE) AS pc_dec,
      CAST(NULL AS DOUBLE) AS pc_bad,
      lat * 1.5 + lon * -0.5 AS mm00,
      lat * 0.25 + lon * 4.0 AS mm01,
      CAST(2.0 * 1.5 + 3.0 * -0.5 AS DOUBLE) AS mm10,
      CAST(2.0 * 0.25 + 3.0 * 4.0 AS DOUBLE) AS mm11,
      TRUE AS mragged
    FROM b ORDER BY c_custkey"""

  /** q65: fixed-level ring covering + its Generator twin. The probe
    * triangle spans exactly [cell, east-neighbour] (its bbox is the two
    * cells' exact dyadic union and both cells contain a triangle vertex),
    * so the covering is the 1x2 coverBox walk with every intersection test
    * trivially true — no Liang-Barsky mirror needed. Altitude pass-through
    * of the full UTM inverse rides along as a constant probe. */
  def q65: String =
    s"""WITH pts AS ($CustomerPointsSql), g0 AS (
      SELECT c_custkey,
        LEAST(CAST(floor((lon + 180.0)/360.0 * 8192) AS BIGINT), 8191) AS gx,
        LEAST(CAST(floor((lat + 90.0)/180.0 * 4096) AS BIGINT), 4095) AS gy
      FROM pts
    ), g1 AS (
      SELECT c_custkey, ${geohashFromXY("g0.gx", "g0.gy", 5)} AS gh5,
        ${geohashFromXY("(g0.gx + 1)", "g0.gy", 5)} AS ce
      FROM g0
    )
    SELECT c_custkey, gh5 || ',' || ce AS cover,
      UNNEST([gh5, ce]) AS gcell,
      CAST(55.5 AS DOUBLE) AS ualt2, TRUE AS gnn
    FROM g1 ORDER BY c_custkey, gcell"""

  /** q66: trigram-profile language ID — per-language score is the
    * rank-weighted sum of non-overlapping trigram occurrence counts
    * ((len - len(replace)) / 3, exactly core.LangId's scan), argmax with
    * ties to the first sorted language, all-zero -> 'und'. The profile
    * literals are generated from the same LangId table the kernel uses;
    * the SCORING is the independent dual implementation. */
  def q66: String = {
    val scores = graft.core.LangId.Profiles.map { case (lang, tris) =>
      val terms = tris.zipWithIndex.map { case (tri, i) =>
        s"${tris.length - i} * ((length(t) - length(replace(t, '${tri.replace("'", "''")}', ''))) // 3)"
      }.mkString(" + ")
      lang -> terms
    }
    val gm = s"greatest(${scores.map("sc_" + _._1).mkString(", ")})"
    val cases = scores.map { case (lang, _) => s"WHEN sc_$lang = gm THEN '$lang'" }.mkString(" ")
    s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
    s AS (SELECT doc_id, t IS NULL AS tnull,
      ${scores.map { case (l, e) => s"($e) AS sc_$l" }.mkString(", ")} FROM d),
    m AS (SELECT *, $gm AS gm FROM s)
    SELECT doc_id, CASE WHEN tnull THEN NULL
      WHEN gm <= 0 THEN 'und' $cases ELSE 'und' END AS lang3
    FROM m ORDER BY doc_id"""
  }

  /** Shared winnowing CTEs d/h/m (k-gram polynomial hashes — base 257,
    * exact BIGINT: codepoints * 257^4 stay under 2^63 — and window-of-w
    * minima). unicode() counts CODEPOINTS, exactly like the kernel's
    * codePointAt loop, so the mirror holds beyond the BMP too — the
    * explicit BIGINT cast matters there: unicode() is INT32 and
    * 0x10FFFF * 257^3 overflows INT32 (ASCII codepoints stayed under 2^31
    * only by luck: 122 * 257^3 = 2.07e9). ONE definition backing both q67
    * and q70 so the two oracles can never silently model different
    * fingerprints than the single st_winnow kernel. */
  private def winnowCtes(docFilter: String, k: Int = 5, w: Int = 4): String = {
    val hash = (0 until k).map { j =>
      s"CAST(unicode(substr(t, i + $j, 1)) AS BIGINT) * ${math.pow(257.0, (k - 1 - j).toDouble).toLong}"
    }.mkString(" + ")
    s"""d AS (SELECT doc_id, lower(text) AS t FROM documents$docFilter),
    h AS (
      SELECT doc_id, CASE WHEN length(t) < $k THEN CAST([] AS BIGINT[]) ELSE
        list_transform(range(1, length(t) - $k + 2), i -> $hash) END AS hs
      FROM d
    ), m AS (
      SELECT doc_id, CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[]) ELSE
        list_transform(range(1, greatest(len(hs) - $w + 1, 1) + 1),
          j -> list_min(hs[j : j + $w - 1])) END AS ms
      FROM h
    )"""
  }

  /** q67: winnowing fingerprints — sorted distinct window minima per doc. */
  def q67: String =
    s"""WITH ${winnowCtes("")}
    SELECT doc_id, array_to_string(list_sort(list_distinct(ms)), ',') AS fps
    FROM m ORDER BY doc_id"""

  /** Driver-table-based oracles added in round 3 (inverse/parse surface +
    * the q58-q67 pipeline rows; no corpus dependency). */
  /** q68: the bucketed co-located join — bucketing changes the PLAN, not
    * the answer, so the oracle is the plain groupBy + join. */
  def q68: String =
    s"""WITH pts AS ($CustomerPointsSql), g AS (
      SELECT c_custkey, ${geohashSql("lat", "lon", 5)} AS cell FROM pts
    ), c AS (SELECT cell, count(*) AS n FROM g GROUP BY cell)
    SELECT g.cell, g.c_custkey, c.n FROM g JOIN c USING (cell)
    ORDER BY g.c_custkey"""

  /** q70: winnowing near-dup — the SAME fingerprint pipeline as q67
    * (shared winnowCtes; doc_id < 200), exploded distinct fingerprints,
    * hot-fp cap via row_number, pair counts with the >= 10 threshold. */
  def q70: String =
    s"""WITH ${winnowCtes(" WHERE doc_id < 200")}, e AS (
      SELECT doc_id, UNNEST(list_distinct(ms)) AS fp FROM m
    ), capped AS (
      SELECT fp, doc_id FROM (
        SELECT fp, doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM e) WHERE rn <= 64
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 10 ORDER BY doc_a, doc_b"""

  /** q72: streaming cross-batch dedup == first occurrence per content hash,
    * which by construction of the staged stream (originals then echoes) is
    * exactly the documents table with its deterministic event times. A
    * broken dedup state would re-emit the 500 echo rows and fail rows+hash. */
  def q72: String =
    """WITH u AS (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text)
    SELECT doc_id, md5(text) AS content_hash,
      1704067200000000 + (CAST(doc_id AS BIGINT) % 1800) * 1000000 AS ts_us
    FROM u ORDER BY doc_id"""

  /** q74: quirk-compat arms Q1/Q4/Q7 (SparkEntry q74 doc):
    * Q1 = compat cardinal signs ('e' negative, 'w' positive) vs correct;
    * Q4 = compat Gauss-Schreiber inverse fed hemisphere 'N' for every row
    *      (the reference's lowercase-'s' test never subtracts false northing);
    * Q7 = the reference's wrap90 formula verbatim vs the correct triangle. */
  def q74: String =
    s"""WITH RECURSIVE base AS (
      SELECT c_custkey,
        CAST(c_custkey % 89 AS VARCHAR) || '.25' AS latb,
        CASE WHEN c_custkey % 2 = 0 THEN 1.0 ELSE -1.0 END AS latsign,
        CAST((c_custkey * 7) % 179 AS VARCHAR) || '.75' AS lonb,
        CASE WHEN c_custkey % 3 = 0 THEN 1.0 ELSE -1.0 END AS lonsign_ok,
        CASE WHEN c_custkey % 3 = 0 THEN -1.0 ELSE 1.0 END AS lonsign_q1,
        CAST(c_custkey % 60 AS INT) + 1 AS zone,
        'N' AS hemi,
        CAST(200000.0 AS DOUBLE) + CAST(c_custkey * 13 % 600000 AS DOUBLE) AS easting,
        CAST(1000000.0 AS DOUBLE) + CAST(c_custkey * 7 % 8000000 AS DOUBLE) AS northing,
        CAST(c_custkey * 11 % 1440 - 720 AS DOUBLE) AS wdeg
      FROM customer
    ), ${kruegerInverseCtes("base", "qc",
        Seq("c_custkey", "latb", "latsign", "lonb", "lonsign_ok", "lonsign_q1", "wdeg"),
        compat = true)},
    w0 AS (
      SELECT *, CASE WHEN wdeg >= 0.0 AND wdeg <= 360.0 THEN wdeg
        ELSE (wdeg % 360.0 + 360.0) % 360.0 END AS w360
      FROM qcf
    )
    SELECT c_custkey,
      CAST(latb AS DOUBLE) * latsign AS lat_ok,
      CAST(lonb AS DOUBLE) * lonsign_ok AS lon_ok,
      CAST(latb AS DOUBLE) * latsign AS lat_q1,
      CAST(lonb AS DOUBLE) * lonsign_q1 AS lon_q1,
      round(lat, 6) + 0.0 AS q4_lat,
      round(lon, 6) + 0.0 AS q4_lon,
      CASE WHEN wdeg >= -90.0 AND wdeg <= 90.0 THEN wdeg
        WHEN w360 <= 90.0 THEN w360
        WHEN w360 <= 270.0 THEN 180.0 - w360
        ELSE w360 - 360.0 END AS w90_ok,
      CASE WHEN wdeg >= -90.0 AND wdeg <= 90.0 THEN wdeg
        ELSE abs((wdeg % 360.0 + 270.0) % 360.0 - 180.0) - 90.0 END AS w90_q7
    FROM w0 ORDER BY c_custkey"""

  /** q80: connected components over the jaccard-thresholded pair graph of
    * the first 20 docs — recursive transitive closure; min reachable id per
    * node = the component representative (graph is undirected). The shingle
    * pipeline is q58's; the 0.008 threshold compares the same round(...,6)
    * value the engine thresholds (integer-ratio division — identical bits
    * on both sides, q58-proven). */
  def q80: String =
    s"""WITH RECURSIVE d AS (
      SELECT doc_id, $WordsExpr AS words FROM documents WHERE doc_id < 20
    ), s AS (
      SELECT doc_id, CASE WHEN len(words) >= 3
        THEN list_distinct(list_transform(range(1, len(words) - 1), i ->
          concat_ws(' ', words[i], words[i+1], words[i+2])))
        ELSE [array_to_string(words, ' ')] END AS sh
      FROM d
    ), pj AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          GREATEST(CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 1.0), 6) AS j
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    ), e AS (
      SELECT a AS src, b AS dst FROM pj WHERE j >= 0.008
      UNION SELECT b AS src, a AS dst FROM pj WHERE j >= 0.008
    ), reach AS (
      SELECT doc_id AS id, doc_id AS r FROM d
      UNION
      SELECT e.dst AS id, reach.r AS r FROM reach JOIN e ON e.src = reach.id
    )
    SELECT id AS doc_id, min(r) AS rep FROM reach GROUP BY id ORDER BY doc_id"""

  /** q82: as-of join — independent correlated-subquery formulation (per
    * click: the view with max (ts, event_id) at-or-before it), vs the
    * engine's single-shuffle union + carry-forward window. */
  def q82: String =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    v AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
      (SELECT v.event_id FROM v WHERE v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_id,
      (SELECT epoch_us(v.ts) FROM v WHERE v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_ts_us
    FROM c ORDER BY c.event_id"""

  /** q84: stream-stream interval join == the batch interval join (clicks x
    * views, same user, view in [click - 1 h, click]). */
  def q84: String =
    """SELECT c.user_id, c.event_id AS l_event, v.event_id AS r_event,
      epoch_us(c.ts) AS l_ts_us, epoch_us(v.ts) AS r_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
        AND v.ts >= c.ts - INTERVAL 3600 SECOND
    ORDER BY l_event, r_event"""

  /** q83: covering compaction — the expected output derived from first
    * principles: the complete g4/g5 child sets cascade into g4 alone, the
    * 31 incomplete east-neighbor children survive verbatim. */
  def q83: String = {
    val chars31 = "0123456789bcdefghjkmnpqrstuvwxyz".drop(1)
      .map(c => s"('$c')").mkString(", ")
    s"""WITH pts AS ($CustomerPointsSql), g0 AS (
      SELECT c_custkey, lat, lon,
        LEAST(CAST(floor((lon + 180.0)/360.0 * 8192) AS BIGINT), 8191) AS gx,
        LEAST(CAST(floor((lat + 90.0)/180.0 * 4096) AS BIGINT), 4095) AS gy
      FROM pts
    ), g1 AS (
      SELECT c_custkey, ${geohashSql("lat", "lon", 4)} AS g4,
        ${geohashFromXY("(g0.gx + 1) % 8192", "g0.gy", 5)} AS ce
      FROM g0
    )
    SELECT c_custkey, g4 AS cell FROM g1
    UNION ALL
    SELECT c_custkey, ce || c AS cell FROM g1 CROSS JOIN (VALUES $chars31) t(c)
    ORDER BY c_custkey, cell"""
  }

  def inverseOracles: Map[String, String] = Map(
    "q72_stream_dedup" -> q72,
    "q80_dedup_components" -> q80,
    "q82_asof_join" -> q82,
    "q83_compact_cover" -> q83,
    "q84_stream_stream_join" -> q84,
    "q74_quirk_compat" -> q74,
    "q75_ann_ivf_trained" -> q43,
    // streaming IVF ingest at full probe == exact brute force (slicing-
    // invariant union index), so q43's oracle applies verbatim
    "q88_stream_ivf_ingest" -> q43,
    // hierarchical quantizer at full probe == exact brute force (every row
    // in exactly one list, all lists probed), q43's oracle again
    "q89_ann_ivf_hier" -> q43,
    "q77_ann_q8" -> q77,
    "q78_ann_ivf_q8" -> q77,
    "q66_langid_ngram" -> q66,
    "q67_winnow" -> q67,
    "q68_bucketed_join" -> q68,
    "q70_winnow_neardup" -> q70,
    "q62_cell_surface" -> q62,
    "q63_utm_registry_surface" -> q63,
    "q64_olc_parse_matmul" -> q64,
    "q65_cover_cells" -> q65,
    "q58_ngram_jaccard" -> q58,
    "q59_stream_window" -> q59,
    "q60_stream_sessionize" -> q60,
    "q61_ann_ivf" -> q61,
    "q48_utm_to_geo" -> q48,
    "q49_mgrs_roundtrip" -> q49,
    "q50_ecef_to_geo" -> q50,
    "q51_parse_utm_mgrs" -> q51,
    "q52_geohash_inverse" -> q52,
    "q53_olc_inverse" -> q53,
    "q54_datum_transforms" -> q54,
    "q55_molodensky" -> q55,
    "q86_datum_shift_inverse" -> q86)

  // ---- q36: tile polyfill (vector->raster covering) ------------------------

  /** q36: tiles at z=9 intersecting each polygon ring — bbox candidates
    * filtered by the exact cell/ring intersection test (corner-or-centre
    * PIP, vertex-in-box, Liang-Barsky edge clip), mirroring
    * Cells.cellIntersectsRing + tileBounds. */
  def q36(nDocs: Long): String =
    polyfillSelect(nDocs) + "\n    ORDER BY poly_id, tile_id"

  /** The q36 body without its ORDER BY — shared verbatim by q92's zone
    * definition so zonal stats and the polyfill gate can never drift. */
  private def polyfillSelect(nDocs: Long): String = {
    val z = 9
    val nT = 1L << z
    def latOf(yy: String): String = { // toDegrees(atan(sinh(pi - 2*pi*yy/n)))
      val arg = s"(pi() - 2.0 * pi() * ($yy) / $nT.0)"
      s"atan(${sinhSql(arg)}) * 180.0 / pi()"
    }
    def pip(latE: String, lonE: String): String =
      s"""count(*) FILTER (WHERE ((yi > $latE) != (yj > $latE))
        AND $lonE < (xj - xi) * ($latE - yi) / (yj - yi) + xi) % 2 = 1"""
    // Liang-Barsky accept for edge (yi,xi)-(yj,xj) vs box [lonW,lonE]x[latS,latN]
    val lb =
      s"""(NOT (((xj - xi) = 0 AND xi - lonW < 0) OR ((xj - xi) = 0 AND lonE - xi < 0)
          OR ((yj - yi) = 0 AND yi - latS < 0) OR ((yj - yi) = 0 AND latN - yi < 0)))
        AND GREATEST(0.0,
          CASE WHEN -(xj - xi) < 0 THEN (xi - lonW) / (-(xj - xi)) ELSE 0.0 END,
          CASE WHEN (xj - xi) < 0 THEN (lonE - xi) / (xj - xi) ELSE 0.0 END,
          CASE WHEN -(yj - yi) < 0 THEN (yi - latS) / (-(yj - yi)) ELSE 0.0 END,
          CASE WHEN (yj - yi) < 0 THEN (latN - yi) / (yj - yi) ELSE 0.0 END)
        <= LEAST(1.0,
          CASE WHEN -(xj - xi) > 0 THEN (xi - lonW) / (-(xj - xi)) ELSE 1.0 END,
          CASE WHEN (xj - xi) > 0 THEN (lonE - xi) / (xj - xi) ELSE 1.0 END,
          CASE WHEN -(yj - yi) > 0 THEN (yi - latS) / (-(yj - yi)) ELSE 1.0 END,
          CASE WHEN (yj - yi) > 0 THEN (latN - yi) / (yj - yi) ELSE 1.0 END)"""
    s"""WITH ${edgesCte(polysGlob(nDocs))}, pb AS (
      SELECT poly_id,
        list_aggregate(list_transform(ring, pp -> pp.lat), 'min') AS blatMin,
        list_aggregate(list_transform(ring, pp -> pp.lat), 'max') AS blatMax,
        list_aggregate(list_transform(ring, pp -> pp.lon), 'min') AS blonMin,
        list_aggregate(list_transform(ring, pp -> pp.lon), 'max') AS blonMax
      FROM read_parquet(${q(polysGlob(nDocs))})
    ), pbt AS (
      SELECT poly_id,
        ${tileXExpr("blonMin", z)} AS x0, ${tileXExpr("blonMax", z)} AS x1,
        ${tileYExpr("blatMax", z)} AS y0, ${tileYExpr("blatMin", z)} AS y1
      FROM pb
    ), cand0 AS (
      SELECT poly_id, UNNEST(flatten(list_transform(range(x0, x1 + 1), xx ->
        list_transform(range(y0, y1 + 1), yy -> {'x': xx, 'y': yy})))) AS txy
      FROM pbt
    ), cand AS (
      SELECT poly_id, txy.x AS x, txy.y AS y,
        ${latOf("txy.y + 1")} AS latS, ${latOf("txy.y")} AS latN,
        txy.x / $nT.0 * 360.0 - 180.0 AS lonW, (txy.x + 1) / $nT.0 * 360.0 - 180.0 AS lonE
      FROM cand0
    ), ce AS (
      SELECT c.poly_id, c.x, c.y, c.latS, c.latN, c.lonW, c.lonE,
        e.yi, e.xi, e.yj, e.xj
      FROM cand c JOIN edges e USING (poly_id)
    ), agg AS (
      SELECT poly_id, x, y,
        ${pip("latS", "lonW")} AS p1, ${pip("latS", "lonE")} AS p2,
        ${pip("latN", "lonW")} AS p3, ${pip("latN", "lonE")} AS p4,
        ${pip("(latS + latN) / 2", "(lonW + lonE) / 2")} AS p5,
        bool_or(yi >= latS AND yi <= latN AND xi >= lonW AND xi <= lonE) AS vin,
        bool_or($lb) AS ein
      FROM ce GROUP BY 1, 2, 3
    )
    SELECT poly_id, ${z.toLong << 58} + x * ${1L << 29} + y AS tile_id
    FROM agg WHERE p1 OR p2 OR p3 OR p4 OR p5 OR vin OR ein"""
  }

  /** q92: zonal statistics — per-polygon aggregates of the z=9 tile
    * raster. Zone = the polyfill covering (q36's formulation, shared
    * verbatim); values = per-tile point counts. All-integer output, so
    * the compare is exact. */
  def q92(nDocs: Long): String = {
    val z = 9
    s"""WITH pf AS (SELECT * FROM (${polyfillSelect(nDocs)})),
    ${parsedCte(docsGlob(nDocs))},
    tc AS (
      SELECT ${z.toLong << 58} + ${tileXExpr("lon", z)} * ${1L << 29} + ${tileYExpr("lat", z)} AS tile_id,
        count(*) AS v
      FROM parsed GROUP BY 1
    )
    SELECT pf.poly_id, count(*) AS n_zone_tiles,
      count(tc.tile_id) AS n_data_tiles,
      CAST(COALESCE(sum(tc.v), 0) AS BIGINT) AS total
    FROM pf LEFT JOIN tc ON pf.tile_id = tc.tile_id
    GROUP BY 1 ORDER BY poly_id"""
  }

  // ---- q37: media metadata stub (md5-derived) ------------------------------

  def q37(nDocs: Long): String =
    s"""WITH spans_t AS (
      SELECT doc_id, UNNEST(spans) AS s FROM read_parquet(${q(docsGlob(nDocs))})
      WHERE doc_id < ${q(f"doc-${SparkEntry.MediaDocCap}%09d")}
    ), m AS (
      SELECT doc_id, s.media_ref AS media_ref, md5(s.media_ref) AS h
      FROM spans_t WHERE s.kind = 'media' AND len(s.media_ref) > 0
    )
    SELECT doc_id, media_ref,
      64 + CAST(${hexVal("h", 1, 5)} % 1024 AS INT) AS width,
      64 + CAST(${hexVal("h", 6, 5)} % 1024 AS INT) AS height,
      1 + CAST(${hexVal("h", 11, 4)} % 16 AS INT) AS n_frames
    FROM m ORDER BY doc_id, media_ref"""

  /** q71: PPM decode — the oracle recomputes the decoded features from the
    * render law (seed = first 8 md5 hex digits; raster byte i = (seed +
    * 31*i) mod 256, so pixel p channel c = (seed + 93p + 31c) mod 256) with
    * the engine's exact op order: Long channel sums, sum -> /3.0 -> /count
    * -> REAL (float32) -> DOUBLE -> round 6. */
  def q71(nDocs: Long): String = {
    def byteAt(off: Int) = s"(seed + 93 * p + $off) % 256"
    def meanChan(off: Int) =
      s"round(CAST(CAST(CAST(list_sum(list_transform(range(0, w*h), p -> ${byteAt(off)})) " +
        s"AS DOUBLE) / (w*h) AS REAL) AS DOUBLE), 6) + 0.0"
    def quad(xlo: String, xhi: String, ylo: String, yhi: String, cnt: String) =
      s"round(CAST(CAST(CAST(list_sum(list_transform(list_filter(range(0, w*h), " +
        s"p -> (p % w) >= $xlo AND (p % w) < $xhi AND (p // w) >= $ylo AND (p // w) < $yhi), " +
        s"p -> ${byteAt(0)} + ${byteAt(31)} + ${byteAt(62)})) AS DOUBLE) / 3.0 / ($cnt) " +
        s"AS REAL) AS DOUBLE), 6) + 0.0"
    s"""WITH spans_t AS (
      SELECT doc_id, UNNEST(spans) AS s FROM read_parquet(${q(docsGlob(nDocs))})
      WHERE doc_id < ${q(f"doc-${SparkEntry.MediaDocCap}%09d")}
    ), m AS (
      SELECT doc_id, s.media_ref AS media_ref, md5(s.media_ref) AS hh
      FROM spans_t WHERE s.kind = 'media' AND len(s.media_ref) > 0
    ), dims AS (
      SELECT doc_id, media_ref,
        8 + CAST(${hexVal("hh", 9, 2)} % 16 AS INT) AS w,
        8 + CAST(${hexVal("hh", 11, 2)} % 16 AS INT) AS h,
        ${hexVal("hh", 1, 8)} AS seed
      FROM m
    )
    SELECT doc_id, media_ref, w AS width, h AS height, CAST(1 AS INT) AS n_frames,
      ${meanChan(0)} AS f0, ${meanChan(31)} AS f1, ${meanChan(62)} AS f2,
      ${quad("0", "w//2", "0", "h//2", "(w//2)*(h//2)")} AS f3,
      ${quad("w//2", "w", "0", "h//2", "(w - w//2)*(h//2)")} AS f4,
      ${quad("0", "w//2", "h//2", "h", "(w//2)*(h - h//2)")} AS f5,
      ${quad("w//2", "w", "h//2", "h", "(w - w//2)*(h - h//2)")} AS f6,
      round(CAST(CAST(CAST(w AS DOUBLE) / h AS REAL) AS DOUBLE), 6) + 0.0 AS f7
    FROM dims ORDER BY doc_id, media_ref"""
  }

  // ---- q40-q42: text family -------------------------------------------------

  private val WordsExpr =
    """list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), w -> len(w) > 0)"""

  /** Shared shingle CTEs: d(doc_id, words) + s(doc_id, sh). */
  private val ShingleCtes =
    s"""d AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, $WordsExpr AS words FROM documents
    ), s AS (
      SELECT doc_id, CASE WHEN len(words) >= 3
        THEN list_distinct(list_transform(range(1, len(words) - 1), i ->
          concat_ws(' ', words[i], words[i+1], words[i+2])))
        ELSE [array_to_string(words, ' ')] END AS sh
      FROM d
    )"""

  /** 16 hex digits of `expr` starting at 1-based `from`, as a HUGEINT in
    * [0, 2^64) — digit products exceed BIGINT at the top position. */
  private def hexVal64(expr: String, from: Int): String =
    (0 until 16).map { k =>
      val mult = java.math.BigInteger.valueOf(16).pow(15 - k)
      s"CAST(strpos('0123456789abcdef', substr($expr, ${from + k}, 1)) - 1 AS HUGEINT) * " +
        s"CAST('$mult' AS HUGEINT)"
    }.mkString("(", " + ", ")")

  /** q40: MinHash+LSH near-duplicate pairs, modelled EXACTLY: per-shingle
    * md5 double hashing (h1 + i*h2 mod 2^64, unsigned min — HUGEINT
    * arithmetic), band buckets = md5 of the signed-rendered signature slice,
    * the maxBucket=64 cap via the same row_number rule, then true-Jaccard
    * verification >= 0.5. No recall assumption: the oracle reproduces the
    * engine's candidate generation bit-for-bit (it also equals uncapped
    * all-pairs Jaccard on the test corpora, verified at sf0.01 and sf0.1). */
  def q40: String = {
    val numHashes = 32
    val bands = 8
    val rows = numHashes / bands
    val two64 = "CAST('18446744073709551616' AS HUGEINT)"
    val two63 = "CAST('9223372036854775808' AS HUGEINT)"
    val minCols = (0 until numHashes).map(i =>
      s"min((h1 + $i * h2) % $two64) AS m$i").mkString(", ")
    def signedStr(m: String): String =
      s"CAST(CASE WHEN $m >= $two63 THEN $m - $two64 ELSE $m END AS VARCHAR)"
    val bucketCols = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => signedStr(s"m${b * rows + r}")).mkString(" || ',' || ")
      s"md5($slice) AS bk$b"
    }.mkString(", ")
    val bucketCase = (0 until bands).map(b =>
      s"WHEN ${b} THEN bk$b").mkString("CASE c.c ", " ", " END")
    s"""WITH $ShingleCtes, shu AS (
      SELECT doc_id, UNNEST(sh) AS g FROM s
    ), ghx AS (
      SELECT doc_id, md5(g) AS gh FROM shu
    ), hh AS (
      SELECT doc_id, ${hexVal64("gh", 1)} AS h1, ${hexVal64("gh", 17)} AS h2 FROM ghx
    ), sig AS (
      SELECT doc_id, $minCols FROM hh GROUP BY doc_id
    ), bk AS (
      SELECT doc_id, $bucketCols FROM sig
    ), banded AS (
      SELECT doc_id, c.c AS band, $bucketCase AS bucket
      FROM bk, (VALUES ${(0 until bands).map(b => s"($b)").mkString(", ")}) c(c)
    ), capped AS (
      SELECT * FROM (
        SELECT doc_id, band, bucket,
          row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS bn
        FROM banded) WHERE bn <= 64
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT p.doc_a, p.doc_b,
        round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          GREATEST(CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 1.0), 6) AS jaccard
      FROM pairs p JOIN s sa ON p.doc_a = sa.doc_id JOIN s sb ON p.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.5
    ORDER BY doc_a, doc_b"""
  }

  /** q41: SimHash near-dup pairs — per-word md5-derived 64-bit hashes, bit
    * votes, 4x16-bit chunk buckets with the engine's maxBucket=64 cap
    * modelled via the same row_number rule, hamming <= 6. */
  def q41: String = {
    val voteCols = (0 until 64).map { b =>
      val hexPos = 16 - b / 4
      val bitDiv = 1 << (b % 4)
      s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(hx, $hexPos, 1)) - 1) // $bitDiv) % 2 = 1 " +
        s"THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    def chunk(c: Int): String =
      (0 until 16).map { k =>
        s"CASE WHEN COALESCE(v${16 * c + k}, 0) > 0 THEN ${1L << k} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val hamming = (0 until 4).map(c => s"bit_count(xor(a.ch$c, b.ch$c))").mkString(" + ")
    s"""WITH w AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, UNNEST($WordsExpr) AS word FROM documents
    ), h AS (
      SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w
    ), v AS (
      SELECT doc_id, $voteCols FROM h GROUP BY doc_id
    ), s AS (
      SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
        ${(0 until 4).map(c => s"${chunk(c)} AS ch$c").mkString(", ")}
      FROM documents d LEFT JOIN v ON CAST(d.doc_id AS VARCHAR) = v.doc_id
    ), chunks AS (
      SELECT doc_id, ch0, ch1, ch2, ch3, c.c AS chunk,
        CASE c.c WHEN 0 THEN ch0 WHEN 1 THEN ch1 WHEN 2 THEN ch2 ELSE ch3 END AS key
      FROM s, (VALUES (0), (1), (2), (3)) c(c)
    ), capped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY chunk, key ORDER BY doc_id) AS bn FROM chunks
      ) WHERE bn <= 64
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, $hamming AS hamming
    FROM capped a JOIN capped b ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE $hamming <= 6 ORDER BY doc_a, doc_b"""
  }

  /** q42: language-ID + quality score + md5 fingerprint (TextOps mirror). */
  def q42: String = {
    val langs = graft.engine.TextOps.StopwordTables.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (lang, words) =>
      s"len(list_intersect(words, [${words.map(q).mkString(", ")}])) AS hits_$lang"
    }.mkString(", ")
    val g = s"GREATEST(${langs.map(l => s"hits_${l._1}").mkString(", ")})"
    val best = langs.map { case (lang, _) =>
      s"WHEN hits_$lang > 0 AND hits_$lang = $g THEN '$lang'"
    }.mkString(" ")
    s"""WITH d AS (
      SELECT doc_id, text, $WordsExpr AS words FROM documents
    ), l AS (
      SELECT doc_id, text, words, $hitCols FROM d
    ), sc AS (
      SELECT doc_id, CASE $best ELSE 'und' END AS lang_pred,
        CAST(length(text) AS DOUBLE) AS nc,
        CAST(len(words) AS DOUBLE) AS nw,
        (CAST(length(text) AS DOUBLE) -
          length(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
          GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        length(regexp_replace(text, '[^\\p{L}]', '', 'g')) /
          GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio,
        md5(array_to_string(words, ' ')) AS fp
      FROM l
    )
    SELECT doc_id, lang_pred,
      round((CASE WHEN nc BETWEEN 20 AND 10000 THEN 1.0
          WHEN nc < 20 THEN nc / 20.0 ELSE 10000.0 / nc END) *
        (CASE WHEN nw >= 5 THEN 1.0 ELSE nw / 5.0 END) *
        (1.0 - punct_ratio) * alpha_ratio, 6) AS quality,
      fp
    FROM sc ORDER BY doc_id"""
  }

  // ---- q43/q44: ANN ---------------------------------------------------------

  /** Cosine fragment mirroring Ann.cosine (ordered dot products, the same
    * 1e-12 floor). */
  private def cosSql(aE: String, bE: String): String =
    s"list_dot_product($aE, $bE) / GREATEST(sqrt(list_dot_product($aE, $aE)) * " +
      s"sqrt(list_dot_product($bE, $bE)), 1e-12)"

  /** q77: int8 scalar-quantized ANN — mirror the quantization law
    * (per-vector min/max affine, q = clamp(floor((x-mn)/scale + 0.5), 255),
    * reconstruction mn + q*scale) over the RAW embeddings, then the same
    * brute-force cosine top-k as q43 on the reconstructions. All plain
    * double arithmetic, so the compare is exact (engine sums and DuckDB
    * list_dot_product accumulate in the same element order). */
  def q77: String =
    s"""WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), qs AS (
      SELECT 'q' || CAST(vec_id AS VARCHAR) AS qid, emb AS q_emb FROM e WHERE vec_id < 8
    ), mm AS (
      SELECT vec_id, emb, list_min(emb) AS mn, list_max(emb) AS mx FROM e
    ), dq AS (
      SELECT vec_id, CASE WHEN mx - mn <= 0 THEN list_transform(emb, x -> mn)
        ELSE list_transform(emb, x ->
          mn + LEAST(floor((x - mn) / ((mx - mn) / 255.0) + 0.5), 255.0)
            * ((mx - mn) / 255.0)) END AS deq
      FROM mm
    ), cand AS (
      SELECT qs.qid, dq.vec_id, ${cosSql("dq.deq", "qs.q_emb")} AS sim
      FROM dq CROSS JOIN qs
    ), ranked AS (
      SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM cand
    )
    SELECT qid, vec_id, round(sim, 6) + 0.0 AS sim, rank FROM ranked
    WHERE rank <= 10 ORDER BY qid, rank"""

  def q43: String =
    s"""WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), qs AS (
      SELECT 'q' || CAST(vec_id AS VARCHAR) AS qid, emb AS q_emb FROM e WHERE vec_id < 8
    ), cand AS (
      SELECT qs.qid, e.vec_id, ${cosSql("e.emb", "qs.q_emb")} AS sim FROM e CROSS JOIN qs
    ), ranked AS (
      SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM cand
    )
    SELECT qid, vec_id, round(sim, 6) + 0.0 AS sim, rank FROM ranked
    WHERE rank <= 10 ORDER BY qid, rank"""

  /** q44: hyperplane-LSH ANN — the identical md5-derived plane constants
    * (Ann.planeComponent), sign-bit band keys, bucket join, cosine top-k. */
  def q44: String = {
    val bands = 16
    val bitsPerBand = 6
    // plane component for (plane p, dim dd): md5('plane:p:dd') first 12 hex
    // digits / 2^47 - 1.0 — identical exact arithmetic to Ann.planeComponent
    val comp = s"CAST(${hexVal("md5('plane:' || CAST(p.p AS VARCHAR) || ':' || CAST(dd AS VARCHAR))", 1, 12)} AS DOUBLE) / ${d(0x800000000000L.toDouble)} - 1.0"
    s"""WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), qs AS (
      SELECT 'q' || CAST(vec_id AS VARCHAR) AS qid, vec_id AS q_vec, emb AS q_emb FROM e WHERE vec_id < 8
    ), planes AS (
      SELECT p.p // $bitsPerBand AS band, p.p % $bitsPerBand AS bit,
        list_transform(range(0, 64), dd -> $comp) AS pl
      FROM range(0, ${bands * bitsPerBand}) p(p)
    ), ck AS (
      SELECT e.vec_id, pl.band,
        sum(CASE WHEN list_dot_product(e.emb, pl.pl) >= 0 THEN 1 << pl.bit ELSE 0 END) AS key
      FROM e CROSS JOIN planes pl GROUP BY 1, 2
    ), qk AS (
      SELECT qs.qid, pl.band,
        sum(CASE WHEN list_dot_product(qs.q_emb, pl.pl) >= 0 THEN 1 << pl.bit ELSE 0 END) AS key
      FROM qs CROSS JOIN planes pl GROUP BY 1, 2
    ), candidates AS (
      SELECT DISTINCT qk.qid, ck.vec_id FROM ck JOIN qk ON ck.band = qk.band AND ck.key = qk.key
    ), cand AS (
      SELECT c.qid, c.vec_id, ${cosSql("e.emb", "qs.q_emb")} AS sim
      FROM candidates c JOIN e ON c.vec_id = e.vec_id JOIN qs ON c.qid = qs.qid
    ), ranked AS (
      SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM cand
    )
    SELECT qid, vec_id, round(sim, 6) + 0.0 AS sim, rank FROM ranked
    WHERE rank <= 10 ORDER BY qid, rank"""
  }

  /** q45: embedding-cosine near-dup — reproduces the SAME hyperplane LSH
    * bucketing (identical md5-derived planes), bucket cap, and cosine
    * verification, so equality holds regardless of LSH recall. */
  def q45: String = {
    val bands = 16
    val bitsPerBand = 6
    val comp = s"CAST(${hexVal("md5('plane:' || CAST(p.p AS VARCHAR) || ':' || CAST(dd AS VARCHAR))", 1, 12)} AS DOUBLE) / ${d(0x800000000000L.toDouble)} - 1.0"
    s"""WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), planes AS (
      SELECT p.p // $bitsPerBand AS band, p.p % $bitsPerBand AS bit,
        list_transform(range(0, 64), dd -> $comp) AS pl
      FROM range(0, ${bands * bitsPerBand}) p(p)
    ), ck AS (
      SELECT e.vec_id, pl.band,
        sum(CASE WHEN list_dot_product(e.emb, pl.pl) >= 0 THEN 1 << pl.bit ELSE 0 END) AS key
      FROM e CROSS JOIN planes pl GROUP BY 1, 2
    ), capped AS (
      SELECT * FROM (
        SELECT vec_id, band, key,
          row_number() OVER (PARTITION BY band, key ORDER BY vec_id) AS bn
        FROM ck) WHERE bn <= 64
    ), pairs AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    ), verified AS (
      SELECT p.vec_a, p.vec_b,
        round(${cosSql("ea.emb", "eb.emb")}, 6) + 0.0 AS cos
      FROM pairs p JOIN e ea ON p.vec_a = ea.vec_id JOIN e eb ON p.vec_b = eb.vec_id
    )
    SELECT vec_a, vec_b, cos FROM verified WHERE cos >= 0.2 ORDER BY vec_a, vec_b"""
  }

  /** q46: whitespace + BPE-ish token counts (TextOps.tokenCounts mirror;
    * the whitespace class is spelled out on both sides because Java \\s and
    * RE2 \\s disagree on vertical tab). */
  def q46: String =
    s"""SELECT doc_id,
      len(list_filter(regexp_split_to_array(text, ${q(graft.engine.TextOps.WsClass + "+")}),
        w -> len(w) > 0)) AS n_ws_tokens,
      len(regexp_extract_all(text, ${q(graft.engine.TextOps.BpeTokenRx)})) AS n_bpe_tokens
    FROM documents ORDER BY doc_id"""

  /** q47: Vincenty inverse geodesic distance — the iteration mirrored as a
    * recursive CTE (same expression tree per step, same 1e-12 convergence
    * test on lambda, same 200-iteration bound; non-converged points drop out
    * on both sides). Each recursive row carries the quantities computed FROM
    * the pre-update lambda, exactly like the kernel's loop state. */
  def q47: String = {
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val b = a * (1.0 - f)
    val lat2 = 48.8566
    val lon2 = 2.3522
    s"""WITH RECURSIVE pts AS ($CustomerPointsSql), base AS (
      SELECT c_custkey,
        atan((1.0 - ${d(f)}) * tan(lat * pi() / 180.0)) AS u1,
        atan((1.0 - ${d(f)}) * tan(${d(lat2)} * pi() / 180.0)) AS u2,
        (${d(lon2)} - lon) * pi() / 180.0 AS l
      FROM pts
    ), b2 AS (
      SELECT c_custkey, l, sin(u1) AS su1, cos(u1) AS cu1, sin(u2) AS su2, cos(u2) AS cu2
      FROM base
    ), it AS (
      SELECT c_custkey, l, su1, cu1, su2, cu2,
        l AS lambda,
        CAST(NULL AS DOUBLE) AS sinSigma, CAST(NULL AS DOUBLE) AS cosSigma,
        CAST(NULL AS DOUBLE) AS sigma, CAST(NULL AS DOUBLE) AS cosSqAlpha,
        CAST(NULL AS DOUBLE) AS cos2SigmaM,
        false AS done, 0 AS iter
      FROM b2
      UNION ALL
      SELECT c_custkey, l, su1, cu1, su2, cu2,
        newLambda AS lambda,
        s_sinSigma AS sinSigma, s_cosSigma AS cosSigma, s_sigma AS sigma,
        s_cosSqAlpha AS cosSqAlpha, s_cos2SigmaM AS cos2SigmaM,
        abs(newLambda - lambda) < 1e-12 AS done, iter + 1 AS iter
      FROM (
        SELECT *,
          sqrt((cu2 * sl) * (cu2 * sl) +
            (cu1 * su2 - su1 * cu2 * cl) * (cu1 * su2 - su1 * cu2 * cl)) AS s_sinSigma,
          su1 * su2 + cu1 * cu2 * cl AS s_cosSigma,
          atan2(s_sinSigma, s_cosSigma) AS s_sigma,
          cu1 * cu2 * sl / s_sinSigma AS s_sinAlpha,
          1.0 - s_sinAlpha * s_sinAlpha AS s_cosSqAlpha,
          CASE WHEN s_cosSqAlpha = 0.0 THEN 0.0
            ELSE s_cosSigma - 2.0 * su1 * su2 / s_cosSqAlpha END AS s_cos2SigmaM,
          ${d(f)} / 16.0 * s_cosSqAlpha * (4.0 + ${d(f)} * (4.0 - 3.0 * s_cosSqAlpha)) AS s_c,
          l + (1.0 - s_c) * ${d(f)} * s_sinAlpha *
            (s_sigma + s_c * s_sinSigma * (s_cos2SigmaM +
              s_c * s_cosSigma * (-1.0 + 2.0 * s_cos2SigmaM * s_cos2SigmaM))) AS newLambda
        FROM (SELECT *, sin(lambda) AS sl, cos(lambda) AS cl FROM it
              WHERE NOT done AND iter < 200)
      )
    ), fin AS (
      SELECT c_custkey, sinSigma, cosSigma, sigma, cosSqAlpha, cos2SigmaM,
        cosSqAlpha * (${d(a)} * ${d(a)} - ${d(b)} * ${d(b)}) / (${d(b)} * ${d(b)}) AS uSq
      FROM it WHERE done
    ), ab AS (
      SELECT c_custkey, sinSigma, cosSigma, sigma, cos2SigmaM,
        1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq))) AS bigA,
        uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq))) AS bigB
      FROM fin
    )
    SELECT c_custkey,
      round(${d(b)} * bigA * (sigma - bigB * sinSigma * (cos2SigmaM + bigB / 4.0 *
        (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
          bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) *
            (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))), 3) + 0.0 AS dist_m
    FROM ab ORDER BY c_custkey"""
  }

  // ---- trajectory / spatial-statistics / layout oracles (q93-q98) ---------

  /** Initial great-circle bearing mirroring K.bearing: degrees from
    * atan2(sin dl * cos p2, cos p1 * sin p2 - sin p1 * cos p2 * cos dl),
    * wrapped to [0, 360] with GeoMath.wrap360's pass-through-then-%%
    * structure (DuckDB's % matches Java's). */
  def bearingSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val b = s"(atan2(sin(radians($lon2 - $lon1)) * cos(radians($lat2)), " +
      s"cos(radians($lat1)) * sin(radians($lat2)) - " +
      s"sin(radians($lat1)) * cos(radians($lat2)) * cos(radians($lon2 - $lon1))) " +
      s"* 180.0 / pi())"
    s"(CASE WHEN $b >= 0.0 AND $b <= 360.0 THEN $b ELSE ($b % 360.0 + 360.0) % 360.0 END)"
  }

  private def wrap180Sql(e: String): String =
    s"(CASE WHEN $e >= -180.0 AND $e <= 180.0 THEN $e ELSE ($e % 360.0 + 540.0) % 360.0 - 180.0 END)"

  /** Morton key mirroring K.zorder: quantize each axis to 2^bits cells
    * (floor, clamped), interleave lon into even and lat into odd bits. */
  def zorderSql(lat: String, lon: String, bits: Int): String = {
    val n = 1L << bits
    val x = s"LEAST(GREATEST(CAST(floor(($lon + 180.0) / 360.0 * ${n}.0) AS BIGINT), 0), ${n - 1})"
    val y = s"LEAST(GREATEST(CAST(floor(($lat + 90.0) / 180.0 * ${n}.0) AS BIGINT), 0), ${n - 1})"
    val terms = (0 until bits).flatMap(i => Seq(
      s"((zx // ${1L << i}) % 2) * ${1L << (2 * i)}",
      s"((zy // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"))
    s"(SELECT ${terms.mkString(" + ")} FROM (SELECT $x AS zx, $y AS zy) zq)"
  }

  /** Per-track lag frame shared by q93/q94/q95: each parsed point with its
    * predecessor on the same doc in offset order. */
  private def legsCte(nDocs: Long): String =
    s"""${parsedCte(docsGlob(nDocs))}, lg AS (
      SELECT doc_id, "offset", lat, lon,
        lag(lat) OVER (PARTITION BY doc_id ORDER BY "offset") AS p_lat,
        lag(lon) OVER (PARTITION BY doc_id ORDER BY "offset") AS p_lon
      FROM parsed
    )"""

  /** q93: per-track stats — Track.stats mirrored (leg-sum length, first->
    * last net displacement via arg_min/arg_max, mm rounding before the
    * sinuosity ratio). */
  def q93(nDocs: Long): String =
    s"""WITH ${legsCte(nDocs)}, agg AS (
      SELECT doc_id, count(*) AS n_points,
        COALESCE(SUM(CASE WHEN p_lat IS NOT NULL THEN
          ${haversineSql("p_lat", "p_lon", "lat", "lon")} END), 0.0) AS len_raw,
        arg_min(lat, "offset") AS alat, arg_min(lon, "offset") AS alon,
        arg_max(lat, "offset") AS blat, arg_max(lon, "offset") AS blon
      FROM lg GROUP BY doc_id
    ), r AS (
      SELECT doc_id, n_points, round(len_raw, 3) + 0.0 AS length_m,
        round(${haversineSql("alat", "alon", "blat", "blon")}, 3) + 0.0 AS net_m
      FROM agg
    )
    SELECT doc_id, n_points, length_m, net_m,
      CASE WHEN net_m > 0.0 THEN round(length_m / net_m, 6) + 0.0 END AS sinuosity
    FROM r ORDER BY doc_id"""

  /** q94: per-leg bearing + spherical direct problem (to the great-circle
    * leg MIDPOINT — the full replay lands exactly on the DMS grid's
    * 6-decimal rounding half-ties), both formulas mirrored
    * operation-for-operation (K.bearing / K.destination). */
  def q94(nDocs: Long): String = {
    val r = d(6371008.8)
    s"""WITH ${legsCte(nDocs)}, br AS (
      SELECT doc_id, "offset", p_lat, p_lon,
        ${bearingSql("p_lat", "p_lon", "lat", "lon")} AS brg,
        ${haversineSql("p_lat", "p_lon", "lat", "lon")} AS leg
      FROM lg WHERE p_lat IS NOT NULL
    ), dv AS (
      SELECT doc_id, "offset", brg, leg,
        sin(radians(p_lat)) AS sp1, cos(radians(p_lat)) AS cp1,
        leg / 2.0 / $r AS dl, radians(brg) AS th, radians(p_lon) AS lm1
      FROM br
    ), dv2 AS (
      SELECT doc_id, "offset", brg, leg, sp1, cp1, dl, th, lm1,
        LEAST(1.0, GREATEST(-1.0, sp1 * cos(dl) + cp1 * sin(dl) * cos(th))) AS sp2
      FROM dv
    )
    SELECT doc_id, "offset",
      round(brg, 6) + 0.0 AS bearing_deg,
      round(leg, 3) + 0.0 AS leg_m,
      round(asin(sp2) * 180.0 / pi(), 6) + 0.0 AS mid_lat,
      round(${wrap180Sql("((lm1 + atan2(sin(th) * sin(dl) * cp1, cos(dl) - sp1 * sp2)) * 180.0 / pi())")}, 6) + 0.0 AS mid_lon
    FROM dv2 ORDER BY doc_id, "offset""""
  }

  /** q95: geofence transitions — inside = LEAST of the 20 hub haversines
    * <= 25 km, flip detection on the lag frame. */
  def q95(nDocs: Long): String = {
    def insideExpr(la: String, lo: String): String = {
      val ds = Corpus.Hotspots.map { case (hla, hlo) =>
        haversineSql(d(hla), d(hlo), la, lo)
      }
      s"(LEAST(${ds.mkString(", ")}) <= 25000.0)"
    }
    s"""WITH ${legsCte(nDocs)}, f AS (
      SELECT doc_id, "offset", lat, lon,
        ${insideExpr("lat", "lon")} AS inside,
        CASE WHEN p_lat IS NULL THEN NULL
          ELSE ${insideExpr("p_lat", "p_lon")} END AS p_inside
      FROM lg
    )
    SELECT doc_id, "offset", lat, lon,
      CASE WHEN inside THEN 'enter' ELSE 'exit' END AS transition
    FROM f WHERE p_inside IS NOT NULL AND p_inside <> inside
    ORDER BY doc_id, "offset""""
  }

  /** q96: OD matrix — per-doc first/last z=5 tile via arg_min/arg_max. */
  def q96(nDocs: Long): String = {
    val z = 5
    val tid = s"${z.toLong << 58} + ${tileXExpr("lon", z)} * ${1L << 29} + ${tileYExpr("lat", z)}"
    s"""WITH ${parsedCte(docsGlob(nDocs))}, tg AS (
      SELECT doc_id, arg_min($tid, "offset") AS o_tile, arg_max($tid, "offset") AS d_tile
      FROM parsed GROUP BY doc_id
    )
    SELECT o_tile, d_tile, count(*) AS n_tracks FROM tg
    GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** q97: Getis-Ord Gi* over the z=6 raster — 3x3 observed-window sums via
    * the q91-style neighbour scatter, globals from a 1-row aggregate;
    * formula mirrored in Tiler.hotspotGi's association order. */
  def q97(nDocs: Long): String = {
    val z = 6
    val n = 1L << z
    val mean = "(sv / n)"
    val s0 = s"sqrt(svv / n - $mean * $mean)"
    val den = s"($s0 * sqrt((n * wn - wn * wn) / (n - 1.0)))"
    s"""WITH ${parsedCte(docsGlob(nDocs))}, t AS (
      SELECT ${tileXExpr("lon", z)} AS x, ${tileYExpr("lat", z)} AS y,
        CAST(count(*) AS DOUBLE) AS v
      FROM parsed GROUP BY 1, 2
    ), g AS (
      SELECT count(*) AS n, SUM(v) AS sv, SUM(v * v) AS svv FROM t
    ), o(dx, dy) AS (VALUES
      (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
    ), sc AS (
      SELECT (x + dx + $n) % $n AS nx, y + dy AS ny, v
      FROM t CROSS JOIN o WHERE y + dy BETWEEN 0 AND ${n - 1}
    ), ws AS (
      SELECT nx, ny, SUM(v) AS wsum, count(*) AS wn FROM sc GROUP BY 1, 2
    )
    SELECT ${z.toLong << 58} + t.x * ${1L << 29} + t.y AS tile_id, ws.wn,
      CAST(ws.wsum AS BIGINT) AS wsum,
      CASE WHEN $den > 0.0 THEN round((wsum - $mean * wn) / $den, 6) + 0.0 END AS gi
    FROM t JOIN ws ON t.x = ws.nx AND t.y = ws.ny CROSS JOIN g
    ORDER BY tile_id"""
  }

  /** q99: global Moran's I — queen contiguity over observed z=6 tiles,
    * isolated tiles kept via LEFT JOIN (wn = 0), association order mirroring
    * Tiler.moranI: (n / W) * num / den. */
  def q99(nDocs: Long): String = {
    val z = 6
    val n = 1L << z
    val mean = "(sv / n)"
    s"""WITH ${parsedCte(docsGlob(nDocs))}, t AS (
      SELECT ${tileXExpr("lon", z)} AS x, ${tileYExpr("lat", z)} AS y,
        CAST(count(*) AS DOUBLE) AS v
      FROM parsed GROUP BY 1, 2
    ), g AS (
      SELECT count(*) AS n, SUM(v) AS sv FROM t
    ), o(dx, dy) AS (VALUES
      (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)
    ), sc AS (
      SELECT (x + dx + $n) % $n AS nx, y + dy AS ny, v
      FROM t CROSS JOIN o WHERE y + dy BETWEEN 0 AND ${n - 1}
    ), ws AS (
      SELECT nx, ny, SUM(v) AS nsum, count(*) AS wn FROM sc GROUP BY 1, 2
    ), j AS (
      SELECT t.v, COALESCE(ws.nsum, 0.0) AS nsum, COALESCE(ws.wn, 0) AS wn
      FROM t LEFT JOIN ws ON t.x = ws.nx AND t.y = ws.ny
    )
    SELECT count(*) AS n_tiles, CAST(SUM(wn) AS BIGINT) AS w_pairs,
      CASE WHEN SUM(wn) > 0 AND SUM((v - $mean) * (v - $mean)) > 0.0
        THEN round(count(*) / SUM(wn) * SUM((v - $mean) * (nsum - wn * $mean))
          / SUM((v - $mean) * (v - $mean)), 6) + 0.0 END AS moran_i
    FROM j CROSS JOIN g GROUP BY n, sv"""
  }

  /** q101: gridded IDW — per scattered (point, window-tile) pair the
    * distance to the tile CENTRE (st_tile_center mirrored; sinh via exp),
    * then the weighted-mean ratio. DECIMAL traps: (nx + 0.5) must go
    * through CAST(... AS DOUBLE) or DuckDB runs exact decimal arithmetic. */
  def q101(nDocs: Long): String = {
    val z = 7
    val n = 1L << z
    val cLat = s"(atan(${sinhSql(s"(pi() - 2.0 * pi() * (CAST(ny AS DOUBLE) + 0.5) / $n.0)")}) * 180.0 / pi())"
    val cLon = s"((CAST(nx AS DOUBLE) + 0.5) / $n.0 * 360.0 - 180.0)"
    s"""WITH ${parsedCte(docsGlob(nDocs))}, pv AS (
      SELECT lat, lon, CAST("offset" + 1 AS DOUBLE) AS v,
        ${tileXExpr("lon", z)} AS x, ${tileYExpr("lat", z)} AS y
      FROM parsed
    ), o(dx, dy) AS (VALUES
      (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
    ), sc AS (
      SELECT (x + dx + $n) % $n AS nx, y + dy AS ny, lat, lon, v
      FROM pv CROSS JOIN o WHERE y + dy BETWEEN 0 AND ${n - 1}
    ), cd AS (
      SELECT nx, ny, v, ${haversineSql(cLat, cLon, "lat", "lon")} AS dist FROM sc
    )
    SELECT ${z.toLong << 58} + nx * ${1L << 29} + ny AS tile_id,
      count(*) AS n_contrib,
      round(SUM(v / (dist * dist)) / SUM(1.0 / (dist * dist)), 6) + 0.0 AS est
    FROM cd WHERE dist > 0.0 GROUP BY 1 ORDER BY tile_id"""
  }

  /** q102: Hilbert layout — K.hilbert's xy2d fold replayed as `bits`
    * chained CTE steps, each one rot + quadrant-accumulate over the
    * previous step's (x, y, d). All-integer, so the compare is exact.
    * NOTE DuckDB's ^ is exponentiation; bitwise xor is xor(a, b). */
  def q102(nDocs: Long): String = {
    val bits = 16
    val n = 1L << bits
    val x0 = s"LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * ${n}.0) AS BIGINT), 0), ${n - 1})"
    val y0 = s"LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * ${n}.0) AS BIGINT), 0), ${n - 1})"
    val steps = (0 until bits).map { i =>
      val s = n >> (i + 1)
      s"""k${i + 1} AS (
      SELECT pid, lat, lon,
        CASE WHEN (y // $s) % 2 = 0 THEN
          (CASE WHEN (x // $s) % 2 = 1 THEN $n - 1 - y ELSE y END) ELSE x END AS x,
        CASE WHEN (y // $s) % 2 = 0 THEN
          (CASE WHEN (x // $s) % 2 = 1 THEN $n - 1 - x ELSE x END) ELSE y END AS y,
        d + ${s * s} * xor(3 * ((x // $s) % 2), (y // $s) % 2) AS d
      FROM k$i)"""
    }.mkString(",\n    ")
    s"""WITH ${parsedCte(docsGlob(nDocs))}, k0 AS (
      SELECT doc_id || ':' || CAST("offset" AS VARCHAR) AS pid, lat, lon,
        $x0 AS x, $y0 AS y, CAST(0 AS BIGINT) AS d
      FROM parsed
      WHERE lat >= ${d(-34.9)} AND lat <= ${d(-32.9)}
        AND lon >= ${d(150.2)} AND lon <= ${d(152.2)}
    ),
    $steps
    SELECT pid, d AS hkey, lat, lon FROM k$bits ORDER BY pid"""
  }

  /** q98: the z-ordered-layout bbox read must equal a plain bbox filter
    * over the corpus, with the stored Morton key re-derived independently. */
  def q98(nDocs: Long): String =
    s"""WITH ${parsedCte(docsGlob(nDocs))}
    SELECT doc_id || ':' || CAST("offset" AS VARCHAR) AS pid,
      ${zorderSql("lat", "lon", 16)} AS zkey, lat, lon
    FROM parsed
    WHERE lat >= ${d(40.2)} AND lat <= ${d(41.2)}
      AND lon >= ${d(-74.6)} AND lon <= ${d(-73.4)}
    ORDER BY pid"""

  /** All engine-layer oracles for the corpus size the verify run uses. */
  def engineOracles(nDocs: Long): Map[String, String] = Map(
    "q30_parse_extract" -> q30(nDocs),
    "q31_spatial_join" -> q31(nDocs),
    "q73_spatial_semi_anti" -> q73(nDocs),
    "q76_multizoom_rollup" -> q76(nDocs),
    "q79_tile_pyramid" -> q79(nDocs),
    // q87 streams to the same final state as the batch pyramid (additive
    // counts), so it shares q79's direct-from-points oracle verbatim
    "q87_stream_pyramid" -> q79(nDocs),
    "q81_ring_metrics" -> q81(nDocs),
    "q85_distance_join" -> q85(nDocs),
    "q90_dbscan" -> q90(nDocs),
    "q91_focal_smooth" -> q91(nDocs),
    "q92_zonal_stats" -> q92(nDocs),
    "q93_track_stats" -> q93(nDocs),
    "q94_bearing_destination" -> q94(nDocs),
    "q95_geofence_transitions" -> q95(nDocs),
    "q96_od_matrix" -> q96(nDocs),
    "q97_hotspot_gi" -> q97(nDocs),
    "q98_zorder_layout" -> q98(nDocs),
    "q99_moran_i" -> q99(nDocs),
    "q101_idw" -> q101(nDocs),
    "q102_hilbert_layout" -> q102(nDocs),
    // streaming geofence reaches the same transition set as the batch
    // operator (state carries last-inside across batches), so it shares
    // q95's oracle verbatim
    "q100_stream_geofence" -> q95(nDocs),
    "q32_spatial_join_salted" -> q32(nDocs),
    "q33_tile_histogram" -> q33(nDocs),
    "q34_knn" -> q34(nDocs),
    // the range-join variant must produce the identical PIP pair set
    "q38_spatial_join_range" -> q31(nDocs),
    "q39_dedup_exact_groups" ->
      ("""SELECT content_hash, doc_id, n FROM (
        SELECT md5(text) AS content_hash, doc_id,
          count(*) OVER (PARTITION BY md5(text)) AS n
        FROM documents)
      WHERE n > 1 ORDER BY content_hash, doc_id"""),
    "q35_geohash_olc_mgrs" -> q35,
    "q36_polyfill" -> q36(nDocs),
    "q37_media_features" -> q37(nDocs),
    "q40_dedup_minhash" -> q40,
    "q41_dedup_simhash" -> q41,
    "q42_lang_quality" -> q42,
    "q43_ann_topk" -> q43,
    "q44_ann_lsh" -> q44,
    "q45_embed_neardup" -> q45,
    "q46_token_counts" -> q46,
    "q47_vincenty" -> q47,
    "q56_pip_multiring" -> q56(nDocs),
    "q57_stream_tiles" -> q57(nDocs),
    // the stream-static join must produce the identical PIP pair set
    "q69_stream_spatial_join" -> q31(nDocs),
    "q71_media_ppm_decode" -> q71(nDocs)
  )
}
