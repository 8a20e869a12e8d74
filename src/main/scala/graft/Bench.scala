package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  * Also reports flagship spatial-pipeline throughput in docs/sec (the
  * BASELINE.json metric). */
object Bench {

  /** Benched surface: flagship spatial pipeline + relational + pipeline ops
    * (the round-1..3 set), widened in round 4 with the inverse/parse surface
    * (q49-q55), the text/media operators (q66/q67/q70/q71) and the round-4
    * additions (q73/q75-q83/q85), and in round 5 with the remaining cheap
    * batch rows (q58, q62-q65) plus the new q86 and q89 — every
    * non-streaming gate
    * query is now benched, so a regression anywhere on the scalar or
    * pipeline surface shows up in BENCH_r*.json. The seven streaming rows
    * (q57/q59/q60/q72/q84/q87/q88) are excluded on purpose: their wall time
    * is dominated by sink/checkpoint staging I/O, not operator cost (stated
    * in BASELINE.md). */
  val HeadlineQueries: Seq[String] = Seq(
    "q31_spatial_join", "q33_tile_histogram", "q32_spatial_join_salted",
    "q01_pricing_agg", "q02_join_nation_revenue", "q08_tile_agg",
    "q34_knn", "q40_dedup_minhash", "q43_ann_topk", "q30_parse_extract",
    "q38_spatial_join_range", "q45_embed_neardup", "q46_token_counts",
    "q36_polyfill", "q41_dedup_simhash", "q47_vincenty",
    "q48_utm_to_geo", "q56_pip_multiring", "q61_ann_ivf",
    "q49_mgrs_roundtrip", "q50_ecef_to_geo", "q51_parse_utm_mgrs",
    "q52_geohash_inverse", "q53_olc_inverse", "q54_datum_transforms",
    "q55_molodensky", "q66_langid_ngram", "q67_winnow",
    "q70_winnow_neardup", "q71_media_ppm_decode",
    "q73_spatial_semi_anti", "q75_ann_ivf_trained", "q76_multizoom_rollup",
    "q77_ann_q8", "q78_ann_ivf_q8", "q79_tile_pyramid", "q80_dedup_components",
    "q81_ring_metrics", "q82_asof_join", "q83_compact_cover", "q85_distance_join",
    "q58_ngram_jaccard", "q62_cell_surface", "q63_utm_registry_surface",
    "q64_olc_parse_matmul", "q65_cover_cells", "q86_datum_shift_inverse",
    "q89_ann_ivf_hier", "q90_dbscan", "q91_focal_smooth", "q92_zonal_stats",
    "q93_track_stats", "q94_bearing_destination", "q95_geofence_transitions",
    "q96_od_matrix", "q97_hotspot_gi", "q98_zorder_layout", "q99_moran_i",
    "q101_idw", "q102_hilbert_layout")

  /** Per-query wall seconds: min of three runs (first run pays codegen/JIT;
    * the machine is shared and neighbor tenants cause multi-second stalls —
    * measured 10x outliers — so a single or even double sample is unusable).
    * A query that throws is recorded in `failed` — NOT silently timed as if
    * it had succeeded — and excluded from the per-query map and the total. */
  def run(spark: SparkSession, sfDir: String,
          names: Seq[String]): (Map[String, Double], Seq[String]) = {
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, times.map(_._1).min, times.forall(_._2))
    }
    (results.collect { case (n, t, true) => n -> t }.toMap,
      results.collect { case (n, _, false) => n })
  }

  /** Flagship pipeline over stored parquet: extract -> cell join -> PIP ->
    * per-polygon doc counts. The polygon index is built once per layer
    * (pass `index`) — the per-query cost a production deployment pays.
    * Joins via [[graft.engine.SpatialJoin.joinRangeWithIndex]] (prefix
    * range join): one probe row per point regardless of how many covering
    * levels the layer mixes, where the per-level explode join multiplies
    * the fact-side probe stream — measured 0.75 vs 0.99 s on the join
    * phase at 1M docs with the 2-level hotspot layer, identical output
    * rows (the explode variant stays benched as q31). */
  def flagshipFromParquet(spark: SparkSession, docsPath: String, polysPath: String,
                          index: Option[graft.engine.SpatialJoin.PolygonIndex] = None): Long = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(docsPath)
    val idx = index.getOrElse(
      graft.engine.SpatialJoin.buildIndex(spark.read.parquet(polysPath)))
    graft.engine.SpatialJoin.joinRangeWithIndex(graft.engine.SpatialJoin.extractPoints(docs), idx)
      .groupBy(col("poly_id"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_points"))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "524288")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.register(spark)

    // warm: JIT + codegen caches on the small corpus, and materialize the
    // stored corpus for this scale so query timings exclude generation
    SparkEntry.entry(spark).count()
    val nDocs = SparkEntry.corpusDocs(sfDir)
    val (docsPath, polysPath) = graft.engine.Corpus.ensure(spark, nDocs)

    val (results, failed) = run(spark, sfDir, HeadlineQueries)
    // flagship throughput over stored parquet (generation excluded); the
    // polygon index is built+cached once per layer version (the static-layer
    // production cost model, same as graft.Scaling); warm once, then
    // best-of-3 against neighbor-tenant stalls
    val idx = Some(graft.engine.SpatialJoin.buildIndex(
      spark.read.parquet(polysPath), cache = true))
    flagshipFromParquet(spark, docsPath, polysPath, idx) // warm
    val flagshipSec = (1 to 3).map { _ =>
      val tf0 = System.nanoTime()
      flagshipFromParquet(spark, docsPath, polysPath, idx)
      (System.nanoTime() - tf0) / 1e9
    }.min
    val docsPerSec = if (flagshipSec > 0) nDocs / flagshipSec else 0.0

    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.sum
    // inner_n: every per-query and flagship number is a min-of-3 inside this
    // process (the shared host shows 2-3x wall-time noise); caps: the two
    // driver-gate input bounds — declared here so they are never silent.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failedJson,"inner_n":3,""" +
        s""""caps":{"q34_knn_docs":${SparkEntry.KnnDocCap},"q37_media_docs":${SparkEntry.MediaDocCap},"q90_dbscan_docs":${SparkEntry.DbscanDocCap}},""" +
        s""""flagship_docs_per_sec":$docsPerSec,"n_docs":$nDocs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
