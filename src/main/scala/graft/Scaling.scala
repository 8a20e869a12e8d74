package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency harness: the north rule's two-cluster-size criterion,
  * evidenced in this sandbox by running the same job at local[8] (N) and
  * local[32] (4N) on identical input and reporting throughput at both plus
  * efficiency = (T_N / T_4N) / 4. */
object Scaling {

  /** Master for a given total core count. Default: local-cluster with
    * separate 4-core executor JVMs — the honest proxy for "N vs 4N
    * executors" (each executor owns its heap and GC, like a real cluster;
    * plain local[k] saturates one JVM's allocator at high thread counts).
    * SPARK_GRAFT_MODE=local falls back to single-JVM threads. */
  private def masterFor(cores: Int): String =
    if (sys.env.get("SPARK_GRAFT_MODE").contains("local")) s"local[$cores]"
    else s"local-cluster[${math.max(1, cores / 4)},4,6144]"

  /** Min-of-k (after warm-ups) flagship pipeline time over stored parquet
    * at `cores`. Min because JIT keeps warming across sessions, so later
    * iterations are the steady state. */
  private def timeOnce(cores: Int, nDocs: Long): Double = {
    val jar = new java.io.File("target/scala-2.13/coordinatespark_2.13-0.1.0.jar")
    val spark = SparkSession.builder()
      .master(masterFor(cores))
      .config("spark.jars", if (jar.exists()) jar.getAbsolutePath else "")
      .config("spark.executor.memory", "5g")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // the synthetic corpus compresses to ~100 B/doc: default 128 MB splits
      // + 4 MB open-cost bin-packing would starve 32 cores (~6 scan tasks)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "524288")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.register(spark)
    val (docsPath, polysPath) = graft.engine.Corpus.ensure(spark, nDocs)
    // static polygon layer -> index built + cached once per session
    val idx = graft.engine.SpatialJoin.buildIndex(
      spark.read.parquet(polysPath), cache = true)
    val (warms, reps) = if (nDocs >= 8000000L) (1, 2)
    else if (nDocs >= 4000000L) (1, 3) else (2, 5)
    (1 to warms).foreach(_ => Bench.flagshipFromParquet(spark, docsPath, polysPath, Some(idx)))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Bench.flagshipFromParquet(spark, docsPath, polysPath, Some(idx))
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    times.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    // scaling must be measured compute-bound: default to 10x the sf corpus
    // so per-task work dominates fixed scheduling/broadcast overhead
    val nDocs = sys.env.get("SPARK_GRAFT_NDOCS").map(_.toLong)
      .getOrElse(SparkEntry.corpusDocs(sfDir) * 10)
    // N / 4N / N sandwich: one shared JVM keeps JIT-warming across
    // sessions, so a single N-then-4N order would flatter 4N
    val tN1 = timeOnce(n, nDocs)
    val t4N = timeOnce(4 * n, nDocs)
    val tN = math.min(tN1, timeOnce(n, nDocs))
    val eff = (tN / t4N) / 4.0
    val thrN = nDocs / tN
    val thr4N = nDocs / t4N
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"n_cores":$n,""" +
      f""""4n_cores":${4 * n},"t_n_sec":$tN%.3f,"t_4n_sec":$t4N%.3f,""" +
      f""""docs_per_sec_n":$thrN%.0f,"docs_per_sec_4n":$thr4N%.0f,""" +
      f""""n_docs":$nDocs,"sf":"$sfDir"}""")
  }
}
