package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency harness: the north rule's two-cluster-size criterion,
  * evidenced in this sandbox by running the same job at local[8] (N) and
  * local[32] (4N) on identical input and reporting throughput at both plus
  * efficiency = (T_N / T_4N) / 4. */
object Scaling {

  private def timeOnce(cores: Int, sfDir: String, queries: Seq[String]): Map[String, Double] = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.register(spark)
    SparkEntry.entry(spark).count() // warm JIT/codegen
    val r = Bench.run(spark, sfDir, queries)
    spark.stop()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val queries = Seq("q31_spatial_join", "q33_tile_histogram", "q30_parse_extract")
    val tN = timeOnce(n, sfDir, queries)
    val t4N = timeOnce(4 * n, sfDir, queries)
    val effs = queries.map { q =>
      val e = (tN(q) / t4N(q)) / 4.0
      f""""$q":{"t_${n}":${tN(q)}%.3f,"t_${4 * n}":${t4N(q)}%.3f,"efficiency":$e%.3f}"""
    }
    val totalN = queries.map(tN).sum
    val total4N = queries.map(t4N).sum
    val eff = (totalN / total4N) / 4.0
    println(s"""{"metric":"scaling_efficiency","value":$eff,"n_cores":$n,""" +
      s""""4n_cores":${4 * n},"t_n_sec":$totalN,"t_4n_sec":$total4N,""" +
      s""""per_query":{${effs.mkString(",")}},"sf":"$sfDir"}""")
  }
}
