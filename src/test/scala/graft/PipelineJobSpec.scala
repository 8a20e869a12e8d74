package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The staged spark-submit pipeline: stage outputs correct, manifests
  * committed, and a rerun resumes (no stage recompute). */
class PipelineJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.register(s)
    s
  }

  test("pipeline runs staged, commits manifests, and resumes") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val docsDir = s"$out/docs_in"
    graft.engine.Corpus.documentsDf(spark, 500, partitions = 4)
      .write.mode("overwrite").parquet(docsDir)

    val first = Pipeline.run(spark, docsDir, "synthetic", out, 5, 7).toMap
    assert(first.keySet == Set("points", "joined", "tiles"))
    assert(first.values.forall(v => v._1 > 0 && !v._3), s"unexpected resume flags: $first")

    // manifests committed with per-partition lineage
    for (st <- Seq("points", "joined", "tiles"))
      assert(graft.engine.Checkpoint.readManifestFingerprint(s"$out/$st").isDefined, st)

    // rerun: every stage must resume from its manifest with identical rows
    val second = Pipeline.run(spark, docsDir, "synthetic", out, 5, 7).toMap
    assert(second.values.forall(_._3), s"stages did not resume: $second")
    assert(second.map { case (k, v) => k -> v._1 } ==
      first.map { case (k, v) => k -> v._1 })

    // stage output equals the direct computation
    val direct = graft.engine.SpatialJoin.join(
      graft.engine.SpatialJoin.extractPoints(spark.read.parquet(docsDir)),
      graft.engine.Corpus.polygons(spark).toDF())
      .select("doc_id", "offset", "poly_id").collect().map(_.toString).sorted
    val staged = spark.read.parquet(s"$out/joined")
      .select("doc_id", "offset", "poly_id").collect().map(_.toString).sorted
    assert(staged.sameElements(direct))
  }
}
