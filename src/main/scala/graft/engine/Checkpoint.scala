package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-resumable staged writes with per-partition lineage + metrics
  * (Iceberg-style table emulation: partitioned Parquet + a snapshot manifest;
  * no Iceberg jar exists in this zero-egress image — documented substitution,
  * SURVEY §7.4).
  *
  * A stage writes `partitionBy(partitionCol)` Parquet, then commits a
  * manifest JSON (snapshot id, input fingerprint, per-partition row counts).
  * A rerun with the same fingerprint short-circuits to a plain read — the
  * unit of resume is the committed stage/partition, which is what a
  * spark-submit retry of a 10^12-row pipeline needs to skip.
  * The manifest is written atomically (tmp + move) so a crash mid-commit
  * never yields a half-trusted stage.
  */
object Checkpoint {

  final case class PartitionEntry(value: String, rows: Long)
  final case class Manifest(stage: String, snapshotId: String, fingerprint: String,
                            totalRows: Long, partitions: Seq[PartitionEntry])

  private def manifestPath(dir: String) = Paths.get(dir, "_graft_manifest.json")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def writeManifest(dir: String, m: Manifest): Unit = {
    val parts = m.partitions
      .map(p => s"""{"value":"${esc(p.value)}","rows":${p.rows}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"stage":"${esc(m.stage)}","snapshot_id":"${esc(m.snapshotId)}",""" +
        s""""fingerprint":"${esc(m.fingerprint)}","total_rows":${m.totalRows},""" +
        s""""partitions":$parts}"""
    val tmp = Paths.get(dir, "_graft_manifest.json.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifestFingerprint(dir: String): Option[String] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val m = """"fingerprint":"([^"]*)"""".r.findFirstMatchIn(s)
    m.map(_.group(1))
  }

  /** Committed total row count — lets a resumed consumer skip re-counting. */
  def readManifestTotal(dir: String): Option[Long] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    """"total_rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
  }

  /** Run a stage: if `dir` holds a committed manifest for this fingerprint,
    * read it back (resume); otherwise compute, write partitioned Parquet,
    * collect per-partition lineage counts, and commit the manifest. */
  def stage(spark: SparkSession, dir: String, stageName: String, fingerprint: String,
            partitionCol: Option[String])(compute: => DataFrame): DataFrame = {
    if (readManifestFingerprint(dir).contains(fingerprint)) {
      return spark.read.parquet(dir)
    }
    val df = compute
    val writer = df.write.mode(SaveMode.Overwrite)
    partitionCol match {
      case Some(c) => writer.partitionBy(c).parquet(dir)
      case None => writer.parquet(dir)
    }
    val written = spark.read.parquet(dir)
    val (entries, total) = partitionCol match {
      case Some(c) =>
        val rows = written.groupBy(col(c).cast("string").as("v"))
          .agg(count(lit(1)).as("n")).collect()
        (rows.map(r => PartitionEntry(Option(r.getString(0)).getOrElse("null"), r.getLong(1))).toSeq,
          rows.map(_.getLong(1)).sum)
      case None =>
        val n = written.count()
        (Seq(PartitionEntry("*", n)), n)
    }
    val snapshotId = java.util.UUID.nameUUIDFromBytes(
      (stageName + ":" + fingerprint).getBytes(StandardCharsets.UTF_8)).toString
    writeManifest(dir, Manifest(stageName, snapshotId, fingerprint, total, entries))
    written
  }
}
