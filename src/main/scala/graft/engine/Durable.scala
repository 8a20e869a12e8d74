package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reliable-checkpoint plumbing shared by the iterative operators (Knn ring
  * expansion, Dedup.connectedComponents): per-round state is RELIABLY
  * checkpointed — written to the checkpoint dir, readable after executor
  * loss — never localCheckpoint'ed (which stores blocks on executors and
  * truncates lineage, so one lost executor after round r kills the job with
  * no way to recompute).
  *
  * Contract: on a CLUSTER the caller must configure a SHARED checkpoint dir
  * (spark.checkpoint.dir on HDFS/object storage) — a node-local path would
  * strand partitions on the writer. [[ensureCheckpointDir]] fails fast on a
  * non-local master without one, and auto-provisions a process-private tmp
  * dir (removed at JVM exit) for local[*] masters, where one filesystem
  * serves all "executors". */
object Durable {

  // one shutdown hook per JVM for the auto-provisioned checkpoint dir
  private var cleanupRegistered = false

  def ensureCheckpointDir(spark: SparkSession): Unit = {
    if (spark.sparkContext.getCheckpointDir.nonEmpty) return
    require(spark.sparkContext.master.startsWith("local"),
      "iterative operators on a cluster need spark.checkpoint.dir on SHARED " +
        "storage (a node-local default would strand checkpoint partitions)")
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_ckpt_" +
      java.lang.ProcessHandle.current().pid()
    spark.sparkContext.setCheckpointDir(ckpt)
    // Spark never deletes reliable checkpoint files on its own
    // (cleanCheckpoints defaults to false); since WE provisioned a
    // process-private local dir, remove it when this JVM exits — its
    // contents are only meaningful within this JVM's lifetime anyway
    Durable.synchronized {
      if (!cleanupRegistered) {
        cleanupRegistered = true
        java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
          try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
          catch { case _: Throwable => () }
        }))
      }
    }
  }

  /** persist-then-checkpoint: the eager checkpoint job populates the cache
    * while writing, so the plan is computed ONCE (a bare checkpoint(true)
    * would recompute the whole plan for the write). */
  def durable(df: DataFrame): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = cached.checkpoint(true)
    cached.unpersist()
    out
  }
}
