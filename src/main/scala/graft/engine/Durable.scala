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

  private val roundsCounter = new java.util.concurrent.atomic.AtomicLong(0)

  // one shutdown hook for ALL Rounds instances (a per-instance hook would
  // accumulate threads in a long-lived session — the leak being fixed)
  private val openRounds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Rounds]()
  private var roundsHookRegistered = false
  private def registerRounds(r: Rounds): Unit = {
    openRounds.add(r)
    Durable.synchronized {
      if (!roundsHookRegistered) {
        roundsHookRegistered = true
        java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
          val it = openRounds.iterator()
          while (it.hasNext) it.next().close()
        }))
      }
    }
  }

  /** Per-call ROUND checkpointer for iterative operators, with the cleanup
    * discipline RDD checkpoints lack (Spark never deletes reliable
    * checkpoint files — cleanCheckpoints defaults to false, so a long-lived
    * session running many iterative calls accumulates every round of every
    * call): each round is a parquet snapshot under the checkpoint dir
    * (shared storage on a cluster — same contract as [[ensureCheckpointDir]]),
    * written through the Hadoop FS API so any scheme works, and
    * [[dropPrevious]] deletes the superseded round as soon as the caller
    * has committed the next one. At most TWO rounds are ever on disk per
    * call; the FINAL round's files back the returned lazy DataFrame, so
    * they live until [[close]] removes the whole call dir at JVM exit (or
    * the caller, having materialized the result, calls close earlier). */
  final class Rounds(spark: SparkSession, tag: String) {
    ensureCheckpointDir(spark)
    private val base = new org.apache.hadoop.fs.Path(
      spark.sparkContext.getCheckpointDir.get,
      s"graft_rounds_${tag}_${roundsCounter.incrementAndGet()}")
    private val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    private var round = -1
    private def dir(r: Int) = new org.apache.hadoop.fs.Path(base, s"r$r")
    registerRounds(this)

    /** Write `df` as this call's next round and return the file-backed
      * read-back (bounded lineage, executor-loss-safe). */
    def commit(df: DataFrame): DataFrame = {
      round += 1
      val p = dir(round).toString
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    /** Delete the round BEFORE the latest one (call after the latest commit
      * and any comparison against the previous round has been computed). */
    def dropPrevious(): Unit =
      if (round > 0) {
        try fs.delete(dir(round - 1), true) catch { case _: Throwable => () }
      }

    /** Remove every file this call wrote — only safe once the returned
      * DataFrame has been fully materialized (or abandoned). */
    def close(): Unit = {
      openRounds.remove(this)
      try fs.delete(base, true) catch { case _: Throwable => () }
    }
  }
}
