package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ordered data layout + file-level bbox pruning — the storage-side half
  * of spatial query performance at 100 TB.
  *
  * [[writeZOrdered]] range-partitions a point table by its Morton key
  * (st_zorder) and sorts within partitions, so each output file covers a
  * compact spatial extent; a manifest of per-file lat/lon min/max is then
  * computed in one distributed pass over the written files. [[readBBox]]
  * consults the manifest and hands Spark ONLY the files whose bbox
  * intersects the query box — pruning happens before task planning, exactly
  * like Iceberg metadata pruning, and composes with parquet row-group
  * min/max skipping inside the surviving files (the zkey sort makes the
  * per-row-group lat/lon ranges tight too).
  *
  * Scale shape: the write is one range shuffle (range boundaries from
  * Spark's reservoir sample of the zkey distribution — skewed hotspots just
  * get more files); the manifest pass is a file-count-sized aggregate; the
  * driver only ever materializes the manifest (one row per file — ~10^5
  * rows for a 100 TB table at 1 GB files), never data.
  */
object Layout {

  /** Write `pts` (must carry lat/lon) z-ordered into `dir/data` as
    * `numFiles` range-partitioned files plus `dir/manifest` with per-file
    * (file, min/max lat/lon, n_rows). `bits` is the Morton resolution per
    * axis — 16 gives ~600 m cells at the equator, far finer than any
    * realistic file extent. */
  def writeZOrdered(pts: DataFrame, dir: String, bits: Int = 16,
                    numFiles: Int = 16): Unit = {
    val spark = pts.sparkSession
    pts.withColumn("zkey", call_function("st_zorder", col("lat"), col("lon"), lit(bits)))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$dir/data")
    spark.read.parquet(s"$dir/data")
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min("lat").as("min_lat"), max("lat").as("max_lat"),
        min("lon").as("min_lon"), max("lon").as("max_lon"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** The manifest must describe EXACTLY the files on disk — a crash between
    * a data overwrite and its manifest rewrite would otherwise leave a stale
    * manifest silently pruning with wrong bboxes. One directory listing per
    * read (the same O(files) cost Iceberg pays to read its manifest list);
    * fails loudly on any mismatch. */
  private def verifyManifest(spark: SparkSession, dir: String,
                             manifest: DataFrame): Unit = {
    // compare scheme-normalized paths (file:/ vs file:/// spellings differ
    // between _metadata.file_path and FileSystem.listStatus)
    def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val path = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(path).map(s => norm(s.getPath.toString))
      .filter(p => p.endsWith(".parquet") && !p.contains("/_")).toSet
    val inManifest = manifest.select("file").collect().map(r => norm(r.getString(0))).toSet
    require(onDisk == inManifest,
      s"layout manifest out of sync with $dir/data (" +
        s"${(onDisk -- inManifest).size} unlisted, ${(inManifest -- onDisk).size} ghost " +
        s"files) — rewrite the layout (interrupted writeZOrdered?)")
  }

  /** Manifest rows whose file bbox intersects [south..north]x[west..east].
    * The box must not cross the antimeridian (east >= west). */
  private def hits(spark: SparkSession, dir: String, south: Double, west: Double,
                   north: Double, east: Double): DataFrame = {
    require(east >= west && north >= south,
      s"bbox must be south<=north, west<=east (no antimeridian wrap): " +
        s"[$south..$north]x[$west..$east]")
    val man = spark.read.parquet(s"$dir/manifest")
    verifyManifest(spark, dir, man)
    man.where(col("min_lat") <= north && col("max_lat") >= south &&
      col("min_lon") <= east && col("max_lon") >= west)
  }

  /** (selected, total) file counts for a bbox — the pruning observability
    * hook (and the test gate that pruning actually skips files). */
  def pruneStats(spark: SparkSession, dir: String, south: Double, west: Double,
                 north: Double, east: Double): (Long, Long) = {
    val sel = hits(spark, dir, south, west, north, east).count()
    val tot = spark.read.parquet(s"$dir/manifest").count()
    (sel, tot)
  }

  /** Read only the rows in the bbox, scanning only manifest-selected files.
    * The residual lat/lon filter still runs (file bboxes overlap the query
    * box without being contained), and is pushed into the parquet scan. */
  def readBBox(spark: SparkSession, dir: String, south: Double, west: Double,
               north: Double, east: Double): DataFrame = {
    // file-list-sized collect (one string per surviving file), never data
    val files = hits(spark, dir, south, west, north, east)
      .select("file").collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(s"$dir/data").where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.where(col("lat") >= south && col("lat") <= north &&
      col("lon") >= west && col("lon") <= east)
  }
}
