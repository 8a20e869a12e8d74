package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Corpus, SpatialJoin}
import graft.streaming.Streams

/** Streaming layer: batch parquet drives streaming queries synchronously via
  * the memory sink + processAllAvailable; streaming results must equal the
  * batch operators on the same data. */
class StreamingSpec extends AnyFunSuite {

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

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    // forked test JVMs leak these otherwise (157 dirs observed in /tmp)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
      catch { case _: Throwable => () }))
    d.toString
  }

  /** events.parquet is a single file; file-stream sources need a directory. */
  private lazy val eventsDir: String = {
    val d = tmp()
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("streaming tile assignment equals the batch path") {
    val dir = tmp()
    val docs = Corpus.documentsDf(spark, 300, partitions = 3)
    docs.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = Streams.tileAssign(stream, 7)
      .select("doc_id", "offset", "tile_id")
      .writeStream.format("memory").queryName("tiles_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.sql("SELECT * FROM tiles_out").collect().map(_.toString).sorted
    val want = Streams.tileAssign(spark.read.parquet(dir), 7)
      .select("doc_id", "offset", "tile_id").collect().map(_.toString).sorted
    assert(got.length > 0 && got.sameElements(want))
  }

  test("incremental pyramid stream equals the batch pyramid on the unioned corpus") {
    val dir = tmp()
    val work = tmp()
    val docs = Corpus.documentsDf(spark, 300, partitions = 3)
    docs.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // maxFilesPerTrigger=1 over 3 part files -> 3 ingest ticks: later ticks
    // must MERGE into the committed base, not recompute from scratch
    val q = Streams.pyramidStream(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      work, minZoom = 4, maxZoom = 7, checkpoint = s"$work/ckpt")
    q.awaitTermination()
    val got = spark.read.parquet(s"$work/pyramid")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = graft.engine.Tiler.pyramid(
        SpatialJoin.extractPoints(spark.read.parquet(dir)), 4, 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want)
    // multiple deltas really were committed (one per tick)
    val deltaDirs = new java.io.File(s"$work/base_deltas").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(deltaDirs.size >= 2, s"expected >= 2 ingest ticks, saw $deltaDirs")
  }

  test("pyramid tick is idempotent per batchId (crash-replay never double-counts)") {
    val work = tmp()
    val docs = Corpus.documentsDf(spark, 200, partitions = 2)
    val b0 = docs.where(crc32(col("doc_id")) % 2 === 0)
    val b1 = docs.where(crc32(col("doc_id")) % 2 =!= 0)
    Streams.pyramidTick(spark, b0, work, 4, 7, batchId = 0L)
    Streams.pyramidTick(spark, b1, work, 4, 7, batchId = 1L)
    val once = spark.read.parquet(s"$work/pyramid")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // a crash between the sink commit and the source-offset commit makes
    // Structured Streaming REPLAY the batch: the batchId-keyed overwrite
    // must absorb it, not add the rows a second time
    Streams.pyramidTick(spark, b1, work, 4, 7, batchId = 1L)
    val replayed = spark.read.parquet(s"$work/pyramid")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(replayed == once, "replaying a batch changed the pyramid")
    val want = graft.engine.Tiler.pyramid(SpatialJoin.extractPoints(docs), 4, 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(replayed == want)
  }

  test("stream-static spatial join equals batch join") {
    val dir = tmp()
    Corpus.documentsDf(spark, 300, partitions = 3).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val polys = Corpus.polygons(spark).toDF()
    val polyCells = SpatialJoin.polygonCells(polys, 5)
    val levels = polyCells.select(length(col("cell")).as("l")).distinct()
      .collect().map(_.getInt(0)).sorted

    def pointsOf(df: org.apache.spark.sql.DataFrame) =
      SpatialJoin.extractPoints(df)
        .withColumn("jcell", explode(array(levels.map(l => substring(col("cell"), 1, l)): _*)))

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = Streams.spatialJoinStream(pointsOf(stream), polyCells,
        polys.select(col("poly_id"), col("ring")))
      .select("doc_id", "offset", "poly_id")
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.sql("SELECT * FROM sj_out").collect().map(_.toString).sorted
    val want = SpatialJoin.join(SpatialJoin.extractPoints(spark.read.parquet(dir)), polys)
      .select("doc_id", "offset", "poly_id").collect().map(_.toString).sorted
    assert(got.length > 0 && got.sameElements(want))
  }

  test("streaming exact dedup keeps one row per content hash (vs batch distinct)") {
    import spark.implicits._
    val dir = tmp()
    // timestamped docs with planted duplicates inside the watermark window
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0 until 200).map { i =>
      val text = s"content number ${i % 80}" // 80 distinct texts, 200 rows
      (s"d$i", text, new java.sql.Timestamp(base.getTime + i * 1000L))
    }.toDF("doc_id", "text", "ts").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = Streams.dedupStream(stream)
      .select("content_hash")
      .writeStream.format("memory").queryName("dd_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT content_hash FROM dd_out").collect()
      .map(_.getString(0)).sorted
    val want = spark.read.parquet(dir).select(md5(col("text"))).distinct()
      .collect().map(_.getString(0)).sorted
    assert(got.length == 80 && got.sameElements(want))
  }

  test("watermarked windowed counts complete over a bounded stream") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = Streams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // append mode only emits windows below the final watermark; totals over
    // emitted windows must match the batch aggregation on the same windows
    val got = spark.sql("SELECT sum(n) FROM win_out").collect()(0).getLong(0)
    assert(got > 0)
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window(col("ts").cast("timestamp"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val emitted = spark.sql("SELECT window, event_type, n FROM win_out")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val full = batch.collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(emitted.forall { case (k, v) => full.get(k).contains(v) },
      "emitted window counts disagree with batch")
  }

  test("streaming geofence equals batch transitions incl. cross-batch flips") {
    import spark.implicits._
    val dir = tmp()
    val fences = Seq((40.7128, -74.0060), (51.5074, -0.1278))
    // 30 tracks oscillating near fence 0; split files by offset so flips
    // straddle the batch boundary (offset 20 -> 30 crosses it)
    val rng = new java.util.Random(3)
    val rows = (0 until 30).flatMap { t =>
      (0 until 6).map { i =>
        val in = rng.nextBoolean()
        val (la, lo) = if (in) (40.7128 + rng.nextGaussian() * 0.05,
          -74.0060 + rng.nextGaussian() * 0.05)
        else (10.0 + rng.nextGaussian(), 10.0 + rng.nextGaussian())
        (f"t$t%02d", i * 10, la, lo)
      }
    }
    val df = rows.toDF("doc_id", "offset", "lat", "lon")
    df.where(col("offset") < 30).coalesce(1).write.parquet(s"$dir/src")
    val f0 = new java.io.File(s"$dir/src").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(f0.setLastModified(System.currentTimeMillis() - 600000L))
    val late = new java.io.File(s"$dir/late")
    df.where(col("offset") >= 30).coalesce(1).write.parquet(late.getPath)
    val part = late.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(s"$dir/src/late.parquet").toPath)
    val schema = spark.read.parquet(s"$dir/src").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/src")
    val q = Streams.geofenceStream(spark, stream, fences, 25000.0)
      .writeStream.format("memory").queryName("gf_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT doc_id, offset, transition FROM gf_out")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val want = graft.engine.Track.geofenceTransitions(df, fences, 25000.0)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(4))).toSet
    val cross = want.filter { case (_, off, _) => off == 30 }
    assert(cross.nonEmpty, "fixture has no cross-batch flip — weaken the rng")
    assert(got == want)
  }

  test("stateful sessionization matches the batch window computation") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = Streams.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql(
      "SELECT user_id, max(sessions) AS s, max(events) AS e FROM sess_out GROUP BY user_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = SparkEntry.queries("q18_sessionize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }
}
