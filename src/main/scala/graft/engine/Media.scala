package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media spans are opaque references/bytes with
  * typed metadata; decode / feature-extract runs per partition in batches.
  *
  * STUB NOTE: no image/audio codecs exist in this container, so `decodeStub`
  * produces a deterministic fake decode (dimensions + an 8-dim feature
  * vector derived from the ref hash). The Spark-side plumbing — schema,
  * partition-batched execution, typed output — is real and tested; swapping
  * in a real decoder only replaces the body of `decodeStub`. */
object Media {

  final case class MediaFeature(doc_id: String, media_ref: String,
                                width: Int, height: Int, n_frames: Int,
                                feature: Array[Float])

  /** Deterministic fake decoder (STUB — stands in for e.g. JPEG decode).
    * Derives every field from md5 hex slices of the ref so an independent
    * SQL oracle can recompute the exact same metadata. */
  def decodeStub(ref: String): (Int, Int, Int, Array[Float]) = {
    import graft.core.Hashing.{hexSlice, md5Hex}
    val m = md5Hex(ref)
    val width = 64 + (hexSlice(m, 0, 5) % 1024).toInt
    val height = 64 + (hexSlice(m, 5, 10) % 1024).toInt
    val nFrames = 1 + (hexSlice(m, 10, 14) % 16).toInt
    val m2 = md5Hex(ref + "#f")
    val feat = new Array[Float](8)
    var j = 0
    while (j < 8) {
      feat(j) = hexSlice(m2, 3 * j, 3 * j + 3).toFloat / 4096.0f
      j += 1
    }
    (width, height, nFrames, feat)
  }

  /** Extract media spans from the interleaved-doc table and run the decoder
    * partition-batched (mapPartitions: one decoder init per partition, the
    * shape a real codec needs). Output columns are the typed metadata the
    * pipeline joins/filters on without touching bytes. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .where(col("span.kind") === "media" && length(col("span.media_ref")) > 0)
      .select(col("doc_id"), col("span.media_ref").as("media_ref"))
      .as[(String, String)]
      .mapPartitions { it =>
        // decoder/codec init would happen here, once per partition
        it.map { case (docId, ref) =>
          val (w, h, f, feat) = decodeStub(ref)
          MediaFeature(docId, ref, w, h, f, feat)
        }
      }
      .toDF()
  }
}
