package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash groupBy),
  * MinHash+LSH banding, SimHash hamming buckets, n-gram Jaccard verification.
  *
  * Scale design: every method is shuffle-bounded by the *candidate* set, not
  * the corpus cross product — LSH bands / simhash chunks are the join keys,
  * so the only quadratic work happens inside a bucket (hot buckets are the
  * skew case; bucket sizes are capped via a group-limit before pairing). */
object Dedup {

  /** Exact duplicates by content hash: (hash, n_dups, doc_ids). */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .where(col("n") > 1)

  /** Word 3-gram shingles of the normalized text. */
  def shingles(text: org.apache.spark.sql.Column, n: Int = 3): org.apache.spark.sql.Column = {
    val words = TextOps.wordsCol(text)
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", words))))
  }

  /** docs -> (doc_id, shingles) with an Exchange barrier after the regex
    * shingle pipeline. The barrier matters: higher-order functions
    * (transform/array_min) evaluate interpreted, and without it Catalyst's
    * project collapsing inlines the whole shingle pipeline into every
    * downstream minhash/band expression — an ~H x blowup measured at 45x
    * wall-clock on the LSH path. */
  private def shingled(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"), shingles(col(textCol)).as("shingles"))
      .repartition(col("doc_id"))

  /** One minhash column: min over shingles of xxhash64(shingle, seed i). */
  private def minhashCol(i: Int): org.apache.spark.sql.Column =
    array_min(transform(col("shingles"), s => xxhash64(s, lit(i))))

  /** MinHash signature: H hash functions, each min(xxhash64(shingle, seed)). */
  def minhashSignature(docs: DataFrame, textCol: String = "text",
                       numHashes: Int = 16): DataFrame =
    shingled(docs, textCol).select(col("doc_id"), col("shingles"),
      array((0 until numHashes).map(minhashCol): _*).as("sig"))

  /** MinHash+LSH near-duplicate pairs: band the signature (bands x rows),
    * bucket-join within bands, then verify with true shingle Jaccard.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold. */
  def minhashLsh(docs: DataFrame, textCol: String = "text",
                 numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val base = shingled(docs, textCol)
    // band keys reference each minhash expression exactly once (no sig-array
    // indirection: array(...)[i] would re-inline the array per extraction);
    // the candidate self-join shuffles only (doc_id, band, bucket) rows —
    // shingle arrays join back in once, after pair dedupe
    val banded = base.select(
      col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rows).map(r => minhashCol(b * rows + r).cast("string")): _*),
          lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val idPairs = a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val sh = base.select(col("doc_id"), col("shingles"))
    val pairs = idPairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") / greatest(col("uni"), lit(1.0)), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash over the word multiset (typed map: per-row imperative
    * bit voting is the one genuinely non-relational step). */
  def simhash(spark: SparkSession, docs: DataFrame, textCol: String = "text"): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("string").as("doc_id"), col(textCol).as("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val words =
          if (text == null) Array.empty[String]
          else text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        val votes = new Array[Int](64)
        for (w <- words) {
          // FNV-1a 64-bit, deterministic across JVMs
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < w.length) { h ^= w.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
          var bit = 0
          while (bit < 64) { if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1; bit += 1 }
        }
        var sh = 0L
        var bit = 0
        while (bit < 64) { if (votes(bit) > 0) sh |= (1L << bit); bit += 1 }
        (id, sh)
      }.toDF("doc_id", "simhash")
  }

  /** SimHash near-dup candidate pairs: 4 x 16-bit chunk buckets, verify
    * hamming distance <= maxHamming. */
  def simhashPairs(spark: SparkSession, docs: DataFrame, textCol: String = "text",
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(spark, docs, textCol)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map { c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("chunk", "key")))
    val a = chunked.select(col("chunk"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "key"))
      .where(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** n-gram Jaccard similarity for explicit candidate pairs
    * (pairs: doc_a, doc_b) against the docs table. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, textCol: String = "text",
                   n: Int = 3): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))).cast("double"), lit(1.0)), 6))
      .select("doc_a", "doc_b", "jaccard")
  }
}
