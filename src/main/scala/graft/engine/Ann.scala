package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column
  * (array<float>): brute-force cosine top-k as the exact baseline, and a
  * deterministic random-hyperplane LSH bucketed variant as the scale path
  * (bucket join instead of cross product; multi-probe via all bands).
  */
object Ann {

  /** Cosine similarity of two array<float/double> columns via
    * zip_with + aggregate (codegen'd; no UDF). Inputs need not be normalized. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(zip_with(b, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
    dot / greatest(na * nb, lit(1e-12))
  }

  /** Exact brute-force top-k: queries x corpus cross join (queries broadcast),
    * window top-k per query. Output: (qid, vec_id, sim, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("qid"), col("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "vec_id", "sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim) in
    * [-1, 1): 48 md5 bits of "plane:<p>:<d>" scaled exactly (both the 48-bit
    * integer and the power-of-two division are exact in double, so any SQL
    * engine recomputes the identical literal from the same md5). Seeds are
    * data-independent; plan-time constants folded into codegen. */
  def planeComponent(plane: Int, dim: Int): Double = {
    val v = graft.core.Hashing.hexSlice(graft.core.Hashing.md5Hex(s"plane:$plane:$dim"), 0, 12)
    v.toDouble / 0x800000000000L.toDouble - 1.0
  }

  /** Sign-bit LSH key columns: `bands` keys of `bitsPerBand` hyperplane signs
    * each. Pure expression tree (plane constants are literals folded into
    * codegen). */
  def lshKeys(emb: Column, dims: Int, bands: Int, bitsPerBand: Int): Seq[Column] = {
    (0 until bands).map { b =>
      (0 until bitsPerBand).map { i =>
        val plane = b * bitsPerBand + i
        val planeLits = array((0 until dims).map(d => lit(planeComponent(plane, d))): _*)
        val dot = aggregate(zip_with(emb, planeLits, (x, p) => x * p), lit(0.0), (acc, x) => acc + x)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"lsh_b$b")
    }
  }

  /** LSH-bucketed ANN top-k: candidates = corpus rows sharing any band key
    * with the query, then exact cosine + window top-k over candidates only.
    * Recall < 1 by construction; `bands` trades recall for candidate count. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dims: Int = 64, bands: Int = 16, bitsPerBand: Int = 6): DataFrame = {
    def withKeys(df: DataFrame, emb: String): DataFrame = {
      val keys = lshKeys(col(emb), dims, bands, bitsPerBand)
      val bandStructs = array(keys.zipWithIndex.map { case (kcol, i) =>
        struct(lit(i).as("band"), kcol.as("key"))
      }: _*)
      df.withColumn("bk", explode(bandStructs))
        .withColumn("band", col("bk.band")).withColumn("key", col("bk.key"))
        .drop("bk")
    }
    val c = withKeys(corpus.select(col("vec_id"), col("embedding")), "embedding")
    val q = withKeys(queries.select(col("qid"), col("q_emb")), "q_emb")
    val cand = c.join(broadcast(q), Seq("band", "key"))
      .select("qid", "q_emb", "vec_id", "embedding")
      .dropDuplicates("qid", "vec_id")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("sim", cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "vec_id", "sim", "rank")
  }
}
