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

  /** Cosine similarity of two array<double> columns via the st_cosine kernel
    * — a single whole-stage-codegen'd pass. (The zip_with/aggregate
    * higher-order-function formulation computes the identical value but
    * evaluates INTERPRETED — the same tax the minhash path paid; the kernel
    * preserves its accumulation order bit-for-bit, which the DuckDB oracles
    * rely on.) Inputs need not be normalized. */
  def cosine(a: Column, b: Column): Column = call_function("st_cosine", a, b)

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
    * [-1, 1); see core.Hashing.planeComponent (md5-derived so any SQL engine
    * recomputes the identical value). Data-independent. */
  def planeComponent(plane: Int, dim: Int): Double =
    graft.core.Hashing.planeComponent(plane, dim)

  /** (band, key) rows for an embedding column via the st_lsh_keys kernel
    * (one codegen'd pass over bands x bits hyperplane dot products). */
  def lshBandKeys(emb: Column, dims: Int, bands: Int, bitsPerBand: Int): Column =
    call_function("st_lsh_keys", emb, lit(dims), lit(bands), lit(bitsPerBand))

  /** LSH-bucketed ANN top-k: candidates = corpus rows sharing any band key
    * with the query, then exact cosine + window top-k over candidates only.
    * Recall < 1 by construction; `bands` trades recall for candidate count.
    * Rows whose embedding length differs from `dims` get NULL keys and drop
    * out silently (relaxed null discipline, like unparseable text spans) —
    * validate embedding dimensionality upstream if that must be an error. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dims: Int = 64, bands: Int = 16, bitsPerBand: Int = 6): DataFrame = {
    def withKeys(df: DataFrame, emb: String): DataFrame =
      df.select(df.columns.map(col) :+
        posexplode(lshBandKeys(col(emb), dims, bands, bitsPerBand)).as(Seq("band", "key")): _*)
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
