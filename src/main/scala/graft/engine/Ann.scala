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

  /** IVF-flat ANN top-k: a coarse quantizer assigns every corpus vector to
    * its nearest of `nCentroids` centroids (the inverted lists); a query
    * probes its `nprobe` nearest centroids and searches only those lists
    * with exact cosine.
    *
    * Centroid "training" here is a deterministic sample — the first
    * `nCentroids` vectors by id — the sampled-training IVF analogue (FAISS
    * trains on a sample too; at 100 TB you would fit k-means|| over a
    * sample and feed the fitted centroids in, leaving assignment / probe /
    * search below unchanged).
    *
    * Scale shape: the centroids are collected once (dimension-sized,
    * nCentroids x dims doubles) and inlined as foldable literals, so list
    * assignment is a map-only projection over the corpus scan — no shuffle,
    * no join. Probing is driver-side over the tiny query set; the candidate
    * join broadcasts (qid, cid) pairs, so the only shuffle in the whole
    * plan is the per-query top-k window over the ~nprobe/nCentroids
    * candidate fraction. On a persisted index you would bucket the corpus
    * by cid so probes touch only matching files. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    // tolerate array<float> input (raw parquet vectors): all math is double.
    // "first nCentroids by id" via sort+limit — correct on sparse/offset id
    // spaces too (a vec_id < n filter would silently under-train there)
    val cents: Array[(Long, Array[Double])] = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy(col("vec_id"))
      .limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.length >= 2, s"need >= 2 centroids, got ${cents.length}")
    // argmax over literal centroids: greatest() over (sim, -cid) structs —
    // highest sim wins, ties break to the SMALLEST centroid id
    def litVec(v: Array[Double]): Column = array(v.map(lit): _*)
    def bestCid(emb: Column): Column =
      -greatest(cents.map { case (cid, ce) =>
        struct(cosine(emb, litVec(ce)).as("sim"), lit(-cid).as("ncid"))
      }: _*).getField("ncid")
    val assigned = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .withColumn("cid", bestCid(col("embedding")))
    // probe: nprobe nearest centroids per query — tiny x tiny, driver-adjacent
    val centDf = spark.createDataFrame(cents.map { case (cid, ce) => (cid, ce) })
      .toDF("cid", "cemb")
    val pw = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))
    val probes = queries.select(col("qid"), col("q_emb"))
      .crossJoin(broadcast(centDf))
      .withColumn("csim", cosine(col("q_emb"), col("cemb")))
      .withColumn("crn", row_number().over(pw))
      .where(col("crn") <= nprobe)
      .select("qid", "q_emb", "cid")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "vec_id", "sim", "rank")
  }

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
