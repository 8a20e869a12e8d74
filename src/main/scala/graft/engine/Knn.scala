package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Cells

/** k-nearest-neighbour via cell-ring expansion (engine operator named in the
  * north star; no reference counterpart).
  *
  * Round r joins each still-unresolved query against points in its cell disk
  * of Chebyshev radius r, keeps the top-k by haversine distance
  * (window row_number over dist), and resolves a query when its k-th
  * neighbour is provably closer than anything outside the disk — the bound
  * uses the cell's minimum metric dimension at the query's latitude band
  * (geohash cells are anisotropic; we take the worst case over the disk).
  * Unresolved queries expand to the next ring; bounded at `maxRounds`.
  */
object Knn {

  /** Lower bound (metres) on the distance from a point inside the centre
    * cell to any point outside the disk of radius r at latitude `lat`. */
  def outsideDiskLowerBound(lat: Double, level: Int, r: Int): Double = {
    val (latDeg, lonDeg) = Cells.cellSizeDeg(level)
    // worst-case |lat| anywhere in the disk
    val maxAbsLat = math.min(90.0, math.abs(lat) + (r + 1) * latDeg)
    val latM = latDeg * 110574.0
    val lonM = lonDeg * 111320.0 * math.max(0.0, math.cos(math.toRadians(maxAbsLat)))
    r * math.min(latM, lonM)
  }

  /** queries: (qid, lat, lon); points: (pid, lat, lon).
    * Returns (qid, pid, dist, rank) with rank 1..k per query.
    * `level` picks the cell resolution; smaller level = bigger cells =
    * fewer rounds but more candidates per round. */
  def knn(spark: SparkSession, queries: DataFrame, points: DataFrame, k: Int,
          level: Int = 4, maxRounds: Int = 6): DataFrame = {
    import org.apache.spark.sql.functions.{call_function => cf}
    val pts = points
      .select(col("pid"), col("lat").as("p_lat"), col("lon").as("p_lon"))
      .withColumn("cell", cf("st_cell", col("p_lat"), col("p_lon"), lit(level)))
    pts.cache()

    var unresolved = queries
      .select(col("qid"), col("lat").as("q_lat"), col("lon").as("q_lon"))
      .withColumn("qcell", cf("st_cell", col("q_lat"), col("q_lon"), lit(level)))
    var acc: DataFrame = null
    var round = 1
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("pid"))

    while (round <= maxRounds && !unresolved.isEmpty) {
      val cand = unresolved
        .withColumn("cell", explode(cf("st_cell_disk", col("qcell"), lit(round))))
        .join(pts, Seq("cell"), "inner")
        .withColumn("dist",
          cf("st_haversine", col("q_lat"), col("q_lon"), col("p_lat"), col("p_lon")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "q_lat", "q_lon", "qcell", "pid", "dist", "rank")

      // a query resolves when it has k hits and the k-th is inside the
      // provable bound for this round's disk (pure column math, no UDF)
      val kth = cand.groupBy("qid", "q_lat", "qcell")
        .agg(count(lit(1)).as("n"), max(col("dist")).as("kth"))
      val (latDeg, lonDeg) = Cells.cellSizeDeg(level)
      val maxAbsLat = least(lit(90.0), abs(col("q_lat")) + lit((round + 1) * latDeg))
      val bound = lit(round) * least(
        lit(latDeg * 110574.0),
        lit(lonDeg * 111320.0) * greatest(lit(0.0), cos(radians(maxAbsLat))))
      val resolvedQ = kth.where(col("n") === k && col("kth") <= bound).select("qid")

      val isLast = round == maxRounds
      val resolvedRows =
        if (isLast) cand // final round: accept best-effort results
        else cand.join(broadcast(resolvedQ), Seq("qid"), "left_semi")
      acc = if (acc == null) resolvedRows.select("qid", "pid", "dist", "rank")
            else acc.unionByName(resolvedRows.select("qid", "pid", "dist", "rank"))
      // materialize this round's results before mutating `unresolved`
      acc = acc.localCheckpoint(true)
      unresolved =
        if (isLast) unresolved.limit(0)
        else unresolved.join(broadcast(resolvedQ), Seq("qid"), "left_anti")
      round += 1
    }
    pts.unpersist()
    acc
  }
}
