package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions._

/** Distributed spatial join: point extraction -> cell index -> equi-join on
  * cell -> exact point-in-polygon refine.
  *
  * Scale design (SURVEY §2B "Joins"):
  *  - the fact side (doc spans) is exploded once, parsed once, and carries a
  *    single cell id — one shuffle key, no point duplication;
  *  - the polygon side is exploded into its covering cells (superset-exact
  *    covering) — polygons are the small side and are broadcast by default,
  *    so the fact side never shuffles for the join itself;
  *  - for very large polygon layers, `salted = true` spreads hot cells: the
  *    fact side gets salt = pmod(xxhash64(doc_id, offset), S) and the polygon
  *    side replicates each covering cell S times (explicit skew handling; AQE
  *    skew-join remains as a backstop for the sort-merge path).
  */
object SpatialJoin {

  /** Default cell level 5 (~4.9 x 4.9 km cells): matches hotspot sigma. */
  val DefaultLevel = 5

  /** Extract per-span points from the interleaved-doc table.
    * Output: doc_id, offset, lat, lon, cell. Spans without a parseable
    * in-bounds coordinate are dropped (null path). */
  def extractPoints(docs: DataFrame, level: Int = DefaultLevel): DataFrame = {
    docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("span_idx", "span")))
      .where(col("span.kind") === "text")
      .select(col("doc_id"), col("span.offset").as("offset"),
        call_function("st_parse_point", col("span.text")).as("pt"))
      .where(col("pt").isNotNull)
      .select(col("doc_id"), col("offset"),
        col("pt.lat").as("lat"), col("pt.lon").as("lon"))
      .withColumn("cell", call_function("st_cell", col("lat"), col("lon"), lit(level)))
  }

  /** Polygon layer -> (poly_id, ring, cell) covering rows. */
  def polygonCells(polys: DataFrame, level: Int = DefaultLevel): DataFrame =
    polys.select(col("poly_id"), col("ring"),
      explode(call_function("st_cover_cells", col("ring"), lit(level))).as("cell"))

  /** Join extracted points against polygons: cell equi-join + PIP refine.
    * Output: doc_id, offset, lat, lon, cell, poly_id.
    *
    * broadcastPolys: hint the (small) polygon-cell side for a broadcast hash
    * join — the default for dimension-sized layers. With salted > 1 the join
    * key becomes (cell, salt) to split hot cells across reducers. */
  def join(points: DataFrame, polys: DataFrame, level: Int = DefaultLevel,
           broadcastPolys: Boolean = true, salt: Int = 1): DataFrame = {
    val pc0 = polygonCells(polys, level)
    val refined: DataFrame => DataFrame = df =>
      df.where(call_function("st_point_in_polygon", col("lat"), col("lon"), col("ring")))
        .drop("ring", "salt")
    if (salt <= 1) {
      val pc = if (broadcastPolys) broadcast(pc0) else pc0
      refined(points.join(pc, Seq("cell"), "inner"))
    } else {
      val saltedPoints = points.withColumn(
        "salt", pmod(xxhash64(col("doc_id"), col("offset")), lit(salt)).cast("int"))
      val saltedPolys0 = pc0.withColumn(
        "salt", explode(sequence(lit(0), lit(salt - 1))))
      val saltedPolys = if (broadcastPolys) broadcast(saltedPolys0) else saltedPolys0
      refined(saltedPoints.join(saltedPolys, Seq("cell", "salt"), "inner"))
    }
  }

  /** Containment-only variants: docs that have >=1 point in any polygon
    * (left-semi) or in none (left-anti) — no row multiplication. */
  def containedDocs(points: DataFrame, polys: DataFrame,
                    level: Int = DefaultLevel): DataFrame = {
    val hits = join(points, polys, level).select("doc_id").distinct()
    points.select("doc_id").distinct().join(hits, Seq("doc_id"), "left_semi")
  }

  def uncontainedDocs(points: DataFrame, polys: DataFrame,
                      level: Int = DefaultLevel): DataFrame = {
    val hits = join(points, polys, level).select("doc_id").distinct()
    points.select("doc_id").distinct().join(hits, Seq("doc_id"), "left_anti")
  }
}
