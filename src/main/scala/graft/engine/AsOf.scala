package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single right row with
  * the greatest timestamp <= the left row's timestamp within the same key
  * (ties -> greatest id). Spark has no native ASOF join; the naive
  * formulation (range join + per-left-row max) explodes into a cross
  * product per key.
  *
  * Scale shape: union both sides with a side tag, ONE shuffle on the key,
  * and a running `last(right_id, ignoreNulls)` window ordered by
  * (ts, side, id) — right rows sort before left rows at equal ts, so
  * "at or before" is exact, and the carry-forward costs O(rows) per
  * partition with no candidate multiplication. This is the standard
  * pattern for point-in-time feature lookups (the latest profile/model
  * version visible to each event) at 10^12-row scale.
  */
object AsOf {

  /** left/right must both carry `keyCol`, `tsCol`, `idCol`. Returns the left
    * rows' (key, id, ts) plus `asof_id`/`asof_ts` of the matched right row
    * (null when no right row precedes). */
  def joinAsOf(left: DataFrame, right: DataFrame,
               keyCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id"): DataFrame = {
    val idType = right.schema(idCol).dataType
    val tsType = right.schema(tsCol).dataType
    // null-timestamp rows carry no position on the time axis: a null-ts
    // right row would sort FIRST in the window (nulls-first) and become a
    // spurious carry-forward match with asof_ts = null; drop them on both
    // sides (matching the SQL semantics v.ts <= c.ts, which is never true
    // for nulls)
    val l = left.where(col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("lid"))
      .withColumn("side", lit(1)).withColumn("rid", lit(null).cast(idType))
    val r = right.where(col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("rid"))
      .withColumn("side", lit(0)).withColumn("lid", lit(null).cast(idType))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("side"), coalesce(col("rid"), col("lid")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedId: Column = last(col("rid"), ignoreNulls = true).over(w)
    val matchedTs: Column =
      last(when(col("side") === 0, col("t")).cast(tsType), ignoreNulls = true).over(w)
    l.unionByName(r)
      .withColumn("asof_id", matchedId)
      .withColumn("asof_ts", matchedTs)
      .where(col("side") === 1)
      .select(col("k").as(keyCol), col("lid").as(idCol), col("t").as(tsCol),
        col("asof_id"), col("asof_ts"))
  }
}
