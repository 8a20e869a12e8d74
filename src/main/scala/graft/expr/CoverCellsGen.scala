package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StructType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Cells

/** Native table-generating function (UDTF): one polygon ring -> N covering
  * geohash cells at an adaptive level (same semantics as
  * st_cover_cells_adaptive, but as a true Catalyst Generator so SQL can say
  * `SELECT poly_id, cell FROM polys LATERAL VIEW st_cover_cells_gen(ring, 5, 1024) t AS cell`
  * without materializing the intermediate array).
  *
  * ring: array<struct<lat:double,lon:double>>; level/maxLevel and the
  * per-polygon cell budget are foldable ints.
  */
case class CoverCellsGen(ring: Expression, maxLevel: Expression, maxCells: Expression)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(ring, maxLevel, maxCells)

  override def elementSchema: StructType = new StructType().add("cell", StringType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    ring.dataType match {
      case org.apache.spark.sql.types.ArrayType(_: StructType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"st_cover_cells_gen expects array<struct<lat,lon>>, got ${other.catalogString}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val ad = ring.eval(input).asInstanceOf[ArrayData]
    if (ad == null) return Iterator.empty
    val n = ad.numElements()
    if (n < 3) return Iterator.empty
    val flat = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      val r = ad.getStruct(i, 2)
      flat(2 * i) = r.getDouble(0)
      flat(2 * i + 1) = r.getDouble(1)
      i += 1
    }
    val lvl = maxLevel.eval(input).asInstanceOf[Int]
    val cap = maxCells.eval(input).asInstanceOf[Int]
    val cells = Cells.coverRingAdaptive(flat, lvl, cap)
    if (cells == null) Iterator.empty
    else cells.iterator.map(c =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(c))): InternalRow)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ring = newChildren(0), maxLevel = newChildren(1), maxCells = newChildren(2))
}
