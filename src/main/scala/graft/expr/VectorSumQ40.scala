package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** st_vecsum_q40(array<double>, dim): EXACT per-element vector sum in Q40
  * fixed point — each element contributes round(v * 2^40) to a long
  * accumulator, so the aggregate is ASSOCIATIVE-EXACT: identical under any
  * partitioning, task order, or partial-aggregation split (long addition
  * never rounds), which is what the deterministic k-means fit needs from a
  * distributed centroid update. Compare the alternatives: a DOUBLE sum is
  * reduction-order-dependent; a DECIMAL sum is exact but needs the vector
  * EXPLODED to one row per element (sample x dim shuffle rows — the
  * dominant cost of a Lloyd round at k ~ 10^3); this aggregate keeps one
  * buffer per group with map-side combine, so the shuffle carries
  * O(tasks x groups) buffers instead of O(sample x dim) rows.
  *
  * Quantization: |v| <= 1 for normalized vectors, quantum 2^-40 ~ 9e-13 —
  * far below any clustering-relevant signal; accumulator headroom
  * 2^63 / 2^40 = 2^23 rows per group at |v| = 1 (the 64k sample cap uses
  * 2^16). Null/ragged inputs contribute nothing (the skip law of a SQL
  * sum over exploded elements). The DOMAIN IS ENFORCED, not just
  * documented: an element with |v| > 2^22 (or NaN), or an accumulator
  * exceeding Long range, THROWS ArithmeticException — never a silently
  * saturated/wrapped sum (the raise-on-overflow discipline of the DECIMAL
  * sum this replaces). Output: array<long> of the raw Q40 sums —
  * consumers divide by 2^40 (or not: renormalization is scale-invariant).
  */
case class VectorSumQ40(child: Expression, dim: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(dim > 0, s"dim must be positive: $dim")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null && arr.numElements() == dim) {
      var i = 0
      while (i < dim) {
        if (!arr.isNullAt(i)) {
          val v = arr.getDouble(i)
          // range gate BEFORE scaling: Math.round saturates silently at
          // Long range, and NaN fails both comparisons -> rejected too
          if (!(v >= -VectorSumQ40.MaxAbs && v <= VectorSumQ40.MaxAbs))
            throw new ArithmeticException(
              s"st_vecsum_q40: element $v outside the Q40 domain (|v| <= 2^22, non-NaN)")
          buf(i) = java.lang.Math.addExact(buf(i),
            java.lang.Math.round(v * VectorSumQ40.Q))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) = java.lang.Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumQ40 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumQ40 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "st_vecsum_q40"
}

object VectorSumQ40 {
  /** Q40 scale: 2^40. */
  val Q: Double = 1099511627776.0

  /** Domain bound per element: |v| <= 2^22 keeps round(v * 2^40) exactly
    * inside Long (2^62) with headroom for accumulation. */
  val MaxAbs: Double = 4194304.0
}
