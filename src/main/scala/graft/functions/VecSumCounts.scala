package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise sum + per-dimension count of an `array<long>` column as ONE
  * aggregation — the packed Lloyd-round reduction (VERDICT r05 #5).
  *
  * Semantics are EXACTLY the r5 two-step formulation
  * `posexplode(q) → groupBy(d) → (sum(x), count(1))` re-packed per group:
  *  - a null ARRAY contributes nothing (posexplode emits no rows);
  *  - a null ELEMENT at dimension d increments `counts[d]` but not
  *    `sums[d]` (count(1) counted the exploded row, sum skipped the null);
  *  - ragged arrays contribute only to the dimensions they have;
  *  - sums use exact long arithmetic that THROWS on overflow
  *    (`Math.addExact`), matching ANSI `sum` over BIGINT.
  *
  * As a [[TypedImperativeAggregate]] it runs inside ObjectHashAggregate —
  * no sort, full map-side partial aggregation — and the shuffle carries ONE
  * buffer row per (group × partition) instead of `dim` subtotal rows: at
  * the paper's ~100k clusters × 1k dims that is the difference between
  * shuffling/collecting 10⁸ per-dimension rows and 10⁵ packed arrays per
  * Lloyd round. Equivalence vs the explode formulation is property-tested
  * in SketchExpressionSpec.
  */
case class VecSumCounts(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumCounts.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false)),
    StructField("counts", ArrayType(LongType, containsNull = false))))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum_counts expects array<bigint>, got ${t.catalogString}")
    }

  override def createAggregationBuffer(): VecSumCounts.Buffer =
    new VecSumCounts.Buffer(new Array[Long](0), new Array[Long](0))

  override def update(b: VecSumCounts.Buffer, input: InternalRow): VecSumCounts.Buffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    b.grow(n)
    var i = 0
    while (i < n) {
      b.counts(i) += 1L
      if (!arr.isNullAt(i)) b.sums(i) = Math.addExact(b.sums(i), arr.getLong(i))
      i += 1
    }
    b
  }

  override def merge(b: VecSumCounts.Buffer, o: VecSumCounts.Buffer): VecSumCounts.Buffer = {
    b.grow(o.sums.length)
    var i = 0
    while (i < o.sums.length) {
      b.sums(i) = Math.addExact(b.sums(i), o.sums(i))
      b.counts(i) += o.counts(i)
      i += 1
    }
    b
  }

  override def eval(b: VecSumCounts.Buffer): Any =
    InternalRow(new GenericArrayData(b.sums), new GenericArrayData(b.counts))

  override def serialize(b: VecSumCounts.Buffer): Array[Byte] = {
    val n = b.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sums(i)); bb.putLong(b.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumCounts.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = new Array[Long](n); val c = new Array[Long](n)
    var i = 0
    while (i < n) { s(i) = bb.getLong(); c(i) = bb.getLong(); i += 1 }
    new VecSumCounts.Buffer(s, c)
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumCounts =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumCounts =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumCounts =
    copy(child = newChildren.head)
}

object VecSumCounts {
  /** Growable (sums, counts) pair; dimensions never seen stay 0/0. */
  final class Buffer(var sums: Array[Long], var counts: Array[Long]) {
    def grow(n: Int): Unit = if (n > sums.length) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
  }

  /** Column API. */
  def vec_sum_counts(c: Column): Column =
    Bridge.column(VecSumCounts(Bridge.expression(c))
      .toAggregateExpression(isDistinct = false))
}
