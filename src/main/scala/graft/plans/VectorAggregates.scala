package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean over an `array<double>` column as a
  * TypedImperativeAggregate (the custom-aggregate path SURVEY.md §4 reserves
  * for exactly this shape).
  *
  * Why: computing per-group centroids by `posexplode → groupBy(group, dim)`
  * shuffles N×D rows — at 100 TB that exchange is the whole job. This
  * aggregate keeps the sum vector in the partial-aggregation buffer, so the
  * shuffle carries one (D+1)-double buffer per group per map task: classic
  * map-side combine, O(#groups × D), independent of N.
  *
  * Buffer layout: [count, sum_0 … sum_{D-1}] — count FIRST, so merging
  * partial buffers whose dimensions differ (ragged inputs, or one partition
  * that only saw empty arrays) aligns the count slots and the shared sum
  * prefix instead of adding one buffer's count into the other's sums.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vector_avg requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_vector_avg"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    if (v == null) return buffer
    val d = v.numElements()
    val b =
      if (buffer.length < d + 1) {
        // grow to fit the widest row seen; count stays at slot 0
        val g = new Array[Double](d + 1)
        System.arraycopy(buffer, 0, g, 0, buffer.length)
        g
      } else buffer
    var i = 0
    while (i < d) { b(i + 1) += v.getDouble(i); i += 1 }
    b(0) += 1.0
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer.isEmpty || buffer(0) == 0.0) return null
    val count = buffer(0)
    val out = new Array[Double](buffer.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buffer(i + 1) / count; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren.head)
}
