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
  * Buffer layout: [sum_0 … sum_{D-1}, count]; D is fixed by the first
  * non-null row (ragged inputs follow the min-length convention of the
  * vector expressions).
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
    val b = if (buffer.isEmpty) new Array[Double](d + 1) else buffer
    val n = math.min(d, b.length - 1)
    var i = 0
    while (i < n) { b(i) += v.getDouble(i); i += 1 }
    b(b.length - 1) += 1.0
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    val n = math.min(b1.length, b2.length)
    var i = 0
    while (i < n) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer.isEmpty || buffer(buffer.length - 1) == 0.0) return null
    val count = buffer(buffer.length - 1)
    val out = new Array[Double](buffer.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buffer(i) / count; i += 1 }
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
