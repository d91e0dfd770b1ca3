package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native vector aggregates for quantizer training (Similarity.scala).
  *
  * [[VectorAvgAgg]] computes the element-wise mean of a float-array column
  * in ONE aggregation pass: float64 accumulators per dimension, one partial
  * buffer per (group × map partition), final mean cast to float32 — the
  * same per-element `avg(x) → CAST(... AS FLOAT)` math the composable form
  * produces, without its plan shape. The composable Lloyd update step was
  * `posexplode(vector) → groupBy(cluster, pos) avg → groupBy(cluster)
  * collect_list/array_sort`: a dim× shuffle-record blowup followed by a
  * SECOND shuffle just to reassemble the array. At 100 TB the difference is
  * shuffling `groups × dim × partitions` partial sums versus
  * `rows × dim` exploded elements — the training corpus never leaves its
  * scan tasks here.
  */
object VectorStats {

  final class VecAvgBuf(var sums: Array[Double], var n: Long) extends Serializable

  def vectorAvg(vec: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      VectorAvgAgg(org.apache.spark.sql.graftbridge.Bridge.expression(vec))
        .toAggregateExpression())

  case class VectorAvgAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[VecAvgBuf] with UnaryLike[Expression] {
    // analysis-time contract: array<float> ONLY. The accumulator reads
    // 4-byte slots (arr.getFloat), so an array<double> child would silently
    // misread 8-byte slots and produce garbage centroids with no error —
    // reject it at analysis instead (callers cast explicitly if needed).
    // (checkInputDataTypes rather than ExpectsInputTypes: AbstractDataType
    // is private[sql], so the trait's signature is unimplementable here.)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_vector_avg requires array<float> input, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_vector_avg"
    override def createAggregationBuffer(): VecAvgBuf = new VecAvgBuf(null, 0L)

    override def update(buffer: VecAvgBuf, input: InternalRow): VecAvgBuf = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        val len = arr.numElements()
        if (buffer.sums == null) buffer.sums = new Array[Double](len)
        require(buffer.sums.length == len,
          s"graft_vector_avg: mixed vector lengths ${buffer.sums.length} vs $len")
        var i = 0
        while (i < len) {
          // a null ELEMENT would read as 0.0 through getFloat and skew the
          // mean silently — refuse loudly; upstream cleans partial vectors
          require(!arr.isNullAt(i),
            s"graft_vector_avg: null element at position $i — filter or " +
              "impute partial vectors before aggregating")
          buffer.sums(i) += arr.getFloat(i); i += 1
        }
        buffer.n += 1L
      }
      buffer
    }

    override def merge(buffer: VecAvgBuf, other: VecAvgBuf): VecAvgBuf = {
      if (other.sums != null) {
        if (buffer.sums == null) { buffer.sums = other.sums; buffer.n = other.n }
        else {
          require(buffer.sums.length == other.sums.length,
            s"graft_vector_avg: mixed vector lengths in merge")
          var i = 0
          while (i < buffer.sums.length) { buffer.sums(i) += other.sums(i); i += 1 }
          buffer.n += other.n
        }
      }
      buffer
    }

    override def eval(buffer: VecAvgBuf): Any =
      if (buffer.sums == null || buffer.n == 0L) null
      else {
        val out = new Array[Any](buffer.sums.length)
        var i = 0
        while (i < buffer.sums.length) {
          out(i) = (buffer.sums(i) / buffer.n).toFloat
          i += 1
        }
        new GenericArrayData(out)
      }

    override def serialize(buffer: VecAvgBuf): Array[Byte] = {
      val len = if (buffer.sums == null) -1 else buffer.sums.length
      val bb = java.nio.ByteBuffer.allocate(8 + 4 + math.max(0, len) * 8)
      bb.putLong(buffer.n).putInt(len)
      if (len > 0) buffer.sums.foreach(bb.putDouble)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): VecAvgBuf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getLong
      val len = bb.getInt
      if (len < 0) new VecAvgBuf(null, n)
      else {
        val sums = new Array[Double](len)
        var i = 0
        while (i < len) { sums(i) = bb.getDouble; i += 1 }
        new VecAvgBuf(sums, n)
      }
    }

    override def withNewMutableAggBufferOffset(o: Int): VectorAvgAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): VectorAvgAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): VectorAvgAgg =
      copy(child = c)
  }
}
