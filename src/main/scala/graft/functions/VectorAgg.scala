package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector-mean aggregate for quantizer training.
  *
  * The builtin formulation (`posexplode` → groupBy(cell, pos) →
  * grid-exact scalar mean, q58) multiplies every input row by the vector
  * dimension before the aggregation consumes it — a 64-dim embedding
  * becomes 64 shuffle-input rows. `GridVectorMean` keeps whole vectors:
  * one buffer of dim longs per group, elementwise updates, associative
  * merges — so a 100 TB training pass hands the hash aggregate n rows,
  * not n×dim, and the exchange carries one serialized buffer per
  * (partition, cell).
  *
  * Exactness contract (identical to the explode form): each component is
  * rounded to the 1/grid integer grid with HALF_UP at scale 0 — the same
  * `BigDecimal` rounding Spark's `round()` applies — summed in exact long
  * arithmetic (order-free), and the mean is `(sum / grid) / n` in that
  * association. The result is bit-identical to
  * `sum(round(v*grid).cast(long)).cast(double) / grid / count(*)`.
  */
case class GridVectorMean(
    child: Expression,
    grid: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GridVectorMean.Buffer] with UnaryLike[Expression] {

  import GridVectorMean.Buffer

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"grid_vector_mean needs array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Buffer = new Buffer(0L, null)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Long](dim)
    require(buf.sums.length == dim,
      s"grid_vector_mean: ragged input (dim $dim vs ${buf.sums.length})")
    var i = 0
    while (i < dim) {
      require(!arr.isNullAt(i), "grid_vector_mean: null vector component")
      val d = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      // Spark round() semantics: BigDecimal HALF_UP (away from zero on
      // .5), NOT Math.round (toward +inf on negative .5)
      buf.sums(i) += java.math.BigDecimal.valueOf(d * grid)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    buf.n += 1
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.sums == null) return buf
    if (buf.sums == null) { buf.sums = other.sums.clone(); buf.n = other.n; return buf }
    require(buf.sums.length == other.sums.length, "grid_vector_mean: ragged merge")
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: Buffer): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.sums.map(_.toDouble / grid / buf.n))

  override def serialize(buf: Buffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + 8 * dim)
    bb.putLong(buf.n).putInt(dim)
    var i = 0
    while (i < dim) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val dim = bb.getInt
    if (dim == 0) new Buffer(n, null)
    else {
      val sums = new Array[Long](dim)
      var i = 0
      while (i < dim) { sums(i) = bb.getLong; i += 1 }
      new Buffer(n, sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GridVectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GridVectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GridVectorMean =
    copy(child = newChild)
  override def prettyName: String = "grid_vector_mean"
}

object GridVectorMean {
  final class Buffer(var n: Long, var sums: Array[Long])

  /** Column wrapper: grid-exact elementwise mean of an array column. */
  def gridMeanVec(c: Column, grid: Double = 1e7): Column =
    ColumnBridge.column(
      GridVectorMean(ColumnBridge.expression(c), grid).toAggregateExpression())
}
