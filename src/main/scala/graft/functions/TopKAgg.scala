package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-buffer top-k aggregate.
  *
  * The window formulation (`row_number() over (partition by g order by v)
  * <= k`, q8) is correct but shuffles EVERY row to sort whole groups —
  * at 100 TB the exchange carries the corpus. `TopK` is the
  * aggregate formulation: each task keeps a k-slot buffer per group
  * (insertion into a sorted pair of arrays — k is small), merges are
  * sorted-array merges, so the exchange carries at most k rows per
  * (partition, group) and the plan partial-aggregates map-side like any
  * sum. Result is IDENTICAL to the window form (same ordering, ties by
  * id ascending) — `TopKAggSpec` pins it.
  *
  * Null order keys / ids are skipped (filter them explicitly when the
  * window twin would rank them); NaN keys are skipped for determinism.
  */
case class TopK(
    child: Expression,
    k: Int,
    largest: Boolean,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopK.Buffer] with UnaryLike[Expression] {

  import TopK.Buffer
  require(k >= 1 && k <= 4096, "k must be in [1, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_topk needs struct<key:double, id:bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false

  /** a strictly better than b? (largest: key desc; ties id asc) */
  private def better(ka: Double, ia: Long, kb: Double, ib: Long): Boolean =
    if (ka != kb) { if (largest) ka > kb else ka < kb } else ia < ib

  override def createAggregationBuffer(): Buffer = new Buffer(0, new Array[Double](k), new Array[Long](k))

  private def insert(buf: Buffer, key: Double, id: Long): Unit = {
    if (key.isNaN) return
    if (buf.n == k && !better(key, id, buf.keys(k - 1), buf.ids(k - 1))) return
    // find insertion point (k is small — linear is fine and branch-cheap)
    var pos = if (buf.n == k) k - 1 else buf.n
    while (pos > 0 && better(key, id, buf.keys(pos - 1), buf.ids(pos - 1))) pos -= 1
    // distinct mode (KMV sketches): an exact (key, id) duplicate sits
    // immediately before the insertion point (ordering is total) — skip it
    if (distinct && pos > 0 && buf.keys(pos - 1) == key && buf.ids(pos - 1) == id) return
    var i = math.min(buf.n, k - 1)
    while (i > pos) { buf.keys(i) = buf.keys(i - 1); buf.ids(i) = buf.ids(i - 1); i -= 1 }
    buf.keys(pos) = key
    buf.ids(pos) = id
    if (buf.n < k) buf.n += 1
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val row = v.asInstanceOf[InternalRow]
    if (row.isNullAt(0) || row.isNullAt(1)) return buf
    insert(buf, row.getDouble(0), row.getLong(1))
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < other.n) { insert(buf, other.keys(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: Buffer): Any =
    new GenericArrayData((0 until buf.n).map { i =>
      new GenericInternalRow(Array[Any](buf.keys(i), buf.ids(i)))
    }.toArray[Any])

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.keys(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.keys(i) = bb.getDouble; buf.ids(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopK =
    copy(child = newChild)
  override def prettyName: String = "graft_topk"
}

/** [[TopK]] with STRING ids — the same bounded-buffer top-k aggregate for
  * rankings whose tie-break is a string column (q89's `score DESC, term`).
  * Ordering: key desc (largest) / asc (smallest), ties broken by id
  * ascending in BINARY order — `UTF8String.compareTo` is byte-wise
  * unsigned lexicographic, exactly the order Spark's `SortOrder` uses for
  * default-collated strings, so the result is identical to the
  * `row_number()` window form (TopKAggSpec pins it). Null keys/ids and
  * NaN keys are skipped, as in [[TopK]]. */
case class TopKStr(
    child: Expression,
    k: Int,
    largest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStr.Buffer] with UnaryLike[Expression] {

  import TopKStr.Buffer
  import org.apache.spark.unsafe.types.UTF8String
  require(k >= 1 && k <= 4096, "k must be in [1, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_topk_str needs struct<key:double, id:string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", DoubleType), StructField("id", StringType))),
    containsNull = false)
  override def nullable: Boolean = false

  /** a strictly better than b? (largest: key desc; ties id asc binary) */
  private def better(ka: Double, ia: UTF8String, kb: Double, ib: UTF8String): Boolean =
    if (ka != kb) { if (largest) ka > kb else ka < kb } else ia.compareTo(ib) < 0

  override def createAggregationBuffer(): Buffer =
    new Buffer(0, new Array[Double](k), new Array[UTF8String](k))

  private def insert(buf: Buffer, key: Double, id: UTF8String): Unit = {
    if (key.isNaN) return
    if (buf.n == k && !better(key, id, buf.keys(k - 1), buf.ids(k - 1))) return
    var pos = if (buf.n == k) k - 1 else buf.n
    while (pos > 0 && better(key, id, buf.keys(pos - 1), buf.ids(pos - 1))) pos -= 1
    var i = math.min(buf.n, k - 1)
    while (i > pos) { buf.keys(i) = buf.keys(i - 1); buf.ids(i) = buf.ids(i - 1); i -= 1 }
    buf.keys(pos) = key
    // the input UTF8String may be backed by the operator's reused row
    // buffer — copy on store, and only for rows that actually enter
    buf.ids(pos) = id.clone()
    if (buf.n < k) buf.n += 1
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val row = v.asInstanceOf[InternalRow]
    if (row.isNullAt(0) || row.isNullAt(1)) return buf
    insert(buf, row.getDouble(0), row.getUTF8String(1))
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < other.n) { insert(buf, other.keys(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: Buffer): Any =
    new GenericArrayData((0 until buf.n).map { i =>
      new GenericInternalRow(Array[Any](buf.keys(i), buf.ids(i)))
    }.toArray[Any])

  override def serialize(buf: Buffer): Array[Byte] = {
    val byteLens = (0 until buf.n).map(i => buf.ids(i).numBytes())
    val bb = ByteBuffer.allocate(4 + buf.n * 12 + byteLens.sum)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.keys(i))
      bb.putInt(byteLens(i))
      bb.put(buf.ids(i).getBytes)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.keys(i) = bb.getDouble
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.ids(i) = UTF8String.fromBytes(arr)
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStr =
    copy(child = newChild)
  override def prettyName: String = "graft_topk_str"
}

object TopKStr {
  import org.apache.spark.unsafe.types.UTF8String
  final class Buffer(var n: Int, val keys: Array[Double], val ids: Array[UTF8String])

  /** Column wrapper: top-k (id, key) per group, sorted best-first
    * (largest: key desc, ties id asc binary). */
  def topKStr(order: Column, id: Column, k: Int, largest: Boolean = true): Column =
    ColumnBridge.column(
      TopKStr(
        ColumnBridge.expression(
          struct(order.cast("double").as("key"), id.cast("string").as("id"))),
        k, largest).toAggregateExpression())
}

object TopK {
  final class Buffer(var n: Int, val keys: Array[Double], val ids: Array[Long])

  /** Column wrapper: top-k (id, key) per group, sorted best-first
    * (largest: key desc, ties id asc). */
  def topK(order: Column, id: Column, k: Int, largest: Boolean = true): Column =
    ColumnBridge.column(
      TopK(
        ColumnBridge.expression(
          struct(order.cast("double").as("key"), id.cast("long").as("id"))),
        k, largest).toAggregateExpression())

  /** Bottom-k DISTINCT (key, id) pairs — the KMV-sketch building block:
    * k smallest distinct hashes per group in O(k) state. Exactness trick:
    * order by (double(h), h) — the double cast is monotone, exact-long
    * ties break on the id — so the buffer holds the exact k smallest
    * longs even where doubles collide. */
  def bottomKDistinct(order: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopK(
        ColumnBridge.expression(
          struct(order.cast("double").as("key"), id.cast("long").as("id"))),
        k, largest = false, distinct = true).toAggregateExpression())
}
