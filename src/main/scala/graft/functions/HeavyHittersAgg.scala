package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a mergeable aggregate.
  *
  * State is AT MOST k (token, count) counters regardless of stream or
  * vocabulary size, and the summary is mergeable with the same guarantee
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012): after any update/merge tree over a stream of
  * n items,
  *
  *   true(t) − n/(k+1)  ≤  est(t)  ≤  true(t)
  *
  * for every token t (absent tokens have est 0). So every token with
  * true count STRICTLY ABOVE n/(k+1) is present in the summary — the
  * recall guarantee the two-pass exact heavy-hitters operator
  * ([[graft.operators.Sketches.heavyHitters]]) builds on.
  *
  * Why this beats `groupBy(token).count()` for candidate finding at
  * 100 TB: exact counting shuffles one row per DISTINCT key, and for
  * corpus-sized key domains (n-grams, URLs) the vocabulary is the corpus.
  * This aggregate partial-aggregates map-side like any sum, but its
  * exchange carries at most k counters per upstream task — sketch-width,
  * not vocab-width.
  *
  * Update rule: increment if present; insert if a slot is free; else
  * decrement ALL k counters by 1 (the arriving item's count is discarded
  * with them — a decrement event destroys k+1 units of mass, so at most
  * n/(k+1) events occur). Merge rule: add counts pairwise; if more than
  * k survive, subtract the (k+1)-th largest count from every counter and
  * drop the non-positive — at least (k+1)·m units of mass are destroyed
  * where every counter lost at most m. Both rules only ever REMOVE mass,
  * never move it between tokens, which is the whole proof.
  *
  * Output (eval) is the summary sorted est DESC, token ASC — a
  * deterministic ORDER for whatever entries survive, but the entry SET
  * below the guarantee line depends on partitioning; callers needing a
  * deterministic result must recount candidates exactly and threshold
  * (the two-pass operator), or read only the guaranteed-present tokens.
  *
  * Null tokens are skipped (they are not items). k ≤ 65536 bounds the
  * serialized buffer.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, "k must be in [1, 65536]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_misra_gries needs a string token, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("est", LongType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]()

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val u = v.asInstanceOf[UTF8String]
    buf.get(u) match {
      case Some(c) => buf.update(u, c + 1) // existing key object is kept
      case None if buf.size < k =>
        // the incoming UTF8String may be backed by a reused UnsafeRow
        // buffer — own the bytes before they escape this call
        buf.update(u.clone(), 1L)
      case None =>
        // decrement-all: k counters and the arriving item each lose 1
        // (snapshot the keys — structural mutation during keysIterator
        // iteration is undefined on mutable.HashMap)
        val keys = buf.keysIterator.toArray
        keys.foreach { key =>
          val c = buf(key) - 1
          if (c <= 0) buf.remove(key) else buf.update(key, c)
        }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      // keys from deserialize/update are already owned copies
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0:
      // at most k counters can exceed that value, so at most k survive
      val counts = buf.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - 1 - k)
      val keys = buf.keysIterator.toArray
      keys.foreach { key =>
        val c = buf(key) - m
        if (c <= 0) buf.remove(key) else buf.update(key, c)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val byEst = java.lang.Long.compare(b._2, a._2)
        if (byEst != 0) byEst else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    buf.keysIterator.foreach(key => bytes += 12 + key.numBytes())
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    buf.foreach { case (t, c) =>
      val tb = t.getBytes
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.update(UTF8String.fromBytes(tb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
  override def prettyName: String = "graft_misra_gries"
}

object MisraGries {
  /** Column wrapper: the ≤ k-entry summary as array<struct<token, est>>,
    * est DESC / token ASC. */
  def sketch(token: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(token.cast("string")), k)
        .toAggregateExpression())
}
