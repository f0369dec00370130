package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Secondary sort + streaming per-group scan — the scale-safe pattern for
  * ORDER-dependent per-group computations when groups may be huge.
  *
  * `groupBy(collect_list(...))` materializes each group as one array in
  * one task: a single hot key (one user with 10⁹ events, one order with
  * 10⁶ lines) is an executor OOM. The secondary-sort form —
  * `repartition(key).sortWithinPartitions(key, order)` + `mapPartitions`
  * over CONSECUTIVE rows — keeps O(1) state per group regardless of
  * group size: the shuffle writer spills sorted runs to disk, the scan
  * folds each group as a stream. Same single shuffle as the groupBy; no
  * array ever exists.
  *
  * This is the idiomatic use of `mapPartitions` (SURVEY §2's "last
  * resort"): not imperative row-twiddling, but a sequential fold that
  * windows/aggregates cannot express without materializing the sequence.
  */
object Grouped {

  /** Per-group maximum drawdown (largest peak-to-trough drop of `value`
    * walked in `(order, tie)` sequence) — the canonical order-dependent
    * fold: needs the running peak, inexpressible as an unordered
    * aggregate. Emits (key, n_events, max_peak, max_drawdown).
    *
    * Determinism: only per-row subtraction and max — no summation, so
    * the result is bit-exact regardless of partitioning or engine.
    * `(order, tie)` must totally order each group; null values are
    * dropped (no observation), so `n_events` counts non-null rows. */
  def maxDrawdown(df: DataFrame, key: String, order: String, tie: String,
                  value: String): DataFrame = {
    val keyType = df.schema(key).dataType
    val outSchema = StructType(Seq(
      StructField(key, keyType),
      StructField("n_events", LongType, nullable = false),
      StructField("max_peak", DoubleType, nullable = false),
      StructField("max_drawdown", DoubleType, nullable = false)))
    val sorted = df
      .select(col(key), col(order), col(tie), col(value).cast("double").as(value))
      .filter(col(value).isNotNull)
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(order), col(tie))
    sorted.mapPartitions { rows =>
      // input STREAMS (never materialized); the result buffer holds one
      // row per distinct key in the partition — the same footprint a
      // hash aggregate would carry
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var cur: Any = null
      var started = false
      var n = 0L
      var peak = Double.NegativeInfinity
      var dd = 0.0
      def flush(): Unit = if (started) out += Row(cur, n, peak, dd)
      rows.foreach { r =>
        val k = r.get(0)
        if (!started || k != cur) {
          flush()
          cur = k; started = true
          n = 0L; peak = Double.NegativeInfinity; dd = 0.0
        }
        val v = r.getDouble(3)
        n += 1
        if (v > peak) peak = v
        val drop = peak - v
        if (drop > dd) dd = drop
      }
      flush()
      out.iterator
    }(Encoders.row(outSchema))
  }
}
