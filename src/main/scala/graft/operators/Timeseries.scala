package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics per key: truncated exponentially-weighted
  * moving averages and first-order (Markov) transition matrices. Both are
  * one-shuffle operators — everything after the partition-by-key exchange
  * is a local sort + window walk.
  *
  * Determinism notes (these are oracled queries):
  *   - the EWMA decay is 1/2, so every weight 0.5^j is a power of two and
  *     `x · w` is an EXACT scaling (exponent shift, no rounding); only
  *     the additions round, and both engines add in the same fixed frame
  *     order (Spark: `aggregate` over the frame list; DuckDB:
  *     `list_reduce` over the window list);
  *   - transition probabilities are one division of two exact longs.
  */
object Timeseries {

  /** Truncated EWMA with decay 1/2 over the last `depth` rows per key
    * (most-recent-heaviest):
    *
    *   ewma_i = Σ_{j=0..d-1} 0.5^j · x_{i−j}  /  Σ_{j=0..d-1} 0.5^j
    *
    * truncating at the partition start. The frame is bounded (`depth`
    * rows), so state per row is O(depth) — this is the scale-safe form of
    * the recursive EWMA, whose dependency chain cannot be parallelised.
    * `orderCols` must be a total order within each key. */
  def ewmaHalf(df: DataFrame, keyCol: String, xCol: String,
               orderCols: Seq[Column], depth: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 52, "0.5^depth must stay a normal double")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-(depth - 1), 0)
    // frame list arrives oldest-first; weight index j counts back from
    // the newest element (j = size-1-i), summed left-to-right
    val frame = collect_list(col(xCol)).over(w)
    df.withColumn("__f", frame)
      .withColumn("ewma",
        expr("""
          aggregate(
            zip_with(__f, sequence(size(__f) - 1, 0, -1), (x, j) -> x * power(0.5d, j)),
            0.0d, (acc, v) -> acc + v)
          / aggregate(
            zip_with(__f, sequence(size(__f) - 1, 0, -1), (x, j) -> power(0.5d, j)),
            0.0d, (acc, v) -> acc + v)"""))
      .drop("__f")
  }

  /** First-order transition counts and probabilities per key sequence:
    * rows ordered by `orderCols` within `keyCol`, counting (state →
    * next-state) adjacencies over `stateCol`, then normalising per source
    * state. The output is the Markov chain estimate of the corpus.
    *
    * One exchange (partition by key) + one groupBy on (from, to); the
    * probability divide is exact-long / exact-long — order-free. */
  def transitions(df: DataFrame, keyCol: String, stateCol: String,
                  orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val adj = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
    val counts = adj.groupBy(col(stateCol).as("from_state"),
        col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_state"))
      .agg(sum(col("n")).as("__tot"))
    counts.join(totals, "from_state")
      .withColumn("p", col("n").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
  }

  /** Resample each key's irregular observations onto a regular grid with
    * forward fill: one tick every `step` time units (grid anchored at
    * epoch 0: tick = ⌊t/step⌋·step — floor, so pre-epoch negative
    * timestamps anchor correctly), each tick carrying the most recent
    * observation at or before it — the gap-fill that turns event streams
    * into the aligned matrix ML featurization wants.
    *
    * Scale shape: the grid generates from per-key (min, max) bounds — a
    * tiny aggregate — and the fill is the backward as-of join
    * ([[TemporalJoin.asOfJoin]]'s union-sort-window plan): one shuffle
    * of grid+observations, no per-tick probe join. Grid size is
    * span/step per key, independent of observation count.
    *
    * `(keyCol, timeCol)` must be unique (as-of payload determinism);
    * `timeCol` is a long (epoch micros). */
  def resampleFfill(df: DataFrame, keyCol: String, timeCol: String,
                    valueCol: String, step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    val obs = df.select(col(keyCol), col(timeCol), col(valueCol))
    val grid = obs.groupBy(col(keyCol))
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(
          col("__lo") - pmod(col("__lo"), lit(step)),
          col("__hi") - pmod(col("__hi"), lit(step)),
          lit(step))).as("tick"))
    TemporalJoin.asOfJoin(grid, obs, Seq(keyCol), "tick", timeCol, Seq(valueCol))
  }

  /** OHLC bars: per (key, time bucket) the first/highest/lowest/last
    * value — the compaction that turns a tick stream into the fixed-size
    * summary charting, feature windows, and anomaly baselines consume.
    * One hash aggregate with full map-side combine (min_by/max_by/min/
    * max/count all partial-aggregate), one shuffle of bar-width rows.
    * Selections only — no sums — so bars are bit-exact under any
    * partitioning. `(keyCol, timeCol)` must be unique (open/close
    * determinism; same contract as [[twap]]). */
  def ohlc(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
           step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol),
        (col(timeCol) - pmod(col(timeCol), lit(step))).as("bucket"))
      .agg(
        min_by(col(valueCol), col(timeCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(timeCol)).as("close"),
        count(lit(1)).as("n_ticks"))
  }

  /** Time-weighted average (TWAP): each observation holds until the next
    * one, so its weight is the duration to its successor —
    * Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first) per key (the final observation
    * carries no interval; keys with one observation are excluded, their
    * TWAP being undefined). The un-weighted mean over-counts bursts; the
    * time weighting is what "average position/price/load over the day"
    * actually means.
    *
    * Exactness: duration is an exact long; the value canonicalizes to
    * DECIMAL(12,4), so every product and the sums are exact decimals —
    * order-free. The quotient rounds to the 1e-6 grid: wide decimals cast
    * to double in TWO steps in some engines (int128→double, then the
    * scale divide) and disagree with a correctly-rounded cast by an ulp
    * above 2^53 — rounding absorbs it. One exchange (window by key),
    * one aggregate.
    *
    * Null values drop before the lead, so the prior observation simply
    * holds across the gap — a null never deflates the numerator while
    * its duration still counts in the denominator.
    * `(keyCol, timeCol)` must be unique: with two observations at the
    * same instant, WHICH value carries the next interval depends on an
    * arbitrary tie order — pre-aggregate duplicates upstream. */
  def twap(df: DataFrame, keyCol: String, timeCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol))
    df.filter(col(valueCol).isNotNull).withColumn("__nt", lead(col(timeCol), 1).over(w))
      .filter(col("__nt").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        sum(col(valueCol).cast("decimal(12,4)") *
          (col("__nt") - col(timeCol)).cast("decimal(16,0)")).as("__num"),
        sum((col("__nt") - col(timeCol)).cast("decimal(16,0)")).as("__den"),
        count(lit(1)).as("n_intervals"))
      .select(col(keyCol), col("n_intervals"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("twap"))
  }
}
