package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch-based scale paths next to their
  * exact counterparts (q59 exact percentiles, q5/q15 exact distinct
  * counts). At 100 TB the exact forms still work but pay a full shuffle
  * of the value space; the sketches shuffle kilobytes per partition and
  * merge associatively, so they compose with any partial-aggregation or
  * incremental (per-shard, per-day) topology.
  *
  * Both are engine-specific binary sketches, so there is no DuckDB
  * oracle; `ApproxSpec` pins the laws that make them trustworthy instead:
  * bounded error vs the exact answer, and shard-merge ≡ single-pass.
  */
object Approx {

  /** Approximate percentiles via Spark's builtin Greenwald–Khanna
    * variant: rank error ≤ 1/accuracy. One partial-aggregated exchange of
    * sketch state. */
  def percentiles(df: DataFrame, value: String, ps: Seq[Double],
                  accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(value),
      array(ps.map(lit): _*), lit(accuracy)).as("pcts"))

  /** DataSketches HLL distinct-count sketch per group. `lgK` trades size
    * (2^lgK bytes-ish) for relative error (~1.04/sqrt(2^lgK)). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], value: Column,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"))

  /** Merge per-shard sketches (register-wise max — associative and
    * order-independent) and estimate. Input: output of [[distinctSketch]]
    * over any sharding of the same data. */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String],
                    lgK: Int = 12): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("approx_distinct"))

  def estimate(sketchCol: Column): Column = hll_sketch_estimate(sketchCol)
}
