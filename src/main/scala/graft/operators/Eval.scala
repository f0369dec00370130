package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model / dataset evaluation statistics computed distributively:
  * rank-based ROC AUC, equi-depth calibration bins, robust (median/MAD)
  * outlier flags, and the 2-D Pareto frontier (cost-vs-quality skyline of
  * candidate models or configs).
  *
  * All four are designed to be bit-identical across engines so they can
  * be oracled: AUC and NTILE rest on integer rank statistics (sums of
  * half-integers are exact doubles), MAD on exact median interpolation of
  * integers, and the skyline on pure comparisons.
  *
  * Scale shape: AUC sorts once per group (a range-partitioned sort at
  * cluster scale — the same shape as any global ORDER BY); calibration
  * bins ride the identical sort; MAD is two exact-percentile passes per
  * group; the skyline is ONE sort + ONE running-max window, O(n log n)
  * where the textbook formulation is an O(n²) self-join.
  */
object Eval {

  /** Rank-based ROC AUC per group (Mann–Whitney U): with ascending score
    * ranks r_i averaged over ties,
    *
    *   AUC = (Σ_{i∈pos} r_i − n_pos(n_pos+1)/2) / (n_pos · n_neg)
    *
    * Tie handling via average ranks makes the result independent of any
    * ordering ambiguity, and every intermediate is a half-integer (exact
    * in doubles below 2^52), so the one final division is the only
    * rounding step — bit-identical on any engine and partitioning.
    *
    * Input: `df(groupCol, score double, label boolean-ish int)`. Output:
    * one row per group — n_pos, n_neg, auc. */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val byScore = Window.partitionBy(groupCol).orderBy(col(scoreCol))
    val ties = Window.partitionBy(groupCol, scoreCol)
    val ranked = df
      .withColumn("__r", rank().over(byScore))
      // average rank of a tie group of size c starting at min-rank r:
      // r + (c-1)/2 — a half-integer, exact in doubles
      .withColumn("__avg_rank",
        col("__r") + (count(lit(1)).over(ties) - 1) / 2.0)
    ranked.groupBy(col(groupCol))
      .agg(
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n_neg"),
        sum(when(col(labelCol) === 1, col("__avg_rank"))
          .otherwise(0.0)).as("__pos_rank_sum"))
      .withColumn("auc",
        (col("__pos_rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2.0)
          / (col("n_pos") * col("n_neg")))
      .drop("__pos_rank_sum")
  }

  /** Equi-depth (NTILE) binning of `valueCol` with per-bin summary — the
    * distributed reliability-diagram / feature-discretization primitive.
    * `tieBreak` must make the sort total or NTILE's bin boundaries are
    * ambiguous. Aggregates go through exact decimal sums (caller supplies
    * an exact-decimal view of the value). */
  def equiDepthBins(df: DataFrame, bins: Int, valueCol: Column,
                    decimalView: Column, tieBreak: Column): DataFrame = {
    val w = Window.orderBy(valueCol, tieBreak)
    df.withColumn("__bin", ntile(bins).over(w))
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(valueCol).as("lo"),
        max(valueCol).as("hi"),
        (sum(decimalView).cast("double") / count(lit(1))).as("mean"))
  }

  /** Robust per-group outlier summary: median, MAD (median absolute
    * deviation), and the count of points with |x − med| > k·MAD. Exact
    * `percentile(0.5)` on integer data yields half-integers, so every
    * comparison is exact. Two passes per group (median, then MAD) — each
    * a sort within the group's partition, no cross-group shuffle beyond
    * the groupBy. */
  def madOutliers(df: DataFrame, groupCol: String, xCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(xCol), lit(0.5)).as("med"))
    val dev = df.join(med, groupCol)
      .withColumn("__adev", abs(col(xCol) - col("med")))
    val mad = dev.groupBy(col(groupCol), col("med"))
      .agg(percentile(col("__adev"), lit(0.5)).as("mad"))
    dev.join(mad.select(col(groupCol), col("mad")), groupCol)
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__adev") > col("mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** 2-D Pareto frontier over distinct (cost, gain) points: minimize
    * `costCol`, maximize `gainCol`. A point is dominated iff some other
    * point is ≤ cost and ≥ gain with one strict inequality.
    *
    * One sort by (cost asc, gain desc) + one running-max window replaces
    * the quadratic NOT-EXISTS self-join: after deduplication a point is
    * on the frontier exactly when its gain strictly exceeds every
    * preceding point's (preceding points all have ≤ cost; equal-cost
    * higher-gain points sort first and correctly eliminate). */
  def skyline2D(df: DataFrame, costCol: String, gainCol: String): DataFrame = {
    val pts = df.groupBy(col(costCol), col(gainCol))
      .agg(count(lit(1)).as("n_points"))
    val w = Window.orderBy(col(costCol).asc, col(gainCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("__prevmax", max(col(gainCol)).over(w))
      .filter(col("__prevmax").isNull || col(gainCol) > col("__prevmax"))
      .drop("__prevmax")
  }
}
