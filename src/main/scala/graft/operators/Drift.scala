package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * data-quality gate that catches a silently changed upstream source
  * before it trains into a model.
  *
  *   - [[psi]]: Population Stability Index over a caller-supplied binning,
  *     Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ). Each term is libm-rounded to 9 decimals and
  *     summed as exact decimal (the q94 entropy idiom), so the aggregate
  *     is order-free and engine-portable. Bins empty on either side carry
  *     infinite PSI in theory; here they are excluded from the sum and
  *     REPORTED as exact one-sided row counts — a drift alarm in their
  *     own right, not a silent drop.
  *   - [[ks]]: exact two-sample Kolmogorov–Smirnov statistic,
  *     max |ECDF₁−ECDF₂|. Computed as integer cross-multiplied cumulative
  *     counts (|k₁·n₂ − k₂·n₁|, all BIGINT-exact) with ONE IEEE division
  *     at the end — bit-identical across engines, no tolerance needed.
  *
  * Scale: both reduce each side to per-bin / per-distinct-value counts
  * map-side before any exchange. KS's cumulative window runs over the
  * DISTINCT value set — for continuous features with unbounded domains,
  * quantize first (the binning is the caller's `value` expression); the
  * windowed set is then bounded regardless of row count.
  */
object Drift {

  /** Per-group PSI of `cand` against `base` under `bin`. One row per
    * group: psi (over shared bins), the one-sided masses, and bin counts. */
  def psi(base: DataFrame, cand: DataFrame, bin: Column): DataFrame = {
    // a null bin is "no observation", not a bin: SQL's full join never
    // matches null keys, so an unfiltered shared null bin would
    // double-report as base_only AND cand_only
    val b = base.filter(bin.isNotNull).groupBy(bin.as("bin")).agg(count(lit(1)).as("c1"))
    val c = cand.filter(bin.isNotNull).groupBy(bin.as("bin")).agg(count(lit(1)).as("c2"))
    val joined = b.join(c, Seq("bin"), "full")
    val tot = joined.agg(
      sum(coalesce(col("c1"), lit(0L))).as("n1"),
      sum(coalesce(col("c2"), lit(0L))).as("n2"))
    val p = col("c1").cast("double") / col("n1").cast("double")
    val q = col("c2").cast("double") / col("n2").cast("double")
    joined.crossJoin(broadcast(tot))
      .withColumn("term",
        when(col("c1").isNotNull && col("c2").isNotNull,
          round((p - q) * log(p / q), 9).cast("decimal(18,9)"))
          .otherwise(lit(null)))
      .agg(
        sum("term").cast("double").as("psi"),
        coalesce(sum(when(col("c2").isNull, col("c1"))), lit(0L)).as("base_only_rows"),
        coalesce(sum(when(col("c1").isNull, col("c2"))), lit(0L)).as("cand_only_rows"),
        count(when(col("c1").isNotNull && col("c2").isNotNull, 1)).as("shared_bins"))
  }

  /** Pearson chi-square independence statistic over the (a, b)
    * contingency table: Σ (O−E)²/E with E = rowTot·colTot/n. The
    * dimension-independence screen (is `source` independent of `lang`?)
    * next to [[psi]]'s one-dimensional profile shift. Observed counts
    * reduce map-side; expected values are per-cell IEEE arithmetic on
    * exact longs; per-cell terms round to 9 decimals then sum as exact
    * decimal (the q94 idiom — cell order must not matter). Null
    * categories drop (no observation); dof = (|A|−1)(|B|−1).
    *
    * The statistic REQUIRES the full |A|·|B| grid (an unobserved cell
    * still contributes (0−E)²/E = E), so pointed at two high-cardinality
    * columns it would materialize |A|·|B| rows — a misuse, since
    * chi-square on a grid with tiny expected counts is statistically
    * meaningless anyway. `maxCells` fail-fasts on it: the cardinalities
    * come from one tiny aggregate (collected eagerly at call time — this
    * operator runs a job when CALLED, not when consumed), and callers
    * quantize/bucket a continuous column first, same contract as [[ks]].
    * Collecting the totals also inlines n/ka/kb as plan literals, which
    * drops the two scalar crossJoins the r4 plan carried. */
  def chiSquare(df: DataFrame, a: Column, b: Column,
                maxCells: Long = 4000000L): DataFrame = {
    val spark = df.sparkSession
    val cells = df.filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("__a"), b.as("__b")).agg(count(lit(1)).as("o"))
      .localCheckpoint() // reused thrice: row totals, col totals, grid
    val tot = cells.agg(coalesce(sum("o"), lit(0L)).as("n"),
      countDistinct("__a").as("ka"), countDistinct("__b").as("kb")).head()
    val (n, ka, kb) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    require(ka * kb <= maxCells,
      s"chiSquare: contingency grid is $ka x $kb = ${ka * kb} cells, over " +
        s"maxCells=$maxCells — bucket/quantize the high-cardinality column " +
        "first (the statistic is meaningless at near-zero expected counts)")
    if (n == 0L)
      return spark.range(1).select(
        lit(null).cast("double").as("chi2"),
        lit(null).cast("long").as("dof"), lit(null).cast("long").as("n"))
    val rowT = cells.groupBy("__a").agg(sum("o").as("ra"))
    val colT = cells.groupBy("__b").agg(sum("o").as("cb"))
    // FULL grid: an unobserved (a, b) combination still contributes
    // (0−E)²/E = E — omitting zero cells understates the statistic
    rowT.crossJoin(colT)
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("__e",
        (col("ra") * col("cb")).cast("double") / lit(n).cast("double"))
      .withColumn("__t", round(
        (col("o").cast("double") - col("__e")) *
          (col("o").cast("double") - col("__e")) / col("__e"), 9)
        .cast("decimal(18,9)"))
      .agg(
        sum(col("__t")).cast("double").as("chi2"),
        lit((ka - 1L) * (kb - 1L)).as("dof"),
        lit(n).as("n"))
  }

  /** Exact two-sample KS statistic of `cand` vs `base` over `value`.
    * Returns one row: (n_base, n_cand, ks_num, ks_stat) where
    * ks_num = max |k₁·n₂ − k₂·n₁| (exact) and ks_stat = ks_num/(n₁·n₂). */
  def ks(base: DataFrame, cand: DataFrame, value: Column): DataFrame = {
    // null values drop (no observation): the full join cannot match null
    // keys, so nulls on BOTH sides would otherwise become two unmatched
    // rows injecting a spurious ECDF step
    val b = base.select(value.as("v")).filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c1"))
    val c = cand.select(value.as("v")).filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c2"))
    val u = b.join(c, Seq("v"), "full")
      .select(col("v"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = u.select(
      sum("c1").over(w).as("k1"), sum("c2").over(w).as("k2"))
    val tot = u.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    cum.crossJoin(broadcast(tot))
      .agg(
        max(col("n1")).as("n_base"), max(col("n2")).as("n_cand"),
        max(abs(col("k1") * col("n2") - col("k2") * col("n1"))).as("ks_num"))
      // an empty side makes the statistic undefined — null, not 0/0 NaN
      .withColumn("ks_stat",
        when(col("n_base") > 0 && col("n_cand") > 0,
          col("ks_num").cast("double") /
            (col("n_base") * col("n_cand")).cast("double")))
  }
}
