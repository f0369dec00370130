package graft.hist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-table transforms behind the reference's plot pipeline — the hist
  * shaping that counts as engine work (SURVEY §2.11 plotting: process
  * scaling/regrouping plot_util.py:187-251, density normalization
  * :383-399, blinding :984-1039, stat errors :1152-1205). All operate on
  * already-aggregated bin tables: driver-scale row counts, executed as
  * ordinary column expressions so they compose with merge/project/rebin.
  */
object PlotUtil {

  /** Scale each process's yields (reference process scaling): sumw scales
    * linearly, its variance quadratically. Unlisted ids pass through. */
  def scaleProcesses(hist: DataFrame, axis: String,
                     factors: Map[Long, Double]): DataFrame = {
    val f = coalesce(
      element_at(
        map(factors.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(lit(k), lit(v))
        }: _*),
        col(s"${axis}_bin").cast("long")),
      lit(1.0))
    hist
      .withColumn("sumw", col("sumw") * f)
      .withColumn("sumw2", col("sumw2") * f * f)
  }

  /** Regroup process bins under new ids (reference regrouping — e.g. all
    * single-top ids → one "top" id) and re-sum. */
  def regroup(hist: DataFrame, axis: String, grouping: Map[Long, Long]): DataFrame = {
    val g = coalesce(
      element_at(
        map(grouping.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(lit(k), lit(v))
        }: _*),
        col(s"${axis}_bin").cast("long")),
      col(s"${axis}_bin").cast("long"))
    val binCols = hist.columns.filter(_.endsWith("_bin")).toSeq
    hist.withColumn(s"${axis}_bin", g)
      .groupBy(binCols.map(col): _*)
      .agg(sum("sumw").as("sumw"), sum("sumw2").as("sumw2"), sum("n").as("n"))
  }

  /** Density normalization: divide by bin width (flow bins get width 1,
    * like the reference's unit-width flow treatment). */
  def density(hist: DataFrame, axis: Axis): DataFrame = {
    val widths: Seq[Double] = axis match {
      case Axis.Regular(_, n, lo, hi) => Seq.fill(n)((hi - lo) / n)
      case Axis.Variable(_, edges)    => edges.sliding(2).map(e => e(1) - e(0)).toSeq
      case _                          => Seq.fill(axis.nBins)(1.0)
    }
    val b = col(s"${axis.name}_bin")
    val w = when(b >= 0 && b < axis.nBins,
      element_at(array(widths.map(lit): _*), b + 1)).otherwise(lit(1.0))
    hist
      .withColumn("sumw", col("sumw") / w)
      .withColumn("sumw2", col("sumw2") / (w * w))
  }

  /** Blind a value window: drop bins whose CENTER falls in [lo, hi] —
    * the reference nulls the data region of a signal window. Flow bins
    * have no center and are never blinded. */
  def blind(hist: DataFrame, axis: Axis, lo: Double, hi: Double): DataFrame = {
    val centers: Seq[Double] = axis match {
      case Axis.Regular(_, n, alo, ahi) =>
        (0 until n).map(i => alo + (i + 0.5) * (ahi - alo) / n)
      case Axis.Variable(_, edges) =>
        edges.sliding(2).map(e => (e(0) + e(1)) / 2).toSeq
      case _ => (0 until axis.nBins).map(_.toDouble)
    }
    val b = col(s"${axis.name}_bin")
    val center = when(b >= 0 && b < axis.nBins,
      element_at(array(centers.map(lit): _*), b + 1))
    hist.filter(center.isNull || center < lo || center > hi)
  }

  /** MC-stat error per bin: σ = √sumw² (reference :1152-1166). */
  def statError(hist: DataFrame): DataFrame =
    hist.withColumn("err", sqrt(col("sumw2")))

  /** Poisson central interval for unweighted counts (reference Poisson
    * intervals :1167-1205), via the Wilson–Hilferty chi² approximation —
    * within ~1% of the exact Garwood bounds for n ≥ 1, exact enough for
    * error bars; documented approximation, not a parity target. */
  def poissonInterval(hist: DataFrame, cl: Double = 0.6827): DataFrame = {
    val z = lit(normalQuantile((1 + cl) / 2))
    def wh(nu: Column, up: Boolean): Column = {
      val sign = if (up) z else -z
      val h = lit(2.0) / (lit(9.0) * nu)
      nu / 2 * pow(lit(1.0) - h + sign * sqrt(h), 3)
    }
    hist
      .withColumn("pois_lo",
        when(col("n") === 0, 0.0).otherwise(wh(lit(2.0) * col("n"), up = false)))
      .withColumn("pois_hi", wh(lit(2.0) * col("n") + 2, up = true))
  }

  /** Φ⁻¹ via Acklam's rational approximation (|ε| < 1.15e-9) — enough for
    * interval z-values; avoids any stats dependency. */
  private[hist] def normalQuantile(p: Double): Double = {
    require(p > 0 && p < 1)
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val d = Seq(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else -normalQuantile(1 - p)
  }
}
