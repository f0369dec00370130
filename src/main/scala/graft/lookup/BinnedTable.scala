package graft.lookup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.hist.Axis

/** Broadcast binned-table lookups — the correction-payload pattern behind
  * every calibrator and scale-factor producer in the reference (SURVEY
  * §2.3 "broadcast lookup joins"; reference evaluator chain:
  * columnflow/calibration/cms/jets.py:40-142 `get_evaluators`/`ak_evaluate`).
  *
  * The payload is compiled into the plan as literal arrays and the lookup
  * is an `element_at(values, binId(x))` expression: no join, no shuffle,
  * no broadcast variable lifecycle — the table ships inside the serialized
  * plan/codegen, which is the cheapest possible distribution for the
  * payload sizes corrections have (10²–10⁵ cells). For genuinely large
  * payloads, fall back to a `broadcast()` dimension join instead.
  */
object BinnedTable {

  /** Render a payload value as a DuckDB DOUBLE literal. A bare decimal
    * literal (`1.2`) parses as DECIMAL in DuckDB, so oracle arithmetic on
    * it runs EXACT where Spark's runs IEEE double — e.g. `(sf - 1)` is
    * exactly 0.2 in DuckDB but 0.19999999999999996 in Spark. The one-ulp
    * product divergence is invisible until a downstream round lands on a
    * true decimal tie, where the engines split (sf1 rehearsal, q70: fac
    * 1.0009125 rounded .913 vs .914). Pinning every VALUE literal to
    * DOUBLE makes both engines run the identical IEEE arithmetic, so
    * ties flip together. (Comparison/axis literals are safe without the
    * cast — mixed DOUBLE/DECIMAL expressions promote to DOUBLE before
    * any arithmetic — but value lists feed decimal-side arithmetic.)
    *
    * The literal is QUOTED: `CAST(v AS DOUBLE)` parses `v` as DECIMAL
    * first, and the decimal→double step double-rounds once the unscaled
    * value needs > 53 bits (a 17-significant-digit shortest repr, common
    * in fit-produced payloads), leaving a 1-ulp oracle/Spark gap of
    * exactly the tie-flip class this helper exists to kill. A
    * varchar→double cast is a correctly-rounded strtod at ANY magnitude
    * and renders E-notation / Infinity / NaN (invalid as bare SQL
    * tokens) uniformly. */
  def dLit(v: Double): String = s"CAST('$v' AS DOUBLE)"
  def dList(vs: Seq[Double]): String = vs.map(dLit).mkString("[", ", ", "]")

  /** 1-D lookup: `values(i)` for the bin of `x` on `axis`; under/overflow
    * clamp to the edge bins (correctionlib "clamp" semantics). */
  final case class Lookup1D(axis: Axis, values: IndexedSeq[Double]) {
    require(values.size == axis.nBins, s"need ${axis.nBins} values")

    def apply(x: Column): Column = {
      val id = clampBin(axis.binId(x), axis.nBins)
      element_at(array(values.map(lit): _*), id + 1)
    }

    /** DuckDB mirror: list literal + same clamped index. */
    def sql(e: String): String = {
      val list = dList(values)
      val id = s"LEAST(GREATEST(${axis.binIdSql(e)}, 0), ${axis.nBins - 1})"
      s"($list)[$id + 1]"
    }
  }

  /** 2-D lookup over a row-major value grid. */
  final case class Lookup2D(ax1: Axis, ax2: Axis, grid: IndexedSeq[IndexedSeq[Double]]) {
    require(grid.size == ax1.nBins && grid.forall(_.size == ax2.nBins))

    def apply(x1: Column, x2: Column): Column = {
      val i = clampBin(ax1.binId(x1), ax1.nBins)
      val j = clampBin(ax2.binId(x2), ax2.nBins)
      val flat = array(grid.flatten.map(lit): _*)
      element_at(flat, i * ax2.nBins + j + 1)
    }

    def sql(e1: String, e2: String): String = {
      val flat = dList(grid.flatten)
      val i = s"LEAST(GREATEST(${ax1.binIdSql(e1)}, 0), ${ax1.nBins - 1})"
      val j = s"LEAST(GREATEST(${ax2.binIdSql(e2)}, 0), ${ax2.nBins - 1})"
      s"($flat)[($i) * ${ax2.nBins} + ($j) + 1]"
    }
  }

  /** Piecewise-linear interpolation over ascending knots with edge
    * clamping — correctionlib's "linear" node semantics, used by the
    * smooth correction payloads (JER profiles, pileup weights; SURVEY
    * §2.9 lookup/interp). Knots are plan literals like the binned tables;
    * the segment search is an O(knots) fold, knot counts are tiny. */
  final case class Interp1D(xs: IndexedSeq[Double], ys: IndexedSeq[Double]) {
    require(xs.size == ys.size && xs.size >= 2, "need matching knot arrays")
    require(xs.sliding(2).forall(p => p(0) < p(1)), "knots must be ascending")
    private val n = xs.size

    def apply(x: Column): Column = {
      val xArr = array(xs.map(lit): _*)
      val yArr = array(ys.map(lit): _*)
      // 1-based left-knot index of the segment containing x
      val k = aggregate(xArr, lit(0), (acc, e) => acc + when(x >= e, 1).otherwise(0))
      val s = least(greatest(k, lit(1)), lit(n - 1))
      val x0 = element_at(xArr, s); val x1 = element_at(xArr, s + 1)
      val y0 = element_at(yArr, s); val y1 = element_at(yArr, s + 1)
      when(x <= xs.head, ys.head)
        .when(x >= xs.last, ys.last)
        .otherwise(y0 + (x - x0) * (y1 - y0) / (x1 - x0))
    }

    /** DuckDB mirror with the same arithmetic shape. Knot lists render as
      * DOUBLE literals ([[BinnedTable.dLit]]) so the lerp numerators
      * subtract the identical IEEE doubles Spark subtracts — bare decimal
      * literals would make DuckDB's y1−y0 exact and leave a few-ulp
      * divergence for downstream rounds to trip over on true ties. */
    def sql(e: String): String = {
      val kTerms = xs.map(x0 => s"(CASE WHEN $e >= $x0 THEN 1 ELSE 0 END)").mkString(" + ")
      val xsL = dList(xs)
      val ysL = dList(ys)
      val s = s"LEAST(GREATEST($kTerms, 1), ${n - 1})"
      s"""CASE WHEN $e <= ${xs.head} THEN ${dLit(ys.head)}
          WHEN $e >= ${xs.last} THEN ${dLit(ys.last)}
          ELSE ($ysL)[$s] + ($e - ($xsL)[$s]) * (($ysL)[$s + 1] - ($ysL)[$s]) / (($xsL)[$s + 1] - ($xsL)[$s])
          END"""
    }
  }

  private def clampBin(id: Column, n: Int): Column =
    least(greatest(id, lit(0)), lit(n - 1))
}
