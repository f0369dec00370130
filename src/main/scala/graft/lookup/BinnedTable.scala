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
      val list = values.mkString("[", ", ", "]")
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
      val flat = grid.flatten.mkString("[", ", ", "]")
      val i = s"LEAST(GREATEST(${ax1.binIdSql(e1)}, 0), ${ax1.nBins - 1})"
      val j = s"LEAST(GREATEST(${ax2.binIdSql(e2)}, 0), ${ax2.nBins - 1})"
      s"($flat)[($i) * ${ax2.nBins} + ($j) + 1]"
    }
  }

  private def clampBin(id: Column, n: Int): Column =
    least(greatest(id, lit(0)), lit(n - 1))
}
