package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Missing-value sentinels, kept numerically identical to the reference for
  * drop-in parity (reference: columnflow/columnar_util.py:48-51). The
  * engine itself uses SQL nulls internally; sentinels appear only where an
  * operator contract demands them (e.g. histogram fill of absent slice
  * routes — columnflow/tasks/histograms.py:309-312). */
object Sentinels {
  val EmptyInt: Int = -99999
  val EmptyFloat: Float = -99999.0f
  val EmptyDouble: Double = -99999.0

  /** null → sentinel (the reference's `null_value` application). */
  def fill(c: Column, nullValue: Column): Column = coalesce(c, nullValue)

  /** sentinel → null (inverse, for re-entering null-aware ops). */
  def unfill(c: Column, sentinel: Column): Column =
    when(c === sentinel, lit(null)).otherwise(c)
}
