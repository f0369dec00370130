package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.core.{Route, SchemaOps}

/** Systematic-shift machinery (SURVEY §4 "systematic shifts as plan
  * rewrites"; reference: columnflow/tasks/framework/base.py:1581-1718
  * ShiftTask, alias application columnflow/tasks/selection.py:212-217,
  * declaration columnflow/config_util.py:285-315 add_shift_aliases).
  *
  * A shift is a named set of column aliases: before a stage runs under
  * shift S, every alias source route is copied over its nominal target
  * (e.g. `Jet.pt_jec_up` → `Jet.pt`). Downstream operators are shift-
  * oblivious — they always read nominal names. This is a pure plan
  * rewrite: zero runtime cost beyond the extra columns the calibrator
  * produced, and Catalyst prunes unused shifted columns from the scan for
  * every shift that doesn't read them.
  */
final case class Shift(name: String, aliases: Map[Route, Route]) {

  /** Rewrite a frame for this shift: copy alias sources onto nominal
    * targets. Missing sources error (a shifted stage must not silently
    * run nominal). */
  def apply(df: DataFrame): DataFrame =
    aliases.foldLeft(df) { case (acc, (src, dst)) =>
      SchemaOps.withAlias(acc, src, dst)
    }
}

object Shift {
  val Nominal: Shift = Shift("nominal", Map.empty)

  /** An up/down pair from a source pattern, the reference's
    * `add_shift_aliases` shorthand: `pair("jec", "Jet.pt")` yields shifts
    * `jec_up`/`jec_down` aliasing `Jet.pt_jec_up`/`Jet.pt_jec_down` onto
    * `Jet.pt`. */
  def pair(source: String, targets: String*): Seq[Shift] =
    Seq("up", "down").map { dir =>
      Shift(s"${source}_$dir",
        targets.map { t =>
          val r = Route(t)
          val shifted = Route((r.parent.map(_.toString).toSeq :+
            s"${r.fields.last}_${source}_$dir").mkString("."))
          shifted -> r
        }.toMap)
    }
}
