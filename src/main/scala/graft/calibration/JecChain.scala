package graft.calibration

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.lookup.Payload

/** Chained multi-level energy-correction calibrator (reference `jec`:
  * columnflow/calibration/cms/jets.py:337-830).
  *
  * Semantics mirrored from the reference's `correct_jets` loop
  * (jets.py:456-488):
  *  - the raw momentum is recovered by undoing the stored raw factor,
  *    `pt_raw = pt * (1 - rawFactor)` (jets.py:439-449);
  *  - each correction level is a loaded [[Payload.Correction]] evaluated
  *    with the CURRENT momentum — level N+1 sees `pt_raw * c1 * … * cN`
  *    (`variable_map["JetPt"] = variable_map["JetPt"] * correction`);
  *  - the full correction is the product of the levels, the corrected
  *    momentum `pt = pt_raw * full`;
  *  - the re-derived raw factor is `1 - pt_raw / pt` (jets.py:531);
  *  - each uncertainty source is evaluated at the RAW momentum
  *    (jets.py:572-575 `variable_map = {"JetEta": eta, "JetPt": pt_raw}`)
  *    and yields the shifted family `pt · (1 ± u)` (jets.py:589-601).
  *
  * Everything compiles to sibling column expressions over one scan — N
  * levels and S sources cost N+2S columns, never extra passes.
  *
  * `roundDigits` defaults to 0 = NO factor rounding. Rounding a factor
  * is the risky option: Spark rounds the shortest decimal repr while
  * DuckDB rounds binary x·10^d, and lerp outputs with terminating
  * decimal expansions land EXACTLY on half-grid values (a slope like
  * 75e-5 on a scale-5 input puts ~half the segment's outputs at …5 at
  * the scale boundary), where the two conventions split ~50/50 —
  * measured 520/15k divergent events before q76 dropped the rounding.
  * Unrounded factors are NOT bit-identical across engines either — the
  * SQL mirror's knot-list literals are DECIMAL, so DuckDB's lerp
  * numerators are exact where Spark subtracts doubles, a few-ulp
  * divergence — but ulp noise is harmless downstream when (a) outputs
  * multiply a transcendental term before any rounding (q76's px·cosφ:
  * flip window ~1e-14/1e-6 per row), or (b) the final rounding scale is
  * at or above the payload's true decimal scale (on-grid recovery,
  * q66). Set `roundDigits > 0` only at factor scale with dense
  * sub-scale digits, as q69's 1e5-momentum chain does.
  */
final case class JecChain(
    levels: Seq[Payload.Correction],
    uncSources: Seq[(String, Payload.Correction)] = Nil,
    ptInput: String = "JetPt",
    roundDigits: Int = 0) {
  require(levels.nonEmpty, "need at least one correction level")

  /** Corrected columns for one object. `shifts` carries
    * `<source>_up`/`<source>_down` momenta in declaration order. */
  final case class Result(ptRaw: Column, pt: Column, fullCorrection: Column,
                          rawFactor: Column, shifts: Seq[(String, Column)])

  /** Undo a stored raw factor: `pt * (1 - rawFactor)`. */
  def undoRaw(pt: Column, rawFactor: Column): Column = pt * (lit(1.0) - rawFactor)

  def apply(ptRaw: Column, extra: (String, Column)*): Result = {
    val (pt, full) = levels.foldLeft((ptRaw, lit(1.0))) { case ((p, f), corr) =>
      val raw = corr(extra :+ (ptInput -> p): _*)
      val c = if (roundDigits > 0) round(raw, roundDigits) else raw
      (p * c, f * c)
    }
    val shifts = uncSources.flatMap { case (name, corr) =>
      val u = corr(extra :+ (ptInput -> ptRaw): _*)
      Seq(s"${name}_up" -> pt * (lit(1.0) + u), s"${name}_down" -> pt * (lit(1.0) - u))
    }
    Result(ptRaw, pt, full, lit(1.0) - ptRaw / pt, shifts)
  }

  /** DuckDB mirror with the same chaining and rounding shape — for oracle
    * queries over loaded payloads. */
  final case class SqlResult(ptRaw: String, pt: String, shifts: Seq[(String, String)])

  def sql(ptRawSql: String, extra: (String, String)*): SqlResult = {
    val pt = levels.foldLeft(s"($ptRawSql)") { (p, corr) =>
      val raw = corr.sql(extra :+ (ptInput -> p): _*)
      // Spark-round mirror (graft.queries.Compat.roundSql): a plain
      // DuckDB ROUND rounds the binary value while Spark rounds the
      // shortest decimal repr half-up — on-grid momenta make the interp
      // factor a TRUE tie at roundDigits (sf1: 1.0018215 → .822 vs .821)
      val c = if (roundDigits > 0) graft.queries.Compat.roundSql(raw, roundDigits)
              else s"($raw)"
      s"($p * $c)"
    }
    val shifts = uncSources.flatMap { case (name, corr) =>
      val u = corr.sql(extra :+ (ptInput -> s"($ptRawSql)"): _*)
      Seq(s"${name}_up" -> s"($pt * (1.0 + $u))", s"${name}_down" -> s"($pt * (1.0 - $u))")
    }
    SqlResult(s"($ptRawSql)", pt, shifts)
  }
}
