package graft.calibration

import org.apache.spark.sql.Column
import graft.lookup.Payload

/** Bosonic recoil correction (reference recoil_corrected_met:
  * columnflow/production/cms/dy.py:299-504).
  *
  * Geometry, mirrored step-for-step from the reference:
  *  1. U = MET + vis − full in the transverse plane (dy.py:360-362);
  *  2. project U along/perpendicular to the full boson direction via the
  *     unit components fx/|f|, fy/|f| (dy.py:365-370);
  *  3. correct U∥/U⊥ with the payload's rescaling correction — a QUANTILE
  *     MAP, source CDF composed with target inverse-CDF (the
  *     Recoil_correction_Rescaling payload's content);
  *  4. reassemble U and recompute MET = U_corr − vis + full
  *     (dy.py:400-406).
  *
  * Every step is plain IEEE arithmetic (multiply/add/divide/sqrt — no
  * libm), so the per-event values are bit-identical across engines when
  * the SQL mirror stages the same expressions; only final outputs need
  * the usual factor-scale rounding.
  */
object Recoil {

  /** A transverse vector as its x/y components. */
  final case class Vec(x: Column, y: Column)

  /** Recoil decomposition: (U∥, U⊥, fx/|f|, fy/|f|). */
  final case class Projection(upara: Column, uperp: Column, unitX: Column, unitY: Column)

  def project(met: Vec, vis: Vec, full: Vec): Projection = {
    val ux = met.x + vis.x - full.x
    val uy = met.y + vis.y - full.y
    val fpt = org.apache.spark.sql.functions.sqrt(full.x * full.x + full.y * full.y)
    val unitX = full.x / fpt
    val unitY = full.y / fpt
    Projection(ux * unitX + uy * unitY, -ux * unitY + uy * unitX, unitX, unitY)
  }

  /** Corrected MET from corrected recoil components:
    * MET_corr = U_corr − vis + full (components). */
  def reassemble(uparaCorr: Column, uperpCorr: Column, p: Projection,
                 vis: Vec, full: Vec): Vec = Vec(
    (uparaCorr * p.unitX - uperpCorr * p.unitY) - vis.x + full.x,
    (uparaCorr * p.unitY + uperpCorr * p.unitX) - vis.y + full.y)
}

/** Quantile mapping: push `x` through the source distribution's CDF, then
  * through the target distribution's inverse CDF — the content of the
  * recoil rescaling payload (columnflow/production/cms/dy.py:385-399 via
  * correctionlib). Both legs are loaded payload corrections (typically
  * `linear` knot nodes); the composition is exact double arithmetic, no
  * rounding between the legs. */
final case class QuantileMap(sourceCdf: Payload.Correction,
                             targetInvCdf: Payload.Correction,
                             input: String = "x") {
  def apply(x: Column): Column =
    targetInvCdf(input -> sourceCdf(input -> x))
  def sql(e: String): String =
    targetInvCdf.sql(input -> sourceCdf.sql(input -> e))
}
