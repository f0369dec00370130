package graft.kinematics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lorentz-vector kinematics as pure Column expressions over
  * (pt, eta, phi, mass) structs — the Spark restatement of the reference's
  * coffea vector behaviors (reference: columnflow/columnar_util.py:1284-1389
  * attach_behavior; columnflow/production/util.py:86-123 lv_sum).
  *
  * Everything here is codegen-friendly builtin-function composition: no
  * UDFs, so these stay inside whole-stage codegen at 100 TB.
  */
object Kinematics {

  def px(pt: Column, phi: Column): Column = pt * cos(phi)
  def py(pt: Column, phi: Column): Column = pt * sin(phi)
  def pz(pt: Column, eta: Column): Column = pt * sinh(eta)
  def energy(pt: Column, eta: Column, mass: Column): Column =
    sqrt(pow(pt * cosh(eta), 2) + pow(mass, 2))

  /** Δφ wrapped to (-π, π]. */
  def deltaPhi(phi1: Column, phi2: Column): Column = {
    val twoPi = lit(2 * math.Pi)
    val d = phi1 - phi2
    d - twoPi * round(d / twoPi, 0)
  }

  /** ΔR = sqrt(Δη² + Δφ²) — the geometric match metric
    * (reference: columnflow/production/util.py:124-167 delta_r_match). */
  def deltaR(eta1: Column, phi1: Column, eta2: Column, phi2: Column): Column =
    sqrt(pow(eta1 - eta2, 2) + pow(deltaPhi(phi1, phi2), 2))

  /** Invariant mass of two (pt, eta, phi, mass) 4-vectors. */
  def invariantMass(pt1: Column, eta1: Column, phi1: Column, m1: Column,
                    pt2: Column, eta2: Column, phi2: Column, m2: Column): Column = {
    val e = energy(pt1, eta1, m1) + energy(pt2, eta2, m2)
    val sx = px(pt1, phi1) + px(pt2, phi2)
    val sy = py(pt1, phi1) + py(pt2, phi2)
    val sz = pz(pt1, eta1) + pz(pt2, eta2)
    sqrt(greatest(pow(e, 2) - pow(sx, 2) - pow(sy, 2) - pow(sz, 2), lit(0.0)))
  }

  /** Transverse vector sum of a collection's (pt, phi) — returns a
    * (pt, phi) struct (reference `sum_transverse`:
    * columnflow/calibration/util.py:42-57). `coll` is array<struct> with
    * `pt`/`phi` fields. */
  def sumTransverse(coll: Column): Column = {
    val sumPx = aggregate(coll, lit(0.0), (acc, j) => acc + px(j.getField("pt"), j.getField("phi")))
    val sumPy = aggregate(coll, lit(0.0), (acc, j) => acc + py(j.getField("pt"), j.getField("phi")))
    struct(
      sqrt(pow(sumPx, 2) + pow(sumPy, 2)).as("pt"),
      atan2(sumPy, sumPx).as("phi"))
  }

  /** Type-I MET propagation: subtract the vector difference between
    * corrected and raw jet momenta from MET
    * (reference `propagate_met`: columnflow/calibration/util.py:60-135). */
  def propagateMet(metPt: Column, metPhi: Column,
                   jetPtDiffX: Column, jetPtDiffY: Column): Column = {
    val mx = px(metPt, metPhi) - jetPtDiffX
    val my = py(metPt, metPhi) - jetPtDiffY
    struct(
      sqrt(pow(mx, 2) + pow(my, 2)).as("pt"),
      atan2(my, mx).as("phi"))
  }

  /** Scalar sum of a numeric array (e.g. HT = Σ jet pt). */
  def scalarSum(xs: Column): Column =
    aggregate(xs, lit(0.0), (acc, x) => acc + x)
}
