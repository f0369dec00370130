package graft.ml

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed top-principal-component extraction: one corpus pass builds
  * the exact d×d Gram matrix ([[Features.gramUpper]]), the O(d³)-but-tiny
  * eigen step runs as driver-side power iteration, and the learned
  * component rides back into the plan as literals so projection is pure
  * map-side column work — the PQ/IVF pattern ([[graft.operators.Quantize]])
  * applied to dimensionality reduction. The reference's ML column ops
  * (columnflow/ml/__init__.py:327-420) delegate feature construction to
  * external frameworks; this is the in-engine equivalent for the one
  * decomposition a data pipeline actually runs at corpus scale.
  *
  * Scale shape (100 TB of embeddings): the ONLY corpus-sized work is the
  * Gram pass — d²·partitions cells exchanged after map-side partial
  * aggregation, independent of row count. k power iterations touch d²
  * driver-local scalars (no cluster work at all), and projection is one
  * scan with zero exchanges (the component is a plan literal inside
  * whole-stage codegen).
  *
  * Determinism, cross-engine: every step stays on a decimal lattice.
  * Gram cells are exact DECIMAL(18,9) sums of 1e-9-rounded products
  * (order-free); the matvec Σ G·v is exact decimal arithmetic; the
  * per-iteration normalization divides by the max-|component| (not the
  * L2 norm — no sqrt-of-sum whose addition order could differ) as one
  * correctly-rounded double divide, then re-rounds to the 1e-9 grid with
  * Spark's round semantics (shortest-repr HALF_UP, mirrored by
  * `Compat.roundSql`). A DuckDB oracle can therefore unroll the identical
  * iterations and hash-match the projections bit-for-bit (q177).
  */
object Pca {

  /** Exact scale-9 decimal → the identical double both engines produce:
    * decimal→varchar emits the exact digits, strtod is correctly rounded
    * (the `Compat.exactDoubleSql` route, driver-side). */
  private def toDouble(b: JBig): Double = java.lang.Double.parseDouble(b.toPlainString)

  /** Spark `round(x, 9)` semantics on the driver: round the double's
    * SHORTEST decimal representation half-up (`BigDecimal.valueOf` is
    * `valueOf(Double.toString(x))`) — NOT the exact binary value, which
    * splits from this on true decimal ties (see `Compat.roundSql`). */
  private def round9(x: Double): JBig =
    JBig.valueOf(x).setScale(9, RoundingMode.HALF_UP)

  /** Power-iterate the exact Gram matrix of `vec` (float-array column,
    * length `dim`) for `iterations` rounds from the all-ones vector,
    * normalizing by max-|component| each round. Returns the component as
    * exact scale-9 decimals (|v_i| ≤ 1, max component = ±1).
    *
    * Deterministic: a pure function of (data, dim, iterations) — the
    * all-ones start, the smallest-index-free max (decimal max is total),
    * and lattice arithmetic leave no engine or partitioning freedom.
    * Convergence needs the start vector non-orthogonal to the top
    * eigenvector — generic for real data; `iterations` ~ 8–12 suffices
    * for well-separated spectra. */
  def trainTopComponent(df: DataFrame, vec: Column, dim: Int,
                        iterations: Int): IndexedSeq[JBig] = {
    require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
    require(iterations >= 1 && iterations <= 50, s"iterations out of range: $iterations")
    val cells = Features.gramUpper(df, vec).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2))
      .toMap
    def g(i: Int, j: Int): JBig = {
      val k = if (i <= j) (i, j) else (j, i)
      cells.getOrElse(k, JBig.ZERO)
    }
    var v: IndexedSeq[JBig] =
      IndexedSeq.fill(dim)(JBig.ONE.setScale(9))
    for (_ <- 1 to iterations) {
      val w = (0 until dim).map { i =>
        (0 until dim).map(j => g(i, j).multiply(v(j))).reduce(_.add(_))
      }
      val m = w.map(_.abs).max
      require(m.signum > 0, "power iteration collapsed to the zero vector")
      val md = toDouble(m)
      v = w.map(wi => round9(toDouble(wi) / md))
    }
    v
  }

  /** Projection of a float-vector column onto a trained component as
    * map-side column work: each product quantizes to the 1e-9 integer
    * grid (`round(x_j·v_j·1e9)` — the true grid value is an exact
    * integer and the double error is ulp-sized, so the round recovers
    * it exactly) and the per-row sum runs in LONGs — order-free and
    * decimal-promotion-free (a 64-term DECIMAL(·,9) addition chain
    * overflows precision 38 and Spark clamps the scale to 6, silently
    * truncating scores; the q58/q86/q87 grid idiom avoids the decimal
    * type system entirely). Oracle mirror: `Compat.roundToLongSql` +
    * BIGINT SUM / 1e9. The component enters as plan literals — no join,
    * no shuffle, stays inside whole-stage codegen. */
  def project(vec: Column, comp: IndexedSeq[JBig]): Column =
    comp.zipWithIndex.map { case (vj, j) =>
      round(element_at(vec, j + 1).cast("double") * lit(toDouble(vj)) * lit(1e9), 0)
        .cast("long")
    }.reduce(_ + _).cast("double") / lit(1e9)
}
