package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Seeds

/** Distributed model training for the MLModel lifecycle (SURVEY §2.11 ML;
  * reference MLTraining: columnflow/tasks/ml.py:456 — fold-wise training
  * where model f fits on every fold EXCEPT f, and MLEvaluation:568 scores
  * each event with the model that never saw it).
  *
  * The engine-side training primitive is linear least squares via the
  * normal equations: ONE aggregation accumulates XᵀX and Xᵀy (map-side
  * combined — at 100 TB the shuffle carries (d+1)² scalars, nothing
  * else), the (d+1)×(d+1) solve runs on the driver, and the weights
  * re-enter plans as literals — the same stats→solve→broadcast-LUT shape
  * as the stitching normalization (stats/Stitching). Models needing
  * iterative fitting plug in through the same `perFold` orchestration
  * with a caller-supplied `fit`.
  */
object Trainer {

  /** Driver-side dense linear solve, Gaussian elimination with partial
    * pivoting. Deterministic; sized for normal-equation systems (d ≲ 100). */
  def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    require(a0.length == n && a0.forall(_.length == n), "square system required")
    val a = a0.map(_.clone); val b = b0.clone
    var col = 0
    while (col < n) {
      var p = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      require(a(p)(col) != 0.0, s"singular system at column $col")
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
        val tb = b(p); b(p) = b(col); b(col) = tb }
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        var c = col
        while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Distributed least squares / ridge fit of `label ~ 1 + features`.
    * Returns weights `[w0 (intercept), w1, …, wd]`. One aggregation for
    * the normal-equation moments, one driver-side solve. */
  def fitLinear(df: DataFrame, features: Seq[Column], label: Column,
                l2: Double = 0.0,
                momentCast: Column => Column = identity): Array[Double] = {
    val (a, b) = normalEquations(df, features, label, l2, momentCast)
    solve(a, b)
  }

  /** The distributed half of [[fitLinear]]: ONE aggregation accumulating
    * XᵀX and Xᵀy, returned as the dense system `(A, b)` — exposed so a
    * caller can derive closed-form solutions or diagnostics from the same
    * scan that feeds the solver (q78 does both).
    *
    * `momentCast` wraps every accumulated product before summation —
    * pass a decimal cast at the data's exact scale to make the moments
    * order-independent (cross-engine reproducible, per the README
    * determinism rules); the identity default keeps plain double sums.
    * `l2` adds ridge regularization to the non-intercept diagonal. */
  def normalEquations(df: DataFrame, features: Seq[Column], label: Column,
                      l2: Double = 0.0,
                      momentCast: Column => Column = identity): (Array[Array[Double]], Array[Double]) = {
    val xs = lit(1.0) +: features.toIndexedSeq
    val d = xs.size
    // upper triangle of X^T X, then X^T y — one aggregation for all
    val moments =
      (for { i <- 0 until d; j <- i until d } yield
        sum(momentCast(xs(i) * xs(j))).cast("double").as(s"a_${i}_$j")) ++
        (0 until d).map(i => sum(momentCast(xs(i) * label)).cast("double").as(s"b_$i"))
    val row = df.agg(moments.head, moments.tail: _*).head()
    // sum() over zero rows — or an all-NULL feature/label column — yields
    // NULL moments: fail with a diagnostic, not an NPE mid-unpacking
    require((0 until row.size).forall(!row.isNullAt(_)),
      "normal-equation moments are NULL: empty training set or all-NULL feature/label column")
    val a = Array.ofDim[Double](d, d)
    var idx = 0
    for { i <- 0 until d; j <- i until d } {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    for (i <- 1 until d) a(i)(i) += l2
    (a, Array.tabulate(d)(i => row.getDouble(idx + i)))
  }

  /** Reference fold semantics: model f trains on every fold EXCEPT f
    * (columnflow/tasks/ml.py:221 `seed % folds`; training :456). The fold
    * assignment is the engine-portable hash fold (`Seeds.fold`), stable
    * under repartitioning. */
  def perFold[T](df: DataFrame, k: Int, seedCols: Seq[Column])(fit: DataFrame => T): IndexedSeq[T] = {
    val fold = Seeds.fold(k, seedCols: _*)
    (0 until k).map(f => fit(df.filter(fold =!= f)))
  }

  /** Cross-evaluation predictions for per-fold linear models: each row is
    * scored by the model that did NOT train on its fold — a literal
    * fold-dispatched expression, no join, no shuffle. */
  def crossPredictLinear(k: Int, seedCols: Seq[Column], features: Seq[Column],
                         weights: IndexedSeq[Array[Double]]): Column = {
    require(weights.size == k, s"need $k weight vectors")
    val fold = Seeds.fold(k, seedCols: _*)
    def predict(w: Array[Double]): Column =
      features.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (x, i)) => acc + lit(w(i + 1)) * x }
    (0 until k).foldLeft(lit(null).cast("double")) { (acc, f) =>
      when(fold === f, predict(weights(f))).otherwise(acc)
    }
  }
}
