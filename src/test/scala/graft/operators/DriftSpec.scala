package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi is zero for identical distributions, positive under shift") {
    val base = (1 to 400).map(i => i % 4).toDF("x")
    val same = (1 to 400).map(i => i % 4).toDF("x")
    val row = Drift.psi(base, same, col("x")).head()
    assert(row.getDouble(0) === 0.0)
    assert(row.getLong(3) === 4L) // shared_bins
    // skew the candidate toward one bin
    val skewed = ((1 to 300).map(_ => 0) ++ (1 to 100).map(i => 1 + i % 3)).toDF("x")
    val p = Drift.psi(base, skewed, col("x")).head().getDouble(0)
    assert(p > 0.1, s"psi=$p")
  }

  test("psi reports one-sided bins as exact row counts, not in the sum") {
    val base = Seq(0, 0, 1, 1, 9, 9, 9).toDF("x") // bin 9 absent in cand
    val cand = Seq(0, 0, 1, 1, 7).toDF("x") // bin 7 absent in base
    val row = Drift.psi(base, cand, col("x")).head()
    assert(row.getLong(1) === 3L) // base_only_rows (the three 9s)
    assert(row.getLong(2) === 1L) // cand_only_rows (the 7)
    assert(row.getLong(3) === 2L) // shared: bins 0 and 1
  }

  test("ks matches the hand-computed statistic and is exact") {
    // base: {1,2,3,4}; cand: {3,4,5,6} → max ECDF gap = 1/2 at v=2..2
    val base = Seq(1, 2, 3, 4).toDF("x")
    val cand = Seq(3, 4, 5, 6).toDF("x")
    val row = Drift.ks(base, cand, col("x")).head()
    assert(row.getLong(0) === 4L && row.getLong(1) === 4L)
    assert(row.getLong(2) === 8L) // max |k1*n2 - k2*n1| = |2*4 - 0*4|
    assert(row.getDouble(3) === 0.5)
  }

  test("ks ignores nulls: identical distributions with shared nulls give 0") {
    val a = (Seq.fill(5)(Option.empty[Int]) ++ (1 to 5).map(Some(_))).toDF("x")
    val r = Drift.ks(a, a, col("x")).head()
    assert(r.getLong(0) === 5L) // nulls excluded from n
    assert(r.getDouble(3) === 0.0) // not the spurious 0.5 ECDF step
  }

  test("psi ignores null bins (no base_only/cand_only double-report)") {
    val a = (Seq.fill(3)(Option.empty[Int]) ++ Seq(Some(1), Some(2))).toDF("x")
    val row = Drift.psi(a, a, col("x")).head()
    assert(row.getLong(1) === 0L && row.getLong(2) === 0L)
    assert(row.getDouble(0) === 0.0)
  }

  test("chiSquare: zero for perfect independence, includes unobserved cells") {
    // independent 2x2: counts proportional to row*col totals → chi2 = 0
    val indep = (Seq.fill(40)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(8)(("y", "p")) ++ Seq.fill(2)(("y", "q"))).toDF("a", "b")
    val r0 = Drift.chiSquare(indep, col("a"), col("b")).head()
    assert(r0.getDouble(0) === 0.0 && r0.getLong(1) === 1L)
    // a missing (y, q) cell: O=0 but E=rowT*colT/n must still contribute
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))).toDF("a", "b")
    val r1 = Drift.chiSquare(dep, col("a"), col("b")).head()
    // 2x2 with perfect association: chi2 = n = 20
    assert(r1.getDouble(0) === 20.0, s"chi2=${r1.getDouble(0)}")
  }

  test("chiSquare fail-fasts on a high-cardinality grid instead of materializing it") {
    val wide = (1 to 100).map(i => (s"a$i", s"b$i")).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      Drift.chiSquare(wide, col("a"), col("b"), maxCells = 1000L))
    assert(e.getMessage.contains("100 x 100"))
    assert(e.getMessage.contains("bucket/quantize"))
  }

  test("chiSquare on empty input yields one null row, not a crash") {
    val empty = Seq(("x", "p")).toDF("a", "b").filter(col("a") === "zz")
    val r = Drift.chiSquare(empty, col("a"), col("b")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("ks against an empty side is null, not NaN") {
    val a = Seq(1, 2, 3).toDF("x")
    val empty = a.filter(col("x") > 100)
    val r = Drift.ks(a, empty, col("x")).head()
    assert(r.isNullAt(3))
  }

  test("ks is zero for identical samples and repartition-stable") {
    val a = (1 to 500).map(i => i % 37).toDF("x")
    assert(Drift.ks(a, a, col("x")).head().getDouble(3) === 0.0)
    val b = (1 to 500).map(i => (i * 7) % 41).toDF("x")
    val s1 = Drift.ks(a, b, col("x")).head()
    val s2 = Drift.ks(a.repartition(5), b.repartition(3), col("x")).head()
    assert(s1 === s2)
  }
}
