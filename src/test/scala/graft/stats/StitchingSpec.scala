package graft.stats

import org.scalatest.funsuite.AnyFunSuite

class StitchingSpec extends AnyFunSuite {
  import Stitching._

  private val sums = Map(
    "a" -> BigDecimal("10.00"), "b" -> BigDecimal("30.00"),
    "c" -> BigDecimal("60.00"))

  test("branching ratios sum to 1 and respect nesting") {
    val flat = Proc("ALL", Seq(Proc("a"), Proc("b"), Proc("c")))
    val br = branchingRatios(flat, sums)
    assert(math.abs(br.values.sum - 1.0) < 1e-15)
    assert(br("a") == 0.1 && br("b") == 0.3 && br("c") == 0.6)

    // nested: the intermediate node's share is the sum of its leaves
    val nested = Proc("ALL", Seq(Proc("a"), Proc("bc", Seq(Proc("b"), Proc("c")))))
    val br2 = branchingRatios(nested, sums)
    assert(br2 == br) // leaves' ratios are invariant to grouping
    assert(sumw(nested.children(1), sums) == BigDecimal("90.00"))
  }

  test("combined sums add contributions from every covering dataset") {
    val eff = combinedSumw(Seq(sums, Map("a" -> BigDecimal("5.00"))))
    assert(eff("a") == BigDecimal("15.00"))
    assert(eff("b") == BigDecimal("30.00"))
  }

  test("stitched norm divides br by the effective sum") {
    val root = Proc("ALL", Seq(Proc("a"), Proc("b"), Proc("c")))
    val w = stitchedNorm(root, xsec = 100.0, inclusive = sums,
      datasets = Seq(sums, Map("a" -> BigDecimal("10.00"))))
    assert(math.abs(w("a") - 100.0 * 0.1 / 20.0) < 1e-15)
    assert(math.abs(w("b") - 100.0 * 0.3 / 30.0) < 1e-15)
  }

  test("missing leaf contributes zero") {
    val root = Proc("ALL", Seq(Proc("a"), Proc("zzz")))
    val br = branchingRatios(root, sums)
    assert(br("zzz") == 0.0)
  }
}
