package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Guards the invariant q42's unscaled-long aggregation rests on (ADVICE
  * r9): the per-order sum of |DECIMAL(18,6) shift value| × 1e6 must stay
  * far inside the 2^53 exact-double envelope — Spark's non-ANSI long SUM
  * wraps silently on overflow, so the bound has to fail loudly HERE, not
  * silently in a result. The worst-magnitude shift is tax_up. */
class Q42BoundSpec extends SparkSpec {

  test("per-order unscaled tax_up sums stay >=1024x inside 2^53; group sizes stay per-order bounded") {
    val dir = "/root/testdata/sf0.01"
    val li = Tables.load(spark, dir, "lineitem")
    // exact decimal absolute bound of the largest shift, as the query
    // computes it (cast AFTER the double product, then ×1e6 → long)
    val unscaled = abs(
      ((col("l_extendedprice") * (lit(1) - col("l_discount")) *
        (lit(1) + col("l_tax"))).cast("decimal(18,6)") * lit(1000000))
        .cast("long"))
    val worst = li.groupBy("l_orderkey")
      .agg(sum(unscaled).as("s"), count(lit(1)).as("n"))
      .agg(max("s").as("maxS"), max("n").as("maxN"))
      .head()
    val maxS = worst.getLong(0)
    val maxN = worst.getLong(1)
    val bound = (1L << 53) / 1024 // 1024x headroom under the exact-double cap
    assert(maxS < bound,
      s"per-order unscaled sum $maxS approaches 2^53 — the long-sum trick is no longer safe for q42")
    // fixtures carry up to 13 lines per order (measured; the r9 comment's
    // "<=7" understated it) — 64 leaves the envelope intact by orders of
    // magnitude (64 items x ~1e11 unscaled ≈ 2^42.5 << 2^53)
    assert(maxN <= 64,
      s"groups are no longer per-order bounded ($maxN items) — re-derive the 2^53 envelope before keeping the long sums")
  }
}
