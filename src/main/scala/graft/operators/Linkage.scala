package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: blocked edit-distance fuzzy matching.
  *
  * The naive formulation — `levenshtein(l, r) <= d` as a join predicate —
  * is a cartesian product (no equi-key), which Spark executes as
  * BroadcastNestedLoopJoin: O(n·m) distance evaluations, hopeless at
  * 100 TB. The scale path is the classic block → verify split:
  *
  *   1. BLOCK: a cheap deterministic key (here: a token of the string)
  *      that near-duplicates almost surely share. The join becomes an
  *      equi-join on the block key — shuffle-partitioned, AQE-skew-safe.
  *   2. VERIFY: the exact edit distance runs only inside blocks —
  *      candidate pairs are Σ|block|², not n·m.
  *
  * Recall is bounded by the blocking function (a typo INSIDE the block
  * token hides the pair); production linkage unions several blocking
  * passes (first token, last token, length band) — each pass is this
  * same operator, and the union of candidates dedups by (left, right)
  * before verify. Skewed blocks (stop-word tokens) are AQE's skew-join
  * case or get salted like any hot aggregation key.
  */
object Linkage {

  /** All pairs within `maxDist` edit distance that share a block key.
    * `blockFn` maps the text column to the blocking key.
    *
    * `verifyParallelism` guards against the trap the sf1 rehearsal caught
    * live: the shuffle INPUT of the block join is tiny (ids + names), so
    * AQE coalesces the verify stage down to one partition — but the join
    * OUTPUT is Σ|block|² candidate pairs, which AQE cannot see, and the
    * whole edit-distance verify ran single-threaded. With
    * `verifyParallelism` > 0 the left side is explicitly repartitioned
    * (explicit partition counts are exempt from AQE coalescing) and the
    * right side broadcasts — the streaming-probe linkage plan: zero
    * shuffle of the catalog, verify work spread evenly by left id
    * regardless of block skew. Use it when the clean side fits a
    * broadcast (catalogs usually do); leave 0 for the plain equi-join
    * when both sides are corpus-sized (then AQE skew-split applies).
    *
    * The broadcast is guarded by `maxBroadcastBytes` against the
    * optimizer's size estimate of the catalog side: an unconditionally
    * forced broadcast would hit Spark's 8 GB broadcast limit (or driver
    * OOM) if a caller pointed the "catalog" at a corpus-sized table.
    * Over the threshold the plan degrades to the shuffle equi-join with
    * BOTH sides explicitly repartitioned on the block key at
    * `verifyParallelism` — explicit counts stay exempt from the AQE
    * verify-stage collapse, and block skew is AQE's skew-join case. */
  def fuzzyPairs(left: DataFrame, right: DataFrame,
                 leftId: String, leftText: String,
                 rightId: String, rightText: String,
                 blockFn: Column => Column, maxDist: Int,
                 verifyParallelism: Int = 0,
                 maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    val l0 = left.select(col(leftId).as("__lid"), col(leftText).as("__ltext"),
      blockFn(col(leftText)).as("__block"))
    val r0 = right.select(col(rightId).as("__rid"), col(rightText).as("__rtext"),
      blockFn(col(rightText)).as("__block"))
    val canBroadcast = verifyParallelism > 0 &&
      r0.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(maxBroadcastBytes)
    val l =
      if (canBroadcast) l0.repartition(verifyParallelism, col("__lid"))
      else if (verifyParallelism > 0) l0.repartition(verifyParallelism, col("__block"))
      else l0
    val r =
      if (canBroadcast) broadcast(r0)
      else if (verifyParallelism > 0) r0.repartition(verifyParallelism, col("__block"))
      else r0
    l.join(r, Seq("__block"))
      // banded O(k·n) threshold check rejects the (overwhelming) majority
      // of candidates without the full O(n·m) DP — levenshtein then runs
      // only on survivors, to produce the distance value (the kernel ≡
      // `levenshtein <= k` is pinned in TextKernelsSpec)
      .filter(graft.functions.TextKernels.editWithinCol(
        col("__ltext"), col("__rtext"), maxDist))
      .withColumn("distance", levenshtein(col("__ltext"), col("__rtext")))
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("distance"))
  }

  /** Best (min-distance) match per left row, ties broken by the smallest
    * right id — a deterministic argmin via `min(struct(dist, id))`, which
    * partial-aggregates map-side (no window over the candidate set).
    * Left rows with no candidate within `maxDist` are absent (inner
    * semantics — the unmatched set is the anti-join complement). */
  def bestFuzzyMatch(left: DataFrame, right: DataFrame,
                     leftId: String, leftText: String,
                     rightId: String, rightText: String,
                     blockFn: Column => Column, maxDist: Int,
                     verifyParallelism: Int = 0): DataFrame =
    fuzzyPairs(left, right, leftId, leftText, rightId, rightText, blockFn,
        maxDist, verifyParallelism)
      .groupBy(col(leftId))
      .agg(min(struct(col("distance"), col(rightId))).as("__best"))
      .select(col(leftId), col(s"__best.distance").as("distance"),
        col(s"__best.$rightId").as(rightId))
}
