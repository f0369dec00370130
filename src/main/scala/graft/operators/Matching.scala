package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Intra-event combinatorial matching
  * (reference delta_r_match / delta_r_match_multiple:
  * columnflow/production/util.py:124-213; configurable matcher
  * columnflow/production/matching.py:30-117).
  *
  * Greedy nearest-neighbour with removal: all (a,b) candidate pairs are
  * ranked by the metric; walking best-first, a pair is matched iff neither
  * endpoint is taken. This is inherently sequential per event — but events
  * are independent, so it stays a per-row `aggregate` fold over the sorted
  * pair array: no shuffle, no UDF, whole-stage codegen, O(n²·m) per event
  * with n·m candidate pairs (collections are small per event by physics).
  */
object Matching {

  /** Candidate pairs between two array<struct> collections: one row-level
    * array of struct(i, j, m) with metric m = |metricOf(a) - metricOf(b)|
    * or any caller expression. */
  def candidatePairs(a: Column, b: Column, metric: (Column, Column) => Column): Column =
    flatten(transform(a, (x, i) =>
      transform(b, (y, j) =>
        struct(i.as("i"), j.as("j"), metric(x, y).cast("double").as("m")))))

  /** Greedy best-first matching with removal over a candidate array.
    * Pairs are sorted by (m, i, j) for determinism, filtered by `maxMetric`,
    * then folded: the accumulator carries the used-index sets and the
    * matched pairs. Returns array<struct<i:int, j:int, m:double>>. */
  def greedyMatch(pairs: Column, maxMetric: Double): Column = {
    val eligible = filter(pairs, p => p.getField("m") <= maxMetric)
    val sorted = array_sort(eligible, (l, r) =>
      when(l.getField("m") < r.getField("m"), -1)
        .when(l.getField("m") > r.getField("m"), 1)
        .otherwise(when(l.getField("i") =!= r.getField("i"),
          l.getField("i") - r.getField("i"))
          .otherwise(l.getField("j") - r.getField("j")).cast("int")))
    val init = named(
      array().cast("array<int>"), array().cast("array<int>"),
      array().cast("array<struct<i:int,j:int,m:double>>"))
    val folded = aggregate(sorted, init, (acc, p) => {
      val taken =
        array_contains(acc.getField("ui"), p.getField("i")) ||
          array_contains(acc.getField("uj"), p.getField("j"))
      when(taken, acc).otherwise(named(
        concat(acc.getField("ui"), array(p.getField("i"))),
        concat(acc.getField("uj"), array(p.getField("j"))),
        concat(acc.getField("ms"), array(p))))
    })
    folded.getField("ms")
  }

  private def named(ui: Column, uj: Column, ms: Column): Column =
    struct(ui.as("ui"), uj.as("uj"), ms.as("ms"))
}
