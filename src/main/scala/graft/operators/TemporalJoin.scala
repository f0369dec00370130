package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins: as-of (most-recent-prior match) and band (interval)
  * joins over event streams.
  *
  * The reference framework has no temporal-join operator — its event
  * loops are per-chunk Python (reference: columnflow/columnar_util.py
  * ChunkedIOHandler drives row-group batches) — but any event-stream
  * pipeline built on this engine needs one, and a naive SQL formulation
  * (`t2.ts <= t1.ts` theta-join + argmax) explodes quadratically per key.
  *
  * Scale design:
  *   - `asOfJoin` is the union-sort trick: tag both sides, one shuffle on
  *     the key, one in-partition sort by time, then `last(payload,
  *     ignoreNulls)` over an unbounded-preceding window. Cost is one
  *     exchange of (left + right) rows — the same plan a merge-join based
  *     engine (pandas merge_asof, DuckDB ASOF JOIN) runs, and it never
  *     materializes candidate pairs. 100 TB of events shuffle once.
  *   - `bandPairs` blocks time into buckets of the band width, so each
  *     left row probes at most two buckets and each candidate pair is
  *     produced exactly once. With join keys the bucket rides behind the
  *     equi-key (bounding skew per key); with NO keys it alone prevents
  *     the cartesian blow-up a pure range predicate would plan (Spark
  *     would nested-loop it). Candidate count is |pairs within width|,
  *     not |L|x|R|.
  */
object TemporalJoin {

  /** Backward as-of join: for each left row, attach the payload of the
    * right row with the largest `rightTime` <= `leftTime` for the same
    * key (ties: the right row at exactly `leftTime` matches). Left rows
    * with no prior right row keep null payloads (left-outer semantics).
    *
    * Time columns must be numeric (e.g. epoch micros) so tolerance
    * arithmetic stays exact. For a deterministic payload the right side
    * must be unique per (keys, rightTime) — dedup upstream if not.
    *
    * @param tolerance max allowed `leftTime - rightTime`; matches farther
    *                  back are nulled out (pandas merge_asof semantics).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoin needs at least one equi-key")
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val pStruct = struct(payload.map(right(_)): _*)
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType

    // __side orders right (0) before left (1) at equal time, so an
    // equal-timestamp right row is visible to the left row's window.
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("long").as("__t"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(pType).as("__p")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), pStruct.as("__p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last("__p", ignoreNulls = true).over(w))
      .withColumn("__mt", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inTol = tolerance match {
      case Some(tol) => col("__mt").isNotNull && (col("__t") - col("__mt") <= tol)
      case None      => col("__mt").isNotNull
    }
    val out = matched.withColumn("__m", when(inTol, col("__m")))
    out.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Forward as-of join: for each left row, the payload of the EARLIEST
    * right row with `rightTime >= leftTime` (within `tolerance` ahead,
    * if given). Implemented by time negation over [[asOfJoin]] — the
    * earliest-following in real time is the latest-preceding in negated
    * time — so it inherits the union-sort-window plan verbatim: one
    * shuffle, no candidate pairs, same uniqueness contract on
    * (keys, rightTime). The "first response after the stimulus" join:
    * funnels, next-action attribution, SLA clocks. */
  def forwardAsOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the re-select below would be ambiguous for a payload name that
    // also exists on the left — fail with a contract, not an
    // AMBIGUOUS_REFERENCE analysis error (keys are already on the left;
    // alias the payload on the right side instead)
    payload.foreach(p => require(!leftCols.contains(p),
      s"forwardAsOfJoin: payload column '$p' also exists on the left side — alias it"))
    val l = left.withColumn("__neg_lt", -col(leftTime).cast("long"))
    val r = right.withColumn("__neg_rt", -col(rightTime).cast("long"))
    asOfJoin(l, r, keys, "__neg_lt", "__neg_rt", payload, tolerance)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Inner band-join candidate pairs: all (left, right) row pairs with the
    * same keys and `rightTime` in `[leftTime + lower, leftTime + upper)`.
    * Returns left.* ++ payload columns, one row per matching pair.
    *
    * `keys` may be empty: blocking then happens purely on the time bucket
    * (bucket width = band width, each left row probes its two covering
    * buckets), which keeps a keyless range join linear in true matches.
    * Aggregate downstream; re-join to the left table for outer semantics.
    */
  def bandPairs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      lower: Long,
      upper: Long): DataFrame = {
    require(upper > lower, s"empty band [$lower, $upper)")
    val width = upper - lower
    val leftCols = left.columns.toSeq

    // Window [t+lower, t+upper) spans at most two width-sized buckets.
    val lb = left
      .withColumn("__lt", col(leftTime).cast("long"))
      .withColumn("__b", explode(array_distinct(array(
        floorDiv(col("__lt") + lower, width),
        floorDiv(col("__lt") + upper - 1, width)))))
    val rb = right.select(
      keys.map(right(_)) ++ Seq(
        col(rightTime).cast("long").as("__rt"),
        struct(payload.map(right(_)): _*).as("__p")): _*)
      .withColumn("__b", floorDiv(col("__rt"), width))

    val cond = col("__rt") >= col("__lt") + lower && col("__rt") < col("__lt") + upper
    lb.join(rb, (keys :+ "__b").map(n => lb(n) === rb(n)).reduce(_ && _))
      .filter(cond)
      .select(leftCols.map(lb(_)) ++ payload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Interval-overlap join: all (left, right) pairs with the same keys
    * whose half-open intervals [start, end) intersect — the remaining
    * temporal-join shape next to as-of (point→latest), band
    * (point→window) and PIT (point→validity interval). Sessions versus
    * campaigns, downtime versus deploys, visit windows versus
    * experiment exposure.
    *
    * Scale: the naive form is a per-key theta join (cross product per
    * key — the q140/q160 hazard). Here time is gridded into
    * `cellWidth`-sized cells, each interval replicates to the cells it
    * touches, candidates meet through an EQUI-join on (keys, cell), and
    * a pair is kept only in the FIRST cell both intervals occupy —
    * `cell == floor(max(starts) / width)` — so every true pair emits
    * exactly once with no distinct pass. Replication factor =
    * span/cellWidth + 1: size `cellWidth` to the typical interval
    * length (the [[bandPairs]] contract). A runtime guard fail-fasts
    * when any interval would touch more than `maxCellsPerInterval`
    * cells (a degenerate interval under a mis-sized grid — the
    * chi-square maxCells idiom, enforced in-plan so no extra pre-scan).
    *
    * Output: the left row's columns, `rightPayload` columns from the
    * right, and the exact intersection bounds
    * (`overlap_start`/`overlap_end`). */
  def intervalOverlapPairs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      rightPayload: Seq[String],
      cellWidth: Long,
      maxCellsPerInterval: Int = 4096): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    val leftCols = left.columns.toSeq

    def withCells(df: DataFrame, s: String, e: String): DataFrame = {
      val d = df
        .withColumn("__s", col(s).cast("long"))
        .withColumn("__e", col(e).cast("long"))
        .filter(col("__e") > col("__s")) // empty intervals overlap nothing
        .withColumn("__nc",
          floorDiv(col("__e") - 1, cellWidth) - floorDiv(col("__s"), cellWidth) + 1)
      d.filter(isnull(assert_true(col("__nc") <= lit(maxCellsPerInterval.toLong),
          lit(s"intervalOverlapPairs: an interval spans more than " +
            s"$maxCellsPerInterval cells of width $cellWidth — raise cellWidth"))))
        .withColumn("__c", explode(
          sequence(floorDiv(col("__s"), cellWidth), floorDiv(col("__e") - 1, cellWidth))))
        .drop("__nc")
    }

    val lb = withCells(left, leftStart, leftEnd)
    val rb = withCells(
      right.select((keys.map(right(_)) ++ Seq(col(rightStart), col(rightEnd)) ++
        rightPayload.map(c => right(c).as(s"__p_$c"))): _*),
      rightStart, rightEnd)

    lb.join(rb, (keys :+ "__c").map(n => lb(n) === rb(n)).reduce(_ && _))
      .filter(lb("__s") < rb("__e") && rb("__s") < lb("__e"))
      // emit each true pair exactly once: only in the first shared cell
      .filter(lb("__c") === floorDiv(greatest(lb("__s"), rb("__s")), cellWidth))
      .select(leftCols.map(lb(_)) ++
        rightPayload.map(c => col(s"__p_$c").as(c)) ++ Seq(
          greatest(lb("__s"), rb("__s")).as("overlap_start"),
          least(lb("__e"), rb("__e")).as("overlap_end")): _*)
  }

  /** Exact floor division for longs (Spark's `/` is double, `div` truncates
    * toward zero — wrong for negative timestamps). */
  private def floorDiv(x: Column, d: Long): Column =
    // x - pmod(x, d) is an exact multiple of d, so the double division is
    // exact for |quotient| < 2^53 — epoch micros over any sane band width
    // stay far below that.
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")
}
