package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Compat

/** Selection statistics: event counts and weighted sums, overall and per
  * group combination (reference `increment_stats`:
  * columnflow/selection/stats.py:28-250).
  *
  * The reference accumulates a python dict per chunk and merges across
  * files (columnflow/tasks/selection.py:320-404); here the whole dataset
  * aggregates in one distributed pass, and "N-way group combinations"
  * (columnflow/selection/stats.py:102-118) become GROUPING SETS — one
  * shuffle for all combinations. Weighted sums use exact decimal
  * arithmetic (Compat) for reproducibility.
  */
object SelectionStats {

  /** One row per grouping-set combination: group columns (null = "all"),
    * `num_events`, `num_events_selected`, and per-weight
    * `sum_<w>` / `sum_<w>_selected`. */
  def compute(df: DataFrame, selected: Column,
              weights: Map[String, Column],
              groups: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      Seq(
        count(lit(1)).as("num_events"),
        sum(when(selected, 1L).otherwise(0L)).as("num_events_selected")) ++
        weights.toSeq.sortBy(_._1).flatMap { case (n, w) =>
          val dw = Compat.money(w)
          Seq(
            sum(dw).cast("double").as(s"sum_$n"),
            sum(when(selected, dw).otherwise(lit(0).cast("decimal(18,4)")))
              .cast("double").as(s"sum_${n}_selected"))
        }
    if (groups.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.cube(groups.head, groups.tail: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge stats tables from independent runs/datasets (reference
    * MergeSelectionStats' recursive dict-sum:
    * columnflow/tasks/selection.py:320-404): every stats column is an
    * algebraic sum over disjoint inputs, so union + re-sum per group row
    * reproduces the single-pass result. Stats tables are tiny (one row
    * per group combination) — this merge is driver-scale work. */
  def merge(stats: Seq[DataFrame], groups: Seq[String]): DataFrame = {
    require(stats.nonEmpty)
    val sumCols = stats.head.columns.filterNot(groups.contains).toSeq
    val unioned = stats.reduce(_ unionByName _)
    if (groups.isEmpty) unioned.agg(
      sum(sumCols.head).as(sumCols.head),
      sumCols.tail.map(c => sum(c).as(c)): _*)
    else unioned.groupBy(groups.map(col): _*).agg(
      sum(sumCols.head).as(sumCols.head),
      sumCols.tail.map(c => sum(c).as(c)): _*)
  }
}
