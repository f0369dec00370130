package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Runtime integrity checks — the engine-side analog of the reference's
  * operational guards (finite-value output checks `check_finite_output`,
  * reference law.cfg:75-78; overlapping-input-column checks
  * `check_overlapping_inputs`, law.cfg:83-86): cheap assertions that turn
  * silent data corruption into loud task failures.
  *
  * `finiteReport` is ONE aggregation over the frame (all columns audited
  * in a single scan, like `stats/Profile`); `assertNoOverlap` is pure
  * schema arithmetic — no job at all.
  */
object Integrity {

  /** Per-column NaN / ±Inf counts over the float/double columns (or an
    * explicit subset). One scan; only offending columns appear.
    *
    * Explicitly requested columns must exist and be float/double —
    * otherwise a typo'd list would silently audit nothing and
    * `assertFinite` would pass vacuously. */
  def finiteReport(df: DataFrame, cols: Seq[String] = Nil): Seq[(String, Long, Long)] = {
    val allFloaty = df.schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      .map(_.name)
    cols.foreach { c =>
      require(df.columns.contains(c), s"finiteReport: column '$c' does not exist")
      require(allFloaty.contains(c),
        s"finiteReport: column '$c' is not float/double — a finite check on it is vacuous")
    }
    val floaty = allFloaty.filter(n => cols.isEmpty || cols.contains(n))
    if (floaty.isEmpty) return Seq.empty
    val aggs = floaty.flatMap { c =>
      Seq(
        sum(when(isnan(col(c)), 1L).otherwise(0L)).as(s"${c}__nan"),
        sum(when(abs(col(c)) === Double.PositiveInfinity, 1L).otherwise(0L))
          .as(s"${c}__inf"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    floaty.toSeq.map { c =>
      (c,
        Option(row.getAs[Long](s"${c}__nan")).getOrElse(0L),
        Option(row.getAs[Long](s"${c}__inf")).getOrElse(0L))
    }.filter(r => r._2 > 0 || r._3 > 0)
  }

  /** Throw if any float/double column contains NaN or ±Inf — run on stage
    * outputs exactly like the reference's finite-output task guard. */
  def assertFinite(df: DataFrame, cols: Seq[String] = Nil): Unit = {
    val bad = finiteReport(df, cols)
    require(bad.isEmpty,
      "non-finite values in output: " +
        bad.map { case (c, nan, inf) => s"$c(nan=$nan, inf=$inf)" }.mkString(", "))
  }

  /** Throw if two diff inputs would write the same non-key column — the
    * mis-declared-produces guard run before a merge. Schema-only. */
  def assertNoOverlap(keys: Seq[String], dfs: DataFrame*): Unit = {
    val owned = scala.collection.mutable.Map.empty[String, Int]
    dfs.zipWithIndex.foreach { case (df, i) =>
      df.columns.filterNot(keys.contains).foreach { c =>
        owned.get(c).foreach { j =>
          throw new IllegalArgumentException(
            s"column '$c' produced by both input #$j and input #$i — " +
              "overlapping diff columns indicate a mis-declared produces set")
        }
        owned(c) = i
      }
    }
  }
}
