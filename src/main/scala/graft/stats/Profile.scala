package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE-style statistics pass every warehouse
  * runs before planning and every data-quality gate runs after loads:
  * per column, the row/null/distinct counts and the numeric range.
  *
  * One aggregation job over the table produces every column's stats
  * simultaneously (a single scan at 100 TB — never one pass per column);
  * the wide single-row result is then melted to one row per column. Exact
  * distinct counts go through Spark's count-distinct Expand; swap in
  * `Approx.distinctSketch` when a 2% estimate is enough to avoid the
  * expanded shuffle entirely.
  */
object Profile {

  /** Profile numeric columns: (column_name, n, n_null, n_distinct, min_v,
    * max_v) per column, one table scan total. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"))
    }
    wide
      .select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
  }
}
