package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SelectionStatsSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 10.25, true), ("a", 20.50, false), ("b", 5.00, true),
      ("b", 7.75, true), ("a", 2.25, false), ("b", 1.00, false))
      .toDF("proc", "w", "pass")
  }

  private def stats(d: org.apache.spark.sql.DataFrame) =
    SelectionStats.compute(d, col("pass"), Map("mc" -> col("w")), Seq("proc"))

  test("compute: counts and weighted sums per cube combination") {
    val all = stats(df).filter(col("proc").isNull).head
    assert(all.getAs[Long]("num_events") == 6L)
    assert(all.getAs[Long]("num_events_selected") == 3L)
    assert(all.getAs[Double]("sum_mc") == 46.75)
    assert(all.getAs[Double]("sum_mc_selected") == 23.0)
  }

  test("merge of per-file stats equals the single-pass stats") {
    val whole = stats(df).orderBy("proc").collect().map(_.toSeq).toSeq
    val merged = SelectionStats.merge(
      Seq(stats(df.limit(3)), stats(df.offset(3))), Seq("proc"))
      .orderBy("proc").collect().map(_.toSeq).toSeq
    assert(merged == whole)
  }
}
