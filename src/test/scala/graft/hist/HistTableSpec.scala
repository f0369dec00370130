package graft.hist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistTableSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq((0.5, "a", 2.0), (1.5, "a", 3.0), (2.5, "b", 1.0), (9.5, "a", 1.0), (-1.0, "b", 4.0))
      .toDF("x", "cat", "w")
  }
  private val ax = Axis.Regular("x", 5, 0.0, 10.0)

  private def grab(h: org.apache.spark.sql.DataFrame): Map[Int, (Double, Long)] =
    h.collect().map(r => r.getAs[Int]("x_bin") ->
      (r.getAs[Double]("sumw"), r.getAs[Long]("n"))).toMap

  test("fill: weighted bins with flow") {
    val h = grab(HistTable.fill(df, Seq(ax -> col("x")), col("w")))
    assert(h(0) == (5.0, 2L)) // 0.5 and 1.5 both in [0,2)
    assert(h(1) == (1.0, 1L))
    assert(h(4) == (1.0, 1L))
    assert(h(-1) == (4.0, 1L)) // underflow
  }

  test("merge: partial fills re-aggregate to the full fill") {
    val h1 = HistTable.fill(df.limit(2), Seq(ax -> col("x")), col("w"))
    val h2 = HistTable.fill(df.offset(2), Seq(ax -> col("x")), col("w"))
    val merged = grab(HistTable.merge(Seq(h1, h2)))
    assert(merged == grab(HistTable.fill(df, Seq(ax -> col("x")), col("w"))))
  }

  test("foldFlow moves flow into edge bins") {
    val h = HistTable.fill(df, Seq(ax -> col("x")), col("w"))
    val folded = grab(HistTable.foldFlow(h, ax))
    assert(!folded.contains(-1))
    assert(folded(0) == (9.0, 3L)) // underflow 4.0 folded into bin 0
  }

  test("rebin by factor sums adjacent bins; overflow lands at the coarse id") {
    val s = spark
    import s.implicits._
    val withOverflow = df.union(Seq((11.0, "b", 7.0)).toDF("x", "cat", "w"))
    val h = HistTable.fill(withOverflow, Seq(ax -> col("x")), col("w"))
    val re = grab(HistTable.rebin(h, ax, 2))
    assert(re(0) == (6.0, 3L)) // bins 0+1
    assert(re(2) == (1.0, 1L)) // bin 4 → 2 (ragged final bin)
    assert(re(-1) == (4.0, 1L)) // underflow passes through
    assert(re(3) == (7.0, 1L)) // overflow 5 → ceil(5/2) = 3
  }

  test("project drops an axis by summation") {
    val axc = Axis.StrCat("cat", Seq("a", "b"))
    val h2d = HistTable.fill(df, Seq(ax -> col("x"), axc -> col("cat")), col("w"))
    val projected = grab(HistTable.project(h2d, "cat"))
    assert(projected == grab(HistTable.fill(df, Seq(ax -> col("x")), col("w"))))
  }

  test("selectCategories: parent preference, leaf re-sum, DAG recursion") {
    val s = spark
    import s.implicits._
    // bin table over a category axis with ids 1, 2, 3 and a 2-D shape
    val axc = Axis.Integer("catid", 0, 100)
    val h = HistTable.fill(
      df.withColumn("cid", when(col("cat") === "a", 1L).otherwise(2L)),
      Seq(axc -> col("cid"), ax -> col("x")), col("w"))
    val dag = Map(10L -> Seq(1L, 2L), 20L -> Seq(10L))

    // 10 has no bin of its own → leaves 1+2 re-summed under id 10
    val out = HistTable.selectCategories(h, "catid", Seq(10L), dag)
      .groupBy().agg(sum("sumw"), sum("n")).head
    assert(out.getDouble(0) == 11.0 && out.getLong(1) == 5L)

    // nested DAG: 20 → 10 → (1, 2) resolves through the intermediate node
    val nested = HistTable.selectCategories(h, "catid", Seq(20L), dag)
      .groupBy().agg(sum("sumw")).head
    assert(nested.getDouble(0) == 11.0)

    // parent preference: a category with its own bin is passed through
    val own = HistTable.selectCategories(h, "catid", Seq(1L), dag)
      .groupBy().agg(sum("sumw"), sum("n")).head
    assert(own.getDouble(0) == 6.0 && own.getLong(1) == 3L)
  }

  test("relabel joins bin ids to names") {
    val s = spark
    import s.implicits._
    val axc = Axis.IntCat("proc", Seq(10L, 20L))
    val h = HistTable.fill(df.withColumn("pid", when(col("cat") === "a", 10L).otherwise(20L)),
      Seq(axc -> col("pid")))
    val names = Seq((0, "signal"), (1, "background")).toDF("id", "name")
    val out = HistTable.relabel(h, "proc", names, "id", "name")
      .collect().map(r => r.getAs[String]("proc") -> r.getAs[Long]("n")).toMap
    assert(out == Map("signal" -> 3L, "background" -> 2L))
  }
}
