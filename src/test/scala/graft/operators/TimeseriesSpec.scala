package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {

  test("ewmaHalf: hand-computed truncated EWMA, partition-start clamp") {
    val s = spark
    import s.implicits._
    val df = Seq(("u", 1L, 10.0), ("u", 2L, 20.0), ("u", 3L, 40.0))
      .toDF("k", "t", "x")
    val out = Timeseries.ewmaHalf(df, "k", "x", Seq(col("t")), depth = 2)
      .orderBy("t").collect().map(_.getAs[Double]("ewma")).toSeq
    // row1: frame [10] → 10; row2: (0.5·10 + 1·20)/1.5; row3: (0.5·20+40)/1.5
    assert(out == Seq(10.0, 25.0 / 1.5, 50.0 / 1.5))
  }

  test("ewmaHalf is invariant under repartitioning") {
    val s = spark
    import s.implicits._
    val df = (1 to 200).map(i => (s"u${i % 7}", i.toLong, (i * 37 % 100) / 4.0))
      .toDF("k", "t", "x")
    val a = Timeseries.ewmaHalf(df, "k", "x", Seq(col("t")))
      .orderBy("k", "t").collect().map(_.getAs[Double]("ewma")).toSeq
    val b = Timeseries.ewmaHalf(df.repartition(13), "k", "x", Seq(col("t")))
      .orderBy("k", "t").collect().map(_.getAs[Double]("ewma")).toSeq
    assert(a == b) // bit-exact, not just approximate
  }

  test("transitions: counts and per-source probabilities") {
    val s = spark
    import s.implicits._
    // u1: A B A B ; u2: A B B  → A→B ×3, B→A ×1, B→B ×1
    val df = Seq(
      ("u1", 1L, "A"), ("u1", 2L, "B"), ("u1", 3L, "A"), ("u1", 4L, "B"),
      ("u2", 1L, "A"), ("u2", 2L, "B"), ("u2", 3L, "B"))
      .toDF("k", "t", "st")
    val out = Timeseries.transitions(df, "k", "st", Seq(col("t")))
      .orderBy("from_state", "to_state")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n"), r.getAs[Double]("p"))).toSeq
    assert(out == Seq(
      ("A", "B", 3L, 1.0),
      ("B", "A", 1L, 0.5),
      ("B", "B", 1L, 0.5)))
  }
}
