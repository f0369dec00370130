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

  test("ewmaHalf: fuzz against a sequential reference implementation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val data = (1 to 500).map(i =>
      (s"k${rnd.nextInt(5)}", i.toLong, math.round(rnd.nextDouble() * 1e4) / 100.0))
    val depth = 8
    val expected = data.groupBy(_._1).flatMap { case (k, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - depth + 1), i + 1)
        // oldest-first fixed-order reduce, same as the operator
        val num = frame.zipWithIndex.map { case (r, j) =>
          r._3 * math.pow(0.5, frame.size - 1 - j) }.sum
        val den = frame.indices.map(j => math.pow(0.5, frame.size - 1 - j)).sum
        (k, ordered(i)._2) -> num / den
      }
    }
    val out = Timeseries.ewmaHalf(data.toDF("k", "t", "x"), "k", "x",
        Seq(col("t")), depth)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("ewma"))
      .toMap
    assert(out.size == expected.size)
    expected.foreach { case (key, v) => assert(out(key) == v, s"at $key") }
  }

  test("transitions: probabilities are row-stochastic on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 400).map(i =>
      (s"u${rnd.nextInt(9)}", i.toLong, s"s${rnd.nextInt(4)}"))
      .toDF("k", "t", "st")
    val sums = Timeseries.transitions(df, "k", "st", Seq(col("t")))
      .groupBy("from_state").agg(sum("p").as("ptot"))
      .collect().map(_.getAs[Double]("ptot"))
    sums.foreach(p => assert(math.abs(p - 1.0) < 1e-12))
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

  test("twap weights by holding duration, drops single-observation keys") {
    val s = spark
    import s.implicits._
    // k=a: 10 held for 3 ticks, 40 held for 1 tick → (30+40)/4 = 17.5;
    // the final observation (99) carries no interval; k=b: one row → absent
    val df = Seq(("a", 0L, 10.0), ("a", 3L, 40.0), ("a", 4L, 99.0),
      ("b", 0L, 5.0)).toDF("k", "t", "v")
    val out = Timeseries.twap(df, "k", "t", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map("a" -> ((2L, 17.5))))
  }

  test("resampleFfill: grid aligns to epoch, ticks forward-fill, pre-first ticks null") {
    val s = spark
    import s.implicits._
    // step 10: key a observes at t=12 (v=1) and t=35 (v=2)
    // grid = [10, 20, 30]; tick 10 precedes the first obs → null
    val df = Seq(("a", 12L, 1.0), ("a", 35L, 2.0)).toDF("k", "t", "v")
    val out = Timeseries.resampleFfill(df, "k", "t", "v", step = 10L)
      .orderBy("tick")
      .collect().map(r => (r.getLong(1), Option(r.get(2)))).toSeq
    assert(out === Seq((10L, None), (20L, Some(1.0)), (30L, Some(1.0))))
  }

  test("ohlc: open/close by time, high/low by value, per bucket") {
    val s = spark
    import s.implicits._
    // bucket [0,10): ticks (1→5.0), (3→9.0), (7→2.0); bucket [10,20): (12→4.0)
    val df = Seq(("k", 1L, 5.0), ("k", 3L, 9.0), ("k", 7L, 2.0), ("k", 12L, 4.0))
      .toDF("k", "t", "v")
    val out = Timeseries.ohlc(df, "k", "t", "v", step = 10L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (0L, 5.0, 9.0, 2.0, 2.0, 3L),
      (10L, 4.0, 4.0, 4.0, 4.0, 1L)))
  }

  test("twap: a null observation does not deflate the average") {
    val s = spark
    import s.implicits._
    // null at t=1 drops; v=10 holds 0→2: twap must be 10, not 5
    val df = Seq[(String, Long, java.lang.Double)](
      ("k", 0L, 10.0), ("k", 1L, null), ("k", 2L, 10.0)).toDF("k", "t", "v")
    val out = Timeseries.twap(df, "k", "t", "v").head()
    assert(out.getLong(1) === 1L && out.getDouble(2) === 10.0)
  }

  test("twap is repartition-stable (decimal sums)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val df = (1 to 800).map(i => (s"k${i % 6}", i.toLong, rnd.nextInt(10000) / 100.0))
      .toDF("k", "t", "v")
    val a = Timeseries.twap(df, "k", "t", "v").orderBy("k").collect().toSeq
    val b = Timeseries.twap(df.repartition(11), "k", "t", "v").orderBy("k").collect().toSeq
    assert(a === b)
  }
}
