package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupedSpec extends SparkSpec {
  import spark.implicits._

  test("maxDrawdown on a hand-checked walk") {
    // k=a: 5 → 3 (dd 2) → 8 → 2 (dd 6) → 7; k=b: monotone up (dd 0)
    val df = Seq(
      ("a", 1L, 0L, 5.0), ("a", 2L, 0L, 3.0), ("a", 3L, 0L, 8.0),
      ("a", 4L, 0L, 2.0), ("a", 5L, 0L, 7.0),
      ("b", 1L, 0L, 1.0), ("b", 2L, 0L, 4.0))
      .toDF("k", "t", "tie", "v")
    val out = Grouped.maxDrawdown(df, "k", "t", "tie", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") === ((5L, 8.0, 6.0)))
    assert(out("b") === ((2L, 4.0, 0.0)))
  }

  test("maxDrawdown ≡ the window formulation on random data, any partitioning") {
    val rnd = new scala.util.Random(29)
    val df = (1 to 1000).map(i =>
        (s"u${rnd.nextInt(20)}", i.toLong, i.toLong, rnd.nextDouble() * 100))
      .toDF("k", "t", "tie", "v")
    val w = Window.partitionBy("k").orderBy("t", "tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("peak", max("v").over(w))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), max("peak").as("mp"),
        max(col("peak") - col("v")).as("dd"))
      .orderBy("k").as[(String, Long, Double, Double)].collect().toSeq
    for (parts <- Seq(1, 13)) {
      val got = Grouped.maxDrawdown(df.repartition(parts), "k", "t", "tie", "v")
        .orderBy("k").as[(String, Long, Double, Double)].collect().toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("null values are dropped, not a crash; n_events counts non-null rows") {
    val df = Seq[(String, Long, Long, java.lang.Double)](
      ("a", 1L, 0L, 5.0), ("a", 2L, 0L, null), ("a", 3L, 0L, 2.0))
      .toDF("k", "t", "tie", "v")
    val out = Grouped.maxDrawdown(df, "k", "t", "tie", "v").collect().head
    assert(out.getLong(1) === 2L)
    assert(out.getDouble(3) === 3.0)
  }

  test("a key split across input partitions still folds as one group") {
    // adversarial input partitioning: the operator's repartition(key) must
    // bring the group back together before the fold
    val df = Seq(("x", 1L, 0L, 10.0), ("x", 2L, 0L, 1.0))
      .toDF("k", "t", "tie", "v").repartition(2)
    val out = Grouped.maxDrawdown(df, "k", "t", "tie", "v").collect()
    assert(out.length === 1)
    assert(out.head.getDouble(3) === 9.0)
  }
}
