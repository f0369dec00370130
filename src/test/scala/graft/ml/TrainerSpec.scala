package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Seeds

class TrainerSpec extends SparkSpec {

  test("solve handles pivoting and recovers exact solutions") {
    // first pivot is zero → requires the row swap
    val a = Array(Array(0.0, 2.0, 1.0), Array(1.0, 1.0, 1.0), Array(2.0, 0.0, 4.0))
    val x = Trainer.solve(a, Array(7.0, 6.0, 14.0))
    // verify by substitution
    val back = a.map(r => r.zip(x).map { case (c, v) => c * v }.sum)
    back.zip(Seq(7.0, 6.0, 14.0)).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    intercept[IllegalArgumentException] {
      Trainer.solve(Array(Array(1.0, 2.0), Array(2.0, 4.0)), Array(1.0, 1.0))
    }
  }

  test("fitLinear recovers an exact linear relationship distributed") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map { i =>
      val x = i * 0.25; val z = (i % 17).toDouble
      (x, z, 3.0 + 2.0 * x - 0.5 * z)
    }.toDF("x", "z", "y").repartition(7)
    val w = Trainer.fitLinear(df, Seq(col("x"), col("z")), col("y"))
    assert(math.abs(w(0) - 3.0) < 1e-8 && math.abs(w(1) - 2.0) < 1e-8 &&
      math.abs(w(2) + 0.5) < 1e-8)
    // ridge shrinks the slope toward zero
    val wr = Trainer.fitLinear(df, Seq(col("x"), col("z")), col("y"), l2 = 1e4)
    assert(math.abs(wr(1)) < math.abs(w(1)))
  }

  test("perFold trains each model on every fold except its own") {
    val s = spark
    import s.implicits._
    val k = 4
    val df = (1L to 400L).toDF("id").withColumn("ids", col("id").cast("string"))
    val n = df.count()
    val foldSizes = df.groupBy(Seeds.fold(k, col("ids")).as("f")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val trainSizes = Trainer.perFold(df, k, Seq(col("ids")))(_.count())
    (0 until k).foreach { f => assert(trainSizes(f) == n - foldSizes(f)) }
  }

  test("crossPredictLinear dispatches each row to its fold's model") {
    val s = spark
    import s.implicits._
    val k = 3
    val df = (1L to 90L).toDF("id")
      .withColumn("ids", col("id").cast("string"))
      .withColumn("x", col("id").cast("double"))
    // fold f's model: y = 100*f + x  (distinct per fold, trivially checkable)
    val weights = IndexedSeq.tabulate(k)(f => Array(100.0 * f, 1.0))
    val out = df.select(col("ids"), col("x"),
      Trainer.crossPredictLinear(k, Seq(col("ids")), Seq(col("x")), weights).as("p"),
      Seeds.fold(k, col("ids")).as("f")).collect()
    out.foreach { r =>
      assert(r.getDouble(2) == 100.0 * r.getInt(3) + r.getDouble(1))
    }
  }
}
