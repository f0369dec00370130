package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

class ArrayOpsSpec extends SparkSpec {

  private def eval[T](c: Column): T = {
    val s = spark
    import s.implicits._
    Seq(1).toDF("x").select(c.as("r")).head.getAs[T]("r")
  }

  private def seqOf[T](c: Column): Seq[T] =
    eval[scala.collection.Seq[T]](c).toSeq

  test("embedWithMask scatters compact values into mask shape") {
    val mask = array(lit(true), lit(false), lit(true), lit(true))
    val values = array(lit(10), lit(20), lit(30))
    assert(seqOf[Int](ArrayOps.embedWithMask(values, mask, lit(-99999))) ==
      Seq(10, -99999, 20, 30))
  }

  test("embedWithMask on all-false and empty masks") {
    assert(seqOf[Int](ArrayOps.embedWithMask(
      array().cast("array<int>"), array(lit(false), lit(false)), lit(0))) == Seq(0, 0))
    assert(seqOf[Int](ArrayOps.embedWithMask(
      array().cast("array<int>"), array().cast("array<boolean>"), lit(0))) == Nil)
  }

  test("fullLike and fillAt") {
    val arr = array(lit(1), lit(2), lit(3))
    assert(seqOf[Int](ArrayOps.fullLike(arr, lit(7))) == Seq(7, 7, 7))
    assert(seqOf[Int](ArrayOps.fillAt(arr, lit(2), lit(9))) == Seq(1, 9, 3))
    assert(seqOf[Int](ArrayOps.fillAt(arr, lit(5), lit(9))) == Seq(1, 2, 3))
  }

  test("layoutLike re-rags a flat array by a template's layout") {
    val flat = array(lit(1), lit(2), lit(3), lit(4), lit(5))
    val template = array(
      array(lit(0), lit(0)), array().cast("array<int>"), array(lit(0), lit(0), lit(0)))
    val out = eval[scala.collection.Seq[scala.collection.Seq[Int]]](
      ArrayOps.layoutLike(flat, template)).map(_.toSeq).toSeq
    assert(out == Seq(Seq(1, 2), Nil, Seq(3, 4, 5)))
  }

  test("maskFromIndices round-trips with sortedIndicesFromMask") {
    val mask = ArrayOps.maskFromIndices(array(lit(1), lit(3)), lit(4))
    assert(seqOf[Boolean](mask) == Seq(true, false, true, false))
    assert(seqOf[Boolean](ArrayOps.maskFromIndices(array(), lit(0))) == Nil)

    // indices of true positions sorted DESC by key = pt-ordered selection
    val key = array(lit(5.0), lit(50.0), lit(30.0), lit(40.0))
    val idx = ArrayOps.sortedIndicesFromMask(
      array(lit(true), lit(false), lit(true), lit(true)), transform(key, k => -k))
    assert(seqOf[Int](idx) == Seq(4, 3, 1))
  }

  test("sortedIndicesFromMask keeps position order on key ties") {
    val key = array(lit(1.0), lit(1.0), lit(1.0))
    val idx = ArrayOps.sortedIndicesFromMask(
      array(lit(true), lit(true), lit(true)), key)
    assert(seqOf[Int](idx) == Seq(1, 2, 3))
  }

  test("round-trip laws hold on 100 random shapes (one Spark pass)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    val cases = (1 to 100).map { i =>
      val n = rng.nextInt(8) // 0..7 elements
      val mask = Vector.fill(n)(rng.nextBoolean())
      val values = Vector.fill(mask.count(identity))(rng.nextInt(1000))
      val key = Vector.fill(n)(rng.nextDouble())
      val template = Vector.fill(rng.nextInt(4))(Vector.fill(rng.nextInt(4))(rng.nextInt(9)))
      (i, mask, values, key, template)
    }
    val df = cases.toDF("i", "mask", "values", "key", "template")
    val bad = df.select(
      col("i"),
      // law 1: scatter then gather returns the compact values
      (filter(ArrayOps.embedWithMask(col("values"), col("mask"), lit(null)),
        _.isNotNull) === col("values")).as("embed_rt"),
      // law 2: indices -> mask -> same true positions, any sort key
      (ArrayOps.maskFromIndices(
        ArrayOps.sortedIndicesFromMask(col("mask"), col("key")),
        size(col("mask"))) === col("mask")).as("mask_rt"),
      // law 3: re-ragging a flattened array by its own layout is identity
      (ArrayOps.layoutLike(flatten(col("template")), col("template"))
        === col("template")).as("layout_rt"))
      .filter(!col("embed_rt") || !col("mask_rt") || !col("layout_rt"))
    assert(bad.count() == 0, s"law violations: ${bad.collect().mkString(", ")}")
  }
}
