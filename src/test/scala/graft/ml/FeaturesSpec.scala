package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("gramUpper matches the hand-computed matrix on a tiny corpus") {
    // X = [[1,2],[3,4]] → XᵀX = [[10,14],[14,20]], upper triangle only
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val out = Features.gramUpper(df, col("v"))
      .select(col("i"), col("j"), col("g").cast("double"))
      .as[(Int, Int, Double)].collect().toSet
    assert(out === Set((0, 0, 10.0), (0, 1, 14.0), (1, 1, 20.0)))
  }

  test("targetEncodeLoo: excludes own row, singleton categories get null") {
    val df = Seq(("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 30.0, 3L),
      ("b", 5.0, 4L)).toDF("cat", "y", "id")
    val out = Features.targetEncodeLoo(df, "cat", col("y"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("loo_encoding")).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) === Some(25.0)) // (20+30)/2 — own 10 excluded
    assert(out(2L) === Some(20.0))
    assert(out(3L) === Some(15.0))
    assert(out(4L) === None) // singleton: no others to average
  }

  test("targetEncodeLoo: null targets neither count nor deflate the others") {
    val df = Seq(("a", Some(10.0), 1L), ("a", None, 2L), ("a", Some(30.0), 3L))
      .toDF("cat", "y", "id")
    val out = Features.targetEncodeLoo(df, "cat", col("y"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("loo_encoding")).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) === Some(30.0)) // only the 30 counts as "other"
    assert(out(2L) === None) // null target: no encoding
    assert(out(3L) === Some(10.0))
  }

  test("gramUpper is repartition-stable (decimal sums commute)") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(200)(Seq.fill(8)(rnd.nextFloat())).toDF("v")
    val a = Features.gramUpper(df, col("v")).orderBy("i", "j").collect().toSeq
    val b = Features.gramUpper(df.repartition(9), col("v"))
      .orderBy("i", "j").collect().toSeq
    assert(a === b)
  }
}
