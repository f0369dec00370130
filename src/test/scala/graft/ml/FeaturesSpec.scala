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

  test("quantileTransform ≡ PERCENT_RANK window: randomized, with ties and a singleton group") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // heavy ties (values drawn from 40 distinct levels), uneven groups,
    // plus a group with exactly one row (the 0/0 guard)
    val rows = Seq.tabulate(500) { i =>
      (s"g${i % 4}", (rnd.nextInt(40) * 25).toDouble, i.toLong)
    } :+ (("solo", 123.0, 999L))
    val df = rows.toDF("grp", "v", "id")
    val expected = df.select(col("id"),
        percent_rank().over(Window.partitionBy("grp").orderBy("v")).as("q"))
      .as[(Long, Double)].collect().toMap
    val got = Features.quantileTransform(df, "grp", "v", buckets = 7)
      .select(col("id"), col("q")).as[(Long, Double)].collect().toMap
    assert(got.size === rows.size)
    // bit-equality, not tolerance: same exact-long operands, one division
    assert(got === expected)
  }

  test("quantileTransform drops null-keyed rows (documented contract)") {
    val df = Seq((Some("a"), Some(1.0), 1L), (Some("a"), Some(2.0), 2L),
      (None, Some(3.0), 3L), (Some("a"), None, 4L))
      .toDF("grp", "v", "id")
    val ids = Features.quantileTransform(df, "grp", "v")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L))
  }

  test("quantileTransform: custom outCol lands, existing-column collision rejected") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("grp", "v", "id")
    val out = Features.quantileTransform(df, "grp", "v", outCol = "rank_frac")
    assert(out.columns.contains("rank_frac") && !out.columns.contains("q"))
    // input already carrying the output name must fail fast, not emit
    // ambiguous duplicate columns from the join-back
    val clash = df.withColumn("q", lit(0.0))
    val e = intercept[IllegalArgumentException] {
      Features.quantileTransform(clash, "grp", "v")
    }
    assert(e.getMessage.contains("outCol"))
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
