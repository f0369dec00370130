package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandSpec extends SparkSpec {

  private lazy val keys = {
    val s = spark
    import s.implicits._
    (1L to 20000L).toDF("k")
  }

  test("uniform: in (0,1), deterministic, stable under repartitioning") {
    val u = keys.select(col("k"), Rand.uniform(col("k")).as("u"))
    val bounds = u.agg(min("u"), max("u")).head
    assert(bounds.getDouble(0) > 0.0 && bounds.getDouble(1) < 1.0)
    val a = u.orderBy("k").collect().map(_.getDouble(1))
    val b = keys.repartition(7).select(col("k"), Rand.uniform(col("k")).as("u"))
      .orderBy("k").collect().map(_.getDouble(1))
    assert(a.sameElements(b)) // rand()/randn() fail exactly this property
  }

  test("uniform moments ≈ U(0,1)") {
    val r = keys.select(Rand.uniform(col("k")).as("u"))
      .agg(avg("u"), stddev("u")).head
    assert(math.abs(r.getDouble(0) - 0.5) < 0.01)
    assert(math.abs(r.getDouble(1) - math.sqrt(1.0 / 12)) < 0.01)
  }

  test("gaussian moments ≈ N(0,1) and streams decorrelated") {
    val r = keys.select(Rand.gaussian(col("k")).as("z"))
      .agg(avg("z"), stddev("z"), min("z"), max("z")).head
    assert(math.abs(r.getDouble(0)) < 0.03)
    assert(math.abs(r.getDouble(1) - 1.0) < 0.03)
    assert(r.getDouble(2) < -3 && r.getDouble(3) > 3) // tails exist
    // u and u2 decorrelated
    val c = keys.select(Rand.uniform(col("k")).as("a"), Rand.uniform2(col("k")).as("b"))
      .agg(corr("a", "b")).head.getDouble(0)
    assert(math.abs(c) < 0.02)
  }

  test("portable gaussian matches its SQL mirror") {
    val ks = keys.limit(500).select(col("k").cast("string").as("ks"))
    val viaCol = ks.select(round(Rand.portableGaussian(col("ks")), 9).as("z"))
      .collect().map(_.getDouble(0)).toSeq
    val viaSql = ks.selectExpr(s"round(${Rand.portableGaussianSql("ks")}, 9) AS z")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaCol == viaSql)
  }

  test("smear preserves scale: mean ≈ x, width ≈ 5%") {
    val r = keys.select(Rand.smear(lit(100.0), lit(0.05), col("k")).as("s"))
      .agg(avg("s"), stddev("s")).head
    assert(math.abs(r.getDouble(0) - 100.0) < 0.5)
    assert(math.abs(r.getDouble(1) - 5.0) < 0.3)
  }
}
