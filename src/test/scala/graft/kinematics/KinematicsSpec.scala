package graft.kinematics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KinematicsSpec extends SparkSpec {
  import Kinematics._

  private def one(c: org.apache.spark.sql.Column): Double = {
    val s = spark
    import s.implicits._
    Seq(1).toDF("x").select(c.cast("double")).head.getDouble(0)
  }

  test("deltaPhi wraps into (-pi, pi]") {
    assert(math.abs(one(deltaPhi(lit(3.0), lit(-3.0))) - (6.0 - 2 * math.Pi)) < 1e-12)
    assert(math.abs(one(deltaPhi(lit(0.1), lit(0.3))) - (-0.2)) < 1e-12)
  }

  test("deltaR") {
    val dr = one(deltaR(lit(1.0), lit(0.0), lit(0.0), lit(0.0)))
    assert(math.abs(dr - 1.0) < 1e-12)
  }

  test("invariant mass of back-to-back massless particles = 2pt") {
    // two massless particles, eta=0, opposite phi: m = 2*pt
    val m = one(invariantMass(
      lit(50.0), lit(0.0), lit(0.0), lit(0.0),
      lit(50.0), lit(0.0), lit(math.Pi), lit(0.0)))
    assert(math.abs(m - 100.0) < 1e-9)
  }

  test("sumTransverse of opposite vectors cancels") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq((30.0, 0.0), (30.0, math.Pi))).toDF("raw")
      .withColumn("jets", transform(col("raw"), j =>
        struct(j.getField("_1").as("pt"), j.getField("_2").as("phi"))))
    val pt = df.select(sumTransverse(col("jets")).getField("pt")).head.getDouble(0)
    assert(pt < 1e-9)
  }

  test("scalarSum (HT)") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq(10.0, 20.0, 30.0)).toDF("pts")
    assert(df.select(scalarSum(col("pts"))).head.getDouble(0) == 60.0)
  }
}
