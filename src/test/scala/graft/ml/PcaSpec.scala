package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def vecsDf(rows: Seq[Array[Float]], parts: Int) = {
    val s = spark
    import s.implicits._
    s.sparkContext.parallelize(rows, parts).toDF("v")
  }

  test("top component recovers the dominant direction of anisotropic data") {
    // points along (3, 1, 0, 0) with small off-axis noise — the top
    // eigenvector of X'X must align with the spread direction
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val t = rnd.nextGaussian() * 10
      Array((3 * t + rnd.nextGaussian() * 0.1).toFloat,
        (t + rnd.nextGaussian() * 0.1).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat)
    }
    val comp = Pca.trainTopComponent(vecsDf(rows, 3), col("v"), dim = 4, iterations = 12)
    val c = comp.map(_.doubleValue)
    // max-|component| normalization puts the dominant axis at ±1
    assert(math.abs(c(0)) === 1.0)
    assert(math.abs(c(1) / c(0) - 1.0 / 3.0) < 0.01, s"direction off: ${c.mkString(",")}")
    assert(math.abs(c(2)) < 0.05 && math.abs(c(3)) < 0.05)
  }

  test("training and projection are partitioning-invariant bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 120).map(_ => Array.fill(6)((rnd.nextGaussian()).toFloat))
    val byParts = Seq(1, 3, 7).map { p =>
      val df = vecsDf(rows, p)
      val comp = Pca.trainTopComponent(df, col("v"), dim = 6, iterations = 8)
      val proj = df.select(Pca.project(col("v"), comp).as("s"))
        .collect().map(_.getDouble(0)).sorted.toSeq
      (comp, proj)
    }
    assert(byParts.map(_._1).distinct.size === 1, "component depends on partitioning")
    assert(byParts.map(_._2).distinct.size === 1, "projection depends on partitioning")
  }

  test("component entries are exact scale-9 decimals with |v| <= 1") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 50).map(_ => Array.fill(5)(rnd.nextFloat() - 0.5f))
    val comp = Pca.trainTopComponent(vecsDf(rows, 2), col("v"), dim = 5, iterations = 6)
    comp.foreach { v =>
      assert(v.scale === 9)
      assert(v.abs.compareTo(java.math.BigDecimal.ONE) <= 0)
    }
    assert(comp.exists(_.abs.compareTo(java.math.BigDecimal.ONE) == 0),
      "max-normalization must pin one entry to exactly 1")
  }
}
