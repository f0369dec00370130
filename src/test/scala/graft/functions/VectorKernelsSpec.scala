package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the kernel ≡ HOF-chain contract: bit-identical doubles, same
  * null propagation (null element, null array, length mismatch), same
  * empty-array zero. */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("dot kernel is bit-identical to zip_with/aggregate on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorKernels.dotCol($"a", $"b").as("k"),
      hofDot($"a", $"b").as("h"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (k, h) =>
      java.lang.Double.doubleToLongBits(k) == java.lang.Double.doubleToLongBits(h) })
  }

  test("dot kernel mixed float x double matches, empty is 0.0") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(0.5, 0.25)),
      (Array.empty[Float], Array.empty[Double])
    ).toDF("a", "b")
    val out = df.select(
      VectorKernels.dotCol($"a", $"b").as("k"),
      hofDot($"a", $"b").as("h"))
      .as[(Double, Double)].collect()
    assert(out.toSeq === Seq((1.0, 1.0), (0.0, 0.0)))
  }

  test("dot kernel nulls: null array, null element, length mismatch") {
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(1.0f), Some(1.0f)))),
      (None, Some(Seq(Some(1.0f)))),                       // null array
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f)))), // null elem
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f))))        // len mismatch
    ).toDF("a", "b")
    val out = df.select(
      VectorKernels.dotCol($"a", $"b").as("k"),
      hofDot($"a", $"b").as("h"))
      .as[(Option[Double], Option[Double])].collect()
    assert(out.toSeq === Seq(
      (Some(3.0), Some(3.0)), (None, None), (None, None), (None, None)))
  }

  test("l2Const kernel is bit-identical to the dist2 HOF form") {
    val rnd = new scala.util.Random(11)
    val cent = IndexedSeq.fill(16)(rnd.nextDouble())
    val rows = Seq.tabulate(100)(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("id", "v")
    val hof = aggregate(
      zip_with($"v".cast("array<double>"), typedlit(cent), (v, c) => (v - c) * (v - c)),
      lit(0.0), (acc, d) => acc + d)
    val out = df.select(
      VectorKernels.l2ConstCol($"v", cent.toArray).as("k"), hof.as("h"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (k, h) =>
      java.lang.Double.doubleToLongBits(k) == java.lang.Double.doubleToLongBits(h) })
  }

  test("kernels fail analysis with a readable message on wrong input type") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorKernels.dotCol($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("array<float> or array<double>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
