package graft.hist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlotUtilSpec extends SparkSpec {

  private val ax = Axis.Regular("x", 4, 0.0, 8.0) // width 2 per bin

  private lazy val hist = {
    val s = spark
    import s.implicits._
    // (proc_bin, x_bin, sumw, sumw2, n)
    Seq(
      (1L, 0, 10.0, 4.0, 5L), (1L, 1, 6.0, 2.0, 3L),
      (2L, 0, 8.0, 3.0, 4L), (2L, 3, 2.0, 1.0, 1L),
      (2L, -1, 1.0, 1.0, 1L)) // underflow
      .toDF("proc_bin", "x_bin", "sumw", "sumw2", "n")
  }

  test("scaleProcesses scales sumw linearly, sumw2 quadratically") {
    val out = PlotUtil.scaleProcesses(hist, "proc", Map(1L -> 2.0))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out((1L, 0)) == (20.0, 16.0))
    assert(out((2L, 0)) == (8.0, 3.0)) // unlisted passes through
  }

  test("regroup re-sums under the new id") {
    val out = PlotUtil.regroup(hist, "proc", Map(1L -> 9L, 2L -> 9L))
    val byBin = out.collect().map(r => r.getAs[Int]("x_bin") -> r.getAs[Double]("sumw")).toMap
    assert(out.select("proc_bin").distinct().collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(byBin(0) == 18.0)
  }

  test("density divides by bin width; flow bins untouched") {
    val out = PlotUtil.density(hist, ax)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 0)) == 5.0)   // 10 / width 2
    assert(out((2L, -1)) == 1.0)  // underflow: width 1
  }

  test("blind drops bins whose center is in the window, keeps flow") {
    // centers: 1, 3, 5, 7; blind [2.5, 3.5] removes bin 1 only
    val out = PlotUtil.blind(hist, ax, 2.5, 3.5)
    val bins = out.collect().map(_.getAs[Int]("x_bin")).toSet
    assert(bins == Set(0, 3, -1))
  }

  test("poisson interval brackets the count, normal quantile is accurate") {
    assert(math.abs(PlotUtil.normalQuantile(0.975) - 1.959963985) < 1e-6)
    val out = PlotUtil.poissonInterval(hist.filter(col("n") === 5))
      .select("pois_lo", "pois_hi").head
    // Garwood exact for n=5, 68.27% CL: lo ≈ 2.840, hi ≈ 8.383
    assert(math.abs(out.getDouble(0) - 2.840) < 0.1)
    assert(math.abs(out.getDouble(1) - 8.383) < 0.1)
  }
}
