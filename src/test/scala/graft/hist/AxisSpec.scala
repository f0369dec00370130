package graft.hist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AxisSpecSuite extends SparkSpec {

  private def binOf(ax: Axis, v: Any): Any = {
    val s = spark
    import s.implicits._
    val df = v match {
      case d: Double => Seq(d).toDF("v")
      case i: Int => Seq(i).toDF("v")
      case b: Boolean => Seq(b).toDF("v")
      case str: String => Seq(str).toDF("v")
      case null => Seq[Option[Double]](None).toDF("v")
    }
    val r = df.select(ax.binId(col("v"))).head
    if (r.isNullAt(0)) null else r.getInt(0)
  }

  test("regular axis: flow, in-range, last-edge-inclusive") {
    val ax = Axis.Regular("x", 10, 0.0, 100.0)
    assert(binOf(ax, -0.1) == -1)        // underflow
    assert(binOf(ax, 0.0) == 0)
    assert(binOf(ax, 55.0) == 5)
    assert(binOf(ax, 100.0) == 9)        // last edge inclusive
    assert(binOf(ax, 100.1) == 10)       // overflow
    assert(binOf(ax, null) == null)
  }

  test("regular axis: non-representable width never spills into overflow") {
    // w = 0.7/7 = 0.09999999999999999; v just below hi would floor to n
    // without the clamp, colliding with the overflow bin.
    val ax = Axis.Regular("x", 7, 0.0, 0.7)
    assert(binOf(ax, 0.6999999999999999) == 6)
    assert(binOf(ax, 0.7) == 6)          // last edge inclusive
    assert(binOf(ax, 0.7000000000000001) == 7)
  }

  test("variable axis honors irregular edges") {
    val ax = Axis.Variable("x", Seq(0.0, 1.0, 10.0, 100.0))
    assert(binOf(ax, 0.5) == 0)
    assert(binOf(ax, 5.0) == 1)
    assert(binOf(ax, 99.0) == 2)
    assert(binOf(ax, 100.0) == 2)        // last edge inclusive
    assert(binOf(ax, 1000.0) == 3)
    assert(binOf(ax, -5.0) == -1)
  }

  test("integer axis") {
    val ax = Axis.Integer("n", 0, 5)
    assert(binOf(ax, 0) == 0)
    assert(binOf(ax, 5) == 5)
    assert(binOf(ax, 6) == 6)            // overflow
    assert(binOf(ax, -1) == -1)
  }

  test("bool and categorical axes") {
    assert(binOf(Axis.Bool("b"), true) == 1)
    assert(binOf(Axis.Bool("b"), false) == 0)
    val sc = Axis.StrCat("c", Seq("x", "y"))
    assert(binOf(sc, "y") == 1)
    assert(binOf(sc, "zzz") == 2)        // unknown → overflow bin
    val ic = Axis.IntCat("c", Seq(5L, 7L))
    assert(binOf(ic, 7) == 1)
  }

  test("binIdSql mirrors binId for regular axis") {
    val s = spark
    import s.implicits._
    val ax = Axis.Regular("x", 4, 0.0, 8.0)
    val vals = Seq(-1.0, 0.0, 3.9, 7.9, 8.0, 9.0)
    val df = vals.toDF("v")
    val viaCol = df.select(ax.binId(col("v"))).collect().map(_.getInt(0)).toSeq
    val viaSql = df.selectExpr(ax.binIdSql("v")).collect().map(_.getInt(0)).toSeq
    assert(viaCol == viaSql)
  }
}
