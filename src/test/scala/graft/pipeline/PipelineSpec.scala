package graft.pipeline

import graft.SparkSpec
import graft.core.Route
import graft.functions.Seeds
import graft.lookup.BinnedTable
import graft.hist.Axis
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("Shift.pair builds up/down alias maps") {
    val Seq(up, down) = Shift.pair("jec", "Jet.pt", "MET.pt")
    assert(up.name == "jec_up")
    assert(up.aliases == Map(
      Route("Jet.pt_jec_up") -> Route("Jet.pt"),
      Route("MET.pt_jec_up") -> Route("MET.pt")))
    assert(down.aliases(Route("Jet.pt_jec_down")) == Route("Jet.pt"))
  }

  test("Shift rewrites nominal columns; nominal shift is identity") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10.0, 12.0)).toDF("event", "pt", "pt_jec_up")
    val Seq(up, _) = Shift.pair("jec", "pt")
    assert(up(df).select("pt").head.getDouble(0) == 12.0)
    assert(Shift.Nominal(df).select("pt").head.getDouble(0) == 10.0)
  }

  test("Pipeline stages checkpoint and skip completed work") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-pipe").toString
    val pipe = new Pipeline(spark, root)
    var builds = 0
    def build = { builds += 1; Seq((1L, 2.0)).toDF("event", "x") }
    val out1 = pipe.stage("calib")(build)
    val out2 = pipe.stage("calib")(build) // checkpoint hit: no rebuild
    assert(builds == 1)
    assert(out1.collect().toSeq == out2.collect().toSeq)
    pipe.invalidate("calib")
    pipe.stage("calib")(build)
    assert(builds == 2)
  }

  test("versioned stages invalidate on version change, reuse on match") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-pipe-v").toString
    val pipe = new Pipeline(spark, root)
    var builds = 0
    def build(x: Double) = { builds += 1; Seq((1L, x)).toDF("event", "x") }
    assert(pipe.stage("sel", "v1")(build(2.0)).head.getDouble(1) == 2.0)
    // same version → checkpoint reused
    assert(pipe.stage("sel", "v1")(build(3.0)).head.getDouble(1) == 2.0)
    assert(builds == 1)
    // changed version → stale checkpoint rebuilt, not silently reused
    assert(pipe.stage("sel", "v2")(build(3.0)).head.getDouble(1) == 3.0)
    assert(builds == 2)
    // unversioned stage written before versioning counts as stale too
    pipe.invalidate("sel")
    pipe.stage("sel")(build(4.0))
    assert(pipe.stage("sel", "v3")(build(5.0)).head.getDouble(1) == 5.0)
  }

  test("checked stages reject non-finite outputs and leave no checkpoint behind") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-pipe-f").toString
    val pipe = new Pipeline(spark, root)
    val e = intercept[IllegalArgumentException] {
      pipe.stageChecked("bad", checkFinite = true)(
        Seq((1L, Double.NaN)).toDF("event", "x"))
    }
    assert(e.getMessage.contains("nan=1"))
    // the poisoned checkpoint was invalidated: a clean rebuild succeeds
    val ok = pipe.stageChecked("bad", checkFinite = true)(
      Seq((1L, 2.5)).toDF("event", "x"))
    assert(ok.head.getDouble(1) == 2.5)
  }

  test("stageShifted materializes one checkpoint per shift") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-pipe2").toString
    val pipe = new Pipeline(spark, root)
    val df = Seq((1L, 10.0, 11.0, 9.0)).toDF("event", "w", "w_s_up", "w_s_down")
    val shifts = Shift.Nominal +: Shift.pair("s", "w")
    val outs = pipe.stageShifted("weights", shifts)(sh => sh(df).select("event", "w"))
    assert(outs.keySet == Set("nominal", "s_up", "s_down"))
    assert(outs("s_up").head.getDouble(1) == 11.0)
    assert(outs("s_down").head.getDouble(1) == 9.0)
  }

  test("portable fold matches its SQL mirror and is stable") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).toDF("k").withColumn("ks", col("k").cast("string"))
    val viaCol = df.select(Seeds.fold(5, col("ks")).as("f")).collect().map(_.getInt(0)).toSeq
    val viaSql = df.selectExpr(Seeds.foldSql(5, "ks") + " AS f").collect().map(_.getInt(0)).toSeq
    assert(viaCol == viaSql)
    assert(viaCol.toSet.subsetOf((0 until 5).toSet))
    // all folds populated for 200 keys
    assert(viaCol.distinct.size == 5)
  }

  test("BinnedTable lookups clamp flow and mirror their SQL") {
    val s = spark
    import s.implicits._
    val lut = BinnedTable.Lookup1D(Axis.Regular("pt", 4, 0.0, 40.0),
      IndexedSeq(1.0, 2.0, 3.0, 4.0))
    val df = Seq(-5.0, 5.0, 15.0, 39.9, 40.0, 99.0).toDF("pt")
    val got = df.select(lut(col("pt"))).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 1.0, 2.0, 4.0, 4.0, 4.0)) // clamped at both ends
    val lut2 = BinnedTable.Lookup2D(
      Axis.Regular("x", 2, 0.0, 2.0), Axis.Regular("y", 2, 0.0, 2.0),
      IndexedSeq(IndexedSeq(1.0, 2.0), IndexedSeq(3.0, 4.0)))
    val v = Seq((1.5, 0.5)).toDF("x", "y")
      .select(lut2(col("x"), col("y"))).head.getDouble(0)
    assert(v == 3.0)
  }
}
