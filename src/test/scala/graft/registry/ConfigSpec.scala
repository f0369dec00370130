package graft.registry

import graft.SparkSpec
import graft.hist.Axis
import org.apache.spark.sql.functions._

class ConfigSpec extends SparkSpec {

  private val cfg = AnalysisConfig(
    datasets = Seq(
      Dataset("data_mu", Seq("/none"), isMc = false),
      Dataset("tt_inclusive", Seq("/none"), tags = Set("boosted"), processes = Seq(11, 12))),
    processRoot = Process(1, "tt", xsec = 830.0, children = Seq(
      Process(11, "tt_sl", 358.0), Process(12, "tt_dl", 86.0))),
    categoryRoot = Category(0, "all", children = Seq(
      Category(1, "low", "v < 10"),
      Category(2, "high", "v >= 10", children = Seq(
        Category(21, "high_pos", "v >= 10 and sgn > 0"),
        Category(22, "high_neg", "v >= 10 and sgn < 0"))))),
    variables = Seq(
      Variable("v2", "v * 2", Axis.Regular("v2", 10, 0, 100), nullValue = Some(-99999.0))))

  test("process DAG: leaves, lookup, stitching bridge") {
    assert(cfg.processRoot.leaves.map(_.name) == Seq("tt_sl", "tt_dl"))
    assert(cfg.processIdOf("tt_dl") == 12L)
    val tree = cfg.processRoot.stitchingTree
    assert(tree.leaves.map(_.id) == Seq("tt_sl", "tt_dl"))
  }

  test("category DAG matches selectCategories' shape; leaf ids") {
    assert(cfg.categoryDag == Map(0L -> Seq(1L, 2L), 2L -> Seq(21L, 22L)))
    assert(cfg.leafCategories.map(_.id) == Seq(1L, 21L, 22L))
  }

  test("categoryIds evaluates leaf selections into a ragged id list") {
    val s = spark
    import s.implicits._
    val df = Seq((5.0, 1), (15.0, 1), (15.0, -1)).toDF("v", "sgn")
    val ids = df.select(cfg.categoryIds.as("ids")).collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
    assert(ids == Seq(Seq(1L), Seq(21L), Seq(22L)))
  }

  test("variable: expression column, null fallback, binning") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(7.0), None).toDF("v")
    val out = df.select(
      cfg.variable("v2").column.as("val"),
      cfg.variable("v2").binId.as("bin")).collect()
    assert(out(0).getDouble(0) == 14.0 && out(0).getInt(1) == 1)
    assert(out(1).getDouble(0) == -99999.0 && out(1).getInt(1) == -1)
  }

  test("dataset context feeds conditional column resolution") {
    assert(!cfg.dataset("data_mu").ctx.isMc)
    assert(cfg.dataset("tt_inclusive").ctx.tags("boosted"))
    intercept[RuntimeException] { cfg.dataset("nope") }
  }
}
