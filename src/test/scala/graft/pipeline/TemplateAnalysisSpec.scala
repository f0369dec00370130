package graft.pipeline

import graft.SparkSpec
import graft.hist.{Axis, HistTable}
import graft.ops._
import graft.queries.Nested
import graft.registry._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §7.3's minimum end-to-end slice as an integration test over the
  * real sf0.001 testdata: config → Selector (event steps + object masks) →
  * Reducer → normalization Producer (stats → stitching solve → broadcast
  * LUT) → histogram fill with category ids → category-DAG selection →
  * yields, with stages materialized through the checkpointing Pipeline.
  * Every piece is the library's own: this pins that the layers compose,
  * not just that each works alone. */
class TemplateAnalysisSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val cfg = AnalysisConfig(
    datasets = Seq(Dataset("orders_incl", Seq(s"$dir/orders.parquet"))),
    processRoot = Process(0, "all", children = Seq(
      Process(1, "urgent"), Process(2, "other"))),
    categoryRoot = Category(0, "all", children = Seq(
      Category(1, "low_value", "o_totalprice <= 150000"),
      Category(2, "high_value", "o_totalprice > 150000"))),
    variables = Seq(
      Variable("lead_price", "items[0].l_extendedprice",
        Axis.Regular("lead_price", 10, 0.0, 100000.0), nullValue = Some(-99999.0))))

  private object goodItems extends Selector {
    val name = "good_items"
    override def uses = Set[Dep]("items.l_quantity", "o_totalprice")
    def select(df: DataFrame): SelectionResult = SelectionResult(
      steps = Map(
        "has_good" -> exists(col("items"), _.getField("l_quantity") >= 25),
        "valued" -> (col("o_totalprice") > 20000)),
      objects = Map("items" -> Map("GoodItem" ->
        filter(
          transform(col("items"), (it, i) =>
            struct(i.as("i"), (it.getField("l_quantity") >= 25).as("ok"))),
          _.getField("ok")).getField("i"))))
  }

  test("select → reduce → weight → fill → categories compose end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val pipe = new Pipeline(spark, tmp)

    val events = Nested.nestedOrders(spark, dir, Seq("l_quantity", "l_extendedprice"))

    // --- selection stage (checkpointed masks, reference two-phase design)
    val selected = pipe.stage("select") {
      val r = goodItems.select(events)
      events.select(col("o_orderkey") +: r.columns: _*)
    }
    val reduced = pipe.stage("reduce") {
      val withSel = events.join(selected, "o_orderkey")
      Reducers.default(
        withSel,
        SelectionResult(
          steps = Map("event" -> col("event").cast("boolean")),
          objects = Map("items" -> Map("GoodItem" -> col("objects.items.GoodItem")))))
    }

    // the reducer kept exactly the rows passing both steps
    val expected = events.filter(
      exists(col("items"), _.getField("l_quantity") >= 25) &&
        col("o_totalprice") > 20000)
    assert(reduced.count() == expected.count() && reduced.count() > 0)
    // every projected GoodItem satisfies the object mask
    assert(reduced.filter(
      exists(col("GoodItem"), _.getField("l_quantity") < 25)).count() == 0)

    // --- normalization producer: stats → stitching → literal LUT
    val leafOf: Column =
      when(col("o_orderpriority") === "1-URGENT", "urgent").otherwise("other")
    val stats = reduced.groupBy(leafOf.as("leaf"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("sumw"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    val br = graft.stats.Stitching.branchingRatios(cfg.processRoot.stitchingTree, stats)
    assert(math.abs(br.values.sum - 1.0) < 1e-12)
    val wLut = map(br.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(1000.0 * v)) }: _*)
    val weighted = reduced.withColumn("weight", element_at(wLut, leafOf))

    // --- histogram fill: variable from config + category ids from config
    val v = cfg.variable("lead_price")
    val hist = HistTable.fill(
      weighted.withColumn("cat", explode(cfg.categoryIds)),
      Seq(v.axis -> v.column, Axis.Integer("cat", 0, 10) -> col("cat")),
      weight = col("weight"))

    // leaf bins re-sum to the parent through the category DAG
    val parent = HistTable.selectCategories(hist, "cat", Seq(0L), cfg.categoryDag)
    val parentSum = parent.agg(sum("sumw")).head.getDouble(0)
    val leafSum = hist.agg(sum("sumw")).head.getDouble(0)
    assert(math.abs(parentSum - leafSum) < 1e-6)

    // the fill conserves the total weight of contributing rows (every
    // event lands in exactly one category and one price bin incl. flow);
    // compare at the fill's own decimal scale (Compat.money = scale 4)
    val totalW = weighted.agg(sum(col("weight").cast("decimal(18,4)")).cast("double"))
      .head.getDouble(0)
    assert(math.abs(leafSum - totalW) < 1e-6)

    // --- re-running the pipeline skips completed checkpoints
    var rebuilt = false
    val again = pipe.stage("select") { rebuilt = true; events }
    assert(!rebuilt && again.columns.contains("event"))
  }

  test("payload file → loaded chain → versioned calibration stage invalidates on payload change") {
    import graft.calibration.JecChain
    import graft.core.SchemaOps
    import graft.lookup.Payload

    val tmp = java.nio.file.Files.createTempDirectory("graft-e2e-cal")
    val pipe = new Pipeline(spark, s"$tmp/stages")
    val events = Nested.nestedOrders(spark, dir, Seq("l_extendedprice", "l_discount"))
      .filter(size(col("items")) > 0)

    def payloadJson(l1: Double) = s"""{
      "corrections": [
        {"name": "L1", "version": 1,
         "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 1000000.0], "content": [$l1], "flow": "clamp"}}
      ]
    }"""
    val payloadFile = tmp.resolve("jec.json")

    // the production flow: payload FILE → loader → chain → checkpointed
    // calibration stage, versioned by the payload content
    def calibrate(version: String): org.apache.spark.sql.DataFrame =
      pipe.stage("calib", version) {
        val chain = JecChain(levels = Seq(Payload.loadFile(payloadFile.toString)("L1")))
        SchemaOps.mapCollection(events, "items", it => {
          val r = chain(chain.undoRaw(it.getField("l_extendedprice"), it.getField("l_discount")))
          Map("pt_jec" -> r.pt, "pt_raw" -> r.ptRaw)
        })
      }

    java.nio.file.Files.writeString(payloadFile, payloadJson(1.1))
    val v1 = calibrate("payload-v1")
    val first = v1.select(explode(col("items")).as("it"))
      .select(col("it.pt_raw"), col("it.pt_jec")).head
    assert(math.abs(first.getDouble(1) - first.getDouble(0) * 1.1) < 1e-6)

    // same version → checkpoint reused even though the file changed
    java.nio.file.Files.writeString(payloadFile, payloadJson(2.0))
    val v1again = calibrate("payload-v1")
    val again = v1again.select(explode(col("items")).as("it"))
      .select(col("it.pt_raw"), col("it.pt_jec")).head
    assert(math.abs(again.getDouble(1) - again.getDouble(0) * 1.1) < 1e-6)

    // bumped version → stale checkpoint rebuilt against the new payload
    val v2 = calibrate("payload-v2")
    val second = v2.select(explode(col("items")).as("it"))
      .select(col("it.pt_raw"), col("it.pt_jec")).head
    assert(math.abs(second.getDouble(1) - second.getDouble(0) * 2.0) < 1e-6)
  }
}
