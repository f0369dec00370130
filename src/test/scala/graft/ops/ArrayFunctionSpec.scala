package graft.ops

import graft.SparkSpec
import graft.core.Route
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

class ArrayFunctionSpec extends SparkSpec {

  object ptProducer extends Producer {
    val name = "pt_sum"
    override def uses = Set[Dep]("Jet.pt")
    override def produces = Set[Dep]("ht")
    def apply(df: DataFrame): DataFrame =
      df.withColumn("ht", graft.kinematics.Kinematics.scalarSum(col("Jet.pt")))
  }

  object downstream extends Producer {
    val name = "downstream"
    override def uses = Set[Dep](ptProducer, "event")
    override def produces = Set[Dep]("ht2")
    def apply(df: DataFrame): DataFrame = df.withColumn("ht2", col("ht") * 2)
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq((1L, Seq(10.0, 20.0)), (2L, Seq.empty[Double]))
      .toDF("event", "pts")
      .withColumn("Jet", transform(col("pts"), p => struct(p.as("pt"))))
      .drop("pts")
  }

  test("transitive uses/produces resolution") {
    assert(downstream.usedRoutes == Set(Route("Jet.pt"), Route("event")))
    assert(downstream.producedRoutes == Set(Route("ht2")))
  }

  object tagged extends Producer {
    val name = "tagged"
    override def uses = Set[Dep](
      Dep.R(Route("Jet.pt")),
      Dep.optional("Jet.rawFactor"),
      Dep.ifMc("GenJet.pt"),
      Dep.ifData("lumiMask"),
      Dep.ifTag("boosted")("FatJet.pt"))
    def apply(df: DataFrame): DataFrame = df
  }

  test("tagged columns: optional, IF_MC/IF_DATA, dataset tags") {
    val mc = DatasetCtx(isMc = true)
    val data = DatasetCtx(isMc = false)
    assert(tagged.usedRoutes(mc) == Set(Route("Jet.pt"), Route("GenJet.pt")))
    assert(tagged.usedRoutes(data) == Set(Route("Jet.pt"), Route("lumiMask")))
    assert(tagged.usedRoutes(DatasetCtx(isMc = true, tags = Set("boosted"))) ==
      Set(Route("Jet.pt"), Route("GenJet.pt"), Route("FatJet.pt")))
    // optional routes never appear in the required set...
    assert(tagged.optionalRoutes() == Set(Route("Jet.rawFactor")))
    // ...but join the scan projection when the schema has them
    assert(tagged.readSet(df, data) == Set(Route("Jet.pt"), Route("lumiMask")))
    val withRaw = df.withColumn("Jet",
      transform(col("Jet"), j => struct(j.getField("pt").as("pt"), lit(1.0).as("rawFactor"))))
    assert(tagged.readSet(withRaw, data) ==
      Set(Route("Jet.pt"), Route("lumiMask"), Route("Jet.rawFactor")))
  }

  test("checked apply validates read and write sets") {
    val out = ptProducer.applyChecked(df)
    assert(out.orderBy("event").collect().map(_.getDouble(2)).toSeq == Seq(30.0, 0.0))
    intercept[IllegalArgumentException] { ptProducer.applyChecked(df.drop("Jet")) }
  }

  test("SelectionResult: AND-fold, merge, materialization") {
    val r1 = SelectionResult(steps = Map("a" -> (col("event") > 0)))
    val r2 = SelectionResult(steps = Map("b" -> (col("event") < 2)))
    val merged = r1 + r2
    assert(merged.steps.keySet == Set("a", "b"))
    intercept[IllegalArgumentException] { merged + r2 } // duplicate step
    val out = df.select(merged.columns: _*)
    assert(out.columns.toSeq == Seq("event", "steps"))
    assert(out.filter(col("event").cast("boolean")).count() == 1)
  }

  test("Reducers.default applies event mask and object projection") {
    val sel = SelectionResult(
      steps = Map("nonempty" -> (size(col("Jet")) > 0)),
      objects = Map("Jet" -> Map("GoodJet" -> filter(
        transform(col("Jet"), (j, i) => struct(i.as("i"), (j.getField("pt") > 15).as("ok"))),
        x => x.getField("ok")).getField("i"))))
    val out = Reducers.default(df, sel)
    assert(out.count() == 1)
    assert(out.select(size(col("GoodJet"))).head.getInt(0) == 1)
    assert(out.select(col("GoodJet").getField("pt")(0)).head.getDouble(0) == 20.0)
  }
}
