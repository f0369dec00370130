package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RouteSpec extends SparkSpec {
  import Route._

  test("parse dot format") {
    assert(Route("Jet.pt").steps == Vector(Field("Jet"), Field("pt")))
    assert(Route("MET").steps == Vector(Field("MET")))
  }

  test("parse index routes, python-style") {
    assert(Route("Jet.pt[0]").steps == Vector(Field("Jet"), Field("pt"), Item(0)))
    assert(Route("Jet.pt[-1]").steps == Vector(Field("Jet"), Field("pt"), Item(-1)))
    // reference [:,0] notation accepted
    assert(Route("Jet.pt[:,0]") == Route("Jet.pt[0]"))
  }

  test("round-trip toString and nano format") {
    assert(Route("Jet.pt[0]").toString == "Jet.pt[0]")
    assert(Route("Jet.pt").nanoColumn == "Jet_pt")
  }

  test("brace expansion") {
    assert(Route.expand("Muon.{pt,eta,phi}").map(_.toString) ==
      Seq("Muon.pt", "Muon.eta", "Muon.phi"))
    assert(Route.expandBraces("{a,b}.{x,y}") == Seq("a.x", "a.y", "b.x", "b.y"))
  }

  test("glob matching") {
    assert(Route.globMatches("Jet.*", "Jet.pt"))
    assert(Route.globMatches("*.pt", "Jet.pt"))
    assert(!Route.globMatches("Jet.*", "Muon.pt"))
    assert(Route.globMatches("Jet.{pt,eta}", "Jet.eta"))
    assert(Route.globMatches("run", "run"))
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq((10.0, 1.0), (20.0, -1.0)), 5.0),
      (2L, Seq.empty[(Double, Double)], 7.0))
      .toDF("event", "jets", "met")
      .withColumn("Jet", transform(col("jets"), j =>
        struct(j.getField("_1").as("pt"), j.getField("_2").as("eta"))))
      .drop("jets")
  }

  test("column evaluation over nested arrays") {
    val out = df.select(
      Route("Jet.pt").column(df).as("pts"),
      Route("Jet.pt[0]").columnOrElse(df, lit(-99999.0)).as("lead"),
      Route("Jet.pt[-1]").columnOrElse(df, lit(-99999.0)).as("trail"),
      Route("met").column(df).as("met"))
      .orderBy("lead").collect()
    // event 2: empty jets → sentinel
    assert(out(0).getDouble(1) == -99999.0 && out(0).getDouble(2) == -99999.0)
    assert(out(1).getDouble(1) == 10.0 && out(1).getDouble(2) == 20.0)
  }

  test("existsIn") {
    assert(Route("Jet.pt").existsIn(df.schema))
    assert(Route("Jet.pt[0]").existsIn(df.schema))
    assert(!Route("Jet.mass").existsIn(df.schema))
    assert(!Route("Muon.pt").existsIn(df.schema))
  }
}
