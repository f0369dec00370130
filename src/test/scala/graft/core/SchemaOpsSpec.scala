package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SchemaOpsSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq((1L, Seq((10.0, 1.0)), (100.0, 0.5)))
      .toDF("event", "jets", "met0")
      .withColumn("Jet", transform(col("jets"), j =>
        struct(j.getField("_1").as("pt"), j.getField("_2").as("eta"))))
      .withColumn("MET", struct(col("met0._1").as("pt"), col("met0._2").as("phi")))
      .drop("jets", "met0")
  }

  test("routes walks nested schema") {
    assert(SchemaOps.routes(df.schema).map(_.toString) ==
      Seq("event", "Jet.pt", "Jet.eta", "MET.pt", "MET.phi"))
  }

  test("withRoute: top-level, struct field, auto-created parent") {
    val a = SchemaOps.withRoute(df, Route("weight"), lit(2.0))
    assert(a.columns.contains("weight"))
    val b = SchemaOps.withRoute(df, Route("MET.significance"), lit(3.0))
    assert(Route("MET.significance").existsIn(b.schema))
    val c = SchemaOps.withRoute(df, Route("New.thing"), lit(1))
    assert(Route("New.thing").existsIn(c.schema))
  }

  test("mapCollection adds per-object fields") {
    val out = SchemaOps.mapCollection(df, "Jet", j =>
      Map("pt_up" -> j.getField("pt") * 1.05))
    assert(Route("Jet.pt_up").existsIn(out.schema))
    assert(out.select(Route("Jet.pt_up[0]").column(out)).head.getDouble(0) == 10.5)
  }

  test("removeRoute prunes empty parents") {
    val out = SchemaOps.removeRoute(df, Route("MET.phi"))
    assert(!Route("MET.phi").existsIn(out.schema))
    assert(Route("MET.pt").existsIn(out.schema))
    // removing the only remaining field drops the struct itself
    val out2 = SchemaOps.removeRoute(out, Route("MET.pt"))
    assert(!out2.columns.contains("MET"))
  }

  test("withAlias inside a collection stays per-object") {
    val out = SchemaOps.withAlias(df, Route("Jet.pt"), Route("Jet.pt_nominal"))
    assert(Route("Jet.pt_nominal").existsIn(out.schema))
    // missing source: Ignore returns unchanged, Error throws
    assert(SchemaOps.withAlias(df, Route("Jet.nope"), Route("Jet.x"),
      missing = SchemaOps.Missing.Ignore).schema == df.schema)
    intercept[IllegalArgumentException] {
      SchemaOps.withAlias(df, Route("Jet.nope"), Route("Jet.x"))
    }
  }

  test("flatten produces nano-style columns") {
    val out = SchemaOps.flatten(df)
    assert(out.columns.toSeq == Seq("event", "Jet_pt", "Jet_eta", "MET_pt", "MET_phi"))
  }

  test("sortFields canonicalizes recursively") {
    val out = SchemaOps.sortFields(df)
    assert(out.columns.toSeq == Seq("Jet", "MET", "event"))
    assert(out.schema("MET").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("phi", "pt"))
  }

  test("routeFilter keep/remove globs") {
    val kept = SchemaOps.routeFilter(df, keep = Seq("Jet.*", "event"))
    assert(SchemaOps.routes(kept.schema).map(_.toString) == Seq("event", "Jet.pt", "Jet.eta"))
    val removed = SchemaOps.routeFilter(df, keep = Nil, remove = Seq("*.phi"))
    assert(!SchemaOps.routes(removed.schema).map(_.toString).contains("MET.phi"))
  }

  test("selectRoutes preserves structure at depth 3+") {
    // a.b.c / a.b.d / a.e — pruning a.b.c must keep c nested under a.b,
    // not flatten it to a field `c` directly under `a`.
    val deep = df.withColumn("a",
      struct(
        struct(lit(1).as("c"), lit(2).as("d")).as("b"),
        lit(3).as("e")))
    val out = SchemaOps.routeFilter(deep, keep = Seq("a.b.c"))
    assert(SchemaOps.routes(out.schema).map(_.toString) == Seq("a.b.c"))
    assert(out.select(col("a.b.c")).head.getInt(0) == 1)
    // depth-3 through an array-of-struct: Jet.sub.x
    val arr = df.withColumn("Jet", transform(col("Jet"), j =>
      struct(j.getField("pt").as("pt"),
        struct(j.getField("eta").as("x"), lit(9.0).as("y")).as("sub"))))
    val out2 = SchemaOps.routeFilter(arr, keep = Seq("Jet.sub.x"))
    assert(SchemaOps.routes(out2.schema).map(_.toString) == Seq("Jet.sub.x"))
    assert(out2.select(element_at(col("Jet"), 1).getField("sub").getField("x"))
      .head.getDouble(0) == 1.0)
  }
}
