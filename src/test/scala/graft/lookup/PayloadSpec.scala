package graft.lookup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.hist.Axis

class PayloadSpec extends SparkSpec {

  val fixture = """
  {
    "schema_version": 2,
    "corrections": [
      {
        "name": "jet_sf",
        "version": 1,
        "inputs": [
          {"name": "pt", "type": "real"},
          {"name": "syst", "type": "string"}
        ],
        "data": {
          "nodetype": "category",
          "input": "syst",
          "content": [
            {"key": "nom", "value": {
              "nodetype": "binning",
              "input": "pt",
              "edges": [0.0, 10.0, 50.0, 100.0],
              "content": [1.1, 1.0, 0.9],
              "flow": "clamp"
            }},
            {"key": "up", "value": 1.2}
          ],
          "default": 1.0
        }
      },
      {
        "name": "veto",
        "version": 1,
        "inputs": [
          {"name": "x", "type": "real"},
          {"name": "y", "type": "real"}
        ],
        "data": {
          "nodetype": "multibinning",
          "inputs": ["x", "y"],
          "edges": [[0.0, 1.0, 2.0], [0.0, 1.0, 2.0]],
          "content": [1.0, 2.0, 3.0, 4.0],
          "flow": -1.0
        }
      },
      {
        "name": "smooth",
        "version": 2,
        "inputs": [{"name": "rho", "type": "real"}],
        "data": {
          "nodetype": "linear",
          "input": "rho",
          "xs": [0.0, 10.0, 50.0],
          "ys": [1.0, 0.8, 0.5]
        }
      },
      {
        "name": "by_id",
        "version": 1,
        "inputs": [{"name": "pdg", "type": "int"}],
        "data": {
          "nodetype": "category",
          "input": "pdg",
          "content": [
            {"key": 11, "value": 0.5},
            {"key": 13, "value": 0.7}
          ],
          "default": {"nodetype": "binning", "input": "pdg",
            "edges": [0.0, 100.0], "content": [0.0], "flow": "clamp"}
        }
      },
      {
        "name": "strict",
        "version": 1,
        "inputs": [{"name": "pt", "type": "real"}],
        "data": {
          "nodetype": "binning",
          "input": "pt",
          "edges": [0.0, 10.0],
          "content": [2.0],
          "flow": "error"
        }
      }
    ]
  }"""

  lazy val cs = Payload.parse(fixture)

  test("parses the correction set with names, versions, and input declarations") {
    assert(cs.schemaVersion == 2)
    assert(cs.corrections.keySet == Set("jet_sf", "veto", "smooth", "by_id", "strict"))
    assert(cs("smooth").version == 2)
    assert(cs("jet_sf").inputs.map(_.name) == Seq("pt", "syst"))
    val e = intercept[NoSuchElementException](cs("nope"))
    assert(e.getMessage.contains("available"))
  }

  test("binning-under-category evaluates like a hand-built Lookup1D") {
    val s = spark
    import s.implicits._
    val df = Seq((-5.0, "nom"), (5.0, "nom"), (20.0, "nom"), (99.0, "nom"),
      (100.0, "nom"), (500.0, "nom"), (5.0, "up"), (5.0, "other")).toDF("pt", "syst")
    val lut = BinnedTable.Lookup1D(Axis.Variable("pt", Seq(0.0, 10.0, 50.0, 100.0)),
      IndexedSeq(1.1, 1.0, 0.9))
    val out = df.select(
      cs("jet_sf")("pt" -> col("pt"), "syst" -> col("syst")).as("loaded"),
      when(col("syst") === "nom", lut(col("pt")))
        .when(col("syst") === "up", 1.2).otherwise(1.0).as("direct"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // clamp: below-range takes the first bin, at/above last edge the last
    assert(out(0).getDouble(0) == 1.1 && out(4).getDouble(0) == 0.9 && out(5).getDouble(0) == 0.9)
    // category default
    assert(out(7).getDouble(0) == 1.0)
  }

  test("multibinning flattens row-major and applies constant flow") {
    val s = spark
    import s.implicits._
    val df = Seq((0.5, 0.5), (0.5, 1.5), (1.5, 0.5), (1.5, 1.5), (5.0, 0.5)).toDF("x", "y")
    val got = df.select(cs("veto")("x" -> col("x"), "y" -> col("y"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0, 4.0, -1.0))
  }

  test("linear node equals Interp1D including edge clamping") {
    val s = spark
    import s.implicits._
    val df = Seq(-1.0, 0.0, 5.0, 30.0, 50.0, 99.0).toDF("rho")
    val interp = BinnedTable.Interp1D(IndexedSeq(0.0, 10.0, 50.0), IndexedSeq(1.0, 0.8, 0.5))
    val out = df.select(cs("smooth")("rho" -> col("rho")).as("a"),
      interp(col("rho")).as("b")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("integer category keys cast and fall through to the declared default") {
    val s = spark
    import s.implicits._
    val df = Seq(11, 13, 99).toDF("pdg")
    val got = df.select(cs("by_id")("pdg" -> col("pdg"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.5, 0.7, 0.0))
  }

  test("error flow yields NULL out of range instead of raising") {
    val s = spark
    import s.implicits._
    val df = Seq(5.0, 15.0).toDF("pt")
    val got = df.select(cs("strict")("pt" -> col("pt"))).collect()
    assert(got(0).getDouble(0) == 2.0)
    assert(got(1).isNullAt(0))
  }

  test("missing inputs and unsupported nodes fail loudly") {
    val e = intercept[IllegalArgumentException](cs("jet_sf")("pt" -> lit(1.0)))
    assert(e.getMessage.contains("syst"))
    val e2 = intercept[IllegalArgumentException](Payload.parse(
      """{"corrections": [{"name": "f", "inputs": [],
         "data": {"nodetype": "formula", "expression": "[0]*x"}}]}"""))
    assert(e2.getMessage.contains("formula"))
  }

  test("truncated payloads fail at parse time, not as silent NULL lookups") {
    val e = intercept[IllegalArgumentException](Payload.parse(
      """{"corrections": [{"name": "t", "inputs": [],
         "data": {"nodetype": "binning", "input": "x",
           "edges": [0.0, 10.0, 20.0, 30.0], "content": [1.1, 1.0], "flow": "clamp"}}]}"""))
    assert(e.getMessage.contains("3 bins but 2 content"))
    val e2 = intercept[IllegalArgumentException](Payload.parse(
      """{"corrections": [{"name": "t", "inputs": [],
         "data": {"nodetype": "multibinning", "inputs": ["x", "y"],
           "edges": [[0.0, 1.0, 2.0], [0.0, 1.0, 2.0]],
           "content": [1.0, 2.0, 3.0], "flow": "clamp"}}]}"""))
    assert(e2.getMessage.contains("4 cells but 3 content"))
    val e3 = intercept[IllegalArgumentException](Payload.parse(
      """{"corrections": [{"name": "t", "inputs": [],
         "data": {"nodetype": "multibinning", "inputs": ["x"],
           "edges": [[0.0, 1.0], [0.0, 1.0]], "content": [1.0], "flow": "clamp"}}]}"""))
    assert(e3.getMessage.contains("1 inputs but 2 edge lists"))
  }

  test("sql mirror renders for every node type") {
    // DuckDB parity is exercised end-to-end by q54/q66's oracles; here we
    // assert the renderer covers the tree and embeds the input expressions
    val s1 = cs("jet_sf").sql("pt" -> "l_pt", "syst" -> "l_syst")
    assert(s1.contains("l_pt") && s1.contains("l_syst") && s1.contains("CASE"))
    val s2 = cs("veto").sql("x" -> "a", "y" -> "b")
    // value literals are DOUBLE-pinned through a QUOTED varchar cast
    // (BinnedTable.dLit) — bare decimals would run exact decimal
    // arithmetic oracle-side and flip round ties, and the unquoted
    // CAST(v AS DOUBLE) form double-rounds 17-digit payload values
    assert(s2.contains(
      "[CAST('1.0' AS DOUBLE), CAST('2.0' AS DOUBLE), CAST('3.0' AS DOUBLE), CAST('4.0' AS DOUBLE)]"))
    val s3 = cs("smooth").sql("rho" -> "r")
    assert(s3.contains("CASE WHEN"))
  }

  test("loadFile round-trips through a payload file") {
    val f = java.nio.file.Files.createTempFile("payload", ".json")
    java.nio.file.Files.writeString(f, fixture)
    try assert(Payload.loadFile(f.toString).corrections.keySet == cs.corrections.keySet)
    finally java.nio.file.Files.delete(f)
  }
}
