package graft.calibration

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lookup.Payload

class JecChainSpec extends SparkSpec {

  val cs = Payload.parse("""{
    "corrections": [
      {"name": "L1", "inputs": [{"name": "JetPt", "type": "real"}],
       "data": {"nodetype": "binning", "input": "JetPt",
         "edges": [0.0, 100.0, 200.0], "content": [2.0, 0.5], "flow": "clamp"}},
      {"name": "L2", "inputs": [{"name": "JetPt", "type": "real"}],
       "data": {"nodetype": "binning", "input": "JetPt",
         "edges": [0.0, 150.0, 400.0], "content": [10.0, 100.0], "flow": "clamp"}},
      {"name": "unc", "inputs": [{"name": "JetPt", "type": "real"}],
       "data": {"nodetype": "binning", "input": "JetPt",
         "edges": [0.0, 100.0, 200.0], "content": [0.1, 0.2], "flow": "clamp"}}
    ]
  }""")

  test("level 2 evaluates at the level-1-corrected momentum, not the raw one") {
    val s = spark
    import s.implicits._
    val chain = JecChain(levels = Seq(cs("L1"), cs("L2")))
    // pt_raw = 90: L1 bin [0,100) → ×2 → pt1 = 180, so L2 must read the
    // [150,400) bin (×100) NOT the [0,150) bin it would see at pt_raw=90
    val df = Seq(90.0).toDF("pt_raw")
    val r = chain(col("pt_raw"))
    val row = df.select(r.pt, r.fullCorrection, r.rawFactor).head
    assert(row.getDouble(0) == 90.0 * 2.0 * 100.0)
    assert(row.getDouble(1) == 200.0)
    // re-derived raw factor: 1 - pt_raw/pt
    assert(row.getDouble(2) == 1.0 - 90.0 / 18000.0)
  }

  test("undoRaw recovers the raw momentum and sources shift around the corrected pt") {
    val s = spark
    import s.implicits._
    val chain = JecChain(levels = Seq(cs("L1")), uncSources = Seq("unc" -> cs("unc")))
    val df = Seq((250.0, 0.2)).toDF("pt", "rawFactor") // pt_raw = 200
    val r = chain(chain.undoRaw(col("pt"), col("rawFactor")))
    val row = df.select(r.ptRaw, r.pt, r.shifts.head._2, r.shifts(1)._2).head
    assert(row.getDouble(0) == 200.0)
    assert(row.getDouble(1) == 100.0)     // 200 clamps into [100,200) → ×0.5
    // uncertainty evaluates at pt_raw (200 → u=0.2), shifts scale pt
    assert(row.getDouble(2) == 100.0 * 1.2)
    assert(row.getDouble(3) == 100.0 * 0.8)
    assert(chain(col("pt")).shifts.map(_._1) == Seq("unc_up", "unc_down"))
  }

  test("sql mirror chains the same shape (level-2 input embeds level-1)") {
    val chain = JecChain(levels = Seq(cs("L1"), cs("L2")), uncSources = Seq("unc" -> cs("unc")),
      roundDigits = 6)
    val r = chain.sql("pt0")
    assert(r.ptRaw == "(pt0)")
    // level 2's CASE must test the level-1-corrected expression, so the
    // rendered chain contains the L1 lookup nested inside the L2 lookup
    assert(r.pt.contains("ROUND"))
    assert(r.shifts.map(_._1) == Seq("unc_up", "unc_down"))
    assert(r.shifts.head._2.contains("1.0 + "))
    // default = no factor rounding (the cross-engine-safe mode)
    assert(!JecChain(levels = Seq(cs("L1"))).sql("pt0").pt.contains("ROUND"))
  }
}
