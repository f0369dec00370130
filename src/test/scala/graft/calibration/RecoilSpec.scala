package graft.calibration

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lookup.Payload

class RecoilSpec extends SparkSpec {

  test("project/reassemble round-trips MET when the correctors are identity") {
    val s = spark
    import s.implicits._
    import Recoil.Vec
    val df = Seq((30.0, -12.0, 8.0, 4.0, 55.0, 21.0), (-70.0, 33.0, 1.5, -2.5, 10.0, 90.0))
      .toDF("mx", "my", "vx", "vy", "fx", "fy")
    val p = Recoil.project(Vec(col("mx"), col("my")), Vec(col("vx"), col("vy")),
      Vec(col("fx"), col("fy")))
    val back = Recoil.reassemble(p.upara, p.uperp, p,
      Vec(col("vx"), col("vy")), Vec(col("fx"), col("fy")))
    df.select(col("mx"), col("my"), back.x, back.y).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-9)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-9)
    }
  }

  test("quantile map pushes source quantiles onto the target distribution") {
    val s = spark
    import s.implicits._
    val cs = Payload.parse("""{
      "corrections": [
        {"name": "cdf", "inputs": [{"name": "x", "type": "real"}],
         "data": {"nodetype": "linear", "input": "x",
           "xs": [0.0, 10.0], "ys": [0.0, 1.0]}},
        {"name": "inv", "inputs": [{"name": "x", "type": "real"}],
         "data": {"nodetype": "linear", "input": "x",
           "xs": [0.0, 1.0], "ys": [100.0, 300.0]}}
      ]
    }""")
    val qm = QuantileMap(cs("cdf"), cs("inv"))
    // uniform [0,10] → uniform [100,300]: x → 100 + 20x; edges clamp
    val got = Seq(-5.0, 0.0, 2.5, 10.0, 99.0).toDF("x")
      .select(qm(col("x"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(100.0, 100.0, 150.0, 300.0, 300.0))
    assert(qm.sql("v").contains("CASE"))
  }
}
