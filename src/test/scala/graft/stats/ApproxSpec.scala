package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("percentile_approx rank error is within 1/accuracy of exact") {
    val n = 20000
    val df = (1 to n).map(_.toDouble).toDF("v") // exact percentiles known
    val ps = Seq(0.1, 0.5, 0.99)
    val acc = 1000
    val got = Approx.percentiles(df, "v", ps, acc)
      .as[Seq[Double]].head()
    for ((p, g) <- ps.zip(got)) {
      val rankErr = math.abs(g - p * n) / n
      assert(rankErr <= 1.0 / acc + 1e-9, s"p=$p got=$g rankErr=$rankErr")
    }
  }

  test("HLL: sharded sketch union estimates equal the single-pass sketch") {
    val df = (1 to 30000).map(i => (i % 3, s"user${i % 7000}")).toDF("g", "u")
    // single pass
    val direct = Approx.mergeSketches(
      Approx.distinctSketch(df, Seq("g"), col("u")), Seq("g"))
      .as[(Int, Long)].collect().toMap
    // two shards, sketched independently, then merged — register-wise max
    // is order-independent, so estimates must be identical, not just close
    val shard1 = Approx.distinctSketch(df.filter($"u".substr(5, 1) < "4"), Seq("g"), col("u"))
    val shard2 = Approx.distinctSketch(df.filter($"u".substr(5, 1) >= "4"), Seq("g"), col("u"))
    val merged = Approx.mergeSketches(shard1.unionByName(shard2), Seq("g"))
      .as[(Int, Long)].collect().toMap
    assert(merged === direct)
    // and the estimate is actually close to truth (~1.6% rel err at lgK=12)
    val exact = df.groupBy("g").agg(countDistinct("u").as("d"))
      .as[(Int, Long)].collect().toMap
    for ((g, e) <- exact)
      assert(math.abs(direct(g).toDouble - e) / e < 0.05, s"g=$g ${direct(g)} vs $e")
  }
}
