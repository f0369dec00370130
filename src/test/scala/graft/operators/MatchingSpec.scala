package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkSpec {

  private def run(as: Seq[Double], bs: Seq[Double], maxM: Double): Seq[(Int, Int, Double)] = {
    val s = spark
    import s.implicits._
    val df = Seq((as, bs)).toDF("as", "bs")
      .withColumn("A", transform(col("as"), v => struct(v.as("v"))))
      .withColumn("B", transform(col("bs"), v => struct(v.as("v"))))
    val pairs = Matching.candidatePairs(col("A"), col("B"),
      (a, b) => abs(a.getField("v") - b.getField("v")))
    df.select(Matching.greedyMatch(pairs, maxM).as("m"))
      .select(explode(col("m")).as("p"))
      .select("p.i", "p.j", "p.m")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
  }

  test("greedy takes globally best pair first, with removal") {
    // a0=10 is closest to b1=11 (d=1); a1=12 would prefer b1 too (d=1? no:
    // |12-11|=1 — tie broken by i asc → a0 wins b1; a1 falls back to b0=20 (d=8)
    val out = run(Seq(10.0, 12.0), Seq(20.0, 11.0), maxM = 100.0)
    assert(out == Seq((0, 1, 1.0), (1, 0, 8.0)))
  }

  test("maxMetric excludes far pairs; unmatched objects drop out") {
    val out = run(Seq(10.0, 500.0), Seq(11.0), maxM = 5.0)
    assert(out == Seq((0, 0, 1.0)))
  }

  test("each endpoint matched at most once") {
    val out = run(Seq(10.0, 11.0, 12.0), Seq(10.2), maxM = 5.0)
    assert(out.size == 1 && out.head._1 == 0)
  }

  test("empty collections yield no matches") {
    assert(run(Seq.empty, Seq(1.0), 5.0).isEmpty)
    assert(run(Seq(1.0), Seq.empty, 5.0).isEmpty)
  }
}
