package graft.operators

import graft.SparkSpec
import graft.kinematics.Kinematics
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private lazy val fact = {
    val s = spark
    import s.implicits._
    // key 1 is hot: 500 rows; others have 1 each
    ((1 to 500).map(i => (1L, i.toDouble)) ++ Seq((2L, 10.0), (3L, 20.0)))
      .toDF("k", "v")
  }

  test("salted two-stage aggregation equals plain aggregation") {
    val plain = fact.groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val salted = Skew.saltedSum(fact, Seq("k"), saltFrom = Seq("k", "v"), buckets = 8,
      sums = Map("sv" -> sum("v"), "n" -> count(lit(1))))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(plain.sameElements(salted))
  }

  test("salted join equals plain join") {
    val s = spark
    import s.implicits._
    val dim = Seq((1L, "hot"), (2L, "cold"), (4L, "orphan")).toDF("k", "tag")
    val plain = fact.join(dim, "k").groupBy("tag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 4).groupBy("tag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted && salted == Map("hot" -> 500L, "cold" -> 1L))
  }

  test("salt is deterministic and spreads the hot key") {
    val salts = fact.filter(col("k") === 1)
      .select(Skew.salt(8, col("k"), col("v"))).collect().map(_.getInt(0))
    assert(salts.distinct.length > 4) // hot key fans out over buckets
    val again = fact.filter(col("k") === 1)
      .select(Skew.salt(8, col("k"), col("v"))).collect().map(_.getInt(0))
    assert(salts.sameElements(again))
  }

  test("propagateMet shifts MET opposite the jet correction") {
    val s = spark
    import s.implicits._
    val df = Seq((50.0, 0.0)).toDF("met_pt", "met_phi")
    val out = df.select(
      Kinematics.propagateMet(col("met_pt"), col("met_phi"),
        lit(10.0), lit(0.0)).as("met"))
      .select(col("met.pt"), col("met.phi")).head
    assert(math.abs(out.getDouble(0) - 40.0) < 1e-12)
    assert(math.abs(out.getDouble(1)) < 1e-12)
  }
}
