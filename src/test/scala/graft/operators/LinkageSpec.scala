package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val lastToken = (t: org.apache.spark.sql.Column) =>
    element_at(split(t, " "), -1)

  test("fuzzyPairs finds in-block matches and enforces the distance cap") {
    val dirty = Seq((1L, "chocolate lacee"), (2L, "navy blu"), (3L, "zzz qqq"))
      .toDF("d_id", "d_name")
    val clean = Seq((10L, "chocolate lacee"), (11L, "navy blue"),
      (12L, "totally-different blu")).toDF("c_id", "c_name")
    val pairs = Linkage.fuzzyPairs(dirty, clean, "d_id", "d_name",
        "c_id", "c_name", lastToken, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // (1,10): exact within block "lacee"; (2,12) shares block "blu" but
    // distance 14 > 2 → dropped; (2,11) different block → never compared
    assert(pairs === Set((1L, 10L, 0)))
  }

  test("blocking bounds recall: a typo inside the block token hides the pair") {
    val dirty = Seq((1L, "red rosee")).toDF("d_id", "d_name") // typo in last token
    val clean = Seq((10L, "red rose")).toDF("c_id", "c_name")
    val n = Linkage.fuzzyPairs(dirty, clean, "d_id", "d_name",
      "c_id", "c_name", lastToken, maxDist = 2).count()
    assert(n === 0) // documented recall boundary — union more block passes
  }

  test("bestFuzzyMatch takes min distance, ties broken by smallest right id") {
    val dirty = Seq((1L, "green apple")).toDF("d_id", "d_name")
    val clean = Seq((20L, "greon apple"), (30L, "green apple"),
      (5L, "greeen apple"), (4L, "grean applf")).toDF("c_id", "c_name")
    // every clean row blocks on "apple"; distances: 20→1, 30→0, 5→1, 4→2
    val best = Linkage.bestFuzzyMatch(dirty, clean, "d_id", "d_name",
        "c_id", "c_name", lastToken, maxDist = 2)
      .as[(Long, Int, Long)].head()
    assert(best === ((1L, 0, 30L)))
    // remove the exact match: two candidates at distance 1 → smaller id wins
    val best2 = Linkage.bestFuzzyMatch(dirty, clean.filter($"c_id" =!= 30L),
        "d_id", "d_name", "c_id", "c_name", lastToken, maxDist = 2)
      .as[(Long, Int, Long)].head()
    assert(best2 === ((1L, 1, 5L)))
  }

  test("verifyParallelism changes the plan, not the result") {
    val dirty = Seq((1L, "green apple"), (2L, "blu lacee"), (3L, "red rose"))
      .toDF("d_id", "d_name")
    val clean = Seq((20L, "greon apple"), (30L, "green apple"),
      (10L, "blue lacee"), (40L, "red rose"), (50L, "rod rose"))
      .toDF("c_id", "c_name")
    val plain = Linkage.fuzzyPairs(dirty, clean, "d_id", "d_name",
      "c_id", "c_name", lastToken, maxDist = 2)
    val spread = Linkage.fuzzyPairs(dirty, clean, "d_id", "d_name",
      "c_id", "c_name", lastToken, maxDist = 2, verifyParallelism = 8)
    assert(plain.collect().toSet === spread.collect().toSet)
    val p = spread.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"catalog side should broadcast under verifyParallelism:\n$p")
    assert(p.contains("hashpartitioning(__lid"),
      s"left side should repartition by id (AQE-coalesce-exempt):\n$p")
  }
}
