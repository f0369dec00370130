package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistorySpec extends SparkSpec {
  import spark.implicits._

  test("scd2 chains validity intervals per key with one open current row") {
    val changes = Seq(
      (1L, 101L, "bronze", 10L),
      (1L, 102L, "silver", 20L),
      (1L, 103L, "gold", 30L),
      (2L, 201L, "bronze", 15L)
    ).toDF("user_id", "event_id", "tier", "t")
    val out = History.scd2(changes, Seq("user_id"), "t", "event_id")
      .orderBy("user_id", "eff_from")
      .select("user_id", "tier", "eff_from", "eff_to", "is_current")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4))).toSeq === Seq(
      (1L, "bronze", 10L, 20L, 0),
      (1L, "silver", 20L, 30L, 0),
      (1L, "gold", 30L, -1L, 1),
      (2L, "bronze", 15L, -1L, 1)))
  }

  test("equal order keys break ties on the tieBreak column deterministically") {
    val changes = Seq((1L, 5L, "a", 10L), (1L, 4L, "b", 10L))
      .toDF("user_id", "event_id", "v", "t")
    val cur = History.scd2(changes, Seq("user_id"), "t", "event_id")
      .filter(col("is_current") === 1).select("v").as[String].head()
    assert(cur === "a") // event_id 5 sorts last → current
  }
}
