package graft.core

import graft.SparkSpec

class UpdateMergeSpec extends SparkSpec {
  import UpdateMerge._

  private def base = {
    val s = spark
    import s.implicits._
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c")).toDF("event", "x", "tag")
  }
  private def diff = {
    val s = spark
    import s.implicits._
    Seq((1L, 100.0, 7.0), (3L, 300.0, 9.0)).toDF("event", "x", "y")
  }

  test("overwrite policy: diff wins, missing rows keep base") {
    val out = merge(base, diff, Seq("event")).orderBy("event").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(100.0, 20.0, 300.0))
    assert(out.map(_.getString(2)).toSeq == Seq("a", "b", "c"))
  }

  test("diff-only columns join in as nullable") {
    val out = merge(base, diff, Seq("event")).orderBy("event").collect()
    assert(out(0).getDouble(3) == 7.0)
    assert(out(1).isNullAt(3))
  }

  test("add policy sums overlap") {
    val out = merge(base, diff, Seq("event"), Map("x" -> Policy.Add))
      .orderBy("event").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(110.0, 20.0, 330.0))
  }

  test("concat policy appends arrays") {
    val s = spark
    import s.implicits._
    val b = Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("event", "ids")
    val d = Seq((1L, Seq(9))).toDF("event", "ids")
    val out = merge(b, d, Seq("event"), Map("ids" -> Policy.Concat))
      .orderBy("event").collect()
    assert(out(0).getSeq[Int](1) == Seq(1, 2, 9))
    assert(out(1).getSeq[Int](1) == Seq(3))
  }

  test("concat policy keeps diff when base is null (and vice versa)") {
    val s = spark
    import s.implicits._
    val b = Seq((1L, Option.empty[Seq[Int]]), (2L, Some(Seq(3)))).toDF("event", "ids")
    val d = Seq((1L, Seq(9)), (2L, null.asInstanceOf[Seq[Int]])).toDF("event", "ids")
    val out = merge(b, d, Seq("event"), Map("ids" -> Policy.Concat))
      .orderBy("event").collect()
    assert(out(0).getSeq[Int](1) == Seq(9))  // null base ++ diff = diff
    assert(out(1).getSeq[Int](1) == Seq(3))  // base ++ null diff = base
  }

  test("upsertRows: update, insert, delete, and partial-column updates") {
    val s = spark
    import s.implicits._
    val b = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    // update k=1 (v only — name untouched), delete k=2, insert k=9
    val u = Seq(
      (1L, Option.empty[String], Some(11.0), false),
      (2L, Option.empty[String], Option.empty[Double], true),
      (9L, Some("new"), Some(90.0), false)
    ).toDF("k", "name", "v", "del")
    val out = UpdateMerge.upsertRows(b, u, Seq("k"), deleteCol = Some("del"))
      .orderBy("k")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, Some("a"), Some(11.0)),  // updated v, kept name
      (3L, Some("c"), Some(30.0)),  // untouched
      (9L, Some("new"), Some(90.0)) // inserted
    ))
  }

  test("bucketedCheckpoint joins are exchange-free (the shuffle-free merge claim)") {
    val s = spark
    import s.implicits._
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val base = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      val diff = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("k", "w")
      UpdateMerge.bucketedCheckpoint(base, "bt_base", Seq("k"), buckets = 8)
      UpdateMerge.bucketedCheckpoint(diff, "bt_diff", Seq("k"), buckets = 8)
      val j = s.table("bt_base").join(s.table("bt_diff"), "k")
      assert(j.count() === 1000)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join should not shuffle either side:\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS bt_base")
      s.sql("DROP TABLE IF EXISTS bt_diff")
    }
  }

  test("upsertRows without delete column keeps all rows") {
    val s = spark
    import s.implicits._
    val b = Seq((1L, 10.0)).toDF("k", "v")
    val u = Seq((1L, 11.0), (2L, 22.0)).toDF("k", "v")
    val out = UpdateMerge.upsertRows(b, u, Seq("k"))
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 11.0), (2L, 22.0)))
  }

  test("upsertRows fails fast if base carries a data column named like deleteCol") {
    val s = spark
    import s.implicits._
    val b = Seq((1L, 10.0, false)).toDF("k", "v", "del")
    val u = Seq((1L, 11.0, false)).toDF("k", "v", "del")
    val e = intercept[IllegalArgumentException](
      UpdateMerge.upsertRows(b, u, Seq("k"), deleteCol = Some("del")))
    assert(e.getMessage.contains("'del'"))
  }

  test("cdcCompact: last writer wins, tombstones drop keys, nullable payload survives") {
    val s = spark
    import s.implicits._
    val log = Seq[(Long, Long, String, java.lang.Double)](
      (1L, 10L, "U", 1.0), (1L, 12L, "U", 2.0), (1L, 11L, "U", 9.0), // out of order
      (2L, 20L, "U", 5.0), (2L, 21L, "D", null), // deleted
      (3L, 30L, "D", null), (3L, 31L, "U", 7.0), // delete then re-insert
      (4L, 40L, "U", null)) // latest payload is null
      .toDF("k", "ver", "op", "v")
    val out = UpdateMerge.cdcCompact(log, Seq("k"), "ver", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 12L, Some(2.0), 3L),
      (3L, 31L, Some(7.0), 2L),
      (4L, 40L, None, 1L)))
  }

  test("cdcCompact is repartition-stable") {
    val s = spark
    import s.implicits._
    val log = (1 to 500).map(i => ((i % 50).toLong, i.toLong,
      if (i % 17 == 0) "D" else "U", i * 1.5)).toDF("k", "ver", "op", "v")
    val a = UpdateMerge.cdcCompact(log, Seq("k"), "ver", "op")
      .orderBy("k").collect().toSeq
    val b = UpdateMerge.cdcCompact(log.repartition(7), Seq("k"), "ver", "op")
      .orderBy("k").collect().toSeq
    assert(a === b)
  }
}
