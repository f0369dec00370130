package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TemporalJoin vs brute-force formulations on data small enough to
  * theta-join: the bucketed/windowed plans must reproduce the naive
  * semantics exactly (the point of the operator is plan shape, not
  * different answers). */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, id) — deliberate equal-timestamp tie at (1, 50) and a
  // key with no right rows at all.
  private lazy val left = Seq(
    (1L, 50L, 100L), (1L, 80L, 101L), (1L, 10L, 102L),
    (2L, 60L, 103L), (3L, 30L, 104L)
  ).toDF("k", "t", "lid")
  private lazy val right = Seq(
    (1L, 50L, 200L), (1L, 40L, 201L), (1L, 70L, 202L),
    (2L, 5L, 203L), (2L, 61L, 204L)
  ).toDF("k", "rt", "rid")

  test("asOfJoin matches brute-force argmax, ties matching equal timestamps") {
    val got = TemporalJoin
      .asOfJoin(left, right, Seq("k"), "t", "rt", Seq("rid", "rt"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // brute force: latest right with rt <= t per key
    val want = left.as[(Long, Long, Long)].collect().map { case (k, t, lid) =>
      val cands = right.as[(Long, Long, Long)].collect()
        .filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got === want)
    assert(got(100L) === Some(200L)) // the equal-timestamp tie matches
    assert(got(104L) === None)       // key 3 has no right rows
  }

  test("asOfJoin tolerance nulls matches farther back than the bound") {
    val got = TemporalJoin
      .asOfJoin(left, right, Seq("k"), "t", "rt", Seq("rid"), tolerance = Some(10L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L) === Some(200L)) // gap 0 <= 10
    assert(got(101L) === Some(202L)) // gap 10 <= 10 (inclusive)
    assert(got(102L) === None)       // no prior at all
    assert(got(103L) === None)       // nearest prior is 55 back
  }

  test("bandPairs equals the filtered cross join (keyed)") {
    val got = TemporalJoin
      .bandPairs(left, right, Seq("k"), "t", "rt", Seq("rid"), -30L, 0L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.crossJoin(right.withColumnRenamed("k", "rk"))
      .filter($"k" === $"rk" && $"rt" >= $"t" - 30 && $"rt" < $"t")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("bandPairs with no keys blocks on time buckets alone") {
    val got = TemporalJoin
      .bandPairs(left, right, Seq.empty, "t", "rt", Seq("rid"), 0L, 25L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.crossJoin(right)
      .filter($"rt" >= $"t" && $"rt" < $"t" + 25)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("randomized instance: asOfJoin and bandPairs match brute force") {
    val rnd = new scala.util.Random(42)
    val L = Seq.tabulate(300)(i => (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong - 100, i.toLong))
    // right times unique per key so the as-of payload is deterministic
    val R0 = Seq.tabulate(300)(i => (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong - 100, 1000L + i))
    val R = R0.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
    val l = L.toDF("k", "t", "lid")
    val r = R.toDF("k", "rt", "rid")

    val gotAsOf = TemporalJoin.asOfJoin(l, r, Seq("k"), "t", "rt", Seq("rid"), tolerance = Some(37L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val wantAsOf = L.map { case (k, t, lid) =>
      val c = R.filter(x => x._1 == k && x._2 <= t && t - x._2 <= 37L)
      lid -> (if (c.isEmpty) None else Some(c.maxBy(x => (x._2, x._3))._3))
    }.toMap
    assert(gotAsOf === wantAsOf)
    assert(wantAsOf.values.exists(_.isDefined) && wantAsOf.values.exists(_.isEmpty))

    val gotBand = TemporalJoin.bandPairs(l, r, Seq("k"), "t", "rt", Seq("rid"), -23L, 41L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val wantBand = (for {
      (k, t, lid) <- L; (rk, rt, rid) <- R
      if rk == k && rt >= t - 23 && rt < t + 41
    } yield (lid, rid)).toSet
    assert(gotBand === wantBand)
    assert(wantBand.size > 100) // the instance actually exercises the band
  }

  test("bandPairs handles negative times (floor, not truncate, bucketing)") {
    val l = Seq((1L, -10L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, -12L, 9L), (1L, -35L, 8L), (1L, 3L, 7L)).toDF("k", "rt", "rid")
    val got = TemporalJoin
      .bandPairs(l, r, Seq("k"), "t", "rt", Seq("rid"), -20L, 0L)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(9L))
  }

  test("forwardAsOfJoin rejects payload names colliding with the left schema") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 20L, 5L)).toDF("k", "rt", "rid")
    val e = intercept[IllegalArgumentException](
      TemporalJoin.forwardAsOfJoin(l, r, Seq("k"), "t", "rt", Seq("k", "rid")))
    assert(e.getMessage.contains("'k'"))
  }

  test("forwardAsOfJoin fuzz-matches a sequential reference") {
    val rnd = new scala.util.Random(43)
    val left = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val right = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, k * 10000 + t) }
    val tol = 50L
    val expect = left.map { case (k, t, lid) =>
      val cand = right.filter(r => r._1 == k && r._2 >= t && r._2 - t <= tol)
      lid -> (if (cand.isEmpty) None else Some(cand.minBy(_._2)._3))
    }.toMap
    val got = TemporalJoin.forwardAsOfJoin(
        left.toDF("k", "t", "lid"), right.toDF("k", "rt", "rid"),
        Seq("k"), "t", "rt", Seq("rid"), tolerance = Some(tol))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got === expect)
  }

  test("forwardAsOfJoin: earliest at-or-after within tolerance, else null") {
    val l = Seq((1L, 10L, 100L), (1L, 50L, 101L), (2L, 10L, 102L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 9L, 8L), (1L, 10L, 9L), (1L, 30L, 7L), (2L, 200L, 6L))
      .toDF("k", "rt", "rid")
    val got = TemporalJoin
      .forwardAsOfJoin(l, r, Seq("k"), "t", "rt", Seq("rid"),
        tolerance = Some(25L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // lid 100: rt=10 ties forward (equality matches), beats rt=30
    // lid 101: no right in [50, 75] → null; lid 102: 200 beyond tolerance
    assert(got === Map(100L -> Some(9L), 101L -> None, 102L -> None))
  }

  test("intervalOverlapPairs equals the theta join on random intervals, any cell width") {
    val rnd = new scala.util.Random(0x17E4)
    def intervals(n: Int, idBase: Long) = (0 until n).map { i =>
      val s = rnd.nextInt(200).toLong
      (rnd.nextInt(3).toLong + 1, s, s + 1 + rnd.nextInt(40), idBase + i)
    }
    val ls = intervals(40, 1000)
    val rs = intervals(40, 2000)
    val l = ls.toDF("k", "s", "e", "lid")
    val r = rs.toDF("k", "s", "e", "rid")
    val want = (for {
      (lk, lsv, lev, lid) <- ls
      (rk, rsv, rev, rid) <- rs
      if lk == rk && lsv < rev && rsv < lev
    } yield (lid, rid, math.max(lsv, rsv), math.min(lev, rev))).sorted
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = TemporalJoin.intervalOverlapPairs(
          l, r, Seq("k"), "s", "e", "s", "e", Seq("rid"), cellWidth = w)
        .select("lid", "rid", "overlap_start", "overlap_end")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got === want, s"cellWidth $w")
    }
  }

  test("intervalOverlapPairs boundary semantics: touching intervals do not overlap") {
    val l = Seq((1L, 0L, 10L, 1L), (1L, 20L, 30L, 2L)).toDF("k", "s", "e", "lid")
    val r = Seq((1L, 10L, 20L, 9L), (1L, 29L, 40L, 8L)).toDF("k", "s", "e", "rid")
    val got = TemporalJoin.intervalOverlapPairs(
        l, r, Seq("k"), "s", "e", "s", "e", Seq("rid"), cellWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // [0,10) vs [10,20): touch, no overlap; [20,30) vs [29,40): overlap
    assert(got === Set((2L, 8L)))
  }

  test("intervalOverlapPairs fail-fasts when an interval spans too many cells") {
    val l = Seq((1L, 0L, 1000000L, 1L)).toDF("k", "s", "e", "lid")
    val r = Seq((1L, 5L, 6L, 9L)).toDF("k", "s", "e", "rid")
    val ex = intercept[Exception] {
      TemporalJoin.intervalOverlapPairs(
        l, r, Seq("k"), "s", "e", "s", "e", Seq("rid"),
        cellWidth = 10L, maxCellsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("raise cellWidth"))
  }
}
