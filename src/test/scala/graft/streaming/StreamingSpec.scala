package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def t(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def runStream(evs: Seq[Ev], build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String = "append"): Seq[org.apache.spark.sql.Row] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = build(input.toDF())
      .writeStream.format("memory").queryName("out").outputMode(mode).start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // advance watermark far enough to close windows/sessions
      input.addData(Ev(99999L, t(10000), 0L, "tick", 0.0))
      q.processAllAvailable()
      s.table("out").collect().toSeq
    } finally q.stop()
  }

  test("windowed rollup counts and sums per (window, type)") {
    val evs = Seq(
      Ev(1, t(5), 1, "click", 1.5), Ev(2, t(20), 2, "click", 2.5),
      Ev(3, t(70), 1, "view", 4.0))
    val rows = runStream(evs, df => EventStream.windowedRollup(df))
      .filter(_.getAs[String]("event_type") != "tick")
    val byType = rows.map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(byType("click") == (2L, 4.0)) // both clicks in hour-0 window
    assert(byType("view") == (1L, 4.0))
  }

  test("sliding rollup: each event lands in len/slide overlapping windows") {
    // 1h window sliding 30m: an event belongs to exactly 2 windows
    val evs = Seq(Ev(1, t(40), 1, "click", 3.0))
    val rows = runStream(evs,
        df => EventStream.windowedRollup(df, slide = Some("30 minutes")))
      .filter(_.getAs[String]("event_type") == "click")
    assert(rows.size == 2, s"expected 2 overlapping windows: $rows")
    assert(rows.forall(r =>
      r.getAs[Long]("n_events") == 1L && r.getAs[Double]("sum_value") == 3.0))
  }

  test("session windows close on gap and aggregate per user") {
    val evs = Seq(
      Ev(1, t(0), 7, "click", 1.0), Ev(2, t(10), 7, "click", 1.0), // session 1
      Ev(3, t(60), 7, "click", 1.0),                               // gap > 30m → session 2
      Ev(4, t(0), 8, "view", 2.0))
    val rows = runStream(evs, df => EventStream.sessionizedActivity(df))
      .filter(_.getAs[Long]("user_id") != 0L)
    val u7 = rows.filter(_.getAs[Long]("user_id") == 7L)
    assert(u7.size == 2, s"expected 2 sessions for user 7: $rows")
    assert(u7.map(_.getAs[Long]("n_events")).sorted == Seq(1L, 2L))
    assert(rows.count(_.getAs[Long]("user_id") == 8L) == 1)
  }

  test("streaming hist fill fragments re-merge to the batch histogram") {
    import graft.hist.{Axis, HistTable}
    val ax = Axis.Regular("value", 4, 0.0, 8.0)
    val evs = Seq(
      Ev(1, t(5), 1, "click", 1.0), Ev(2, t(20), 1, "click", 1.5), // bin 0
      Ev(3, t(70), 1, "click", 5.0),                               // bin 2, next window
      Ev(4, t(75), 1, "click", 99.0))                              // overflow bin
    // no pre-watermark filter: the runStream tick must reach the watermark
    // node to close the real windows; its own window stays open and is
    // never emitted, so it drops out of the append-mode result naturally
    val frags = runStream(evs,
      df => EventStream.histFill(df, Seq(ax -> col("value")), weight = col("value")))
    // windowed fragments collapse to the one-pass batch fill via merge
    val s = spark
    import s.implicits._
    val merged = HistTable.merge(Seq(frags.map(r =>
      (r.getAs[Int]("value_bin"), r.getAs[Double]("sumw"),
        r.getAs[Double]("sumw2"), r.getAs[Long]("n")))
      .toDF("value_bin", "sumw", "sumw2", "n")))
    val batch = HistTable.fill(evs.toDF(), Seq(ax -> col("value")),
      weight = col("value"))
    val a = merged.orderBy("value_bin").collect().map(_.toSeq)
    val b = batch.orderBy("value_bin").collect().map(_.toSeq)
    assert(a.sameElements(b), s"streaming ${a.toSeq} != batch ${b.toSeq}")
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    val evs = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(1, t(1), 1, "click", 1.0), // replay
      Ev(2, t(2), 1, "view", 2.0))
    val rows = runStream(evs, df => EventStream.dedup(df))
      .filter(_.getAs[Long]("event_id") != 99999L)
    assert(rows.map(_.getAs[Long]("event_id")).sorted == Seq(1L, 2L))
  }

  test("streaming document curation matches its batch twin, even under replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = (1L to 40L).map(i => Doc(i,
      // long enough to clear the quality threshold for even ids
      if (i % 2 == 0) ("spark scan table " * 40).trim else "tiny",
      s"src${(i % 3).toInt}"))
    val rates = Map("src0" -> 1.0, "src1" -> 0.5) // src2 dropped
    val input = MemoryStream[Doc]
    val q = EventStream.curatedDocs(input.toDF(), rates)
      .writeStream.format("memory").queryName("cur").outputMode("append").start()
    try {
      input.addData(docs.take(25))
      q.processAllAvailable()
      input.addData(docs.drop(25))
      input.addData(docs.take(5)) // replayed micro-batch
      q.processAllAvailable()
      val streamed = s.table("cur").select("doc_id").collect().map(_.getLong(0)).toSeq
      val batch = EventStream.curatedDocs(docs.toDF(), rates)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      // replay re-emits the same decisions — the distinct sets agree
      assert(streamed.toSet == batch.toSet)
      assert(batch.nonEmpty && batch.forall(_ % 2 == 0)) // quality gate held
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension per micro-batch") {
    val s = spark
    import s.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val evs = Seq(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 3, "view", 2.0))
    val rows = runStream(evs, df => EventStream.enrich(df, dim, Seq("user_id")))
      .filter(_.getAs[Long]("event_id") != 99999L)
    val tiers = rows.map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
    assert(tiers === Map(1L -> "gold", 2L -> null)) // left join keeps unmatched
  }

  test("stream-stream band join matches its batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = EventStream.bandJoinStream(
      purchases.toDF().select($"event_id".as("pid"), $"user_id", $"ts"),
      clicks.toDF().select($"event_id".as("cid"), $"user_id", $"ts".as("cts")),
      key = "user_id", leftTs = "ts", rightTs = "cts")
      .writeStream.format("memory").queryName("bj").outputMode("append").start()
    try {
      clicks.addData(Ev(10, t(30), 1, "click", 1.0), Ev(11, t(100), 1, "click", 1.0),
        Ev(12, t(40), 2, "click", 1.0))
      purchases.addData(Ev(1, t(60), 1, "purchase", 5.0), Ev(2, t(45), 2, "purchase", 2.0))
      q.processAllAvailable()
      val pairs = s.table("bj").select("pid", "cid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // purchase 1 @60: click 10 @30 in (0,60) window ✓; click 11 @100 is after ✗
      // purchase 2 @45: click 12 @40 ✓
      assert(pairs === Set((1L, 10L), (2L, 12L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals accumulate across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.runningUserStats(input.toDF())
      .writeStream.format("memory").queryName("rus").outputMode("update").start()
    try {
      input.addData(Ev(1, t(0), 1, "click", 10.25), Ev(2, t(1), 1, "click", 5.00),
        Ev(3, t(2), 2, "view", 1.10))
      q.processAllAvailable()
      val afterB1 = s.table("rus").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(afterB1 === Set((1L, 2L, 1525L), (2L, 1L, 110L)))
      input.addData(Ev(4, t(3), 1, "click", 0.75))
      q.processAllAvailable()
      val all = s.table("rus").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // state carried: user 1's second update starts from (2, 1525)
      assert(all.contains((1L, 3L, 1600L)))
      assert(all.contains((2L, 1L, 110L)))
    } finally q.stop()
  }

  test("runningUserStatsTws: transformWithState twin carries state across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val q = EventStream.runningUserStatsTws(input.toDF())
      .writeStream.format("memory").queryName("rustws").outputMode("update").start()
    try {
      input.addData(Ev(1, t(0), 1, "click", 10.25), Ev(2, t(1), 1, "click", 5.00),
        Ev(3, t(2), 2, "view", 1.10))
      q.processAllAvailable()
      input.addData(Ev(4, t(3), 1, "click", 0.75))
      q.processAllAvailable()
      val all = s.table("rustws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // identical to the flatMapGroupsWithState twin on the same feed:
      // user 1's second update starts from the carried (2, 1525)
      assert(all.contains((1L, 3L, 1600L)))
      assert(all.contains((2L, 1L, 110L)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("epochParquetSink: replaying an epoch rewrites, never duplicates") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch-sink").toString
    val sink = EventStream.epochParquetSink(dir) _
    sink((1 to 5).toDF("v"), 0L)
    sink((6 to 8).toDF("v"), 1L)
    // restart-replay of epoch 1 (at-least-once window): same data again
    sink((6 to 8).toDF("v"), 1L)
    val out = s.read.parquet(dir).select("v").as[Int].collect().sorted
    assert(out.toSeq === (1 to 8).toSeq) // exactly-once despite the replay
  }

  test("windowedTopK: the custom aggregate merges incrementally ≡ batch top-k") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.windowedTopK(input.toDF(), k = 3)
      .writeStream.format("memory").queryName("wtk").outputMode("update").start()
    try {
      // one hour-0 window fed across two micro-batches: the second batch's
      // partial buffer must MERGE into the stored state, not replace it
      input.addData(Ev(1, t(5), 1, "buy", 10.0), Ev(2, t(10), 2, "buy", 50.0),
        Ev(3, t(15), 3, "buy", 20.0))
      q.processAllAvailable()
      input.addData(Ev(4, t(20), 4, "buy", 40.0), Ev(5, t(25), 5, "buy", 5.0))
      q.processAllAvailable()
      val last = s.table("wtk").collect().last
      val streamed = last.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top")
        .map(r => (r.getAs[Double]("key"), r.getAs[Long]("id")))
      val batch = Seq((1L, 10.0), (2L, 50.0), (3L, 20.0), (4L, 40.0), (5L, 5.0))
        .toDF("event_id", "value")
        .agg(graft.functions.TopK.topK(col("value"), col("event_id"), 3).as("top"))
        .select(explode(col("top")).as("t")).select("t.key", "t.id")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      assert(streamed === batch) // (50,2), (40,4), (20,3)
    } finally q.stop()
  }

  test("windowedDistinctSketch: incremental KMV across batches equals the batch sketch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.windowedDistinctSketch(input.toDF(), k = 16)
      .writeStream.format("memory").queryName("wds").outputMode("update").start()
    try {
      // 30 users over two micro-batches, same hour-0 window
      input.addData((1L to 20L).map(u => Ev(u, t(5), u, "click", 1.0)))
      q.processAllAvailable()
      input.addData((11L to 30L).map(u => Ev(100 + u, t(30), u, "click", 1.0)))
      q.processAllAvailable()
      // every event lands in the same clock-aligned hour window; update
      // mode re-emits it per batch and the LAST emission has merged state
      val rows = s.table("wds").collect()
      assert(rows.map(_.getAs[java.sql.Timestamp]("win_start")).distinct.length === 1)
      val streamed = rows.last.getAs[scala.collection.Seq[Long]]("kmv").toSeq
      val batch = (1L to 30L).map(u => Tuple1(u)).toDF("user_id")
        .agg(graft.operators.Sketches.kmvSketch(col("user_id"), 16).as("kmv"))
        .select("kmv").as[Seq[Long]].head()
      assert(streamed === batch)
      // 30 distinct > k=16 → an estimate, not an exact count — sanity band
      val est = rows.last.getAs[Double]("est_distinct")
      assert(est > 15.0 && est < 80.0)
    } finally q.stop()
  }

  test("runningUserStats survives null user/value rows (dropped, not a crash)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[NullableEv]
    val q = EventStream.runningUserStats(input.toDF())
      .writeStream.format("memory").queryName("rusnull").outputMode("update").start()
    try {
      // the corpus has nullable `value`: a null here used to kill the query
      // with "Null value appeared in non-nullable field" at the tuple cast
      input.addData(NullableEv(Some(1L), Some(2.50)), NullableEv(Some(1L), None),
        NullableEv(None, Some(9.99)))
      q.processAllAvailable()
      val rows = s.table("rusnull").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((1L, 1L, 250L)))
    } finally q.stop()
  }
}

case class NullableEv(user_id: Option[Long], value: Option[Double])

case class Doc(doc_id: Long, text: String, source: String)
