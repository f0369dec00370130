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

  test("streaming dedup drops replayed event ids within the watermark") {
    val evs = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(1, t(1), 1, "click", 1.0), // replay
      Ev(2, t(2), 1, "view", 2.0))
    val rows = runStream(evs, df => EventStream.dedup(df))
      .filter(_.getAs[Long]("event_id") != 99999L)
    assert(rows.map(_.getAs[Long]("event_id")).sorted == Seq(1L, 2L))
  }
}
