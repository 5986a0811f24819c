package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{SessEvent, StateSessions}

/** Pins the parts of the flatMapGroupsWithState sessionizer (p79) the
  * single-batch driver fixture can't exercise: a session CONTINUING
  * across micro-batch boundaries, the inclusive gap boundary (events
  * exactly `gap` apart merge — batch Sessions semantics), closed-session
  * emission on data arrival, and open-session emission via event-time
  * timeout after the watermark passes.
  */
class StateSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions continue across batches; boundary is inclusive; timeout flushes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[SessEvent]
    val out = StateSessions.sessions(
      mem.toDS().withWatermark("ts", "0 seconds"), gapSec = 1800L)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("state_sessions_spec").start()
    try {
      // batch 1: user 1 opens a session (2 events); user 2 one event.
      // The batch max (00:12) sets the watermark BELOW every open
      // session's end+gap, so nothing may flush yet.
      mem.addData(
        SessEvent(1L, ts("2024-01-01 00:00:00"), 1L, is_purchase = false),
        SessEvent(1L, ts("2024-01-01 00:10:00"), 2L, is_purchase = true),
        SessEvent(2L, ts("2024-01-01 00:12:00"), 3L, is_purchase = false))
      q.processAllAvailable()
      // nothing can emit yet: no gap proven, watermark behind every end+gap
      assert(s.table("state_sessions_spec").count() === 0)
      // batch 2: 00:40 is EXACTLY 30 min after 00:10 — merges (inclusive
      // boundary); 03:40 proves the gap — closes session 1 on arrival;
      // the far-future sentinel advances the watermark so the remaining
      // open sessions flush on event-time timeout
      mem.addData(
        SessEvent(1L, ts("2024-01-01 00:40:00"), 4L, is_purchase = false),
        SessEvent(1L, ts("2024-01-01 03:40:00"), 5L, is_purchase = true),
        SessEvent(99L, ts("2100-01-01 00:00:00"), 6L, is_purchase = false))
      q.processAllAvailable()
      val rows = s.table("state_sessions_spec")
        .filter(col("user_id") < 99)
        .select("user_id", "session_seq", "session_start", "session_end",
          "n_events", "n_purchases", "duration_sec")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(t => (t._1, t._2))
      assert(rows.toSeq === Seq(
        (1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:40:00"), 3L, 1L, 2400L),
        (1L, 2L, ts("2024-01-01 03:40:00"), ts("2024-01-01 03:40:00"), 1L, 1L, 0L),
        (2L, 1L, ts("2024-01-01 00:12:00"), ts("2024-01-01 00:12:00"), 1L, 0L, 0L)))
      // the sentinel's own key never times out -> never emitted
      assert(s.table("state_sessions_spec")
        .filter(col("user_id") === 99).count() === 0)
    } finally q.stop()
  }
}
