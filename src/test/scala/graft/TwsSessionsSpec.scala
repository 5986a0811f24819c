package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{SessEvent, TwsSessions}

/** The transformWithState sessionizer (p81) under the same fixture as
  * StateSessionsSpec — cross-batch continuation, inclusive gap boundary,
  * close-on-arrival, and timer-driven flush — plus the TWS-specific
  * invariant: extending a session REPLACES its timer (delete+register),
  * so the stale earlier expiry must NOT close a session the extension
  * kept alive.
  */
class TwsSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def withRocks[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, TwsSessions.RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("tws sessions: cross-batch merge, inclusive boundary, timer flush, " +
      "stale-timer replacement") {
    withRocks {
      val s = spark
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = MemoryStream[SessEvent]
      val out = TwsSessions.sessions(
        mem.toDS().withWatermark("ts", "0 seconds"), gapSec = 1800L)
      val q = out.toDF().writeStream.outputMode("append").format("memory")
        .queryName("tws_sessions_spec").start()
      try {
        mem.addData(
          SessEvent(1L, ts("2024-01-01 00:00:00"), 1L, is_purchase = false),
          SessEvent(1L, ts("2024-01-01 00:10:00"), 2L, is_purchase = true),
          SessEvent(2L, ts("2024-01-01 00:12:00"), 3L, is_purchase = false))
        q.processAllAvailable()
        assert(s.table("tws_sessions_spec").count() === 0)
        // user 1's 00:40 event is EXACTLY gap after 00:10 (merge) and
        // registers a LATER timer; the original 00:10+gap timer was
        // deleted, or this batch's watermark advance would mis-close the
        // extended session. 03:40 then closes it on arrival; the
        // sentinel flushes the remaining opens by timer.
        mem.addData(
          SessEvent(1L, ts("2024-01-01 00:40:00"), 4L, is_purchase = false),
          SessEvent(1L, ts("2024-01-01 03:40:00"), 5L, is_purchase = true),
          SessEvent(99L, ts("2100-01-01 00:00:00"), 6L, is_purchase = false))
        q.processAllAvailable()
        val rows = s.table("tws_sessions_spec")
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
        assert(s.table("tws_sessions_spec")
          .filter(col("user_id") === 99).count() === 0)
      } finally q.stop()
    }
  }

  test("tws sessions equal the flatMapGroupsWithState sessions on testdata") {
    withRocks {
      val s = spark
      import s.implicits._
      val ev = Tables.events(s, "/root/testdata/sf0.001")
        .filter(col("user_id") % 7 === 0)
        .select(col("user_id"), col("ts"), col("event_id"),
          (col("event_type") === "purchase").as("is_purchase"))
        .as[SessEvent].collect().toSeq
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      def run(f: org.apache.spark.sql.Dataset[SessEvent] =>
          org.apache.spark.sql.Dataset[graft.streaming.SessionOut],
          name: String): Set[(Long, Long, Long, Long, Long)] = {
        val mem = MemoryStream[SessEvent]
        val q = f(mem.toDS().withWatermark("ts", "0 seconds")).toDF()
          .writeStream.outputMode("append").format("memory")
          .queryName(name).start()
        try {
          mem.addData(ev: _*)
          mem.addData(SessEvent(-1L, ts("2100-01-01 00:00:00"), -1L,
            is_purchase = false))
          q.processAllAvailable()
        } finally q.stop()
        s.table(name).filter(col("user_id") >= 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
            r.getLong(5), r.getLong(6))).toSet
      }
      val tws = run(graft.streaming.TwsSessions.sessions(_, 1800L), "tws_eq_a")
      val fmgws = run(graft.streaming.StateSessions.sessions(_, 1800L),
        "tws_eq_b")
      assert(tws.nonEmpty && tws === fmgws)
    }
  }
}
