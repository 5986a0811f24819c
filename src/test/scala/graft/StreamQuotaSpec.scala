package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{QuotaDoc, StreamQuota}

/** The lifetime per-source admission quota (p82): the ValueState counter
  * must persist across micro-batches (a budget filled in batch 1 rejects
  * everything later), rows inside one batch are admitted in doc_id order
  * regardless of arrival order, and admit_seq is the global per-source
  * ordinal.
  */
class StreamQuotaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("quota counter carries across batches; in-batch order is doc_id") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, graft.streaming.TwsSessions.RocksProvider)
    try {
      val s = spark
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = MemoryStream[QuotaDoc]
      val q = StreamQuota.admit(mem.toDS(), cap = 4L).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("stream_quota_spec").start()
      try {
        // arrival order deliberately scrambled: admission must follow
        // doc_id order within the batch
        mem.addData(QuotaDoc("a", 3L), QuotaDoc("a", 1L), QuotaDoc("a", 2L),
          QuotaDoc("b", 10L))
        q.processAllAvailable()
        mem.addData(QuotaDoc("a", 6L), QuotaDoc("a", 4L), QuotaDoc("a", 5L),
          QuotaDoc("b", 12L), QuotaDoc("b", 11L))
        q.processAllAvailable()
        val rows = s.table("stream_quota_spec")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(t => (t._1, t._2)).toSeq
        // a: filled to 4 (docs 1-4, doc 4 admitted in batch 2 at seq 4;
        // 5 and 6 rejected); b: under budget, everything admitted
        assert(rows === Seq(
          ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
          ("b", 10L, 1L), ("b", 11L, 2L), ("b", 12L, 3L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
