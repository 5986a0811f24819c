package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r7 item 6: the streaming watermark-flush sentinel must
  * round-trip to exactly 2100-01-01T00:00:00Z under EVERY events.ts
  * layout, through the same path the stream uses — written by
  * `sentinelFrame`, read back with the file's pinned raw schema, then
  * normalized. A sentinel that silently nulls out (e.g. a TimestampType
  * write read under an NTZ-pinned schema) would defeat the watermark
  * flush and truncate the append-mode streaming results.
  */
class SentinelLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sentinelInstant = java.time.Instant.parse("2100-01-01T00:00:00Z")

  /** Build a one-row events.parquet fixture dir whose ts is produced by `mkTs`. */
  private def fixtureDir(mkTs: java.time.Instant => Any): String = {
    import spark.implicits._
    val inst = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel")
    val row = (1L, mkTs(inst), 7L, "view", 1.5d, "{}")
    val df = mkTs(inst) match {
      case _: Long => Seq(row.asInstanceOf[(Long, Long, Long, String, Double, String)])
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      case _: java.time.LocalDateTime => Seq(row.asInstanceOf[(Long, java.time.LocalDateTime, Long, String, Double, String)])
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      case _ => Seq(row.asInstanceOf[(Long, java.sql.Timestamp, Long, String, Double, String)])
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  /** sentinelFrame → parquet → pinned-raw-schema read → normalize → instant. */
  private def sentinelRoundTrip(d: String): java.sql.Timestamp = {
    val raw = Tables.eventsRawSchemaPinNanosConf(spark, d)
    val out = java.nio.file.Files.createTempDirectory("graft_sentinel_out").toString
    graft.queries.PipelineQueries.sentinelFrame(spark, d, Seq((-1L, -1L, "sentinel")))
      .coalesce(1).write.mode("overwrite").parquet(out)
    val back = Tables.normalizeEventTs(spark.read.schema(raw).parquet(out))
    val rows = back.select(col("ts")).collect()
    assert(rows.length === 1)
    val ts = rows.head.getTimestamp(0)
    assert(ts != null, "sentinel ts read back NULL — layout mismatch between " +
      "sentinel write and the pinned stream schema")
    ts
  }

  test("sentinel round-trips under the nanos-long layout") {
    val d = fixtureDir(i => i.getEpochSecond * 1000000000L)
    assert(sentinelRoundTrip(d) === java.sql.Timestamp.from(sentinelInstant))
  }

  test("sentinel round-trips under the micros-NTZ layout") {
    val d = fixtureDir(i =>
      java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
    assert(sentinelRoundTrip(d) === java.sql.Timestamp.from(sentinelInstant))
  }

  test("sentinel round-trips under the micros-UTC layout") {
    val d = fixtureDir(i => java.sql.Timestamp.from(i))
    assert(sentinelRoundTrip(d) === java.sql.Timestamp.from(sentinelInstant))
  }

  test("sentinel round-trips against the CURRENT driver testdata layout") {
    assert(sentinelRoundTrip("/root/testdata/sf0.001") ===
      java.sql.Timestamp.from(sentinelInstant))
  }

  test("non-ts column drift fails loudly instead of nulling the sentinel") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel_drift")
    Seq((1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")),
        7L, "view", "not-a-double", "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.queries.PipelineQueries.sentinelFrame(spark, dir.toString,
        Seq((-1L, -1L, "sentinel")))
    }
    assert(e.getMessage.contains("layout drift"))
  }
}
