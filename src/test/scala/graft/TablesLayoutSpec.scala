package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-shift tripwire (VERDICT r7 item 2): the driver's `events.ts`
  * physical layout has changed three times (INT64 TIMESTAMP(NANOS) →
  * read as nanos-long; TIMESTAMP(MICROS, isAdjustedToUTC=false) → read
  * as TIMESTAMP_NTZ; TIMESTAMP(MICROS, UTC) → read as TIMESTAMP).
  * Write a tiny fixture in each shipped layout, round-trip through
  * parquet, and assert `Tables.normalizeEventTs` yields the IDENTICAL
  * TimestampType instant for all three. A fourth layout must throw one
  * descriptive error instead of 16 scattered analysis errors.
  *
  * Caveat: Spark cannot WRITE parquet TIMESTAMP(NANOS); under the
  * nanosAsLong conf the read side surfaces that layout as a plain
  * LongType column, so the nanos fixture writes a raw BIGINT of nanos —
  * byte-identical to what `normalizeEventTs` sees from real NANOS files.
  */
class TablesLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // one instant, sub-millisecond precision to catch truncation bugs
  private val inst = java.time.Instant.parse("2024-03-15T12:34:56.789012Z")
  private val micros = inst.getEpochSecond * 1000000L + 789012L

  private def roundTrip(write: org.apache.spark.sql.DataFrame): java.sql.Timestamp = {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    write.coalesce(1).write.mode("overwrite").parquet(dir)
    val norm = Tables.normalizeEventTs(spark.read.parquet(dir))
    assert(norm.schema("ts").dataType === TimestampType)
    norm.select(col("ts")).collect().head.getTimestamp(0)
  }

  test("all three shipped ts layouts normalize to the same instant") {
    import spark.implicits._
    // layout 1: nanos as INT64 (what nanosAsLong surfaces for TIMESTAMP(NANOS))
    val nanos = roundTrip(Seq(micros * 1000L + 999L).toDF("ts")) // +999ns must truncate
    // layout 2: TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ
    val ntz = roundTrip(Seq(
      java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)).toDF("ts"))
    // layout 3: TIMESTAMP(MICROS, UTC) → TimestampType
    val utc = roundTrip(Seq(java.sql.Timestamp.from(inst)).toDF("ts"))

    val expected = java.sql.Timestamp.from(inst)
    assert(nanos === expected)
    assert(ntz === expected)
    assert(utc === expected)
  }

  test("a fourth layout fails loudly with a descriptive error") {
    import spark.implicits._
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(Seq("2024-01-01").toDF("ts"))
    }
    assert(e.getMessage.contains("unsupported physical type"))
    assert(e.getMessage.contains("normalizeEventTs"))
  }

  test("the real testdata events table normalizes to TimestampType") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1)
  }
}
