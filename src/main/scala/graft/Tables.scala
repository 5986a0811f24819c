package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spec.{ColSpec, DatasourceSpec}
import org.apache.spark.sql.types._

/** Readers for the driver-provided testdata tables (TESTDATA.md) and the
  * deterministic mapping of the `events` stream onto the engine's
  * (srvid, key…, record) current-tier shape (FIXTURES.md: staging fixtures
  * are derived from the driver tables, not synthesized).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark only reads via the legacy nanos-as-long path. Truncate to
    * micros with integer division (matching DuckDB's ns→µs truncation);
    * a double-valued path would lose precision at 1e18 ns epochs.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** The `events` table viewed as a powa-style datasource: servers are
  * `user_id % 4`, the entity key is (user_id, event_type), and `value` is
  * the tracked metric. This is the engine-shape fixture every
  * snapshot/coalesce/readback/rate query runs against.
  */
object EventsSource {
  val spec: DatasourceSpec = DatasourceSpec(
    name = "events",
    keyCols = Seq(
      ColSpec("user_id", LongType),
      ColSpec("event_type", StringType)),
    counterCols = Seq(ColSpec("value", DoubleType)))

  /** events → current tier: (srvid, user_id, event_type, record{ts,value}) */
  def current(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      (col("user_id") % 4).cast("int").as("srvid"),
      col("user_id"),
      col("event_type"),
      struct(col("ts"), col("value")).as("record"))
}
