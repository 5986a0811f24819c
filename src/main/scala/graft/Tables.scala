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
  /** The events table has shipped in three physical layouts across testdata
    * generations: INT64 TIMESTAMP(NANOS) (Spark reads it only via the
    * legacy nanos-as-long conf; ns DIV 1000 truncates to micros, matching
    * DuckDB's ns→µs truncation — integer math, since a double path would
    * lose precision at 1e18 ns epochs), TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (Spark reads TIMESTAMP_NTZ; with session TZ
    * UTC the cast to TimestampType is value-preserving and matches how
    * the DuckDB oracle reads the same naive-timestamp file), and native
    * TIMESTAMP(MICROS, UTC) (plain TimestampType read). Detect from the
    * file schema and normalize so every consumer sees a micros
    * TimestampType `ts`; any FOURTH layout fails loudly here instead of
    * as scattered analysis errors in every event-time consumer.
    *
    * NOTE: the `PinNanosConf` suffix is the contract — this getter
    * intentionally sets the nanosAsLong session conf as a side effect
    * on every call. The schema cannot be read at all under the NANOS
    * layout without it, and the stream scans each call site builds on
    * the same session rely on it staying set.
    */
  private val rawSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def eventsRawSchemaPinNanosConf(s: SparkSession, d: String): StructType = {
    // the conf set must happen on EVERY call (stream scans on this session
    // depend on it); only the footer read is memoized — the file cannot
    // change within a run, and p61 reads it three times per invocation
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rawSchemaCache.computeIfAbsent(d, dir => table(s, dir, "events").schema)
  }

  def eventsTsIsNanosLong(schema: StructType): Boolean =
    schema("ts").dataType == LongType

  def normalizeEventTs(df: DataFrame): DataFrame = {
    val raw = df.schema("ts").dataType
    val norm = raw match {
      case LongType           => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType      => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other; known layouts are " +
        "INT64 TIMESTAMP(NANOS) (read as long), TIMESTAMP(MICROS, isAdjustedToUTC=false) " +
        "(read as TIMESTAMP_NTZ), and TIMESTAMP(MICROS, UTC) (read as TIMESTAMP). " +
        "The driver's testdata layout shifted again — extend Tables.normalizeEventTs.")
    }
    assert(norm.schema("ts").dataType == TimestampType,
      s"normalizeEventTs postcondition: ts must be TimestampType, got ${norm.schema("ts").dataType} (raw was $raw)")
    norm
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Temp directories for query fixtures, swept at JVM exit — repeated
  * bench reps / verify runs in one process otherwise accumulate
  * tmp-dir litter (round-10 ADVICE). Deletion is a shutdown hook, NOT
  * a finally block: the returned DataFrames read these dirs lazily
  * after the query function returns, so an eager delete would break
  * the driver's collect. `AtomicSwap.deleteRecursively` removes
  * symlinks without following them, so a fixture link INTO the source
  * data (p143/p153's streaming-dir shape) never deletes its target. */
object TempDirs {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.forEach { p =>
        try graft.core.AtomicSwap.deleteRecursively(p)
        catch { case _: Throwable => () }
      }))
  def scoped(prefix: String): java.nio.file.Path = {
    hookOnce
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p
  }
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
