package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each with a DuckDB-equivalent oracle over the same parquet tables.
  *
  * Numeric-fidelity rules (SURVEY.md §7.4 item 7): money math goes through
  * DECIMAL casts in BOTH engines (exact, order-independent); double math is
  * restricted to operations that are bitwise-reproducible (same operands,
  * same ops) or rounded; every query ends in a total ORDER BY.
  */
object SparkEntry {

  /** Flagship: coalesce → readback → per-second rates on the events
    * datasource (the canonical PoWA question, SURVEY.md §3.3). */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val cur = EventsSource.current(spark, sfDir)
    val split = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    val hist = Coalesce.aggregate(cur.filter(col("record.ts") < split), EventsSource.spec)
    val series = Readback.series(
      cur.filter(col("record.ts") >= split), hist, EventsSource.spec,
      lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
    DeltaRate.withRates(series, EventsSource.spec)
  }

  private val D18_2 = DecimalType(18, 2)
  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  // ---- SURVEY §2.4: per-db rollup aggregation (powa--5.2.0.sql:4070-4094)
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D18_2)).cast(DecimalType(38, 2)).as("sum_qty"),
        sum(col("l_extendedprice").cast(D18_2)).cast(DecimalType(38, 2)).as("sum_base_price"),
        sum(col("l_extendedprice").cast(D18_2) *
          (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))))
          .cast(DecimalType(38, 4)).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---- SURVEY §2.4/§2.5: top-K-per-group (powa--5.2.0.sql:6924-6982)
  private def q02(s: SparkSession, d: String): DataFrame =
    TopK.topKPerGroup(
        Tables.orders(s, d),
        groupKeys = Seq(col("o_orderpriority")),
        orderBy = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 10)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rank"))

  // ---- SURVEY §2.8: generated delta / per-second rate operators
  private def q03(s: SparkSession, d: String): DataFrame =
    DeltaRate.withRates(EventsSource.current(s, d), EventsSource.spec)
      .select(
        col("user_id"), col("event_type"),
        col("record.ts").as("ts"), col("record.value").as("value"),
        col("intvl_sec"), col("value_delta"), col("value_per_sec"))
      .orderBy(col("user_id"), col("event_type"), col("ts"))

  // ---- SURVEY §2.4: coalesce aggregation round-trip (pack → unnest)
  private def q04(s: SparkSession, d: String): DataFrame =
    Coalesce.aggregate(EventsSource.current(s, d), EventsSource.spec)
      .select(
        col("srvid"), col("user_id"), col("event_type"),
        explode(col("records")).as("record"))
      .select(
        col("srvid"), col("user_id"), col("event_type"),
        col("record.ts").as("ts"), col("record.value").as("value"))
      .orderBy(col("user_id"), col("event_type"), col("ts"), col("value"))

  // ---- SURVEY §2.4: coalesce min/max summary records + tstzrange bounds
  private def q05(s: SparkSession, d: String): DataFrame =
    Coalesce.aggregate(EventsSource.current(s, d), EventsSource.spec)
      .select(
        col("srvid"), col("user_id"), col("event_type"),
        col("range_start"), col("range_end"),
        size(col("records")).cast("long").as("n_records"),
        col("mins_in_range.value").as("min_value"),
        col("maxs_in_range.value").as("max_value"))
      .orderBy(col("user_id"), col("event_type"))

  // ---- SURVEY §2.12: readback = current ∪ unnest(history) range overlap
  private def q06(s: SparkSession, d: String): DataFrame = {
    val cur = EventsSource.current(s, d)
    val split = ts("2024-01-15 00:00:00")
    val hist = Coalesce.aggregate(cur.filter(col("record.ts") < split), EventsSource.spec)
    Readback.series(
        cur.filter(col("record.ts") >= split), hist, EventsSource.spec,
        ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"))
      .select(
        col("srvid"), col("user_id"), col("event_type"),
        col("record.ts").as("ts"), col("record.value").as("value"))
      .orderBy(col("user_id"), col("event_type"), col("ts"), col("value"))
  }

  // ---- SURVEY §2.11: retention purge over coalesced ranges
  private def q07(s: SparkSession, d: String): DataFrame = {
    val cur = EventsSource.current(s, d)
      .withColumn("batch", date_trunc("week", col("record.ts")))
    val hist = Coalesce.aggregate(
      cur, EventsSource.spec.copy(keyCols =
        EventsSource.spec.keyCols :+ graft.spec.ColSpec("batch", TimestampType)))
    Coalesce.purge(hist, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      .select(
        col("srvid"), col("user_id"), col("event_type"), col("batch"),
        col("range_start"), col("range_end"),
        size(col("records")).cast("long").as("n_records"))
      .orderBy(col("user_id"), col("event_type"), col("batch"))
  }

  // ---- SURVEY §2.3: missing-entity detection (anti-join, :3746-3753)
  private def q08(s: SparkSession, d: String): DataFrame =
    DiffSync.missing(
        Tables.customer(s, d),
        Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  // ---- SURVEY §2.3: semi-join (qualstats → known statements, :7119-7124)
  private def q09(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 200000.0)
          .select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_db_rollup" -> (q01 _),
    "q02_topk_per_group" -> (q02 _),
    "q03_delta_rate" -> (q03 _),
    "q04_coalesce_roundtrip" -> (q04 _),
    "q05_coalesce_minmax" -> (q05 _),
    "q06_readback_union" -> (q06 _),
    "q07_purge_retention" -> (q07 _),
    "q08_missing_anti_join" -> (q08 _),
    "q09_semi_join" -> (q09 _))

  def oracleSql: Map[String, String] = Map(
    "q01_db_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_topk_per_group" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
           FROM orders) WHERE rank <= 10
         ORDER BY o_orderpriority, rank""",
    "q03_delta_rate" ->
      """SELECT user_id, event_type, ts, value, intvl_sec, value_delta,
                value_delta / (CASE WHEN intvl_sec = 0 THEN 1.0 ELSE intvl_sec END) AS value_per_sec
         FROM (
           SELECT user_id, event_type, ts, value,
             CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS DOUBLE) / 1000000.0 AS intvl_sec,
             value - LAG(value) OVER w AS value_delta
           FROM events
           WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts))
         ORDER BY user_id, event_type, ts""",
    "q04_coalesce_roundtrip" ->
      """SELECT CAST(user_id % 4 AS INTEGER) AS srvid, user_id, event_type, ts, value
         FROM events ORDER BY user_id, event_type, ts, value""",
    "q05_coalesce_minmax" ->
      """SELECT CAST(user_id % 4 AS INTEGER) AS srvid, user_id, event_type,
                MIN(ts) AS range_start, MAX(ts) AS range_end,
                COUNT(*) AS n_records,
                MIN(value) AS min_value, MAX(value) AS max_value
         FROM events GROUP BY 1, 2, 3 ORDER BY user_id, event_type""",
    "q06_readback_union" ->
      """SELECT CAST(user_id % 4 AS INTEGER) AS srvid, user_id, event_type, ts, value
         FROM events
         WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
         ORDER BY user_id, event_type, ts, value""",
    "q07_purge_retention" ->
      """SELECT CAST(user_id % 4 AS INTEGER) AS srvid, user_id, event_type,
                DATE_TRUNC('week', ts) AS batch,
                MIN(ts) AS range_start, MAX(ts) AS range_end,
                COUNT(*) AS n_records
         FROM events GROUP BY 1, 2, 3, 4
         HAVING MAX(ts) >= TIMESTAMP '2024-01-15 00:00:00'
         ORDER BY user_id, event_type, batch""",
    "q08_missing_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q09_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey AND o_totalprice > 200000.0)
         ORDER BY l_orderkey, l_linenumber""")
}
