package graft.sources

import scala.collection.immutable.TreeMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining source-adapter patterns of SURVEY.md §2.1, as reusable
  * builders. */
object ModuleSources {

  /** pg_stat_kcache version dispatch (`powa_kcache_src`,
    * powa--5.2.0.sql:6567-6666): kcache 2.2+ splits plan/exec counters;
    * older versions expose exec-only columns under unprefixed names and
    * the plan_* columns become NULL literals. Dropped databases are
    * excluded (:6616-6618) via anti-join on the dimension's dropped rows.
    */
  val kcacheCounters: Seq[String] = Seq(
    "reads", "writes", "user_time", "system_time", "minflts", "majflts",
    "nswaps", "msgsnds", "msgrcvs", "nsignals", "nvcsws", "nivcsws")

  val kcacheLadder: TreeMap[Int, Seq[Column]] = {
    val keys = Seq(col("queryid"), col("top"), col("userid"), col("dbid"))
    TreeMap(
      // pre-2.2: exec-only view; plan_* → NULL (:6627-6664)
      0 -> (keys ++
        kcacheCounters.map(c => lit(null).cast(
          if (c.endsWith("time")) "double" else "long").as(s"plan_$c")) ++
        kcacheCounters.map(c => col(c).as(s"exec_$c"))),
      // 2.2+: split plan/exec counters (:6577-6625)
      202 -> (keys ++
        kcacheCounters.map(c => col(s"plan_$c")) ++
        kcacheCounters.map(c => col(s"exec_$c"))))
  }

  /** Dropped databases are excluded via anti-join (:6616-6618) and
    * ignored users via the role-name membership list (:6612-6615 — the
    * reference joins pg_roles and applies `NOT rolname = ANY(...)`;
    * rows here carry `rolname` already). */
  def kcacheCapture(
      raw: DataFrame, version: Int, databases: DataFrame,
      ignoredUsers: Seq[String] = Nil,
      ts: Column = current_timestamp()): DataFrame =
    raw
      .join(databases.filter(col("dropped").isNotNull).select(col("oid").as("dbid")),
        Seq("dbid"), "left_anti")
      .filter(if (ignoredUsers.isEmpty) lit(true)
              else !col("rolname").isin(ignoredUsers: _*))
      .select(ts.as("ts") +: SourceAdapter.pick(kcacheLadder, version): _*)

  /** pg_wait_sampling source (`powa_wait_sampling_src`,
    * powa--5.2.0.sql:7289-7343): left-join the wait profile to the
    * dedup'd (dbid, queryid) pairs of pg_stat_statements, `COALESCE(dbid,
    * 0)` for background processes (:7325-7327), then
    * `SUM(count) GROUP BY dbid, event_type, event, queryid` (:7333).
    */
  def waitSamplingCapture(
      profile: DataFrame, pgss: DataFrame,
      ts: Column = current_timestamp()): DataFrame = {
    val dedup = pgss.select(col("queryid"), col("dbid")).distinct()
    profile
      .join(dedup, Seq("queryid"), "left")
      .withColumn("dbid", coalesce(col("dbid"), lit(0L)))
      .groupBy(col("srvid"), col("dbid"), col("event_type"), col("event"),
        col("queryid"))
      .agg(sum(col("count")).as("count"))
      .withColumn("ts", ts)
  }

  /** pg_stat_bgwriter on pg17+ (`powa_stat_bgwriter_src`,
    * powa--5.2.0.sql:4622-4665): the buffers_backend* columns were
    * removed from the view, so they're reconstructed from pg_stat_io —
    * `sum(writes + extends)` / `sum(fsyncs)` over client backends —
    * cross-joined onto the single bgwriter row. Pre-17 reads the view
    * directly. */
  def bgwriterCapture(
      bgwriter: DataFrame, statIo: DataFrame, versionNum: Int,
      ts: Column = current_timestamp()): DataFrame =
    if (versionNum >= 170000) {
      val io = statIo.filter(col("backend_type") === "client backend")
        .agg(
          sum(col("writes") + col("extends")).cast("long").as("buffers_backend"),
          sum(col("fsyncs")).cast("long").as("buffers_backend_fsync"))
      bgwriter.select(ts.as("ts"), col("buffers_clean"),
          col("maxwritten_clean"), col("buffers_alloc"))
        .crossJoin(io)
        .select(col("ts"), col("buffers_clean"), col("maxwritten_clean"),
          col("buffers_backend"), col("buffers_backend_fsync"),
          col("buffers_alloc"))
    } else {
      bgwriter.select(ts.as("ts"), col("buffers_clean"),
        col("maxwritten_clean"), col("buffers_backend"),
        col("buffers_backend_fsync"), col("buffers_alloc"))
    }

  /** pg_stat_checkpointer pre-17 emulation (`powa_stat_checkpointer_src`,
    * powa--5.2.0.sql:4666-4701): before the dedicated view existed its
    * columns lived on pg_stat_bgwriter under checkpoint names. */
  def checkpointerCapture(
      checkpointer: DataFrame, bgwriter: DataFrame, versionNum: Int,
      ts: Column = current_timestamp()): DataFrame =
    if (versionNum >= 170000)
      checkpointer.select(ts.as("ts"), col("num_timed"), col("num_requested"),
        col("write_time"), col("sync_time"), col("buffers_written"))
    else
      bgwriter.select(ts.as("ts"),
        col("checkpoints_timed").as("num_timed"),
        col("checkpoints_req").as("num_requested"),
        col("checkpoint_write_time").as("write_time"),
        col("checkpoint_sync_time").as("sync_time"),
        col("buffers_checkpoint").as("buffers_written"))

  /** Synthesize-at-least-one-row (`(SELECT now()) LEFT JOIN
    * pg_replication_slots ON true`, powa--5.2.0.sql:4381-4382): some
    * sources must emit a row per snapshot even when the monitored view is
    * empty, so gaps read as explicit NULL records rather than missing
    * ticks. */
  def atLeastOneRow(spark: SparkSession, src: DataFrame, ts: Column): DataFrame = {
    import spark.implicits._
    val anchor = Seq(1).toDF("__one").select(ts.as("ts"))
    anchor.join(src, lit(true), "left").drop("__one")
  }
}
