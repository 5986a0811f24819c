package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.CatalogMirror
import graft.sources._

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val t0 = lit(Timestamp.valueOf("2024-01-01 00:00:00"))

  test("qualstats: single-sided filter, semi-join, ordered constvalues") {
    import spark.implicits._
    val raw = Seq(
      // valid left-sided qual, two const positions out of order
      (1, Option(77L), 5L, 100L, 10L, 1L, Option(200L), Option.empty[Long],
        200L, 1, 96L, "f", 2, "b", 3L, 9L, 1L, 0.5, 1.0),
      (1, Option(77L), 5L, 100L, 10L, 1L, Option(200L), Option.empty[Long],
        200L, 1, 96L, "f", 1, "a", 3L, 9L, 1L, 0.5, 1.0),
      // two-sided qual → dropped (:7062)
      (1, Option(78L), 6L, 100L, 10L, 1L, Option(200L), Option(201L),
        200L, 1, 96L, "f", 1, "x", 1L, 1L, 0L, 0.0, 0.0),
      // unknown statement → dropped by semi-join
      (1, Option(79L), 7L, 100L, 10L, 999L, Option(200L), Option.empty[Long],
        200L, 1, 96L, "f", 1, "y", 1L, 1L, 0L, 0.0, 0.0))
      .toDF("srvid", "uniquequalid", "uniquequalnodeid", "dbid", "userid",
        "queryid", "lrelid", "rrelid", "relid", "attnum", "opno", "eval_type",
        "constant_position", "constvalue", "occurences", "execution_count",
        "nbfiltered", "mean_err_estimate_ratio", "mean_err_estimate_num")
      .withColumn("ts", t0)
    val known = Seq((1L, 100L, 10L)).toDF("queryid", "dbid", "userid")
    val out = QualstatsSource.normalize(raw, known).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("qualid") === 77L)
    // constvalues ordered by constant_position: a (pos 1) before b (pos 2)
    assert(r.getAs[Seq[String]]("constvalues") === Seq("a", "b"))
    assert(r.getAs[Long]("occurences") === 6L)
    assert(r.getAs[Seq[org.apache.spark.sql.Row]]("quals").length === 1)
  }

  test("kcache ladder: pre-2.2 nulls plan counters; dropped dbs excluded") {
    import spark.implicits._
    val raw = Seq(
      (1L, true, 10L, 100L, 5L, 6L, 0.1, 0.2, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L),
      (2L, true, 10L, 666L, 5L, 6L, 0.1, 0.2, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
      .toDF("queryid", "top", "userid", "dbid",
        "reads", "writes", "user_time", "system_time", "minflts", "majflts",
        "nswaps", "msgsnds", "msgrcvs", "nsignals", "nvcsws", "nivcsws")
    val dbs = Seq((100L, Option.empty[Timestamp]),
        (666L, Option(Timestamp.valueOf("2024-01-01 00:00:00"))))
      .toDF("oid", "dropped")
    val out = ModuleSources.kcacheCapture(raw, 200, dbs, ts = t0)
    val rows = out.collect()
    assert(rows.length === 1) // dropped-db row excluded
    // ignored-users membership filter (:6612-6615)
    val withRole = raw.withColumn("rolname",
      when(col("queryid") === 1L, "bot").otherwise("alice"))
    assert(ModuleSources.kcacheCapture(withRole, 200, dbs,
      ignoredUsers = Seq("bot"), ts = t0).count() === 0) // bot + dropped-db both gone
    val r = rows.head
    assert(r.getAs[Long]("exec_reads") === 5L)
    assert(r.isNullAt(r.fieldIndex("plan_reads"))) // pre-2.2 default
    // 2.2+ ladder picks the split columns
    val raw22 = raw.limit(1)
      .select(col("queryid"), col("top"), col("userid"), col("dbid"),
        col("reads").as("plan_reads"), col("writes").as("plan_writes"),
        col("user_time").as("plan_user_time"), col("system_time").as("plan_system_time"),
        col("minflts").as("plan_minflts"), col("majflts").as("plan_majflts"),
        col("nswaps").as("plan_nswaps"), col("msgsnds").as("plan_msgsnds"),
        col("msgrcvs").as("plan_msgrcvs"), col("nsignals").as("plan_nsignals"),
        col("nvcsws").as("plan_nvcsws"), col("nivcsws").as("plan_nivcsws"),
        (col("reads") + 1).as("exec_reads"), col("writes").as("exec_writes"),
        col("user_time").as("exec_user_time"), col("system_time").as("exec_system_time"),
        col("minflts").as("exec_minflts"), col("majflts").as("exec_majflts"),
        col("nswaps").as("exec_nswaps"), col("msgsnds").as("exec_msgsnds"),
        col("msgrcvs").as("exec_msgrcvs"), col("nsignals").as("exec_nsignals"),
        col("nvcsws").as("exec_nvcsws"), col("nivcsws").as("exec_nivcsws"))
    val out22 = ModuleSources.kcacheCapture(raw22, 202, dbs, ts = t0).head()
    assert(out22.getAs[Long]("plan_reads") === 5L)
    assert(out22.getAs[Long]("exec_reads") === 6L)
  }

  test("wait sampling: dbid resolution via dedup'd pgss, background → 0") {
    import spark.implicits._
    val profile = Seq(
      (1, 42L, "LWLock", "WALWriteLock", java.math.BigDecimal.valueOf(7)),
      (1, 42L, "LWLock", "WALWriteLock", java.math.BigDecimal.valueOf(3)),
      (1, 0L, "Activity", "BgWriterMain", java.math.BigDecimal.valueOf(5)))
      .toDF("srvid", "queryid", "event_type", "event", "count")
    val pgss = Seq((42L, 100L), (42L, 100L)).toDF("queryid", "dbid")
    val out = ModuleSources.waitSamplingCapture(profile, pgss, t0)
      .orderBy("queryid").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("dbid") === 0L)   // background resolved to 0
    assert(out(1).getAs[Long]("dbid") === 100L)
    assert(out(1).getAs[java.math.BigDecimal]("count").longValue === 10L)
  }

  test("bgwriter pg17+ reconstructs backend counters from pg_stat_io") {
    import spark.implicits._
    val bg17 = Seq((5L, 2L, 9L)).toDF(
      "buffers_clean", "maxwritten_clean", "buffers_alloc")
    val io = Seq(
      ("client backend", 10L, 4L, 3L),
      ("client backend", 20L, 6L, 2L),
      ("checkpointer", 99L, 99L, 99L)) // excluded backend type
      .toDF("backend_type", "writes", "extends", "fsyncs")
    val out = ModuleSources.bgwriterCapture(bg17, io, 170000, t0).head()
    assert(out.getAs[Long]("buffers_backend") === 40L)      // Σ writes+extends
    assert(out.getAs[Long]("buffers_backend_fsync") === 5L) // Σ fsyncs
    assert(out.getAs[Long]("buffers_clean") === 5L)
    // pre-17: columns read straight off the view
    val bg16 = bg17.withColumn("buffers_backend", lit(7L))
      .withColumn("buffers_backend_fsync", lit(1L))
    val out16 = ModuleSources.bgwriterCapture(bg16, io, 160000, t0).head()
    assert(out16.getAs[Long]("buffers_backend") === 7L)
  }

  test("checkpointer pre-17 emulated from bgwriter columns") {
    import spark.implicits._
    val bgOld = Seq((3L, 4L, 1.5, 0.5, 11L)).toDF(
      "checkpoints_timed", "checkpoints_req", "checkpoint_write_time",
      "checkpoint_sync_time", "buffers_checkpoint")
    val out = ModuleSources.checkpointerCapture(
      spark.emptyDataFrame, bgOld, 160000, t0).head()
    assert(out.getAs[Long]("num_timed") === 3L)
    assert(out.getAs[Long]("buffers_written") === 11L)
    val cp17 = Seq((6L, 7L, 2.0, 1.0, 22L)).toDF(
      "num_timed", "num_requested", "write_time", "sync_time",
      "buffers_written")
    val out17 = ModuleSources.checkpointerCapture(
      cp17, spark.emptyDataFrame, 170000, t0).head()
    assert(out17.getAs[Long]("buffers_written") === 22L)
  }

  test("atLeastOneRow synthesizes an empty-source row") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("slot_name", "restart_lsn")
    val out = ModuleSources.atLeastOneRow(spark, empty, t0).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(1)) // NULL record columns, real ts
  }

  test("catalog mirror: per-(srvid,dbid) replace + refresh bookkeeping") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val m = new CatalogMirror(spark, root)
    val v1 = Seq((1L, "t1"), (2L, "t2")).toDF("oid", "relname")
    m.replace("pg_class", 1, 100L, v1)
    assert(m.read("pg_class", 1, 100L).get.count() === 2)
    // replace with new content for the same (srvid, dbid)
    val v2 = Seq((3L, "t3")).toDF("oid", "relname")
    m.replace("pg_class", 1, 100L, v2)
    assert(m.read("pg_class", 1, 100L).get.count() === 1)
    // other (srvid, dbid) untouched, unknown catalog rejected
    assert(m.read("pg_class", 1, 200L).isEmpty)
    intercept[IllegalArgumentException](m.replace("nope", 1, 1L, v1))
    // refresh stamped only via pg_class; staleness filter honors it
    assert(m.lastRefresh(1, 100L).isDefined)
    val now = new Timestamp(System.currentTimeMillis())
    assert(m.staleDbids(1, Seq(100L, 200L), 3600, now) === Seq(200L))
    assert(m.staleDbids(1, Seq(100L), 0, new Timestamp(now.getTime + 1000))
      === Seq(100L))
  }

  test("csv/json staging wire formats round-trip into the snapshot tick") {
    import spark.implicits._
    val spec = graft.spec.Specs.byName("powa_stat_bgwriter")
    val rows = Seq(
      (1, Timestamp.valueOf("2024-01-01 00:05:00"), 100L, 10L, 5L, 2L, 1L),
      (1, Timestamp.valueOf("2024-01-01 00:10:00"), 200L, 20L, 9L, 4L, 2L))
      .toDF("srvid", "ts", "buffers_clean", "maxwritten_clean",
        "buffers_backend", "buffers_backend_fsync", "buffers_alloc")
    val dir = java.nio.file.Files.createTempDirectory("graft_wire").toString
    rows.write.option("header", "true").csv(s"$dir/csv")
    rows.write.json(s"$dir/json")
    val fromCsv = SourceAdapter.readStagingCsv(spark, spec, s"$dir/csv")
    val fromJson = SourceAdapter.readStagingJson(spark, spec, s"$dir/json")
    // both wire formats decode to the exact staging frame
    assert(fromCsv.schema === spec.stagingSchema)
    assert(fromCsv.except(rows).isEmpty && rows.except(fromCsv).isEmpty)
    assert(fromJson.except(rows).isEmpty && rows.except(fromJson).isEmpty)
    // and drive the engine exactly like a parquet ingest
    val root = java.nio.file.Files.createTempDirectory("graft_wire_e").toString
    val e = new graft.core.Engine(spark, root)
    val srvid = e.registry.registerServer(graft.core.ServerConfig(
      id = 31, hostname = "h"))
    val stamped = fromCsv.withColumn("srvid", lit(srvid))
    e.ingest("powa_stat_bgwriter", stamped)
    e.takeSnapshot(srvid, Timestamp.valueOf("2024-01-01 00:15:00"))
    val cur = e.store.read("powa_stat_bgwriter",
      graft.core.GenericDatasource.Current,
      graft.core.GenericDatasource.currentNoSrvid(spec))
    assert(cur.count() === 2)
  }
}
