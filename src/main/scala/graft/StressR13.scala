package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 stress axis — the vectorized ACTIVE tick (optimization
  * guide §2/§5: the per-(server, datasource) snapshot loop is a
  * driver-side job-scheduling bottleneck, not a data one).
  *
  * Claim under measurement: `takeSnapshotFleet` makes a fully-staged
  * fleet tick cost ONE Spark job per (datasource, sink tier) instead
  * of one per (server, datasource), so a 1000-server staged tick
  * lands in wall-clock comparable to a 10-server tick (VERDICT r12
  * "done" bar: within ~3×), while the per-server sequential path is
  * linear in the fleet. Row identity fleet-vs-sequential is pinned at
  * spec scale by EngineSpec; this axis re-checks it at 100 servers
  * and measures the fan-out.
  *
  *   SPARK_GRAFT_FLEET13=1000 sbt "runMain graft.StressR13"
  */
object StressR13 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val nFleet = sys.env.getOrElse("SPARK_GRAFT_FLEET13", "1000").toInt
    val nSeq = sys.env.getOrElse("SPARK_GRAFT_SEQ13", "100").toInt
    val spark: SparkSession = StressCorpus.session(cpus)
    val ds = "powa_stat_bgwriter"
    val now = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")

    def cfg(i: Int) = graft.core.ServerConfig(id = i, hostname = s"h$i",
      powaCoalesce = 1000, retentionSec = 3650L * 86400)

    /** One staged bgwriter batch covering servers [1, n] — 2 rows per
      * server, values varying per srvid so identity checks bite. */
    def stagedBatch(n: Int) = spark.range(1, n + 1)
      .select(col("id").cast("int").as("srvid"))
      .crossJoin(spark.range(2).select(col("id").as("row")))
      .select(col("srvid"),
        // 2024-01-01 00:05:00 UTC + 60 s per row index
        timestamp_seconds(lit(1704067500L) + col("row") * 60L).as("ts"),
        (col("srvid") * 100L + col("row")).as("buffers_clean"),
        (col("srvid") * 10L).as("maxwritten_clean"),
        (col("srvid") * 5L).as("buffers_backend"),
        (col("srvid") * 2L).as("buffers_backend_fsync"),
        (col("srvid") + col("row")).as("buffers_alloc"))

    def freshStagedEngine(n: Int): (graft.core.Engine, java.nio.file.Path) = {
      val root = java.nio.file.Files.createTempDirectory("graft_fleet13")
      val e = new graft.core.Engine(spark, root.toString)
      e.registry.registerServers((1 to n).map(cfg))
      e.ingest(ds, stagedBatch(n))
      (e, root)
    }

    def timed[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // ---- warm both paths once at 10 servers (codegen, layout) ----
    locally {
      val (w, wroot) = freshStagedEngine(10)
      w.takeSnapshotFleet(1 to 10, now)
      val (w2, wroot2) = freshStagedEngine(10)
      (1 to 10).foreach(w2.takeSnapshot(_, now))
      graft.core.AtomicSwap.deleteRecursively(wroot)
      graft.core.AtomicSwap.deleteRecursively(wroot2)
    }

    // ---- fleet tick at 10 servers (the comparison bar) ----
    val (e10, root10) = freshStagedEngine(10)
    val (fleet10Sec, _) = timed(e10.takeSnapshotFleet(1 to 10, now))
    graft.core.AtomicSwap.deleteRecursively(root10)

    // ---- fleet tick, fully staged, nFleet servers ----
    val (eF, rootF) = freshStagedEngine(nFleet)
    val (fleetSec, fleetErrs) = timed(eF.takeSnapshotFleet(1 to nFleet, now))
    val fleetRows = eF.store.read(ds, graft.core.GenericDatasource.Current,
      graft.core.GenericDatasource.currentNoSrvid(
        graft.spec.Specs.byName(ds))).count()
    // a second, idle fleet tick (nothing staged): directory probes only
    val (fleetIdleSec, _) = timed(eF.takeSnapshotFleet(1 to nFleet,
      new java.sql.Timestamp(now.getTime + 300000L)))

    // ---- sequential per-server ticks at nSeq servers ----
    val (eS, rootS) = freshStagedEngine(nSeq)
    val (seqSec, _) = timed((1 to nSeq).foreach(eS.takeSnapshot(_, now)))

    // ---- row identity at nSeq: fleet store ∩ [1, nSeq] == seq store ----
    def currentRows(e: graft.core.Engine, upTo: Int): Set[String] =
      e.store.read(ds, graft.core.GenericDatasource.Current,
          graft.core.GenericDatasource.currentNoSrvid(
            graft.spec.Specs.byName(ds)))
        .filter(col("srvid") <= upTo)
        .collect().map(_.toString).toSet
    val identical = currentRows(eF, nSeq) == currentRows(eS, nSeq)
    graft.core.AtomicSwap.deleteRecursively(rootF)
    graft.core.AtomicSwap.deleteRecursively(rootS)

    val json =
      s"""{"metric":"stress_r13","fleet":$nFleet,"seq_n":$nSeq,""" +
        s""""fleet10_sec":$fleet10Sec,"fleet_sec":$fleetSec,""" +
        s""""fleet_vs_10x":${fleetSec / fleet10Sec},""" +
        s""""fleet_idle_sec":$fleetIdleSec,""" +
        s""""fleet_rows":$fleetRows,""" +
        s""""fleet_err_total":${fleetErrs.values.sum},""" +
        s""""seq_sec":$seqSec,""" +
        s""""seq_per_server_sec":${seqSec / nSeq},""" +
        s""""seq_extrapolated_fleet_sec":${seqSec / nSeq * nFleet},""" +
        s""""rows_identical_at_${nSeq}":$identical}"""
    spark.stop()
    println(json)
  }
}
