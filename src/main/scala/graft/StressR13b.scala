package graft

import org.apache.spark.sql.functions._

/** Round-13 flagship axis — the FULL statements pipeline (dimension
  * sync + dual sinks + coalesce aggregation + readback) end-to-end at
  * 10× and 100× the sf0.1 tick volume, per-phase timings (r12 VERDICT
  * item 7: SCALE measured operators at 10-200× but never the composed
  * q34 roundtrip above sf0.1).
  *
  * Shape mirrors q34: one server on a coalesce-5 cadence de-phased so
  * the run crosses a genuine AGGREGATE tick (array-pack coalesce into
  * history) and a PURGE tick, then a readback over the current/history
  * mix. Volume: `SPARK_GRAFT_MULT13` × 100k statement rows per tick ×
  * 5 ticks (default mult 100 → 10M rows/tick, 50M total), with the
  * queryid dimension growing with volume (mult × 10k distinct ids) so
  * the anti-join dimension sync is exercised at scale, not just the
  * counter sinks.
  *
  *   SPARK_GRAFT_MULT13=100 sbt "runMain graft.StressR13b"
  *
  * Linearity check: run at mult 10 and 100 and compare per-1M-row
  * phase costs — a superlinear term shows as the 100× per-unit cost
  * exceeding the 10× one.
  */
object StressR13b {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val mults = sys.env.getOrElse("SPARK_GRAFT_MULT13", "10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = StressCorpus.session(cpus)

    def timed[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // steal-immune structural counters: job/task counts per phase (a
    // superlinear term in the ORCHESTRATION shows here even when the
    // hypervisor makes wall-clock unjudgeable; task counts grow with
    // data, job counts must stay constant per tick)
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskCount.incrementAndGet()
      })
    def counted[T](body: => T): (Double, Long, Long, T) = {
      val j0 = jobCount.get(); val t0 = taskCount.get()
      val (sec, r) = timed(body)
      Thread.sleep(50) // let task-end events drain the listener bus
      (sec, jobCount.get() - j0, taskCount.get() - t0, r)
    }

    val spec = graft.spec.Specs.statements
    val filled = Set("calls", "total_exec_time", "rows")

    for (mult <- mults) {
      val rowsPerTick = 100000L * mult
      val nQueryIds = 10000L * mult // dimension grows with the corpus
      val root = java.nio.file.Files.createTempDirectory("graft_r13b")
      val e = new graft.core.Engine(spark, root.toString)
      val srvid = e.registry.registerServer(graft.core.ServerConfig(
        id = 23, hostname = "h", powaCoalesce = 5,
        retentionSec = 3650L * 86400))

      /** One tick's staged batch: rowsPerTick rows on day (1+tick),
        * queryid drawn from the growing id space, every spec counter
        * present (q34's shape), ts spread across the day. */
      def tickBatch(tick: Int) = {
        val day0 = 1704067200L + tick * 86400L // 2024-01-01 + tick days
        spark.range(rowsPerTick)
          .select(
            lit(srvid).as("srvid"),
            timestamp_seconds(lit(day0) + (col("id") % 86400L)).as("ts"),
            (col("id") % nQueryIds).as("queryid"),
            (col("id") % 5).as("dbid"),
            lit(true).as("toplevel"),
            (col("id") % 3).as("userid"),
            lit(1L).as("calls"),
            (col("id") % 1000L).cast("double").as("total_exec_time"),
            (col("id") % 7L).as("rows"))
          .select(col("*") +: spec.counterCols
            .filterNot(c => filled.contains(c.name))
            .map(c => lit(0).cast(c.dt).as(c.name)): _*)
          .withColumn("query",
            concat(lit("SELECT "), col("queryid").cast("string")))
      }

      val phases = (0 until 5).map { tick =>
        val (ingestSec, ij, it, _) =
          counted(e.ingest("powa_statements", tickBatch(tick)))
        val (snapSec, sj, st, errs) = counted(e.takeSnapshot(srvid,
          new java.sql.Timestamp((1704067200L + tick * 86400L + 82800L) * 1000L)))
        require(errs == 0, s"tick $tick reported $errs errors")
        (tick, ingestSec, snapSec, ij + sj, it + st)
      }

      val ds = e.datasource("powa_statements")
        .asInstanceOf[graft.core.StatementsDatasource]
      val from = java.sql.Timestamp.valueOf("2023-01-01 00:00:00")
      val to = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
      val (readbackSec, agg) = timed {
        ds.readSeries(e.store, srvid, from, to)
          .groupBy(col("queryid"))
          .agg(sum(col("record.calls")).as("calls"))
          .agg(count(lit(1)).as("n_ids"), sum(col("calls")).as("total_calls"))
          .collect().head
      }
      val (dimSec, nDim) = timed(ds.readDim(e.store, srvid).count())
      graft.core.AtomicSwap.deleteRecursively(root)

      val perTick = phases.map { case (t, i, s, j, tk) =>
        f"""{"tick":$t,"ingest_sec":$i%.2f,"snapshot_sec":$s%.2f,"jobs":$j,"tasks":$tk}"""
      }.mkString("[", ",", "]")
      val totalRows = rowsPerTick * 5
      val totalSec = phases.map(p => p._2 + p._3).sum + readbackSec
      println(
        f"""{"metric":"stress_r13b","mult":$mult,"rows_per_tick":$rowsPerTick,""" +
        f""""ticks":$perTick,"readback_sec":$readbackSec%.2f,""" +
        f""""dim_rows":$nDim,"dim_read_sec":$dimSec%.2f,""" +
        f""""readback_ids":${agg.getLong(0)},"readback_calls":${agg.getLong(1)},""" +
        f""""total_sec":$totalSec%.2f,""" +
        f""""sec_per_1m_rows":${totalSec / (totalRows / 1e6)}%.3f}""")
    }
    spark.stop()
  }
}
