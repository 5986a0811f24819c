package graft

import org.apache.spark.sql.functions._

/** Throwaway investigation main (not part of the library surface):
  * profile the readback+rates axis bend (SCALE m50 414k -> m200 265k
  * output rows/s) — attribute time between the coalesce feed, the
  * union/explode, and the rate window, and surface spill metrics. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)
    val big = StressCorpus.big(spark, sfDir, mult, cpus.toInt)
    println(s"[prof] rows=${big.count()} mult=$mult")

    import org.apache.spark.scheduler._
    val stageSpill = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        stageSpill.put(s.stageInfo.stageId,
          (m.memoryBytesSpilled, m.diskBytesSpilled, m.executorRunTime))
      }
    })

    val split = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // piece 1: the coalesce feed alone
    val hist = graft.operators.Coalesce.aggregate(
      big.filter(col("record.ts") < split), EventsSource.spec)
    timed("coalesce(hist) count")(hist.count())
    val histC = hist.localCheckpoint()
    // piece 2: series (union + explode) from the checkpointed hist
    val series = graft.operators.Readback.series(
      big.filter(col("record.ts") >= split), histC, EventsSource.spec,
      lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
    timed("series (union+explode) count")(series.count())
    // piece 3: the rate window on top
    val n = timed("series + withRates count")(
      graft.operators.DeltaRate.withRates(series, EventsSource.spec).count())
    println(s"[prof] output rows=$n")
    // piece 4: the full fused axis as Stress measures it
    val full = timed("FULL axis (hist not checkpointed)")(
      graft.operators.DeltaRate.withRates(
        graft.operators.Readback.series(
          big.filter(col("record.ts") >= split), hist, EventsSource.spec,
          lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
          lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))),
        EventsSource.spec).count())
    println(s"[prof] full rows=$full")
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val spills = stageSpill.asScala.toSeq.filter(e => e._2._1 > 0 || e._2._2 > 0)
    println(s"[prof] stages with spill: ${spills.size}")
    spills.sortBy(-_._2._2).take(10).foreach { case (id, (mem, disk, rt)) =>
      println(f"[prof]   stage $id%4d memSpill=${mem / 1e6}%.0fMB diskSpill=${disk / 1e6}%.0fMB runTime=${rt / 1e3}%.1fs")
    }
    spark.stop()
  }
}
