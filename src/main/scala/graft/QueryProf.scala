package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Throwaway per-query job profiler (optimization guide §1.1): runs the
  * named queries once each with a SparkListener attached and prints,
  * per query, the Spark-job count, summed job wall-clock vs the query's
  * end-to-end wall-clock (the gap is DRIVER-side work: planning,
  * filesystem protocol ops, waits), task counts, and the slowest jobs
  * with their descriptions. The decomposition tool for orchestration-
  * heavy queries (engine round-trips, index lifecycles, streams) where
  * `explain` shows nothing — their cost is many small jobs plus driver
  * work between them, not one bad plan. */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench so first-job startup is not misattributed
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    Tables.events(spark, sfDir).count()

    case class Job(id: Int, desc: String, start: Long,
        var end: Long = 0L, var nTasks: Int = 0, var taskTimeMs: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs(e.jobId) = Job(e.jobId, desc, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        // attribute tasks to the job via the stage->job mapping Spark
        // exposes in stageInfo is overkill here; use the last started
        // job (queries here run jobs sequentially)
        if (jobs.nonEmpty) {
          val j = jobs.values.last
          j.nTasks += 1
          if (e.taskInfo != null) j.taskTimeMs += e.taskInfo.duration
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (q <- args) {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let stragglers land
      Thread.sleep(300)
      jobs.synchronized {
        val js = jobs.values.toVector
        val jobWall = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        val taskSec = js.map(_.taskTimeMs).sum / 1e3
        println(f"[prof] $q wall=$wall%.2f s jobs=${js.size} " +
          f"jobWall=$jobWall%.2f s driverGap=${wall - jobWall}%.2f s " +
          f"tasks=${js.map(_.nTasks).sum} taskTime=$taskSec%.2f s")
        js.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
          println(f"[prof]   job ${j.id}%4d ${(j.end - j.start) / 1e3}%6.2f s " +
            f"tasks=${j.nTasks}%4d ${j.desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
