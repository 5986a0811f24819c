package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the driver contract): runs one
  * query with a job listener and prints per-Spark-job wall times, to
  * attribute engine-round-trip cost between job scheduling and data
  * work. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q34")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "nation", "region").foreach(t =>
      Tables.table(spark, sfDir, t).count())
    Tables.events(spark, sfDir).count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val done = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(s.jobId,
            (System.nanoTime(), s.stageInfos.map(_.numTasks).sum))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(e.jobId)).foreach { case (t0, tasks) =>
            done.synchronized {
              done += ((e.jobId, System.nanoTime() - t0, tasks)) }
          }
        }
      })
    val fn = SparkEntry.queries(SparkEntry.queries.keys.find(_.startsWith(name))
      .getOrElse(sys.error(s"no query $name")))
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    val rows = done.synchronized(done.toList)
    val jobSec = rows.map(_._2).sum / 1e9
    println(f"[scratch] $name%s total=$total%.2fs jobs=${rows.size}%d jobTime=$jobSec%.2fs nonJob=${total - jobSec}%.2fs")
    rows.sortBy(-_._2).take(20).foreach { case (id, ns, tasks) =>
      println(f"[scratch]   job $id%4d ${ns / 1e6}%8.1f ms  $tasks%4d tasks")
    }
    val buckets = rows.groupBy(r => if (r._2 < 100e6) "<100ms"
      else if (r._2 < 300e6) "100-300ms" else if (r._2 < 1e9) "0.3-1s" else ">1s")
    buckets.toSeq.foreach { case (b, rs) =>
      println(f"[scratch]   bucket $b%-9s n=${rs.size}%3d sum=${rs.map(_._2).sum / 1e9}%.2fs")
    }
    spark.stop()
  }
}
