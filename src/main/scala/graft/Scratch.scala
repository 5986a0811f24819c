package graft

import org.apache.spark.sql.functions._

/** Throwaway investigation main (not part of the library surface):
  * decompose p69_stream_cc's ~6 s bench cost (round-12 VERDICT item
  * 4) into its components — micro-batch scheduling vs the
  * ccIncremental fold work itself — by driving the same four edge
  * batches through (a) the real 4-trigger stream, (b) one
  * AvailableNow trigger carrying all four files, (c) the four folds
  * with NO streaming machinery at all, and (d) a single one-shot fold
  * of the union. Per-fold star-round counts are printed so the
  * logarithmic-fold floor is visible. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)
    import spark.implicits._

    val edges = Tables.events(spark, sfDir).filter(col("user_id") % 4 === 1)
      .select(col("user_id").as("i"),
        (lit(1000000L) + col("event_id") % 100).as("j"),
        (col("event_id") % 4).as("b"))
      .localCheckpoint()
    println(s"[p69] edges=${edges.count()}")
    def timed(label: String)(f: => Long): Unit = {
      val (sec, rows) = StressCorpus.timed(f)
      println(f"[p69] $label: $sec%.2f s ($rows rows)")
    }

    // (a) the real p69 shape: 4 files, maxFilesPerTrigger=1
    def streamRun(filesPerTrigger: Int): Long = {
      val dir = graft.TempDirs.scoped(s"graft_scr_cc$filesPerTrigger")
      val tmp = graft.TempDirs.scoped(s"graft_scr_parts$filesPerTrigger")
      (0 to 3).foreach { b =>
        val part = tmp.resolve(s"b$b")
        edges.filter(col("b") === b).select(col("i"), col("j"))
          .coalesce(1).write.mode("overwrite").parquet(part.toString)
        val f = java.nio.file.Files.list(part).filter(p =>
          p.getFileName.toString.startsWith("part-")).findFirst().get()
        val dst = dir.resolve(s"batch$b.parquet")
        java.nio.file.Files.copy(f, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + b * 60000L))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("j",
          org.apache.spark.sql.types.LongType)))
      val st = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .parquet(dir.toString)
      graft.streaming.StreamCc.run(spark, st).count()
    }
    timed("stream 4 triggers (p69 shape), warm")(streamRun(1))
    timed("stream 4 triggers (p69 shape)")(streamRun(1))
    timed("stream 1 trigger (all 4 files)")(streamRun(4))

    // (c) the same four folds, no streaming machinery
    timed("4 folds, no streaming") {
      var labels = Seq.empty[(Long, Long)].toDF("id", "cluster")
      (0 to 3).foreach { b =>
        val (next, rounds) = graft.pipeline.Dedup.ccIncrementalWithRounds(
          labels, edges.filter(col("b") === b).select(col("i"), col("j")),
          "id")
        println(s"[p69]   fold $b rounds=$rounds")
        labels = next.select(col("id"), col("cluster")).localCheckpoint()
      }
      labels.count()
    }

    // (d) one-shot fold of the union
    timed("1 fold of the union") {
      val (l, rounds) = graft.pipeline.Dedup.ccIncrementalWithRounds(
        Seq.empty[(Long, Long)].toDF("id", "cluster"),
        edges.select(col("i"), col("j")), "id")
      println(s"[p69]   union rounds=$rounds")
      l.count()
    }
    spark.stop()
  }
}
