package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone run of the six round-9 stress axes (rrf gate-vs-window,
  * vocab range rank, prefix-filter worst case, column profile,
  * self-repeat, interval merge) — isolated from the ~40-axis full
  * Stress run so each axis gets the whole box (the full run's tail
  * axes inherit whatever memory/disk pressure the earlier monsters
  * left; this main is the clean per-axis growth curve).
  *
  *   SPARK_GRAFT_MULT=100 java -cp ... graft.StressR9
  */
object StressR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)

    val big = StressCorpus.big(spark, sfDir, mult, cpus.toInt)
    val n = big.count()
    val docs = StressCorpus.docs(spark, sfDir, mult, cpus.toInt)
    val nDocs = docs.count()

    def timed(f: => Long): (Double, Long) = StressCorpus.timed(f)

    // rrf: gate+count vs the corpus-global window form
    val scored = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("s0"),
        pmod(graft.pipeline.Hashing.h60(col("doc_id").cast("string")),
          lit(1000003L)).as("s1"))
      .localCheckpoint()
    val (rrfSec, _) = timed(graft.pipeline.Sampling.rrfFusion(
      scored, "doc_id", Seq(col("s0"), col("s1")),
      k = 60, topN = 100).count())
    val (rrfWinSec, _) = timed(graft.pipeline.Sampling.rrfFusionWindowed(
      scored, "doc_id", Seq(col("s0"), col("s1")), 60, 100).count())

    val (vocabSec, vocabRows) = timed(
      graft.pipeline.TextOps.vocabCoverage(docs, "text", 900000L).count())

    val (pfxSec, pfxPairs) =
      try timed(graft.pipeline.Dedup.prefixFilterPairs(
        docs, "doc_id", "text", 3, 0.8).count())
      catch { case e: Throwable =>
        System.err.println(s"[stressr9] prefix failed: ${e.getMessage}")
        (-1.0, -1L)
      }

    val (profSec, profCols) = timed(
      graft.pipeline.Profiling.columnProfile(
        big.select(col("srvid"), col("user_id"), col("event_type"),
          col("record.value").as("value"))).count())

    val (selfSec, selfDocs) = timed(
      graft.pipeline.TextOps.longestSelfRepeat(docs, "doc_id", "text",
        k = 5).count())

    val (imSec, imRows) = timed {
      val ivals = big.select(col("user_id"),
        unix_micros(col("record.ts")).as("start_us"),
        (unix_micros(col("record.ts")) + 1800L * 1000000L).as("end_us"))
      graft.pipeline.Sessions.mergeIntervals(ivals, "user_id",
        "start_us", "end_us").count()
    }

    val json =
      s"""{"metric":"stress_r9","mult":$mult,"rows":$n,"n_docs":$nDocs,""" +
        s""""rrf_sec":$rrfSec,"rrf_windowed_sec":$rrfWinSec,""" +
        s""""vocab_sec":$vocabSec,"vocab_rows":$vocabRows,""" +
        s""""prefix_sec":$pfxSec,"prefix_pairs":$pfxPairs,""" +
        s""""profile_sec":$profSec,"profile_cols":$profCols,""" +
        s""""selfrep_sec":$selfSec,"selfrep_docs":$selfDocs,""" +
        s""""imerge_sec":$imSec,"imerge_merged":$imRows,""" +
        s""""sf":"$sfDir"}"""
    spark.stop()
    println(json)
  }
}
