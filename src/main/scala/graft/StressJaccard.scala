package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused stress axis (VERDICT r7 item 7): quantify the p05 exact
  * inverted-index Jaccard's hot-shingle quadratic hazard against the
  * df-capped variant and the MinHash+LSH production path, on the same
  * web-crawl-style multiplied corpus Stress.scala uses (verbatim copies
  * → every shingle's document frequency scales with the multiplier, so
  * the uncapped pair join emits Θ(mult²) rows per base shingle — the
  * worst case, on purpose).
  *
  * Run: SPARK_GRAFT_MULT=20 sbt "runMain graft.StressJaccard"
  * Emits one JSON line; rows land in SCALE.md "hot-shingle stress".
  */
object StressJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "20").toInt
    val dfCap = sys.env.getOrElse("SPARK_GRAFT_DFCAP", "50").toLong
    val skipExact = sys.env.get("SPARK_GRAFT_SKIP_EXACT").contains("true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same corpus shape as Stress.scala's dedup axis: verbatim copies,
    // a third with a rep-specific token so cardinality also grows
    val docs = Tables.documents(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" rep"), col("rep")))
          .otherwise(col("text")).as("text"))
      .repartition(cpus.toInt * 2)
      .localCheckpoint()
    val nDocs = docs.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val (exactSec, exactPairs) =
      if (skipExact) (-1.0, -1L)
      else timed(pipeline.Dedup.jaccardPairs(
        docs, "doc_id", "text", n = 5, threshold = 0.8).count())
    val (cappedSec, cappedPairs) = timed(pipeline.Dedup.jaccardPairs(
      docs, "doc_id", "text", n = 5, threshold = 0.8, dfCap = dfCap).count())
    val (lshSec, lshPairs) = timed(pipeline.Dedup.minhashPairs(
      docs, "doc_id", "text", n = 3, k = 16, rowsPerBand = 4,
      threshold = 0.8).count())

    spark.stop()
    println(
      s"""{"metric":"jaccard_stress","mult":$mult,"n_docs":$nDocs,""" +
      s""""df_cap":$dfCap,""" +
      s""""exact_sec":$exactSec,"exact_pairs":$exactPairs,""" +
      s""""capped_sec":$cappedSec,"capped_pairs":$cappedPairs,""" +
      s""""lsh_sec":$lshSec,"lsh_pairs":$lshPairs,""" +
      s""""sf":"$sfDir"}""")
  }
}
