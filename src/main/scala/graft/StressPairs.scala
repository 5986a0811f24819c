package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-order pair-pipeline stress (NOTES round-8 carry-over): the
  * in-JVM Stress run times k-family MinHash pairs BEFORE OPH pairs, so
  * whichever runs second inherits a warm JVM (codegen, shuffle
  * machinery, page cache) and the end-to-end ratio confounds warmup
  * with algorithm. Protocol: run this main TWICE in separate JVMs —
  * `SPARK_GRAFT_ORDER=kfam,oph` and `SPARK_GRAFT_ORDER=oph,kfam` — and
  * report each pipeline's CROSS-ORDER MEAN (its first-position time in
  * one JVM averaged with its second-position time in the other), which
  * cancels the warmup asymmetry exactly.
  *
  *   SPARK_GRAFT_MULT=50 SPARK_GRAFT_ORDER=oph,kfam \
  *     java -cp ... graft.StressPairs
  */
object StressPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "50").toInt
    val order = sys.env.getOrElse("SPARK_GRAFT_ORDER", "kfam,oph")
      .split(",").map(_.trim).toSeq
    val known = Set("kfam", "oph", "prefix")
    require(order.nonEmpty && order.distinct == order &&
        order.forall(known),
      s"SPARK_GRAFT_ORDER must be a subset of $known, got $order")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)

    val docs = StressCorpus.docs(spark, sfDir, mult, cpus.toInt)
    val nDocs = docs.count()

    def timed(f: => Long): (Double, Long) = StressCorpus.timed(f)
    def run(which: String): (Double, Long) = which match {
      case "kfam" => timed(graft.pipeline.Dedup.minhashPairs(
        docs, "doc_id", "text", n = 3, k = 16, rowsPerBand = 4,
        threshold = 0.8).count())
      case "oph" => timed(graft.pipeline.Dedup.ophPairs(
        docs, "doc_id", "text", n = 3, k = 16, rowsPerBand = 4,
        threshold = 0.8).count())
      // the exact PPJoin pipeline, standalone — its verbatim-copy
      // worst case is output-bound-quadratic and can exceed local
      // spill space inside the full Stress run; here it gets the
      // whole disk to itself so the growth curve is measurable
      case "prefix" => timed(graft.pipeline.Dedup.prefixFilterPairs(
        docs, "doc_id", "text", 3, 0.8).count())
    }
    val results = order.map(w => w -> run(w))
    val json =
      s"""{"metric":"stress_pairs","mult":$mult,"n_docs":$nDocs,""" +
        s""""order":"${order.mkString(",")}",""" +
        results.map { case (w, (sec, pairs)) =>
          s""""${w}_sec":$sec,"${w}_pairs":$pairs"""
        }.mkString(",") +
        s""","sf":"$sfDir"}"""
    spark.stop()
    println(json)
  }
}
