package graft

import org.apache.spark.sql.functions._

/** Throwaway investigation main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = StressCorpus.session("8")
    // hard-fail on any whole-stage-codegen compile error instead of the
    // silent interpreted fallback — the repro for the PQ Janino overflow
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val vecs = Tables.embeddings(spark, sfDir)
    val out = graft.pipeline.Similarity.pqTopK(vecs, "vec_id", "embedding",
      queryId = 0L, dim = 64, m = 8, k = 16, iters = 1, topK = 100)
    println("PQ_ROWS=" + out.count())
    val out2 = graft.pipeline.Similarity.ivfPqTopK(vecs, "vec_id",
      "embedding", queryId = 0L, dim = 64, nCentroids = 16, m = 8, k = 16,
      iters = 1, candidates = 100, topK = 10)
    println("IVFPQ_ROWS=" + out2.count())
    spark.stop()
  }
}
