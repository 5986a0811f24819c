package graft

import org.apache.spark.sql.functions._

/** Throwaway investigation main (not part of the library surface):
  * time the PQ family on the native-argmin build at the stress shape. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)
    val vecs = Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(cpus.toInt * 2).localCheckpoint()
    println(s"[pq] vectors=${vecs.count()} mult=$mult cpus=$cpus")
    def timed(label: String)(f: => Long): Unit = {
      val (sec, rows) = StressCorpus.timed(f)
      println(f"[pq] $label: $sec%.2f s ($rows rows)")
    }
    timed("pqTopK warm")(
      graft.pipeline.Similarity.pqTopK(vecs, "vec_id", "embedding",
        queryId = 0L, dim = 64, m = 8, k = 16, iters = 1,
        topK = 100).count())
    timed("pqTopK")(
      graft.pipeline.Similarity.pqTopK(vecs, "vec_id", "embedding",
        queryId = 0L, dim = 64, m = 8, k = 16, iters = 1,
        topK = 100).count())
    timed("ivfPqTopK")(
      graft.pipeline.Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        queryId = 0L, dim = 64, nCentroids = 16, m = 8, k = 16,
        iters = 1, candidates = 100, topK = 10).count())
    spark.stop()
  }
}
