package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH band/row tuning grid (NOTES carry-over; the config-sweep half of
  * the p131 estimator audit): measured recall of MinHash+LSH near-dup
  * detection against the exact n-gram-Jaccard baseline, across the
  * (k, rowsPerBand) grid, on the real documents table. Because every
  * LSH candidate is verified with exact Jaccard (minhashPairs), the
  * found pairs are a SUBSET of the exact baseline — precision is 1 by
  * construction and recall is the whole tuning story, traded against
  * candidate-set size (the join cost the bands control).
  *
  * For threshold t and a pair with true Jaccard s, textbook hit
  * probability is 1 − (1 − s^r)^b (r = rowsPerBand, b = k/r); the grid
  * prints measured recall next to that prediction evaluated at s = t
  * (the worst in-scope pair), so the table shows both "what theory
  * promises at the threshold" and "what the corpus actually got".
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 java -cp ... graft.LshGrid
  */
object LshGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val threshold = 0.8
    val n = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)

    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    val nDocs = docs.count()
    // exact baseline: every pair with J >= t (lossless, the oracle of
    // p05); small corpora only — this is the measurement harness, the
    // production path stays LSH
    val exact = graft.pipeline.Dedup
      .jaccardPairs(docs, "doc_id", "text", n, threshold)
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = for {
      k <- Seq(8, 16, 32)
      r <- Seq(2, 4, 8) if r <= k && k % r == 0
    } yield (k, r)
    // the shingle frame is (k, r)-independent: built once for the
    // whole sweep; each cell builds its candidate frame ONCE, counts
    // it, and verifies the SAME frame (pre-refactor every cell ran
    // the signature+banding pipeline twice)
    val hsh = graft.pipeline.Dedup.hashedShingles(docs, "doc_id", "text", n)
      .localCheckpoint()
    val rows = grid.map { case (k, r) =>
      val cands = graft.pipeline.Dedup.candidatesFromSignatures(
        graft.pipeline.Dedup.signaturesFromHashed(hsh, k), k, r)
        .localCheckpoint()
      val nCands = cands.count()
      val found = graft.pipeline.Dedup
        .verifyJaccardPairs(hsh, cands, threshold)
        .select(col("i"), col("j")).collect()
        .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
      val hit = (found & exact).size
      val b = k / r
      val predicted = 1.0 - math.pow(1.0 - math.pow(threshold, r), b)
      val recall = if (exact.isEmpty) 1.0 else hit.toDouble / exact.size
      f"""{"k":$k,"rows_per_band":$r,"bands":$b,"candidates":$nCands,""" +
        f""""found":${found.size},"recall":$recall%.4f,""" +
        f""""predicted_at_t":$predicted%.4f}"""
    }
    val json =
      s"""{"metric":"lsh_grid","n_docs":$nDocs,"threshold":$threshold,""" +
        s""""ngram":$n,"exact_pairs":${exact.size},""" +
        s""""grid":[${rows.mkString(",")}],"sf":"$sfDir"}"""
    spark.stop()
    println(json)
  }
}
