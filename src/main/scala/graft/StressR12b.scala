package graft

import org.apache.spark.sql.functions.{col => c}

/** Round-12b stress axes — the session's three additions, each with
  * the scale claim it ships under:
  *
  * IVF REBALANCE vs FRESH BUILD: rebalance is retrain + reassign over
  * the index's own corpus, so its cost must track a fresh build at the
  * same corpus size (both are iters+1 corpus projections against a
  * driver-resident codebook + one corpus rewrite) — if rebalance grew
  * a superlinear term the maintenance story would be "rebuild
  * elsewhere and swap", not "rebalance in place". Measured at 1× and
  * MULT× the sf corpus; claim: rebalance_sec / build_sec ≈ 1 at both
  * sizes, and per-vector cost flat or falling with size.
  *
  * HEALTH REPORT: one k-bounded aggregate over the cells tier — must
  * cost about a corpus scan, far under any mutation, or nobody runs
  * it before deciding to rebalance.
  *
  * DSIR WEIGHTS: one corpus explode into a buckets-bounded model
  * aggregate + a broadcast re-join; per-doc cost must be flat as the
  * corpus grows (the models stay `buckets`-sized by construction).
  * Measured at 1× and MULT× document multiplicity.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_MULT=5 \
  *     sbt "runMain graft.StressR12b"
  */
object StressR12b {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = StressCorpus.session(cpus)
    import graft.pipeline.{Similarity, TextOps}

    // ---- IVF rebalance vs fresh build, 1× and mult× ----
    def vecsAt(m: Int) = {
      val base = Tables.embeddings(spark, sfDir)
        .select(c("vec_id"), c("embedding"))
      (if (m <= 1) base
       else base.crossJoin(spark.range(m).select(c("id").as("rep")))
         .select((c("vec_id") + c("rep") * 10000000L).as("vec_id"),
           c("embedding")))
        .repartition(cpus.toInt * 2).localCheckpoint()
    }
    def rebAxis(m: Int): (Long, Double, Double, Double) = {
      val vecs = vecsAt(m)
      val n = vecs.count()
      val cb = vecs.select(c("vec_id").cast("long"),
          Similarity.asDouble(c("embedding")).as("v"))
        .filter(c("vec_id") < 16).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val root = java.nio.file.Files.createTempDirectory("graft_reb12")
      val (buildSec, _) = StressCorpus.timed {
        Similarity.saveIvfIndexStore(vecs, "vec_id", "embedding", cb,
          root.toString, "reb", 1, nprobeDefault = 2); n
      }
      val (healthSec, _) = StressCorpus.timed(
        Similarity.ivfIndexHealth(spark, root.toString, "reb", 1).count())
      val (rebSec, _) = StressCorpus.timed {
        Similarity.rebalanceIvfIndexStore(spark, root.toString, "reb", 1,
          iters = 1); n
      }
      graft.core.AtomicSwap.deleteRecursively(root)
      (n, buildSec, rebSec, healthSec)
    }
    val (n1, build1, reb1, health1) = rebAxis(1)
    val (nM, buildM, rebM, healthM) = rebAxis(mult)

    // ---- DSIR weights, 1× and mult× ----
    def docsAt(m: Int) = {
      val base = Tables.documents(spark, sfDir)
        .select(c("doc_id"), c("text"), c("source"))
      (if (m <= 1) base
       else base.crossJoin(spark.range(m).select(c("id").as("rep")))
         .select((c("doc_id") + c("rep") * 10000000L).as("doc_id"),
           c("text"), c("source")))
        .repartition(cpus.toInt * 2).localCheckpoint()
    }
    // median of 3 reps: the dominant cost is one checkpoint write of
    // the hashed-feature frame, and single-rep wall-clock on this box
    // spreads ~7× under background load (same rule as the bench's
    // warmup reps — measure steady state, not the box)
    def dsirAxis(m: Int): (Long, Double) = {
      val docs = docsAt(m)
      val n = docs.count()
      val reps = (1 to 3).map { _ =>
        StressCorpus.timed(
          TextOps.dsirWeights(docs, "doc_id", "text",
            isTarget = c("source") === "src0", buckets = 10000).count())._1
      }.sorted
      (n, reps(1))
    }
    dsirAxis(1) // warm: codegen + shuffle layout
    val (d1, dsir1) = dsirAxis(1)
    val (dM, dsirM) = dsirAxis(mult)

    // ---- batched PQ kNN join vs Q single probes ----
    // The claim pqKnnJoinStore exists for: Q queries cost ONE codes
    // scan, not Q. Median-of-3 per arm (same box-spread rule).
    val pqVecs = vecsAt(mult)
    val nPq = pqVecs.count()
    val pqRoot = java.nio.file.Files.createTempDirectory("graft_pqknn12")
    graft.pipeline.Similarity.savePqIndexStore(pqVecs, "vec_id",
      "embedding", dim = 64, m = 8, k = 16, iters = 1,
      pqRoot.toString, "pq", 1)
    val qIds = (0 until 8).map(_ * 100L)
    val qVecs = qIds.map { id =>
      id -> pqVecs.filter(c("vec_id") === id)
        .select(Similarity.asDouble(c("embedding"))).collect()(0)
        .getSeq[Double](0).toSeq
    }
    val qBatch = pqVecs.filter(c("vec_id").isin(qIds: _*))
      .select(c("vec_id"), c("embedding")).localCheckpoint()
    def med3(f: => Long): Double =
      (1 to 3).map(_ => StressCorpus.timed(f)._1).sorted.apply(1)
    val singles8Sec = med3(qVecs.map { case (id, qv) =>
      Similarity.probePqIndexStore(spark, pqRoot.toString, "pq", 1, qv,
        Some(id), 100).count()
    }.sum)
    val batch8Sec = med3(Similarity.pqKnnJoinStore(spark,
      pqRoot.toString, "pq", 1, qBatch, "vec_id", "embedding",
      100).count())
    graft.core.AtomicSwap.deleteRecursively(pqRoot)

    val json =
      s"""{"metric":"stress_r12b","mult":$mult,""" +
        s""""ivf_vecs_1x":$n1,"ivf_build_1x_sec":$build1,""" +
        s""""ivf_rebalance_1x_sec":$reb1,"ivf_health_1x_sec":$health1,""" +
        s""""ivf_vecs_Mx":$nM,"ivf_build_Mx_sec":$buildM,""" +
        s""""ivf_rebalance_Mx_sec":$rebM,"ivf_health_Mx_sec":$healthM,""" +
        s""""dsir_docs_1x":$d1,"dsir_1x_sec":$dsir1,""" +
        s""""dsir_docs_Mx":$dM,"dsir_Mx_sec":$dsirM,""" +
        s""""pqknn_vecs":$nPq,"pq_single_probes_8_sec":$singles8Sec,""" +
        s""""pq_batch_join_8_sec":$batch8Sec}"""
    spark.stop()
    println(json)
  }
}
