package graft

import org.apache.spark.sql.SparkSession

/** Round-12 stress axes — the fleet-admin seams the round-11 verdict
  * left open.
  *
  * CONFIG SWEEP AT 1000 SERVERS (verdict item 3): configureServer is a
  * read-merge-rewrite of the whole servers table per call, so an
  * admin sweep retuning N servers costs O(N × fleet) bytes — the same
  * quadratic shape registerServer had before registerServers. The
  * batched configureServers must make the sweep ONE table rewrite:
  * claim under measurement is sweep_batch ≈ one configureServer call,
  * and sweep_seq / sweep_batch growing with the sweep size. Same
  * comparison for dropServers (4 table rewrites total vs 4 per id).
  *
  * FLEET AT 10,000 SERVERS (verdict item 7): registry layout v3
  * claims ~1 ms/server idle ticks, measured to 1000 last round. One
  * 10× probe confirms no NEW superlinear term (a 10k-entry metas
  * directory, lock contention, due-list scan) before the design is
  * declared fleet-complete: idle_ms_per_server at 10k should match
  * the 1000-server row's, and registration stays one table write.
  *
  *   SPARK_GRAFT_FLEET=1000 SPARK_GRAFT_FLEET10K=10000 \
  *     sbt "runMain graft.StressR12"
  */
object StressR12 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val nFleet = sys.env.getOrElse("SPARK_GRAFT_FLEET", "1000").toInt
    val nSweep = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "100").toInt
    val nBig = sys.env.getOrElse("SPARK_GRAFT_FLEET10K", "10000").toInt
    val spark: SparkSession = StressCorpus.session(cpus)

    def cfg(i: Int) = graft.core.ServerConfig(id = i, hostname = s"h$i",
      powaCoalesce = 1000, retentionSec = 3650L * 86400)

    // ---- config-sweep axis at nFleet servers ----
    val root = java.nio.file.Files.createTempDirectory("graft_fleet12")
    val eng = new graft.core.Engine(spark, root.toString)
    eng.registry.registerServers((1 to nFleet).map(cfg))
    val sweepIds = 1 to nSweep
    val t0seq = System.nanoTime()
    sweepIds.foreach(i =>
      eng.registry.configureServer(i, _.copy(frequencySec = 600)))
    val sweepSeqSec = (System.nanoTime() - t0seq) / 1e9
    val t0bat = System.nanoTime()
    eng.registry.configureServers(sweepIds.map(i =>
      i -> ((c: graft.core.ServerConfig) => c.copy(frequencySec = 900))))
    val sweepBatchSec = (System.nanoTime() - t0bat) / 1e9
    // one single-server call for the "batch ≈ one call" claim
    val t0one = System.nanoTime()
    eng.registry.configureServer(1, _.copy(frequencySec = 1200))
    val oneCfgSec = (System.nanoTime() - t0one) / 1e9

    // drop sweep: batched = 4 table rewrites total, sequential = 4 per id
    val dropIds = (nFleet - nSweep + 1) to nFleet
    val half = dropIds.splitAt(dropIds.size / 2)
    val t0dseq = System.nanoTime()
    half._1.foreach(eng.registry.dropServer)
    val dropSeqSec = (System.nanoTime() - t0dseq) / 1e9
    val t0dbat = System.nanoTime()
    eng.registry.dropServers(half._2.toSet)
    val dropBatchSec = (System.nanoTime() - t0dbat) / 1e9
    graft.core.AtomicSwap.deleteRecursively(root)

    // ---- 10k-server fleet axis ----
    val bigRoot = java.nio.file.Files.createTempDirectory("graft_fleet12b")
    val big = new graft.core.Engine(spark, bigRoot.toString)
    val t0reg = System.nanoTime()
    big.registry.registerServers((1 to nBig).map(cfg))
    val registerBigSec = (System.nanoTime() - t0reg) / 1e9
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    var tick = 0
    def idleTick(): Double = {
      tick += 1
      val now = new java.sql.Timestamp(base + tick * 300000L)
      val t0 = System.nanoTime()
      big.tickDue(now)
      (System.nanoTime() - t0) / 1e9
    }
    idleTick() // warm: first-touch layout + codegen
    val idleBigSec = (idleTick() + idleTick()) / 2
    val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val idleBigSec2 = idleTick()
    val idleBigJobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0
    graft.core.AtomicSwap.deleteRecursively(bigRoot)

    // ---- admission under lock contention ----
    // The index MutationLock is BLOCKING (maintenance writes queue).
    // Claim: N concurrent appenders to ONE index serialize without
    // collapse — aggregate wall-clock ≈ the sequential sum (the lock
    // adds queueing, not convoy overhead), and nothing is lost.
    val vecs = Tables.embeddings(spark, sys.env.getOrElse(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .localCheckpoint()
    val cbIdx = vecs.select(
        org.apache.spark.sql.functions.col("vec_id").cast("long"),
        graft.pipeline.Similarity.asDouble(
          org.apache.spark.sql.functions.col("embedding")).as("v"))
      .filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val lockRoot = java.nio.file.Files.createTempDirectory("graft_lock12")
    def quarter(r: Int) = vecs.filter(
      org.apache.spark.sql.functions.col("vec_id") % 4 === r)
    graft.pipeline.Similarity.saveIvfIndexStore(quarter(0), "vec_id",
      "embedding", cbIdx, lockRoot.toString, "seq", 1)
    val t0s = System.nanoTime()
    (1 to 3).foreach(r => graft.pipeline.Similarity.appendIvfIndexStore(
      quarter(r), "vec_id", "embedding", lockRoot.toString, "seq", 1))
    val admitSeqSec = (System.nanoTime() - t0s) / 1e9
    graft.pipeline.Similarity.saveIvfIndexStore(quarter(0), "vec_id",
      "embedding", cbIdx, lockRoot.toString, "con", 1)
    val t0c = System.nanoTime()
    val threads = (1 to 3).map { r =>
      val t = new Thread(() =>
        graft.pipeline.Similarity.appendIvfIndexStore(
          quarter(r), "vec_id", "embedding", lockRoot.toString, "con", 1))
      t.start(); t
    }
    threads.foreach(_.join())
    val admitConSec = (System.nanoTime() - t0c) / 1e9
    val conRows = graft.pipeline.Similarity.loadIvfIndexStore(
      spark, lockRoot.toString, "con", 1)._1.count()
    graft.core.AtomicSwap.deleteRecursively(lockRoot)

    // ---- persisted-PQ axis: train-once-probe-many vs per-call ----
    // The claim the persisted PQ index exists for: the per-call pqTopK
    // re-trains and re-encodes the corpus EVERY query; the persisted
    // form pays that once (build) and each probe is one scan of the
    // codes tier (m small ints per vector, raw vectors untouched).
    import org.apache.spark.sql.functions.{col => c}
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "50").toInt
    val bigVecs = Tables.embeddings(spark, sys.env.getOrElse(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .crossJoin(spark.range(mult).select(c("id").as("rep")))
      .select((c("vec_id") + c("rep") * 10000000L).as("vec_id"),
        c("embedding"))
      .repartition(cpus.toInt * 2).localCheckpoint()
    val nPqVecs = bigVecs.count()
    val qv = bigVecs.filter(c("vec_id") === 0L)
      .select(graft.pipeline.Similarity.asDouble(c("embedding")))
      .collect()(0).getSeq[Double](0).toSeq
    val pqRoot = java.nio.file.Files.createTempDirectory("graft_pq12")
    val (pqCallSec, _) = StressCorpus.timed(
      graft.pipeline.Similarity.pqTopK(bigVecs, "vec_id", "embedding",
        queryId = 0L, dim = 64, m = 8, k = 16, iters = 1,
        topK = 100).count())
    val (pqBuildSec, _) = StressCorpus.timed {
      graft.pipeline.Similarity.savePqIndexStore(bigVecs, "vec_id",
        "embedding", dim = 64, m = 8, k = 16, iters = 1,
        pqRoot.toString, "pq", 1); nPqVecs
    }
    def probeOnce(): Long = graft.pipeline.Similarity.probePqIndexStore(
      spark, pqRoot.toString, "pq", 1, qv, Some(0L), 100).count()
    probeOnce() // warm
    val (pqProbeSec, _) = StressCorpus.timed(probeOnce())
    val (pqAdmitSec, _) = StressCorpus.timed {
      graft.pipeline.Similarity.appendPqIndexStore(
        bigVecs.filter(c("vec_id") % 10 === 3).limit(2000)
          .select((c("vec_id") + 10000000000L).as("vec_id"),
            c("embedding")),
        "vec_id", "embedding", pqRoot.toString, "pq", 1); 2000L
    }
    graft.core.AtomicSwap.deleteRecursively(pqRoot)

    val json =
      s"""{"metric":"stress_r12","fleet":$nFleet,"sweep":$nSweep,""" +
        s""""pq_vecs":$nPqVecs,"pq_percall_sec":$pqCallSec,""" +
        s""""pq_build_sec":$pqBuildSec,"pq_probe_sec":$pqProbeSec,""" +
        s""""pq_admit2k_sec":$pqAdmitSec,""" +
        s""""admit3_seq_sec":$admitSeqSec,""" +
        s""""admit3_contended_sec":$admitConSec,""" +
        s""""admit3_contended_rows":$conRows,""" +
        s""""sweep_seq_sec":$sweepSeqSec,""" +
        s""""sweep_batch_sec":$sweepBatchSec,""" +
        s""""one_config_sec":$oneCfgSec,""" +
        s""""drop_seq_sec":$dropSeqSec,"drop_seq_n":${half._1.size},""" +
        s""""drop_batch_sec":$dropBatchSec,"drop_batch_n":${half._2.size},""" +
        s""""fleet_big":$nBig,"register_big_sec":$registerBigSec,""" +
        s""""idle_big_sec":$idleBigSec,"idle_big_sec2":$idleBigSec2,""" +
        s""""idle_big_jobs":$idleBigJobs,""" +
        s""""idle_big_ms_per_server":${idleBigSec / nBig * 1000}}"""
    spark.stop()
    println(json)
  }
}
