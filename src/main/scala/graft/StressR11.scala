package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 stress axes.
  *
  * FLEET AT 1000 SERVERS: the 100-TB story claims 1000-executor
  * deployments, and SCALE's fleet table previously stopped at 100
  * registered servers. The risk at 10× is the DRIVER-side work: the
  * due-server list is computed from the registry every tick, and each
  * due server pays a per-(server, datasource) staging probe plus a
  * per-server meta write even when idle. Claim under measurement:
  *   - an IDLE tick plans ZERO Spark jobs (the directory-probe fast
  *     path skips every idle pair), so its cost is pure filesystem
  *     probes + meta writes — linear in fleet size with a tiny
  *     constant, no job-scheduling floor;
  *   - a tick with data staged on a 5-server subset costs O(staged),
  *     with the idle remainder adding only the probe floor — the
  *     staged-tick time at 1000 servers should track the 100-server
  *     row plus the measured idle floor, NOT 10× the work.
  *
  *   SPARK_GRAFT_FLEET=1000 sbt "runMain graft.StressR11"
  */
object StressR11 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val nFleet = sys.env.getOrElse("SPARK_GRAFT_FLEET", "1000").toInt
    val spark: SparkSession = StressCorpus.session(cpus)
    import spark.implicits._

    val fleetRoot = java.nio.file.Files.createTempDirectory("graft_fleet11")
    val fleet = new graft.core.Engine(spark, fleetRoot.toString)
    val t0reg = System.nanoTime()
    (1 to nFleet).foreach(i => fleet.registry.registerServer(
      graft.core.ServerConfig(id = i, hostname = s"h$i",
        powaCoalesce = 1000, retentionSec = 3650L * 86400)))
    val registerSec = (System.nanoTime() - t0reg) / 1e9

    // batch-registration comparator on a second root: one merged table
    // write + per-server text meta rows vs one-at-a-time's O(fleet²)
    val batchRoot = java.nio.file.Files.createTempDirectory("graft_fleet11b")
    val batchEng = new graft.core.Engine(spark, batchRoot.toString)
    val t0batch = System.nanoTime()
    batchEng.registry.registerServers((1 to nFleet).map(i =>
      graft.core.ServerConfig(id = i, hostname = s"h$i",
        powaCoalesce = 1000, retentionSec = 3650L * 86400)))
    val registerBatchSec = (System.nanoTime() - t0batch) / 1e9
    graft.core.AtomicSwap.deleteRecursively(batchRoot)

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    var tick = 0
    def oneTick(staged: Seq[Int]): Double = {
      tick += 1
      if (staged.nonEmpty)
        fleet.ingest("powa_stat_bgwriter",
          staged.map(sv => (sv,
            new java.sql.Timestamp(base + tick * 300000L),
            100L * tick, 10L * tick, 5L * tick, 2L * tick, 1L * tick))
            .toDF("srvid", "ts", "buffers_clean", "maxwritten_clean",
              "buffers_backend", "buffers_backend_fsync", "buffers_alloc"))
      val now = new java.sql.Timestamp(base + tick * 300000L)
      val t0 = System.nanoTime()
      fleet.tickDue(now)
      (System.nanoTime() - t0) / 1e9
    }
    oneTick(1 to 5) // warm: first-touch layout + codegen
    val stagedSec = (oneTick(1 to 5) + oneTick(1 to 5)) / 2
    val idleSec = (oneTick(Nil) + oneTick(Nil)) / 2

    // Batched-BPE speedup axis (round-10 VERDICT item 5's SCALE half):
    // merge rounds dominate training once the corpus pass is paid, so
    // top-M conflict-free batching should cut wall-clock ~x(applied
    // merges per round); BpeSpec bounds the quality side (vocab
    // overlap + holdout segmentation agreement vs M=1).
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "10").toInt
    val docs = StressCorpus.docs(spark, sfDir, mult, cpus.toInt)
    val nMerges = 16
    def timeBpe(m: Int): (Double, Long) = StressCorpus.timed(
      graft.pipeline.Bpe.train(docs, "text", merges = nMerges,
        mergesPerRound = m).count())
    timeBpe(1) // warm
    val (bpeM1Sec, bpeM1) = timeBpe(1)
    val (bpeM4Sec, bpeM4) = timeBpe(4)
    // jobs planned during an idle tick — the O(staged) claim made loud
    val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val idleSec2 = oneTick(Nil)
    val idleJobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0
    graft.core.AtomicSwap.deleteRecursively(fleetRoot)

    // Governed-index lifecycle axis: one-shot build vs 4-batch
    // admission + compaction, probed after each. Claims: per-batch
    // admission cost is batch-sized (the 4 appends sum to roughly the
    // one-shot build — nothing is rewritten), compaction is one
    // partition rewrite, and the probe is cell-sized regardless of
    // how the index was produced.
    val vecs = Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(cpus.toInt * 2).localCheckpoint()
    val nVecs = vecs.count()
    val cbIdx = vecs.select(col("vec_id").cast("long"),
        graft.pipeline.Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val idxRoot = java.nio.file.Files.createTempDirectory("graft_idx11")
    val (ivfBuildSec, _) = StressCorpus.timed {
      graft.pipeline.Similarity.saveIvfIndexStore(vecs, "vec_id",
        "embedding", cbIdx, idxRoot.toString, "one", 1); nVecs
    }
    val (ivfAdmitSec, _) = StressCorpus.timed {
      graft.pipeline.Similarity.saveIvfIndexStore(
        vecs.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        cbIdx, idxRoot.toString, "inc", 1)
      (1 to 3).foreach(r => graft.pipeline.Similarity.appendIvfIndexStore(
        vecs.filter(col("vec_id") % 4 === r), "vec_id", "embedding",
        idxRoot.toString, "inc", 1))
      nVecs
    }
    val (ivfCompactSec, _) = StressCorpus.timed {
      graft.pipeline.Similarity.compactIvfIndexStore(spark,
        idxRoot.toString, "inc", 1); nVecs
    }
    val (ivfProbeSec, ivfProbeRows) = StressCorpus.timed {
      val (cells, cb2) = graft.pipeline.Similarity.loadIvfIndexStore(
        spark, idxRoot.toString, "inc", 1)
      graft.pipeline.Similarity.probeIvfIndex(cells, cb2,
        vecs.filter(col("vec_id").isin(100L, 200L, 300L, 400L)),
        "vec_id", "embedding", k = 10, nprobe = 2).count()
    }
    graft.core.AtomicSwap.deleteRecursively(idxRoot)

    val json =
      s"""{"metric":"stress_r11","fleet":$nFleet,"mult":$mult,""" +
        s""""n_vecs":$nVecs,"ivf_build_sec":$ivfBuildSec,""" +
        s""""ivf_admit4_sec":$ivfAdmitSec,""" +
        s""""ivf_compact_sec":$ivfCompactSec,""" +
        s""""ivf_probe_sec":$ivfProbeSec,"ivf_probe_rows":$ivfProbeRows,""" +
        s""""register_sec":$registerSec,""" +
        s""""register_batch_sec":$registerBatchSec,""" +
        s""""staged_tick_sec":$stagedSec,"idle_tick_sec":$idleSec,""" +
        s""""idle_tick_sec2":$idleSec2,"idle_tick_jobs":$idleJobs,""" +
        s""""bpe_m1_sec":$bpeM1Sec,"bpe_m1_merges":$bpeM1,""" +
        s""""bpe_m4_sec":$bpeM4Sec,"bpe_m4_merges":$bpeM4}"""
    spark.stop()
    println(json)
  }
}
