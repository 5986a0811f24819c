package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 stress axes: the four operators added after the round-10
  * SCALE.md refresh (token mixture p144, epoch mixture p146,
  * calibration bins p145, streaming funnel p143), measured on the
  * shared StressCorpus shapes so the growth curves are comparable to
  * every earlier axis.
  *
  * Claims under measurement:
  *  - tokenMixture / epochMixture: the corpus side is shuffle-free
  *    (one #sources-row aggregate + broadcast quota join + per-row
  *    keep math), so time should track the scan linearly with mult;
  *  - calibrationBins: one partial-agg exchange to <= bins rows —
  *    constant-volume shuffle, linear scan time;
  *  - StateFunnel: per-key state is the undrained buffer only
  *    (watermark folds each micro-batch), so a mult-multiplied
  *    corpus streams in time linear in volume, not in keys x history;
  *    the batch funnel on the same frame is the comparator.
  *
  *   SPARK_GRAFT_MULT=50 java -cp ... graft.StressR10
  */
object StressR10 {
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
    var bpeTrainSec = 0.0

    // source = doc bucket, tokens pre-split and pinned so the axes
    // time the mixture operators, not the tokenizer
    val srcDocs = docs.select(col("doc_id"),
        concat(lit("src"), pmod(col("doc_id"), lit(8))).as("source"),
        size(graft.pipeline.TextOps.tokens(col("text"))).cast("long")
          .as("tok"))
      .localCheckpoint()
    val totalTok = srcDocs.agg(sum(col("tok"))).head().getLong(0)

    val (tokSec, tokKept) = timed(
      graft.pipeline.Sampling.tokenMixture(srcDocs, "doc_id", "source",
          tokens = col("tok"), budgetTokens = totalTok / 2,
          weight = floor(sqrt(col("tok_total")) * 1000000.0d), seed = 5)
        .filter(col("keep")).count())

    // budget 3x total with maxEpochs 2: every source caps at 2 full
    // epochs + no partial — the repeat-explode path is exercised
    val (epochSec, epochCopies) = timed(
      graft.pipeline.Sampling.epochMixture(srcDocs, "doc_id", "source",
          tokens = col("tok"), budgetTokens = totalTok * 3L,
          weight = lit(1L), maxEpochs = 2, seed = 11)
        .agg(sum(col("n_copies"))).head().getLong(0))

    // BPE: the corpus is scanned once into the word-vocab frame; the
    // merge rounds are vocab-sized, so train time should be ~flat in
    // mult (the verbatim-copy corpus multiplies counts, not words —
    // only the rep-suffix third grows the vocabulary)
    val mergesDf = {
      System.gc()
      val t0 = System.nanoTime()
      val m = graft.pipeline.Bpe.train(docs, "text", merges = 8,
        mergesPerRound = 2)
      bpeTrainSec = (System.nanoTime() - t0) / 1e9
      m
    }
    val (bpeSegSec, bpeSegDocs) = timed(
      graft.pipeline.Bpe.segment(docs, "doc_id", "text", mergesDf)
        .count())
    // residual-drift pass under the learned table: same shape as one
    // more training round (corpus pass + vocab-sized count) — ~flat
    val (bpeResSec, _) = timed(
      graft.pipeline.Bpe.residualPairs(docs, "text", mergesDf,
        topK = 20).count())

    val scored = big.select(
      pmod(graft.pipeline.Hashing.h60(col("user_id").cast("string")),
        lit(1000000L)).as("score_ppm"),
      pmod(graft.pipeline.Hashing.h60(col("event_type")), lit(2L))
        .as("label"))
    val (calSec, calBins) = timed(
      graft.pipeline.Profiling.calibrationBins(scored,
        col("score_ppm"), col("label"), bins = 10).count())

    // power iteration on a node-scale synthetic graph: every distinct
    // user gets 4 hash-derived out-edges into the same id space —
    // nodes/edges grow with mult, iterations are node-keyed joins
    val users = big.select(col("user_id")).distinct()
    val prEdges = users
      .crossJoin(spark.range(4).select(col("id").as("k")))
      .select(col("user_id").as("src"),
        pmod(graft.pipeline.Hashing.h60(
            concat_ws("|", col("user_id"), col("k"))),
          lit(1000000L * mult)).as("dst"),
        lit(1L).as("w"))
      .localCheckpoint()
    val (prSec, prNodes) = timed(
      graft.pipeline.Graphs.powerIteration(prEdges, "src", "dst", "w",
        iters = 3).count())

    // persisted IVF: index build is one corpus pass; the probe's claim
    // is partition pruning — it opens ONE of the 8 cells, so probe
    // time tracks the PROBED CELL's growth, never the corpus's
    val vecs = Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(cpus.toInt * 2)
      .localCheckpoint()
    val cb = vecs.select(col("vec_id"),
        graft.pipeline.Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val (ivfSaveSec, _) = timed {
      graft.pipeline.Similarity.saveIvfIndex(vecs, "vec_id",
        "embedding", cb, "stress_ivf")
      spark.table("stress_ivf_cells").count()
    }
    val (ivfProbeSec, ivfHits) = timed {
      val (cells, cb2) =
        graft.pipeline.Similarity.loadIvfIndex(spark, "stress_ivf")
      graft.pipeline.Similarity.probeIvfIndex(cells, cb2,
        vecs.filter(col("vec_id").isin(100L, 200L, 300L)),
        "vec_id", "embedding", k = 10).count()
    }

    // k-anonymity: one map-side-combined aggregate — flat
    val (kanonSec, kanonGroups) = timed(
      graft.pipeline.Profiling.kAnonymity(
        big.select(col("event_type"),
          to_date(col("record.ts")).as("day")),
        Seq("event_type", "day"), k = 100L).count())

    // SCD-2 validity intervals: one key exchange end to end — linear.
    // Deterministic per-instant dedup (p151's min rule): a bare
    // dropDuplicates keeps an arbitrary row, which would make the
    // recorded interval count drift across identical runs
    val (scdSec, scdRows) = timed(
      graft.pipeline.Sessions.validityIntervals(
        big.select(col("user_id"), col("record.ts").as("ts"),
            col("event_type"))
          .groupBy(col("user_id"), col("ts"))
          .agg(min(col("event_type")).as("event_type")),
        "user_id", "ts", "event_type").count())

    // streaming funnel: the multiplied events written as 4 data files
    // + the far-future sentinel, streamed 1 file per trigger so the
    // watermark advances and state drains between batches
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_stress_funnel")
    val steps = Seq("view", "click", "purchase")
    val stepCol = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (t, i)) => when(col("event_type") === t, lit(i))
        .otherwise(acc) }
    // the corpus carries no event id — a deterministic per-row hash
    // stands in (the funnel fold uses it only as a tie-break)
    val funnelIn = big.select(col("user_id"), col("record.ts").as("ts"),
      graft.pipeline.Hashing.h60(concat_ws("|", col("user_id"),
        col("record.ts").cast("long"), col("event_type"))).as("event_id"),
      stepCol.as("step"))
    val batchDir = dir.resolve("data")
    funnelIn.repartitionByRange(4, col("ts"))
      .write.parquet(batchDir.toString)
    val parts = Files.list(batchDir).filter(p =>
        p.getFileName.toString.startsWith("part-")).sorted()
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    val streamDir = dir.resolve("stream")
    Files.createDirectory(streamDir)
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = streamDir.resolve(f"a_$i%02d.parquet")
      Files.copy(p, dst, StandardCopyOption.COPY_ATTRIBUTES)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + i * 1000L))
    }
    // far-future sentinel row flushes the final watermark
    import spark.implicits._
    val sentinel = streamDir.resolve("b_sentinel.parquet")
    val sentTmp = dir.resolve("sent")
    funnelIn.filter(lit(false))
      .unionByName(Seq((-1L,
          java.sql.Timestamp.valueOf("2100-01-01 00:00:00"), -1L, -1))
        .toDF("user_id", "ts", "event_id", "step"))
      .coalesce(1).write.parquet(sentTmp.toString)
    val sentPart = Files.list(sentTmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.copy(sentPart, sentinel)
    Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))

    val (streamSec, streamRows) = timed {
      graft.streaming.StreamTuning.scoped(spark) {
        val st = spark.readStream
          .schema(funnelIn.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(streamDir.toString)
          .withWatermark("ts", "0 seconds")
          .as[graft.streaming.FunnelEvent]
        val out = graft.streaming.StateFunnel.funnel(st, nSteps = 3)
        val sink = s"stress_funnel_${System.nanoTime()}"
        val q = out.toDF().writeStream.format("memory")
          .queryName(sink).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.table(sink).filter(col("user_id") >= 0).count()
      }
    }

    // streaming SCD-2 over the same stream files (step as the value):
    // per-key state is the O(1) current run + the watermark-lag buffer
    val (streamScdSec, scdIntervals) = timed {
      graft.streaming.StreamTuning.scoped(spark) {
        val st = spark.readStream
          .schema(funnelIn.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(streamDir.toString)
          .withWatermark("ts", "0 seconds")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("step").cast("string").as("value"))
          .as[graft.streaming.ScdEvent]
        val out = graft.streaming.StateScd.intervals(st)
        val sink = s"stress_scd_${System.nanoTime()}"
        val q = out.toDF().writeStream.format("memory")
          .queryName(sink).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.table(sink).filter(col("user_id") >= 0).count()
      }
    }

    val (batchFunnelSec, batchRows) = timed(
      graft.pipeline.Sessions.funnel(
        big.select(col("user_id"), col("record.ts").as("ts"),
          col("event_type")),
        "user_id", "ts", "event_type", steps).count())

    val json =
      s"""{"metric":"stress_r10","mult":$mult,"rows":$n,"n_docs":$nDocs,""" +
        s""""tokmix_sec":$tokSec,"tokmix_kept":$tokKept,""" +
        s""""epochmix_sec":$epochSec,"epochmix_copies":$epochCopies,""" +
        s""""bpe_train_sec":$bpeTrainSec,""" +
        s""""bpe_seg_sec":$bpeSegSec,"bpe_seg_docs":$bpeSegDocs,""" +
        s""""bpe_residual_sec":$bpeResSec,""" +
        s""""ivf_save_sec":$ivfSaveSec,"ivf_probe_sec":$ivfProbeSec,""" +
        s""""ivf_hits":$ivfHits,""" +
        s""""stream_scd_sec":$streamScdSec,"scd_intervals":$scdIntervals,""" +
        s""""calib_sec":$calSec,"calib_bins":$calBins,""" +
        s""""pagerank_sec":$prSec,"pagerank_nodes":$prNodes,""" +
        s""""kanon_sec":$kanonSec,"kanon_groups":$kanonGroups,""" +
        s""""scd_sec":$scdSec,"scd_rows":$scdRows,""" +
        s""""stream_funnel_sec":$streamSec,"stream_users":$streamRows,""" +
        s""""batch_funnel_sec":$batchFunnelSec,"batch_users":$batchRows,""" +
        s""""sf":"$sfDir"}"""
    spark.stop()
    println(json)
  }
}
