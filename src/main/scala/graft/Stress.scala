package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Coalesce, DeltaRate, Readback}

/** Scale-stress main: multiply the sf0.1 events stream N× (more
  * servers × more entities — the realistic growth axis) and measure the
  * signature operators end to end. This is the local stand-in for the
  * 100 TB question: coalesce and readback are linear hash-aggregations/
  * scans keyed by (srvid, entity), so rows/sec should hold roughly flat
  * as SPARK_GRAFT_MULT grows — a super-linear fall-off would flag a
  * shuffle or memory cliff. Run:
  *
  *   SPARK_GRAFT_MULT=50 sbt "runMain graft.Stress"
  */
/** Shared corpus builders for the stress mains — one definition of the
  * multiplied events stream and the verbatim-copy document corpus, so
  * Stress / StressR9 / StressPairs all measure the same data shape. */
object StressCorpus {
  /** N× the sf events stream: rep r shifts the entity id space and the
    * server id, so cardinality grows with volume (the realistic
    * fleet-growth shape; pure row-duplication would only deepen
    * per-key arrays). */
  def big(spark: SparkSession, sfDir: String, mult: Int,
      cpus: Int): org.apache.spark.sql.DataFrame = {
    val ev = EventsSource.current(spark, sfDir)
    ev.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        ((col("srvid") + (col("rep") % 16) * 4)).cast("int").as("srvid"),
        (col("user_id") + col("rep") * 1000000L).as("user_id"),
        col("event_type"), col("record"))
      .repartition(cpus * 2)
      .localCheckpoint()
  }

  /** The corpus multiplied the web-crawl way — every rep a verbatim
    * copy (heavy near-dup collisions, the worst case for LSH bucket
    * sizes and prefix postings) except a third get a rep-specific
    * token appended so cardinality also grows. */
  def docs(spark: SparkSession, sfDir: String, mult: Int,
      cpus: Int): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" rep"), col("rep")))
          .otherwise(col("text")).as("text"))
      .repartition(cpus * 2)
      .localCheckpoint()

  /** ONE definition of the stress-main session (local[cpus], shuffle
    * partitions = cpus, AQE, UTC, no UI) shared by the five
    * measurement mains so their configs cannot drift. (Bench's
    * SPARK_GRAFT_PARTS knob is deliberately absent here: stress axes
    * measure operators at scan parallelism, not partition-floor A/Bs.) */
  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Timed action with a driver GC first: Spark's ContextCleaner only
    * drops the previous axes' shuffle files when their RDDs are
    * collected, and with a large heap that never happens on its own —
    * at mult 50 the accumulated spill of ~40 axes filled the disk
    * before GC ran. */
  def timed(f: => Long): (Double, Long) = {
    System.gc()
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }
}

object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = StressCorpus.session(cpus)

    val big = StressCorpus.big(spark, sfDir, mult, cpus.toInt)
    val n = big.count()

    def timed(f: => Long): (Double, Long) = StressCorpus.timed(f)

    val (coalesceSec, histRows) =
      timed(Coalesce.aggregate(big, EventsSource.spec).count())

    val split = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val hist = Coalesce.aggregate(
      big.filter(col("record.ts") < split), EventsSource.spec)
    val (readbackSec, seriesRows) = timed(
      DeltaRate.withRates(
        Readback.series(
          big.filter(col("record.ts") >= split), hist, EventsSource.spec,
          lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
          lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))),
        EventsSource.spec).count())

    // Dedup axis: MinHash+LSH end to end over the verbatim-copy corpus:
    // signatures, banded candidates, verification.
    val docs = StressCorpus.docs(spark, sfDir, mult, cpus.toInt)
    val nDocs = docs.count()
    val (minhashSec, dupPairs) = timed(
      graft.pipeline.Dedup.minhashPairs(docs, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8).count())

    // OPH axis (p96): same corpus, same banding — but the signature
    // stage is a per-row projection over the shared hashed-shingle
    // frame instead of k universal-hash explode→groupBy minima. The
    // claim this axis measures: the signature stage drops from a
    // data-volume shuffle to zero exchanges, and end-to-end OPH tracks
    // (or beats) the k-family time while finding the same near-dup mass.
    val hshStress = graft.pipeline.Dedup.hashedShingles(
      docs, "doc_id", "text", 3)
    val (sigKfamSec, _) = timed(
      graft.pipeline.Dedup.signaturesFromHashed(hshStress, 16).count())
    val (sigOphSec, _) = timed(
      graft.pipeline.Dedup.ophSignaturesFromHashed(hshStress, 16).count())
    val (ophSec, ophDupPairs) = timed(
      graft.pipeline.Dedup.ophPairs(docs, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8).count())

    // Boilerplate-strip axis (p95): the df aggregate is vocab-bounded,
    // so the multiplied corpus must track scan speed — the stoplist
    // grows with VOCAB (constant here), never with volume.
    val docsSrc = docs.withColumn("source",
      concat(lit("src"), pmod(col("doc_id"), lit(16))))
    val (stripSec, stripDocs) = timed(
      graft.pipeline.TextOps.stripBoilerplate(docsSrc, "doc_id", "source",
        "text", 600000L).count())

    // Bigram-surprisal axis (p102): both frequency tables are
    // vocab²-bounded broadcasts; per-doc cost must stay flat as the
    // corpus multiplies (the scan-speed claim of LM-quality filtering).
    val (bigramSec, bigramDocs) = timed(
      graft.pipeline.TextOps.bigramSurprisal(docs, "doc_id", "text")
        .count())

    // Cross-doc dup-gram axis (p80): the verbatim-copy multiplication is
    // its worst case too — every gram's document frequency grows with
    // mult — but cost stays linear (df aggregate + postings join, no
    // pair term), which is the claim this axis measures.
    val (dupgramSec, dupgramDocs) = timed(
      graft.pipeline.TextOps.crossDocDupGrams(docs, "doc_id", "text",
        n = 10).count())

    // ANN axis: vectors multiplied with the planes rule applied — the
    // bucket count must grow with the corpus for the in-bucket join to
    // stay subquadratic (Similarity.planesForCorpus).
    val vecs = Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(cpus.toInt * 2)
      .localCheckpoint()
    val nVecs = vecs.count()
    val planes = graft.pipeline.Similarity.planesForCorpus(nVecs,
      targetBucket = 256)
    val (annSec, annPairs) = timed(
      graft.pipeline.Similarity.cosineDupPairs(vecs, "vec_id", "embedding",
        planes = planes, dim = 64, thresholdPpm = 950000L).count())

    // Curation axis (round 3): the scan-speed passes — quality rules +
    // PII redaction are pure projections; packing is one per-shard
    // window; the mix is a broadcast-quota filter. These must track the
    // scan rate as the corpus multiplies.
    val docsSharded = docs.withColumn("source",
      concat(lit("src"), pmod(col("doc_id"), lit(64))))
    val (qualitySec, qualityRows) = timed(
      graft.pipeline.TextOps.gopherQuality(docsSharded, "text",
        30, 80, 3500000L, 4600000L, 20000L)
        .filter(col("keep")).count())
    val (redactSec, redactRows) = timed(
      graft.pipeline.TextOps.redactPii(docsSharded, "text")
        .select(sum(col("n_email") + col("n_phone") + col("n_ssn")))
        .count())
    val (packSec, packBins) = timed(
      graft.pipeline.TextOps.packSequences(docsSharded, "doc_id",
        "source", "text", 4096L)
        .select(col("source"), col("bin")).distinct().count())
    val (mixSec, mixKept) = timed(
      graft.pipeline.Sampling.sourceMix(docsSharded, "doc_id", "source",
        weight = lit(1L) +
          substring(col("source"), 4, 10).cast("long") % 4)
        .filter(col("keep")).count())

    // Sub-document dedup axis (round 4): CDC chunking + chunk-hash dedup.
    // Chunk count ~ tokens/div regardless of document sizes; the verbatim
    // copies make every copied chunk a duplicate — the worst case for
    // the keeper window's per-hash groups.
    val (chunkSec, chunkDocs) = timed(
      graft.pipeline.Chunking.dedupSummary(docs, "doc_id", "text",
        w = 4, div = 8).count())

    // Tokenizer-stats axis: pair counting must track scan speed — the
    // pair space is vocab²-bounded, so map-side partial aggregation
    // collapses the shuffle to a constant regardless of corpus size.
    val (pairsSec, nPairs) = timed(
      graft.pipeline.TextOps.topPairs(docs, "text", 1000).count())

    // Sketch + scoring axes (round 6): count-min build is one explode +
    // a d×w-keyed hash aggregate (shuffle constant-sized regardless of
    // corpus); the hashed classifier is a pure projection; decayedSum
    // is one key exchange shared by its window and its final aggregate.
    // All three must track scan speed as the corpus multiplies.
    val (cmsSec, cmsRows) = timed(
      graft.pipeline.Sketches.countMin(
        docs.select(explode(graft.pipeline.TextOps.tokens(col("text")))
          .as("tok")),
        col("tok"), depth = 3, width = 1024).count())
    val (scoreSec, scoreKept) = timed(
      graft.pipeline.TextOps.hashedLinearScore(docs, "text", width = 1024)
        .filter(col("keep")).count())
    val (decaySec, decayRows) = timed(
      graft.operators.Rolling.decayedSum(
        big.select(col("user_id"), col("record.ts").as("ts"),
          (col("record.value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents")),
        Seq("user_id"), "ts", 86400L,
        Seq("decayed_cents" -> col("cents"))).count())

    // Binned interval-join axis (round 6): keyless point-in-interval at
    // fact scale — the equi-shuffle-on-bin shape must track the join's
    // output volume, where the nested loop Spark would otherwise plan
    // is |points|x|intervals| regardless of selectivity.
    val (rangeSec, rangeRows) = timed {
      val pts = big.select(col("user_id"), col("record.ts").as("ts"))
      val ivals = big.filter(col("event_type") === "purchase" &&
          col("user_id") % 50 === 7)
        .select(col("user_id").as("interval_user"),
          col("record.ts").as("start_ts"),
          (col("record.ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
      graft.operators.RangeJoin.pointInInterval(pts, "ts",
        ivals, "start_ts", "end_ts",
        binSec = 1800L, maxSpanSec = 1800L).count()
    }

    // PQ axis: train per-subspace codebooks on the multiplied corpus
    // (zero-exchange assignment passes + one k·dim agg), then the
    // zero-exchange fused encode+ADC probe.
    val (pqSec, pqRows) = timed(
      graft.pipeline.Similarity.pqTopK(vecs, "vec_id", "embedding",
        queryId = 0L, dim = 64, m = 8, k = 16, iters = 1,
        topK = 100).count())

    // IVF-PQ composed axis (round 6): coarse prune + in-cell ADC +
    // exact re-rank — train+probe wall-clock must track the PQ axis
    // (the composition adds one cell projection and a 100-row re-rank,
    // not a new data-volume stage).
    val (ivfpqSec, ivfpqRows) = timed(
      graft.pipeline.Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        queryId = 0L, dim = 64, nCentroids = 16, m = 8, k = 16, iters = 1,
        candidates = 100, topK = 10).count())

    // Bloom-prune axis (round 5), measured in the regime the operator
    // exists for: the build side too big to BROADCAST (threshold off —
    // at 100 TB a 10^8-key dimension exceeds any broadcast budget), so
    // the plain join is a sort-merge that shuffles EVERY fact row,
    // while the bloom-pruned join drops non-candidates at scan time and
    // shuffles only the 0.1% that can match. (With a broadcastable dim
    // the plain broadcast join wins and pruning is pure overhead — the
    // operator doc says exactly when to reach for it.)
    val factRows = big.select(col("user_id"), col("record"))
    val dim = big.select(col("user_id")).distinct()
      .filter(col("user_id") % 1000 === 7)
      .withColumn("attr", col("user_id") * 2)
      .localCheckpoint()
    // restore-on-exit: an exception mid-axis must not leave broadcasts
    // disabled for the rest of the run, and when the key was never
    // explicitly set the restore is an unset, not a write-back of the
    // fetched default as an explicit override (round-5 ADVICE)
    val prevThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ((plainJoinSec, plainJoinRows), (bloomSec, bloomRows)) =
      try {
        (timed(factRows.join(dim, Seq("user_id")).count()),
         timed(graft.operators.BloomPrune
           .prunedJoin(factRows, dim, "user_id").count()))
      } finally {
        prevThreshold match {
          case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      }

    // Connected-components axis (round 5): an adversarial CHAIN graph —
    // the worst case for min-label propagation (diameter-many rounds).
    // The large/small-star escalation must keep the ROUND count
    // logarithmic in the chain length (rounds ~ log2 n, not n).
    val chainLen = 1000L * mult
    val chainEdges = spark.range(chainLen - 1)
      .select(col("id").as("i"), (col("id") + 1L).as("j"))
      .repartition(cpus.toInt).localCheckpoint()
    val chainNodes = spark.range(chainLen).select(col("id").as("doc_id"))
      .localCheckpoint()
    val t0cc = System.nanoTime()
    val (ccLabels, ccRounds) = graft.pipeline.Dedup.ccStarsWithRounds(
      chainEdges, chainNodes, "doc_id")
    val ccOk = ccLabels.filter(col("lbl") =!= 0L).isEmpty
    val ccSec = (System.nanoTime() - t0cc) / 1e9

    // Incremental-CC axis (round 6): fold a SECOND resolved chain into
    // the existing forest through one bridge edge — the append-batch
    // regime. Both priors are depth-1 star forests, so the merge is
    // shallow-tree flattening: rounds must stay small and independent
    // of the chain length (the batch run above needed O(log n) rounds
    // on the raw chain; the incremental run re-converges in a handful
    // regardless of mult).
    val chain2Nodes = spark.range(chainLen, 2 * chainLen)
      .select(col("id").as("doc_id")).localCheckpoint()
    val prior = ccLabels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .union(chain2Nodes.select(col("doc_id"), lit(chainLen).as("cluster")))
      .localCheckpoint()
    val bridge = spark.range(1).select(lit(chainLen - 1).as("i"),
      lit(chainLen).as("j"))
    val t0incr = System.nanoTime()
    val (incrLabels, incrRounds) = graft.pipeline.Dedup
      .ccIncrementalWithRounds(prior, bridge, "doc_id")
    val incrOk = incrLabels.filter(col("cluster") =!= 0L).isEmpty
    val incrSec = (System.nanoTime() - t0incr) / 1e9

    // SemDeDup axis (round 6): cluster-then-pairwise near-dup removal.
    // The codebook grows with the corpus (k ≈ n/256) so cell population
    // stays ~constant: the in-cell pairwise stage is Σ|cell|² ≈ n·256 —
    // LINEAR in corpus size, the whole point of clustering before
    // semantic dedup. Assignment is the codegen'd dot-product argmax
    // (assignCellsDot); the sampled codebook (k lowest ids) stands in
    // for the trained one — identical assignment + pairwise cost
    // shape, no Lloyd iterations to time-noise the axis.
    val kCells = math.max(8, (nVecs / 256L).toInt)
    val semCents = vecs.orderBy(col("vec_id")).limit(kCells)
      .select(col("vec_id"),
        graft.pipeline.Similarity.asDouble(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val (semSec, semKept) = timed {
      val assigned = graft.pipeline.Similarity.assignCellsDot(
        vecs, "vec_id", "embedding", semCents)
      graft.pipeline.Similarity.semanticDedup(
        assigned, "vec_id", "embedding", "cell", thresholdPpm = 950000L)
        .count()
    }

    // DSv2 pruned-readback axis (round 6): a fleet-sized store read
    // through the graft-store DataSource V2 table. Full-scan cost grows
    // with the fleet; a WHERE srvid = ? readback must NOT — StoreV2
    // prunes partitions at scan planning, before any file listing, so
    // the pruned read is one partition's files regardless of fleet
    // size.
    val (dsv2FullSec, dsv2PrunedSec, dsv2Srv) = {
      val root = java.nio.file.Files.createTempDirectory("graft_dsv2")
      val store = new graft.core.Store(spark, root.toString)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("srvid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("record",
          big.schema("record").dataType)))
      store.append("evt", "current", big)
      val nSrv = store.readV2("evt", "current", schema)
        .select("srvid").distinct().count()
      val (fullSec, _) =
        timed(store.readV2("evt", "current", schema).count())
      val (oneSec, _) = timed(store.readV2("evt", "current", schema)
        .filter(col("srvid") === 2).count())
      graft.core.AtomicSwap.deleteRecursively(root)
      (fullSec, oneSec, nSrv)
    }

    // Fleet-scheduler axis (round 6): 100 registered servers, staged
    // data on a 5-server subset — tick cost must be O(datasources with
    // staged partitions), NOT O(fleet size): the directory-probe fast
    // path (Engine tick loop) skips every idle (server, datasource)
    // pair without planning a Spark job, so an idle fleet tick is pure
    // filesystem probes + per-server meta writes.
    val fleetSec = {
      import spark.implicits._
      val fleetRoot = java.nio.file.Files.createTempDirectory("graft_fleet")
      val fleet = new graft.core.Engine(spark, fleetRoot.toString)
      val nFleet = 100
      (1 to nFleet).foreach(i => fleet.registry.registerServer(
        graft.core.ServerConfig(id = i, hostname = s"h$i",
          powaCoalesce = 1000, retentionSec = 3650L * 86400)))
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
      oneTick(1 to 5) // warm (first-touch layout + codegen)
      val stagedSec = (oneTick(1 to 5) + oneTick(1 to 5)) / 2
      val idleSec = (oneTick(Nil) + oneTick(Nil)) / 2
      graft.core.AtomicSwap.deleteRecursively(fleetRoot)
      (stagedSec, idleSec)
    }

    // Rank-stage axis (round 9): rrfFusion rebuilt as TakeOrdered gates
    // + a broadcast counting pass vs the corpus-global window it
    // replaced. Signals are cheap in-row expressions so the axis times
    // the rank machinery, not feature extraction. Claim: the gate+count
    // form tracks scan speed with a constant-size shuffle (candidates
    // only), while the windowed form funnels the corpus through one
    // task per signal.
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

    // Vocab-rank axis (round 9): vocabCoverage's distributed range rank
    // (repartitionByRange + per-slice offsets). The vocab is
    // ~constant under the rep-token multiplication, so the rank stage
    // must stay flat while the corpus-sized count pass grows.
    val (vocabSec, vocabRows) = timed(
      graft.pipeline.TextOps.vocabCoverage(docs, "text", 900000L).count())

    // Prefix-filter set-similarity axis (p113, round 9): the verbatim
    // copies are its worst case — every copied doc shares its WHOLE
    // prefix, so prefix-token postings are maximally hot. Candidates
    // are output-bounded (true-duplicate pairs) — but on THIS corpus
    // the output itself is quadratic in the copy count, and exact
    // verification attaches both shingle arrays to every candidate:
    // at mult 50 (6M+ true pairs × ~2.4 KB arrays × a ~p-fold
    // pre-distinct amplification) the spill exceeds this box's disk.
    // Guard the axis so one output-bound blow-up reports -1 instead of
    // killing the whole run; the standalone growth curve lives in
    // StressPairs (SPARK_GRAFT_ORDER=prefix).
    val (pfxSec, pfxPairs) =
      try timed(graft.pipeline.Dedup.prefixFilterPairs(
        docs, "doc_id", "text", 3, 0.8).count())
      catch { case e: Throwable =>
        System.err.println(s"[stress] prefix axis failed: ${e.getMessage}")
        (-1.0, -1L)
      }

    // Column-profile axis (p107, round 9): one pass, per-column
    // aggregates map-side combined — must track scan speed on the
    // multiplied events frame.
    val (profSec, profCols) = timed(
      graft.pipeline.Profiling.columnProfile(
        big.select(col("srvid"), col("user_id"), col("event_type"),
          col("record.value").as("value"))).count())

    // Self-repeat axis (p112, round 9): the within-doc window self-join
    // is doc-length-bounded per row (zero cross-doc terms), so
    // docs/sec must stay flat as the corpus multiplies.
    val (selfSec, selfDocs) = timed(
      graft.pipeline.TextOps.longestSelfRepeat(docs, "doc_id", "text",
        k = 5).count())

    // Interval-merge axis (p115, round 9): per-key ordered sweep — one
    // window exchange on the key, rows/sec must track the scan.
    val (imSec, imRows) = timed {
      // mergeIntervals takes epoch-micros longs
      val ivals = big.select(col("user_id"),
        unix_micros(col("record.ts")).as("start_us"),
        (unix_micros(col("record.ts")) + 1800L * 1000000L).as("end_us"))
      graft.pipeline.Sessions.mergeIntervals(ivals, "user_id",
        "start_us", "end_us").count()
    }

    val json =
      s"""{"metric":"stress","mult":$mult,"rows":$n,""" +
      s""""coalesce_sec":$coalesceSec,"coalesce_rows_per_sec":${(n / coalesceSec).toLong},""" +
      s""""hist_rows":$histRows,""" +
      s""""readback_sec":$readbackSec,"readback_rows_per_sec":${(seriesRows / readbackSec).toLong},""" +
      s""""series_rows":$seriesRows,""" +
      s""""n_docs":$nDocs,"minhash_sec":$minhashSec,"minhash_docs_per_sec":${(nDocs / minhashSec).toLong},""" +
      s""""dup_pairs":$dupPairs,""" +
      s""""strip_sec":$stripSec,"strip_docs_per_sec":${(stripDocs / stripSec).toLong},""" +
      s""""bigram_sec":$bigramSec,"bigram_docs_per_sec":${(bigramDocs / bigramSec).toLong},""" +
      s""""sig_kfam_sec":$sigKfamSec,"sig_oph_sec":$sigOphSec,""" +
      s""""oph_sec":$ophSec,"oph_docs_per_sec":${(nDocs / ophSec).toLong},""" +
      s""""oph_pairs":$ophDupPairs,""" +
      s""""n_vecs":$nVecs,"ann_planes":$planes,"ann_sec":$annSec,""" +
      s""""ann_vecs_per_sec":${(nVecs / annSec).toLong},"ann_pairs":$annPairs,""" +
      s""""quality_sec":$qualitySec,"quality_docs_per_sec":${(nDocs / qualitySec).toLong},""" +
      s""""quality_kept":$qualityRows,""" +
      s""""redact_sec":$redactSec,"redact_docs_per_sec":${(nDocs / redactSec).toLong},""" +
      s""""pack_sec":$packSec,"pack_bins":$packBins,""" +
      s""""mix_sec":$mixSec,"mix_kept":$mixKept,""" +
      s""""chunk_sec":$chunkSec,"chunk_docs_per_sec":${(chunkDocs / chunkSec).toLong},""" +
      s""""pairs_sec":$pairsSec,"pairs_docs_per_sec":${(nDocs / pairsSec).toLong},"top_pairs":$nPairs,""" +
      s""""dupgram_sec":$dupgramSec,"dupgram_docs_per_sec":${(dupgramDocs / dupgramSec).toLong},""" +
      s""""cms_sec":$cmsSec,"cms_docs_per_sec":${(nDocs / cmsSec).toLong},"cms_counters":$cmsRows,""" +
      s""""score_sec":$scoreSec,"score_docs_per_sec":${(nDocs / scoreSec).toLong},"score_kept":$scoreKept,""" +
      s""""decay_sec":$decaySec,"decay_rows_per_sec":${(n / decaySec).toLong},"decay_keys":$decayRows,""" +
      s""""range_sec":$rangeSec,"range_rows_per_sec":${(n / rangeSec).toLong},"range_pairs":$rangeRows,""" +
      s""""pq_sec":$pqSec,"pq_rows":$pqRows,""" +
      s""""ivfpq_sec":$ivfpqSec,"ivfpq_rows":$ivfpqRows,""" +
      s""""cc_chain_len":$chainLen,"cc_rounds":$ccRounds,""" +
      s""""cc_sec":$ccSec,"cc_correct":$ccOk,""" +
      s""""cc_incr_rounds":$incrRounds,"cc_incr_sec":$incrSec,""" +
      s""""cc_incr_correct":$incrOk,""" +
      s""""semdedup_k":$kCells,"semdedup_sec":$semSec,""" +
      s""""semdedup_vecs_per_sec":${(nVecs / semSec).toLong},"semdedup_kept":$semKept,""" +
      s""""dsv2_srv":$dsv2Srv,"dsv2_full_sec":$dsv2FullSec,""" +
      s""""dsv2_pruned_sec":$dsv2PrunedSec,""" +
      s""""fleet_servers":100,"fleet_staged_tick_sec":${fleetSec._1},""" +
      s""""fleet_idle_tick_sec":${fleetSec._2},""" +
      s""""plain_join_sec":$plainJoinSec,"bloom_join_sec":$bloomSec,""" +
      s""""join_rows":$plainJoinRows,"bloom_rows_match":${plainJoinRows == bloomRows},""" +
      s""""rrf_sec":$rrfSec,"rrf_windowed_sec":$rrfWinSec,""" +
      s""""rrf_docs_per_sec":${(nDocs / rrfSec).toLong},""" +
      s""""vocab_sec":$vocabSec,"vocab_rows":$vocabRows,""" +
      s""""prefix_sec":$pfxSec,"prefix_pairs":$pfxPairs,""" +
      s""""prefix_docs_per_sec":${if (pfxSec > 0) (nDocs / pfxSec).toLong else -1L},""" +
      s""""profile_sec":$profSec,"profile_cols":$profCols,""" +
      s""""profile_rows_per_sec":${(n / profSec).toLong},""" +
      s""""selfrep_sec":$selfSec,"selfrep_docs_per_sec":${(selfDocs / selfSec).toLong},""" +
      s""""imerge_sec":$imSec,"imerge_rows_per_sec":${(n / imSec).toLong},""" +
      s""""imerge_merged":$imRows,""" +
      s""""sf":"$sfDir"}"""
    spark.stop()
    println(json)
  }
}
