package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.Tables
import graft.pipeline._
import graft.pipeline.Hashing.h60Sql

/** The LLM-training-data-pipeline operator surface (builder prompt +
  * SURVEY.md §7): dedup (exact / n-gram Jaccard / MinHash+LSH / SimHash),
  * similarity search (brute-force + LSH-bucketed cosine), text analysis
  * (stats, lang-ID, fingerprint) and multimodal binary plumbing — each
  * with a DuckDB oracle built from the same deterministic primitives
  * (portable 60-bit md5 hash, floor-ppm ratios).
  */
object PipelineQueries {

  private val langs = TextOps.stopwords

  // ---------- text analysis ----------

  private def p01(s: SparkSession, d: String): DataFrame =
    TextOps.withStats(Tables.documents(s, d), "text")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        col("bpe_tokens"), col("avg_token_len_ppm"), col("stop_ratio_ppm"),
        col("quality_ppm"))
      .orderBy(col("doc_id"))

  private def p02(s: SparkSession, d: String): DataFrame =
    TextOps.withLangId(Tables.documents(s, d), "text")
      .select(col("doc_id") +: langs.map { case (l, _) => col(s"score_$l") }
        :+ col("lang_pred"): _*)
      .orderBy(col("doc_id"))

  private def p03(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  // ---------- dedup ----------

  private def p04(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("content_hash"))

  private def p05(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))

  private def p06(s: SparkSession, d: String): DataFrame =
    Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))

  private val SimhashBits = 32

  private def p07(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        Dedup.simhash(col("text"), SimhashBits).as("simhash"))
      .orderBy(col("doc_id"))

  private def p08(s: SparkSession, d: String): DataFrame = {
    // repartition before checkpointing: the source parquet is one file =
    // one partition; the banded self-join reuses the materialized hashes
    val sh = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), Dedup.simhash(col("text"), SimhashBits).as("sh"))
      .localCheckpoint()
    Dedup.simhashPairs(sh, "doc_id", "sh", SimhashBits, maxHamming = 6)
      .orderBy(col("i"), col("j"))
  }

  // ---------- similarity search ----------

  private def p09(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select(col("vec_id"), TextOps.ppm(col("cos")).as("cos_ppm"))

  private def p10(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 5, planes = 6, dim = 64)
      .select(col("vec_id"), TextOps.ppm(col("cos")).as("cos_ppm"))

  // IVF-cell ANN: assign to nearest-of-8 sampled centroids, search cell
  private def p14(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 100L, k = 5, nCentroids = 8)
      .select(col("vec_id"), TextOps.ppm(col("cos")).as("cos_ppm"))

  // corpus vocabulary stats: token document-frequency top-50 — the
  // corpus-level profile that drives stopword/shingle-skew decisions
  private def p13(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token").asc)
      .limit(50)

  // embedding-cosine near-dup: LSH-bucket candidates + exact verify
  private def p12(s: SparkSession, d: String): DataFrame =
    Similarity.cosineDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        planes = 2, dim = 64, thresholdPpm = 400000L)
      .orderBy(col("i"), col("j"))

  // multi-table LSH near-dup: candidates share a bucket in ANY of the
  // independently-seeded plane families (recall ~ 1-(1-r^planes)^tables)
  private def p15(s: SparkSession, d: String): DataFrame =
    Similarity.cosineDupPairsMulti(Tables.embeddings(s, d), "vec_id",
        "embedding", planes = 3, dim = 64, thresholdPpm = 400000L,
        tables = 2)
      .orderBy(col("i"), col("j"))

  // pair list -> dedup decisions: connected components over the
  // minhash near-dup pairs, min-doc_id canonical keeper per cluster
  private def p16(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
    Dedup.connectedComponents(pairs.select(col("i"), col("j")),
        docs, "doc_id")
      .orderBy(col("doc_id"))
  }

  // deterministic curation: hash-seeded 50% Bernoulli thin, then a
  // hash-ranked cap of 25 docs per language — reproducible sampling
  // with zero RNG state, the step between dedup and training
  private def p17(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedCap(
        Sampling.bernoulliPpm(Tables.documents(s, d), "doc_id",
          ppm = 500000L, seed = 1),
        "lang", "doc_id", n = 25, seed = 0)
      .select(col("doc_id"), col("lang"), col("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))

  // near-dup REMOVAL end-to-end: minhash pairs -> clusters -> keep the
  // canonical min-id doc per cluster -> the surviving corpus
  private def p18(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
    Dedup.removeNearDups(docs, "doc_id", pairs)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // int8 scalar quantization of the embedding column (4x ANN footprint
  // cut), exploded to (pos, q) rows for the exact oracle compare
  private def p19(s: SparkSession, d: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
      .select(col("vec_id"),
        floor(col("scale") * 1000000.0).cast("long").as("scale_ppm"),
        posexplode(col("qvec")).as(Seq("pos", "q")))
      .select(col("vec_id"), col("scale_ppm"),
        col("pos").cast("long").as("pos"), col("q"))
      .orderBy(col("vec_id"), col("pos"))

  // TF-IDF top terms per doc in exact rational form (integer
  // (tf*N*1e6) div df — no float log, so both engines agree exactly)
  private def p20(s: SparkSession, d: String): DataFrame =
    TextOps.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("token"), col("score"))
      .orderBy(col("doc_id"), col("rank"))

  // winnowing fingerprints: 4-gram rolling hashes, 5-wide window minima
  private def p21(s: SparkSession, d: String): DataFrame =
    TextOps.winnowFingerprints(Tables.documents(s, d), "doc_id", "text",
        k = 4, w = 5)
      .orderBy(col("doc_id"), col("fp"))

  // eval-set decontamination: train docs sharing an 8-gram with any
  // eval doc (doc_id % 10 == 0 plays the eval set)
  private def p22(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    TextOps.decontaminate(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 8)
      .orderBy(col("train_doc_id"), col("eval_doc_id"))
  }

  // repetition ratio: degenerate-text detector (1 - distinct/total 3-grams)
  private def p23(s: SparkSession, d: String): DataFrame =
    TextOps.withRepetition(Tables.documents(s, d), "text", n = 3)
      .select(col("doc_id"), col("n_grams"), col("n_distinct_grams"),
        col("rep_ppm"))
      .orderBy(col("doc_id"))

  // k-means IVF training, integer-quantized so the oracle can replay
  // both Lloyd iterations exactly (float means are order-dependent and
  // would flake the hash; e4 fixed point + DIV means are engine-exact)
  private def p24(s: SparkSession, d: String): DataFrame =
    Similarity.kmeansCentroidsInt(Tables.embeddings(s, d),
        "vec_id", "embedding", k = 8, iters = 2)
      .orderBy(col("centroid"), col("pos"))

  // PII redaction over deterministic customer-derived text (the
  // documents corpus carries no digits/emails): per-rule match counts
  // + the fully redacted text, hashed. The ordered regexp_replace
  // chain and the counts are recomputed verbatim by the oracle.
  private def p25(s: SparkSession, d: String): DataFrame =
    TextOps.redactPii(
        Tables.table(s, d, "customer").select(col("c_custkey"),
          concat(col("c_mktsegment"), lit(" reach "), lower(col("c_name")),
            lit("@example.com or "),
            lpad((col("c_custkey") % 100).cast("string"), 2, "0"),
            lit("-"),
            lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0"),
            lit(" id "),
            lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("c_custkey") % 100).cast("string"), 2, "0"),
            lit("-"),
            lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
            .as("text")),
        "text")
      .select(col("c_custkey"), col("n_email"), col("n_phone"),
        col("n_ssn"), md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("c_custkey"))

  // Gopher-style heuristic quality rules: auditable per-doc metrics +
  // keep verdict (thresholds chosen to split this corpus ~1:10)
  private def p26(s: SparkSession, d: String): DataFrame =
    TextOps.gopherQuality(Tables.documents(s, d), "text",
        minWords = 30, maxWords = 80,
        minMeanWordLenPpm = 3500000L, maxMeanWordLenPpm = 4600000L,
        minStopwordPpm = 20000L)
      .select(col("doc_id"), col("n_words"), col("mean_word_len_ppm"),
        col("stopword_ppm"), col("keep"))
      .orderBy(col("doc_id"))

  // containment dedup: directional fingerprint-overlap scores catch
  // partial copies that symmetric jaccard misses (df-capped postings)
  private def p30(s: SparkSession, d: String): DataFrame =
    TextOps.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        k = 4, w = 5, dfCap = 50, minPpm = 300000L)
      .select(col("i"), col("j"), col("n_shared"),
        col("containment_i_ppm"), col("containment_j_ppm"))
      .orderBy(col("i"), col("j"))

  // URL canonicalization + dedup: four deterministic variants of each
  // synthetic URL (mixed-case scheme/host, default port + trailing
  // slash, fragment) must collapse to one canonical row
  private def p29(s: SparkSession, d: String): DataFrame = {
    val base = expr("o_orderkey DIV 4")
    val shop = concat(lit("shop-"), (base % 50).cast("string"),
      lit(".example.com"))
    val path = concat(lit("/item/"), base.cast("string"))
    val url = when(col("o_orderkey") % 4 === 0,
        concat(lit("https://"), shop, path))
      .when(col("o_orderkey") % 4 === 1,
        concat(lit("HTTPS://"), upper(shop), path))
      .when(col("o_orderkey") % 4 === 2,
        concat(lit("https://"), shop, lit(":443"), path, lit("/")))
      .otherwise(
        concat(lit("https://"), shop, path, lit("#ref"),
          col("o_orderkey").cast("string")))
    Urls.dedupByUrl(
        Tables.orders(s, d).select(col("o_orderkey"), url.as("url")),
        "o_orderkey", "url")
      .orderBy(col("url_canonical"))
  }

  // source-mix reweighting: thin every source toward name-derived
  // target weights (1 + num%4) without upsampling; the summary hashes
  // quota arithmetic AND the per-row hash selection
  private def p28(s: SparkSession, d: String): DataFrame =
    Sampling.sourceMix(Tables.documents(s, d), "doc_id", "source",
        weight = lit(1L) + substring(col("source"), 4, 10).cast("long") % 4)
      .groupBy(col("source"), col("n_source"), col("weight"),
        col("keep_ppm"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))

  // sequence packing: per-source deterministic token stream, each doc
  // assigned to the 512-token training bin its first token falls in
  private def p27(s: SparkSession, d: String): DataFrame =
    TextOps.packSequences(Tables.documents(s, d), "doc_id", "source",
        "text", binTokens = 512L)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("offset"), col("bin"))
      .orderBy(col("doc_id"))

  // ---------- multimodal ----------

  private def p11(s: SparkSession, d: String): DataFrame = {
    val assets = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Multimodal.extractFeatures(assets, "doc_id", "payload")
      .select(col("doc_id"), col("n_bytes"), col("sig"),
        posexplode(col("features")).as(Seq("pos", "feat")))
      .select(col("doc_id"), col("n_bytes"), col("sig"),
        col("pos").cast("long").as("pos"), col("feat"))
      .orderBy(col("doc_id"), col("pos"))
  }

  // ---------- time-series alignment / sessionization ----------

  // as-of join: each purchase picks up the most recent prior-or-equal
  // view by the same user (union + running last — ONE shuffle, no range
  // join). The view side is pre-aggregated to unique (user, ts) so the
  // tie among simultaneous views is deterministic in both engines.
  private def p31(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast(D) * 100).cast("long").as("purchase_cents"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        (col("value").cast(D) * 100).cast("long").as("view_cents"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("view_cents")).as("view_cents"))
    graft.operators.AsofJoin.backward(purchases, views, Seq("user_id"),
        "ts", Seq("view_cents"))
      .select(col("event_id"), col("user_id"), col("purchase_cents"),
        col("view_cents"),
        expr("(unix_micros(ts) - unix_micros(asof_ts)) DIV 1000000")
          .as("gap_sec"))
      .orderBy(col("event_id"))
  }

  // gap-based sessionization: 30-minute inactivity splits a user's
  // stream; per-session rollup incl. purchase count
  private def p32(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Sessions.sessionize(ev, "user_id", "ts", gapSec = 1800,
        tieBreak = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) DIV 1000000"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  // exact-substring dedup: pairs sharing a verbatim >= 6-token run,
  // with the longest common token run per pair (diagonal islands)
  private def p33(s: SparkSession, d: String): DataFrame =
    Dedup.substringPairs(Tables.documents(s, d), "doc_id", "text", k = 6)
      .orderBy(col("i"), col("j"))

  // ---------- structured streaming under the oracle gate ----------

  /** File-stream sources need an explicit schema; take it from the batch
    * reader's view of the actual file (ts arrives as nanos-long on legacy
    * TIMESTAMP(NANOS) testdata, TimestampType on native-micros testdata —
    * `Tables.normalizeEventTs` reconciles both to a micros `ts`). */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    // the file-stream source requires a DIRECTORY; link the table in
    val dir = graft.TempDirs.scoped("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    Tables.normalizeEventTs(
      s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d)).parquet(dir.toString))
  }

  /** Sentinel rows (2100-01-01T00:00Z, the far future) written in the SAME
    * physical layout as the events file so the schema-pinned file stream
    * accepts both batches: nanos-long files get a raw Long, NTZ files get
    * a LocalDateTime (encodes as TIMESTAMP_NTZ — a java.sql.Timestamp
    * would write isAdjustedToUTC=true parquet, which the NTZ-pinned
    * stream scan rejects), UTC-micros files get a java.sql.Timestamp.
    * The five non-ts columns are hard-coded; assert they still match the
    * file so a layout drift fails loudly instead of silently nulling the
    * sentinel batch and defeating the watermark flush. */
  private[graft] def sentinelFrame(s: SparkSession, d: String,
      rows: Seq[(Long, Long, String)]): DataFrame = {
    import s.implicits._
    // one footer read per JVM: the getter memoizes per directory
    // (Tables.rawSchemaCache), so every sentinel/stream call site
    // shares the single cached events schema
    val raw = Tables.eventsRawSchemaPinNanosConf(s, d)
    Seq("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType).foreach { case (n, t) =>
      require(raw(n).dataType == t,
        s"events.$n is ${raw(n).dataType} but the sentinel writes $t — " +
        "testdata layout drift; update sentinelFrame")
    }
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    raw("ts").dataType match {
      case LongType =>
        rows.map { case (id, uid, tpe) =>
          (id, 4102444800000000000L, uid, tpe, 0.0d, "")
        }.toDF(cols: _*)
      case org.apache.spark.sql.types.TimestampNTZType =>
        rows.map { case (id, uid, tpe) =>
          (id, java.time.LocalDateTime.of(2100, 1, 1, 0, 0, 0), uid, tpe, 0.0d, "")
        }.toDF(cols: _*)
      case _ =>
        rows.map { case (id, uid, tpe) =>
          (id, java.sql.Timestamp.from(
            java.time.Instant.parse("2100-01-01T00:00:00Z")), uid, tpe, 0.0d, "")
        }.toDF(cols: _*)
    }
  }

  private val memSeq = new java.util.concurrent.atomic.AtomicInteger
  /** Drive a streaming frame to completion (AvailableNow trigger) into
    * a memory sink and return the sink table. For aggregations,
    * `complete` mode re-emits the full state at the last batch, so the
    * result is deterministic regardless of micro-batch boundaries (no
    * watermark eviction). For stream-stream INNER joins, `append` is
    * the only mode — each match is emitted exactly once when found,
    * so the emitted SET equals the batch join (watermarks only bound
    * state, they drop nothing when event time never regresses by more
    * than the allowance). Production append-mode aggregation behavior
    * is covered by StreamIngestSpec. */
  private def runToMemory(s: SparkSession, df: DataFrame,
      mode: String = "complete"): DataFrame = {
    val name = s"graft_stream_sink_${memSeq.incrementAndGet()}"
    // state partitions sized to state volume, not the session's batch
    // scan parallelism (StreamTuning scaladoc) — each micro-batch pays
    // a fixed per-partition state-store cost, so a batch-sized 32/200
    // multiplies the stream's floor for nothing. startScoped: the pin
    // covers only query construction; the drain below runs with the
    // session conf already restored (no cross-thread leak window)
    val q = graft.streaming.StreamTuning.startScoped(s) {
      df.writeStream.outputMode(mode).format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    try q.awaitTermination() finally q.stop()
    s.table(name)
  }

  // watermarked hourly rollup run AS A STREAM (file source → complete
  // mode → memory sink); the oracle is the equivalent batch GROUP BY
  private def p34(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val st = eventsStream(s, d).select(col("ts"), col("event_type"),
      (col("value").cast(D) * 100).cast("long").as("value"))
    runToMemory(s, graft.streaming.EventRollup.rollup(
        st, Seq(col("event_type")), "1 hour", "10 minutes"))
      .select(col("range_start"), col("range_end"), col("event_type"),
        col("n"), col("sum_value").as("sum_cents"),
        col("min_value").as("min_cents"), col("max_value").as("max_cents"))
      .orderBy(col("range_start"), col("event_type"))
  }

  // native session_window sessionization run as a stream; the oracle is
  // gap-sessionization with session_window's boundary-inclusive merge
  // (events exactly `gap` apart still merge — StreamIngestSpec pins it)
  private def p35(s: SparkSession, d: String): DataFrame = {
    val st = eventsStream(s, d)
      .select(col("ts"), col("user_id"), col("event_type"))
    runToMemory(s, graft.streaming.StreamSessions.sessionStats(
        st, col("user_id"), "ts", "30 minutes", "10 minutes",
        extraAggs = Seq(max(col("ts")).as("session_end"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_end"), col("n_events"), col("n_purchases"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // ---------- content-defined chunking / corpus profiling ----------

  // CDC chunk dedup: content-anchored chunk boundaries, global
  // chunk-hash dedup, per-doc duplicated-token ratio
  private def p36(s: SparkSession, d: String): DataFrame =
    Chunking.dedupSummary(Tables.documents(s, d), "doc_id", "text",
        w = 4, div = 8)
      .orderBy(col("doc_id"))

  // tokenizer corpus stats: adjacent-token pair counts (the BPE
  // first-merge decision), top 50
  private def p37(s: SparkSession, d: String): DataFrame =
    TextOps.topPairs(Tables.documents(s, d), "text", 50)

  // stream-stream interval join (purchases ⋈ prior views within 1 h by
  // the same user), run as TWO streaming sources: per-side watermarks
  // bound the join state to the interval horizon — the shape that holds
  // on an unbounded clickstream; each match emits exactly once (append
  // mode), so the emitted set equals the batch join oracle
  private def p40(s: SparkSession, d: String): DataFrame = {
    def side(tpe: String, prefix: String) = eventsStream(s, d)
      .filter(col("event_type") === tpe && col("user_id") % 5 === 3)
      .select(col("user_id").as(s"${prefix}_user"),
        col("ts").as(s"${prefix}_ts"), col("event_id").as(s"${prefix}_id"))
      .withWatermark(s"${prefix}_ts", "1 hour")
    val joined = side("purchase", "p").join(side("view", "v"),
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
    runToMemory(s, joined.select(col("p_id").as("purchase_id"),
        col("v_id").as("view_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts")), mode = "append")
      .orderBy(col("purchase_id"), col("view_id"))
  }

  // chained stateful streaming (minute counts → hourly rollup of them)
  // in APPEND mode — the production emission semantics: windows emit
  // when the watermark passes them. Determinism comes from a far-future
  // sentinel file processed in a LATER micro-batch (maxFilesPerTrigger=1,
  // mtime order): it advances the watermark past every real window, the
  // no-data batch flushes them, and the sentinel's own windows can
  // never flush — append mode drops them for free.
  private def p42(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p42")
    val events = dir.resolve("a_events.parquet")
    java.nio.file.Files.createSymbolicLink(events,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    // sentinel: one row far in the future (raw schema layout)
    val tmp = graft.TempDirs.scoped("graft_p42_sent")
    sentinelFrame(s, d, Seq((-1L, -1L, "sentinel")))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val sentinel = dir.resolve("b_sentinel.parquet")
    java.nio.file.Files.copy(part, sentinel)
    // order the two micro-batches by mtime WITHOUT touching the shared
    // events file: setLastModifiedTime on the symlink would FOLLOW it
    // and stamp the read-only testdata itself. The events parquet's
    // own mtime predates this run, so pushing only the sentinel COPY
    // (a file this query owns) into the future guarantees the order.
    java.nio.file.Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))
    val st = Tables.normalizeEventTs(
        s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
          .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .withWatermark("ts", "0 seconds")
    val minutely = st
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hourly = minutely
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), max(col("n")).as("max_minute"),
        count(lit(1)).as("active_minutes"))
      .select(col("window.start").as("range_start"), col("event_type"),
        col("n_events"), col("max_minute"), col("active_minutes"))
    runToMemory(s, hourly, mode = "append")
      .filter(col("range_start") < lit(java.sql.Timestamp.valueOf(
        "2099-01-01 00:00:00"))) // defensive: sentinel windows never flush
      .orderBy(col("range_start"), col("event_type"))
  }

  // deterministic train/val/test split: per-(source, split) counts
  private def p43(s: SparkSession, d: String): DataFrame =
    Sampling.splitAssign(Tables.documents(s, d), "doc_id",
        trainPpm = 900000L, valPpm = 50000L)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"), col("split"))

  // cross-source overlap matrix: which sources copy from each other
  private def p47(s: SparkSession, d: String): DataFrame =
    TextOps.sourceOverlap(Tables.documents(s, d), "source", "text",
        n = 6, dfCap = 10, minPpm = 0L)
      .select(col("i"), col("j"), col("n_shared"),
        col("containment_i_ppm"), col("containment_j_ppm"))
      .orderBy(col("i"), col("j"))

  // multimodal frame sampling: every 2nd 64-byte frame window, ≤4 per
  // asset — the 1→N demuxer explode with per-frame offset metadata
  private def p46(s: SparkSession, d: String): DataFrame = {
    val assets = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Multimodal.sampleFrames(assets, "doc_id", "payload",
        frameBytes = 64, stride = 2, maxFrames = 4)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // salted skew join: purchases ⋈ views per user with the hot users'
  // rows scattered across 8 salt sub-partitions — result identical to
  // the plain join (the oracle runs the unsalted SQL)
  private def p45(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"))
    val vw = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("v_id"))
    val hot = graft.operators.SkewJoin.hotKeys(pur, "user_id", minCount = 10)
    graft.operators.SkewJoin.saltedInner(pur, vw, "user_id",
        saltBy = col("p_id"), salts = 8, hot = hot)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), min(col("p_id")).as("min_p"),
        max(col("v_id")).as("max_v"))
      .orderBy(col("user_id"))
  }

  // KMV cardinality sketch: per-source distinct-token estimate vs exact
  private def p44(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d).select(col("source"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    Sketches.kmvCardinality(tok, "source", col("tok"), k = 16)
      .orderBy(col("source"))
  }

  // chunk-dedup rewrite: reassemble each doc from corpus-unique chunks
  private def p41(s: SparkSession, d: String): DataFrame =
    Chunking.dedupRewrite(Tables.documents(s, d), "doc_id", "text",
        w = 4, div = 8)
      .orderBy(col("doc_id"))

  // PQ ANN: per-subspace integer k-means codebook + asymmetric-distance
  // top-k — the fourth ANN family member (brute / LSH / IVF / PQ)
  private def p39(s: SparkSession, d: String): DataFrame =
    Similarity.pqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      queryId = 0L, dim = 64, m = 8, k = 4, iters = 1, topK = 10)

  // chunk-store containment: partial-copy relations at sub-document
  // granularity — CDC chunk hashes as the fingerprint index, the same
  // df-capped postings tail as p30/p47
  private def p48(s: SparkSession, d: String): DataFrame =
    Chunking.chunkContainment(Tables.documents(s, d), "doc_id", "text",
        w = 4, div = 8, dfCap = 10, minPpm = 100000L)
      .select(col("i"), col("j"), col("n_shared"),
        col("containment_i_ppm"), col("containment_j_ppm"))
      .orderBy(col("i"), col("j"))

  // mergeable histogram quantile sketch: per-source length quantiles
  // from fixed 50-char bins — each within 50 of p38's exact values
  private def p49(s: SparkSession, d: String): DataFrame = {
    val hist = Sketches.histogram(Tables.documents(s, d), "source",
      col("n_chars"), binWidth = 50L)
    Sketches.histQuantiles(hist, "source", binWidth = 50L)
      .select(col("source"), col("n_rows").as("n_docs"), col("min_lo"),
        col("p25_lo"), col("p50_lo"), col("p75_lo"), col("p95_lo"),
        col("max_lo"))
      .orderBy(col("source"))
  }

  // salted LEFT join: purchases enriched with views; users ≡1 (mod 4)
  // have no view rows → genuine null-extension through the salt
  private def p50(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"))
    val vw = ev.filter(col("event_type") === "view" && col("user_id") % 4 =!= 1)
      .select(col("user_id"), col("event_id").as("v_id"))
    val hot = graft.operators.SkewJoin.hotKeys(pur, "user_id", minCount = 10)
    graft.operators.SkewJoin.saltedLeft(pur, vw, "user_id",
        saltBy = col("p_id"), salts = 8, hot = hot)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("v_id")).as("n_matched"),
        min(col("p_id")).as("min_p"), max(col("v_id")).as("max_v"))
      .orderBy(col("user_id"))
  }

  // keyframe selection: emit a frame only when its coarse signature
  // level changed from the previously kept frame, ≤8 keyframes/asset
  private def p51(s: SparkSession, d: String): DataFrame = {
    val assets = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Multimodal.sampleKeyframes(assets, "doc_id", "payload",
        frameBytes = 64, maxKeep = 8, levelDiv = 1024L)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // STREAMING as-of enrichment: purchases (probes) pick up the latest
  // prior view's cents (quotes) per user, watermark-finalized — the
  // same sentinel-batch technique as p42 flushes the tail; the oracle
  // is DuckDB's native ASOF LEFT JOIN (p31's shape)
  private def p53(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p53")
    val events = dir.resolve("a_events.parquet")
    java.nio.file.Files.createSymbolicLink(events,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    // far-future sentinel processed as a LATER micro-batch: advances the
    // watermark past every real probe so the final no-data batch fires
    // the remaining event-time timeouts; it enters the operator as a
    // quote for the unused key -1, so it can never affect output
    val tmp = graft.TempDirs.scoped("graft_p53_sent")
    sentinelFrame(s, d, Seq((-1L, -1L, "view")))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val sentinel = dir.resolve("b_sentinel.parquet")
    java.nio.file.Files.copy(part, sentinel)
    // order the two micro-batches by mtime WITHOUT touching the shared
    // events file: setLastModifiedTime on the symlink would FOLLOW it
    // and stamp the read-only testdata itself. The events parquet's
    // own mtime predates this run, so pushing only the sentinel COPY
    // (a file this query owns) into the future guarantees the order.
    java.nio.file.Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val st = Tables.normalizeEventTs(
        s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
          .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .filter(col("user_id") % 5 === 2 || col("user_id") === -1L)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("user_id").as("k"), col("ts"),
        when(col("event_type") === "purchase", lit("p")).otherwise(lit("q"))
          .as("side"),
        col("event_id").as("id"),
        (col("value").cast(D) * 100).cast("long").as("v"))
    runToMemory(s, graft.streaming.StreamAsof.backwardEnrich(
        st, "k", "ts", "side", "id", "v"), mode = "append")
      .select(col("id").as("event_id"), col("k").as("user_id"),
        col("ts"), col("asof_value").as("view_cents"))
      .orderBy(col("event_id"))
  }

  // STREAMING exact dedup at ingest: dropDuplicates on the entity key
  // over the event stream — the dedup-on-arrival front door of a
  // training-data ingest pipeline (every later pipeline stage sees
  // each key once). Append mode emits each key's FIRST arrival exactly
  // once, so the emitted KEY SET equals batch DISTINCT; only the key
  // columns are output (which occurrence wins is batch-order-
  // dependent). Exact semantics keep per-key state forever — the
  // oracle-checkable form; the state-bounded production variant is
  // dropDuplicatesWithinWatermark (drops dupes only within the
  // watermark horizon — a recall trade, not oracle-gated).
  private def p78(s: SparkSession, d: String): DataFrame = {
    val st = eventsStream(s, d)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    runToMemory(s, st, mode = "append")
      .orderBy(col("user_id"), col("event_type"))
  }

  // CUSTOM-STATE sessionization: the same 30-minute-gap sessions as
  // p32 (and p35's session_window) but through flatMapGroupsWithState
  // with EventTimeTimeout — the custom-state streaming shape for
  // semantics session_window can't carry (per-session ordinals,
  // arbitrary accumulators, mid-session emission policies). State is
  // ONE OpenSession per active user (O(1) per key, dropped at
  // timeout); closed sessions emit the moment a later event proves the
  // gap, and the sentinel batch advances the watermark so the final
  // open sessions emit on event-time timeout (the p42 technique — the
  // sentinel's own key -1 never times out and is filtered besides).
  // Oracle: p32's batch sessionization SQL verbatim.
  private def p79(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p79")
    java.nio.file.Files.createSymbolicLink(dir.resolve("a_events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    val tmp = graft.TempDirs.scoped("graft_p79_sent")
    sentinelFrame(s, d, Seq((-1L, -1L, "sentinel")))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val sentinel = dir.resolve("b_sentinel.parquet")
    java.nio.file.Files.copy(part, sentinel)
    // mtime-order the sentinel AFTER the data batch without touching
    // the shared testdata through the symlink (see p42)
    java.nio.file.Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))
    import s.implicits._
    val st = Tables.normalizeEventTs(
        s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
          .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "purchase").as("is_purchase"))
      .as[graft.streaming.SessEvent]
    val out = graft.streaming.StateSessions.sessions(st, gapSec = 1800L)
    runToMemory(s, out.toDF(), mode = "append")
      .filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("session_seq"))
  }

  // p79's sessionization re-expressed on the transformWithState API
  // (typed state handles + explicit timer registry + RocksDB store) —
  // identical semantics, identical oracle. The RocksDB provider conf is
  // session-wide, so it is set for this query and restored after.
  private def p81(s: SparkSession, d: String): DataFrame = {
    val prev = s.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TwsSessions.RocksProvider)
    try {
      val dir = graft.TempDirs.scoped("graft_p81")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve("a_events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val tmp = graft.TempDirs.scoped("graft_p81_sent")
      sentinelFrame(s, d, Seq((-1L, -1L, "sentinel")))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(p =>
        p.getFileName.toString.startsWith("part-")).findFirst().get()
      val sentinel = dir.resolve("b_sentinel.parquet")
      java.nio.file.Files.copy(part, sentinel)
      java.nio.file.Files.setLastModifiedTime(sentinel,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 60000L))
      import s.implicits._
      val st = Tables.normalizeEventTs(
          s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
            .option("maxFilesPerTrigger", "1").parquet(dir.toString))
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"), col("event_id"),
          (col("event_type") === "purchase").as("is_purchase"))
        .as[graft.streaming.SessEvent]
      val out = graft.streaming.TwsSessions.sessions(st, gapSec = 1800L)
      runToMemory(s, out.toDF(), mode = "append")
        .filter(col("user_id") >= 0)
        .orderBy(col("user_id"), col("session_seq"))
        .localCheckpoint() // pin before the provider conf is restored
    } finally {
      prev match {
        case Some(v) => s.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // Streaming per-source admission quota (transformWithState ValueState
  // counter, TimeMode.None — lifetime budget, no watermark): the corpus
  // arrives in two micro-batches split on doc_id, and the admitted set
  // must equal the batch "first cap per source by doc_id" the oracle's
  // ROW_NUMBER computes — the counter must carry across batches.
  private def p82(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, graft.streaming.TwsSessions.RocksProvider)
    try {
      val dir = graft.TempDirs.scoped("graft_p82")
      val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
      def writeBatch(pred: org.apache.spark.sql.Column, name: String,
          mtimePlus: Long): Unit = {
        val tmp = graft.TempDirs.scoped(s"graft_p82_$name")
        docs.filter(pred).coalesce(1).write.mode("overwrite")
          .parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).filter(p =>
          p.getFileName.toString.startsWith("part-")).findFirst().get()
        val dst = dir.resolve(s"$name.parquet")
        java.nio.file.Files.copy(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + mtimePlus))
      }
      writeBatch(col("doc_id") < 250, "a_early", 0L)
      writeBatch(col("doc_id") >= 250, "b_late", 60000L)
      import s.implicits._
      val st = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType))))
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .as[graft.streaming.QuotaDoc]
      runToMemory(s, graft.streaming.StreamQuota.admit(st, cap = 12L).toDF(),
          mode = "append")
        .orderBy(col("source"), col("doc_id"))
        .localCheckpoint()
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  // corpus snapshot diff: two crawls derived from documents (ids shift,
  // every 7th doc's content mutates) — added/removed/changed/unchanged
  // per id; added ∪ changed is the incremental reprocessing work list
  private def p91(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val prev = docs.filter(col("doc_id") < 450)
      .select(col("doc_id"), col("text"))
    val cur = docs.filter(col("doc_id") >= 50)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    Dedup.snapshotDiff(prev, cur, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  // near-dup family provenance: the audit record kept alongside a
  // dedup pass — keeper + sorted member roster + contributing sources
  // per multi-member cluster (member lists emitted comma-joined: no
  // green query ships array columns through the hash compare)
  private def p92(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
    Dedup.clusterProvenance(docs, "doc_id", "source", pairs)
      .select(col("cluster"), col("keeper"), col("n_members"),
        concat_ws(",", transform(col("members"), x => x.cast("string")))
          .as("members"),
        concat_ws(",", col("sources")).as("sources"))
      .orderBy(col("cluster"))
  }

  // winsorized per-source length stats: rank-picked p05/p95 bounds,
  // clamped sum + floor-ppm mean — the outlier-robust dashboard row
  private def p93(s: SparkSession, d: String): DataFrame =
    Profiling.winsorized(Tables.documents(s, d), "source", "n_chars",
        tieBreak = "doc_id", loPct = 5, hiPct = 95)
      .orderBy(col("source"))

  // power-of-two padding buckets: the batching-efficiency audit (how
  // much padded capacity a fixed-shape loader wastes per bucket)
  private def p94(s: SparkSession, d: String): DataFrame =
    Partitioning.lengthBuckets(Tables.documents(s, d), "n_chars",
        base = 64L)
      .orderBy(col("bucket"))

  // corpus-learned boilerplate strip: drop tokens whose per-source
  // document frequency ≥ 60%, rebuild text in original token order
  private def p95(s: SparkSession, d: String): DataFrame =
    TextOps.stripBoilerplate(Tables.documents(s, d), "doc_id", "source",
        "text", dfPpm = 600000L)
      .orderBy(col("doc_id"))

  // key-uniqueness audit: is (l_orderkey, l_linenumber) a primary
  // key — duplicate-key groups, worst multiplicity, and the same
  // check on l_orderkey alone (expected to fail: multi-line orders)
  private def p141(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def audit(name: String, keys: Seq[String]) = li
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(lit(name).as("key_set"),
        count(lit(1)).as("n_keys"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_keys"),
        max(col("c")).as("max_multiplicity"))
    audit("orderkey", Seq("l_orderkey"))
      .unionByName(audit("orderkey_linenumber",
        Seq("l_orderkey", "l_linenumber")))
      .orderBy(col("key_set"))
  }

  // referential-integrity audit: orphan foreign keys across the
  // relational tables — the constraint check a lakehouse can't
  // enforce at write time and must therefore audit
  private def p142(s: SparkSession, d: String): DataFrame = {
    def orphans(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String) = {
      val o = child.select(col(fk).as("k"))
        .join(parent.select(col(pk).as("k")).distinct(), Seq("k"),
          "left_anti")
      o.agg(lit(name).as("fk"),
        count(lit(1)).as("orphan_rows"),
        count_distinct(col("k")).as("orphan_keys"))
    }
    orphans("lineitem.l_orderkey->orders", Tables.lineitem(s, d),
        "l_orderkey", Tables.orders(s, d), "o_orderkey")
      .unionByName(orphans("orders.o_custkey->customer",
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"))
      .unionByName(orphans("customer.c_nationkey->nation",
        Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"))
      .orderBy(col("fk"))
  }

  // temperature-flattened token mixture: α=0.5 flattening of the
  // per-source TOKEN shares under an explicit token budget (the
  // T5/mT5 multilingual sampling recipe); the summary hashes the
  // quota arithmetic AND the hash-selected doc/token counts
  private def p144(s: SparkSession, d: String): DataFrame = {
    val ntok = size(TextOps.tokens(col("text"))).cast("long")
    Sampling.tokenMixture(Tables.documents(s, d), "doc_id", "source",
        tokens = ntok, budgetTokens = 12000L,
        weight = floor(sqrt(col("tok_total")) * 1000000.0d),
        seed = 5)
      .groupBy(col("source"), col("tok_total"), col("weight"),
        col("tok_target"), col("keep_ppm"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), ntok).otherwise(0L)).as("tokens_kept"))
      .orderBy(col("source"))
  }

  // classifier calibration audit: reliability bins + ECE over a
  // deterministic ppm score from the embedding's first coordinate vs
  // the class label's parity — "can the quality classifier's scores
  // be trusted as probabilities before filtering on them?"
  private def p145(s: SparkSession, d: String): DataFrame = {
    val score = greatest(lit(0L), least(lit(999999L),
      floor((element_at(col("embedding"), 1).cast("double") + 0.5d)
        * 1000000.0d)))
    Profiling.calibrationBins(
        Tables.embeddings(s, d)
          .select(score.as("score_ppm"), (col("label") % 2).as("label")),
        col("score_ppm"), col("label"), bins = 10)
      .orderBy(col("bin"))
  }

  // epoch-repetition mixture (data-constrained regime): uniform token
  // targets overshoot every source, so scarce sources repeat for whole
  // epochs up to the cap (rem_ppm 0 where it binds) plus one
  // hash-deterministic partial epoch; the summary hashes the quota
  // algebra AND the per-row copy assignment
  private def p146(s: SparkSession, d: String): DataFrame = {
    val ntok = size(TextOps.tokens(col("text"))).cast("long")
    Sampling.epochMixture(Tables.documents(s, d), "doc_id", "source",
        tokens = ntok, budgetTokens = 60000L, weight = lit(1L),
        maxEpochs = 2, seed = 11)
      .groupBy(col("source"), col("tok_total"), col("tok_target"),
        col("epochs_full"), col("rem_ppm"))
      .agg(sum(when(col("n_copies") > col("epochs_full"), 1L)
          .otherwise(0L)).as("n_docs_extra"),
        sum(ntok * col("n_copies")).as("tokens_assigned"))
      .orderBy(col("source"))
  }

  // distributed BPE tokenizer training (Sennrich'16): 4 sequential
  // merges learned over the word-vocabulary frame — corpus touched
  // once, rounds are vocab-sized; the oracle replays the exact loop
  // unrolled round by round (same wrapper representation, same
  // replace, same (n DESC, a, b) tie-break)
  private def p147(s: SparkSession, d: String): DataFrame =
    Bpe.train(Tables.documents(s, d), "text", merges = 4)
      .select(col("merge_rank").cast("long").as("merge_rank"),
        col("a"), col("b"), col("merged"), col("pair_n"))
      .orderBy(col("merge_rank"))

  // subword segmentation under the learned merge table: per doc the
  // subword count + the '+'-marked segmentation in original word order
  private def p148(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Bpe.segment(docs, "doc_id", "text", Bpe.train(docs, "text", 4))
      .orderBy(col("doc_id"))
  }

  // importance propagation over the event-type transition graph
  // (integer power iteration, 3 damped rounds): which stages
  // accumulate attention — the crawl/stage-prioritization primitive;
  // the oracle replays the iterations unrolled in exact integer math
  private def p149(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = Tables.events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    Graphs.powerIteration(edges, "src", "dst", "w", iters = 3)
      .orderBy(col("node"))
  }

  // k-anonymity audit over (event_type, day): group sizes + the
  // re-identification risk flag — the privacy check before shipping
  // a corpus with user-derived attributes
  private def p150(s: SparkSession, d: String): DataFrame =
    Profiling.kAnonymity(
      Tables.events(s, d).select(col("event_type"),
        to_date(col("ts")).as("day")),
      Seq("event_type", "day"), k = 100L)
      .orderBy(col("event_type"), col("day"))

  // SCD-2 validity intervals per user over the event-type stream —
  // "when did this entity hold this value", the recrawl/content-hash
  // history consolidation; one deterministic observation per (user,
  // ts) first (min event_id wins), then gaps-and-islands
  private def p151(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id"))
    val obs = Tables.events(s, d)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("ts"), col("event_type"))
    Sessions.validityIntervals(obs, "user_id", "ts", "event_type")
      .orderBy(col("user_id"), col("valid_from"))
  }

  // incremental-BPE drift analysis: residual pair counts after the
  // shipped 4-merge table applies — exactly the candidate frame the
  // 5th training round would rank (a surging residual pair = vocab
  // drift); oracle = the unrolled chain's round-5 pair counts
  private def p152(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Bpe.residualPairs(docs, "text", Bpe.train(docs, "text", 4),
        topK = 20)
      .orderBy(col("n").desc, col("a"), col("b"))
  }

  // STREAMING SCD-2: validityIntervals as the watermark-buffered
  // StateScd fold under the sentinel-flush harness — closed rows
  // emitted as values change, the open current row at quiescence;
  // closed-wins per (user, valid_from) reconstructs exactly the
  // batch history, so p151's oracle applies verbatim
  private def p153(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p153")
    java.nio.file.Files.createSymbolicLink(dir.resolve("a_events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    val tmp = graft.TempDirs.scoped("graft_p153_sent")
    sentinelFrame(s, d, Seq((-1L, -1L, "sentinel")))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val sentinel = dir.resolve("b_sentinel.parquet")
    java.nio.file.Files.copy(part, sentinel)
    java.nio.file.Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))
    import s.implicits._
    val st = Tables.normalizeEventTs(
        s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
          .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("value"))
      .as[graft.streaming.ScdEvent]
    val out = graft.streaming.StateScd.intervals(st)
    runToMemory(s, out.toDF(), mode = "append")
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"), col("value"), col("valid_from"))
      .agg(max(col("valid_to")).as("valid_to"),
        max(col("n_obs")).as("n_obs"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  // PERSISTED IVF index: the p14 assignment saved as a cell-
  // partitioned table, probed by a two-query batch — probe I/O is
  // cell-sized (partition pruning), never corpus-sized; the oracle
  // replays assignment + in-cell re-rank per query
  private def p154(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // p14's sampled codebook: the 8 lowest-id vectors
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    // fixed name: saveIvfIndex drops table AND location, so reruns
    // (bench reps, a second driver verify in the same cwd) are safe
    val name = "graft_ivf_p154"
    Similarity.saveIvfIndex(emb, "vec_id", "embedding", cb, name)
    val (cells, cb2) = Similarity.loadIvfIndex(s, name)
    Similarity.probeIvfIndex(cells, cb2,
        emb.filter(col("vec_id").isin(100L, 200L)),
        "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
      .select(col("qid"), col("vec_id"),
        TextOps.ppm(col("cos")).as("cos_ppm"))
  }

  // GOVERNED persisted IVF index — p154's assignment written THROUGH
  // THE STORE (datasource powa_index_ivf, tiers cells/codebook, the
  // AtomicSwap per-srvid commit), read back via the DSv2 scan with
  // srvid tenancy, probed with the same two-query batch. The probe's
  // `cell IN (...)` now file-skips against the manifest's cell
  // min/max instead of hive partition pruning (PlanSpec pins scanned
  // < total); the result set is identical, so p154's oracle applies
  // verbatim. ACL: the index tiers are powa-guarded objects at the
  // catalog surface (AclSpec pins the denial).
  private def p156(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p156_store").toString
    Similarity.saveIvfIndexStore(emb, "vec_id", "embedding", cb, root,
      "ivf", srvid = 1)
    val (cells, cb2) = Similarity.loadIvfIndexStore(s, root, "ivf",
      srvid = 1)
    Similarity.probeIvfIndex(cells, cb2,
        emb.filter(col("vec_id").isin(100L, 200L)),
        "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
      .select(col("qid"), col("vec_id"),
        TextOps.ppm(col("cos")).as("cos_ppm"))
  }

  // governed incremental dedup — p98's batch probe against the
  // signature index persisted THROUGH THE STORE: index tiers written
  // with the AtomicSwap commit, read back via DSv2, probed with the
  // broadcast-probe join (the corpus-sized index frames are scanned
  // once each and never shuffled — probeIndexStore). Same pair set,
  // so p98's oracle applies verbatim.
  private def p157(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val batch = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))
    val root = graft.TempDirs.scoped("graft_p157_store").toString
    Dedup.saveSignatureIndexStore(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, root, "sig", srvid = 1)
    val (hsh2, banded2) = Dedup.loadSignatureIndexStore(s, root, "sig",
      srvid = 1)
    Dedup.probeIndexStore(hsh2, banded2, batch, "doc_id", threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))
  }

  // INCREMENTAL admission into the governed IVF index: build on the
  // even half, append the odd half through the store's batch-append
  // commit (assignment reuses the index's persisted codebook), probe
  // the combined index — build+append must equal the one-shot build,
  // so p154's oracle applies verbatim. The daily-ingest shape: a new
  // vector batch costs batch-sized work, never an index rebuild.
  private def p158(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p158_store").toString
    Similarity.saveIvfIndexStore(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cb, root, "ivf", srvid = 1)
    Similarity.appendIvfIndexStore(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "ivf", srvid = 1)
    val (cells, cb2) = Similarity.loadIvfIndexStore(s, root, "ivf",
      srvid = 1)
    Similarity.probeIvfIndex(cells, cb2,
        emb.filter(col("vec_id").isin(100L, 200L)),
        "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
      .select(col("qid"), col("vec_id"),
        TextOps.ppm(col("cos")).as("cos_ppm"))
  }

  // incremental admission into the governed signature index: build on
  // the even docs, append the odd docs (same banding geometry), probe
  // with p98's batch — build+append ≡ one-shot index, p98's oracle
  // verbatim
  private def p159(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val batch = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))
    val root = graft.TempDirs.scoped("graft_p159_store").toString
    Dedup.saveSignatureIndexStore(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", n = 3, k = 16, rowsPerBand = 4, root, "sig",
      srvid = 1)
    // the append reads the index's persisted geometry — the caller
    // cannot drift it
    Dedup.appendSignatureIndexStore(docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", root, "sig", srvid = 1)
    val (hsh, banded) = Dedup.loadSignatureIndexStore(s, root, "sig",
      srvid = 1)
    Dedup.probeIndexStore(hsh, banded, batch, "doc_id", threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))
  }

  // IVF MULTI-PROBE on the governed index (the standard recall/IO
  // dial): each query probes its nprobe=2 best cells — double the
  // opened files per query, strictly better recall, candidates
  // disjoint by construction (cells partition the corpus). Compaction
  // folds the appended generations back to ~one file per cell first:
  // the full index lifecycle (build → append → compact → multi-probe)
  // in one oracle-gated query.
  private def p160(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p160_store").toString
    Similarity.saveIvfIndexStore(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cb, root, "ivf", srvid = 1)
    Similarity.appendIvfIndexStore(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "ivf", srvid = 1)
    Similarity.compactIvfIndexStore(s, root, "ivf", srvid = 1)
    val (cells, cb2) = Similarity.loadIvfIndexStore(s, root, "ivf",
      srvid = 1)
    Similarity.probeIvfIndex(cells, cb2,
        emb.filter(col("vec_id").isin(100L, 200L)),
        "vec_id", "embedding", k = 5, nprobe = 2)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
      .select(col("qid"), col("vec_id"),
        TextOps.ppm(col("cos")).as("cos_ppm"))
  }

  // IVF PROBE WITH ZERO CALLER-SUPPLIED BUILD CONSTANTS — the round-11
  // verdict's top item: the index geometry (k, dim, metric) AND the
  // probe width (nprobe_default = 2) are persisted in the index's own
  // `params` tier at build time and read back by probeIvfIndexStore;
  // the probe call names only the index and the query batch. Same
  // lifecycle as p160 (build → append → compact → probe), so its
  // nprobe=2 oracle applies verbatim — proving the store-read
  // geometry reproduces exactly what a trusted caller used to pass.
  // Drifted-geometry probes are impossible (loadIvfIndexStore
  // cross-checks the codebook against params; EngineSpec pins the
  // rejection).
  private def p161(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p161_store").toString
    Similarity.saveIvfIndexStore(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cb, root, "ivf", srvid = 1,
      nprobeDefault = 2)
    Similarity.appendIvfIndexStore(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "ivf", srvid = 1)
    Similarity.compactIvfIndexStore(s, root, "ivf", srvid = 1)
    Similarity.probeIvfIndexStore(s, root, "ivf", srvid = 1,
        emb.filter(col("vec_id").isin(100L, 200L)),
        "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
      .select(col("qid"), col("vec_id"),
        TextOps.ppm(col("cos")).as("cos_ppm"))
  }

  // PERSISTED PQ index — the production form of p39: train once,
  // encode the corpus into the governed pq_codes tier (m small ints
  // per vector), probe by ADC over CODES ONLY (raw vectors never read
  // at probe time) with zero caller-supplied build constants
  // (geometry + codebooks from the index's own tiers). Persistence
  // and the encode/probe split must be invisible to the math, so
  // p39's oracle applies verbatim.
  private def p162(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val root = graft.TempDirs.scoped("graft_p162_store").toString
    Similarity.savePqIndexStore(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 4, iters = 1, root, "pq", srvid = 1)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).collect()(0)
      .getSeq[Double](0).toSeq
    Similarity.probePqIndexStore(s, root, "pq", srvid = 1, qv,
      excludeId = Some(0L), topK = 10)
  }

  // incremental PQ admission: build on the evens, append the odds
  // (encoded with the PERSISTED codebooks — geometry can't drift),
  // compact the accumulated code files, probe — build+append+compact
  // ≡ the one-shot build, so p39's oracle applies verbatim. NOTE the
  // codebooks must train on the FULL corpus for the equivalence (an
  // index's geometry is fixed at build time; admission adds rows,
  // never re-shapes) — so the build trains on all, writes codes for
  // the evens, and admission encodes the odds.
  private def p163(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val root = graft.TempDirs.scoped("graft_p163_store").toString
    Similarity.savePqIndexStore(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 4, iters = 1, root, "pq", srvid = 1)
    // re-point the codes tier at the evens only, then admit the odds:
    // the codebooks stay the full-corpus training either way
    val store = new graft.core.Store(s, root)
    val (codes, _, _) = Similarity.loadPqIndexStore(s, root, "pq", 1)
    store.overwritePartition("powa_index_pq", "pq_codes", 1,
      codes.filter(col("vec_id") % 2 === 0).localCheckpoint())
    Similarity.appendPqIndexStore(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "pq", srvid = 1)
    Similarity.compactPqIndexStore(s, root, "pq", srvid = 1)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).collect()(0)
      .getSeq[Double](0).toSeq
    Similarity.probePqIndexStore(s, root, "pq", srvid = 1, qv,
      excludeId = Some(0L), topK = 10)
  }

  // IVF REBALANCE — the maintenance operation the rest of the index
  // lifecycle eventually needs: admissions assign with the BUILD-time
  // codebook (by design), so under drifting ingest cells skew and the
  // sampled seed codebook goes stale. Rebalance retrains the codebook
  // from the index's CURRENT corpus (k and nprobe_default from the
  // index's own params tier — zero caller-supplied constants) and
  // reassigns every vector through the same write path as a fresh
  // build. The oracle replays exactly that equivalence: integer-e4
  // Lloyd training (p24's CTEs) on the full corpus + cosine
  // assignment + the nprobe=2 probe — rebalance(build+append) must be
  // indistinguishable from a fresh build with the trained codebook.
  private def p164(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p164_store").toString
    Similarity.saveIvfIndexStore(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cb, root, "ivf", srvid = 1,
      nprobeDefault = 2)
    Similarity.appendIvfIndexStore(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", root, "ivf", srvid = 1)
    Similarity.rebalanceIvfIndexStore(s, root, "ivf", srvid = 1,
      iters = 2)
    Similarity.probeIvfIndexStore(s, root, "ivf", srvid = 1,
        emb.filter(col("vec_id").isin(100L, 200L)),
        "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
      .select(col("qid"), col("vec_id"),
        TextOps.ppm(col("cos")).as("cos_ppm"))
  }

  // DSIR importance weighting (Xie et al. 2023): rank every raw-pool
  // doc by how target-like its hashed-bigram distribution is — the
  // standing crawl-steering technique. src0 plays the high-quality
  // reference set; integer bit-length logs keep the score replayable
  // bit-for-bit in the oracle.
  private def p165(s: SparkSession, d: String): DataFrame =
    TextOps.dsirWeights(Tables.documents(s, d), "doc_id", "text",
        isTarget = col("source") === "src0", buckets = 64)
      .orderBy(col("doc_id"))

  // IVF cell-balance health report — the "when to rebalance" signal:
  // one row per CODEBOOK cell (a dead centroid must show n = 0, which
  // grouping the cells tier alone would hide) with population and
  // corpus share in exact integer ppm.
  private def p166(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p166_store").toString
    Similarity.saveIvfIndexStore(emb, "vec_id", "embedding", cb, root,
      "ivf", srvid = 1)
    Similarity.ivfIndexHealth(s, root, "ivf", srvid = 1)
  }

  // signature-index bucket-skew health report (p166's counterpart for
  // the LSH family): per band, rows / buckets / the largest bucket —
  // probe cost in a bucket is its size, so max_bucket is the degraded-
  // probe signal. Oracle replays the full minhash banding.
  private def p167(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val root = graft.TempDirs.scoped("graft_p167_store").toString
    Dedup.saveSignatureIndexStore(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, root, "sig", srvid = 1)
    Dedup.signatureIndexHealth(s, root, "sig", srvid = 1)
  }

  // PQ generation health (the family's third health report): codes
  // rows per generation vs the meta's current tag. Build + admit stay
  // ONE generation (admission encodes with the persisted codebooks),
  // so the report must show every row current; the gen tag itself is
  // a build timestamp and is projected away (consumers key on
  // is_current).
  private def p168(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val root = graft.TempDirs.scoped("graft_p168_store").toString
    Similarity.savePqIndexStore(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 4, iters = 1, root, "pq", srvid = 1)
    Similarity.appendPqIndexStore(
      emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", root, "pq", srvid = 1)
    Similarity.pqIndexHealth(s, root, "pq", srvid = 1)
      .select(col("n_codes"), col("is_current"))
      .orderBy(col("n_codes"))
  }

  // ANN recall audit — the EVALUATION member of the index lifecycle
  // (build → probe → health → rebalance → evaluate): per query,
  // how many of the exact top-k the IVF probe actually returned
  // (recall@k in exact integer ppm). Pure composition: the governed
  // probe vs knnJoin's one-scan exact ranking. This is the number an
  // operator watches when tuning nprobe/k against the health report —
  // and the LOW value it reports here (1/5 at nprobe=1 on the
  // 8-sampled-seed codebook) is the audit doing its job: that
  // codebook is a correctness fixture, and exactly what p164's
  // retrain + a wider nprobe exist to repair.
  private def p169(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cb = emb.select(col("vec_id").cast("long"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val root = graft.TempDirs.scoped("graft_p169_store").toString
    Similarity.saveIvfIndexStore(emb, "vec_id", "embedding", cb, root,
      "ivf", srvid = 1)
    val q = emb.filter(col("vec_id").isin(100L, 200L))
    val approx = Similarity.probeIvfIndexStore(s, root, "ivf", 1, q,
      "vec_id", "embedding", k = 5).select(col("qid"), col("vec_id"))
    val exact = Similarity.knnJoin(emb, q, "vec_id", "embedding", k = 5)
      .select(col("query_id").as("qid"), col("vec_id"))
    val hits = exact.join(approx, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    q.select(col("vec_id").as("qid")).join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_ppm", expr("n_hits * 1000000 DIV 5"))
      .orderBy(col("qid"))
  }

  // batched PQ kNN join — p59's bulk-similarity contract at PQ cost:
  // top-10 ADC neighbors for each of two queries from ONE scan of the
  // codes tier (raw vectors never read), each query ranking exactly
  // as its single probePqIndexStore call. The oracle generalizes
  // p39's ADC replay to a per-qid distance table + rank window.
  private def p170(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val root = graft.TempDirs.scoped("graft_p170_store").toString
    Similarity.savePqIndexStore(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 4, iters = 1, root, "pq", srvid = 1)
    Similarity.pqKnnJoinStore(s, root, "pq", srvid = 1,
        emb.filter(col("vec_id").isin(0L, 100L)), "vec_id", "embedding",
        topK = 10)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_dist"))
      .orderBy(col("qid"), col("rank"))
  }

  // tokenizer-aware curation chain — the round-10 composition
  // receipt (p100's sibling): learn the tokenizer (p147), segment the
  // corpus under it (p148), then budget the mixture in LEARNED
  // SUBWORDS rather than whitespace tokens (p144) — "how much of
  // each source ships, measured in the units the model will actually
  // see". Pure composition, no glue code.
  private def p155(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = Bpe.train(docs, "text", merges = 4)
    val seg = Bpe.segment(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_subwords"))
    val withTok = docs.join(seg, "doc_id")
    Sampling.tokenMixture(withTok, "doc_id", "source",
        tokens = col("n_subwords"), budgetTokens = 30000L,
        weight = floor(sqrt(col("tok_total")) * 1000000.0d), seed = 5)
      .groupBy(col("source"), col("tok_total"), col("weight"),
        col("tok_target"), col("keep_ppm"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_subwords")).otherwise(0L))
          .as("subwords_kept"))
      .orderBy(col("source"))
  }

  // ranking-agreement audit: overlap@k between the two quality
  // rankings p105 fuses — how much the heuristic score and the
  // fluency score agree about the top of the corpus before anyone
  // trusts a blended threshold
  private def p140(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val stats = TextOps.withStats(docs, "text")
      .select(col("doc_id"), col("quality_ppm"))
    val sur = TextOps.unigramSurprisal(docs, "doc_id", "text")
      .select(col("doc_id"), col("mean_surprisal_ppm"))
    val j = stats.join(sur, Seq("doc_id"))
    // only ranks ≤ max(k)=50 can contribute to any overlap count, so
    // gate each signal to its global top-50 FIRST (TakeOrdered — a
    // per-partition heap, no single-task corpus sort) and rank inside
    // the gated ≤50-row frame, where the within-gate rank IS the true
    // corpus rank (the ordering is total). The rank windows run over
    // GlobalLimit(50) inputs — bounded by a literal, not by the corpus.
    val maxK = 50
    val oA = Seq(col("quality_ppm").desc, col("doc_id").asc)
    val oB = Seq(col("mean_surprisal_ppm").asc, col("doc_id").asc)
    val ra = j.orderBy(oA: _*).limit(maxK)
      .withColumn("ra", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(oA: _*))
        .cast("long"))
      .select(col("doc_id"), col("ra"))
    val rb = j.orderBy(oB: _*).limit(maxK)
      .withColumn("rb", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(oB: _*))
        .cast("long"))
      .select(col("doc_id"), col("rb"))
    // overlap@k needs ra<=k AND rb<=k → only docs in BOTH gates matter
    val both = ra.join(rb, Seq("doc_id"))
    val ks = s.range(1).select(
      explode(array(lit(10L), lit(25L), lit(50L))).as("k"))
    val counts = both.crossJoin(ks)
      .groupBy(col("k"))
      .agg(sum(when(col("ra") <= col("k") && col("rb") <= col("k"), 1L)
        .otherwise(0L)).as("o"))
    // left join from the k spine: disjoint top-50s still emit 3 rows
    ks.join(counts, Seq("k"), "left")
      .withColumn("overlap", coalesce(col("o"), lit(0L))).drop("o")
      .withColumn("overlap_ppm", expr("overlap * 1000000 DIV k"))
      .orderBy(col("k"))
  }

  // near-dup divergence forensics: for each verified pair, the length
  // of the longest common token prefix and the first position where
  // the texts part ways — the "where did the copy change" row a
  // dedup reviewer reads (first-diff 0-based; -1 = one text is a
  // strict prefix of the other or they are token-identical)
  private def p138(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"), col("jaccard_ppm"))
    val t = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("toks"))
    val joined = pairs
      .join(t.select(col("doc_id").as("i"), col("toks").as("ta")), Seq("i"))
      .join(t.select(col("doc_id").as("j"), col("toks").as("tb")), Seq("j"))
    val m = least(size(col("ta")), size(col("tb")))
    // flags over the common span; first true = first divergence
    val flags = transform(sequence(lit(1), m),
      k => element_at(col("ta"), k) =!= element_at(col("tb"), k))
    joined
      .withColumn("first_diff",
        coalesce(array_position(flags, true) - 1, lit(-1L)))
      .select(col("i"), col("j"), col("jaccard_ppm"),
        size(col("ta")).cast("long").as("len_a"),
        size(col("tb")).cast("long").as("len_b"),
        col("first_diff"))
      .orderBy(col("i"), col("j"))
  }

  // effective sample size of quality-weighted sampling per source:
  // ESS = (Σw)²/Σw² as a ppm fraction of n — how much of the stratum
  // a weighted draw effectively uses (1e6 = uniform, small = a few
  // heavy rows dominate). Weights are downscaled to per-mille so the
  // whole computation stays in 64-bit integer DIV — exact in both
  // engines, no decimal rounding at the division boundary
  private def p139(s: SparkSession, d: String): DataFrame =
    TextOps.withStats(Tables.documents(s, d), "text")
      .select(col("source"),
        expr("quality_ppm DIV 1000").as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("w")).as("sum_w"), sum(col("w") * col("w")).as("sw2"))
      // DuckDB's integer SUM is HUGEINT, so its sum_w² · 1e6 never
      // wraps; mirror that headroom in DECIMAL(38,0) — Long would
      // silently overflow once a stratum's sum_w passes ~3e6 (≈3M docs
      // at w ≤ 1000), diverging from the oracle at scale. Bound check:
      // 1e9 docs → sum_w ≤ 1e12 → numerator ≤ 1e30 < 1e38.
      .withColumn("ess_ppm",
        expr("CAST(sum_w AS DECIMAL(38,0)) * sum_w * 1000000" +
          " DIV (CAST(n AS DECIMAL(38,0)) * sw2)"))
      .select(col("source"), col("n"), col("sum_w"), col("ess_ppm"))
      .orderBy(col("source"))

  // collocation extraction: adjacent token pairs ranked by the
  // integer PMI-order ratio c_xy·N / (c_x·c_y) — same ordering as
  // PMI without a float log; min-count floor keeps rare-pair noise out
  private def p135(s: SparkSession, d: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val pairsCol = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("x"),
          element_at(t, i + 2).as("y"))))
      .otherwise(array().cast("array<struct<x:string,y:string>>"))
    val bg = Partitioning.spread(Tables.documents(s, d))
      .select(explode(pairsCol).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .localCheckpoint() // totals + unigram counts + pair counts
    val n = bg.count() // scalar total, driver-held like p58's
    val cx = bg.groupBy(col("x")).agg(count(lit(1)).as("cx"))
    val cy = bg.groupBy(col("y")).agg(count(lit(1)).as("cy"))
    bg.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 20)
      .join(broadcast(cx), Seq("x")).join(broadcast(cy), Seq("y"))
      .withColumn("pmi_ratio_ppm",
        expr(s"cxy * $n * 1000000 DIV (cx * cy)"))
      .select(col("x"), col("y"), col("cxy"), col("pmi_ratio_ppm"))
      .orderBy(col("pmi_ratio_ppm").desc, col("x"), col("y"))
      .limit(50)
  }

  // out-of-vocabulary rate per doc against the p104 coverage vocab —
  // the tokenizer-eval metric: what fraction of a doc's tokens fall
  // outside the smallest 90%-coverage vocabulary
  private def p136(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val vocab = TextOps.vocabCoverage(docs, "text", 900000L)
      .select(col("token"))
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
    toks.join(broadcast(vocab.withColumn("in_v", lit(1L))),
        Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 DIV n_tokens"))
      .orderBy(col("doc_id"))
  }

  // vocabulary growth curve (Heaps'-law audit) over 3-gram shingles —
  // the unit that actually grows with the corpus (the word vocabulary
  // saturates in the first batch): per shingle the FIRST ingest batch
  // it appears in, then a running distinct count over batch ids
  private def p137(s: SparkSession, d: String): DataFrame = {
    val first = Partitioning.spread(Tables.documents(s, d))
      .select((col("doc_id") % 10).as("batch"),
        explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("batch"), Hashing.h60(col("sh")).as("h"))
      .groupBy(col("h")).agg(min(col("batch")).as("first_batch"))
    val perBatch = first.groupBy(col("first_batch"))
      .agg(count(lit(1)).as("new_shingles"))
    perBatch.withColumn("vocab_size",
        sum(col("new_shingles")).over(
          org.apache.spark.sql.expressions.Window.orderBy(
            col("first_batch"))))
      .orderBy(col("first_batch"))
  }

  // medoid keeper per near-dup family: the member with the highest
  // total similarity to its siblings (tie → lowest id) — a better
  // canonical pick than min-id when families chain A~B~C and A,C
  // differ most; computed from the already-verified pair jaccards
  private def p133(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // the verified pair frame feeds THREE consumers (the CC edge set
    // and both union branches of the incident-sum) — without
    // materialization the exact-Jaccard verification join reruns per
    // consumer (guide §1.2); one pairs-sized checkpoint runs it once
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"), col("jaccard_ppm"))
      .localCheckpoint()
    val labels = Dedup.connectedComponents(
      pairs.select(col("i"), col("j")), docs.select(col("doc_id")),
      "doc_id")
    val incident = pairs.select(col("i").as("doc_id"), col("jaccard_ppm"))
      .union(pairs.select(col("j").as("doc_id"), col("jaccard_ppm")))
      .groupBy(col("doc_id")).agg(sum(col("jaccard_ppm")).as("sim_sum"))
    labels.join(incident, Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(max(struct(col("sim_sum"), (-col("doc_id")).as("nid"))).as("b"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), (-col("b.nid")).as("medoid"),
        col("b.sim_sum").as("sim_sum"), col("n_members"))
      .orderBy(col("cluster"))
  }

  // per-segment PII exposure report over the p25 synthetic-PII corpus:
  // total redaction hits by rule and documents carrying any hit —
  // the risk row a release review reads before an export ships
  private def p134(s: SparkSession, d: String): DataFrame =
    TextOps.redactPii(
        Tables.table(s, d, "customer").select(col("c_mktsegment"),
          concat(col("c_mktsegment"), lit(" reach "), lower(col("c_name")),
            lit("@example.com or "),
            lpad((col("c_custkey") % 100).cast("string"), 2, "0"),
            lit("-"),
            lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0"),
            lit(" id "),
            lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("c_custkey") % 100).cast("string"), 2, "0"),
            lit("-"),
            lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
            .as("text")),
        "text")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email").cast("long")).as("emails"),
        sum(col("n_phone").cast("long")).as("phones"),
        sum(col("n_ssn").cast("long")).as("ssns"),
        sum(when(col("n_email") + col("n_phone") + col("n_ssn") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"))
      .orderBy(col("c_mktsegment"))

  // semantic decontamination: corpus vectors within cosine τ of ANY
  // reference (label-0 = synthetic eval set) vector — catches the
  // paraphrase/translation leakage n-gram decontamination (p22)
  // cannot see; reference broadcast, corpus streams one scan
  private def p132(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.semanticContamination(
        emb.filter(col("label") =!= 0), emb.filter(col("label") === 0),
        "vec_id", "embedding", thresholdPpm = 450000L)
      .orderBy(col("vec_id"))
  }

  // MinHash estimator-error audit: per verified near-dup pair, the
  // 16-component signature-agreement estimate vs the exact Jaccard —
  // the introspection row that justifies (or indicts) the banding
  // thresholds in production
  private def p131(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sig = Dedup.signaturesFromHashed(
      Dedup.hashedShingles(docs, "doc_id", "text", 3), 16)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"), col("jaccard_ppm"))
    val sa = sig.select(col("doc").as("i") +:
      (0 until 16).map(k => col(s"m$k").as(s"a$k")): _*)
    val sb = sig.select(col("doc").as("j") +:
      (0 until 16).map(k => col(s"m$k").as(s"b$k")): _*)
    val matches = (0 until 16)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs.join(sa, Seq("i")).join(sb, Seq("j"))
      .withColumn("est_ppm", matches * lit(62500L))
      .select(col("i"), col("j"), col("jaccard_ppm"), col("est_ppm"),
        (col("est_ppm") - col("jaccard_ppm")).as("err_ppm"))
      .orderBy(col("i"), col("j"))
  }

  // language-ID confusion matrix: predicted vs labeled language with
  // row-normalized ppm — the classifier-calibration view the corpus's
  // own ground-truth labels make possible
  private def p128(s: SparkSession, d: String): DataFrame =
    TextOps.withLangId(Tables.documents(s, d), "text")
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_ppm", expr(
        "n * 1000000 DIV (SUM(n) OVER (PARTITION BY lang))"))
      .orderBy(col("lang"), col("lang_pred"))

  // source-vocabulary overlap matrix: exact token-set Jaccard between
  // every source pair — vocab-bounded set ops, the corpus-level
  // "which crawls speak the same language" signal
  private def p129(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"))
      .agg(collect_set(col("tok")).as("toks"))
    val a = vocab.select(col("source").as("src_a"), col("toks").as("ta"))
    val b = vocab.select(col("source").as("src_b"), col("toks").as("tb"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        (size(col("ta")) + size(col("tb"))
          - size(array_intersect(col("ta"), col("tb")))).cast("long")
          .as("uni"))
      .withColumn("jaccard_ppm", expr("inter * 1000000 DIV uni"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // Spearman rank association between doc length and heuristic
  // quality, per source — reported as the exact integer pieces
  // (n, Σd² over the two rank columns) plus the floor-ppm rho
  // numerator, so no float correlation crosses the engine boundary
  private def p130(s: SparkSession, d: String): DataFrame = {
    val q = TextOps.withStats(Tables.documents(s, d), "text")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("quality_ppm"))
    val wLen = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val wQ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("quality_ppm"), col("doc_id"))
    q.withColumn("r_len", row_number().over(wLen).cast("long"))
      .withColumn("r_q", row_number().over(wQ).cast("long"))
      .withColumn("d2",
        (col("r_len") - col("r_q")) * (col("r_len") - col("r_q")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("sum_d2"))
      // rho = 1 − 6Σd²/(n(n²−1)): emit the exact floor-ppm value
      .withColumn("rho_ppm", expr(
        "1000000 - 6 * sum_d2 * 1000000 DIV (n * (n * n - 1))"))
      .orderBy(col("source"))
  }

  // trailing 7-day active users (WAU): each (user, active-day) pair
  // contributes to the 7 report days it falls inside — a linear
  // explode instead of a per-day distinct-over-range window (which
  // Spark windows can't express and a self-join would quadratically);
  // report days are clamped to days that actually occur
  private def p127(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val contrib = ud.select(col("user_id"),
      explode(transform(sequence(lit(0), lit(6)),
        i => date_add(col("day"), i))).as("report_day"))
    contrib.join(ud.select(col("day").as("report_day")).distinct(),
        Seq("report_day"), "left_semi")
      .groupBy(col("report_day"))
      .agg(count_distinct(col("user_id")).as("wau"))
      .orderBy(col("report_day"))
  }

  // behavioral transition matrix: per-user event-type bigrams in time
  // order → (from, to) counts + row-normalized ppm — the Markov view
  // of the event stream (one user-keyed window, one tiny aggregate)
  private def p124(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = Tables.events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    tr.withColumn("row_ppm", expr(
        "n * 1000000 DIV (SUM(n) OVER (PARTITION BY from_type))"))
      .orderBy(col("from_type"), col("next_type"))
  }

  // inter-event dwell-time profile: per event type, exact rank-picked
  // quantiles of the gap to the user's next event (seconds)
  private def p125(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, d)
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(col("event_type"), col("event_id"),
        call_function("div",
          unix_micros(col("next_ts")) - unix_micros(col("ts")),
          lit(1000000L)).as("gap_sec"))
    Profiling.quantiles(gaps, "event_type", "gap_sec",
        tieBreak = "event_id", pcts = Seq(50, 90, 99))
      .orderBy(col("event_type"))
  }

  // burst detection: per-minute event counts, flag minutes above
  // k× the median minute — rate-spike monitoring with the robust
  // center (a burst can't move the median it's compared against)
  private def p126(s: SparkSession, d: String): DataFrame = {
    val perMin = Tables.events(s, d)
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
      .withColumn("grp", lit("all"))
      .withColumn("mid", unix_micros(col("minute")))
    Profiling.madOutliers(perMin, "grp", "n", tieBreak = "mid", k = 3L)
      .select(col("mid"), col("n"), col("med"), col("mad"),
        col("is_outlier"))
      .orderBy(col("mid"))
  }

  // robust MAD outlier flags: rank-picked median + median absolute
  // deviation per source — the outlier rule the outliers can't move
  private def p121(s: SparkSession, d: String): DataFrame =
    Profiling.madOutliers(Tables.documents(s, d), "source", "n_chars",
        tieBreak = "doc_id", k = 3L)
      .select(col("doc_id"), col("source"), col("n_chars"), col("med"),
        col("absdev"), col("mad"), col("is_outlier"))
      .orderBy(col("doc_id"))

  // exact-count stratified split: per-source proportions exact to the
  // row (p43's hash coins are exact only in expectation)
  private def p122(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSplit(Tables.documents(s, d), "source", "doc_id",
        trainPpm = 800000L, valPpm = 100000L, seed = 4)
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id"))

  // leakage-safe split: hash the near-dup CLUSTER, not the doc id —
  // every member of a dup family lands in the same split by
  // construction (the decontamination-by-design move)
  private def p123(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
    Dedup.leakageSafeSplit(docs, "doc_id", pairs,
        trainPpm = 800000L, valPpm = 100000L, seed = 3)
      .select(col("doc_id"), col("cluster"), col("split"))
      .orderBy(col("doc_id"))
  }

  // multi-probe LSH: query bucket + all 1-bit-flip neighbors — the
  // recall repair that grows query-time reads, not the index
  private def p120(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopKMultiProbe(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 5, planes = 6, dim = 64)
      .select(col("vec_id"), TextOps.ppm(col("cos")).as("cos_ppm"))

  // character-level verification of the LSH near-dup pairs: exact
  // Levenshtein distance + similarity ppm — the token-order-sensitive
  // second opinion (shingle Jaccard can't tell reordered copies apart;
  // edit distance can), run on CANDIDATE PAIRS only, never all-pairs
  private def p119(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"))
    val t = docs.select(col("doc_id"), col("text"), col("n_chars"))
    pairs
      .join(t.select(col("doc_id").as("i"), col("text").as("ta"),
        col("n_chars").as("la")), Seq("i"))
      .join(t.select(col("doc_id").as("j"), col("text").as("tb"),
        col("n_chars").as("lb")), Seq("j"))
      .select(col("i"), col("j"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
        greatest(col("la"), col("lb")).as("max_len"))
      .withColumn("sim_ppm",
        expr("(max_len - edit_dist) * 1000000 DIV max_len"))
      .orderBy(col("i"), col("j"))
  }

  // dedup-graph health report: cluster-size histogram over the
  // resolved near-dup components — the observability row a dedup run
  // publishes (how much of the corpus sits in how-big families)
  private def p116(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
    Dedup.connectedComponents(pairs.select(col("i"), col("j")),
        docs.select(col("doc_id")), "doc_id")
      .groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
      .groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
      .withColumn("docs_in_tier", expr("csize * n_clusters"))
      .orderBy(col("csize"))
  }

  // equi-depth quartile bins per source (NTILE): each bucket holds the
  // same row count and reports its value range — the histogram form
  // that adapts to the distribution instead of fixing bin widths
  private def p117(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket", ntile(4).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("n_chars").asc, col("doc_id").asc)).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .orderBy(col("source"), col("bucket"))

  // activity retention cohorts: users grouped by first-seen day, the
  // distinct-user count at each day offset — the classic engagement
  // matrix, all date arithmetic in integer days
  private def p118(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"))
    ev.join(first, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  // rendezvous-hash shard assignment: highest-random-weight argmax
  // over the shard fleet — scale-out moves only ~1/(n+1) of rows
  private def p114(s: SparkSession, d: String): DataFrame =
    Sampling.rendezvousShard(Tables.documents(s, d), "doc_id", 16)
      .select(col("doc_id"), col("shard"))
      .orderBy(col("doc_id"))

  // merge overlapping activity intervals per user into disjoint spans
  // — the temporal-coverage primitive (value cents → duration µs)
  private def p115(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val iv = Tables.events(s, d).select(
      (col("user_id") % 50).as("ukey"),
      unix_micros(col("ts")).as("ivs"),
      (unix_micros(col("ts")) +
        (col("value").cast(D) * 100).cast("long") * 10000L).as("ive"),
      col("event_id"))
    Sessions.mergeIntervals(iv, "ukey", "ivs", "ive",
        tieBreak = Seq(col("event_id")))
      .orderBy(col("ukey"), col("span_seq"))
  }

  // prefix-filtering set-similarity join: EXACT Jaccard pairs with
  // only df-ordered prefixes indexed — lossless, so the oracle is the
  // brute-force all-pairs SQL itself (equality IS the correctness of
  // the prefix lemma as implemented)
  private def p113(s: SparkSession, d: String): DataFrame =
    Dedup.prefixFilterPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))

  // longest intra-doc verbatim repeat (looping-generation detector):
  // within-doc window self-join, diagonal islands, max run + k − 1
  private def p112(s: SparkSession, d: String): DataFrame =
    TextOps.longestSelfRepeat(Tables.documents(s, d), "doc_id", "text",
        k = 5)
      .orderBy(col("doc_id"))

  // per-source percentile normalization: raw length scores mapped to
  // within-source percentile ppm — cross-source comparable thresholds
  private def p110(s: SparkSession, d: String): DataFrame =
    Sampling.percentileNorm(Tables.documents(s, d), "source", "doc_id",
        col("n_chars"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("score_rank"), col("pctile_ppm"))
      .orderBy(col("doc_id"))

  // z-order layout audit: Morton-interleave two uncorrelated keys,
  // shard by the top z bits, report per-shard key ranges — every
  // shard's min/max box is tight in BOTH dimensions, which is what
  // lets parquet stats prune scans filtered on either key
  private def p111(s: SparkSession, d: String): DataFrame = {
    val k = Tables.lineitem(s, d).select(
      (col("l_partkey") % 1024).as("a"), (col("l_suppkey") % 1024).as("b"))
    k.withColumn("zv", Partitioning.zorder2(col("a"), col("b"), bits = 10))
      .withColumn("shard", shiftright(col("zv"), 14))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .orderBy(col("shard"))
  }

  // ROLLUP corpus report: (source, lang) → source subtotals → grand
  // total in one grouping-sets pass — the hierarchy report Spark's
  // rollup plans as a single Expand+aggregate, no self-unions
  private def p108(s: SparkSession, d: String): DataFrame = {
    // two-level aggregation (optimization guide §2.5): rollup's Expand
    // replicates its INPUT once per grouping level (3× here), so feed
    // it the (source, lang) pre-aggregate — |sources|·|langs| rows —
    // instead of the corpus. count/sum re-aggregate exactly (n_docs =
    // sum of per-group counts), grouping-null semantics are unchanged
    // (a data-null group key survives the pre-aggregate as its own
    // row), and the one corpus-wide exchange carries two small columns.
    val pre = Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sc"))
    pre.rollup(col("source"), col("lang"))
      .agg(sum(col("cnt")).as("n_docs"), sum(col("sc")).as("sum_chars"))
      .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
  }

  // PIVOT lang-mix matrix: one row per source, one count column per
  // language — Spark's pivot over the known lang set (explicit value
  // list keeps the plan a single aggregate, no value-discovery scan)
  private def p109(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("source"))

  // ANALYZE-style column profile of the widest relational table —
  // rows/nulls/exact-distinct per column in one aggregate pass
  private def p107(s: SparkSession, d: String): DataFrame =
    Profiling.columnProfile(Tables.lineitem(s, d))
      .orderBy(col("column"))

  // MMR diverse top-k: close to the query, far from each other —
  // integer squared-L2 form, driver-iterative with bounded state
  private def p106(s: SparkSession, d: String): DataFrame =
    Similarity.mmrSelect(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 5, lambdaPpm = 700000L)
      .orderBy(col("pick"))

  // reciprocal-rank fusion of two uncalibrated quality signals
  // (heuristic quality score + unigram fluency) — integer RRF points,
  // engine-exact where any float blend would not be
  private def p105(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val stats = TextOps.withStats(docs, "text")
      .select(col("doc_id"), col("quality_ppm"))
    val sur = TextOps.unigramSurprisal(docs, "doc_id", "text")
      .select(col("doc_id"), col("mean_surprisal_ppm"))
    // rrfFusion rescans its input S+2 = 4 times by contract (scan-bound
    // on a stored corpus); here the input is a DERIVED join whose
    // surprisal side is itself explode+aggregate+join work, so without
    // materialization the whole scoring pipeline runs 4x (guide §1.2:
    // don't recompute what you can keep). One doc-sized checkpoint
    // makes the rescans true scans. Measured: 1.7 -> 0.7 s at sf0.1.
    val scored = stats.join(sur, Seq("doc_id")).localCheckpoint()
    Sampling.rrfFusion(scored, "doc_id",
        Seq(col("quality_ppm"), -col("mean_surprisal_ppm")),
        k = 60, topN = 50)
      .select(col("doc_id"), col("rank_0"), col("rank_1"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  // RAG sliding-window chunk export: 32-token chunks, stride 16 —
  // every token covered by 2 chunks, scan-speed projection
  private def p103(s: SparkSession, d: String): DataFrame =
    TextOps.chunkSliding(Tables.documents(s, d), "doc_id", "text",
        window = 32, stride = 16)
      .orderBy(col("doc_id"), col("chunk_idx"))

  // tokenizer vocab with 90% corpus-coverage cutoff: smallest
  // frequency-ranked vocab covering the token mass
  private def p104(s: SparkSession, d: String): DataFrame =
    TextOps.vocabCoverage(Tables.documents(s, d), "text",
        cutoffPpm = 900000L)
      .orderBy(col("rank"))

  // bigram-LM surprisal: per-transition bits via integer bit-length
  // logs, the corpus as its own language model — the fluency-proxy
  // quality filter one tier above p58's unigram form
  private def p102(s: SparkSession, d: String): DataFrame =
    TextOps.bigramSurprisal(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // STREAMING near-dup admission control: the p98 batch ("every 10th
  // doc") ARRIVES in 4 file-batches and each micro-batch probes the
  // standing corpus's signature index (foreachBatch — the index is
  // corpus-wide, not per-key state). The emitted pair set is
  // batching-independent == batch minhashPairsIncremental over the
  // union of arrivals, so the oracle is p98's verbatim.
  private def p101(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (hsh, banded) = Dedup.signatureIndex(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4)
    val dir = graft.TempDirs.scoped("graft_p101")
    val tmp = graft.TempDirs.scoped("graft_p101_parts")
    val arrivals = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), (col("doc_id") % 4).as("b"))
    (0 to 3).foreach { b =>
      val part = tmp.resolve(s"b$b")
      arrivals.filter(col("b") === b).select(col("doc_id"))
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      val f = java.nio.file.Files.list(part).filter(p =>
        p.getFileName.toString.startsWith("part-")).findFirst().get()
      val dst = dir.resolve(s"batch$b.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val st = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    graft.streaming.StreamNearDedup.run(s, st, hsh, banded,
        "doc_id", threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))
  }

  // the flagship curation chain — quality gate → exact dedup → split
  // assignment → per-(source, split) manifest, i.e. the four stages a
  // real pre-training data pipeline runs, composed end to end from the
  // library operators with one deterministic manifest as the receipt
  private def p100(s: SparkSession, d: String): DataFrame = {
    val q = TextOps.gopherQuality(Tables.documents(s, d), "text",
        30, 80, 3500000L, 4600000L, 20000L)
      .filter(col("keep"))
    val keepers = Dedup.exact(q, "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    val deduped = q.join(keepers, Seq("doc_id"), "left_semi")
    Sampling.splitAssign(deduped, "doc_id",
        trainPpm = 800000L, valPpm = 100000L, seed = 7)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("source"), col("split"))
  }

  // streaming drift monitor: the p88 KS-style statistic computed over
  // a STREAMING histogram (complete-mode bin counts in the stream, the
  // corpus-size-independent drift join on the final state) — what a
  // standing ingest pipeline runs to catch a distribution shift in
  // flight rather than at the next batch audit
  private def p99(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val st = eventsStream(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type"),
        call_function("div", (col("value").cast(D) * 100).cast("long"),
          lit(500L)).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    // localCheckpoint: the memory-sink MemoryPlan is not a
    // MultiInstanceRelation, so histDrift's full self-join would hit
    // conflicting attribute ids; the checkpointed LogicalRDD re-instances
    Sketches.histDrift(runToMemory(s, st).localCheckpoint(),
        "event_type", "view", "click")
      .orderBy(col("bin"))
  }

  // incremental dedup: a synthetic "today's batch" (every 10th doc)
  // probes the standing corpus's LSH buckets — candidate work is
  // batch-sized, not corpus², the shape that makes daily ingest
  // affordable against a 100 TB standing corpus
  private def p98(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val batch = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))
    Dedup.minhashPairsIncremental(docs, "doc_id", "text", batch,
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))
  }

  // embedding-space drift monitor: e4-integer centroid per label
  // slice, pairwise squared-L2 between slice centroids — corpus-size-
  // independent after the first aggregate
  private def p97(s: SparkSession, d: String): DataFrame =
    Similarity.labelCentroidDrift(Tables.embeddings(s, d),
        "embedding", "label")
      .orderBy(col("label_a"), col("label_b"))

  // one-permutation-hashing MinHash dedup: single shared permutation
  // binned into k minima (k× less hashing than p06's k families),
  // rotation-densified, banded, then exact-Jaccard verified
  private def p96(s: SparkSession, d: String): DataFrame =
    Dedup.ophPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("i"), col("j"), col("na"), col("nb"),
        col("inter"), col("uni"), col("jaccard_ppm"))
      .orderBy(col("i"), col("j"))

  // canonical normalization ahead of exact dedup: deterministic
  // case/punct/whitespace noise is injected per doc_id, and
  // TextOps.normalize must collapse the noised copies back onto the
  // identical content hashes the raw corpus had
  private def p90(s: SparkSession, d: String): DataFrame = {
    val noised = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 3 === 0, upper(col("text")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("  "), col("text"), lit(" !!")))
        .otherwise(col("text")).as("text"))
    Dedup.exact(noised.select(col("doc_id"),
        TextOps.normalize(col("text")).as("text")), "doc_id", "text")
      .orderBy(col("content_hash"))
  }

  // importance resample: thin src2 until its length histogram matches
  // src3's — per-bin exact-ppm acceptance, hash-bernoulli keep
  private def p89(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Sampling.importanceResample(
        docs.filter(col("source") === "src2"),
        docs.filter(col("source") === "src3"),
        "doc_id", col("n_chars"), binWidth = 50L, seed = 5)
      .select(col("doc_id"), col("bin"), col("weight_ppm"))
      .orderBy(col("doc_id"))
  }

  // binned-CDF drift (KS-style, integer-exact) between two sources'
  // doc-length distributions — the training-data drift monitor
  private def p88(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("source").isin("src0", "src1"))
    Sketches.histDrift(
        Sketches.histogram(docs, "source", col("n_chars"), binWidth = 50L),
        "source", "src0", "src1")
      .orderBy(col("bin"))
  }

  // streaming dedup on the BUILT-IN dropDuplicatesWithinWatermark —
  // the native-operator-first counterpart to p78's custom-state form
  // (prefer the built-in when its TTL semantics fit; custom state only
  // for what it can't express, e.g. p78's re-emission policy knobs)
  private def p87(s: SparkSession, d: String): DataFrame = {
    val st = eventsStream(s, d)
      .withWatermark("ts", "0 seconds")
      .select(col("ts"), (col("user_id") % 50).as("ukey"),
        col("event_type"))
      .dropDuplicatesWithinWatermark("ukey", "event_type")
    runToMemory(s, st, mode = "append")
      .select(col("ukey"), col("event_type"))
      .orderBy(col("ukey"), col("event_type"))
  }

  // ordered conversion funnel (view → click → purchase): greedy
  // first-touch stage timestamps as chained per-key window minimums —
  // one exchange, no self-joins (the SQL oracle needs two)
  private def p86(s: SparkSession, d: String): DataFrame =
    Sessions.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  // p86's funnel as the watermark-buffered stateful streaming operator
  // (StateFunnel — the NOTES carry-over built WITH the design it
  // demanded): the greedy chain is order-sensitive, so events buffer
  // per user until the watermark finalizes them, fold in event-time
  // order (discard-safe, see the operator scaladoc), and the
  // quiescence timeout — here advanced past all real data by the
  // sentinel batch — emits each user's funnel row. Oracle: p86's
  // batch funnel SQL verbatim.
  private def p143(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p143")
    java.nio.file.Files.createSymbolicLink(dir.resolve("a_events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    val tmp = graft.TempDirs.scoped("graft_p143_sent")
    sentinelFrame(s, d, Seq((-1L, -1L, "sentinel")))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val sentinel = dir.resolve("b_sentinel.parquet")
    java.nio.file.Files.copy(part, sentinel)
    java.nio.file.Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))
    import s.implicits._
    val steps = Seq("view", "click", "purchase")
    val stepCol = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (t, i)) => when(col("event_type") === t, lit(i))
        .otherwise(acc) }
    // NO pre-filter on step: a deterministic filter gets pushed BELOW
    // the EventTimeWatermark node, so filtering non-step rows here
    // would drop the sentinel before the watermark operator ever sees
    // it — the watermark would stall at the real data's max and the
    // user holding that max would never time out (measured: exactly
    // one funnel row short). Non-step rows (step = -1, including the
    // sentinel's key) flow into the operator, which ignores them in
    // the fold; the sentinel key buffers one ignored event and never
    // emits (chain never entered).
    val st = Tables.normalizeEventTs(
        s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
          .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"),
        stepCol.as("step"))
      .as[graft.streaming.FunnelEvent]
    val out = graft.streaming.StateFunnel.funnel(st, nSteps = 3)
    runToMemory(s, out.toDF(), mode = "append")
      .filter(col("user_id") >= 0)
      .orderBy(col("user_id"))
  }

  // training-export shard manifest: per-shard doc/token/char totals +
  // an order-independent content checksum (decimal-fold of the 60-bit
  // doc hashes) — the reproducibility record next to an export
  private def p85(s: SparkSession, d: String): DataFrame =
    Partitioning.exportManifest(Tables.documents(s, d), "doc_id", "text",
        shards = 8, seed = 3)
      .orderBy(col("shard"))

  // Cross-document duplicated 10-gram fraction — the corpus-level
  // quality signal (RefinedWeb/Gopher-style): per doc, how many of its
  // distinct 10-grams appear in at least one other document. Linear
  // (hash grams, df aggregate, postings join) — see TextOps scaladoc.
  private def p80(s: SparkSession, d: String): DataFrame =
    TextOps.crossDocDupGrams(Tables.documents(s, d), "doc_id", "text",
        n = 10)
      .orderBy(col("doc_id"))

  // FORWARD as-of join: each purchase picks the EARLIEST view at or
  // after it (next-event attribution) — same union+window shape as p31,
  // scanned from the other end; oracle is DuckDB ASOF with >=
  private def p54(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        (col("value").cast(D) * 100).cast("long").as("view_cents"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("view_cents")).as("view_cents"))
    graft.operators.AsofJoin.forward(purchases, views, Seq("user_id"),
        "ts", Seq("view_cents"))
      .select(col("event_id"), col("user_id"), col("view_cents"),
        expr("(unix_micros(asof_ts) - unix_micros(ts)) DIV 1000000")
          .as("gap_sec"))
      .orderBy(col("event_id"))
  }

  // importance sampling: per-row keep probability (longer docs keep
  // more) decided by the id hash — reproducible weighted downsampling
  private def p55(s: SparkSession, d: String): DataFrame =
    Sampling.weightedPpm(Tables.documents(s, d), "doc_id",
        col("n_chars") * 3000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))

  // trailing event-time window: each event's count/sum/max over the
  // preceding hour of the same user — RANGE frame over epoch micros,
  // never a self-join
  private def p56(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val ev = Tables.events(s, d).filter(col("user_id") % 7 === 4)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast(D) * 100).cast("long").as("cents"))
    graft.operators.Rolling.trailing(ev, Seq("user_id"), "ts", 3600L,
        Seq("roll_n" -> count(lit(1)),
          "roll_cents" -> sum(col("cents")),
          "roll_max" -> max(col("cents"))))
      .select(col("event_id"), col("user_id"), col("ts"), col("cents"),
        col("roll_n"), col("roll_cents"), col("roll_max"))
      .orderBy(col("event_id"))
  }

  // batched kNN join: top-5 corpus neighbors for each of 5 query
  // vectors in ONE corpus scan — the production similarity-search shape
  private def p59(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id").isin(0L, 100L, 200L, 300L, 400L))
    Similarity.knnJoin(emb, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), TextOps.ppm(col("cos")).as("cos_ppm"))
      .orderBy(col("query_id"), col("rank"))
  }

  // STREAMING left-outer interval join: the enrichment shape pipelines
  // actually run — every purchase emits exactly once, matched rows as
  // found, unmatched rows NULL-EXTENDED when the watermark passes
  // their join-window expiry. Spark only evicts-and-emits outer state
  // when a LATER batch advances the watermark, so the far-future
  // sentinel batch (one row per side, key -1, p53's mtime-ordered
  // pattern) is what flushes the tail; without it the last window of
  // unmatched purchases would never surface. Emitted set == batch
  // LEFT JOIN with the same interval predicate (the oracle).
  private def p61(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p61")
    java.nio.file.Files.createSymbolicLink(dir.resolve("a_events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    val tmp = graft.TempDirs.scoped("graft_p61_sent")
    sentinelFrame(s, d, Seq((-1L, -1L, "view"), (-2L, -1L, "purchase")))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val sentinel = dir.resolve("b_sentinel.parquet")
    java.nio.file.Files.copy(part, sentinel)
    // mtime-order the sentinel AFTER the events batch without touching
    // the shared testdata through the symlink (p42/p53 lesson)
    java.nio.file.Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 60000L))
    def side(tpe: String, prefix: String) = Tables.normalizeEventTs(
        s.readStream.schema(Tables.eventsRawSchemaPinNanosConf(s, d))
          .option("maxFilesPerTrigger", "1").parquet(dir.toString))
      .filter(col("event_type") === tpe &&
        (col("user_id") % 5 === 3 || col("user_id") === -1L))
      .select(col("user_id").as(s"${prefix}_user"),
        col("ts").as(s"${prefix}_ts"), col("event_id").as(s"${prefix}_id"))
      .withWatermark(s"${prefix}_ts", "1 hour")
    val joined = side("purchase", "p").join(side("view", "v"),
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"),
      "left_outer")
    runToMemory(s, joined, mode = "append")
      .filter(col("p_user") =!= -1L) // the sentinel pair never escapes
      .select(col("p_id").as("purchase_id"), col("v_id").as("view_id"),
        col("p_user").as("user_id"), col("p_ts"), col("v_ts"))
      .orderBy(col("purchase_id"), col("view_id").asc_nulls_first)
  }

  // STREAMING KMV cardinality: distinct-user estimate per event_type
  // maintained incrementally by the typed mergeable aggregator — O(k)
  // state per group in the state store where exact COUNT(DISTINCT) is
  // unbounded; complete mode re-emits the final state, which equals
  // the batch sketch exactly (the oracle recomputes it in SQL)
  private def p65(s: SparkSession, d: String): DataFrame = {
    val st = eventsStream(s, d).select(col("event_type"),
      Hashing.h60(col("user_id").cast("string")).as("h"))
    val kmv = graft.functions.KmvAgg.kmvMinimaAgg(16)
    val agg = st.groupBy(col("event_type")).agg(kmv(col("h")).as("minima"))
    Sketches.estimate(runToMemory(s, agg), k = 16)
      .select(col("event_type"), col("n_min"), col("hk"),
        col("est_distinct"))
      .orderBy(col("event_type"))
  }

  // hashed bag-of-words linear scorer: the quality-classifier-filter
  // stand-in — hashing-trick projection, integer margin, scan speed
  private def p66(s: SparkSession, d: String): DataFrame =
    TextOps.hashedLinearScore(Tables.documents(s, d), "text", width = 64,
        seed = 3)
      .select(col("doc_id"), col("margin"), col("keep"))
      .orderBy(col("doc_id"))

  // engine-exact exponential recency decay: per-user EWMA-style
  // popularity in pure integer half-life shifts — no float pow/exp
  private def p67(s: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val ev = Tables.events(s, d).filter(col("user_id") % 9 === 2)
      .select(col("user_id"), col("ts"),
        (col("value").cast(D) * 100).cast("long").as("cents"))
    graft.operators.Rolling.decayedSum(ev, Seq("user_id"), "ts",
        halfLifeSec = 86400L,
        Seq("decayed_cents" -> col("cents"), "decayed_n" -> lit(1L)))
      .orderBy(col("user_id"))
  }

  // STREAMING windowed heavy hitters: per hourly window, the top-3
  // event types by count — the continuous "what's trending" dashboard
  // feed. The rank runs as a BATCH window over the streaming rollup's
  // final complete-mode state (Spark forbids rank windows inside a
  // streaming agg — the two-stage shape IS the production pattern:
  // stream maintains counts, a cheap batch pass ranks the tiny state)
  private def p74(s: SparkSession, d: String): DataFrame = {
    val st = eventsStream(s, d).select(col("ts"), col("event_type"),
      lit(0L).as("value")) // rollup's value aggs unused here; n is the rank key
    val counts = runToMemory(s, graft.streaming.EventRollup.rollup(
      st, Seq(col("event_type")), "1 hour", "10 minutes"))
    counts
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("range_start"))
          .orderBy(col("n").desc, col("event_type").asc)))
      .filter(col("rank") <= 3)
      .select(col("range_start"), col("rank").cast("long").as("rank"),
        col("event_type"), col("n"))
      .orderBy(col("range_start"), col("rank"))
  }

  // cluster-balanced (diversity) sampling: train the p24 integer
  // codebook, assign every vector to its nearest cell, keep a
  // hash-ranked quota per cell — the embedding-space stratifiedCap,
  // the curation step that makes a sample cover all modes of the
  // corpus instead of oversampling the dense ones. Assignment is a
  // zero-shuffle projection against the literal codebook; the quota
  // rank is one exchange on (cell), the IVF build's own layout.
  private def p75(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = Similarity.kmeansCentroidsInt(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val assigned = Similarity.assignCellsInt(emb, "vec_id", "embedding",
      Similarity.intCodebook(cents))
    Sampling.stratifiedCap(assigned, "cell", "vec_id", n = 10, seed = 0)
      .select(col("vec_id"), col("cell"), col("sample_rank"))
      .orderBy(col("cell"), col("sample_rank"))
  }

  // SemDeDup: cluster first, then pairwise cosine ONLY within each
  // cell — the semantic near-dup removal that stays sub-quadratic at
  // corpus scale. Same trained codebook as p24/p75; min-id keeper.
  private def p76(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = Similarity.kmeansCentroidsInt(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val assigned = Similarity.assignCellsInt(emb, "vec_id", "embedding",
      Similarity.intCodebook(cents))
    Similarity.semanticDedup(assigned, "vec_id", "embedding", "cell",
        thresholdPpm = 400000L)
      .orderBy(col("vec_id"))
  }

  // priority-keeper near-dup removal: each minhash cluster keeps its
  // LONGEST member (argmax n_chars, min-id tiebreak) instead of the
  // min id — the curation form ("keep the cleanest copy")
  private def p73(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.8)
    Dedup.removeNearDupsBy(docs, "doc_id", pairs, col("n_chars"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // binned point-in-interval join: every event joined to the 2-hour
  // windows opened by purchases — no equi key exists, so the bare
  // range predicate would plan as a nested loop; hour bins manufacture
  // the equi join (the oracle runs the plain range join)
  private def p71(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") % 7 === 0)
    val ivals = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("interval_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
    graft.operators.RangeJoin.pointInInterval(
        ev.select(col("event_id"), col("ts")), "ts",
        ivals, "start_ts", "end_ts",
        binSec = 3600L, maxSpanSec = 7200L)
      .select(col("interval_id"), col("event_id"), col("ts"))
      .orderBy(col("interval_id"), col("event_id"))
  }

  // p71's join written the NAIVE way (bare range predicate — the shape
  // Spark nested-loops) with the BinnedRangeJoinRule installed: the
  // optimizer rewrite must produce p71's exact rows through an
  // equi-join plan. A different user-id slice than p71 so the two rows
  // stay independent evidence.
  private def p83(s: SparkSession, d: String): DataFrame = {
    val prevOpts = s.experimental.extraOptimizations
    try {
      graft.plans.BinnedRangeJoinRule.install(s, binSeconds = 3600L)
      val ev = Tables.events(s, d).filter(col("user_id") % 7 === 1)
      val points = ev.select(col("event_id"), col("ts"))
      val ivals = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("interval_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
      val joined = points.join(ivals,
        points("ts") >= ivals("start_ts") && points("ts") < ivals("end_ts"))
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("__graft_bin"),
        "BinnedRangeJoinRule did not rewrite the naive range join")
      joined.select(col("interval_id"), col("event_id"), col("ts"))
        .orderBy(col("interval_id"), col("event_id"))
        .localCheckpoint() // pin before extraOptimizations is restored
    } finally {
      s.experimental.extraOptimizations = prevOpts
      s.conf.unset(graft.plans.BinnedRangeJoinRule.BinConf)
    }
  }

  // p72's overlap join written the NAIVE way under BinnedRangeJoinRule:
  // the optimizer's owner-bin rewrite must land on the exact row set,
  // incl. exactly-once emission (a dup would fail the hash compare)
  private def p84(s: SparkSession, d: String): DataFrame = {
    val prevOpts = s.experimental.extraOptimizations
    try {
      graft.plans.BinnedRangeJoinRule.install(s, binSeconds = 3600L)
      val ev = Tables.events(s, d).filter(col("user_id") % 11 === 4)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("v_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("v_end"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_start"),
          (col("ts") + expr("INTERVAL 90 MINUTES")).as("p_end"))
      val joined = views.join(purch,
        views("v_start") < purch("p_end") &&
          purch("p_start") < views("v_end"))
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("__graft_bin"),
        "BinnedRangeJoinRule did not rewrite the naive overlap join")
      joined.select(col("view_id"), col("p_id"))
        .orderBy(col("view_id"), col("p_id"))
        .localCheckpoint() // pin before extraOptimizations is restored
    } finally {
      s.experimental.extraOptimizations = prevOpts
      s.conf.unset(graft.plans.BinnedRangeJoinRule.BinConf)
    }
  }

  // binned interval-OVERLAP join: view hours x purchase 90-minute
  // windows, dedup-free via the owner-bin rule (pair emitted only in
  // the first bin of its overlap — both sides provably cover it)
  private def p72(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") % 11 === 3)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("v_end"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("p_end"))
    graft.operators.RangeJoin.intervalOverlap(views, "v_start", "v_end",
        purch, "p_start", "p_end", binSec = 3600L, maxSpanSec = 5400L)
      .select(col("view_id"), col("p_id"))
      .orderBy(col("view_id"), col("p_id"))
  }

  // modality-mixed batch assembly: every training batch = 3 text + 1
  // embedding sample, deterministic hash-shuffled layout, only
  // complete batches survive (the scarcest modality bounds the epoch)
  private def p70(s: SparkSession, d: String): DataFrame = {
    val mixed = Tables.documents(s, d)
      .select(col("doc_id").as("id"), lit("text").as("modality"))
      .unionByName(Tables.embeddings(s, d)
        .select((col("vec_id") + 10000000L).as("id"),
          lit("embed").as("modality")))
    Multimodal.batchMix(mixed, "modality", "id",
        quotas = Seq("text" -> 3, "embed" -> 1), seed = 5)
      .select(col("batch"), col("slot"), col("modality"), col("id"))
      .orderBy(col("batch"), col("slot"))
  }

  // STREAMING incremental connected components: user↔event-bucket
  // co-membership edges land in 4 file-batches; each batch folds into
  // the running star forest via ccIncremental (foreachBatch — CC is
  // global, so the label frame is the state). Final labels are
  // batching-independent == the batch CC over all edges, which is what
  // the recursive-closure oracle checks.
  private def p69(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.scoped("graft_p69")
    val edges = Tables.events(s, d).filter(col("user_id") % 4 === 1)
      .select(col("user_id").as("i"),
        (lit(1000000L) + col("event_id") % 100).as("j"),
        (col("event_id") % 4).as("b"))
    val tmp = graft.TempDirs.scoped("graft_p69_parts")
    (0 to 3).foreach { b =>
      val part = tmp.resolve(s"b$b")
      edges.filter(col("b") === b).select(col("i"), col("j"))
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      val f = java.nio.file.Files.list(part).filter(p =>
        p.getFileName.toString.startsWith("part-")).findFirst().get()
      val dst = dir.resolve(s"batch$b.parquet")
      java.nio.file.Files.copy(f, dst)
      // mtime-order the batches so the file source folds them in a
      // stable sequence (the final labels don't depend on it — the
      // fold is batching-independent — but stable runs debug better)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("j", LongType)))
    val st = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    graft.streaming.StreamCc.run(s, st)
      .select(col("id").as("node"), col("cluster"), col("is_keeper"))
      .orderBy(col("node"))
  }

  // temperature-flattened source mixing (T=2): target weights ∝
  // sqrt(n_s), engine-exact because IEEE sqrt is correctly rounded in
  // both engines and the counts are < 2^52. src0-9 merge into one
  // 10x-sized head source, which the sqrt temperature flattens to ~3x
  // (the standard "don't let CommonCrawl drown the long tail" move);
  // the never-upsample quota algebra is sourceMix's (p28)
  private def p68(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).withColumn("src_t",
      when(substring(col("source"), 4, 10).cast("int") < 10, lit("head"))
        .otherwise(col("source")))
    Sampling.sourceMix(docs, "doc_id", "src_t",
        weight = greatest(lit(1L),
          floor(sqrt(col("n_source"))).cast("long")))
      .groupBy(col("src_t"), col("n_source"), col("weight"),
        col("keep_ppm"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("src_t"))
  }

  // count-min sketch heavy hitters: token frequency estimates from the
  // d×w counter matrix (min over rows — only ever OVER-estimates);
  // exact counts ride along to exhibit the one-sided bound, the same
  // verifiability pattern as p44's KMV withExact
  private def p62(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " +")).as("token"))
      .filter(col("token") =!= "")
    val sketch = Sketches.countMin(toks, col("token"), depth = 3, width = 32)
    val exact = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("exact_cnt"))
    Sketches.cmEstimate(sketch, exact.select(col("token")), "token",
        depth = 3, width = 32)
      .join(exact, Seq("token"))
      .filter(col("est_cnt") >= 1500)
      .select(col("token"), col("exact_cnt"), col("est_cnt"))
      .orderBy(col("token"))
  }

  // token-budget greedy selection: each source fills a 600-token quota
  // in deterministic hash-shuffled order — the maximal prefix that fits
  private def p63(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).withColumn("n_tokens",
      size(split(col("text"), " +")).cast("long"))
    Sampling.tokenBudgetSelect(docs, "source", "doc_id", col("n_tokens"),
        budget = 600L, seed = 11)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  // deterministic shuffle-and-shard: the training-export layout —
  // 8 hash shards, reader order = in-shard hash order
  private def p64(s: SparkSession, d: String): DataFrame =
    Sampling.shuffleShard(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", shards = 8, seed = 7)
      .select(col("shard"), col("shard_pos"), col("doc_id"))
      .orderBy(col("shard"), col("shard_pos"))

  // epoch-shuffled packing: every epoch re-permutes the corpus with an
  // independent seeded hash and packs that order per shard — the
  // multi-epoch training-export shape (reproducible from seed+epoch,
  // no RNG state)
  private def p77(s: SparkSession, d: String): DataFrame =
    TextOps.packEpochs(Tables.documents(s, d), "doc_id", "text",
        epochs = 3, shards = 4, binTokens = 512L, seed = 11)
      .select(col("epoch").cast("int").as("epoch"), col("shard"),
        col("doc_id"), col("n_tokens"), col("pos"), col("offset"),
        col("bin"))
      .orderBy(col("epoch"), col("shard"), col("pos"))

  // IVF-PQ composed ANN: coarse cell prune → in-cell PQ ADC shortlist
  // → exact cosine re-rank — the production index layout; the exact
  // final ranking is what makes it oracle-verifiable
  private def p60(s: SparkSession, d: String): DataFrame =
    Similarity.ivfPqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 100L, dim = 64, nCentroids = 8, m = 8, k = 4, iters = 1,
        candidates = 20, topK = 5)
      .select(col("vec_id"), col("adc_dist"),
        TextOps.ppm(col("cos")).as("cos_ppm"))

  // unigram surprisal quality score: integer bit-length ≈ log2(N/tf),
  // the engine-exact perplexity-filter stand-in
  private def p58(s: SparkSession, d: String): DataFrame =
    TextOps.unigramSurprisal(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // deterministic negative-pair mining: 3 hash-drawn bucket-
  // representative partners per doc, no cross join, no RNG
  private def p57(s: SparkSession, d: String): DataFrame =
    Sampling.negativePairs(Tables.documents(s, d), "doc_id",
        k = 3, buckets = 64)
      .orderBy(col("doc_id"), col("neg_id"))

  // Bloom-prune join: the fact side is pruned at scan speed by an
  // 8 KiB literal bit filter built from the (pre-filtered) dimension —
  // result EXACTLY equals the plain join, which is what the oracle runs
  private def p52(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey").as("partkey"), col("l_quantity"))
    val pt = Tables.table(s, d, "part").filter(col("p_size") < 3)
      .select(col("p_partkey").as("partkey"), col("p_brand"))
    graft.operators.BloomPrune.prunedJoin(li, pt, "partkey")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
          .as("qty_cents"))
      .orderBy(col("p_brand"))
  }

  // per-source length profile: exact rank-selected quantiles
  private def p38(s: SparkSession, d: String): DataFrame =
    Profiling.quantiles(Tables.documents(s, d), "source", "n_chars",
        tieBreak = "doc_id")
      .select(col("source"), col("n_rows").as("n_docs"),
        col("min_n_chars").as("min_chars"), col("p25_n_chars").as("p25_chars"),
        col("p50_n_chars").as("p50_chars"), col("p75_n_chars").as("p75_chars"),
        col("p95_n_chars").as("p95_chars"), col("max_n_chars").as("max_chars"))
      .orderBy(col("source"))

  // ---------- oracle SQL ----------

  /** Shared fragments: toks / distinct toks / full 3-shingle sets. */
  private val toksCte =
    "t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks FROM documents)"
  private val shinglesCte =
    s"""$toksCte,
       sh AS (SELECT doc_id, list_distinct(
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(0, len(toks) - 2),
                            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
                     ELSE [] END) AS sh
              FROM t),
       e AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS shingle FROM sh)"""

  private def stopList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private val verifySql =
    """SELECT i, j, CAST(len(sa.sh) AS BIGINT) AS na, CAST(len(sb.sh) AS BIGINT) AS nb,
              CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
              CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS uni,
              CAST(floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                   (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                   * 1000000.0) AS BIGINT) AS jaccard_ppm"""

  private val simhashVotes = (0 until SimhashBits)
    .map(j => s"SUM(CASE WHEN (hh >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
    .mkString(", ")
  private val simhashAssemble = (0 until SimhashBits)
    .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
    .mkString(" + ")
  private val simhashCte =
    s"""$toksCte,
       dt AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t),
       hh AS (SELECT doc_id, ${h60Sql("tok")} AS hh FROM dt),
       v AS (SELECT doc_id, $simhashVotes FROM hh GROUP BY doc_id),
       simh AS (SELECT doc_id, CAST($simhashAssemble AS BIGINT) AS simhash FROM v)"""

  /** embeddings as DOUBLE lists + cosine vs the query vector. */
  private val cosineCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       sc AS (SELECT e.vec_id,
                list_aggregate(list_transform(range(0, 64), i -> e.v[i+1] * q.qv[i+1]), 'sum') /
                (sqrt(list_aggregate(list_transform(e.v, x -> x * x), 'sum')) *
                 sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))) AS cos
              FROM e, q WHERE e.vec_id != 0)"""

  /** LSH bucket projection columns (same md5-derived weights as
    * Similarity.planeWeights). */
  private def lshProjSql(planes: Int): String = (0 until planes).map { p =>
    val w = s"((${h60Sql(s"$p || ':' || i::VARCHAR")} % 2001) - 1000)::DOUBLE / 1000.0"
    s"list_aggregate(list_transform(range(0, 64), i -> v[i+1] * ($w)), 'sum') AS proj$p"
  }.mkString(", ")

  /** The minhash-LSH CTE chain through candidate pairs + hashed shingle
    * sets (shared by p06 verification and p16 clustering). */
  private lazy val minhashCtes: String = {
    val mod = Dedup.MinhashMod
    val mins = (0 until 16)
      .map(i => s"MIN((hbase * ${Dedup.minhashA(i)} + ${Dedup.minhashB(i)}) % $mod) AS m$i")
      .mkString(", ")
    val bands = (0 until 4).map { b =>
      val parts = (0 until 4).map(r => s"m${4 * b + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, ${h60Sql(parts)} AS bsig FROM mh"
    }.mkString(" UNION ALL ")
    s"""$shinglesCte,
        hb AS (SELECT doc_id, ${h60Sql("shingle")} % $mod AS hbase FROM e),
        shh AS (SELECT doc_id, list_distinct(list_transform(sh,
                  s -> ${h60Sql("s")} % $mod)) AS sh FROM sh),
        mh AS (SELECT doc_id, $mins FROM hb GROUP BY doc_id),
        bands AS ($bands),
        cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)"""
  }

  /** Shared by p98 (batch incremental dedup) and p101 (its streaming
    * admission-control form) — the fold is batching-independent, so
    * both must hash-match this exact pair set. */
  private lazy val incrementalDedupSql: String =
    s"""WITH $minhashCtes,
        icand AS (SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS i,
                         GREATEST(a.doc_id, b.doc_id) AS j
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bsig = b.bsig
                       AND a.doc_id != b.doc_id
                  WHERE a.doc_id % 10 = 0)
        SELECT i, j,
               CAST(len(sa.sh) AS BIGINT) AS na,
               CAST(len(sb.sh) AS BIGINT) AS nb,
               CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
               CAST(len(sa.sh) + len(sb.sh)
                 - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS uni,
               CAST(floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                 (len(sa.sh) + len(sb.sh)
                  - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                 * 1000000.0) AS BIGINT) AS jaccard_ppm
        FROM icand JOIN shh sa ON sa.doc_id = i
                   JOIN shh sb ON sb.doc_id = j
        WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
              (len(sa.sh) + len(sb.sh)
               - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
              * 1000000.0) >= 800000
        ORDER BY i, j"""

  /** Shared by p154 (session-catalog persisted IVF index), p156/p158
    * (the governed store-resident forms) and p160 (multi-probe) —
    * persistence must be invisible to the probe math, so all
    * hash-match this replay of assignment + in-cell(s) re-rank;
    * `nprobe` ranks each query's cells like the corpus assignment
    * (ccos DESC, cid ASC) and probes the best n. */
  private def ivfProbeOracleN(nprobe: Int): String = {
    def cosSql(a: String, b: String): String =
      s"""(list_aggregate(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]), 'sum') /
          (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum')) *
           sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum'))))"""
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        asg0 AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
                 FROM e CROSS JOIN c),
        asg AS (SELECT vec_id, v, cid,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM asg0),
        cell AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
        q AS (SELECT vec_id AS qid, v AS qv, cid AS qcell
              FROM asg WHERE vec_id IN (100, 200) AND rn <= $nprobe),
        sc AS (SELECT q.qid, cell.vec_id, ${cosSql("cell.v", "q.qv")} AS cos
               FROM cell JOIN q ON cell.cell = q.qcell
               WHERE cell.vec_id != q.qid),
        r AS (SELECT qid, vec_id, cos,
                ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id ASC) AS rn
              FROM sc)
        SELECT qid, vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
        FROM r WHERE rn <= 5
        ORDER BY qid, cos DESC, vec_id ASC"""
  }
  private lazy val ivfProbeOracle: String = ivfProbeOracleN(1)

  /** p164 — the rebalance equivalence: integer-e4 Lloyd training
    * (p24's CTEs — two iterations, seeds = the 8 lowest ids, i.e.
    * exactly what `rebalanceIvfIndexStore` runs with the persisted
    * params k = 8) over the FULL corpus, trained centroids back to
    * double (`val / 10⁴` — kmeansCodebook's exact conversion), then
    * [[ivfProbeOracleN]]'s cosine assignment + nprobe=2 probe against
    * the TRAINED codebook: rebalance(build + append) must be
    * indistinguishable from a fresh build with the retrained
    * codebook. */
  private lazy val ivfRebalanceOracle: String = {
    def cosSql(a: String, b: String): String =
      s"""(list_aggregate(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]), 'sum') /
          (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum')) *
           sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum'))))"""
    s"""WITH $kmeansIntCtes,
        e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        c AS (SELECT cid, list(val / 10000.0 ORDER BY pos) AS cv FROM c2 GROUP BY cid),
        asg0 AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
                 FROM e CROSS JOIN c),
        asg AS (SELECT vec_id, v, cid,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM asg0),
        cell AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
        qr AS (SELECT vec_id AS qid, v AS qv, cid AS qcell
              FROM asg WHERE vec_id IN (100, 200) AND rn <= 2),
        sc AS (SELECT qr.qid, cell.vec_id, ${cosSql("cell.v", "qr.qv")} AS cos
               FROM cell JOIN qr ON cell.cell = qr.qcell
               WHERE cell.vec_id != qr.qid),
        r AS (SELECT qid, vec_id, cos,
                ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id ASC) AS rn
              FROM sc)
        SELECT qid, vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
        FROM r WHERE rn <= 5
        ORDER BY qid, cos DESC, vec_id ASC"""
  }

  /** p169 — recall@5 of the single-cell IVF probe against the exact
    * top-5 (both replayed: the probe = [[ivfProbeOracleN]]'s chain at
    * nprobe = 1, the truth = a full cosine ranking); the hit count
    * and ppm recall per query. */
  private lazy val annRecallOracle: String = {
    def cosSql(a: String, b: String): String =
      s"""(list_aggregate(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]), 'sum') /
          (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum')) *
           sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum'))))"""
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        asg0 AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
                 FROM e CROSS JOIN c),
        asg AS (SELECT vec_id, v, cid,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM asg0),
        cell AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
        qr AS (SELECT vec_id AS qid, v AS qv, cid AS qcell
               FROM asg WHERE vec_id IN (100, 200) AND rn <= 1),
        sc AS (SELECT qr.qid, cell.vec_id, ${cosSql("cell.v", "qr.qv")} AS cos
               FROM cell JOIN qr ON cell.cell = qr.qcell
               WHERE cell.vec_id != qr.qid),
        apx AS (SELECT qid, vec_id FROM (
                  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY cos DESC, vec_id ASC) AS rn FROM sc)
                WHERE rn <= 5),
        ex0 AS (SELECT qr.qid, e.vec_id, ${cosSql("e.v", "qr.qv")} AS cos
                FROM e CROSS JOIN qr WHERE e.vec_id != qr.qid),
        ex AS (SELECT qid, vec_id FROM (
                 SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cos DESC, vec_id ASC) AS rn FROM ex0)
               WHERE rn <= 5),
        hits AS (SELECT ex.qid, COUNT(*) AS n_hits
                 FROM ex JOIN apx ON ex.qid = apx.qid
                                 AND ex.vec_id = apx.vec_id
                 GROUP BY 1)
        SELECT qr.qid, CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(COALESCE(hits.n_hits, 0) * 1000000 // 5 AS BIGINT) AS recall_ppm
        FROM qr LEFT JOIN hits ON qr.qid = hits.qid
        ORDER BY qr.qid"""
  }

  /** p166 — the health report replay: the sampled-codebook cosine
    * assignment (ivfProbeOracleN's `cell` CTE) grouped per cell, LEFT
    * joined from the codebook so a dead centroid reports n = 0. */
  private lazy val ivfHealthOracle: String = {
    def cosSql(a: String, b: String): String =
      s"""(list_aggregate(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]), 'sum') /
          (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum')) *
           sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum'))))"""
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        asg0 AS (SELECT e.vec_id, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
                 FROM e CROSS JOIN c),
        asg AS (SELECT vec_id, cid,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM asg0),
        cell AS (SELECT vec_id, cid AS cell FROM asg WHERE rn = 1),
        cnt AS (SELECT cell, COUNT(*) AS n FROM cell GROUP BY 1),
        tot AS (SELECT SUM(n) AS t FROM cnt)
        SELECT c.cid AS cell, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n,
               CAST(COALESCE(cnt.n, 0) * 1000000 // (SELECT t FROM tot) AS BIGINT) AS share_ppm
        FROM c LEFT JOIN cnt ON c.cid = cnt.cell
        ORDER BY cell"""
  }

  /** Seeded per-table variant (Similarity.planeWeights(table, plane)). */
  private def lshProjSqlSeeded(table: Int, planes: Int): String =
    (0 until planes).map { p =>
      val w = s"((${h60Sql(s"'t$table:$p:' || i::VARCHAR")} % 2001) - 1000)::DOUBLE / 1000.0"
      s"list_aggregate(list_transform(range(0, 64), i -> v[i+1] * ($w)), 'sum') AS proj$p"
    }.mkString(", ")
  private def lshBucketSql(planes: Int): String = (0 until planes)
    .map(p => s"(CASE WHEN proj$p > 0.0 THEN ${1L << p} ELSE 0 END)")
    .mkString(" + ")
  private val lshProj = lshProjSql(6)
  private val lshBucket = lshBucketSql(6)

  /** The p24 integer-k-means CTE chain (e4 quantize → seed centroids →
    * two exact Lloyd iterations → trained centroids `c2(cid,pos,val)`,
    * with the exploded corpus kept as `qe(id,pos,val)`). Shared by the
    * p24 training oracle and the p75 assignment oracle so the replayed
    * training can never drift between them. */
  private val kmeansIntCtes: String =
    """q AS (SELECT vec_id AS id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
         qe AS (SELECT id, i AS pos, qv[i + 1] AS val
                FROM q, range(0, 64) AS t(i)),
         c0 AS (SELECT id AS cid, i AS pos, qv[i + 1] AS val
                FROM q, range(0, 64) AS t(i) WHERE id < 8),
         d1 AS (SELECT qe.id, c0.cid,
                       CAST(SUM((qe.val - c0.val) * (qe.val - c0.val)) AS BIGINT) AS dist
                FROM qe JOIN c0 ON qe.pos = c0.pos GROUP BY qe.id, c0.cid),
         a1 AS (SELECT id, cid FROM (
                  SELECT id, cid, ROW_NUMBER() OVER
                    (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
                  FROM d1) WHERE rn = 1),
         c1 AS (SELECT a1.cid, qe.pos,
                       CAST(SUM(qe.val) AS BIGINT) // COUNT(*) AS val
                FROM a1 JOIN qe ON a1.id = qe.id GROUP BY a1.cid, qe.pos),
         d2 AS (SELECT qe.id, c1.cid,
                       CAST(SUM((qe.val - c1.val) * (qe.val - c1.val)) AS BIGINT) AS dist
                FROM qe JOIN c1 ON qe.pos = c1.pos GROUP BY qe.id, c1.cid),
         a2 AS (SELECT id, cid FROM (
                  SELECT id, cid, ROW_NUMBER() OVER
                    (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
                  FROM d2) WHERE rn = 1),
         c2 AS (SELECT a2.cid, qe.pos,
                       CAST(SUM(qe.val) AS BIGINT) // COUNT(*) AS val
                FROM a2 JOIN qe ON a2.id = qe.id GROUP BY a2.cid, qe.pos)"""

  /** [[kmeansIntCtes]] + the full-corpus nearest-centroid assignment
    * (`a3(id, cid)` — squared-L2 argmin against `c2`, tie → lowest
    * cid), the replay of `Similarity.assignCellsInt`. Shared by the
    * p75 sampling and p76 semantic-dedup oracles. */
  private val kmeansAssignCtes: String =
    s"""$kmeansIntCtes,
         d3 AS (SELECT qe.id, c2.cid,
                       CAST(SUM((qe.val - c2.val) * (qe.val - c2.val)) AS BIGINT) AS dist
                FROM qe JOIN c2 ON qe.pos = c2.pos GROUP BY qe.id, c2.cid),
         a3 AS (SELECT id, cid FROM (
                  SELECT id, cid, ROW_NUMBER() OVER
                    (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
                  FROM d3) WHERE rn = 1)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_text_stats" -> (p01 _),
    "p02_lang_id" -> (p02 _),
    "p03_fingerprint" -> (p03 _),
    "p04_dedup_exact" -> (p04 _),
    "p05_ngram_jaccard" -> (p05 _),
    "p06_minhash_lsh" -> (p06 _),
    "p07_simhash" -> (p07 _),
    "p08_simhash_pairs" -> (p08 _),
    "p09_cosine_topk" -> (p09 _),
    "p10_cosine_lsh" -> (p10 _),
    "p11_multimodal_stub" -> (p11 _),
    "p12_cosine_neardup" -> (p12 _),
    "p13_token_docfreq" -> (p13 _),
    "p14_cosine_ivf" -> (p14 _),
    "p15_cosine_multitable" -> (p15 _),
    "p16_dedup_clusters" -> (p16 _),
    "p17_sample_stratified" -> (p17 _),
    "p18_dedup_removal" -> (p18 _),
    "p19_embedding_quantize" -> (p19 _),
    "p20_tfidf_topterms" -> (p20 _),
    "p21_winnow_fingerprints" -> (p21 _),
    "p22_decontamination" -> (p22 _),
    "p23_repetition" -> (p23 _),
    "p24_kmeans_centroids" -> (p24 _),
    "p25_pii_redaction" -> (p25 _),
    "p26_quality_rules" -> (p26 _),
    "p27_sequence_packing" -> (p27 _),
    "p28_source_mix" -> (p28 _),
    "p29_url_dedup" -> (p29 _),
    "p30_containment" -> (p30 _),
    "p31_asof_join" -> (p31 _),
    "p32_sessionize" -> (p32 _),
    "p33_substring_dup" -> (p33 _),
    "p34_stream_rollup" -> (p34 _),
    "p35_stream_sessions" -> (p35 _),
    "p36_cdc_chunks" -> (p36 _),
    "p37_bpe_pairs" -> (p37 _),
    "p38_length_quantiles" -> (p38 _),
    "p39_pq_ann" -> (p39 _),
    "p40_stream_join" -> (p40 _),
    "p41_chunk_rewrite" -> (p41 _),
    "p42_stream_chained" -> (p42 _),
    "p43_split_assign" -> (p43 _),
    "p44_kmv_cardinality" -> (p44 _),
    "p45_salted_join" -> (p45 _),
    "p46_frame_sample" -> (p46 _),
    "p47_source_overlap" -> (p47 _),
    "p48_chunk_containment" -> (p48 _),
    "p49_hist_quantiles" -> (p49 _),
    "p50_salted_left" -> (p50 _),
    "p51_keyframes" -> (p51 _),
    "p52_bloom_join" -> (p52 _),
    "p53_stream_asof" -> (p53 _),
    "p54_asof_forward" -> (p54 _),
    "p55_weighted_sample" -> (p55 _),
    "p56_rolling_window" -> (p56 _),
    "p57_negative_pairs" -> (p57 _),
    "p58_surprisal" -> (p58 _),
    "p59_knn_join" -> (p59 _),
    "p60_ivfpq_ann" -> (p60 _),
    "p61_stream_left_join" -> (p61 _),
    "p62_cms_heavy_hitters" -> (p62 _),
    "p63_token_budget" -> (p63 _),
    "p64_shuffle_shard" -> (p64 _),
    "p65_stream_kmv" -> (p65 _),
    "p66_hashed_classifier" -> (p66 _),
    "p67_decayed_sum" -> (p67 _),
    "p68_temperature_mix" -> (p68 _),
    "p69_stream_cc" -> (p69 _),
    "p70_batch_mix" -> (p70 _),
    "p71_interval_join" -> (p71 _),
    "p72_interval_overlap" -> (p72 _),
    "p73_keep_best" -> (p73 _),
    "p74_stream_topk" -> (p74 _),
    "p75_cluster_sample" -> (p75 _),
    "p76_semantic_dedup" -> (p76 _),
    "p77_epoch_packing" -> (p77 _),
    "p78_stream_dedup" -> (p78 _),
    "p79_stream_sessions_state" -> (p79 _),
    "p80_dupgram_fraction" -> (p80 _),
    "p81_stream_sessions_tws" -> (p81 _),
    "p82_stream_quota" -> (p82 _),
    "p83_rule_range_join" -> (p83 _),
    "p84_rule_overlap_join" -> (p84 _),
    "p85_export_manifest" -> (p85 _),
    "p86_funnel" -> (p86 _),
    "p87_stream_dedup_native" -> (p87 _),
    "p88_hist_drift" -> (p88 _),
    "p89_importance_resample" -> (p89 _),
    "p90_normalize_dedup" -> (p90 _),
    "p91_snapshot_diff" -> (p91 _),
    "p92_dedup_provenance" -> (p92 _),
    "p93_winsorized_stats" -> (p93 _),
    "p94_length_buckets" -> (p94 _),
    "p95_strip_boilerplate" -> (p95 _),
    "p96_oph_dedup" -> (p96 _),
    "p97_label_drift" -> (p97 _),
    "p98_incremental_dedup" -> (p98 _),
    "p99_stream_drift" -> (p99 _),
    "p100_curation_chain" -> (p100 _),
    "p101_stream_neardup" -> (p101 _),
    "p102_bigram_surprisal" -> (p102 _),
    "p103_rag_chunks" -> (p103 _),
    "p104_vocab_coverage" -> (p104 _),
    "p105_rank_fusion" -> (p105 _),
    "p106_mmr_select" -> (p106 _),
    "p107_column_profile" -> (p107 _),
    "p108_rollup_report" -> (p108 _),
    "p109_lang_pivot" -> (p109 _),
    "p110_percentile_norm" -> (p110 _),
    "p111_zorder_layout" -> (p111 _),
    "p112_self_repeat" -> (p112 _),
    "p113_prefix_filter" -> (p113 _),
    "p114_rendezvous_shard" -> (p114 _),
    "p115_interval_merge" -> (p115 _),
    "p116_cluster_histogram" -> (p116 _),
    "p117_equidepth_bins" -> (p117 _),
    "p118_retention_cohorts" -> (p118 _),
    "p119_edit_distance" -> (p119 _),
    "p120_multiprobe_lsh" -> (p120 _),
    "p121_mad_outliers" -> (p121 _),
    "p122_stratified_split" -> (p122 _),
    "p123_leakage_safe_split" -> (p123 _),
    "p124_event_transitions" -> (p124 _),
    "p125_dwell_quantiles" -> (p125 _),
    "p126_burst_detect" -> (p126 _),
    "p127_trailing_wau" -> (p127 _),
    "p128_lang_confusion" -> (p128 _),
    "p129_vocab_overlap" -> (p129 _),
    "p130_rank_correlation" -> (p130 _),
    "p131_estimator_audit" -> (p131 _),
    "p132_semantic_decontam" -> (p132 _),
    "p133_medoid_keeper" -> (p133 _),
    "p134_pii_by_source" -> (p134 _),
    "p135_collocations" -> (p135 _),
    "p136_oov_rate" -> (p136 _),
    "p137_vocab_growth" -> (p137 _),
    "p138_pair_divergence" -> (p138 _),
    "p139_effective_sample_size" -> (p139 _),
    "p140_overlap_at_k" -> (p140 _),
    "p141_key_uniqueness" -> (p141 _),
    "p142_referential_integrity" -> (p142 _),
    "p143_stream_funnel" -> (p143 _),
    "p144_token_mixture" -> (p144 _),
    "p145_calibration_audit" -> (p145 _),
    "p146_epoch_mixture" -> (p146 _),
    "p147_bpe_train" -> (p147 _),
    "p148_bpe_segment" -> (p148 _),
    "p149_importance_propagation" -> (p149 _),
    "p150_k_anonymity" -> (p150 _),
    "p151_validity_intervals" -> (p151 _),
    "p152_bpe_residual_drift" -> (p152 _),
    "p153_stream_scd" -> (p153 _),
    "p154_ivf_index_probe" -> (p154 _),
    "p155_tokenizer_mixture_chain" -> (p155 _),
    "p156_ivf_index_store" -> (p156 _),
    "p157_signature_index_store" -> (p157 _),
    "p158_ivf_index_append" -> (p158 _),
    "p159_signature_index_append" -> (p159 _),
    "p160_ivf_multiprobe" -> (p160 _),
    "p161_ivf_probe_params" -> (p161 _),
    "p162_pq_index_store" -> (p162 _),
    "p163_pq_index_append" -> (p163 _),
    "p164_ivf_rebalance" -> (p164 _),
    "p165_dsir_weights" -> (p165 _),
    "p166_ivf_index_health" -> (p166 _),
    "p167_signature_index_health" -> (p167 _),
    "p168_pq_index_health" -> (p168 _),
    "p169_ann_recall" -> (p169 _),
    "p170_pq_knn_join" -> (p170 _))

  /** Integer-e4 PQ training + ADC replay — shared by p39 (per-call
    * train+probe) and p162/p163 (the persisted index forms): the
    * persistence and encode/probe split are invisible to the math. */
  private lazy val pqAnnOracle: String =
    """WITH q AS (SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
          qe AS (SELECT id, i // 8 AS sub, i % 8 AS spos, qv[i+1] AS val
                 FROM q, range(0, 64) t(i)),
          c0 AS (SELECT id AS cid, sub, spos, val FROM qe WHERE id < 4),
          d1 AS (SELECT qe.id, qe.sub, c0.cid,
                   CAST(SUM((qe.val - c0.val) * (qe.val - c0.val)) AS BIGINT)
                     AS dist
                 FROM qe JOIN c0 ON qe.sub = c0.sub AND qe.spos = c0.spos
                 GROUP BY 1, 2, 3),
          a1 AS (SELECT id, sub, cid FROM (
                   SELECT id, sub, cid, ROW_NUMBER() OVER (
                     PARTITION BY id, sub ORDER BY dist, cid) AS rn
                   FROM d1) WHERE rn = 1),
          c1 AS (SELECT a1.sub, a1.cid, qe.spos,
                   CAST(SUM(qe.val) AS BIGINT) // COUNT(*) AS val
                 FROM a1 JOIN qe ON a1.id = qe.id AND a1.sub = qe.sub
                 GROUP BY 1, 2, 3),
          d2 AS (SELECT qe.id, qe.sub, c1.cid,
                   CAST(SUM((qe.val - c1.val) * (qe.val - c1.val)) AS BIGINT)
                     AS dist
                 FROM qe JOIN c1 ON qe.sub = c1.sub AND qe.spos = c1.spos
                 GROUP BY 1, 2, 3),
          a2 AS (SELECT id, sub, cid FROM (
                   SELECT id, sub, cid, ROW_NUMBER() OVER (
                     PARTITION BY id, sub ORDER BY dist, cid) AS rn
                   FROM d2) WHERE rn = 1),
          dt AS (SELECT c1.sub, c1.cid,
                   CAST(SUM((qq.val - c1.val) * (qq.val - c1.val)) AS BIGINT)
                     AS dist
                 FROM (SELECT sub, spos, val FROM qe WHERE id = 0) qq
                 JOIN c1 ON qq.sub = c1.sub AND qq.spos = c1.spos
                 GROUP BY 1, 2),
          adc AS (SELECT a2.id, CAST(SUM(dt.dist) AS BIGINT) AS adc_dist
                  FROM a2 JOIN dt ON a2.sub = dt.sub AND a2.cid = dt.cid
                  GROUP BY a2.id)
          SELECT id AS vec_id, adc_dist FROM adc
          WHERE id <> 0 ORDER BY adc_dist, vec_id LIMIT 10"""

  val oracleSql: Map[String, String] = Map(
    "p01_text_stats" ->
      s"""WITH $toksCte,
          s AS (SELECT doc_id, toks, list_distinct(toks) AS dt,
                  len(toks) AS n_tokens,
                  list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS chars,
                  list_aggregate(list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)), 'sum') AS bpe
                FROM t)
          SELECT doc_id,
                 CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(len(dt) AS BIGINT) AS n_distinct_tokens,
                 CAST(bpe AS BIGINT) AS bpe_tokens,
                 CAST(floor((chars::DOUBLE / n_tokens::DOUBLE) * 1000000.0) AS BIGINT) AS avg_token_len_ppm,
                 CAST(floor((len(list_intersect(dt, ${stopList(langs.head._2)}))::DOUBLE
                      / len(dt)::DOUBLE) * 1000000.0) AS BIGINT) AS stop_ratio_ppm,
                 CAST(floor(((LEAST(n_tokens, 200)::DOUBLE / 200.0) * 0.5 +
                      (len(list_intersect(dt, ${stopList(langs.head._2)}))::DOUBLE
                       / len(dt)::DOUBLE) * 0.5) * 1000000.0) AS BIGINT) AS quality_ppm
          FROM s ORDER BY doc_id""",
    "p02_lang_id" -> {
      val scores = langs.map { case (l, ws) =>
        s"CAST(len(list_intersect(dt, ${stopList(ws)})) AS BIGINT) AS score_$l"
      }.mkString(", ")
      val best = langs.map { case (l, _) => s"score_$l" }
        .mkString("GREATEST(", ", ", ")")
      val pick = langs.map { case (l, _) =>
        s"WHEN score_$l = $best THEN '$l'" }.mkString(" ")
      s"""WITH $toksCte,
          s AS (SELECT doc_id, list_distinct(toks) AS dt FROM t),
          sc AS (SELECT doc_id, $scores FROM s)
          SELECT doc_id, ${langs.map { case (l, _) => s"score_$l" }.mkString(", ")},
                 CASE WHEN $best = 0 THEN 'unknown' $pick ELSE 'unknown' END AS lang_pred
          FROM sc ORDER BY doc_id"""
    },
    "p03_fingerprint" ->
      s"""WITH $toksCte
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
          FROM t ORDER BY doc_id""",
    "p04_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper,
                COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    "p05_ngram_jaccard" ->
      s"""WITH $shinglesCte,
          eh AS (SELECT doc_id, nsh, ${h60Sql("shingle")} AS sh_h FROM e),
          p AS (SELECT a.doc_id AS i, b.doc_id AS j, a.nsh AS na2, b.nsh AS nb2, COUNT(*) AS inter2
                FROM eh a JOIN eh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4)
          SELECT i, j, CAST(na2 AS BIGINT) AS na, CAST(nb2 AS BIGINT) AS nb,
                 CAST(inter2 AS BIGINT) AS inter,
                 CAST(na2 + nb2 - inter2 AS BIGINT) AS uni,
                 CAST(floor((inter2::DOUBLE / (na2 + nb2 - inter2)::DOUBLE) * 1000000.0) AS BIGINT) AS jaccard_ppm
          FROM p
          WHERE floor((inter2::DOUBLE / (na2 + nb2 - inter2)::DOUBLE) * 1000000.0) >= 800000
          ORDER BY i, j""",
    "p06_minhash_lsh" ->
      s"""WITH $minhashCtes
          $verifySql
          FROM cand JOIN shh sa ON sa.doc_id = i JOIN shh sb ON sb.doc_id = j
          WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                * 1000000.0) >= 800000
          ORDER BY i, j""",
    "p16_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j
                    FROM cand JOIN shh sa ON sa.doc_id = i
                              JOIN shh sb ON sb.doc_id = j
                    WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                          * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node)
          SELECT node AS doc_id, MIN(lbl) AS cluster,
                 MIN(lbl) = node AS is_keeper
          FROM reach GROUP BY node ORDER BY doc_id""",
    "p17_sample_stratified" ->
      s"""WITH thin AS (
            SELECT doc_id, lang FROM documents
            WHERE ${h60Sql(1, "CAST(doc_id AS VARCHAR)")} % 1000000 < 500000),
          r AS (
            SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                ${h60Sql(0, "CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC)
                AS sample_rank
            FROM thin)
          SELECT doc_id, lang, CAST(sample_rank AS INTEGER) AS sample_rank
          FROM r WHERE sample_rank <= 25
          ORDER BY lang, sample_rank""",
    "p18_dedup_removal" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j
                    FROM cand JOIN shh sa ON sa.doc_id = i
                              JOIN shh sb ON sb.doc_id = j
                    WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                          * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
          keep AS (SELECT node FROM reach GROUP BY node
                   HAVING MIN(lbl) = node)
          SELECT d.doc_id, d.lang, d.n_chars
          FROM documents d JOIN keep k ON k.node = d.doc_id
          ORDER BY d.doc_id""",
    "p20_tfidf_topterms" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS token
                     FROM documents),
          tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                 FROM t GROUP BY 1, 2),
          d AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS dfreq
                FROM (SELECT DISTINCT doc_id, token FROM t) GROUP BY 1),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
          sc AS (SELECT doc_id, token,
                        (tf * n.n * 1000000) // d.dfreq AS score
                 FROM tf JOIN d USING (token), n),
          r AS (SELECT doc_id, token, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, token ASC) AS rank
                FROM sc)
          SELECT doc_id, CAST(rank AS INTEGER) AS rank, token,
                 CAST(score AS BIGINT) AS score
          FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    "p21_winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          g0 AS (SELECT doc_id,
                        list_transform(range(0, GREATEST(len(toks) - 3, 0)),
                          i -> array_to_string(toks[i+1:i+4], ' ')) AS grams
                 FROM t),
          g AS (SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
                       ${h60Sql("unnest(grams)")} AS h
                FROM g0),
          w AS (SELECT doc_id,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
                FROM g)
          SELECT DISTINCT doc_id, fp FROM w ORDER BY doc_id, fp""",
    "p30_containment" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          g0 AS (SELECT doc_id,
                        list_transform(range(0, GREATEST(len(toks) - 3, 0)),
                          i -> array_to_string(toks[i+1:i+4], ' ')) AS grams
                 FROM t),
          g AS (SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
                       ${h60Sql("unnest(grams)")} AS h
                FROM g0),
          wn AS (SELECT doc_id,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
                FROM g),
          fps AS (SELECT DISTINCT doc_id, fp FROM wn),
          rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50),
          kept AS (SELECT fps.doc_id, fps.fp FROM fps JOIN rare USING (fp)),
          sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
                    FROM fps GROUP BY doc_id),
          sh AS (SELECT a.doc_id AS i, b.doc_id AS j,
                        CAST(COUNT(*) AS BIGINT) AS n_shared
                 FROM kept a JOIN kept b
                   ON a.fp = b.fp AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
          o AS (SELECT i, j, n_shared,
                       (n_shared * 1000000) // si.n_fp AS ci,
                       (n_shared * 1000000) // sj.n_fp AS cj
                FROM sh
                JOIN sizes si ON sh.i = si.doc_id
                JOIN sizes sj ON sh.j = sj.doc_id)
          SELECT i, j, n_shared,
                 CAST(ci AS BIGINT) AS containment_i_ppm,
                 CAST(cj AS BIGINT) AS containment_j_ppm
          FROM o WHERE GREATEST(ci, cj) >= 300000 ORDER BY i, j""",
    "p31_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS purchase_cents
               FROM events WHERE event_type = 'purchase'),
          v0 AS (SELECT user_id, ts,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
               FROM events WHERE event_type = 'view'),
          v AS (SELECT user_id, ts, MAX(vc) AS view_cents
               FROM v0 GROUP BY 1, 2)
          SELECT p.event_id, p.user_id, p.purchase_cents, v.view_cents,
                 CAST(date_diff('microsecond', v.ts, p.ts) // 1000000
                   AS BIGINT) AS gap_sec
          FROM p ASOF LEFT JOIN v
            ON p.user_id = v.user_id AND v.ts <= p.ts
          ORDER BY p.event_id""",
    "p32_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, ts, event_type,
                 lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
          n AS (SELECT user_id, event_id, ts, event_type,
                 CASE WHEN prev IS NULL OR
                      date_diff('microsecond', prev, ts) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
               FROM x),
          ss AS (SELECT user_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
               FROM n)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 MIN(ts) AS session_start, MAX(ts) AS session_end,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                 CAST(date_diff('microsecond', MIN(ts), MAX(ts)) // 1000000
                   AS BIGINT) AS duration_sec
          FROM ss GROUP BY 1, 2 ORDER BY 1, 2""",
    "p33_substring_dup" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          g0 AS (SELECT doc_id,
                        list_transform(range(0, GREATEST(len(toks) - 5, 0)),
                          i -> array_to_string(toks[i+1:i+6], ' ')) AS wins
                 FROM t),
          w AS (SELECT doc_id, generate_subscripts(wins, 1) - 1 AS pos,
                       ${h60Sql("unnest(wins)")} AS h
                FROM g0),
          m AS (SELECT a.doc_id AS i, b.doc_id AS j, a.pos AS pa, b.pos AS pb
                FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id),
          isl AS (SELECT i, j, pa - pb AS diag, pa,
                         pa - ROW_NUMBER() OVER (PARTITION BY i, j, pa - pb
                           ORDER BY pa) AS island
                  FROM m),
          runs AS (SELECT i, j, COUNT(*) AS nwin
                   FROM isl GROUP BY i, j, diag, island)
          SELECT i, j, CAST(MAX(nwin) + 5 AS BIGINT) AS longest_run,
                 CAST(SUM(nwin) AS BIGINT) AS shared_windows
          FROM runs GROUP BY i, j ORDER BY i, j""",
    "p22_decontamination" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          g0 AS (SELECT doc_id,
                        list_distinct(list_transform(
                          range(0, GREATEST(len(toks) - 7, 0)),
                          i -> array_to_string(toks[i+1:i+8], ' '))) AS grams
                 FROM t),
          g AS (SELECT doc_id, ${h60Sql("unnest(grams)")} AS h FROM g0),
          tr AS (SELECT doc_id AS train_doc_id, h FROM g WHERE doc_id % 10 <> 0),
          ev AS (SELECT doc_id AS eval_doc_id, h FROM g WHERE doc_id % 10 = 0)
          SELECT train_doc_id, eval_doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM tr JOIN ev USING (h)
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "p23_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                    FROM documents),
         g AS (SELECT doc_id,
                      list_transform(range(0, GREATEST(len(toks) - 2, 0)),
                        i -> array_to_string(toks[i+1:i+3], ' ')) AS grams
               FROM t)
         SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
                CASE WHEN len(grams) = 0 THEN 0
                     ELSE CAST(floor((1.0 - len(list_distinct(grams))::DOUBLE
                       / len(grams)::DOUBLE) * 1000000.0) AS BIGINT)
                END AS rep_ppm
         FROM g ORDER BY doc_id""",
    "p24_kmeans_centroids" ->
      s"""WITH $kmeansIntCtes
         SELECT CAST(cid AS BIGINT) AS centroid, CAST(pos AS BIGINT) AS pos,
                val AS value
         FROM c2 ORDER BY centroid, pos""",
    "p75_cluster_sample" ->
      s"""WITH $kmeansAssignCtes,
         r AS (SELECT id, cid,
                      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY
                        ${h60Sql(0, "CAST(id AS VARCHAR)")} ASC, id ASC)
                        AS sample_rank
               FROM a3)
         SELECT id AS vec_id, CAST(cid AS BIGINT) AS cell,
                CAST(sample_rank AS INTEGER) AS sample_rank
         FROM r WHERE sample_rank <= 10
         ORDER BY cell, sample_rank""",
    "p76_semantic_dedup" ->
      s"""WITH $kmeansAssignCtes,
         e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
         pr AS (SELECT a.id AS i, b.id AS j, a.cid
                FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.id < b.id),
         sc AS (SELECT i, j,
                  CAST(floor((list_aggregate(list_transform(range(0, 64), k -> ea.v[k+1] * eb.v[k+1]), 'sum') /
                    (sqrt(list_aggregate(list_transform(ea.v, x -> x * x), 'sum')) *
                     sqrt(list_aggregate(list_transform(eb.v, x -> x * x), 'sum')))) * 1000000.0) AS BIGINT) AS cos_ppm
                FROM pr JOIN e ea ON ea.vec_id = i JOIN e eb ON eb.vec_id = j),
         dropped AS (SELECT DISTINCT j FROM sc WHERE cos_ppm >= 400000)
         SELECT id AS vec_id, CAST(cid AS BIGINT) AS cell
         FROM a3 WHERE id NOT IN (SELECT j FROM dropped)
         ORDER BY vec_id""",
    "p77_epoch_packing" ->
      """WITH t AS (SELECT doc_id,
                      CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
                        AS n_tokens
                    FROM documents),
         ep AS (SELECT doc_id, n_tokens, s.epoch,
                  ('0x'||substr(md5('11:'||CAST(s.epoch AS VARCHAR)||':'||
                    CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
                FROM t, (SELECT UNNEST(range(0, 3)) AS epoch) s),
         o AS (SELECT epoch, CAST(h % 4 AS INT) AS shard, doc_id,
                 n_tokens,
                 CAST(ROW_NUMBER() OVER (PARTITION BY epoch, h % 4
                   ORDER BY h, doc_id) AS INT) AS pos,
                 COALESCE(SUM(n_tokens) OVER (PARTITION BY epoch, h % 4
                   ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS off
               FROM ep)
         SELECT CAST(epoch AS INT) AS epoch, shard, doc_id, n_tokens,
                pos, CAST(off AS BIGINT) AS offset,
                CAST(off AS BIGINT) // 512 AS bin
         FROM o ORDER BY epoch, shard, pos""",
    "p78_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    // lifetime per-source quota: the streaming counter must reproduce
    // the batch "first cap per source by doc_id" exactly
    "p82_stream_quota" ->
      """WITH r AS (SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY doc_id) AS admit_seq
               FROM documents)
         SELECT source, doc_id, CAST(admit_seq AS BIGINT) AS admit_seq
         FROM r WHERE admit_seq <= 12
         ORDER BY source, doc_id""",
    // p32's batch sessionization verbatim — the custom-state streaming
    // operator must land on the identical session set. p81 is the same
    // semantics on the transformWithState API: same oracle, verbatim.
    "p81_stream_sessions_tws" ->
      """WITH x AS (SELECT user_id, event_id, ts, event_type,
                 lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
          n AS (SELECT user_id, event_id, ts, event_type,
                 CASE WHEN prev IS NULL OR
                      date_diff('microsecond', prev, ts) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
               FROM x),
          ss AS (SELECT user_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
               FROM n)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 MIN(ts) AS session_start, MAX(ts) AS session_end,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                 CAST(date_diff('microsecond', MIN(ts), MAX(ts)) // 1000000
                   AS BIGINT) AS duration_sec
          FROM ss GROUP BY 1, 2 ORDER BY 1, 2""",
    "p79_stream_sessions_state" ->
      """WITH x AS (SELECT user_id, event_id, ts, event_type,
                 lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
          n AS (SELECT user_id, event_id, ts, event_type,
                 CASE WHEN prev IS NULL OR
                      date_diff('microsecond', prev, ts) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
               FROM x),
          ss AS (SELECT user_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
               FROM n)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 MIN(ts) AS session_start, MAX(ts) AS session_end,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                 CAST(date_diff('microsecond', MIN(ts), MAX(ts)) // 1000000
                   AS BIGINT) AS duration_sec
          FROM ss GROUP BY 1, 2 ORDER BY 1, 2""",
    "p80_dupgram_fraction" ->
      s"""WITH $toksCte,
          sh AS (SELECT doc_id, list_distinct(
                   CASE WHEN len(toks) >= 10
                        THEN list_transform(range(0, len(toks) - 9),
                               i -> array_to_string(toks[i+1:i+10], ' '))
                        ELSE [] END) AS sh
                 FROM t),
          g AS (SELECT doc_id, ${h60Sql("unnest(sh)")} AS gh FROM sh),
          df AS (SELECT gh, COUNT(*) AS gdf FROM g GROUP BY gh)
          SELECT g.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN df.gdf >= 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS dup_grams,
                 CAST(SUM(CASE WHEN df.gdf >= 2 THEN 1 ELSE 0 END)
                   AS BIGINT) * 1000000 // COUNT(*) AS dup_frac_ppm
          FROM g JOIN df USING (gh)
          GROUP BY g.doc_id ORDER BY g.doc_id""",
    "p25_pii_redaction" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
      s"""WITH t AS (
            SELECT c_custkey,
                   c_mktsegment || ' reach ' || lower(c_name) ||
                     '@example.com or ' ||
                     lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
                     lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') ||
                     ' id ' ||
                     lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
                     lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS text
            FROM customer)
          SELECT c_custkey,
                 CAST(len(regexp_extract_all(text, '$email')) AS INT) AS n_email,
                 CAST(len(regexp_extract_all(text, '$phone')) AS INT) AS n_phone,
                 CAST(len(regexp_extract_all(text, '$ssn')) AS INT) AS n_ssn,
                 md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '$email', '<EMAIL>', 'g'),
                   '$phone', '<PHONE>', 'g'),
                   '$ssn', '<SSN>', 'g')) AS redacted_md5
          FROM t ORDER BY c_custkey"""
    },
    "p26_quality_rules" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                    FROM documents),
         m AS (SELECT doc_id,
                      CAST(len(toks) AS BIGINT) AS n_words,
                      CAST(list_aggregate(list_transform(toks, x -> length(x)),
                        'sum') AS BIGINT) AS chars,
                      CAST(len(list_filter(toks,
                        x -> x IN ('the','a','is','of','and'))) AS BIGINT) AS stop
               FROM t),
         r AS (SELECT doc_id, n_words,
                      CASE WHEN n_words = 0 THEN 0
                           ELSE chars * 1000000 // n_words END AS mean_word_len_ppm,
                      CASE WHEN n_words = 0 THEN 0
                           ELSE stop * 1000000 // n_words END AS stopword_ppm
               FROM m)
         SELECT doc_id, n_words,
                CAST(mean_word_len_ppm AS BIGINT) AS mean_word_len_ppm,
                CAST(stopword_ppm AS BIGINT) AS stopword_ppm,
                (n_words BETWEEN 30 AND 80
                  AND mean_word_len_ppm BETWEEN 3500000 AND 4600000
                  AND stopword_ppm >= 20000) AS keep
         FROM r ORDER BY doc_id""",
    "p29_url_dedup" ->
      """WITH u AS (
           SELECT o_orderkey,
                  'shop-' || CAST((o_orderkey // 4) % 50 AS VARCHAR) ||
                    '.example.com' AS shop,
                  '/item/' || CAST(o_orderkey // 4 AS VARCHAR) AS path
           FROM orders),
         v AS (
           SELECT o_orderkey,
                  CASE o_orderkey % 4
                    WHEN 0 THEN 'https://' || shop || path
                    WHEN 1 THEN 'HTTPS://' || upper(shop) || path
                    WHEN 2 THEN 'https://' || shop || ':443' || path || '/'
                    ELSE 'https://' || shop || path || '#ref' ||
                      CAST(o_orderkey AS VARCHAR)
                  END AS url
           FROM u),
         c AS (
           SELECT o_orderkey,
                  lower(regexp_extract(url,
                    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
                  regexp_replace(lower(regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/#?]*)', 1)),
                    ':(80|443)$', '') ||
                  regexp_replace(regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/#?]*([^#]*)', 1),
                    '/+$', '') AS url_canonical
           FROM v)
         SELECT url_canonical, COUNT(*) AS n_variants,
                MIN(o_orderkey) AS keeper
         FROM c GROUP BY url_canonical ORDER BY url_canonical""",
    "p28_source_mix" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_source,
                  1 + CAST(substr(source, 4) AS BIGINT) % 4 AS weight
               FROM documents GROUP BY source),
         c2 AS (SELECT *, CAST((SELECT SUM(weight) FROM c) AS BIGINT) AS W
                FROM c),
         c3 AS (SELECT *,
                  MIN((n_source * W) // weight) OVER () AS T FROM c2),
         q AS (SELECT source, n_source, weight,
                  (((weight * T) // W) * 1000000) // n_source AS keep_ppm
               FROM c3),
         k AS (SELECT d.source,
                  SUM(CASE WHEN ${h60Sql(0, "CAST(d.doc_id AS VARCHAR)")}
                    % 1000000 < q.keep_ppm THEN 1 ELSE 0 END) AS n_kept
               FROM documents d JOIN q ON d.source = q.source
               GROUP BY d.source)
         SELECT q.source, q.n_source, q.weight,
                CAST(q.keep_ppm AS BIGINT) AS keep_ppm,
                CAST(k.n_kept AS BIGINT) AS n_kept
         FROM q JOIN k ON q.source = k.source
         ORDER BY q.source""",
    "p27_sequence_packing" ->
      """WITH t AS (SELECT doc_id, source,
                      CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
                        AS n_tokens
                    FROM documents),
         o AS (SELECT doc_id, source, n_tokens,
                      COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS off
               FROM t)
         SELECT doc_id, source, n_tokens, CAST(off AS BIGINT) AS offset,
                CAST(off AS BIGINT) // 512 AS bin
         FROM o ORDER BY doc_id""",
    "p19_embedding_quantize" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
          m AS (SELECT vec_id, v,
                       list_aggregate(list_transform(v, x -> abs(x)), 'max') AS mx
                FROM e),
          s AS (SELECT vec_id, v,
                       CASE WHEN mx = 0 THEN CAST(1 AS DOUBLE)
                            ELSE CAST(127 AS DOUBLE) / mx END AS scale
                FROM m)
          SELECT vec_id,
                 CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_ppm,
                 CAST(i AS BIGINT) AS pos,
                 CAST(floor(v[i + 1] * scale) AS INTEGER) AS q
          FROM s, range(0, 64) AS t(i)
          ORDER BY vec_id, pos""",
    "p07_simhash" ->
      s"""WITH $simhashCte
          SELECT doc_id, simhash FROM simh ORDER BY doc_id""",
    "p08_simhash_pairs" -> {
      val bands = Dedup.simhashBandRanges(SimhashBits, 7).zipWithIndex.map {
        case ((off, len), b) =>
          s"SELECT doc_id, simhash, $b AS band, (simhash >> $off) & ${(1L << len) - 1} AS v FROM simh"
      }.mkString(" UNION ALL ")
      s"""WITH $simhashCte,
          banded AS ($bands)
          SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM banded a JOIN banded b ON a.band = b.band AND a.v = b.v
            AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
          ORDER BY i, j"""
    },
    "p09_cosine_topk" ->
      s"""WITH $cosineCte
          SELECT vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 10""",
    "p10_cosine_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          pr AS (SELECT vec_id, v, $lshProj FROM e),
          bk AS (SELECT vec_id, v, CAST($lshBucket AS BIGINT) AS bucket FROM pr),
          q AS (SELECT v AS qv, bucket AS qbucket FROM bk WHERE vec_id = 0),
          sc AS (SELECT bk.vec_id,
                   list_aggregate(list_transform(range(0, 64), i -> bk.v[i+1] * q.qv[i+1]), 'sum') /
                   (sqrt(list_aggregate(list_transform(bk.v, x -> x * x), 'sum')) *
                    sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))) AS cos
                 FROM bk, q WHERE bk.vec_id != 0 AND bk.bucket = q.qbucket)
          SELECT vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5""",
    "p13_token_docfreq" ->
      s"""WITH $toksCte,
          dt AS (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t)
          SELECT token, COUNT(*) AS doc_freq FROM dt GROUP BY token
          ORDER BY doc_freq DESC, token ASC LIMIT 50""",
    "p14_cosine_ivf" -> {
      def cosSql(a: String, b: String): String =
        s"""(list_aggregate(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]), 'sum') /
            (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum')) *
             sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum'))))"""
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
          asg0 AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
                   FROM e CROSS JOIN c),
          asg AS (SELECT vec_id, v, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                  FROM asg0),
          cell AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
          q AS (SELECT v AS qv, cell AS qcell FROM cell WHERE vec_id = 100),
          sc AS (SELECT cell.vec_id, ${cosSql("cell.v", "q.qv")} AS cos
                 FROM cell, q WHERE cell.vec_id != 100 AND cell.cell = q.qcell)
          SELECT vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5"""
    },
    "p12_cosine_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          pr AS (SELECT vec_id, v, ${lshProjSql(2)} FROM e),
          bk AS (SELECT vec_id, v, CAST(${lshBucketSql(2)} AS BIGINT) AS bucket FROM pr),
          cand AS (SELECT a.vec_id AS i, a.v AS vi, b.vec_id AS j, b.v AS vj
                   FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
          sc AS (SELECT i, j,
                   CAST(floor((list_aggregate(list_transform(range(0, 64), k -> vi[k+1] * vj[k+1]), 'sum') /
                     (sqrt(list_aggregate(list_transform(vi, x -> x * x), 'sum')) *
                      sqrt(list_aggregate(list_transform(vj, x -> x * x), 'sum')))) * 1000000.0) AS BIGINT) AS cos_ppm
                 FROM cand)
          SELECT i, j, cos_ppm FROM sc WHERE cos_ppm >= 400000
          ORDER BY i, j""",
    "p15_cosine_multitable" -> {
      val tablesSql = (0 until 2).map { t =>
        s"""pr$t AS (SELECT vec_id, v, ${lshProjSqlSeeded(t, 3)} FROM e),
            bk$t AS (SELECT vec_id, $t AS t,
                            CAST(${lshBucketSql(3)} AS BIGINT) AS b FROM pr$t)"""
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          $tablesSql,
          banded AS (SELECT * FROM bk0 UNION ALL SELECT * FROM bk1),
          cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
                   FROM banded a JOIN banded b
                     ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id),
          sc AS (SELECT i, j,
                   CAST(floor((list_aggregate(list_transform(range(0, 64), k -> ea.v[k+1] * eb.v[k+1]), 'sum') /
                     (sqrt(list_aggregate(list_transform(ea.v, x -> x * x), 'sum')) *
                      sqrt(list_aggregate(list_transform(eb.v, x -> x * x), 'sum')))) * 1000000.0) AS BIGINT) AS cos_ppm
                 FROM cand JOIN e ea ON ea.vec_id = i JOIN e eb ON eb.vec_id = j)
          SELECT i, j, cos_ppm FROM sc WHERE cos_ppm >= 400000
          ORDER BY i, j"""
    },
    "p11_multimodal_stub" ->
      """WITH a AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                           md5(text) AS sig
                    FROM documents)
         SELECT doc_id, n_bytes, sig, CAST(i AS BIGINT) AS pos,
                ((n_bytes * (i + 7)) % 256)::DOUBLE AS feat
         FROM a, unnest(range(0, 4)) AS u(i)
         ORDER BY doc_id, pos""",
    "p34_stream_rollup" ->
      """SELECT date_trunc('hour', ts) AS range_start,
                date_trunc('hour', ts) + INTERVAL 1 HOUR AS range_end,
                event_type, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_cents,
                CAST(MIN(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS min_cents,
                CAST(MAX(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS max_cents
         FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""",
    "p35_stream_sessions" ->
      """WITH x AS (SELECT user_id, ts, event_type,
                 lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
          n AS (SELECT user_id, ts, event_type,
                 CASE WHEN prev IS NULL OR
                      date_diff('microsecond', prev, ts) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
               FROM x),
          ss AS (SELECT user_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
               FROM n)
          SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
          FROM ss GROUP BY user_id, seq ORDER BY user_id, session_start""",
    "p36_cdc_chunks" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          tok AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                         unnest(toks) AS tok
                  FROM t),
          wi AS (SELECT doc_id, pos, tok,
                   lag(tok, 3) OVER w || ' ' || lag(tok, 2) OVER w || ' ' ||
                   lag(tok, 1) OVER w || ' ' || tok AS win
                 FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
          b AS (SELECT doc_id, pos, tok,
                  CASE WHEN pos >= 3 AND (${h60Sql("win")} % 8) = 0
                       THEN 1 ELSE 0 END AS boundary
                FROM wi),
          c AS (SELECT doc_id, pos, tok,
                  COALESCE(SUM(boundary) OVER (PARTITION BY doc_id
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS chunk_seq
                FROM b),
          ch AS (SELECT doc_id, chunk_seq, COUNT(*) AS n_toks,
                   ${h60Sql("string_agg(tok, ' ' ORDER BY pos)")} AS chunk_hash
                 FROM c GROUP BY doc_id, chunk_seq),
          dd AS (SELECT doc_id, chunk_seq, n_toks,
                   CASE WHEN ROW_NUMBER() OVER (PARTITION BY chunk_hash
                     ORDER BY doc_id, chunk_seq) > 1 THEN 1 ELSE 0 END AS dup
                 FROM ch)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                 CAST(SUM(dup) AS BIGINT) AS n_dup_chunks,
                 CAST(SUM(n_toks) AS BIGINT) AS n_toks,
                 CAST(SUM(dup * n_toks) AS BIGINT) AS dup_toks,
                 CAST(SUM(dup * n_toks) * 1000000 // SUM(n_toks) AS BIGINT)
                   AS dup_ppm
          FROM dd GROUP BY doc_id ORDER BY doc_id""",
    "p37_bpe_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                    FROM documents),
         g0 AS (SELECT doc_id,
                  list_transform(range(0, GREATEST(len(toks) - 1, 0)),
                    i -> [toks[i+1], toks[i+2]]) AS prs
                FROM t),
         p AS (SELECT pr[1] AS a, pr[2] AS b
               FROM (SELECT unnest(prs) AS pr FROM g0))
         SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
         FROM p GROUP BY a, b ORDER BY n DESC, a, b LIMIT 50""",
    "p38_length_quantiles" ->
      """WITH r AS (SELECT source, n_chars, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS cnt
               FROM documents)
         SELECT source, CAST(MAX(cnt) AS BIGINT) AS n_docs,
                CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                CAST(MAX(CASE WHEN rn = (cnt - 1) * 25 // 100 + 1
                         THEN n_chars END) AS BIGINT) AS p25_chars,
                CAST(MAX(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1
                         THEN n_chars END) AS BIGINT) AS p50_chars,
                CAST(MAX(CASE WHEN rn = (cnt - 1) * 75 // 100 + 1
                         THEN n_chars END) AS BIGINT) AS p75_chars,
                CAST(MAX(CASE WHEN rn = (cnt - 1) * 95 // 100 + 1
                         THEN n_chars END) AS BIGINT) AS p95_chars,
                CAST(MAX(n_chars) AS BIGINT) AS max_chars
         FROM r GROUP BY source ORDER BY source""",
    "p39_pq_ann" -> pqAnnOracle,
    "p40_stream_join" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
                p.user_id, p.ts AS p_ts, v.ts AS v_ts
         FROM events p JOIN events v
           ON p.event_type = 'purchase' AND v.event_type = 'view'
          AND p.user_id = v.user_id AND p.user_id % 5 = 3
          AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 24 HOUR
         ORDER BY purchase_id, view_id""",
    "p41_chunk_rewrite" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          tok AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                         unnest(toks) AS tok
                  FROM t),
          wi AS (SELECT doc_id, pos, tok,
                   lag(tok, 3) OVER w || ' ' || lag(tok, 2) OVER w || ' ' ||
                   lag(tok, 1) OVER w || ' ' || tok AS win
                 FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
          b AS (SELECT doc_id, pos, tok,
                  CASE WHEN pos >= 3 AND (${h60Sql("win")} % 8) = 0
                       THEN 1 ELSE 0 END AS boundary
                FROM wi),
          c AS (SELECT doc_id, pos, tok,
                  COALESCE(SUM(boundary) OVER (PARTITION BY doc_id
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS chunk_seq
                FROM b),
          ch AS (SELECT doc_id, chunk_seq, COUNT(*) AS n_toks,
                   string_agg(tok, ' ' ORDER BY pos) AS ctext
                 FROM c GROUP BY doc_id, chunk_seq),
          k AS (SELECT doc_id, chunk_seq, n_toks, ctext,
                  ROW_NUMBER() OVER (PARTITION BY ${h60Sql("ctext")}
                    ORDER BY doc_id, chunk_seq) AS rn
                FROM ch)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_chunks,
                 CAST(SUM(n_toks) AS BIGINT) AS n_kept_toks,
                 string_agg(ctext, ' ' ORDER BY chunk_seq) AS text_deduped
          FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""",
    "p42_stream_chained" ->
      """WITH m AS (SELECT date_trunc('minute', ts) AS mstart, event_type,
                 COUNT(*) AS n
               FROM events GROUP BY 1, 2)
         SELECT date_trunc('hour', mstart) AS range_start, event_type,
                CAST(SUM(n) AS BIGINT) AS n_events,
                CAST(MAX(n) AS BIGINT) AS max_minute,
                CAST(COUNT(*) AS BIGINT) AS active_minutes
         FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    "p43_split_assign" -> {
      val bucket = h60Sql(0, "doc_id::VARCHAR") + " % 1000000"
      s"""WITH a AS (SELECT source, doc_id,
                 CASE WHEN $bucket < 900000 THEN 'train'
                      WHEN $bucket < 950000 THEN 'val'
                      ELSE 'test' END AS split
               FROM documents)
          SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n,
                 MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
          FROM a GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    "p44_kmv_cardinality" ->
      s"""WITH t AS (SELECT source, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          tok AS (SELECT source, unnest(toks) AS tok FROM t),
          h AS (SELECT DISTINCT source, ${h60Sql("tok")} AS h FROM tok),
          r AS (SELECT source, h,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS exact_distinct
                FROM h)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_min,
                 MAX(h) AS hk,
                 CAST(MAX(exact_distinct) AS BIGINT) AS exact_distinct,
                 CAST(CASE WHEN COUNT(*) < 16 THEN COUNT(*)
                      ELSE 15 * (1152921504606846976 // MAX(h)) +
                           (15 * (1152921504606846976 % MAX(h))) // MAX(h)
                      END AS BIGINT) AS est_distinct
          FROM r WHERE rn <= 16 GROUP BY source ORDER BY source""",
    "p45_salted_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_id FROM events
               WHERE event_type = 'purchase'),
          v AS (SELECT user_id, event_id AS v_id FROM events
               WHERE event_type = 'view')
         SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                MIN(p.p_id) AS min_p, MAX(v.v_id) AS max_v
         FROM p JOIN v ON p.user_id = v.user_id
         GROUP BY p.user_id ORDER BY p.user_id""",
    "p46_frame_sample" ->
      """WITH f AS (SELECT doc_id, i AS frame_idx, i * 128 AS off,
                 octet_length(encode(text)) AS nb, text
               FROM documents, range(0, 4) r(i)
               WHERE i * 128 < octet_length(encode(text)))
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                CAST(off AS BIGINT) AS byte_offset,
                CAST(LEAST(nb - off, 64) AS BIGINT) AS frame_bytes,
                md5(substr(text, CAST(off + 1 AS INTEGER), 64)) AS frame_sig
         FROM f ORDER BY doc_id, frame_idx""",
    "p47_source_overlap" ->
      s"""WITH t AS (SELECT source, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          g0 AS (SELECT source,
                   CASE WHEN len(toks) >= 6
                        THEN list_transform(range(0, len(toks) - 5),
                               i -> array_to_string(toks[i+1:i+6], ' '))
                        ELSE [] END AS gs
                 FROM t),
          hh AS (SELECT DISTINCT source AS id, ${h60Sql("g")} AS fp
                 FROM (SELECT source, unnest(gs) AS g FROM g0)),
          rare AS (SELECT fp FROM hh GROUP BY fp HAVING COUNT(*) <= 10),
          kept AS (SELECT id, fp FROM hh JOIN rare USING (fp)),
          sizes AS (SELECT id, COUNT(*) AS n_fp FROM hh GROUP BY id),
          sh AS (SELECT a.id AS i, b.id AS j, COUNT(*) AS n_shared
                 FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
                 GROUP BY 1, 2)
          SELECT i, j, CAST(n_shared AS BIGINT) AS n_shared,
                 CAST((n_shared * 1000000) // si.n_fp AS BIGINT)
                   AS containment_i_ppm,
                 CAST((n_shared * 1000000) // sj.n_fp AS BIGINT)
                   AS containment_j_ppm
          FROM sh JOIN sizes si ON sh.i = si.id
          JOIN sizes sj ON sh.j = sj.id
          ORDER BY i, j""",
    "p48_chunk_containment" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          tok AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                         unnest(toks) AS tok
                  FROM t),
          wi AS (SELECT doc_id, pos, tok,
                   lag(tok, 3) OVER w || ' ' || lag(tok, 2) OVER w || ' ' ||
                   lag(tok, 1) OVER w || ' ' || tok AS win
                 FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
          b AS (SELECT doc_id, pos, tok,
                  CASE WHEN pos >= 3 AND (${h60Sql("win")} % 8) = 0
                       THEN 1 ELSE 0 END AS boundary
                FROM wi),
          c AS (SELECT doc_id, pos, tok,
                  COALESCE(SUM(boundary) OVER (PARTITION BY doc_id
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS chunk_seq
                FROM b),
          ch AS (SELECT doc_id, chunk_seq,
                   string_agg(tok, ' ' ORDER BY pos) AS ctext
                 FROM c GROUP BY doc_id, chunk_seq),
          hh AS (SELECT DISTINCT doc_id AS id, ${h60Sql("ctext")} AS fp
                 FROM ch),
          rare AS (SELECT fp FROM hh GROUP BY fp HAVING COUNT(*) <= 10),
          kept AS (SELECT id, fp FROM hh JOIN rare USING (fp)),
          sizes AS (SELECT id, COUNT(*) AS n_fp FROM hh GROUP BY id),
          sh AS (SELECT a.id AS i, b.id AS j, COUNT(*) AS n_shared
                 FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
                 GROUP BY 1, 2)
          SELECT i, j, CAST(n_shared AS BIGINT) AS n_shared,
                 CAST((n_shared * 1000000) // si.n_fp AS BIGINT)
                   AS containment_i_ppm,
                 CAST((n_shared * 1000000) // sj.n_fp AS BIGINT)
                   AS containment_j_ppm
          FROM sh JOIN sizes si ON sh.i = si.id
          JOIN sizes sj ON sh.j = sj.id
          WHERE GREATEST((n_shared * 1000000) // si.n_fp,
                         (n_shared * 1000000) // sj.n_fp) >= 100000
          ORDER BY i, j""",
    "p49_hist_quantiles" ->
      """WITH h AS (SELECT source, n_chars // 50 AS bin, COUNT(*) AS cnt
                    FROM documents GROUP BY 1, 2),
          c AS (SELECT source, bin, cnt,
                  SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
                  SUM(cnt) OVER (PARTITION BY source) AS n
                FROM h)
         SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
                CAST(MIN(bin) * 50 AS BIGINT) AS min_lo,
                CAST(MIN(CASE WHEN cum >= (n - 1) * 25 // 100 + 1
                         THEN bin END) * 50 AS BIGINT) AS p25_lo,
                CAST(MIN(CASE WHEN cum >= (n - 1) * 50 // 100 + 1
                         THEN bin END) * 50 AS BIGINT) AS p50_lo,
                CAST(MIN(CASE WHEN cum >= (n - 1) * 75 // 100 + 1
                         THEN bin END) * 50 AS BIGINT) AS p75_lo,
                CAST(MIN(CASE WHEN cum >= (n - 1) * 95 // 100 + 1
                         THEN bin END) * 50 AS BIGINT) AS p95_lo,
                CAST(MAX(bin) * 50 AS BIGINT) AS max_lo
         FROM c GROUP BY source ORDER BY source""",
    "p50_salted_left" ->
      """WITH p AS (SELECT user_id, event_id AS p_id FROM events
               WHERE event_type = 'purchase'),
          v AS (SELECT user_id, event_id AS v_id FROM events
               WHERE event_type = 'view' AND user_id % 4 != 1)
         SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(COUNT(v.v_id) AS BIGINT) AS n_matched,
                MIN(p.p_id) AS min_p, MAX(v.v_id) AS max_v
         FROM p LEFT JOIN v ON p.user_id = v.user_id
         GROUP BY p.user_id ORDER BY p.user_id""",
    "p51_keyframes" ->
      """WITH f AS (SELECT doc_id, i AS frame_idx, i * 64 AS off,
                 octet_length(encode(text)) AS nb, hex(encode(text)) AS hx
               -- frame-scan bound: 1024 frames = 64 KiB docs, >100x the
               -- testdata's max n_chars (553); the Spark side scans the
               -- whole payload, so the bound must dominate doc size
               FROM documents, range(0, 1024) r(i)
               WHERE i * 64 < octet_length(encode(text))),
          s AS (SELECT doc_id, frame_idx, off,
                  LEAST(nb - off, 64) AS fb,
                  -- byte-indexed over the BLOB's hex dump: byte k is
                  -- hex digits [2k+1, 2k+2], so the sum is unsigned
                  -- UTF-8 BYTES — matching the Spark side's semantics
                  -- for ANY content, not just ASCII (round-5 ADVICE:
                  -- ord(substr(text,..)) was char-based and agreed only
                  -- because the testdata is pure ASCII)
                  list_aggregate(list_transform(
                    range(0, CAST(LEAST(nb - off, 64) AS INTEGER)),
                    k -> ('0x' || substr(hx,
                      CAST(2 * (off + k) + 1 AS INTEGER), 2))::INT),
                    'sum') AS bsum
                FROM f),
          l AS (SELECT doc_id, frame_idx, off, fb, bsum // 1024 AS lvl,
                  lag(bsum // 1024) OVER (PARTITION BY doc_id
                    ORDER BY frame_idx) AS prev
                FROM s),
          k AS (SELECT doc_id, frame_idx, off, fb, lvl,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY frame_idx) AS krank
                FROM l WHERE prev IS NULL OR lvl != prev)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                CAST(off AS BIGINT) AS byte_offset,
                CAST(fb AS BIGINT) AS frame_bytes,
                CAST(lvl AS BIGINT) AS level,
                CAST(krank AS BIGINT) AS keep_rank
         FROM k WHERE krank <= 8 ORDER BY doc_id, frame_idx""",
    "p52_bloom_join" ->
      """SELECT p.p_brand,
                CAST(COUNT(*) AS BIGINT) AS n_items,
                CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS qty_cents
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_size < 3
         GROUP BY p.p_brand ORDER BY p.p_brand""",
    "p53_stream_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts
               FROM events
               WHERE event_type = 'purchase' AND user_id % 5 = 2),
          v0 AS (SELECT user_id, ts,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
               FROM events
               WHERE event_type = 'view' AND user_id % 5 = 2),
          v AS (SELECT user_id, ts, MAX(vc) AS view_cents
               FROM v0 GROUP BY 1, 2)
          SELECT p.event_id, p.user_id, p.ts, v.view_cents
          FROM p ASOF LEFT JOIN v
            ON p.user_id = v.user_id AND v.ts <= p.ts
          ORDER BY p.event_id""",
    "p54_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts
               FROM events WHERE event_type = 'purchase'),
          v0 AS (SELECT user_id, ts,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
               FROM events WHERE event_type = 'view'),
          v AS (SELECT user_id, ts, MAX(vc) AS view_cents
               FROM v0 GROUP BY 1, 2)
          SELECT p.event_id, p.user_id, v.view_cents,
                 CAST(date_diff('microsecond', p.ts, v.ts) // 1000000
                   AS BIGINT) AS gap_sec
          FROM p ASOF LEFT JOIN v
            ON p.user_id = v.user_id AND v.ts >= p.ts
          ORDER BY p.event_id""",
    "p55_weighted_sample" -> {
      val bucket = h60Sql(0, "doc_id::VARCHAR") + " % 1000000"
      s"""WITH a AS (SELECT source, doc_id FROM documents
               WHERE $bucket <
                     GREATEST(0, LEAST(1000000, n_chars * 3000)))
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
          FROM a GROUP BY source ORDER BY source"""
    },
    "p56_rolling_window" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
               FROM events WHERE user_id % 7 = 4)
         SELECT event_id, user_id, ts, cents,
                CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
                CAST(SUM(cents) OVER w AS BIGINT) AS roll_cents,
                CAST(MAX(cents) OVER w AS BIGINT) AS roll_max
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "p57_negative_pairs" -> {
      def b(seed: Int) = h60Sql(seed, "doc_id::VARCHAR") + " % 64"
      s"""WITH reps AS (SELECT ${b(0)} AS b, MIN(doc_id) AS neg_id
               FROM documents GROUP BY 1),
          draws AS (SELECT doc_id, ${b(1)} AS b FROM documents
               UNION ALL SELECT doc_id, ${b(2)} FROM documents
               UNION ALL SELECT doc_id, ${b(3)} FROM documents)
          SELECT DISTINCT d.doc_id, r.neg_id
          FROM draws d JOIN reps r USING (b)
          WHERE d.doc_id != r.neg_id
          ORDER BY d.doc_id, r.neg_id"""
    },
    "p58_surprisal" ->
      """WITH t AS (SELECT doc_id,
                 unnest(regexp_split_to_array(text, ' +')) AS token
               FROM documents),
          f AS (SELECT token, COUNT(*) AS tf FROM t GROUP BY 1),
          n AS (SELECT COUNT(*) AS total FROM t),
          s AS (SELECT t.doc_id,
                  length(bin((SELECT total FROM n))) -
                  length(bin(f.tf)) AS bits
                FROM t JOIN f USING (token))
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
                 CAST(SUM(bits) AS BIGINT) AS sum_bits,
                 CAST((SUM(bits) * 1000000) // COUNT(*) AS BIGINT)
                   AS mean_surprisal_ppm
          FROM s GROUP BY doc_id ORDER BY doc_id""",
    "p59_knn_join" ->
      """WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
          q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id IN (0, 100, 200, 300, 400)),
          sc AS (SELECT q.query_id, e.vec_id,
                  list_aggregate(list_transform(range(0, 64),
                    i -> e.v[i+1] * q.qv[i+1]), 'sum') /
                  (sqrt(list_aggregate(list_transform(e.v, x -> x * x),
                     'sum')) *
                   sqrt(list_aggregate(list_transform(q.qv, x -> x * x),
                     'sum'))) AS cos
                FROM e, q WHERE e.vec_id != q.query_id),
          r AS (SELECT query_id, vec_id, cos,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS rank
                FROM sc)
          SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
                 CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM r WHERE rank <= 5 ORDER BY query_id, rank""",
    "p60_ivfpq_ann" -> {
      // IVF-PQ composed: p14's sampled-IVF cell assignment (8 cells,
      // max-cosine, tie → lowest cid) + p39's integer-e4 PQ training
      // (m=8 subspaces, k=4, one Lloyd iteration) restricted to the
      // query's cell, ADC top-20 shortlist, exact cosine re-rank top-5
      def cosSql(a: String, b: String): String =
        s"""(list_aggregate(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]), 'sum') /
            (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum')) *
             sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum'))))"""
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
          asg0 AS (SELECT e.vec_id, e.v, c.cid, ${cosSql("e.v", "c.cv")} AS ccos
                   FROM e CROSS JOIN c),
          cell AS (SELECT vec_id, v, cid AS cell FROM (
                     SELECT vec_id, v, cid, ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                     FROM asg0) WHERE rn = 1),
          q AS (SELECT v AS qv, cell AS qcell FROM cell WHERE vec_id = 100),
          qe AS (SELECT vec_id AS id, i // 8 AS sub, i % 8 AS spos,
                   CAST(floor(v[i+1] * 10000) AS BIGINT) AS val
                 FROM e, range(0, 64) t(i)),
          c0 AS (SELECT id AS cid, sub, spos, val FROM qe WHERE id < 4),
          d1 AS (SELECT qe.id, qe.sub, c0.cid,
                   CAST(SUM((qe.val - c0.val) * (qe.val - c0.val)) AS BIGINT)
                     AS dist
                 FROM qe JOIN c0 ON qe.sub = c0.sub AND qe.spos = c0.spos
                 GROUP BY 1, 2, 3),
          a1 AS (SELECT id, sub, cid FROM (
                   SELECT id, sub, cid, ROW_NUMBER() OVER (
                     PARTITION BY id, sub ORDER BY dist, cid) AS rn
                   FROM d1) WHERE rn = 1),
          c1 AS (SELECT a1.sub, a1.cid, qe.spos,
                   CAST(SUM(qe.val) AS BIGINT) // COUNT(*) AS val
                 FROM a1 JOIN qe ON a1.id = qe.id AND a1.sub = qe.sub
                 GROUP BY 1, 2, 3),
          d2 AS (SELECT qe.id, qe.sub, c1.cid,
                   CAST(SUM((qe.val - c1.val) * (qe.val - c1.val)) AS BIGINT)
                     AS dist
                 FROM qe JOIN c1 ON qe.sub = c1.sub AND qe.spos = c1.spos
                 GROUP BY 1, 2, 3),
          a2 AS (SELECT id, sub, cid FROM (
                   SELECT id, sub, cid, ROW_NUMBER() OVER (
                     PARTITION BY id, sub ORDER BY dist, cid) AS rn
                   FROM d2) WHERE rn = 1),
          dt AS (SELECT c1.sub, c1.cid,
                   CAST(SUM((qq.val - c1.val) * (qq.val - c1.val)) AS BIGINT)
                     AS dist
                 FROM (SELECT sub, spos, val FROM qe WHERE id = 100) qq
                 JOIN c1 ON qq.sub = c1.sub AND qq.spos = c1.spos
                 GROUP BY 1, 2),
          adc AS (SELECT a2.id, CAST(SUM(dt.dist) AS BIGINT) AS adc_dist
                  FROM a2 JOIN dt ON a2.sub = dt.sub AND a2.cid = dt.cid
                  GROUP BY a2.id),
          short AS (SELECT cm.vec_id, cm.v, adc.adc_dist,
                      ROW_NUMBER() OVER (ORDER BY adc.adc_dist, cm.vec_id)
                        AS rn
                    FROM cell cm JOIN adc ON adc.id = cm.vec_id
                    JOIN q ON cm.cell = q.qcell
                    WHERE cm.vec_id != 100),
          rr AS (SELECT s.vec_id, s.adc_dist, ${cosSql("s.v", "q.qv")} AS cos
                 FROM short s, q WHERE s.rn <= 20)
          SELECT vec_id, adc_dist,
                 CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM rr ORDER BY cos DESC, vec_id ASC LIMIT 5"""
    },
    "p61_stream_left_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase' AND user_id % 5 = 3),
          v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view' AND user_id % 5 = 3)
         SELECT p.event_id AS purchase_id, v.event_id AS view_id,
                p.user_id, p.ts AS p_ts, v.ts AS v_ts
         FROM p LEFT JOIN v
           ON p.user_id = v.user_id
          AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 24 HOUR
         ORDER BY purchase_id, view_id NULLS FIRST""",
    "p62_cms_heavy_hitters" ->
      s"""WITH $toksCte,
          tok AS (SELECT unnest(toks) AS token FROM t),
          occ AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
                  FROM tok WHERE token <> '' GROUP BY token),
          sb AS (SELECT o.token, o.exact_cnt, s.seed,
                   ${Hashing.h60Sql(
                     "CAST(s.seed AS VARCHAR)||':'||o.token")} % 32 AS bucket
                 FROM occ o CROSS JOIN range(0, 3) s(seed)),
          counters AS (SELECT seed, bucket,
                         CAST(SUM(exact_cnt) AS BIGINT) AS cnt
                       FROM sb GROUP BY 1, 2),
          est AS (SELECT token, CAST(MIN(cnt) AS BIGINT) AS est_cnt
                  FROM sb JOIN counters USING (seed, bucket)
                  GROUP BY token)
          SELECT o.token, o.exact_cnt, e.est_cnt
          FROM occ o JOIN est e USING (token)
          WHERE e.est_cnt >= 1500 ORDER BY o.token""",
    "p63_token_budget" ->
      s"""WITH d0 AS (SELECT doc_id, source,
                 CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
                   AS n_tokens,
                 ${Hashing.h60Sql(11, "CAST(doc_id AS VARCHAR)")} AS h
               FROM documents),
          c AS (SELECT doc_id, source, n_tokens,
                  CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
                FROM d0)
          SELECT source, doc_id, n_tokens, cum_tokens FROM c
          WHERE cum_tokens <= 600 ORDER BY source, cum_tokens""",
    "p64_shuffle_shard" ->
      s"""WITH d0 AS (SELECT doc_id,
                 ${Hashing.h60Sql(7, "CAST(doc_id AS VARCHAR)")} AS h
               FROM documents)
          SELECT CAST(h % 8 AS INT) AS shard,
                 CAST(ROW_NUMBER() OVER (PARTITION BY h % 8
                   ORDER BY h, doc_id) AS INT) AS shard_pos,
                 doc_id
          FROM d0 ORDER BY shard, shard_pos""",
    "p65_stream_kmv" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
                       ${h60Sql("CAST(user_id AS VARCHAR)")} AS h
                     FROM events),
          r AS (SELECT event_type, h,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY h) AS rn
                FROM h)
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_min,
                 MAX(h) AS hk,
                 CAST(CASE WHEN COUNT(*) < 16 THEN COUNT(*)
                      ELSE 15 * (1152921504606846976 // MAX(h)) +
                           (15 * (1152921504606846976 % MAX(h))) // MAX(h)
                      END AS BIGINT) AS est_distinct
          FROM r WHERE rn <= 16 GROUP BY event_type ORDER BY event_type""",
    "p66_hashed_classifier" -> {
      val bucket = h60Sql("'3:'||tk") + " % 64"
      val weight =
        h60Sql(s"'wt:'||CAST($bucket AS VARCHAR)") + " % 1000001 - 500000"
      s"""WITH $toksCte,
          m AS (SELECT doc_id,
                  CAST(COALESCE(list_aggregate(
                    list_transform(toks, tk -> $weight), 'sum'), 0)
                    AS BIGINT) AS margin
                FROM t)
          SELECT doc_id, margin, margin >= 0 AS keep
          FROM m ORDER BY doc_id"""
    },
    "p67_decayed_sum" ->
      """WITH e AS (SELECT user_id, ts,
                 epoch_us(ts) // 1000000 AS sec,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
               FROM events WHERE user_id % 9 = 2),
          m AS (SELECT user_id, MAX(ts) AS t_ref, MAX(sec) AS smax
                FROM e GROUP BY 1)
          SELECT e.user_id, m.t_ref,
                 CAST(SUM(e.cents >>
                   LEAST((m.smax - e.sec) // 86400, 63)) AS BIGINT)
                   AS decayed_cents,
                 CAST(SUM(CAST(1 AS BIGINT) >>
                   LEAST((m.smax - e.sec) // 86400, 63)) AS BIGINT)
                   AS decayed_n
          FROM e JOIN m USING (user_id)
          GROUP BY e.user_id, m.t_ref ORDER BY user_id""",
    "p68_temperature_mix" ->
      s"""WITH d0 AS (SELECT doc_id,
                  CASE WHEN CAST(substr(source, 4) AS INT) < 10
                       THEN 'head' ELSE source END AS src_t
               FROM documents),
          c AS (SELECT src_t, COUNT(*) AS n_source,
                  GREATEST(1, CAST(FLOOR(sqrt(COUNT(*))) AS BIGINT))
                    AS weight
               FROM d0 GROUP BY src_t),
          c2 AS (SELECT *, CAST((SELECT SUM(weight) FROM c) AS BIGINT)
                   AS W FROM c),
          c3 AS (SELECT *,
                   MIN((n_source * W) // weight) OVER () AS T FROM c2),
          q AS (SELECT src_t, n_source, weight,
                   (((weight * T) // W) * 1000000) // n_source AS keep_ppm
                FROM c3),
          k AS (SELECT d.src_t,
                   SUM(CASE WHEN ${h60Sql(0, "CAST(d.doc_id AS VARCHAR)")}
                     % 1000000 < q.keep_ppm THEN 1 ELSE 0 END) AS n_kept
                FROM d0 d JOIN q ON d.src_t = q.src_t
                GROUP BY d.src_t)
          SELECT q.src_t, q.n_source, q.weight,
                 CAST(q.keep_ppm AS BIGINT) AS keep_ppm,
                 CAST(k.n_kept AS BIGINT) AS n_kept
          FROM q JOIN k ON q.src_t = k.src_t
          ORDER BY q.src_t""",
    "p69_stream_cc" ->
      """WITH RECURSIVE
          e AS (SELECT user_id AS i, 1000000 + event_id % 100 AS j
                FROM events WHERE user_id % 4 = 1),
          nodes AS (SELECT DISTINCT i AS node FROM e
                    UNION SELECT DISTINCT j FROM e),
          sym AS (SELECT i AS a, j AS b FROM e
                  UNION SELECT j, i FROM e),
          reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node)
          SELECT node, MIN(lbl) AS cluster,
                 MIN(lbl) = node AS is_keeper
          FROM reach GROUP BY node ORDER BY node""",
    "p70_batch_mix" ->
      s"""WITH m AS (SELECT doc_id AS id, 'text' AS modality
                     FROM documents
                     UNION ALL
                     SELECT vec_id + 10000000, 'embed' FROM embeddings),
          r AS (SELECT id, modality,
                  CASE modality WHEN 'text' THEN 3 ELSE 1 END AS q,
                  CASE modality WHEN 'text' THEN 0 ELSE 3 END AS off,
                  ROW_NUMBER() OVER (PARTITION BY modality
                    ORDER BY ${h60Sql(5, "CAST(id AS VARCHAR)")}, id) - 1
                    AS rk
                FROM m),
          lim AS (SELECT MIN(cnt // q) AS B FROM
                    (SELECT modality, COUNT(*) AS cnt,
                       CASE modality WHEN 'text' THEN 3 ELSE 1 END AS q
                     FROM m GROUP BY modality)),
          b AS (SELECT id, modality, rk // q AS batch,
                       off + rk % q AS slot
                FROM r)
          SELECT CAST(batch AS BIGINT) AS batch,
                 CAST(slot AS BIGINT) AS slot, modality, id
          FROM b WHERE batch < (SELECT B FROM lim)
          ORDER BY batch, slot""",
    "p71_interval_join" ->
      """WITH e AS (SELECT event_id, ts, event_type FROM events
                    WHERE user_id % 7 = 0),
          i AS (SELECT event_id AS interval_id, ts AS start_ts,
                       ts + INTERVAL 2 HOUR AS end_ts
                FROM e WHERE event_type = 'purchase')
          SELECT i.interval_id, e.event_id, e.ts
          FROM e JOIN i
            ON e.ts >= i.start_ts AND e.ts < i.end_ts
          ORDER BY interval_id, event_id""",
    // the optimizer-rule rewrite of the naive join must land on the
    // same rows the declarative range join computes
    "p83_rule_range_join" ->
      """WITH e AS (SELECT event_id, ts, event_type FROM events
                    WHERE user_id % 7 = 1),
          i AS (SELECT event_id AS interval_id, ts AS start_ts,
                       ts + INTERVAL 2 HOUR AS end_ts
                FROM e WHERE event_type = 'purchase')
          SELECT i.interval_id, e.event_id, e.ts
          FROM e JOIN i
            ON e.ts >= i.start_ts AND e.ts < i.end_ts
          ORDER BY interval_id, event_id""",
    "p87_stream_dedup_native" ->
      """SELECT DISTINCT user_id % 50 AS ukey, event_type FROM events
         ORDER BY ukey, event_type""",
    "p88_hist_drift" ->
      """WITH h AS (SELECT source, n_chars // 50 AS bin, COUNT(*) AS cnt
                    FROM documents WHERE source IN ('src0', 'src1')
                    GROUP BY 1, 2),
          a AS (SELECT bin, cnt FROM h WHERE source = 'src0'),
          b AS (SELECT bin, cnt FROM h WHERE source = 'src1'),
          j AS (SELECT COALESCE(a.bin, b.bin) AS bin,
                       COALESCE(a.cnt, 0) AS cnt_a,
                       COALESCE(b.cnt, 0) AS cnt_b
                FROM a FULL JOIN b ON a.bin = b.bin),
          c AS (SELECT bin, cnt_a, cnt_b,
                       SUM(cnt_a) OVER (ORDER BY bin) AS cum_a,
                       SUM(cnt_b) OVER (ORDER BY bin) AS cum_b,
                       SUM(cnt_a) OVER () AS n_a,
                       SUM(cnt_b) OVER () AS n_b
                FROM j)
          SELECT bin, cnt_a, cnt_b,
                 CAST(abs(cum_a * n_b - cum_b * n_a) * 1000000
                   // (n_a * n_b) AS BIGINT) AS gap_ppm
          FROM c ORDER BY bin""",
    "p92_dedup_provenance" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j
                    FROM cand JOIN shh sa ON sa.doc_id = i
                              JOIN shh sb ON sb.doc_id = j
                    WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                          * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
          lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster
                  FROM reach GROUP BY node),
          fam AS (SELECT cluster FROM lab GROUP BY cluster
                  HAVING COUNT(*) >= 2),
          mem AS (SELECT l.cluster, l.doc_id, d.source
                  FROM lab l JOIN documents d USING (doc_id)
                             JOIN fam USING (cluster)),
          agg AS (SELECT cluster, MIN(doc_id) AS keeper,
                         CAST(COUNT(*) AS BIGINT) AS n_members,
                         array_to_string(list(doc_id ORDER BY doc_id), ',')
                           AS members
                  FROM mem GROUP BY cluster),
          srcs AS (SELECT cluster,
                          array_to_string(list(source ORDER BY source), ',')
                            AS sources
                   FROM (SELECT DISTINCT cluster, source FROM mem)
                   GROUP BY cluster)
          SELECT agg.cluster, keeper, n_members, members, sources
          FROM agg JOIN srcs USING (cluster) ORDER BY agg.cluster""",
    "p93_winsorized_stats" ->
      """WITH r AS (SELECT source, n_chars, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS cnt
               FROM documents),
          b AS (SELECT source,
                 MAX(CASE WHEN rn = (cnt - 1) * 5 // 100 + 1
                     THEN n_chars END) AS lo,
                 MAX(CASE WHEN rn = (cnt - 1) * 95 // 100 + 1
                     THEN n_chars END) AS hi
               FROM r GROUP BY source)
          SELECT r.source, CAST(MAX(cnt) AS BIGINT) AS n_rows,
                 CAST(MAX(lo) AS BIGINT) AS lo_n_chars,
                 CAST(MAX(hi) AS BIGINT) AS hi_n_chars,
                 CAST(SUM(GREATEST(lo, LEAST(hi, n_chars))) AS BIGINT)
                   AS wsum_n_chars,
                 CAST(SUM(GREATEST(lo, LEAST(hi, n_chars))) * 1000000
                   // MAX(cnt) AS BIGINT) AS wmean_ppm
          FROM r JOIN b USING (source) GROUP BY r.source
          ORDER BY r.source""",
    "p94_length_buckets" ->
      """WITH q AS (SELECT GREATEST((n_chars + 63) // 64, 1) AS q, n_chars
                    FROM documents),
          b AS (SELECT CASE WHEN q <= 1 THEN 64
                            ELSE 64 << length(bin(q - 1)) END AS bucket,
                       n_chars
                FROM q)
          SELECT CAST(bucket AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_len,
                 CAST(bucket * COUNT(*) AS BIGINT) AS capacity,
                 CAST((bucket * COUNT(*) - SUM(n_chars)) * 1000000
                   // (bucket * COUNT(*)) AS BIGINT) AS waste_ppm
          FROM b GROUP BY bucket ORDER BY bucket""",
    "p95_strip_boilerplate" ->
      """WITH t AS (SELECT doc_id, source,
                 regexp_split_to_array(text, ' +') AS toks FROM documents),
          tok AS (SELECT doc_id, source,
                   generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
                  FROM t),
          sd AS (SELECT source, COUNT(DISTINCT doc_id) AS src_docs
                 FROM documents GROUP BY source),
          dfs AS (SELECT source, tok, COUNT(DISTINCT doc_id) AS tok_docs
                  FROM tok GROUP BY source, tok),
          bp AS (SELECT dfs.source, tok FROM dfs JOIN sd USING (source)
                 WHERE tok_docs * 1000000 // src_docs >= 600000),
          kept AS (SELECT k.doc_id, k.pos, k.tok FROM tok k
                   LEFT JOIN bp ON k.source = bp.source AND k.tok = bp.tok
                   WHERE bp.tok IS NULL),
          reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
                         CAST(COUNT(*) AS BIGINT) AS n_kept
                  FROM kept GROUP BY doc_id)
          SELECT d.doc_id, d.source, COALESCE(reb.text, '') AS text,
                 COALESCE(reb.n_kept, 0) AS n_kept
          FROM documents d LEFT JOIN reb USING (doc_id)
          ORDER BY d.doc_id""",
    "p96_oph_dedup" -> {
      val mod = Dedup.MinhashMod
      val bands = (0 until 4).map { b =>
        val parts = (0 until 4).map(r => s"sig[${4 * b + r + 1}]::VARCHAR")
          .mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, ${h60Sql(parts)} AS bsig FROM dens"
      }.mkString(" UNION ALL ")
      s"""WITH $shinglesCte,
          shh AS (SELECT doc_id, list_distinct(list_transform(sh,
                    s -> ${h60Sql("s")} % $mod)) AS sh FROM sh),
          bins AS (SELECT doc_id, list_transform(range(0, 16),
                     b -> list_min(list_filter(sh, h -> h % 16 = b))) AS vals
                   FROM shh WHERE len(sh) > 0),
          dens AS (SELECT doc_id, list_transform(range(0, 16), b ->
                     vals[((b + list_filter(range(0, 16),
                       o -> vals[((b + o) % 16) + 1] IS NOT NULL)[1]) % 16) + 1]
                     + list_filter(range(0, 16),
                       o -> vals[((b + o) % 16) + 1] IS NOT NULL)[1] * $mod)
                     AS sig
                   FROM bins),
          bands AS ($bands),
          cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.bsig = b.bsig
                        AND a.doc_id < b.doc_id)
          SELECT i, j,
                 CAST(len(sa.sh) AS BIGINT) AS na,
                 CAST(len(sb.sh) AS BIGINT) AS nb,
                 CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
                 CAST(len(sa.sh) + len(sb.sh)
                   - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS uni,
                 CAST(floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                   (len(sa.sh) + len(sb.sh)
                    - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                   * 1000000.0) AS BIGINT) AS jaccard_ppm
          FROM cand JOIN shh sa ON sa.doc_id = i
                    JOIN shh sb ON sb.doc_id = j
          WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                (len(sa.sh) + len(sb.sh)
                 - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                * 1000000.0) >= 800000
          ORDER BY i, j"""
    },
    "p141_key_uniqueness" ->
      """WITH a AS (SELECT l_orderkey, COUNT(*) AS c FROM lineitem
                    GROUP BY l_orderkey),
          b AS (SELECT l_orderkey, l_linenumber, COUNT(*) AS c
                FROM lineitem GROUP BY l_orderkey, l_linenumber)
          SELECT * FROM (
            SELECT 'orderkey' AS key_set,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS dup_keys,
                   CAST(MAX(c) AS BIGINT) AS max_multiplicity
            FROM a
            UNION ALL
            SELECT 'orderkey_linenumber',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(MAX(c) AS BIGINT)
            FROM b)
          ORDER BY key_set""",
    "p142_referential_integrity" ->
      """SELECT * FROM (
           SELECT 'lineitem.l_orderkey->orders' AS fk,
                  CAST(COUNT(*) AS BIGINT) AS orphan_rows,
                  CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT)
                    AS orphan_keys
           FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL
           UNION ALL
           SELECT 'orders.o_custkey->customer',
                  CAST(COUNT(*) AS BIGINT),
                  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
           FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey
           WHERE c.c_custkey IS NULL
           UNION ALL
           SELECT 'customer.c_nationkey->nation',
                  CAST(COUNT(*) AS BIGINT),
                  CAST(COUNT(DISTINCT cu.c_nationkey) AS BIGINT)
           FROM customer cu LEFT JOIN nation n
             ON cu.c_nationkey = n.n_nationkey
           WHERE n.n_nationkey IS NULL)
         ORDER BY fk""",
    "p140_overlap_at_k" -> {
      val stops = stopList(langs.head._2)
      s"""WITH $toksCte,
          s AS (SELECT doc_id, toks, list_distinct(toks) AS dt,
                 len(toks) AS n_tokens FROM t),
          q AS (SELECT doc_id,
                 CAST(floor(((LEAST(n_tokens, 200)::DOUBLE / 200.0) * 0.5 +
                   (len(list_intersect(dt, $stops))::DOUBLE
                    / len(dt)::DOUBLE) * 0.5) * 1000000.0) AS BIGINT)
                   AS quality_ppm
                FROM s),
          tt AS (SELECT doc_id, unnest(toks) AS token FROM t),
          f AS (SELECT token, COUNT(*) AS tf FROM tt GROUP BY 1),
          n AS (SELECT COUNT(*) AS total FROM tt),
          sb AS (SELECT tt.doc_id,
                  length(bin((SELECT total FROM n))) -
                  length(bin(f.tf)) AS bits
                 FROM tt JOIN f USING (token)),
          sur AS (SELECT doc_id,
                   CAST((SUM(bits) * 1000000) // COUNT(*) AS BIGINT)
                     AS mean_surprisal_ppm
                  FROM sb GROUP BY doc_id),
          r AS (SELECT q.doc_id,
                 ROW_NUMBER() OVER (ORDER BY quality_ppm DESC, q.doc_id)
                   AS ra,
                 ROW_NUMBER() OVER (ORDER BY mean_surprisal_ppm ASC,
                   q.doc_id) AS rb
                FROM q JOIN sur ON q.doc_id = sur.doc_id),
          ks AS (SELECT unnest([10, 25, 50]) AS k)
          SELECT CAST(ks.k AS BIGINT) AS k,
                 CAST(SUM(CASE WHEN ra <= ks.k AND rb <= ks.k
                   THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
                 CAST(SUM(CASE WHEN ra <= ks.k AND rb <= ks.k
                   THEN 1 ELSE 0 END) * 1000000 // ks.k AS BIGINT)
                   AS overlap_ppm
          FROM r CROSS JOIN ks GROUP BY ks.k ORDER BY k"""
    },
    "p138_pair_divergence" ->
      s"""WITH $minhashCtes,
          pj AS (SELECT i, j,
                  CAST(floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                    (len(sa.sh) + len(sb.sh)
                     - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                    * 1000000.0) AS BIGINT) AS jaccard_ppm
                 FROM cand JOIN shh sa ON sa.doc_id = i
                           JOIN shh sb ON sb.doc_id = j
                 WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                       (len(sa.sh) + len(sb.sh)
                        - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                       * 1000000.0) >= 800000)
          SELECT pj.i, pj.j, pj.jaccard_ppm,
                 CAST(len(ta.toks) AS BIGINT) AS len_a,
                 CAST(len(tb.toks) AS BIGINT) AS len_b,
                 CAST(COALESCE(list_position(
                   list_transform(range(1,
                     LEAST(len(ta.toks), len(tb.toks)) + 1),
                     k -> ta.toks[k] != tb.toks[k]), true), 0) - 1
                   AS BIGINT) AS first_diff
          FROM pj JOIN t ta ON ta.doc_id = pj.i
                  JOIN t tb ON tb.doc_id = pj.j
          ORDER BY pj.i, pj.j""",
    "p139_effective_sample_size" -> {
      val stops = stopList(langs.head._2)
      s"""WITH $toksCte,
          s AS (SELECT doc_id, toks, list_distinct(toks) AS dt,
                 len(toks) AS n_tokens FROM t),
          q AS (SELECT doc_id,
                 CAST(floor(((LEAST(n_tokens, 200)::DOUBLE / 200.0) * 0.5 +
                   (len(list_intersect(dt, $stops))::DOUBLE
                    / len(dt)::DOUBLE) * 0.5) * 1000000.0) AS BIGINT)
                   AS quality_ppm
                FROM s),
          w AS (SELECT d.source, q.quality_ppm // 1000 AS w
                FROM documents d JOIN q USING (doc_id))
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(w) AS BIGINT) AS sum_w,
                 CAST(SUM(w) * SUM(w) * 1000000
                   // (COUNT(*) * SUM(w * w)) AS BIGINT) AS ess_ppm
          FROM w GROUP BY source ORDER BY source"""
    },
    "p135_collocations" ->
      s"""WITH $toksCte,
          bg AS (SELECT
                  unnest(list_transform(range(0, GREATEST(len(toks) - 1, 0)),
                    i -> toks[i + 1])) AS x,
                  unnest(list_transform(range(0, GREATEST(len(toks) - 1, 0)),
                    i -> toks[i + 2])) AS y
                 FROM t),
          n AS (SELECT COUNT(*) AS total FROM bg),
          cx AS (SELECT x, COUNT(*) AS cx FROM bg GROUP BY x),
          cy AS (SELECT y, COUNT(*) AS cy FROM bg GROUP BY y),
          cxy AS (SELECT x, y, COUNT(*) AS cxy FROM bg GROUP BY x, y
                  HAVING COUNT(*) >= 20)
          SELECT cxy.x, cxy.y, CAST(cxy.cxy AS BIGINT) AS cxy,
                 CAST(cxy.cxy * (SELECT total FROM n) * 1000000
                   // (cx.cx * cy.cy) AS BIGINT) AS pmi_ratio_ppm
          FROM cxy JOIN cx ON cxy.x = cx.x JOIN cy ON cxy.y = cy.y
          ORDER BY pmi_ratio_ppm DESC, cxy.x, cxy.y LIMIT 50""",
    "p136_oov_rate" ->
      s"""WITH $toksCte,
          f AS (SELECT tok AS token, COUNT(*) AS tf
                FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
          r AS (SELECT token, tf,
                 SUM(tf) OVER (ORDER BY tf DESC, token ASC) AS cum,
                 SUM(tf) OVER () AS total
                FROM f),
          v AS (SELECT token FROM r
                WHERE (cum - tf) * 1000000 // total < 900000),
          tok AS (SELECT doc_id, unnest(toks) AS token FROM t)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_oov,
                 CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                   * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
          FROM tok LEFT JOIN v USING (token)
          GROUP BY doc_id ORDER BY doc_id""",
    "p137_vocab_growth" ->
      s"""WITH $shinglesCte,
          b AS (SELECT doc_id % 10 AS batch, ${h60Sql("shingle")} AS h
                FROM e),
          f AS (SELECT h, MIN(batch) AS fb FROM b GROUP BY h),
          pb AS (SELECT fb AS first_batch, COUNT(*) AS new_shingles
                 FROM f GROUP BY fb)
          SELECT CAST(first_batch AS BIGINT) AS first_batch,
                 CAST(new_shingles AS BIGINT) AS new_shingles,
                 CAST(SUM(new_shingles) OVER (ORDER BY first_batch)
                   AS BIGINT) AS vocab_size
          FROM pb ORDER BY first_batch""",
    "p133_medoid_keeper" ->
      s"""WITH RECURSIVE $minhashCtes,
          pj AS (SELECT i, j,
                  CAST(floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                    (len(sa.sh) + len(sb.sh)
                     - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                    * 1000000.0) AS BIGINT) AS jp
                 FROM cand JOIN shh sa ON sa.doc_id = i
                           JOIN shh sb ON sb.doc_id = j
                 WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                       (len(sa.sh) + len(sb.sh)
                        - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                       * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pj
                  UNION ALL SELECT j, i FROM pj),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
          lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster
                  FROM reach GROUP BY node),
          inc AS (SELECT i AS doc_id, jp FROM pj
                  UNION ALL SELECT j, jp FROM pj),
          ss AS (SELECT doc_id, SUM(jp) AS sim_sum FROM inc
                 GROUP BY doc_id),
          m AS (SELECT lab.cluster, ss.doc_id, ss.sim_sum,
                 ROW_NUMBER() OVER (PARTITION BY lab.cluster
                   ORDER BY ss.sim_sum DESC, ss.doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY lab.cluster) AS n_members
                FROM lab JOIN ss USING (doc_id))
          SELECT cluster, doc_id AS medoid,
                 CAST(sim_sum AS BIGINT) AS sim_sum,
                 CAST(n_members AS BIGINT) AS n_members
          FROM m WHERE rn = 1 ORDER BY cluster""",
    "p134_pii_by_source" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
      s"""WITH t AS (
            SELECT c_mktsegment,
                   c_mktsegment || ' reach ' || lower(c_name) ||
                     '@example.com or ' ||
                     lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
                     lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') ||
                     ' id ' ||
                     lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
                     lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
                     lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS text
            FROM customer),
          c AS (SELECT c_mktsegment,
                 len(regexp_extract_all(text, '$email')) AS ne,
                 len(regexp_extract_all(text, '$phone')) AS np,
                 len(regexp_extract_all(text, '$ssn')) AS ns
                FROM t)
          SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(ne) AS BIGINT) AS emails,
                 CAST(SUM(np) AS BIGINT) AS phones,
                 CAST(SUM(ns) AS BIGINT) AS ssns,
                 CAST(SUM(CASE WHEN ne + np + ns > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS docs_with_pii
          FROM c GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    },
    "p132_semantic_decontam" ->
      """WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS v, label
               FROM embeddings),
          r AS (SELECT vec_id AS rid, v AS rv FROM v WHERE label = 0),
          c AS (SELECT vec_id, v FROM v WHERE label != 0),
          sc AS (SELECT c.vec_id, r.rid,
                  CAST(floor(
                    list_aggregate(list_transform(range(0, 64),
                      i -> c.v[i+1] * r.rv[i+1]), 'sum') /
                    (sqrt(list_aggregate(list_transform(c.v,
                       x -> x * x), 'sum')) *
                     sqrt(list_aggregate(list_transform(r.rv,
                       x -> x * x), 'sum'))) * 1000000.0) AS BIGINT)
                    AS cos_ppm
                 FROM c, r),
          b AS (SELECT vec_id, cos_ppm, rid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cos_ppm DESC, rid ASC) AS rn
                FROM sc)
          SELECT vec_id, cos_ppm, CAST(rid AS BIGINT) AS ref_id
          FROM b WHERE rn = 1 AND cos_ppm >= 450000
          ORDER BY vec_id""",
    "p131_estimator_audit" -> {
      val matches = (0 until 16)
        .map(k => s"CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $minhashCtes,
          ver AS (SELECT i, j,
                   CAST(floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                     (len(sa.sh) + len(sb.sh)
                      - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                     * 1000000.0) AS BIGINT) AS jaccard_ppm
                  FROM cand JOIN shh sa ON sa.doc_id = i
                            JOIN shh sb ON sb.doc_id = j
                  WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                        (len(sa.sh) + len(sb.sh)
                         - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                        * 1000000.0) >= 800000)
          SELECT ver.i, ver.j, ver.jaccard_ppm,
                 CAST(($matches) * 62500 AS BIGINT) AS est_ppm,
                 CAST(($matches) * 62500 - ver.jaccard_ppm AS BIGINT)
                   AS err_ppm
          FROM ver JOIN mh a ON a.doc_id = ver.i
                   JOIN mh b ON b.doc_id = ver.j
          ORDER BY ver.i, ver.j"""
    },
    "p128_lang_confusion" -> {
      val scores = langs.map { case (l, ws) =>
        s"len(list_intersect(dt, ${stopList(ws)})) AS score_$l"
      }.mkString(", ")
      val best = langs.map { case (l, _) => s"score_$l" }
        .mkString("GREATEST(", ", ", ")")
      val pick = langs.map { case (l, _) =>
        s"WHEN score_$l = $best THEN '$l'" }.mkString(" ")
      s"""WITH $toksCte,
          s AS (SELECT doc_id, list_distinct(toks) AS dt FROM t),
          sc AS (SELECT doc_id, $scores FROM s),
          pr AS (SELECT doc_id,
                  CASE WHEN $best = 0 THEN 'unknown' $pick
                       ELSE 'unknown' END AS lang_pred
                 FROM sc),
          c AS (SELECT d.lang, pr.lang_pred, COUNT(*) AS n
                FROM documents d JOIN pr USING (doc_id)
                GROUP BY 1, 2)
          SELECT lang, lang_pred, CAST(n AS BIGINT) AS n,
                 CAST(n * 1000000
                   // (SUM(n) OVER (PARTITION BY lang)) AS BIGINT)
                   AS row_ppm
          FROM c ORDER BY lang, lang_pred"""
    },
    "p129_vocab_overlap" ->
      s"""WITH v AS (SELECT source,
                 list_distinct(flatten(list(
                   regexp_split_to_array(text, ' +')))) AS toks
               FROM documents GROUP BY source)
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
                   AS inter,
                 CAST(len(a.toks) + len(b.toks)
                   - len(list_intersect(a.toks, b.toks)) AS BIGINT)
                   AS uni,
                 CAST(len(list_intersect(a.toks, b.toks)) * 1000000
                   // (len(a.toks) + len(b.toks)
                      - len(list_intersect(a.toks, b.toks))) AS BIGINT)
                   AS jaccard_ppm
          FROM v a JOIN v b ON a.source < b.source
          ORDER BY src_a, src_b""",
    "p130_rank_correlation" -> {
      val stops = stopList(langs.head._2)
      s"""WITH $toksCte,
          s AS (SELECT doc_id, toks, list_distinct(toks) AS dt,
                 len(toks) AS n_tokens FROM t),
          q AS (SELECT doc_id,
                 CAST(floor(((LEAST(n_tokens, 200)::DOUBLE / 200.0) * 0.5 +
                   (len(list_intersect(dt, $stops))::DOUBLE
                    / len(dt)::DOUBLE) * 0.5) * 1000000.0) AS BIGINT)
                   AS quality_ppm
                FROM s),
          j AS (SELECT d.doc_id, d.source, d.n_chars, q.quality_ppm
                FROM documents d JOIN q USING (doc_id)),
          r AS (SELECT source,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS r_len,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY quality_ppm, doc_id) AS r_q
                FROM j)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((r_len - r_q) * (r_len - r_q)) AS BIGINT)
                   AS sum_d2,
                 CAST(1000000 - 6 * SUM((r_len - r_q) * (r_len - r_q))
                   * 1000000 // (COUNT(*) *
                     (COUNT(*) * COUNT(*) - 1)) AS BIGINT) AS rho_ppm
          FROM r GROUP BY source ORDER BY source"""
    },
    "p127_trailing_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                     FROM events),
          c AS (SELECT user_id,
                 unnest(list_transform(range(0, 7), i -> day + i::INT))
                   AS report_day
                FROM ud),
          rd AS (SELECT DISTINCT day AS report_day FROM ud)
          SELECT c.report_day,
                 CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
          FROM c JOIN rd USING (report_day)
          GROUP BY c.report_day ORDER BY c.report_day""",
    "p124_event_transitions" ->
      """WITH tr AS (SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS next_type
               FROM events),
          c AS (SELECT from_type, next_type, COUNT(*) AS n FROM tr
                WHERE next_type IS NOT NULL GROUP BY 1, 2)
          SELECT from_type, next_type, CAST(n AS BIGINT) AS n,
                 CAST(n * 1000000
                   // (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT)
                   AS row_ppm
          FROM c ORDER BY from_type, next_type""",
    "p125_dwell_quantiles" ->
      """WITH g AS (SELECT event_type, event_id,
                 (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id)) - epoch_us(ts)) // 1000000
                   AS gap_sec
               FROM events),
          gg AS (SELECT * FROM g WHERE gap_sec IS NOT NULL),
          r AS (SELECT event_type, gap_sec,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY gap_sec, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS cnt
                FROM gg)
          SELECT event_type, CAST(MAX(cnt) AS BIGINT) AS n_rows,
                 CAST(MIN(gap_sec) AS BIGINT) AS min_gap_sec,
                 CAST(MAX(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1
                   THEN gap_sec END) AS BIGINT) AS p50_gap_sec,
                 CAST(MAX(CASE WHEN rn = (cnt - 1) * 90 // 100 + 1
                   THEN gap_sec END) AS BIGINT) AS p90_gap_sec,
                 CAST(MAX(CASE WHEN rn = (cnt - 1) * 99 // 100 + 1
                   THEN gap_sec END) AS BIGINT) AS p99_gap_sec,
                 CAST(MAX(gap_sec) AS BIGINT) AS max_gap_sec
          FROM r GROUP BY event_type ORDER BY event_type""",
    "p126_burst_detect" ->
      """WITH pm AS (SELECT date_trunc('minute', ts) AS minute,
                 COUNT(*) AS n
               FROM events GROUP BY 1),
          b AS (SELECT epoch_us(minute) AS mid, CAST(n AS BIGINT) AS n
                FROM pm),
          r1 AS (SELECT mid, n,
                  ROW_NUMBER() OVER (ORDER BY n, mid) AS rn,
                  COUNT(*) OVER () AS cnt
                 FROM b),
          m AS (SELECT MAX(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1
                  THEN n END) AS med
                FROM r1),
          dv AS (SELECT b.mid, b.n, m.med, abs(b.n - m.med) AS absdev
                 FROM b, m),
          r2 AS (SELECT mid, absdev,
                  ROW_NUMBER() OVER (ORDER BY absdev, mid) AS rn,
                  COUNT(*) OVER () AS cnt
                 FROM dv),
          md AS (SELECT MAX(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1
                   THEN absdev END) AS mad
                 FROM r2)
          SELECT dv.mid, dv.n, CAST(dv.med AS BIGINT) AS med,
                 CAST(md.mad AS BIGINT) AS mad,
                 dv.absdev > md.mad * 3 AS is_outlier
          FROM dv, md ORDER BY dv.mid""",
    "p121_mad_outliers" ->
      """WITH b AS (SELECT doc_id, source, n_chars FROM documents),
          r1 AS (SELECT source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars, doc_id) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS cnt
                 FROM b),
          m AS (SELECT source, MAX(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1
                   THEN n_chars END) AS med
                FROM r1 GROUP BY source),
          dv AS (SELECT b.doc_id, b.source, b.n_chars, m.med,
                  abs(b.n_chars - m.med) AS absdev
                 FROM b JOIN m USING (source)),
          r2 AS (SELECT source, absdev,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY absdev, doc_id) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS cnt
                 FROM dv),
          md AS (SELECT source, MAX(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1
                   THEN absdev END) AS mad
                 FROM r2 GROUP BY source)
          SELECT dv.doc_id, dv.source,
                 CAST(dv.n_chars AS BIGINT) AS n_chars,
                 CAST(dv.med AS BIGINT) AS med,
                 CAST(dv.absdev AS BIGINT) AS absdev,
                 CAST(md.mad AS BIGINT) AS mad,
                 dv.absdev > md.mad * 3 AS is_outlier
          FROM dv JOIN md USING (source) ORDER BY dv.doc_id""",
    "p122_stratified_split" -> {
      val h = h60Sql(4, "doc_id::VARCHAR")
      s"""WITH r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY $h, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
               FROM documents)
          SELECT doc_id, source,
                 CASE WHEN rn <= (800000 * n + 999999) // 1000000
                      THEN 'train'
                      WHEN rn <= (900000 * n + 999999) // 1000000
                      THEN 'val'
                      ELSE 'test' END AS split
          FROM r ORDER BY doc_id"""
    },
    "p123_leakage_safe_split" -> {
      val bucket = h60Sql(3, "cluster::VARCHAR") + " % 1000000"
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j
                    FROM cand JOIN shh sa ON sa.doc_id = i
                              JOIN shh sb ON sb.doc_id = j
                    WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                          * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
          lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster
                  FROM reach GROUP BY node)
          SELECT doc_id, cluster,
                 CASE WHEN $bucket < 800000 THEN 'train'
                      WHEN $bucket < 900000 THEN 'val'
                      ELSE 'test' END AS split
          FROM lab ORDER BY doc_id"""
    },
    "p120_multiprobe_lsh" -> {
      val probes = (0 until 6)
        .map(p => s"bk.bucket = xor(q.qbucket, ${1L << p})")
        .mkString("bk.bucket = q.qbucket OR ", " OR ", "")
      s"""WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
          pr AS (SELECT vec_id, v, $lshProj FROM e),
          bk AS (SELECT vec_id, v, CAST($lshBucket AS BIGINT) AS bucket
                 FROM pr),
          q AS (SELECT v AS qv, bucket AS qbucket FROM bk
                WHERE vec_id = 0),
          sc AS (SELECT bk.vec_id,
                   list_aggregate(list_transform(range(0, 64),
                     i -> bk.v[i+1] * q.qv[i+1]), 'sum') /
                   (sqrt(list_aggregate(list_transform(bk.v,
                      x -> x * x), 'sum')) *
                    sqrt(list_aggregate(list_transform(q.qv,
                      x -> x * x), 'sum'))) AS cos
                 FROM bk, q
                 WHERE bk.vec_id != 0 AND ($probes))
          SELECT vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5"""
    },
    "p119_edit_distance" ->
      s"""WITH $minhashCtes,
          ver AS (SELECT i, j
                  FROM cand JOIN shh sa ON sa.doc_id = i
                            JOIN shh sb ON sb.doc_id = j
                  WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                        * 1000000.0) >= 800000)
          SELECT i, j,
                 CAST(levenshtein(da.text, db.text) AS BIGINT)
                   AS edit_dist,
                 CAST(GREATEST(da.n_chars, db.n_chars) AS BIGINT)
                   AS max_len,
                 CAST((GREATEST(da.n_chars, db.n_chars)
                    - levenshtein(da.text, db.text)) * 1000000
                   // GREATEST(da.n_chars, db.n_chars) AS BIGINT)
                   AS sim_ppm
          FROM ver JOIN documents da ON da.doc_id = i
                   JOIN documents db ON db.doc_id = j
          ORDER BY i, j""",
    "p116_cluster_histogram" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j
                    FROM cand JOIN shh sa ON sa.doc_id = i
                              JOIN shh sb ON sb.doc_id = j
                    WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                          * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
          lab AS (SELECT node, MIN(lbl) AS cluster
                  FROM reach GROUP BY node),
          cs AS (SELECT cluster, COUNT(*) AS csize FROM lab
                 GROUP BY cluster)
          SELECT CAST(csize AS BIGINT) AS csize,
                 CAST(COUNT(*) AS BIGINT) AS n_clusters,
                 CAST(csize * COUNT(*) AS BIGINT) AS docs_in_tier
          FROM cs GROUP BY csize ORDER BY csize""",
    "p117_equidepth_bins" ->
      """WITH r AS (SELECT source, n_chars,
                 NTILE(4) OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS bucket
               FROM documents)
         SELECT source, CAST(bucket AS BIGINT) AS bucket,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(MIN(n_chars) AS BIGINT) AS lo,
                CAST(MAX(n_chars) AS BIGINT) AS hi
         FROM r GROUP BY source, bucket ORDER BY source, bucket""",
    "p118_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
          f AS (SELECT user_id, MIN(day) AS cohort FROM e
                GROUP BY user_id)
          SELECT cohort, CAST(e.day - f.cohort AS BIGINT) AS day_offset,
                 CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
          FROM e JOIN f USING (user_id)
          GROUP BY cohort, day_offset ORDER BY cohort, day_offset""",
    "p114_rendezvous_shard" -> {
      val h = "('0x'||substr(md5(s::VARCHAR || ':' || " +
        "doc_id::VARCHAR), 1, 15))::BIGINT"
      s"""WITH l AS (SELECT doc_id,
                 list_transform(range(0, 16), s -> $h) AS hs
               FROM documents)
          SELECT doc_id,
                 CAST(list_position(hs, list_max(hs)) - 1 AS BIGINT)
                   AS shard
          FROM l ORDER BY doc_id"""
    },
    "p115_interval_merge" ->
      """WITH iv AS (SELECT user_id % 50 AS ukey, epoch_us(ts) AS ivs,
                 epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 100
                   AS BIGINT) * 10000 AS ive,
                 event_id
               FROM events),
          w AS (SELECT ukey, ivs, ive, event_id,
                 MAX(ive) OVER (PARTITION BY ukey
                   ORDER BY ivs, ive, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pme
                FROM iv),
          isl AS (SELECT ukey, ivs, ive,
                   SUM(CASE WHEN pme IS NULL OR ivs > pme
                       THEN 1 ELSE 0 END)
                     OVER (PARTITION BY ukey ORDER BY ivs, ive, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS span_seq
                  FROM w)
          SELECT ukey, CAST(span_seq AS BIGINT) AS span_seq,
                 CAST(MIN(ivs) AS BIGINT) AS span_start,
                 CAST(MAX(ive) AS BIGINT) AS span_end,
                 CAST(COUNT(*) AS BIGINT) AS n_intervals
          FROM isl GROUP BY ukey, span_seq
          ORDER BY ukey, span_seq""",
    "p113_prefix_filter" ->
      s"""WITH $shinglesCte,
          eh AS (SELECT doc_id, nsh, ${h60Sql("shingle")} AS sh_h FROM e),
          p AS (SELECT a.doc_id AS i, b.doc_id AS j, a.nsh AS na2,
                       b.nsh AS nb2, COUNT(*) AS inter2
                FROM eh a JOIN eh b
                  ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4)
          SELECT i, j, CAST(na2 AS BIGINT) AS na, CAST(nb2 AS BIGINT) AS nb,
                 CAST(inter2 AS BIGINT) AS inter,
                 CAST(na2 + nb2 - inter2 AS BIGINT) AS uni,
                 CAST(floor((inter2::DOUBLE / (na2 + nb2 - inter2)::DOUBLE)
                   * 1000000.0) AS BIGINT) AS jaccard_ppm
          FROM p
          WHERE floor((inter2::DOUBLE / (na2 + nb2 - inter2)::DOUBLE)
                * 1000000.0) >= 800000
          ORDER BY i, j""",
    "p112_self_repeat" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +')
                       AS toks FROM documents),
          g0 AS (SELECT doc_id,
                  list_transform(range(0, GREATEST(len(toks) - 4, 0)),
                    i -> array_to_string(toks[i+1:i+5], ' ')) AS wins
                 FROM t),
          w AS (SELECT doc_id, generate_subscripts(wins, 1) - 1 AS pos,
                       ${h60Sql("unnest(wins)")} AS h
                FROM g0),
          m AS (SELECT a.doc_id, a.pos AS pa, b.pos AS pb
                FROM w a JOIN w b
                  ON a.doc_id = b.doc_id AND a.h = b.h AND a.pos < b.pos),
          isl AS (SELECT doc_id, pb - pa AS diag, pa,
                   pa - ROW_NUMBER() OVER (PARTITION BY doc_id, pb - pa
                     ORDER BY pa) AS island
                  FROM m),
          runs AS (SELECT doc_id, COUNT(*) AS nwin
                   FROM isl GROUP BY doc_id, diag, island),
          agg AS (SELECT doc_id,
                   CAST(MAX(nwin) + 4 AS BIGINT) AS longest_repeat,
                   CAST(SUM(nwin) AS BIGINT) AS n_repeat_windows
                  FROM runs GROUP BY doc_id)
          SELECT d.doc_id,
                 COALESCE(agg.longest_repeat, 0) AS longest_repeat,
                 COALESCE(agg.n_repeat_windows, 0) AS n_repeat_windows
          FROM documents d LEFT JOIN agg USING (doc_id)
          ORDER BY d.doc_id""",
    "p110_percentile_norm" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS score_rank,
                 COUNT(*) OVER (PARTITION BY source) AS grp_n
               FROM documents)
         SELECT doc_id, source, n_chars, score_rank,
                CAST(CASE WHEN grp_n <= 1 THEN 0
                     ELSE (score_rank - 1) * 1000000 // (grp_n - 1) END
                  AS BIGINT) AS pctile_ppm
         FROM r ORDER BY doc_id""",
    "p111_zorder_layout" ->
      """WITH k AS (SELECT l_partkey % 1024 AS a, l_suppkey % 1024 AS b
                    FROM lineitem),
          z AS (SELECT a, b,
                 CAST(list_aggregate(list_transform(range(0, 10),
                   i -> (((a >> i) & 1) << (2 * i))
                      + (((b >> i) & 1) << (2 * i + 1))), 'sum')
                   AS BIGINT) AS zv
                FROM k)
          SELECT zv >> 14 AS shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(MIN(a) AS BIGINT) AS min_a,
                 CAST(MAX(a) AS BIGINT) AS max_a,
                 CAST(MIN(b) AS BIGINT) AS min_b,
                 CAST(MAX(b) AS BIGINT) AS max_b
          FROM z GROUP BY shard ORDER BY shard""",
    "p108_rollup_report" ->
      """SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY ROLLUP (source, lang)
         ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST""",
    "p109_lang_pivot" ->
      """SELECT source,
                CAST(COUNT(*) FILTER (lang = 'de') AS BIGINT) AS de,
                CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS en,
                CAST(COUNT(*) FILTER (lang = 'es') AS BIGINT) AS es,
                CAST(COUNT(*) FILTER (lang = 'fr') AS BIGINT) AS fr,
                CAST(COUNT(*) FILTER (lang = 'zh') AS BIGINT) AS zh
         FROM documents GROUP BY source ORDER BY source""",
    "p107_column_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map(c =>
        s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
            CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
            FROM lineitem""")
        .mkString("SELECT * FROM (", " UNION ALL ",
          ") ORDER BY \"column\"")
    },
    "p106_mmr_select" -> {
      // replay the k greedy picks as unrolled CTE stages: stage t
      // scores every remaining candidate by (1−λ)·min-dist-to-selected
      // − λ·dist-to-query and takes the rank-1 row (ties → lowest id)
      val lam = 700000L; val inv = 300000L; val k = 5
      val stages = new StringBuilder
      for (t <- 1 to k) {
        val excl = (1 until t).map(i => s"SELECT id FROM s$i")
          .mkString(" UNION ALL ")
        val minD = if (t == 1) "CAST(0 AS BIGINT)"
          else (1 until t).map(i => s"d$i.d").mkString("LEAST(", ", ", ")")
        val joins = (1 until t).map(i => s" JOIN d$i ON dq.id = d$i.id")
          .mkString
        val notIn = if (t == 1) "" else s" WHERE dq.id NOT IN ($excl)"
        stages ++= s""",
          p$t AS (SELECT dq.id, $minD * $inv - dq.dq * $lam AS score
                  FROM dq$joins$notIn),
          s$t AS (SELECT id, score FROM (
                    SELECT id, score, ROW_NUMBER() OVER
                      (ORDER BY score DESC, id) AS rn FROM p$t)
                  WHERE rn = 1)"""
        if (t < k) stages ++= s""",
          d$t AS (SELECT qe.id,
                   CAST(SUM((qe.val - se.val) * (qe.val - se.val))
                     AS BIGINT) AS d
                  FROM qe JOIN (SELECT pos, val FROM qe
                                WHERE id = (SELECT id FROM s$t)) se
                    USING (pos)
                  WHERE qe.id != 0 GROUP BY qe.id)"""
      }
      val picks = (1 to k).map(t =>
        s"SELECT CAST($t AS BIGINT) AS pick, id AS vec_id, " +
        s"CAST(score AS BIGINT) AS score FROM s$t")
        .mkString(" UNION ALL ")
      s"""WITH qx AS (SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))
                   AS qv
               FROM embeddings),
          qe AS (SELECT id, i AS pos, qv[i + 1] AS val
                 FROM qx, range(0, 64) AS t(i)),
          qv0 AS (SELECT pos, val FROM qe WHERE id = 0),
          dq AS (SELECT qe.id,
                  CAST(SUM((qe.val - qv0.val) * (qe.val - qv0.val))
                    AS BIGINT) AS dq
                 FROM qe JOIN qv0 USING (pos)
                 WHERE qe.id != 0 GROUP BY qe.id)$stages
          SELECT * FROM ($picks) ORDER BY pick"""
    },
    "p105_rank_fusion" ->
      s"""WITH t0 AS (SELECT doc_id, regexp_split_to_array(text, ' +')
                        AS toks FROM documents),
          s0 AS (SELECT doc_id, toks, list_distinct(toks) AS dt,
                        len(toks) AS n_tokens FROM t0),
          q AS (SELECT doc_id,
                 CAST(floor(((LEAST(n_tokens, 200)::DOUBLE / 200.0) * 0.5 +
                   (len(list_intersect(dt, ${stopList(langs.head._2)}))::DOUBLE
                    / len(dt)::DOUBLE) * 0.5) * 1000000.0) AS BIGINT)
                   AS quality_ppm
                FROM s0),
          tt AS (SELECT doc_id, unnest(toks) AS token FROM t0),
          f AS (SELECT token, COUNT(*) AS tf FROM tt GROUP BY 1),
          n AS (SELECT COUNT(*) AS total FROM tt),
          sb AS (SELECT tt.doc_id,
                  length(bin((SELECT total FROM n))) -
                  length(bin(f.tf)) AS bits
                 FROM tt JOIN f USING (token)),
          sur AS (SELECT doc_id,
                   CAST((SUM(bits) * 1000000) // COUNT(*) AS BIGINT)
                     AS mean_surprisal_ppm
                  FROM sb GROUP BY doc_id),
          r AS (SELECT q.doc_id,
                 ROW_NUMBER() OVER (ORDER BY quality_ppm DESC, q.doc_id)
                   AS rank_0,
                 ROW_NUMBER() OVER (ORDER BY mean_surprisal_ppm ASC,
                   q.doc_id) AS rank_1
                FROM q JOIN sur ON q.doc_id = sur.doc_id)
          SELECT doc_id, CAST(rank_0 AS BIGINT) AS rank_0,
                 CAST(rank_1 AS BIGINT) AS rank_1,
                 CAST(1000000 // (60 + rank_0)
                    + 1000000 // (60 + rank_1) AS BIGINT) AS rrf
          FROM r ORDER BY rrf DESC, doc_id LIMIT 50""",
    "p103_rag_chunks" ->
      s"""WITH $toksCte,
          c AS (SELECT doc_id, toks, len(toks) AS n,
                 CASE WHEN len(toks) <= 32 THEN 1
                      ELSE (len(toks) - 32 + 15) // 16 + 1 END AS nchunks
                FROM t),
          e AS (SELECT doc_id, toks, unnest(range(0, nchunks)) AS c
                FROM c)
          SELECT doc_id, CAST(c AS BIGINT) AS chunk_idx,
                 array_to_string(toks[c*16+1 : c*16+32], ' ') AS chunk,
                 CAST(len(toks[c*16+1 : c*16+32]) AS BIGINT) AS n_tokens
          FROM e ORDER BY doc_id, chunk_idx""",
    "p104_vocab_coverage" ->
      s"""WITH $toksCte,
          f AS (SELECT tok AS token, COUNT(*) AS tf
                FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
          r AS (SELECT token, tf,
                 ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS rank,
                 SUM(tf) OVER (ORDER BY tf DESC, token ASC) AS cum,
                 SUM(tf) OVER () AS total
                FROM f)
          SELECT CAST(rank AS BIGINT) AS rank, token,
                 CAST(tf AS BIGINT) AS tf,
                 CAST(cum * 1000000 // total AS BIGINT) AS cum_ppm
          FROM r WHERE (cum - tf) * 1000000 // total < 900000
          ORDER BY rank""",
    "p102_bigram_surprisal" ->
      s"""WITH $toksCte,
          bg AS (SELECT doc_id,
                  unnest(list_transform(range(0, GREATEST(len(toks) - 1, 0)),
                    i -> toks[i + 1])) AS prev,
                  unnest(list_transform(range(0, GREATEST(len(toks) - 1, 0)),
                    i -> toks[i + 2])) AS cur
                 FROM t),
          bf AS (SELECT prev, cur, COUNT(*) AS bf FROM bg GROUP BY 1, 2),
          cf AS (SELECT prev, COUNT(*) AS cf FROM bg GROUP BY 1)
          SELECT bg.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(length(bin(cf.cf)) - length(bin(bf.bf)))
                   AS BIGINT) AS sum_bits,
                 CAST(SUM(length(bin(cf.cf)) - length(bin(bf.bf)))
                   * 1000000 // COUNT(*) AS BIGINT) AS mean_surprisal_ppm
          FROM bg JOIN bf ON bg.prev = bf.prev AND bg.cur = bf.cur
                  JOIN cf ON bg.prev = cf.prev
          GROUP BY bg.doc_id ORDER BY bg.doc_id""",
    "p100_curation_chain" -> {
      val bucket = h60Sql(7, "doc_id::VARCHAR") + " % 1000000"
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks
                     FROM documents),
          m AS (SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_words,
                       CAST(list_aggregate(list_transform(toks,
                         x -> length(x)), 'sum') AS BIGINT) AS chars,
                       CAST(len(list_filter(toks,
                         x -> x IN ('the','a','is','of','and'))) AS BIGINT)
                         AS stop
                FROM t),
          r AS (SELECT doc_id, n_words,
                       CASE WHEN n_words = 0 THEN 0
                            ELSE chars * 1000000 // n_words END
                         AS mean_word_len_ppm,
                       CASE WHEN n_words = 0 THEN 0
                            ELSE stop * 1000000 // n_words END
                         AS stopword_ppm
                FROM m),
          k AS (SELECT d.doc_id, d.source, d.text, r.n_words
                FROM documents d JOIN r USING (doc_id)
                WHERE r.n_words BETWEEN 30 AND 80
                  AND r.mean_word_len_ppm BETWEEN 3500000 AND 4600000
                  AND r.stopword_ppm >= 20000),
          keep AS (SELECT MIN(doc_id) AS doc_id FROM k GROUP BY md5(text)),
          dd AS (SELECT k.* FROM k JOIN keep USING (doc_id)),
          sp AS (SELECT doc_id, source, n_words,
                  CASE WHEN $bucket < 800000 THEN 'train'
                       WHEN $bucket < 900000 THEN 'val'
                       ELSE 'test' END AS split
                 FROM dd)
          SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_words) AS BIGINT) AS sum_words,
                 MIN(doc_id) AS min_doc
          FROM sp GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    "p99_stream_drift" ->
      """WITH h AS (SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 500
                   AS bin,
                 COUNT(*) AS cnt
               FROM events WHERE event_type IN ('view', 'click')
               GROUP BY 1, 2),
          a AS (SELECT bin, cnt FROM h WHERE event_type = 'view'),
          b AS (SELECT bin, cnt FROM h WHERE event_type = 'click'),
          j AS (SELECT COALESCE(a.bin, b.bin) AS bin,
                       COALESCE(a.cnt, 0) AS cnt_a,
                       COALESCE(b.cnt, 0) AS cnt_b
                FROM a FULL JOIN b ON a.bin = b.bin),
          c AS (SELECT bin, cnt_a, cnt_b,
                       SUM(cnt_a) OVER (ORDER BY bin) AS cum_a,
                       SUM(cnt_b) OVER (ORDER BY bin) AS cum_b,
                       SUM(cnt_a) OVER () AS n_a,
                       SUM(cnt_b) OVER () AS n_b
                FROM j)
          SELECT bin, cnt_a, cnt_b,
                 CAST(abs(cum_a * n_b - cum_b * n_a) * 1000000
                   // (n_a * n_b) AS BIGINT) AS gap_ppm
          FROM c ORDER BY bin""",
    "p98_incremental_dedup" -> incrementalDedupSql,
    // the streaming admission-control form folds to the identical end
    // state (batching-independent — see p101's scaladoc), so it runs
    // against the same oracle verbatim
    "p101_stream_neardup" -> incrementalDedupSql,
    "p97_label_drift" ->
      """WITH q AS (SELECT label,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))
                   AS qv
               FROM embeddings),
          qe AS (SELECT label, i AS pos, qv[i + 1] AS val
                 FROM q, range(0, 64) AS t(i)),
          c AS (SELECT label, pos,
                       CAST(SUM(val) AS BIGINT) // COUNT(*) AS cval
                FROM qe GROUP BY label, pos)
          SELECT a.label AS label_a, b.label AS label_b,
                 CAST(SUM((a.cval - b.cval) * (a.cval - b.cval)) AS BIGINT)
                   AS dist2
          FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
          GROUP BY a.label, b.label ORDER BY label_a, label_b""",
    "p91_snapshot_diff" ->
      """WITH prev AS (SELECT doc_id, text FROM documents
                       WHERE doc_id < 450),
          cur AS (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                        ELSE text END AS text
                  FROM documents WHERE doc_id >= 50)
          SELECT COALESCE(prev.doc_id, cur.doc_id) AS doc_id,
            CASE WHEN prev.doc_id IS NULL THEN 'added'
                 WHEN cur.doc_id IS NULL THEN 'removed'
                 WHEN md5(prev.text) = md5(cur.text) THEN 'unchanged'
                 ELSE 'changed' END AS status
          FROM prev FULL JOIN cur ON prev.doc_id = cur.doc_id
          ORDER BY doc_id""",
    "p90_normalize_dedup" ->
      """WITH no AS (SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN upper(text)
                      WHEN doc_id % 3 = 1 THEN '  ' || text || ' !!'
                      ELSE text END AS text
               FROM documents),
          n AS (SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text
               FROM no)
          SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper,
                 COUNT(*) AS n_copies
          FROM n GROUP BY 1 ORDER BY content_hash""",
    "p89_importance_resample" ->
      s"""WITH a AS (SELECT doc_id, n_chars // 50 AS bin FROM documents
                     WHERE source = 'src2'),
          t AS (SELECT n_chars // 50 AS bin FROM documents
                WHERE source = 'src3'),
          ca AS (SELECT bin, COUNT(*) AS cnt_s FROM a GROUP BY 1),
          ct AS (SELECT bin, COUNT(*) AS cnt_t FROM t GROUP BY 1),
          w AS (SELECT ca.bin,
                  LEAST(1000000,
                    CAST(COALESCE(ct.cnt_t, 0) AS HUGEINT) *
                      (SELECT COUNT(*) FROM a) * 1000000
                    // (CAST(ca.cnt_s AS HUGEINT) *
                       GREATEST(1, (SELECT COUNT(*) FROM t))))
                    AS weight_ppm
                FROM ca LEFT JOIN ct USING (bin))
          SELECT a.doc_id, a.bin, CAST(w.weight_ppm AS BIGINT) AS weight_ppm
          FROM a JOIN w USING (bin)
          WHERE ${h60Sql(5, "doc_id::VARCHAR")} % 1000000 < w.weight_ppm
          ORDER BY a.doc_id""",
    "p86_funnel" ->
      """WITH u1 AS (SELECT user_id, MIN(ts) AS s1 FROM events
                     WHERE event_type = 'view' GROUP BY 1),
          u2 AS (SELECT e.user_id, MIN(e.ts) AS s2
                 FROM events e JOIN u1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > u1.s1 GROUP BY 1),
          u3 AS (SELECT e.user_id, MIN(e.ts) AS s3
                 FROM events e JOIN u2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > u2.s2 GROUP BY 1)
          SELECT u1.user_id,
            CAST(1 + CASE WHEN u2.user_id IS NULL THEN 0 ELSE 1 END
                   + CASE WHEN u3.user_id IS NULL THEN 0 ELSE 1 END
              AS INT) AS stages,
            u1.s1 AS ts_first,
            CAST(COALESCE((epoch_us(u3.s3) - epoch_us(u1.s1)) // 1000000,
              -1) AS BIGINT) AS span_sec
          FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
          ORDER BY user_id""",
    // the streaming funnel's finalized quiescent answer IS the batch
    // funnel — same oracle verbatim
    "p143_stream_funnel" ->
      """WITH u1 AS (SELECT user_id, MIN(ts) AS s1 FROM events
                     WHERE event_type = 'view' GROUP BY 1),
          u2 AS (SELECT e.user_id, MIN(e.ts) AS s2
                 FROM events e JOIN u1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > u1.s1 GROUP BY 1),
          u3 AS (SELECT e.user_id, MIN(e.ts) AS s3
                 FROM events e JOIN u2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > u2.s2 GROUP BY 1)
          SELECT u1.user_id,
            CAST(1 + CASE WHEN u2.user_id IS NULL THEN 0 ELSE 1 END
                   + CASE WHEN u3.user_id IS NULL THEN 0 ELSE 1 END
              AS INT) AS stages,
            u1.s1 AS ts_first,
            CAST(COALESCE((epoch_us(u3.s3) - epoch_us(u1.s1)) // 1000000,
              -1) AS BIGINT) AS span_sec
          FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
          ORDER BY user_id""",
    "p144_token_mixture" ->
      s"""WITH t AS (SELECT doc_id, source,
                 CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
                   AS ntok
               FROM documents),
          tot AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS tok_total
                  FROM t GROUP BY 1),
          wts AS (SELECT source, tok_total,
                    CAST(floor(sqrt(tok_total) * 1000000.0) AS BIGINT)
                      AS weight
                  FROM tot),
          q AS (SELECT source, tok_total, weight,
                  CAST(CAST(12000 AS HUGEINT) * weight
                    // (SELECT SUM(weight) FROM wts) AS BIGINT)
                    AS tok_target
                FROM wts),
          k AS (SELECT source, tok_total, weight, tok_target,
                  LEAST(CAST(1000000 AS BIGINT),
                    CAST(CAST(tok_target AS HUGEINT) * 1000000
                      // tok_total AS BIGINT)) AS keep_ppm
                FROM q),
          h AS (SELECT doc_id, source, ntok,
                  ${h60Sql(5, "CAST(doc_id AS VARCHAR)")} % 1000000 AS hh
                FROM t)
          SELECT k.source, k.tok_total, k.weight, k.tok_target,
                 k.keep_ppm,
                 CAST(SUM(CASE WHEN hh < keep_ppm THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN hh < keep_ppm THEN ntok ELSE 0 END)
                   AS BIGINT) AS tokens_kept
          FROM k JOIN h USING (source)
          GROUP BY 1, 2, 3, 4, 5
          ORDER BY k.source""",
    "p146_epoch_mixture" ->
      s"""WITH t AS (SELECT doc_id, source,
                 CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)
                   AS ntok
               FROM documents),
          tot AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS tok_total
                  FROM t GROUP BY 1),
          q AS (SELECT source, tok_total,
                  CAST(CAST(60000 AS HUGEINT)
                    // (SELECT COUNT(*) FROM tot) AS BIGINT) AS tok_target
                FROM tot),
          e AS (SELECT source, tok_total, tok_target,
                  LEAST(CAST(2 AS BIGINT), tok_target // tok_total)
                    AS epochs_full
                FROM q),
          r AS (SELECT source, tok_total, tok_target, epochs_full,
                  CASE WHEN epochs_full = 2 THEN CAST(0 AS BIGINT)
                       ELSE CAST(CAST(tok_target - epochs_full * tok_total
                         AS HUGEINT) * 1000000 // tok_total AS BIGINT)
                  END AS rem_ppm
                FROM e),
          h AS (SELECT doc_id, source, ntok,
                  ${h60Sql(11, "CAST(doc_id AS VARCHAR)")} % 1000000 AS hh
                FROM t)
          SELECT r.source, r.tok_total, r.tok_target, r.epochs_full,
                 r.rem_ppm,
                 CAST(SUM(CASE WHEN hh < rem_ppm THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_docs_extra,
                 CAST(SUM(ntok * (epochs_full +
                   CASE WHEN hh < rem_ppm THEN 1 ELSE 0 END))
                   AS BIGINT) AS tokens_assigned
          FROM r JOIN h USING (source)
          GROUP BY 1, 2, 3, 4, 5
          ORDER BY r.source""",
    "p145_calibration_audit" ->
      """WITH s AS (SELECT
               GREATEST(CAST(0 AS BIGINT), LEAST(CAST(999999 AS BIGINT),
                 CAST(floor((CAST(embedding[1] AS DOUBLE)
                   + CAST(0.5 AS DOUBLE)) * 1000000.0) AS BIGINT)))
                 AS score_ppm,
               CAST(label % 2 AS BIGINT) AS label
             FROM embeddings),
          b AS (SELECT LEAST(CAST(9 AS BIGINT),
                  score_ppm * 10 // 1000000) AS bin,
                  score_ppm, label
                FROM s),
          g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(label) AS pos, SUM(score_ppm) AS conf
                FROM b GROUP BY bin),
          m AS (SELECT bin, n,
                       CAST(pos * 1000000 // n AS BIGINT) AS acc_ppm,
                       CAST(conf // n AS BIGINT) AS conf_ppm
                FROM g)
          SELECT bin, n, acc_ppm, conf_ppm,
                 ABS(acc_ppm - conf_ppm) AS gap_ppm,
                 CAST(SUM(ABS(acc_ppm - conf_ppm) * n) OVER ()
                   // SUM(n) OVER () AS BIGINT) AS ece_ppm
          FROM m ORDER BY bin""",
    "p85_export_manifest" ->
      s"""WITH sh AS (SELECT doc_id, text,
                 CAST(${h60Sql(3, "doc_id::VARCHAR")} % 8 AS INT) AS shard
               FROM documents)
          SELECT shard,
                 COUNT(*) AS n_docs,
                 CAST(SUM(len(regexp_split_to_array(text, ' +'))) AS BIGINT)
                   AS n_tokens,
                 CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                 CAST(SUM(CAST(${h60Sql("text")} AS HUGEINT))
                   % 1000000000000000 AS BIGINT) AS checksum
          FROM sh GROUP BY shard ORDER BY shard""",
    "p84_rule_overlap_join" ->
      """WITH e AS (SELECT event_id, ts, event_type FROM events
                    WHERE user_id % 11 = 4),
          v AS (SELECT event_id AS view_id, ts AS v_start,
                       ts + INTERVAL 1 HOUR AS v_end
                FROM e WHERE event_type = 'view'),
          p AS (SELECT event_id AS p_id, ts AS p_start,
                       ts + INTERVAL 90 MINUTE AS p_end
                FROM e WHERE event_type = 'purchase')
          SELECT v.view_id, p.p_id
          FROM v JOIN p
            ON v.v_start < p.p_end AND p.p_start < v.v_end
          ORDER BY view_id, p_id""",
    "p72_interval_overlap" ->
      """WITH e AS (SELECT event_id, ts, event_type FROM events
                    WHERE user_id % 11 = 3),
          v AS (SELECT event_id AS view_id, ts AS v_start,
                       ts + INTERVAL 1 HOUR AS v_end
                FROM e WHERE event_type = 'view'),
          p AS (SELECT event_id AS p_id, ts AS p_start,
                       ts + INTERVAL 90 MINUTE AS p_end
                FROM e WHERE event_type = 'purchase')
          SELECT v.view_id, p.p_id
          FROM v JOIN p
            ON v.v_start < p.p_end AND p.p_start < v.v_end
          ORDER BY view_id, p_id""",
    "p73_keep_best" ->
      s"""WITH RECURSIVE $minhashCtes,
          pairs AS (SELECT i, j
                    FROM cand JOIN shh sa ON sa.doc_id = i
                              JOIN shh sb ON sb.doc_id = j
                    WHERE floor((len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
                          * 1000000.0) >= 800000),
          sym AS (SELECT i AS a, j AS b FROM pairs
                  UNION ALL SELECT j, i FROM pairs),
          reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
          lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster
                  FROM reach GROUP BY node),
          r AS (SELECT d.doc_id, d.n_chars, l.cluster,
                  ROW_NUMBER() OVER (PARTITION BY l.cluster
                    ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
                FROM documents d JOIN lab l USING (doc_id))
          SELECT doc_id, n_chars FROM r WHERE rk = 1
          ORDER BY doc_id""",
    "p74_stream_topk" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS range_start,
                       event_type, CAST(COUNT(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
          r AS (SELECT range_start, event_type, n,
                  ROW_NUMBER() OVER (PARTITION BY range_start
                    ORDER BY n DESC, event_type ASC) AS rank
                FROM c)
          SELECT range_start, CAST(rank AS BIGINT) AS rank,
                 event_type, n
          FROM r WHERE rank <= 3
          ORDER BY range_start, rank""",
    "p147_bpe_train" ->
      s"""WITH ${bpeCtes(4)}
          SELECT merge_rank, a, b, merged, pair_n FROM m1
          UNION ALL SELECT merge_rank, a, b, merged, pair_n FROM m2
          UNION ALL SELECT merge_rank, a, b, merged, pair_n FROM m3
          UNION ALL SELECT merge_rank, a, b, merged, pair_n FROM m4
          ORDER BY merge_rank""",
    "p148_bpe_segment" ->
      s"""WITH ${bpeCtes(4)},
          segmap AS (SELECT word,
              replace(trim(rep, chr(1)), chr(1)||chr(1), '+') AS seg,
              CAST(len(string_split(trim(rep, chr(1)),
                chr(1)||chr(1))) AS BIGINT) AS nsub
            FROM r4),
          d0 AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS tk
                 FROM documents),
          d1 AS (SELECT doc_id, tk,
                   unnest(range(0, len(tk))) AS pos
                 FROM d0),
          dt AS (SELECT doc_id, pos,
                   tk[CAST(pos + 1 AS INTEGER)] AS word
                 FROM d1
                 WHERE tk[CAST(pos + 1 AS INTEGER)] <> ''
                   AND NOT contains(tk[CAST(pos + 1 AS INTEGER)], chr(1)))
          SELECT doc_id, CAST(SUM(nsub) AS BIGINT) AS n_subwords,
                 string_agg(seg, ' ' ORDER BY pos) AS seg_text
          FROM dt JOIN segmap USING (word)
          GROUP BY doc_id
          ORDER BY doc_id""",
    "p149_importance_propagation" ->
      s"""WITH ${prCtes(3)}
          SELECT node, r AS rank_ppm FROM r3 ORDER BY node""",
    "p150_k_anonymity" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS group_n,
               COUNT(*) < 100 AS risky
          FROM events GROUP BY 1, 2
          ORDER BY event_type, day""",
    "p151_validity_intervals" -> scdOracle,
    // the streaming fold's closed-wins reconstruction IS the batch
    // history — same oracle verbatim (p143/p86 precedent)
    "p153_stream_scd" -> scdOracle,
    "p152_bpe_residual_drift" ->
      s"""WITH ${bpeCtes(5)}
          SELECT a, b, n FROM p5
          ORDER BY n DESC, a, b LIMIT 20""",
    "p154_ivf_index_probe" -> ivfProbeOracle,
    // the governed store-resident forms return the SAME result sets —
    // the persistence/ACL layer must be invisible to the math
    "p156_ivf_index_store" -> ivfProbeOracle,
    "p157_signature_index_store" -> incrementalDedupSql,
    // build+append must be indistinguishable from the one-shot build
    "p158_ivf_index_append" -> ivfProbeOracle,
    "p159_signature_index_append" -> incrementalDedupSql,
    "p160_ivf_multiprobe" -> ivfProbeOracleN(2),
    "p161_ivf_probe_params" -> ivfProbeOracleN(2),
    "p162_pq_index_store" -> pqAnnOracle,
    "p163_pq_index_append" -> pqAnnOracle,
    "p164_ivf_rebalance" -> ivfRebalanceOracle,
    "p166_ivf_index_health" -> ivfHealthOracle,
    "p167_signature_index_health" ->
      s"""WITH $minhashCtes,
          bk AS (SELECT band, bsig, COUNT(*) AS sz FROM bands
                 GROUP BY 1, 2)
          SELECT CAST(band AS BIGINT) AS band,
                 CAST(SUM(sz) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_buckets,
                 CAST(MAX(sz) AS BIGINT) AS max_bucket
          FROM bk GROUP BY band ORDER BY band""",
    // one generation, all current: build + admission share the meta's
    // tag by construction; the tag itself is a timestamp, projected out
    "p168_pq_index_health" ->
      s"""SELECT CAST(COUNT(*) + 100 AS BIGINT) AS n_codes,
                 TRUE AS is_current
          FROM embeddings ORDER BY n_codes""",
    "p169_ann_recall" -> annRecallOracle,
    // p39's integer-e4 PQ train + ADC replay, generalized to a BATCH:
    // the distance table carries a qid, the rank window partitions on
    // it — each query's ranking is exactly the single-probe oracle's
    "p170_pq_knn_join" ->
      """WITH q AS (SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
          qe AS (SELECT id, i // 8 AS sub, i % 8 AS spos, qv[i+1] AS val
                 FROM q, range(0, 64) t(i)),
          c0 AS (SELECT id AS cid, sub, spos, val FROM qe WHERE id < 4),
          d1 AS (SELECT qe.id, qe.sub, c0.cid,
                   CAST(SUM((qe.val - c0.val) * (qe.val - c0.val)) AS BIGINT)
                     AS dist
                 FROM qe JOIN c0 ON qe.sub = c0.sub AND qe.spos = c0.spos
                 GROUP BY 1, 2, 3),
          a1 AS (SELECT id, sub, cid FROM (
                   SELECT id, sub, cid, ROW_NUMBER() OVER (
                     PARTITION BY id, sub ORDER BY dist, cid) AS rn
                   FROM d1) WHERE rn = 1),
          c1 AS (SELECT a1.sub, a1.cid, qe.spos,
                   CAST(SUM(qe.val) AS BIGINT) // COUNT(*) AS val
                 FROM a1 JOIN qe ON a1.id = qe.id AND a1.sub = qe.sub
                 GROUP BY 1, 2, 3),
          d2 AS (SELECT qe.id, qe.sub, c1.cid,
                   CAST(SUM((qe.val - c1.val) * (qe.val - c1.val)) AS BIGINT)
                     AS dist
                 FROM qe JOIN c1 ON qe.sub = c1.sub AND qe.spos = c1.spos
                 GROUP BY 1, 2, 3),
          a2 AS (SELECT id, sub, cid FROM (
                   SELECT id, sub, cid, ROW_NUMBER() OVER (
                     PARTITION BY id, sub ORDER BY dist, cid) AS rn
                   FROM d2) WHERE rn = 1),
          dt AS (SELECT qq.id AS qid, c1.sub, c1.cid,
                   CAST(SUM((qq.val - c1.val) * (qq.val - c1.val)) AS BIGINT)
                     AS dist
                 FROM (SELECT id, sub, spos, val FROM qe
                       WHERE id IN (0, 100)) qq
                 JOIN c1 ON qq.sub = c1.sub AND qq.spos = c1.spos
                 GROUP BY 1, 2, 3),
          adc AS (SELECT dt.qid, a2.id, CAST(SUM(dt.dist) AS BIGINT) AS adc_dist
                  FROM a2 JOIN dt ON a2.sub = dt.sub AND a2.cid = dt.cid
                  GROUP BY 1, 2),
          r AS (SELECT qid, id, adc_dist, ROW_NUMBER() OVER (
                  PARTITION BY qid ORDER BY adc_dist, id) AS rank
                FROM adc WHERE id <> qid)
          SELECT qid, CAST(rank AS BIGINT) AS rank, id AS vec_id, adc_dist
          FROM r WHERE rank <= 10
          ORDER BY qid, rank""",
    "p165_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, source = 'src0' AS is_tgt,
                 regexp_split_to_array(text, ' +') AS toks FROM documents),
          bg AS (SELECT doc_id, is_tgt,
                  unnest(list_transform(range(0, GREATEST(len(toks) - 1, 0)),
                    i -> toks[i + 1] || ' ' || toks[i + 2])) AS b
                 FROM t),
          f AS (SELECT doc_id, is_tgt, ${h60Sql("b")} % 64 AS f FROM bg),
          m AS (SELECT f, SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt,
                       SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS raw
                FROM f GROUP BY f),
          tot AS (SELECT COALESCE(SUM(tgt), 0) + 64 AS ttgt,
                         COALESCE(SUM(raw), 0) + 64 AS traw FROM m),
          w AS (SELECT f, length(bin(tgt + 1)) - length(bin(raw + 1)) AS w_bits
                FROM m),
          df AS (SELECT doc_id, f, COUNT(*) AS c FROM f
                 WHERE NOT is_tgt GROUP BY 1, 2),
          s AS (SELECT df.doc_id, SUM(df.c * w.w_bits) AS fw,
                       SUM(df.c) AS nf
                FROM df JOIN w ON df.f = w.f GROUP BY 1)
          SELECT t.doc_id, CAST(COALESCE(s.nf, 0) AS BIGINT) AS n_feats,
            CAST(COALESCE(s.fw + s.nf *
              (length(bin((SELECT traw FROM tot))) -
               length(bin((SELECT ttgt FROM tot)))), 0) AS BIGINT) AS score_bits
          FROM t LEFT JOIN s ON t.doc_id = s.doc_id
          WHERE NOT t.is_tgt
          ORDER BY t.doc_id""",
    "p155_tokenizer_mixture_chain" ->
      s"""WITH ${bpeCtes(4)},
          segmap AS (SELECT word,
              CAST(len(string_split(trim(rep, chr(1)),
                chr(1)||chr(1))) AS BIGINT) AS nsub
            FROM r4),
          d0 AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS tk
                 FROM documents),
          d1 AS (SELECT doc_id, tk,
                   unnest(range(0, len(tk))) AS pos
                 FROM d0),
          dt AS (SELECT doc_id,
                   tk[CAST(pos + 1 AS INTEGER)] AS word
                 FROM d1
                 WHERE tk[CAST(pos + 1 AS INTEGER)] <> ''
                   AND NOT contains(tk[CAST(pos + 1 AS INTEGER)], chr(1))),
          docsub AS (SELECT doc_id, CAST(SUM(nsub) AS BIGINT) AS ntok
                     FROM dt JOIN segmap USING (word)
                     GROUP BY doc_id),
          t AS (SELECT d.doc_id, d.source, s.ntok
                FROM documents d JOIN docsub s USING (doc_id)),
          tot AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS tok_total
                  FROM t GROUP BY 1),
          wts AS (SELECT source, tok_total,
                    CAST(floor(sqrt(tok_total) * 1000000.0) AS BIGINT)
                      AS weight
                  FROM tot),
          q AS (SELECT source, tok_total, weight,
                  CAST(CAST(30000 AS HUGEINT) * weight
                    // (SELECT SUM(weight) FROM wts) AS BIGINT)
                    AS tok_target
                FROM wts),
          k AS (SELECT source, tok_total, weight, tok_target,
                  LEAST(CAST(1000000 AS BIGINT),
                    CAST(CAST(tok_target AS HUGEINT) * 1000000
                      // tok_total AS BIGINT)) AS keep_ppm
                FROM q),
          h AS (SELECT doc_id, source, ntok,
                  ${h60Sql(5, "CAST(doc_id AS VARCHAR)")} % 1000000 AS hh
                FROM t)
          SELECT k.source, k.tok_total, k.weight, k.tok_target,
                 k.keep_ppm,
                 CAST(SUM(CASE WHEN hh < keep_ppm THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN hh < keep_ppm THEN ntok ELSE 0 END)
                   AS BIGINT) AS subwords_kept
          FROM k JOIN h USING (source)
          GROUP BY 1, 2, 3, 4, 5
          ORDER BY k.source""")

  // a def, not a val: the oracleSql map initializes before later vals
  // would, and a null entry fails silently at dump time
  private def scdOracle: String =
      """WITH obs AS (SELECT user_id, ts, event_type
                      FROM (SELECT user_id, ts, event_type,
                              ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id) AS rn
                            FROM events)
                      WHERE rn = 1),
          f AS (SELECT user_id, ts, event_type,
                  CASE WHEN LAG(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts) IS DISTINCT
                         FROM event_type THEN 1 ELSE 0 END AS chg
                FROM obs),
          i AS (SELECT user_id, ts, event_type,
                  SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS isl
                FROM f),
          g AS (SELECT user_id, isl, MIN(event_type) AS value,
                  MIN(ts) AS valid_from,
                  CAST(COUNT(*) AS BIGINT) AS n_obs
                FROM i GROUP BY user_id, isl)
          SELECT user_id, value, valid_from,
                 LEAD(valid_from) OVER (PARTITION BY user_id
                   ORDER BY isl) AS valid_to,
                 n_obs
          FROM g
          ORDER BY user_id, valid_from"""

  /** Unrolled DuckDB replay of `Graphs.powerIteration` over the
    * event-type transition graph: per iteration
    * contrib(v) = Σ (r·w)//outw over in-edges, then
    * r' = 150000 + 850000·contrib // 1e6 — exact integer math both
    * engines agree on (NOTES: `//` == Spark's `div` for non-negative
    * longs; SUM(BIGINT)→HUGEINT needs the CAST). */
  private def prCtes(iters: Int): String = {
    val head =
      """ev AS (SELECT user_id, event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
                FROM events),
          e AS (SELECT event_type AS src, next_type AS dst,
                  CAST(COUNT(*) AS BIGINT) AS w
                FROM ev WHERE next_type IS NOT NULL
                GROUP BY 1, 2),
          o AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
                FROM e GROUP BY 1),
          n AS (SELECT DISTINCT node FROM
                 (SELECT src AS node FROM e
                  UNION ALL SELECT dst FROM e)),
          r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n)"""
    val roundSql = (1 to iters).map { k =>
      s""",
          c$k AS (SELECT e.dst,
                   CAST(SUM(r.r * e.w // o.outw) AS BIGINT) AS contrib
                 FROM e JOIN o USING (src)
                      JOIN r${k - 1} r ON r.node = e.src
                 GROUP BY e.dst),
          r$k AS (SELECT n.node,
                   CAST(150000 + 850000 * COALESCE(c$k.contrib, 0)
                     // 1000000 AS BIGINT) AS r
                 FROM n LEFT JOIN c$k ON c$k.dst = n.node)"""
    }.mkString
    head + roundSql
  }

  /** Unrolled DuckDB replay of `Bpe.train`'s sequential loop (the
    * mergesPerRound=1 reference): the shared CTE prefix yields
    * m1..mN (one learned merge per round, `(n DESC, a, b)` ranked,
    * only pairs occurring twice) and rN (the final per-word reps,
    * each symbol wrapped in chr(1) exactly like Bpe.Sep). */
  private def bpeCtes(rounds: Int): String = {
    val sep = "chr(1)"
    val sep2 = "chr(1)||chr(1)"
    val head =
      s"""toks AS (SELECT unnest(regexp_split_to_array(text, ' +'))
                     AS word
                   FROM documents),
          w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM toks
                 WHERE word <> '' AND NOT contains(word, $sep)
                 GROUP BY word),
          r0 AS (SELECT word, cnt,
                   $sep || array_to_string(
                     list_transform(range(0, length(word)),
                       i -> substring(word, CAST(i + 1 AS INTEGER), 1)),
                     $sep2) || $sep AS rep
                 FROM w0)"""
    val roundSql = (1 to rounds).map { k =>
      s""",
          s$k AS (SELECT cnt,
                   string_split(trim(rep, $sep), $sep2) AS syms
                 FROM r${k - 1}),
          p$k AS (SELECT pr[1] AS a, pr[2] AS b,
                   CAST(SUM(cnt) AS BIGINT) AS n
                 FROM (SELECT cnt,
                         unnest(list_transform(range(0, len(syms) - 1),
                           i -> [syms[CAST(i + 1 AS INTEGER)],
                                 syms[CAST(i + 2 AS INTEGER)]])) AS pr
                       FROM s$k WHERE len(syms) >= 2)
                 GROUP BY a, b),
          m$k AS (SELECT CAST($k AS BIGINT) AS merge_rank, a, b,
                   a || b AS merged, n AS pair_n
                 FROM p$k WHERE n >= 2
                 ORDER BY n DESC, a, b LIMIT 1),
          r$k AS (SELECT word, cnt,
                   replace(rep, $sep || a || $sep2 || b || $sep,
                     $sep || a || b || $sep) AS rep
                 FROM r${k - 1} CROSS JOIN m$k)"""
    }.mkString
    head + roundSql
  }
}
