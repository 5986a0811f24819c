package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, token counting (whitespace + a BPE-ish subword
  * estimate), quality scoring, language-ID heuristic, and document
  * fingerprinting. Everything is a narrow per-row projection — no
  * shuffle, fully whole-stage-codegen'd — so at 100 TB these run at
  * scan speed and combine freely with the dedup/similarity stages.
  *
  * Determinism: ratios are reported as parts-per-million via
  * `floor(x * 1e6)` (floor is exact for both Spark and the DuckDB
  * oracle, unlike round-half modes).
  */
object TextOps {

  /** Whitespace tokenizer (matches DuckDB `regexp_split_to_array(t,' +')`). */
  def tokens(text: Column): Column = split(text, " +")

  def ppm(x: Column): Column = floor(x * lit(1000000.0d)).cast("long")

  /** Per-language stopword lists for the language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Token/char counts, BPE-ish subword estimate (ceil(len/4) per token),
    * average token length, stopword ratio and a composite quality score.
    */
  def withStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTokens = size(toks)
    val distinctToks = array_distinct(toks)
    val charsInToks = aggregate(
      transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
    val bpe = aggregate(
      transform(toks, t => ceil(length(t) / lit(4.0d)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val stopHits = size(array_intersect(
      distinctToks, array(stopwords.head._2.map(lit): _*)))
    val stopRatio = stopHits.cast("double") / size(distinctToks).cast("double")
    val lengthScore = least(nTokens, lit(200)).cast("double") / lit(200.0d)
    df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("n_distinct_tokens", size(distinctToks).cast("long"))
      .withColumn("bpe_tokens", bpe)
      .withColumn("avg_token_len_ppm",
        ppm(charsInToks.cast("double") / nTokens.cast("double")))
      .withColumn("stop_ratio_ppm", ppm(stopRatio))
      .withColumn("quality_ppm",
        ppm(lengthScore * lit(0.5d) + stopRatio * lit(0.5d)))
  }

  /** Language-ID: distinct-token hits against each language's stopword
    * list; argmax with a fixed tie-break order (list order above), or
    * "unknown" when nothing hits. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val distinctToks = array_distinct(tokens(col(textCol)))
    val scored = stopwords.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"score_$lang",
        size(array_intersect(distinctToks, array(words.map(lit): _*)))
          .cast("long"))
    }
    val langs = stopwords.map(_._1)
    val best = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
    // first language (in declaration order) reaching the max score wins
    val firstMatch = langs.foldRight(lit("unknown")) { (l, els) =>
      when(col(s"score_$l") === best, lit(l)).otherwise(els)
    }
    scored.withColumn("lang_pred", when(best === 0, lit("unknown"))
      .otherwise(firstMatch))
  }

  /** Hashed bag-of-words linear scorer — the deterministic stand-in for
    * a TRAINED fasttext-style quality classifier: each token hashes
    * into a `width`-bucket weight table and the document's margin is
    * the integer sum of its tokens' bucket weights. The weight table
    * here is synthesized from the bucket id's hash (centered in
    * [-500000, 500000]) — the honest stub for learned weights, same
    * rule as Multimodal.fakeDecode: the PLUMBING is the production
    * shape (hashing-trick projection, no vocabulary join, no shuffle,
    * scan speed at 100 TB) and a real model swaps the synthesized
    * weight for a broadcast lookup without touching the dataflow.
    * Thresholding the integer margin ≡ thresholding the sigmoid
    * (monotone), so no float math ever enters. Adds `margin` and
    * `keep` (margin ≥ 0). */
  def hashedLinearScore(df: DataFrame, textCol: String, width: Int,
      seed: Int = 0): DataFrame = {
    require(width >= 2)
    def bucket(t: Column): Column =
      pmod(Hashing.h60(concat(lit(s"$seed:"), t)), lit(width.toLong))
    def weightOf(b: Column): Column =
      Hashing.h60(concat(lit("wt:"), b.cast("string"))) % 1000001L - 500000L
    val margin = aggregate(
      transform(tokens(col(textCol)), t => weightOf(bucket(t))),
      lit(0L), (acc, x) => acc + x)
    df.withColumn("margin", margin)
      .withColumn("keep", col("margin") >= 0L)
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * stable under token reordering, the cheap "document identity" used
    * before the heavier near-dup stages. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Adjacent-token pairs — the counting substrate for tokenizer
    * training (a BPE merge step picks the most frequent adjacent pair
    * corpus-wide). Pairs come straight off the token array as a
    * projection + explode: NO window shuffle; the only exchange in a
    * downstream count is the hash aggregation itself, with map-side
    * partial aggregation collapsing the (vocab²-bounded, Zipf-skewed)
    * pair space before the shuffle — the shape that holds at 10^12
    * tokens. */
  def tokenPairs(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // single-file parquet sources arrive as ONE partition — spread the
    // explode across cores first (same as substringPairs; the input is
    // doc-count-sized, the fan-out is token-count-sized)
    Partitioning.spread(df)
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("a"),
            element_at(toks, i + 2).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>")))
      .as("pair"))
      .select(col("pair.a").as("a"), col("pair.b").as("b"))
  }

  /** Top-k adjacent pairs by count — deterministic total order
    * (count desc, then pair) so the cut is engine-portable. */
  def topPairs(df: DataFrame, textCol: String, k: Int): DataFrame =
    tokenPairs(df, textCol)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(k)

  /** TF-IDF top-k terms per document, in EXACT RATIONAL FORM:
    * `score = (tf × N × 1e6) div df` — pure integer arithmetic, so both
    * engines agree bit-for-bit (a float `log` idf would diverge across
    * libm implementations). Monotonic in tf/df exactly like the log
    * form for ranking purposes. Two hash aggs (tf, df) + one join on
    * token (vocabulary-sized — AQE broadcasts it when small) + one
    * window for the per-doc rank. Overflow bound: tf × N × 1e6 must fit
    * int64 — fine to ~10^12 token occurrences; shard the corpus id
    * space beyond that. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.dropDuplicates("doc_id", "token")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.count() // corpus size: one scalar the pipeline knows
    graft.operators.TopK.topKPerGroup(
      tf.join(dfreq, "token")
        .withColumn("score", expr(s"(tf * ${n}L * 1000000L) div df")),
      groupKeys = Seq(col("doc_id")),
      orderBy = Seq(col("score").desc, col("token").asc),
      k = k)
  }

  /** Unigram surprisal quality score — the engine-exact stand-in for
    * LM-perplexity filtering (CCNet scores documents with a 5-gram
    * KenLM; the unigram form ranks the same extremes): each token's
    * surprisal is `bitlen(N) − bitlen(tf)` ≈ log₂(N/tf) in INTEGER
    * bit-length arithmetic (`length(bin(x))` — identical in Spark and
    * DuckDB, no float log anywhere), and a document scores the floor-ppm
    * mean over its tokens. High mean surprisal = rare-token-heavy
    * (OCR noise, gibberish, exotic boilerplate); low = common-token
    * sludge — both tails are the filter targets, exactly how
    * perplexity is used.
    *
    * Shape: one token explode + one vocabulary-sized frequency
    * aggregate + the token→frequency join (vocabulary-sized build side
    * — AQE broadcasts it) + one per-doc aggregate; the corpus total is
    * a single count action (the same scalar [[tfidfTopTerms]] takes).
    * Output: (idCol, n_toks, sum_bits, mean_surprisal_ppm). */
  def unigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("token"))
    // vocabulary-sized; pinned once so the corpus total comes from a
    // sum over THIS aggregate, not a third full corpus explode, and the
    // join build side is not recomputed
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val total = freq.agg(sum(col("tf"))).collect()(0).getLong(0)
    toks.join(freq, "token")
      .withColumn("bits",
        (length(bin(lit(total))) - length(bin(col("tf")))).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("sum_bits"))
      .withColumn("mean_surprisal_ppm",
        expr("sum_bits * 1000000L DIV n_toks"))
  }

  /** Bigram-LM surprisal — the fluency-proxy quality score one tier up
    * from [[unigramSurprisal]]: per token transition, bits ≈
    * log2(context count / bigram count) via the integer bit-length log
    * (`length(bin(x))` = floor(log2 x)+1 — deterministic and identical
    * in the DuckDB oracle, the repo's standing no-float-logs rule).
    * High mean surprisal = improbable transitions (shuffled text, OCR
    * noise, spam); low = fluent high-frequency phrasing. This is the
    * shape of KenLM-style perplexity filtering with the corpus itself
    * as the LM.
    *
    * Scale: the bigram/context frequency tables are vocab²-bounded —
    * tiny next to the corpus — so both joins broadcast and the corpus
    * side streams at scan speed; the only data-volume shuffle is the
    * per-doc rollup. */
  def bigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val pairsCol = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("prev"),
          element_at(t, i + 2).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    val bg = Partitioning.spread(docs)
      .select(col(idCol), explode(pairsCol).as("b"))
      .select(col(idCol), col("b.prev").as("prev"), col("b.cur").as("cur"))
      .localCheckpoint() // consumed by both freq aggs + the score join
    val bf = bg.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("bf"))
    val cf = bg.groupBy(col("prev")).agg(count(lit(1)).as("cf"))
    bg.join(broadcast(bf), Seq("prev", "cur"))
      .join(broadcast(cf), Seq("prev"))
      .withColumn("bits",
        (length(bin(col("cf"))) - length(bin(col("bf")))).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
      .withColumn("mean_surprisal_ppm",
        expr("sum_bits * 1000000L DIV n_bigrams"))
  }

  /** DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score each RAW-pool document by how much more likely its hashed
    * bigrams are under a bag-of-features model of a small TARGET set
    * than under the raw pool's own model — the standing technique for
    * steering a web-scale crawl toward a high-quality reference
    * corpus before training. Features are whitespace bigrams hashed
    * into `buckets` counters (the hashing trick bounds BOTH models at
    * `buckets` regardless of vocabulary — the reason DSIR runs at
    * crawl scale at all). The per-doc log weight
    * `log w(x) = Σ_f c_f(x)·[log p_tgt(f) − log p_raw(f)]` uses the
    * integer bit-length log (`length(bin(x))` = floor(log2 x)+1 — the
    * repo's no-float-logs rule), add-one smoothed so an unseen bucket
    * never divides by zero:
    * `score_bits = Σ_f c_f·[bits(tgt_f+1) − bits(raw_f+1)]
    *             + n_feats·[bits(Traw) − bits(Ttgt)]`
    * with `T_side = N_side + buckets` (the smoothed totals). Positive
    * = target-like. Selection policy stays separate by design — feed
    * the scores to [[graft.pipeline.Sampling.importanceResample]] or
    * a threshold; this op only ranks.
    *
    * Scale shape: one corpus explode feeds ONE buckets-bounded
    * aggregate building both models (map-side combined); the
    * buckets-bounded weight table BROADCASTS back onto the per-doc
    * feature counts, so the only data-volume exchanges are the
    * (doc, f) count and the per-doc rollup. Raw docs with no bigram
    * (< 2 tokens) score 0 and are KEPT — a scorer that silently drops
    * rows poisons every downstream join. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"dsirWeights: buckets must be >= 1, got $buckets")
    // a NULL predicate (e.g. a null source column) must not drop the
    // doc from both models AND the scored spine — the keep-every-row
    // contract above; null = not target, i.e. a raw-pool member
    val isTgt = coalesce(isTarget, lit(false))
    val t = tokens(col(textCol))
    val pairsCol = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    val feats = Partitioning.spread(docs)
      .select(col(idCol), isTgt.as("is_tgt"), explode(pairsCol).as("b"))
      .select(col(idCol), col("is_tgt"),
        (Hashing.h60(col("b")) % buckets).as("f"))
      .localCheckpoint() // feeds the model agg AND the per-doc counts
    val models = feats.groupBy(col("f"))
      .agg(sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt"),
        sum(when(col("is_tgt"), 0L).otherwise(1L)).as("raw"))
      .localCheckpoint() // buckets-bounded; totals + weight join reuse it
    val totals = models.agg(sum(col("tgt")), sum(col("raw"))).collect()(0)
    val tTgt = (if (totals.isNullAt(0)) 0L else totals.getLong(0)) + buckets
    val tRaw = (if (totals.isNullAt(1)) 0L else totals.getLong(1)) + buckets
    def bitsOf(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    // the normalization constant is per-corpus, not per-row — driver math
    val constBits = bitsOf(tRaw) - bitsOf(tTgt)
    val w = models.select(col("f"),
      (length(bin(col("tgt") + 1)) - length(bin(col("raw") + 1)))
        .cast("long").as("w_bits"))
    val scored = feats.filter(!col("is_tgt"))
      .groupBy(col(idCol), col("f")).agg(count(lit(1)).as("c"))
      .join(broadcast(w), Seq("f"))
      .groupBy(col(idCol))
      .agg(sum(col("c") * col("w_bits")).as("fw"),
        sum(col("c")).as("n_feats"))
    docs.filter(!isTgt).select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("fw") + col("n_feats") * lit(constBits), lit(0L))
          .as("score_bits"))
  }

  /** Longest intra-document repeated token run — the degenerate-
    * generation detector ([[withRepetition]]'s n-gram ratio says HOW
    * MUCH repeats; this says HOW LONG the longest verbatim self-repeat
    * is, the signal that catches looping generations and template
    * stuffing): k-token window hashes self-joined WITHIN each doc
    * (pa < pb), runs collapsed on the (diag = pb−pa) islands exactly
    * like the cross-doc [[graft.pipeline.Dedup.substringPairs]], max
    * run + k − 1 tokens. Docs with no repeated window report 0.
    *
    * Cost note: a window repeated m times in one doc fans out m²/2
    * pairs — bounded by the DOCUMENT length, never the corpus (the
    * self-join key is (doc, hash)), so the 100 TB shape is safe
    * without a df-cap; a single pathological doc is the failure mode,
    * and a length gate upstream (p26) is the guard. */
  def longestSelfRepeat(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val wins = Partitioning.spread(docs)
      .select(col(idCol),
        posexplode(when(size(toks) >= k,
          transform(sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
          .otherwise(array().cast("array<string>"))))
      .select(col(idCol), col("pos"), Hashing.h60(col("col")).as("h"))
      .localCheckpoint() // both sides of the within-doc self-join
    val a = wins.select(col(idCol), col("pos").as("pa"), col("h"))
    val b = wins.select(col(idCol), col("pos").as("pb"), col("h"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("diag"), col("pa"))
    val prevDiag = lag(col("diag"), 1).over(w)
    val prevPa = lag(col("pa"), 1).over(w)
    val isNew = when(prevDiag.isNull || prevDiag =!= col("diag") ||
      prevPa =!= col("pa") - 1, 1L).otherwise(0L)
    val runs = a.join(b, Seq(idCol, "h")).filter(col("pa") < col("pb"))
      .withColumn("diag", col("pb") - col("pa"))
      .withColumn("island", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("diag"), col("island"))
      .agg(count(lit(1)).as("run_win"))
      .groupBy(col(idCol))
      .agg((max(col("run_win")) + lit(k - 1).cast("long"))
        .as("longest_repeat"),
        sum(col("run_win")).as("n_repeat_windows"))
    docs.select(col(idCol)).join(runs, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("longest_repeat"), lit(0L)).as("longest_repeat"),
        coalesce(col("n_repeat_windows"), lit(0L)).as("n_repeat_windows"))
  }

  /** Sliding-window chunking — the RAG-export primitive: fixed
    * `window`-token chunks at `stride`-token steps, the last chunk
    * truncated at the document end, short docs yielding one chunk.
    * Complements [[Chunking]]'s content-defined chunks: CDC optimizes
    * dedup stability, sliding windows optimize retrieval coverage
    * (every token is inside ⌈window/stride⌉ chunks). Pure per-row
    * array expressions + one posexplode — no shuffle at all; at
    * 100 TB this is a scan-speed projection feeding the embedding
    * stage. */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    val t = tokens(col(textCol))
    val n = size(t)
    val nChunks = when(n <= window, lit(1))
      .otherwise(expr(s"(size(${textCol}_toks) - $window + $stride - 1) " +
        s"DIV $stride + 1"))
    Partitioning.spread(docs)
      .withColumn(s"${textCol}_toks", t)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1), c =>
          concat_ws(" ", slice(col(s"${textCol}_toks"),
            c * stride + 1, lit(window))))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk"),
        size(split(col("col"), " +")).cast("long").as("n_tokens"))
  }

  /** Frequency-vocabulary with a coverage cutoff — the tokenizer-
    * training step that picks "the smallest vocab covering X% of
    * corpus tokens": rank tokens by corpus frequency (count desc, token
    * asc tie), cumulative coverage in floor-ppm, keep every rank whose
    * PRECEDING cumulative coverage is below the cutoff (so the rank
    * that crosses the line is included). The corpus-sized stage is one
    * map-side-combined count; the rank/cumsum over the vocab-sized
    * frequency table is [[Partitioning.globalRankCumsum]]'s two-pass
    * distributed range rank — a web-scale vocabulary (10⁸+ tokens)
    * never funnels through a single-task sort. */
  def vocabCoverage(docs: DataFrame, textCol: String,
      cutoffPpm: Long): DataFrame = {
    val freq = Partitioning.spread(docs)
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    Partitioning.globalRankCumsum(freq,
        Seq(col("tf").desc, col("token").asc), "tf",
        rankName = "rank", cumName = "cum", totalName = "total")
      .withColumn("cum_ppm", expr("cum * 1000000 DIV total"))
      .withColumn("prev_ppm", expr("(cum - tf) * 1000000 DIV total"))
      .filter(col("prev_ppm") < cutoffPpm)
      .select(col("rank"), col("token"), col("tf"), col("cum_ppm"))
  }

  /** Eval-set decontamination: flag training documents sharing any word
    * n-gram with an evaluation document, with the shared-distinct-gram
    * count as evidence. The join is an inverted index keyed by the
    * 60-bit gram hash; the eval side is tiny relative to the corpus
    * (thousands of docs vs billions), so it broadcasts and the train
    * side streams through at scan speed — the shape this op needs at
    * 100 TB. Long n-grams (8+) keep the index selective. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col(as), Hashing.h60(col("g")).as("h"))
    // the train side is the 100 TB side — spread its shingle explode
    // across cores (a single-file source otherwise runs it on one task)
    grams(Partitioning.spread(train), "train_" + idCol)
      .join(grams(eval, "eval_" + idCol), "h")
      .groupBy(col("train_" + idCol), col("eval_" + idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Repetition ratio: 1 − distinct/total word n-grams, as ppm — the
    * degenerate-text detector (looping generations, boilerplate spam).
    * Pure per-row projection, no shuffle. */
  def withRepetition(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.withColumn("n_grams", size(grams).cast("long"))
      .withColumn("n_distinct_grams",
        size(array_distinct(grams)).cast("long"))
      .withColumn("rep_ppm",
        when(col("n_grams") === 0, lit(0L)).otherwise(
          ppm(lit(1.0d) - col("n_distinct_grams").cast("double") /
            col("n_grams").cast("double"))))
  }

  /** Winnowing fingerprints (the MOSS scheme): hash every word k-gram,
    * slide a w-wide window over the positions, keep each window's
    * minimum hash, emit the distinct selected hashes per document. Two
    * documents sharing a sufficiently long run of text share selected
    * fingerprints regardless of alignment — the position-robust
    * containment/plagiarism detector that set-based fingerprints
    * (md5-of-sorted-tokens) can't provide. One window shuffle on
    * doc_id; fingerprint density is ~2/(w+1) of the k-gram count. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    // single-file sources arrive as one partition — spread the
    // gram explode across cores (the window re-shuffles by doc anyway)
    val pos = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
        posexplode(grams).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), Hashing.h60(col("gram")).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    pos.select(col("doc_id"), min(col("h")).over(win).as("fp"))
      .distinct()
  }

  /** Containment pairs — the partial-copy detector (a page quoting half
    * of another page), which symmetric near-dup measures miss: for a
    * candidate pair, containment(i⊂j) = |fp_i ∩ fp_j| / |fp_i| over the
    * winnowing fingerprints ([[winnowFingerprints]] — position-robust
    * by construction). Fingerprints above `dfCap` document frequency
    * are dropped from candidate generation (boilerplate control — the
    * standard cap that keeps the postings join subquadratic at corpus
    * scale; denominators still count every fingerprint, so a dropped
    * posting can only LOWER a score, never fake one). Ratios are
    * integer ppm (engine-exact); pairs survive when either direction's
    * containment reaches `minPpm`. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, dfCap: Int, minPpm: Long): DataFrame =
    containmentOver(
      winnowFingerprints(docs, idCol, textCol, k, w)
        .localCheckpoint(), // sizes + two join sides from one computation
      dfCap, minPpm)

  /** Shared containment tail over an (doc_id, fp) postings frame:
    * df-cap the fingerprints (boilerplate control), count pairwise
    * intersections via the postings self-join, and score containment
    * per direction against each side's FULL (pre-cap) set size.
    * Package-visible: [[Chunking.chunkContainment]] feeds it CDC chunk
    * hashes as the fingerprint space. */
  private[pipeline] def containmentOver(fps: DataFrame, dfCap: Int,
      minPpm: Long): DataFrame = {
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= dfCap)
      .select(col("fp"))
    val kept = fps.join(rare, "fp")
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val shared = kept.select(col("doc_id").as("i"), col("fp"))
      .join(kept.select(col("doc_id").as("j"), col("fp")), "fp")
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("i"), col("n_fp").as("n_fp_i")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n_fp").as("n_fp_j")), "j")
      .withColumn("containment_i_ppm",
        expr("(n_shared * 1000000L) DIV n_fp_i"))
      .withColumn("containment_j_ppm",
        expr("(n_shared * 1000000L) DIV n_fp_j"))
      .filter(greatest(col("containment_i_ppm"),
        col("containment_j_ppm")) >= minPpm)
  }

  /** Cross-source overlap matrix — the corpus-level copying report
    * (which sources quote/mirror which): each source's DISTINCT
    * n-shingle hash set feeds the same df-capped containment tail, at
    * source granularity. #sources² cells, but the work is one distinct
    * aggregation plus the capped postings self-join — source-level
    * postings are vocabulary-sized, not corpus-sized, so the matrix is
    * cheap even when the corpus is not. */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
      n: Int, dfCap: Int, minPpm: Long): DataFrame =
    containmentOver(
      Partitioning.spread(docs)
        .select(col(sourceCol).as("doc_id"),
          explode(Dedup.shingles(col(textCol), n)).as("g"))
        .select(col("doc_id"), Hashing.h60(col("g")).as("fp"))
        .distinct()
        .localCheckpoint(),
      dfCap, minPpm)

  /** Canonical text normalization — the pre-dedup step that makes
    * near-identical documents hash-identical: lowercase, strip
    * non-alphanumeric-non-space characters (ASCII class — locale-free,
    * so every engine agrees), collapse whitespace runs, trim.
    * Idempotent by construction (normalize∘normalize = normalize —
    * spec-pinned), pure codegen'd projection (lower/regexp_replace/
    * trim are native expressions): at 100 TB it runs at scan speed
    * ahead of the hash. The regexes stay in the Java∩RE2 dialect so
    * the DuckDB oracle applies the identical strings (the
    * [[piiRules]] rule). */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Cross-document duplicated n-gram profile — for each document, how
    * many of its distinct word n-grams also appear in at least one
    * OTHER document (the corpus-level "duplicated 10-gram fraction"
    * quality signal; distinct from [[withRepetition]], which measures
    * repetition WITHIN one document, and from [[containmentPairs]],
    * which scores specific pairs).
    *
    * Scale shape: linear end to end. Grams are hashed to 60-bit longs
    * before leaving the projection (shuffle rows are (long, id), never
    * strings), the document-frequency aggregate is one map-side-combined
    * groupBy on the gram hash, and the postings join multiplies each
    * (doc, gram) row by exactly the ONE df row for its gram — a hot
    * boilerplate gram costs df rows, not df² like a pair join. Final
    * per-doc rollup is the second and last shuffle. No df-cap is needed
    * here (unlike the containment/overlap pair joins): there is no
    * quadratic term to bound.
    *
    * ppm fraction uses integer division (`div`) — deterministic and
    * bit-identical in the DuckDB oracle (`//`). */
  def crossDocDupGrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = Partitioning.spread(docs)
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col(idCol), Hashing.h60(col("g")).as("gh"))
      .localCheckpoint() // consumed twice (df aggregate + postings join)
    val gdf = grams.groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
    grams.join(gdf, Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") >= 2, 1L).otherwise(0L)).as("dup_grams"))
      .withColumn("dup_frac_ppm",
        call_function("div", col("dup_grams") * lit(1000000L),
          col("n_grams")))
  }

  /** Corpus-statistic boilerplate stripping (CCNet-style): drop from
    * every document the tokens whose per-SOURCE document frequency is
    * at or above `dfPpm` (navigation chrome, legal footers, the words a
    * crawler's template injects everywhere), then reassemble the text in
    * original token order. The stoplist is LEARNED from the corpus being
    * processed — per source, since boilerplate is a property of where
    * the text came from — not a fixed word list.
    *
    * Scale shape: the df aggregate keys on (source, token) — vocab-
    * bounded, tiny next to the corpus — and the resulting boilerplate
    * set is smaller still (only tokens above the threshold), so the
    * removal anti-join broadcasts. The rebuild is ONE groupBy on the doc
    * id collecting (pos, token) structs bounded by document length.
    * Docs whose every token is boilerplate survive with empty text (the
    * left join back to the corpus), so downstream row accounting never
    * loses ids. */
  def stripBoilerplate(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, dfPpm: Long): DataFrame = {
    val toks = Partitioning.spread(docs)
      .select(col(idCol), col(sourceCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .localCheckpoint() // consumed by df agg + removal + rebuild
    val srcDocs = docs.groupBy(col(sourceCol))
      .agg(count_distinct(col(idCol)).as("src_docs"))
    val boiler = toks.select(col(idCol), col(sourceCol), col("tok")).distinct()
      .groupBy(col(sourceCol), col("tok"))
      .agg(count(lit(1)).as("tok_docs"))
      .join(broadcast(srcDocs), Seq(sourceCol))
      .filter(expr(s"tok_docs * 1000000 DIV src_docs") >= dfPpm)
      .select(col(sourceCol), col("tok"))
    val kept = toks.join(broadcast(boiler), Seq(sourceCol, "tok"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x("tok"))).as("__t"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol), col(sourceCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col(sourceCol),
        coalesce(col("__t"), lit("")).as(textCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** PII redaction rules: (name, pattern, replacement), applied in
    * order. The patterns stay inside the Java-regex ∩ RE2 dialect (no
    * lookaround, no backrefs) so the DuckDB oracle applies the
    * identical strings. */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"))

  /** Regex PII scrub — the pre-training redaction pass: per rule a
    * match count column (`n_<name>`) and the text with all matches
    * replaced, applied in rule order. Pure projection, codegen'd
    * (regexp_replace/regexp_count are native expressions), so at 100 TB
    * this runs at scan speed; rules are broadcast as literals. */
  def redactPii(df: DataFrame, textCol: String,
      rules: Seq[(String, String, String)] = piiRules): DataFrame = {
    val counted = rules.foldLeft(df) { case (acc, (name, re, _)) =>
      acc.withColumn(s"n_$name", regexp_count(col(textCol), lit(re)))
    }
    val redacted = rules.foldLeft(col(textCol)) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }
    counted.withColumn("redacted", redacted)
  }

  /** Gopher-style heuristic quality rules (the repetition signal is
    * [[withRepetition]]'s): word count bounds, mean word length bounds,
    * a minimum stopword share. Each metric is emitted alongside the
    * verdict so the filter is auditable; ratios are floor-ppm rationals
    * (engine-exact). Pure projection. */
  def gopherQuality(df: DataFrame, textCol: String,
      minWords: Int, maxWords: Int,
      minMeanWordLenPpm: Long, maxMeanWordLenPpm: Long,
      minStopwordPpm: Long): DataFrame = {
    val toks = tokens(col(textCol))
    val en = array(stopwords.head._2.map(lit): _*)
    // collision-free working names (SkewJoin's rule): a user column
    // must never be silently replaced and then dropped
    def free(base: String) = Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()
    val chars = free("__chars")
    val stop = free("__stop")
    df.withColumn("n_words", size(toks).cast("long"))
      .withColumn(chars, aggregate(
        transform(toks, t => length(t)), lit(0L), (acc, x) => acc + x))
      .withColumn(stop,
        size(filter(toks, t => array_contains(en, t))).cast("long"))
      // exact rational ppm via integer division (matches DuckDB `//`)
      .withColumn("mean_word_len_ppm", expr(
        s"CASE WHEN n_words = 0 THEN 0L ELSE $chars * 1000000L DIV n_words END"))
      .withColumn("stopword_ppm", expr(
        s"CASE WHEN n_words = 0 THEN 0L ELSE $stop * 1000000L DIV n_words END"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len_ppm")
          .between(minMeanWordLenPpm, maxMeanWordLenPpm) &&
        col("stopword_ppm") >= minStopwordPpm)
      .drop(chars, stop)
  }

  /** Sequence packing: lay the corpus out as one deterministic token
    * stream (ordered by `idCol` within each `shardCol` group) and
    * assign every document to the fixed-size training bin its first
    * token falls in — the standard pre-tokenization packing pass.
    * One window shuffle keyed on the shard; at 100 TB the shard IS the
    * physical partition (pack within source/date shards, never a
    * global order — a global cumsum would serialize the corpus through
    * one partition). */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
      textCol: String, binTokens: Long): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
    df.withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("offset",
        coalesce(sum(col("n_tokens"))
          .over(win.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("bin", expr(s"offset DIV $binTokens"))
  }

  /** Epoch-shuffled packing v2 — the training-export composition that
    * [[packSequences]] (running-fill packing) and shuffle-shard (p64)
    * individually lack: each training epoch re-permutes the corpus
    * with an independent seeded hash (`h60(seed:epoch:id)`) and packs
    * THAT order into fixed token-budget bins, so no two epochs present
    * documents in the same order or bin composition, yet every epoch
    * is reproducible from (seed, epoch) alone — no RNG state to ship.
    *
    * Scale shape: token counts are computed ONCE (narrow projection),
    * then the epoch dimension explodes rows ×epochs BEFORE the one
    * window shuffle keyed on (epoch, shard). Each window partition
    * holds ~corpus/shards documents regardless of corpus size — the
    * shard count bounds task state, and bins never span shards (the
    * export writers that consume them are shard-local anyway). A
    * global per-epoch cumsum would serialize the corpus through one
    * partition; the per-shard form is the one that survives 100 TB. */
  def packEpochs(df: DataFrame, idCol: String, textCol: String,
      epochs: Int, shards: Int, binTokens: Long, seed: Int): DataFrame = {
    require(epochs > 0 && shards > 0 && binTokens > 0,
      s"packEpochs: epochs=$epochs shards=$shards binTokens=$binTokens")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col(idCol))
    df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("h", Hashing.h60(concat(lit(s"$seed:"),
        col("epoch").cast("string"), lit(":"), col(idCol).cast("string"))))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos", row_number().over(win))
      .withColumn("offset",
        coalesce(sum(col("n_tokens"))
          .over(win.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("bin", expr(s"offset DIV $binTokens"))
  }
}
