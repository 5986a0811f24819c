package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the curation step a training-data
  * pipeline runs between dedup and training. Both operators are seeded
  * by the portable 60-bit md5 hash ([[Hashing.h60]]) instead of an RNG,
  * so every re-run — and every engine — selects the same rows: the
  * sample is reproducible across a 1000-executor cluster, across
  * retries, and across the DuckDB oracle.
  */
object Sampling {

  /** Bernoulli-style fractional sample: keep a row iff the hash of its
    * id, mod 1e6, falls below `ppm`. A pure narrow filter with no
    * shuffle — at 100 TB it runs at scan speed and prunes rows before
    * any downstream exchange. */
  def bernoulliPpm(df: DataFrame, idCol: String, ppm: Long,
      seed: Int = 0): DataFrame =
    df.filter(Hashing.h60(seed, col(idCol).cast("string")) % 1000000L < ppm)

  /** Importance (weighted) sampling: keep a row iff its hash bucket
    * falls below the row's OWN keep-probability `weightPpm` (clamped to
    * [0, 1e6]) — the quality-weighted downsampling pass (keep all
    * high-quality documents, a sliver of boilerplate), reproducible
    * because the coin is the id hash, not an RNG. Expected kept
    * fraction per stratum = mean(weightPpm)/1e6; still a pure narrow
    * filter, zero shuffles, scan speed at any scale. */
  def weightedPpm(df: DataFrame, idCol: String, weightPpm: Column,
      seed: Int = 0): DataFrame = {
    // a null weight would evaluate the comparison to null and SILENTLY
    // drop the row — fail loudly instead (same rule as sourceMix's
    // weight guard); the guard rides the threshold expression itself so
    // no pruning can optimize the validation away
    val threshold = when(weightPpm.isNull,
        raise_error(lit("weightedPpm: null weight")))
      .otherwise(
        greatest(lit(0L), least(lit(1000000L), weightPpm.cast("long"))))
    df.filter(
      Hashing.h60(seed, col(idCol).cast("string")) % 1000000L < threshold)
  }

  /** Deterministic negative-pair mining — the contrastive-training
    * sampler ("give every document k random non-matching partners")
    * WITHOUT the cross join: the corpus is hashed into `buckets`
    * representative docs (min id per hash bucket — one hash aggregate,
    * B rows, broadcastable), and each document draws its k partners by
    * hashing (id, draw) into the bucket space. Fully reproducible (hash
    * coins, no RNG), self-pairs dropped, duplicate draws collapsed.
    *
    * Scale shape: one B-row aggregate + one broadcast join against it —
    * the corpus streams through at scan speed; B grows to taste
    * (2¹⁶-2²⁰ at 10⁹ docs) and bounds both the representative table and
    * the diversity of the negative pool, the standard corpus-level-
    * negatives trade-off (in-batch negatives cover the rest). */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
      buckets: Int, seed: Int = 0): DataFrame = {
    require(k >= 1 && buckets >= 2)
    val idStr = col(idCol).cast("string")
    val reps = df
      .select(pmod(Hashing.h60(seed, idStr), lit(buckets.toLong)).as("b"),
        col(idCol).as("neg_id"))
      .groupBy(col("b")).agg(min(col("neg_id")).as("neg_id"))
    val draws = df.select(col(idCol),
      explode(array((1 to k).map(j =>
        pmod(Hashing.h60(seed + j, idStr), lit(buckets.toLong))): _*)).as("b"))
    draws.join(broadcast(reps), Seq("b"))
      .filter(col(idCol) =!= col("neg_id"))
      .select(col(idCol), col("neg_id")).distinct()
  }

  /** Deterministic train/val/test split: each row's hash bucket
    * (mod 1e6) picks its split — `[0, trainPpm)` → train,
    * `[trainPpm, trainPpm+valPpm)` → val, the rest → test. A row's
    * assignment depends only on its id and the seed, never on other
    * rows, so splits are stable under corpus growth/shuffling and
    * identical on every engine and every re-run. Pure projection —
    * zero shuffles, scan speed at any scale. */
  def splitAssign(df: DataFrame, idCol: String, trainPpm: Long,
      valPpm: Long, seed: Int = 0): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L)
    val bucket = Hashing.h60(seed, col(idCol).cast("string")) % 1000000L
    df.withColumn("split",
      when(bucket < trainPpm, lit("train"))
        .when(bucket < trainPpm + valPpm, lit("val"))
        .otherwise(lit("test")))
  }

  /** Source-mix reweighting — thin each source toward TARGET mix
    * weights without ever upsampling: given per-source weights w_s, the
    * largest feasible output size is T = min_s floor(n_s·W / w_s)
    * (bounded by the scarcest source relative to its target), each
    * source keeps m_s = floor(w_s·T / W) rows, and rows are selected by
    * the deterministic hash filter at keep_ppm = floor(m_s·10⁶ / n_s).
    * All integer arithmetic — engine-exact — and fully in-plan: one
    * tiny per-source count aggregate broadcast back onto the corpus, a
    * hash filter after it. At 100 TB the corpus side stays at scan
    * speed; only #sources rows move.
    *
    * `weight` must be an expression over `sourceCol` and/or `n_source`
    * (it is evaluated on the per-source counts frame — size-derived
    * weights like temperature flattening `floor(sqrt(n_source))` are
    * in scope). Adds `weight`, `n_source`, `keep_ppm`, `keep` to every
    * row. */
  def sourceMix(df: DataFrame, idCol: String, sourceCol: String,
      weight: Column, seed: Int = 0): DataFrame = {
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_source"))
      .withColumn("weight", weight.cast("long"))
    val w = Window.partitionBy() // #sources rows — a trivial frame
    val quotas = counts
      .withColumn("__W", sum(col("weight")).over(w))
      .withColumn("__T",
        min(expr("(n_source * __W) DIV weight")).over(w))
      .withColumn("__m", expr("(weight * __T) DIV __W"))
      .withColumn("keep_ppm", expr("(__m * 1000000L) DIV n_source"))
      // a null/zero/negative weight would make the integer DIVs above
      // null out that source's quota and silently drop its rows — fail
      // loudly instead. The guard rides ON THE JOIN KEY so column
      // pruning can never optimize the validation away (a guard on a
      // payload column vanishes under e.g. `.count()`).
      .select(
        when(col("weight").isNull || col("weight") <= 0,
          raise_error(concat(
            lit("sourceMix: weight must be a positive integer for source "),
            col(sourceCol).cast("string"))))
          .otherwise(col(sourceCol)).as(sourceCol),
        col("n_source"), col("weight"), col("keep_ppm"))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("keep",
        Hashing.h60(seed, col(idCol).cast("string")) % 1000000L <
          col("keep_ppm"))
  }

  /** Token-budget greedy selection — the "fill each source's quota"
    * curation step: per group, rows are taken in a deterministic
    * hash-shuffled order (optionally behind caller-supplied priority
    * columns, e.g. quality DESC) while the running token total stays
    * within `budget`. The kept set is exactly the maximal prefix of the
    * group's order whose cumulative token count fits — reproducible on
    * any engine and any partitioning because the order is (priority,
    * id-hash, id), never an RNG or arrival order.
    *
    * Cost is one window shuffle keyed on the group column (same
    * exchange profile as [[stratifiedCap]]); the cumulative sum is a
    * running frame, not a self-join. Adds `cum_tokens`. */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, idCol: String,
      tokens: Column, budget: Long, priority: Seq[Column] = Nil,
      seed: Int = 0): DataFrame = {
    require(budget >= 0)
    // a null/negative count would null the running sum from its row
    // onward (or grow the budget) and silently mis-select — fail loudly;
    // the guard rides the summed expression so pruning cannot drop it
    val t = when(tokens.isNull || tokens < 0,
        raise_error(lit("tokenBudgetSelect: token count must be " +
          "non-negative and non-null")))
      .otherwise(tokens.cast("long"))
    val h = Hashing.h60(seed, col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(priority :+ h.asc :+ col(idCol).asc: _*)
    df.withColumn("cum_tokens", sum(t).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic shuffle-and-shard — the training-export layout step:
    * every row lands in `shard = h(id) % shards` at position
    * `shard_pos` = its rank in the shard's hash order. This is a
    * GLOBAL reproducible shuffle (reader order = hash order, unrelated
    * to source order) expressed as the exact plan the export write path
    * runs anyway: one hash exchange on the shard id + a per-shard sort
    * (`repartition(shard).sortWithinPartitions`), so proving the
    * positions here prices the real thing. At 100 TB the shard count
    * scales with target file size (e.g. ~1 GB/shard), keeping every
    * sort task bounded; no driver state, no RNG, stable under re-runs
    * and retries. */
  def shuffleShard(df: DataFrame, idCol: String, shards: Int,
      seed: Int = 0): DataFrame = {
    require(shards >= 1)
    val h = Hashing.h60(seed, col(idCol).cast("string"))
    df.withColumn("shard", pmod(h, lit(shards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(h.asc, col(idCol).asc)))
  }

  /** Importance resampling to MATCH a target distribution — the
    * domain-matching curation step ("thin the crawl until its length /
    * quality histogram looks like the reference corpus"): per value
    * bin, the acceptance probability is
    * `min(1, (cnt_target/n_target) / (cnt_src/n_src))` in exact ppm
    * integer arithmetic (`cnt_t·n_s·10^6 div (cnt_s·n_t)` through
    * DECIMAL(38,0) — no float ratios), and each row is kept iff its
    * seeded 60-bit hash mod 1e6 falls under its bin's weight — the
    * same portable-hash bernoulli as [[bernoulliPpm]], so the kept set
    * is identical on every engine and re-run. Bins absent from the
    * target get weight 0 (nothing to match); bins where the source is
    * UNDER-represented cap at 1e6 (never upsample — the
    * [[sourceMix]] rule).
    *
    * Scale shape: two bin histograms (hash aggregates, each tiny
    * output), then ONE broadcast join of the per-bin weight table onto
    * the source scan — the big side never shuffles. */
  def importanceResample(src: DataFrame, target: DataFrame, idCol: String,
      value: Column, binWidth: Long, seed: Int = 0): DataFrame = {
    require(binWidth >= 1)
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = value.cast("long")
    // same loud guard as Sketches.histogram: null/negative values would
    // silently land in a wrong bin
    val bin = when(v.isNull || v < 0, raise_error(
        lit("importanceResample: value must be non-negative and non-null")))
      .otherwise(call_function("div", v, lit(binWidth)))
    def hist(df: DataFrame, cName: String) =
      df.select(bin.as("bin")).groupBy(col("bin"))
        .agg(count(lit(1)).as(cName))
    val hs = hist(src, "cnt_s").withColumn("n_s",
      sum(col("cnt_s")).over(Window.partitionBy()))
    val ht = hist(target, "cnt_t").withColumn("n_t",
      sum(col("cnt_t")).over(Window.partitionBy()))
    val weights = hs.join(ht, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(
          least(lit(1000000L), call_function("div",
            coalesce(col("cnt_t"), lit(0L)).cast(D) * col("n_s").cast(D) *
              lit(1000000),
            col("cnt_s").cast(D) * coalesce(col("n_t"), lit(1L)).cast(D))
            .cast("long")),
          lit(0L)).as("weight_ppm"))
    src.withColumn("bin", bin)
      .join(broadcast(weights), Seq("bin"))
      .filter(pmod(Hashing.h60(seed, col(idCol).cast("string")),
        lit(1000000L)) < col("weight_ppm"))
  }

  /** Stratified cap: at most `n` rows per group, picked by hash rank —
    * the "balance languages / cap domains" operator. Cost is one window
    * shuffle keyed on the group column; group count is normally large
    * (languages × sources), so the shuffle spreads well. A skewed
    * mega-group should be pre-thinned with [[bernoulliPpm]] before the
    * ranking so no single task sorts the whole group. */
  def stratifiedCap(df: DataFrame, groupCol: String, idCol: String, n: Int,
      seed: Int = 0): DataFrame = {
    val h = Hashing.h60(seed, col(idCol).cast("string"))
    df.withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)))
      .filter(col("sample_rank") <= n)
  }

  /** EXACT-count stratified split: within every stratum, rank rows by
    * the seeded hash and cut at exact boundaries — ⌈train·n⌉ rows to
    * train, then ⌈(train+val)·n⌉ to val, the rest test. The contract
    * [[splitAssign]]'s independent coin flips cannot give: per-stratum
    * proportions are exact to the row, not just in expectation — what
    * an evaluation protocol needs when strata are small. Still fully
    * deterministic (hash order, id tiebreak); one rank window per
    * stratum. */
  def stratifiedSplit(df: DataFrame, groupCol: String, idCol: String,
      trainPpm: Long, valPpm: Long, seed: Int = 0): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L)
    val h = Hashing.h60(seed, col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("split",
        when(col("__rn") <= expr(s"($trainPpm * __n + 999999) DIV 1000000"),
          lit("train"))
        .when(col("__rn") <=
          expr(s"((${trainPpm + valPpm}) * __n + 999999) DIV 1000000"),
          lit("val"))
        .otherwise(lit("test")))
      .drop("__rn", "__n")
  }

  /** Rendezvous (highest-random-weight) shard assignment: each row goes
    * to the shard whose seeded hash of the row's id is largest. The
    * property that matters operationally — and that a plain
    * `hash(id) mod n` does NOT have — is MINIMAL MOVEMENT: growing the
    * fleet from n to n+1 shards reassigns only the ~1/(n+1) of rows
    * whose new shard's hash wins, everything else stays put (the spec
    * pins this). That is what lets a standing export/cache layer scale
    * out without a full reshuffle of 100 TB. Pure projection — the
    * argmax folds over a literal shard list, zero shuffle, and ties
    * break to the lowest shard id. */
  def rendezvousShard(df: DataFrame, idCol: String,
      shards: Int): DataFrame = {
    require(shards >= 1)
    // array of per-shard hashes; argmax via max(struct(hash, -shard))
    val hs = array((0 until shards).map(s =>
      struct(Hashing.h60(s, col(idCol).cast("string")).as("h"),
        lit(-s).as("ns"))): _*)
    df.withColumn("shard", (-array_max(hs).getField("ns")).cast("long"))
  }

  /** Per-group percentile-rank normalization: map a raw score to its
    * within-group percentile in floor-ppm (`(rank−1)·1e6 DIV (n−1)`,
    * singleton groups → 0) — what makes a quality score COMPARABLE
    * across sources whose raw scales differ (one crawl's median is
    * another's p95), the step before any cross-source threshold or
    * mix. Rank window + count window share the group exchange; ties →
    * lowest id, integer-exact in both engines. */
  def percentileNorm(df: DataFrame, groupCol: String, idCol: String,
      score: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(score.asc, col(idCol).asc)
    df.withColumn("score_rank", row_number().over(w).cast("long"))
      .withColumn("grp_n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("pctile_ppm",
        expr("CASE WHEN grp_n <= 1 THEN 0 " +
          "ELSE (score_rank - 1) * 1000000 DIV (grp_n - 1) END"))
      .drop("grp_n")
  }

  /** Reciprocal-rank fusion — combine several quality signals WITHOUT
    * calibrating their scales (the standard move when a classifier
    * score, a perplexity and a length heuristic disagree about units):
    * rank the corpus by each signal independently (higher = better,
    * ties → lowest id, scores must be non-null), give every row
    * `1e6 DIV (k + rank)` points per signal, keep the `topN` by total
    * points (ties → lowest id). Integer arithmetic end to end, so the
    * fusion is engine-exact — unlike any weighted-sum-of-floats blend.
    *
    * Shape — NO corpus-global rank window. Two phases, both exact:
    *
    *  1. CANDIDATE GATE: only rows inside some signal's global top-M
    *     can reach the final top-N, for M chosen so that even a row
    *     ranked M+1 in EVERY signal scores strictly below the points
    *     floor `F = 1e6 DIV (k+topN)` that signal-0's top-N rows are
    *     each guaranteed (S·(1e6 DIV (k+M+1)) < F ⇒ outsiders lose to
    *     ≥ topN candidates outright, ties included). Each gate is an
    *     `orderBy().limit(M)` — TakeOrderedAndProject, a parallel
    *     per-partition heap + driver merge of S·M rows, never a
    *     single-partition sort. A `limit(topN)`-by-id gate joins the
    *     union so all-ties corpora (every points total equal) still
    *     resolve to the lowest ids.
    *  2. EXACT RANKS BY COUNTING: a candidate's true corpus rank under
    *     signal i is 1 + |rows strictly ahead of it|. The ≤ S·M+topN
    *     candidates broadcast; one scan of the corpus joins each row to
    *     the candidates it beats in ANY signal (broadcast nested-loop,
    *     O(|cand|) comparisons per row, zero exchange) and a hash
    *     aggregate keyed on the candidate id — |cand| groups, map-side
    *     combined — counts per signal. Rank-stage shuffle volume is
    *     candidate-sized, independent of the corpus.
    *
    * The corpus is scanned S+2 times (S gates + id gate + counting
    * pass) — scan-bound and embarrassingly parallel at 100 TB, vs the
    * old shape's S full sorts through one task.
    *
    * COMPARISON BOUND (the cost model, stated like the codebook
    * bounds): |candidates| ≤ S·M + topN with M ≈ S·(k+topN) (M is the
    * smallest gate width whose outsiders score below the points floor,
    * so M grows linearly in both S and topN), hence the counting join
    * does O(S·(S·M+topN)) ≈ O(S³·(k+topN)) comparisons PER CORPUS ROW
    * and broadcasts S·M+topN candidate rows. Fine for ranking use
    * (S ≤ ~5, topN ≤ ~10⁴ ⇒ ≤ ~10⁶ comparisons/row worst case, ~MB
    * broadcast); a corpus-scale topN would silently turn the counting
    * pass into a near-cartesian with a gigabyte broadcast, so the
    * candidate bound is `require`d ≤ 1e6 and a pathological topN fails
    * LOUDLY with the windowed form named as the alternative.
    * Degenerate parameters with `k+topN > 1e6` (points floor 0) fall
    * back to the windowed form — unreachable for any sane k. */
  def rrfFusion(df: DataFrame, idCol: String, scores: Seq[Column],
      k: Int = 60, topN: Int = 100): DataFrame = {
    require(scores.nonEmpty, "need at least one score signal")
    require(k >= 0, s"rrf k must be non-negative, got $k")
    require(topN >= 1, s"topN must be positive, got $topN")
    val nSig = scores.length
    val floorPts = 1000000L / (k + topN.toLong)
    if (floorPts == 0L) return rrfFusionWindowed(df, idCol, scores, k, topN)
    // smallest M with nSig * (1e6 DIV (k+M+1)) strictly below floorPts:
    // k+M+1 > nSig*1e6/floorPts
    val m = ((nSig * 1000000L) / floorPts + 1L - k).toInt.max(topN)
    // the candidate ceiling (see scaladoc): beyond this the counting
    // pass stops being "a small broadcast against a scan" and a
    // pathological topN must fail loudly, not build a GB broadcast
    val candBound = nSig.toLong * m + topN
    require(candBound <= 1000000L,
      s"rrfFusion candidate bound S*M+topN = $candBound > 1e6 " +
        s"(signals=$nSig, gate width M=$m, topN=$topN): the exact " +
        "counting pass would broadcast and compare a candidate set " +
        "this large against every corpus row. Reduce topN (rrf is a " +
        "top-N ranking, not a corpus sort) or use rrfFusionWindowed " +
        "for corpus-scale output.")
    // evaluate each signal once so gate, counting join and points all
    // see identical values
    val base = scores.zipWithIndex.foldLeft(df) { case (acc, (sc, i)) =>
      acc.withColumn(s"_s_$i", sc)
    }
    val gates = scores.indices.map(i =>
      base.orderBy(col(s"_s_$i").desc, col(idCol).asc).limit(m)) :+
      base.orderBy(col(idCol).asc).limit(topN)
    val cands = gates.reduce(_.unionByName(_)).dropDuplicates(idCol)
    val candKeys = cands.select(col(idCol).as("_cid") +:
      scores.indices.map(i => col(s"_s_$i").as(s"_cs_$i")): _*)
    val corpus = base.select(col(idCol).as("_yid") +:
      scores.indices.map(i => col(s"_s_$i").as(s"_ys_$i")): _*)
    // "corpus row strictly ahead of candidate under signal i"
    def beats(i: Int): Column =
      col(s"_ys_$i") > col(s"_cs_$i") ||
        (col(s"_ys_$i") === col(s"_cs_$i") && col("_yid") < col("_cid"))
    val counts = corpus
      .join(broadcast(candKeys), scores.indices.map(beats).reduce(_ || _))
      .groupBy(col("_cid"))
      .agg(sum(when(beats(0), 1L).otherwise(0L)).as("_nb_0"),
        scores.indices.drop(1).map(i =>
          sum(when(beats(i), 1L).otherwise(0L)).as(s"_nb_$i")): _*)
      // comparisons reference both sides' score columns; drop the
      // candidate copies so the join back to `cands` is unambiguous
      .select(col("_cid") +:
        scores.indices.map(i => col(s"_nb_$i")): _*)
    val ranked = scores.indices.foldLeft(
      cands.join(broadcast(counts), col(idCol) === col("_cid"), "left")
        .drop("_cid")) { case (acc, i) =>
      // a candidate nobody beats never enters the counting join → rank 1
      acc.withColumn(s"rank_$i", coalesce(col(s"_nb_$i"), lit(0L)) + 1L)
        .drop(s"_nb_$i")
    }
    val points = scores.indices
      .map(i => expr(s"1000000 DIV ($k + rank_$i)"))
      .reduce(_ + _)
    ranked.withColumn("rrf", points)
      .drop(scores.indices.map(i => s"_s_$i"): _*)
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topN)
  }

  /** Temperature-flattened TOKEN mixture under an explicit token
    * budget — the multilingual/domain re-balancing step ("sample each
    * source at a rate ∝ its flattened token share, spend at most
    * `budgetTokens` tokens"; the T5/mT5 temperature-sampling recipe
    * with α supplied by the caller's weight expression). Per-source
    * token totals `tok_total` are aggregated once; `weight` is
    * evaluated on that totals frame (so size-derived flattenings like
    * `floor(sqrt(col("tok_total")) * 1e6)` for α = 0.5 are in scope)
    * and sets the mixture share w_s/ΣW; each source's token target is
    * `budgetTokens·w_s div ΣW` and its keep probability
    * `min(10⁶, tok_target·10⁶ div tok_total)` ppm — an
    * over-budgeted source caps at 1 (the [[sourceMix]] never-upsample
    * rule, tokens instead of rows). Rows are selected by the seeded
    * portable-hash bernoulli, so the kept set is engine- and
    * re-run-exact. The quota arithmetic runs in DECIMAL(38,0) —
    * `budget·weight` at 10¹² tokens × ppm-scaled weights is ~10³⁰,
    * far past Long.
    *
    * Plan shape: one partial-aggregated groupBy for the totals
    * (#sources rows), a #sources-row window, a broadcast join back
    * onto the corpus, a narrow hash filter — the corpus side never
    * shuffles, so at 100 TB this runs at scan speed exactly like
    * [[sourceMix]]. Adds `tok_total`, `weight`, `tok_target`,
    * `keep_ppm`, `keep`. */
  def tokenMixture(df: DataFrame, idCol: String, sourceCol: String,
      tokens: Column, budgetTokens: Long, weight: Column,
      seed: Int = 0): DataFrame = {
    val quotas = sourceTokenQuotas("tokenMixture", df, sourceCol,
        tokens, budgetTokens, weight)
      .withColumn("keep_ppm",
        least(lit(1000000L),
          expr("CAST(CAST(tok_target AS DECIMAL(38,0)) * 1000000" +
            " DIV tok_total AS BIGINT)")))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("keep",
        Hashing.h60(seed, col(idCol).cast("string")) % 1000000L <
          col("keep_ppm"))
  }

  /** Shared quota scaffolding of the two token mixtures — ONE
    * definition of the per-row token guard, the #sources totals
    * aggregate, the caller-evaluated weight, the DECIMAL(38,0)
    * budget share `tok_target = budget·w_s div ΣW`, and the loud
    * positivity guard riding the source key, so a fix to any of them
    * can never diverge the two operators. Returns the #sources-row
    * frame (sourceCol, tok_total, weight, tok_target). */
  private def sourceTokenQuotas(op: String, df: DataFrame,
      sourceCol: String, tokens: Column, budgetTokens: Long,
      weight: Column): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    // a null/negative per-row count would null the source total and
    // silently zero its quota — fail loudly; the guard rides the
    // summed expression so pruning cannot drop it
    val t = when(tokens.isNull || tokens < 0,
        raise_error(lit(s"$op: token count must be " +
          "non-negative and non-null")))
      .otherwise(tokens.cast("long"))
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(t).as("tok_total"))
      .withColumn("weight", weight.cast("long"))
    val w = Window.partitionBy() // #sources rows — a trivial frame
    totals
      .withColumn("__W", sum(col("weight")).over(w))
      .withColumn("tok_target",
        expr(s"CAST(CAST($budgetTokens AS DECIMAL(38,0)) * weight" +
          " DIV __W AS BIGINT)"))
      // zero/negative weight or an empty source would null the DIVs
      // and silently drop the source — loud, riding the join key like
      // sourceMix's guard
      .select(
        when(col("weight").isNull || col("weight") <= 0 ||
            col("tok_total") <= 0,
          raise_error(concat(
            lit(s"$op: weight and token total must be " +
              "positive for source "),
            col(sourceCol).cast("string"))))
          .otherwise(col(sourceCol)).as(sourceCol),
        col("tok_total"), col("weight"), col("tok_target"))
  }

  /** Epoch-repetition mixture — the data-constrained counterpart of
    * [[tokenMixture]]: when a source's token target EXCEEDS its corpus,
    * real pipelines repeat the source for whole epochs (up to
    * `maxEpochs` — the "up to ~4 epochs of a scarce high-quality
    * source" regime) plus one deterministic partial epoch, rather than
    * refusing to upsample or duplicating rows stochastically. Per
    * source: `epochs_full = min(maxEpochs, tok_target div tok_total)`,
    * and the remainder `tok_target − epochs_full·tok_total` becomes a
    * partial-epoch keep probability in ppm (zero when the epoch cap
    * binds — the cap is a hard ceiling, not a rounding hint). Every
    * row gets `n_copies = epochs_full + (h < rem_ppm ? 1 : 0)` with
    * the seeded portable hash, so the assignment is engine- and
    * re-run-exact, and a downstream export explodes
    * `sequence(1, n_copies)` to materialize the repeats. Quota
    * arithmetic in DECIMAL(38,0) like [[tokenMixture]].
    *
    * Plan shape: identical to [[tokenMixture]] — one #sources totals
    * aggregate, a #sources-row window, a broadcast join back, a narrow
    * projection; the corpus never shuffles. Adds `tok_total`,
    * `weight`, `tok_target`, `epochs_full`, `rem_ppm`, `n_copies`. */
  def epochMixture(df: DataFrame, idCol: String, sourceCol: String,
      tokens: Column, budgetTokens: Long, weight: Column,
      maxEpochs: Int = 4, seed: Int = 0): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val quotas = sourceTokenQuotas("epochMixture", df, sourceCol,
        tokens, budgetTokens, weight)
      .withColumn("epochs_full",
        least(lit(maxEpochs.toLong),
          expr("tok_target DIV tok_total")))
      .withColumn("rem_ppm",
        when(col("epochs_full") === maxEpochs.toLong, lit(0L))
          .otherwise(expr("CAST(CAST(tok_target - epochs_full * " +
            "tok_total AS DECIMAL(38,0)) * 1000000 DIV tok_total" +
            " AS BIGINT)")))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("n_copies",
        col("epochs_full") +
          when(Hashing.h60(seed, col(idCol).cast("string")) % 1000000L <
            col("rem_ppm"), 1L).otherwise(0L))
  }

  /** The pre-gate fallback for degenerate `k+topN > 1e6` (every rank's
    * points floor to 0, so no candidate bound exists): the original
    * corpus-global window form. Never taken for real parameters. */
  private[graft] def rrfFusionWindowed(df: DataFrame, idCol: String,
      scores: Seq[Column], k: Int, topN: Int): DataFrame = {
    val ranked = scores.zipWithIndex.foldLeft(df) { case (acc, (s, i)) =>
      acc.withColumn(s"rank_$i", row_number().over(
        Window.orderBy(s.desc, col(idCol).asc)).cast("long"))
    }
    val points = scores.indices
      .map(i => expr(s"1000000 DIV ($k + rank_$i)"))
      .reduce(_ + _)
    ranked.withColumn("rrf", points)
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topN)
  }
}
