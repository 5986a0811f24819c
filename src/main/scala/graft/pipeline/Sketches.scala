package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching — the profiling primitive that
  * replaces exact COUNT(DISTINCT) when the value space itself is too
  * large to shuffle (token vocabularies, URL spaces, user ids at
  * 100 TB).
  *
  * KMV (k-minimum-values): the k smallest DISTINCT hash values of a set
  * determine the estimate n̂ = (k−1)·2⁶⁰ / h_k (h_k = the k-th minimum
  * of the 60-bit hash space). Unlike HyperLogLog implementations, this
  * is DETERMINISTIC given the hash function — the same input yields the
  * same sketch and the same estimate in any engine, any partitioning,
  * any order — which is what lets the DuckDB oracle verify it
  * value-exactly. It is also mergeable by construction (union the
  * minima sets, re-take the k smallest), the property that lets every
  * executor sketch its partition and the combiner fold them; the
  * estimate's relative error concentrates around 1/√(k−2).
  *
  * Shape: one distinct aggregation on (group, hash) — the only shuffle
  * that touches data volume — then a rank window and the per-group fold
  * reuse that exchange's key. The estimate arithmetic is pure integer
  * long math (2⁶⁰ split division: q + remainder-correction), exact in
  * both engines with no overflow for k ≤ 10⁴.
  */
object Sketches {

  private val Space = 1L << 60 // h60's hash space size

  /** Per-`groupCol` KMV sketch of `value`'s cardinality, k minima.
    * Emits `n_min` (minima kept — the exact count when < k), `hk`
    * (k-th minimum hash), `est_distinct` (the KMV estimate; exact
    * count when n_min < k) and — only when `withExact` — an
    * `exact_distinct` comparison column. `withExact = false` is the
    * scale setting: the exact count needs an unbounded per-group count
    * window over the full distinct set, which is exactly the work the
    * sketch exists to avoid; without it only the k-minima rank window
    * runs. */
  def kmvCardinality(df: DataFrame, groupCol: String, value: Column,
      k: Int, withExact: Boolean = true): DataFrame = {
    require(k >= 2 && k <= 10000)
    val hashes = df.select(col(groupCol), Hashing.h60(value).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    val ranked0 = hashes.withColumn("rn", row_number().over(w))
    val ranked = if (withExact) ranked0.withColumn("exact_distinct",
      count(lit(1)).over(Window.partitionBy(col(groupCol)))) else ranked0
    val baseAggs = Seq(count(lit(1)).as("n_min"), max(col("h")).as("hk"))
    val aggs = if (withExact)
      baseAggs :+ max(col("exact_distinct")).as("exact_distinct")
    else baseAggs
    ranked.filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("est_distinct", expr(
        s"""CASE WHEN n_min < $k THEN n_min
            ELSE ${k - 1} * ($Space DIV hk) +
                 (${k - 1} * ($Space % hk)) DIV hk END"""))
  }

  /** The sketch itself: per-group sorted array of the k minimum
    * distinct hash values — the form that MERGES. Executors sketch
    * their shards independently; [[merge]] combines shard sketches into
    * exactly the sketch of the union (property-tested equality, not an
    * approximation of an approximation). */
  def kmvMinima(df: DataFrame, groupCol: String, value: Column,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    df.select(col(groupCol), Hashing.h60(value).as("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("minima"))
  }

  /** Merge two shard sketches: union each group's minima sets, dedup,
    * keep the k smallest. merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    * exactly — the lossless-combine property that makes the sketch safe
    * to tree-aggregate across 1000 executors. */
  def merge(a: DataFrame, b: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    a.unionByName(b)
      .select(col(groupCol), explode(col("minima")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("minima"))
  }

  /** Fixed-bin integer histogram sketch of a NON-NEGATIVE value column:
    * per-(group, bin) counts with `bin = value DIV binWidth`. This is
    * the mergeable complement to [[graft.pipeline.Profiling.quantiles]]'
    * exact rank pick: the exact form sorts each group's busiest shard in
    * one task, while the histogram is ONE hash aggregate whose key space
    * is (groups × value-range/binWidth) — executors histogram their
    * shards independently and [[histMerge]] sums them losslessly
    * (merge(hist(A), hist(B)) == hist(A ⊎ B) exactly, the
    * tree-aggregation property; property-tested). All integer math,
    * engine-exact. */
  def histogram(df: DataFrame, groupCol: String, value: Column,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1)
    require(groupCol != "bin" && groupCol != "cnt",
      "group column must not shadow the sketch's bin/cnt columns")
    // the documented precondition made LOUD: a null value would put a
    // null bin into every cumulative rank, and a negative one truncates
    // toward zero into bin 0 — both silently break the quantile bound.
    // The guard rides the grouping key, so no pruning can remove it.
    val v = value.cast("long")
    val bin = when(v.isNull || v < 0, raise_error(
        lit("histogram: value must be non-negative and non-null")))
      .otherwise(call_function("div", v, lit(binWidth)))
    df.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Lossless histogram merge: bin-wise count sum. Associative and
    * commutative by construction — safe to fold shard histograms in any
    * tree shape across 1000 executors. */
  def histMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantiles from a histogram sketch, same rank rule as the exact
    * operator (`rank_p = (n−1)·p DIV 100 + 1` over the sorted group):
    * the reported value is the LOWER BOUND of the first bin whose
    * cumulative count reaches the rank. The exact rank-selected value
    * lives inside that bin, so the estimate's error is proven
    * `0 ≤ exact − pNN ≤ binWidth − 1` — a deterministic bound, not a
    * probabilistic one (PipelineSpec pins it against the exact
    * operator). Shape: the rank scan, the group-total window and the
    * final fold all key on the group column — bins-per-group-sized
    * data, one exchange. */
  def histQuantiles(hist: DataFrame, groupCol: String, binWidth: Long,
      pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    require(!Seq("bin", "cnt", "cum", "n").contains(groupCol),
      "group column must not shadow the sketch's working columns")
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    def pick(p: Int): Column =
      (min(when(col("cum") >= expr(s"(n - 1) * $p DIV 100 + 1"), col("bin")))
        * binWidth).as(s"p${p}_lo")
    val aggs = max(col("n")).as("n_rows") +:
      (min(col("bin")) * binWidth).as("min_lo") +:
      pcts.map(pick) :+
      (max(col("bin")) * binWidth).as("max_lo")
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** KS-style distribution drift between two groups' binned CDFs — the
    * training-data drift monitor ("did source X's length/quality
    * distribution move between crawls?"). Per bin:
    * `gap_ppm = |F_a(bin) − F_b(bin)|` in parts-per-million; the max
    * over bins is the (bin-granular, hence conservative-exact) KS
    * statistic. All arithmetic is integer/DECIMAL cross-multiplied —
    * `|cum_a·n_b − cum_b·n_a| · 10^6 div (n_a·n_b)` — so the oracle
    * matches bit-for-bit with no float CDFs.
    *
    * Scale shape: the data-volume pass is [[histogram]]'s hash
    * aggregate; everything here runs over DISTINCT BINS (value range /
    * binWidth — thousands, not billions), so the global bin-ordered
    * window is bounded and deliberate, same as [[histQuantiles]]'s
    * per-group fold. An absent group raises (a silent zero-row CDF
    * would report max drift as a legit-looking 1e6). */
  def histDrift(hist: DataFrame, groupCol: String, grpA: String,
      grpB: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val a = hist.filter(col(groupCol) === grpA)
      .select(col("bin"), col("cnt").as("cnt_a"))
    val b = hist.filter(col(groupCol) === grpB)
      .select(col("bin"), col("cnt").as("cnt_b"))
    val joined = a.join(b, Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val wOrd = Window.orderBy(col("bin"))
    val wAll = Window.partitionBy()
    joined
      .withColumn("cum_a", sum(col("cnt_a")).over(wOrd))
      .withColumn("cum_b", sum(col("cnt_b")).over(wOrd))
      .withColumn("n_a", sum(col("cnt_a")).over(wAll))
      .withColumn("n_b", sum(col("cnt_b")).over(wAll))
      .withColumn("gap_ppm",
        when(col("n_a") === 0 || col("n_b") === 0, raise_error(
          lit(s"histDrift: group '$grpA' or '$grpB' has no rows")))
          .otherwise(call_function("div",
            abs(col("cum_a").cast(D) * col("n_b").cast(D) -
              col("cum_b").cast(D) * col("n_a").cast(D)) * lit(1000000),
            col("n_a").cast(D) * col("n_b").cast(D))))
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        col("gap_ppm").cast("long").as("gap_ppm"))
  }

  /** Count-min sketch: a depth×width counter matrix — the mergeable
    * frequency sketch that answers "how often does item x occur?" in
    * O(d·w) space when the item space (tokens, URLs, queryids at
    * 100 TB) is too large to count exactly. Each of the `depth` seeded
    * hash rows buckets every occurrence into `width` counters; an
    * item's estimate is the MINIMUM of its `depth` counters, which can
    * only OVER-estimate (collisions add, never subtract) — the
    * classic one-sided bound, and with h60 hashing the whole structure
    * is deterministic: same input → bit-identical counters in any
    * engine, any partitioning, which is what lets the DuckDB oracle
    * verify it value-exactly (vs the probabilistic-only guarantees of
    * library CMS impls).
    *
    * Shape: one explode (×depth) + one hash aggregate whose key space
    * is depth×width regardless of input volume — executors sketch
    * shards independently and [[cmMerge]] sums counter-wise
    * (merge(cm(A), cm(B)) == cm(A ⊎ B) exactly, property-tested). The
    * sketch is always ≤ d·w rows: broadcastable by construction. */
  def countMin(df: DataFrame, value: Column, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2)
    df.select(value.as("__v"),
        explode(array((0 until depth).map(s => lit(s)): _*)).as("seed"))
      .groupBy(col("seed"), cmBucket(col("seed"), col("__v"), width))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The (seed, item) → bucket rule, shared by sketch build and probe:
    * h60 over "<seed>:<item>" mod width (same hash-family construction
    * as MinHash/LSH — seed-prefixed md5). */
  private def cmBucket(seed: Column, v: Column, width: Int): Column =
    pmod(Hashing.h60(concat(seed.cast("string"), lit(":"), v)),
      lit(width.toLong)).as("bucket")

  /** Lossless count-min merge: counter-wise sum. Associative and
    * commutative — safe to fold shard sketches in any tree shape. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("seed"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates from a count-min sketch for the items in
    * `items(itemCol)`: min over the item's `depth` counters, 0 for an
    * item whose buckets were never touched. The sketch side is ≤ d·w
    * rows and is broadcast, so probing N items is one scan-speed
    * broadcast join — no shuffle touches the probe volume. `depth` and
    * `width` must match the build call (the bucket rule is shared). */
  def cmEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2)
    items.select(col(itemCol),
        explode(array((0 until depth).map(s => lit(s)): _*)).as("seed"))
      .withColumn("bucket", cmBucket(col("seed"), col(itemCol), width))
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Estimate from a minima-array sketch (same integer formula).
    * The k-th minimum is guarded by the size check: a group holding
    * fewer than k minima takes the exact-count branch, and under
    * Spark 4's default ANSI mode an unconditional `element_at(minima,
    * k)` would throw INVALID_ARRAY_INDEX before that branch could be
    * reached. */
  def estimate(sketch: DataFrame, k: Int): DataFrame =
    sketch
      .withColumn("n_min", size(col("minima")).cast("long"))
      .withColumn("hk",
        when(size(col("minima")) >= k, element_at(col("minima"), k)))
      .withColumn("est_distinct", expr(
        s"""CASE WHEN n_min < $k THEN n_min
            ELSE ${k - 1} * ($Space DIV hk) +
                 (${k - 1} * ($Space % hk)) DIV hk END"""))
}
