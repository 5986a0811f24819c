package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/** Input-spreading policy for the fan-out stages (shingle/window/pair
  * explodes). A single-file parquet source arrives as ONE partition, so
  * an unguarded explode would run the whole stage as one task — but a
  * production multi-file input is already spread, and an unconditional
  * `repartition` would round-robin-shuffle the full corpus before the
  * explode for nothing. The gate: repartition only when the input has
  * fewer partitions than the default parallelism; otherwise pass the
  * frame through untouched (no exchange added to the plan).
  */
object Partitioning {

  /** `df` spread across at least `defaultParallelism` partitions —
    * a no-op (no round-robin exchange) when it already is.
    *
    * The partition probe is gated on the PLAN SHAPE first: under AQE,
    * materializing `df.rdd` on a plan that contains exchanges EXECUTES
    * the upstream shuffle stages (AdaptiveSparkPlanExec resolves the
    * final plan eagerly) — a real double-execution hazard, not a
    * planning-time peek. So a frame whose plan already shuffles
    * (join/aggregate/window/sort/explicit repartition) passes through
    * untouched — its output is `spark.sql.shuffle.partitions`-wide by
    * construction, i.e. already spread. Only shuffle-free scan-shaped
    * plans (where `.rdd` is genuinely planning-only) are probed for
    * their file-partition count. */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val target = df.sparkSession.sparkContext.defaultParallelism
    val hasShuffle = df.queryExecution.optimizedPlan.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Window | _: Sort |
                _: Distinct | _: Deduplicate | _: RepartitionOperation) => p
    }.isDefined
    if (hasShuffle) df
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  /** Training-export shard manifest — the reproducibility record a
    * shard export ships next to its files: per shard, the document
    * count, whitespace-token and char totals, and an ORDER-INDEPENDENT
    * content checksum (sum of the docs' 60-bit content hashes in
    * DECIMAL(38,0) — overflow-proof at any corpus size — folded mod
    * 10^15 back into a long). Two exports are byte-identical in content
    * iff their manifests match, regardless of file order or task
    * scheduling. Shard assignment is [[Sampling.shuffleShard]]'s seeded
    * hash, so the manifest also pins WHICH docs landed where.
    *
    * Scale shape: one hash aggregate keyed on the shard id — the
    * checksum is a commutative fold, so map-side partial aggregation
    * applies and no per-shard sort or collect exists. */
  def exportManifest(docs: DataFrame, idCol: String, textCol: String,
      shards: Int, seed: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions._
    Sampling.shuffleShard(docs, idCol, shards, seed)
      .groupBy(org.apache.spark.sql.functions.col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol)))).as("n_tokens"),
        sum(length(col(textCol))).as("n_chars"),
        (sum(Hashing.h60(col(textCol))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          % lit(1000000000000000L)).cast("long").as("checksum"))
  }

  /** Z-order (Morton) interleave of two non-negative integer keys —
    * the multi-dimensional layout key: sorting/sharding by the z-value
    * keeps rows close in BOTH dimensions physically close, so parquet
    * min/max stats prune scans filtered on EITHER key (the data-
    * skipping layout Delta/Iceberg OPTIMIZE ZORDER applies; here as a
    * plain deterministic column). `bits` per dimension (≤ 31 so the
    * interleaved value fits a positive long); pure bit arithmetic —
    * shifts, masks, a fold over bit positions — identical in both
    * engines, zero shuffle. */
  def zorder2(a: Column, b: Column, bits: Int): Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "1 <= bits <= 31")
    // `bits` is a plan-time constant, so unroll the interleave into a
    // static sum of shift/mask terms instead of folding over a per-row
    // `sequence()` array with the higher-order `aggregate` — HOF
    // lambdas are CodegenFallback (interpreted per element, one array
    // allocation per row), while this 2·bits-term tree whole-stage-
    // codegens into straight-line long arithmetic (optimization guide
    // §4: built-in expressions over closures in the hot path).
    // Arithmetic is unchanged term for term.
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), i * 2)
        .+(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * 2 + 1))
    }.reduce(_ + _)
  }

  /** Power-of-two length-bucket padding audit — the batching-efficiency
    * report for a fixed-shape training loader: every document pads up to
    * the smallest `base`·2^k ≥ its length, and the waste column is the
    * fraction of padded capacity that is padding (floor-ppm). The
    * integer log2 is `length(bin(q-1))` — the bit length of q−1 — so
    * the bucket math is pure 64-bit integer arithmetic, bit-identical
    * in the DuckDB oracle (`bin` exists in both engines); no float
    * log/pow crosses the engine boundary (NOTES.md FP rule).
    *
    * Scale shape: a narrow projection then one aggregate keyed on the
    * bucket (≤ ~40 distinct keys at any corpus size — log-bounded), so
    * map-side combine reduces each task to a handful of rows. */
  def lengthBuckets(docs: DataFrame, lenCol: String,
      base: Long = 64L): DataFrame = {
    import org.apache.spark.sql.functions._
    require(base >= 1, "base must be positive")
    // q = ceil(len/base) clamped to ≥1; bucket = base · 2^ceil(log2 q)
    val q = expr(s"greatest(($lenCol + $base - 1) DIV $base, 1)")
    // call_function: the shiftleft(Column, Int) API can't take a
    // per-row shift amount (same trick as p67's shiftright, NOTES.md)
    val bucket = when(q <= 1, lit(base))
      .otherwise(call_function("shiftleft", lit(base),
        length(bin(q - 1)).cast("int")))
    docs.select(bucket.as("bucket"), col(lenCol))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(lenCol)).as("sum_len"))
      .withColumn("capacity", expr("bucket * n_docs"))
      .withColumn("waste_ppm",
        expr("(capacity - sum_len) * 1000000 DIV capacity"))
  }

  /** Exact DISTRIBUTED global rank + running sum under a total order —
    * the standard two-pass range-rank, replacing the single-task
    * `row_number().over(Window.orderBy(...))` that cannot survive a
    * table that outgrows one executor:
    *
    *  1. `repartitionByRange(order)` — a sampled range exchange; every
    *     partition holds a contiguous slice of the total order and ALL
    *     partitions sort in parallel. `spark_partition_id()` is stamped
    *     and the frame `localCheckpoint`ed so both downstream passes
    *     see the identical (sampled, otherwise re-randomized) slice
    *     assignment.
    *  2. per-slice row counts and value sums collect to the driver —
    *     ≤ `spark.sql.shuffle.partitions` rows, O(32) here, O(#slices)
    *     ever — and prefix-sum into per-slice offsets, broadcast back.
    *     Local `row_number`/running-`sum` windows keyed on the slice id
    *     plus the offsets give the exact global rank and cumulative sum.
    *
    * No stage sees more than one slice's rows in one task; shuffle
    * volume is one range exchange of the input plus a slice-count
    * hash exchange. `valueCol` must be a non-null integral column.
    * When `totalName` is non-null a literal grand-total column (known
    * on the driver from the slice sums) is attached for ratio math. */
  def globalRankCumsum(df: DataFrame, order: Seq[Column],
      valueCol: String, rankName: String = "rank",
      cumName: String = "cum", totalName: String = null): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ss = df.sparkSession
    val slices = ss.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(slices, order: _*)
      .withColumn("_slice", spark_partition_id())
      .localCheckpoint()
    val stats = parted.groupBy(col("_slice"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val total = stats.map(_._3).sum
    // exclusive prefix sums → the offset each slice's local rank/cumsum
    // starts from
    val offsets = stats.scanLeft((0, 0L, 0L)) {
      case ((_, ro, so), (pid, n, sv)) => (pid, ro + n, so + sv)
    }.dropRight(1).zip(stats).map { case ((_, ro, so), (pid, _, _)) =>
      (pid, ro, so)
    }
    import ss.implicits._
    val offDf = broadcast(
      offsets.toSeq.toDF("_slice", "_rank_off", "_sum_off"))
    val w = Window.partitionBy(col("_slice")).orderBy(order: _*)
    val ranked = parted.join(offDf, Seq("_slice"))
      .withColumn(rankName,
        (row_number().over(w).cast("long") + col("_rank_off")))
      .withColumn(cumName, sum(col(valueCol)).over(w) + col("_sum_off"))
      .drop("_slice", "_rank_off", "_sum_off")
    if (totalName == null) ranked
    else ranked.withColumn(totalName, lit(total))
  }
}
