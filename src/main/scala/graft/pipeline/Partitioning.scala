package graft.pipeline

import org.apache.spark.sql.DataFrame

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
}
