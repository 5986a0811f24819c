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
}
