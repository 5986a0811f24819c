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
    * a no-op (no round-robin exchange) when it already is. The
    * partition-count probe (`df.rdd.getNumPartitions`) is PLANNING-time
    * work only — it builds the physical plan but launches no job and
    * reads no data. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
