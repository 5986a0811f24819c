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
}
