package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Hashing

/** Salted join for skewed keys — the manual complement to AQE's skew
  * split (which only fires on sort-merge joins with runtime stats; a
  * deliberately-salted plan also covers broadcast-ineligible shapes and
  * skew that appears after filters the statistics don't see).
  *
  * A plain equi-join sends every row of a hot key to ONE task — the
  * classic straggler at 100 TB. Salting scatters each hot key's probe
  * rows across `salts` sub-partitions by a deterministic per-row hash
  * and replicates the build side's hot rows `salts`×, so every pair
  * still meets exactly once and the hot key's work spreads over `salts`
  * tasks. Non-hot keys keep salt 0 — no replication cost where there is
  * no skew. The result is SET-IDENTICAL to the plain join
  * (OperatorsSpec proves it), and the p45 oracle verifies it against
  * the unsalted SQL join.
  */
object SkewJoin {

  /** Keys whose `df` row count exceeds `minCount` — the hot set. Tiny
    * output (it is a top-of-distribution cut), broadcast by
    * [[saltedInner]].
    *
    * The hot set is a PERFORMANCE HINT, not a correctness input: the
    * join result is identical for any set (an extra key only wastes
    * `salts`× replication of its build rows; a missed key only keeps
    * its straggler). At 100 TB, run this detector on a deterministic
    * Bernoulli sample (`Sampling.bernoulliPpm`) with `minCount` scaled
    * by the sample rate — the skew worth salting survives any sample. */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > minCount).select(col(key))

  /** Inner equi-join on `key` with `hot` keys salted. `saltBy` must be
    * a deterministic per-row column of `left` (an id): it decides which
    * of the `salts` sub-partitions each hot probe row lands in, keeping
    * the scatter reproducible across retries. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, salts: Int, hot: DataFrame): DataFrame = {
    require(salts >= 2)
    val hotFlag = broadcast(hot.select(col(key)).withColumn("__hot", lit(true)))
    val l = left.join(hotFlag, Seq(key), "left")
      .withColumn("__salt", when(col("__hot").isNotNull,
        pmod(Hashing.h60(saltBy.cast("string")), lit(salts.toLong)).cast("int"))
        .otherwise(lit(0)))
      .drop("__hot")
    val r = right.join(hotFlag, Seq(key), "left")
      .withColumn("__salt", explode(when(col("__hot").isNotNull,
        sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
      .drop("__hot")
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
