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

  /** A working-column name that collides with no column of any given
    * schema: start from `base` and append `_` until it is free. Keeps
    * the fabricated __hot/__salt/__n markers from silently replacing —
    * and then dropping — a user column of the same name. */
  private def freeName(base: String, frames: DataFrame*): String = {
    val taken = frames.flatMap(_.columns).toSet
    Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
  }

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
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame = {
    val n = freeName("__n", df)
    df.groupBy(col(key)).agg(count(lit(1)).as(n))
      .filter(col(n) > minCount).select(col(key))
  }

  /** Inner equi-join on `key` with `hot` keys salted. `saltBy` must be
    * a deterministic per-row column of `left` (an id): it decides which
    * of the `salts` sub-partitions each hot probe row lands in, keeping
    * the scatter reproducible across retries. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, salts: Int, hot: DataFrame): DataFrame =
    salted(left, right, key, saltBy, salts, hot, "inner")

  /** Left-OUTER equi-join with the same salting — the enrichment shape
    * (every probe row survives). Salting is outer-safe by construction:
    * each probe row carries exactly ONE salt value, so it appears in
    * exactly one (key, salt) sub-join — matched there if the build side
    * has the key (hot build rows are replicated to every salt; non-hot
    * rows share the probe's salt 0), null-extended there if not. No
    * duplicate null rows, no lost matches. */
  def saltedLeft(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, salts: Int, hot: DataFrame): DataFrame =
    salted(left, right, key, saltBy, salts, hot, "left")

  private def salted(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, salts: Int, hot: DataFrame,
      joinType: String): DataFrame = {
    require(salts >= 2)
    val hotCol = freeName("__hot", left, right)
    val saltCol = freeName("__salt", left, right)
    val hotFlag = broadcast(hot.select(col(key)).withColumn(hotCol, lit(true)))
    val l = left.join(hotFlag, Seq(key), "left")
      .withColumn(saltCol, when(col(hotCol).isNotNull,
        pmod(Hashing.h60(saltBy.cast("string")), lit(salts.toLong)).cast("int"))
        .otherwise(lit(0)))
      .drop(hotCol)
    val r = right.join(hotFlag, Seq(key), "left")
      .withColumn(saltCol, explode(when(col(hotCol).isNotNull,
        sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
      .drop(hotCol)
    l.join(r, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
