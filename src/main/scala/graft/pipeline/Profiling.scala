package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling — the summary statistics a curation run reports per
  * source/shard before and after each pass (what survived, how the
  * length distribution moved).
  *
  * Quantiles are EXACT rank-selected values (`rank = (n-1)·p div 100 + 1`
  * over the sorted group), not interpolated: interpolation mixes floats
  * across engines, while a rank pick returns an actual data value —
  * bit-identical everywhere, and the form percentile_disc takes in every
  * SQL engine. Shape: ONE shuffle — the rank window, the group-count
  * window and the final per-group aggregate all key on the group column,
  * so Catalyst reuses a single exchange (PlanSpec pins this). Skew bound:
  * the busiest single group must sort in one task — at 100 TB, profile
  * per (source, shard) rather than per source if a source dominates, or
  * switch to [[Sketches.histQuantiles]]: the mergeable fixed-bin form
  * whose per-group work is bins-sized, with a proven ≤ binWidth−1 error
  * against this operator's exact rank pick.
  */
object Profiling {

  /** Per-`groupCol` length/value profile: n rows, min/max, and the exact
    * `pcts` quantiles of `valueCol` (ties broken by `tieBreak` for a
    * total order; the selected VALUE is unaffected by tie order). */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String, pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieBreak))
    val ranked = df.select(col(groupCol), col(valueCol), col(tieBreak))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    def pick(p: Int): Column = max(when(
      col("rn") === expr(s"(cnt - 1) * $p DIV 100 + 1"), col(valueCol)))
    val aggs = max(col("cnt")).as("n_rows") +:
      min(col(valueCol)).as(s"min_$valueCol") +:
      pcts.map(p => pick(p).as(s"p${p}_$valueCol")) :+
      max(col(valueCol)).as(s"max_$valueCol")
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Winsorized per-group summary: clamp `valueCol` into the
    * [loPct, hiPct] exact rank-picked quantiles (same type-1 convention
    * as [[quantiles]] — actual data values, bit-identical across
    * engines) and report the clamped sum plus its floor-ppm mean. The
    * outlier-robust statistic a curation dashboard reports when a few
    * enormous documents would otherwise dominate a plain mean.
    *
    * Shape: rank window, bound aggregate, bound join and final
    * aggregate ALL key on `groupCol`, so Catalyst plans one exchange
    * and the join is a broadcast (one row per group). Skew bound is the
    * same as [[quantiles]]: the busiest group sorts in one task. */
  def winsorized(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String, loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(0 <= loPct && loPct <= hiPct && hiPct <= 100, "bad pcts")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieBreak))
    val ranked = df.select(col(groupCol), col(valueCol), col(tieBreak))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    def pick(p: Int): Column = max(when(
      col("rn") === expr(s"(cnt - 1) * $p DIV 100 + 1"), col(valueCol)))
    val bounds = ranked.groupBy(col(groupCol))
      .agg(pick(loPct).as("lo"), pick(hiPct).as("hi"))
    val clamped = greatest(col("lo"), least(col("hi"), col(valueCol)))
    ranked.join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("cnt")).as("n_rows"),
        max(col("lo")).as(s"lo_$valueCol"),
        max(col("hi")).as(s"hi_$valueCol"),
        sum(clamped).as(s"wsum_$valueCol"))
      .withColumn("wmean_ppm",
        expr(s"wsum_$valueCol * 1000000 DIV n_rows"))
  }

  /** Robust outlier flags via median absolute deviation: per group,
    * the rank-picked median m, the rank-picked median of |x − m|
    * (MAD), and a flag for rows with |x − m| > k·MAD — the outlier
    * rule that survives the outliers themselves (a mean/stddev z-score
    * moves with the contamination it is trying to catch). Medians are
    * type-1 rank picks (actual data values, engine-exact); the
    * comparison is pure integer arithmetic. Shape: two rank windows
    * and the flag join, ALL keyed on `groupCol` — the exchanges
    * coalesce like [[quantiles]]'. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String, k: Long): DataFrame = {
    def medianOf(in: DataFrame, v: String): DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col(v), col(tieBreak))
      in.withColumn("rn", row_number().over(w))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col(groupCol))))
        .groupBy(col(groupCol))
        .agg(max(when(col("rn") === expr("(cnt - 1) * 50 DIV 100 + 1"),
          col(v))).as("med"))
    }
    val base = df.select(col(groupCol), col(valueCol), col(tieBreak))
    val med = medianOf(base, valueCol)
    val withDev = base.join(broadcast(med), Seq(groupCol))
      .withColumn("absdev",
        abs(col(valueCol) - col("med")))
    val mad = medianOf(withDev.withColumnRenamed("absdev", "__d")
      .select(col(groupCol), col("__d"), col(tieBreak)), "__d")
      .withColumnRenamed("med", "mad")
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier", col("absdev") > col("mad") * k)
  }

  /** ANALYZE-style column profile: per column, total rows, null count
    * and EXACT distinct cardinality — the data-quality report a
    * pipeline emits after every materialization. One UNION branch per
    * column, each a SINGLE-distinct aggregate over a one-column
    * projection: the parquet scan in each branch is column-pruned to
    * that column, so total IO across all branches equals ONE full-row
    * scan — and no branch triggers Spark's multi-distinct `Expand`
    * rewrite, which duplicates the input (width+1)× before the
    * shuffle (at 100 TB an 11-column profile through Expand is a
    * ~1.2 PB shuffle; through these branches it is 11 column-pruned
    * scans whose distinct exchanges carry only per-column values).
    * Branches are independent stages, so a cluster schedules them
    * concurrently. For a width where even that is too much, the KMV
    * sketch in [[Sketches]] is the approximate drop-in. */
  def columnProfile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    cols.map { c =>
      df.select(col(c))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
    }.reduce(_ unionAll _)
  }

  /** Classifier calibration audit — the reliability diagram + expected
    * calibration error behind "can we trust the quality classifier's
    * scores as probabilities before filtering on them?". Rows carry a
    * predicted probability in ppm (`scorePpm` ∈ [0, 10⁶)) and a 0/1
    * outcome `label`; each falls in bin `min(bins-1, score·bins div
    * 10⁶)`, and per bin the audit reports the observed positive rate
    * `acc_ppm = Σlabel·10⁶ div n`, the mean claimed confidence
    * `conf_ppm = Σscore div n`, and their gap. `ece_ppm` — the
    * n-weighted mean gap `Σ(gap·n) div N` — repeats on every row so
    * the single-number verdict travels with the table. All integer
    * arithmetic (sums through DECIMAL(38,0) headroom: 10⁹ rows ×
    * 10⁶ ppm ≈ 10¹⁵ fits Long, the gap·n products are re-summed in
    * decimal), engine-exact.
    *
    * Plan shape: one partial-aggregated groupBy onto ≤ `bins` rows,
    * then a `bins`-row window for N and the ECE — nothing after the
    * aggregation touches data volume, so at 100 TB this is a scan +
    * one map-side-combined exchange of `bins` rows per partition. */
  def calibrationBins(df: DataFrame, scorePpm: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // out-of-range scores or non-binary labels would silently skew a
    // bin (or land in a phantom bin) — fail loudly, riding the
    // aggregated expressions so pruning cannot drop the guards
    val sc = when(scorePpm.isNull || scorePpm < 0 || scorePpm >= 1000000L,
        raise_error(lit("calibrationBins: scorePpm must be in [0, 1e6)")))
      .otherwise(scorePpm.cast("long"))
    val lb = when(label.isNull || (label =!= 0 && label =!= 1),
        raise_error(lit("calibrationBins: label must be 0 or 1")))
      .otherwise(label.cast("long"))
    df.select(sc.as("__s"), lb.as("__l"))
      .select(expr(s"least(CAST(${bins - 1} AS BIGINT), " +
          s"__s * $bins DIV 1000000)").as("bin"),
        col("__s").cast("decimal(38,0)").as("__s"),
        col("__l").cast("decimal(38,0)").as("__l"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__l")).as("__pos"),
        sum(col("__s")).as("__conf"))
      .withColumn("acc_ppm",
        expr("CAST(__pos * 1000000 DIV n AS BIGINT)"))
      .withColumn("conf_ppm", expr("CAST(__conf DIV n AS BIGINT)"))
      .withColumn("gap_ppm", abs(col("acc_ppm") - col("conf_ppm")))
      .withColumn("ece_ppm",
        expr("CAST(sum(CAST(gap_ppm AS DECIMAL(38,0)) * n) OVER ()" +
          " DIV sum(n) OVER () AS BIGINT)"))
      .select(col("bin"), col("n"), col("acc_ppm"), col("conf_ppm"),
        col("gap_ppm"), col("ece_ppm"))
  }

  /** k-anonymity audit over quasi-identifier columns — the
    * re-identification-risk check run before a corpus with
    * user-derived attributes ships: every quasi-identifier
    * combination with its group size and a `risky` flag when fewer
    * than `k` rows share it (such rows are re-identifiable by anyone
    * who knows the combination). One map-side-combined hash
    * aggregate; the audit table is |distinct combinations| rows, so
    * at 100 TB the output is bounded by the quasi-space, not the
    * corpus. Suppression/generalization of the risky groups is the
    * caller's policy — this operator is the measurement. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 for the audit to mean anything, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("risky", col("group_n") < k)
  }
}
