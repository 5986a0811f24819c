package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K-per-group ranking — the reference's qualstats constvalues
  * operator (powa--5.2.0.sql:6924-6982): five `row_number() OVER
  * (PARTITION BY qual-key ORDER BY metric DESC)` rank columns plus
  * `sum(1) OVER W` group sizes, then `array_agg(... ORDER BY rank)
  * FILTER (WHERE rank <= 20)` per ranking.
  *
  * Spark-first: `Window.partitionBy(groupKeys).orderBy(desc(metric))` +
  * `row_number` — a single shuffle on the group key; AQE handles skewed
  * groups. For the packed-array form, conditional `collect_list` of a
  * (rank, payload) struct + `array_sort` + `transform` reproduces the
  * ordered `array_agg FILTER` with built-ins only (SURVEY.md §2.6).
  */
object TopK {

  /** Keep the top `k` rows per group ordered by `orderBy` (descending
    * metrics should be passed as `desc(...)` columns; include a unique
    * tiebreaker for determinism). Adds a `rank` column.
    */
  def topKPerGroup(
      df: DataFrame,
      groupKeys: Seq[Column],
      orderBy: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupKeys: _*).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The bottom-K variant used for `least_filtering`
    * (`FILTER (WHERE filtered_rank >= nb_lines - 20)`,
    * powa--5.2.0.sql:6945-6950): rank ascending but keep ranks counted
    * from the end of the group. NOTE the reference filter is `>=`, so a
    * full group yields k+1 rows, not k — reproduced exactly.
    */
  def bottomKPerGroup(
      df: DataFrame,
      groupKeys: Seq[Column],
      orderBy: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupKeys: _*).orderBy(orderBy: _*)
    val cnt = Window.partitionBy(groupKeys: _*)
    df.withColumn("rank", row_number().over(w))
      .withColumn("nb_lines", count(lit(1)).over(cnt))
      .filter(col("rank") >= col("nb_lines") - k)
      .drop("nb_lines")
  }

  /** The full constvalues shape (powa--5.2.0.sql:6924-6982): several
    * rankings over one pre-aggregated frame, evaluated in a single pass —
    * five `row_number() OVER (PARTITION BY group ORDER BY metric DESC)`
    * columns plus `sum(1) OVER W` group sizes, then per-ranking filters
    * (`rank <= k` for the most-*, `rank >= nb_lines - k` for least-* —
    * the reference's `>=` keeps k+1 rows from the bottom, reproduced
    * exactly). Returns the union of rankings flattened as
    * (groupKeys..., ranking, rank, payload columns), where `rank` is
    * counted from the relevant end (1..k, or 1..k+1 for least-*).
    *
    * One window shuffle total — the rankings share the partition key, so
    * Spark computes all row_numbers in one WindowExec over one sort per
    * ordering, not one shuffle per ranking.
    */
  def multiTopK(
      df: DataFrame,
      groupKeys: Seq[Column],
      rankings: Seq[(String, Seq[Column], Boolean)], // (name, order, fromBottom)
      k: Int): DataFrame = {
    val cnt = Window.partitionBy(groupKeys: _*)
    val withRanks = rankings.zipWithIndex.foldLeft(
        df.withColumn("nb_lines", count(lit(1)).over(cnt))) {
      case (acc, ((_, orderBy, _), i)) =>
        acc.withColumn(s"__rank_$i",
          row_number().over(Window.partitionBy(groupKeys: _*).orderBy(orderBy: _*)))
    }
    // One (ranking, rank, keep) entry per ranking, exploded — a UNION of
    // per-ranking filters would recompute the whole input (scan + agg +
    // windows) once per branch; this keeps a single pass: one window
    // shuffle, one sort per distinct ordering.
    val entries = array(rankings.zipWithIndex.map { case ((name, _, fromBottom), i) =>
      val r = col(s"__rank_$i")
      val rank = if (fromBottom) col("nb_lines") - r + 1 else r
      val keep = if (fromBottom) r >= col("nb_lines") - k else r <= k
      struct(lit(name).as("ranking"), rank.cast("int").as("rank"),
        keep.as("keep"))
    }: _*)
    val dropped = rankings.indices.map(j => s"__rank_$j") :+ "nb_lines"
    withRanks
      .select(col("*"), explode(entries).as("__e"))
      .filter(col("__e.keep"))
      .withColumn("ranking", col("__e.ranking"))
      .withColumn("rank", col("__e.rank"))
      .drop(dropped :+ "__e": _*)
  }

  /** Packed multi-ranking form — the exact output shape of the
    * reference's `powa_qualstats_aggregate_constvalues_current`
    * (powa--5.2.0.sql:6925-6982): ONE row per group carrying one
    * rank-ordered top-k payload array per ranking
    * (`array_agg(qual_values ORDER BY rank) FILTER (WHERE rank <= 20)`),
    * plus caller-supplied extra aggregates (e.g. the coalesce range
    * bounds `min/max OVER W` at :6957).
    *
    * Single window shuffle on the group key (all rankings share the
    * partition), then one hash aggregation: `collect_list(when(keep,
    * struct(rank, payload)))` reproduces the FILTER clause (collect_list
    * skips nulls) and `array_sort` + `transform` the ORDER BY rank.
    * `fromBottom = true` flips the rank to count from the group's end
    * (the `least_filtering` `FILTER (rank >= nb_lines - 20)` arm,
    * :6948 — `>=`, so a full group packs k+1 payloads, reproduced
    * exactly).
    */
  def multiTopKPacked(
      df: DataFrame,
      groupKeys: Seq[Column],
      rankings: Seq[(String, Seq[Column], Boolean)], // (name, order, fromBottom)
      payload: Column,
      k: Int,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val cnt = Window.partitionBy(groupKeys: _*)
    val withRanks = rankings.zipWithIndex.foldLeft(
        df.withColumn("nb_lines", count(lit(1)).over(cnt))) {
      case (acc, ((_, orderBy, _), i)) =>
        acc.withColumn(s"__rank_$i",
          row_number().over(Window.partitionBy(groupKeys: _*).orderBy(orderBy: _*)))
    }
    val packs = rankings.zipWithIndex.map { case ((rname, _, fromBottom), i) =>
      val r = col(s"__rank_$i")
      val ord = if (fromBottom) col("nb_lines") - r + 1 else r
      val keep = if (fromBottom) r >= col("nb_lines") - k else r <= k
      transform(
        array_sort(collect_list(when(keep,
          struct(ord.cast("int").as("rank"), payload.as("p"))))),
        x => x.getField("p")).as(rname)
    }
    val aggs = packs ++ extraAggs
    withRanks.groupBy(groupKeys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Packed form: one row per group with an array of the top-k payloads
    * ordered by rank — `array_agg(payload ORDER BY rank) FILTER (rank<=k)`
    * (powa--5.2.0.sql:6945-6950). `payload` must be a struct column.
    */
  def topKPacked(
      df: DataFrame,
      groupKeys: Seq[Column],
      orderBy: Seq[Column],
      payload: Column,
      k: Int,
      outName: String): DataFrame = {
    val ranked = topKPerGroup(df, groupKeys, orderBy, k)
    ranked
      .groupBy(groupKeys: _*)
      .agg(
        transform(
          array_sort(collect_list(struct(col("rank"), payload.as("p")))),
          x => x.getField("p")).as(outName))
  }
}
