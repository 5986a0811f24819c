package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.DiffSync
import graft.spec.Specs

/** The statements snapshot chain — the reference's single multi-CTE DML
  * (`powa_statements_snapshot`, powa--5.2.0.sql:4006-4108), decomposed
  * into the equivalent DataFrame pipeline with two sinks:
  *
  *   capture        := normalized source rows (StatementsSource.capture
  *                     or remote staging)
  *   mru            := UPDATE powa_statements SET last_present_ts = now()
  *                     for (srvid, queryid, dbid, userid) seen (:4025-4031)
  *   missing_stmts  := NOT EXISTS anti-join INSERT, GROUP BY identity keys
  *                     with min(query) (:4032-4044)
  *   by_query       := per-entity record append into current (:4046-4068)
  *   by_database    := per-db rollup append into current_db (:4070-4094)
  *
  * The capture frame is cached — two sinks from one scan (SURVEY.md §7.4
  * item 6). The query-text dimension is tiny relative to facts, so its
  * rewrite broadcasts; at cluster scale it becomes a Delta MERGE.
  */
object StatementsPipeline {

  val identityKeys = Seq("queryid", "dbid", "userid")

  /** Maintain the query-text dimension `powa_statements` (srvid, queryid,
    * dbid, userid, query, last_present_ts — powa--5.2.0.sql:930-948):
    * MRU-touch rows seen in this capture, insert newly-seen statements
    * with `min(query)` as the canonical text. Returns the new dimension.
    */
  def syncDimension(
      dim: DataFrame, capture: DataFrame, ts: Column): DataFrame = {
    val touched = DiffSync.mruTouch(dim, capture, identityKeys,
      "last_present_ts", ts)
    val missing = DiffSync.missing(capture, dim, identityKeys)
      .groupBy(identityKeys.map(col): _*)
      .agg(min(col("query")).as("query"))
      .withColumn("last_present_ts", ts)
      .select(touched.columns.map(col): _*)
    touched.unionByName(missing)
  }

  /** Build the full chain's outputs for one server: the updated
    * dimension (caller persists it — dimension storage is a
    * read-modify-overwrite of a small table, SURVEY.md §7.4 item 1) and
    * the two sink frames, which the caller lands atomically with
    * `Store.snapshotCommit` (appends + staging drain under one commit
    * point). `capture` should be cached by the caller — every returned
    * frame reads it. */
  def snapshot(
      dim: DataFrame,
      capture: DataFrame,
      srvid: Int,
      ts: Column): (DataFrame, Seq[(String, DataFrame)]) = {
    val spec = Specs.statements
    // no materialization needed before the dim rewrite: the store's
    // overwrite writes a NEW version directory and only then flips the
    // pointer (AtomicSwap), so this plan reads the still-live old
    // version during its own write action
    val newDim = syncDimension(dim, capture, ts)

    // by_query: per-entity records into current (:4046-4068)
    val keyCols = spec.keyNames.map(col)
    val cur = capture.select(
      lit(srvid).as("srvid") +: keyCols :+
        struct(col("ts") +: spec.counterCols.map(c => col(c.name)): _*)
          .as("record"): _*)

    // by_database: rollup into current_db (:4070-4094)
    val aggCols = spec.aggFields.map(f => sum(col(f.name)).as(f.name))
    val curDb = capture.groupBy(col("dbid"), col("ts"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(
        lit(srvid).as("srvid"), col("dbid"),
        struct(col("ts") +: spec.aggFields.map(f => col(f.name)): _*)
          .as("record"))
    (newDim, Seq(GenericDatasource.Current -> cur,
      GenericDatasource.CurrentDb -> curDb))
  }
}
