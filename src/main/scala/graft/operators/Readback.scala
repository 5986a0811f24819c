package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.DatasourceSpec

/** Time-series reconstitution — the canonical readback of the reference,
  * `powa_stat_get_activity(srvid, from, to)` (powa--5.2.0.sql:7765-7792):
  *
  *   SELECT record… FROM {ds}_history_current
  *    WHERE ts BETWEEN from AND to
  *   UNION ALL
  *   SELECT (unnest(records)).* FROM {ds}_history
  *    WHERE coalesce_range && tstzrange(from, to, '[]')
  *      AND unnested.ts BETWEEN from AND to;
  *
  * Spark-first: filter + unionByName + explode. The range-overlap test
  * `coalesce_range && [from,to]` becomes two plain comparisons on the
  * top-level `range_start`/`range_end` columns, which Catalyst pushes to
  * the Parquet scan (partition pruning on srvid + row-group min/max
  * pruning on the range bounds replace the reference's GiST index,
  * powa--5.2.0.sql:2123).
  */
object Readback {

  /** Reconstitute (srvid, keys..., record) rows for ts ∈ [from, to]. */
  def series(
      current: DataFrame,
      history: DataFrame,
      spec: DatasourceSpec,
      from: Column,
      to: Column): DataFrame = {
    val keyCols: Seq[Column] = (Seq("srvid") ++ spec.keyNames).map(col)
    val cur = current
      .filter(col("record.ts").between(from, to))
      .select(keyCols :+ col("record"): _*)
    // Inclusive-bounds range overlap ('[]', powa--5.2.0.sql:6005, :7786).
    val hist = history
      .filter(col("range_start") <= to && col("range_end") >= from)
      .select(keyCols :+ explode(col("records")).as("record"): _*)
      .filter(col("record.ts").between(from, to))
    cur.unionByName(hist)
  }
}
