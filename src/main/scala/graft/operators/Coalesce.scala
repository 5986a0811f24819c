package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.DatasourceSpec

/** The signature operator of the reference: coalesce N per-entity snapshot
  * rows into one history row holding an array of records plus per-field
  * min/max summaries and an inclusive timestamp range.
  *
  * Reference: `powa_statements_aggregate` (powa--5.2.0.sql:5990-6114) and
  * the generated generic module aggregates (powa--5.2.0.sql:1490-1540):
  *
  *   INSERT INTO {ds}_history
  *     SELECT srvid, key…, tstzrange(min(ts), max(ts), '[]'),
  *            array_agg(record),
  *            ROW(min(f1)…min(fn))::minmax, ROW(max(f1)…max(fn))::minmax
  *     FROM {ds}_history_current GROUP BY srvid, key…;
  *   DELETE FROM {ds}_history_current;
  *
  * Spark-first realization: a single hash aggregation —
  * `collect_list(struct)` + per-field min/max — no UDAF needed. The group
  * keys include `srvid`, so on a cluster this shuffles once on
  * (srvid, entity-key) and is embarrassingly parallel per key; history
  * output is written partitioned by srvid with top-level range columns so
  * readback prunes on Parquet stats (SURVEY.md §4).
  *
  * Determinism note: the reference's `array_agg` has no ORDER BY
  * (insertion order, powa--5.2.0.sql:6006); we guarantee ts-order via
  * `array_sort` (ts is the first record field, so lexicographic struct
  * sort == ts sort). Stricter is safe — readback re-filters by ts and
  * never assumes order (SURVEY.md §7.4 item 5).
  */
object Coalesce {

  /** Group `current` rows (srvid, keys..., record) into history rows. */
  def aggregate(current: DataFrame, spec: DatasourceSpec): DataFrame = {
    val groupKeys: Seq[Column] = col("srvid") +: spec.keyNames.map(col)
    def mm(fn: Column => Column): Column = struct(
      spec.minmaxFields.map(f => fn(col(s"record.${f.name}")).as(f.name)): _*)
    current
      .groupBy(groupKeys: _*)
      .agg(
        min(col("record.ts")).as("range_start"),
        max(col("record.ts")).as("range_end"),
        array_sort(collect_list(col("record"))).as("records"),
        mm(min).as("mins_in_range"),
        mm(max).as("maxs_in_range"))
  }

  /** Retention purge predicate: keep history rows whose range still
    * overlaps the retained window. Reference purges delete rows where
    * `upper(coalesce_range) < (now() - retention)`
    * (generated at powa--5.2.0.sql:1542-1570; statements at :6416-6429).
    * `cutoff` is computed driver-side (retention is config, SURVEY §7.4
    * item 4). Returns the retained frame.
    */
  def purge(history: DataFrame, cutoff: java.sql.Timestamp): DataFrame =
    history.filter(col("range_end") >= lit(cutoff))

  /** Same purge for the `current` tier (ts-based, powa--5.2.0.sql:6421). */
  def purgeCurrent(current: DataFrame, cutoff: java.sql.Timestamp): DataFrame =
    current.filter(col("record.ts") >= lit(cutoff))
}
