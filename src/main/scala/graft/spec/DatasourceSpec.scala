package graft.spec

import org.apache.spark.sql.types._

/** Column spec for one datasource column.
  *
  * Mirrors the per-column flags of the reference's install-time generator
  * `powa_generic_datatype_setup` (powa--5.2.0.sql:987-1592):
  *   - `noAgg`    — timestamptz counters excluded from per-db rollup and
  *                  from diff/rate types (c_no_agg, powa--5.2.0.sql:1017,
  *                  :1049-1050, :1113-1117);
  *   - `noMinMax` — xid/boolean excluded from mins/maxs summary records
  *                  (c_no_minmax, powa--5.2.0.sql:1020, :1067-1069);
  *   - `rateName`/`rateSuffix` — rename/suffix overrides for the generated
  *                  per-second rate column (jsonb `_extra` arg,
  *                  powa--5.2.0.sql:1119-1125; e.g. total_exec_time→runtime
  *                  at :1613-1615, empty suffix for qualstats error ratios
  *                  at :1932-1933).
  */
final case class ColSpec(
    name: String,
    dt: DataType,
    noAgg: Boolean = false,
    noMinMax: Boolean = false,
    rateName: Option[String] = None,
    rateSuffix: Option[String] = None,
    nullable: Boolean = true) {
  def rateColName: String =
    rateName.getOrElse(name) + rateSuffix.getOrElse("_per_sec")
}

/** Declarative description of one datasource — the Spark-side analogue of a
  * `powa_generic_module_setup` / `powa_generic_datatype_setup` invocation
  * (powa--5.2.0.sql:987-1592). Every schema and every aggregation /
  * readback / delta-rate expression list in the engine is derived from one
  * of these values; nothing is hand-written per datasource.
  *
  * @param keyCols     entity key columns (reference restricts to
  *                    boolean/integer/name/oid/text, powa--5.2.0.sql:1298)
  * @param counterCols the metric columns packed into the record struct
  * @param perDbRollup whether a `_db` rollup variant exists (SUM over key,
  *                    GROUP BY dbid/ts — powa--5.2.0.sql:4070-4094)
  * @param needOperators whether diff/rate operators are generated
  *                    (`_need_operators`, false for pg_stat_activity,
  *                    powa--5.2.0.sql:1677-1694)
  * @param priority    snapshot-pass ordering — the reference registers
  *                    per-function priorities (powa--5.2.0.sql:168-181:
  *                    databases −3, statements −2, kcache −1, default 10)
  *                    so dimension providers run before their dependents
  */
final case class DatasourceSpec(
    name: String,
    keyCols: Seq[ColSpec],
    counterCols: Seq[ColSpec],
    minVersion: Int = 0,
    perDbRollup: Boolean = false,
    needOperators: Boolean = true,
    priority: Double = 10) {

  /** Every record carries its snapshot timestamp first — mirrors the
    * `ts timestamp with time zone` lead column of every `*_history_record`
    * composite (powa--5.2.0.sql:1406-1414). Keeping ts as the first struct
    * field also makes `array_sort` on the record array a ts-order sort.
    */
  val tsField: ColSpec = ColSpec("ts", TimestampType)

  def recordFields: Seq[ColSpec] = tsField +: counterCols

  /** Fields participating in mins_in_range/maxs_in_range — the reduced
    * `*_minmax` record variant (powa--5.2.0.sql:1077-1091). */
  def minmaxFields: Seq[ColSpec] = recordFields.filterNot(_.noMinMax)

  /** Fields participating in per-db rollup and diff/rate generation. */
  def aggFields: Seq[ColSpec] = counterCols.filterNot(_.noAgg)

  def recordType: StructType =
    StructType(recordFields.map(c => StructField(c.name, c.dt)))

  def minmaxType: StructType =
    StructType(minmaxFields.map(c => StructField(c.name, c.dt)))

  def keyNames: Seq[String] = keyCols.map(_.name)

  /** `*_history_current` layout: (srvid, keys..., record) —
    * powa--5.2.0.sql:2140-2159. */
  def currentSchema: StructType = StructType(
    StructField("srvid", IntegerType) +:
      keyCols.map(c => StructField(c.name, c.dt)) :+
      StructField("record", recordType))

  /** `*_history` layout: (srvid, keys..., range_start, range_end,
    * records[], mins_in_range, maxs_in_range) — powa--5.2.0.sql:2107-2123.
    * The tstzrange is flattened to two top-level timestamp columns so
    * Parquet min/max stats can prune range-overlap readback scans
    * (SURVEY.md §4 — the GiST-index analogue).
    */
  def historySchema: StructType = StructType(
    StructField("srvid", IntegerType) +:
      keyCols.map(c => StructField(c.name, c.dt)) :+
      StructField("range_start", TimestampType) :+
      StructField("range_end", TimestampType) :+
      StructField("records", ArrayType(recordType)) :+
      StructField("mins_in_range", minmaxType) :+
      StructField("maxs_in_range", minmaxType))

  /** Staging (`*_src_tmp`) layout: flat (srvid, ts, keys..., counters...)
    * — powa--5.2.0.sql:1974-2105. */
  def stagingSchema: StructType = StructType(
    StructField("srvid", IntegerType) +:
      StructField("ts", TimestampType) +:
      (keyCols ++ counterCols).map(c => StructField(c.name, c.dt)))
}
