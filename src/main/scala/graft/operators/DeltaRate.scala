package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.spec.DatasourceSpec

/** The reference's generated record arithmetic — per-datasource `-` (diff)
  * and `/` (rate) operators over consecutive records:
  *
  *   - `{ds}_history_mi(a, b)`  → intvl = a.ts - b.ts, f = a.f - b.f
  *     (powa--5.2.0.sql:1138-1173, bound to operator `-`)
  *   - `{ds}_history_div(a, b)` → sec = extract(EPOCH FROM a.ts - b.ts),
  *     guarded `sec = 1` when 0, f_per_sec = (a.f - b.f)::float8 / sec
  *     (powa--5.2.0.sql:1175-1223, bound to operator `/`; rename overrides
  *     via the jsonb extra arg, :1119-1125)
  *
  * The reference applies these pairwise at query time; Spark-first this is
  * a `lag(record)` window per entity followed by generated column
  * arithmetic (SURVEY.md §2.8) — one shuffle on the entity key, then pure
  * whole-stage-codegen projection. `noAgg` (timestamptz) columns are
  * excluded, mirroring c_no_agg (powa--5.2.0.sql:1113-1117).
  */
object DeltaRate {

  /** Append per-column delta and per-second rate columns to a series of
    * (srvid, keys..., record) rows. Emits:
    *   - `intvl_sec`: seconds between consecutive records (double)
    *   - `<f>_delta`: a.f - b.f for each aggregatable field
    *   - `<rateName(f)>_per_sec`: delta / max(sec, 1)
    * First record of each entity gets nulls (no predecessor).
    */
  def withRates(series: DataFrame, spec: DatasourceSpec): DataFrame = {
    val partCols: Seq[Column] = (Seq("srvid") ++ spec.keyNames).map(col)
    val w = Window.partitionBy(partCols: _*).orderBy(col("record.ts"))
    val prev = lag(col("record"), 1).over(w)

    val intvlMicros =
      unix_micros(col("record.ts")) - unix_micros(prev.getField("ts"))
    // Guard: sec = 1 when the interval is zero (powa--5.2.0.sql:1186-1190).
    val secRaw = intvlMicros.cast("double") / lit(1000000.0d)
    val sec = when(secRaw === 0.0d, lit(1.0d)).otherwise(secRaw)

    val deltaCols = spec.aggFields.map { f =>
      (col(s"record.${f.name}") - prev.getField(f.name))
        .cast("double").as(s"${f.name}_delta")
    }
    val rateCols = spec.aggFields.map { f =>
      ((col(s"record.${f.name}") - prev.getField(f.name)).cast("double") / sec)
        .as(f.rateColName)
    }
    val extra = secRaw.as("intvl_sec") +: (deltaCols ++ rateCols)
    series.select(series.columns.map(col) ++ extra: _*)
  }
}
