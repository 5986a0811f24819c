package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.queries.PowaQueries

/** Driver contract — one entry per implemented operator from SURVEY.md §2
  * (see graft.queries.PowaQueries) plus the LLM-data-pipeline operators
  * (graft.queries.PipelineQueries), each with a DuckDB-equivalent oracle
  * over the same parquet tables.
  */
object SparkEntry {

  /** Flagship: coalesce → readback → per-second rates on the events
    * datasource (the canonical PoWA question, SURVEY.md §3.3). */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val cur = EventsSource.current(spark, sfDir)
    val split = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    val hist = Coalesce.aggregate(cur.filter(col("record.ts") < split), EventsSource.spec)
    val series = Readback.series(
      cur.filter(col("record.ts") >= split), hist, EventsSource.spec,
      lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
    DeltaRate.withRates(series, EventsSource.spec)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PowaQueries.queries ++ graft.queries.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    PowaQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql
}
