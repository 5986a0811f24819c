package graft.sources

import scala.collection.immutable.TreeMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The pg_stat_statements source adapter — the reference's most involved
  * version dispatch (`powa_statements_src`, powa--5.2.0.sql:3798-4004):
  * four branches keyed on the pg_stat_statements extension version, each
  * normalizing the raw view to the canonical 1.11+ column set by
  * renaming (`blk_read_time AS shared_blk_read_time`) and defaulting
  * missing columns with `0`/`true` literals; plus the shared filters —
  * the utility-statement regex (:3879) and the `powa.ignored_users`
  * membership list (:3880-3882) — and the `now()` snapshot stamp.
  *
  * Spark-first: the branches are `Seq[Column]` select lists in a
  * version ladder ([[SourceAdapter.pick]]); filters are Catalyst
  * predicates that push into the source scan.
  */
object StatementsSource {

  /** Utility statements excluded from capture (:3879; case-insensitive). */
  val utilityRegex: String =
    "(?i)^\\s*(DEALLOCATE|BEGIN|PREPARE TRANSACTION|COMMIT PREPARED|ROLLBACK PREPARED)"

  private val zeroL = lit(0L)
  private val zeroD = lit(0.0d)
  private val zeroN = lit(0L).cast(DecimalType(38, 0))

  private def common(head: Seq[Column], tail: Seq[Column]): Seq[Column] =
    head ++ Seq(
      col("rows"), col("shared_blks_hit"), col("shared_blks_read"),
      col("shared_blks_dirtied"), col("shared_blks_written"),
      col("local_blks_hit"), col("local_blks_read"),
      col("local_blks_dirtied"), col("local_blks_written"),
      col("temp_blks_read"), col("temp_blks_written")) ++ tail

  /** Canonical select list per pgss version; input is the raw view of
    * that version, output is always the full 1.11 shape. */
  val ladder: TreeMap[Int, Seq[Column]] = TreeMap(
    // pre-1.8 (:3948-3977): total_time → total_exec_time; no toplevel,
    // plan counters, wal or jit columns
    0 -> common(
      Seq(col("userid"), col("dbid"), lit(true).as("toplevel"),
        col("queryid"), col("query"), col("calls"),
        col("total_time").as("total_exec_time")),
      Seq(
        col("blk_read_time").as("shared_blk_read_time"),
        col("blk_write_time").as("shared_blk_write_time"),
        zeroD.as("local_blk_read_time"), zeroD.as("local_blk_write_time"),
        zeroD.as("temp_blk_read_time"), zeroD.as("temp_blk_write_time"),
        zeroL.as("plans"), zeroD.as("total_plan_time"),
        zeroL.as("wal_records"), zeroL.as("wal_fpi"), zeroN.as("wal_bytes"),
        zeroL.as("jit_functions"), zeroD.as("jit_generation_time"),
        zeroL.as("jit_inlining_count"), zeroD.as("jit_inlining_time"),
        zeroL.as("jit_optimization_count"), zeroD.as("jit_optimization_time"),
        zeroL.as("jit_emission_count"), zeroD.as("jit_emission_time"),
        zeroL.as("jit_deform_count"), zeroD.as("jit_deform_time"))),
    // 1.8 (:3917-3946): planning counters + wal added
    108 -> common(
      Seq(col("userid"), col("dbid"), lit(true).as("toplevel"),
        col("queryid"), col("query"), col("calls"), col("total_exec_time")),
      Seq(
        col("blk_read_time").as("shared_blk_read_time"),
        col("blk_write_time").as("shared_blk_write_time"),
        zeroD.as("local_blk_read_time"), zeroD.as("local_blk_write_time"),
        zeroD.as("temp_blk_read_time"), zeroD.as("temp_blk_write_time"),
        col("plans"), col("total_plan_time"),
        col("wal_records"), col("wal_fpi"), col("wal_bytes"),
        zeroL.as("jit_functions"), zeroD.as("jit_generation_time"),
        zeroL.as("jit_inlining_count"), zeroD.as("jit_inlining_time"),
        zeroL.as("jit_optimization_count"), zeroD.as("jit_optimization_time"),
        zeroL.as("jit_emission_count"), zeroD.as("jit_emission_time"),
        zeroL.as("jit_deform_count"), zeroD.as("jit_deform_time"))),
    // 1.10 (:3885-3915): toplevel + jit added (not deform)
    110 -> common(
      Seq(col("userid"), col("dbid"), col("toplevel"),
        col("queryid"), col("query"), col("calls"), col("total_exec_time")),
      Seq(
        col("blk_read_time").as("shared_blk_read_time"),
        col("blk_write_time").as("shared_blk_write_time"),
        zeroD.as("local_blk_read_time"), zeroD.as("local_blk_write_time"),
        zeroD.as("temp_blk_read_time"), zeroD.as("temp_blk_write_time"),
        col("plans"), col("total_plan_time"),
        col("wal_records"), col("wal_fpi"), col("wal_bytes"),
        col("jit_functions"), col("jit_generation_time"),
        col("jit_inlining_count"), col("jit_inlining_time"),
        col("jit_optimization_count"), col("jit_optimization_time"),
        col("jit_emission_count"), col("jit_emission_time"),
        zeroL.as("jit_deform_count"), zeroD.as("jit_deform_time"))),
    // 1.11+ (:3856-3883): blk times split shared/local/temp, jit_deform
    111 -> common(
      Seq(col("userid"), col("dbid"), col("toplevel"),
        col("queryid"), col("query"), col("calls"), col("total_exec_time")),
      Seq(
        col("shared_blk_read_time"), col("shared_blk_write_time"),
        col("local_blk_read_time"), col("local_blk_write_time"),
        col("temp_blk_read_time"), col("temp_blk_write_time"),
        col("plans"), col("total_plan_time"),
        col("wal_records"), col("wal_fpi"), col("wal_bytes"),
        col("jit_functions"), col("jit_generation_time"),
        col("jit_inlining_count"), col("jit_inlining_time"),
        col("jit_optimization_count"), col("jit_optimization_time"),
        col("jit_emission_count"), col("jit_emission_time"),
        col("jit_deform_count"), col("jit_deform_time"))))

  /** Normalize a raw pgss scan of the given version: stamp the snapshot
    * ts, apply the canonical projection and the shared filters. */
  def capture(
      raw: DataFrame,
      pgssVersion: Int,
      ignoredUsers: Seq[String],
      ts: Column = current_timestamp()): DataFrame =
    raw
      .filter(!col("query").rlike(utilityRegex))
      .filter(if (ignoredUsers.isEmpty) lit(true)
              else !col("rolname").isin(ignoredUsers: _*))
      .select(ts.as("ts") +: SourceAdapter.pick(ladder, pgssVersion): _*)
}
