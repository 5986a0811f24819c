package graft.spec

import org.apache.spark.sql.types._

/** Transcription of every datasource the reference registers — the Scala
  * analogue of the `powa_generic_datatype_setup` / `powa_generic_module_setup`
  * invocations at powa--5.2.0.sql:1594-1938, plus the key columns of the
  * hand-written `*_history_current` tables (:2107-2159, :2192-2302,
  * :3061-3069, :3149-3178, :3251-3259).
  *
  * Per-pg-type mapping (SURVEY.md §1.2): oid/bigint→Long, integer→Int,
  * numeric→Decimal(38,0), double precision→Double, text/name/inet→String,
  * xid→String (noMinMax), pg_lsn→Long (orderable 64-bit), interval→Long
  * (micros), boolean→Boolean (noMinMax), timestamptz→Timestamp (noAgg).
  * noAgg/noMinMax are type-derived, exactly as the generator's
  * `c_no_agg`/`c_no_minmax` arrays (powa--5.2.0.sql:1017-1020).
  */
object Specs {
  // pg-type constructors: flags derive from the pg type, not the Spark type.
  def oid(n: String) = ColSpec(n, LongType)
  def big(n: String, rate: Option[String] = None) =
    ColSpec(n, LongType, rateName = rate)
  def int(n: String) = ColSpec(n, IntegerType)
  def num(n: String) = ColSpec(n, DecimalType(38, 0))
  def dp(n: String, rate: Option[String] = None) =
    ColSpec(n, DoubleType, rateName = rate)
  def text(n: String) = ColSpec(n, StringType)
  def inet(n: String) = ColSpec(n, StringType)
  def xid(n: String) = ColSpec(n, StringType, noMinMax = true)
  def lsn(n: String) = ColSpec(n, LongType)
  def ivl(n: String) = ColSpec(n, LongType)
  def bool(n: String) = ColSpec(n, BooleanType, noMinMax = true)
  def tstz(n: String) = ColSpec(n, TimestampType, noAgg = true)

  /** pg_stat_statements (powa--5.2.0.sql:1596-1617; keys :2140-2148).
    * Rate renames: total_exec_time→runtime, total_plan_time→plantime. */
  val statements: DatasourceSpec = DatasourceSpec(
    name = "powa_statements",
    keyCols = Seq(big("queryid"), oid("dbid"), bool("toplevel"), oid("userid")),
    counterCols = Seq(
      big("calls"), dp("total_exec_time", Some("runtime")), big("rows"),
      big("shared_blks_hit"), big("shared_blks_read"),
      big("shared_blks_dirtied"), big("shared_blks_written"),
      big("local_blks_hit"), big("local_blks_read"),
      big("local_blks_dirtied"), big("local_blks_written"),
      big("temp_blks_read"), big("temp_blks_written"),
      dp("shared_blk_read_time"), dp("shared_blk_write_time"),
      dp("local_blk_read_time"), dp("local_blk_write_time"),
      dp("temp_blk_read_time"), dp("temp_blk_write_time"),
      big("plans"), dp("total_plan_time", Some("plantime")),
      big("wal_records"), big("wal_fpi"), num("wal_bytes"),
      big("jit_functions"), dp("jit_generation_time"),
      big("jit_inlining_count"), dp("jit_inlining_time"),
      big("jit_optimization_count"), dp("jit_optimization_time"),
      big("jit_emission_count"), dp("jit_emission_time"),
      big("jit_deform_count"), dp("jit_deform_time")),
    perDbRollup = true,
    priority = -2) // powa_statements_snapshot registered at -2 (:171)

  /** powa_user_functions (:1623-1626; keys :2192-2199). */
  val userFunctions: DatasourceSpec = DatasourceSpec(
    name = "powa_user_functions",
    keyCols = Seq(oid("dbid"), oid("funcid")),
    counterCols = Seq(big("calls"), dp("total_time"), dp("self_time")),
    perDbRollup = true)

  /** powa_all_indexes (:1630-1637; keys :2243-2251). */
  val allIndexes: DatasourceSpec = DatasourceSpec(
    name = "powa_all_indexes",
    keyCols = Seq(oid("dbid"), oid("relid"), oid("indexrelid")),
    counterCols = Seq(
      big("idx_size"), big("idx_scan"), tstz("last_idx_scan"),
      big("idx_tup_read"), big("idx_tup_fetch"),
      big("idx_blks_read"), big("idx_blks_hit")),
    perDbRollup = true)

  /** powa_all_tables (:1641-1654; keys :2294-2302). */
  val allTables: DatasourceSpec = DatasourceSpec(
    name = "powa_all_tables",
    keyCols = Seq(oid("dbid"), oid("relid")),
    counterCols = Seq(
      big("tbl_size"), big("seq_scan"), tstz("last_seq_scan"),
      big("seq_tup_read"), big("idx_scan"), tstz("last_idx_scan"),
      big("n_tup_ins"), big("n_tup_upd"), big("n_tup_del"),
      big("n_tup_hot_upd"), big("n_tup_newpage_upd"),
      big("n_liv_tup"), big("n_dead_tup"),
      big("n_mod_since_analyze"), big("n_ins_since_vacuum"),
      tstz("last_vacuum"), tstz("last_autovacuum"),
      tstz("last_analyze"), tstz("last_autoanalyze"),
      big("vacuum_count"), big("autovacuum_count"),
      big("analyze_count"), big("autoanalyze_count"),
      big("heap_blks_read"), big("heap_blks_hit"),
      big("idx_blks_read"), big("idx_blks_hit"),
      big("toast_blks_read"), big("toast_blks_hit"),
      big("tidx_blks_read"), big("tidx_blks_hit")),
    perDbRollup = true)

  /** pg_stat_kcache (:1908-1922; keys :3061-3069, incl. the `top` flag). */
  val kcache: DatasourceSpec = DatasourceSpec(
    name = "powa_kcache",
    keyCols = Seq(big("queryid"), oid("dbid"), oid("userid"), bool("top")),
    counterCols = Seq(
      big("plan_reads"), big("plan_writes"),
      dp("plan_user_time"), dp("plan_system_time"),
      big("plan_minflts"), big("plan_majflts"), big("plan_nswaps"),
      big("plan_msgsnds"), big("plan_msgrcvs"), big("plan_nsignals"),
      big("plan_nvcsws"), big("plan_nivcsws"),
      big("exec_reads"), big("exec_writes"),
      dp("exec_user_time"), dp("exec_system_time"),
      big("exec_minflts"), big("exec_majflts"), big("exec_nswaps"),
      big("exec_msgsnds"), big("exec_msgrcvs"), big("exec_nsignals"),
      big("exec_nvcsws"), big("exec_nivcsws")),
    perDbRollup = true,
    priority = -1) // powa_kcache_snapshot registered at -1 (:180)

  /** pg_qualstats per-qual series (:1924-1933; keys :3149-3158). Rate
    * suffix overrides: the mean_err columns keep their name as-is. */
  val qualstats: DatasourceSpec = DatasourceSpec(
    name = "powa_qualstats",
    keyCols = Seq(big("qualid"), big("queryid"), oid("dbid"), oid("userid")),
    counterCols = Seq(
      big("occurences"), big("execution_count"), big("nbfiltered"),
      ColSpec("mean_err_estimate_ratio", DoubleType, rateSuffix = Some("")),
      ColSpec("mean_err_estimate_num", DoubleType, rateSuffix = Some(""))))

  /** pg_wait_sampling (:1935-1938; keys :3251-3259). */
  val waitSampling: DatasourceSpec = DatasourceSpec(
    name = "powa_wait_sampling",
    keyCols = Seq(big("queryid"), oid("dbid"), text("event_type"), text("event")),
    counterCols = Seq(big("count")),
    perDbRollup = true)

  // ---- the 16 generic modules (powa--5.2.0.sql:1656-1906) ----

  val replicationSlots: DatasourceSpec = DatasourceSpec(
    name = "powa_replication_slots",
    keyCols = Seq(text("slot_name"), text("plugin"), text("slot_type"),
      oid("datoid"), bool("temporary")),
    counterCols = Seq(
      xid("cur_txid"), lsn("current_lsn"), bool("active"), int("active_pid"),
      xid("slot_xmin"), xid("catalog_xmin"), lsn("restart_lsn"),
      lsn("confirmed_flush_lsn"), text("wal_status"), big("safe_wal_size"),
      bool("two_phase"), bool("conflicting")),
    minVersion = 130000)

  /** `_need_operators => false` — no diff/rate types (:1694). */
  val statActivity: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_activity",
    keyCols = Seq.empty,
    counterCols = Seq(
      xid("cur_txid"), oid("datid"), int("pid"), int("leader_pid"),
      oid("usesysid"), text("application_name"), inet("client_addr"),
      tstz("backend_start"), tstz("xact_start"), tstz("query_start"),
      tstz("state_change"), text("state"), xid("backend_xid"),
      xid("backend_xmin"), big("query_id"), text("backend_type"),
      tstz("clock_ts")),
    needOperators = false)

  val statArchiver: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_archiver",
    keyCols = Seq.empty,
    counterCols = Seq(
      text("current_wal"), big("archived_count"), text("last_archived_wal"),
      tstz("last_archived_time"), big("failed_count"),
      text("last_failed_wal"), tstz("last_failed_time")))

  val statBgwriter: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_bgwriter",
    keyCols = Seq.empty,
    counterCols = Seq(
      big("buffers_clean"), big("maxwritten_clean"), big("buffers_backend"),
      big("buffers_backend_fsync"), big("buffers_alloc")))

  val statCheckpointer: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_checkpointer",
    keyCols = Seq.empty,
    counterCols = Seq(
      big("num_timed"), big("num_requested"),
      dp("write_time"), dp("sync_time"), big("buffers_written")))

  val statDatabase: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_database",
    keyCols = Seq(oid("datid")),
    counterCols = Seq(
      int("numbackends"), big("xact_commit"), big("xact_rollback"),
      big("blks_read"), big("blks_hit"),
      big("tup_returned"), big("tup_fetched"), big("tup_inserted"),
      big("tup_updated"), big("tup_deleted"),
      big("conflicts"), big("temp_files"), big("temp_bytes"), big("deadlocks"),
      big("checksum_failures"), tstz("checksum_last_failure"),
      dp("blk_read_time"), dp("blk_write_time"),
      dp("session_time"), dp("active_time"), dp("idle_in_transaction_time"),
      big("sessions"), big("sessions_abandoned"), big("sessions_fatal"),
      big("sessions_killed"), tstz("stats_reset")))

  val statDatabaseConflicts: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_database_conflicts",
    keyCols = Seq(oid("datid")),
    counterCols = Seq(
      big("confl_tablespace"), big("confl_lock"), big("confl_snapshot"),
      big("confl_bufferpin"), big("confl_deadlock"),
      big("confl_active_logicalslot")))

  val statIo: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_io",
    keyCols = Seq(text("backend_type"), text("object"), text("context")),
    counterCols = Seq(
      big("reads"), dp("read_time"), big("writes"), dp("write_time"),
      big("writebacks"), dp("writeback_time"), big("extends"),
      dp("extend_time"), big("op_bytes"), big("hits"), big("evictions"),
      big("reuses"), big("fsyncs"), dp("fsync_time"), tstz("stats_reset"),
      num("read_bytes"), num("write_bytes"), num("extend_bytes")))

  val statLock: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_lock",
    keyCols = Seq(text("locktype")),
    counterCols = Seq(
      big("waits"), big("wait_time"), big("fastpath_exceeded"),
      tstz("stats_reset")),
    minVersion = 190000)

  val statRecovery: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_recovery",
    keyCols = Seq.empty,
    counterCols = Seq(
      lsn("last_replayed_read_lsn"), lsn("last_replayed_end_lsn"),
      int("last_replayed_tli"), lsn("replay_end_lsn"), int("replay_end_tli"),
      tstz("recovery_last_xact_time"), tstz("current_chunk_start_time"),
      text("pause_state")),
    minVersion = 190000)

  val statReplication: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_replication",
    keyCols = Seq.empty,
    counterCols = Seq(
      lsn("current_lsn"), int("pid"), text("usename"),
      text("application_name"), inet("client_addr"), tstz("backend_start"),
      xid("backend_xmin"), text("state"), lsn("sent_lsn"), lsn("write_lsn"),
      lsn("flush_lsn"), lsn("replay_lsn"), ivl("write_lag"),
      ivl("flush_lag"), ivl("replay_lag"), int("sync_priority"),
      text("sync_state"), tstz("reply_time")),
    minVersion = 130000)

  val statSlru: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_slru",
    keyCols = Seq(text("name")),
    counterCols = Seq(
      big("blks_zeroed"), big("blks_hit"), big("blks_read"),
      big("blks_written"), big("blks_exists"), big("flushes"),
      big("truncates"), tstz("stats_reset")))

  val statSubscription: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_subscription",
    keyCols = Seq(oid("subid"), text("subname")),
    counterCols = Seq(
      text("worker_type"), int("pid"), int("leader_pid"), oid("relid"),
      lsn("received_lsn"), tstz("last_msg_send_time"),
      tstz("last_msg_receipt_time"), lsn("latest_end_lsn"),
      tstz("latest_end_time")),
    minVersion = 130000)

  val statSubscriptionStats: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_subscription_stats",
    keyCols = Seq(oid("subid")),
    counterCols = Seq(
      big("apply_error_count"), big("sync_table_error_count"),
      tstz("stats_reset"), big("sync_seq_error_count"),
      big("confl_insert_exists"), big("confl_update_origin_differs"),
      big("confl_update_exists"), big("confl_update_deleted"),
      big("confl_update_missing"), big("confl_delete_origin_differs"),
      big("confl_delete_missing"), big("confl_multiple_unique_conflicts")))

  val statWal: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_wal",
    keyCols = Seq.empty,
    counterCols = Seq(
      big("wal_records"), big("wal_fpi"), num("wal_bytes"),
      big("wal_buffers_full"), big("wal_write"), big("wal_sync"),
      dp("wal_write_time"), dp("wal_sync_time"), tstz("stats_reset")))

  val statWalReceiver: DatasourceSpec = DatasourceSpec(
    name = "powa_stat_wal_receiver",
    keyCols = Seq(text("slot_name"), text("sender_host"), int("sender_port")),
    counterCols = Seq(
      int("pid"), text("status"), lsn("receive_start_lsn"),
      int("receive_start_tli"), lsn("last_received_lsn"), lsn("written_lsn"),
      lsn("flushed_lsn"), int("received_tli"), tstz("last_msg_send_time"),
      tstz("last_msg_receipt_time"), lsn("latest_end_lsn"),
      tstz("latest_end_time"), text("conninfo")),
    minVersion = 130000)

  /** Every registered datasource, in registry order. */
  val all: Seq[DatasourceSpec] = Seq(
    statements, userFunctions, allIndexes, allTables, kcache, qualstats,
    waitSampling,
    replicationSlots, statActivity, statArchiver, statBgwriter,
    statCheckpointer, statDatabase, statDatabaseConflicts, statIo, statLock,
    statRecovery, statReplication, statSlru, statSubscription,
    statSubscriptionStats, statWal, statWalReceiver)

  def byName(name: String): DatasourceSpec =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"unknown datasource $name"))
}
