package graft.core

import java.nio.file.{Files, Path, Paths}

/** Per-(store root, datasource, srvid) mutation lock for store
  * relations maintained OUTSIDE the engine's tick — the index family
  * (`powa_index_<name>`), whose admission (`appendIvfIndexStore`),
  * build, and compaction entry points are library calls with no
  * snapshot lock above them.
  *
  * Why it must exist (round-11 VERDICT item 2): the store's commit
  * protocol assumes a SINGLE MUTATOR per partition link
  * (AtomicSwap.appendInto / replace scaladoc). An append racing a
  * compaction on the same index partition breaks that assumption with
  * a real lost-batch window: compaction pins the manifest (version
  * v1's file list), the append commits its batch INTO v1 and
  * republishes, then compaction swaps the link to a v2 rebuilt from
  * the pre-batch pin — the admitted batch is stranded in the retained
  * predecessor and GC'd at the next swap. No reader ever sees a torn
  * generation (every individual commit stays atomic); the batch is
  * simply, silently, gone. The same reasoning covers the delete side:
  * `Engine.deleteServer`'s per-server index sweep takes this lock per
  * swept partition, so a racing compaction cannot republish (and
  * thereby resurrect) rows the sweep just purged.
  *
  * Shape: same two-layer discipline as the engine's snapshot lock and
  * the registry's config lock — a per-key JVM monitor first
  * (FileChannel locks are held per-PROCESS; a second same-JVM attempt
  * throws OverlappingFileLockException instead of queueing), then a
  * BLOCKING cross-process file lock under `<root>/_locks/`. Blocking,
  * not NOWAIT: admission and compaction are maintenance writes on the
  * ingest cadence — queueing for the milliseconds a sibling commit
  * takes is the useful semantic, unlike the tick's fail-fast parity
  * with `powa_prevent_concurrent_snapshot`. Re-entrant per key so a
  * locked caller can compose locked helpers. The generic
  * [[withLockFile]] form is shared with RegistryStore's config lock
  * (one implementation of the subtle depth/monitor/release ordering,
  * not two drifting copies — round-12 review).
  *
  * READS never take it: probes pin a manifest atomically and finish on
  * the retained predecessor if a swap lands mid-query — the store's
  * standard reader contract needs no serialization against writers.
  *
  * The lock file name embeds datasource AND srvid, so different
  * indexes and different tenants never contend; it is disjoint from
  * the engine's `srvid=N.lock` tick lock by the `<ds>.` prefix.
  * The per-key monitor map is never pruned — bounded by the distinct
  * (root, ds, srvid) keys a JVM touches, a few bytes each.
  *
  * 100 TB note: FileChannel locks require a POSIX filesystem — an
  * object-store deployment (S3/GCS, no advisory locks) swaps the
  * mutex behind this one call site for the catalog/commit-service
  * primitive its table format already has (Delta LogStore
  * put-if-absent, Iceberg catalog CAS, a DynamoDB/ZK mutex). The
  * lock SCOPE — single mutator per (relation, tenant), readers never
  * blocked — is the durable design; the mechanism is deployment
  * plumbing (SCALE.md, orchestration). */
object MutationLock {

  private final class LockState { var depth = 0 }
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, LockState]()

  /** The shared two-layer lock: JVM monitor keyed on the canonical
    * lock-file path (re-entrant via depth), then a blocking
    * cross-process FileChannel lock on the file itself. The file's
    * parent directory is created if absent. */
  def withLockFile[T](lockFile: Path)(body: => T): T = {
    val key = lockFile.toAbsolutePath.normalize.toString
    val st = jvmLocks.computeIfAbsent(key, _ => new LockState)
    st.synchronized {
      if (st.depth > 0) { st.depth += 1; try body finally st.depth -= 1 }
      else {
        Files.createDirectories(lockFile.getParent)
        val ch = java.nio.channels.FileChannel.open(lockFile,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val l = ch.lock() // blocking — maintenance writes queue
          st.depth = 1
          try body finally { st.depth = 0; l.release() }
        } finally ch.close()
      }
    }
  }

  def withPartitionLock[T](root: String, ds: String, srvid: Int)
      (body: => T): T =
    withLockFile(Paths.get(root, "_locks", s"$ds.srvid=$srvid.lock"))(body)
}
