package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scoped shuffle-partition sizing for streaming execution.
  *
  * In micro-batch streaming, `spark.sql.shuffle.partitions` is not
  * just a parallelism knob — it is the number of STATE STORE instances
  * per stateful operator, and every micro-batch pays a fixed
  * per-partition cost (provider init, delta-file replay, snapshot
  * write) whether or not the partition holds state. A session sized
  * for a 100 TB batch scan (partitions = cores, or thousands on a
  * cluster) therefore multiplies the per-batch floor of a stream whose
  * state is keyed by a few thousand sessions/windows by orders of
  * magnitude for nothing.
  *
  * The production rule this encodes: size streaming shuffle partitions
  * to STATE VOLUME (target ~100-200 MB of state per store, like any
  * Spark partition), not to the batch session's scan parallelism.
  * `spark.graft.stream.statePartitions` overrides the default when a
  * workload's state genuinely needs more stores; the partition count
  * is baked into a checkpoint at first start, so pick it before
  * go-live and keep it for the checkpoint's lifetime (Spark refuses a
  * mismatched restart loudly).
  */
object StreamTuning {
  val Key = "spark.graft.stream.statePartitions"
  val ShufflePartitions = "spark.sql.shuffle.partitions"

  /** State-store provider selector (`spark.graft.stream.stateStoreProvider`):
    * `rocksdb`, `hdfs`, or a full provider class name. Scoped exactly
    * like the partition count — the provider class is resolved at query
    * start and RECORDED in the checkpoint's offset log (OffsetSeqMetadata
    * re-applies it on restart), so an existing checkpoint keeps the
    * provider it was started with and only NEW checkpoints pick up a
    * changed default — no state-format migration is ever forced on a
    * running checkpoint (StreamIngestSpec pins the restart seam).
    * Unset = Spark's session default (HDFSBackedStateStoreProvider
    * unless the session says otherwise): measured at sf0.1/local[32],
    * the RocksDB provider's per-batch instance open/commit cost exceeds
    * the in-memory HDFS provider's delta write on KB-scale state, so
    * tiny-state test cadences keep the default; at production state
    * volumes (GB per store, where the HDFS provider's JVM-heap maps and
    * full-snapshot uploads are the bottleneck) set `rocksdb`, which also
    * enables changelog checkpointing (commit uploads the delta, not a
    * full snapshot). */
  val ProviderKey = "spark.graft.stream.stateStoreProvider"
  private val ProviderClassConf =
    "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogConf =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  private val RocksDbClass =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val HdfsClass =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private def providerClass(v: String): String = v.trim.toLowerCase match {
    case "rocksdb" => RocksDbClass
    case "hdfs" => HdfsClass
    case _ => v.trim
  }

  /** Run `body` (which must start AND fully drain its streaming query)
    * with shuffle partitions scoped to the stream-state sizing; the
    * session's batch setting is restored afterwards even on failure.
    * Scoping is driver-side session conf, so batch queries planned
    * BEFORE or AFTER the scope are unaffected — but a batch query
    * planned on ANOTHER THREAD of the same session DURING the scope
    * would silently pick up the stream-sized partition count. The
    * engine, bench, and verify mains plan single-threaded per
    * session, which is the assumption this helper makes; a
    * multi-threaded deployment should instead run its streams on a
    * dedicated `SparkSession#newSession()` (separate conf, shared
    * catalog/state) or set the state-store count once at go-live.
    * Prefer [[startScoped]] for plain start-and-drain streams — it
    * closes the leak window to the start call; the full-body form
    * remains for foreachBatch folds whose INNER batch jobs must also
    * plan under the stream sizing. */
  def scoped[T](s: SparkSession, default: Int = 8)(body: => T): T = {
    val parts = s.conf.getOption(Key).map(_.trim.toInt).getOrElse(default)
    require(parts >= 1, s"$Key must be >= 1, got $parts")
    val prev = s.conf.getOption(ShufflePartitions)
    s.conf.set(ShufflePartitions, parts.toString)
    // provider scope: same restore discipline as the partition count.
    // Only pins when the graft conf is SET — the session default is
    // otherwise untouched (p81's transformWithState path sets RocksDB
    // itself; this scope must compose with, not fight, explicit pins).
    val provider = s.conf.getOption(ProviderKey).map(providerClass)
    val prevProv = s.conf.getOption(ProviderClassConf)
    val prevChangelog = s.conf.getOption(ChangelogConf)
    provider.foreach { p =>
      s.conf.set(ProviderClassConf, p)
      if (p == RocksDbClass) s.conf.set(ChangelogConf, "true")
    }
    try body
    finally {
      prev match {
        case Some(v) => s.conf.set(ShufflePartitions, v)
        case None => s.conf.unset(ShufflePartitions)
      }
      if (provider.isDefined) {
        prevProv match {
          case Some(v) => s.conf.set(ProviderClassConf, v)
          case None => s.conf.unset(ProviderClassConf)
        }
        prevChangelog match {
          case Some(v) => s.conf.set(ChangelogConf, v)
          case None => s.conf.unset(ChangelogConf)
        }
      }
    }
  }

  /** Start a streaming query under the stream-state sizing and restore
    * the session conf BEFORE returning: StreamExecution clones the
    * session at construction (its micro-batches plan on the clone's
    * conf snapshot), so the pin needs to be visible only for the
    * `start()` call itself, not the stream's whole drain. This shrinks
    * [[scoped]]'s cross-thread leak window (round-10 ADVICE: a batch
    * query planned on another thread of the same session DURING the
    * scope silently picked up the stream-sized partition count) from
    * the full stream lifetime to the query-construction instant —
    * callers drain with the session conf already back at its batch
    * value. PipelineSpec pins both halves: conf restored at return,
    * running query still using the pinned store count. */
  def startScoped(s: SparkSession, default: Int = 8)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery =
    scoped(s, default)(start)
}
