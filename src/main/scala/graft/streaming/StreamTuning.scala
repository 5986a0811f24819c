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
    try body
    finally prev match {
      case Some(v) => s.conf.set(ShufflePartitions, v)
      case None => s.conf.unset(ShufflePartitions)
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
