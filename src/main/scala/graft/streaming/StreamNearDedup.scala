package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-dup admission control — the in-flight form of
  * incremental dedup: documents ARRIVE as a stream, and each
  * micro-batch probes the standing corpus's LSH signature index
  * ([[graft.pipeline.Dedup.signatureIndex]]) for verified near-dup
  * pairs before the batch is admitted downstream.
  *
  * Like [[StreamCc]], `foreachBatch` is the honest vehicle: the index
  * is a corpus-wide structure, not per-key state, so Spark's state
  * stores (mapGroupsWithState / transformWithState) don't apply — at
  * cluster scale the index is a persisted table and each batch one
  * probe join against it. The emitted pair set is BATCHING-INDEPENDENT:
  * a pair (i, j) surfaces whenever EITHER member arrives, and the
  * final `dropDuplicates` collapses the double-sighting when both
  * members arrive in different batches — so any split of the arrival
  * stream folds to the batch `minhashPairsIncremental` over the union
  * of arrivals, which is exactly what lets a plain-SQL oracle check
  * the end state without modeling micro-batch boundaries.
  */
object StreamNearDedup {

  /** Drive a streaming frame of arriving doc ids (single `idCol`
    * column) to completion (AvailableNow), probing the (hsh, banded)
    * signature index per micro-batch; returns the union of verified
    * pairs touching any arrival, deduplicated across batches. */
  def run(spark: SparkSession, arrivals: DataFrame, hsh: DataFrame,
      banded: DataFrame, idCol: String, threshold: Double): DataFrame = {
    var acc: Option[DataFrame] = None
    val fold = (batch: DataFrame, batchId: Long) => {
      if (!batch.isEmpty) {
        val pairs = graft.pipeline.Dedup
          .probeIndex(hsh, banded, batch, idCol, threshold)
          .localCheckpoint() // truncate lineage; the fold is the state
        acc = Some(acc.map(_.unionByName(pairs)).getOrElse(pairs))
      }
      ()
    }
    // state partitions sized to the batch-sized probes, not the batch
    // session's scan parallelism (StreamTuning scaladoc)
    StreamTuning.scoped(spark) {
      val q = arrivals.writeStream.foreachBatch(fold)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    acc.map(_.dropDuplicates("i", "j")).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, Long, Long, Long, Long, Long)]
        .toDF("i", "j", "inter", "na", "nb", "uni", "jaccard_ppm")
    }
  }
}
