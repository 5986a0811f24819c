package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming connected components — the "dedup index maintained as
  * batches land" shape: each micro-batch of edges is folded into the
  * running label frame with [[graft.pipeline.Dedup.ccIncremental]],
  * which joins the new edges into the existing star forest and
  * re-converges locally (O(log new-component size) rounds, not a
  * from-scratch run).
  *
  * CC is a GLOBAL computation, so Spark's per-key state stores
  * (mapGroupsWithState) don't apply — `foreachBatch` is the honest
  * vehicle: the label frame IS the state, `localCheckpoint`ed per
  * batch to truncate lineage (at cluster scale it would be a
  * transactional table and each fold one incremental MERGE). The final
  * labels are BATCHING-INDEPENDENT: any split of the edge stream folds
  * to the labels of one batch run over the union (PropertySpec pins
  * incremental == batch on random splits), which is exactly what lets
  * an oracle check the end state without modeling micro-batch
  * boundaries.
  */
object StreamCc {

  /** Drive a streaming edge frame (`i`, `j` long columns) to completion
    * (AvailableNow) folding every micro-batch into the label frame;
    * returns the final (id, cluster, is_keeper) labels. */
  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    var labels: DataFrame =
      Seq.empty[(Long, Long)].toDF("id", "cluster")
    val fold = (batch: DataFrame, batchId: Long) => {
      if (!batch.isEmpty) {
        labels = graft.pipeline.Dedup
          .ccIncremental(labels, batch.select(col("i"), col("j")), "id")
          .select(col("id"), col("cluster"))
          .localCheckpoint()
      }
      ()
    }
    // state partitions sized to the fold's label frames, not the batch
    // session's scan parallelism (StreamTuning scaladoc); the inner
    // ccIncremental jobs plan per micro-batch, so the scope covers them
    StreamTuning.scoped(spark) {
      val q = edges.writeStream.foreachBatch(fold)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    labels.select(col("id"), col("cluster"),
      (col("id") === col("cluster")).as("is_keeper"))
  }
}
