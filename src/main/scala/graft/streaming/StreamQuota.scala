package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Input/output rows for the streaming admission-quota operator. */
case class QuotaDoc(source: String, doc_id: Long)
case class Admitted(source: String, doc_id: Long, admit_seq: Long)

/** Streaming per-source admission quota — the ingest-time form of the
  * batch per-group cap (`Sampling.stratifiedCap` / p17): admit at most
  * `cap` documents per source across the LIFETIME of the stream, then
  * drop. The standing-pipeline primitive for "stop taking boilerplate
  * source X once its budget is filled" without re-running a batch cap
  * over the accumulated corpus.
  *
  * State is ONE long per source (the admitted count) — a
  * `transformWithState` ValueState with no timers (TimeMode.None: the
  * quota is lifetime, not windowed). Determinism: within a micro-batch
  * the per-key rows are folded in (doc_id) order, so with
  * monotone-by-batch doc_ids the admitted set is exactly the first
  * `cap` per source by doc_id — which is what the p82 oracle's
  * ROW_NUMBER form recomputes.
  *
  * Scale shape: state size = |sources| longs regardless of stream
  * length; the only exchange is the groupByKey hash on source.
  */
object StreamQuota {

  class QuotaProcessor(cap: Long)
      extends StatefulProcessor[String, QuotaDoc, Admitted] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[QuotaDoc],
        timers: TimerValues): Iterator[Admitted] = {
      var c = if (admitted.exists()) admitted.get() else 0L
      if (c >= cap) return Iterator.empty // budget already filled
      val out = Vector.newBuilder[Admitted]
      rows.toVector.sortBy(_.doc_id).foreach { d =>
        if (c < cap) { c += 1; out += Admitted(source, d.doc_id, c) }
      }
      admitted.update(c)
      out.result().iterator
    }
  }

  def admit(docs: Dataset[QuotaDoc], cap: Long): Dataset[Admitted] = {
    implicit val outEnc = Encoders.product[Admitted]
    implicit val keyEnc = Encoders.STRING
    docs.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
