package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Hashing.h60

/** Content-defined chunking (CDC) over token streams + chunk-level exact
  * dedup — the sub-document dedup primitive (rsync/LBFS-style anchoring,
  * applied to text): a chunk boundary falls after token `t` whenever the
  * rolling hash of the `w`-token window ending at `t` is ≡ 0 (mod `div`),
  * so boundaries are anchored to CONTENT, not position — inserting or
  * deleting a sentence shifts every fixed-size block but leaves all CDC
  * chunks outside the edited region identical, which is what lets
  * chunk-hash dedup find shared boilerplate between documents that are
  * not whole-document duplicates.
  *
  * Scale shape: one window shuffle on doc id builds the rolling windows
  * AND the running boundary count AND feeds the per-(doc, chunk)
  * assembly — the groupBy keys extend the window's partition key, so
  * Catalyst reuses the exchange (PlanSpec pins this). The only other
  * shuffle is the chunk-hash dedup aggregation, keyed on a 60-bit hash —
  * uniform by construction, no skew. Mean chunk length is `div` tokens
  * (geometric), so chunk count ~ corpus tokens / div regardless of
  * document sizes.
  */
object Chunking {

  /** Per-token chunk assignment: (doc_id, pos, tok, chunk_seq).
    * `chunk_seq` counts boundaries strictly BEFORE `pos` (a boundary at
    * `pos` closes the chunk that includes `pos`). The rolling window is
    * a lag-chain (codegen'd, no interpreted HOFs in the hot path);
    * windows shorter than `w` (doc head) never form a boundary. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int, div: Int): DataFrame = {
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val winStr = concat_ws(" ",
      (w - 1 to 0 by -1).map(k => lag(col("tok"), k).over(ord)): _*)
    val boundary = when(col("pos") >= w - 1 && h60(winStr) % div === 0, 1L)
      .otherwise(0L)
    Partitioning.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("chunk_seq", coalesce(
        sum(boundary).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
  }

  /** Chunks with their content: (doc_id, chunk_seq, n_toks,
    * chunk_start, chunk_text, chunk_hash). Assembly is a sorted collect
    * per chunk (small arrays, post-shuffle projection). */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      w: Int, div: Int): DataFrame =
    tokenChunks(df, idCol, textCol, w, div)
      .groupBy(col("doc_id"), col("chunk_seq"))
      .agg(count(lit(1)).as("n_toks"), min(col("pos")).as("chunk_start"),
        array_sort(collect_list(struct(col("pos"), col("tok")))).as("parts"))
      .withColumn("chunk_text",
        concat_ws(" ", transform(col("parts"), p => p("tok"))))
      .withColumn("chunk_hash", h60(col("chunk_text")))
      .drop("parts")

  /** Per-document chunk-dedup summary: for every chunk hash the keeper
    * is the first (doc_id, chunk_seq) occurrence; all later occurrences
    * are duplicates. Emits per doc: chunk counts, token counts, and the
    * duplicated-token ratio in ppm (floor — integer-exact both engines).
    */
  def dedupSummary(df: DataFrame, idCol: String, textCol: String,
      w: Int, div: Int): DataFrame = {
    val keep = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_seq"))
    chunks(df, idCol, textCol, w, div)
      .withColumn("dup", (row_number().over(keep) > 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("dup")).as("n_dup_chunks"),
        sum(col("n_toks")).as("n_toks"),
        sum(col("dup") * col("n_toks")).as("dup_toks"))
      .withColumn("dup_ppm",
        expr("dup_toks * 1000000 DIV n_toks"))
  }

  /** Chunk-store containment — partial-copy detection at SUB-DOCUMENT
    * granularity: each document's distinct CDC chunk hashes are its
    * fingerprint set, scored through the same df-capped postings tail
    * as [[TextOps.containmentPairs]] (`containment(i⊂j) =
    * |chunks_i ∩ chunks_j| / |chunks_i|`, integer ppm). Because chunk
    * boundaries are content-anchored, a page quoting half of another
    * page shares those chunks VERBATIM regardless of position — the
    * winnowing detector's robustness with the chunk store as the index,
    * so a pipeline that already ran CDC dedup gets containment nearly
    * for free. Scale shape: the chunk computation's one doc-window
    * shuffle (exchange reused by the assembly groupBy, PlanSpec-pinned)
    * plus the postings self-join, subquadratic under the df cap;
    * chunk-hash postings are (corpus tokens / div)-sized, far below the
    * per-k-gram postings of the winnowing path. */
  def chunkContainment(df: DataFrame, idCol: String, textCol: String,
      w: Int, div: Int, dfCap: Int, minPpm: Long): DataFrame =
    TextOps.containmentOver(
      chunks(df, idCol, textCol, w, div)
        .select(col("doc_id"), col("chunk_hash").as("fp"))
        .distinct()
        .localCheckpoint(), // sizes + both join sides from one computation
      dfCap, minPpm)

  /** Chunk-dedup REWRITE (the C4/RefinedWeb boilerplate-removal pass):
    * drop every chunk whose content already appeared at an earlier
    * (doc_id, chunk_seq) anywhere in the corpus — INCLUDING earlier in
    * the same document, matching C4's global first-occurrence-wins span
    * dedup — and reassemble each document from its surviving chunks, in
    * order. A document that was entirely duplicate content disappears
    * from the output — whole-doc dedup falls out as the degenerate
    * case; intra-doc chunk repetition is trimmed to its first
    * occurrence (PropertySpec pins that reassembly is the exact
    * identity when no chunk repeats). Same shuffle story as
    * [[dedupSummary]] plus one sorted collect per doc. */
  def dedupRewrite(df: DataFrame, idCol: String, textCol: String,
      w: Int, div: Int): DataFrame = {
    val keep = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_seq"))
    chunks(df, idCol, textCol, w, div)
      .withColumn("rn", row_number().over(keep))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept_chunks"),
        sum(col("n_toks")).as("n_kept_toks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_seq"), col("chunk_text")))),
          p => p("chunk_text"))).as("text_deduped"))
  }
}
