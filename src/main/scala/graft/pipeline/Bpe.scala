package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the iterative merge-learning
  * loop (Sennrich et al. 2016, the GPT-2 vocabulary recipe), built
  * corpus-scale: the corpus is touched ONCE (a word-count hash
  * aggregate); every merge round then works on the WORD-VOCABULARY
  * frame, which is orders of magnitude smaller than the corpus at any
  * scale (100 TB of text is ~100M distinct words). Each round is one
  * vocab-sized pair-count aggregate + a driver collect bounded by the
  * candidate window (documented below) + one codegen'd projection
  * applying the chosen merges via string `replace` — no UDFs, no
  * per-row driver loops.
  *
  * Word representation: every symbol is individually wrapped in the
  * `Sep` control char (`•a••b••c•` for [a,b,c]). A merge (a,b) is then
  * the plain left-to-right non-overlapping string replacement
  * `•a••b•` → `•ab•`, which is exactly BPE's greedy within-word merge
  * order, with no false submatches (symbols never contain `Sep` — the
  * one-in-a-billion word that does is dropped identically at train
  * and segment time) and no lost adjacent matches (each symbol keeps
  * its own wrappers, so consuming one match never eats the
  * neighbouring pair's delimiter — the classic single-separator
  * overlap bug).
  *
  * Scale notes for the 30k-merge production run: rounds are
  * inherently sequential (each merge changes the pair counts the next
  * round ranks), so the real-scale lever is `mergesPerRound` — apply
  * the top-M CONFLICT-FREE pairs (no shared symbol, so applying one
  * cannot create or destroy occurrences of another within the stale
  * count window) per round, the standard batched-BPE approximation;
  * with M=1 the output is exactly the sequential reference (the
  * oracle-gated path). The per-round driver collect is
  * `candidateWindow` rows (default 8·M), not the vocabulary.
  */
object Bpe {
  val Sep = "\u0001"
  private val Sep2 = Sep + Sep

  /** chars of the named word column, each wrapped in Sep:
    * `•a••b••c•` for "abc". */
  private def repOf(wordCol: String): Column =
    concat(lit(Sep),
      array_join(expr(s"transform(sequence(1, length($wordCol)), " +
        s"i -> substring($wordCol, i, 1))"), Sep2),
      lit(Sep))

  /** (word, cnt, rep): the corpus's single full pass. Empty words and
    * words containing Sep are dropped (the same filter segments use). */
  def wordReps(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "" && !col("__w").contains(Sep))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("__w").as("word"), col("cnt"), repOf("__w").as("rep"))

  /** Adjacent-symbol pairs of each rep row, weighted by word count:
    * (a, b, n). One hash-agg exchange over the vocab frame. */
  private def pairCounts(reps: DataFrame): DataFrame =
    reps.select(col("cnt"),
        expr(s"split(trim(BOTH '$Sep' FROM rep), '$Sep2')").as("syms"))
      .filter(size(col("syms")) >= 2) // single-symbol words: no pairs
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** One merge's replace: `•a••b•` → `•ab•` over a rep column. */
  private def applyMerge(rep: Column, a: String, b: String): Column =
    call_function("replace", rep,
      lit(Sep + a + Sep2 + b + Sep), lit(Sep + a + b + Sep))

  /** Learn `merges` BPE merges: returns (merge_rank, a, b, merged,
    * pair_n) in learned order. Ties rank by (n DESC, a ASC, b ASC) —
    * fully deterministic. With mergesPerRound > 1, each round applies
    * the top-M conflict-free pairs under the round's (stale) counts;
    * M=1 is the exact sequential reference. Stops early when no pair
    * occurs twice (nothing left worth merging).
    *
    * Driver collects per round: `8·mergesPerRound` candidate rows (a
    * TakeOrdered over the pair counts) — bounded by configuration,
    * never by data. The vocab frame is localCheckpoint'd each round to
    * keep lineage flat across many rounds. */
  def train(docs: DataFrame, textCol: String, merges: Int,
      mergesPerRound: Int = 1): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    require(mergesPerRound >= 1,
      s"mergesPerRound must be >= 1, got $mergesPerRound")
    val spark = docs.sparkSession
    var reps = wordReps(docs, textCol).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[
      (Int, String, String, String, Long)]
    var rank = 0
    while (rank < merges) {
      val window = 8 * mergesPerRound
      val top = pairCounts(reps)
        .filter(col("n") >= 2L)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(window)
        .collect() // <= 8*M rows by construction — config-bounded
      if (top.isEmpty) { rank = merges } // nothing mergeable: stop
      else {
        val chosen = selectConflictFree(
          top.toIndexedSeq.map(r =>
            (r.getString(0), r.getString(1), r.getLong(2))),
          math.min(mergesPerRound, merges - rank))
        if (chosen.isEmpty) { rank = merges }
        else {
          val newRep = chosen.foldLeft(col("rep")) { case (c, (a, b, _)) =>
            applyMerge(c, a, b) }
          reps = reps.withColumn("rep", newRep).localCheckpoint()
          chosen.foreach { case (a, b, n) =>
            rank += 1
            learned += ((rank, a, b, a + b, n))
          }
        }
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("merge_rank", "a", "b", "merged", "pair_n")
  }

  /** Residual pair counts after applying a standing merge table to a
    * (new) corpus — the incremental/vocab-drift form: "with the
    * tokenizer we already shipped, which merges would the NEXT
    * training rounds learn on this batch?" A residual pair surging
    * past the shipped merges' counts is drift (new domain, new
    * language, new boilerplate). Exactly train's next-round candidate
    * frame: one corpus pass into word counts, the merge chain applied
    * over the vocab frame, one pair-count aggregate — top `topK` by
    * the training order (n DESC, a, b). */
  def residualPairs(docs: DataFrame, textCol: String,
      mergesDf: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val merges = mergesDf.select(col("merge_rank"), col("a"), col("b"))
      .orderBy(col("merge_rank"))
      .collect() // <= configured merge count — bounded
      .map(r => (r.getString(1), r.getString(2)))
    var reps = wordReps(docs, textCol)
    merges.grouped(64).foreach { batch =>
      val folded = batch.foldLeft(col("rep")) { case (c, (a, b)) =>
        applyMerge(c, a, b) }
      reps = reps.withColumn("rep", folded).localCheckpoint()
    }
    pairCounts(reps)
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Greedy conflict-free selection for a batched round: a pair is
    * taken only if its components AND its merged result are disjoint
    * from every previously taken pair's components and merged result.
    * Component-only checking is not enough: an earlier pair's merge
    * can CREATE occurrences of a later pair whose component equals
    * the earlier merged string (e.g. (a,bc) chosen with (abc,d) —
    * the first replace manufactures •abc• adjacencies the stale
    * counts never observed), and symmetrically a later pair's merged
    * string may equal an earlier component. Tracking the merged
    * string on both sides keeps every applied merge valid under the
    * round's stale counts. */
  private[graft] def selectConflictFree(
      cands: Seq[(String, String, Long)],
      max: Int): Vector[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    cands.iterator.filter { case (a, b, _) =>
      val m = a + b
      if (used(a) || used(b) || used(m)) false
      else { used += a; used += b; used += m; true }
    }.take(max).toVector
  }

  /** Segment a corpus with a learned merge table: per document the
    * subword count and the segmented text (symbols '+'-joined within a
    * word, words ' '-joined in original order). The merge table is
    * collected (≤ merges rows — bounded by the training config) and
    * applied in rank order as chained `replace` projections over the
    * DISTINCT-WORD frame, then joined back to the token stream — the
    * corpus is scanned twice (tokenize, join) regardless of merge
    * count. Replace chains are folded in batches of 64 with a
    * localCheckpoint between batches so a 30k-merge table neither
    * overflows codegen nor builds a 30k-node lineage. */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame = {
    val merges = mergesDf.select(col("merge_rank"), col("a"), col("b"))
      .orderBy(col("merge_rank"))
      .collect() // <= configured merge count — bounded
      .map(r => (r.getString(1), r.getString(2)))
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
    var words = toks.select(col("word")).distinct()
      .withColumn("rep", repOf("word"))
    merges.grouped(64).foreach { batch =>
      val folded = batch.foldLeft(col("rep")) { case (c, (a, b)) =>
        applyMerge(c, a, b) }
      words = words.withColumn("rep", folded).localCheckpoint()
    }
    val seg = words.select(col("word"),
      expr(s"replace(trim(BOTH '$Sep' FROM rep), '$Sep2', '+')").as("seg"),
      size(expr(s"split(trim(BOTH '$Sep' FROM rep), '$Sep2')"))
        .cast("long").as("nsub"))
    toks.join(seg, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("nsub")).as("n_subwords"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(pos, seg))), " +
            "x -> x.seg)"), " ").as("seg_text"))
  }
}
