package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def merges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("merge_rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("hand corpus: single mergeable pair, early stop below count 2") {
    val m = merges(Bpe.train(docsOf("ab ab ac"), "text", merges = 4))
    // (a,b) occurs twice -> merged; (a,c) occurs once -> never merged
    assert(m.toSeq === Seq((1, "a", "b", "ab", 2L)))
  }

  test("greedy left-to-right within a run: aaa merges as (aa)a") {
    val m = merges(Bpe.train(docsOf("aaa aaa"), "text", merges = 4))
    // round 1: pair (a,a) appears twice per word x2 words = 4; the
    // left-to-right merge leaves [aa, a], so round 2 learns (aa, a)
    assert(m.toSeq === Seq(
      (1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L)))
  }

  test("tie-break is (n DESC, a ASC, b ASC)") {
    val m = merges(Bpe.train(docsOf("ab cd ab cd"), "text", merges = 2))
    assert(m.toSeq === Seq(
      (1, "a", "b", "ab", 2L), (2, "c", "d", "cd", 2L)))
  }

  test("batched round never applies two pairs sharing a symbol") {
    // (a,b) and (b,c) tie at 2 but share b: round 1 applies only
    // (a,b); (b,c) survives to round 2 with its count intact
    val m = merges(Bpe.train(docsOf("ab bc ab bc"), "text",
      merges = 2, mergesPerRound = 2))
    assert(m.toSeq === Seq(
      (1, "a", "b", "ab", 2L), (2, "b", "c", "bc", 2L)))
  }

  test("conflict selection also fences the MERGED string both ways") {
    // (a,bc) merges to "abc": a later candidate with component "abc"
    // would consume adjacencies the first replace manufactures inside
    // the same round — must be rejected even though its plain
    // components {abc,d} are disjoint from {a,bc}
    val sel1 = Bpe.selectConflictFree(
      Seq(("a", "bc", 10L), ("abc", "d", 9L), ("x", "y", 8L)), 3)
    assert(sel1 === Vector(("a", "bc", 10L), ("x", "y", 8L)))
    // symmetrically: a later pair whose merged string equals an
    // earlier component must be rejected ((a,b) -> "ab" vs ("ab","c"))
    val sel2 = Bpe.selectConflictFree(
      Seq(("ab", "c", 10L), ("a", "b", 9L), ("u", "v", 8L)), 3)
    assert(sel2 === Vector(("ab", "c", 10L), ("u", "v", 8L)))
  }

  test("batched == sequential when the top pairs are disjoint") {
    val corpus = docsOf("ab cd ef ab cd ef gh gh")
    val seq1 = merges(Bpe.train(corpus, "text", merges = 4))
    val bat2 = merges(Bpe.train(corpus, "text", merges = 4,
      mergesPerRound = 2))
    assert(seq1.toSeq === bat2.toSeq)
  }

  test("segment: hand-checked subword split and counts") {
    val corpus = docsOf("ab ab ac aaa")
    val m = Bpe.train(corpus, "text", merges = 2)
    // learned: (a,a) then (a,b) — ties rank (a,a) < (a,b)
    assert(merges(m).map(t => (t._2, t._3)).toSeq ===
      Seq(("a", "a"), ("a", "b")))
    val seg = Bpe.segment(docsOf("ab ac aaa"), "doc_id", "text", m)
      .collect()
    assert(seg.length === 1)
    assert(seg(0).getAs[Long]("n_subwords") === 5L)
    assert(seg(0).getAs[String]("seg_text") === "ab a+c aa+a")
  }

  test("segmentation is lossless: dropping '+' restores the tokens") {
    val docs = Tables.documents(spark, sf).limit(50)
    val m = Bpe.train(docs, "text", merges = 4)
    val seg = Bpe.segment(docs, "doc_id", "text", m)
    val restored = seg.select(col("doc_id"),
      regexp_replace(col("seg_text"), "\\+", "").as("t"))
    val expected = docs.select(col("doc_id"),
      array_join(filter(split(col("text"), " +"), x => x =!= ""), " ")
        .as("t"))
    assert(restored.except(expected).isEmpty && expected.except(restored).isEmpty)
  }

  test("random corpora: distributed train equals an in-memory " +
      "reference implementation of sequential BPE") {
    // reference: the textbook loop on a driver-side word-count map —
    // same tie-break (n DESC, a ASC, b ASC), same n >= 2 stop, same
    // greedy left-to-right merge within a word
    def refBpe(words: Map[String, Long],
        merges: Int): Seq[(Int, String, String, String, Long)] = {
      var reps: Map[Vector[String], Long] = words.map { case (w, c) =>
        w.toVector.map(_.toString) -> c }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, Long)]
      var rank = 0
      var go = true
      while (go && rank < merges) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        reps.foreach { case (syms, c) =>
          syms.sliding(2).foreach {
            case Vector(a, b) =>
              counts((a, b)) = counts.getOrElse((a, b), 0L) + c
            case _ => ()
          }
        }
        val eligible = counts.filter(_._2 >= 2L)
        if (eligible.isEmpty) go = false
        else {
          val ((a, b), n) = eligible.minBy { case ((x, y), m) =>
            (-m, x, y) }
          def mergeGreedy(syms: Vector[String]): Vector[String] = {
            val r = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                r += (a + b); i += 2
              } else { r += syms(i); i += 1 }
            }
            r.result()
          }
          reps = reps.groupMapReduce { case (syms, _) =>
            mergeGreedy(syms) }(_._2)(_ + _)
          rank += 1
          out += ((rank, a, b, a + b, n))
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val alphabet = "abc"
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(5))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val counts = words.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong }
      val text = words.mkString(" ")
      val got = merges(Bpe.train(docsOf(text), "text", merges = 6))
      val want = refBpe(counts, 6)
      assert(got.toSeq === want, s"trial $trial corpus: $text")
    }
  }

  test("residualPairs ranks exactly what the next training round " +
      "would learn") {
    val corpus = docsOf("ab ab ab cd cd")
    val m1 = Bpe.train(corpus, "text", merges = 1)
    val top = Bpe.residualPairs(corpus, "text", m1, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // after (a,b) merges, the top residual pair is (c,d) at count 2 —
    // and training one more round learns exactly that merge
    assert(top.headOption === Some(("c", "d", 2L)))
    val m2 = merges(Bpe.train(corpus, "text", merges = 2))
    assert(m2.last === (2, "c", "d", "cd", 2L))
  }

  test("degenerate corpus: nothing repeats -> empty merge table -> " +
      "segmentation is the plain character split") {
    val corpus = docsOf("ab cd ef") // every pair occurs once
    val m = Bpe.train(corpus, "text", merges = 4)
    assert(m.count() === 0L)
    val seg = Bpe.segment(corpus, "doc_id", "text", m).collect()
    assert(seg.length === 1)
    assert(seg(0).getAs[String]("seg_text") === "a+b c+d e+f")
    assert(seg(0).getAs[Long]("n_subwords") === 6L)
  }

  test("more merges never increase the subword count") {
    val docs = Tables.documents(spark, sf).limit(50)
    def total(n: Int): Long =
      Bpe.segment(docs, "doc_id", "text", Bpe.train(docs, "text", n))
        .agg(sum(col("n_subwords"))).head().getLong(0)
    val t1 = total(1); val t4 = total(4)
    assert(t4 <= t1, s"4 merges gave $t4 subwords vs $t1 at 1 merge")
  }

  test("batched M=4 vs sequential M=1 on the real corpus: vocab " +
      "overlap and holdout segmentation-agreement bounds") {
    // The production path (mergesPerRound > 1) applies the round's
    // top-M conflict-free pairs under stale counts; M=1 is the exact
    // sequential reference. The approximation's committed quality
    // evidence (round-10 VERDICT item 5): on the real sf0.001 corpus
    // with an 80/20 train/holdout split, the learned vocabularies and
    // the holdout segmentations must agree within the stated bounds.
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val holdout = docs.filter(col("doc_id") % 5 === 0)
    val nMerges = 16
    val m1 = Bpe.train(train, "text", merges = nMerges)
    val m4 = Bpe.train(train, "text", merges = nMerges,
      mergesPerRound = 4)
    val v1 = merges(m1).map(_._4).toSet
    val v4 = merges(m4).map(_._4).toSet
    val overlap = (v1 intersect v4).size.toDouble / nMerges
    assert(overlap >= 0.75,
      f"vocab overlap $overlap%.2f < 0.75 (v1 -- v4 = ${v1 -- v4}, " +
        s"v4 -- v1 = ${v4 -- v1})")
    // holdout: per-doc subword counts from both tokenizers
    def seg(m: org.apache.spark.sql.DataFrame) =
      Bpe.segment(holdout, "doc_id", "text", m)
        .select(col("doc_id"), col("n_subwords")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = seg(m1); val s4 = seg(m4)
    assert(s1.keySet === s4.keySet)
    // exact per-doc equality is the wrong metric: a different merge
    // ORDER legitimately swaps a few tail merges, and every doc
    // containing a swapped merge shifts by a token or two. The honest
    // agreement measures: per-doc counts stay within a small relative
    // deviation, and the corpus-level compression is the same.
    val maxDevDoc = s1.map { case (d, n) =>
      math.abs(n - s4(d)).toDouble / n }.max
    assert(maxDevDoc <= 0.10,
      f"a holdout doc's subword count deviates $maxDevDoc%.3f (> 10%%)")
    val t1 = s1.values.sum.toDouble
    val t4 = s4.values.sum.toDouble
    assert(math.abs(t1 - t4) / t1 <= 0.02,
      f"total holdout subwords differ by ${math.abs(t1 - t4) / t1}%.4f")
  }
}
