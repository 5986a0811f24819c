package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("minhash+LSH finds the high-jaccard pairs that exact jaccard finds") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4, 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verified-LSH output is a subset of exact pairs...
    assert(lsh.subsetOf(exact))
    // ...and at jaccard >= 0.9 with 4 bands of 2 rows recall is high
    assert(exact.nonEmpty)
    assert(lsh.size.toDouble / exact.size >= 0.8,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash: identical token sets collide, near-dups are close") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta"),
      (4L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.simhash(col("text"), 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(near < far)
  }

  test("brute-force cosine topk: scores in [-1,1], self excluded, sorted") {
    val top = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0L, 10).collect()
    assert(top.length === 10)
    assert(top.forall(r => r.getLong(0) != 0L))
    val scores = top.map(_.getDouble(1))
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("LSH topk is a subset of a larger brute-force topk's candidates") {
    val brute = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0L, 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0L, 5, 6, 64)
      .collect()
    // every LSH result carries the same cosine the brute force computed
    lsh.foreach { r =>
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }

  test("planesForCorpus: planes grow log2 with corpus / shrink with bucket") {
    import graft.pipeline.Similarity.planesForCorpus
    assert(planesForCorpus(1L << 30, 1024L) === 20) // 2^30 / 2^10
    assert(planesForCorpus(2048L, 1024L) === 1)
    assert(planesForCorpus(100L, 1024L) === 1)      // floor at 1 plane
    assert(planesForCorpus(1000000000L, 1024L) === 20)
    // doubling the corpus adds exactly one plane at powers of two
    assert(planesForCorpus(1L << 21, 1024L) ===
      planesForCorpus(1L << 20, 1024L) + 1)
  }

  test("multi-table LSH recall: identical vectors pair in every table") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val vecs = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.5f)),             // identical to 0
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineDupPairsMulti(vecs, "vec_id", "embedding",
      planes = 3, dim = 64, thresholdPpm = 990000L, tables = 2)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // identical vectors share every bucket in every table -> always found
    assert(pairs === Set((0L, 1L)))
  }

  test("multi-table LSH recall rises with table count toward brute force") {
    import graft.pipeline.Similarity
    graft.functions.NativeFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val th = 400000L // the corpus's near-dup regime (max cosine ~0.48)
    // ground truth: every pair at cosine >= threshold, exact all-pairs
    val e = emb.select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val truth = e.select(col("id").as("i"), col("v").as("vi"))
      .crossJoin(e.select(col("id").as("j"), col("v").as("vj")))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        TextOps.ppm(Similarity.cosine(col("vi"), col("vj"))).as("ppm"))
      .filter(col("ppm") >= th)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    def found(tables: Int): Set[(Long, Long)] =
      Similarity.cosineDupPairsMulti(emb, "vec_id", "embedding",
          planes = 3, dim = 64, thresholdPpm = th, tables = tables)
        .select("i", "j").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (f1, f3, f12) = (found(1), found(3), found(12))
    // verified candidates are never false positives...
    assert(f1.subsetOf(truth) && f3.subsetOf(truth) && f12.subsetOf(truth))
    // ...tables t=0..T-1 nest, so recall is monotone in T by construction
    assert(f1.subsetOf(f3) && f3.subsetOf(f12))
    val (r1, r12) =
      (f1.size.toDouble / truth.size, f12.size.toDouble / truth.size)
    // and the repair is real on this corpus: more independent tables →
    // strictly higher recall, approaching brute force
    // (theory at cos≈0.42, 3 planes: r ≈ 1 − (1 − 0.64³)^T)
    assert(r12 > r1, s"recall did not improve: $r1 -> $r12")
    assert(r12 >= 0.8, s"12-table recall too low: $r12")
  }

  test("k-means-trained IVF codebook: recall >= deterministic sample's") {
    import graft.pipeline.Similarity
    val emb = Tables.embeddings(spark, sf)
    val trained = Similarity.kmeansCodebook(
      Similarity.kmeansCentroidsInt(emb, "vec_id", "embedding", k = 8, iters = 2))
    assert(trained.nonEmpty && trained.forall(_._2.length == 64))
    val e = emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val sampled = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq.sortBy(_._1)
    val queries = Seq(50L, 111L, 200L, 262L, 333L, 404L, 471L)
    def recall(codebook: Seq[(Long, Seq[Double])]): Double = {
      val hits = queries.map { q =>
        val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet
        val got = Similarity.ivfTopKWith(emb, "vec_id", "embedding", q, 10,
          codebook).collect().map(_.getLong(0)).toSet
        (got intersect truth).size.toDouble / truth.size
      }
      hits.sum / hits.size
    }
    val (rt, rs) = (recall(trained), recall(sampled))
    // Lloyd iterations move centroids toward the data's real clusters;
    // on this corpus the trained codebook must not lose to the sample
    assert(rt >= rs, s"trained recall $rt < sampled recall $rs")
  }

  test("assignCellsInt: matches driver-side argmin; cluster sample bounded") {
    import graft.pipeline.Similarity
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.intCodebook(
      Similarity.kmeansCentroidsInt(emb, "vec_id", "embedding", k = 8, iters = 2))
    val assigned = Similarity.assignCellsInt(emb, "vec_id", "embedding", cents)
    // pass-through: every input column survives, plus `cell`
    assert(assigned.columns.toSet === emb.columns.toSet + "cell")
    val got = assigned.select(col("vec_id").cast("long"), col("cell"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * 10000).cast("long")).as("qv"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val qv = r.getSeq[Long](2)
      // squared-L2 argmin with tie -> lowest centroid id, recomputed
      // in plain Scala from the same integer codebook
      val want = cents.map { case (cid, cv) =>
        (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
      assert(r.getLong(1) === want, s"vec ${r.getLong(0)}")
    }
    val sampled = Sampling.stratifiedCap(assigned, "cell", "vec_id", n = 10)
    val perCell = sampled.groupBy("cell").count().collect().map(_.getLong(1))
    assert(perCell.forall(_ <= 10))
    // every surviving cell is a real centroid id
    val cells = sampled.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(cents.map(_._1).toSet))
  }

  test("assignCellsDot: codegen scale path agrees with the integer path") {
    import graft.pipeline.Similarity
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.kmeansCentroidsInt(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val intsAssign = Similarity.assignCellsInt(emb, "vec_id", "embedding",
        Similarity.intCodebook(cents))
      .select(col("vec_id").cast("long"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // double codebook = e4 centroids / 1e4 — same centroids, double math
    val dots = Similarity.assignCellsDot(emb, "vec_id", "embedding",
        Similarity.kmeansCodebook(cents))
      .select(col("vec_id").cast("long"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dots.keySet === intsAssign.keySet)
    // double vs e4-integer distances can split only near-equidistant
    // boundary points; on this corpus the paths must agree essentially
    // everywhere (hard floor: 98%)
    val agree = dots.count { case (id, c) => intsAssign(id) == c }
    assert(agree.toDouble / dots.size >= 0.98,
      s"only $agree/${dots.size} cells agree")
  }

  test("semanticDedup: min-id keeper within a cell, blind across cells") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val v = Seq(1.0f, 0.0f, 0.0f)
    val w = Seq(0.0f, 1.0f, 0.0f)
    val df = Seq(
      (1L, v, 0L), (2L, v, 0L), (3L, v, 0L), // same vector, same cell
      (4L, w, 0L),                           // same cell, orthogonal
      (5L, v, 1L)                            // identical to 1 but other cell
    ).toDF("vec_id", "embedding", "cell")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding", "cell",
        thresholdPpm = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2,3 drop (near-dup of 1 in cell 0); 4 survives (cos 0 < tau);
    // 5 survives UNTOUCHED — cross-cell pairs are never examined
    assert(out === Set((1L, 0L), (4L, 0L), (5L, 1L)))
  }

  test("connected components: chains collapse to min label, singletons keep") {
    import spark.implicits._
    import graft.pipeline.Dedup
    // chain 5-4-3-2 (diameter 3), pair (10,11), singleton 20
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (10L, 11L)).toDF("i", "j")
    val nodes = Seq(2L, 3L, 4L, 5L, 10L, 11L, 20L).toDF("doc_id")
    val out = Dedup.connectedComponents(edges, nodes, "doc_id")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (2L, 2L, true), (3L, 2L, false), (4L, 2L, false), (5L, 2L, false),
      (10L, 10L, true), (11L, 10L, false), (20L, 20L, true)))
  }

  test("multimodal stub: metadata + fixed-width features per asset") {
    val assets = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.extractFeatures(assets, "doc_id", "payload")
    assert(out.count() === 500)
    val r = out.filter(col("doc_id") === 0).head()
    assert(r.getAs[Seq[Double]]("features").size === Multimodal.FeatureDim)
    assert(r.getAs[String]("sig").length === 32)
    assert(r.getAs[Long]("n_bytes") > 0)
  }

  test("lang-id: text made of stopwords classifies deterministically") {
    import spark.implicits._
    val df = Seq((1L, "the a is of and table"), (2L, "der die das und ist"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = TextOps.withLangId(df, "text").select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "unknown")
  }

  test("sampling: deterministic, bounded per group, thin before rank composes") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.bernoulliPpm(docs, "doc_id", 500000L, seed = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulliPpm(docs, "doc_id", 500000L, seed = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b) // hash-seeded: re-runs pick the same rows
    val n = docs.count()
    assert(math.abs(a.size.toDouble / n - 0.5) < 0.15) // ~ the asked rate
    // a different seed picks a different (but equally deterministic) set
    val c = Sampling.bernoulliPpm(docs, "doc_id", 500000L, seed = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== c)

    val capped = Sampling.stratifiedCap(docs, "lang", "doc_id", n = 10)
    val perGroup = capped.groupBy("lang").count()
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ <= 10))
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Sampling.stratifiedCap(docs, "lang", "doc_id", n = 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("removeNearDups keeps exactly the min-id doc of every dup cluster") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x"), (2L, "x"), (3L, "x"), // cluster {1,2,3} via pairs below
      (4L, "y"), (5L, "y"),            // cluster {4,5}
      (6L, "z"))                       // singleton
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("i", "j")
    val kept = Dedup.removeNearDups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 6L))
  }

  test("tfidf rational form ranks a repeated rare term over corpus-wide terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the zebra zebra zebra zebra"),
      (2L, "the quick brown fox"),
      (3L, "the lazy dog sleeps"))
      .toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "the" appears in all 3 docs (df=3); "zebra" only in doc 1 (df=1)
    assert(top(1L) === "zebra")
  }

  test("winnowing: shared text runs share fingerprints, disjoint text shares none") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"intro words here $shared"),
      (2L, s"$shared completely different tail text"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty, "shared run must overlap")
    assert((fp(1L) intersect fp(3L)).isEmpty, "disjoint text must not")
    // determinism: identical input -> identical selected set
    val again = TextOps.winnowFingerprints(docs, "doc_id", "text", 4, 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(again === fp)
  }

  test("decontamination flags exactly the train docs overlapping eval 8-grams") {
    import spark.implicits._
    val run = "a b c d e f g h" // one 8-gram
    val train = Seq(
      (1L, s"$run tail text here"), // shares the run
      (2L, "completely different text with no overlap at all present"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, s"prefix words $run")).toDF("doc_id", "text")
    val out = TextOps.decontaminate(train, eval, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 100L, 1L)))
  }

  test("repetition ratio: looped text scores high, varied text scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham spam ham"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "ab")) // shorter than n -> 0 grams, guard path
      .toDF("doc_id", "text")
    val out = TextOps.withRepetition(docs, "text", n = 3)
      .select("doc_id", "n_grams", "rep_ppm").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._2 > 700000L) // 8 grams, only 2 distinct
    assert(out(2L)._2 === 0L)
    assert(out(3L) === ((0L, 0L)))
  }

  test("redactPii: counts per rule, placeholders in, originals gone") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.com and c.d+x@e.org, call 12-345-678-9012, ssn 123-45-6789"),
      (2L, "clean text, nothing to scrub")).toDF("id", "text")
    val out = TextOps.redactPii(df, "text").orderBy("id").collect()
    assert(out(0).getAs[Int]("n_email") === 2)
    assert(out(0).getAs[Int]("n_phone") === 1)
    assert(out(0).getAs[Int]("n_ssn") === 1)
    val red = out(0).getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
      red.contains("<SSN>"))
    assert(!red.contains("a@b.com") && !red.contains("12-345-678-9012") &&
      !red.contains("123-45-6789"))
    assert(out(1).getAs[Int]("n_email") === 0)
    assert(out(1).getAs[String]("redacted") === "clean text, nothing to scrub")
  }

  test("gopherQuality: each rule can independently reject") {
    import spark.implicits._
    val good = Array.fill(40)("word").mkString(" ") + " the the"
    val tooShort = "the word"
    val longWords = Array.fill(40)("hippopotamus").mkString(" ") + " the"
    val noStop = Array.fill(40)("word").mkString(" ")
    val df = Seq((1L, good), (2L, tooShort), (3L, longWords), (4L, noStop))
      .toDF("doc_id", "text")
    val out = TextOps.gopherQuality(df, "text",
        minWords = 10, maxWords = 100,
        minMeanWordLenPpm = 2000000L, maxMeanWordLenPpm = 6000000L,
        minStopwordPpm = 10000L)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) === true)
    assert(out(2L) === false) // too few words
    assert(out(3L) === false) // mean word length too high
    assert(out(4L) === false) // no stopwords
  }

  test("packSequences: per-shard offsets, bin = first-token DIV budget") {
    import spark.implicits._
    def words(n: Int) = Array.fill(n)("w").mkString(" ")
    val df = Seq(
      (1L, "a", words(300)), (2L, "a", words(300)), (3L, "a", words(300)),
      (10L, "b", words(600))).toDF("doc_id", "source", "text")
    val out = TextOps.packSequences(df, "doc_id", "source", "text", 512L)
      .select("doc_id", "offset", "bin").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((0L, 0L)))
    assert(out(2L) === ((300L, 0L)))
    assert(out(3L) === ((600L, 1L)))
    assert(out(10L) === ((0L, 0L))) // shard b independent of shard a
  }

  test("containment: a partial copy scores high toward the copied doc") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val half = (1 to 30).map(i => s"w$i").mkString(" ") // strict prefix copy
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val docs = Seq((0L, base), (1L, half), (2L, other)).toDF("doc_id", "text")
    val pairs = TextOps.containmentPairs(docs, "doc_id", "text",
        k = 4, w = 5, dfCap = 50, minPpm = 500000L)
      .select("i", "j", "containment_i_ppm", "containment_j_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(pairs.keySet === Set((0L, 1L))) // the unrelated doc pairs with no one
    val (ci, cj) = pairs((0L, 1L))
    // the small doc is almost fully contained in the big one; the big
    // doc only partially in the small — the asymmetry jaccard can't see
    assert(cj >= 800000L, s"copy not detected: $cj")
    assert(ci < cj, s"directionality lost: $ci vs $cj")
  }

  test("url canonicalization: case/port/fragment/slash collapse, query kept") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/",
      "https://www.example.com/A/b",
      "https://www.example.com/A/b#frag",
      "http://host.io:80/x?b=2&a=1",     // param order preserved
      "http://host.io/x?b=2&a=1",
      "https://other.net/p/?q=1")        // slash before query NOT stripped
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val out = urls.select(col("id"),
        graft.pipeline.Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "https://www.example.com/A/b")
    assert(out(1L) === out(0L) && out(2L) === out(0L))
    assert(out(3L) === "http://host.io/x?b=2&a=1")
    assert(out(4L) === out(3L))
    assert(out(5L) === "https://other.net/p/?q=1")
    val dedup = graft.pipeline.Urls.dedupByUrl(urls, "id", "url").collect()
    assert(dedup.length === 3)
    assert(dedup.find(_.getString(0) == out(0L)).get.getLong(2) === 0L) // min-id keeper
  }

  test("sourceMix: scarce source bounds the mix, never upsamples") {
    import spark.implicits._
    // source b is scarce (5 rows) but wants 3x weight of a (100 rows):
    // feasible T = min(100*4/1, 5*4/3) = 6; quotas a=1, b=4 (floor'd)
    val df = ((0 until 100).map(i => (i.toLong, "a")) ++
      (100 until 105).map(i => (i.toLong, "b")))
      .toDF("doc_id", "source")
    val out = Sampling.sourceMix(df, "doc_id", "source",
        weight = when(col("source") === "a", 1L).otherwise(3L))
      .groupBy("source", "n_source", "weight", "keep_ppm")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (na, wa, ppmA, keptA) = out("a")
    val (nb, wb, ppmB, keptB) = out("b")
    assert((na, wa) === ((100L, 1L)) && (nb, wb) === ((5L, 3L)))
    // W=4, T=min(400, 6)=6 -> quota a = 6/4 = 1, quota b = 18/4 = 4
    assert(ppmA === 10000L)  // 1 of 100
    assert(ppmB === 800000L) // 4 of 5
    // the hash filter can never exceed the source's population
    assert(keptA <= na && keptB <= nb)
    // and the scarce source ends up overrepresented, as targeted
    assert(keptB * na > keptA * nb || keptA === 0L)
  }

  test("sourceMix: a zero/null weight fails loudly instead of silently " +
      "dropping the source") {
    import spark.implicits._
    val df = ((0 until 10).map(i => (i.toLong, "a")) ++
      (10 until 20).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    def chain(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    val zero = intercept[Exception] {
      Sampling.sourceMix(df, "doc_id", "source",
        weight = when(col("source") === "a", 1L).otherwise(0L)).count()
    }
    assert(chain(zero).contains("weight must be a positive integer"))
    val nul = intercept[Exception] {
      Sampling.sourceMix(df, "doc_id", "source",
        weight = when(col("source") === "a", 1L).otherwise(lit(null))).count()
    }
    assert(chain(nul).contains("weight must be a positive integer"))
  }

  test("tokenMixture: α=1 weight gives one flat rate, α=0 caps the " +
      "scarce source at 1, budget arithmetic exact") {
    import spark.implicits._
    // a: 4 docs x 100 tokens = 400; b: 1 doc x 100 tokens = 100
    val df = ((0 until 4).map(i => (i.toLong, "a", 100L)) :+
      ((9L, "b", 100L))).toDF("doc_id", "source", "ntok")
    def quotas(weight: org.apache.spark.sql.Column) =
      Sampling.tokenMixture(df, "doc_id", "source", col("ntok"),
          budgetTokens = 250L, weight = weight)
        .select("source", "tok_total", "weight", "tok_target", "keep_ppm")
        .distinct().collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
          r.getLong(4)))).toMap
    // α=1 (weight = token total): proportional sampling IS one global
    // rate — budget/total = 250/500 → 500000 ppm for every source
    val prop = quotas(col("tok_total"))
    assert(prop("a") === ((400L, 200L, 500000L)), prop.toString)
    assert(prop("b") === ((100L, 50L, 500000L)), prop.toString)
    // α=0 (uniform weight): equal token targets, and the scarce source
    // over-spends its share → capped at 1e6, never upsampled
    val flat = quotas(lit(1L))
    assert(flat("a") === ((400L, 125L, 312500L)), flat.toString)
    assert(flat("b") === ((100L, 125L, 1000000L)), flat.toString)
    // kept rows are the hash-selected subset, bounded by the population
    val kept = Sampling.tokenMixture(df, "doc_id", "source", col("ntok"),
        budgetTokens = 250L, weight = col("tok_total"))
      .filter(col("keep")).count()
    assert(kept <= 5L)
  }

  test("tokenMixture: zero weight and negative tokens fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", -5L))
      .toDF("doc_id", "source", "ntok")
    def chain(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    val neg = intercept[Exception] {
      Sampling.tokenMixture(df, "doc_id", "source", col("ntok"),
        budgetTokens = 10L, weight = lit(1L)).count()
    }
    assert(chain(neg).contains("token count must be non-negative"))
    val pos = df.filter(col("ntok") > 0)
    val zero = intercept[Exception] {
      Sampling.tokenMixture(pos, "doc_id", "source", col("ntok"),
        budgetTokens = 10L,
        weight = when(col("source") === "a", 0L).otherwise(1L)).count()
    }
    assert(chain(zero).contains("weight and token total must be positive"))
  }

  test("epochMixture: whole epochs + deterministic partial epoch, " +
      "cap binds with zero remainder, downsample case epochs=0") {
    import spark.implicits._
    // a: 400 tokens, b: 100 tokens; uniform weight, budget 500 →
    // target 250 each. a: 250/400 = 0 full epochs, rem 250 → 625000
    // ppm. b: 250/100 = 2 full epochs, capped at 2 → rem_ppm 0.
    val df = ((0 until 4).map(i => (i.toLong, "a", 100L)) :+
      ((9L, "b", 100L))).toDF("doc_id", "source", "ntok")
    val out = Sampling.epochMixture(df, "doc_id", "source", col("ntok"),
        budgetTokens = 500L, weight = lit(1L), maxEpochs = 2)
      .select("source", "tok_total", "tok_target", "epochs_full",
        "rem_ppm").distinct().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((400L, 250L, 0L, 625000L)), out.toString)
    assert(out("b") === ((100L, 250L, 2L, 0L)), out.toString)
    // n_copies: b rows are exactly epochs_full (cap bound, no partial);
    // a rows are 0 or 1 by the hash — never more
    val copies = Sampling.epochMixture(df, "doc_id", "source",
        col("ntok"), budgetTokens = 500L, weight = lit(1L),
        maxEpochs = 2)
      .select(col("source"), col("n_copies")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(copies.filter(_._1 == "b").map(_._2).toSeq === Seq(2L))
    assert(copies.filter(_._1 == "a").forall(c => c._2 == 0L || c._2 == 1L))
    // uncapped: maxEpochs 5 lets b take its true 2 epochs + 50% partial
    val un = Sampling.epochMixture(df, "doc_id", "source", col("ntok"),
        budgetTokens = 500L, weight = lit(1L), maxEpochs = 5)
      .filter(col("source") === "b")
      .select("epochs_full", "rem_ppm").distinct().collect()
    assert(un.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2L, 500000L)))
  }

  test("calibrationBins: hand-computed reliability bins and ECE; " +
      "out-of-range score and non-binary label fail loudly") {
    import spark.implicits._
    val df = Seq((100000L, 0), (150000L, 1), (950000L, 1))
      .toDF("score_ppm", "label")
    val out = Profiling.calibrationBins(df, col("score_ppm"),
        col("label"), bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bin 1: n=2, acc=1/2=500000, conf=(100000+150000)/2=125000, gap=375000
    // bin 9: n=1, acc=1000000, conf=950000, gap=50000
    // ECE = (375000*2 + 50000*1) div 3 = 266666
    assert(out.toSeq === Seq(
      (1L, 2L, 500000L, 125000L, 375000L, 266666L),
      (9L, 1L, 1000000L, 950000L, 50000L, 266666L)))
    def chain(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    val over = intercept[Exception] {
      Profiling.calibrationBins(Seq((1000000L, 0)).toDF("s", "l"),
        col("s"), col("l")).count()
    }
    assert(chain(over).contains("scorePpm must be in [0, 1e6)"))
    val lab = intercept[Exception] {
      Profiling.calibrationBins(Seq((5L, 2)).toDF("s", "l"),
        col("s"), col("l")).count()
    }
    assert(chain(lab).contains("label must be 0 or 1"))
  }

  test("StreamTuning.scoped: sets state-sized partitions for the body, " +
      "restores the batch setting, honors the override, rejects < 1") {
    val key = graft.streaming.StreamTuning.ShufflePartitions
    val before = spark.conf.get(key)
    graft.streaming.StreamTuning.scoped(spark) {
      assert(spark.conf.get(key) === "8")
    }
    assert(spark.conf.get(key) === before)
    spark.conf.set(graft.streaming.StreamTuning.Key, "3")
    try {
      graft.streaming.StreamTuning.scoped(spark) {
        assert(spark.conf.get(key) === "3")
      }
      assert(spark.conf.get(key) === before)
      spark.conf.set(graft.streaming.StreamTuning.Key, "0")
      intercept[IllegalArgumentException] {
        graft.streaming.StreamTuning.scoped(spark) { () }
      }
      // restored even when the body (or the guard) throws
      assert(spark.conf.get(key) === before)
    } finally spark.conf.unset(graft.streaming.StreamTuning.Key)
  }

  test("StreamTuning.startScoped: conf restored the moment start() " +
      "returns, while the RUNNING stream keeps the pinned store count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val key = graft.streaming.StreamTuning.ShufflePartitions
    val before = spark.conf.get(key)
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("k", "v")
      .groupBy(col("k")).count()
    val q = graft.streaming.StreamTuning.startScoped(spark) {
      df.writeStream.outputMode("complete").format("memory")
        .queryName("tuning_start_probe").start()
    }
    try {
      // the leak window is closed before the drain even begins
      assert(spark.conf.get(key) === before)
      mem.addData((1L, 1L), (2L, 1L))
      q.processAllAvailable()
      // ...and the stream's own cloned session kept the pin: the
      // stateful operator runs 8 state stores, not the batch setting
      val stateParts =
        q.lastProgress.stateOperators.head.numShufflePartitions
      assert(stateParts === 8L,
        s"stream must keep the pinned store count, got $stateParts")
    } finally q.stop()
  }

  test("quantizeInt8: range bound, max element saturates, zero vector safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(3.0f, -2.0f, 1.5f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("vec_id"), col("qvec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // |q| <= 127 everywhere; the max-|x| element hits exactly +/-127
    q.values.foreach(v => assert(v.forall(x => x >= -127 && x <= 127)))
    assert(q(1L)(1) === -127) // -1.0 is the max magnitude of vec 1
    assert(q(3L)(0) === 127)
    assert(q(2L) === Seq(0, 0, 0)) // zero vector: scale guard, no NaN
  }

  test("sessionize: gap splits, boundary-inclusive gap survives, per-key") {
    import spark.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00")),
      (1L, t("2024-01-01 00:29:00")), // 29 min gap: same session
      (1L, t("2024-01-01 00:59:00")), // EXACTLY 30 min: still same (> not >=)
      (1L, t("2024-01-01 01:59:01")), // 30 min + 1 s: new session
      (2L, t("2024-01-01 00:00:00"))) // other key starts at 1 again
      .toDF("user_id", "ts")
    val out = Sessions.sessionize(ev, "user_id", "ts", gapSec = 1800)
      .orderBy("user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
    val stats = Sessions.sessionStats(ev, "user_id", "ts", gapSec = 1800)
      .orderBy("user_id", "session_seq").collect()
    assert(stats.length === 3)
    assert(stats(0).getAs[Long]("n_events") === 3)
    assert(stats(0).getAs[Long]("duration_sec") === 3540)
    assert(stats(1).getAs[Long]("n_events") === 1)
    assert(stats(1).getAs[Long]("duration_sec") === 0)
  }

  test("substringPairs: longest shared run is exact; maxDf drops boilerplate") {
    import spark.implicits._
    // docs 1/2 share exactly the 7-token run "a b c d e f g" (two 6-token
    // windows, one diagonal); doc 3 shares nothing 6 tokens long
    val docs = Seq(
      (1L, "x1 x2 a b c d e f g x3 x4"),
      (2L, "y1 a b c d e f g y2 y3 y4"),
      (3L, "a b c z d e f z z z z"))
      .toDF("doc_id", "text")
    val out = Dedup.substringPairs(docs, "doc_id", "text", k = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Long]("longest_run"), r.getAs[Long]("shared_windows"))))
      .toMap
    assert(out === Map((1L, 2L) -> ((7L, 2L))))
    // boilerplate guard: the shared run appears in BOTH docs -> df 2;
    // maxDf = 1 drops every matching window, so no pairs survive
    assert(Dedup.substringPairs(docs, "doc_id", "text", k = 6,
      maxDf = Some(1)).count() === 0)
  }

  test("cdc chunks: a verbatim copy duplicates every chunk; distinct text none") {
    import spark.implicits._
    val base = (1 to 100).map(i => s"tok${i % 23}w${i % 7}").mkString(" ")
    val other = (1 to 100).map(i => s"alt${i % 19}x${i % 5}").mkString(" ")
    val docs = Seq((0L, base), (1L, base), (2L, other)).toDF("doc_id", "text")
    val out = Chunking.dedupSummary(docs, "doc_id", "text", w = 4, div = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("dup_ppm") === 0L)   // keeper
    assert(out(1).getAs[Long]("dup_ppm") === 1000000L) // full copy
    assert(out(1).getAs[Long]("n_dup_chunks") === out(1).getAs[Long]("n_chunks"))
    assert(out(2).getAs[Long]("dup_ppm") === 0L)   // disjoint content
    assert(out(0).getAs[Long]("n_toks") === 100L)
  }

  test("cdc chunks: boundaries are content-anchored — a prefix edit only " +
      "disturbs chunks that contain it") {
    import spark.implicits._
    val base = (1 to 120).map(i => s"tok${i % 23}w${i % 7}").mkString(" ")
    val edited = "inserted preamble words " + base
    val docs = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    val out = Chunking.dedupSummary(docs, "doc_id", "text", w = 4, div = 8)
      .orderBy("doc_id").collect()
    val (n, dup) = (out(1).getAs[Long]("n_chunks"), out(1).getAs[Long]("n_dup_chunks"))
    // a FIXED-size blocker would re-split everything after the insertion;
    // CDC must keep every chunk outside the edit neighborhood identical
    assert(dup >= n - 3, s"expected all but the head chunks to dedup, got $dup/$n")
    assert(dup < n, "the chunk containing the edit cannot dedup")
    assert(out(1).getAs[Long]("dup_ppm") > 500000L)
  }

  test("topPairs: exact adjacent-pair counts, ties broken by pair text") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b c"), (1L, "b c")).toDF("doc_id", "text")
    val out = TextOps.topPairs(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", "b", 2L), ("b", "c", 2L),
      ("b", "a", 1L)))
  }

  test("profiling quantiles: rank formula picks exact sorted-group values") {
    import spark.implicits._
    val df = (1L to 10L).map(v => ("s", v, v)).toDF("source", "n_chars", "doc_id")
    val r = Profiling.quantiles(df, "source", "n_chars", tieBreak = "doc_id")
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("min_n_chars") === 1L)
    assert(r.getAs[Long]("p25_n_chars") === 3L)  // (9*25) div 100 + 1 = rank 3
    assert(r.getAs[Long]("p50_n_chars") === 5L)
    assert(r.getAs[Long]("p75_n_chars") === 7L)  // (9*75) div 100 + 1 = rank 7
    assert(r.getAs[Long]("p95_n_chars") === 9L)
    assert(r.getAs[Long]("max_n_chars") === 10L)
  }

  test("pq ADC: an exact copy of the query achieves the subspace-min " +
      "lower bound; the scan's first row sits on that bound") {
    val em = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val copy = em.filter(col("vec_id") === 0)
      .select(lit(10000L).as("vec_id"), col("embedding"))
    val all = em.unionByName(copy)
    val out = Similarity.pqTopK(all, "vec_id", "embedding", queryId = 0L,
      dim = 64, m = 8, k = 4, iters = 1, topK = 600).collect()
    val cb = Similarity.pqCodebook(all, "vec_id", "embedding",
      dim = 64, m = 8, k = 4, iters = 1)
    assert(cb.keySet === (0 until 8).toSet)
    assert(cb.values.forall(cs => cs.size <= 4 && cs.forall(_._2.size === 8)))
    // driver recompute of the ADC lower bound Σ_s min_c d²(q_s, c)
    val qv = em.filter(col("vec_id") === 0)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 10000).cast("long")))
      .collect()(0).getSeq[Long](0)
    val lb = (0 until 8).map { s =>
      val qs = qv.slice(s * 8, (s + 1) * 8)
      cb(s).map { case (_, cv) =>
        qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum }.min
    }.sum
    assert(out.head.getLong(1) === lb,
      "the best ADC distance must be the lower bound (the copy achieves it)")
    assert(out.exists(r => r.getLong(0) === 10000L && r.getLong(1) === lb),
      "the verbatim copy must sit on the lower bound")
  }

  test("cdc rewrite: unique docs reassemble verbatim; a full copy vanishes") {
    import spark.implicits._
    val base = (1 to 100).map(i => s"tok${i % 23}w${i % 7}").mkString(" ")
    val other = (1 to 100).map(i => s"alt${i % 19}x${i % 5}").mkString(" ")
    val docs = Seq((0L, base), (1L, base), (2L, other)).toDF("doc_id", "text")
    val out = Chunking.dedupRewrite(docs, "doc_id", "text", w = 4, div = 8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 2L),
      "the verbatim copy must disappear from the rewritten corpus")
    // chunking splits and reassembly are inverse on unique content
    assert(out(0).getAs[String]("text_deduped") === base)
    assert(out(1).getAs[String]("text_deduped") === other)
    assert(out(0).getAs[Long]("n_kept_toks") === 100L)
  }

  test("splitAssign: stable per row, disjoint covering splits, no shuffle") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val full = Sampling.splitAssign(docs, "doc_id", 800000L, 100000L)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // assignment is a pure function of the row id: any subset agrees
    val subset = Sampling.splitAssign(docs.filter(col("doc_id") % 7 === 0),
        "doc_id", 800000L, 100000L)
      .select(col("doc_id"), col("split")).collect()
    subset.foreach(r => assert(full(r.getLong(0)) === r.getString(1)))
    // rough proportions at 500 docs (hash-uniform: train ~400)
    val n = full.size.toDouble
    val train = full.values.count(_ == "train") / n
    assert(train > 0.7 && train < 0.9, s"train share $train")
    assert(full.values.toSet === Set("train", "val", "test"))
    // zero-shuffle projection
    val plan = {
      val df = Sampling.splitAssign(docs, "doc_id", 800000L, 100000L)
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    assert(!plan.contains("Exchange"), s"splitAssign must not shuffle:\n$plan")
  }

  test("kmv sketch: exact below k, within KMV error bound above k") {
    import spark.implicits._
    val small = (1 to 40).map(i => ("a", s"v${i % 10}")).toDF("g", "v")
    val s1 = Sketches.kmvCardinality(small, "g", col("v"), 16).collect()(0)
    assert(s1.getAs[Long]("n_min") === 10L)
    assert(s1.getAs[Long]("est_distinct") === 10L) // below k the sketch IS exact
    val big = (1 to 5000).map(i => ("b", s"item$i")).toDF("g", "v")
    val s2 = Sketches.kmvCardinality(big, "g", col("v"), 64).collect()(0)
    assert(s2.getAs[Long]("exact_distinct") === 5000L)
    val est = s2.getAs[Long]("est_distinct").toDouble
    // deterministic hash -> fixed estimate; 3sigma of KMV at k=64 is ~38%
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est vs 5000")
  }

  test("kmv estimate: a group with fewer than k minima takes the exact branch") {
    import spark.implicits._
    // the round-4 ADVICE crash path: element_at(minima, k) on a short
    // array throws under Spark 4 default ANSI mode unless guarded —
    // this group holds 5 < k=16 minima and must return its exact count
    val small = (1 to 30).map(i => ("a", s"v${i % 5}")).toDF("g", "v")
    val est = Sketches.estimate(
        Sketches.kmvMinima(small, "g", col("v"), 16), 16)
      .collect()(0)
    assert(est.getAs[Long]("n_min") === 5L)
    assert(est.getAs[Long]("est_distinct") === 5L)
    // and the scale setting skips the exact-count window entirely
    val lean = Sketches.kmvCardinality(small, "g", col("v"), 16,
      withExact = false)
    assert(!lean.columns.contains("exact_distinct"))
    assert(lean.collect()(0).getAs[Long]("est_distinct") === 5L)
  }

  test("kmv merge: merging shard sketches equals sketching the union, exactly") {
    val docs = Tables.documents(spark, sf)
    val tok = docs.select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
    val whole = Sketches.kmvMinima(tok, "source", col("tok"), 16)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val shardA = tok.filter(Hashing.h60(col("tok")) % 2 === 0)
    val shardB = tok.filter(Hashing.h60(col("tok")) % 2 =!= 0)
    val merged = Sketches.merge(
        Sketches.kmvMinima(shardA, "source", col("tok"), 16),
        Sketches.kmvMinima(shardB, "source", col("tok"), 16),
        "source", 16)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(merged === whole, "lossless combine must reproduce the union sketch")
    // and the estimate off the merged sketch matches the direct one
    val est = Sketches.estimate(
      Sketches.merge(
        Sketches.kmvMinima(shardA, "source", col("tok"), 16),
        Sketches.kmvMinima(shardB, "source", col("tok"), 16),
        "source", 16), 16)
      .select(col("source"), col("est_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.kmvCardinality(tok, "source", col("tok"), 16)
      .select(col("source"), col("est_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === direct)
  }

  test("sampleFrames: stride offsets, bounded fan-out, last-frame truncation") {
    import spark.implicits._
    val payload = ("x" * 300).getBytes("UTF-8")
    val df = Seq((1L, payload), (2L, "tiny".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, "doc_id", "payload",
        frameBytes = 64, stride = 2, maxFrames = 4)
      .orderBy("doc_id", "frame_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // offsets 0, 128, 256 (384 is past the 300-byte payload)
    assert(d1.map(_.getLong(2)).toSeq === Seq(0L, 128L, 256L))
    assert(d1.map(_.getLong(3)).toSeq === Seq(64L, 64L, 44L)) // truncated tail
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2(0).getLong(3) === 4L)
    // frame signature is the md5 of exactly that byte window
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest(java.util.Arrays.copyOfRange(payload, 0, 64))
      .map("%02x".format(_)).mkString
    assert(d1(0).getString(4) === want)
  }

  test("sampleKeyframes: change detection keeps only level transitions, capped") {
    import spark.implicits._
    // levels per 64-byte frame: 'a'×64 → 6208/1024 = 6; ' '×64 → 2048/1024 = 2
    val payload = ("a" * 128 + " " * 128 + "a" * 64).getBytes("UTF-8")
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val out = Multimodal.sampleKeyframes(df, "doc_id", "payload",
        frameBytes = 64, maxKeep = 8)
      .orderBy("frame_idx").collect()
    // frames: a(6) a(6) sp(2) sp(2) a(6) → kept at idx 0, 2, 4
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 2L, 4L))
    assert(out.map(_.getLong(4)).toSeq === Seq(6L, 2L, 6L))
    assert(out.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L)) // dense keep_rank
    // consecutive kept frames always change level (the selection invariant)
    assert(out.sliding(2).forall(p => p(0).getLong(4) != p(1).getLong(4)))
    // the cap truncates the kept sequence, not the scan semantics
    val capped = Multimodal.sampleKeyframes(df, "doc_id", "payload",
        frameBytes = 64, maxKeep = 2)
      .orderBy("frame_idx").collect()
    assert(capped.map(_.getLong(1)).toSeq === Seq(0L, 2L))
  }

  test("knnJoin: per-query rows equal the single-query brute force, exactly") {
    val emb = Tables.embeddings(spark, sf)
    val qids = Seq(0L, 111L, 333L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
    // schema: (query_id, vec_id, cos, rank)
    val joined = Similarity.knnJoin(emb, queries, "vec_id", "embedding", 7)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    for (qid <- qids) {
      val single = Similarity
        .bruteForceTopK(emb, "vec_id", "embedding", qid, 7)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(joined(qid) === single,
        s"knnJoin disagrees with bruteForceTopK for query $qid")
    }
  }

  test("negativePairs: no self pairs, ≤ k partners, reproducible, from reps") {
    val docs = Tables.documents(spark, sf)
    val pairs = Sampling.negativePairs(docs, "doc_id", k = 3, buckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a != b }, "self pair leaked")
    val perDoc = pairs.groupBy(_._1).view.mapValues(_.length)
    assert(perDoc.values.forall(_ <= 3), "more than k partners")
    // partners come from the representative set only
    val reps = pairs.map(_._2).toSet
    assert(reps.size <= 32)
    // hash coins, not RNG: a second run is identical
    val again = Sampling.negativePairs(docs, "doc_id", k = 3, buckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sorted.toSeq === again.sorted.toSeq)
  }

  test("histogram quantiles bound the exact rank-selected values within a bin") {
    val docs = Tables.documents(spark, sf)
    val exact = Profiling.quantiles(docs, "source", "n_chars",
        tieBreak = "doc_id").collect()
      .map(r => r.getString(0) -> r).toMap
    val hist = Sketches.histogram(docs, "source", col("n_chars"), 50L)
    val sketch = Sketches.histQuantiles(hist, "source", 50L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === sketch.keySet)
    for ((src, e) <- exact) {
      val s = sketch(src)
      assert(s.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"))
      // the exact quantile value lives in the selected bin:
      // 0 ≤ exact − lower_bound ≤ binWidth − 1, deterministically
      for (p <- Seq(25, 50, 75, 95)) {
        val ev = e.getAs[Long](s"p${p}_n_chars")
        val lo = s.getAs[Long](s"p${p}_lo")
        assert(lo <= ev && ev < lo + 50,
          s"$src p$p: exact $ev outside sketch bin [$lo, ${lo + 50})")
      }
      val emin = e.getAs[Long]("min_n_chars")
      val emax = e.getAs[Long]("max_n_chars")
      assert(s.getAs[Long]("min_lo") <= emin &&
        emin < s.getAs[Long]("min_lo") + 50)
      assert(s.getAs[Long]("max_lo") <= emax &&
        emax < s.getAs[Long]("max_lo") + 50)
    }
  }

  test("count-min: estimates only over-estimate; exact when width clears " +
      "the item space; shard merge is lossless") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val items = toks.select(col("tok")).distinct()
    // narrow sketch: collisions guaranteed (vocab > width) — the
    // one-sided bound must hold for EVERY item
    val narrow = Sketches.cmEstimate(
      Sketches.countMin(toks, col("tok"), depth = 3, width = 8),
      items, "tok", depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(narrow.keySet === exact.keySet)
    for ((t, est) <- narrow)
      assert(est >= exact(t), s"count-min under-estimated '$t'")
    assert(narrow.exists { case (t, est) => est > exact(t) },
      "width 8 over a larger vocab must collide somewhere")
    // wide sketch: 4096 buckets over a tiny vocab — in the no-collision
    // regime every estimate is EXACT (each of an item's 3 rows can
    // still collide, but min() needs only one clean row)
    val wide = Sketches.cmEstimate(
      Sketches.countMin(toks, col("tok"), depth = 3, width = 4096),
      items, "tok", depth = 3, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide === exact, "wide sketch should be collision-free here")
    // merge: counter-wise sum of shard sketches == whole-input sketch
    val shardA = toks.filter(Hashing.h60(col("tok")) % 2 === 0)
    val shardB = toks.filter(Hashing.h60(col("tok")) % 2 =!= 0)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = m(Sketches.cmMerge(
      Sketches.countMin(shardA, col("tok"), depth = 3, width = 8),
      Sketches.countMin(shardB, col("tok"), depth = 3, width = 8)))
    val whole = m(Sketches.countMin(toks, col("tok"), depth = 3, width = 8))
    assert(merged === whole)
    // an unseen probe is NOT dropped (left join + coalesce): with the
    // wide sketch its buckets are empty, so it estimates exactly 0 —
    // under a saturated narrow sketch it would over-estimate instead,
    // which is still the one-sided contract
    val unseen = Sketches.cmEstimate(
      Sketches.countMin(toks, col("tok"), depth = 3, width = 4096),
      spark.range(1).select(lit("graft-nonexistent-token").as("tok")),
      "tok", depth = 3, width = 4096).collect()
    assert(unseen.length === 1 && unseen(0).getLong(1) === 0L)
  }

  test("KmvAgg: the mergeable-aggregate form equals the window-form " +
      "sketch, group for group") {
    val tok = Tables.documents(spark, sf).select(col("source"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val h = tok.select(col("source"), Hashing.h60(col("tok")).as("h"))
      .repartition(7) // force multi-partition partial-agg merge paths
    val agg = h.groupBy(col("source"))
      .agg(graft.functions.KmvAgg.kmvMinimaAgg(16)(col("h")).as("minima"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val win = Sketches.kmvMinima(tok, "source", col("tok"), 16)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(agg === win)
    // a null hash raises instead of silently entering the minima as 0
    // (the primitive-Long encoder's null coercion — measured)
    import spark.implicits._
    intercept[Exception] {
      Seq(Some(5L), None).toDF("h")
        .select(graft.functions.KmvAgg.kmvMinimaAgg(4)(col("h")))
        .collect()
    }
  }

  test("tokenBudgetSelect: kept set is exactly the maximal fitting prefix " +
      "of each group's deterministic order") {
    val docs = Tables.documents(spark, sf).withColumn("n_tokens",
      size(TextOps.tokens(col("text"))).cast("long"))
    val budget = 600L
    val kept = Sampling.tokenBudgetSelect(docs, "source", "doc_id",
        col("n_tokens"), budget, seed = 11)
      .select(col("source"), col("doc_id"), col("cum_tokens")).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r => r.getLong(1) -> r.getLong(2)) }
    // driver-side replay of the order: hash asc, id asc
    val order = docs.select(col("source"), col("doc_id"), col("n_tokens"),
        Hashing.h60(11, col("doc_id").cast("string")).as("h")).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.map(r => (r.getLong(3), r.getLong(1), r.getLong(2)))
          .sortBy(t => (t._1, t._2))
      }
    for ((src, seq) <- order) {
      val cums = seq.scanLeft(0L)(_ + _._3).tail
      val expect = seq.zip(cums).takeWhile(_._2 <= budget)
        .map { case (t, c) => t._2 -> c }
      assert(kept.getOrElse(src, Array.empty[(Long, Long)]).sortBy(_._2)
        .toSeq === expect.toSeq, s"source $src prefix mismatch")
      // maximality: the next doc in order (if any) would not have fit
      if (expect.length < seq.length)
        assert(cums(expect.length) > budget)
    }
  }

  test("batchMix: every surviving batch holds exactly its quota of each " +
      "modality in its slot range; an absent modality yields zero batches") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "text")) ++
      (1 to 10).map(i => (1000L + i, "img"))).toDF("id", "m")
    val out = Multimodal.batchMix(df, "m", "id",
        quotas = Seq("text" -> 3, "img" -> 1))
      .select(col("batch"), col("slot"), col("m"), col("id")).collect()
    // B = min(100 DIV 3, 10 DIV 1) = 10 complete batches of 4 slots
    assert(out.length === 40)
    for ((_, rows) <- out.groupBy(_.getLong(0))) {
      assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
      assert(rows.count(_.getString(2) == "text") === 3)
      assert(rows.filter(_.getString(2) == "img").map(_.getLong(1)).toSeq
        === Seq(3L), "img owns exactly slot 3")
    }
    // deterministic: same layout on a re-run
    val again = Multimodal.batchMix(df, "m", "id",
        quotas = Seq("text" -> 3, "img" -> 1))
      .select(col("batch"), col("slot"), col("m"), col("id")).collect()
    assert(again.map(_.toSeq).toSet === out.map(_.toSeq).toSet)
    // a quota modality with NO rows bounds the epoch at zero —
    // never a batch with silently missing slots
    val textOnly = (1 to 9).map(i => (i.toLong, "text")).toDF("id", "m")
    assert(Multimodal.batchMix(textOnly, "m", "id",
      quotas = Seq("text" -> 3, "img" -> 1)).isEmpty)
    // an input modality OUTSIDE the quota list fails loudly
    intercept[Exception] {
      Multimodal.batchMix(df, "m", "id", quotas = Seq("text" -> 3))
        .collect()
    }
  }

  test("shuffleShard: hash-assigned shards, contiguous 1..n positions, " +
      "reproducible") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val out = Sampling.shuffleShard(docs, "doc_id", shards = 8, seed = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length === docs.count())
    for ((id, shard, _) <- out)
      assert(shard === (Hashing.h60Scala(s"7:$id") % 8).toInt)
    for ((_, rows) <- out.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq,
        "positions must be a contiguous 1..n per shard")
    val again = Sampling.shuffleShard(docs, "doc_id", shards = 8, seed = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again === out.toSet)
  }

  test("normalize: idempotent, collapses case/punct/whitespace noise") {
    import spark.implicits._
    val rows = Seq(
      ("Hello,   World!!", "hello world"),
      ("  hello world ", "hello world"),
      ("HELLO\tworld", "hello world"),
      ("a1-b2_c3", "a1 b2 c3"))
      .toDF("raw", "want")
      .withColumn("once", TextOps.normalize(col("raw")))
      .withColumn("twice", TextOps.normalize(col("once")))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("once") === r.getAs[String]("want"))
      assert(r.getAs[String]("twice") === r.getAs[String]("once"),
        "normalize must be idempotent")
    }
  }

  test("importanceResample: self-target keeps everything, absent-target " +
      "bins drop, weights are the exact bin ratio") {
    import spark.implicits._
    val src = ((0 until 90).map(i => (i.toLong, 10L)) ++   // bin 1: 90 rows
      (90 until 120).map(i => (i.toLong, 25L))).toDF("id", "v") // bin 2: 30
    // target: bin 1 thinned (30 of 60), bin 2 same share, bin 3 ignored
    val tgt = ((0 until 30).map(i => (i.toLong, 10L)) ++
      (0 until 30).map(i => (i.toLong, 25L))).toDF("id", "v")
    // matching against ITSELF: every weight 1e6, everything kept
    val self = Sampling.importanceResample(src, src, "id", col("v"), 10L)
    assert(self.count() === 120)
    assert(self.select(min(col("weight_ppm"))).head.getLong(0) === 1000000L)
    // against tgt: bin-1 weight = (30/60)/(90/120) = 2/3; bin-2 capped 1e6
    val out = Sampling.importanceResample(src, tgt, "id", col("v"), 10L)
    val w = out.select(col("bin"), col("weight_ppm")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(w(1L) === 666666L && w(2L) === 1000000L)
    // bins absent from the target vanish entirely
    val noTgt = Sampling.importanceResample(src,
      tgt.filter(col("v") < 20), "id", col("v"), 10L)
    assert(noTgt.filter(col("bin") === 2L).count() === 0)
  }

  test("histDrift: self-drift is zero, disjoint supports hit 1e6, " +
      "absent group raises") {
    import spark.implicits._
    val lo = (0 until 100).map(i => ("a", (i % 40).toLong))
    val hi = (0 until 80).map(i => ("b", 500L + (i % 40)))
    val both = (lo ++ hi).toDF("g", "v")
    val hist = Sketches.histogram(both, "g", col("v"), binWidth = 10L)
    // identical distributions (a vs a relabeled) → every gap 0
    val same = Sketches.histogram(
      (lo ++ lo.map { case (_, v) => ("b", v) }).toDF("g", "v"),
      "g", col("v"), binWidth = 10L)
    assert(Sketches.histDrift(same, "g", "a", "b")
      .agg(max(col("gap_ppm"))).head.getLong(0) === 0L)
    // disjoint supports → the KS max is exactly 1e6 (full separation)
    assert(Sketches.histDrift(hist, "g", "a", "b")
      .agg(max(col("gap_ppm"))).head.getLong(0) === 1000000L)
    // absent group is loud, not a silent max-drift report
    val boom = intercept[Exception] {
      Sketches.histDrift(hist, "g", "a", "nope").collect()
    }
    assert(boom.getMessage.contains("histDrift") ||
      Option(boom.getCause).exists(_.getMessage.contains("histDrift")))
  }

  test("funnel: greedy first-touch stages, strict ordering, 4-step chain") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 completes all 4 steps, with a decoy early D before C
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:01:00"), "b"),
      (1L, ts("2024-01-01 00:01:30"), "d"), // before c: must not count
      (1L, ts("2024-01-01 00:02:00"), "c"),
      (1L, ts("2024-01-01 00:03:00"), "d"),
      // user 2: b happens AT the same instant as a — strict > rejects it
      (2L, ts("2024-01-01 00:00:00"), "a"),
      (2L, ts("2024-01-01 00:00:00"), "b"),
      // user 3 never enters the funnel
      (3L, ts("2024-01-01 00:00:00"), "b"))
      .toDF("user_id", "ts", "event_type")
    val out = Sessions.funnel(ev, "user_id", "ts", "event_type",
        Seq("a", "b", "c", "d"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 4, 180L), (2L, 1, -1L)))
    // the stage chain shares ONE exchange (window + rollup co-partitioned)
    val plan = Sessions.funnel(ev, "user_id", "ts", "event_type",
      Seq("a", "b", "c", "d")).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"funnel must cost one exchange, plan:\n$plan")
  }

  test("exportManifest: checksum order-independent, content-sensitive") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc $i body ${"x" * (i % 7).toInt}"))
    def manifest(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Long)] =
      Partitioning.exportManifest(df, "doc_id", "text", shards = 4, seed = 1)
        .orderBy("shard")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(4))).toSeq
    val a = manifest(docs.toDF("doc_id", "text"))
    // same content, reversed arrival order and different partitioning
    val b = manifest(docs.reverse.toDF("doc_id", "text").repartition(7))
    assert(a === b && a.map(_._2).sum === 40L)
    // one flipped character must change exactly its shard's checksum
    val mutated = docs.map { case (i, t) =>
      (i, if (i == 17L) t + "!" else t) }
    val c = manifest(mutated.toDF("doc_id", "text"))
    assert(c !== a)
    assert(a.zip(c).count { case (x, y) => x != y } === 1,
      "only doc 17's shard may differ")
  }

  test("crossDocDupGrams: shared grams count per doc, unique docs score 0, " +
      "short docs vanish") {
    import spark.implicits._
    val w = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens → 3 grams
    val docs = Seq(
      (1L, w),                       // 3 grams, all shared with doc 2
      (2L, w + " extra"),            // 4 grams, 3 shared + 1 unique
      (3L, (1 to 10).map(i => s"u$i").mkString(" ")), // 1 unique gram
      (4L, "too short")              // < 10 tokens → no rows
    ).toDF("doc_id", "text")
    val out = pipeline.TextOps.crossDocDupGrams(docs, "doc_id", "text", 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out === Array(
      (1L, 3L, 3L, 1000000L),
      (2L, 4L, 3L, 750000L),
      (3L, 1L, 0L, 0L)))
  }

  test("winsorized: rank-picked bounds, outlier clamped into the sum") {
    import spark.implicits._
    // 1..20 plus one outlier: lo = rank (20*5 DIV 100)+1 = 2 → value 2,
    // hi = rank (20*95 DIV 100)+1 = 20 → value 20; clamp folds 1→2 and
    // 1000→20, so wsum = 2 + (2+…+20) + 20 = 231 and the mean is exact
    val df = ((1 to 20) :+ 1000).zipWithIndex
      .map { case (v, i) => ("a", v.toLong, i.toLong) }
      .toDF("grp", "v", "id")
    val r = Profiling.winsorized(df, "grp", "v", "id", 5, 95).collect()(0)
    assert(r.getAs[Long]("n_rows") === 21L)
    assert(r.getAs[Long]("lo_v") === 2L)
    assert(r.getAs[Long]("hi_v") === 20L)
    assert(r.getAs[Long]("wsum_v") === 231L)
    assert(r.getAs[Long]("wmean_ppm") === 11000000L)
  }

  test("lengthBuckets: power-of-two boundaries, integer waste ppm") {
    import spark.implicits._
    val df = Seq(1L, 64L, 65L, 128L, 129L, 553L).toDF("len")
    val out = Partitioning.lengthBuckets(df, "len", 64L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (64L, 2L, 65L, 128L, 492187L),    // 1 and 64
      (128L, 2L, 193L, 256L, 246093L),  // 65 and 128
      (256L, 1L, 129L, 256L, 496093L),
      (1024L, 1L, 553L, 1024L, 459960L)))
  }

  test("stripBoilerplate: corpus-learned per-source stoplist, order kept, " +
      "all-boilerplate docs survive empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "the cat"),
      (2L, "s1", "the dog runs"),
      (3L, "s1", "rare the bird"),   // 'the' mid-doc: order must hold
      (4L, "s1", "the the"),         // nothing survives
      (5L, "s2", "the unique")       // other source: its own df stats
    ).toDF("doc_id", "source", "text")
    // s1: df('the') = 4/4 ≥ 60%; every other token 1/4 < 60%
    // s2: both tokens at 1/1 → everything stripped
    val out = TextOps.stripBoilerplate(df, "doc_id", "source", "text", 600000L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(out === Array(
      (1L, "cat", 1L),
      (2L, "dog runs", 2L),
      (3L, "rare bird", 2L),
      (4L, "", 0L),
      (5L, "", 0L)))
  }

  test("clusterProvenance: families only, sorted rosters, distinct sources") {
    import spark.implicits._
    val docs = Seq(
      (1L, "crawlA"), (2L, "crawlB"), (3L, "crawlA"),
      (4L, "crawlC"), (5L, "crawlB"), (6L, "crawlB")
    ).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("i", "j")
    val out = Dedup.clusterProvenance(docs, "doc_id", "source", pairs)
      .orderBy("cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[String](4)))
    assert(out === Array(
      (1L, 1L, 3L, Seq(1L, 2L, 3L), Seq("crawlA", "crawlB")),
      (5L, 5L, 2L, Seq(5L, 6L), Seq("crawlB"))))
    // singleton 4 never makes a family row
    assert(!out.exists(_._4.contains(4L)))
  }

  test("oph signatures: dense after rotation densification, borrowed bins " +
      "offset by the modulus, identical sets collide") {
    import spark.implicits._
    // bins of h mod 4 over {5,17,23}: bin0 empty, bin1 min(5,17)=5,
    // bin2 empty, bin3 23 → densified [5+M, 5, 23+M, 23] with M the
    // borrow offset per rotation distance 1
    val hsh = Seq((1L, Seq(5L, 17L, 23L)), (2L, Seq(5L, 17L, 23L)))
      .toDF("doc", "sh")
    val sig = Dedup.ophSignaturesFromHashed(hsh, 4)
      .orderBy("doc").collect().map(_.getSeq[Long](1))
    val m = Dedup.MinhashMod
    assert(sig(0) === Seq(5L + m, 5L, 23L + m, 23L))
    assert(sig(0) === sig(1))
  }

  test("labelCentroidDrift: identical slices at zero, a shifted slice " +
      "is equidistant from both") {
    import spark.implicits._
    // labels 0 and 1 hold the SAME two vectors; label 2 is both
    // shifted by +1.0 (e4: +10000 per dim) → drift(0,1)=0 and
    // drift(0,2)=drift(1,2)=dim·10000². Values are binary-exact floats
    // so the e4 floor is clean on both the base and shifted copies.
    val vs = Seq(Array(0.25f, 0.5f), Array(0.5f, 0.75f))
    val rows = (0 to 2).flatMap(l => vs.map(v =>
      (l, if (l == 2) v.map(_ + 1.0f) else v)))
    val df = rows.toDF("label", "embedding")
    val out = Similarity.labelCentroidDrift(df, "embedding", "label")
      .orderBy("label_a", "label_b")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out === Array(
      (0, 1, 0L),
      (0, 2, 2L * 10000L * 10000L),
      (1, 2, 2L * 10000L * 10000L)))
  }

  test("minhashPairsIncremental equals the full pair set restricted to " +
      "pairs touching the batch") {
    val docs = Tables.documents(spark, sf)
    val full = Dedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
    val incr = Dedup.minhashPairsIncremental(docs, "doc_id", "text",
        batch, 3, 16, 4, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(incr === expected)
    assert(expected.nonEmpty, "fixture must exercise the batch path")
  }

  test("persisted signature index: loaded probe equals in-memory probe, " +
      "candidate join never reshuffles the index") {
    val docs = Tables.documents(spark, sf)
    val (hsh, banded) = Dedup.signatureIndex(docs, "doc_id", "text", 3, 16, 4)
    val batch = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
    val direct = Dedup.probeIndex(hsh, banded, batch, "doc_id", 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.saveSignatureIndex(hsh, banded, "graft_sigidx")
    try {
      val (lh, lb) = Dedup.loadSignatureIndex(spark, "graft_sigidx")
      val probed = Dedup.probeIndex(lh, lb, batch, "doc_id", 0.8)
      assert(probed.select("i", "j").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === direct)
      // the index is NEVER hash-reshuffled: banded scans stay bucketed,
      // and the only hashpartitioning exchange allowed is the
      // batch-sized candidate distinct on (i, j) — never on the index's
      // doc / band / bsig columns
      probed.collect()
      val plan = probed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert("Bucketed: true".r.findAllIn(plan).size >= 2,
        s"index scans must stay bucketed, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(doc") &&
        !plan.contains("Exchange hashpartitioning(band") &&
        !plan.contains("Exchange hashpartitioning(bsig"),
        s"the index side must never reshuffle, plan:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sigidx_sh")
      spark.sql("DROP TABLE IF EXISTS graft_sigidx_bands")
    }
  }

  test("bigramSurprisal: bit-length log of context/bigram ratios, " +
      "frequent transitions score zero") {
    import spark.implicits._
    // bigrams of "a b a b c": (a,b)×2, (b,a), (b,c); cf(a)=2, cf(b)=2
    // bits: (a,b)→len(bin 2)−len(bin 2)=0; (b,a)→2−1=1; (b,c)→1
    // sum = 0+1+0+1 = 2 over 4 transitions → mean 500000 ppm
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextOps.bigramSurprisal(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_bigrams") === 4L)
    assert(r.getAs[Long]("sum_bits") === 2L)
    assert(r.getAs[Long]("mean_surprisal_ppm") === 500000L)
  }

  test("dsirWeights: target-like bigrams score higher than unseen ones, " +
      "zero-bigram raw docs are kept at 0, target docs never scored") {
    import spark.implicits._
    // target doc 0 "a b a b": tgt(ab)=2, tgt(ba)=1. raw pool:
    // doc 1 "a b a" (ab, ba), doc 2 "x y x y" (xy×2, yx), doc 3 "solo"
    // (no bigram). raw counts: ab=1, ba=1, xy=2, yx=1 → weights
    // w(ab)=bits(3)−bits(2)=0, w(ba)=bits(2)−bits(2)=0,
    // w(xy)=bits(1)−bits(3)=−1, w(yx)=bits(1)−bits(2)=−1; totals
    // Ttgt=3+64=67, Traw=5+64=69 → const bits(69)−bits(67)=0.
    // (hand-checked: the four bigrams land in distinct buckets mod 64)
    val df = Seq((0L, "a b a b"), (1L, "a b a"), (2L, "x y x y"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = TextOps.dsirWeights(df, "doc_id", "text",
        isTarget = col("doc_id") === 0L, buckets = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_feats"),
        r.getAs[Long]("score_bits")))
    assert(out === Array((1L, 2L, 0L), (2L, 3L, -3L), (3L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      TextOps.dsirWeights(df, "doc_id", "text", col("doc_id") === 0L, 0)
    }
    // a NULL predicate row (e.g. null source column) must land in the
    // raw pool and stay on the scored spine — not vanish from both
    // models (the keep-every-row contract)
    val dfn = Seq((0L, "a b a b", Some(true)), (1L, "a b a", Some(false)),
      (2L, "x y x y", None: Option[Boolean]), (3L, "solo", Some(false)))
      .toDF("doc_id", "text", "tgt")
    val outN = TextOps.dsirWeights(dfn, "doc_id", "text",
        isTarget = col("tgt"), buckets = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_feats"),
        r.getAs[Long]("score_bits")))
    assert(outN === out, "null-predicate doc must score as a raw doc")
  }

  test("chunkSliding: stride-covered chunks, truncated tail, short docs " +
      "yield one chunk") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, w4 s2
      (2L, "a b")                                     // shorter than w
    ).toDF("doc_id", "text")
    val out = TextOps.chunkSliding(df, "doc_id", "text", window = 4,
        stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    // doc 1: nchunks = (10-4+1)//2 + 1 = 4 → starts 0,2,4,6;
    // wait: (10-4+2-1) DIV 2 + 1 = 7 DIV 2 + 1 = 4 chunks
    assert(out.filter(_._1 == 1L).map(_._3) === Array(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(out.filter(_._1 == 1L).forall(_._4 == 4L))
    assert(out.filter(_._1 == 2L) === Array((2L, 0L, "a b", 2L)))
  }

  test("vocabCoverage: rank order, crossing rank included, nothing after") {
    import spark.implicits._
    // tf: x×6, y×3, z×1 → total 10; cum_ppm: 600000, 900000, 1000000
    // cutoff 900000: x (prev 0), y (prev 600000) kept; z (prev 900000) out
    val df = Seq((1L, "x x x y y z"), (2L, "x x x y")).toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(df, "text", 900000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out === Array((1L, "x", 6L, 600000L), (2L, "y", 3L, 900000L)))
  }

  test("rrfFusion: integer points per rank, ties broken by id, topN cut") {
    import spark.implicits._
    // k=0: rank r is worth 1e6 DIV r points. doc1 (A-best, B-worst) and
    // doc3 (B-best, A-worst) tie at 1333333; doc2 (middle on both) gets
    // 1000000 — tie resolves to the lower id first
    val df = Seq((1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L))
      .toDF("doc_id", "a", "b")
    val out = Sampling.rrfFusion(df, "doc_id",
        Seq(col("a"), col("b")), k = 0, topN = 2)
      .select("doc_id", "rrf")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 1333333L), (3L, 1333333L)))
  }

  test("columnProfile: nulls counted, exact distincts, one row per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x"), Some(1.0)),
      (2L, None, Some(1.0)),
      (3L, Some("x"), None),
      (4L, Some("y"), Some(2.0))
    ).toDF("id", "s", "v")
    val out = Profiling.columnProfile(df).orderBy("column")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out === Array(
      ("id", 4L, 0L, 4L),
      ("s", 4L, 1L, 2L),
      ("v", 4L, 1L, 2L)))
  }

  test("zorder2: exact Morton interleave, locality boxes shrink with " +
      "shared prefixes") {
    import spark.implicits._
    // a=3 (11₂), b=1 (01₂), bits=2 → z = a₀·1 + b₀·2 + a₁·4 + b₁·0 = 7
    val df = Seq((3L, 1L), (0L, 0L), (1L, 1L)).toDF("a", "b")
    val z = df.select(Partitioning.zorder2(col("a"), col("b"), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(z === Array(7L, 0L, 3L))
  }

  test("percentileNorm: rank-ppm within group, singleton at zero") {
    import spark.implicits._
    val df = Seq(("g", 1L, 10L), ("g", 2L, 30L), ("g", 3L, 20L),
      ("solo", 4L, 99L)).toDF("grp", "id", "v")
    val out = Sampling.percentileNorm(df, "grp", "id", col("v"))
      .select("id", "pctile_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 3L -> 500000L, 2L -> 1000000L,
      4L -> 0L))
  }

  test("longestSelfRepeat: diagonal islands find the true longest loop, " +
      "clean docs report zero") {
    import spark.implicits._
    // "a b c" looped 3×: the longest verbatim self-repeat is the
    // 6-token overlap at offset 3 (diag-3 island of five 2-windows
    // → 5 + k − 1 = 6); diag-6 contributes 2 more repeated windows
    val df = Seq((1L, "a b c a b c a b c"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val out = TextOps.longestSelfRepeat(df, "doc_id", "text", k = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 6L, 7L), (2L, 0L, 0L)))
  }

  test("prefixFilterPairs: lossless — identical pair set to the exact " +
      "inverted-index join, from prefixes only") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pf = Dedup.prefixFilterPairs(docs, "doc_id", "text", 3, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pf === exact, "the prefix lemma must lose nothing")
    assert(exact.nonEmpty, "fixture must exercise the join")
  }

  test("rendezvousShard: scale-out moves only the new shard's share") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    def assign(n: Int) = Sampling.rendezvousShard(docs, "doc_id", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a8 = assign(8); val a9 = assign(9)
    val moved = a8.count { case (id, s) => a9(id) != s }
    // every moved row must have moved TO the new shard — that is the
    // rendezvous guarantee a mod-n scheme breaks completely
    assert(a8.keys.forall(id => a9(id) == a8(id) || a9(id) == 8L))
    val frac = moved.toDouble / a8.size
    assert(frac > 0 && frac < 0.25, s"moved $frac, expected ~1/9")
  }

  test("mergeIntervals: overlaps and touches merge, gaps split") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10L, 1L), (1L, 5L, 15L, 2L),
      (1L, 20L, 30L, 3L), (1L, 30L, 40L, 4L), (2L, 0L, 1L, 5L))
      .toDF("k", "ivs", "ive", "eid")
    val out = Sessions.mergeIntervals(df, "k", "ivs", "ive",
        tieBreak = Seq(col("eid")))
      .orderBy("k", "span_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (1L, 1L, 0L, 15L, 2L),
      (1L, 2L, 20L, 40L, 2L),
      (2L, 1L, 0L, 1L, 1L)))
  }

  test("multi-probe lsh: recall against brute force dominates the " +
      "single-bucket probe") {
    val emb = Tables.embeddings(spark, sf)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      0L, 5))
    val single = ids(Similarity.lshTopK(emb, "vec_id", "embedding",
      0L, 5, planes = 6, dim = 64))
    val multi = ids(Similarity.lshTopKMultiProbe(emb, "vec_id",
      "embedding", 0L, 5, planes = 6, dim = 64))
    assert((multi & brute).size >= (single & brute).size,
      s"multi-probe recall must dominate: multi=$multi single=$single " +
      s"brute=$brute")
  }

  test("madOutliers: only the contaminant is flagged — the median and " +
      "MAD don't move with it") {
    import spark.implicits._
    val df = ((1L to 9L) :+ 1000L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("grp", "v", "id")
    val out = Profiling.madOutliers(df, "grp", "v", "id", k = 3L)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("med"),
        r.getAs[Long]("mad"), r.getAs[Boolean]("is_outlier")))
    assert(out.forall(t => t._2 == 5L && t._3 == 2L))
    assert(out.filter(_._4).map(_._1).toSeq === Seq(1000L))
  }

  test("stratifiedSplit: per-stratum proportions exact to the row") {
    import spark.implicits._
    val df = (1L to 10L).map(i => ("a", i)).toDF("grp", "id")
    val out = Sampling.stratifiedSplit(df, "grp", "id", 800000L, 100000L)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("train" -> 8L, "val" -> 1L, "test" -> 1L))
  }

  test("leakageSafeSplit: every near-dup family lands in ONE split") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4, 0.8)
    val out = Dedup.leakageSafeSplit(docs, "doc_id", pairs,
        800000L, 100000L)
      .groupBy("cluster")
      .agg(countDistinct(col("split")).as("nsplits"),
        count(lit(1)).as("n"))
    assert(out.filter(col("nsplits") > 1).isEmpty,
      "a split family is a train/test leak")
    assert(out.filter(col("n") > 1).count() > 0,
      "fixture must contain real multi-member families")
  }

  test("semanticContamination: verbatim twin flagged at ~1.0, " +
      "orthogonal vector clean, best ref reported") {
    import spark.implicits._
    val refs = Seq((100L, Array(1.0f, 0.0f)), (101L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f)),   // scaled copy of ref 100 → cos 1.0
      (2L, Array(0.0f, 1.0f)),   // cos 0 to ref 100, 0.8 to ref 101
      (3L, Array(-1.0f, 0.0f))   // anti-parallel → clean
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, refs,
        "vec_id", "embedding", thresholdPpm = 700000L)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0)._3 === 100L && out(0)._2 >= 999999L)
    // 0.6f/0.8f are not binary-exact; the floor-ppm lands within 1
    assert(out(1)._3 === 101L &&
      out(1)._2 >= 799999L && out(1)._2 <= 800001L)
  }

  test("mmrSelect: diversifies where plain top-k returns near-dups") {
    import spark.implicits._
    // q at the origin; a1/a2 nearly identical and closest; b farther
    // from q but far from a1. Distance top-2 = {a1, a2}; MMR λ=0.7
    // must pick a1 then b (a2's min-dist-to-selected is ~0)
    val df = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.1f, 0.0f)),
      (2L, Array(0.1f, 0.0002f)),
      (3L, Array(0.0f, 0.15f))
    ).toDF("vec_id", "embedding")
    val picks = Similarity.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, k = 2, lambdaPpm = 700000L)
      .orderBy("pick").collect().map(_.getLong(1))
    assert(picks === Array(1L, 3L), s"got ${picks.toSeq}")
  }

  test("kAnonymity: group sizes and risk flags, loud degenerate k") {
    import spark.implicits._
    val df = Seq(
      ("en", "m"), ("en", "m"), ("en", "m"),
      ("en", "f"), ("de", "m")
    ).toDF("lang", "grp")
    val got = Profiling.kAnonymity(df, Seq("lang", "grp"), k = 2L)
      .orderBy("lang", "grp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("de", "m", 1L, true), ("en", "f", 1L, true),
      ("en", "m", 3L, false)))
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(df, Seq("lang"), k = 1L)
    }
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(df, Seq.empty, k = 2L)
    }
  }

  test("validityIntervals: runs collapse, valid_to hands over, " +
      "current run stays open; a re-visited value starts a NEW row") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val df = Seq(
      (1L, ts(1), "x"), (1L, ts(2), "x"), (1L, ts(3), "y"),
      (1L, ts(4), "x"), // x AGAIN: SCD-2 keeps history, new interval
      (2L, ts(5), "z")
    ).toDF("user_id", "ts", "v")
    val got = Sessions.validityIntervals(df, "user_id", "ts", "v")
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "x", ts(1), Some(ts(3)), 2L),
      (1L, "y", ts(3), Some(ts(4)), 1L),
      (1L, "x", ts(4), None, 1L),
      (2L, "z", ts(5), None, 1L)))
  }

  test("validityIntervals: NULL observations close the run and form " +
      "their own island (null-safe change detection)") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val df = Seq(
      (1L, ts(1), Some("x")), (1L, ts(2), None), (1L, ts(3), None),
      (1L, ts(4), Some("x")),
      (2L, ts(5), None) // a key whose FIRST observation is null
    ).toDF("user_id", "ts", "v")
    val got = Sessions.validityIntervals(df, "user_id", "ts", "v")
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, Some("x"), ts(1), Some(ts(2)), 1L),
      (1L, None, ts(2), Some(ts(4)), 2L),
      (1L, Some("x"), ts(4), None, 1L),
      (2L, None, ts(5), None, 1L)))
  }

  test("random sequences: validityIntervals equals an in-memory fold " +
      "(nulls and repeats included)") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val rows = for {
        u <- 0L to 3L
        i <- 0 to (5 + rnd.nextInt(15))
      } yield (u, ts(u * 1000L + i),
        if (rnd.nextInt(5) == 0) None
        else Some(Vector("a", "b", "c")(rnd.nextInt(3))))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (u, obs) =>
        val sorted = obs.sortBy(_._2.getTime).map(o => (o._2, o._3))
        // fold runs with null-safe equality, then hand over valid_to
        val runs = sorted.foldLeft(
          Vector.empty[(Option[String], java.sql.Timestamp, Long)]) {
          case (acc, (t, v)) =>
            if (acc.nonEmpty && acc.last._1 == v)
              acc.init :+ ((v, acc.last._2, acc.last._3 + 1L))
            else acc :+ ((v, t, 1L))
        }
        runs.zipWithIndex.map { case ((v, from, n), i) =>
          (u, v, from,
            if (i + 1 < runs.size) Some(runs(i + 1)._2) else None, n)
        }
      }.toSet
      val got = Sessions.validityIntervals(
          rows.toDF("user_id", "ts", "v"), "user_id", "ts", "v")
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
        .toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("ophPairs: verified subset of exact jaccard with high recall") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oph = Dedup.ophPairs(docs, "doc_id", "text", 3, 16, 4, 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oph.subsetOf(exact))
    assert(exact.nonEmpty)
    assert(oph.size.toDouble / exact.size >= 0.8,
      s"OPH recall too low: ${oph.size}/${exact.size}")
  }
}
