package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeFunctions

/** Bit-equality of the native argmin loop against the composed
  * array_max-of-structs form it replaced (the assignment rule of every
  * integer-codebook family: min squared-L2, ties to the lowest
  * centroid id). */
class ArgminDist2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("argmin position equals the struct-argmax rule on the real " +
      "corpus, ties included") {
    NativeFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    // 16 centroids in e4 space, DELIBERATE duplicates so ties occur:
    // cents 5 and 11 are identical — the winner must be position 5
    val base = (0 until 16).map(_ =>
      Seq.fill(64)(rnd.nextInt(4000).toLong - 2000L))
    val cents = base.updated(11, base(5))
    val q = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 10000).cast("long")).as("qv"))
    val composed = array_max(array(cents.zipWithIndex.map {
      case (cv, i) => struct(
        (-NativeFunctions.dist2(col("qv"), typedLit(cv))).as("nd"),
        lit(-i).as("nc"))
    }: _*))
    val both = q.select(
      NativeFunctions.argminDist2(col("qv"), typedLit(cents))
        .as("native"),
      (-composed.getField("nc")).cast("int").as("composed"))
    // null-safe comparison: =!= evaluates to null (filtered away) if a
    // nullability regression made either side null — <=> cannot hide it
    assert(both.filter(not(col("native") <=> col("composed"))).isEmpty)
    assert(both.count() === 500)
    // a vector AT centroid 11 must still assign to the tied twin 5
    import spark.implicits._
    val tied = Seq(Tuple1(cents(11))).toDF("qv")
      .select(NativeFunctions.argminDist2(col("qv"), typedLit(cents)))
      .head().getInt(0)
    assert(tied === 5, s"tie must break to the lowest position, got $tied")
  }

  test("empty codebook -> -1; dimension mismatch throws; SQL works") {
    import spark.implicits._
    NativeFunctions.register(spark)
    assert(spark.sql(
      "SELECT graft_argmin_dist2(array(1L), array(array(9L), array(1L)))")
      .head().getInt(0) === 1)
    assert(Seq(Tuple1(Seq(1L, 2L))).toDF("v")
      .select(NativeFunctions.argminDist2(col("v"),
        typedLit(Seq.empty[Seq[Long]]))).head().getInt(0) === -1)
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(1L, 2L))).toDF("v")
        .select(NativeFunctions.argminDist2(col("v"),
          typedLit(Seq(Seq(1L))))).collect()
    }
    assert(chain(err).contains("mismatch"))
    // a NULL centroid is a named error, never a bare NPE (it would
    // silently poison every assignment if tolerated). Bare NULL: its
    // element type unifies to the sibling's containsNull=false, so
    // this stays a RUNTIME case (a DDL-cast ARRAY<BIGINT> would be
    // element-nullable and die at analysis instead — next case)
    val nul = intercept[Exception] {
      spark.sql("SELECT graft_argmin_dist2(array(1L), " +
        "array(array(1L), NULL))").collect()
    }
    assert(chain(nul).contains("null centroid"), chain(nul).take(300))
  }

  test("null ELEMENTS are fenced at the cheapest layer per side") {
    import spark.implicits._
    NativeFunctions.register(spark)
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    // centroid side: a nullable element TYPE is rejected at ANALYSIS
    // (library codebooks are typedLit containsNull=false literals; only
    // ad-hoc SQL can build one, and it must not reach execution where
    // getLong would read the null slot as 0)
    val analysis = intercept[Exception] {
      spark.sql("SELECT graft_argmin_dist2(array(1L), " +
        "array(CAST(array(1L) AS ARRAY<BIGINT>)))").collect()
    }
    assert(chain(analysis).contains("non-nullable centroid elements"),
      chain(analysis).take(300))
    // query-vector side: nullable TYPE is legitimate (transform() over
    // parquet arrays), so a null ELEMENT is a named RUNTIME error —
    // checked before the hot loop, never silently read as 0
    val nulElem = intercept[Exception] {
      Seq(Tuple1(Seq[java.lang.Long](1L, null))).toDF("v")
        .select(NativeFunctions.argminDist2(col("v"),
          typedLit(Seq(Seq(1L, 2L))))).collect()
    }
    assert(chain(nulElem).contains("null element"), chain(nulElem).take(300))
    // graft_dist2 shares the blind spot (round-11 ADVICE) but BOTH its
    // sides are legitimately transform() outputs (nullable types), so
    // its fence is runtime-only — a null element on either side is a
    // named error, never a silent 0 read
    val d2r = intercept[Exception] {
      spark.sql("SELECT graft_dist2(array(1L, 2L), array(1L, NULL))")
        .collect()
    }
    assert(chain(d2r).contains("null element"), chain(d2r).take(300))
    val d2n = intercept[Exception] {
      Seq(Tuple1(Seq[java.lang.Long](1L, null))).toDF("v")
        .select(NativeFunctions.dist2(col("v"), typedLit(Seq(1L, 2L))))
        .collect()
    }
    assert(chain(d2n).contains("null element"), chain(d2n).take(300))
  }
}
