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
    // silently poison every assignment if tolerated)
    val nul = intercept[Exception] {
      spark.sql("SELECT graft_argmin_dist2(array(1L), " +
        "array(array(1L), CAST(NULL AS ARRAY<BIGINT>)))").collect()
    }
    assert(chain(nul).contains("null centroid"), chain(nul).take(300))
  }
}
