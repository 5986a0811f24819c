package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeFunctions
import graft.pipeline.Hashing

/** The native h60 kernel must be bit-identical to the builtin
  * formulation `conv(substring(md5(s),1,15),16,10)` — which is what the
  * DuckDB oracle reproduces — on real corpus text and on edge cases.
  */
class Md5Prefix60Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native h60 == builtin h60 on corpus shingles and edge cases") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val edge = Seq("", " ", "a", "é", "é世界", "0", "-1",
      "x" * 1000).toDF("s")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " +")).as("s"))
    val both = edge.unionByName(corpus)
      .select(Hashing.h60(col("s")).as("builtin"),
        NativeFunctions.h60(col("s")).as("native"))
    assert(both.filter(col("builtin") =!= col("native")).isEmpty)
    assert(both.filter(col("native") < 0 || col("native") >= (1L << 60)).isEmpty)
  }

  test("native h60 throughput beats the builtin (informational)") {
    NativeFunctions.register(spark)
    val n = 2000000L
    val df = spark.range(n)
      .select(concat(lit("shingle shingle shingle "), col("id").cast("string"))
        .as("s"))
      .localCheckpoint()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then measure min of 3
    def run(c: org.apache.spark.sql.Column): Double = {
      val q = df.select(max(c)).collect _ // max: no 60-bit sum overflow
      q(); (1 to 3).map(_ => time(q())).min
    }
    val builtin = run(Hashing.h60(col("s")))
    val native = run(NativeFunctions.h60(col("s")))
    info(f"builtin $builtin%.2fs native $native%.2fs over $n rows " +
      f"(${builtin / native}%.1fx)")
    // no hard assertion on a noisy box; equality safety is the test above
  }
}
