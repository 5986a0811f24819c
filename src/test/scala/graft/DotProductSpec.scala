package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeFunctions
import graft.pipeline.Similarity

class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native dot equals the HOF fold bit-for-bit (interpreted + codegen)") {
    import spark.implicits._
    NativeFunctions.register(spark)
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(Similarity.asDouble(col("embedding")).as("v"))
    val both = df.select(
      NativeFunctions.dot(col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("hof"))
    // bitwise comparison — same fold order must give identical doubles
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.count() === 500)
  }

  test("graft_dot is usable from plain SQL once registered") {
    // (GraftExtensions performs this same registration at session build
    // time for spark.sql.extensions users; a second in-JVM session can't
    // be built here without tearing down the shared test session.)
    NativeFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("mismatched lengths use the common prefix; type check rejects non-arrays") {
    import spark.implicits._
    NativeFunctions.register(spark)
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0))).toDF("a", "b")
      .select(NativeFunctions.dot(col("a"), col("b"))).head()
    assert(r.getDouble(0) === 30.0)
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(NativeFunctions.dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
