package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeFunctions

class Dist2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native dist2 equals the HOF fold exactly on e4-quantized vectors") {
    import spark.implicits._
    NativeFunctions.register(spark)
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 10000).cast("long")).as("qv"))
    // shifted copy so distances are non-zero
    val both = df.select(
      NativeFunctions.dist2(col("qv"),
        transform(col("qv"), x => x + 3L)).as("native"),
      aggregate(zip_with(col("qv"), transform(col("qv"), x => x + 3L),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.count() === 500)
    // 64 elements x 3^2 each
    assert(both.head.getLong(0) === 64L * 9L)
  }

  test("dimension mismatch throws; SQL registration works") {
    import spark.implicits._
    NativeFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dist2(array(1L, 2L), array(4L, 6L)) AS d").head()
    assert(r.getLong(0) === 9L + 16L)
    val err = intercept[Exception] {
      Seq((Seq(1L, 2L, 3L), Seq(1L))).toDF("a", "b")
        .select(NativeFunctions.dist2(col("a"), col("b"))).collect()
    }
    assert(err.toString.contains("mismatch") ||
      (err.getCause != null && err.getCause.toString.contains("mismatch")))
  }
}
