package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Hashing.h60

/** Approximate-nearest-neighbor operators over an embedding column
  * (`Array[Float]`).
  *
  *   - Brute-force cosine top-k: broadcast the query vector, score every
  *     row with per-row array math (`zip_with` + `aggregate` fold —
  *     stays in codegen), `TakeOrdered` for the top-k. The correctness
  *     baseline; linear scan, embarrassingly parallel, no shuffle.
  *   - Random-hyperplane LSH buckets: 60-bit-hash-derived pseudo-random
  *     weights give `planes` sign bits per vector; the bucket id
  *     becomes the shuffle/partition key, so at 100 TB the query only
  *     scans its bucket (expected fraction 2^-planes of the data).
  *     The same bucket id also serves as a coarse IVF cell id.
  *
  * All float math is widened to double first (exact) and reported as
  * floor-ppm, keeping Spark and the DuckDB oracle bit-comparable.
  */
object Similarity {

  /** Cast a float embedding to double element-wise (exact widening). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against the vector with id `queryId`. */
  def bruteForceTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val e = embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val q = e.filter(col(idCol) === queryId).select(col("v").as("qv"))
    e.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col("v"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Pseudo-random hyperplane weight for (plane, component): uniform in
    * [-1, 1] with 1/1000 resolution, derived from the portable hash so
    * the oracle can reproduce it. */
  def planeWeight(plane: Int, component: Column): Column =
    ((h60(plane, component.cast("string")) % 2001L) - 1000L).cast("double") /
      lit(1000.0d)

  /** Sign-bit bucket id from `planes` random hyperplanes. */
  def lshBucket(v: Column, dim: Int, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), lit(dim - 1)),
            (x, i) => x * planeWeightExpr(p, i)),
          lit(0.0d), (acc, x) => acc + x)
        when(proj > 0.0d, call_function("shiftleft", lit(1L), p))
          .otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)

  /** planeWeight with both plane and component as runtime columns (for
    * use inside transform lambdas). */
  private def planeWeightExpr(plane: Column, component: Column): Column =
    ((h60(concat(plane.cast("string"), lit(":"), component.cast("string")))
      % 2001L) - 1000L).cast("double") / lit(1000.0d)

  /** LSH-bucketed ANN: score only the vectors in the query's bucket.
    * Returns the top-k of that bucket (a subset of the brute-force
    * result when the bucket is pure; the scale/recall trade-off knob is
    * `planes`). */
  def lshTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, planes: Int, dim: Int): DataFrame = {
    val e = embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, planes))
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    e.filter(col(idCol) =!= queryId)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col(idCol), cosine(col("v"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
