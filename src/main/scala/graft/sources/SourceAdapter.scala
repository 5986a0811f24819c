package graft.sources

import scala.collection.immutable.TreeMap
import org.apache.spark.sql.{Column, DataFrame}

/** Version-dispatched source projection — the Spark analogue of the
  * reference's per-version source branches and query ladders:
  *
  *   - `powa_statements_src` has 4 branches on the pg_stat_statements
  *     version, filling columns missing in older versions with `0`/`NULL`
  *     literals (powa--5.2.0.sql:3798-4004);
  *   - catalog/db-module source queries are *data* rows keyed by
  *     `min_version`, picked with `ORDER BY min_version DESC LIMIT 1`
  *     (powa--5.2.0.sql:686-697, :416-423).
  *
  * Here a ladder is a TreeMap[minVersion -> projection]; `pick` is the
  * floor-entry lookup. Projections are `Seq[Column]` select lists, so the
  * chosen branch stays fully declarative and Catalyst-optimizable —
  * version dispatch happens driver-side before the plan is built.
  */
object SourceAdapter {

  /** `ORDER BY min_version DESC LIMIT 1` over a ladder. */
  def pick[T](ladder: TreeMap[Int, T], version: Int): T = {
    val m = ladder.rangeTo(version)
    require(m.nonEmpty, s"no source projection for version $version " +
      s"(min supported: ${ladder.firstKey})")
    m.last._2
  }

  /** Apply the best projection for `version` to a source frame. */
  def project(
      src: DataFrame,
      ladder: TreeMap[Int, Seq[Column]],
      version: Int): DataFrame =
    src.select(pick(ladder, version): _*)

  // ---------- collector wire formats beside parquet ----------

  /** Read a collector staging payload from CSV (header row) into the
    * datasource's exact `*_src_tmp` shape. The spec's staging schema is
    * enforced at the source (types cast by the reader) and FAILFAST
    * surfaces malformed rows as errors instead of silently landing
    * nulls in the tier — a remote agent's corrupt upload must fail the
    * ingest, not poison the history. */
  def readStagingCsv(spark: org.apache.spark.sql.SparkSession,
      spec: graft.spec.DatasourceSpec, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(spec.stagingSchema)
      .csv(path)

  /** Same for JSON-lines payloads. */
  def readStagingJson(spark: org.apache.spark.sql.SparkSession,
      spec: graft.spec.DatasourceSpec, path: String): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(spec.stagingSchema)
      .json(path)
}
