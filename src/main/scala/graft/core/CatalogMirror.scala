package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Catalog mirrors — full-replace snapshots of remote servers' system
  * catalogs (`powa_catalog_*`, powa--5.2.0.sql:699-906; generic import
  * `powa_catalog_generic_snapshot` :5714-5787):
  *
  *   - data replaces per (srvid, dbid): partial per-db delete then insert
  *     of exactly the staged dbids (:5751-5756);
  *   - `last_refresh` is stamped per (srvid, dbid) only when the pg_class
  *     pass runs — it's ordered last by `powa_catalogs.priority` so the
  *     stamp means "the whole catalog family refreshed" (:445-448,
  *     :5762-5777);
  *   - the work list is pre-filtered by refresh age
  *     (`powa_catalog_functions`'s excluded-dbs array, :725-745).
  *
  * Storage: one tier per catalog partitioned srvid=N/dbid=M — replace is
  * a partition overwrite, the only scalable mutation shape.
  */
final class CatalogMirror(spark: SparkSession, root: String) {

  /** Catalog registry with import priorities (powa--5.2.0.sql:446-455);
    * pg_class last = refresh stamp. */
  val catalogs: Seq[(String, Int)] = Seq(
    "pg_database" -> -3, "pg_roles" -> -2,
    "pg_namespace" -> 1, "pg_type" -> 2, "pg_collation" -> 3,
    "pg_proc" -> 4, "pg_language" -> 5, "pg_attribute" -> 6,
    "pg_class" -> 10)

  private val refreshes =
    scala.collection.mutable.Map[(Int, Long), java.sql.Timestamp]()

  private def dir(cat: String, srvid: Int, dbid: Long) =
    Paths.get(root, "catalog", cat, s"srvid=$srvid", s"dbid=$dbid")

  /** Replace one catalog's content for (srvid, dbid). */
  def replace(cat: String, srvid: Int, dbid: Long, df: DataFrame): Unit = {
    require(catalogs.exists(_._1 == cat), s"unknown catalog $cat")
    val tmp = Paths.get(root, "catalog", cat + s".tmp$srvid-$dbid")
    df.write.mode("overwrite").parquet(tmp.toString)
    val dst = dir(cat, srvid, dbid)
    if (Files.exists(dst)) {
      Files.walk(dst).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(dst.getParent)
    Files.move(tmp, dst)
    if (cat == "pg_class") // family-complete marker (:5762-5777)
      refreshes((srvid, dbid)) = new java.sql.Timestamp(System.currentTimeMillis())
  }

  def read(cat: String, srvid: Int, dbid: Long): Option[DataFrame] = {
    val d = dir(cat, srvid, dbid)
    if (Files.isDirectory(d)) Some(spark.read.parquet(d.toString)) else None
  }

  def lastRefresh(srvid: Int, dbid: Long): Option[java.sql.Timestamp] =
    refreshes.get((srvid, dbid))

  /** Work-list filter (:725-745): dbids whose catalogs are fresh within
    * `maxAgeSec` are excluded from the next import round. */
  def staleDbids(srvid: Int, dbids: Seq[Long], maxAgeSec: Long,
      now: java.sql.Timestamp): Seq[Long] =
    dbids.filter { dbid =>
      refreshes.get((srvid, dbid))
        .forall(ts => ts.getTime + maxAgeSec * 1000L < now.getTime)
    }
}
