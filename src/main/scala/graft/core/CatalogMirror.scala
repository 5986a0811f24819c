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
object CatalogMirror {
  /** Catalog registry with import priorities (powa--5.2.0.sql:446-455);
    * pg_class last = refresh stamp. */
  val catalogs: Seq[(String, Int)] = Seq(
    "pg_database" -> -3, "pg_roles" -> -2,
    "pg_namespace" -> 1, "pg_type" -> 2, "pg_collation" -> 3,
    "pg_proc" -> 4, "pg_language" -> 5, "pg_attribute" -> 6,
    "pg_class" -> 10)
}

final class CatalogMirror(spark: SparkSession, root: String) {

  val catalogs: Seq[(String, Int)] = CatalogMirror.catalogs

  /** In-memory cache of the per-(srvid, dbid) refresh stamp; the durable
    * copy lives in a `_last_refresh` marker file next to the pg_class
    * mirror (underscore-prefixed → invisible to Spark reads), so the
    * freshness-skip behavior survives a process restart — like the
    * reference persisting `last_refresh` in powa_catalog_databases
    * (powa--5.2.0.sql:707-711). */
  private val refreshes =
    scala.collection.mutable.Map[(Int, Long), Option[java.sql.Timestamp]]()

  private def dir(cat: String, srvid: Int, dbid: Long) =
    Paths.get(root, "catalog", cat, s"srvid=$srvid", s"dbid=$dbid")
  private def stagingDir(cat: String, srvid: Int, dbid: Long) =
    Paths.get(root, "catalog_staging", cat, s"srvid=$srvid", s"dbid=$dbid")
  private def refreshMarker(srvid: Int, dbid: Long) =
    dir("pg_class", srvid, dbid).resolve("_last_refresh")

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    AtomicSwap.deleteRecursively(p)

  /** Replace one catalog's content for (srvid, dbid) — an atomic pointer
    * flip (AtomicSwap), so a dashboard reading the mirror never observes
    * an absent catalog mid-import. */
  def replace(cat: String, srvid: Int, dbid: Long, df: DataFrame,
      ts: java.sql.Timestamp =
        new java.sql.Timestamp(System.currentTimeMillis())): Unit = {
    require(catalogs.exists(_._1 == cat), s"unknown catalog $cat")
    val dst = dir(cat, srvid, dbid)
    Files.createDirectories(dst.getParent)
    AtomicSwap.replace(dst.getParent, s"dbid=$dbid")(
      vdir => df.write.mode("overwrite").parquet(vdir.toString))
    if (cat == "pg_class") { // family-complete marker (:5762-5777)
      Files.writeString(refreshMarker(srvid, dbid), ts.getTime.toString)
      refreshes((srvid, dbid)) = Some(ts)
    }
  }

  /** Remote-collector landing zone — the `powa_catalog_*_src_tmp`
    * analogue (:5739-5749): staged rows wait here until the next
    * `powa_take_snapshot` tick runs the catalog pass. */
  def stage(cat: String, srvid: Int, dbid: Long, df: DataFrame): Unit = {
    require(catalogs.exists(_._1 == cat), s"unknown catalog $cat")
    df.write.mode("overwrite").parquet(stagingDir(cat, srvid, dbid).toString)
  }

  /** dbids with staged data for one catalog. */
  def stagedDbids(cat: String, srvid: Int): Seq[Long] = {
    val p = stagingDir(cat, srvid, 0L).getParent
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("dbid="))
          .map(_.stripPrefix("dbid=").toLong).toList.sorted
      } finally s.close()
    }
  }

  /** The per-tick catalog import pass `powa_take_snapshot` runs for
    * remote servers (powa--5.2.0.sql:3663-3694): walk the catalogs in
    * priority order, import staged content for every database whose
    * mirror is stale (`last_refresh + interval < now`, :725-745), and
    * drain the staging area. Each catalog is individually try/caught
    * like the datasource walk. Returns accumulated error messages. */
  def snapshot(srvid: Int, refreshSec: Long,
      now: java.sql.Timestamp): Seq[String] = {
    var errs = Vector.empty[String]
    catalogs.sortBy(_._2).foreach { case (cat, _) =>
      try {
        val staged = stagedDbids(cat, srvid)
        staleDbids(srvid, staged, refreshSec, now).foreach { dbid =>
          replace(cat, srvid, dbid,
            spark.read.parquet(stagingDir(cat, srvid, dbid).toString), now)
        }
        // drain including fresh-skipped dbids (the reference truncates
        // the whole src_tmp after the pass, :5779-5785)
        staged.foreach(dbid => deleteRecursively(stagingDir(cat, srvid, dbid)))
      } catch { case e: Exception =>
        errs :+= s"catalog_$cat: ${e.getMessage}" }
    }
    errs
  }

  /** Drop every mirror + staged catalog of one server (reset /
    * delete-and-purge sweep). */
  def reset(srvid: Int): Unit = {
    catalogs.foreach { case (cat, _) =>
      deleteRecursively(Paths.get(root, "catalog", cat, s"srvid=$srvid"))
      deleteRecursively(Paths.get(root, "catalog_staging", cat, s"srvid=$srvid"))
    }
    refreshes.keys.filter(_._1 == srvid).toSeq.foreach(refreshes.remove)
  }

  /** Lazily loaded refresh stamp: in-memory cache first, then the
    * durable marker file (absent = never refreshed). */
  private def loadRefresh(srvid: Int, dbid: Long): Option[java.sql.Timestamp] =
    refreshes.getOrElseUpdate((srvid, dbid), {
      val m = refreshMarker(srvid, dbid)
      if (Files.isRegularFile(m))
        Some(new java.sql.Timestamp(Files.readString(m).trim.toLong))
      else None
    })

  /** Mirror readback, manifest-first: the file list comes from the
    * atomic manifest AtomicSwap.replace published at the last import,
    * so a dashboard query planned against the mirror survives a
    * concurrent re-import mid-execution (version-pinned paths — no
    * list-vs-open window). Directory listing remains as the fallback
    * for pre-manifest layouts. */
  def read(cat: String, srvid: Int, dbid: Long): Option[DataFrame] = {
    val d = dir(cat, srvid, dbid)
    AtomicSwap.manifestFiles(d.getParent, s"dbid=$dbid") match {
      case Some(files)
          if files.exists(_.toString.endsWith(".parquet")) =>
        Some(spark.read.parquet(
          files.map(_.toString).filter(_.endsWith(".parquet")): _*))
      case _ =>
        // no manifest (pre-manifest layout) OR a manifest with no
        // parquet files (an imported-but-EMPTY catalog, which an
        // AQE-planned empty write can produce): fall through to the
        // directory path so an imported empty catalog keeps the
        // pre-manifest contract (present, surfaced loudly by schema
        // inference) instead of masquerading as never-imported
        if (Files.isDirectory(d)) Some(spark.read.parquet(d.toString))
        else None
    }
  }

  def lastRefresh(srvid: Int, dbid: Long): Option[java.sql.Timestamp] =
    loadRefresh(srvid, dbid)

  /** Work-list filter (:725-745): dbids whose catalogs are fresh within
    * `maxAgeSec` are excluded from the next import round. */
  def staleDbids(srvid: Int, dbids: Seq[Long], maxAgeSec: Long,
      now: java.sql.Timestamp): Seq[Long] =
    dbids.filter { dbid =>
      loadRefresh(srvid, dbid)
        .forall(ts => ts.getTime + maxAgeSec * 1000L < now.getTime)
    }
}
