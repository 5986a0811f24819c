package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, date_format}
import org.apache.spark.sql.types.StructType

/** Parquet-backed tier storage. Layout (SURVEY.md §7.1):
  *
  *   <root>/<datasource>/<tier>/srvid=<n>/…parquet
  *
  * with tiers `staging | current | history | history_db`. Partitioning by
  * `srvid` makes every per-server operation (snapshot drain, aggregate,
  * purge, reset — all `WHERE srvid = ?` DML in the reference) a partition
  * operation: append into one partition, or atomically drop/rewrite one
  * partition directory. This is the layout that scales: on a cluster the
  * same code runs with `srvid` (+ a date bucket of `range_start` for the
  * history tier) as physical partition keys, so readback prunes partitions
  * before Parquet row-group min/max stats prune within them — replacing
  * the reference's GiST `(srvid, key, coalesce_range)` index
  * (powa--5.2.0.sql:2123).
  *
  * Mutation model: `*_src_tmp` drain and aggregate-then-delete become
  * partition rewrites. A rewrite is write-new + atomic pointer flip
  * (AtomicSwap — concurrent readers never observe an absent partition);
  * the aggregate's move of rows from `current` into `history` runs under
  * the commit protocol below (SURVEY.md §7.4 item 2).
  */
final class Store(val spark: SparkSession, root: String) {

  /** When true, snapshots count staged rows for the powa_log trace.
    * Off by default: the count is a Spark action per datasource per
    * tick, and the reference gates the same rowcount reporting behind
    * its debug GUC (powa--5.2.0.sql:1434). Engine flips it on when a
    * log sink is installed. */
  @volatile var traceRowcounts: Boolean = false

  private def dir(ds: String, tier: String): Path = Paths.get(root, ds, tier)
  private def partDir(ds: String, tier: String, srvid: Int): Path =
    dir(ds, tier).resolve(s"srvid=$srvid")

  /** Read one tier; empty-but-correctly-shaped frame when absent. `schema`
    * excludes srvid (partition column re-added by the reader). */
  def read(ds: String, tier: String, schema: StructType): DataFrame = {
    val d = dir(ds, tier)
    val hasData = Files.isDirectory(d) && {
      val s = Files.list(d)
      try s.filter(p => p.getFileName.toString.startsWith("srvid="))
        .findFirst.isPresent
      finally s.close()
    }
    val srvidField = org.apache.spark.sql.types.StructField(
      "srvid", org.apache.spark.sql.types.IntegerType)
    val dataFields = schema.fields.filterNot(_.name == "srvid")
    if (hasData) {
      val df = spark.read
        .schema(StructType(dataFields :+ srvidField))
        .parquet(d.toString)
      // normalize column order: srvid first (partition cols read back last)
      df.select((col("srvid") +: dataFields.toSeq.map(f => col(f.name))): _*)
    } else {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(srvidField +: dataFields))
    }
  }

  /** Build the manifest-pinned frame from an already-read file list
    * (ONE atomic manifest read decides both the layout check and the
    * files actually opened — re-reading here would be a TOCTOU against
    * a concurrent republish). The srvid column is re-attached as a
    * literal, mirroring partition-column readback. */
  private def fromManifestFiles(files: Seq[Path], srvid: Int,
      schema: StructType): DataFrame = {
    val dataFields = schema.fields.filterNot(_.name == "srvid")
    val parquets = files.map(_.toString).filter(_.endsWith(".parquet"))
    val df =
      if (parquets.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(dataFields))
      else spark.read.schema(StructType(dataFields)).parquet(parquets: _*)
    df.select(org.apache.spark.sql.functions.lit(srvid).as("srvid") +:
      dataFields.toSeq.map(f => col(f.name)): _*)
  }

  /** Manifest-pinned read of ONE server's partition — the read path with
    * no list-vs-open window: the file list comes from one atomic
    * manifest read (AtomicSwap.manifestFiles), and the listed paths are
    * version-pinned immutable files, so a concurrent overwritePartition
    * cannot invalidate a query between planning and execution (the
    * directory path can, loudly — AtomicSwap's scaladoc). None when the
    * partition was never swap-written or was dropped. */
  def readPartitionManifest(ds: String, tier: String, srvid: Int,
      schema: StructType): Option[DataFrame] =
    AtomicSwap.manifestFiles(dir(ds, tier), s"srvid=$srvid")
      .map(fromManifestFiles(_, srvid, schema))

  /** Single-partition read, manifest-first: a swap-written FLAT
    * partition (dimension tables) resolves through its atomic manifest
    * — version-pinned paths, no list-vs-open window — and anything else
    * falls back to the directory scan + srvid filter. BUCKETED
    * partitions always take the fallback, detected from the SAME
    * manifest snapshot the files come from (nested `bucket=`-style
    * paths): a bare-path read would return the directory-encoded column
    * as null, and later dropBucket/appendBucketed mutate inside the
    * live version without republishing the manifest, so the directory
    * is the only truthful listing there. (append() on a flat
    * swap-written partition INVALIDATES the manifest for the same
    * reason — see append.) The engine's dimension readbacks go through
    * here, so the manifest path is exercised by every dim lifecycle
    * oracle query. */
  def readPartition(ds: String, tier: String, srvid: Int,
      schema: StructType): DataFrame =
    AtomicSwap.manifestFiles(dir(ds, tier), s"srvid=$srvid") match {
      case Some(files) if files.exists(_.toString.endsWith(".parquet")) &&
          files.forall(p =>
          // flat version layout only: version-dir/part-file, no
          // partition subdirectories between them. A manifest with NO
          // .parquet entries is ambiguous (a zero-row bucketed rewrite
          // lists only depth-2 marker files and would pass the forall)
          // — fall back to the directory scan, which is always
          // truthful for bucketed layouts (round-5 ADVICE)
          dir(ds, tier).relativize(p).getNameCount == 2) =>
        fromManifestFiles(files, srvid, schema)
      case _ =>
        read(ds, tier, schema).filter(col("srvid") === srvid)
    }

  /** Does this server have any data in the tier? A pure directory probe
    * — the orchestrator's fast path for skipping idle datasources
    * without launching a Spark job (the metadata-only partition-pruning
    * equivalent on a cluster catalog). */
  def hasPartition(ds: String, tier: String, srvid: Int): Boolean =
    Files.isDirectory(partDir(ds, tier, srvid))

  /** Append rows (must carry srvid) into the tier, one partition per srvid.
    * Any manifests on this tier are INVALIDATED first (cheap directory
    * scan, no Spark job): appended part files land inside the live
    * version directory through the symlink, so a published manifest
    * would keep listing only the pre-append files — a silent
    * missing-rows read. The delete runs BEFORE the parquet write so a
    * crash mid-append can never leave a stale manifest behind (the
    * failure mode is then a manifest-less directory fallback, which is
    * always complete — round-5 ADVICE); with the manifest gone,
    * readPartition falls back to the directory listing. Swap-only
    * tiers (the dimensions) are never appended, so their manifests
    * persist. */
  def append(ds: String, tier: String, df: DataFrame): Unit = {
    invalidateManifests(ds, tier)
    df.write.mode("append").partitionBy("srvid").parquet(dir(ds, tier).toString)
  }

  /** Drop every published manifest on a tier whose live versions were
    * just mutated in place (appends). Pure filesystem ops. */
  private def invalidateManifests(ds: String, tier: String): Unit = {
    val d = dir(ds, tier)
    if (Files.isDirectory(d)) {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".m_"))
        .toList.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  /** History-tier append with a second physical partition level: a month
    * bucket of `range_start` (srvid=N/bucket=YYYY-MM/). This is the
    * cluster layout — retention purges become whole-directory drops and
    * readback prunes entire months before Parquet stats are even
    * consulted (SCALE.md). */
  def appendBucketed(ds: String, tier: String, df: DataFrame): Unit = {
    invalidateManifests(ds, tier) // before the write — same hazard as append
    df.withColumn("bucket", date_format(col("range_start"), "yyyy-MM"))
      .write.mode("append").partitionBy("srvid", "bucket")
      .parquet(dir(ds, tier).toString)
  }

  /** Read a bucketed tier, hiding the bucket column again. */
  def readBucketed(ds: String, tier: String, schema: StructType): DataFrame = {
    val withBucket = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(
        "bucket", org.apache.spark.sql.types.StringType))
    read(ds, tier, withBucket).drop("bucket")
  }

  /** Month buckets currently present for one server. */
  def listBuckets(ds: String, tier: String, srvid: Int): Seq[String] = {
    val p = partDir(ds, tier, srvid)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=")).toList.sorted
      finally s.close()
    }
  }

  /** Drop one month bucket — the O(1) arm of retention purge. */
  def dropBucket(ds: String, tier: String, srvid: Int, bucket: String): Unit =
    deleteRecursively(partDir(ds, tier, srvid).resolve(s"bucket=$bucket"))

  /** Replace a single server's partition with `df` (rows must all belong
    * to that srvid). Equivalent of `DELETE … WHERE srvid = ?; INSERT …`.
    * Cluster path: Delta `REPLACE WHERE` / dynamic partition overwrite.
    * `partitionCols` preserves sub-partitioning (e.g. history buckets).
    *
    * Concurrent-reader safety (the Delta-style pointer, done with the
    * filesystem's own atomic pointer): the new data is written into a
    * dot-prefixed VERSION directory (invisible to Spark reads), then the
    * visible `srvid=N` name — a SYMLINK to the live version — is flipped
    * with one atomic rename. A reader never observes an absent or
    * half-written partition; a reader that already resolved the old
    * version keeps reading it, because the previous version directory is
    * retained until the NEXT swap (one-version GC lag, the local
    * equivalent of Delta's vacuum retention). The only non-atomic moment
    * is the one-time conversion of a legacy real directory into the
    * symlink layout (two renames apart). */
  def overwritePartition(ds: String, tier: String, srvid: Int, df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit =
    AtomicSwap.replace(dir(ds, tier), s"srvid=$srvid") { vdir =>
      val w = df.drop("srvid").write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(vdir.toString)
    }

  /** Drop one server's partition — `DELETE FROM … WHERE srvid = ?`
    * (e.g. staging drain powa--5.2.0.sql:4102-4104, reset :6359-6429).
    * Removes the live pointer first (readers stop seeing the partition
    * atomically), then any version directories. */
  def dropPartition(ds: String, tier: String, srvid: Int): Unit =
    AtomicSwap.drop(dir(ds, tier), s"srvid=$srvid")

  // ---- atomic aggregate commit --------------------------------------
  //
  // The reference's aggregate runs `INSERT INTO history … ; DELETE FROM
  // current …` inside ONE transaction (powa--5.2.0.sql:6047-6055). A
  // bare appendBucketed + dropPartition pair leaves a crash window in
  // which history holds the coalesced rows while current still holds the
  // raw ones — a re-run would aggregate current again and DUPLICATE
  // history. The commit protocol below restores exactly-once:
  //
  //   1. write the coalesced rows into a dot-prefixed INFLIGHT directory
  //      inside the history tier (invisible to every Spark read);
  //   2. atomically rename INFLIGHT → COMMITTED — this single rename is
  //      the commit point;
  //   3. drop the current partition (its rows are now represented by the
  //      committed coalesce);
  //   4. move the committed month buckets into the visible history
  //      partition; 5. delete the committed dir.
  //
  // Recovery is deterministic from on-disk state alone, regardless of
  // what `current` contains: an INFLIGHT dir means the commit point was
  // never reached → ROLL BACK (delete inflight; current is untouched and
  // the next aggregate redoes the work); a COMMITTED dir means the
  // commit happened → ROLL FORWARD (drop whatever is left of current,
  // finish the moves). Roll-forward may drop current only because every
  // path that adds NEW rows to a current tier resolves pending commits
  // first (GenericDatasource.recoverPending at snapshot start, recover()
  // at engine start, and aggregateCommit itself): whenever a COMMITTED
  // marker exists, current can hold only rows that commit already
  // coalesced. Without that ordering a transient promote failure
  // followed by fresh snapshots would make roll-forward lossy (round-2
  // ADVICE). On a cluster the same protocol is a Delta/Iceberg
  // transactional REPLACE; here it is the filesystem form.

  private def inflightDir(ds: String, histTier: String, srvid: Int): Path =
    dir(ds, histTier).resolve(s".inflight_srvid=$srvid")
  private def committedDir(ds: String, histTier: String, srvid: Int): Path =
    dir(ds, histTier).resolve(s".committed_srvid=$srvid")

  /** Atomically replace `current(srvid)` with its coalesced form appended
    * into the bucketed `histTier`. `df` must carry `range_start` (for the
    * month bucket) and belong entirely to `srvid`. */
  def aggregateCommit(ds: String, curTier: String, histTier: String,
      srvid: Int, df: DataFrame): Unit = {
    recoverAggregate(ds, curTier, histTier, srvid) // resolve any stale run
    val inflight = inflightDir(ds, histTier, srvid)
    df.drop("srvid")
      .withColumn("bucket", date_format(col("range_start"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(inflight.toString)
    Files.move(inflight, committedDir(ds, histTier, srvid),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE) // commit point
    dropPartition(ds, curTier, srvid)
    promoteCommitted(ds, histTier, srvid)
  }

  /** Steps 4–5: move committed buckets into the visible partition. File
    * moves are idempotent by name (Spark part files carry a UUID), so a
    * crashed promotion can simply be re-run. */
  private def promoteCommitted(ds: String, histTier: String, srvid: Int): Unit = {
    val inflight = committedDir(ds, histTier, srvid)
    if (!Files.isDirectory(inflight)) return
    val dst = partDir(ds, histTier, srvid)
    val children = Files.list(inflight)
    try children.iterator().asScala.toList.foreach { b =>
      val bn = b.getFileName.toString
      if (bn.startsWith("bucket=")) {
        val bdst = dst.resolve(bn)
        if (!Files.isDirectory(bdst)) {
          Files.createDirectories(bdst.getParent)
          Files.move(b, bdst)
        } else {
          val parts = Files.list(b)
          try parts.iterator().asScala.toList
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .foreach { f =>
              Files.move(f, bdst.resolve(f.getFileName),
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          finally parts.close()
        }
      }
    } finally children.close()
    deleteRecursively(inflight)
  }

  /** Resolve one (possibly crashed) aggregate: roll back if the commit
    * point was not reached, roll forward if it was — unambiguous from the
    * marker alone, whatever `current` contains. Pure directory probes
    * when nothing is pending — safe to call every tick. */
  def recoverAggregate(ds: String, curTier: String, histTier: String,
      srvid: Int): Unit = {
    // uncommitted write → roll back; the raw rows in current are intact
    if (Files.isDirectory(inflightDir(ds, histTier, srvid)))
      deleteRecursively(inflightDir(ds, histTier, srvid))
    // committed → roll forward; current (if anything is left of it) holds
    // only rows this commit coalesced — see the protocol invariant above
    if (Files.isDirectory(committedDir(ds, histTier, srvid))) {
      dropPartition(ds, curTier, srvid)
      promoteCommitted(ds, histTier, srvid)
    }
  }

  /** All srvids with an unresolved (inflight or committed) aggregate in
    * `histTier`. */
  def inflightSrvids(ds: String, histTier: String): Seq[Int] = {
    val d = dir(ds, histTier)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect {
          case n if n.startsWith(".inflight_srvid=") =>
            n.stripPrefix(".inflight_srvid=").toInt
          case n if n.startsWith(".committed_srvid=") =>
            n.stripPrefix(".committed_srvid=").toInt
        }.toList.distinct
      finally s.close()
    }
  }

  /** Drop a whole tier (global reset). */
  def dropTier(ds: String, tier: String): Unit = deleteRecursively(dir(ds, tier))

  private def deleteRecursively(p: Path): Unit =
    AtomicSwap.deleteRecursively(p)
}
