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
final class Store(val spark: SparkSession, val root: String) {

  // Store write contract: timestamps are written as INT64
  // TIMESTAMP(MICROS), never legacy INT96 — INT96 chunks carry NO
  // parquet min/max statistics, which would blind both the manifest's
  // per-file range stats (AtomicSwap.writeManifest — planning-time file
  // skipping) and parquet row-group pruning on range readbacks. The
  // knob is session-global and conf-only (the per-write option is not
  // honored by the parquet write support), so it is pinned here, once,
  // when the store is constructed — the same explicit-side-effect
  // pattern as Tables.eventsRawSchemaPinNanosConf.
  spark.conf.set("spark.sql.parquet.outputTimestampType",
    "TIMESTAMP_MICROS")

  /** When true, snapshots count staged rows for the powa_log trace.
    * Off by default: the count is a Spark action per datasource per
    * tick, and the reference gates the same rowcount reporting behind
    * its debug GUC (powa--5.2.0.sql:1434). Engine flips it on when a
    * log sink is installed. */
  @volatile var traceRowcounts: Boolean = false

  /** Label the Spark jobs `body` launches (guide §1.5) and restore the
    * caller's label after — thread-local, so concurrent commit threads
    * label independently. Pure UI/diagnostics: lets QueryProf and the
    * Spark UI attribute the engine's many small per-tick jobs. */
  private def labeled[T](desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setLocalProperty("spark.job.description", prev)
  }

  /** Whole-stage codegen scope for the PER-TICK write paths (ingest
    * append + snapshot sinks + dim rewrites). Measured (guide §1):
    * every tick's plans embed that tick's timestamp/batch literals, so
    * the generated source differs per tick and janino recompiles every
    * stage on every tick — q34's 35-counter statements plans paid
    * ~1 s/query of pure compilation (bench 5.3 → 4.2 s with codegen
    * off). The trade is scale-INdependent for this path: a per-server
    * tick frame is small by cadence construction (one tick's staged
    * samples), so interpreted execution costs O(tick rows) while the
    * compile cost recurs per tick forever. Aggregate/purge/compact and
    * every read path keep codegen (their inputs grow with
    * coalesce_seq × tick — q33's constvalues pack measurably WANTS
    * codegen), as does the fleet write (one job for the whole fleet).
    * `spark.graft.store.tickCodegen=true` restores codegen for the
    * tick writes. Session-conf scoping shares StreamTuning.scoped's
    * documented single-threaded-planning assumption. */
  private val tickScopeLock = new Object
  private var tickScopeDepth = 0
  private var tickScopePrev: Option[String] = None
  private def tickCodegenScope[T](body: => T): T = {
    if (spark.conf.get("spark.graft.store.tickCodegen", "false").toBoolean)
      return body
    val key = "spark.sql.codegen.wholeStage"
    // REENTRANT + multi-thread safe: concurrent same-priority snapshots
    // (Engine's overlapped datasource pass) each enter this scope; only
    // the first-in saves the session value and only the last-out
    // restores it, so an interleaved exit can never capture the scope's
    // own "false" as the value to restore (which would leak
    // codegen-off into the whole session).
    tickScopeLock.synchronized {
      if (tickScopeDepth == 0) {
        tickScopePrev = spark.conf.getOption(key)
        spark.conf.set(key, "false")
      }
      tickScopeDepth += 1
    }
    try body
    finally tickScopeLock.synchronized {
      tickScopeDepth -= 1
      if (tickScopeDepth == 0) tickScopePrev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  private def dir(ds: String, tier: String): Path = Paths.get(root, ds, tier)
  private def partDir(ds: String, tier: String, srvid: Int): Path =
    dir(ds, tier).resolve(s"srvid=$srvid")

  /** Session flag (`spark.graft.store.readV2`) routing every tier read —
    * whole-tier [[read]] and per-server [[readPartition]] alike —
    * through the DataSource V2 table instead of the hand-assembled
    * union/manifest scan. Row-identical by construction (V2SourceSpec
    * pins it on every layout); the difference is WHERE the work
    * happens: srvid pruning moves into scan planning (a pruned server
    * is never manifest-read) and execution is Spark-native columnar.
    * DEFAULT ON since round 8 — the measured-swap decision the A/B
    * bench justified (11 engine round-trips, V2 53.7 s vs V1 56.5 s,
    * per-query within noise both directions; NOTES.md). Set the conf
    * to false to fall back to the union/manifest scan. Read per call,
    * so a session can flip it mid-run for A/B measurement (Bench
    * honors SPARK_GRAFT_READV2). */
  private def useV2: Boolean =
    spark.conf.get("spark.graft.store.readV2", "true").toBoolean

  /** Read one tier across every server; empty-but-correctly-shaped frame
    * when absent. `schema` excludes srvid (re-added by the reader).
    *
    * The scan is assembled per partition, manifest-first (see
    * [[readPartition]]): each server resolves through its atomic
    * manifest when one exists, so multi-partition scans carry the same
    * no-list-vs-open guarantee as single-partition ones, and batch
    * appends (dot-prefixed subdirs a directory listing would hide) are
    * visible. The per-partition union costs nothing at execution: the
    * srvid column is a literal per branch, so a `WHERE srvid = ?`
    * filter constant-folds every other branch to an empty relation at
    * optimize time — planning-time partition pruning, the same work
    * the directory scan's PartitionFilters did. */
  def read(ds: String, tier: String, schema: StructType): DataFrame = {
    if (useV2) return readV2(ds, tier, schema)
    val srvids = listSrvids(ds, tier)
    if (srvids.isEmpty) {
      val dataFields = schema.fields.filterNot(_.name == "srvid")
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(org.apache.spark.sql.types.StructField("srvid",
          org.apache.spark.sql.types.IntegerType) +: dataFields))
    } else
      srvids.map(n => readPartition(ds, tier, n, schema)).reduce(_.union(_))
  }

  /** Read a tier through the DataSource V2 table
    * (`graft.sources.v2.StoreV2`, format "graft-store") — row-identical
    * to [[read]], but srvid predicates are pushed into scan planning
    * (a pruned server's partition is never manifest-read) and the scan
    * is Spark-native columnar. Column order matches [[read]] (srvid
    * first). */
  def readV2(ds: String, tier: String, schema: StructType): DataFrame = {
    val dataFields = schema.fields.filterNot(_.name == "srvid")
    spark.read.format("graft-store")
      .option("root", root).option("ds", ds).option("tier", tier)
      .schema(schema).load()
      .select(col("srvid") +: dataFields.toSeq.map(f => col(f.name)): _*)
  }

  /** Visible srvid partitions of a tier (links or real dirs). */
  private def listSrvids(ds: String, tier: String): Seq[Int] = {
    val d = dir(ds, tier)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("srvid="))
        .flatMap(n => scala.util.Try(n.stripPrefix("srvid=").toInt).toOption)
        .toList.sorted
      finally s.close()
    }
  }

  /** Directory-listing read of ONE server's partition — the fallback
    * when no manifest exists (staging's hive-style appends, legacy
    * layouts). Sub-partition directories (`bucket=`) surface as extra
    * discovered columns and are projected away by the schema select. */
  private def readPartitionDir(ds: String, tier: String, srvid: Int,
      schema: StructType): DataFrame = {
    val dataFields = schema.fields.filterNot(_.name == "srvid")
    val p = partDir(ds, tier, srvid)
    val df =
      if (!Files.isDirectory(p))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(dataFields))
      else spark.read.schema(StructType(dataFields)).parquet(p.toString)
    df.select(org.apache.spark.sql.functions.lit(srvid).as("srvid") +:
      dataFields.toSeq.map(f => col(f.name)): _*)
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

  /** Single-partition read, manifest-first — THE default read path for
    * every per-server tier scan (dims, current tiers, bucketed history
    * tiers alike): the file list comes from one atomic manifest read of
    * version-pinned immutable paths, so there is no list-vs-open window
    * against any concurrent mutation. Every mutation path now keeps the
    * manifest truthful — swaps publish at the flip, batch appends and
    * committed-aggregate promotions republish after their commit
    * rename, bucket drops republish-excluding before deferring the
    * physical delete — so a manifest, when present, IS the partition
    * (including an empty list for a legitimately empty partition).
    * Bucket directory columns are never needed on read (every history
    * schema carries range_start; the bucket is derived, not stored), so
    * nested bucket paths read fine against the plain schema. Only a
    * partition with no manifest at all (staging, a never-swapped legacy
    * layout) falls back to the directory scan + srvid filter. */
  def readPartition(ds: String, tier: String, srvid: Int,
      schema: StructType): DataFrame =
    if (useV2)
      // the srvid equality is consumed by the scan's pushFilters, so
      // only this server's partition is manifest-read at planning
      readV2(ds, tier, schema).filter(col("srvid") === srvid)
    else AtomicSwap.manifestFiles(dir(ds, tier), s"srvid=$srvid") match {
      case Some(files) => fromManifestFiles(files, srvid, schema)
      case None => readPartitionDir(ds, tier, srvid, schema)
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
    labeled(s"store: append $ds/$tier") {
      tickCodegenScope {
        df.write.mode("append").partitionBy("srvid")
          .parquet(dir(ds, tier).toString)
      }
    }
  }

  /** Single-server append with manifest-pinned visibility — the default
    * for the current tiers: the batch is written invisibly, committed
    * into the live version with ONE atomic rename, and the republished
    * manifest is what makes it readable (AtomicSwap.appendInto). `df`
    * must belong entirely to `srvid` and the caller must hold that
    * server's snapshot lock (every engine append site does). Unlike
    * [[append]], the partition's manifest stays valid throughout, so
    * concurrent readPartition readers see the complete pre-batch or
    * complete post-batch state — never a torn append, and never a
    * FileNotFound from a racing aggregate's partition drop (dropped
    * versions are retained one cycle — AtomicSwap.drop). */
  def appendPartition(ds: String, tier: String, srvid: Int,
      df: DataFrame): Unit =
    AtomicSwap.appendInto(dir(ds, tier), s"srvid=$srvid") { tmp =>
      labeled(s"store: appendPartition $ds/$tier srvid=$srvid") {
        df.drop("srvid").write.parquet(tmp.toString)
      }
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

  /** Read a bucketed tier. The bucket is a derived physical column
    * (date_format of range_start), never part of the logical schema, so
    * this is a plain tier read: manifest-pinned paths ignore the bucket
    * directory level entirely and the directory fallback projects the
    * discovered column away. */
  def readBucketed(ds: String, tier: String, schema: StructType): DataFrame =
    read(ds, tier, schema)

  /** Month buckets LOGICALLY present for one server: the physical
    * directory listing minus buckets doomed by a deferred drop (their
    * files are retained one cycle for pinned readers but they are
    * deleted data — re-listing them would make retention purge re-drop
    * forever). */
  def listBuckets(ds: String, tier: String, srvid: Int): Seq[String] = {
    val p = partDir(ds, tier, srvid)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val doomed = doomMarkers(ds, tier, srvid)
        .map { case (_, b) => b.stripPrefix("bucket=") }.toSet
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket="))
        .filterNot(doomed).toList.sorted
      finally s.close()
    }
  }

  /** Public face of [[processDooms]] — the purge pass calls it at the
    * top of each tick so a bucket doomed last purge is physically
    * deleted this purge (one full cycle of retention, the same
    * contract as swap predecessor GC). */
  def processDoomedBuckets(ds: String, tier: String, srvid: Int): Unit =
    processDooms(ds, tier, srvid)

  // ---- deferred bucket drops (logical delete + one-cycle retention) --
  //
  // A physical bucket delete under a concurrent manifest-pinned reader
  // is a FileNotFound; the reference's MVCC keeps dropped rows visible
  // to in-flight snapshots. The bucket drop therefore happens in two
  // stages: (1) LOGICAL — republish the manifest without the bucket's
  // files (readers planning from now on never see them) and write a
  // doom marker naming (version dir, bucket); (2) PHYSICAL — the next
  // dropBucket on the same partition processes previous markers and
  // deletes the files, one purge cycle later. Markers name the exact
  // version directory they doomed, so a swap rewrite in between (which
  // may legitimately re-create the bucket in a new version) can never
  // be damaged — stale markers point into retained-or-GC'd old versions
  // and resolve to no-ops. Crash between republish and marker write
  // leaks the bucket's files until the version dies at the next swap —
  // a bounded storage leak, never a wrong or failed read.

  private def doomPrefix(srvid: Int) = s".doom_srvid=${srvid}__"

  private def doomMarkers(ds: String, tier: String,
      srvid: Int): Seq[(String, String)] = {
    val d = dir(ds, tier)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(doomPrefix(srvid)))
        .map(_.stripPrefix(doomPrefix(srvid)).split("__", 2))
        .collect { case Array(ver, bucket) => (ver, bucket) }.toList
      finally s.close()
    }
  }

  /** Physically delete previously-doomed buckets (their one-cycle
    * retention is over) and clear the markers. */
  private def processDooms(ds: String, tier: String, srvid: Int): Unit =
    doomMarkers(ds, tier, srvid).foreach { case (ver, bucket) =>
      deleteRecursively(dir(ds, tier).resolve(ver).resolve(bucket))
      Files.deleteIfExists(
        dir(ds, tier).resolve(doomPrefix(srvid) + ver + "__" + bucket))
    }

  /** Clear markers WITHOUT deleting data — after a swap or partition
    * drop the doomed files live only in a retained old version, which
    * dies wholesale at the next swap's GC. */
  private def clearDooms(ds: String, tier: String, srvid: Int): Unit =
    doomMarkers(ds, tier, srvid).foreach { case (ver, bucket) =>
      Files.deleteIfExists(
        dir(ds, tier).resolve(doomPrefix(srvid) + ver + "__" + bucket))
    }

  /** Exclusion filter for manifest republish: every doomed
    * (version, bucket) prefix, plus optionally one more being doomed
    * right now. */
  private def doomExclusion(ds: String, tier: String, srvid: Int,
      extra: Option[(String, String)] = None): String => Boolean = {
    val doomed = doomMarkers(ds, tier, srvid).toSet ++ extra
    rel => doomed.exists { case (ver, b) => rel.startsWith(s"$ver/$b/") }
  }

  /** Drop one month bucket — the O(1) arm of retention purge. On the
    * symlink layout this is the two-stage logical drop above; on a
    * legacy real-directory partition it is the plain recursive delete
    * (no manifest exists there, so no reader can be pinned to it). */
  def dropBucket(ds: String, tier: String, srvid: Int, bucket: String): Unit = {
    val link = s"srvid=$srvid"
    val d = dir(ds, tier)
    if (Files.isSymbolicLink(d.resolve(link))) {
      processDooms(ds, tier, srvid)
      val bucketDir = partDir(ds, tier, srvid).resolve(s"bucket=$bucket")
      if (Files.isDirectory(bucketDir)) {
        val ver = Files.readSymbolicLink(d.resolve(link))
          .getFileName.toString
        AtomicSwap.republish(d, link,
          doomExclusion(ds, tier, srvid, Some((ver, s"bucket=$bucket"))))
        Files.write(
          d.resolve(doomPrefix(srvid) + ver + "__" + s"bucket=$bucket"),
          Array.emptyByteArray)
      }
    } else
      deleteRecursively(partDir(ds, tier, srvid).resolve(s"bucket=$bucket"))
  }

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
      partitionCols: Seq[String] = Nil): Unit = {
    AtomicSwap.replace(dir(ds, tier), s"srvid=$srvid") { vdir =>
      labeled(s"store: overwrite $ds/$tier srvid=$srvid") {
        val w = df.drop("srvid").write.mode("overwrite")
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(vdir.toString)
      }
    }
    // doomed buckets lived in the now-predecessor version: the marker's
    // job (keep them out of the manifest) is done — the old version
    // dies wholesale at the next swap's GC, files included
    clearDooms(ds, tier, srvid)
  }

  /** Compact one server's partition: rewrite its accumulated batch/part
    * files into `targetFiles` files with one atomic swap — the
    * maintenance op for append-heavy current tiers, where every tick's
    * snapshotCommit lands one `.batch_` dir and up to `coalesce_seq`
    * (~100) of them pile up before the aggregate drains the tier. At
    * fleet scale that is the classic small-file problem (100 servers ×
    * 100 batches × several tiers), and the cluster form of this op is
    * Delta OPTIMIZE / Iceberg rewrite_data_files — invoked on a
    * maintenance cadence, not inside the write path. Rows are
    * unchanged, only layout; concurrent manifest-pinned readers finish
    * on the retained predecessor version exactly as with any swap.
    * Returns false — without launching a Spark job — when the
    * partition has no manifest (staging / legacy layouts, which other
    * processes may be appending to without the lock) or fewer than
    * `minFiles` data files. Like every mutator, assumes the caller
    * holds the server's snapshot lock: an unlocked concurrent append
    * between the pinned read and the swap would be lost. Files of
    * logically-dropped (doomed) buckets are already absent from the
    * pinned manifest, so compaction also physically ages them out —
    * their markers become stale no-ops and are cleared. `bucketed`
    * re-derives the month-bucket directory level for history tiers. */
  def compactPartition(ds: String, tier: String, srvid: Int,
      schema: StructType, targetFiles: Int = 1, minFiles: Int = 2,
      bucketed: Boolean = false): Boolean =
    AtomicSwap.manifestFiles(dir(ds, tier), s"srvid=$srvid") match {
      case Some(files)
          if files.count(_.toString.endsWith(".parquet")) >= minFiles =>
        val df = fromManifestFiles(files, srvid, schema)
          .coalesce(targetFiles)
        if (bucketed)
          overwritePartition(ds, tier, srvid,
            df.withColumn("bucket",
              date_format(col("range_start"), "yyyy-MM")),
            partitionCols = Seq("bucket"))
        else overwritePartition(ds, tier, srvid, df)
        true
      case _ => false
    }

  /** Drop one server's partition — `DELETE FROM … WHERE srvid = ?`
    * (e.g. staging drain powa--5.2.0.sql:4102-4104, reset :6359-6429).
    * Removes the live pointer first (readers stop seeing the partition
    * atomically); on the symlink layout the dropped version is RETAINED
    * one cycle for manifest-pinned in-flight readers (GC'd at the next
    * replace/drop — AtomicSwap.drop), while legacy real directories
    * (staging, whose only reader is the lock-holding snapshot) delete
    * immediately. */
  def dropPartition(ds: String, tier: String, srvid: Int): Unit = {
    AtomicSwap.drop(dir(ds, tier), s"srvid=$srvid", retainNewest = true)
    clearDooms(ds, tier, srvid)
  }

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
    labeled(s"store: aggregate $ds/$curTier->$histTier srvid=$srvid") {
      df.drop("srvid")
        .withColumn("bucket", date_format(col("range_start"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(inflight.toString)
    }
    Files.move(inflight, committedDir(ds, histTier, srvid),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE) // commit point
    dropPartition(ds, curTier, srvid)
    promoteCommitted(ds, histTier, srvid)
  }

  /** Steps 4–5: move committed buckets into the visible partition. File
    * moves are idempotent by name (Spark part files carry a UUID), so a
    * crashed promotion can simply be re-run. The partition is given the
    * symlink layout first (moves resolve through the link into the live
    * version), and the manifest is republished at the end so pinned
    * readers pick the promoted rows up — until then they read the
    * complete pre-promotion state. */
  private def promoteCommitted(ds: String, histTier: String, srvid: Int): Unit = {
    val inflight = committedDir(ds, histTier, srvid)
    if (!Files.isDirectory(inflight)) return
    // resolve pending bucket dooms FIRST: promoting new files into a
    // still-doomed bucket directory would put them under the doom
    // exclusion (silently invisible) and the deferred delete would
    // destroy them. Cutting the doomed bucket's retention short here is
    // within contract — the doom and this promote are two mutations.
    processDooms(ds, histTier, srvid)
    AtomicSwap.ensureLayout(dir(ds, histTier), s"srvid=$srvid")
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
    AtomicSwap.republish(dir(ds, histTier), s"srvid=$srvid",
      doomExclusion(ds, histTier, srvid))
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

  // ---- atomic snapshot commit ---------------------------------------
  //
  // The reference's snapshot runs `INSERT INTO current …; DELETE FROM
  // staging` inside powa_take_snapshot's single transaction
  // (powa--5.2.0.sql:1406-1488, :4102-4104). A bare appendPartition +
  // dropPartition(staging) pair leaves a crash window in which current
  // already holds the appended records while staging still holds the
  // rows that produced them — the tick RETRY would append them again
  // (duplicated records, doubled sums after the next aggregate). Same
  // discipline as the aggregate commit protocol:
  //
  //   1. write every sink's batch into a dot-prefixed STAGE directory
  //      inside its tier (invisible to every read path);
  //   2. create the COMMIT marker directory — one atomic
  //      createDirectory is the commit point;
  //   3. drop the staging partition (the inputs are now represented by
  //      the staged batches);
  //   4. promote each staged batch into its tier's live version with
  //      ONE rename and republish the manifest; 5. delete the marker.
  //
  // Recovery is unambiguous from the marker alone: ABSENT → roll back
  // (delete stage dirs; staging is intact and the retry re-derives
  // everything — the reference-equivalent "transaction rolled back,
  // rerun at a later now()"); PRESENT → roll forward (drop staging,
  // promote what remains, delete the marker). Promotion is idempotent:
  // each stage dir moves at most once and republish is a pure re-walk.
  // Dimension overwrites (statements MRU, qualstats quals) stay OUTSIDE
  // the marker: they are swap-replaces re-derived from dim ∪ staged on
  // retry, so a rolled-back tick merely re-stamps them at the retry's
  // now() — exactly what rerunning the reference's transaction does. A
  // dim updated by a tick that then rolled back is visible early; a
  // dimension row without matching records is harmless (readback joins
  // dim TO records, never the reverse).

  private def snapStageDir(ds: String, tier: String, srvid: Int): Path =
    dir(ds, tier).resolve(s".snapstage_srvid=$srvid")
  private def snapMarker(ds: String, srvid: Int): Path =
    Paths.get(root, ds, s".snapcommit_srvid=$srvid")

  /** Run independent pre-commit work units concurrently (optimization
    * guide §2.6 — actions are only sequential because the driver calls
    * them sequentially; overlapping them overlaps their PLANNING and
    * job-scheduling latency, which dominates the engine's small
    * per-tick writes). First failure is rethrown after every unit
    * finishes, so the reachable on-disk states are exactly those of a
    * sequential loop interrupted mid-way — each unit is an independent
    * write to its own directory, resolved by the same recovery. */
  private def runConcurrently(work: Seq[() => Unit]): Unit = {
    if (work.sizeIs <= 1) { work.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(work.size, 4))
    try {
      val fs = work.map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = w()
        })
      }
      var failure: Option[Throwable] = None
      fs.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          if (failure.isEmpty) failure = Some(e.getCause) }
      }
      failure.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Atomically land a snapshot's sink batches and drain its staging
    * partition — the tick's second transaction boundary. Each (tier,
    * df) in `sinks` is appended to that tier's `srvid` partition;
    * either ALL of them land and staging drains, or none do. The
    * caller holds the server's snapshot lock.
    *
    * `alongside` carries the caller's OUTSIDE-the-marker writes that
    * must complete before the commit point but are independent of the
    * sink stage writes (the statements/qualstats dimension rewrites —
    * swap-replaces of their own partitions, re-derived on a
    * rolled-back retry). Sinks and alongside units run CONCURRENTLY:
    * every unit reads the caller-cached staging frame and writes a
    * distinct invisible directory, and the commit marker is created
    * only after all of them return, so a failure anywhere still rolls
    * the tick back exactly as the sequential form did (stage dirs are
    * swept by the next recoverSnapshot; a completed dim rewrite is the
    * already-documented visible-early case). */
  def snapshotCommit(ds: String, stagingTier: String, srvid: Int,
      sinks: Seq[(String, DataFrame)],
      alongside: Seq[() => Unit] = Nil): Unit = {
    recoverSnapshot(ds, stagingTier, srvid) // resolve any stale run
    // tick-codegen scope spans every unit: the conf is set once before
    // the pool starts and restored after every unit has joined, so the
    // concurrent writers only ever READ it
    tickCodegenScope {
      runConcurrently(sinks.map { case (tier, df) => () =>
        labeled(s"store: snapshot $ds->$tier srvid=$srvid") {
          df.drop("srvid").write.mode("overwrite")
            .parquet(snapStageDir(ds, tier, srvid).toString)
        }
      } ++ alongside)
    }
    Files.createDirectory(snapMarker(ds, srvid)) // commit point
    dropPartition(ds, stagingTier, srvid)
    promoteSnapshot(ds, srvid)
    Files.deleteIfExists(snapMarker(ds, srvid))
  }

  /** Tiers holding an unpromoted snapshot stage dir for this server. */
  private def snapStageTiers(ds: String, srvid: Int): Seq[String] = {
    val base = Paths.get(root, ds)
    if (!Files.isDirectory(base)) Seq.empty
    else {
      val s = Files.list(base)
      try s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).filterNot(_.startsWith("."))
        .filter(t => Files.isDirectory(snapStageDir(ds, t, srvid)))
        .toList.sorted
      finally s.close()
    }
  }

  /** Steps 4-5: one rename moves each staged batch into its tier's live
    * version (same commit shape as AtomicSwap.appendInto), then the
    * republished manifest makes it readable. */
  private def promoteSnapshot(ds: String, srvid: Int): Unit =
    snapStageTiers(ds, srvid).foreach { tier =>
      val parent = dir(ds, tier)
      AtomicSwap.ensureLayout(parent, s"srvid=$srvid")
      val v = AtomicSwap.liveTarget(parent, s"srvid=$srvid").get
      Files.move(snapStageDir(ds, tier, srvid),
        v.resolve(s".batch_${java.util.UUID.randomUUID}"))
      // doom-aware like promoteCommitted: sink tiers carry no doom
      // markers today, but a bare republish here would resurrect a
      // logically-dropped bucket if one ever did
      AtomicSwap.republish(parent, s"srvid=$srvid",
        doomExclusion(ds, tier, srvid))
    }

  // ---- fleet snapshot commit ----------------------------------------
  //
  // The per-(server, datasource) snapshotCommit launches one Spark write
  // per sink tier PER SERVER: at 10k active servers × 23 datasources a
  // fully-staged tick is ~230k driver-scheduled jobs — a driver-side
  // scheduling bottleneck, not a data one (guide §2/§5: the work per job
  // is tiny; the cost is the job itself). The fleet form lands EVERY
  // staged server's batch for a tier with ONE partitionBy("srvid") write
  // into a dot-prefixed temp dir, then runs the UNCHANGED per-server
  // commit protocol over pure filesystem ops: move each srvid's staged
  // batch to its .snapstage dir, then per server marker → drain →
  // promote → unmark. Crash semantics are exactly the per-server
  // protocol's: a crash before a server's marker rolls that server back
  // (stage dirs swept, staging intact, retry re-derives), a crash after
  // rolls it forward — servers are independent, some may land and some
  // roll back, which is precisely what N sequential commits interrupted
  // at the same instant would leave. A crash during the fleet write
  // itself leaves only `.snapfleet_*` temp dirs: invisible to every
  // reader (dot-prefixed) and swept by [[cleanFleetStages]] at the next
  // fleet commit or engine recovery.

  private def fleetTmpDir(ds: String, tier: String): Path =
    dir(ds, tier).resolve(
      s".snapfleet_${java.util.UUID.randomUUID.toString.take(8)}")

  /** Fleet variant of [[snapshotCommit]]: land MANY servers' sink
    * batches with one Spark write per sink tier, then the per-server
    * commit protocol (filesystem-only) unchanged. Each `sinks` frame
    * must carry `srvid` (the write partitions on it); every server in
    * `srvids` is committed independently — marker, staging drain,
    * promote — so crash recovery per server is identical to the
    * sequential path's. Callers hold every listed server's snapshot
    * lock. */
  def snapshotCommitFleet(ds: String, stagingTier: String,
      srvids: Seq[Int], sinks: Seq[(String, DataFrame)]): Unit = {
    if (srvids.isEmpty) return
    cleanFleetStages(ds) // sweep any crashed fleet write's temp dirs
    srvids.foreach(recoverSnapshot(ds, stagingTier, _))
    sinks.foreach { case (tier, df) =>
      val tmp = fleetTmpDir(ds, tier)
      df.write.mode("overwrite").partitionBy("srvid")
        .parquet(tmp.toString)
      srvids.foreach { id =>
        val src = tmp.resolve(s"srvid=$id")
        if (Files.isDirectory(src))
          Files.move(src, snapStageDir(ds, tier, id))
      }
      deleteRecursively(tmp)
    }
    // The per-server commit protocol, UNCHANGED in shape but run on a
    // bounded driver-side pool: each server's marker → drain → promote →
    // unmark touches only srvid-scoped paths (stage dir, marker dir,
    // staging partition link, live version link, doom markers, manifest
    // file are all keyed by srvid), so servers commit independently —
    // the same independence the crash-recovery contract already relies
    // on. Measured: the sequential loop was ~35 ms/server of driver FS
    // ops (marker + drop + promote + manifest republish), i.e. 35 s of
    // the 1000-server fleet tick AFTER the Spark fan-out was fixed —
    // the new driver-side bottleneck (guide §5). A failed server's
    // exception is rethrown after every other server finishes its
    // commit, which leaves exactly the states N sequential commits
    // interrupted mid-loop would: some rolled forward, the failed one
    // resolved by its marker, the rest retry-safe.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    try {
      val fs = srvids.map { id =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            Files.createDirectory(snapMarker(ds, id)) // commit point
            dropPartition(ds, stagingTier, id)
            promoteSnapshot(ds, id)
            Files.deleteIfExists(snapMarker(ds, id))
          }
        })
      }
      var failure: Option[Throwable] = None
      fs.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          if (failure.isEmpty) failure = Some(e.getCause) }
      }
      failure.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Sweep `.snapfleet_*` temp dirs a crashed fleet write left behind —
    * dot-prefixed (invisible to all readers), so this is pure hygiene:
    * called at every fleet commit start and from engine recovery. */
  def cleanFleetStages(ds: String): Unit = {
    val base = Paths.get(root, ds)
    if (!Files.isDirectory(base)) return
    val tiers = {
      val s = Files.list(base)
      try s.iterator().asScala.filter(Files.isDirectory(_))
        .filterNot(_.getFileName.toString.startsWith(".")).toList
      finally s.close()
    }
    tiers.foreach { t =>
      val s = Files.list(t)
      val stale =
        try s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(".snapfleet_")).toList
        finally s.close()
      stale.foreach(deleteRecursively)
    }
  }

  /** Resolve a (possibly crashed) snapshot commit — safe to call every
    * tick; pure directory probes when nothing is pending. */
  def recoverSnapshot(ds: String, stagingTier: String, srvid: Int): Unit =
    if (Files.isDirectory(snapMarker(ds, srvid))) {
      dropPartition(ds, stagingTier, srvid)
      promoteSnapshot(ds, srvid)
      Files.deleteIfExists(snapMarker(ds, srvid))
    } else snapStageTiers(ds, srvid)
      .foreach(t => deleteRecursively(snapStageDir(ds, t, srvid)))

  /** All srvids with an unresolved snapshot commit (marker or orphan
    * stage dir) in this datasource — the engine-start recovery scan. */
  def snapshotPendingSrvids(ds: String): Seq[Int] = {
    val base = Paths.get(root, ds)
    if (!Files.isDirectory(base)) Seq.empty
    else {
      def ids(d: Path, prefix: String): Seq[Int] =
        if (!Files.isDirectory(d)) Seq.empty
        else {
          val s = Files.list(d)
          try s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith(prefix))
            .flatMap(n => scala.util.Try(
              n.stripPrefix(prefix).toInt).toOption).toList
          finally s.close()
        }
      val markers = ids(base, ".snapcommit_srvid=")
      val s = Files.list(base)
      val staged =
        try s.iterator().asScala.filter(Files.isDirectory(_))
          .filterNot(_.getFileName.toString.startsWith("."))
          .flatMap(t => ids(t, ".snapstage_srvid=")).toList
        finally s.close()
      (markers ++ staged).distinct
    }
  }

  /** Drop a whole tier (global reset). */
  def dropTier(ds: String, tier: String): Unit = deleteRecursively(dir(ds, tier))

  private def deleteRecursively(p: Path): Unit =
    AtomicSwap.deleteRecursively(p)
}
