package graft.sources.v2

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.hadoop.mapred.{FileSplit => MapredFileSplit}
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.core.AtomicSwap

/** DataSource V2 Table over one tier of the manifest store — the
  * catalog-native packaging of `Store.readPartition`'s manifest-pinned
  * read path (NOTES round-6 "candidate next steps"). Usage:
  *
  * {{{
  * spark.read.format("graft-store")
  *   .option("root", root).option("ds", ds).option("tier", tier)
  *   .schema(tierSchema)            // optional; inferred from a file
  *   .load()
  * }}}
  *
  * What Spark's planner gets that the union-of-literals read assembled
  * by hand:
  *
  *  - **Planning-time partition pruning BEFORE file listing**: srvid
  *    predicates are pushed into the scan ([[StoreScanBuilder]]), and a
  *    pruned server's partition is never even manifest-read — on a
  *    1000-server store a `WHERE srvid = ?` readback plans exactly one
  *    partition's files, without 999 empty relations passing through
  *    the optimizer first.
  *  - **Manifest pinning where it belongs**: the file list of every
  *    surviving partition comes from ONE atomic manifest read at
  *    `planInputPartitions` time (fallback: directory walk, hidden
  *    entries excluded, for never-swapped layouts like staging) — the
  *    same no-list-vs-open guarantee as `Store.readPartition`, now
  *    expressed as the scan's input-partition planning.
  *  - **Vectorized execution**: each file is read by Spark's own
  *    `VectorizedParquetRecordReader` with the srvid partition value
  *    attached in-batch (`initBatch`), so the scan emits
  *    `ColumnarBatch`es exactly like the built-in parquet source and
  *    joins whole-stage codegen through the usual ColumnarToRow.
  *  - **Column pruning**: the pruned schema is the schema handed to
  *    the parquet reader (`SupportsPushDownRequiredColumns`).
  *
  * The srvid column is exposed LAST in the table schema (the
  * partition-column convention), typed int, never read from files.
  * Cluster note: file paths resolve through `java.nio` here because the
  * store is a local-filesystem layout in this build; the cluster port
  * swaps the listing/length calls for Hadoop `FileSystem` against the
  * same manifest bytes — the scan planning itself is already
  * location-agnostic (absolute path strings inside InputPartitions).
  */
final class StoreV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-store"
  override def supportsExternalMetadata(): Boolean = true

  private def layout(options: JMap[String, String]): StoreLayout = {
    def req(k: String) = {
      val v = options.get(k)
      require(v != null && v.nonEmpty, s"graft-store: missing option '$k'")
      v
    }
    StoreLayout(req("root"), req("ds"), req("tier"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val lay = layout(options.asCaseSensitiveMap())
    val first = lay.srvids.iterator
      .flatMap(n => lay.files(n).iterator).buffered.headOption
    require(first.isDefined,
      s"graft-store: cannot infer schema of empty tier ${lay.dir}")
    val fileSchema = SparkSession.active.read.parquet(first.get).schema
    StructType(fileSchema.fields.filterNot(_.name == "srvid") :+
      StructField("srvid", IntegerType))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new StoreTable(layout(properties), normalize(schema))

  /** User-supplied schemas may carry srvid anywhere or not at all; the
    * table always exposes data fields first, srvid (int) last. Declared
    * NULLABLE so a computed (hence nullable-typed) srvid expression can
    * be written by-name without an analyzer nullability rejection — the
    * write path enforces non-null per row, loudly ([[StoreDataWriter]]);
    * on read the column is a partition value and never null in fact. */
  private def normalize(schema: StructType): StructType =
    StructType(schema.fields.filterNot(_.name == "srvid") :+
      StructField("srvid", IntegerType))
}

/** One tier's physical layout + the planning-time listing rules. */
final case class StoreLayout(root: String, ds: String, tier: String) {
  def dir: Path = Paths.get(root, ds, tier)

  /** Visible srvid partitions (same rule as Store.listSrvids). */
  def srvids: Seq[Int] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("srvid="))
      .flatMap(n => scala.util.Try(n.stripPrefix("srvid=").toInt).toOption)
      .toList.sorted
    finally s.close()
  }

  /** One partition's parquet files: manifest-pinned when a manifest
    * exists (the atomic read — the partition IS this list), else a
    * directory walk that skips hidden (dot/underscore) entries, the
    * same visibility rule as Spark's own file index. The walk starts
    * at the resolved real path so a symlinked live version traverses. */
  def files(srvid: Int): Seq[String] = filesWithStats(srvid).map(_._1)

  /** Files plus the manifest's per-file range stats (`col -> (min,
    * max)` in µs) — the planning-time skip index. Directory-walk
    * fallback and pre-stats manifests yield empty maps ("cannot
    * skip"). */
  def filesWithStats(
      srvid: Int): Seq[(String, Map[String, (Long, Long)])] =
    AtomicSwap.manifestEntries(dir, s"srvid=$srvid") match {
      case Some(pinned) =>
        pinned.collect { case (p, st) if p.toString.endsWith(".parquet") =>
          (p.toString, st)
        }
      case None =>
        val p = dir.resolve(s"srvid=$srvid")
        if (!Files.isDirectory(p)) Seq.empty
        else {
          val real = p.toRealPath()
          val s = Files.walk(real)
          try s.iterator().asScala
            .filter(f => f.getFileName.toString.endsWith(".parquet"))
            .filter { f =>
              val rel = real.relativize(f)
              (0 until rel.getNameCount).forall { i =>
                val n = rel.getName(i).toString
                !n.startsWith(".") && !n.startsWith("_")
              }
            }
            .map(f => (f.toString, Map.empty[String, (Long, Long)]))
            .toList.sortBy(_._1)
          finally s.close()
        }
    }
}

/** `guard` is the ACL hook ([[StoreCatalog]]'s enforcement decorator):
  * called with the required privilege ("SELECT" at scan building,
  * "INSERT" at write building — the coarse DML gate; the reference's
  * finer UPDATE/DELETE rows coincide with INSERT for every powa role)
  * and throws to deny. Default no-op: the bare `graft-store` format and
  * the engine's own reads are not principal-scoped. */
final class StoreTable(layout: StoreLayout, tableSchema: StructType,
    guard: String => Unit = _ => ())
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"graft-store:${layout.root}/${layout.ds}/${layout.tier}"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("srvid"))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_DYNAMIC)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    guard("SELECT")
    new StoreScanBuilder(layout, tableSchema)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    guard("INSERT")
    new StoreWriteBuilder(layout, info)
  }
}

/** Pushdown: srvid predicates are consumed here (partition pruning at
  * planning time — satisfied exactly, so Spark never re-evaluates
  * them). Range predicates on the manifest's stat columns
  * (`range_start`/`range_end` for history, nested `record.ts` for
  * current, `ts` for staging — Spark translates nested-field
  * comparisons to dotted V1 Filter names for DSv2 pushdown) are
  * pushed as FILE-SKIPPING predicates:
  * they prune whole files against the manifest min/max before any file
  * is opened, but stay residual too (Spark re-evaluates them row-wise
  * inside surviving files) — the same partial-pushdown contract as
  * parquet's own PushedFilters. Every other filter is returned as
  * residual. Column pruning keeps table order. */
final class StoreScanBuilder(layout: StoreLayout, tableSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var srvidPreds: Seq[Int => Boolean] = Seq.empty
  private var rangeSkips: Seq[(String, (Long, Long) => Boolean)] = Seq.empty

  private def srvidPred(f: Filter): Option[Int => Boolean] = f match {
    case EqualTo("srvid", v: Number) => Some(_ == v.intValue)
    case EqualNullSafe("srvid", v: Number) => Some(_ == v.intValue)
    case In("srvid", vs) => Some(n => vs.exists {
      case v: Number => v.intValue == n; case _ => false })
    case GreaterThan("srvid", v: Number) => Some(_ > v.intValue)
    case GreaterThanOrEqual("srvid", v: Number) => Some(_ >= v.intValue)
    case LessThan("srvid", v: Number) => Some(_ < v.intValue)
    case LessThanOrEqual("srvid", v: Number) => Some(_ <= v.intValue)
    case IsNotNull("srvid") => Some(_ => true) // partition col: never null
    case _ => None
  }

  /** Filter value → epoch µs, across the comparand types Spark hands a
    * V1-Filter pushdown for a timestamp column (plus raw micros longs
    * for long-typed stat columns). */
  private def tsMicros(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    v match {
      case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
      case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
      case l: java.time.LocalDateTime =>
        Some(DateTimeUtils.localDateTimeToMicros(l))
      case n: Number => Some(n.longValue)
      case _ => None
    }
  }

  /** "Can any row of a file with this (min, max) satisfy the filter?"
    * — the file-skipping form of the range comparisons. Null rows
    * never satisfy a comparison, so bounds over non-null values are
    * decisive. */
  private def rangeSkip(
      f: Filter): Option[(String, (Long, Long) => Boolean)] = f match {
    case GreaterThanOrEqual(c, v) if StoreScan.statCols(c) =>
      tsMicros(v).map(x => (c, (_: Long, mx: Long) => mx >= x))
    case GreaterThan(c, v) if StoreScan.statCols(c) =>
      tsMicros(v).map(x => (c, (_: Long, mx: Long) => mx > x))
    case LessThanOrEqual(c, v) if StoreScan.statCols(c) =>
      tsMicros(v).map(x => (c, (mn: Long, _: Long) => mn <= x))
    case LessThan(c, v) if StoreScan.statCols(c) =>
      tsMicros(v).map(x => (c, (mn: Long, _: Long) => mn < x))
    case EqualTo(c, v) if StoreScan.statCols(c) =>
      tsMicros(v).map(x => (c, (mn: Long, mx: Long) => mn <= x && mx >= x))
    case In(c, vs) if StoreScan.statCols(c) =>
      // the IVF-probe shape: `cell IN (<probed cells>)` skips every
      // file whose [min, max] contains none of the probed values. Only
      // sound when EVERY value translated (an untranslatable member
      // could match a skipped file) — else no skip.
      val xs = vs.toSeq.map(tsMicros)
      if (xs.isEmpty || xs.exists(_.isEmpty)) None
      else {
        val vals = xs.flatten
        Some((c, (mn: Long, mx: Long) => vals.exists(x => mn <= x && x <= mx)))
      }
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (srvidSup, rest) = filters.partition(f => srvidPred(f).isDefined)
    val rangeSup = rest.filter(f => rangeSkip(f).isDefined)
    pushed = srvidSup ++ rangeSup
    srvidPreds = srvidSup.toSeq.flatMap(srvidPred)
    rangeSkips = rangeSup.toSeq.flatMap(rangeSkip)
    // srvid is satisfied exactly; range skips only prune files, so
    // they remain residual for row-level evaluation
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new StoreScan(layout, required, pushed, srvidPreds, rangeSkips)
}

object StoreScan {
  /** Columns with manifest min/max stats — THE definition lives with
    * the publisher (AtomicSwap.statCols); referencing it here means a
    * column added to the manifest is automatically skippable and a
    * column never published is never pushed (round-9 ADVICE: two
    * hand-synced sets silently stop skipping when they drift). */
  val statCols: Set[String] = AtomicSwap.statCols
}

final class StoreScan(layout: StoreLayout, required: StructType,
    pushed: Array[Filter], srvidPreds: Seq[Int => Boolean],
    rangeSkips: Seq[(String, (Long, Long) => Boolean)] = Seq.empty)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val ids = prunedSrvids
    s"GraftStoreScan ${layout.ds}/${layout.tier} " +
      s"srvids=[${ids.mkString(",")}] " +
      s"columns=[${required.fieldNames.mkString(",")}] " +
      s"pushed=[${pushed.mkString(",")}]"
  }

  /** Partition pruning: predicate conjunction over the listed srvids —
    * evaluated BEFORE any manifest/directory file listing. */
  private[graft] def prunedSrvids: Seq[Int] =
    layout.srvids.filter(n => srvidPreds.forall(_(n)))

  /** File skipping: a file survives only if every pushed range
    * predicate is satisfiable against its manifest min/max — a
    * narrow-range readback on a long history opens a handful of files
    * instead of the partition. Files without stats (pre-stats
    * manifests, directory-walk fallback) always survive. */
  override def planInputPartitions(): Array[InputPartition] =
    prunedSrvids.flatMap { n =>
      layout.filesWithStats(n).collect {
        case (f, stats) if rangeSkips.forall { case (c, sat) =>
          stats.get(c).forall { case (mn, mx) => sat(mn, mx) }
        } => StoreFilePartition(f, n)
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // everything ParquetReadSupport + the schema converter consult
    // (binaryAsString, int96, case sensitivity, nanosAsLong, …) is a
    // spark.sql.* key they expect PRESENT in the hadoop conf. The
    // session's newHadoopConf only carries explicitly-SET confs, so
    // capture every registered conf with its resolved default — the
    // same values Spark's own parquet scan pins one key at a time.
    val sq = SparkSession.active.sessionState.conf
    val defined = sq.getAllDefinedConfs
      .collect { case (k, v, _, _) if v != null && v != "<undefined>" =>
        k -> v }
    // …but internal/legacy entries are EXCLUDED from getAllDefinedConfs
    // and the schema converter hard-reads these eight with .toBoolean:
    import org.apache.spark.sql.internal.SQLConf
    val hardRead = Seq(
      SQLConf.CASE_SENSITIVE, SQLConf.LEGACY_PARQUET_NANOS_AS_LONG,
      SQLConf.PARQUET_BINARY_AS_STRING, SQLConf.PARQUET_FIELD_ID_READ_ENABLED,
      SQLConf.PARQUET_IGNORE_VARIANT_ANNOTATION,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      SQLConf.PARQUET_INT96_AS_TIMESTAMP,
      SQLConf.PARQUET_READER_RESPECT_UNKNOWN_TYPE_ANNOTATION
    ).map(e => e.key -> sq.getConf(e).toString)
    val sqlKv = defined ++ hardRead // later entries win on re-set
    val dataSchema =
      StructType(required.fields.filterNot(_.name == "srvid"))
    StoreReaderFactory(sqlKv, dataSchema.json,
      withSrvid = required.fieldNames.contains("srvid"))
  }
}

final case class StoreFilePartition(path: String, srvid: Int)
    extends InputPartition

/** Executor-side: one vectorized parquet reader per pinned file, srvid
  * attached as an in-batch constant partition column (`initBatch`) —
  * the exact mechanics of Spark's own parquet scan, pointed at an
  * explicit immutable file instead of a listed directory. */
final case class StoreReaderFactory(sqlKv: Seq[(String, String)],
    dataSchemaJson: String, withSrvid: Boolean)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = true

  private def open(p: InputPartition): VectorizedParquetRecordReader = {
    val fp = p.asInstanceOf[StoreFilePartition]
    // copy-construct from the JVM-wide parsed base: `new Configuration()`
    // re-parses the Hadoop default XML per instance, and this runs once
    // PER FILE per scan task — per-reader XML parsing was pure overhead
    // on every V2 read (the copy constructor clones the property map
    // without touching XML)
    val conf = new Configuration(StoreReaderFactory.baseConf)
    sqlKv.foreach { case (k, v) => conf.set(k, v) }
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      dataSchemaJson)
    conf.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    val len = new java.io.File(fp.path).length()
    // the reader casts to the legacy mapred split type internally
    val split = new MapredFileSplit(new HadoopPath(fp.path), 0, len,
      Array.empty[String])
    val ctx = new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0))
    try {
      reader.initialize(split, ctx)
      if (withSrvid)
        reader.initBatch(
          StructType(Seq(StructField("srvid", IntegerType, false))),
          new GenericInternalRow(Array[Any](fp.srvid)))
      reader.enableReturningBatches()
    } catch { case e: Throwable => reader.close(); throw e }
    reader
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = {
    val reader = open(p)
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): ColumnarBatch =
        reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      override def close(): Unit = reader.close()
    }
  }

  /** Row fallback (Spark only calls this when a plan opts out of
    * columnar): same reader, row-by-row off each batch. */
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val reader = open(p)
    new PartitionReader[InternalRow] {
      private var rows: java.util.Iterator[InternalRow] = _
      override def next(): Boolean = {
        while (rows == null || !rows.hasNext) {
          if (!reader.nextKeyValue()) return false
          val b = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
          rows = b.rowIterator()
        }
        true
      }
      override def get(): InternalRow = rows.next()
      override def close(): Unit = reader.close()
    }
  }
}

object StoreReaderFactory {
  /** Executor-JVM-wide parsed Hadoop conf — the copy-construction base
    * for every per-file reader conf (parse the default XML once per
    * JVM, not once per file). */
  lazy val baseConf = new Configuration()
}
