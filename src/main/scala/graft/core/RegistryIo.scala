package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Driver-side parquet IO for the registry's config tables.
  *
  * These tables are a handful of rows written once per tick (metas) or
  * per admin call; going through a Spark job for each write/read would
  * cost ~100-300 ms of scheduling per touch — three orders of magnitude
  * more than the data justifies, and material at the engine's tick rate
  * (the reference's equivalent is a single-row UPDATE,
  * powa--5.2.0.sql:3490-3497). So the registry reads and writes its
  * parquet directly with parquet-java (the same library Spark writes
  * with): standard logical types (TIMESTAMP MICROS UTC, 3-level LIST,
  * MAP), one file per table version — Spark and DuckDB read these files
  * unchanged. Data tiers never use this path; it is config-plumbing
  * only, driver-resident by construction.
  */
object RegistryIo {

  private val utf8 = LogicalTypeAnnotation.stringType()
  private val tsMicros = LogicalTypeAnnotation.timestampType(
    true, LogicalTypeAnnotation.TimeUnit.MICROS)

  private def listOfString(name: String) =
    Types.optionalGroup().as(LogicalTypeAnnotation.listType())
      .addField(Types.repeatedGroup()
        .addField(Types.optional(BINARY).as(utf8).named("element"))
        .named("list"))
      .named(name)

  val serversSchema: MessageType = Types.buildMessage()
    .addField(Types.required(INT32).named("srvid"))
    .addField(Types.required(BINARY).as(utf8).named("hostname"))
    .addField(Types.optional(BINARY).as(utf8).named("alias"))
    .addField(Types.required(INT32).named("port"))
    .addField(Types.required(INT32).named("frequency"))
    .addField(Types.required(INT64).named("retention"))
    .addField(Types.required(INT32).named("powa_coalesce"))
    .addField(Types.required(INT32).named("version"))
    .addField(Types.required(INT64).named("catalog_refresh"))
    .addField(Types.optionalGroup().as(LogicalTypeAnnotation.mapType())
      .addField(Types.repeatedGroup()
        .addField(Types.required(BINARY).as(utf8).named("key"))
        .addField(Types.required(INT64).named("value"))
        .named("key_value"))
      .named("feature_retention"))
    .named("servers")

  val metasSchema: MessageType = Types.buildMessage()
    .addField(Types.required(INT32).named("srvid"))
    .addField(Types.required(INT64).named("coalesce_seq"))
    .addField(Types.optional(INT64).as(tsMicros).named("snapts"))
    .addField(Types.optional(INT64).as(tsMicros).named("aggts"))
    .addField(Types.optional(INT64).as(tsMicros).named("purgets"))
    .addField(listOfString("errors"))
    .named("snapshot_metas")

  val modulesSchema: MessageType = Types.buildMessage()
    .addField(Types.required(INT32).named("srvid"))
    .addField(Types.required(BINARY).as(utf8).named("module"))
    .addField(Types.required(BOOLEAN).named("enabled"))
    .named("module_config")

  val dbModulesSchema: MessageType = Types.buildMessage()
    .addField(Types.required(INT32).named("srvid"))
    .addField(Types.required(BINARY).as(utf8).named("module"))
    .addField(Types.required(BINARY).as(utf8).named("state"))
    .addField(listOfString("dbnames"))
    .named("db_module_config")

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def addList(g: Group, field: String, values: Seq[String]): Unit = {
    val list = g.addGroup(field)
    values.foreach(v => list.addGroup("list").add("element", v))
  }
  private def readList(g: Group, field: String): Seq[String] =
    if (g.getFieldRepetitionCount(field) == 0) Seq.empty
    else {
      val list = g.getGroup(field, 0)
      (0 until list.getFieldRepetitionCount("list"))
        .map(i => list.getGroup("list", i).getString("element", 0))
    }

  /** Write `rows` as one parquet file under `dir` (created). */
  def write(dir: Path, schema: MessageType)(
      rows: SimpleGroupFactory => Seq[Group]): Unit = {
    Files.createDirectories(dir)
    val file = new org.apache.hadoop.fs.Path(
      dir.resolve("data.parquet").toString)
    val conf = new Configuration(false)
    val writer = ExampleParquetWriter.builder(file)
      .withType(schema).withConf(conf).build()
    try rows(new SimpleGroupFactory(schema)).foreach(writer.write)
    finally writer.close()
  }

  /** Read every row group of every parquet file under `dir`. */
  def read(dir: Path, schema: MessageType): Seq[Group] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val files = {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(
        _.getFileName.toString.endsWith(".parquet")).toList
      finally s.close()
    }
    val conf = new Configuration(false)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      schema.toString)
    files.sortBy(_.getFileName.toString).flatMap { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(f.toString))
        .withConf(conf).build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).toList
      finally reader.close()
    }
  }

  // ---- row codecs ----------------------------------------------------

  import RegistryStore._

  def serverGroup(f: SimpleGroupFactory, r: ServerRow): Group = {
    val g = f.newGroup()
    g.append("srvid", r.srvid).append("hostname", r.hostname)
    r.alias.foreach(a => g.add("alias", a))
    g.append("port", r.port).append("frequency", r.frequency)
      .append("retention", r.retention)
      .append("powa_coalesce", r.powa_coalesce)
      .append("version", r.version)
      .append("catalog_refresh", r.catalog_refresh)
    val m = g.addGroup("feature_retention")
    r.feature_retention.toSeq.sortBy(_._1).foreach { case (k, v) =>
      m.addGroup("key_value").append("key", k).append("value", v)
    }
    g
  }

  def serverRowOf(g: Group): ServerRow = ServerRow(
    srvid = g.getInteger("srvid", 0),
    hostname = g.getString("hostname", 0),
    alias = if (g.getFieldRepetitionCount("alias") == 0) None
            else Some(g.getString("alias", 0)),
    port = g.getInteger("port", 0),
    frequency = g.getInteger("frequency", 0),
    retention = g.getLong("retention", 0),
    powa_coalesce = g.getInteger("powa_coalesce", 0),
    version = g.getInteger("version", 0),
    catalog_refresh = g.getLong("catalog_refresh", 0),
    feature_retention =
      if (g.getFieldRepetitionCount("feature_retention") == 0) Map.empty
      else {
        val m = g.getGroup("feature_retention", 0)
        (0 until m.getFieldRepetitionCount("key_value")).map { i =>
          val kv = m.getGroup("key_value", i)
          kv.getString("key", 0) -> kv.getLong("value", 0)
        }.toMap
      })

  def metaGroup(f: SimpleGroupFactory, r: MetaRow): Group = {
    val g = f.newGroup()
    g.append("srvid", r.srvid).append("coalesce_seq", r.coalesce_seq)
    r.snapts.foreach(t => g.add("snapts", micros(t)))
    r.aggts.foreach(t => g.add("aggts", micros(t)))
    r.purgets.foreach(t => g.add("purgets", micros(t)))
    addList(g, "errors", r.errors)
    g
  }

  def metaRowOf(g: Group): MetaRow = {
    def optTs(field: String) =
      if (g.getFieldRepetitionCount(field) == 0) None
      else Some(fromMicros(g.getLong(field, 0)))
    MetaRow(
      srvid = g.getInteger("srvid", 0),
      coalesce_seq = g.getLong("coalesce_seq", 0),
      snapts = optTs("snapts"), aggts = optTs("aggts"),
      purgets = optTs("purgets"),
      errors = readList(g, "errors"))
  }

  def moduleGroup(f: SimpleGroupFactory, r: ModuleRow): Group =
    f.newGroup().append("srvid", r.srvid).append("module", r.module)
      .append("enabled", r.enabled)

  def moduleRowOf(g: Group): ModuleRow = ModuleRow(
    g.getInteger("srvid", 0), g.getString("module", 0),
    g.getBoolean("enabled", 0))

  def dbModuleGroup(f: SimpleGroupFactory, r: DbModuleRow): Group = {
    val g = f.newGroup()
    g.append("srvid", r.srvid).append("module", r.module)
      .append("state", r.state)
    addList(g, "dbnames", r.dbnames)
    g
  }

  def dbModuleRowOf(g: Group): DbModuleRow = DbModuleRow(
    g.getInteger("srvid", 0), g.getString("module", 0),
    g.getString("state", 0), readList(g, "dbnames"))
}
