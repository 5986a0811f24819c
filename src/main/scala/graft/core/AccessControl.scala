package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pseudo-role ACL surface — the Spark-native analogue of the reference's
  * predefined-role layer (powa--5.2.0.sql:13-118 `powa_roles` +
  * `setup_powa_roles`, :7533-7655 `powa_grant`, :7667-7729 `powa_revoke`).
  *
  * The reference creates six NOLOGIN pseudo-roles and computes a GRANT /
  * REVOKE matrix over every extension-owned relation (walked via
  * pg_depend); Postgres then enforces it. On Spark there is no built-in
  * row-level enforcement engine — the realistic deployment enforces at
  * the table-catalog layer (warehouse ACLs on the store root) — so this
  * module keeps the two halves the engine CAN own:
  *
  *   1. the ROLE algebra: the fixed six-role registry, `setupRoles`'
  *      create-vs-reuse modes with the reference's exact sanity checks
  *      (privileged-principal rejection, no-remap rule, all-exist rule),
  *      persisted next to the rest of the registry so a restarted
  *      process sees the same mapping;
  *   2. the GRANT matrix itself, as data: `grants()` materializes the
  *      same per-object privilege rows `powa_grant` EXECUTEs, over the
  *      store's deterministic object inventory, and `check()` answers
  *      "may principal P do PRIV on object O" from it — the hook a
  *      catalog-layer enforcer (or a query gateway) consumes.
  *
  * The matrix rules are transcribed from powa_grant (:7583-7654):
  *   - powa_admin: ALL on everything;
  *   - powa_write_all_data: sequences USAGE/SELECT/UPDATE; tables and
  *     views full DML (SELECT/INSERT/UPDATE/DELETE/TRUNCATE), with
  *     REFERENCES/TRIGGER explicitly revoked;
  *   - powa_snapshot: SELECT-only on the configuration tables (the
  *     14-name list at :7598-7608) and on views; full DML on the data
  *     tables it must write during a snapshot; nothing on sequences;
  *   - powa_signal_backend: nothing (REVOKE ALL — the role exists only
  *     to signal backends on the remote server, :7619);
  *   - powa_read_all_data: SELECT on every table/view EXCEPT the
  *     `*_src_tmp` staging relations; nothing on sequences;
  *   - powa_read_all_metrics: same as read_all_data minus anything
  *     matching `%qualstats_constvalues%` (constvalues can leak literal
  *     query parameters — metrics readers must not see them, :7625-7631).
  */
object AccessControl {

  val PowaAdmin = "powa_admin"
  val ReadAllData = "powa_read_all_data"
  val ReadAllMetrics = "powa_read_all_metrics"
  val WriteAllData = "powa_write_all_data"
  val Snapshot = "powa_snapshot"
  val SignalBackend = "powa_signal_backend"

  /** The fixed pseudo-role set (powa_roles CHECK constraint, :16-18). */
  val PowaRoles: Seq[String] = Seq(
    PowaAdmin, ReadAllData, ReadAllMetrics, WriteAllData, Snapshot,
    SignalBackend)

  /** The pg_roles attributes `setup_powa_roles` rejects when reusing an
    * existing role (:55-69): a powa pseudo-role must be an inert group. */
  final case class PrincipalFlags(
      superuser: Boolean = false,
      createRole: Boolean = false,
      createDb: Boolean = false,
      canLogin: Boolean = false,
      replication: Boolean = false,
      bypassRls: Boolean = false) {
    def privileged: Option[String] =
      if (superuser) Some("is a superuser")
      else if (createRole) Some("can create role")
      else if (createDb) Some("can create db")
      else if (canLogin) Some("can login")
      else if (replication) Some("is a replication role")
      else if (bypassRls) Some("can bypass RLS")
      else None
  }

  /** relkind analogue: 'r' table, 'v' view, 'S' sequence. */
  sealed abstract class ObjKind(val code: String)
  case object Table extends ObjKind("r")
  case object View extends ObjKind("v")
  case object Sequence extends ObjKind("S")

  final case class StoreObject(name: String, kind: ObjKind)
  final case class Grant(obj: String, role: String, privilege: String)

  /** Snapshot-role SELECT-only configuration tables (:7598-7608). */
  val SnapshotConfigTables: Set[String] = Set(
    "powa_roles", "powa_servers", "powa_extensions",
    "powa_extension_functions", "powa_extension_config",
    "powa_modules", "powa_module_config", "powa_module_functions",
    "powa_db_modules", "powa_db_module_config",
    "powa_db_module_functions", "powa_db_module_src_queries",
    "powa_catalogs", "powa_catalog_src_queries")

  private val TablePrivs =
    Seq("SELECT", "INSERT", "UPDATE", "DELETE", "TRUNCATE",
      "REFERENCES", "TRIGGER")
  private val SeqPrivs = Seq("USAGE", "SELECT", "UPDATE")
  private val Dml = Seq("SELECT", "INSERT", "UPDATE", "DELETE", "TRUNCATE")

  /** The store's deterministic object inventory — the analogue of the
    * pg_depend walk over extension-owned relations (:7574-7581). Built
    * from the datasource spec registry (staging + current + history +
    * per-db rollup tiers per datasource, the qualstats family's
    * hand-written quals/constvalues tables), the registry/config tables,
    * the catalog-mirror tables and their staging, the two views and the
    * server-id sequence of the reference schema. */
  def inventory(specs: Seq[graft.spec.DatasourceSpec]): Seq[StoreObject] = {
    val datasource = specs.flatMap { sp =>
      if (sp.name == "powa_qualstats")
        // hand-written family (powa--5.2.0.sql:3061-3178): quals dimension
        // + quals/constvalues history pairs share ONE staging table
        Seq(
          StoreObject("powa_qualstats_src_tmp", Table),
          StoreObject("powa_qualstats_quals", Table),
          StoreObject("powa_qualstats_quals_history_current", Table),
          StoreObject("powa_qualstats_quals_history", Table),
          StoreObject("powa_qualstats_constvalues_history_current", Table),
          StoreObject("powa_qualstats_constvalues_history", Table))
      else
        Seq(
          StoreObject(s"${sp.name}_src_tmp", Table),
          StoreObject(s"${sp.name}_history_current", Table),
          StoreObject(s"${sp.name}_history", Table)) ++
          (if (sp.perDbRollup)
            Seq(StoreObject(s"${sp.name}_history_current_db", Table),
              StoreObject(s"${sp.name}_history_db", Table))
          else Seq.empty)
    }
    val registry = (SnapshotConfigTables ++ Seq(
      "powa_snapshot_metas", "powa_databases", "powa_statements"))
      .toSeq.sorted.map(StoreObject(_, Table))
    val catalogs = CatalogMirror.catalogs.map(_._1).flatMap { pg =>
      val n = "powa_catalog_" + pg.stripPrefix("pg_")
      Seq(StoreObject(n, Table), StoreObject(s"${n}_src_tmp", Table))
    }
    val fixed = Seq(
      StoreObject("powa_functions", View),
      StoreObject("powa_all_functions", View),
      StoreObject("powa_servers_id_seq", Sequence))
    (datasource ++ registry ++ catalogs ++ fixed).distinctBy(_.name)
  }

  /** The effective privilege rows `powa_grant` produces for one object —
    * pure rule transcription of :7583-7654 (grants minus the explicit
    * revokes; a REVOKE of something never granted is a no-op, so only
    * the surviving privileges appear). */
  def grantsFor(o: StoreObject): Seq[Grant] = {
    val admin = (o.kind match {
      case Sequence => SeqPrivs
      case _ => TablePrivs
    }).map(Grant(o.name, PowaAdmin, _))

    val write = (o.kind match {
      case Sequence => SeqPrivs
      case _ => Dml // REFERENCES/TRIGGER explicitly revoked (:7593)
    }).map(Grant(o.name, WriteAllData, _))

    val snapshot = o.kind match {
      case Sequence => Seq.empty // no sequence branch for powa_snapshot
      case View => Seq(Grant(o.name, Snapshot, "SELECT"))
      case Table =>
        if (SnapshotConfigTables(o.name))
          Seq(Grant(o.name, Snapshot, "SELECT"))
        else Dml.map(Grant(o.name, Snapshot, _))
    }

    def selectOnly(role: String, excluded: Boolean): Seq[Grant] =
      if (excluded || o.kind == Sequence) Seq.empty
      else Seq(Grant(o.name, role, "SELECT"))

    val readData = selectOnly(ReadAllData, o.name.endsWith("_src_tmp"))
    val readMetrics = selectOnly(ReadAllMetrics,
      o.name.endsWith("_src_tmp") || o.name.contains("qualstats_constvalues"))

    // powa_signal_backend: REVOKE ALL (:7619) — zero rows.
    admin ++ write ++ snapshot ++ readData ++ readMetrics
  }

  /** Full matrix over the standard inventory. */
  def grants(specs: Seq[graft.spec.DatasourceSpec] = graft.spec.Specs.all)
      : Seq[Grant] =
    inventory(specs).flatMap(grantsFor)

  /** Store-resident index relations (`powa_index_<name>_<tier>` — the
    * persisted IVF / signature indexes written through the governed
    * store) are engine-owned DATA tables: the reference's grant matrix
    * is computed over EVERY extension-owned relation via a pg_depend
    * walk (powa--5.2.0.sql:7574-7581), which covers relations created
    * after install too — the name-pattern rule is that walk's analogue
    * for dynamically created index tiers. They get the plain
    * data-table rows from [[grantsFor]] (read roles SELECT, snapshot/
    * write/admin DML); index content derives from corpus data, not
    * from qualstats constvalues, so no metrics-reader exclusion. */
  def isIndexObject(obj: String): Boolean = obj.startsWith("powa_index_")
}

/** Mutable role state: the powa_role → concrete-principal mapping plus
  * group membership, persisted as one properties file under the registry
  * dir (`_registry/acl.properties`) — single-row config the same way
  * RegistryIo treats server config: never a Spark job.
  */
final class AccessControl(root: Option[String] = None) {
  import AccessControl._

  /** powa_role → concrete role name; starts all-NULL like the seed
    * INSERT (powa--5.2.0.sql:21-28). */
  private var mapping: Map[String, Option[String]] =
    PowaRoles.map(_ -> Option.empty[String]).toMap
  /** principal → granted concrete roles (pg's role membership). */
  private var members: Map[String, Set[String]] = Map.empty

  root.foreach(_ => load())

  private def aclPath = Paths.get(root.get, "_registry", "acl.properties")

  private def persist(): Unit = root.foreach { _ =>
    Files.createDirectories(aclPath.getParent)
    val lines =
      mapping.toSeq.sortBy(_._1).map { case (k, v) =>
        s"role.$k=${v.getOrElse("")}" } ++
      members.toSeq.sortBy(_._1).map { case (p, rs) =>
        s"member.$p=${rs.toSeq.sorted.mkString(",")}" }
    val tmp = aclPath.resolveSibling(".acl.properties.tmp")
    Files.write(tmp, lines.asJava)
    Files.move(tmp, aclPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def load(): Unit = root.foreach { _ =>
    if (Files.isRegularFile(aclPath)) {
      val lines = Files.readAllLines(aclPath).asScala
      lines.foreach { l =>
        l.split("=", 2) match {
          case Array(k, v) if k.startsWith("role.") =>
            val role = k.stripPrefix("role.")
            if (mapping.contains(role))
              mapping += role -> (if (v.isEmpty) None else Some(v))
          case Array(k, v) if k.startsWith("member.") =>
            members += k.stripPrefix("member.") ->
              v.split(",").filter(_.nonEmpty).toSet
          case _ =>
        }
      }
    }
  }

  def roleFor(powaRole: String): Option[String] = mapping(powaRole)

  /** setup_powa_roles (powa--5.2.0.sql:30-118). `existing` plays the
    * part of pg_catalog.pg_roles: the principals that already exist in
    * the surrounding catalog, with the attribute flags the reuse path
    * must reject. Create mode (default) requires all six names to be
    * ABSENT from the catalog and registers them; reuse mode requires the
    * current mapping to be all-NULL, every supplied name to already
    * exist, and none of them to be privileged. Ends by granting. */
  def setupRoles(
      existing: Map[String, PrincipalFlags] = Map.empty,
      reuseExistingRole: Boolean = false,
      adminRole: String = PowaAdmin,
      readAllDataRole: String = ReadAllData,
      readAllMetricsRole: String = ReadAllMetrics,
      writeAllDataRole: String = WriteAllData,
      snapshotRole: String = Snapshot,
      signalBackendRole: String = SignalBackend): Unit = {
    val names = Seq(adminRole, readAllDataRole, readAllMetricsRole,
      writeAllDataRole, snapshotRole, signalBackendRole)

    if (reuseExistingRole) {
      // :48-52 — cannot remap once any mapping is set
      if (mapping.values.exists(_.nonEmpty))
        throw new IllegalStateException("Cannot change existing roles")
      // :53-69 — an existing role must be an inert group
      names.flatMap(n => existing.get(n).map(n -> _)).foreach {
        case (n, flags) => flags.privileged.foreach(why =>
          throw new IllegalStateException(s"Existing role $n $why"))
      }
    }

    mapping = Map(
      PowaAdmin -> Some(adminRole),
      ReadAllData -> Some(readAllDataRole),
      ReadAllMetrics -> Some(readAllMetricsRole),
      WriteAllData -> Some(writeAllDataRole),
      Snapshot -> Some(snapshotRole),
      SignalBackend -> Some(signalBackendRole))

    if (reuseExistingRole) {
      // :94-101 — all six must pre-exist
      val missing = names.filterNot(existing.contains)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          "Cannot reuse existing powa roles unless all roles already exist")
    } else {
      // :103-107 — none may pre-exist; "create" them as inert groups
      if (names.exists(existing.contains))
        throw new IllegalStateException("Some roles already exists")
    }
    persist() // the grant matrix is derived, not stored (powa_grant runs
              // on live state) — persisting the mapping is the commit
  }

  /** GRANT role TO principal. */
  def addMember(principal: String, concreteRole: String): Unit = {
    members += principal -> (members.getOrElse(principal, Set.empty) +
      concreteRole)
    persist()
  }

  def removeMember(principal: String, concreteRole: String): Unit = {
    members += principal -> (members.getOrElse(principal, Set.empty) -
      concreteRole)
    persist()
  }

  /** powa_revoke (:7667-7729): drop every pseudo-role ACL — here, the
    * mapping back to all-NULL (the matrix is derived from the mapping,
    * so clearing it IS revoking; membership rows are the user's own
    * extra ACL, which powa_revoke leaves alone by documented intent). */
  def revokeAll(): Unit = {
    mapping = PowaRoles.map(_ -> Option.empty[String]).toMap
    persist()
  }

  /** "May `principal` exercise `privilege` on `obj`?" — membership in a
    * concrete role that a pseudo-role maps to, where that pseudo-role's
    * computed matrix contains the (obj, privilege) row. A principal
    * mapped directly (its name IS a concrete pseudo-role name) needs no
    * membership row. */
  def check(principal: String, privilege: String, obj: String,
      specs: Seq[graft.spec.DatasourceSpec] = graft.spec.Specs.all)
      : Boolean = {
    val concrete = members.getOrElse(principal, Set.empty) + principal
    val pseudo = mapping.collect {
      case (p, Some(c)) if concrete(c) => p
    }.toSet
    if (pseudo.isEmpty) false
    else AccessControl.inventory(specs).find(_.name == obj)
      .orElse(if (AccessControl.isIndexObject(obj))
        Some(AccessControl.StoreObject(obj, AccessControl.Table))
      else None)
      .exists(o => AccessControl.grantsFor(o).exists(g =>
        pseudo(g.role) && g.privilege == privilege))
  }
}
