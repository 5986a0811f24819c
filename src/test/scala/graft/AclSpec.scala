package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.AccessControl
import graft.core.AccessControl._

/** The predefined-role ACL surface (powa--5.2.0.sql:13-118 setup_powa_roles,
  * :7533-7655 powa_grant, :7667-7729 powa_revoke) — rule transcription,
  * setup sanity checks, persistence, and the check() enforcement hook.
  */
class AclSpec extends AnyFunSuite {

  private def tmpRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_acl")
    p.toFile.deleteOnExit(); p.toString
  }

  test("grant matrix rules match powa_grant per object kind") {
    val t = grantsFor(StoreObject("powa_statements_history", Table))
    // admin ALL, write DML (no REFERENCES/TRIGGER), snapshot DML (a data
    // table), both readers SELECT
    assert(t.filter(_.role == PowaAdmin).map(_.privilege).toSet ==
      Set("SELECT", "INSERT", "UPDATE", "DELETE", "TRUNCATE",
        "REFERENCES", "TRIGGER"))
    assert(t.filter(_.role == WriteAllData).map(_.privilege).toSet ==
      Set("SELECT", "INSERT", "UPDATE", "DELETE", "TRUNCATE"))
    assert(t.filter(_.role == Snapshot).map(_.privilege).toSet ==
      Set("SELECT", "INSERT", "UPDATE", "DELETE", "TRUNCATE"))
    assert(t.filter(_.role == ReadAllData).map(_.privilege) == Seq("SELECT"))
    assert(t.filter(_.role == ReadAllMetrics).map(_.privilege) ==
      Seq("SELECT"))
    assert(t.filter(_.role == SignalBackend).isEmpty)

    // staging: invisible to BOTH reader roles (:7621-7624)
    val tmp = grantsFor(StoreObject("powa_statements_src_tmp", Table))
    assert(tmp.filter(g => g.role == ReadAllData ||
      g.role == ReadAllMetrics).isEmpty)
    assert(tmp.filter(_.role == Snapshot).map(_.privilege).toSet ==
      Set("SELECT", "INSERT", "UPDATE", "DELETE", "TRUNCATE"))

    // constvalues: data reader yes, metrics reader no (:7625-7631)
    val cv = grantsFor(
      StoreObject("powa_qualstats_constvalues_history", Table))
    assert(cv.filter(_.role == ReadAllData).map(_.privilege) ==
      Seq("SELECT"))
    assert(cv.filter(_.role == ReadAllMetrics).isEmpty)

    // config table: snapshot drops to SELECT-only (:7598-7608)
    val cfgT = grantsFor(StoreObject("powa_servers", Table))
    assert(cfgT.filter(_.role == Snapshot).map(_.privilege) ==
      Seq("SELECT"))

    // sequence: USAGE/SELECT/UPDATE for admin+write, nothing for others
    val sq = grantsFor(StoreObject("powa_servers_id_seq", Sequence))
    assert(sq.filter(_.role == PowaAdmin).map(_.privilege).toSet ==
      Set("USAGE", "SELECT", "UPDATE"))
    assert(sq.filter(_.role == WriteAllData).map(_.privilege).toSet ==
      Set("USAGE", "SELECT", "UPDATE"))
    assert(sq.filter(g => g.role != PowaAdmin &&
      g.role != WriteAllData).isEmpty)

    // view: snapshot + readers SELECT
    val v = grantsFor(StoreObject("powa_functions", View))
    assert(v.filter(_.role == Snapshot).map(_.privilege) == Seq("SELECT"))
    assert(v.filter(_.role == ReadAllData).map(_.privilege) ==
      Seq("SELECT"))
  }

  test("setup sanity checks: create vs reuse modes") {
    // create mode: a pre-existing role name is fatal (:103-107)
    val a = new AccessControl()
    val boom = intercept[IllegalStateException] {
      a.setupRoles(existing = Map("powa_admin" -> PrincipalFlags()))
    }
    assert(boom.getMessage.contains("already exists"))

    // reuse mode: all must exist (:94-101)
    val b = new AccessControl()
    val missing = intercept[IllegalStateException] {
      b.setupRoles(existing = Map("powa_admin" -> PrincipalFlags()),
        reuseExistingRole = true)
    }
    assert(missing.getMessage.contains("unless all roles already exist"))

    // reuse mode: privileged principals rejected (:53-69)
    val c = new AccessControl()
    val priv = intercept[IllegalStateException] {
      c.setupRoles(
        existing = PowaRoles.map(_ -> PrincipalFlags()).toMap +
          ("powa_snapshot" -> PrincipalFlags(canLogin = true)),
        reuseExistingRole = true)
    }
    assert(priv.getMessage.contains("can login"))

    // reuse mode happy path, then remap is fatal (:48-52)
    val d = new AccessControl()
    d.setupRoles(existing = PowaRoles.map(_ -> PrincipalFlags()).toMap,
      reuseExistingRole = true)
    assert(d.roleFor(Snapshot).contains("powa_snapshot"))
    val remap = intercept[IllegalStateException] {
      d.setupRoles(existing = PowaRoles.map(_ -> PrincipalFlags()).toMap,
        reuseExistingRole = true)
    }
    assert(remap.getMessage.contains("Cannot change existing roles"))
  }

  test("mapping and membership persist across reopen; revoke clears") {
    val root = tmpRoot()
    val a = new AccessControl(Some(root))
    a.setupRoles(adminRole = "ops_admins", snapshotRole = "collector")
    a.addMember("alice", "ops_admins")
    a.addMember("bob", "collector")

    val b = new AccessControl(Some(root))
    assert(b.roleFor(PowaAdmin).contains("ops_admins"))
    assert(b.roleFor(Snapshot).contains("collector"))
    // alice is an admin through membership: full power everywhere
    assert(b.check("alice", "TRUNCATE", "powa_statements_history"))
    // bob the collector may write data tiers but only read config
    assert(b.check("bob", "INSERT", "powa_statements_src_tmp"))
    assert(b.check("bob", "SELECT", "powa_servers"))
    assert(!b.check("bob", "INSERT", "powa_servers"))
    // nobody granted: nothing
    assert(!b.check("mallory", "SELECT", "powa_statements_history"))
    // unknown object: nothing
    assert(!b.check("alice", "SELECT", "not_a_powa_table"))

    b.revokeAll()
    val c = new AccessControl(Some(root))
    assert(c.roleFor(PowaAdmin).isEmpty)
    assert(!c.check("alice", "SELECT", "powa_statements_history"))
  }

  test("deleteServer runs registered extension sweeps, spares others") {
    val root = tmpRoot()
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = new graft.core.Engine(spark, root)
    Seq(71, 72).foreach(id => e.registry.registerServer(
      graft.core.ServerConfig(id = id, hostname = s"h$id")))
    Seq(71, 72).foreach { id =>
      Seq((id, s"k$id", 1L)).toDF("srvid", "name", "v")
        .write.parquet(s"$root/ext_settings/srvid=$id")
    }
    e.registerExternalSweep("ext")(
      e.sweepSrvidPartitions(Seq("ext_settings")))
    // store-resident index partitions are per-server data: a deleted
    // server's index goes with it, other tenants' stays (the
    // delete_and_purge contract extended to powa_index_* relations)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(32)
    val cb = emb.select(col("vec_id").cast("long"),
        graft.pipeline.Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    Seq(71, 72).foreach(id => graft.pipeline.Similarity
      .saveIvfIndexStore(emb, "vec_id", "embedding", cb, root, "del", id))
    e.deleteServer(71)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "ext_settings", "srvid=71")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "ext_settings", "srvid=72")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "powa_index_del", "cells", "srvid=71"),
      java.nio.file.LinkOption.NOFOLLOW_LINKS))
    assert(graft.pipeline.Similarity
      .loadIvfIndexStore(spark, root, "del", 72)._1.count() === 32L)
    assert(e.registry.serverIds.sorted == Seq(0, 72)) // 0 = local server
    // a sweep that throws must not block the delete (per-extension
    // guard) — but the failure must be RETURNED (the server's meta row
    // dies with the server, so it is the only surviving surface)
    e.registerExternalSweep("broken")(_ =>
      throw new RuntimeException("ext down"))
    val fails = e.deleteServer(72)
    assert(fails.exists(_.contains("ext down")), fails.mkString(", "))
    assert(e.registry.serverIds == Seq(0))
  }

  test("catalog enforcement: read_all_metrics reads statements history " +
      "but not qualstats constvalues; writes denied; ad-hoc unguarded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = tmpRoot()
    val acl = new AccessControl(Some(root))
    acl.setupRoles(readAllMetricsRole = "metrics_readers")
    acl.addMember("mallory", "metrics_readers")
    val store = new graft.core.Store(spark, root)
    store.appendPartition("powa_qualstats", "constvalues", 1,
      Seq((10L, "x")).toDF("qualid", "constvalues"))
    store.appendPartition("adhoc", "current", 1,
      Seq((1L, "y")).toDF("k", "v"))
    val cat = "graft_acl_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.StoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set("spark.graft.acl.principal", "mallory")
    try {
      // allowed: metrics readers SELECT the statements history tier
      assert(spark.sql(
        s"SELECT * FROM $cat.powa_statements.history").count() === 0L)
      // denied: constvalues carry data values — excluded from
      // read_all_metrics (powa--5.2.0.sql:7612-7617)
      val e = intercept[Throwable] {
        spark.sql(s"SELECT * FROM $cat.powa_qualstats.constvalues").count()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(
        "lacks SELECT on powa_qualstats_constvalues_history_current")),
        s"got: ${messages(e)}")
      // denied: a read-only role may not write any tier
      val w = intercept[Throwable] {
        Seq((11L, "y", 1)).toDF("qualid", "constvalues", "srvid")
          .writeTo(s"$cat.powa_qualstats.constvalues").append()
      }
      assert(messages(w).exists(_.contains("lacks INSERT")),
        s"got: ${messages(w)}")
      // outside the powa inventory: not powa's to guard
      assert(spark.sql(
        s"SELECT * FROM $cat.adhoc.current").count() === 1L)
      // no principal -> open (the engine's own path)
      spark.conf.unset("spark.graft.acl.principal")
      assert(spark.sql(
        s"SELECT * FROM $cat.powa_qualstats.constvalues").count() === 1L)
    } finally {
      spark.conf.unset("spark.graft.acl.principal")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("governed index tiers: powa_index_* relations are guarded at " +
      "the catalog — reader role SELECTs, stranger denied, writes denied") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val root = tmpRoot()
    val acl = new AccessControl(Some(root))
    acl.setupRoles(readAllMetricsRole = "metrics_readers")
    acl.addMember("mallory", "metrics_readers")
    // a real store-resident IVF index (the p156 shape)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = emb.select(col("vec_id").cast("long"),
        graft.pipeline.Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("vec_id") < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    graft.pipeline.Similarity.saveIvfIndexStore(emb, "vec_id",
      "embedding", cb, root, "aclivf", srvid = 1)
    val cat = "graft_acl_idx"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.StoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    try {
      // a metrics reader SELECTs index data (index content derives
      // from corpus data, not constvalues)
      spark.conf.set("spark.graft.acl.principal", "mallory")
      assert(spark.sql(
        s"SELECT * FROM $cat.powa_index_aclivf.cells").count() > 0L)
      // ...but may not WRITE an index tier
      val w = intercept[Throwable] {
        emb.select(col("vec_id").cast("long").as("vec_id"),
            graft.pipeline.Similarity.asDouble(col("embedding")).as("v"),
            (col("vec_id") % 4).cast("long").as("cell"),
            org.apache.spark.sql.functions.lit(1).as("srvid"))
          .writeTo(s"$cat.powa_index_aclivf.cells").append()
      }
      assert(messages(w).exists(_.contains("lacks INSERT")),
        s"got: ${messages(w)}")
      // a principal with no powa role at all is denied the read
      spark.conf.set("spark.graft.acl.principal", "stranger")
      val e = intercept[Throwable] {
        spark.sql(s"SELECT * FROM $cat.powa_index_aclivf.cells").count()
      }
      assert(messages(e).exists(_.contains(
        "lacks SELECT on powa_index_aclivf_cells")),
        s"got: ${messages(e)}")
      // no principal -> open (the engine's own path)
      spark.conf.unset("spark.graft.acl.principal")
      assert(spark.sql(
        s"SELECT * FROM $cat.powa_index_aclivf.codebook").count() === 4L)
    } finally {
      spark.conf.unset("spark.graft.acl.principal")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }
}
