package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In, IsNotNull}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Store
import graft.sources.v2.{StoreFilePartition, StoreLayout, StoreScan, StoreScanBuilder}

/** The DataSource V2 table over the manifest store (StoreV2): row
  * equivalence with Store.read on every layout the store produces, and
  * the planning-time behaviors that are its whole point — srvid
  * pruning before file listing, column pruning into the parquet
  * reader. */
class V2SourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("srvid", IntegerType),
    StructField("ts", TimestampType),
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("recs", ArrayType(StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType)))))))

  private def mk(srvid: Int, n: Int) = {
    spark.range(n).select(lit(srvid).as("srvid"),
      timestamp_seconds(lit(1704067200L) + col("id")).as("ts"),
      col("id").as("k"), concat(lit("x"), col("id")).as("s"),
      array(struct(col("id").as("a"),
        col("id").cast("double").as("b"))).as("recs"))
  }

  private def withStore(f: Store => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_v2spec")
    try f(new Store(spark, root.toString))
    finally {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("readV2 == read on manifest, staging, and bucketed layouts") {
    withStore { store =>
      // manifest-pinned partitions (appendPartition publishes manifests)
      store.appendPartition("dsA", "current", 1, mk(1, 40))
      store.appendPartition("dsA", "current", 1, mk(1, 10)) // batch append
      store.appendPartition("dsA", "current", 2, mk(2, 25))
      // manifest-less hive append (directory-walk fallback)
      store.append("dsA", "staging", mk(3, 15))
      for (tier <- Seq("current", "staging")) {
        val a = store.read("dsA", tier, schema)
        val b = store.readV2("dsA", tier, schema)
        assert(a.schema.fieldNames.toSeq === b.schema.fieldNames.toSeq)
        assert(b.exceptAll(a).count() === 0 && a.exceptAll(b).count() === 0,
          s"tier $tier differs")
      }
      // bucketed history (srvid=N/bucket=YYYY-MM subdirs, no manifest)
      val hSchema = StructType(Seq(
        StructField("srvid", IntegerType),
        StructField("range_start", TimestampType),
        StructField("v", LongType)))
      val h = spark.range(20).select(lit(4).as("srvid"),
        timestamp_seconds(lit(1704067200L) + col("id") * 2862000L)
          .as("range_start"),
        col("id").as("v"))
      store.appendBucketed("dsA", "history", h)
      val ha = store.read("dsA", "history", hSchema)
      val hb = store.readV2("dsA", "history", hSchema)
      assert(hb.exceptAll(ha).count() === 0 && ha.exceptAll(hb).count() === 0)
      assert(hb.count() === 20)
    }
  }

  test("srvid pruning happens at scan planning, before file listing") {
    withStore { store =>
      (1 to 4).foreach(n => store.appendPartition("dsB", "current", n, mk(n, 5)))
      val layout = StoreLayout(store.root, "dsB", "current")
      val builder = new StoreScanBuilder(layout, schema)
      val residual = builder.pushFilters(Array(
        IsNotNull("srvid"), EqualTo("srvid", 3), GreaterThan("k", 1L)))
      // srvid filters consumed (pushed), data filter returned residual
      assert(residual.toSeq === Seq(GreaterThan("k", 1L)))
      assert(builder.pushedFilters().length === 2)
      val scan = builder.build().asInstanceOf[StoreScan]
      assert(scan.prunedSrvids === Seq(3))
      val parts = scan.planInputPartitions()
      assert(parts.nonEmpty &&
        parts.forall(_.asInstanceOf[StoreFilePartition].srvid === 3))
      // In(srvid) form prunes too
      val b2 = new StoreScanBuilder(layout, schema)
      b2.pushFilters(Array(In("srvid", Array(2, 4))))
      assert(b2.build().asInstanceOf[StoreScan].prunedSrvids === Seq(2, 4))
      // end-to-end: pruned read returns exactly partition 3's rows
      val df = store.readV2("dsB", "current", schema)
        .filter(col("srvid") === 3 && col("k") > 1)
      assert(df.count() === 3)
      assert(df.queryExecution.executedPlan.toString.contains("srvids=[3]"))
    }
  }

  test("column pruning reaches the reader; count(*) and empty tier work") {
    withStore { store =>
      store.appendPartition("dsC", "current", 7, mk(7, 12))
      val df = store.readV2("dsC", "current", schema)
      val plan = df.select(sum(col("k"))).queryExecution.executedPlan.toString
      // the scan's description prints the pruned column set
      assert(plan.contains("columns=[k]"), plan)
      assert(df.select(sum(col("k"))).head.getLong(0) === (0 until 12).sum)
      assert(df.count() === 12) // empty required schema (count-star) path
      // sum over srvid only (partition column without data columns)
      assert(df.select(sum(col("srvid"))).head.getLong(0) === 7L * 12)
      // never-written tier reads as an empty, correctly-shaped frame
      val empty = store.readV2("dsC", "history", schema)
      assert(empty.count() === 0)
      assert(empty.schema.fieldNames.head === "srvid")
    }
  }
}
