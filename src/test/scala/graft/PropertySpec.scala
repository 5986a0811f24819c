package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Registry, ServerConfig}
import graft.operators.{Coalesce, DeltaRate}

/** Property tests from the SURVEY.md §5 plan: coalesce round-trip and
  * min/max invariants over generated series, diff/rate algebra guards,
  * and the dbnames activation algebra. Uses seeded ScalaCheck generators
  * directly (the scalatest bridge isn't on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator failed for seed $i")))
    }

  private val seriesGen: Gen[List[(Int, Long, String, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      srvid <- Gen.choose(0, 2)
      user <- Gen.choose(0L, 5L)
      et <- Gen.oneOf("a", "b")
      tsOff <- Gen.choose(0L, 1000000L)
      v <- Gen.choose(-1000.0, 1000.0)
    } yield (srvid, user, et, tsOff, v))

  private def toCurrent(rows: List[(Int, Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("srvid", "user_id", "event_type", "off", "value")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + col("off") * 1000000L))
      .select(col("srvid"), col("user_id"), col("event_type"),
        struct(col("ts"), col("value")).as("record"))
  }

  test("coalesce: explode(collect) == identity and min/max invariants hold") {
    forAllSeeded(seriesGen, 5) { rows =>
      val cur = toCurrent(rows)
      val hist = Coalesce.aggregate(cur, EventsSource.spec).cache()
      val back = hist.select(col("srvid"), col("user_id"), col("event_type"),
        explode(col("records")).as("record"))
      assert(back.count() === cur.count())
      assert(back.except(cur).isEmpty && cur.except(back).isEmpty)
      val bad = hist.filter(
        col("mins_in_range.value") =!= array_min(col("records.value")) ||
        col("maxs_in_range.value") =!= array_max(col("records.value")) ||
        col("range_start") > col("range_end"))
      assert(bad.isEmpty)
      hist.unpersist()
    }
  }

  test("delta/rate: delta/sec algebra with the zero-interval guard") {
    forAllSeeded(seriesGen, 5) { rows =>
      val out = DeltaRate.withRates(toCurrent(rows), EventsSource.spec)
        .select("intvl_sec", "value_delta", "value_per_sec").collect()
      out.foreach { r =>
        if (!r.isNullAt(0)) {
          val (sec, delta, rate) =
            (r.getDouble(0), r.getDouble(1), r.getDouble(2))
          assert(sec >= 0.0)
          val div = if (sec == 0.0) 1.0 else sec
          assert(rate === delta / div)
        }
      }
    }
  }

  test("configure-server json patch: whitelist + constraint enforcement") {
    val r = new Registry
    val s = r.registerServer(ServerConfig(id = 9, hostname = "h"))
    r.configureServerJson(s, Map("frequency" -> "600", "retention" -> "7200"))
    assert(r.server(s).frequencySec === 600)
    assert(r.server(s).retentionSec === 7200L)
    // unknown field raises (02_remote_api.sql json-patch errors)
    intercept[IllegalArgumentException](
      r.configureServerJson(s, Map("nope" -> "1")))
    // CHECK constraints still apply through the patch path
    intercept[IllegalArgumentException](
      r.configureServerJson(s, Map("frequency" -> "3")))
    intercept[IllegalArgumentException](
      r.configureServerJson(s, Map("powa_coalesce" -> "2")))
  }

  test("dbnames algebra: the sql/03_db_module.sql transition script") {
    val r = new Registry
    val s = r.registerServer(ServerConfig(id = 7, hostname = "h"))
    val m = "pg_stat_user_functions"
    import r.{DbAll, DbNames, DbDisabled}

    // default all-db config
    r.activateDbModule(s, m)
    assert(r.dbModuleState(s, m) === Some(DbAll))
    // can't deactivate a specific db on an "all databases" config
    intercept[IllegalStateException](
      r.deactivateDbModule(s, m, Some(Seq("test"))))
    // activating a specific db on an all-db config switches to that db only
    r.activateDbModule(s, m, Some(Seq("d1")))
    assert(r.dbModuleState(s, m) === Some(DbNames(Vector("d1"))))
    // activating a specific db on a specific-db config REPLACES it (:2443)
    r.activateDbModule(s, m, Some(Seq("d2")))
    assert(r.dbModuleState(s, m) === Some(DbNames(Vector("d2"))))
    // deactivating without a list switches back to all-db, disabled
    r.deactivateDbModule(s, m)
    assert(r.dbModuleState(s, m) === Some(DbDisabled))
    assert(!r.isDbModuleEnabled(s, m, "d2"))
    // activating with multiple dbs re-enables with exactly those
    r.activateDbModule(s, m, Some(Seq("d1", "d3", "d4")))
    assert(r.dbModuleState(s, m) === Some(DbNames(Vector("d1", "d3", "d4"))))
    // deactivating a specific db just removes it (EXCEPT, :2540-2545)
    r.deactivateDbModule(s, m, Some(Seq("d3")))
    assert(r.dbModuleState(s, m) === Some(DbNames(Vector("d1", "d4"))))
    // can't deactivate a db that isn't activated
    intercept[IllegalStateException](
      r.deactivateDbModule(s, m, Some(Seq("d3"))))
    // deactivating all remaining dbs flips to disabled
    r.deactivateDbModule(s, m, Some(Seq("d1", "d4")))
    assert(r.dbModuleState(s, m) === Some(DbDisabled))
    // deactivating a deactivated module is a noop
    r.deactivateDbModule(s, m, Some(Seq("d1", "d4")))
    assert(r.dbModuleState(s, m) === Some(DbDisabled))
    // deactivating an unconfigured module isn't supported
    intercept[IllegalStateException](
      r.deactivateDbModule(s, "pg_stat_all_indexes"))
  }
}
