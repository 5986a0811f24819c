package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()
}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("coalesce round-trip: explode(collect) == identity") {
    val cur = EventsSource.current(spark, sf)
    val hist = Coalesce.aggregate(cur, EventsSource.spec)
    val back = hist.select(col("srvid"), col("user_id"), col("event_type"),
      explode(col("records")).as("record"))
    assert(back.count() === cur.count())
    assert(back.except(cur).isEmpty && cur.except(back).isEmpty)
  }

  test("coalesce mins/maxs equal per-field min/max of records") {
    val cur = EventsSource.current(spark, sf)
    val hist = Coalesce.aggregate(cur, EventsSource.spec).cache()
    val bad = hist.filter(
      col("mins_in_range.value") =!= array_min(col("records.value")) ||
      col("maxs_in_range.value") =!= array_max(col("records.value")) ||
      col("mins_in_range.ts") =!= col("range_start") ||
      col("maxs_in_range.ts") =!= col("range_end"))
    assert(bad.isEmpty)
  }

  test("records array is ts-ordered") {
    val hist = Coalesce.aggregate(EventsSource.current(spark, sf), EventsSource.spec)
    val bad = hist.filter(
      to_json(col("records.ts")) =!= to_json(array_sort(col("records.ts"))))
    assert(bad.isEmpty)
  }

  test("readback over a split equals plain range filter") {
    val cur = EventsSource.current(spark, sf)
    val split = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    val hist = Coalesce.aggregate(cur.filter(col("record.ts") < split), EventsSource.spec)
    val from = lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
    val to = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val got = Readback.series(cur.filter(col("record.ts") >= split), hist,
      EventsSource.spec, from, to)
    val want = cur.filter(col("record.ts").between(from, to))
    assert(got.count() === want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("delta/rate: zero-interval guard divides by 1") {
    import spark.implicits._
    val rows = Seq(
      (0, 1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (0, 1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 14.0),
      (0, 1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 20.0))
      .toDF("srvid", "user_id", "event_type", "ts", "value")
      .select(col("srvid"), col("user_id"), col("event_type"),
        struct(col("ts"), col("value")).as("record"))
    val out = DeltaRate.withRates(rows, EventsSource.spec)
      .orderBy(col("record.ts"), col("record.value"))
      .select("intvl_sec", "value_delta", "value_per_sec").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 0.0 && out(1).getDouble(2) === 4.0) // /1 guard
    assert(out(2).getDouble(0) === 2.0 && out(2).getDouble(2) === 3.0)
  }

  test("topK keeps k rows per group with dense ordering") {
    val got = TopK.topKPerGroup(Tables.orders(spark, sf),
      Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
    val sizes = got.groupBy("o_orderpriority").count().collect()
    assert(sizes.forall(_.getLong(1) <= 5))
    assert(got.filter(col("rank") > 5).isEmpty)
  }

  test("diff-sync stamps dropped, clears on reappearance, applies rename") {
    import spark.implicits._
    val dim = Seq((1, 10L, "alpha", Option.empty[java.sql.Timestamp]),
                  (1, 11L, "beta", Option.empty[java.sql.Timestamp]))
      .toDF("srvid", "oid", "datname", "dropped")
    val src = Seq((1, 10L, "alpha2"), (1, 12L, "gamma"))
      .toDF("srvid", "oid", "datname")
    val t = lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val out = DiffSync.sync(dim, src, Seq("srvid", "oid"), "datname", "dropped", t)
      .orderBy("oid").collect()
    assert(out.length === 3)
    assert(out(0).getString(2) === "alpha2" && out(0).isNullAt(3)) // renamed
    assert(!out(1).isNullAt(3))                                    // dropped stamped
    assert(out(2).getString(2) === "gamma" && out(2).isNullAt(3))  // new
  }

  test("as-of join: inclusive backward match, left semantics, tolerance") {
    import spark.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val left = Seq(
      (1L, t("2024-01-01 00:10:00"), "l1"), // after r@00:05 -> 50
      (1L, t("2024-01-01 00:05:00"), "l2"), // EQUAL ts -> inclusive match
      (1L, t("2024-01-01 00:01:00"), "l3"), // before any right -> null
      (2L, t("2024-01-01 00:30:00"), "l4")) // other key -> its own series
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 00:05:00"), 50L),
      (1L, t("2024-01-01 00:02:00"), 20L),
      (2L, t("2024-01-01 00:00:00"), 99L))
      .toDF("k", "ts", "price")
    val out = AsofJoin.backward(left, right, Seq("k"), "ts", Seq("price"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getAs[String]("tag"),
        if (r.isNullAt(r.fieldIndex("price"))) -1L else r.getAs[Long]("price")))
    assert(out.toSeq === Seq(("l3", -1L), ("l2", 50L), ("l1", 50L),
      ("l4", 99L)))
    // tolerance: l4 is 30 min after its only match -> nulled at 10 min
    val tol = AsofJoin.backward(left, right, Seq("k"), "ts", Seq("price"),
        toleranceMs = Some(10 * 60 * 1000L))
      .filter(col("tag") === "l4").collect()
    assert(tol.head.isNullAt(tol.head.fieldIndex("price")))
    // and an in-tolerance match survives
    val tolOk = AsofJoin.backward(left, right, Seq("k"), "ts", Seq("price"),
        toleranceMs = Some(10 * 60 * 1000L))
      .filter(col("tag") === "l1").collect()
    assert(tolOk.head.getAs[Long]("price") === 50L)

    // FORWARD: earliest right at or after; inclusive; tolerance ahead
    val fwd = AsofJoin.forward(left, right, Seq("k"), "ts", Seq("price"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getAs[String]("tag"),
        if (r.isNullAt(r.fieldIndex("price"))) -1L else r.getAs[Long]("price")))
    assert(fwd.toSeq === Seq(
      ("l3", 20L),   // next right after 00:01 is 00:02
      ("l2", 50L),   // EQUAL ts -> inclusive forward match
      ("l1", -1L),   // nothing at or after 00:10 for key 1
      ("l4", -1L)))  // key 2's only right is before 00:30
    // forward tolerance: l3's match is 1 min ahead -> survives a 5-min
    // budget, dies under a 30-second one
    def fwdTol(ms: Long) = AsofJoin.forward(left, right, Seq("k"), "ts",
        Seq("price"), toleranceMs = Some(ms))
      .filter(col("tag") === "l3").collect().head
    assert(fwdTol(5 * 60 * 1000L).getAs[Long]("price") === 20L)
    assert(fwdTol(30 * 1000L).isNullAt(
      fwdTol(30 * 1000L).fieldIndex("price")))
  }

  test("salted join is set-identical to the plain join on skewed data") {
    import spark.implicits._
    // one scorching key (4000 rows) among cold ones
    val left = ((1 to 4000).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, 10000L + i))).toDF("k", "lid")
    val right = ((1 to 40).map(i => (7L, 500L + i)) ++
      (1 to 20).map(i => (i.toLong % 5, 900L + i))).toDF("k", "rid")
    val hot = SkewJoin.hotKeys(left, "k", minCount = 100)
    assert(hot.collect().map(_.getLong(0)).toSeq === Seq(7L))
    val salted = SkewJoin.saltedInner(left, right, "k",
      saltBy = col("lid"), salts = 8, hot = hot)
    val plain = left.join(right, Seq("k"))
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // hot probe rows actually scatter across several salt values
    val spread = left.join(hot, Seq("k"))
      .select(pmod(graft.pipeline.Hashing.h60(col("lid").cast("string")),
        lit(8L)).cast("int").as("s"))
      .distinct().count()
    assert(spread >= 6, s"salts used: $spread of 8")
  }

  test("range joins: µs-exact bin math catches the sub-second boundary " +
      "miss; overlap owner-bin emits each pair exactly once") {
    import spark.implicits._
    def t(sec: Long, micro: Long = 0L): java.sql.Timestamp = {
      val x = new java.sql.Timestamp(sec * 1000L)
      x.setNanos((micro * 1000).toInt)
      x
    }
    // the seconds-truncation miss class: interval ends at 7200.000500
    // (bin boundary second), point at 7200.000200 is INSIDE it but its
    // truncated second (7200) bins one past the interval's last
    // seconds-covered bin — µs arithmetic must still find it
    val ivals = Seq((1L, t(3600, 500), t(7200, 500)))
      .toDF("interval_id", "start_ts", "end_ts")
    val pts = Seq((10L, t(7200, 200)), (11L, t(7200, 600)),
      (12L, t(3600, 499))).toDF("event_id", "ts")
    val hits = graft.operators.RangeJoin.pointInInterval(
        pts, "ts", ivals, "start_ts", "end_ts", 3600L, 3600L)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(hits === Set(10L), s"got $hits") // 11 past end, 12 before start
    // inverted interval raises instead of silently vanishing
    intercept[Exception] {
      graft.operators.RangeJoin.pointInInterval(pts, "ts",
        Seq((2L, t(7200), t(3600))).toDF("interval_id", "start_ts", "end_ts"),
        "start_ts", "end_ts", 3600L, 3600L).collect()
    }
    // overlap: pairs spanning MANY shared bins still emit exactly once
    val a = Seq((1L, t(0), t(10800))).toDF("a_id", "a_start", "a_end")
    val b = Seq((2L, t(3600), t(14400)), (3L, t(10800), t(14400)))
      .toDF("b_id", "b_start", "b_end")
    val ov = graft.operators.RangeJoin.intervalOverlap(
        a, "a_start", "a_end", b, "b_start", "b_end", 3600L, 10800L)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // (1,2) overlaps across two shared bins -> once; (1,3) abuts
    // exactly (a_end == b_start, half-open) -> no pair
    assert(ov.toSeq === Seq((1L, 2L)), s"got ${ov.toSeq}")
  }

  test("decayedSum: per-half-life halving, shift cap, loud guards") {
    import spark.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    // key 1: ages 0, 1, 2 half-lives → 100 + 100>>1 + 100>>2 = 175;
    // count decays too: 1 + 0 + 0 = 1 (1>>1 truncates to 0)
    // key 2: one event 100 half-lives old + the anchor — the shift must
    // cap at 63 (Java AND DuckDB mod shift amounts past that), so the
    // stale event contributes 0, not a wrapped-around full weight
    val ev = Seq(
      (1L, t("2024-03-10 00:00:00"), 100L),
      (1L, t("2024-03-09 00:00:00"), 100L),
      (1L, t("2024-03-08 00:00:00"), 100L),
      (2L, t("2024-03-10 00:00:00"), 7L),
      (2L, t("2023-11-21 00:00:00"), 1000000L)
    ).toDF("k", "ts", "v")
    val out = graft.operators.Rolling.decayedSum(ev, Seq("k"), "ts",
        86400L, Seq("dv" -> col("v"), "dn" -> lit(1L)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((175L, 1L)))
    assert(out(2L) === ((7L, 1L)))
    // output-name collision with an input column fails loudly
    intercept[IllegalArgumentException] {
      graft.operators.Rolling.decayedSum(ev, Seq("k"), "ts", 86400L,
        Seq("v" -> col("v")))
    }
    // a negative value raises instead of silently diverging
    intercept[Exception] {
      graft.operators.Rolling.decayedSum(
        Seq((1L, t("2024-03-10 00:00:00"), -5L)).toDF("k", "ts", "v"),
        Seq("k"), "ts", 86400L, Seq("dv" -> col("v"))).collect()
    }
    // a null ts raises instead of silently dropping the row
    intercept[Exception] {
      graft.operators.Rolling.decayedSum(
        Seq((1L, Option.empty[java.sql.Timestamp], 5L))
          .toDF("k", "ts", "v"),
        Seq("k"), "ts", 86400L, Seq("dv" -> col("v"))).collect()
    }
  }
}
