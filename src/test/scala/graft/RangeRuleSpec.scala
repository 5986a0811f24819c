package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BinnedRangeJoinRule

/** The BinnedRangeJoinRule optimizer rewrite: a naive range-predicate
  * join must stop planning as BroadcastNestedLoopJoin and produce the
  * identical row set; conservative gates (equi-conjunct present, rule
  * not installed) must leave plans alone; over-long intervals error
  * loudly instead of exploding.
  */
class RangeRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def points: DataFrame = {
    import spark.implicits._
    (0 until 200).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00")))
      .toDF("pid", "pts")
  }

  private def intervals: DataFrame = {
    import spark.implicits._
    (0 until 24).map(h =>
      (h.toLong, ts(f"2024-01-01 $h%02d:00:00"),
        ts(f"2024-01-01 $h%02d:45:00")))
      .toDF("iid", "lo", "hi")
  }

  private def withRule[T](binSec: Long)(body: => T): T = {
    val prevOpts = spark.experimental.extraOptimizations
    try {
      BinnedRangeJoinRule.install(spark, binSec)
      body
    } finally {
      spark.experimental.extraOptimizations = prevOpts
      spark.conf.unset(BinnedRangeJoinRule.BinConf)
    }
  }

  test("naive range join rewrites to an equi-join with identical rows") {
    val p = points; val i = intervals
    def q = p.join(i, p("pts") >= i("lo") && p("pts") < i("hi"))
      .select("pid", "iid")
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "fixture must be the shape Spark nested-loops")
    withRule(900L) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule must remove the nested loop, plan:\n$plan")
      assert(plan.contains("__graft_bin"), "rewritten join keys on the bin")
      val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rewritten === naive && naive.nonEmpty)
    }
  }

  test("inclusive upper bound and point-on-right orientation both match") {
    val p = points; val i = intervals
    withRule(900L) {
      // point side on the RIGHT of the join, <= upper bound
      def q = i.join(p, p("pts") >= i("lo") && p("pts") <= i("hi"))
        .select("pid", "iid")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = i.join(p,
          p("pts") >= i("lo") && p("pts") <= i("hi"),
          "inner").select("pid", "iid")
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(got === want.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
  }

  test("an equi-conjunct disables the rewrite (Spark hash-joins already)") {
    val p = points.withColumn("k", col("pid") % 4)
    val i = intervals.withColumn("k", col("iid") % 4)
    withRule(900L) {
      val q = p.join(i, p("k") === i("k") &&
        p("pts") >= i("lo") && p("pts") < i("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"),
        s"equi-keyed join must be left alone, plan:\n$plan")
      assert(q.count() > 0)
    }
  }

  test("without install the plan is untouched") {
    val p = points; val i = intervals
    val q = p.join(i, p("pts") >= i("lo") && p("pts") < i("hi"))
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("interval-overlap joins rewrite with the owner-bin rule, " +
      "exactly-once emission") {
    import spark.implicits._
    val a = (0 until 50).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 20}%02d:00:00"),
        ts(f"2024-01-01 ${i % 20}%02d:50:00"))).toDF("aid", "alo", "ahi")
    val b = (0 until 40).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 21}%02d:30:00"),
        ts(f"2024-01-01 ${(i % 21) + 1}%02d:20:00"))).toDF("bid", "blo", "bhi")
    def q = a.join(b, a("alo") < b("bhi") && b("blo") < a("ahi"))
      .select("aid", "bid")
    // the fixture is the BNLJ shape without the rule
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sorted
    withRule(900L) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("__graft_bin"),
        s"overlap must rewrite, plan:\n$plan")
      // SEQ compare (not set): owner-bin must emit each pair exactly
      // once — a duplicate would show here where a set compare hides it
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        .sorted
      assert(got === naive && naive.nonEmpty)
    }
  }

  test("LongType intervals (genomic-coordinate class) rewrite via binWidth") {
    import spark.implicits._
    // reads (points) against gene regions (intervals) on a raw integer
    // axis — no timestamps anywhere
    val reads = (0 until 500).map(i => (i.toLong, (i * 997L) % 100000L))
      .toDF("read_id", "pos")
    val genes = (0 until 60).map(g =>
      (g.toLong, g * 1500L, g * 1500L + 2200L)).toDF("gene_id", "gstart", "gend")
    def q = reads.join(genes,
      reads("pos") >= genes("gstart") && reads("pos") < genes("gend"))
      .select("read_id", "gene_id")
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prevOpts = spark.experimental.extraOptimizations
    try {
      BinnedRangeJoinRule.install(spark, binWidth = 1000L)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("__graft_bin"),
        s"LongType range join must rewrite, plan:\n$plan")
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === naive && naive.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = prevOpts
      spark.conf.unset(BinnedRangeJoinRule.BinWidthConf)
    }
  }

  test("over-long interval raises the span guard") {
    import spark.implicits._
    val p = points
    val i = Seq((1L, ts("2024-01-01 00:00:00"), ts("2029-01-01 00:00:00")))
      .toDF("iid", "lo", "hi")
    withRule(900L) {
      val e = intercept[Exception] {
        p.join(i, p("pts") >= i("lo") && p("pts") < i("hi")).count()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxSpanSeconds")),
        s"got: ${msgs(e)}")
    }
  }
}
