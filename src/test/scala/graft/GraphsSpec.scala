package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Graphs

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edges(es: (String, String, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst", "w")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("a uniform cycle is an exact fixed point at 1e6") {
    val e = edges(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    for (iters <- Seq(1, 5)) {
      val r = ranks(Graphs.powerIteration(e, "src", "dst", "w", iters))
      assert(r === Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    }
  }

  test("hand-computed dangling chain: a->b over two iterations") {
    val e = edges(("a", "b", 1L))
    val r1 = ranks(Graphs.powerIteration(e, "src", "dst", "w", 1))
    // r1(a) = 150000 (no in-edges); r1(b) = 150000 + 850000*1e6//1e6
    assert(r1 === Map("a" -> 150000L, "b" -> 1000000L))
    val r2 = ranks(Graphs.powerIteration(e, "src", "dst", "w", 2))
    // r2(b) = 150000 + 850000*150000 // 1e6 = 277500
    assert(r2 === Map("a" -> 150000L, "b" -> 277500L))
  }

  test("a hub out-ranks its leaves, and weights shift mass") {
    val e = edges(("l1", "h", 1L), ("l2", "h", 1L), ("l3", "h", 1L),
      ("h", "l1", 2L), ("h", "l2", 1L), ("h", "l3", 1L))
    val r = ranks(Graphs.powerIteration(e, "src", "dst", "w", 10))
    assert(r("h") > r("l1") && r("h") > r("l2") && r("h") > r("l3"))
    // l1 takes 2/4 of the hub's mass, l2/l3 1/4 each
    assert(r("l1") > r("l2"))
    assert(r("l2") === r("l3"))
  }

  test("random graphs: distributed power iteration equals an " +
      "in-memory integer reference") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val nNodes = 12
      val es = (for (_ <- 1 to 30) yield
        (s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}",
          1L + rnd.nextInt(5))).distinct
      def ref(iters: Int): Map[String, Long] = {
        val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
        val outw = es.groupBy(_._1).map { case (s, g) =>
          s -> g.map(_._3).sum }
        var r = nodes.map(_ -> 1000000L).toMap
        for (_ <- 1 to iters) {
          val contrib = scala.collection.mutable.Map
            .empty[String, Long].withDefaultValue(0L)
          es.foreach { case (s, d, w) =>
            contrib(d) += r(s) * w / outw(s) }
          r = nodes.map(n =>
            n -> (150000L + 850000L * contrib(n) / 1000000L)).toMap
        }
        r
      }
      val got = ranks(Graphs.powerIteration(edges(es: _*),
        "src", "dst", "w", 4))
      assert(got === ref(4), s"trial $trial edges: $es")
    }
  }

  test("non-positive edge weights fail loudly") {
    val e = edges(("a", "b", 0L))
    val ex = intercept[Exception] {
      Graphs.powerIteration(e, "src", "dst", "w", 1).collect()
    }
    assert(ex.getMessage.contains("weight must be >= 1"))
  }
}
