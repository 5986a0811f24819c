package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative weighted importance propagation (PageRank-style power
  * iteration) in EXACT INTEGER ARITHMETIC, so every engine computes
  * the same scores bit for bit (float damping walks diverge across
  * libm/summation orders; this one is oracle-replayable).
  *
  * Semantics per iteration, all values ppm-scaled longs:
  *   contrib(u→v) = (r_t(u) · w(u,v)) DIV out(u)     (out = Σ_v w(u,v))
  *   r_{t+1}(v)   = (1e6 − damp) + (damp · Σ_u contrib(u→v)) DIV 1e6
  * starting from r_0 = 1e6 everywhere. Dangling nodes (no out-edges)
  * keep receiving but leak their own mass — the standard simplified
  * treatment; callers who need strict conservation add self-loops.
  *
  * Scale shape: nodes/edges are built once; each iteration is one
  * src-keyed broadcast-or-shuffle join + one dst-keyed aggregate +
  * one node-keyed left join — everything keyed, nothing driver-side,
  * state is the node-sized rank frame (localCheckpoint'd per
  * iteration so a 50-iteration run neither re-plans the chain nor
  * re-executes it). Overflow: rank mass concentrates (a hub fed by N
  * nodes reaches r ≈ 0.85·N·1e6), so every product and the contrib
  * sum ride DECIMAL(38,0); only the final bounded quotients return
  * to int64.
  */
object Graphs {

  /** Power iteration over a weighted edge list `(srcCol, dstCol,
    * weightCol)` (long weights ≥ 1). Returns (node, rank_ppm) for
    * every node appearing as source or destination. */
  def powerIteration(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int, dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPpm >= 0L && dampPpm <= 1000000L,
      s"dampPpm must be in [0, 1e6], got $dampPpm")
    val w = when(col(weightCol).isNull || col(weightCol) < 1L,
        raise_error(lit("powerIteration: edge weight must be >= 1")))
      .otherwise(col(weightCol).cast("long"))
    // materialize the edge frame once: `e` feeds the out-weight
    // aggregate, the pre-partitioned ew build AND the node-set union —
    // without this an expensive upstream (p149 derives edges from a
    // window over the event log) recomputes ~4x before the first
    // iteration starts (guide §1.2)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      w.as("w")).localCheckpoint()
    val out = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // pre-partition the edge frame by src ONCE: localCheckpoint
    // preserves the partitioning, so every iteration's rank join
    // reuses it and only the NODE-sized rank frame moves — without
    // this, each of the N iterations re-shuffles the EDGE frame
    // (edges >> nodes on real graphs; the classic PageRank waste).
    // The contrib aggregate's dst-keyed exchange remains — that one
    // is the transpose and is inherent to the algorithm.
    val ew = e.join(out, "src")
      .repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      // all products ride DECIMAL(38,0) (the ESS/tokenMixture
      // precedent): rank mass CONCENTRATES — a hub fed by N nodes
      // holds r ≈ 0.85·N·1e6, so r·w overflows int64 on real graphs
      // (N=1e6 followers with ~1e7-weight edges already wraps) and a
      // silent wrap would break the exact-integer contract. The final
      // quotients are bounded by total mass, so the BIGINT casts back
      // are safe.
      val contrib = ew.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("CAST(CAST(r AS DECIMAL(38,0)) * w DIV outw AS DECIMAL(38,0))")
            .as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contrib.withColumnRenamed("dst", "node"),
          Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST(${1000000L - dampPpm} + CAST($dampPpm AS " +
            "DECIMAL(38,0)) * COALESCE(contrib, CAST(0 AS DECIMAL(38,0)))" +
            " DIV 1000000 AS BIGINT)").as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_ppm"))
  }
}
