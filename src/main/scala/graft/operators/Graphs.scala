package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics in the Pregel-by-joins style (the shape
  * GraphX/GraphFrames lower to): per-iteration, vertex state joins the
  * edge list on the source key, messages aggregate to the destination,
  * and the new state materializes with its lineage cut. The edge list is
  * the loop invariant — checkpointed ONCE and re-read by every
  * iteration, so a 5-round run over 100 TB of edges pays one edge
  * materialization plus 5 keyed exchanges, never a re-scan of the raw
  * join that produced the edges.
  */
object Graphs {

  /** Damped PageRank, a FIXED `iters` power-iteration rounds (fixed, not
    * convergence-tested, so the result is a deterministic function of
    * the graph — the q126 oracle unrolls the same rounds as CTE layers).
    *
    * Contract: `edges` is a directed edge list; every node reachable as
    * a destination must also have at least one out-edge (no dangling
    * mass — a symmetrized/undirected graph satisfies this by
    * construction; callers with genuinely directed graphs add their own
    * dangling-mass handling). Duplicate edges are collapsed.
    *
    * Scale shape: out-degrees join the edge list once, up front, and the
    * (src, dst, outdeg) relation is localCheckpoint'ed — the per-round
    * cost is one shuffle join of the node-sized rank relation against
    * the edges plus one dst-keyed aggregation; rank lineage is cut each
    * round (the Dedup.nearDupComponents loop idiom), so round r's plan
    * does not replay rounds 1..r-1.
    *
    * Output: (node, pr) with pr 6dp-rounded, one row per node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(deg, Seq("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val residual = (1.0 - damping) / n
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    var i = 0
    while (i < iters) {
      val contrib = e.join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("outdeg")).as("mass"))
      // LEFT join keeps sink-only nodes alive (they receive only the
      // residual) even though the stated contract excludes them — the
      // formulation then degrades gracefully instead of dropping rows.
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(residual) + lit(damping) * coalesce(col("mass"), lit(0.0)))
            .as("pr"))
        .localCheckpoint(true)
      i += 1
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }

  /** Personalized PageRank: the restart mass returns to a SEED set
    * instead of spreading uniformly — graph-proximity relevance from a
    * trusted set, the selection primitive behind "find data like these
    * seeds" (and the sampling heuristic of GraphSAGE-family systems).
    * Same contract and cost shape as [[pageRank]] (checkpointed
    * edge+outdeg invariant, one keyed join + dst aggregation per fixed
    * round, lineage cut each round); seeds outside the node set are
    * ignored (restart normalizes over seeds ∩ nodes).
    *
    * Output: (node, ppr) 6dp-rounded, one row per node.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String, iters: Int,
                           damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"personalizedPageRank: iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(deg, Seq("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val sd = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
      .localCheckpoint(true)
    val ns = sd.count()
    require(ns > 0, "personalizedPageRank: no seed appears in the graph")
    val restart = nodes
      .join(sd.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__s").isNotNull, lit(1.0 / ns)).otherwise(lit(0.0))
          .as("restart"))
      .localCheckpoint(true)
    var pr = restart.select(col("node"), col("restart").as("ppr"))
    var i = 0
    while (i < iters) {
      val contrib = e.join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("ppr") / col("outdeg")).as("mass"))
      pr = restart.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("restart") +
            lit(damping) * coalesce(col("mass"), lit(0.0))).as("ppr"))
        .localCheckpoint(true)
      i += 1
    }
    pr.select(col("node"), round(col("ppr"), 6).as("ppr"))
  }
}
