package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** PageRank semantics are pinned against closed-form cases (uniform on
  * regular graphs), a literal Scala recompute of the recurrence on a
  * hand fixture, and the probability-mass invariant on the real graph.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("directed 3-cycle: PR stays exactly uniform at every round") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val out = Graphs.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    // outdeg 1 everywhere: pr = 0.15/3 + 0.85*pr = 1/3 is a fixed point
    // from the uniform init, so every round reproduces it exactly.
    assert(out.keySet === Set(0L, 1L, 2L))
    out.values.foreach(v =>
      assert(v === math.rint(1e6 / 3) / 1e6, out.toString))
  }

  test("symmetric star matches a literal Scala recompute of the recurrence") {
    val half = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val e = (half ++ half.map(_.swap)).toDF("src", "dst")
    val out = Graphs.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    // Reference: center outdeg 3, leaves outdeg 1.
    var center = 0.25; var leaf = 0.25
    for (_ <- 1 to 5) {
      val c2 = 0.15 / 4 + 0.85 * (3 * leaf)        // all leaves point at center
      val l2 = 0.15 / 4 + 0.85 * (center / 3)      // center splits 3 ways
      center = c2; leaf = l2
    }
    assert(math.abs(out(0L) - math.rint(center * 1e6) / 1e6) < 1e-9)
    Seq(1L, 2L, 3L).foreach(i =>
      assert(math.abs(out(i) - math.rint(leaf * 1e6) / 1e6) < 1e-9))
  }

  test("probability mass ≈ 1 and runs are deterministic on the sf0.001 graph") {
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
    val l = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), (col("l_suppkey") * 2 + 1).as("dst"))
    val e0 = o.join(l, "o_orderkey").select("src", "dst")
    val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    def run() = Graphs.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val a = run()
    // Symmetrized graph has no dangling mass: Σpr = 1 up to rounding.
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-3, s"mass=${a.map(_._2).sum}")
    assert(a === run(), "pageRank must be deterministic")
  }

  test("dangling (sink-only) nodes are ranked, their mass redistributes, Σpr = 1") {
    // 0↔1 plus 0→2: node 2 has no out-edges. It must appear in the
    // output, and its mass must teleport uniformly each round — not
    // silently vanish (the pre-round-8 behavior dropped the node).
    val e = Seq((0L, 1L), (1L, 0L), (0L, 2L)).toDF("src", "dst")
    val out = Graphs.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(math.abs(out.values.sum - 1.0) < 3e-6, s"mass=${out.values.sum}")
    // Literal recompute: outdeg(0)=2, outdeg(1)=1, node 2 dangling.
    var p = Map(0L -> 1.0 / 3, 1L -> 1.0 / 3, 2L -> 1.0 / 3)
    for (_ <- 1 to 3) {
      val dm = p(2L)
      p = Map(
        0L -> (0.05 + 0.85 * (p(1L) + dm / 3)),
        1L -> (0.05 + 0.85 * (p(0L) / 2 + dm / 3)),
        2L -> (0.05 + 0.85 * (p(0L) / 2 + dm / 3)))
    }
    p.foreach { case (k, v) =>
      assert(math.abs(out(k) - math.rint(v * 1e6) / 1e6) < 1e-9,
        s"node $k: got ${out(k)}, want $v")
    }
    // Personalized variant: dangling mass returns to the seeds; the
    // distribution still sums to 1.
    val pprOut = Graphs.personalizedPageRank(e, "src", "dst",
        Seq(0L).toDF("node"), "node", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pprOut.keySet === Set(0L, 1L, 2L))
    assert(math.abs(pprOut.values.sum - 1.0) < 3e-6, s"mass=${pprOut.values.sum}")
  }

  test("reliable checkpoint dir: results identical to the localCheckpoint fast path") {
    val half = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val e = (half ++ half.map(_.swap)).toDF("src", "dst")
    val local = Graphs.pageRank(e, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = Graphs.pageRank(e, "src", "dst", iters = 5)
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      assert(reliable === local)
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("personalizedPageRank: 2-node recurrence matches a literal recompute; out-of-graph seeds inert") {
    val e = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    // Seed 99 is not in the graph and must not dilute the restart mass.
    val seeds = Seq(0L, 99L).toDF("node")
    val out = Graphs.personalizedPageRank(e, "src", "dst", seeds, "node",
        iters = 5).as[(Long, Double)].collect().toMap
    var p0 = 1.0; var p1 = 0.0 // restart = (1, 0)
    for (_ <- 1 to 5) {
      val n0 = 0.15 * 1.0 + 0.85 * p1
      val n1 = 0.85 * p0
      p0 = n0; p1 = n1
    }
    assert(out(0L) === math.rint(p0 * 1e6) / 1e6, out.toString)
    assert(out(1L) === math.rint(p1 * 1e6) / 1e6, out.toString)
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(e, "src", "dst",
        Seq(99L).toDF("node"), "node", iters = 2)
    }
  }

  test("HITS: hand-computed 2-round integer scores; multiplicity " +
      "endorses; iters guard") {
    // a(0)→x(1), a(0)→y(3), b(2)→x(1):
    //  hub1: a=2 b=1;  auth1: x=3 y=2;  hub2: a=5 b=3;  auth2: x=8 y=5
    val e = Seq((0L, 1L), (0L, 3L), (2L, 1L)).toDF("src", "dst")
    val out = Graphs.hits(e, "src", "dst", iters = 2)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map(("hub", 0L) -> 5L, ("hub", 2L) -> 3L,
      ("auth", 1L) -> 8L, ("auth", 3L) -> 5L))
    // a duplicated edge counts twice (multiplicity is endorsement)
    val e2 = Seq((0L, 1L), (0L, 1L)).toDF("src", "dst")
    val out2 = Graphs.hits(e2, "src", "dst", iters = 1)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out2 === Map(("hub", 0L) -> 2L, ("auth", 1L) -> 4L))
    intercept[IllegalArgumentException] {
      Graphs.hits(e, "src", "dst", iters = 0)
    }
  }

  test("duplicate edges collapse; iters must be >= 1") {
    val e = Seq((0L, 1L), (0L, 1L), (1L, 0L)).toDF("src", "dst")
    val out = Graphs.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    // After dedup this is a symmetric 2-node pair: uniform 1/2 fixed point.
    assert(out.values.forall(v => math.abs(v - 0.5) < 1e-9), out.toString)
    intercept[IllegalArgumentException] {
      Graphs.pageRank(e, "src", "dst", iters = 0)
    }
  }

  test("q290 triangle census: brute-force triangle enumeration and " +
      "LCC match on sf0.001") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"text".isNotNull).select("doc_id").as[Long].collect().toSeq
    val n = docs.size.toLong
    val edges = docs.flatMap { d =>
      (0L to 2L).map(k => (d * 1000003L + k * 7919L + 13L) % n)
        .filter(_ != d).map(t => (math.min(d, t), math.max(d, t)))
    }.distinct.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.keys.toSeq.sorted.map { node =>
      val nb = adj(node)
      val d = nb.size.toLong
      val t = nb.toSeq.combinations(2)
        .count(p => edges.contains(
          (math.min(p(0), p(1)), math.max(p(0), p(1))))).toLong
      val lcc = if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L
      (node, d, t, lcc)
    }
    val got = SparkEntry.queries("q290_triangle_census")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    assert(got.map(_._3).sum % 3 === 0) // each triangle counted thrice
    assert(got.exists(_._3 > 0), "fixture has no triangles — vacuous")
  }

  test("triangleCensus survives a skewed hub (one node on 1/2 of all " +
      "edges) and matches brute force — degree orientation keeps the " +
      "hub out of the wedge-source role") {
    // Hub 0 touches every spoke (degree n); spokes form a ring (degree
    // 3 each). Under id orientation the hub would source C(n,2) wedges
    // in ONE key; degree-oriented, the hub is the HIGH endpoint of
    // every edge and sources zero. Every (hub, i, i+1) closes → n
    // triangles, so the fixture is non-vacuous.
    val n = 300
    val edges = ((1 to n).map(i => (0L, i.toLong)) ++
      (1 to n).map(i => (i.toLong, (i % n + 1).toLong)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = Graphs.triangleCensus(edges.toDF("u", "v"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val edgeSet = edges.toSet
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.keys.toSeq.sorted.map { node =>
      val nb = adj(node); val d = nb.size.toLong
      val t = nb.toSeq.combinations(2).count(p => edgeSet.contains(
        (math.min(p(0), p(1)), math.max(p(0), p(1))))).toLong
      val lcc = if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L
      (node, d, t, lcc)
    }
    assert(got === expected)
    assert(got.find(_._1 === 0L).get._3 === n.toLong,
      "hub must close one triangle per ring edge")
  }

  test("triangleCensus accepts endpoint order both ways and is exact " +
      "on K4 (every node: degree 3, 3 triangles, LCC 1e6)") {
    val k4 = Seq((0L, 1L), (2L, 0L), (0L, 3L), (1L, 2L), (3L, 1L),
      (2L, 3L)).toDF("u", "v")
    val got = Graphs.triangleCensus(k4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === (0L to 3L).map(i => (i, 3L, 3L, 1000000L)))
  }
}
