package graft

import graft.functions.TopKAggregator
import scala.util.Random

/** Property-style contracts for the custom kernels and the top-k
  * aggregator, over seeded random inputs (deterministic — no flake):
  * the expressions must agree with straightforward Scala reference
  * implementations, and the aggregator must satisfy the algebraic laws
  * partial aggregation relies on (zero identity, split-invariance).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)
  private val trials = 60

  test("JaccardSortedLongs == set-based Jaccard on arbitrary sorted sets") {
    val cases = Seq.fill(trials) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 1000).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 1000).distinct.sorted
      (a, b)
    }.filter { case (a, b) => a.nonEmpty || b.nonEmpty }
    val got = cases.toDF("a", "b")
      .select(graft.expressions.ArrayOps.jaccardSorted($"a", $"b"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      val inter = (a.toSet & b.toSet).size
      assert(g === inter.toDouble / (a.size + b.size - inter), s"a=$a b=$b")
    }
  }

  test("CosineSimilarity == reference fold on arbitrary vectors") {
    val cases = Seq.fill(trials) {
      val n = 1 + rnd.nextInt(32)
      (Seq.fill(n)(rnd.nextDouble() * 20 - 10), Seq.fill(n)(rnd.nextDouble() * 20 - 10))
    }
    val got = cases.toDF("a", "b")
      .select(graft.expressions.ArrayOps.cosineSim($"a", $"b"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expected = dot /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(g - expected) < 1e-9)
    }
  }

  test("ShingleHashSet: sorted, distinct, count bounded by words-n+1") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "ep")
    val cases = Seq.fill(trials) {
      Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val got = cases.toDF("text")
      .select(graft.expressions.TextOps.shingleHashSet($"text", 3).as("h"))
      .as[Seq[Long]].collect()
    cases.zip(got).foreach { case (text, out) =>
      val bound = math.max(1, text.split(" ").length - 2)
      assert(out.nonEmpty && out.length <= bound, s"text=$text")
      assert(out === out.sorted && out.distinct.length === out.length)
    }
  }

  test("TopKAggregator laws: zero identity, split-invariance, true top-k") {
    val agg = new TopKAggregator(5)
    // case-class equality on primitive arrays is referential; compare the
    // finished (id, score) sequences instead.
    def out(b: graft.functions.TopKBuf) = agg.finish(b)
    (1 to trials).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(60))((rnd.nextLong() % 50, rnd.nextDouble() * 10 - 5))
      val all = xs.foldLeft(agg.zero)(agg.reduce)
      assert(out(agg.merge(all, agg.zero)) === out(all))
      assert(out(agg.merge(agg.zero, all)) === out(all))
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(out(merged) === out(all))
      val expected = xs.map { case (id, s) => (s, id) }
        .sortBy { case (s, id) => (-s, id) }.take(5)
        .map { case (s, id) => (id, s) }
      assert(out(all) === expected)
    }
  }


  test("Packing.packGreedy == sequential reference fold on random corpora") {
    // random groups, ids, token counts (some oversize) — the distributed
    // partition-walk must equal a plain sequential fold per group
    for (trial <- 1 to 8) {
      val budget = 1 + rnd.nextInt(40)
      val rows = Seq.fill(40 + rnd.nextInt(120)) {
        (s"g${rnd.nextInt(4)}", rnd.nextLong().abs % 100000,
          1L + rnd.nextInt(2 * budget))
      }.distinctBy(r => (r._1, r._2))
      val got = graft.operators.Packing
        .packGreedy(rows.toDF("grp", "id", "n"), "grp", "id", "n", budget)
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._4).toMap
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var fill = 0L; var seq = 0L
        rs.sortBy(_._2).map { case (_, id, n) =>
          if (seq == 0L || fill + n > budget) { seq += 1; fill = n }
          else fill += n
          (g, id) -> seq
        }
      }
      assert(got === expected, s"trial=$trial budget=$budget")
    }
  }

  test("SQL-function edge contracts: length mismatch and empty-union return null") {
    GraftSession.tune(spark)
    val row = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 2.0d), array(1.0d)) AS c,
        |  dot_product(array(1.0d, 2.0d), array(1.0d)) AS d,
        |  jaccard_sorted(array(), array()) AS j,
        |  jaccard_sorted(array(1L), array()) AS j2""".stripMargin).head()
    assert(row.isNullAt(0), "cosine on mismatched lengths must be null")
    assert(row.isNullAt(1), "dot on mismatched lengths must be null")
    assert(row.isNullAt(2), "jaccard of two empty sets must be null, not NaN")
    assert(row.getDouble(3) === 0.0)
    // bad shingle width fails at analysis time with a clear message
    val ex = intercept[Exception](spark.sql("SELECT shingle_hash_set('a b', 0)"))
    assert(ex.getMessage.contains("n must be >= 1"))
  }

  test("q80 range-frame window == brute-force trailing-24h scan on sf0.001") {
    val evs = Tables.load(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("ts_us"),
        org.apache.spark.sql.functions.col("value"))
      .as[(Long, Long, Long, Double)].collect()
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.map { case (u, id, t, _) =>
        val frame = g.filter(e => e._3 >= t - 86400000000L && e._3 <= t)
        ((u, id), (frame.length.toLong, round6(frame.map(_._4).sum)))
      }
    }.toMap
    val got = SparkEntry.queries("q80_rolling_24h")(spark, sfDir)
      .select("user_id", "event_id", "n_24h", "sum_24h")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === evs.length)
    got.foreach { case (u, id, n, sm) =>
      val (en, esum) = expected((u, id))
      assert(n === en, s"user $u event $id count")
      assert(math.abs(sm - esum) < 1e-6, s"user $u event $id sum")
    }
  }

  test("vec_mean is registered on the SQL surface") {
    GraftSession.tune(spark)
    val m = spark.sql(
      """SELECT g, vec_mean(v) AS m FROM VALUES
        |  (1, array(1.0d, 3.0d)), (1, array(3.0d, 5.0d)) AS t(g, v)
        |GROUP BY g""".stripMargin)
      .head().getSeq[Double](1)
    assert(m === Seq(2.0, 4.0))
  }

  test("pq_encode is registered on the SQL surface with a literal codebook tensor") {
    GraftSession.tune(spark)
    // plain decimal literals (no d-suffix) must work — 0.9 parses as
    // DecimalType and the builder promotes it
    val row = spark.sql(
      """SELECT pq_encode(array(0.9d, 0.1d),
        |  array(array(array(1.0), array(5.0)),
        |        array(array(0.0), array(2.0)))) AS pq""".stripMargin)
      .select("pq.codes", "pq.sq_err").head()
    assert(row.getSeq[Long](0) === Seq(0L, 0L))
    assert(math.abs(row.getDouble(1) - (0.01 + 0.01)) < 1e-12)
    // non-numeric cells and wrong nesting both fail with named errors
    val ex = intercept[Exception](
      spark.sql("SELECT pq_encode(array(1.0d), array(array(array('x'))))"))
    assert(ex.getMessage.contains("pq_encode"))
    val ex2 = intercept[Exception](
      spark.sql("SELECT pq_encode(array(1.0d), array(array(1.0)))"))
    assert(ex2.getMessage.contains("pq_encode")
      && ex2.getMessage.contains("nested array"))
  }

  test("expression constant-folding: literal inputs fold at plan time") {
    val df = spark.range(1)
      .select(graft.expressions.ArrayOps.jaccardSorted(
        org.apache.spark.sql.functions.typedlit(Seq(1L, 2L)),
        org.apache.spark.sql.functions.typedlit(Seq(2L, 3L))).as("j"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("0.3333333333333333"), plan)
  }
}
