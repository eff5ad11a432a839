package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge-learning semantics: hand-checked merges, the left-to-right
  * non-overlap rule, deterministic tie-breaks, early exhaustion, and
  * the q194 gate's non-vacuity.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked merges on the classic low/lower corpus") {
    // census: low x5, lower x2, newest x6
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest")).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", numMerges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // pair counts round 1: (l,o)=7, (o,w)=7, (e,s)=6, (s,t)=6,
    // (t,</w>)=6, (n,e)=6, (e,w)=8 ... recount: newest = n e w e s t</w>
    // pairs: (n,e)=6 (e,w)=6 (w,e)=6+2(lower)=8? lower = l o w e r</w>:
    // (w,e)=2 → (w,e)=8. (e,w)=6. (l,o)=7 (o,w)=7.
    // argmax = (w,e) 8.
    assert(got.head._2 === "w" && got.head._3 === "e" && got.head._4 === 8L)
    // reference agrees completely
    val census = Bpe.wordCensus(docs, "text")
      .as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesReference(census, 3)
    assert(got === ref)
  }

  test("merge application is left-to-right non-overlapping; counting is " +
      "per adjacency (overlaps included)") {
    // "aaa</w>": pairs (a,a) at positions 0 AND 1 → count 2 per word, 8
    // total (adjacency counting, the standard BPE rule). After the
    // merge the word is [aa, a, </w>] — the third 'a' stood alone (the
    // non-overlap rule), so round 2 sees (aa,a)=4 and (a,</w>)=4, a
    // TIE broken lexicographically by (left, right): "a" < "aa".
    val docs = Seq((1L, Seq.fill(4)("aaa").mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", numMerges = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got(0) === ((1L, "a", "a", 8L)))
    assert(got(1) === ((2L, "a", Bpe.Eow, 4L)))
  }

  test("exhaustion: learning stops when no pair repeats") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair occurs once → nothing to learn
    assert(Bpe.learnMerges(docs, "text", numMerges = 5).count() === 0L)
    assert(Bpe.learnMergesBatched(docs, "text", numMerges = 5, batch = 3)
      .count() === 0L)
  }

  test("batched hand-walk on the aaa corpus: round 1 takes (a,a) alone " +
      "(every other top candidate touches 'a' or 'aa')") {
    // census: aaa x4 → syms [a,a,a,</w>]. Pairs: (a,a)=8, (a,</w>)=4.
    // batch=2 wants two merges but (a,</w>) collides with the claimed
    // 'a', so round 1 selects ONLY (a,a); round 2 recounts on
    // [aa,a,</w>]: (aa,a)=4, (a,</w>)=4 → tie broken (a,</w>) first
    // ("a" < "aa"), then (aa,a) collides on... nothing? it shares 'a'
    // with (a,</w>) → rejected; so round 2 = [(a,</w>)] alone too.
    val docs = Seq((1L, Seq.fill(4)("aaa").mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.learnMergesBatched(docs, "text", numMerges = 3, batch = 2)
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(got(0) === ((1L, 1L, "a", "a", 8L)))
    assert(got(1) === ((2L, 2L, "a", Bpe.Eow, 4L)))
  }

  test("batched(batch=1) ≡ sequential learnMerges — on the hand fixture " +
      "and on real data") {
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest")).mkString(" "))
    ).toDF("doc_id", "text")
    val seq1 = Bpe.learnMerges(docs, "text", numMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    val bat1 = Bpe.learnMergesBatched(docs, "text", numMerges = 5, batch = 1)
      .as[(Long, Long, String, String, Long)].collect().toSeq
    // with batch = 1 every round holds exactly one merge: round == rank
    assert(bat1.forall(m => m._1 === m._2))
    assert(bat1.map(m => (m._1, m._3, m._4, m._5)) === seq1)
    val d = Tables.load(spark, sfDir, "documents")
    val seqR = Bpe.learnMerges(d, "text", numMerges = 8)
      .as[(Long, String, String, Long)].collect().toSeq
    val batR = Bpe.learnMergesBatched(d, "text", numMerges = 8, batch = 1)
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(batR.map(m => (m._1, m._3, m._4, m._5)) === seqR)
  }

  test("batched selection is symbol-disjoint within each round and " +
      "matches the batched driver reference") {
    val d = Tables.load(spark, sfDir, "documents")
    val got = Bpe.learnMergesBatched(d, "text", numMerges = 12, batch = 4)
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(got.size === 12)
    assert(got.exists(_._2 > 1), "fixture never batched past round 1 — " +
      "the disjointness law below would be vacuous")
    // disjointness within each ACTUAL round (a round may select fewer
    // than `batch` when the candidate prefix runs incompatible)
    got.groupBy(_._2).foreach { case (rd, round) =>
      val syms = round.flatMap(m => Seq(m._3, m._4, m._3 + m._4))
      assert(syms.distinct.size === syms.size,
        s"round $rd shares a symbol: $round")
    }
    val census = Bpe.wordCensus(d, "text")
      .as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesBatchedReference(census, numMerges = 12,
      batch = 4)
    assert(got === ref)
    // batching must still compress the corpus like the sequential table
    def total(ms: Seq[(String, String)]): Long =
      Bpe.subwordStats(d, "doc_id", "text", ms)
        .agg(sum("n_subwords")).as[Long].head()
    assert(total(got.map(m => (m._3, m._4))) < total(Seq.empty))
  }

  test("subwordStats: hand-checked counts, merges genuinely compress, " +
      "null/empty totality") {
    val docs = Seq(
      (1L, Option("low low lower")),
      (2L, Option("")),            // zero words → NULL fertility
      (3L, Option.empty[String])   // NULL text → all NULL
    ).toDF("doc_id", "text")
    // merges: (l,o) then (lo,w): "low" → [low, </w>] (2); "lower" →
    // [low, e, r, </w>] (4)
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = Bpe.subwordStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Double])].collect().toSeq
    assert(got(0) === ((1L, Some(3L), Some(8L), Some(round6(8.0 / 3)))))
    assert(got(1) === ((2L, Some(0L), Some(0L), None)))
    assert(got(2) === ((3L, None, None, None)))
    // on real data, learned merges must compress vs no merges at all
    val d = Tables.load(spark, sfDir, "documents")
    val learned = Bpe.learnMerges(d, "text", numMerges = 12)
      .orderBy("merge_rank")
      .as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    def total(ms: Seq[(String, String)]): Long =
      Bpe.subwordStats(d, "doc_id", "text", ms)
        .agg(sum("n_subwords")).as[Long].head()
    assert(total(learned) < total(Seq.empty),
      "12 learned merges must reduce the corpus subword total")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q194 gate: empty on testdata, non-vacuous (a corrupted reference fires)") {
    val d = Tables.load(spark, sfDir, "documents")
    val learned = Bpe.learnMerges(d, "text", numMerges = 6)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(learned.size === 6, "corpus must support 6 merges")
    val census = Bpe.wordCensus(d, "text").as[(String, Long)].collect().toSeq
    val ref = Bpe.learnMergesReference(census, 6)
    assert(learned === ref)
    // corrupting the reference (swap first two merges) must diff
    val corrupted = ref.updated(0, ref(1)).updated(1, ref(0))
    assert(learned !== corrupted)
  }
}
