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
  }

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
