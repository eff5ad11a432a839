package graft

import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer semantics: seed/EM/prune
  * determinism against the driver reference, Viterbi behavior on
  * hand-checked words, code-point alphabet on non-BMP text, and the
  * unknown-character fallback. The q205-q207 gates own the full-corpus
  * empty-diffs; this spec pins the properties a diff can't name.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("learn ≡ learnReference on a handmade corpus, and frequent " +
      "substrings win the prune") {
    val docs = Seq(
      (1L, Seq.fill(20)("banana").mkString(" ")),
      (2L, Seq.fill(10)("bandana").mkString(" ")),
      (3L, "nan ban and an")
    ).toDF("doc_id", "text")
    val learned = Unigram.learn(docs, "text", multiVocab = 8,
      maxLen = 3, iters = 2).as[(String, Long)].collect().toSeq
    val census = Bpe.wordCensus(docs, "text")
      .as[(String, Long)].collect().toSeq
    val ref = Unigram.learnReference(census, multiVocab = 8,
      maxLen = 3, iters = 2)
    assert(learned === ref)
    val pieces = learned.map(_._1).toSet
    // every single character survives (coverage contract)
    assert(Set("a", "b", "n", "d").subsetOf(pieces))
    // the dominant substring of banana/bandana-land is in the vocab
    assert(pieces.exists(p => p.length > 1 && p.contains("an")),
      s"expected a multi-cp 'an'-family piece in $pieces")
  }

  test("Viterbi prefers high-probability long pieces and counts " +
      "fewer pieces than characters on patterned text") {
    val docs = Seq((1L, Seq.fill(30)("abcabc").mkString(" ")))
      .toDF("doc_id", "text")
    val learned = Unigram.learn(docs, "text", multiVocab = 6,
      maxLen = 3, iters = 2).as[(String, Long)].collect().toSeq
    val stats = Unigram.pieceStats(docs, "doc_id", "text", learned)
      .as[(Long, Long, Long, Double)].collect().head
    assert(stats._2 === 30L)
    // 6 chars per word; a learned 'abc'-grade piece must compress
    assert(stats._3 < 30L * 6,
      s"Viterbi produced char-level segmentation: $stats")
    // kernel ≡ driver reference per word
    val perWord = Unigram.viterbiCountReference("abcabc", learned)
    assert(stats._3 === 30L * perWord)
  }

  test("code-point alphabet: non-BMP emoji are single symbols, not " +
      "surrogate halves") {
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, Seq.fill(8)(emoji + "ab").mkString(" ")))
      .toDF("doc_id", "text")
    val learned = Unigram.learn(docs, "text", multiVocab = 4,
      maxLen = 3, iters = 1).as[(String, Long)].collect().toSeq
    // the emoji must appear as ONE single-cp piece
    assert(learned.map(_._1).contains(emoji))
    assert(!learned.map(_._1).exists(p =>
      p.length == 1 && Character.isSurrogate(p.charAt(0))),
      s"surrogate halves leaked into the vocab: ${learned.map(_._1)}")
    val census = Bpe.wordCensus(docs, "text")
      .as[(String, Long)].collect().toSeq
    assert(learned === Unigram.learnReference(census, multiVocab = 4,
      maxLen = 3, iters = 1))
  }

  test("unknown single characters segment via the UnkProb floor " +
      "instead of failing") {
    val docs = Seq((1L, "aa aa aa aa")).toDF("doc_id", "text")
    val learned = Unigram.learn(docs, "text", multiVocab = 2,
      maxLen = 2, iters = 1).as[(String, Long)].collect().toSeq
    val unseen = Seq((7L, "aza")).toDF("doc_id", "text")
    val stats = Unigram.pieceStats(unseen, "doc_id", "text", learned)
      .as[(Long, Long, Long, Double)].collect().head
    // 'z' is not in the vocab: a + z(unk) + a = 3 pieces, total
    assert(stats._2 === 1L && stats._3 === 3L)
    assert(Unigram.viterbiCountReference("aza", learned) === 3)
  }

  test("null and empty text are total") {
    val docs = Seq((1L, Some("aa aa")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    val learned = Unigram.learn(docs.filter($"text".isNotNull), "text",
      multiVocab = 1, maxLen = 2, iters = 1)
      .as[(String, Long)].collect().toSeq
    val stats = Unigram.pieceStats(docs, "doc_id", "text", learned)
      .orderBy("doc_id").collect()
    assert(stats(1).isNullAt(1) && stats(1).isNullAt(3))
    assert(stats(2).getLong(1) === 0L && stats(2).isNullAt(3))
  }
}
