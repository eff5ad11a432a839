package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) tokenizer learning —
  * the EM sibling of the BPE stack (`Bpe.learnMerges`) and the
  * tokenizer family used by T5/mT5/XLM-R. Same scale discipline:
  *
  *  - the corpus pays ONE census pass (`Bpe.wordCensus`, lineage cut);
  *  - the seed pass explodes code-point substrings of the CENSUS (a
  *    vocabulary-sized relation, never the corpus) into weighted
  *    candidates, selected by a deterministic distributed top-k;
  *  - every EM iteration is one census-scale map (the
  *    `UnigramExpectedCounts` kernel — the piece table rides as plan
  *    literals) into a vocab-sized integer aggregate: per-word
  *    expected counts are 1e-6-quantized BIGINTs BEFORE the shuffle,
  *    so the distributed sum is exact and order-independent — the move
  *    that makes EM refereeable (a distributed double sum is not);
  *  - model state (the piece table) lives on the driver between
  *    iterations, like `learnMerges`' argmax — vocab-sized, bounded.
  *
  * Contract decisions, pinned by the q205 referee gate: symbols are
  * code points; candidate pieces are substrings up to `maxLen`; every
  * single code point is force-kept alive (coverage — real SentencePiece
  * does the same); pruning is by final expected count with ties broken
  * by code-point order (a documented simplification of the
  * likelihood-loss prune; the rule IS the contract, the q201
  * precedent); probabilities are `cnt/total` over exact BIGINT counts.
  *
  * Reference behavior: SentencePiece (Kudo 2018), `kaldi`-style
  * forward-backward; re-derived here from the published algorithm.
  */
object Unigram {

  /** Learn a unigram piece table. `multiVocab` is the number of
    * multi-code-point pieces RETAINED after the final prune (the seed
    * over-provisions 2× and EM attrition + the prune cut it down);
    * every single code point of the corpus survives alongside.
    * Output: (piece, cnt_q) in code-point order, cnt_q the final EM
    * iteration's exact 1e-6-unit expected count.
    */
  def learn(docs: DataFrame, textCol: String, multiVocab: Int = 48,
            maxLen: Int = 3, iters: Int = 2): DataFrame = {
    require(multiVocab >= 1 && maxLen >= 2 && iters >= 1,
      s"learn: bad params ($multiVocab, $maxLen, $iters)")
    val spark = docs.sparkSession
    val census = Checkpoints.cut(Bpe.wordCensus(docs, textCol))

    // Seed: all code-point substrings of census words, weight = word
    // count per occurrence. Census-scale explode, never corpus-scale.
    val subs = census
      .select(col("cnt"), split(col("w"), "").as("cps"))
      .withColumn("n", size(col("cps")))
      .select(col("cnt"), col("cps"), col("n"),
        explode(sequence(lit(0), col("n") - 1)).as("s"))
      .select(col("cnt"), col("cps"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxLen), col("n") - col("s")))).as("len"))
      .select(array_join(slice(col("cps"), col("s") + 1, col("len")), "")
        .as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("weight"))
      .withColumn("n_cp", size(split(col("piece"), "")))
    val singles = subs.filter(col("n_cp") === 1).select("piece", "weight")
    val multis = subs.filter(col("n_cp") > 1)
      .orderBy(col("weight").desc, col("piece"))
      .limit(2 * multiVocab)
      .select("piece", "weight")
    // Model state: vocab-sized collect, the learnMerges discipline.
    var pieces: Array[(String, Long)] = singles.unionAll(multis)
      .orderBy("piece")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singleSet = pieces.map(_._1)
      .filter(p => p.codePointCount(0, p.length) == 1).toSet

    var it = 0
    while (it < iters) {
      val pieceStrs = pieces.map(_._1).toSeq
      val total = pieces.map(_._2).sum
      val probs = pieces.map(_._2.toDouble / total).toSeq
      val agg = census
        .select(graft.expressions.UnigramOps
          .expectedCounts(col("w"), pieceStrs, probs, maxLen).as("ec"),
          col("cnt"))
        .select(explode(col("ec")).as("e"), col("cnt"))
        .select(col("e.idx").as("idx"), (col("e.eq") * col("cnt")).as("weq"))
        .groupBy("idx").agg(sum("weq").as("cnt_q"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      pieces = pieces.zipWithIndex.flatMap { case ((p, _), i) =>
        val c = agg.getOrElse(i, 0L)
        if (singleSet(p)) Some((p, math.max(c, 1L)))
        else if (c > 0L) Some((p, c))
        else None
      }
      it += 1
    }

    // Final prune: singles + top multiVocab multis by expected count.
    val (sng, mlt) = pieces.partition(p => singleSet(p._1))
    val kept = sng ++ mlt
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else Bpe.codePointLess(p1, p2)
      }
      .take(multiVocab)
    val sorted = kept.sortWith((a, b) => Bpe.codePointLess(a._1, b._1))
    val sp = spark
    import sp.implicits._
    sorted.toSeq.toDF("piece", "cnt_q")
  }

  /** Driver-side reference of `learn` over a collected census — the
    * q205 referee (independent implementation, same published
    * algorithm and the same pinned loop order). Loud bound: a GATE
    * tool, not the scale path.
    */
  def learnReference(census: Seq[(String, Long)], multiVocab: Int = 48,
                     maxLen: Int = 3, iters: Int = 2): Seq[(String, Long)] = {
    require(census.size <= 1000000,
      "learnReference is the bounded referee - use learn at scale")
    def cps(w: String): Array[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < w.length) {
        val c = w.codePointAt(i); out += c; i += Character.charCount(c)
      }
      out.toArray
    }
    // Seed.
    val weight = scala.collection.mutable.Map.empty[String, Long]
    census.foreach { case (w, cnt) =>
      val a = cps(w)
      var s = 0
      while (s < a.length) {
        var L = 1
        while (L <= maxLen && s + L <= a.length) {
          val p = new String(a, s, L)
          weight(p) = weight.getOrElse(p, 0L) + cnt
          L += 1
        }
        s += 1
      }
    }
    def isSingle(p: String) = p.codePointCount(0, p.length) == 1
    val seedSingles = weight.filter { case (p, _) => isSingle(p) }.toSeq
    val seedMultis = weight.filter { case (p, _) => !isSingle(p) }.toSeq
      .sortWith { case ((p1, w1), (p2, w2)) =>
        if (w1 != w2) w1 > w2 else Bpe.codePointLess(p1, p2)
      }
      .take(2 * multiVocab)
    var pieces = (seedSingles ++ seedMultis)
      .sortWith((a, b) => Bpe.codePointLess(a._1, b._1)).toArray
    val singleSet = pieces.map(_._1).filter(isSingle).toSet

    var it = 0
    while (it < iters) {
      val total = pieces.map(_._2).sum
      val probs = pieces.map(_._2.toDouble / total)
      val idxOf = new java.util.HashMap[String, Integer]
      pieces.zipWithIndex.foreach { case ((p, _), i) => idxOf.put(p, i) }
      val sums = new Array[Long](pieces.length)
      census.foreach { case (w, cnt) =>
        val a = cps(w)
        val n = a.length
        if (n > 0) {
          def prob(s: Int, L: Int): Double = {
            val idx = idxOf.get(new String(a, s, L))
            if (idx != null) probs(idx)
            else if (L == 1) graft.expressions.UnigramKernel.UnkProb
            else 0.0
          }
          val alpha = new Array[Double](n + 1)
          alpha(0) = 1.0
          for (j <- 1 to n) {
            var acc = 0.0
            var L = 1
            while (L <= maxLen && L <= j) {
              val p = prob(j - L, L)
              if (p > 0.0) acc += alpha(j - L) * p
              L += 1
            }
            alpha(j) = acc
          }
          if (alpha(n) > 0.0) {
            val beta = new Array[Double](n + 1)
            beta(n) = 1.0
            for (s <- (n - 1) to 0 by -1) {
              var acc = 0.0
              var L = 1
              while (L <= maxLen && s + L <= n) {
                val p = prob(s, L)
                if (p > 0.0) acc += p * beta(s + L)
                L += 1
              }
              beta(s) = acc
            }
            val e = new Array[Double](pieces.length)
            for (s <- 0 until n) {
              var L = 1
              while (L <= maxLen && s + L <= n) {
                val idx = idxOf.get(new String(a, s, L))
                if (idx != null && probs(idx) > 0.0)
                  e(idx) += alpha(s) * probs(idx) * beta(s + L) / alpha(n)
                L += 1
              }
            }
            for (i <- e.indices if e(i) > 0.0) {
              val q = math.floor(e(i) * 1e6).toLong
              if (q > 0L) sums(i) += q * cnt
            }
          }
        }
      }
      pieces = pieces.zipWithIndex.flatMap { case ((p, _), i) =>
        if (singleSet(p)) Some((p, math.max(sums(i), 1L)))
        else if (sums(i) > 0L) Some((p, sums(i)))
        else None
      }
      it += 1
    }

    val (sng, mlt) = pieces.partition(p => singleSet(p._1))
    (sng ++ mlt.sortWith { case ((p1, c1), (p2, c2)) =>
      if (c1 != c2) c1 > c2 else Bpe.codePointLess(p1, p2)
    }.take(multiVocab))
      .sortWith((a, b) => Bpe.codePointLess(a._1, b._1)).toSeq
  }

  /** Apply a learned piece table: per-doc Viterbi piece counts and
    * fertility, entirely map-side (`UnigramPieceCounts` — the table
    * ships as literals, the corpus never shuffles). The unigram twin
    * of `Bpe.subwordStats`.
    */
  def pieceStats(docs: DataFrame, idCol: String, textCol: String,
                 learned: Seq[(String, Long)], maxLen: Int = 3): DataFrame = {
    val total = learned.map(_._2).sum
    val probs = learned.map(_._2.toDouble / total)
    val counts = graft.expressions.UnigramOps
      .pieceCounts(col(textCol), learned.map(_._1), probs, maxLen)
    val nWords = element_at(counts, 1)
    val nPieces = element_at(counts, 2)
    docs.select(col(idCol),
      nWords.as("n_words"),
      nPieces.as("n_pieces"),
      when(nWords.isNull || nWords === 0, lit(null).cast("double"))
        .otherwise(round(nPieces.cast("double") / nWords, 6)).as("fertility"))
  }

  /** Factory for the q206/q207 referee's word counter: builds the
    * piece-probability map ONCE (the per-word rebuild was the
    * referee's dominant cost on a corpus-sized diff).
    */
  def viterbiCounterReference(learned: Seq[(String, Long)],
                              maxLen: Int = 3): String => Int = {
    val total = learned.map(_._2).sum
    val prob = learned.map { case (p, c) => p -> c.toDouble / total }.toMap
    w => viterbiCount(w, prob, maxLen)
  }

  /** Driver-side Viterbi piece count for one word — the q206/q207
    * referee's kernel (independent implementation, same strict-greater
    * tie rule and length-ascending candidate order).
    */
  def viterbiCountReference(word: String, learned: Seq[(String, Long)],
                            maxLen: Int = 3): Int =
    viterbiCounterReference(learned, maxLen)(word)

  private def viterbiCount(word: String, prob: Map[String, Double],
                           maxLen: Int): Int = {
    val a = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < word.length) {
        val c = word.codePointAt(i); out += c; i += Character.charCount(c)
      }
      out.toArray
    }
    val n = a.length
    if (n == 0) return 0
    val dp = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    dp(0) = 1.0
    for (j <- 1 to n) {
      var best = 0.0
      var bestCnt = 0
      var L = 1
      while (L <= maxLen && L <= j) {
        val s = j - L
        if (dp(s) > 0.0) {
          val piece = new String(a, s, L)
          val p = prob.getOrElse(piece,
            if (L == 1) graft.expressions.UnigramKernel.UnkProb else 0.0)
          if (p > 0.0) {
            val cand = dp(s) * p
            if (cand > best) { best = cand; bestCnt = cnt(s) + 1 }
          }
        }
        L += 1
      }
      dp(j) = best
      cnt(j) = bestCnt
    }
    cnt(n)
  }
}
