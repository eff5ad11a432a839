package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenizer kernels — the EM/Viterbi
  * siblings of `BpeSubwordCounts`. Both are once-per-row map-side
  * kernels whose piece table ships as plan LITERALS (the corpus pays
  * only its scan, the model never shuffles), and both follow the
  * repo's exactness discipline for refereed gates:
  *
  *  - words split on single spaces, symbols are Unicode CODE POINTS
  *    (the `split(word, "")` alphabet — see the BPE code-point note);
  *  - all probability arithmetic is linear-domain double with a FIXED
  *    loop order (position ascending, piece length ascending), so the
  *    driver-side reference reproduces every double bit-exactly;
  *  - per-word expected counts leave the kernel QUANTIZED to exact
  *    1e-6 BIGINT units (`floor(e·1e6)`), so the distributed E-step
  *    aggregate is an integer sum — order-independent, which is what
  *    makes EM refereeable at all (a distributed double sum is not).
  *
  * Linear domain is safe here because pieces are per-WORD (≤ a few
  * dozen code points): with piece probabilities ≥ the 1e-9 unknown
  * floor, a word's path mass stays far above double underflow.
  */
private[graft] object UnigramKernel {

  /** Fixed probability for a single code point absent from the piece
    * table — totality for apply-on-unseen-text; never hit by the
    * learn/apply gates (single cps are force-kept in the vocab).
    */
  val UnkProb: Double = 1e-9

  def codePoints(word: String): Array[Int] = {
    val out = new Array[Int](word.codePointCount(0, word.length))
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Forward-backward expected piece counts for one word, quantized.
    * Returns (pieceIdx, floor(e·1e6)) for every piece with e > 0, idx
    * ascending. `idxOf` maps piece string → index, `probs(idx)` its
    * probability. Loop order is THE contract — the driver reference
    * (`Unigram.learnReference`) mirrors it statement for statement.
    */
  def expectedCounts(cps: Array[Int], idxOf: java.util.HashMap[String, Integer],
                     probs: Array[Double], maxLen: Int): Array[(Int, Long)] = {
    val n = cps.length
    if (n == 0) return Array.empty
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var acc = 0.0
      var L = 1
      while (L <= maxLen && L <= j) {
        val s = j - L
        val p = pieceProb(cps, s, L, idxOf, probs)
        if (p > 0.0) acc += alpha(s) * p
        L += 1
      }
      alpha(j) = acc
      j += 1
    }
    val norm = alpha(n)
    if (norm <= 0.0) return Array.empty
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var s = n - 1
    while (s >= 0) {
      var acc = 0.0
      var L = 1
      while (L <= maxLen && s + L <= n) {
        val p = pieceProb(cps, s, L, idxOf, probs)
        if (p > 0.0) acc += p * beta(s + L)
        L += 1
      }
      beta(s) = acc
      s -= 1
    }
    val e = new Array[Double](probs.length)
    s = 0
    while (s < n) {
      var L = 1
      while (L <= maxLen && s + L <= n) {
        val idx = idxOf.get(new String(cps, s, L))
        if (idx != null) {
          val p = probs(idx)
          if (p > 0.0) e(idx) += alpha(s) * p * beta(s + L) / norm
        }
        L += 1
      }
      s += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var i = 0
    while (i < e.length) {
      if (e(i) > 0.0) {
        val q = math.floor(e(i) * 1e6).toLong
        if (q > 0L) out += ((i, q))
      }
      i += 1
    }
    out.toArray
  }

  /** p of the candidate piece cps[s, s+L), with the unknown floor for
    * absent SINGLE code points only (multi-cp absences are simply not
    * pieces).
    */
  private def pieceProb(cps: Array[Int], s: Int, L: Int,
                        idxOf: java.util.HashMap[String, Integer],
                        probs: Array[Double]): Double = {
    val idx = idxOf.get(new String(cps, s, L))
    if (idx != null) probs(idx)
    else if (L == 1) UnkProb
    else 0.0
  }

  /** Viterbi piece count for one word: dp over code-point positions,
    * candidates by length ascending, STRICT improvement — with the
    * fixed order, ties resolve identically everywhere.
    */
  def viterbiPieceCount(cps: Array[Int],
                        idxOf: java.util.HashMap[String, Integer],
                        probs: Array[Double], maxLen: Int): Int = {
    val n = cps.length
    if (n == 0) return 0
    val dp = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    dp(0) = 1.0
    var j = 1
    while (j <= n) {
      var best = 0.0
      var bestCnt = 0
      var L = 1
      while (L <= maxLen && L <= j) {
        val s = j - L
        if (dp(s) > 0.0) {
          val p = pieceProb(cps, s, L, idxOf, probs)
          if (p > 0.0) {
            val cand = dp(s) * p
            if (cand > best) { best = cand; bestCnt = cnt(s) + 1 }
          }
        }
        L += 1
      }
      dp(j) = best
      cnt(j) = bestCnt
      j += 1
    }
    cnt(n)
  }

  def buildIndex(pieces: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.size * 2)
    var i = 0
    pieces.foreach { p => m.put(p, i); i += 1 }
    m
  }
}

/** Per-WORD quantized expected piece counts against a literal piece
  * table — the distributed E-step's map side (runs over the word
  * CENSUS, so each distinct word pays the forward-backward once; the
  * caller scales by the word's count and integer-sums).
  *
  * Output: array<struct<idx:int, eq:bigint>>; NULL word → NULL.
  */
case class UnigramExpectedCounts(child: Expression, pieces: Seq[String],
                                 probs: Seq[Double], maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("idx", IntegerType, nullable = false),
      StructField("eq", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "unigram_expected_counts"

  @transient private lazy val idxOf = UnigramKernel.buildIndex(pieces)
  @transient private lazy val probArr = probs.toArray

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val rows = UnigramKernel
      .expectedCounts(UnigramKernel.codePoints(w), idxOf, probArr, maxLen)
      .map { case (i, q) => InternalRow(i, q) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-DOCUMENT Viterbi piece accounting against a literal piece table
  * — the tokenize-apply hot path (unigram twin of `BpeSubwordCounts`):
  * one imperative pass, words split on single spaces, empties skipped.
  *
  * Output: [n_words, n_pieces] (long array); NULL text → NULL.
  */
case class UnigramPieceCounts(child: Expression, pieces: Seq[String],
                              probs: Seq[Double], maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_piece_counts"

  @transient private lazy val idxOf = UnigramKernel.buildIndex(pieces)
  @transient private lazy val probArr = probs.toArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var nWords = 0L
    var nPieces = 0L
    var start = 0
    var i = 0
    val tLen = text.length
    while (i <= tLen) {
      if (i == tLen || text.charAt(i) == ' ') {
        if (i > start) {
          nWords += 1
          nPieces += UnigramKernel.viterbiPieceCount(
            UnigramKernel.codePoints(text.substring(start, i)),
            idxOf, probArr, maxLen)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array(nWords, nPieces))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramOps {
  def expectedCounts(word: Column, pieces: Seq[String], probs: Seq[Double],
                     maxLen: Int): Column =
    ColumnBridge.column(UnigramExpectedCounts(
      ColumnBridge.expression(word), pieces, probs, maxLen))

  def pieceCounts(text: Column, pieces: Seq[String], probs: Seq[Double],
                  maxLen: Int): Column =
    ColumnBridge.column(UnigramPieceCounts(
      ColumnBridge.expression(text), pieces, probs, maxLen))
}
