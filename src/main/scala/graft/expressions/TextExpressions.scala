package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text kernels. These are map-side, once-per-row ops (not
  * per-pair), so interpreted eval with tight Java loops is plenty —
  * what they eliminate is the interpreted higher-order-function chains
  * (transform → concat_ws → element_at → xxhash64 per shingle, 64
  * array traversals per MinHash signature, explode + 64-column
  * aggregate for SimHash) that dominated the dedup queries' input
  * stages.
  */

/** Sorted distinct 64-bit shingle-hash set computed straight from the
  * text bytes: tokenize on single spaces, hash each n-word window's
  * byte range with xxHash64(seed=42) — bit-identical to
  * `xxhash64(concat_ws(" ", w_i..w_{i+n-1}))` on single-spaced text, so
  * it composes with the `functions.xxhash64`-based formulations and
  * tests. Docs shorter than n words collapse to one whole-text hash.
  */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  // analysis-time failure: shingle_hash_set(text, 0) would otherwise index
  // starts(g+n) out of bounds row-by-row at runtime
  require(n >= 1, s"shingle_hash_set: n must be >= 1, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // Word start offsets (single-space separated, like split(text, ' ')).
    var nWords = if (len == 0) 0 else 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') nWords += 1
      i += 1
    }
    if (nWords < n) {
      new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    } else {
      val starts = new Array[Int](nWords)
      var w = 1; i = 0; starts(0) = 0
      while (i < len) {
        if (s.getByte(i) == ' ') { starts(w) = i + 1; w += 1 }
        i += 1
      }
      val count = nWords - n + 1
      val hashes = new Array[Long](count)
      var g = 0
      while (g < count) {
        val from = starts(g)
        val until = if (g + n < nWords) starts(g + n) - 1 else len
        hashes(g) = XXH64.hashUnsafeBytes(base, off + from, until - from, 42L)
        g += 1
      }
      java.util.Arrays.sort(hashes)
      // in-place dedup of the sorted array
      var out = 0; var k = 0
      while (k < count) {
        if (k == 0 || hashes(k) != hashes(k - 1)) { hashes(out) = hashes(k); out += 1 }
        k += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a shingle-hash array: per permutation j,
  * min over hashes of (a_j*h + b_j) with wrapping 64-bit arithmetic.
  * One fused pass (numPerm × |hashes| multiplies, no allocation)
  * replacing numPerm interpreted `transform`+`array_min` traversals.
  * The (a, b) sequence is drawn from Random(seed) exactly like
  * TextFunctions.minhashSignature, so signatures are interchangeable.
  */
case class MinHashSignature(child: Expression, numPerm: Int, seed: Long = 42L)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPerm)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val sig = new Array[Long](numPerm)
    var j = 0
    while (j < numPerm) {
      val (a, b) = perms(j)
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = hs.getLong(i) * a + b
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash from a shingle-hash array in one pass: signed bit
  * votes per position, folded to a long. Replaces the explode +
  * 64-column aggregate formulation — the whole fingerprint becomes a
  * map-side projection with NO shuffle, which is the difference between
  * one scan and an exchange of |corpus|×|shingles| rows at 100 TB.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) fp |= (1L << k)
      k += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass marker-word counter for N marker sets at once. Returns
  * `array<bigint>` with one count per set: the number of maximal
  * \w-runs ([A-Za-z0-9_]+, ASCII — the default \b alphabet of both the
  * JVM and RE2 regex engines) in `lower(text)` that exactly equal a
  * marker. For plain lowercase \w+ markers this is exactly
  * `size(regexp_extract_all(lower(text), '\b(m1|m2|…)\b', 0))`: the
  * trailing \b forces every alternation match to cover a full word-run,
  * so counting run-equality and counting non-overlapping regex matches
  * coincide. Replaces one interpreted alternation-regex scan PER SET
  * (4 full regex passes per document in language-ID) with a single
  * tight byte loop — this was 22% of the round-1 bench on its own.
  */
case class MarkerHits(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  require(markerSets.nonEmpty && markerSets.forall(_.nonEmpty) &&
    markerSets.flatten.forall(_.matches("[a-z0-9_]+")),
    s"markers must be non-empty plain lowercase \\w+ words, got: " +
      markerSets.map(_.mkString(",")).mkString("; "))

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "marker_hits"

  @transient private lazy val maxLen: Int = markerSets.flatten.map(_.length).max

  /** Markers bucketed by byte length; each entry is (utf8 bytes, the set
    * indices to credit on a hit). Duplicated words across sets share one
    * entry so each run is compared at most once per candidate.
    */
  @transient private lazy val byLen: Array[Array[(Array[Byte], Array[Int])]] = {
    val grouped = markerSets.zipWithIndex
      .flatMap { case (set, si) => set.distinct.map(w => (w, si)) }
      .groupBy(_._1)
      .map { case (w, ps) => (w.getBytes("UTF-8"), ps.map(_._2).distinct.sorted.toArray) }
      .toSeq
    val out = Array.fill(maxLen + 1)(Array.empty[(Array[Byte], Array[Int])])
    grouped.groupBy(_._1.length).foreach { case (l, ms) => out(l) = ms.toArray }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase
    val len = s.numBytes()
    val counts = new Array[Long](markerSets.length)
    var i = 0
    var runStart = -1
    while (i <= len) {
      val isWord = i < len && {
        val b = s.getByte(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
          (b >= 'A' && b <= 'Z') || b == '_'
      }
      if (isWord) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        val runLen = i - runStart
        if (runLen <= maxLen) {
          val cands = byLen(runLen)
          var c = 0
          while (c < cands.length) {
            val mb = cands(c)._1
            var k = 0
            var ok = true
            while (ok && k < runLen) {
              if (s.getByte(runStart + k) != mb(k)) ok = false
              k += 1
            }
            if (ok) {
              val idxs = cands(c)._2
              var j = 0
              while (j < idxs.length) { counts(idxs(j)) += 1; j += 1 }
              c = cands.length // a run equals at most one marker word
            } else c += 1
          }
        }
        runStart = -1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-style pre-tokenization segment count in one byte pass: the number
  * of maximal [a-z] runs, maximal [0-9] runs, and single non-[a-z0-9 ]
  * CHARACTERS in `lower(text)` — exactly
  * `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))`
  * (greedy alternation ⇒ maximal runs; the third alternative consumes
  * one character per match). Multi-byte UTF-8 characters count once:
  * continuation bytes (10xxxxxx) are skipped. Replaces the interpreted
  * regex scan that dominated the token-stats query.
  */
case class SubwordCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase
    val len = s.numBytes()
    var count = 0L
    var i = 0
    var run = 0 // 0 = none, 1 = letters, 2 = digits
    while (i < len) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') {
        if (run != 1) { count += 1; run = 1 }
      } else if (b >= '0' && b <= '9') {
        if (run != 2) { count += 1; run = 2 }
      } else {
        run = 0
        // every non-space character is one segment; count UTF-8 lead
        // bytes only ((b & 0xC0) != 0x80) so é is one, not two
        if (b != ' ' && (b & 0xC0) != 0x80) count += 1
      }
      i += 1
    }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher-style repetition metrics in one pass over the text bytes:
  * returns `array<double>` [dup_word_frac, top_bigram_frac] where
  *  - dup_word_frac = (n_words - n_distinct_words) / n_words,
  *  - top_bigram_frac = (occurrences of the most frequent word 2-gram)
  *    / (n_words - 1), 0.0 for docs under two words.
  * Word splitting follows `string_split(text, ' ')` exactly (empty text
  * is ONE empty word, a trailing space yields a trailing empty word) so
  * the DuckDB oracle is bit-comparable. Computing this with built-ins
  * would be either a corpus-wide explode + two shuffled aggregations
  * (per-gram rows exchanged for every document — the anti-pattern at
  * scale) or a quadratic transform/filter chain per row; here it is one
  * map-side projection, O(n log n) per document, no shuffle.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // string_split semantics: k separators → k+1 words, empties included.
    var nWords = 1
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') nWords += 1
      i += 1
    }
    // starts(k) = first byte of word k; sentinel start makes word k span
    // [starts(k), starts(k+1) - 1) for every k including the last.
    val starts = new Array[Int](nWords + 1)
    var w = 1; i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = len + 1

    val wordHashes = new Array[Long](nWords)
    var k = 0
    while (k < nWords) {
      val from = starts(k)
      wordHashes(k) = XXH64.hashUnsafeBytes(base, off + from, starts(k + 1) - 1 - from, 42L)
      k += 1
    }
    java.util.Arrays.sort(wordHashes)
    var distinct = 0; k = 0
    while (k < nWords) {
      if (k == 0 || wordHashes(k) != wordHashes(k - 1)) distinct += 1
      k += 1
    }
    val dupFrac = (nWords - distinct).toDouble / nWords

    var topFrac = 0.0
    if (nWords >= 2) {
      val bigrams = new Array[Long](nWords - 1)
      k = 0
      while (k < nWords - 1) {
        val from = starts(k)
        bigrams(k) = XXH64.hashUnsafeBytes(base, off + from, starts(k + 2) - 1 - from, 42L)
        k += 1
      }
      java.util.Arrays.sort(bigrams)
      var maxRun = 1; var run = 1; k = 1
      while (k < bigrams.length) {
        if (bigrams(k) == bigrams(k - 1)) { run += 1; if (run > maxRun) maxRun = run }
        else run = 1
        k += 1
      }
      topFrac = maxRun.toDouble / (nWords - 1)
    }
    new GenericArrayData(Array(dupFrac, topFrac))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling-hash fingerprint: acc = (acc*31 + codepoint) mod
  * 1e9+7 over the string's characters — same recurrence as the SQL
  * `aggregate(transform(...))` formulation and the DuckDB oracle, in one
  * loop instead of two materialized intermediate arrays per row.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunking (the Rabin/FastCDC family): boundaries
  * where the W-codepoint rolling Rabin-Karp hash (base 31, mod 1e9+7 —
  * the `RollingFingerprint` constants) satisfies `h % mask == 0`, so a
  * byte inserted early in a document shifts every later FIXED chunk but
  * leaves content-defined boundaries downstream of the edit aligned —
  * the property that makes sub-document dedup shift-robust. One
  * codepoint pass per row: the window hash rolls incrementally
  * (subtract c_out·B^W, add c_in), boundaries collect, then each
  * chunk's content fingerprint is the same polynomial recurrence over
  * its own span. Output: array of (chunk_no, c_start, c_len, fp),
  * 1-based codepoint offsets — exactly the relation the q132 DuckDB
  * oracle rebuilds with list_reduce over codepoint slices.
  */
case class CdcChunks(child: Expression, w: Int, mask: Long)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {
  require(w >= 1, s"CdcChunks: w must be >= 1, got $w")
  require(mask >= 1, s"CdcChunks: mask must be >= 1, got $mask")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(new StructType()
    .add("chunk_no", LongType, nullable = false)
    .add("c_start", LongType, nullable = false)
    .add("c_len", LongType, nullable = false)
    .add("fp", LongType, nullable = false), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private val M = 1000000007L
  private val B = 31L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    var bw = 1L
    var j = 0
    while (j < w) { bw = bw * B % M; j += 1 }
    // boundary END positions (1-based), h = hash of the last w codepoints
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * B + cps(i)) % M
      if (i >= w) h = ((h - cps(i - w) * bw) % M + M) % M
      if (i + 1 >= w && h % mask == 0 && i + 1 < n) bounds += (i + 1)
      i += 1
    }
    val starts = 1 +: bounds.map(_ + 1)
    val rows = new Array[Any](starts.length)
    var k = 0
    while (k < starts.length) {
      val st = starts(k)
      val end = if (k + 1 < starts.length) starts(k + 1) - 1 else n
      var fp = 0L
      var p = st - 1
      while (p < end) { fp = (fp * B + cps(p)) % M; p += 1 }
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(
        (k + 1).toLong, st.toLong, (end - st + 1).toLong, fp)
      k += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document BPE subword accounting against a LITERAL merge list —
  * the tokenize-apply hot path (q195/q198/q199). The q195 first draft
  * expressed the merge fold as 12 nested higher-order `aggregate`
  * lambdas; interpreted HOF evaluation with per-element array concat
  * made it ~50 s at sf0.1 — this kernel is the same left-to-right
  * non-overlapping fold (bit-identical to `Bpe.tokenizeReference`) as
  * one imperative pass: ~1 s. Words split on single spaces, empties
  * skipped; each word tokenizes into chars + `</w>`, then the merges
  * apply IN RANK ORDER over a reused string array.
  *
  * Output: [n_words, n_subwords] (long array); NULL text → NULL.
  */
case class BpeSubwordCounts(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_subword_counts"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var nWords = 0L
    var nSub = 0L
    var start = 0
    val tLen = text.length
    // reused scratch: symbols for the current word (chars + </w>)
    var buf = new Array[String](32)
    var i = 0
    while (i <= tLen) {
      if (i == tLen || text.charAt(i) == ' ') {
        val wLen = i - start
        if (wLen > 0) {
          nWords += 1
          // Split by CODE POINTS, not UTF-16 code units — the learner's
          // initialSymbols (Spark split(word, "")) is code-point aware,
          // and tokenize-apply must operate on the same symbol alphabet
          // or non-BMP text (emoji, rare CJK) never matches a merge.
          if (buf.length < wLen + 1) buf = new Array[String](wLen + 1)
          var m = 0
          var j = start
          while (j < i) {
            val cp = text.codePointAt(j)
            buf(m) = new String(Character.toChars(cp))
            m += 1
            j += Character.charCount(cp)
          }
          buf(m) = graft.operators.Bpe.Eow
          m += 1
          // apply merges in rank order, in place (write index w <= read)
          merges.foreach { case (l, r) =>
            var rd = 0; var wr = 0
            while (rd < m) {
              if (rd < m - 1 && buf(rd) == l && buf(rd + 1) == r) {
                buf(wr) = l + r; rd += 2
              } else { buf(wr) = buf(rd); rd += 1 }
              wr += 1
            }
            m = wr
          }
          nSub += m
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array(nWords, nSub))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer — in the JDK, no
  * external dependency): the canonical-composition pass a multilingual
  * pipeline runs BEFORE exact/fuzzy dedup — "café" with a combining
  * acute and "café" precomposed are different byte strings that md5,
  * xxhash64, shingles, and BPE alphabets all treat as different text.
  * Map-side, once per row; NULL → NULL. Gate: q212 vs DuckDB's
  * `nfc_normalize` (two independent NFC implementations agreeing
  * byte-for-byte on planted decomposed text).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed byte-n-gram histogram — the fastText-style feature map for
  * the hashed-linear language classifier (q310): every length-n byte
  * window of the UTF-8 text hashes with xxHash64(seed 42) into one of
  * `buckets` slots; the output is the `buckets`-long count array. ONE
  * tight pass per row (O(len + buckets)), no per-ngram allocation —
  * the HOF restatement (transform over sequence + 32 filter scans)
  * would re-walk the text once per bucket. Byte windows (not code
  * points) are the standard langid trick: multi-byte UTF-8 scripts
  * contribute their distinctive lead bytes as features for free.
  * `LangId.hashedNgramHistReference` mirrors this byte-for-byte for
  * the referee.
  */
case class HashedNgramHist(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  require(n >= 1, s"hashed_ngram_hist: n must be >= 1, got $n")
  require(buckets >= 1 && buckets <= 65536,
    s"hashed_ngram_hist: buckets must be in [1, 65536], got $buckets")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_ngram_hist"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    val hist = new Array[Long](buckets)
    var i = 0
    while (i + n <= len) {
      val h = XXH64.hashUnsafeBytes(base, off + i, n, 42L)
      hist(java.lang.Math.floorMod(h, buckets.toLong).toInt) += 1L
      i += 1
    }
    new GenericArrayData(hist)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Aho–Corasick multi-PATTERN occurrence counter: one byte pass over
  * `lower(text)` counts every occurrence of every pattern — including
  * occurrences that overlap each other or cross word boundaries (the
  * capability `MarkerHits` deliberately lacks: that kernel is
  * whole-word-exact). This is the blocklist/phrase-scrub kernel at
  * 100 TB — K patterns cost O(len + matches) per row instead of K
  * regex scans — and overlapping hits are counted, so a self-bordered
  * pattern like "aba" scores twice in "ababa" (the spec pins it).
  *
  * Patterns must be non-empty lowercase-ASCII printable strings (byte
  * automaton; case folding happens on the TEXT side via
  * UTF8String.toLowerCase). The automaton (goto over the 256-byte
  * alphabet, BFS failure links, per-node aggregated output lists)
  * builds once per executor from the broadcast pattern list — model
  * state, bounded by Σ|pattern|·256 ints.
  */
case class AhoCorasickCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  require(patterns.nonEmpty &&
    patterns.forall(p => p.nonEmpty && p.forall(c => c >= ' ' && c < 127 &&
      !(c >= 'A' && c <= 'Z'))),
    s"patterns must be non-empty lowercase printable ASCII, got: " +
      patterns.mkString("; "))

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "aho_corasick_counts"

  // (goto, fail, outputs): goto is nodes×256, outputs(n) lists the
  // pattern indices whose match ends at node n (own + failure closure)
  @transient private lazy val automaton
      : (Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    val gotoT = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (gotoT(node)(c) < 0) {
          gotoT(node)(c) = gotoT.length
          gotoT += Array.fill(256)(-1)
          out += Array.empty[Int]
        }
        node = gotoT(node)(c)
      }
      out(node) = out(node) :+ pi
    }
    val n = gotoT.length
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val s = gotoT(0)(c)
      if (s < 0) gotoT(0)(c) = 0
      else { fail(s) = 0; queue.enqueue(s) }
    }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      (0 until 256).foreach { c =>
        val s = gotoT(r)(c)
        if (s >= 0) {
          queue.enqueue(s)
          fail(s) = gotoT(fail(r))(c)
          if (out(fail(s)).nonEmpty) out(s) = out(s) ++ out(fail(s))
        } else gotoT(r)(c) = gotoT(fail(r))(c)
      }
    }
    (gotoT.toArray, fail, out.toArray)
  }

  override def nullSafeEval(input: Any): Any = {
    val (g, _, out) = automaton
    val s = input.asInstanceOf[UTF8String].toLowerCase
    val len = s.numBytes()
    val counts = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    while (i < len) {
      node = g(node)(s.getByte(i) & 0xff)
      val hits = out(node)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextOps {
  private def wrap(e: Expression): Column = ColumnBridge.column(e)

  def ahoCorasickCounts(text: Column, patterns: Seq[String]): Column =
    wrap(AhoCorasickCounts(ColumnBridge.expression(text), patterns))

  def shingleHashSet(text: Column, n: Int): Column =
    wrap(ShingleHashSet(ColumnBridge.expression(text), n))

  def minhashSignature(hashes: Column, numPerm: Int): Column =
    wrap(MinHashSignature(ColumnBridge.expression(hashes), numPerm))

  def simhash64(hashes: Column): Column =
    wrap(SimHash64(ColumnBridge.expression(hashes)))

  def markerHits(text: Column, markerSets: Seq[Seq[String]]): Column =
    wrap(MarkerHits(ColumnBridge.expression(text), markerSets))

  def subwordCount(text: Column): Column =
    wrap(SubwordCount(ColumnBridge.expression(text)))

  def repetitionStats(text: Column): Column =
    wrap(RepetitionStats(ColumnBridge.expression(text)))

  def fingerprint(text: Column): Column =
    wrap(RollingFingerprint(ColumnBridge.expression(text)))

  def cdcChunks(text: Column, w: Int, mask: Long): Column =
    wrap(CdcChunks(ColumnBridge.expression(text), w, mask))

  def bpeSubwordCounts(text: Column, merges: Seq[(String, String)]): Column =
    wrap(BpeSubwordCounts(ColumnBridge.expression(text), merges))

  def nfcNormalize(text: Column): Column =
    wrap(NfcNormalize(ColumnBridge.expression(text)))

  def hashedNgramHist(text: Column, n: Int, buckets: Int): Column =
    wrap(HashedNgramHist(ColumnBridge.expression(text), n, buckets))
}
