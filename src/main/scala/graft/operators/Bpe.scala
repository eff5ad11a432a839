package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, the
  * subword-tokenizer induction pass every LLM data stack runs once per
  * corpus): starting from characters, repeatedly merge the most
  * frequent adjacent symbol pair, weighted by word frequency.
  *
  * Scale design — the reason BPE is cheap at 100 TB even though it is
  * iterative: the algorithm never looks at the corpus, only at the
  * WORD-FREQUENCY table. The corpus pays exactly ONE pass (the word
  * census, map-side combinable); every merge iteration then runs over
  * the vocabulary-sized (symbols, count) relation — pair counts are a
  * weighted aggregate of adjacent symbol pairs, the argmax is a 1-row
  * bounded collect (count desc, pair asc — fully deterministic
  * tie-break), and the merge application is a map-side fold over each
  * word's symbol array (a higher-order `aggregate`, no UDF). Under
  * Zipf the vocabulary grows sublinearly with the corpus, and the
  * iteration state is one literal (left, right) pair per round.
  *
  * Merge application is the classic LEFT-TO-RIGHT NON-OVERLAPPING
  * rule: in "a a a" with merge (a,a) the first two merge, the third
  * survives alone. Words are space tokens with a `</w>` terminal
  * symbol appended, so merges can capture word endings.
  *
  * Output: (merge_rank 1.., left, right, pair_count) — the merge
  * table a tokenizer ships. `learnMergesReference` is the driver-side
  * restatement used by the q194 empty-diff gate and the spec.
  */
object Bpe {

  /** End-of-word marker (its own symbol, never merged away from the
    * character it follows unless BPE learns that merge).
    */
  val Eow = "</w>"

  /** The per-word symbol array at iteration 0: one symbol per
    * character plus the terminal marker.
    */
  private def initialSymbols(word: Column): Column =
    // Java-regex split with limit -1 appends a trailing "" — drop it
    concat(filter(split(word, ""), s => length(s) > 0), array(lit(Eow)))

  /** Non-overlapping left-to-right merge of adjacent (left, right)
    * into one symbol, as a higher-order fold: state is (out, prev);
    * each step either completes a merge, flushes prev, or starts a
    * new pending symbol; finish flushes the trailing prev.
    */
  private def mergeFold(symbols: Column, left: String, right: String): Column = {
    val merged = left + right
    aggregate(
      symbols,
      struct(array().cast("array<string>").as("out"),
        lit(null).cast("string").as("prev")),
      (st, s) => {
        val out = st.getField("out"); val prev = st.getField("prev")
        when(prev.isNull, struct(out.as("out"), s.as("prev")))
          .when(prev === lit(left) && s === lit(right),
            struct(concat(out, array(lit(merged))).as("out"),
              lit(null).cast("string").as("prev")))
          .otherwise(struct(concat(out, array(prev)).as("out"), s.as("prev")))
      },
      st => when(st.getField("prev").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"), array(st.getField("prev")))))
  }

  /** Word-frequency census — the single corpus-scale pass. */
  def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` BPE merges from the corpus. Each iteration:
    * vocabulary-sized pair aggregate → deterministic 1-row argmax →
    * map-side merge fold. Stops early if no pair occurs twice.
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"learnMerges: numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    var vocab = wordCensus(docs, textCol)
      .select(initialSymbols(col("w")).as("syms"), col("cnt"))
    // model-sized: cut lineage once so iterations do not re-census
    vocab = Checkpoints.cut(vocab)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val best = vocab
        .select(posexplode(col("syms")).as(Seq("p", "s")), col("syms"), col("cnt"))
        .filter(col("p") < size(col("syms")) - 1)
        .select(col("s").as("l"),
          element_at(col("syms"), col("p") + 2).as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < 2) exhausted = true
      else {
        val (l, r, pc) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((l, r, pc))
        vocab = Checkpoints.cut(
          vocab.select(mergeFold(col("syms"), l, r).as("syms"), col("cnt")))
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((l, r, pc), k) => (k + 1L, l, r, pc) }
      .toDF("merge_rank", "left", "right", "pair_count")
  }

  /** Greedy compatible-batch selection shared by the engine and the
    * driver reference: scan candidates in (count desc, left, right)
    * order and accept a pair iff none of {left, right, left+right}
    * collides with a symbol already claimed this round. Merging (a,b)
    * can only change counts of pairs that TOUCH a, b, or the new "ab"
    * symbol — so a symbol-disjoint batch applied in rank order equals
    * each merge applied against the counts it was selected under (the
    * standard batched-BPE compatibility argument).
    */
  private def selectCompatible(cands: Iterator[(String, String, Long)],
      want: Int): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    cands.foreach { case (l, r, pc) =>
      if (sel.size < want && !used(l) && !used(r) && !used(l + r)) {
        sel += ((l, r, pc)); used += l; used += r; used += (l + r)
      }
    }
    sel.toSeq
  }

  /** How deep each round's candidate scan goes: the top 4·batch pairs
    * by (count desc, left, right). Deterministic and mirrored by the
    * reference — the truncation depth is part of the algorithm, not an
    * engine detail, so engine and referee always greedy-scan the SAME
    * prefix of the same total order.
    */
  private def candidateCap(want: Int): Int = 4 * want

  /** Batched BPE merge learning: per round, ONE vocabulary-sized pair
    * aggregate selects up to `batch` mutually-compatible merges
    * (symbol-disjoint — see `selectCompatible`), which all apply in one
    * map-side fold. `learnMerges` pays one driver round-trip (one Spark
    * job) PER MERGE — fine at 12 merges, but a production 50k-merge
    * vocabulary would mean 50k sequential jobs; batching cuts that to
    * ~50k/batch while staying bit-deterministic (every round's
    * selection is a pure function of the pair census). batch = 1
    * reproduces `learnMerges` exactly (BpeSpec law); batch > 1 is the
    * standard batched-BPE approximation — a later in-batch merge is
    * counted under the pre-batch census, which symbol-disjointness
    * keeps valid, though a NEW pair created mid-batch (touching a
    * just-merged symbol) cannot be selected until the next round.
    * Gate: q308 empty-diffs this against `learnMergesBatchedReference`.
    */
  def learnMergesBatched(docs: DataFrame, textCol: String,
      numMerges: Int, batch: Int = 8): DataFrame = {
    require(numMerges >= 1,
      s"learnMergesBatched: numMerges must be >= 1, got $numMerges")
    require(batch >= 1, s"learnMergesBatched: batch must be >= 1, got $batch")
    val spark = docs.sparkSession
    var vocab = Checkpoints.cut(wordCensus(docs, textCol)
      .select(initialSymbols(col("w")).as("syms"), col("cnt")))
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var roundNo = 0L
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      roundNo += 1
      val want = math.min(batch, numMerges - merges.size)
      val top = vocab
        .select(posexplode(col("syms")).as(Seq("p", "s")),
          col("syms"), col("cnt"))
        .filter(col("p") < size(col("syms")) - 1)
        .select(col("s").as("l"),
          element_at(col("syms"), col("p") + 2).as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("pc"))
        .filter(col("pc") >= 2)
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(candidateCap(want)).collect()
      val sel = selectCompatible(top.iterator
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))), want)
      if (sel.isEmpty) exhausted = true
      else {
        merges ++= sel.map { case (l, r, pc) => (roundNo, l, r, pc) }
        val folded = sel.foldLeft(col("syms")) {
          case (c, (l, r, _)) => mergeFold(c, l, r)
        }
        vocab = Checkpoints.cut(vocab.select(folded.as("syms"), col("cnt")))
      }
    }
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((rd, l, r, pc), k) => (k + 1L, rd, l, r, pc) }
      .toDF("merge_rank", "round", "left", "right", "pair_count")
  }

  /** Apply a learned merge list to the corpus — the TOKENIZE side of
    * the contract (learnMerges is train): each word's symbol array
    * folds through the merges in rank order (the order is semantic:
    * later merges consume earlier merges' outputs), entirely map-side
    * — the merge list ships as literals, the corpus never shuffles,
    * and per-doc stats reduce in the same projection. Fertility
    * (subwords per word) is THE tokenizer-quality number a
    * multilingual data pipeline tracks per language.
    *
    * Output: (idCol, n_words, n_subwords, fertility 6dp); NULL text
    * stays NULL (0-word docs get NULL fertility).
    */
  def subwordStats(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    // One imperative kernel pass per doc (BpeSubwordCounts — see its
    // Scaladoc for why this is not a higher-order fold): the merge
    // list rides inside the expression, the corpus never shuffles.
    val counts = graft.expressions.TextOps
      .bpeSubwordCounts(col(textCol), merges)
    val nWords = element_at(counts, 1)
    val nSub = element_at(counts, 2)
    docs.select(col(idCol),
      nWords.as("n_words"),
      nSub.as("n_subwords"),
      when(nWords.isNull || nWords === 0, lit(null).cast("double"))
        .otherwise(round(nSub.cast("double") / nWords, 6)).as("fertility"))
  }

  /** One symbol per Unicode CODE POINT — the driver-side mirror of
    * `initialSymbols` (Spark's split(word, "") is code-point aware;
    * Java charAt/toSeq would split surrogate pairs and put the
    * references on a different symbol alphabet than the engine).
    */
  private def codePointSymbols(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var j = 0
    while (j < word.length) {
      val cp = word.codePointAt(j)
      b += new String(Character.toChars(cp))
      j += Character.charCount(cp)
    }
    b.result()
  }

  /** Lexicographic comparison by code point — identical to the UTF-8
    * binary ordering Spark's `orderBy` applies to the engine-side
    * argmax tie-break (Java String.compareTo orders by UTF-16 code
    * unit, which diverges for supplementary characters).
    */
  private[graft] def codePointLess(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    (a.length - i) < (b.length - j)
  }

  /** Driver-side tokenize reference for one word — the q195 referee's
    * kernel (mirrors `mergeFold` exactly).
    */
  def tokenizeReference(word: String,
                        merges: Seq[(String, String)]): Vector[String] = {
    var syms = codePointSymbols(word) :+ Eow
    merges.foreach { case (l, r) =>
      val b = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
          b += (l + r); j += 2
        } else { b += syms(j); j += 1 }
      }
      syms = b.result()
    }
    syms
  }

  /** Driver-side reference: the same algorithm over a collected
    * (word, count) table — the q194 referee. Loud bound: this is a
    * GATE tool, not the scale path (the distributed learner is).
    */
  def learnMergesReference(census: Seq[(String, Long)],
                           numMerges: Int): Seq[(Long, String, String, Long)] = {
    require(census.size <= 1000000,
      "learnMergesReference is the bounded referee - use learnMerges at scale")
    var vocab: Seq[(Vector[String], Long)] = census.map { case (w, c) =>
      (codePointSymbols(w) :+ Eow, c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      // Tie-break on the same code-point (UTF-8 binary) ordering the
      // engine's orderBy(l, r) uses — Scala's default String ordering
      // is UTF-16 and diverges on supplementary characters.
      val best = counts.toSeq
        .sortWith { case (((l1, r1), p1), ((l2, r2), p2)) =>
          if (p1 != p2) p1 > p2
          else if (l1 != l2) codePointLess(l1, l2)
          else codePointLess(r1, r2)
        }.headOption
      best match {
        case Some(((l, r), pc)) if pc >= 2 =>
          out += ((k + 1L, l, r, pc))
          val merged = l + r
          vocab = vocab.map { case (syms, c) =>
            val b = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                b += merged; j += 2
              } else { b += syms(j); j += 1 }
            }
            (b.result(), c)
          }
          k += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  /** Driver-side restatement of `learnMergesBatched` — the q308
    * referee. Mirrors the batching rule EXACTLY: per round, sort the
    * full pair census by (count desc, left, right) in code-point
    * order, truncate to the same `candidateCap(want)` prefix the
    * engine collects, greedy-select symbol-disjoint pairs, apply them
    * in rank order. Same loud census bound as `learnMergesReference`.
    */
  def learnMergesBatchedReference(census: Seq[(String, Long)],
      numMerges: Int, batch: Int = 8)
      : Seq[(Long, Long, String, String, Long)] = {
    require(census.size <= 1000000,
      "learnMergesBatchedReference is the bounded referee - use " +
        "learnMergesBatched at scale")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var vocab: Seq[(Vector[String], Long)] = census.map { case (w, c) =>
      (codePointSymbols(w) :+ Eow, c)
    }
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, String, String, Long)]
    var roundNo = 0L
    var done = false
    while (out.size < numMerges && !done) {
      roundNo += 1
      val want = math.min(batch, numMerges - out.size)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      val top = counts.toSeq.filter(_._2 >= 2)
        .sortWith { case (((l1, r1), p1), ((l2, r2), p2)) =>
          if (p1 != p2) p1 > p2
          else if (l1 != l2) codePointLess(l1, l2)
          else codePointLess(r1, r2)
        }.take(candidateCap(want))
      val sel = selectCompatible(
        top.iterator.map { case ((l, r), pc) => (l, r, pc) }, want)
      if (sel.isEmpty) done = true
      else sel.foreach { case (l, r, pc) =>
        out += ((out.size + 1L, roundNo, l, r, pc))
        val merged = l + r
        vocab = vocab.map { case (syms, c) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              b += merged; j += 2
            } else { b += syms(j); j += 1 }
          }
          (b.result(), c)
        }
      }
    }
    out.toSeq
  }
}
