package graft.operators

import graft.operators.Checkpoints.CutOps
import graft.expressions.{ArrayOps, TextOps}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Scale design (100 TB): every variant is shuffle-bounded —
  *  - exact dedup: one hash shuffle on the dedup key;
  *  - MinHash-LSH: signatures are computed map-side in one pass; the
  *    band-bucket self-join exchanges only (id, band-key) pairs — never
  *    the shingle sets — so the wide stages move ~16 bytes/row, and hot
  *    bands (mass duplication) are salt-fanned via the bounded hot-key
  *    census instead of pinning one reducer. Shingle sets are
  *    re-attached to the (small) candidate-pair set by two narrow joins
  *    for exact-Jaccard verification;
  *  - SimHash: one explode+agg to build 64-bit fingerprints, then a
  *    4-chunk pigeonhole join (guarantees recall for hamming ≤ 3);
  *  - exact blocked Jaccard is inherently quadratic per block — kept
  *    parallel via deterministic salting (each block's pair space is
  *    spread over `saltBuckets` reducers instead of one), but the scale
  *    path for 100 TB is LSH, not this.
  */
object Dedup {

  /** Exact dedup: representative (min id) + multiplicity per key. */
  def exactDuplicates(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Deterministic dropDuplicates: keep the first row per key under an
    * explicit ordering (the reference's dropDuplicates keeps an arbitrary
    * row — at scale "arbitrary" is non-reproducible, so we pin it).
    */
  def dropDuplicatesOrdered(df: DataFrame, keyCols: Seq[String], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sorted distinct 64-bit shingle-hash set for a document — the compact
    * representation all Jaccard math runs on (sorted so verification can
    * use the merge-walk `JaccardSortedLongs` codegen expression).
    * Computed by the fused `ShingleHashSet` kernel straight from the text
    * bytes (bit-identical to sort_array(array_distinct(
    * xxhash64-of-shingle-strings)) on single-spaced text).
    */
  def shingleHashSet(text: Column, n: Int): Column =
    TextOps.shingleHashSet(text, n)

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard over
    * the shingle-hash sets. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Banding: numPerm/bands rows per band; the S-curve midpoint is
    * (1/bands)^(bands/numPerm), so the 64/8 default targets thresholds
    * around 0.77 — right for near-dup detection at 0.8. (16 bands of 4
    * would target ~0.5 and admit ~10% of ALL pairs as candidates on
    * corpora whose background similarity is ~0.3 — a quadratic blow-up.)
    */
  def lshNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3,
                      numPerm: Int = 64, bands: Int = 8,
                      saltBuckets: Int = 8, maxBandRows: Int = 4096): DataFrame = {
    val rows = numPerm / bands
    // Repartition before shingling: a single parquet file otherwise pins
    // the (expensive) signature computation to one task.
    val base = graft.GraftSession.fanout(docs)
      .select(col(idCol).as("id"), shingleHashSet(col(textCol), n).as("hs"))
    // Narrow (id, band-key) rows only — band index is folded into the key
    // hash by bandKeys, so one column suffices. Checkpointed because
    // three consumers read it (census + both join sides): each would
    // otherwise re-shingle and re-minhash the whole corpus, and the
    // narrow relation is ~1% of the corpus bytes.
    val keys = base.select(col("id"),
      explode(bandKeys(TextOps.minhashSignature(col("hs"), numPerm), bands, rows)).as("key"))
      .cutLineage
    // Hot-band salting, same scheme as Similarity.rhpCosinePairs: a
    // degenerate band (mass duplication — exactly what a dedup pass is
    // hunting) is a quadratic hot key; the bounded hot-key census fans
    // it over salted reducers, cold bands coalesce to one slice, and
    // each pair still meets exactly once (a-salted/b-replicated), so
    // the candidate set is salting-invariant (DedupSpec pins it).
    val (hotSalts, hotRows) = hotKeySaltCensus(keys, "key", saltBuckets, maxBandRows)
    if (hotRows.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"lshNearDupPairs: hot bands re-salted (cap=$maxBandRows): " +
          hotRows.take(20).map(r => s"key=${r.get(0)} salt=${r.getLong(1)}")
            .mkString("; "))
    val keyed = keys.join(broadcast(hotSalts), Seq("key"), "left")
      .withColumn("__salt_n", coalesce(col("__salt_n"), lit(1L)))
    val a = keyed.select(col("key"), col("id").as("id_a"),
      pmod(xxhash64(col("id")), col("__salt_n")).as("salt"))
    val b = keyed.select(col("key"), col("id").as("id_b"),
      explode(sequence(lit(0L), col("__salt_n") - 1)).as("salt"))
    val cand = a.join(b, Seq("key", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // Re-attach shingle sets to the (small) candidate set for exact
    // verification; false positives from banding die here.
    cand
      .join(base.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("jaccard", ArrayOps.jaccardSorted(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-block salt fan-out, grown proportionally for blocks larger than
    * `maxBlockRows`: a block of c rows gets ceil(c/maxBlockRows) ×
    * `saltBuckets`, so each salted A-slice holds ~maxBlockRows rows no
    * matter how skewed the blocking column is. Computed from a
    * column-pruned scan of the raw block columns only (the shingle
    * kernel is never re-run for the census); one row per distinct block.
    *
    * `__salt_n` stays LONG end-to-end: with ANSI off, an int cast would
    * silently WRAP for a pathological block — `sequence(0, negative)`
    * descends and the pmod sides disagree, dropping pairs without a
    * trace. A block too big for sane salting must instead fail loudly,
    * which `saltCensus` enforces.
    */
  private[graft] def blockSalts(docs: DataFrame, blockCols: Seq[String],
                                saltBuckets: Int, maxBlockRows: Int): DataFrame =
    docs.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__salt_n",
        (ceil(col("__cnt") / lit(maxBlockRows.toDouble)) * saltBuckets).cast("long"))
      .drop("__cnt")

  /** Runs the salt census ONCE and replays it as a local relation: the
    * census is broadcast downstream anyway, so it must fit on the driver
    * by construction, and collecting it here means the upstream is
    * scanned exactly once — not once for the oversize log and again as
    * the broadcast join side. Returns (broadcastable census frame,
    * collected rows) so callers can log/inspect without re-scanning.
    *
    * Loud guard: any block needing more than `maxSaltsPerBlock` slices
    * throws. ceil(c/maxBlockRows)·saltBuckets > 2^20 means the block's
    * quadratic pair space is ~2^40·maxBlockRows² comparisons — that is a
    * re-block-your-data problem, and wrapping an int (the old behavior)
    * would have silently dropped pairs instead of saying so.
    */
  private[graft] def saltCensus(docs: DataFrame, blockCols: Seq[String],
                                saltBuckets: Int, maxBlockRows: Int,
                                maxSaltsPerBlock: Long = 1L << 20)
      : (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val census = blockSalts(docs, blockCols, saltBuckets, maxBlockRows)
    val rows = census.collect()
    val saltIdx = blockCols.length
    val bad = rows.filter(_.getLong(saltIdx) > maxSaltsPerBlock)
    require(bad.isEmpty, {
      val desc = bad.take(5).map(r => blockCols.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString(",") +
        s" -> ${r.getLong(saltIdx)} salts").mkString("; ")
      s"saltCensus: block(s) exceed $maxSaltsPerBlock salt slices ($desc). " +
        "The per-block pair space is quadratic - re-block on a finer key " +
        "or raise maxSaltsPerBlock deliberately."
    })
    val local = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), census.schema)
    (local, rows)
  }

  /** Salt census for HIGH-cardinality keys (LSH band keys: ≈ n·bands
    * distinct values at scale), where `saltCensus`'s full collect would
    * be O(data) on the driver. Only keys with more than `maxKeyRows`
    * rows are collected — a degenerate regime (many near-identical or
    * zero-norm vectors) by construction collapses MANY rows into FEW
    * keys, so the hot subset is small; healthy keys never reach the
    * driver at all. The collect itself is bounded by `limit` (not just
    * validated after the fact), and blowing either bound throws loudly
    * instead of OOMing the driver or silently under-salting.
    *
    * Returns (broadcastable hot-key census with `__salt_n`, collected
    * rows). Callers LEFT-join and coalesce the salt count to 1 so cold
    * keys pay nothing.
    */
  private[graft] def hotKeySaltCensus(df: DataFrame, keyCol: String,
                                      saltBuckets: Int, maxKeyRows: Int,
                                      maxHotKeys: Int = 1 << 20,
                                      maxSaltsPerKey: Long = 1L << 20)
      : (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val census = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > maxKeyRows)
      .withColumn("__salt_n",
        (ceil(col("__cnt") / lit(maxKeyRows.toDouble)) * saltBuckets).cast("long"))
      .drop("__cnt")
    val rows = census.limit(maxHotKeys + 1).collect()
    require(rows.length <= maxHotKeys,
      s"hotKeySaltCensus: more than $maxHotKeys keys exceed $maxKeyRows rows - " +
        "the key distribution is pathologically flat-and-heavy; re-key the " +
        "data or raise maxHotKeys deliberately.")
    val bad = rows.filter(_.getLong(1) > maxSaltsPerKey)
    require(bad.isEmpty, {
      val desc = bad.take(5)
        .map(r => s"$keyCol=${r.get(0)} -> ${r.getLong(1)} salts").mkString("; ")
      s"hotKeySaltCensus: key(s) exceed $maxSaltsPerKey salt slices ($desc). " +
        "The per-key pair space is quadratic - re-key on a finer value " +
        "or raise maxSaltsPerKey deliberately."
    })
    val local = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), census.schema)
    (local, rows)
  }

  /** Exact blocked n-gram Jaccard: all pairs within the same blocking
    * key (e.g. language) — the exact-answer counterpart to LSH.
    *
    * A plain join on the block key alone collapses parallelism to the
    * number of blocks (5 languages → 5 busy reducers). Deterministic
    * salting fixes that: side A is keyed by salt(id_a), side B is
    * replicated to every salt, so each pair meets exactly once and the
    * pair space fans out over blocks×saltBuckets reducers.
    *
    * Skew guard: a block larger than `maxBlockRows` gets proportionally
    * MORE salt buckets (ceil(size/maxBlockRows) × saltBuckets), so one
    * skewed blocking value — a dominant language, an empty-prefix
    * block — can't quietly pin its whole quadratic pair space on
    * `saltBuckets` reducers. The per-block sizes come from a
    * column-pruned scan of the raw block columns (the shingle kernel is
    * never re-run for the census), and oversized blocks are logged
    * loudly before the pair stage runs — at 100 TB you want the skew in
    * the logs, not discovered from a straggler.
    */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], threshold: Double,
                          n: Int = 3, saltBuckets: Int = 16,
                          maxBlockRows: Int = 4096): DataFrame = {
    val (salts, saltRows) = saltCensus(docs, blockCols, saltBuckets, maxBlockRows)
    val over = saltRows.filter(_.getLong(blockCols.length) > saltBuckets).take(20)
    if (over.nonEmpty) {
      val desc = over.map(r => blockCols.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString(",") +
        s" salt=${r.getLong(r.length - 1)}").mkString("; ")
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"blockedJaccardPairs: oversized blocks re-salted (cap=$maxBlockRows): $desc")
    }
    val t = graft.GraftSession.fanout(docs)
      .select(
        (col(idCol).as("id") +: blockCols.map(col)) :+ shingleHashSet(col(textCol), n).as("hs"): _*)
      .join(broadcast(salts), blockCols)
    val a = t.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("hs").as("hs_a") :+ col("__salt_n"): _*)
      .withColumn("salt", pmod(xxhash64(col("id_a")), col("__salt_n")))
      .drop("__salt_n")
    val b = t.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("hs").as("hs_b") :+ col("__salt_n"): _*)
      .withColumn("salt", explode(sequence(lit(0L), col("__salt_n") - 1)))
      .drop("__salt_n")
    a.join(b, blockCols :+ "salt")
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", ArrayOps.jaccardSorted(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Benchmark decontamination (the GPT-3-style n-gram overlap check):
    * for every corpus document sharing at least one word n-gram with any
    * benchmark document, return (id, n_hit_grams) — the count of its
    * distinct contaminated grams. Documents shorter than n words
    * participate as one whole-text gram (same fallback as
    * `ShingleHashSet`).
    *
    * Scale shape: an eval/benchmark set is small by construction, so its
    * distinct gram fingerprints (8 bytes each) are BROADCAST; the corpus
    * side is a map-side kernel + explode + broadcast-hash semi-filter —
    * the corpus text is never exchanged, and the only shuffle is the
    * per-id count over the (small) matched subset. The inner join is
    * exact on 64-bit gram hashes; a cross-gram collision is a ~2^-64
    * event the oracle's string-equality check would surface.
    */
  def contaminationHits(corpus: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(shingleHashSet(col(textCol), n)).as("__g"))
      .distinct()
    val corpusGrams = graft.GraftSession.fanout(corpus)
      .select(col(idCol), explode(shingleHashSet(col(textCol), n)).as("__g"))
    corpusGrams.join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Cross-document repeated-gram profile (ExactSubstr-lite, after Lee
    * et al.'s "Deduplicating Training Data Makes Language Models
    * Better"): for every document, the fraction of its distinct word
    * n-grams that also occur in at least one OTHER document — the
    * per-document boilerplate/duplication diagnostic a span-level dedup
    * pass ranks its work by. Documents shorter than n words participate
    * as one whole-text gram (the `ShingleHashSet` fallback, same as
    * `contaminationHits`).
    *
    * Scale shape: grams travel as 8-byte xxhash64 fingerprints — the
    * text never shuffles. Two narrow exchanges: (gram → doc-frequency)
    * map-side-combined aggregation, then the (id, gram) pairs re-keyed
    * once to join the frequency back and fold per document. The gram
    * doc-frequency table is vocabulary-of-grams sized: big, but
    * hash-partitioned and never collected. Hash-for-string equality is
    * the `contaminationHits` adjudication (~2^-64 per pair; the
    * string-level oracle would surface a collision).
    *
    * Output: (idCol, n_grams, n_shared, shared_frac 6dp).
    */
  def repeatedGramProfile(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val grams = graft.GraftSession.fanout(docs)
      .select(col(idCol), explode(shingleHashSet(col(textCol), n)).as("__g"))
    // shingleHashSet is a DISTINCT set per document, so the per-gram
    // count IS the document frequency.
    val dfreq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    grams.join(dfreq, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared") / col("n_grams"), 6))
  }

  /** Per-document NOVELTY profile — the data-valuation complement of
    * [[repeatedGramProfile]]: for every document, the fraction of its
    * distinct word n-grams whose canonical FIRST occurrence (minimum
    * doc_id over the corpus) is this document — "how much content does
    * this doc contribute that no earlier doc already carries". The
    * ordering-by-id convention makes the attribution deterministic and
    * restatable in SQL; a curation pass ranks candidate additions by
    * novelty exactly this way (a doc of n_grams = n_novel adds pure new
    * content; novelty ≈ 0 marks boilerplate already owned elsewhere).
    *
    * Scale shape: grams travel as 8-byte xxhash64 fingerprints — text
    * never shuffles. Two narrow exchanges: the per-gram min(doc_id)
    * aggregation (map-side combinable) and the (id, gram) re-key to
    * join ownership back. The gram-owner table is vocabulary-sized,
    * hash-partitioned, never collected.
    *
    * Output: (idCol, n_grams, n_novel, novelty_frac 6dp).
    */
  def noveltyProfile(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val grams = graft.GraftSession.fanout(docs)
      .select(col(idCol), explode(shingleHashSet(col(textCol), n)).as("__g"))
    val owner = grams.groupBy(col("__g"))
      .agg(min(col(idCol)).as("__first"))
    grams.join(owner, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_frac", round(col("n_novel") / col("n_grams"), 6))
  }

  /** Duplicate-SPAN profile (ExactSubstr, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"): per document, the
    * maximal contiguous word intervals covered by `n`-grams that also
    * occur in at least one OTHER document. Where `repeatedGramProfile`
    * answers "how much of this doc is duplicated", this answers "WHICH
    * spans" — the unit a span-level dedup pass actually excises.
    * Documents shorter than n words participate as one whole-text gram
    * spanning [0, len). Intervals that overlap or touch merge into one
    * span (gaps-and-islands over a running max-end).
    *
    * Scale shape: positional grams travel as (id, pos, end, 8-byte
    * xxhash64) — the text never shuffles. Three narrow exchanges: the
    * gram doc-frequency aggregation (column-pruned to (gram, id) with
    * map-side partial distinct), the hash semi-join attaching the
    * cross-doc flag back to positions, and one id-keyed exchange for
    * the per-document island window (doc-length bounded per key). The
    * gram relation feeds two consumers and is deliberately RECOMPUTED,
    * not checkpointed: positional grams are ~n× the text bytes, so
    * materializing them (the q111 band-key checkpoint move, right for
    * narrow 8-keys-per-doc relations) would cost more than the second
    * column-pruned scan. Hash-for-string gram equality is the
    * `contaminationHits` adjudication (~2^-64 per pair; the q112
    * string-level oracle would surface a collision).
    *
    * Output: (idCol, span_start, span_end, span_words) — [start, end)
    * word offsets, one row per merged span, docs with no duplicated
    * gram absent.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.GraftSession.fanout(docs)
      .filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .withColumn("__nw", size(col("__w")))
    val positional = base.filter(col("__nw") >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(0), col("__nw") - n),
        i => struct(i.as("pos"), (i + n).as("e"),
          xxhash64(concat_ws(" ", slice(col("__w"), i + 1, lit(n)))).as("g"))))
        .as("__s"))
    val whole = base.filter(col("__nw") < n)
      .select(col(idCol), struct(lit(0).as("pos"), col("__nw").as("e"),
        xxhash64(concat_ws(" ", col("__w"))).as("g")).as("__s"))
    val grams = positional.unionByName(whole)
      .select(col(idCol), col("__s.pos").as("__pos"),
        col("__s.e").as("__e"), col("__s.g").as("__g"))
    // A gram repeated only WITHIN one doc is not boilerplate: the
    // cross-document criterion is distinct-doc frequency > 1.
    val dupG = grams.groupBy(col("__g"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > 1)
      .select(col("__g"))
    val dup = grams.join(dupG, Seq("__g"))
      .select(col(idCol), col("__pos"), col("__e"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"), col("__e"))
    val prevMax = max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isl = sum(when(prevMax.isNull || col("__pos") > prevMax, 1L)
      .otherwise(0L)).over(w)
    dup.withColumn("__isl", isl)
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        max(col("__e")).cast("long").as("span_end"))
      .withColumn("span_words", col("span_end") - col("span_start"))
      .select(col(idCol), col("span_start"), col("span_end"), col("span_words"))
  }

  /** Span-level dedup scrub: remove every `duplicateSpans` interval from
    * the text and reassemble what is left — the ExactSubstr EXCISION
    * pass (document-level dedup throws away the whole doc; span-level
    * keeps the novel remainder, which at crawl scale is most of the
    * value in partially-boilerplate pages).
    *
    * Scale shape: the span relation is narrow (id, start, end) and
    * corpus-bounded in rows, then collapses to one array per affected
    * doc; the corpus pays exactly ONE wide exchange — the id-keyed join
    * attaching each doc's edit list — which is the information-theoretic
    * minimum for per-document edits (AQE broadcasts the span side when
    * few docs are affected). The rewrite itself is a map-side
    * higher-order `filter`/`exists` over the word array — codegen'd,
    * no UDF. NULL text stays NULL; a fully-duplicated doc comes back as
    * the empty string with n_kept = 0 (kept distinct from NULL).
    *
    * Output: the input row plus (clean_text, n_kept).
    */
  def exciseDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    exciseWithSpans(docs, duplicateSpans(docs, idCol, textCol, n),
      idCol, textCol)

  /** The edit-application half of [[exciseDuplicateSpans]], decoupled
    * from span DISCOVERY so any span relation (id, span_start,
    * span_end) can drive it — a persisted span store from a previous
    * maintenance run, or a STATIC span side under a streaming scan
    * (`DocumentStreams.streamingExciseSpans`, where the stream-static
    * id join is stateless and the rewrite stays a map-side codegen
    * projection, both legal in a streaming plan).
    */
  def exciseWithSpans(docs: DataFrame, spanRel: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val spans = spanRel
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val words = split(col(textCol), " ")
    val kept = filter(words, (_, i) =>
      !exists(col("__spans"), s =>
        i >= s.getField("span_start") && i < s.getField("span_end")))
    docs.join(spans, Seq(idCol), "left")
      .withColumn("clean_text",
        when(col(textCol).isNull, lit(null).cast("string"))
          .when(col("__spans").isNull, col(textCol))
          .otherwise(concat_ws(" ", kept)))
      .withColumn("n_kept",
        when(col(textCol).isNull, lit(null).cast("long"))
          .when(col("__spans").isNull, size(words).cast("long"))
          .otherwise(size(kept).cast("long")))
      .drop("__spans")
  }

  /** Cross-corpus overlap matrix: pairwise Jaccard between the distinct
    * `n`-gram sets of each group (source / crawl snapshot / subcorpus) —
    * the corpus-level contamination diagnostic that decides which
    * sources need a cross-dedup pass before mixing.
    *
    * Contract: `groupCol` is a LOW-cardinality corpus tag (crawls,
    * snapshots, named sources — tens to thousands), not a per-document
    * key. Under that contract the plan avoids the gram self-join
    * entirely: one (group, gram-hash) distinct, then a per-gram
    * `collect_set` whose state is bounded by the group count k, then
    * pair expansion MAP-SIDE with higher-order transforms (≤ k(k-1)/2
    * structs per gram, only for grams in >1 group) into a final
    * k²-bounded aggregate. No stage shuffles more than (tag, 8-byte
    * hash) rows; a self-join formulation would instead re-shuffle the
    * gram relation and fan hot grams quadratically through a reducer.
    *
    * Output: (src_a, src_b, n_common, jaccard 6dp), src_a < src_b,
    * pairs with no shared gram absent.
    */
  def crossCorpusOverlap(docs: DataFrame, groupCol: String, textCol: String,
                         n: Int): DataFrame = {
    val grams = graft.GraftSession.fanout(docs)
      .select(col(groupCol).as("__grp"),
        explode(shingleHashSet(col(textCol), n)).as("__g"))
      .distinct()
    val sizes = grams.groupBy(col("__grp")).agg(count(lit(1)).as("__n"))
    val byGram = grams.groupBy(col("__g"))
      .agg(sort_array(collect_set(col("__grp"))).as("__gs"))
      .filter(size(col("__gs")) > 1)
    val m = size(col("__gs"))
    val pairs = byGram.select(explode(flatten(transform(
      sequence(lit(0), m - 2),
      i => transform(sequence(i + 1, m - 1),
        j => struct(element_at(col("__gs"), i + 1).as("src_a"),
          element_at(col("__gs"), j + 1).as("src_b")))))).as("__p"))
      .select(col("__p.src_a"), col("__p.src_b"))
    pairs.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("__grp").as("src_a"), col("__n").as("__na"))),
        Seq("src_a"))
      .join(broadcast(sizes.select(col("__grp").as("src_b"), col("__n").as("__nb"))),
        Seq("src_b"))
      .withColumn("jaccard",
        round(col("n_common") / (col("__na") + col("__nb") - col("n_common")), 6))
      .select(col("src_a"), col("src_b"), col("n_common"), col("jaccard"))
  }

  /** Incremental dedup against a historical corpus — the daily-increment
    * shape at 100 TB: history is petabytes and append-only, today's batch
    * is small, and re-deduplicating the union from scratch every day is
    * the anti-pattern. Returns the batch rows whose `textCol` content
    * does not already appear in history (EXACT, same content-equality
    * semantics as a SQL NOT EXISTS on the text).
    *
    * Scale shape: the history side is reduced MAP-SIDE to distinct
    * 8-byte xxhash64 content fingerprints from a column-pruned scan —
    * the history text never leaves its executors, and the partial
    * distinct collapses the (high at crawl scale) duplicate mass before
    * the exchange. The anti-join then shuffles fingerprints only, and
    * Catalyst's runtime Bloom filter (the q68 mechanism) can prune the
    * batch side before its shuffle when the planner finds it selective.
    * Hash-equality stands in for text-equality at a ~2^-64 collision
    * risk per pair — the same adjudication as `contaminationHits`, and
    * the q96 oracle's string-equality check would surface one. NULL
    * text never matches anything (SQL semantics): its fingerprint is
    * NULL, and an anti-join null key survives.
    */
  def newAgainstHistory(history: DataFrame, batch: DataFrame,
                        textCol: String): DataFrame = {
    val fp = when(col(textCol).isNotNull, xxhash64(col(textCol)))
    val histFp = history.select(fp.as("__fp")).distinct()
    batch.withColumn("__fp", fp)
      .join(histFp, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Bloom-prefiltered incremental dedup: identical OUTPUT to
    * `newAgainstHistory` (exact content-equality keep), but the batch
    * is first probed against a Bloom filter of the history fingerprints
    * so only the sketch-POSITIVE slice pays the anti-join exchange.
    * Bloom filters have NO false negatives, so a negative probe proves
    * the row is new and it bypasses the join entirely — the exchange
    * shrinks from |batch| to |true dups| + fpp·|new|, which in the
    * daily-crawl regime (mostly-novel batches) is the difference
    * between shuffling the batch and shuffling almost nothing.
    *
    * Scale shape: the sketch trains DISTRIBUTIVELY (mergeable per-
    * partition partials via `stat.bloomFilter`) over the map-side
    * fingerprint projection — history text never leaves its executors —
    * and ships to batch executors once as a plan reference object
    * probed by the codegen'd `bloom_might_contain_long` kernel (no UDF).
    * Size the sketch for the tier: ~9.6 bits/item at fpp=1% (1e9-doc
    * history ⇒ ~1.2 GB), and at 100 TB the filter is the thing you
    * PERSIST and maintain incrementally (`mergeInPlace` of each day's
    * batch sketch) instead of rebuilding — the q107 index-maintenance
    * move applied to the dedup sketch. Correctness never depends on
    * sketch quality: false positives are re-checked by the exact
    * fingerprint anti-join, false negatives don't exist.
    *
    * NULL batch text probes NULL → kept as new, matching
    * `newAgainstHistory`'s SQL anti-join semantics.
    */
  def bloomNewAgainstHistory(history: DataFrame, batch: DataFrame,
                             textCol: String, expectedItems: Long = 1L << 20,
                             fpp: Double = 0.01): DataFrame = {
    val fp = when(col(textCol).isNotNull, xxhash64(col(textCol)))
    val bf = history.filter(col(textCol).isNotNull)
      .select(xxhash64(col(textCol)).as("__fp"))
      .stat.bloomFilter("__fp", expectedItems, fpp)
    val marked = batch.withColumn("__fp", fp)
      .withColumn("__maybe",
        coalesce(ArrayOps.bloomMightContainLong(col("__fp"), bf), lit(false)))
    val histFp = history.select(fp.as("__fp")).distinct()
    val verified = marked.filter(col("__maybe"))
      .join(histFp, Seq("__fp"), "left_anti")
    marked.filter(!col("__maybe"))
      .unionByName(verified)
      .drop("__maybe", "__fp")
  }

  /** Incremental NEAR-dup dedup against a historical corpus — the
    * LSH counterpart to `newAgainstHistory`'s exact-hash anti-join
    * (q96/q99 cover exact content equality; a crawl increment also
    * carries boilerplate-edited near-copies that exact hashing never
    * catches). Returns the batch rows with no history document at or
    * above `threshold` Jaccard.
    *
    * Scale shape: both sides reduce map-side to narrow (id, band-key)
    * rows; candidates come from the band join (batch keys × history
    * keys — NOT a self-join, so the candidate space is |batch|-bounded,
    * the daily-increment regime), and only candidates re-attach shingle
    * sets for exact-Jaccard verification. At 100 TB the history side's
    * band keys and shingle sets are PERSISTED layouts maintained by
    * appending each day's batch (the q107 index-maintenance move
    * pointed at the dedup index) — the in-flight computation here is
    * the same plan reading live frames instead of the layout.
    *
    * Skew guard: a degenerate band (boilerplate that hashes the whole
    * crawl into one key) makes the band join quadratic on that key.
    * The history keys run through `hotKeySaltCensus`: hot bands get
    * their HISTORY rows salted across ceil(size/maxBandRows)×saltBuckets
    * slices and the (narrow, ids-only) batch keys replicated to every
    * slice, so each (batch, history) candidate meets exactly once and
    * no reducer sees more than ~maxBandRows history rows per band. Cold
    * bands coalesce to one slice and pay nothing.
    */
  def lshNewAgainstHistory(history: DataFrame, batch: DataFrame,
                           idCol: String, textCol: String, threshold: Double,
                           n: Int = 3, numPerm: Int = 64,
                           bands: Int = 8, saltBuckets: Int = 8,
                           maxBandRows: Int = 4096): DataFrame = {
    val rows = numPerm / bands
    def keyed(df: DataFrame, idAs: String, hsAs: String)
        : (DataFrame, DataFrame) = {
      val base = graft.GraftSession.fanout(df)
        .select(col(idCol).as(idAs), shingleHashSet(col(textCol), n).as(hsAs))
      val keys = base.select(col(idAs), explode(
        bandKeys(TextOps.minhashSignature(col(hsAs), numPerm), bands, rows))
        .as("key"))
      (base, keys)
    }
    val (hBase, hKeysRaw) = keyed(history, "__hid", "__hhs")
    val (bBase, bKeys) = keyed(batch, "__bid", "__bhs")
    // Two consumers of the history keys (census + join side): checkpoint
    // the narrow relation once instead of re-running the sketch kernel
    // over the full history (the rhpCosinePairs reasoning).
    val hKeys = hKeysRaw.cutLineage
    val (hotSalts, hotRows) = hotKeySaltCensus(hKeys, "key", saltBuckets, maxBandRows)
    if (hotRows.nonEmpty) {
      val desc = hotRows.take(20)
        .map(r => s"key=${r.get(0)} salt=${r.getLong(1)}").mkString("; ")
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"lshNewAgainstHistory: hot bands re-salted (cap=$maxBandRows): $desc")
    }
    val h = hKeys.join(broadcast(hotSalts), Seq("key"), "left")
      .withColumn("__salt_n", coalesce(col("__salt_n"), lit(1L)))
      .select(col("key"), col("__hid"),
        pmod(xxhash64(col("__hid")), col("__salt_n")).as("salt"))
    val b = bKeys.join(broadcast(hotSalts), Seq("key"), "left")
      .withColumn("__salt_n", coalesce(col("__salt_n"), lit(1L)))
      .select(col("key"), col("__bid"),
        explode(sequence(lit(0L), col("__salt_n") - 1)).as("salt"))
    val cand = b.join(h, Seq("key", "salt"))
      .select(col("__bid"), col("__hid")).distinct()
    val dupIds = cand
      .join(bBase, Seq("__bid"))
      .join(hBase, Seq("__hid"))
      .withColumn("__j", ArrayOps.jaccardSorted(col("__bhs"), col("__hhs")))
      .filter(col("__j") >= threshold)
      .select(col("__bid").as(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Connected components over a near-dup pair list by iterative
    * min-label propagation (Pregel-lite on DataFrames): every node
    * adopts the smallest id reachable through its edges until fixpoint.
    * Returns (doc_id, rep_id) for every node that appears in a pair;
    * rep_id = the component minimum, i.e. the row a dedup keeps.
    *
    * Scale: edge lists at or under `maxDriverEdges` run a sequential
    * union-find on the driver (broadcast-threshold reasoning — one
    * bounded collect beats any number of shuffle rounds); larger lists
    * run the distributed loop, where each iteration is one edge join +
    * min-aggregate plus one pointer-jumping join, all on narrow
    * (node, label) pairs, converging in O(log diameter) rounds. The
    * loop's convergence check is one count per round, not a data
    * collect.
    */
  def nearDupComponents(pairs: DataFrame, aCol: String = "id_a",
                        bCol: String = "id_b", maxIter: Int = 20,
                        maxDriverEdges: Long = 1000000L): DataFrame = {
    // Materialize the PAIR list before mirroring it: the union's two
    // branches would otherwise each recompute the whole upstream
    // pair-detection pipeline (an O(n²) cartesian for exact cosine
    // pairs) — checkpoint first so it runs exactly once.
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .cutLineage

    // Near-dup pair lists are tiny relative to the corpus they came
    // from (they ARE the anomaly being hunted). Below `maxDriverEdges`
    // — the same reasoning as a broadcast-join threshold — a sequential
    // union-find on the driver is O(E α(E)) in one collect, versus
    // O(log diameter) full shuffle rounds for the distributed loop.
    // Above it (or for non-integral id types the long-keyed union-find
    // can't represent), the distributed min-label loop handles edge
    // lists that cannot sit on the driver. Both paths produce identical
    // output, id dtype included (DedupSpec pins it).
    val integralIds = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      Seq(p.schema("src").dataType, p.schema("dst").dataType)
        .forall(Seq(ByteType, ShortType, IntegerType, LongType).contains)
    }
    if (integralIds && p.count() <= maxDriverEdges)
      return driverUnionFind(p)

    // The mirrored edge list is checkpointed too: every iteration (and
    // its convergence count) re-reads it.
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cutLineage
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min("label").as("nb_label"))
      val propagated = labels.withColumnRenamed("label", "old")
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("nb_label"), col("old"))).as("mid"))
      // Pointer jumping (path halving): label := label(label). Labels
      // only ever decrease and stay inside the component, so correctness
      // is unchanged, but rounds drop from O(diameter) to O(log
      // diameter) — a 22-hop chain (observed in the sf0.1 embedding
      // graph) converges in ~6 rounds instead of ~22, which is both the
      // local wall-clock and the number-of-shuffles story at scale.
      val jumped = propagated
        .join(propagated.select(col("node").as("mid"), col("mid").as("ll")),
          Seq("mid"), "left")
        .select(col("node"), col("old"),
          least(col("mid"), coalesce(col("ll"), col("mid"))).as("label"))
      // ONE materialization per round: the convergence count reads the
      // checkpointed partitions instead of re-running the round's joins.
      val mat = jumped.withColumn("__changed", col("label") =!= col("old"))
        .cutLineage // also truncates the iterative lineage
      converged = mat.filter(col("__changed")).limit(1).count() == 0
      labels = mat.select("node", "label")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"nearDupComponents did not converge in $maxIter rounds — component " +
          "diameter exceeds maxIter; raise it (labels would be silently wrong)")
    labels.select(col("node").as("doc_id"), col("label").as("rep_id"))
  }

  /** Path-compressed, rank-free union-find over a collected edge list,
    * rooting every node at its component MINIMUM (union always keeps
    * the smaller id as root, so find() lands on the min directly —
    * same contract as the distributed loop).
    */
  private def driverUnionFind(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val idType = p.schema("src").dataType
    val edges = p.collect().map(r =>
      (r.get(0).asInstanceOf[Number].longValue, r.get(1).asInstanceOf[Number].longValue))
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.toSeq.sorted
      .map(n => (n, find(n)))
      .toDF("doc_id", "rep_id")
      // same output dtype as the distributed path (ids pass through
      // joins/min there, keeping e.g. IntegerType intact)
      .select(col("doc_id").cast(idType).as("doc_id"),
        col("rep_id").cast(idType).as("rep_id"))
  }

  /** 64-bit SimHash fingerprints via the fused `SimHash64` kernel: a
    * pure map-side projection, NO shuffle (the explode + 64-column
    * aggregate formulation exchanged |corpus|×|shingles| rows).
    */
  /** Sorted-neighborhood (blocked SNM) near-dup candidates: records are
    * blocked on a `blockLen`-char normalized prefix, sorted within each
    * block by a `probeLen`-char probe (ties by id), and each record is
    * compared ONLY to its next `window - 1` sort neighbors with an exact
    * Levenshtein distance over the probe. The classic record-linkage
    * alternative to LSH: the expensive O(probeLen²) distance runs a
    * constant number of times per row (linear total) instead of per
    * pair (quadratic).
    *
    * Scale design: one hash shuffle on the block key + a per-block sort;
    * the lead() comparisons never leave the partition. Like all SNM,
    * recall is bounded by the blocking choice — near-dups that diverge
    * inside the first `blockLen` chars land in different blocks (the
    * standard fix is a second pass under a different blocking key, which
    * is just another call with different params). A degenerate corpus
    * where most rows share one block degrades to that block's sort — the
    * same skew bound any keyed window has.
    *
    * Output: (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String, textCol: String,
                              blockLen: Int = 16, probeLen: Int = 120,
                              window: Int = 4, maxDist: Int = 20): DataFrame = {
    require(window >= 2 && blockLen >= 1 && probeLen >= blockLen && maxDist >= 0,
      s"bad SNM params: window=$window blockLen=$blockLen probeLen=$probeLen maxDist=$maxDist")
    val probe = lower(substring(col(textCol), 1, probeLen))
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"), probe.as("_probe"),
        substring(probe, 1, blockLen).as("_blk"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("_blk").orderBy(col("_probe"), col("_id"))
    // Window expressions first (generators can't host them), then the
    // per-neighbor distance inside the explode.
    val withLeads = base.select(Seq(col("_id"), col("_probe")) ++
      (1 until window).flatMap(i => Seq(
        lead(col("_id"), i).over(win).as(s"_nid$i"),
        lead(col("_probe"), i).over(win).as(s"_np$i"))): _*)
    // Distance kernel cost discipline (sf1-stress finding): a full
    // probeLen² Levenshtein DP per neighbor dominated the operator on
    // a duplicate-heavy corpus. Equal probes (THE common case in a
    // dedup workload) short-circuit to 0 without touching the DP, and
    // the inexact pairs use the THRESHOLDED kernel — a banded
    // O(probeLen·maxDist) pass that returns -1 past the bound, exact
    // within it, so kept rows carry identical distances to the
    // unthresholded form.
    val neighbors = (1 until window).map { i =>
      struct(col(s"_nid$i").as("nid"),
        when(col("_probe") === col(s"_np$i"), lit(0))
          .otherwise(levenshtein(col("_probe"), col(s"_np$i"), maxDist))
          .as("dist"))
    }
    withLeads.select(col("_id"), explode(array(neighbors: _*)).as("n"))
      .filter(col("n.nid").isNotNull && col("n.dist") >= 0 &&
        col("n.dist") <= maxDist)
      .select(least(col("_id"), col("n.nid")).as("id_a"),
        greatest(col("_id"), col("n.nid")).as("id_b"),
        col("n.dist").as("dist"))
  }

  def simhash(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol),
      TextOps.simhash64(shingleHashSet(col(textCol), n)).as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, found via
    * 16-bit chunk pigeonhole (4 chunks ⇒ guaranteed recall for ≤ 3).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, n: Int = 3): DataFrame = {
    val fp = simhash(docs, idCol, textCol, n)
    val chunked = fp.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), 16 * i).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("bigint").as("hamming"))
  }
}
