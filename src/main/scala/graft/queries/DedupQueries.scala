package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication battery over the `documents` table.
  *
  * The DuckDB oracles recompute the SAME shingle definition (distinct
  * 3-word grams) so exact-Jaccard results are bit-comparable; the LSH
  * variant is exact-verified after candidate generation, so its output
  * equals the brute-force oracle whenever recall is 100% (planted pairs
  * sit at j≈0.98 where the 16×4 band scheme misses with P≈4e-8).
  */
object DedupQueries {
  import RelationalQueries.Q

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Symmetric difference between the banded SimHash pair path and the
    * brute-force all-pairs hamming filter over the same fingerprints —
    * the q26/q66 exactness gates; correct banding makes it EMPTY.
    */
  private def simhashDiff(d: DataFrame, maxHamming: Int): DataFrame = {
    val lsh = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = maxHamming)
    val fp = Dedup.simhash(d, "doc_id", "text")
    val brute = fp.select(col("doc_id").as("id_a"), col("simhash").as("fp_a"))
      .crossJoin(fp.select(col("doc_id").as("id_b"), col("simhash").as("fp_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    lsh.exceptAll(brute).withColumn("side", lit("lsh_only"))
      .unionAll(brute.exceptAll(lsh).withColumn("side", lit("brute_only")))
      .orderBy("id_a", "id_b", "side")
  }

  /** Shared oracle CTE: distinct 3-word shingles per doc. */
  private val shingleCte =
    """WITH t AS (
      |  SELECT doc_id, lang, text,
      |    (SELECT CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(len(w)-2),
      |        i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) ELSE [text] END
      |     FROM (SELECT string_split(text, ' ') AS w)) AS sh
      |  FROM documents)""".stripMargin

  /** Shared oracle CTE: merged cross-document duplicated-8-gram spans
    * per doc (the q112 semantics; q113's oracle builds on it). Island
    * numbering differs from the operator's (0- vs 1-based) but the
    * BREAK condition — pos > running max end over (pos, e) order — is
    * identical, and islands are only ever grouped by, never emitted.
    */
  private val spanCte =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      | g1 AS (SELECT doc_id, pos, pos + 8 AS e,
      |         array_to_string(w[pos+1:pos+8], ' ') AS gram
      |        FROM (SELECT doc_id, w, unnest(range(len(w)-7)) AS pos
      |              FROM t WHERE len(w) >= 8)),
      | g2 AS (SELECT doc_id, 0 AS pos, len(w) AS e,
      |         array_to_string(w, ' ') AS gram FROM t WHERE len(w) < 8),
      | g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
      | f AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS df
      |                         FROM g GROUP BY 1) WHERE df > 1),
      | d AS (SELECT doc_id, pos, e FROM g JOIN f USING (gram)),
      | m AS (SELECT doc_id, pos, e,
      |        CASE WHEN pos > MAX(e) OVER (PARTITION BY doc_id
      |             ORDER BY pos, e
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |          THEN 1 ELSE 0 END AS brk
      |       FROM d),
      | s AS (SELECT doc_id, pos, e,
      |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos, e
      |          ROWS UNBOUNDED PRECEDING) AS isl
      |       FROM m),
      | spans AS (SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end
      |           FROM s GROUP BY doc_id, isl)""".stripMargin

  /** Shared by q113 (batch) and q153 (streaming): excision tail on the
    * shared span CTE — keep words outside every span, reassemble in
    * position order; fully-scrubbed docs come back as '' / 0 (LEFT JOIN
    * + COALESCE), NULL text stays NULL.
    */
  private lazy val spanExcisionOracle = spanCte +
    """
      |, wp AS (SELECT doc_id, pos, w[pos+1] AS word
      |         FROM (SELECT doc_id, w, unnest(range(len(w))) AS pos FROM t)),
      | kept AS (SELECT wp.* FROM wp WHERE NOT EXISTS (
      |            SELECT 1 FROM spans sp WHERE sp.doc_id = wp.doc_id
      |              AND wp.pos >= sp.span_start AND wp.pos < sp.span_end)),
      | agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS ct,
      |          CAST(COUNT(*) AS BIGINT) AS nk FROM kept GROUP BY 1)
      |SELECT dd.doc_id,
      |  COALESCE(a.ct, CASE WHEN dd.text IS NULL THEN NULL ELSE '' END)
      |    AS clean_text,
      |  COALESCE(a.nk, CASE WHEN dd.text IS NULL THEN NULL
      |    ELSE CAST(0 AS BIGINT) END) AS n_kept
      |FROM documents dd LEFT JOIN agg a USING (doc_id)
      |ORDER BY dd.doc_id""".stripMargin

  /** Shared by q59 (batch audit) and q180 (streaming admission check):
    * per corpus doc, the count of its distinct word 8-grams that occur
    * anywhere in the benchmark split (doc_id % 10 = 0) — exact string
    * grams, adjudicating the operators' 64-bit gram hashing.
    */
  private val decontaminateOracle =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      | g AS (
      |  SELECT doc_id, CASE WHEN len(w) >= 8 THEN
      |      list_transform(range(len(w)-7), i -> array_to_string(w[i+1:i+8], ' '))
      |    ELSE [array_to_string(w, ' ')] END AS gs
      |  FROM t),
      | bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 10 = 0),
      | corpus AS (
      |  SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM g
      |  WHERE doc_id % 10 <> 0)
      |SELECT c.doc_id, COUNT(*) AS n_hit_grams
      |FROM corpus c JOIN bench b ON c.gram = b.gram
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by q111 (batch) and q118 (streaming): exact string-shingle
    * NOT-EXISTS over the %3-history / %2-batch split — adjudicates the
    * 64-bit shingle hashing and the banded candidate recall of both
    * twins (a banding miss surfaces as a row the oracle drops and the
    * operator keeps).
    */
  private val lshIncrementalOracle = shingleCte +
    """
      |, h AS (SELECT doc_id AS hid, sh AS hsh FROM t WHERE doc_id % 3 <> 0)
      |, b AS (SELECT doc_id, sh FROM t WHERE doc_id % 2 = 0)
      |, dup AS (
      |  SELECT DISTINCT b.doc_id FROM b JOIN h ON
      |    CAST(len(list_intersect(b.sh, h.hsh)) AS DOUBLE)
      |      / (len(b.sh) + len(h.hsh) - len(list_intersect(b.sh, h.hsh)))
      |      >= 0.8)
      |SELECT d.doc_id, d.lang, d.source, d.n_chars
      |FROM documents d JOIN b USING (doc_id)
      |WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    // Exact dedup: representative + multiplicity per key (A7 at scale).
    "q22_dedup_exact" -> ((s, dir) => {
      Dedup.exactDuplicates(docs(s, dir), "doc_id", Seq("lang", "source"))
        .orderBy("lang", "source")
    }),

    // Deterministic keep-first dedup (pinned ordering, unlike the
    // reference's arbitrary-row dropDuplicates).
    "q23_dedup_keep_first" -> ((s, dir) => {
      Dedup.dropDuplicatesOrdered(docs(s, dir), Seq("lang"),
          Seq(col("n_chars").desc, col("doc_id").asc))
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang")
    }),

    // MinHash+LSH near-dup pairs, exact-Jaccard verified at 0.8.
    "q24_minhash_neardup" -> ((s, dir) => {
      Dedup.lshNearDupPairs(docs(s, dir), "doc_id", "text", threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // Exact blocked n-gram Jaccard (same-language pairs, j ≥ 0.3).
    "q25_ngram_jaccard" -> ((s, dir) => {
      Dedup.blockedJaccardPairs(docs(s, dir), "doc_id", "text",
          Seq("lang"), threshold = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // SimHash exactness gate (the q66 pattern, AS the driver entry): the
    // banded pigeonhole join GUARANTEES that the emitted pair set equals
    // brute-force all-pairs hamming ≤ 3 over the same fingerprints
    // (4 disjoint 16-bit chunks ⇒ any pair within hamming 3 collides on
    // ≥ 1 chunk; exact hamming verify removes false positives). The
    // query materializes the symmetric difference of the two paths —
    // its oracle is the EMPTY relation, so any banding bug (missed
    // chunk, dropped dedup, filter drift) turns into a row-count
    // mismatch in the driver's gate rather than a silent recall loss.
    // SimHash values are engine-internal, which is why the raw pair
    // list cannot be SQL-oracled; set equality of two independent
    // formulations is the next-strongest deterministic gate. (DedupSpec
    // additionally pins planted-pair recall on the raw pair list.)
    "q26_simhash_neardup" -> ((s, dir) => simhashDiff(docs(s, dir), 3)),

    // Same gate in the STRICT regime (hamming ≤ 1): at this radius the
    // banded candidate set still admits chance chunk collisions up to
    // hamming 63, so the diff staying empty additionally proves the
    // exact-hamming verify prunes — the filter-drift failure mode the
    // radius-3 gate exercises only weakly.
    "q66_simhash_exactness" -> ((s, dir) => simhashDiff(docs(s, dir), 1)),

    // Benchmark decontamination: docs sharing any 8-gram with the
    // held-out benchmark slice (doc_id % 10 == 0), with the count of
    // distinct offending grams. Bench fingerprints broadcast; corpus
    // text never shuffled.
    "q59_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationHits(
          corpus = d.filter(col("doc_id") % 10 =!= 0),
          bench = d.filter(col("doc_id") % 10 === 0),
          idCol = "doc_id", textCol = "text", n = 8)
        .orderBy("doc_id")
    }),

    // Incremental NEAR-dup dedup (q96's daily-increment regime, LSH
    // semantics): batch docs with a >= 0.8-Jaccard neighbor in history
    // are dropped — the boilerplate-edited near-copies exact hashing
    // (q96/q99) never catches. Candidates come from the batch-keys ×
    // history-keys band join (|batch|-bounded, never a self-join);
    // exact-Jaccard verify on the candidates only. The oracle is the
    // exact NOT-EXISTS over string shingles, which the banded path
    // matches deterministically in this corpus's near-dup regime
    // (planted pairs sit far above the band S-curve midpoint).
    "q111_lsh_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.lshNewAgainstHistory(
          history = d.filter(col("doc_id") % 3 =!= 0),
          batch = d.filter(col("doc_id") % 2 === 0),
          idCol = "doc_id", textCol = "text", threshold = 0.8)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // PERSISTED LSH INDEX — the standing admission gate q111 re-derives
    // per call: the history's MinHash band keys and shingle sets are
    // stored ONCE (bucket-partitioned `keys/`, part-partitioned
    // `sets/`, model in the meta file), a batch probes only its own
    // band buckets, and survivors APPEND under the persisted model.
    // In-gate: layout path ≡ the in-flight lshNewAgainstHistory
    // (DIVERGED), and after appending the survivors a re-probe of the
    // same docs finds every one a stored dup of itself
    // (APPEND_BROKEN — the incremental half, end to end). Shares
    // q111's true-Jaccard DuckDB oracle.
    "q383_lsh_layout_gate" -> ((s, dir) => {
      import graft.operators.LshLayout
      val d = docs(s, dir)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lsh_layout").toString
      val history = d.filter(col("doc_id") % 3 =!= 0)
      val batch = d.filter(col("doc_id") % 2 === 0)
      val sel = Seq("doc_id", "lang", "source", "n_chars")
      // the layout chain (build -> probe) and the in-flight reference
      // read disjoint state — overlap them; both results materialize
      // once because each feeds two consumers below
      val (kept, ref) = GateOps.par2(
        () => {
          LshLayout.writeLshLayout(history, "doc_id", "text", tmp)
          LshLayout.dedupAgainstLayout(tmp, batch, "doc_id",
            "text", threshold = 0.8).select(sel.map(col): _*)
            .localCheckpoint(true)
        },
        () => Dedup.lshNewAgainstHistory(history, batch, "doc_id",
          "text", threshold = 0.8).select(sel.map(col): _*))
      LshLayout.appendLshLayout(tmp,
        d.join(kept.select("doc_id"), Seq("doc_id")), "doc_id", "text")
      // both referees read only pinned relations (kept/ref) or the
      // post-append layout, which nothing mutates after this point —
      // lazy sentinels in the one final job
      val diverged = kept.exceptAll(ref).unionAll(ref.exceptAll(kept))
      val appendBroken = LshLayout.dedupAgainstLayout(tmp,
        d.join(kept.select("doc_id"), Seq("doc_id")), "doc_id", "text",
        threshold = 0.8)
      def viol(probe: org.apache.spark.sql.DataFrame, name: String) =
        GateOps.sentinel(probe, lit(-1L).as("doc_id"),
          lit(name).as("lang"), lit("").as("source"),
          lit(-1L).as("n_chars"))
      kept
        .unionByName(viol(diverged, "DIVERGED"))
        .unionByName(viol(appendBroken, "APPEND_BROKEN"))
        .orderBy("doc_id")
    }),

    // RIGHT-TO-BE-FORGOTTEN over the persisted LSH index — the index
    // half of the q177 purge story: deleting a document's raw text
    // while its shingle-hash sets and band keys live on in the
    // admission index is not a deletion (fingerprints are
    // content-derived data). The gate builds the layout over the FULL
    // corpus, purges the victim ids (victim-partition rewrite in both
    // substores), and then (a) censuses both substores for victim
    // traces (CENSUS_* sentinels — must be zero rows) and (b) probes
    // with the full corpus: survivors still self-match (the purge must
    // not damage untouched entries), while a victim can only match
    // through a SURVIVING near-dup — its own fingerprints are gone. So
    // the admitted set is exactly "docs with no >= 0.8 neighbor among
    // survivors", which the oracle restates in exact string-shingle
    // Jaccard (the q111 recall argument: self-matches share every
    // band, planted near-dups sit far above the band S-curve midpoint).
    "q385_lsh_purge_gate" -> ((s, dir) => {
      import graft.operators.LshLayout
      val d = docs(s, dir)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lsh_purge").toString
      // the layout build and the victim-id census are independent —
      // overlap them; the purge needs both
      val (_, victimIds) = GateOps.par2(
        () => LshLayout.writeLshLayout(d, "doc_id", "text", tmp),
        () => d.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").cast("long"))
          .collect().map(_.getLong(0)).toSeq)
      LshLayout.purge(s, tmp, victimIds)
      // nothing mutates the layout after the purge — the two substore
      // censuses ride the final job as lazy sentinels instead of two
      // driver-blocking count() actions
      val leftKeys = s.read.parquet(s"$tmp/keys")
        .filter(col("id").isInCollection(victimIds))
      val leftSets = s.read.parquet(s"$tmp/sets")
        .filter(col("id").isInCollection(victimIds))
      val admitted = LshLayout.dedupAgainstLayout(tmp, d, "doc_id",
          "text", threshold = 0.8)
        .select("doc_id", "lang", "source", "n_chars")
      def viol(probe: org.apache.spark.sql.DataFrame, name: String) =
        GateOps.sentinel(probe, lit(-1L).as("doc_id"),
          lit(name).as("lang"), lit("").as("source"),
          lit(-1L).as("n_chars"))
      admitted
        .unionByName(viol(leftKeys, "CENSUS_KEYS"))
        .unionByName(viol(leftSets, "CENSUS_SETS"))
        .orderBy("doc_id")
    }),

    // Duplicate-span profile (ExactSubstr): per doc, the merged [start,
    // end) word intervals covered by cross-document duplicated 8-grams —
    // the spans a span-level dedup pass excises. Text never shuffles
    // (positional grams travel as 8-byte hashes); interval merge is a
    // per-doc gaps-and-islands window.
    "q112_duplicate_spans" -> ((s, dir) => {
      Dedup.duplicateSpans(docs(s, dir), "doc_id", "text", n = 8)
        .orderBy("doc_id", "span_start")
    }),

    // Span excision (the ExactSubstr scrub): remove every q112 span and
    // reassemble the remainder — keeps the novel tail of partially-
    // boilerplate docs instead of dropping them whole. One id-keyed
    // exchange attaches each doc's edit list; the rewrite is a map-side
    // codegen'd higher-order filter.
    "q113_span_excision" -> ((s, dir) => {
      Dedup.exciseDuplicateSpans(docs(s, dir), "doc_id", "text", n = 8)
        .select("doc_id", "clean_text", "n_kept")
        .orderBy("doc_id")
    }),

    // Bloom-prefiltered incremental dedup: q96's exact semantics, but
    // only the sketch-positive slice of the batch pays the anti-join
    // exchange (no false negatives ⇒ negatives are provably new). Full
    // hash gate — sketch quality affects cost, never output.
    "q116_bloom_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.bloomNewAgainstHistory(
          history = d.filter(col("doc_id") % 3 =!= 0),
          batch = d.filter(col("doc_id") % 2 === 0),
          textCol = "text", expectedItems = 1L << 16)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Cross-source contamination matrix: pairwise gram-set Jaccard
    // between sources. No gram self-join — per-gram collect_set is
    // bounded by the group count, pairs expand map-side; nothing wider
    // than (tag, 8-byte hash) shuffles.
    "q114_source_overlap" -> ((s, dir) => {
      Dedup.crossCorpusOverlap(docs(s, dir), "source", "text", n = 8)
        .orderBy("src_a", "src_b")
    }),

    // Streaming twin of q111: docs arrive as a file stream, sketch
    // map-side, band-join the STATIC history (stateless — re-planned
    // per micro-batch), verify with exact Jaccard, fold per doc. On the
    // bounded drain the kept set equals the batch operator's, so it
    // shares q111's exact string-shingle oracle.
    "q118_stream_lsh_incremental" -> ((s, dir) =>
      graft.streaming.DocumentStreams
        .streamingLshNewAgainstHistory(s, dir, threshold = 0.8)
        .orderBy("doc_id")),

    // Streaming chunk-store maintenance (the q134 containment flow as
    // an ingestion stream): arriving docs chunk map-side, anti-join the
    // static chunk store statelessly, and the per-doc new-chunk delta
    // is what a pipeline appends to the store each batch. Bounded drain
    // ≡ the batch formulation (the q134 CTE flipped to NEW chunks).
    "q139_stream_new_chunks" -> ((s, dir) =>
      graft.streaming.DocumentStreams.streamingNewChunks(s, dir)),

    // Streaming twin of q113: arriving docs attach their edit list from
    // the static span store (stateless stream-static join) and excise
    // in-flight with the same codegen rewrite. Bounded drain ≡ the
    // batch scrub, so it shares q113's oracle.
    "q153_stream_excise_spans" -> ((s, dir) =>
      graft.streaming.DocumentStreams.streamingExciseSpans(s, dir)),

    // Streaming twin of q59: benchmark gram fingerprints stay static,
    // arriving docs shingle map-side and the stateless stream-static
    // join counts contaminated grams per doc — the admission check a
    // pipeline runs on every ingest batch before docs reach the corpus.
    // Bounded drain ≡ batch contaminationHits, so it shares q59's exact
    // string-gram oracle.
    "q180_stream_contamination" -> ((s, dir) =>
      graft.streaming.DocumentStreams.streamingContamination(s, dir, n = 8)),

    // End-to-end curation pipeline — the composite a training-data run
    // actually executes, as ONE dataflow: (1) admission filter (length
    // floor, benchmark split held out), (2) near-dup drop (verified LSH
    // pairs; a doc with a >= 0.8-Jaccard smaller-id neighbor is dropped
    // — recall-exact in this corpus regime, q24's argument), (3)
    // decontamination (any shared 8-gram with the benchmark split
    // disqualifies), (4) temperature-mixed per-language token budgets
    // (q179). Each stage is a previously-gated operator; the gate here
    // is the COMPOSITION — one oracle restates all four stages over
    // exact string grams end to end. At sf0.01: 316 admitted, 12
    // near-dup dropped, 4 contaminated dropped, then the sqrt-budget
    // cap selects per language.
    "q181_curation_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.filter(col("doc_id") % 10 =!= 0 && col("n_chars") >= 200)
      val pairs = Dedup.lshNearDupPairs(base, "doc_id", "text", threshold = 0.8)
      val deduped = base.join(
        pairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      val hits = Dedup.contaminationHits(deduped,
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 8)
      val clean = deduped.join(hits.select("doc_id"), Seq("doc_id"), "left_anti")
      val withTok = clean.withColumn("n_tokens",
        size(split(col("text"), " ")).cast("bigint"))
      graft.operators.Packing.temperatureMix(withTok, "lang", "doc_id",
          "n_tokens", totalBudget = 9000, binSize = 100)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("cum_tokens"), col("grp_budget"))
        .orderBy("doc_id")
    }),

    // Streaming admission pipeline — q181's curation concept at the
    // ingestion door, one streaming dataflow: exact-dup drop vs
    // history (stateless anti-join), benchmark contamination check
    // (stateless gram join + per-doc fold), PII scrub on the admitted
    // set. All three stages previously gated solo (q96/q99, q59/q180,
    // q104/q185); the gate here is the streaming COMPOSITION against
    // one oracle restating all three over the batch table.
    "q203_stream_admission" -> ((s, dir) =>
      graft.streaming.DocumentStreams.streamingAdmissionPipeline(s, dir)),

    // Curation-pipeline observability — q181's flagship composition
    // instrumented: one summary row per stage (docs and tokens
    // surviving admission → near-dup drop → decontamination → budget
    // selection), the run report a pipeline owner actually reads and
    // the alarm surface for silent stage regressions (a dedup pass
    // suddenly dropping 40% is a bug long before the model notices).
    // Each stage count is one aggregate over the already-priced q181
    // dataflow; the oracle restates the stage CTE chain with counts.
    "q200_pipeline_stage_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.filter(col("doc_id") % 10 =!= 0 && col("n_chars") >= 200)
      val pairs = Dedup.lshNearDupPairs(base, "doc_id", "text", threshold = 0.8)
      val deduped = base.join(
        pairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      val hits = Dedup.contaminationHits(deduped,
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 8)
      val clean = deduped.join(hits.select("doc_id"), Seq("doc_id"), "left_anti")
      val withTok = clean.withColumn("n_tokens",
        size(split(col("text"), " ")).cast("bigint"))
      val selected = graft.operators.Packing.temperatureMix(withTok, "lang",
        "doc_id", "n_tokens", totalBudget = 9000, binSize = 100)
      def stage(ord: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(size(split(col("text"), " ")).cast("bigint")), lit(0L))
              .as("n_tokens"))
          .select(lit(ord.toLong).as("stage"), lit(name).as("stage_name"),
            col("n_docs"), col("n_tokens"))
      stage(1, "admitted", base)
        .unionAll(stage(2, "after_neardup", deduped))
        .unionAll(stage(3, "after_decontam", clean))
        .unionAll(stage(4, "selected", selected))
        .orderBy("stage")
    }),

    // Cross-document repeated-gram profile (ExactSubstr-lite): per doc,
    // the fraction of its distinct word 8-grams shared with any other
    // document — the span-level duplication diagnostic. Grams shuffle as
    // 8-byte hashes only (text stays put); the string-level oracle
    // adjudicates hash-for-string equality like q59's.
    "q103_repeated_grams" -> ((s, dir) => {
      Dedup.repeatedGramProfile(docs(s, dir), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // Per-doc novelty (data valuation): the fraction of a doc's
    // distinct 8-grams whose canonical first occurrence (min doc_id)
    // is this doc — ranks candidate additions by how much genuinely
    // new content they carry. Grams shuffle as 8-byte hashes only;
    // the string-level oracle adjudicates hash-for-string equality.
    "q190_novelty_profile" -> ((s, dir) => {
      Dedup.noveltyProfile(docs(s, dir), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // Sorted-neighborhood near-dup candidates: block on a 16-char
    // normalized prefix, sort within block, Levenshtein over a 120-char
    // probe against the next 3 sort neighbors only — the linear-work
    // record-linkage alternative to LSH (shuffle on block key, constant
    // comparisons per row).
    "q86_sorted_neighborhood" -> ((s, dir) => {
      Dedup.sortedNeighborhoodPairs(docs(s, dir), "doc_id", "text",
          blockLen = 16, probeLen = 120, window = 4, maxDist = 20)
        .orderBy("id_a", "id_b")
    }),

    // Incremental dedup against an append-only history (the daily-batch
    // pattern): history reduces map-side to distinct 8-byte content
    // fingerprints — its text never shuffles — and the batch anti-joins
    // on the fingerprint. Output is exact (hash pre-check, string-level
    // oracle); doc_id%3 history vs doc_id%2 batch gives a ~2/3-duplicate
    // batch, the realistic crawl-increment regime.
    "q96_incremental_new" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.newAgainstHistory(
          history = d.filter(col("doc_id") % 3 =!= 0),
          batch = d.filter(col("doc_id") % 2 === 0),
          textCol = "text")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // Near-dup clusters: LSH pairs → connected components → the
    // representative (min id) a dedup pass would keep per cluster.
    "q43_neardup_components" -> ((s, dir) => {
      val pairs = Dedup.lshNearDupPairs(docs(s, dir), "doc_id", "text", threshold = 0.8)
      Dedup.nearDupComponents(pairs).orderBy("doc_id")
    }),

    // LEAKAGE-SAFE train/heldout split: q45's deterministic hash split,
    // but keyed on the NEAR-DUP COMPONENT representative instead of the
    // doc id — near-duplicate documents land on the SAME side, so the
    // heldout set can't be contaminated by a train-side twin (the
    // eval-integrity bug naive random splits ship at every scale).
    // Composition: LSH pairs → connected components → rep; singletons
    // (no pair) are their own rep via the null-safe coalesce.
    "q144_leakage_safe_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val comps = Dedup.nearDupComponents(
        Dedup.lshNearDupPairs(d, "doc_id", "text", threshold = 0.8))
      d.select(col("doc_id"))
        .join(comps.select(col("doc_id"), col("rep_id")), Seq("doc_id"), "left")
        .withColumn("rep_id", coalesce(col("rep_id"), col("doc_id")))
        .withColumn("split",
          when(TextQueries.docHash(col("rep_id")) % 10 < 8, lit("train"))
            .otherwise(lit("heldout")))
        .select("doc_id", "rep_id", "split")
        .orderBy("doc_id")
    }),

    // Content-defined chunking (Rabin/FastCDC family): boundaries where
    // the 8-codepoint rolling hash ≡ 0 (mod 64) — shift-robust
    // sub-document units (an early edit realigns at the next content
    // boundary, unlike fixed-width chunks), the storage-dedup
    // counterpart of q112's exact duplicated spans. The `CdcChunks`
    // kernel is one codepoint pass per row, map-side; the oracle
    // rebuilds the identical chunk relation with list_reduce over
    // codepoint slices (same base-31/mod-1e9+7 arithmetic), so the
    // whole relation takes a FULL hash gate.
    "q132_cdc_chunks" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          explode(graft.expressions.TextOps.cdcChunks(col("text"), 8, 64))
            .as("c"))
        .select(col("doc_id"), col("c.chunk_no").as("chunk_no"),
          col("c.c_start").as("c_start"), col("c.c_len").as("c_len"),
          col("c.fp").as("fp"))
        .orderBy("doc_id", "chunk_no")
    }),

    // Incremental containment at CHUNK granularity: how much of each
    // new-batch document already exists in the history, measured over
    // content-defined chunk occurrences — the sub-document sibling of
    // q96's whole-text anti-join (a doc that is 90% recycled boilerplate
    // with a fresh header passes q96 but is caught here). Scale shape:
    // the chunk relation is checkpointed once (two consumers), the join
    // carries only 16-byte (fp, c_len) keys — text never reshuffles.
    "q134_chunk_containment" -> ((s, dir) => {
      val chunks = docs(s, dir).select(col("doc_id"),
          explode(graft.expressions.TextOps.cdcChunks(col("text"), 8, 64))
            .as("c"))
        .select(col("doc_id"), col("c.c_len").as("c_len"), col("c.fp").as("fp"))
        .localCheckpoint(true)
      val hist = chunks.filter(col("doc_id") % 3 =!= 0)
        .select("fp", "c_len").distinct()
      chunks.filter(col("doc_id") % 2 === 0)
        .join(hist.withColumn("hit", lit(1L)), Seq("fp", "c_len"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("containment",
          round(col("n_hit") / col("n_chunks").cast("double"), 6))
        .withColumn("mostly_dup", col("n_hit") >= col("n_chunks") * 0.5)
        .orderBy("doc_id")
    }),

    // Cross-document shared-chunk profile over the CDC relation — the
    // dedup report storage systems run on content-defined chunks:
    // fingerprint groups seen in ≥ 2 docs, with occurrence and
    // distinct-doc counts. One chunk-keyed aggregation; the chunk
    // relation itself never re-reads text.
    "q133_chunk_dedup" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          explode(graft.expressions.TextOps.cdcChunks(col("text"), 8, 64))
            .as("c"))
        .select(col("doc_id"), col("c.c_len").as("c_len"), col("c.fp").as("fp"))
        .groupBy(col("fp"), col("c_len"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .orderBy("fp", "c_len")
    }),

    // Chunk-level re-embedding diff (embedding-cache invalidation):
    // after an edit lands, WHICH sub-document chunks need their
    // embeddings recomputed? Content-defined chunking localizes the
    // answer — an edit at the head of a document realigns at the next
    // content boundary, so only the chunk(s) spanning the edit change
    // fingerprints and the rest of the doc's embedding cache stays
    // valid (fixed-width chunking would shift-invalidate EVERYTHING
    // after the edit; that contrast is the point of CDC, pinned by the
    // q132 shift-robustness spec). Fixture: every 10th doc gets a
    // 5-char prepend; the diff joins 16-byte (fp, c_len) keys per doc
    // — text never reshuffles — and emits per edited doc the chunk
    // count, the invalidated count, and the surviving-cache fraction.
    "q178_chunk_reembed_diff" -> ((s, dir) => {
      import graft.expressions.TextOps
      def chunksOf(d: DataFrame) = d.select(col("doc_id"),
          explode(TextOps.cdcChunks(col("text"), 8, 64)).as("c"))
        .select(col("doc_id"), col("c.fp").as("fp"), col("c.c_len").as("c_len"))
      val v1 = chunksOf(docs(s, dir)).distinct()
      val v2 = chunksOf(docs(s, dir).withColumn("text",
        when(col("doc_id") % 10 === 0, concat(lit("edit "), col("text")))
          .otherwise(col("text"))))
      v2.join(v1.withColumn("old", lit(1L)), Seq("doc_id", "fp", "c_len"),
          "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("old").isNull, 1L).otherwise(0L)).as("n_new"))
        .filter(col("n_new") > 0)
        .withColumn("reuse_frac_ppm",
          expr("(n_chunks - n_new) * 1000000 div n_chunks"))
        .orderBy("doc_id")
    }),

    // Contamination n-gram-length sweep — the tuning argument every
    // decontamination pipeline has (8? 13? 20?), gated on the
    // SUBSTRING-NESTING THEOREM: restricted to docs with ≥ 13 words on
    // both sides (so no whole-text fallback muddies the domain), a
    // corpus document sharing a 13-gram with the benchmark necessarily
    // shares that gram's leading 8-gram, and an 8-gram hit implies a
    // 4-gram hit — so the flagged-document SETS nest as n shrinks:
    // hits(13) ⊆ hits(8) ⊆ hits(4). The gate emits violations of
    // either inclusion (a shingle/hash/join bug surfaces as rows);
    // non-vacuity (shorter n genuinely flags MORE) pins in DedupSpec.
    "q297_contamination_sweep" -> ((s, dir) => {
      import graft.functions.TextFunctions.words
      val d = docs(s, dir).filter(col("text").isNotNull)
        .filter(size(words(col("text"))) >= 13)
      val corpus = d.filter(col("doc_id") % 10 =!= 0)
      val bench = d.filter(col("doc_id") % 10 === 0)
      def hitsAt(n: Int) =
        Dedup.contaminationHits(corpus, bench, "doc_id", "text", n)
          .select(col("doc_id"))
      val h4 = hitsAt(4)
      val h8 = hitsAt(8)
      val h13 = hitsAt(13)
      h13.exceptAll(h8).withColumn("step", lit("13_vs_8"))
        .unionByName(h8.exceptAll(h4).withColumn("step", lit("8_vs_4")))
        .select("step", "doc_id")
        .orderBy("step", "doc_id")
    }),

    // MinHash band-sweep gate — the LSH tuning curve (q287's sweep
    // discipline applied to dedup), gated on the NESTED-BAND THEOREM
    // rather than a recall sample: with one 64-perm signature, every
    // band of the (b=4, r=16) layout is the concatenation of two
    // (b=8, r=8) bands, which are each two (b=16, r=4) bands — so a
    // pair colliding on a long band necessarily collides on its
    // sub-bands, and after the (shared) exact-Jaccard verify the
    // emitted pair SETS must nest: pairs(4) ⊆ pairs(8) ⊆ pairs(16).
    // The gate emits every pair violating either inclusion — a banding,
    // salting, or dedup bug surfaces as rows. Oracle: empty. The
    // threshold (0.5) and shared verify keep precision identical
    // across configs, so only the candidate sets can differ.
    "q292_lsh_band_sweep" -> ((s, dir) => {
      def pairsAt(bands: Int) =
        Dedup.lshNearDupPairs(docs(s, dir), "doc_id", "text",
            threshold = 0.5, numPerm = 64, bands = bands)
          .select(col("id_a"), col("id_b"))
      val p4 = pairsAt(4)
      val p8 = pairsAt(8)
      val p16 = pairsAt(16)
      p4.exceptAll(p8).withColumn("step", lit("4_vs_8"))
        .unionByName(p8.exceptAll(p16).withColumn("step", lit("8_vs_16")))
        .select("step", "id_a", "id_b")
        .orderBy("step", "id_a", "id_b")
    })
  )

  /** The q132 chunk chain parameterized on its source CTE and a name
    * suffix, so an oracle can chunk TWO corpus versions side by side
    * (q178 diffs them). `cdcCte` below keeps the original names.
    */
  private def cdcChain(src: String, x: String): String =
    s"""c$x AS (SELECT doc_id, length(text) AS n,
       |    list_transform(range(1, length(text) + 1),
       |      p -> CAST(unicode(substr(text, CAST(p AS INT), 1)) AS BIGINT))
       |      AS codes
       |  FROM $src),
       | b$x AS (SELECT doc_id, n, codes,
       |    list_filter(range(8, n + 1),
       |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i-7:i]),
       |             (a, x) -> (a * 31 + x) % 1000000007) % 64 = 0) AS bnds
       |  FROM c$x),
       | s$x AS (SELECT doc_id, n, codes,
       |    list_sort(list_distinct(list_prepend(CAST(1 AS BIGINT),
       |      list_transform(list_filter(bnds, x -> x < n), x -> x + 1))))
       |      AS starts
       |  FROM b$x),
       | ch$x AS (SELECT doc_id, n, codes, starts,
       |    unnest(range(1, len(starts) + 1)) AS k
       |  FROM s$x),
       | cdc$x AS (SELECT doc_id, k AS chunk_no, starts[k] AS c_start,
       |    (CASE WHEN k < len(starts) THEN starts[k+1] ELSE n + 1 END)
       |      - starts[k] AS c_len,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      codes[starts[k]:(CASE WHEN k < len(starts) THEN starts[k+1]
       |        ELSE n + 1 END) - 1]),
       |      (a, x) -> (a * 31 + x) % 1000000007) AS fp
       |  FROM ch$x)""".stripMargin

  /** Shared oracle CTE: the CDC chunk relation, rebuilt from codepoint
    * slices with the kernel's exact arithmetic (base-31 rolling hash
    * mod 1e9+7 over an 8-codepoint window, boundary at h % 64 == 0,
    * final partial chunk always emitted).
    */
  private val cdcCte =
    """WITH c AS (SELECT doc_id, length(text) AS n,
      |    list_transform(range(1, length(text) + 1),
      |      p -> CAST(unicode(substr(text, CAST(p AS INT), 1)) AS BIGINT))
      |      AS codes
      |  FROM documents),
      | b AS (SELECT doc_id, n, codes,
      |    list_filter(range(8, n + 1),
      |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i-7:i]),
      |             (a, x) -> (a * 31 + x) % 1000000007) % 64 = 0) AS bnds
      |  FROM c),
      | s AS (SELECT doc_id, n, codes,
      |    list_sort(list_distinct(list_prepend(CAST(1 AS BIGINT),
      |      list_transform(list_filter(bnds, x -> x < n), x -> x + 1))))
      |      AS starts
      |  FROM b),
      | ch AS (SELECT doc_id, n, codes, starts,
      |    unnest(range(1, len(starts) + 1)) AS k
      |  FROM s),
      | cdc AS (SELECT doc_id, k AS chunk_no, starts[k] AS c_start,
      |    (CASE WHEN k < len(starts) THEN starts[k+1] ELSE n + 1 END)
      |      - starts[k] AS c_len,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      codes[starts[k]:(CASE WHEN k < len(starts) THEN starts[k+1]
      |        ELSE n + 1 END) - 1]),
      |      (a, x) -> (a * 31 + x) % 1000000007) AS fp
      |  FROM ch)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q178_chunk_reembed_diff" ->
      s"""WITH p AS (SELECT doc_id,
         |    CASE WHEN doc_id % 10 = 0 THEN 'edit ' || text ELSE text END
         |      AS text
         |  FROM documents),
         | ${cdcChain("documents", "1")},
         | ${cdcChain("p", "2")}
         |SELECT d2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN d1.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new,
         |  CAST((COUNT(*) - SUM(CASE WHEN d1.fp IS NULL THEN 1 ELSE 0
         |    END)) * 1000000 // COUNT(*) AS BIGINT) AS reuse_frac_ppm
         |FROM cdc2 d2
         |LEFT JOIN (SELECT DISTINCT doc_id, fp, c_len FROM cdc1) d1
         |  ON d2.doc_id = d1.doc_id AND d2.fp = d1.fp
         |    AND d2.c_len = d1.c_len
         |GROUP BY 1
         |HAVING SUM(CASE WHEN d1.fp IS NULL THEN 1 ELSE 0 END) > 0
         |ORDER BY 1""".stripMargin,
    "q132_cdc_chunks" -> (cdcCte +
      """
        |SELECT doc_id, chunk_no, c_start, c_len, fp
        |FROM cdc ORDER BY doc_id, chunk_no""".stripMargin),
    "q133_chunk_dedup" -> (cdcCte +
      """
        |SELECT fp, c_len, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM cdc GROUP BY 1, 2
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY fp, c_len""".stripMargin),
    "q139_stream_new_chunks" -> (cdcCte +
      """
        |, hist AS (SELECT DISTINCT fp, c_len FROM cdc WHERE doc_id % 3 <> 0),
        | batch AS (SELECT doc_id, fp, c_len FROM cdc WHERE doc_id % 2 = 0),
        | nw AS (SELECT b.doc_id FROM batch b
        |        ANTI JOIN hist h ON b.fp = h.fp AND b.c_len = h.c_len)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new_chunks
        |FROM nw GROUP BY 1 ORDER BY doc_id""".stripMargin),
    "q134_chunk_containment" -> (cdcCte +
      """
        |, hist AS (SELECT DISTINCT fp, c_len FROM cdc WHERE doc_id % 3 <> 0),
        | batch AS (SELECT doc_id, fp, c_len FROM cdc WHERE doc_id % 2 = 0),
        | j AS (SELECT b.doc_id,
        |         CASE WHEN h.fp IS NOT NULL THEN 1 ELSE 0 END AS hit
        |       FROM batch b
        |       LEFT JOIN hist h ON b.fp = h.fp AND b.c_len = h.c_len)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(hit) AS BIGINT) AS n_hit,
        |  ROUND(SUM(hit) / CAST(COUNT(*) AS DOUBLE), 6) AS containment,
        |  (SUM(hit) >= COUNT(*) * 0.5) AS mostly_dup
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin),
    "q22_dedup_exact" ->
      """SELECT lang, source, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q23_dedup_keep_first" ->
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY lang""".stripMargin,
    "q24_minhash_neardup" -> (shingleCte +
      """
        |, p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM p
        |WHERE j >= 0.8 ORDER BY 1,2""".stripMargin),
    "q25_ngram_jaccard" -> (shingleCte +
      """
        |, p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id AND a.lang = b.lang)
        |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM p
        |WHERE j >= 0.3 ORDER BY 1,2""".stripMargin),
    // q26/q66 pin banded == brute-force to the empty diff (radius 3 and
    // the strict radius-1 regime); the oracle is the empty relation.
    "q26_simhash_neardup" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
        |  CAST(NULL AS BIGINT) AS hamming, CAST(NULL AS VARCHAR) AS side
        |WHERE FALSE""".stripMargin,
    "q66_simhash_exactness" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
        |  CAST(NULL AS BIGINT) AS hamming, CAST(NULL AS VARCHAR) AS side
        |WHERE FALSE""".stripMargin,
    "q59_decontaminate" -> decontaminateOracle,
    // The streaming admission check drains to the same per-doc hit
    // counts on bounded input — one oracle for both execution modes.
    "q180_stream_contamination" -> decontaminateOracle,
    // q96's NOT-EXISTS + q59's exact string grams + q104's RE2 scrub,
    // composed over the batch table.
    "q203_stream_admission" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | g AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |      list_transform(range(len(w)-7), i -> array_to_string(w[i+1:i+8], ' '))
        |    ELSE [array_to_string(w, ' ')] END AS gs
        |  FROM t),
        | bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g
        |   WHERE doc_id % 10 = 0),
        | cg AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM g),
        | cont AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bench USING (gram)),
        | adm AS (SELECT b.* FROM documents b
        |  WHERE b.doc_id % 2 = 0 AND b.doc_id % 10 <> 0
        |    AND NOT EXISTS (SELECT 1 FROM documents h
        |      WHERE h.doc_id % 3 <> 0 AND h.text = b.text)
        |    AND b.doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT doc_id, lang, source, n_chars,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{9,}\b', '<NUM>', 'g')) AS clean_md5
        |FROM adm ORDER BY doc_id""".stripMargin,
    // q181's stage chain with counts per stage.
    "q200_pipeline_stage_report" ->
      """WITH base AS (SELECT doc_id, lang, text FROM documents
        |   WHERE doc_id % 10 <> 0 AND n_chars >= 200),
        | sh AS (SELECT doc_id, lang, text,
        |    (SELECT CASE WHEN len(w) >= 3 THEN
        |        list_distinct(list_transform(range(len(w)-2),
        |          i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
        |      ELSE [text] END
        |     FROM (SELECT string_split(text, ' ') AS w)) AS sh
        |   FROM base),
        | nd AS (SELECT DISTINCT b.doc_id FROM sh b JOIN sh a
        |   ON a.doc_id < b.doc_id
        |     AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |       / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        |       >= 0.8),
        | dd AS (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
        | wdd AS (SELECT doc_id, string_split(text, ' ') AS w FROM dd),
        | gdd AS (SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |     list_transform(range(len(w)-7),
        |       i -> array_to_string(w[i+1:i+8], ' '))
        |   ELSE [array_to_string(w, ' ')] END AS gs FROM wdd),
        | wb AS (SELECT string_split(text, ' ') AS w FROM documents
        |   WHERE doc_id % 10 = 0),
        | gb AS (SELECT CASE WHEN len(w) >= 8 THEN
        |     list_transform(range(len(w)-7),
        |       i -> array_to_string(w[i+1:i+8], ' '))
        |   ELSE [array_to_string(w, ' ')] END AS gs FROM wb),
        | bench AS (SELECT DISTINCT unnest(gs) AS gram FROM gb),
        | cont AS (SELECT DISTINCT doc_id FROM
        |   (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM gdd) c
        |   JOIN bench USING (gram)),
        | clean AS (SELECT d.* FROM dd d
        |   WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
        | t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |   FROM clean),
        | tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS total
        |   FROM t GROUP BY 1),
        | w2 AS (SELECT lang, CAST(FLOOR(SQRT(total)) AS BIGINT) AS w FROM tot),
        | b2 AS (SELECT lang, CAST(9000 * w //
        |     (SELECT CAST(SUM(w) AS BIGINT) FROM w2) AS BIGINT) AS grp_budget
        |   FROM w2),
        | c2 AS (SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM t),
        | sel AS (SELECT c2.doc_id, c2.n_tokens FROM c2 JOIN b2 USING (lang)
        |   WHERE c2.cum_tokens <= b2.grp_budget)
        |SELECT CAST(1 AS BIGINT) AS stage, 'admitted' AS stage_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
        |    AS n_tokens FROM base
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'after_neardup', CAST(COUNT(*) AS BIGINT),
        |  CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT) FROM dd
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'after_decontam', CAST(COUNT(*) AS BIGINT),
        |  CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
        |  FROM clean
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), 'selected', CAST(COUNT(*) AS BIGINT),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM sel
        |ORDER BY stage""".stripMargin,
    // All four pipeline stages restated over exact string grams; the
    // near-dup stage assumes 100% band recall (q24's planted-pair
    // argument) and the budget arithmetic is q179's (floor(sqrt) +
    // integer division — bit-reproducible).
    "q181_curation_pipeline" ->
      """WITH base AS (SELECT doc_id, lang, text FROM documents
        |   WHERE doc_id % 10 <> 0 AND n_chars >= 200),
        | sh AS (SELECT doc_id, lang, text,
        |    (SELECT CASE WHEN len(w) >= 3 THEN
        |        list_distinct(list_transform(range(len(w)-2),
        |          i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
        |      ELSE [text] END
        |     FROM (SELECT string_split(text, ' ') AS w)) AS sh
        |   FROM base),
        | nd AS (SELECT DISTINCT b.doc_id FROM sh b JOIN sh a
        |   ON a.doc_id < b.doc_id
        |     AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |       / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        |       >= 0.8),
        | dd AS (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
        | wdd AS (SELECT doc_id, string_split(text, ' ') AS w FROM dd),
        | gdd AS (SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |     list_transform(range(len(w)-7),
        |       i -> array_to_string(w[i+1:i+8], ' '))
        |   ELSE [array_to_string(w, ' ')] END AS gs FROM wdd),
        | wb AS (SELECT string_split(text, ' ') AS w FROM documents
        |   WHERE doc_id % 10 = 0),
        | gb AS (SELECT CASE WHEN len(w) >= 8 THEN
        |     list_transform(range(len(w)-7),
        |       i -> array_to_string(w[i+1:i+8], ' '))
        |   ELSE [array_to_string(w, ' ')] END AS gs FROM wb),
        | bench AS (SELECT DISTINCT unnest(gs) AS gram FROM gb),
        | cont AS (SELECT DISTINCT doc_id FROM
        |   (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM gdd) c
        |   JOIN bench USING (gram)),
        | clean AS (SELECT d.* FROM dd d
        |   WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
        | t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |   FROM clean),
        | tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS total
        |   FROM t GROUP BY 1),
        | w2 AS (SELECT lang, CAST(FLOOR(SQRT(total)) AS BIGINT) AS w FROM tot),
        | b2 AS (SELECT lang, CAST(9000 * w //
        |     (SELECT CAST(SUM(w) AS BIGINT) FROM w2) AS BIGINT) AS grp_budget
        |   FROM w2),
        | c2 AS (SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM t)
        |SELECT c2.doc_id, c2.lang, c2.n_tokens, c2.cum_tokens, b2.grp_budget
        |FROM c2 JOIN b2 USING (lang)
        |WHERE c2.cum_tokens <= b2.grp_budget ORDER BY c2.doc_id""".stripMargin,
    // Exact string-shingle NOT-EXISTS — adjudicates both the 64-bit
    // shingle hashing and the banded candidate recall (q25's shingle
    // definition; a banding miss surfaces as a row the oracle drops
    // and the operator keeps).
    "q111_lsh_incremental" -> lshIncrementalOracle,
    // The persisted-layout path must land on the same true-Jaccard kept
    // set — one oracle states the semantics for the in-flight, the
    // streaming, and the stored-index execution modes. No DIVERGED /
    // APPEND_BROKEN rows.
    "q383_lsh_layout_gate" -> lshIncrementalOracle,
    // The streaming twin drains to the same kept set on bounded input —
    // one oracle states the semantics for both execution modes.
    "q118_stream_lsh_incremental" -> lshIncrementalOracle,
    // Post-purge admission in exact string-shingle Jaccard: history =
    // the SURVIVORS only (the purged ids' fingerprints must be gone),
    // probe = the full corpus (survivors self-match and drop out). No
    // CENSUS_* sentinel rows — both substores hold zero victim traces.
    "q385_lsh_purge_gate" -> (shingleCte +
      """
        |, h AS (SELECT doc_id AS hid, sh AS hsh FROM t WHERE doc_id % 7 <> 0)
        |, b AS (SELECT doc_id, sh FROM t)
        |, dup AS (
        |  SELECT DISTINCT b.doc_id FROM b JOIN h ON
        |    CAST(len(list_intersect(b.sh, h.hsh)) AS DOUBLE)
        |      / (len(b.sh) + len(h.hsh) - len(list_intersect(b.sh, h.hsh)))
        |      >= 0.8)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin),
    // q96's string-level NOT EXISTS verbatim: the Bloom path must be
    // output-indistinguishable from the plain anti-join.
    "q116_bloom_incremental" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents b
        |WHERE b.doc_id % 2 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents h
        |                  WHERE h.doc_id % 3 <> 0 AND h.text = b.text)
        |ORDER BY doc_id""".stripMargin,
    // q103's gram definition (8-word grams, whole-text fallback) at the
    // source level; the oracle's pair join is the semantics statement —
    // the operator must produce it without the self-join.
    "q114_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS w
        |           FROM documents WHERE text IS NOT NULL),
        | g AS (SELECT source, CASE WHEN len(w) >= 8 THEN
        |         list_transform(range(len(w)-7),
        |           i -> array_to_string(w[i+1:i+8], ' '))
        |        ELSE [array_to_string(w, ' ')] END AS gs FROM t),
        | d AS (SELECT DISTINCT grp, gram FROM
        |        (SELECT source AS grp, unnest(gs) AS gram FROM g)),
        | s AS (SELECT grp, COUNT(*) AS n FROM d GROUP BY 1),
        | c AS (SELECT a.grp AS src_a, b.grp AS src_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM d a JOIN d b ON a.gram = b.gram AND a.grp < b.grp
        |       GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        |  ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
        |    AS jaccard
        |FROM c JOIN s sa ON sa.grp = c.src_a JOIN s sb ON sb.grp = c.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    // String-level gram identity (adjudicates the operator's xxhash64
    // gram equality) + the same gaps-and-islands merge.
    "q112_duplicate_spans" -> (spanCte +
      """
        |SELECT doc_id, span_start, span_end,
        |  CAST(span_end - span_start AS BIGINT) AS span_words
        |FROM spans ORDER BY doc_id, span_start""".stripMargin),
    // Excision tail on the shared span CTE: keep words outside every
    // span, reassemble in position order; fully-scrubbed docs come back
    // as '' / 0 (LEFT JOIN + COALESCE), NULL text stays NULL.
    "q113_span_excision" -> spanExcisionOracle,
    // Streaming twin: bounded drain ≡ the batch scrub, same oracle.
    "q153_stream_excise_spans" -> spanExcisionOracle,
    // Same gram definition as q59's oracle (8-word grams, whole-text
    // fallback); SUMs cast back to BIGINT (DuckDB widens to HUGEINT).
    "q103_repeated_grams" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | g AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |      list_transform(range(len(w)-7), i -> array_to_string(w[i+1:i+8], ' '))
        |    ELSE [array_to_string(w, ' ')] END AS gs
        |  FROM t),
        | d AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM g),
        | f AS (SELECT gram, COUNT(*) AS df FROM d GROUP BY 1)
        |SELECT d.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  ROUND(CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS shared_frac
        |FROM d JOIN f USING (gram)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q103's CTE with min-doc ownership instead of doc frequency.
    "q190_novelty_profile" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | g AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |      list_transform(range(len(w)-7), i -> array_to_string(w[i+1:i+8], ' '))
        |    ELSE [array_to_string(w, ' ')] END AS gs
        |  FROM t),
        | d AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM g),
        | f AS (SELECT gram, MIN(doc_id) AS first_doc FROM d GROUP BY 1)
        |SELECT d.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  ROUND(CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS novelty_frac
        |FROM d JOIN f USING (gram)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // String-level NOT EXISTS: adjudicates the operator's 64-bit
    // fingerprint equality — a hash collision would surface here as a
    // row the oracle keeps and the operator dropped.
    "q96_incremental_new" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents b
        |WHERE b.doc_id % 2 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents h
        |                  WHERE h.doc_id % 3 <> 0 AND h.text = b.text)
        |ORDER BY doc_id""".stripMargin,
    "q86_sorted_neighborhood" ->
      """WITH b AS (
        |  SELECT doc_id, substr(lower(text), 1, 16) AS blk,
        |    substr(lower(text), 1, 120) AS probe
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, probe,
        |    lead(doc_id, 1) OVER win AS k1, lead(probe, 1) OVER win AS p1,
        |    lead(doc_id, 2) OVER win AS k2, lead(probe, 2) OVER win AS p2,
        |    lead(doc_id, 3) OVER win AS k3, lead(probe, 3) OVER win AS p3
        |  FROM b WINDOW win AS (PARTITION BY blk ORDER BY probe, doc_id)),
        |c AS (
        |  SELECT doc_id, k1 AS nid, levenshtein(probe, p1) AS dist FROM w
        |  WHERE k1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, k2, levenshtein(probe, p2) FROM w WHERE k2 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, k3, levenshtein(probe, p3) FROM w WHERE k3 IS NOT NULL)
        |SELECT least(doc_id, nid) AS id_a, greatest(doc_id, nid) AS id_b,
        |  CAST(dist AS INTEGER) AS dist
        |FROM c WHERE dist <= 20 ORDER BY 1, 2""".stripMargin,
    "q43_neardup_components" -> (shingleCte.replace("WITH t", "WITH RECURSIVE t") +
      """
        |, p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        | e AS (SELECT id_a AS src, id_b AS dst FROM p
        |       UNION SELECT id_b, id_a FROM p),
        | reach AS (
        |  SELECT src AS node, dst AS peer FROM e
        |  UNION
        |  SELECT node, e.dst FROM reach JOIN e ON reach.peer = e.src
        |  WHERE e.dst <> reach.node)
        |SELECT node AS doc_id,
        |  LEAST(node, MIN(peer)) AS rep_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),
    // q43's component oracle left-joined over ALL docs (singletons are
    // their own rep), then q45's exact-integer hash split on the REP.
    "q144_leakage_safe_split" -> (shingleCte.replace("WITH t", "WITH RECURSIVE t") +
      """
        |, p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        | e AS (SELECT id_a AS src, id_b AS dst FROM p
        |       UNION SELECT id_b, id_a FROM p),
        | reach AS (
        |  SELECT src AS node, dst AS peer FROM e
        |  UNION
        |  SELECT node, e.dst FROM reach JOIN e ON reach.peer = e.src
        |  WHERE e.dst <> reach.node),
        | comp AS (SELECT node AS doc_id, LEAST(node, MIN(peer)) AS rep_id
        |          FROM reach GROUP BY node),
        | allr AS (SELECT d.doc_id, COALESCE(c.rep_id, d.doc_id) AS rep_id
        |          FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
        |SELECT doc_id, rep_id,
        |  CASE WHEN (rep_id * 2654435761) % 4294967296 % 10 < 8
        |    THEN 'train' ELSE 'heldout' END AS split
        |FROM allr ORDER BY doc_id""".stripMargin),
    "q292_lsh_band_sweep" ->
      """SELECT CAST(NULL AS VARCHAR) AS step,
        |  CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
        |WHERE FALSE""".stripMargin,
    "q297_contamination_sweep" ->
      """SELECT CAST(NULL AS VARCHAR) AS step,
        |  CAST(NULL AS BIGINT) AS doc_id
        |WHERE FALSE""".stripMargin
  )
}
