package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII pattern scrubbing for training corpora: detect and redact
  * email addresses, IPv4 addresses, and long digit runs (account/card
  * numbers) — the regex-scrub pass every published web-corpus pipeline
  * runs before training.
  *
  * Scale design: the whole pass is built-in `regexp_extract_all` /
  * `regexp_replace` expressions — codegen'd, map-side, zero shuffle
  * (the only exchange in a scrub-and-write job is the final sink).
  * The patterns deliberately stay inside the regex subset Java
  * (Spark) and RE2 (the oracle) interpret identically: character
  * classes, bounded quantifiers, and ASCII word boundaries only — no
  * backreferences or lookaround, which RE2 rejects.
  */
object Scrub {

  /** Conservative email shape: local@domain.tld (2+ letter TLD). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range validation — a scrubber
    * over-redacts rather than leaking on 999.1.1.1-style typos).
    */
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** 9+ consecutive digits: account numbers, card numbers, phone
    * numbers in their unpunctuated form.
    */
  val LongNumRe: String = "\\b\\d{9,}\\b"

  /** Redact all three classes, emails first (an email eats its own
    * digits before the number pass can misread them).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** CONSISTENT pseudonymization — the privacy pass that preserves
    * referential integrity: every email occurrence is replaced by a
    * stable token derived from the matched string itself
    * (`<EMAIL:xxxxxxxx>`, first 8 hex of its md5), so the same address
    * maps to the same token corpus-wide and cross-document entity
    * structure (who talked to whom) survives the scrub — what blunt
    * `<EMAIL>` redaction destroys. Entirely codegen'd column
    * expressions, map-side, zero shuffle: the text splits on the match
    * regex (n matches → n+1 segments), `zip_with` re-interleaves each
    * segment with its match's token, and the tail segment re-attaches.
    * No per-match UDF, no driver-side token vault — the token IS a pure
    * function of the match, which also makes the pass restatable in
    * SQL (the q219 gate) and legal in a streaming plan.
    */
  def pseudonymizeEmails(text: Column): Column = {
    val segs = split(text, EmailRe, -1)
    val matches = regexp_extract_all(text, lit(EmailRe), lit(0))
    concat(
      array_join(zip_with(slice(segs, lit(1), size(matches)), matches,
        (s, m) => concat(s, lit("<EMAIL:"), substring(md5(m), 1, 8),
          lit(">"))), ""),
      element_at(segs, -1))
  }

  /** `<script>`/`<style>` blocks including their content — non-greedy
    * with `(?s)` so a block spanning line breaks still dies as a unit,
    * `(?i)` because HTML tag names are case-insensitive (`<SCRIPT>`
    * would otherwise leak its payload into the "clean" text once TagRe
    * stripped the tags), and one pattern PER construct so a stray
    * `</style>` can never close a `<script>` block early. All
    * constructs are in Java ∩ RE2.
    */
  val ScriptRe: String = "(?is)<script[^>]*>.*?</script>"
  val StyleRe: String = "(?is)<style[^>]*>.*?</style>"

  /** Any remaining tag: `<` + non-`>` run + `>`. Runs AFTER the block
    * pass so a tag inside a dead script never resurrects.
    */
  val TagRe: String = "<[^>]*>"

  /** Markup stripping — the WET-extraction stage of a web pipeline
    * (tags and script/style payloads are boilerplate to a language
    * model, and entity-encoded text double-counts tokens). Order is
    * load-bearing: script/style blocks first (content dies with the
    * tags), then residual tags, then the four ubiquitous entities
    * (amp LAST so `&amp;lt;` decodes to the literal `&lt;` rather than
    * a fake tag opener), then whitespace collapse + trim so the
    * stripped text re-enters the single-spaced corpus convention.
    * Entirely codegen'd map-side expressions, zero shuffle; idempotent
    * (a clean document passes through unchanged), which the spec pins
    * the q147 way.
    */
  def stripMarkup(text: Column): Column = {
    val noBlocks =
      regexp_replace(regexp_replace(text, ScriptRe, " "), StyleRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document PII profile: match counts per class plus the md5 of
    * the redacted text (so a gate validates the exact redaction output,
    * not just the counts). Only documents with at least one hit are
    * returned — at corpus scale the clean majority should produce no
    * rows, not a flood of zeros.
    *
    * Output: (idCol, n_emails, n_ips, n_nums, clean_md5).
    */
  def piiStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0)))
          .cast("bigint").as("n_ips"),
        size(regexp_extract_all(col(textCol), lit(LongNumRe), lit(0)))
          .cast("bigint").as("n_nums"),
        md5(redactPii(col(textCol))).as("clean_md5"))
      .filter(col("n_emails") + col("n_ips") + col("n_nums") > 0)

  /** Anchored SPDX header line, Java∩RE2 dialect (the PII-pattern
    * discipline above): `^// SPDX-License-Identifier: <id>\n`.
    */
  val SpdxHeaderRe: String =
    "^// SPDX-License-Identifier: ([A-Za-z0-9.-]+)\\n"

  /** License-header classification + strip — the code-corpus
    * compliance projection shared by batch q245 and its streaming
    * twin: per-row regex only (codegen, stateless, zero shuffle), so
    * it drains in Append mode unchanged. Emits (idCol, license,
    * had_header, n_chars_stripped, stripped_md5); docs without a
    * header pass through with license = 'none' and the md5 of their
    * unchanged bytes.
    */
  def licenseScrub(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .withColumn("__lic", regexp_extract(col(textCol), SpdxHeaderRe, 1))
      .withColumn("__stripped", regexp_replace(col(textCol), SpdxHeaderRe, ""))
      .select(col(idCol),
        when(col("__lic") === "", "none").otherwise(col("__lic"))
          .as("license"),
        (col("__lic") =!= "").as("had_header"),
        (length(col(textCol)) - length(col("__stripped"))).cast("bigint")
          .as("n_chars_stripped"),
        md5(col("__stripped")).as("stripped_md5"))

  /** Frequent-token downsampling (word2vec's subsample heuristic,
    * Mikolov et al. 2013 §2.3): each token occurrence survives with
    * probability min(1, sqrt(t / f_w)) where f_w is the word's corpus
    * frequency — head words (the/of/and) thin toward sqrt-scaled
    * counts, the long tail passes untouched. `thresholdPpb` is t in
    * parts-per-billion (default 1e9 ppb = t of 1e-3, the paper's
    * value). The "coin flip" is the deterministic positional hash
    * h6(doc, pos) in [0, 1e6): an occurrence is kept iff
    * h6² · cnt_w ≤ t_ppb · N, so the pass is bit-reproducible from
    * (corpus, threshold) alone and the SQL oracle can restate it.
    *
    * Scale shape — the reason this is an operator and not a
    * per-word join: a word is DROPPABLE at all only if
    * cnt_w > N · t_ppb / 1e12 (otherwise every h6 passes), and words
    * above that frequency number at most 1e12 / t_ppb (1000 at the
    * default) REGARDLESS of corpus size, because their counts sum to
    * N. So the droppable set collects to the driver (loud bound),
    * each word's exact keep-ceiling maxh_w = isqrt(t_ppb · N / cnt_w)
    * is computed in overflow-free BigInt, and the ceilings ship into
    * the plan as a literal map. The rewrite is then a PURE MAP-SIDE
    * higher-order filter over the split array — the corpus is scanned
    * once for the vocabulary census (narrow word-count exchange) and
    * once for the rewrite, and never shuffles. maxh is exact in
    * double because droppable words have t_ppb·N/cnt < 1e12 < 2^53
    * and isqrt(x<1e12) < 6.7e7, below the floor(sqrt) rounding hazard.
    *
    * Output: (idCol, ds_text, n_kept); NULL text stays NULL, a doc
    * whose every token drops comes back as ('', 0).
    *
    * Contract: ids non-negative and `id·1000003 + pos` within Long
    * (any realistic id space); tokens are single-space separated.
    */
  def downsampleFrequentTokens(docs: DataFrame, idCol: String,
                               textCol: String,
                               thresholdPpb: Long = 1000000000L,
                               maxHotWords: Int = 1 << 16): DataFrame =
    applyTokenCeilings(docs, idCol, textCol,
      tokenCeilings(docs, textCol, thresholdPpb, maxHotWords))

  /** The census half of [[downsampleFrequentTokens]]: the droppable
    * words and their exact keep-ceilings maxh_w = isqrt(t_ppb·N/cnt_w).
    * Split out so the rewrite half can run where the census cannot —
    * a streaming ingestion plan applies ceilings computed from the
    * STANDING corpus (at 100 TB: maintained incrementally, the q166
    * move — word counts merge by addition).
    */
  def tokenCeilings(corpus: DataFrame, textCol: String,
                    thresholdPpb: Long = 1000000000L,
                    maxHotWords: Int = 1 << 16): Map[String, Long] = {
    require(thresholdPpb >= 1,
      s"downsampleFrequentTokens: thresholdPpb must be >= 1, got $thresholdPpb")
    val freq = corpus
      .select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))
    val nTok = freq.agg(coalesce(sum("__cnt"), lit(0L))).head.getLong(0)
    val t = BigInt(thresholdPpb) * nTok
    // droppable ⇔ cnt > t/1e12 (else maxh ≥ 1e6 > any h6) — ≤ 1e12/ppb words
    val hotBound = (t / BigInt(1000000000000L)).toLong
    val hotRows = freq.filter(col("__cnt") > hotBound)
      .limit(maxHotWords + 1).collect()
    require(hotRows.length <= maxHotWords,
      s"downsampleFrequentTokens: more than $maxHotWords droppable words " +
        "(thresholdPpb is very aggressive) - the ceiling map would bloat the " +
        "plan. Raise maxHotWords deliberately or raise thresholdPpb.")
    hotRows.map { r =>
      val arg = (t / r.getLong(1)).toDouble // < 1e12, exact in double
      r.getString(0) -> math.floor(math.sqrt(arg)).toLong
    }.toMap
  }

  /** The rewrite half of [[downsampleFrequentTokens]]: a pure map-side
    * higher-order filter against the literal ceiling map — legal in a
    * streaming plan (per-row projection, no state).
    */
  def applyTokenCeilings(docs: DataFrame, idCol: String, textCol: String,
                         ceilings: Map[String, Long]): DataFrame = {
    def h6(id: Column, pos: Column): Column =
      pmod(pmod(id * lit(1000003L) + pos + lit(1L), lit(3000000000L))
        * lit(2654435761L), lit(1000000L))
    val words = split(col(textCol), " ")
    val keptArr =
      if (ceilings.isEmpty) words
      else {
        val maxhMap = typedLit(ceilings)
        filter(words, (w, i) => {
          val mh = element_at(maxhMap, w)
          mh.isNull || h6(col(idCol), i.cast("long")) <= mh
        })
      }
    docs.select(col(idCol),
      when(col(textCol).isNull, lit(null).cast("string"))
        .otherwise(array_join(keptArr, " ")).as("ds_text"),
      when(col(textCol).isNull, lit(null).cast("bigint"))
        .otherwise(size(keptArr).cast("bigint")).as("n_kept"))
  }

  /** The line-frequency census behind `dropFrequentLines`: 8-byte
    * hashes of the lines appearing in at least `minDf` DISTINCT
    * documents — boilerplate by definition (nav bars, cookie banners,
    * subscribe prompts repeat across a site; body text does not). The
    * census is a map-side-combinable groupBy of (line-hash, doc) —
    * line text crosses the shuffle once as its 8-byte hash + the doc
    * key for the distinct-df count.
    */
  def frequentLineHashes(corpus: DataFrame, idCol: String, textCol: String,
                         minDf: Int): DataFrame =
    corpus.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .filter(col("line") =!= "")
      .groupBy(xxhash64(col("line")).as("lh"))
      .agg(count_distinct(col(idCol)).as("df"))
      .filter(col("df") >= minDf)
      .select("lh")

  /** C4-style LINE-level dedup: drop every line that appears in ≥
    * `minDf` distinct documents, keep the rest in order — the cleanup
    * that removes cross-site boilerplate exact-substr span dedup
    * (q112) is too surgical for and document dedup too blunt for.
    *
    * Scale shape: the census half is corpus-scale but narrow (8-byte
    * line hashes); the drop SET is bounded by total_lines/minDf and
    * collected under a loud `maxDropLines` guard (the q182 ceiling-map
    * discipline), then ships as a plan literal so the rewrite half is
    * a pure MAP-SIDE array filter — the corpus never shuffles to be
    * cleaned, and the rewrite is streaming-legal. For drop sets past
    * the literal regime, swap the membership probe for the Bloom +
    * exact-join machinery (q116) — the census half is unchanged.
    */
  /** The UNBOUNDED-drop-set regime of [[dropFrequentLines]] — the
    * "Bloom + anti-join path" that operator's guard names: when the
    * boilerplate census is too large to ship as a plan literal (a web
    * crawl's nav/footer space at 100 TB), the drop set stays
    * DISTRIBUTED and the rewrite becomes a LEFT ANTI join of exploded
    * (doc, pos, line-hash) rows against it, followed by an order-
    * preserving re-assembly (`array_sort` over (pos, line) structs —
    * sorting WITHIN a doc's collected lines, never a global sort).
    *
    * Scale shape: the only corpus-scale shuffles are (a) the census's
    * narrow 8-byte-hash aggregate and (b) the anti-join's exchange of
    * (doc, pos, line) — and when the drop side is small Catalyst
    * broadcasts it so (b) vanishes; past broadcast size it is an SMJ
    * on 8-byte keys with Spark's runtime Bloom filter (the q68
    * mechanism) eligible on the corpus side, which is exactly the
    * Bloom-prefilter-then-exact-join discipline of q116. Docs whose
    * every line drops, and NULL-text docs, round-trip identically to
    * the literal-set operator (ScrubSpec pins the two regimes equal
    * row-for-row).
    */
  def dropFrequentLinesDistributed(docs: DataFrame, idCol: String,
                                   textCol: String, minDf: Int): DataFrame = {
    val drop = frequentLineHashes(docs, idCol, textCol, minDf)
    val exploded = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("__pos", "__line")))
      .filter(col("__line") =!= "")
    val kept = exploded
      .join(drop, xxhash64(col("__line")) === drop("lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), "\n").as("__clean"),
        count(lit(1)).as("__n_kept"))
    val lines = split(col(textCol), "\n")
    docs.select(col(idCol), col(textCol),
        size(filter(lines, l => l =!= "")).cast("bigint").as("__n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit(""))).as("clean_text"),
        when(col(textCol).isNull, lit(null).cast("bigint"))
          .otherwise(col("__n_lines") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                        minDf: Int,
                        maxDropLines: Int = 1 << 17): DataFrame = {
    val dropRows = frequentLineHashes(docs, idCol, textCol, minDf)
      .limit(maxDropLines + 1).collect()
    require(dropRows.length <= maxDropLines,
      s"dropFrequentLines: drop set exceeds $maxDropLines lines - raise " +
        "minDf or switch the probe to the Bloom+anti-join path")
    val drop = dropRows.map(_.getLong(0)).sorted
    val lines = split(col(textCol), "\n")
    // isInCollection over the literal hash set Catalyst-optimizes to an
    // InSet hash probe — O(1) per line where array_contains would walk
    // the whole drop list (measured 14.6 s → set-probe at sf1's ~5k-line
    // drop set).
    val kept =
      if (drop.isEmpty) filter(lines, l => l =!= "")
      else filter(lines, l =>
        l =!= "" && !xxhash64(l).isInCollection(drop))
    docs.select(col(idCol),
      when(col(textCol).isNull, lit(null).cast("string"))
        .otherwise(array_join(kept, "\n")).as("clean_text"),
      when(col(textCol).isNull, lit(null).cast("bigint"))
        .otherwise((size(filter(lines, l => l =!= "")) - size(kept))
          .cast("bigint")).as("n_dropped"))
  }
}
