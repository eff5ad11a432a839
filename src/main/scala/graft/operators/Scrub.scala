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

  /** `<script>`/`<style>` blocks including their content — non-greedy
    * with `(?s)` so a block spanning line breaks still dies as a unit.
    * Both constructs are in Java ∩ RE2.
    */
  val ScriptStyleRe: String = "(?s)<(script|style)[^>]*>.*?</(script|style)>"

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
    val noBlocks = regexp_replace(text, ScriptStyleRe, " ")
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
}
