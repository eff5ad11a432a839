package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and registrable-domain extraction — the web
  * acquisition face of a crawl-derived training corpus (C4/CCNet both
  * dedup by canonical URL before any content pass, and every crawl
  * pipeline buckets politeness/blocklists by registrable domain, not
  * hostname).
  *
  * Everything here is a per-row COLUMN EXPRESSION built from codegen'd
  * built-ins (`parse_url`, `filter`/`aggregate`/`transform` HOFs,
  * `array_sort`) — no UDF, no shuffle, legal in batch and streaming
  * plans alike. At 100 TB the canonical pass is a free rider on the
  * ingest scan, and the URL-dedup that follows is the existing exact
  * dedup machinery (`Dedup`) keyed on the canonical string (or its
  * 8-byte `xxhash64` — the q96 move) instead of the raw one.
  *
  * Canonical form (the choices search-engine canonicalizers make,
  * documented here because they are contract, not accident):
  * lowercase scheme and host; strip the scheme's default port
  * (http:80, https:443, ws:80, wss:443, ftp:21); remove path
  * dot-segments (RFC 3986 §5.2.4) and collapse empty segments, so the
  * canonical path never ends in '/' except the bare root; drop
  * tracking parameters (`utm_*`, `gclid`, `fbclid`, `msclkid`,
  * `mc_eid`); byte-sort the surviving query params; drop the fragment.
  * An unparseable URL canonicalizes to NULL — admission treats those
  * as their own reject class rather than silently passing them.
  */
object Urls {

  /** name=value pairs dropped from canonical query strings. */
  private val TrackingParamRe = "^(utm_|gclid=|fbclid=|msclkid=|mc_eid=)"

  private val DefaultPorts: Map[String, String] =
    Map("http" -> "80", "https" -> "443", "ws" -> "80", "wss" -> "443",
      "ftp" -> "21")

  /** RFC 3986 dot-segment removal over an array of path segments:
    * '' and '.' vanish, '..' pops (a pop above root is dropped, per
    * the RFC's remove_dot_segments). One `aggregate` fold — codegen'd.
    */
  private def dotSegmentStack(path: Column): Column =
    aggregate(
      filter(split(path, "/"), s => s =!= "" && s =!= "."),
      array().cast("array<string>"),
      (acc, x) => when(x === "..",
          when(size(acc) <= 1, array().cast("array<string>"))
            .otherwise(slice(acc, lit(1), size(acc) - 1)))
        .otherwise(concat(acc, array(x))))

  /** The canonical URL of `url` (NULL if unparseable). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val host = lower(parse_url(url, lit("HOST")))
    // parse_url has no PORT key; the port is the authority's tail.
    val port = regexp_extract(
      coalesce(parse_url(url, lit("AUTHORITY")), lit("")), ":([0-9]+)$", 1)
    val portSuffix = when(port === "", lit(""))
      .otherwise(
        DefaultPorts.foldLeft(concat(lit(":"), port): Column) {
          case (acc, (s, p)) =>
            when(scheme === s && port === p, lit("")).otherwise(acc)
        })
    val stack = dotSegmentStack(coalesce(parse_url(url, lit("PATH")), lit("")))
    val path = when(size(stack) === 0, lit("/"))
      .otherwise(concat(lit("/"), array_join(stack, "/")))
    val params = array_sort(filter(
      split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val querySuffix = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(scheme.isNull || host.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portSuffix, path,
        querySuffix))
  }

  /** Lowercased hostname of `url` (NULL if unparseable). */
  def hostOf(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** The registrable domain (eTLD+1) of `host` under the given
    * public-suffix list: the label immediately left of the LONGEST
    * matching suffix, joined back to it ("shop.site3.co.uk" under
    * {uk, co.uk} → "site3.co.uk"). A host that IS a public suffix has
    * no registrable domain → NULL. A host matching NO suffix returns
    * itself — fail-closed, so a blocklist keyed on this column still
    * sees the full hostname rather than a NULL that slips every
    * filter. The suffix list rides as a plan literal (the real PSL is
    * ~10k entries — still literal-sized next to a corpus).
    */
  def registrableDomain(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "registrableDomain: empty suffix list")
    val matches = filter(
      array(suffixes.map(lit): _*),
      s => host === s || endswith(host, concat(lit("."), s)))
    // longest suffix wins (the PSL rule); ties impossible within a set
    val best = array_max(transform(matches,
      s => struct(length(s).as("l"), s.as("s")))).getField("s")
    val beforeSuffix =
      substring(host, lit(1), length(host) - length(best) - 1)
    val label = element_at(split(beforeSuffix, "\\."), -1)
    when(host.isNull, lit(null).cast("string"))
      .when(best.isNull, host)
      .when(host === best, lit(null).cast("string"))
      .otherwise(concat(label, lit("."), best))
  }
}
