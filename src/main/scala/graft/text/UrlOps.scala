package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines — the dedup-key step a
  * CommonCrawl-shaped ingest runs before exact/near dedup: the same page
  * arrives as `HTTP://Example.COM:80/p?id=1&utm_source=feed#top` and
  * `http://example.com/p?id=1`, and counting it twice skews every
  * downstream frequency (reference scope: the engine's text-pipeline
  * extension tier; the reference itself has no web-corpus layer).
  *
  * Everything is a pure Catalyst expression tree (regexp + higher-order
  * array functions, all codegen'd, no UDF) and every step is replayable
  * in ANSI-ish SQL — which is what makes the q214 contract hash-checkable
  * against DuckDB.
  *
  * Canonical form: lowercased scheme and host, default ports stripped
  * (`:80` for http, `:443` for https — others kept), path preserved
  * case-sensitively (empty path → `/`), tracking parameters removed from
  * the query (`utm_*`, `fbclid`, `gclid` — the CommonCrawl-standard
  * strip list), fragment dropped.
  *
  * Scale shape: per-row expressions, no shuffle; the canonical string is
  * then a plain groupBy/dedup key.
  */
object UrlOps {

  private val TrackingRe = "^(utm_[a-z_]+|fbclid|gclid)="

  /** Lowercased scheme, or empty when the value is not absolute-URL-shaped. */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host WITHOUT the port. */
  def urlHost(u: Column): Column =
    lower(regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$", ""))

  /** Port string (digits) or empty. */
  def urlPort(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)", 1)

  /** Path, case-preserved; empty when absent. */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Raw query string (no `?`), fragment excluded; empty when absent. */
  def urlQuery(u: Column): Column = regexp_extract(u, "\\?([^#]*)", 1)

  /** Query string with tracking parameters removed, re-prefixed with `?`
    * when non-empty — parameter-exact (split on `&`, filter, re-join), so
    * a tracking param in ANY position drops cleanly. */
  def canonicalQuery(u: Column): Column = {
    val q = urlQuery(u)
    val kept = filter(split(q, "&"),
      p => !(p.rlike(TrackingRe)) && p =!= lit(""))
    when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
  }

  /** Host:port with the scheme's default port stripped (http:80,
    * https:443); a non-default port is kept. */
  def canonicalHostPort(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), host)
      .otherwise(concat(host, lit(":"), port))
  }

  /** Full canonical URL (see object doc). Null-shaped/non-URL input
    * (no `scheme://`) yields null, not a mangled echo. */
  def canonicalUrl(u: Column): Column = {
    val path = urlPath(u)
    when(urlScheme(u) =!= "",
      concat(urlScheme(u), lit("://"), canonicalHostPort(u),
        when(path === "", lit("/")).otherwise(path),
        canonicalQuery(u)))
  }

  /** Registrable domain from the canonical host: last two labels, or last
    * three when the 2-label suffix is a known second-level public suffix
    * (a small built-in list — co.uk-style ccTLD pairs; a production
    * deployment swaps in the full Public Suffix List as a broadcast
    * lookup, same expression shape). */
  def registeredDomain(u: Column): Column = {
    val host = urlHost(u)
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    val twoLevel = Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp",
      "com.au", "co.nz", "com.br", "co.in")
    when(n <= 2, host)
      .when(last2.isin(twoLevel: _*), last3)
      .otherwise(last2)
  }
}
