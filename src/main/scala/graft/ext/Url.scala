package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first operator of every web-corpus
  * pipeline: crawl frontiers, page dedup and per-site statistics all
  * key on the canonical form, not the raw string (the same page
  * hides behind case differences, default ports, tracking params,
  * fragments and parameter order).
  *
  * Canonical form: scheme and host lowercased, a leading `www.`
  * dropped, default ports (http:80 / https:443) removed, the
  * fragment removed, trailing path slashes trimmed, tracking
  * parameters (`utm_*`, `gclid`, `fbclid`) dropped, and the
  * remaining query parameters sorted bytewise.
  *
  * Everything is regexp_extract / split / array_sort in the
  * RE2-compatible subset — pure in-row Column expressions, scan
  * speed, no UDF, bit-reproducible by any engine (x70 oracle). A
  * registered-domain extractor ([[site]]) gives the per-site
  * aggregation key (last two host labels — a public-suffix list
  * would slot in here at production; the operator seam is the same).
  */
object Url {

  private def afterScheme(url: Column): Column =
    regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Lowercased scheme, "" when the string has no scheme. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host without a leading `www.` or port. */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(regexp_extract(afterScheme(url), "^([^/?#]*)", 1),
        "^([^:]*)", 1)),
      "^www\\.", "")

  /** Registered-domain approximation: the last two host labels. */
  def site(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** The canonical URL (see object doc). Inputs without a scheme
    * canonicalize to "" — callers filter or quarantine them. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val rest = afterScheme(url)
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val h = host(url)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keptPort = when(
      port === "" ||
        (sch === "http" && port === "80") ||
        (sch === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    // strip the fragment FIRST so a '?' inside it can't read as query
    val preFrag = regexp_extract(regexp_replace(rest, "^[^/?#]*", ""),
      "^([^#]*)", 1)
    val path = regexp_replace(regexp_extract(preFrag, "^([^?]*)", 1), "/+$", "")
    val params = filter(split(regexp_extract(preFrag, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("gclid=") && !p.startsWith("fbclid="))
    val query = array_join(array_sort(params), "&")
    when(sch === "", lit(""))
      .otherwise(concat(sch, lit("://"), h, keptPort, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }
}
