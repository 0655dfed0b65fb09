package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup/join key normalizer for web-scale
  * corpora: the same resource arrives as `HTTP://Example.COM:80/p?b=2&a=1`,
  * `http://example.com/p?a=1&b=2&utm_source=feed`, … and every spelling
  * must collapse to ONE canonical string before exact dedup, per-domain
  * quotas ([[Sampling.capPerKey]]) or frequency rollups make sense.
  *
  * The grammar is EXPLICIT regexes over `scheme://authority/path?query
  * #fragment` — not java.net.URI — so the DuckDB oracle can replay the
  * identical patterns (the [[TextClean]] rule: spell out the character
  * classes, never borrow an engine's URL parser whose edge semantics
  * the other engine can't mirror). Patterns stay inside the
  * Java-regex ∩ RE2 common subset.
  *
  * Canonical form, applied in order:
  *   1. scheme and host lowercased (ASCII — IDN is out of scope here);
  *   2. default ports stripped (`:80` iff http, `:443` iff https;
  *      other ports kept);
  *   3. fragment dropped (never part of the resource identity);
  *   4. query split on `&`; empty params and tracking params
  *      (`utm_*`, `fbclid`, `gclid`, `msclkid`) dropped; the REST
  *      sorted lexicographically and rejoined — param order is
  *      transport noise, but values are preserved byte-exact;
  *   5. empty path becomes `/`.
  *
  * Pure map-side column expressions (zero shuffles, codegen-friendly);
  * NULL or scheme-less input yields NULL url_norm and a `malformed`
  * flag rather than a throw — at 10^12 rows there is always garbage.
  */
object UrlNormalize {

  private val TrackingRe = "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid)="

  /** Adds `url_norm`, `host`, `n_params_kept`, `n_params_dropped`,
    * `malformed` next to the existing columns. */
  def normalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u,
      "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val path = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)

    val rawParams = filter(split(query, "&"), p => p =!= "")
    val kept = array_sort(filter(rawParams,
      p => !p.rlike(TrackingRe)))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val norm = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    val malformed = u.isNull || scheme === "" || host === ""

    df.withColumn("url_norm", when(malformed, lit(null)).otherwise(norm))
      .withColumn("host", when(malformed, lit(null)).otherwise(host))
      .withColumn("n_params_kept",
        when(malformed, lit(null)).otherwise(size(kept)))
      .withColumn("n_params_dropped", when(malformed, lit(null))
        .otherwise(size(rawParams) - size(kept)))
      .withColumn("malformed", malformed)
  }

  /** The tracking-param regex, shared with the oracle builder. */
  def trackingRegex: String = TrackingRe
}
