package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the crawl-side normalization pass
  * that collapses trivially-distinct fetches of one resource before
  * content dedup ever runs. Canonical form:
  *
  *   - scheme and host lowercased (case-insensitive per RFC 3986);
  *   - default ports `:80`/`:443` stripped;
  *   - fragment dropped (never sent to the server);
  *   - trailing slashes on the path stripped.
  *
  * Query parameters are kept VERBATIM — param reordering/stripping is
  * site-semantics-dependent (tracking params vs. content params) and
  * belongs in a per-site rule table, not a global pass.
  *
  * Pure projection (regexp_extract/replace are codegen'd) — scan speed
  * at any corpus size; the dedup itself is one hash aggregate on the
  * canonical string, the same shape as exact content dedup.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/#?]*)"
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/#?]*([^#]*)"

  /** Canonical form of an absolute http(s)-style URL column. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val host = regexp_replace(
      lower(regexp_extract(url, HostRe, 1)), ":(80|443)$", "")
    val rest = regexp_replace( // path+query, fragment dropped by RestRe
      regexp_extract(url, RestRe, 1), "/+$", "")
    concat(scheme, lit("://"), host, rest)
  }

  /** Collapse URL variants: one row per canonical URL with the variant
    * count and the minimum id as the canonical keeper (the same
    * keeper rule as content dedup's cluster resolution). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.withColumn("url_canonical", canonicalize(col(urlCol)))
      .groupBy(col("url_canonical"))
      .agg(count(lit(1)).as("n_variants"), min(col(idCol)).as("keeper"))
}
