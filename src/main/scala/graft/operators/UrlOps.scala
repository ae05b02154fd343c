package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the normalization step a
  * web-scale curation pipeline runs before document dedup (the same URL
  * crawled twice under cosmetic spelling variants is the cheapest dup
  * class to kill, long before any content hashing).
  *
  * Canonical form (all steps composable from codegen'd built-ins — no
  * UDFs, single projection over the corpus):
  *  - fragment stripped (`#…` never reaches the server);
  *  - scheme and host lowercased (case-insensitive by RFC 3986); the
  *    PATH keeps its case (case-sensitive by RFC);
  *  - default ports dropped (`:80` for http, `:443` for https; any
  *    other port kept);
  *  - `utm_*` tracking parameters dropped, remaining query parameters
  *    SORTED (param order is almost never semantic; sorting makes the
  *    canonical form order-insensitive), empty query drops the `?`;
  *  - trailing `/` run on the path stripped (empty path → `/`).
  *
  * Scale shape: canonicalization is a row-local projection; the dedup is
  * ONE hash shuffle on the canonical string (min doc_id kept) — the same
  * shape as exact content dedup, so it holds at 100 TB.
  */
object UrlOps {

  /** Canonical URL column from a raw URL column — the
    * [[graft.functions.UrlCanonicalize]] codegen kernel. (The same
    * pipeline composed from built-ins needed higher-order array
    * functions, which are CodegenFallback — interpreted per row and
    * measured ~10× slower at sf≈1.) */
  def canonicalUrl(url: Column): Column =
    call_function("graft_url_canon", url)

  /** URL-level dedup: canonicalize, keep the smallest id per canonical
    * URL, report the collapse count. One shuffle on the canonical key. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keeper"),
        count(lit(1)).cast("long").as("n_variants"))
}
