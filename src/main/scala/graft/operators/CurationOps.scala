package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives above the text/dedup layer: URL
  * canonicalization (the key for URL-level exact dedup — every crawl
  * pipeline's first dedup pass, before any content hashing) and
  * per-domain document caps (RefinedWeb-style source balancing so a
  * handful of mega-domains can't dominate the training mix).
  *
  * Scale: both are single-pass. Canonicalization is a pure
  * regexp/string projection (codegen'd, no shuffle); the domain cap is
  * one shuffle on the domain key with rank-limit pushdown
  * (WindowGroupLimit prunes each map partition to `cap` rows per
  * domain BEFORE the exchange, so the shuffle carries O(domains · cap)
  * rows per partition, not the corpus).
  */
object CurationOps {

  /** Canonical form of an absolute http(s) URL, as a deterministic
    * projection:
    *
    *   - fragment dropped;
    *   - scheme and host lowercased (path/query case preserved — path
    *     case is significant per RFC 3986);
    *   - leading `www.` and default ports `:80`/`:443` stripped;
    *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `ref`), other parameters kept in their original order;
    *   - trailing slashes on the path stripped; a bare `?` dropped.
    *
    * Implementation constraint: every step is a `regexp_extract` /
    * `regexp_replace` with NO lookarounds or backreferences, so the
    * identical pattern literals run under Java regex (Spark, codegen'd)
    * and RE2 (the DuckDB oracle twin) with identical semantics. Spark's
    * regexp_replace is replace-ALL; the oracle adds the 'g' flag.
    *
    * Reference behavior studied from rs-streamloader's key-normalization
    * (lib/helpers.ts trims/normalizes object keys before staging); URL
    * canonicalization itself is standard crawl-pipeline practice (C4 /
    * RefinedWeb) re-expressed as Spark column algebra. */
  def canonicalizeUrl(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nofrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(nofrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_replace(nofrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    // ALL leading www. segments (not one): makes canonicalization
    // idempotent — canon(canon(u)) == canon(u), so stored canonical
    // keys can be re-canonicalized safely (spec property).
    val host = regexp_replace(regexp_replace(auth, "^(www\\.)+", ""), "(:443|:80)$", "")
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "(\\?.*)$", 1)
    // Drop tracking params in two passes (separator-prefixed, then
    // leading-?-prefixed), then heal the `?&` seam the second pass can
    // leave. The heal is ANCHORED to the start of the query: the seam
    // can only be the leading `?` meeting a surviving `&param`, and an
    // unanchored replace would also rewrite a literal `?&` inside a
    // retained parameter VALUE (`?a=b?&c=d`), conflating distinct URLs
    // into one dedup key. No lookbehind: RE2 has none.
    val q1 = regexp_replace(query,
      "&(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)=[^&]*", "")
    val q2 = regexp_replace(q1,
      "^\\?(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)=[^&]*", "?")
    val q3 = regexp_replace(q2, "^\\?&", "?")
    // Crawl frontiers contain relative refs, mailto:, data:, bare hosts,
    // and garbage; anything that doesn't parse as scheme://authority
    // passes through UNCHANGED (still a usable dedup key) instead of
    // collapsing to a "://"-prefixed artifact that would alias all
    // malformed inputs with the same tail.
    when(scheme === "" || auth === "", url)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q3 === "?" || q3 === "", lit("")).otherwise(q3)))
  }

  /** Keep at most `cap` documents per domain, best-first by `order`
    * (ties broken by `id` for determinism). Adds the per-domain rank as
    * `rank_in_domain`. The rank-limit filter compiles to
    * WindowGroupLimit(Partial) below the exchange — each input
    * partition is pruned to its own top-`cap` per domain map-side, so
    * a skewed mega-domain contributes O(cap · partitions) rows to the
    * shuffle instead of its full document count. */
  def domainCap(docs: DataFrame, id: String, domain: String,
      order: Column, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    docs.withColumn("rank_in_domain",
        row_number().over(Window.partitionBy(col(domain))
          .orderBy(order.desc, col(id))).cast("long"))
      .filter(col("rank_in_domain") <= cap)
  }
}
