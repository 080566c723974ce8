package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: markup stripping and URL
  * canonicalization — the first stages of every crawled-text training
  * pipeline (the reference's scope is curated RRF releases, so these are
  * greenfield additions for the crawl-scale use case).
  *
  * Everything is pure `Column` algebra (regex + array higher-order
  * functions) — no UDFs — so both operators stay inside whole-stage
  * codegen and run as one narrow map pass over the corpus: at 100 TB
  * there is no shuffle until the caller aggregates. All regexes are
  * RE2-compatible so the DuckDB oracle replays them verbatim.
  */
object WebText {

  // --- markup stripping ---------------------------------------------------

  /** Strip HTML/XML markup down to readable text:
    *   1. drop comments and `<script>`/`<style>` element CONTENT (their
    *      text is code, not prose — tag-stripping alone would leak it);
    *   2. strip remaining tags to a space (block boundaries must not glue
    *      adjacent words together);
    *   3. decode the common entities, `&amp;` LAST so `&amp;lt;` decodes
    *      to the literal `&lt;` and not to `<` (the standard double-decode
    *      hazard);
    *   4. collapse whitespace runs.
    *
    * `(?is)` = case-insensitive + dot-matches-newline; non-greedy `.*?`
    * keeps one block's removal from swallowing the document when two
    * script blocks appear. */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?s)<!--.*?-->", " "),
        "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, ent, java.util.regex.Matcher.quoteReplacement(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Markup-density stats per document: tag count, entity count, and the
    * markup fraction (1 - clean_len/raw_len) — the boilerplate-page
    * signal used to drop chrome-heavy pages before tokenization. */
  def markupStats(docs: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    val clean = stripMarkup(h)
    docs.select(
      col(idCol),
      clean.as("text_clean"),
      size(regexp_extract_all(h, lit("<[^>]+>"), lit(0))).cast("long")
        .as("n_tags"),
      size(regexp_extract_all(h, lit("&[a-zA-Z]+;|&#[0-9]+;"), lit(0)))
        .cast("long").as("n_entities"),
      round(lit(1) - length(clean).cast("double") /
        greatest(length(h).cast("double"), lit(1.0)), 4)
        .as("markup_frac"))
  }

  // --- URL canonicalization ----------------------------------------------

  /** Canonical URL form for URL-level dedup and host aggregation:
    *   - scheme and host lowercased (path/query case is significant);
    *   - leading `www.` and default ports (`:80`, `:443`) dropped;
    *   - fragment dropped (never sent to the server);
    *   - tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`) dropped;
    *   - surviving query parameters sorted (param order is not
    *     significant, so `?a=1&b=2` and `?b=2&a=1` must collide);
    *   - trailing `/` dropped from non-root paths.
    *
    * One pass of scalar regex + a bounded array sort over the query
    * params — codegen-friendly, shuffle-free. */
  def canonicalizeUrl(url: Column): Column = {
    // scheme://host[:port] — lowercase, strip www. and default ports
    val head = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    val host = regexp_replace(
      regexp_replace(head, "://www\\.", "://"), ":(80|443)$", "")
    // path: everything between host and ?/# — trailing slash dropped
    val rawPath = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_like(rawPath, lit("^.+/$")),
      regexp_replace(rawPath, "/$", "")).otherwise(rawPath)
    // query: split, drop tracking params, sort, rejoin
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(
      split(rawQ, "&"),
      p => length(p) > 0 && !regexp_like(p, lit("^(utm_[^=]*|gclid|fbclid|ref)=")))
    val q = array_join(array_sort(params), "&")
    concat(host, path, when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Host of an already-canonicalized URL. */
  def urlHost(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** Host-level corpus report over per-doc (url, quality) rows: document
    * count, distinct canonical URLs (≠ count ⇒ URL-level duplicates),
    * and mean quality — the per-host block/keep signal (crawl pipelines
    * drop whole hosts, not single pages). One hash aggregation on the
    * host key; canonicalization happens map-side, so the shuffle carries
    * only the grouping key and partial aggregates. */
  def hostStats(docs: DataFrame, urlCol: String = "url",
      qualityCol: String = "quality"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    docs.select(urlHost(canon).as("host"), canon.as("curl"), col(qualityCol))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("curl")).as("n_urls"),
        round(count(lit(1)).cast("double") / countDistinct(col("curl")), 4)
          .as("dup_factor"),
        round(avg(qualityCol), 4).as("avg_quality"))
  }
}
