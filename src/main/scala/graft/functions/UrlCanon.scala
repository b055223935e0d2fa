package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key a crawl pipeline groups on BEFORE
  * any content comparison: the same page arrives as `HTTP://WWW.Site.com/p`,
  * `http://site.com:80/p/` and `http://site.com/p?utm_source=feed`, and
  * byte-hash dedup sees three distinct documents. Canonicalizing the URL
  * collapses them for free (a map-only column, no content read).
  *
  * The whole transform is a chain of built-in `regexp_replace`/`lower`
  * columns — codegen'd, no UDF — and every pattern stays inside the
  * regex subset Java and RE2 agree on (character classes, alternation,
  * anchors, optional groups; NO lookarounds or backrefs), so the DuckDB
  * oracle replays it verbatim (`q_url_canon`).
  *
  * Contract (deliberately a dedup NORMALIZATION, not a semantics-
  * preserving rewrite):
  *  1. fragment dropped;
  *  2. scheme + authority lowercased (path/query case preserved);
  *  3. leading `www.` dropped;
  *  4. default ports dropped (`:80` for http, `:443` for https);
  *  5. tracking parameters removed (`utm_*`, `fbclid`, `gclid`) — the
  *     query is split on `&`, the param array filtered with a built-in
  *     higher-order `filter`, and rejoined: EXACT for any run length
  *     (the earlier fixed-two-pass `regexp_replace` left every third
  *     param of a ≥3-adjacent-tracker run — silent dedup recall loss on
  *     exactly the most-decorated URLs). The `?` survives only if at
  *     least one param does;
  *  6. trailing path slashes dropped (also directly before `?`), and a
  *     bare trailing `?` dropped.
  */
object UrlCanon {

  /** The tracking-param pattern [[graft.functions.TokenFolds
    * .stripTracking]] implements as a byte walk (kept here as the
    * documented contract the oracle replays relationally).
    */
  private[graft] val TRACK = "(utm_[^&=]*|fbclid|gclid)"

  /** The canonical form of a URL column (see object scaladoc contract). */
  def canonicalizeUrl(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*", "")
    // 2. lowercase scheme://authority, keep the rest as-is
    val schemeAuth = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val lowered = concat(
      lower(regexp_extract(noFrag, s"($schemeAuth)", 1)),
      regexp_replace(noFrag, schemeAuth, ""))
    // 3. www.
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    // 4. default ports (optional tail group instead of lookahead — RE2
    // has no lookarounds; an unmatched optional group substitutes empty
    // on both engines)
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/:?#]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]*):443([/?#].*)?$", "$1$2")
    // 5. tracking params: one codegen byte-walk over the query
    // ([[TextExpressions.StripTrackingExpr]] — split on '&', drop
    // ^(utm_[^&=]*|fbclid|gclid)= params, rejoin; exact for any run
    // length, unlike a global regexp_replace which restarts AFTER the
    // consumed separator and leaves every second param of an adjacent
    // run). The oracle keeps replaying the equivalent
    // list_filter(... regexp ...) form — the kernel implements exactly
    // that Java∩RE2-subset pattern.
    val base = regexp_extract(noPort, "^([^?]*)", 1)
    val query = regexp_extract(noPort, "^[^?]*\\?(.*)$", 1) // '' when no '?'
    val keptStr = TextExpressions.strip_tracking(query)
    val noTrack = when(query === "", noPort)
      .when(keptStr === "", base)
      .otherwise(concat(base, lit("?"), keptStr))
    // 6. trailing slashes and bare '?'
    val slashQ = regexp_replace(noTrack, "/+\\?", "?")
    val noTrailSlash = regexp_replace(slashQ, "(://[^/?#]+/[^?#]*?)/+$", "$1")
    regexp_replace(noTrailSlash, "\\?$", "")
  }

  /** Canonical-URL dedup statistics: one row per canonical form with the
    * colliding raw-URL count, distinct raw spellings and the minimum doc
    * id (the deterministic representative a keep-first dedup would
    * retain). One map pass + one hash aggregate on the canonical key.
    */
  def urlDedupStats(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(urlCol).as("url"))
      .withColumn("canonical_url", canonicalizeUrl(col("url")))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_forms"),
        min(col("doc_id")).as("keep_doc"))

  /** The normalized HOST of a URL — the key domain-level curation groups
    * and blocks on: authority extracted, lowercased, userinfo and port
    * stripped, leading `www.` dropped (the same spellings
    * [[canonicalizeUrl]] folds). Null/relative URLs yield the empty
    * string (no authority). Map-only built-ins in the Java∩RE2 subset.
    */
  def hostOf(url: Column): Column = {
    val auth = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val noPort = regexp_replace(noUser, ":[0-9]+$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Per-host corpus statistics — the table a domain-level policy is
    * derived FROM (a host contributing 10^6 near-identical pages is a
    * blocklist candidate; RefinedWeb-style curation works at this
    * granularity before any content read). One map pass + one hash
    * aggregate on the host.
    */
  def hostStats(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(urlCol).as("url"))
      .withColumn("host", hostOf(col("url")))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(canonicalizeUrl(col("url"))).as("n_canonical"),
        min(col("doc_id")).as("min_doc"))

  /** Mark each doc with its normalized host and whether that host is on
    * the blocklist (`blocked` DataFrame with a `host` column — host-count
    * sized, broadcast). Left join: unlisted hosts are `blocked = false`.
    */
  def markBlockedHosts(docs: DataFrame, urlCol: String,
                       blocked: DataFrame): DataFrame = {
    val inputCols = docs.columns.map(col)
    docs
      .withColumn("host", hostOf(col(urlCol)))
      .join(broadcast(blocked.select(col("host"), lit(true).as("_blk"))
        .distinct()), Seq("host"), "left")
      .select(inputCols ++ Seq(col("host"),
        coalesce(col("_blk"), lit(false)).as("blocked")): _*)
  }

  /** Keep only docs whose host is NOT blocklisted (broadcast anti-join —
    * the corpus never shuffles).
    */
  def dropBlockedHosts(docs: DataFrame, urlCol: String,
                       blocked: DataFrame): DataFrame =
    markBlockedHosts(docs, urlCol, blocked)
      .where(!col("blocked")).drop("host", "blocked")

  /** The REGISTRABLE domain (eTLD+1) of a URL — [[hostOf]] resolved
    * through the public-suffix snapshot ([[PublicSuffix]]), coalesced
    * back to the host when nothing is registrable (the host IS a public
    * suffix, or has no authority). This is the grouping key domain
    * curation should default to: `a.spam.example.co.uk` and
    * `b.spam.example.co.uk` are ONE site (`example.co.uk`), and blocking
    * it must not require enumerating subdomains.
    */
  def registrableDomainOf(url: Column,
                          rules: PublicSuffix.SuffixRules =
                            PublicSuffix.Snapshot): Column = {
    val host = hostOf(url)
    coalesce(graft.functions.PublicSuffix.registrable_domain(host, rules), host)
  }

  /** [[hostStats]] at registrable-domain granularity — the per-SITE
    * corpus statistics table (a site sharding 10^6 pages across
    * subdomains aggregates to one row here, where the host table
    * under-counts it into many).
    */
  def domainStats(docs: DataFrame, idCol: String, urlCol: String,
                  rules: PublicSuffix.SuffixRules =
                    PublicSuffix.Snapshot): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(urlCol).as("url"))
      .withColumn("domain", registrableDomainOf(col("url"), rules))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(canonicalizeUrl(col("url"))).as("n_canonical"),
        countDistinct(hostOf(col("url"))).as("n_hosts"),
        min(col("doc_id")).as("min_doc"))

  /** [[markBlockedHosts]] at registrable-domain granularity: one
    * blocklist row covers every subdomain of the site. Broadcast join,
    * map-only resolution — the corpus never shuffles.
    */
  def markBlockedDomains(docs: DataFrame, urlCol: String,
                         blocked: DataFrame,
                         rules: PublicSuffix.SuffixRules =
                           PublicSuffix.Snapshot): DataFrame = {
    val inputCols = docs.columns.map(col)
    docs
      .withColumn("domain", registrableDomainOf(col(urlCol), rules))
      .join(broadcast(blocked.select(col("domain"), lit(true).as("_blk"))
        .distinct()), Seq("domain"), "left")
      .select(inputCols ++ Seq(col("domain"),
        coalesce(col("_blk"), lit(false)).as("blocked")): _*)
  }

  /** Keep only docs whose registrable domain is NOT blocklisted. */
  def dropBlockedDomains(docs: DataFrame, urlCol: String,
                         blocked: DataFrame,
                         rules: PublicSuffix.SuffixRules =
                           PublicSuffix.Snapshot): DataFrame =
    markBlockedDomains(docs, urlCol, blocked, rules)
      .where(!col("blocked")).drop("domain", "blocked")
}
