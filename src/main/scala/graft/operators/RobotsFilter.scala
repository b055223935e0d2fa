package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt politeness filtering — the crawl-side admission gate that
  * decides, per URL, whether the corpus may contain it at all. Semantics
  * follow the public Robots Exclusion Protocol (RFC 9309 shape):
  *
  *  - groups = consecutive `User-agent` lines followed by their rules;
  *    the group that applies is the MOST SPECIFIC matching one (longest
  *    agent token that is a case-insensitive prefix of ours; `*` is the
  *    fallback), and when several user-agent lines head one group the
  *    group applies if ANY matches;
  *  - rule matching is longest-(pattern)-match; a tie between Allow and
  *    Disallow of equal length resolves to ALLOW; no matching rule (or
  *    no robots.txt for the host) means allowed;
  *  - patterns support `*` (any char run) and a trailing `$` anchor;
  *  - `#` comments, unknown directives (Crawl-delay, Sitemap) and blank
  *    lines are ignored; an empty `Disallow:` value allows everything
  *    (it can never match more specifically than any other rule).
  *
  * Scale shape: robots tables are HOST-sized (10^6-ish rows), URLs are
  * corpus-sized — so rules are parsed on the tiny side, collected to one
  * array row per host, BROADCAST, and the per-URL decision is a map-only
  * fold over that host's rule array: the URL table never shuffles.
  */
object RobotsFilter {

  /** One parsed rule: the raw pattern (its length IS the specificity;
    * `*` and `$` keep their RFC 9309 meaning and are matched by
    * [[graft.functions.TokenFolds.robotsMatch]]'s char walk — no regex
    * form exists anywhere on this path) and the verdict.
    */
  final case class Rule(pattern: String, allow: Boolean)

  /** Parse `content` and return the rules of the group that applies to
    * `agent` (most-specific user-agent match; `*` fallback; empty when
    * no group applies or content is null).
    */
  def parseRobotsRules(content: String, agent: String): Seq[Rule] = {
    if (content == null) return Seq.empty
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // group accumulator: (specificity, rules) — specificity is the
    // longest matching UA token length; -1 = group does not apply, 0 = *
    var bestSpec = -1
    var bestRules = Vector.empty[Rule]
    var curSpec = -1
    var curRules = Vector.empty[Rule]
    var inAgentRun = false // consecutive User-agent lines extend ONE group
    def closeGroup(): Unit = {
      if (curSpec > bestSpec) { bestSpec = curSpec; bestRules = curRules }
      // equally specific groups MERGE (RFC 9309: multiple groups
      // matching the same agent combine)
      else if (curSpec == bestSpec && curSpec >= 0) bestRules ++= curRules
      curSpec = -1; curRules = Vector.empty
    }
    content.split("\n", -1).foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) closeGroup()
            inAgentRun = true
            val tok = value.toLowerCase(java.util.Locale.ROOT)
            val spec =
              if (tok == "*") 0
              else if (agentLc.startsWith(tok)) tok.length
              else -1
            if (spec > curSpec) curSpec = spec
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty && curSpec >= 0)
              curRules :+= Rule(value, key == "allow")
          case _ => inAgentRun = false // Crawl-delay, Sitemap, unknown
        }
      }
    }
    closeGroup()
    bestRules
  }

  /** Parse a robots table `(hostCol, contentCol)` into one broadcastable
    * row per host: `(host, patterns ARRAY<STRING>, allows ARRAY<BOOLEAN>)`
    * — parallel arrays, raw patterns (no regex compilation anywhere).
    * mapPartitions on the HOST-sized side only.
    */
  def robotsRules(robots: DataFrame, agent: String,
                  hostCol: String = "host",
                  contentCol: String = "content"): DataFrame = {
    import robots.sparkSession.implicits._
    // ONE row per host, deterministically (min content on a re-fetch
    // collision): a duplicate host row would otherwise FAN OUT every
    // URL of that host through markAllowed's join — duplicate documents
    // in the corpus, not just duplicate verdicts
    robots.select(col(hostCol).as("host"), col(contentCol).as("content"))
      .groupBy("host").agg(min("content").as("content"))
      .as[(String, String)]
      .mapPartitions(_.map { case (host, content) =>
        val rs = parseRobotsRules(content, agent)
        (host, rs.map(_.pattern), rs.map(_.allow))
      })
      .toDF("host", "patterns", "allows")
  }

  /** Mark every URL with `allowed` against the agent's rules — broadcast
    * join on the host plus ONE codegen scalar per URL
    * ([[graft.functions.TextExpressions.robots_verdict]]): a
    * longest-match fold over the host's rule arrays with RFC 9309
    * `*`/`$` matching as a direct char walk (RFC tie-break: equal length
    * resolves to allow). No `Pattern.compile`, no interpreted HOF — the
    * URL side stays map-only inside WholeStageCodegen. URLs whose host
    * has no robots row are allowed (the verdict is null there; coalesced
    * to true). Rules match against path + `?query` (RFC 9309 matches the
    * path-and-query target, so `Disallow: /search?q=` and wildcard query
    * rules like a disallow on `*?sessionid=` work); a URL without a
    * query string matches against the bare path.
    */
  def markAllowed(urls: DataFrame, robots: DataFrame, urlCol: String,
                  agent: String = "*"): DataFrame = {
    val rules = robotsRules(robots, agent)
    val inputCols = urls.columns.map(col)
    val query = parse_url(col(urlCol), lit("QUERY"))
    val verdict = graft.functions.TextExpressions.robots_verdict(
      col("_path"), col("_patterns"), col("_allows"))
    urls
      .withColumn("_host", lower(parse_url(col(urlCol), lit("HOST"))))
      .withColumn("_path", concat(
        // RFC 9309: the empty path (authority-only URL, parse_url
        // yields "" not null) is the root — "Disallow: /" must block
        // the homepage too
        when(parse_url(col(urlCol), lit("PATH")).isNull ||
            parse_url(col(urlCol), lit("PATH")) === "", lit("/"))
          .otherwise(parse_url(col(urlCol), lit("PATH"))),
        when(query.isNotNull, concat(lit("?"), query)).otherwise(lit(""))))
      .join(broadcast(rules.select(lower(col("host")).as("_host"),
        col("patterns").as("_patterns"), col("allows").as("_allows"))),
        Seq("_host"), "left")
      .select(inputCols :+ coalesce(verdict, lit(true)).as("allowed"): _*)
  }

  /** Keep only the allowed URLs. */
  def filterAllowed(urls: DataFrame, robots: DataFrame, urlCol: String,
                    agent: String = "*"): DataFrame =
    markAllowed(urls, robots, urlCol, agent).where(col("allowed")).drop("allowed")
}
