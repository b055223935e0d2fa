package graft

import org.apache.spark.sql.functions._

import graft.operators.RobotsFilter
import graft.operators.RobotsFilter.parseRobotsRules

/** robots.txt semantics: group selection, longest-match with allow-wins
  * ties, wildcards/anchors, and the broadcast map-only URL marking.
  */
class RobotsFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private def verdict(rules: Seq[RobotsFilter.Rule], path: String): Boolean = {
    // same find-semantics as regexp_like (the rx is ^-anchored already)
    val matching = rules.filter(r =>
      java.util.regex.Pattern.compile(r.rx).matcher(path).find())
    if (matching.isEmpty) true
    else {
      val maxLen = matching.map(_.pattern.length).max
      matching.filter(_.pattern.length == maxLen).exists(_.allow)
    }
  }

  test("group selection: most-specific user-agent wins, * is fallback, equal groups merge") {
    val txt =
      """User-agent: *
        |Disallow: /all
        |
        |User-agent: graftbot
        |Disallow: /graft
        |
        |User-agent: graft
        |Disallow: /short
        |
        |User-agent: *
        |Disallow: /all2
        |""".stripMargin
    // most specific prefix of "graftbot" is the 8-char token
    assert(parseRobotsRules(txt, "graftbot").map(_.pattern) == Seq("/graft"))
    // agent "graftb": only the 5-char "graft" token prefixes it
    assert(parseRobotsRules(txt, "graftb").map(_.pattern) == Seq("/short"))
    // unknown agent: the two * groups MERGE
    assert(parseRobotsRules(txt, "otherbot").map(_.pattern) ==
      Seq("/all", "/all2"))
  }

  test("comments, unknown directives, empty Disallow, multi-agent group heads") {
    val txt =
      """# global rules
        |User-agent: a
        |User-agent: b
        |Disallow: /x  # tail comment
        |Crawl-delay: 10
        |Disallow:
        |Sitemap: http://e/s.xml
        |""".stripMargin
    assert(parseRobotsRules(txt, "a-bot").map(_.pattern) == Seq("/x"))
    assert(parseRobotsRules(txt, "b-bot").map(_.pattern) == Seq("/x"))
    assert(parseRobotsRules(null, "a") == Seq.empty)
  }

  test("longest-match decides; equal-length tie goes to allow; wildcards and $ anchor") {
    val rules = parseRobotsRules(
      """User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |Disallow: /p*f.pdf$
        |Allow: /tmpx
        |Disallow: /tmpy
        |""".stripMargin, "any")
    assert(!verdict(rules, "/private/secret"))
    assert(verdict(rules, "/private/ok/page")) // longer allow wins
    assert(verdict(rules, "/public"))          // no match → allowed
    assert(!verdict(rules, "/pdfs/f.pdf"))     // wildcard + anchor
    assert(verdict(rules, "/pdfs/f.pdfx"))     // anchor blocks the match
  }

  test("markAllowed: broadcast join + map-only fold, hosts without robots allowed, case-insensitive host") {
    val robots = Seq(
      ("H0.example", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n" +
        "Disallow: /*?sessionid=\nDisallow: /search?q=\n"),
      ("h1.example", "User-agent: *\nDisallow: /\n")).toDF("host", "content")
    val urls = Seq(
      (1L, "http://h0.example/public/a"),
      (2L, "http://h0.example/private/a"),
      (3L, "http://h0.example/private/ok/a"),
      (4L, "http://H1.example/anything"),
      (5L, "http://h9.example/whatever"),
      // rules match path+QUERY (RFC 9309): the query string must be
      // part of the match target, and its absence must not block
      (6L, "http://h0.example/public/a?sessionid=9"),
      (7L, "http://h0.example/search?q=x"),
      (8L, "http://h0.example/search")).toDF("id", "url")
    val marked = RobotsFilter.markAllowed(urls, robots, "url")
    val byId = marked.select("id", "allowed").as[(Long, Boolean)]
      .collect().toMap
    assert(byId == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> false, 7L -> false, 8L -> true))
    // the URL side never shuffles: broadcast join only
    val plan = marked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(RobotsFilter.filterAllowed(urls, robots, "url").count() == 4)
  }
}
