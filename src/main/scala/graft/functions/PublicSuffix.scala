package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** eTLD+1 (registrable-domain) resolution over the public-suffix list —
  * domain-level curation's real grouping key. Host-level grouping
  * under-aggregates sites that shard across subdomains
  * (`a.spam.example.co.uk`, `b.spam.example.co.uk`) and makes blocklists
  * enumerate every subdomain; the registrable domain (`example.co.uk`)
  * is the unit a site owner actually controls.
  *
  * The matcher implements the PSL algorithm over Mozilla's
  * publicsuffix.org data:
  *
  *  - a rule matches a host when the host ends with the rule's labels;
  *  - `*.` wildcard rules match any single label at their position
  *    (`*.ck` makes `example.ck` a public suffix);
  *  - `!` exception rules override a wildcard (`!www.ck` — `www.ck` is
  *    registrable even though `*.ck` would cover it);
  *  - the prevailing rule is the exception if one matches, else the
  *    matching rule with the most labels; no match falls back to the
  *    implicit `*` rule (the last label is the public suffix);
  *  - registrable domain = public suffix + one preceding label; a host
  *    that IS a public suffix has none (null).
  *
  * Rules live in a [[SuffixRules]] value: the compiled-in [[Snapshot]]
  * (a trimmed set of the common ccTLD second-level registries plus a few
  * ubiquitous hosting suffixes) is the default, and [[fromFile]] /
  * [[fromLines]] load the REAL `publicsuffix.dat` (comments, the
  * `===BEGIN ICANN/PRIVATE DOMAINS===` section markers, wildcards,
  * exceptions) into the same shape — same algorithm, same codegen. The
  * rules ride into generated code via `addReferenceObj` (the
  * PhraseMatches pattern), so a 10k-rule production list adds ZERO plan
  * text.
  *
  * Everything is a per-row label walk against in-JVM hash sets —
  * map-only, codegen ([[RegistrableDomain]]), no shuffle, no driver
  * round-trip.
  */
object PublicSuffix {

  /** One loaded rule list. The sets hold lowercase label suffixes:
    * `exact` full rules, `wildcards` the part AFTER the `*.` (`"ck"` for
    * `*.ck`), `exceptions` the rule without the `!`.
    */
  final class SuffixRules(
      val exact: java.util.HashSet[String],
      val wildcards: java.util.HashSet[String],
      val exceptions: java.util.HashSet[String]) extends Serializable {

    /** The public suffix of a lowercase host (no trailing dot), per the
      * PSL algorithm. Empty/null-ish hosts return the input.
      */
    def publicSuffix(host: String): String = {
      if (host == null || host.isEmpty) return host
      var bestStart = -1 // start offset of the matched public suffix
      var bestLabels = 0
      val n = host.length
      // walk every suffix-by-label: offsets 0 and after each dot
      var start = 0
      var labelsFrom = countLabels(host, 0)
      while (start <= n) {
        val cand = if (start == 0) host else host.substring(start)
        if (exceptions.contains(cand)) {
          // exception prevails: its public suffix is the rule minus the
          // leftmost label
          val dot = cand.indexOf('.')
          return if (dot < 0) "" else cand.substring(dot + 1)
        }
        if (exact.contains(cand) && labelsFrom > bestLabels) {
          bestStart = start; bestLabels = labelsFrom
        }
        // wildcard: cand = <label>.<w>
        val dot = cand.indexOf('.')
        if (dot > 0 && wildcards.contains(cand.substring(dot + 1)) &&
            labelsFrom > bestLabels) {
          bestStart = start; bestLabels = labelsFrom
        }
        // advance to the next label
        val nd = host.indexOf('.', start)
        if (nd < 0) start = n + 1 else { start = nd + 1; labelsFrom -= 1 }
      }
      if (bestStart >= 0) host.substring(bestStart)
      else {
        // implicit * rule: the last label
        val last = host.lastIndexOf('.')
        if (last < 0) host else host.substring(last + 1)
      }
    }

    /** Registrable domain (eTLD+1) of a lowercase host: public suffix
      * plus ONE preceding label; null when the host IS a public suffix
      * (nothing registrable) or has no dots worth grouping by. Column
      * consumers coalesce to the host.
      */
    def registrableDomain(host: String): String = {
      if (host == null || host.isEmpty) return null
      val ps = publicSuffix(host)
      if (ps == null || ps.length >= host.length) return null // host == suffix
      // the label immediately before the suffix
      val cut = host.length - ps.length - 1 // index of the '.' before ps
      if (cut <= 0 || host.charAt(cut) != '.') return null // malformed
      val prev = host.lastIndexOf('.', cut - 1)
      host.substring(prev + 1)
    }

    def size: Int = exact.size + wildcards.size + exceptions.size
  }

  private def countLabels(s: String, from: Int): Int = {
    var c = 1
    var i = from
    while (i < s.length) { if (s.charAt(i) == '.') c += 1; i += 1 }
    c
  }

  /** Parse PSL `publicsuffix.dat`-format lines into a [[SuffixRules]].
    * Format (public spec at publicsuffix.org/list/):
    *  - each line is read up to the first whitespace; blank lines and
    *    `//` comment lines are ignored;
    *  - the `// ===BEGIN ICANN DOMAINS===` / `// ===BEGIN PRIVATE
    *    DOMAINS===` markers delimit the two sections; `includePrivate =
    *    false` keeps only ICANN rules (the choice matters: private rules
    *    like `github.io` make every user site its own "domain");
    *  - `!rule` = exception, `*.rule` = wildcard, else exact. Rules are
    *    lowercased; wildcards are leading-label only (the only form the
    *    published list uses).
    */
  def fromLines(lines: Iterator[String],
                includePrivate: Boolean = true): SuffixRules = {
    val exact = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()
    val exc = new java.util.HashSet[String]()
    var inPrivate = false
    lines.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("//")) {
        if (line.contains("===BEGIN PRIVATE DOMAINS===")) inPrivate = true
        else if (line.contains("===END PRIVATE DOMAINS===")) inPrivate = false
      } else if (line.nonEmpty && (includePrivate || !inPrivate)) {
        // read up to the first whitespace
        val ws = line.indexWhere(Character.isWhitespace)
        val rule = (if (ws >= 0) line.substring(0, ws) else line).toLowerCase(java.util.Locale.ROOT)
        if (rule.startsWith("!")) exc.add(rule.substring(1))
        else if (rule.startsWith("*.")) wild.add(rule.substring(2))
        else if (rule != "*") exact.add(rule)
      }
    }
    new SuffixRules(exact, wild, exc)
  }

  /** Load the real `publicsuffix.dat` from a local/DFS-visible file. */
  def fromFile(path: String, includePrivate: Boolean = true): SuffixRules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromLines(src.getLines(), includePrivate)
    finally src.close()
  }

  /** The compiled-in trimmed snapshot (see object scaladoc). */
  val Snapshot: SuffixRules = {
    val exact = new java.util.HashSet[String]()
    val ccSecondLevel = Seq(
      // uk
      "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk",
      "plc.uk", "sch.uk", "nhs.uk", "police.uk",
      // au
      "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
      // jp
      "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp",
      "gr.jp", "lg.jp",
      // nz
      "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
      "gen.nz", "geek.nz", "maori.nz", "iwi.nz",
      // br
      "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
      // in
      "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
      "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
      // cn
      "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
      // za
      "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
      // kr
      "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
      "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr",
      // tw / hk / sg / my / ph / vn / th / id
      "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
      "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
      "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
      "com.my", "net.my", "org.my", "gov.my", "edu.my", "name.my",
      "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
      "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn",
      "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th", "mi.th",
      "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
      "my.id", "biz.id",
      // mx / ar / co / pe / ve / ec / uy / cl
      "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
      "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
      "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
      "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "nom.pe",
      "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve",
      "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec", "fin.ec",
      "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy",
      "gob.cl", "gov.cl", "mil.cl",
      // il / tr / ua / pl / ru / eg / sa / ae / ng / ke / gh / tz / ug / zw
      "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il",
      "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "k12.tr",
      "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
      "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
      "waw.pl", "biz.pl",
      "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
      "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
      "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
      "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae",
      "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "i.ng",
      "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
      "com.gh", "org.gh", "gov.gh", "edu.gh",
      "co.tz", "or.tz", "go.tz", "ac.tz", "ne.tz",
      "co.ug", "or.ug", "go.ug", "ac.ug", "ne.ug", "sc.ug",
      "co.zw", "org.zw", "gov.zw", "ac.zw",
      // misc multis that show up constantly in crawls
      "co.at", "or.at", "ac.at", "gv.at",
      "com.es", "nom.es", "org.es", "gob.es", "edu.es",
      "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt",
      "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr")
    val hosting = Seq(
      // ubiquitous hosting/platform suffixes from the PSL private section
      "github.io", "gitlab.io", "blogspot.com", "appspot.com",
      "herokuapp.com", "cloudfront.net", "netlify.app", "vercel.app",
      "azurewebsites.net", "firebaseapp.com", "web.app", "pages.dev",
      "workers.dev", "glitch.me", "onrender.com", "fly.dev")
    (ccSecondLevel ++ hosting).foreach(exact.add)
    val wild = new java.util.HashSet[String]()
    Seq("ck", "bd", "er", "fk", "jm", "kh", "mm", "np", "pg",
      "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
      "sapporo.jp", "sendai.jp", "yokohama.jp").foreach(wild.add)
    val exc = new java.util.HashSet[String]()
    Seq("www.ck", "city.kawasaki.jp").foreach(exc.add)
    new SuffixRules(exact, wild, exc)
  }

  /** Snapshot-backed convenience (the shape round-11 callers used). */
  def publicSuffix(host: String): String = Snapshot.publicSuffix(host)

  /** Snapshot-backed convenience. */
  def registrableDomain(host: String): String = Snapshot.registrableDomain(host)

  /** [[SuffixRules.registrableDomain]] as a codegen scalar — the rule
    * sets ride as ONE plan reference object regardless of list size
    * (trimmed snapshot or the full ~10k-rule `publicsuffix.dat`).
    * Null in → null out; null also when nothing is registrable.
    */
  case class RegistrableDomain(child: Expression, rules: SuffixRules)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_registrable_domain"

    override def nullSafeEval(v: Any): Any = {
      val r = rules.registrableDomain(v.asInstanceOf[UTF8String].toString)
      if (r == null) null else UTF8String.fromString(r)
    }

    override def nullable: Boolean = true

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rulesRef = ctx.addReferenceObj("graftPslRules", rules,
        classOf[SuffixRules].getName)
      nullSafeCodeGen(ctx, ev, v => {
        val rd = ctx.freshName("rd")
        s"""
           |String $rd = $rulesRef.registrableDomain($v.toString());
           |if ($rd == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($rd); }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def registrable_domain(host: Column,
                         rules: SuffixRules = Snapshot): Column =
    column(RegistrableDomain(expression(host), rules))
}
