package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** HTML → text extraction — the first text stage of a web-crawl
  * pipeline (between archive ingest and preClean): strip markup, drop
  * `<script>`/`<style>`/`<title>` payloads and comments entirely (the
  * title is document METADATA — jusText/trafilatura-class extractors
  * exclude it from body text, and keeping it pollutes dedup: two pages
  * with the same body but different titles would stop being exact
  * dups), decode the
  * entities that appear in real crawl text, and turn block-level tags
  * into newlines so the paragraph structure survives for
  * [[TextAnalysis.dedupParagraphs]]. One pass, one output buffer, no
  * regex backtracking — a MAP-ONLY stage whose cost is the character
  * walk itself, run per-row via the codegen scalar
  * [[graft.functions.TextExpressions.html_text]].
  *
  * The parser is deliberately fail-soft on the garbage real crawls
  * carry: an unterminated tag or an unclosed script drops the REST of
  * the document (truncation, never an exception), quotes inside tags
  * are honored (an attribute containing `>` does not end the tag),
  * unknown entities pass through literally, and CDATA payloads are
  * emitted as raw text. Whitespace: runs collapse to one space; block
  * boundaries collapse to ONE newline regardless of how many nested
  * block tags close there.
  *
  * The walker is block-structured: [[walkBlocks]] emits each text block
  * (the text between block-tag boundaries) together with how many of
  * its characters were rendered inside `<a>` anchors — the link-density
  * signal [[Boilerplate]] classifies on. [[extractTextString]] is the
  * blocks joined with single newlines.
  */
object HtmlExtract {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "tr", "td",
    "th", "table", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "pre", "section", "article", "header", "footer", "nav", "aside",
    "form", "hr", "main", "title", "head", "body", "html")

  /** Decode one entity starting at `i` (which holds '&'); returns
    * (replacement, consumed) or ("", 0) to pass the '&' through.
    */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val e = s.indexOf(';', i + 1)
    if (e < 0 || e - i > 10) return ("", 0)
    val body = s.substring(i + 1, e)
    val rep = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case b if b.length > 1 && b.charAt(0) == '#' =>
        val hex = b.length > 2 && (b.charAt(1) == 'x' || b.charAt(1) == 'X')
        try {
          val cp = Integer.parseInt(b.substring(if (hex) 2 else 1), if (hex) 16 else 10)
          if (Character.isValidCodePoint(cp) && cp > 0)
            new String(Character.toChars(cp))
          else return ("", 0)
        } catch { case _: NumberFormatException => return ("", 0) }
      case _ => return ("", 0)
    }
    (rep, e - i + 1)
  }

  /** Walk `html` once, emitting `(blockText, linkChars)` per text block
    * to `sink`. `linkChars` counts the characters of the block (spaces
    * included) rendered while inside an `<a>` anchor — materialized at
    * append time, so a space BETWEEN two link words counts as link mass
    * while the space that merely precedes a link does too only if it is
    * rendered after the anchor opened. Blocks are never empty; a literal
    * newline decoded from an entity stays INSIDE its block (the joined
    * output reproduces [[extractTextString]] exactly).
    */
  private[graft] def walkBlocks(html: String, sink: (String, Int) => Unit): Unit = {
    val n = html.length
    val buf = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var linkChars = 0
    var linkDepth = 0
    var pendingNewline = false
    var pendingSpace = false

    def trimTrailingSpaces(): Unit =
      while (buf.length > 0 && buf.charAt(buf.length - 1) == ' ')
        buf.setLength(buf.length - 1)

    def flushBlock(): Unit = {
      sink(buf.toString, linkChars)
      buf.setLength(0)
      linkChars = 0
    }

    def appendChar(c: Char): Unit = {
      if (pendingNewline) {
        trimTrailingSpaces()
        // a buffer already ending in a literal newline absorbs the block
        // boundary (mirrors the single-'\n' collapse of the joined form)
        if (buf.length > 0 && buf.charAt(buf.length - 1) != '\n') flushBlock()
        pendingNewline = false; pendingSpace = false
      } else if (pendingSpace) {
        if (buf.length > 0 && buf.charAt(buf.length - 1) != '\n') {
          buf.append(' ')
          if (linkDepth > 0) linkChars += 1
        }
        pendingSpace = false
      }
      buf.append(c)
      if (linkDepth > 0) linkChars += 1
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      // '<' before anything but a letter, '/', '!' or '?' is literal TEXT
      // (the HTML5 tokenizer rule) — otherwise junk like "<<script>"
      // would swallow the real script opener and LEAK its payload
      val tagOpener = c == '<' && i + 1 < n && {
        val d = html.charAt(i + 1)
        (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
          d == '/' || d == '!' || d == '?'
      }
      if (tagOpener) {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          if (e < 0) i = n // unterminated CDATA: fail-soft truncation,
          else {           // never dump the raw remainder as text
            var k = i + 9
            while (k < e) { // terminated CDATA payload is raw text
              val d = html.charAt(k)
              if (d == ' ' || d == '\t' || d == '\r' || d == '\n') pendingSpace = true
              else appendChar(d)
              k += 1
            }
            i = e + 3
          }
        } else {
          // scan to the tag's '>' honoring quoted attribute values
          var j = i + 1
          var quote: Char = 0
          var end = -1
          while (j < n && end < 0) {
            val d = html.charAt(j)
            if (quote != 0) { if (d == quote) quote = 0 }
            else if (d == '"' || d == '\'') quote = d
            else if (d == '>') end = j
            j += 1
          }
          if (end < 0) i = n // unterminated tag: fail-soft truncation
          else {
            val inner = html.substring(i + 1, end)
            val isClose = inner.startsWith("/")
            val rest = if (isClose) inner.substring(1) else inner
            var ne = 0
            while (ne < rest.length && {
              val ch = rest.charAt(ne)
              (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
                (ch >= '0' && ch <= '9')
            }) ne += 1
            val name = rest.substring(0, ne).toLowerCase(java.util.Locale.ROOT)
            if (!isClose && (name == "script" || name == "style" ||
                name == "title")) {
              val close = "</" + name
              var k = end + 1
              var found = -1
              while (k + close.length <= n && found < 0) {
                if (html.regionMatches(true, k, close, 0, close.length)) found = k
                k += 1
              }
              // unclosed payload tag: for script/style drop the rest
              // (the content is code — emitting it would be worse), but
              // an unclosed <title> is COMMON in malformed crawl HTML
              // and its payload is a short line of text — skip just the
              // open tag rather than discard the entire remaining body
              if (found < 0) i = if (name == "title") end + 1 else n
              else {
                val gt = html.indexOf('>', found)
                i = if (gt < 0) n else gt + 1
              }
              pendingNewline = true
            } else {
              if (name == "a") {
                if (isClose) { if (linkDepth > 0) linkDepth -= 1 }
                else linkDepth += 1
              }
              if (BlockTags.contains(name)) pendingNewline = true
              i = end + 1
            }
          }
        }
      } else if (c == '&') {
        val (rep, len) = decodeEntity(html, i)
        if (len == 0) { appendChar('&'); i += 1 }
        else {
          var k = 0
          while (k < rep.length) {
            val d = rep.charAt(k)
            if (d == ' ') pendingSpace = true else appendChar(d)
            k += 1
          }
          i += len
        }
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f') {
        pendingSpace = true
        i += 1
      } else {
        appendChar(c)
        i += 1
      }
    }
    trimTrailingSpaces()
    while (buf.length > 0 && buf.charAt(buf.length - 1) == '\n')
      buf.setLength(buf.length - 1)
    if (buf.length > 0) flushBlock()
  }

  /** The pure extraction function (null passes through): the walked
    * blocks joined with single newlines.
    */
  def extractTextString(html: String): String = {
    if (html == null) return null
    val out = new java.lang.StringBuilder(math.min(html.length, 1 << 16))
    walkBlocks(html, (text, _) => {
      if (out.length > 0) out.append('\n')
      out.append(text)
    })
    out.toString
  }

  /** Replace `htmlCol` with its extracted text (map-only codegen scalar;
    * paragraph structure preserved as single newlines).
    */
  def extract(docs: DataFrame, htmlCol: String = "html",
              outCol: String = "text"): DataFrame =
    docs.withColumn(outCol,
      graft.functions.TextExpressions.html_text(col(htmlCol)))
}
