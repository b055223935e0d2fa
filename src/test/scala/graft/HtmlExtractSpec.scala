package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract.extractTextString
import graft.operators.HtmlExtract

/** HTML → text: markup stripped, script/style/comments dropped, entities
  * decoded, block structure preserved as single newlines, fail-soft on
  * crawl garbage.
  */
class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  test("blocks become single newlines, inline tags vanish, text intact") {
    assert(extractTextString("<p>Hello <b>world</b></p><p>again</p>") ==
      "Hello world\nagain")
    assert(extractTextString(
      "<div><div>x</div></div><div>y</div>") == "x\ny")
    assert(extractTextString("a<br/>b<br>c") == "a\nb\nc")
    assert(extractTextString("<em>in</em>line") == "inline")
  }

  test("script and style payloads are dropped entirely, case-insensitive, with hostile content") {
    assert(extractTextString(
      "<SCRIPT type='t'>var a = '<p>no</p>';</ScRiPt>ok") == "ok")
    assert(extractTextString(
      "<style>p { color: red; } /* <div>no</div> */</style>yes") == "yes")
    assert(extractTextString("a<script>if (x > 1) { y(); }</script>b") == "a\nb")
  }

  test("comments vanish without inserting whitespace; CDATA is raw text") {
    assert(extractTextString("a<!--c <p>x</p> -->b") == "ab")
    assert(extractTextString("a<!-- unterminated") == "a")
    assert(extractTextString("<x><![CDATA[1 < 2 > 0]]></x>") == "1 < 2 > 0")
  }

  test("entities: named, decimal, hex, nbsp-as-space; unknown/overlong pass through") {
    assert(extractTextString("&lt;tag&gt; &amp; &#65;&#x42;") == "<tag> & AB")
    assert(extractTextString("a&nbsp;&nbsp;b") == "a b")
    assert(extractTextString("&bogus; &notanentityatall; &") ==
      "&bogus; &notanentityatall; &")
    assert(extractTextString("&#xZZ; &#99999999999;") == "&#xZZ; &#99999999999;")
  }

  test("quoted '>' inside attributes does not end the tag; unterminated structures truncate fail-soft") {
    assert(extractTextString("<a href='a>b' title=\"x>y\">link</a>") == "link")
    assert(extractTextString("text <a href=") == "text")
    assert(extractTextString("keep<script>var x = 1;") == "keep")
    // an UNCLOSED <title> (common malformed-crawl shape) must not
    // swallow the remaining document: only the open tag is skipped —
    // the title text leaks into the body, the body itself survives
    assert(extractTextString(
      "<html><head><title>T<body>the body text</body></html>") ==
      "T\nthe body text")
    // closed <title> still drops its payload entirely
    assert(extractTextString("<title>T</title>body here") == "body here")
    // unclosed script/style still fail-soft truncate (payload is code)
    assert(extractTextString("keep<style>.x{color:red}") == "keep")
  }

  test("whitespace collapses; doctype and head chrome drop; trailing trim") {
    assert(extractTextString("a \n\t  b") == "a b")
    // the title is metadata, not body text: it must NOT leak
    assert(extractTextString(
      "<!DOCTYPE html><html><head><title>T</title></head><body>c</body></html>") ==
      "c")
    assert(extractTextString("<title>only a title</title>") == "")
    assert(extractTextString("<p>x</p>\n\n  ") == "x")
    assert(extractTextString("") == "")
    assert(extractTextString(null) == null)
  }

  test("fuzz: random tag soup never throws, never leaks script payloads, and extraction is pure") {
    val rnd = new scala.util.Random(42)
    val atoms = Array("<", ">", "&", "p", "div", "script", "/", "\"", "'",
      "=", " ", "\n", "a", "&amp;", "<!--", "-->", "<![CDATA[", "]]>",
      "<script>", "</script>", "&#", ";", "$", "*", "é", "中")
    (0 until 500).foreach { _ =>
      val soup = (0 until rnd.nextInt(60))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      val once = extractTextString(soup) // must not throw
      assert(once != null)
      // purity: same input, same output
      assert(extractTextString(soup) == once)
    }
    // script payloads never leak, whatever garbage surrounds them
    (0 until 200).foreach { i =>
      val pre = atoms(i % atoms.length)
      val soup = s"$pre<script>SECRET_$i()</script>tail"
      assert(!extractTextString(soup).contains(s"SECRET_$i"),
        s"script payload leaked for prefix ${pre.replace("\n", "\\n")}")
    }
  }

  test("extract() is a map-only codegen scalar over the corpus") {
    val docs = Seq((1L, "<p>one</p>"), (2L, "<div>two &amp; three</div>"))
      .toDF("doc_id", "html")
    val out = HtmlExtract.extract(docs, "html")
    assert(out.select("text").as[String].collect().toSeq ==
      Seq("one", "two & three"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("DeserializeToObject"),
      plan)
  }
}
