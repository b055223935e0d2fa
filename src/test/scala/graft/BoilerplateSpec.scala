package graft

import org.apache.spark.sql.functions._

import graft.operators.{Boilerplate, HtmlExtract}
import graft.operators.Boilerplate.{cleanHtmlString, isGoodBlock}

/** Boilerplate removal: the three integer block tests (length, link
  * density, stopword density), link accounting across block boundaries,
  * threshold exactness, and the codegen plan shape.
  */
class BoilerplateSpec extends SparkSpecBase {
  import spark.implicits._

  private def clean(html: String): String =
    cleanHtmlString(html, Boilerplate.MinWords, Boilerplate.LinkNum,
      Boilerplate.LinkDen, Boilerplate.StopNum, Boilerplate.StopDen)

  test("nav bars, tag clouds and stubs drop; prose survives") {
    val html =
      "<body><nav><a href='/'>home</a> <a href='/x'>products</a> " +
        "<a href='/y'>about us contact</a></nav>" +
        "<p>the quick brown fox is one of the best animals in town</p>" +
        "<div>buy cheap deals shop sale discount</div>" + // no stopwords
        "<p>ok</p>" + // too short
        "<footer><a href='/tos'>terms and conditions apply here now</a></footer></body>"
    assert(clean(html) == "the quick brown fox is one of the best animals in town")
  }

  test("a page with no content blocks yields the empty string; null passes through") {
    assert(clean("<div><a href='/'>home login menu signup now</a></div>") == "")
    assert(clean("") == "")
    assert(cleanHtmlString(null, 5, 3, 10, 1, 5) == null)
  }

  test("link-density boundary is integer-exact (cross-multiplied, no doubles)") {
    // 15-char, 5-word block with 2 stopwords: link budget is
    // linkChars*10 <= 15*3, i.e. linkChars <= 4
    val text = "aa bb cc the it"
    assert(isGoodBlock(text, 4, 5, 3, 10, 1, 5))
    assert(!isGoodBlock(text, 5, 5, 3, 10, 1, 5))
  }

  test("stopword-density and minWords boundaries") {
    // 5 words, zero stopwords: 0*5 >= 5*1 fails
    assert(!isGoodBlock("aa bb cc dd ee", 0, 5, 3, 10, 1, 5))
    // exactly one stopword of five: 1*5 >= 5*1 holds
    assert(isGoodBlock("aa bb cc dd the", 0, 5, 3, 10, 1, 5))
    // all-stopword but four words: minWords fails
    assert(!isGoodBlock("the it is a", 0, 5, 3, 10, 1, 5))
    assert(isGoodBlock("the it is a an", 0, 5, 3, 10, 1, 5))
  }

  test("anchor depth survives block boundaries; per-block link mass is counted where rendered") {
    val html = "<a href='/x'>one two<p>three four</p></a><p>the end is near today</p>"
    val blocks = Boilerplate.blockTable(
      Seq((1L, html)).toDF("doc_id", "html")).orderBy("block_idx").collect()
    assert(blocks.length == 3)
    assert(blocks(0).getAs[String]("text") == "one two" &&
      blocks(0).getAs[Int]("link_chars") == 7)
    // the second block renders entirely inside the still-open anchor
    assert(blocks(1).getAs[String]("text") == "three four" &&
      blocks(1).getAs[Int]("link_chars") == 10)
    assert(blocks(2).getAs[String]("text") == "the end is near today" &&
      blocks(2).getAs[Int]("link_chars") == 0 &&
      blocks(2).getAs[Boolean]("good"))
  }

  test("blockTable features: words, stopwords, chars, verdicts") {
    val html = "<p>the cat and the dog sat in the house</p>" +
      "<div><a href='/'>menu home login and more stuff</a></div>"
    val rows = Boilerplate.blockTable(
      Seq((7L, html)).toDF("doc_id", "html")).orderBy("block_idx").collect()
    assert(rows.length == 2)
    val content = rows(0)
    assert(content.getAs[Int]("n_words") == 9 &&
      content.getAs[Int]("n_stopwords") == 5 &&
      content.getAs[Boolean]("good"))
    val nav = rows(1)
    assert(nav.getAs[Int]("link_chars") == nav.getAs[Int]("n_chars") &&
      !nav.getAs[Boolean]("good"))
  }

  test("permissive thresholds reduce to plain extraction (composability witness)") {
    val pages = Seq(
      "<p>Hello <b>world</b></p><p>again</p>",
      "<div><a href='x'>l</a>ink &amp; more</div><p>t</p>",
      "<html><head><title>T</title></head><body>b<br>c</body></html>")
    for (p <- pages)
      assert(cleanHtmlString(p, 0, 1, 1, 0, 5) == HtmlExtract.extractTextString(p),
        s"thresholds-off mismatch on: $p")
  }

  test("language-parameterized stopwords: a French page survives with the French set, not the English default") {
    val html = "<p>le chat et le chien est dans la maison du village</p>"
    val fr = graft.operators.LanguageProfiles.profiles("fr")
    assert(cleanHtmlString(html, 5, 3, 10, 1, 5) == "",
      "the English default must drop French prose (no English stopwords)")
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val cleaned = Boilerplate.clean(df, stopwords = fr)
    assert(cleaned.collect().head.getAs[String]("text") ==
      "le chat et le chien est dans la maison du village")
    // empty stopword set is a plan-time error
    intercept[IllegalArgumentException] {
      Boilerplate.clean(df, stopwords = Seq.empty)
    }
  }

  test("clean is a codegen scalar: no object round-trip, no exchange") {
    val df = Seq((1L, "<p>the cat and the dog sat in the house</p>"))
      .toDF("doc_id", "html")
    val out = Boilerplate.clean(df)
    assert(out.collect().head.getAs[String]("text") ==
      "the cat and the dog sat in the house")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("DeserializeToObject"),
      s"boilerplate clean should stay map-only inside codegen:\n$plan")
  }
}
