package graft

import java.nio.charset.{Charset, StandardCharsets}

import graft.sources.{GzipArchives, HttpPayload, WarcRecords}
import graft.sources.HttpPayload.{decodeBody, parseHttpBytes, sniffMetaCharset}

import org.apache.spark.sql.functions.col

/** HTTP response parsing over binary WARC payloads: status line, header
  * semantics, Content-Length truncation, the WHATWG charset resolution
  * order (header param → meta sniff → UTF-8) and fail-soft decode.
  */
class HttpPayloadSpec extends SparkSpecBase {
  import spark.implicits._

  private def http(status: String, headers: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status\r\n$headers\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ body

  test("status line, mime and body recovered; reason phrase optional") {
    val r = parseHttpBytes(http("200 OK",
      "Content-Type: text/html; charset=utf-8",
      "<p>hi</p>".getBytes(StandardCharsets.UTF_8)))
    assert(r.ok && r.status == 200 && r.content_type == "text/html" &&
      r.charset == "utf-8" && new String(r.body, StandardCharsets.UTF_8) == "<p>hi</p>")
    val noReason = parseHttpBytes(http("404", "Content-Type: text/plain", Array[Byte]('x')))
    assert(noReason.ok && noReason.status == 404 && noReason.content_type == "text/plain")
  }

  test("non-HTTP payloads and garbage status lines are ok=false, never a throw") {
    assert(!parseHttpBytes(null).ok)
    assert(!parseHttpBytes("WARC/1.0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)).ok)
    assert(!parseHttpBytes("HTTP/1.1 abc OK\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)).ok)
    assert(!parseHttpBytes(Array[Byte](1, 2, 3)).ok)
  }

  test("headers: case-insensitive, first occurrence wins; Content-Length cuts trailing garbage, never pads") {
    val r = parseHttpBytes(http("200 OK",
      "CONTENT-TYPE: text/html\r\nContent-Type: text/plain\r\nContent-Length: 5",
      "helloJUNK".getBytes(StandardCharsets.ISO_8859_1)))
    assert(r.content_type == "text/html")
    assert(new String(r.body, StandardCharsets.ISO_8859_1) == "hello")
    val short = parseHttpBytes(http("200 OK", "Content-Length: 99",
      "tiny".getBytes(StandardCharsets.ISO_8859_1)))
    assert(new String(short.body, StandardCharsets.ISO_8859_1) == "tiny")
  }

  test("charset resolution order: header param beats meta, meta beats the UTF-8 default") {
    val metaBody = "<meta charset=\"windows-1252\"><p>x</p>"
      .getBytes(StandardCharsets.ISO_8859_1)
    val headerWins = parseHttpBytes(http("200 OK",
      "Content-Type: text/html; charset=ISO-8859-1", metaBody))
    assert(headerWins.charset == "iso-8859-1")
    val metaWins = parseHttpBytes(http("200 OK", "Content-Type: text/html", metaBody))
    assert(metaWins.charset == "windows-1252")
    val default = parseHttpBytes(http("200 OK", "Content-Type: text/html",
      "<p>x</p>".getBytes(StandardCharsets.UTF_8)))
    assert(default.charset == "utf-8")
  }

  test("meta sniff: http-equiv spelling, quote variants, window bound, absent") {
    assert(sniffMetaCharset(
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">")
        .getBytes(StandardCharsets.ISO_8859_1)) == "windows-1252")
    assert(sniffMetaCharset("<META CHARSET='UTF-8'>".getBytes(StandardCharsets.ISO_8859_1)) == "utf-8")
    assert(sniffMetaCharset("<meta charset=latin1>".getBytes(StandardCharsets.ISO_8859_1)) == "latin1")
    // a declaration past the 1024-byte prescan window is not consulted
    val far = (" " * HttpPayload.SniffWindow + "<meta charset=\"utf-8\">")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(sniffMetaCharset(far) == null)
    assert(sniffMetaCharset("<p>no meta</p>".getBytes(StandardCharsets.ISO_8859_1)) == null)
  }

  test("decodeBody: aliases, unknown labels fall back to UTF-8, malformed bytes replace — never a throw") {
    assert(decodeBody("café".getBytes(StandardCharsets.ISO_8859_1), "latin1") == "café")
    assert(decodeBody(Array[Byte](0x80.toByte), "cp1252") == "€") // € in cp1252
    assert(decodeBody("ok".getBytes(StandardCharsets.UTF_8), "klingon-8") == "ok")
    // lone continuation byte is malformed UTF-8 → U+FFFD, not an exception
    assert(decodeBody(Array[Byte](0xe9.toByte), "utf-8") == "�")
  }

  test("parseRecordBytes preserves raw octets the string flavor cannot: byte-level truncation, non-UTF-8 payload intact") {
    val payload = Array[Byte](0x80.toByte, 0xe9.toByte, 'a', 'b')
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ payload
    val (ok, t, _, _, _, cl, body) = WarcRecords.parseRecordBytes(rec)
    assert(ok && t == "response" && cl == 3L)
    assert(body.toSeq == Seq(0x80.toByte, 0xe9.toByte, 'a'.toByte))
    val (bad, _, _, _, _, _, _) = WarcRecords.parseRecordBytes("junk".getBytes)
    assert(!bad)
  }

  test("parseResponses end-to-end: archive → binary WARC → HTTP decode; splitter-corrupt rows pass through ok=false") {
    val bodies = Seq(
      ("windows-1252", "price €9"), // € = 0x80 on the wire
      ("utf-8", "café"))
    val recs = bodies.zipWithIndex.map { case ((cs, text), i) =>
      val b = text.getBytes(Charset.forName(cs))
      val h = http("200 OK", s"Content-Type: text/html; charset=$cs\r\n" +
        s"Content-Length: ${b.length}", b)
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/$i\r\n" +
        s"Content-Length: ${h.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ h
    } :+ "not a warc record".getBytes(StandardCharsets.ISO_8859_1)
    val archives = Seq((0L, GzipArchives.buildArchive(recs))).toDS()
    val out = HttpPayload.parseResponses(
      WarcRecords.parseMembersBinary(GzipArchives.explodeArchives(archives)))
      .orderBy(col("member_idx"))
      .collect()
    assert(out.length == 3)
    assert(out(0).getAs[Boolean]("ok") && out(0).getAs[String]("text") == "price €9" &&
      out(0).getAs[String]("charset") == "windows-1252")
    assert(out(1).getAs[Boolean]("ok") && out(1).getAs[String]("text") == "café")
    assert(!out(2).getAs[Boolean]("ok") && out(2).isNullAt(out(2).fieldIndex("text")))
  }
}
