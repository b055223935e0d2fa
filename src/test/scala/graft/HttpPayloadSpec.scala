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

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(b); g.close(); bo.toByteArray
  }

  test("Transfer-Encoding: chunked is de-chunked; framing supersedes Content-Length; extensions and trailers ignored") {
    val entity = "hello chunked world".getBytes(StandardCharsets.UTF_8)
    val framed = ("a;ext=1\r\n").getBytes(StandardCharsets.ISO_8859_1) ++
      entity.take(10) ++ "\r\n9\r\n".getBytes(StandardCharsets.ISO_8859_1) ++
      entity.drop(10) ++
      "\r\n0\r\nX-Trailer: t\r\n\r\nJUNK".getBytes(StandardCharsets.ISO_8859_1)
    val r = parseHttpBytes(http("200 OK",
      "Content-Type: text/plain\r\nTransfer-Encoding: chunked\r\nContent-Length: 3",
      framed))
    assert(r.ok && new String(r.body, StandardCharsets.UTF_8) == "hello chunked world")
    // malformed framing (lying size) flags the row, never leaks garbage
    val bad = parseHttpBytes(http("200 OK", "Transfer-Encoding: chunked",
      "ff\r\nshort\r\n0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)))
    assert(!bad.ok)
    // a non-chunked transfer coding is undecodable here: flagged
    val odd = parseHttpBytes(http("200 OK", "Transfer-Encoding: gzip",
      "x".getBytes(StandardCharsets.ISO_8859_1)))
    assert(!odd.ok)
  }

  test("Content-Encoding: gzip/deflate decompressed (charset sniff on the DECODED entity); unsupported codings flagged") {
    val html = "<meta charset=\"windows-1252\"><p>café</p>"
    val bytes = html.getBytes(Charset.forName("windows-1252"))
    val r = parseHttpBytes(http("200 OK",
      s"Content-Type: text/html\r\nContent-Encoding: gzip\r\nContent-Length: ${gz(bytes).length}",
      gz(bytes)))
    assert(r.ok && r.charset == "windows-1252" &&
      decodeBody(r.body, r.charset) == html)
    // zlib-wrapped deflate
    val zlib = {
      val bo = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bo)
      d.write("plain deflate".getBytes(StandardCharsets.UTF_8)); d.close()
      bo.toByteArray
    }
    val rz = parseHttpBytes(http("200 OK",
      s"Content-Encoding: deflate\r\nContent-Length: ${zlib.length}", zlib))
    assert(rz.ok && new String(rz.body, StandardCharsets.UTF_8) == "plain deflate")
    // corrupt gzip and undecodable codings flag, never throw
    assert(!parseHttpBytes(http("200 OK", "Content-Encoding: gzip",
      "not gzip at all".getBytes(StandardCharsets.ISO_8859_1))).ok)
    assert(!parseHttpBytes(http("200 OK", "Content-Encoding: br",
      "brotli bytes".getBytes(StandardCharsets.ISO_8859_1))).ok)
    // identity is a no-op
    assert(parseHttpBytes(http("200 OK", "Content-Encoding: identity",
      "asis".getBytes(StandardCharsets.ISO_8859_1))).ok)
  }

  test("chunked + gzip compose: de-chunk first, then decompress") {
    val entity = gz("layered <p>body</p>".getBytes(StandardCharsets.UTF_8))
    val h = entity.length / 2
    val framed =
      (java.lang.Integer.toHexString(h) + "\r\n").getBytes(StandardCharsets.ISO_8859_1) ++
        entity.take(h) ++
        ("\r\n" + java.lang.Integer.toHexString(entity.length - h) + "\r\n")
          .getBytes(StandardCharsets.ISO_8859_1) ++
        entity.drop(h) ++ "\r\n0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val r = parseHttpBytes(http("200 OK",
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip", framed))
    assert(r.ok &&
      new String(r.body, StandardCharsets.UTF_8) == "layered <p>body</p>")
  }
}
