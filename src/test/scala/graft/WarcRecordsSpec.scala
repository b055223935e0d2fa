package graft

import graft.sources.{GzipArchives, WarcRecords}
import graft.sources.WarcRecords.parseRecordString

/** WARC/WET record parsing: header semantics, Content-Length payload
  * truncation, fail-soft on garbage, composition with the archive
  * splitter.
  */
class WarcRecordsSpec extends SparkSpecBase {
  import spark.implicits._

  private def rec(headers: String, body: String) =
    s"WARC/1.0\r\n$headers\r\n\r\n$body"

  test("basic WET record: all fields recovered, body intact") {
    val r = parseRecordString(rec(
      "WARC-Type: conversion\r\nWARC-Target-URI: http://x/1\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: text/plain\r\n" +
        "Content-Length: 5", "hello"))
    assert(r == ((true, "conversion", "http://x/1", "2026-01-01T00:00:00Z",
      "text/plain", 5L, "hello")))
  }

  test("Content-Length truncates trailing garbage by BYTES; short bodies are not padded") {
    val garbage = parseRecordString(rec("Content-Length: 5", "helloGARBAGE"))
    assert(garbage._7 == "hello")
    // multi-byte boundary: é is 2 UTF-8 bytes — length 3 keeps 'aé'
    val multi = parseRecordString(rec("Content-Length: 3", "aéb"))
    assert(multi._7 == "aé")
    // a cut landing MID-sequence backs off to the last complete code
    // point instead of manufacturing a trailing U+FFFD ('é' is bytes
    // C3 A9; cutting at 2 lands between them)
    val mid = parseRecordString(rec("Content-Length: 2", "aéb"))
    assert(mid._7 == "a")
    // 4-byte sequence: '😀' is F0 9F 98 80; cut at 5 lands inside it,
    // cut at 6 lands exactly after it
    val midEmoji = parseRecordString(rec("Content-Length: 5", "ab😀cd"))
    assert(midEmoji._7 == "ab")
    val atEmoji = parseRecordString(rec("Content-Length: 6", "ab😀cd"))
    assert(atEmoji._7 == "ab😀")
    val short = parseRecordString(rec("Content-Length: 99", "tiny"))
    assert(short._7 == "tiny" && short._6 == 99L)
    val none = parseRecordString(rec("WARC-Type: t", "free body"))
    assert(none._7 == "free body" && none._6 == -1L)
  }

  test("invalid UTF-8 BEFORE the boundary does not shift the cut: the string flavor is a decode over the byte flavor") {
    // one raw 0xFF byte (invalid UTF-8) early in the payload, then ASCII.
    // The retired parallel string implementation decoded first (0xFF →
    // U+FFFD, which RE-encodes as 3 bytes) and measured the re-encoded
    // stream, shifting the Content-Length cut 2 bytes early. Measuring
    // raw bytes keeps the cut exact.
    val headerBytes = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 10\r\n\r\n").getBytes("ISO-8859-1")
    val payload = Array[Byte]('a', 0xFF.toByte, 'b', 'c', 'd', 'e', 'f',
      'g', 'h', 'i', 'J', 'U', 'N', 'K')
    val raw = headerBytes ++ payload
    // byte flavor: byte-exact ground truth — exactly the first 10 bytes
    val (okB, _, _, _, _, clB, bodyB) =
      graft.sources.WarcRecords.parseRecordBytes(raw)
    assert(okB && clB == 10L && bodyB.toSeq == payload.take(10).toSeq)
    // string flavor over the same member (the parseMembers path hands it
    // raw bytes; parseRecordString itself round-trips via UTF-8, which
    // is lossy on 0xFF — so compare through the members API)
    import spark.implicits._
    val members = Seq(graft.sources.GzipArchives.MemberRow(0L, 0, ok = true, raw))
      .toDS()
    val row = graft.sources.WarcRecords.parseMembers(members).collect().head
    val body = row.getAs[String]("body")
    // same content the byte flavor's 10 bytes decode to: the invalid byte
    // becomes U+FFFD, the cut still lands after 'i' — nothing from JUNK,
    // nothing shaved before it
    assert(body == new String(bodyB, "UTF-8"), body)
    assert(body == "a�bcdefghi", body)
  }

  test("non-ASCII header values decode as UTF-8 (WARC-Target-URI may carry raw UTF-8), on BOTH flavors") {
    // per the WARC spec header values may carry raw UTF-8; a Latin-1
    // header decode would mojibake every multi-byte char into two chars
    val uri = "http://exämple.test/païr/日本"
    val raw = rec(
      s"WARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
        "Content-Length: 5", "hello")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val s = parseRecordString(new String(raw, java.nio.charset.StandardCharsets.UTF_8))
    assert(s._3 == uri, s._3)
    assert(s._7 == "hello")
    val b = WarcRecords.parseRecordBytes(raw)
    assert(b._3 == uri, b._3)
    assert(new String(b._7, java.nio.charset.StandardCharsets.UTF_8) == "hello")
    // the Content-Length cut stays BYTE-exact with a multi-byte header
    // in front of it (header decode never shifts payload offsets)
    val cut = WarcRecords.parseRecordBytes(rec(
      s"WARC-Target-URI: $uri\r\nContent-Length: 5", "helloGARBAGE")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(new String(cut._7, java.nio.charset.StandardCharsets.UTF_8) == "hello")
    // a genuinely invalid byte in a header value cannot throw — it
    // decodes to U+FFFD, fail-soft like every ingest path
    val bad = "WARC/1.0\r\nWARC-Target-URI: http://x/".getBytes("UTF-8") ++
      Array(0xFF.toByte) ++ "\r\nContent-Length: 2\r\n\r\nab".getBytes("UTF-8")
    val soft = WarcRecords.parseRecordBytes(bad)
    assert(soft._1 && soft._3.contains("�"), soft._3)
  }

  test("header keys are case-insensitive, first occurrence wins, unknown keys ignored, bad length fail-soft") {
    val r = parseRecordString(rec(
      "warc-type: first\r\nWARC-TYPE: second\r\nX-Custom: junk\r\n" +
        "content-length: NaN", "b"))
    assert(r._2 == "first" && r._6 == -1L && r._1)
  }

  test("non-WARC members and null content are ok=false rows, never exceptions") {
    assert(parseRecordString("HTTP/1.1 200 OK\r\n\r\nx")._1 == false)
    assert(parseRecordString("")._1 == false)
    assert(parseRecordString(null)._1 == false)
    // headers with no blank-line separator: still a WARC record, empty body
    val noSep = parseRecordString("WARC/1.0\r\nWARC-Type: t")
    assert(noSep._1 && noSep._2 == "t" && noSep._7 == "")
  }

  test("fuzz: random header soup never throws; ok only with a WARC version line") {
    val rnd = new scala.util.Random(7)
    val atoms = Array("WARC/1.0", "WARC/", "\r\n", ":", "Content-Length",
      "WARC-Type", " ", "9", "-1", "x", "\r\n\r\n", "\u0000", "User-Agent",
      "999999999999999999999999")
    (0 until 500).foreach { _ =>
      val soup = (0 until rnd.nextInt(30))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      val r = parseRecordString(soup) // must not throw
      assert(r._1 == soup.split("\r\n", -1).headOption.exists(_.startsWith("WARC/")))
    }
  }

  test("composition: records through buildArchive/explodeArchives parse back exactly; corrupt member flagged") {
    val records = (0 until 5).map { i =>
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: http://x/$i\r\nContent-Length: ${4 + i}\r\n\r\n" +
        "body" + ("!" * i)).getBytes("UTF-8")
    }
    val archive = GzipArchives.buildArchive(records)
    val members = GzipArchives.explodeArchives(Seq((7L, archive)).toDS())
    val rows = WarcRecords.parseMembers(members)
      .orderBy("member_idx").collect()
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Boolean]("ok"))
      assert(r.getAs[String]("target_uri") == s"http://x/$i")
      assert(r.getAs[String]("body") == "body" + ("!" * i))
    }
    // a splitter-flagged corrupt tail parses to an ok=false row
    val corrupt = archive.take(archive.length - 3)
    val flagged = WarcRecords.parseMembers(
        GzipArchives.explodeArchives(Seq((8L, corrupt)).toDS()))
      .where("NOT ok").count()
    assert(flagged == 1)
  }
}
