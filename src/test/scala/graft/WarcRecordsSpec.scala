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
    val short = parseRecordString(rec("Content-Length: 99", "tiny"))
    assert(short._7 == "tiny" && short._6 == 99L)
    val none = parseRecordString(rec("WARC-Type: t", "free body"))
    assert(none._7 == "free body" && none._6 == -1L)
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
