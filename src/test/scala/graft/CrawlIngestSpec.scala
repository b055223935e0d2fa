package graft

import java.nio.charset.{Charset, StandardCharsets}

import graft.sources.{CrawlIngest, GzipArchives}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-call crawl front-end: gzip split → WARC bytes → HTTP →
  * charset decode → boilerplate clean, batch and streaming.
  */
class CrawlIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def page(body: String): String =
    "<div><a href='/nav'>menu home login and more stuff</a></div>" +
      s"<p>$body</p>"

  private def record(id: Int, status: Int, charsetLabel: String,
                     body: String): Array[Byte] = {
    val cs = Charset.forName(charsetLabel)
    val bodyBytes = page(body).getBytes(cs)
    val http = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: text/html; charset=$charsetLabel\r\n" +
      s"Content-Length: ${bodyBytes.length}\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ bodyBytes
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://ex.com/$id\r\n" +
      s"WARC-Date: 2026-02-0${id % 9 + 1}T00:00:00Z\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ http
  }

  private val goodBody = "it is the story of the day for all of us"

  test("batch: survivors are 2xx, parsed, charset-decoded and boilerplate-stripped") {
    val dir = graft.sources.BucketedTables.scratchDir("graft_ci_")
    java.nio.file.Files.write(dir.resolve("a.gz"), GzipArchives.buildArchive(Seq(
      record(1, 200, "windows-1252", goodBody + " price €9"), // € = 0x80 on the wire
      record(2, 404, "utf-8", goodBody), // dropped: status
      record(3, 200, "utf-8", "tiny"), // dropped: boilerplate leaves nothing
      "not a warc record at all".getBytes(StandardCharsets.ISO_8859_1), // dropped: ok=false
      record(5, 200, "iso-8859-1", goodBody + " café"))))
    val out = CrawlIngest.readCleanDocs(spark, dir.toString)
      .orderBy("member_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("url") == "http://ex.com/1" &&
      out(0).getAs[String]("text") == goodBody + " price €9" &&
      out(0).getAs[String]("charset") == "windows-1252")
    assert(out(1).getAs[String]("url") == "http://ex.com/5" &&
      out(1).getAs[String]("text") == goodBody + " café")
    // the accounting flavor still shows every member with its verdict
    val parsed = CrawlIngest.parsedDocs(
      GzipArchives.readArchiveDir(spark, dir.toString))
    assert(parsed.count() == 5)
    assert(parsed.where(!col("ok")).count() == 1)
    assert(parsed.where(col("status") === 404).count() == 1)
  }

  test("streaming: the same chain per micro-batch, exactly-once across a restart") {
    val dir = graft.sources.BucketedTables.scratchDir("graft_cis_")
    val ckpt = graft.sources.BucketedTables.scratchDir("graft_cick_")
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def start() = CrawlIngest.streamCleanDocs(spark, dir.toString) { batch: DataFrame =>
      got.synchronized {
        got ++= batch.select("url", "text").collect()
          .map(r => (r.getString(0), r.getString(1)))
      }
    }.option("checkpointLocation", ckpt.toString).start()
    java.nio.file.Files.write(dir.resolve("a.gz"),
      GzipArchives.buildArchive(Seq(record(1, 200, "utf-8", goodBody))))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(got.toSeq == Seq(("http://ex.com/1", goodBody)))
    java.nio.file.Files.write(dir.resolve("b.gz"),
      GzipArchives.buildArchive(Seq(record(2, 200, "utf-8", goodBody + " two"))))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(got.map(_._1).sorted.toSeq ==
      Seq("http://ex.com/1", "http://ex.com/2"),
      s"restart must pick up only the new archive: $got")
  }

  test("streamIngestGated: clean -> gopher -> budget valve -> seen store, composed per micro-batch") {
    import graft.operators.{SeenFilter, SeenFilterStore}
    import graft.streaming.StreamingTokenBudget
    val dir = graft.sources.BucketedTables.scratchDir("graft_cig_")
    val work = graft.sources.BucketedTables.scratchDir("graft_cigw_")
    val (budgetRoot, seenRoot, ckpt) =
      (s"$work/budget", s"$work/seen", s"$work/ckpt")
    // 13-token bodies that pass every Gopher rule (mean word length >= 3,
    // two stopword hits via 'the'/'and')
    val base =
      "the quiet mountain village rests beside the deep and green river tonight"
    def body(s: String) = s"$base $s"
    // history: doc3's exact content is already seen
    SeenFilterStore.init(spark, seenRoot, SeenFilter.buildFilter(
      Seq(body("hist")).toDF("text"), seed = 3L, kHashes = 5,
      mBits = 1 << 14, numShards = 4))
    val routed = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    def start() = CrawlIngest.streamIngestGated(spark, dir.toString,
      budgetRoot, seenRoot, budgetTokens = 30L) { marked =>
      routed.synchronized {
        routed ++= marked.select("url", "maybe_seen").collect()
          .map(r => (r.getString(0), r.getBoolean(1)))
      }
      ()
    }.option("checkpointLocation", ckpt).start()
    // batch 0: one 13-token doc + one that dies at the quality gate —
    // fits the 30-token budget whole
    java.nio.file.Files.write(dir.resolve("a.gz"), GzipArchives.buildArchive(Seq(
      record(1, 200, "utf-8", body("one")),
      record(2, 200, "utf-8", "tiny"))))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(routed.toSeq == Seq(("http://ex.com/1", false)), routed.toString)
    assert(StreamingTokenBudget.readState(spark, seenRoot) == None)
    assert(StreamingTokenBudget.readState(spark, budgetRoot).get.totalAfter == 13L)
    // batch 1: the seen doc + a new one; remaining 17 admits the first
    // and the crossing second -> budget exhausts; the history doc is
    // flagged maybe_seen
    java.nio.file.Files.write(dir.resolve("b.gz"), GzipArchives.buildArchive(Seq(
      record(3, 200, "utf-8", body("hist")),
      record(4, 200, "utf-8", body("four")))))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(routed.size == 3, routed.toString)
    assert(routed.toMap.get("http://ex.com/3") == Some(true),
      "the history doc must be flagged maybe_seen")
    assert(routed.toMap.get("http://ex.com/4") == Some(false))
    assert(StreamingTokenBudget.exhausted(spark, budgetRoot))
    // batch 2: post-budget — nothing routed, no new store generation
    val genBefore = SeenFilterStore.currentGen(spark, seenRoot)
    java.nio.file.Files.write(dir.resolve("c.gz"), GzipArchives.buildArchive(Seq(
      record(5, 200, "utf-8", body("five")))))
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(routed.size == 3, routed.toString)
    assert(SeenFilterStore.currentGen(spark, seenRoot) == genBefore,
      "an empty admitted batch must not flip a store generation")
    // the admitted batches' bits are served: batch 0's content now marks
    // as seen against the current filter
    val probe = SeenFilter.markSeen(Seq(body("one")).toDF("text"),
      SeenFilterStore.currentFilter(spark, seenRoot))
    assert(probe.select("maybe_seen").head.getBoolean(0))
  }
}
