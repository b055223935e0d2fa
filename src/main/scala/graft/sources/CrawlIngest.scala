package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Boilerplate

/** The crawl front-end as ONE call — `.gz` directory in, clean document
  * text out: concatenated-gzip member split (CRC-verified) → binary WARC
  * record parse → HTTP response parse + charset decode → boilerplate
  * removal. Every stage is the already-gated operator; this is the
  * composition a user actually runs, batch ([[readCleanDocs]]) and
  * streaming ([[streamCleanDocs]] — archives land continuously, the
  * file stream discovers each exactly once).
  *
  * Policy: a document survives iff every layer parsed (`ok`), the HTTP
  * status is 2xx, and boilerplate removal left non-empty content.
  * Everything else is visible via [[parsedDocs]]' `ok`/`status` columns
  * when a run wants the drop accounting instead of the survivors.
  *
  * Scale shape: flatMap + map-only end to end — one task per archive
  * (gzip is not seekable), per-task memory bounded by one member, no
  * shuffle anywhere. At 100 TB this is the measured archive path
  * (SCALE.md: 3.2 GB/s e2e/16c) plus constant per-record HTTP/clean
  * cost (553 MB/s boilerplate walker).
  */
object CrawlIngest {

  final case class ParsedDoc(
      archive: String,
      member_idx: Int,
      ok: Boolean,
      url: String,
      warc_date: String,
      status: Int,
      charset: String,
      text: String)

  /** Members → parsed, charset-decoded documents (no filtering — every
    * member yields a row; failures carry `ok = false`/status −1).
    */
  def parsedDocs(members: Dataset[GzipArchives.FileMemberRow]): DataFrame = {
    import members.sparkSession.implicits._
    members.mapPartitions(_.map { m =>
      val bad = ParsedDoc(m.path, m.member_idx, ok = false, null, null, -1, null, null)
      if (!m.ok || m.content == null) bad
      else {
        val (ok, _, uri, date, _, _, payload) = WarcRecords.parseRecordBytes(m.content)
        if (!ok) bad
        else {
          val h = HttpPayload.parseHttpBytes(payload)
          if (!h.ok) bad.copy(url = uri, warc_date = date)
          else ParsedDoc(m.path, m.member_idx, ok = true, uri, date, h.status,
            h.charset, HttpPayload.decodeBody(h.body, h.charset))
        }
      }
    }).toDF()
  }

  /** The survivor filter + boilerplate clean over [[parsedDocs]] output. */
  def cleanDocs(parsed: DataFrame,
                minWords: Int = Boilerplate.MinWords,
                ldNum: Int = Boilerplate.LinkNum, ldDen: Int = Boilerplate.LinkDen,
                swNum: Int = Boilerplate.StopNum, swDen: Int = Boilerplate.StopDen): DataFrame =
    Boilerplate.clean(
      parsed.where(col("ok") && col("status") >= 200 && col("status") <= 299),
      "text", "text", minWords, ldNum, ldDen, swNum, swDen)
      .where(length(col("text")) > 0)
      .select("archive", "member_idx", "url", "warc_date", "charset", "text")

  /** Batch: the whole chain over a directory of archives. */
  def readCleanDocs(spark: SparkSession, dir: String,
                    glob: String = "*.gz"): DataFrame =
    cleanDocs(parsedDocs(GzipArchives.readArchiveDir(spark, dir, glob)))

  /** Streaming: the same chain per micro-batch; `route` receives each
    * batch's clean documents (write them idempotently — file-stream
    * replays re-deliver a batch after a crash). Caller starts the
    * returned writer with its checkpoint location.
    */
  def streamCleanDocs(spark: SparkSession, dir: String,
                      glob: String = "*.gz", maxFilesPerTrigger: Int = 64)
                     (route: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    GzipArchives.streamArchiveDir(spark, dir, glob, maxFilesPerTrigger)
      .toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        route(cleanDocs(parsedDocs(batch.as[GzipArchives.FileMemberRow])))
      }

  /** The COMPOSED streaming ingest — the full "streaming ingest story"
    * in one call: archives → parse → boilerplate clean → Gopher quality
    * gate → token-budget valve → Bloom seen-store admission, per
    * micro-batch, every stateful stage keyed so a crash at any point
    * replays into the identical routed slice. `route` receives each
    * admitted batch MARKED (`maybe_seen` — send the false rows to the
    * accepted sink, the true rows to the exact-confirm path); stop the
    * query once [[graft.streaming.StreamingTokenBudget.exhausted]] turns
    * true. The seen store under `seenRoot` must be initialized
    * ([[graft.operators.SeenFilterStore.init]]).
    *
    * Stage ORDER is crash-safety, not taste: the budget valve must see a
    * batch that is a DETERMINISTIC function of the batch alone, so it
    * sits before the history-dependent seen-store stage — a replayed
    * batch then recomputes the identical cut from the valve's recorded
    * `total_before`, and the store's OR-algebra absorbs the re-append.
    * (Marking first would feed the valve `maybe_seen` flags that DIFFER
    * on replay — the retry would see its own earlier bits.) The cost:
    * the budget counts tokens admitted TO the store, duplicates
    * included; exact novel-only accounting would need a
    * replay-deterministic dedup verdict, which Bloom marking across
    * generations is not.
    */
  def streamIngestGated(spark: SparkSession, dir: String,
                        budgetRoot: String, seenRoot: String,
                        budgetTokens: Long, glob: String = "*.gz",
                        maxFilesPerTrigger: Int = 64,
                        gopherMinWords: Long = 5L,
                        gopherMaxWords: Long = 100000L)
                       (route: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    GzipArchives.streamArchiveDir(spark, dir, glob, maxFilesPerTrigger)
      .toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val clean = cleanDocs(parsedDocs(batch.as[GzipArchives.FileMemberRow]))
        val keep = clean.columns
        // materialized ONCE: four consumers follow (the valve's token
        // sum, the empty probe, the store's marking and its filter
        // build) and each would otherwise replay the WARC parse +
        // boilerplate + gopher walk — the dominant per-batch cost
        val gated = graft.operators.TextAnalysis
          .gopherFilter(clean, "text", gopherMinWords, gopherMaxWords)
          .where(col("gopher_keep"))
          .select(keep.head, keep.tail: _*)
          // the valve's deterministic tiebreak key: (archive, member)
          // identifies a record uniquely within any batch
          .withColumn("doc_key",
            concat_ws("#", col("archive"), col("member_idx")))
          .localCheckpoint(true)
        val admitted = graft.streaming.StreamingTokenBudget.admitCommitted(
          gated, batchId, budgetRoot, budgetTokens, idCol = "doc_key")
        // post-budget (empty) batches skip the store append — appending
        // nothing would still flip a fresh generation per trigger,
        // piling up orphan dirs for recover() with zero information
        val marked =
          if (admitted.isEmpty)
            admitted.withColumn("maybe_seen", lit(false))
          else graft.operators.SeenFilterStore.appendBatch(
            batch.sparkSession, seenRoot, admitted,
            writerToken = Some(s"batch-$batchId"))
        route(marked.drop("doc_key"))
      }
}
