package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionizer
import graft.streaming.Sessionizer.{SessionEvent, SessionResult}

/** Streaming state machinery: session close on END event, per-key isolation,
  * batch/stream parity (the reference's Heuristics.java:141-158 semantics).
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(app: String, container: String, tpe: String, state: String, ts: Long, m: Double) =
    SessionEvent(app, container, tpe, state, ts, m)

  test("batch flavor: session flushes on END with fold results") {
    val events = Seq(
      ev("app1#1", "c1", "GC_EVENT", "", 1000L, 10.0),
      ev("app1#1", "c2", "GC_EVENT", "", 2000L, 30.0),
      ev("app1#1", "c1", "STATE_EVENT", "END", 3000L, 0.0),
      ev("app2#1", "c9", "GC_EVENT", "", 1000L, 5.0)).toDS()
    val out = Sessionizer.sessionAggregate(events).collect().toSeq
    // app2 never ENDs → no batch output for it (state discarded at end of batch)
    assert(out.map(_.appKey) == Seq("app1#1"))
    val r = out.head
    assert(r.nContainers == 2 && r.count == 3 && r.sum == 40.0 && r.max == 30.0 && r.closedBy == "END")
    assert(r.durationMillis == 2000L)
  }

  test("streaming flavor: state persists across micro-batches until END") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionAggregate(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    try {
      input.addData(ev("appA#1", "c1", "JVMSTATS_EVENT", "", 1000L, 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // open session → no output yet
      input.addData(
        ev("appA#1", "c2", "JVMSTATS_EVENT", "", 2000L, 3.0),
        ev("appA#1", "c1", "STATE_EVENT", "END", 2500L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").as[SessionResult].collect().toSeq
      assert(rows.size == 1)
      val r = rows.head
      assert(r.appKey == "appA#1" && r.count == 3 && r.nContainers == 2 && r.sum == 4.0)
    } finally q.stop()
  }

  test("A11 safety net: event-time timeout closes abandoned sessions deterministically") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // event-time timeout requires a watermark on the stream
    val withWm = input.toDS()
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", "0 seconds")
      .as[SessionEvent]
    val q = Sessionizer.sessionAggregate(withWm, timeoutMillis = Some(5000L))
      .writeStream.format("memory").queryName("sessions_to").outputMode(OutputMode.Append).start()
    try {
      input.addData(ev("stale#1", "c1", "GC_EVENT", "", 1000L, 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions_to").count() == 0) // watermark still at 1000
      // watermark jumps past 1000 + 5000 → stale session must time out
      input.addData(ev("live#1", "c9", "GC_EVENT", "", 100000L, 2.0))
      q.processAllAvailable()
      input.addData(ev("live#1", "c9", "GC_EVENT", "", 101000L, 2.0)) // extra batch evaluates timeouts
      q.processAllAvailable()
      val rows = spark.table("sessions_to").as[SessionResult].collect().toSeq
      assert(rows.map(r => (r.appKey, r.closedBy)) == Seq(("stale#1", "TIMEOUT")))
    } finally q.stop()
  }

  test("batch flavor with a timeout configured: no crash, END still closes, no TIMEOUT rows") {
    // batch planning removes the watermark; the operator must not call
    // getCurrentWatermarkMs (it throws there) and must not register
    // timeouts — only END closes in batch
    val batch = Seq(
      ev("done#1", "c1", "GC_EVENT", "", 1000L, 1.0),
      ev("done#1", "c1", "STATE_EVENT", "END", 2000L, 0.0),
      ev("open#1", "c2", "GC_EVENT", "", 1000L, 2.0)).toDS()
    val out = Sessionizer.sessionAggregate(batch, timeoutMillis = Some(5000L))
      .collect().toSeq
    assert(out.map(r => (r.appKey, r.closedBy)) == Seq(("done#1", "END")))
  }

  test("straggler after END is swallowed by the tombstone (no bogus second session)") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val withWm = input.toDS()
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", "0 seconds")
      .as[SessionEvent]
    val q = Sessionizer.sessionAggregate(withWm, timeoutMillis = Some(5000L))
      .writeStream.format("memory").queryName("sessions_tomb").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev("app#1", "c1", "GC_EVENT", "", 1000L, 1.0),
        ev("app#1", "c1", "STATE_EVENT", "END", 2000L, 0.0))
      q.processAllAvailable()
      // at-least-once replay: a straggler for the ENDed key arrives later
      input.addData(ev("app#1", "c1", "GC_EVENT", "", 2500L, 9.0))
      q.processAllAvailable()
      // advance the watermark far enough to reap the tombstone silently
      input.addData(ev("other#1", "c2", "GC_EVENT", "", 100000L, 1.0))
      q.processAllAvailable()
      input.addData(ev("other#1", "c2", "GC_EVENT", "", 101000L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_tomb").as[SessionResult].collect().toSeq
      // exactly ONE result for app#1 (the END) — no straggler-born TIMEOUT
      assert(rows.filter(_.appKey == "app#1").map(_.closedBy) == Seq("END"))
    } finally q.stop()
  }

  test("independent keys close independently") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionAggregate(input.toDS())
      .writeStream.format("memory").queryName("sessions2").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev("a#1", "c1", "GC_EVENT", "", 1L, 1.0),
        ev("b#1", "c1", "GC_EVENT", "", 1L, 2.0),
        ev("a#1", "c1", "STATE_EVENT", "END", 2L, 0.0))
      q.processAllAvailable()
      val closed = spark.table("sessions2").as[SessionResult].collect().map(_.appKey).toSeq
      assert(closed == Seq("a#1"))
    } finally q.stop()
  }

  test("streamingExactDedup drops same-content re-arrivals across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val stream = input.toDF().toDF("doc_id", "ts_ms", "text")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = graft.operators.Dedup.streamingExactDedup(stream, "ts", "10 seconds")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      input.addData((1L, 1000L, "same text"), (2L, 1500L, "other text"))
      q.processAllAvailable()
      // duplicate content arrives in a LATER micro-batch, inside the watermark
      input.addData((3L, 2000L, "same text"), (4L, 2500L, "fresh text"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id")
        .as[Long].collect().toSeq.sorted
      assert(kept == Seq(1L, 2L, 4L)) // 3 dropped: same content as 1 within watermark
    } finally q.stop()
  }

  test("incremental near-dup dedup E2E: increments stream against a signature table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.streaming.IncrementalDedup
    implicit val sqlCtx = spark.sqlContext

    val work = java.nio.file.Files.createTempDirectory("inc_dedup_").toString
    val sigTable = s"$work/sigs"; val accepted = s"$work/accepted"
    val ckpt = s"$work/ckpt"

    def doc(id: Long, text: String) = (id, text)
    // distinctive 12-token corpus texts (3-shingles well separated)
    val corpusDocs = Seq(
      doc(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      doc(2L, "one two three four five six seven eight nine ten eleven twelve"),
      doc(3L, "red orange yellow green blue indigo violet cyan magenta teal navy plum"))
      .toDF("doc_id", "text")
    // seed: corpus accepted + its signature table (the materialized artifact)
    corpusDocs.write.parquet(accepted)
    Dedup.minHashSignatures(corpusDocs, "doc_id", "text", 3, 126).write.parquet(sigTable)

    val novel1 = "cat dog bird fish horse sheep goat cow duck hen pig llama"
    val novel2 = "sun moon star comet planet nebula quasar pulsar meteor orbit dust ring"
    val novel3 = "oak pine birch maple cedar willow aspen elm spruce fir yew ash"
    val input = MemoryStream[(Long, String)]
    val q = IncrementalDedup.dedupStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", sigTable, accepted)
      .option("checkpointLocation", ckpt)
      .start()
    val novel4 = "iron copper zinc tin lead gold silver nickel cobalt chrome brass steel"
    try {
      // batch 1: one exact dup of corpus doc 1, two novel docs, and TWO
      // copies of a novel doc in the SAME batch (intra-batch dedup: only
      // the min-id copy may survive — without the self-pair stage both
      // would pass the corpus check and be signed permanently)
      input.addData(doc(11L, novel1),
        doc(12L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        doc(13L, novel2), doc(14L, novel4), doc(15L, novel4))
      q.processAllAvailable()
      // batch 2: a dup of a BATCH-1 SURVIVOR (proves survivors were signed
      // into the table — the corpus docs are never re-read) + one novel
      input.addData(doc(21L, novel1), doc(22L, novel3))
      q.processAllAvailable()
    } finally q.stop()

    val keptIds = spark.read.parquet(accepted).select("doc_id")
      .as[Long].collect().toSeq.sorted
    assert(keptIds == Seq(1L, 2L, 3L, 11L, 13L, 14L, 22L),
      s"accepted table wrong: $keptIds")
    val signedIds = spark.read.parquet(sigTable).select("id")
      .as[Long].collect().toSeq.sorted
    assert(signedIds == Seq(1L, 2L, 3L, 11L, 13L, 14L, 22L),
      "every accepted doc (and only those) must be signed")

    // replay idempotence: re-deliver batch 2 AFTER both its writes
    // committed (the at-least-once redelivery case) — its docs are now
    // self-signed, collide with themselves at est 1.0, and are dropped
    IncrementalDedup.processBatch(
      Seq(doc(21L, novel1), doc(22L, novel3)).toDF("doc_id", "text"),
      "doc_id", sigTable, accepted)
    assert(spark.read.parquet(accepted).count() == 7,
      "replayed committed batch must be a no-op")

    // the corpus is never re-shingled/re-read: every file scan in the
    // batch plan reads the SIGNATURE table — the corpus docs parquet
    // path appears nowhere
    val pairs = Dedup.minHashLshPairsAgainst(
      Seq(doc(31L, novel2)).toDF("doc_id", "text"),
      spark.read.parquet(sigTable), "doc_id")
    val scans = graft.sources.BucketedTables.PlanWitness.collectNodes(pairs) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.nonEmpty && scans.forall(_.contains("/sigs")),
      s"batch plan must only scan the signature table, saw: $scans")
  }

  test("incremental dedup via a materialized banded table: same outcome, corpus never re-banded") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.streaming.IncrementalDedup

    val work = java.nio.file.Files.createTempDirectory("inc_banded_").toString
    val sigTable = s"$work/sigs"; val banded = s"$work/bands"
    val accepted = s"$work/accepted"

    val corpusDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val (nBands, rowsPerBand) = Dedup.lshBandingFor(126, 0.5)
    corpusDocs.write.parquet(accepted)
    val sigs = Dedup.minHashSignatures(corpusDocs, "doc_id", "text", 3, 126)
    sigs.write.parquet(sigTable)
    // seed the banded table ONCE, pre-CAPPED (the serving shape) from the
    // signature table
    Dedup.bandedTableCapped(spark.read.parquet(sigTable), nBands, rowsPerBand, 1000)
      .write.parquet(banded)

    // batch: one corpus dup + one novel; processed through the banded path
    val batch = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (12L, "cat dog bird fish horse sheep goat cow duck hen pig llama"))
      .toDF("doc_id", "text")
    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSeq.sorted
      == Seq(1L, 2L, 12L))
    // the banded table stayed in lockstep: a later dup of the survivor
    // collides through it
    IncrementalDedup.processBatch(
      Seq((21L, "cat dog bird fish horse sheep goat cow duck hen pig llama"))
        .toDF("doc_id", "text"),
      "doc_id", sigTable, accepted, bandedTablePath = Some(banded),
      bandedPreCapped = true)
    assert(spark.read.parquet(accepted).count() == 3)
    // a non-banded-layout path fails loudly, not silently-empty
    intercept[IllegalArgumentException] {
      IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
        bandedTablePath = Some(sigTable))
    }

    // plan witness: the banded candidate join bands ONLY the increment —
    // exactly one band-hash Generate; the corpus side is a plain scan of
    // the banded table. The probe MUST collide (a corpus copy): a
    // zero-candidate probe lets AQE collapse the whole plan to
    // EmptyRelation and there is no physical plan left to witness.
    val newSigs = Dedup.minHashSignatures(
      Seq((31L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
        .toDF("doc_id", "text"), "doc_id", "text", 3, 126)
    // same configuration processBatch runs: pre-capped + broadcast increment
    val cand = Dedup.minHashCandidatePairsAgainstBanded(
      newSigs, spark.read.parquet(banded), nBands, rowsPerBand, 1000,
      preCapped = true, broadcastIncrement = true)
    cand.collect()
    val bandGens = graft.sources.BucketedTables.PlanWitness.collectNodes(cand) {
      case g: org.apache.spark.sql.execution.GenerateExec
        if g.boundGenerator.toString.toLowerCase.contains("band") => g
    }
    assert(bandGens.size == 1,
      s"expected ONE band-hash Generate (increment side only), got ${bandGens.size}")
  }
}
