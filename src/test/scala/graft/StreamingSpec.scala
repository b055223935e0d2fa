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

  test("ST11 ingest-lag listener: max event time, watermark lag and closed-through day off the progress bus") {
    import org.apache.spark.sql.functions.{col, window}
    import graft.streaming.IngestLagListener
    implicit val sqlCtx = spark.sqlContext

    val lag = new IngestLagListener()
    spark.streams.addListener(lag)
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("lag_ckpt_").toString
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val q = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "26 hours")
      .groupBy(window(col("ts"), "1 hour")).count()
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("lag_probe")
      .start()
    // a second, watermark-less query: must surface WITHOUT lag numbers
    val input2 = MemoryStream[Long]
    val q2 = input2.toDF().writeStream
      .format("memory").queryName("lag_plain").start()
    try {
      input.addData((ts("2024-03-10T00:00:00Z"), 1L), (ts("2024-03-12T08:30:00Z"), 2L))
      q.processAllAvailable()
      input.addData((ts("2024-03-12T09:00:00Z"), 3L)) // advances past batch-1 watermark
      q.processAllAvailable()
      input2.addData(1L, 2L); q2.processAllAvailable()
      // the listener bus is async — poll briefly for the final batch
      // settled state: watermark = newest max event time − 26 h (the
      // engine folds the last batch's max in via a trailing no-data batch)
      val settledWm = ts("2024-03-12T09:00:00Z").getTime - 26L * 3600 * 1000
      val deadline = System.currentTimeMillis() + 30000
      def entry = lag.snapshot.values.find(_.queryName == "lag_probe")
      while (System.currentTimeMillis() < deadline &&
        !entry.exists(e => e.watermarkMs.contains(settledWm) &&
          e.maxEventTimeMs.contains(ts("2024-03-12T09:00:00Z").getTime))) Thread.sleep(100)
      val e = entry.get
      // footer-latest_timestamp analog: the newest absorbed event time
      assert(e.maxEventTimeMs.contains(ts("2024-03-12T09:00:00Z").getTime))
      assert(e.watermarkMs.contains(settledWm))
      assert(e.eventTimeLagMs.exists(_ > 0) &&
        e.eventTimeLagMs.contains(e.observedAtMs - e.maxEventTimeMs.get))
      assert(e.watermarkLagMs.contains(e.observedAtMs - e.watermarkMs.get))
      // watermark 2024-03-11T06:30 ⇒ day 2024-03-10 is the newest fully
      // closed UTC day (everything before day(watermark) is final)
      assert(e.closedThroughDay.contains(java.time.LocalDate.parse("2024-03-10")))
      assert(lag.maxEventTimeLagMs == e.eventTimeLagMs)
      // the stateless query is visible but reports no invented lag
      def plain = lag.snapshot.values.find(_.queryName == "lag_plain")
      while (System.currentTimeMillis() < deadline && plain.isEmpty) Thread.sleep(100)
      val pl = plain.get
      assert(pl.maxEventTimeMs.isEmpty && pl.eventTimeLagMs.isEmpty &&
        pl.closedThroughDay.isEmpty && pl.numInputRows >= 0)
      // report lines parse as the documented shape
      assert(lag.report.exists(_.contains("\"query\":\"lag_probe\"")))
      assert(lag.report.forall(_.startsWith("{")))
    } finally {
      q.stop(); q2.stop()
      spark.streams.removeListener(lag)
    }
  }

  test("ST11 report: hostile query names emit valid JSON; watermark-lag alert; session-default wiring; timer reporter") {
    import org.apache.spark.sql.functions.{col, window}
    import graft.streaming.IngestLagListener
    implicit val sqlCtx = spark.sqlContext

    // the session-default registry hands back ONE shared listener
    val shared = IngestLagListener.forSession(spark)
    assert(IngestLagListener.forSession(spark) eq shared)

    val lag = new IngestLagListener()
    spark.streams.addListener(lag)
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("lag_esc_ckpt_").toString
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // a query name with quotes, backslash and a tab — must not break the
    // JSON report lines
    val hostile = "lag \"att\\ack\"\tprobe"
    val q = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).count()
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("noop").queryName(hostile)
      .start()
    try {
      input.addData((ts("2024-03-10T00:00:00Z"), 1L), (ts("2024-03-10T05:00:00Z"), 2L))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      def entry = lag.snapshot.values.find(_.queryName == hostile)
      while (System.currentTimeMillis() < deadline &&
        !entry.exists(_.watermarkMs.nonEmpty)) Thread.sleep(100)
      val e = entry.get
      // the watermark-lag alert twin mirrors the per-query number
      assert(lag.maxWatermarkLagMs == e.watermarkLagMs && e.watermarkLagMs.nonEmpty)
      // every report line must PARSE as JSON and round-trip the name
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val parsed = lag.report.map(mapper.readTree)
      assert(parsed.exists(_.get("query").asText() == hostile),
        s"hostile name must survive the JSON round-trip: ${lag.report}")
      assert(parsed.forall(_.get("watermark_lag_ms") != null))
      // the timer reporter emits through the callback and stops on close
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val handle = lag.startReporting(50, seen.add(_))
      val repDeadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < repDeadline && seen.isEmpty) Thread.sleep(20)
      handle.close()
      assert(!seen.isEmpty, "timer reporter emitted nothing in 10 s")
      seen.forEach(l => mapper.readTree(l)) // every emitted line parses
    } finally {
      q.stop()
      spark.streams.removeListener(lag)
    }
  }

  test("hash-partitioned signature table: verify prunes to candidate partitions, outcome identical, drifted P refused") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.streaming.IncrementalDedup

    val work = java.nio.file.Files.createTempDirectory("inc_sigpt_").toString
    val sigTable = s"$work/sigs"; val banded = s"$work/bands"
    val accepted = s"$work/accepted"
    val P = 16

    // 64 pairwise-dissimilar corpus docs so ids spread over the P hash
    // partitions and pruning has something to prune
    def text(i: Int) = (0 until 12).map(t => s"w${i}x$t").mkString(" ")
    val corpusDocs = (0 until 64).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    val (nBands, rowsPerBand) = Dedup.lshBandingFor(126, 0.5)
    corpusDocs.write.parquet(accepted)
    val sigs = Dedup.minHashSignatures(corpusDocs, "doc_id", "text", 3, 126)
    Dedup.writeSignatures(sigs, sigTable, P)
    Dedup.bandedTableCapped(spark.read.parquet(sigTable), nBands, rowsPerBand, 1000)
      .write.parquet(banded)
    // the layout landed partitioned on disk
    val ptDirs = new java.io.File(sigTable).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sig_pt=")).map(_.getName)
    assert(ptDirs.length > 1, s"expected sig_pt partitions, saw ${ptDirs.toList}")

    // batch 1: a corpus dup + a novel — the serving shape (pre-banded,
    // pre-capped, partition-pruned verify)
    val batch = Seq((101L, text(5)), (102L, text(999))).toDF("doc_id", "text")
    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true, sigPartitions = P)
    assert(spark.read.parquet(accepted).count() == 65, "only the novel doc admitted")
    // the survivor was signed into its hash partition: a later dup of it
    // collides through the pruned verify
    IncrementalDedup.processBatch(
      Seq((201L, text(999))).toDF("doc_id", "text"),
      "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true, sigPartitions = P)
    assert(spark.read.parquet(accepted).count() == 65, "dup of a survivor admitted")
    // the survivor's signature lives in the L0 delta tier until a fold
    // (readAll sees it immediately; a plain read of the base does not)
    assert(Dedup.readAllSignatures(spark, sigTable)
      .where(col("id") === 102L).count() == 1)
    assert(spark.read.parquet(sigTable).where(col("id") === 102L).count() == 0)
    // maintenance folds the delta into the partition its hash says
    assert(Dedup.compactSignatures(spark, sigTable))
    val survivorPt = spark.read.parquet(sigTable).where(col("id") === 102L)
      .select("sig_pt").as[Int].head()
    val expectedPt = corpusDocs.sparkSession.range(1)
      .select(Dedup.sigPartition(org.apache.spark.sql.functions.lit(102L), P)).as[Int].head()
    assert(survivorPt == expectedPt)

    // drifted P is a loud layout error, not silent duplicate admission
    val e = intercept[IllegalStateException] {
      IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
        bandedTablePath = Some(banded), bandedPreCapped = true, sigPartitions = 8)
    }
    assert(e.getMessage.contains("layout mismatch"))

    // plan witness: pruning happens at PATH CONSTRUCTION (r15 —
    // metadata-flat reads): the scan's root paths are only the selected
    // sig_pt dirs, so unselected partitions are never even listed
    val candIds = Seq(5L, 17L).toDF("corpus_id")
    val pruned = Dedup.prunedCorpusSigs(spark, sigTable, candIds, P)
    val scans = graft.sources.BucketedTables.PlanWitness.collectNodes(pruned) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.relation.location.rootPaths.forall(
        _.getName.startsWith("sig_pt="))),
      "pruned read must be constructed over selected sig_pt dirs only")
    val selected = scans.map(_.selectedPartitions.partitionCount).sum
    assert(selected <= 2 && selected < ptDirs.length,
      s"pruned scan selected $selected of ${ptDirs.length} partitions")
    // and returns exactly the full-scan rows for those ids
    val fullRows = spark.read.parquet(sigTable)
      .where(col("id").isin(5L, 17L)).select("id").as[Long].collect().toSet
    assert(pruned.where(col("id").isin(5L, 17L))
      .select("id").as[Long].collect().toSet == fullRows && fullRows == Set(5L, 17L))

    // maintenance: replay-duplicate sig rows are erased per partition
    Dedup.writeSignatures(
      Dedup.minHashSignatures(Seq((102L, text(999))).toDF("doc_id", "text"),
        "doc_id", "text", 3, 126),
      sigTable, P, org.apache.spark.sql.SaveMode.Append) // fake a crash-window replay
    assert(spark.read.parquet(sigTable).where(col("id") === 102L).count() == 2)
    assert(Dedup.compactSignatures(spark, sigTable))
    val after = spark.read.parquet(sigTable)
    assert(after.where(col("id") === 102L).count() == 1)
    assert(after.select("id").distinct().count() == after.count())
    assert(after.count() == 65)
    // partitioned layout survived the compaction (sig_pt still prunable)
    assert(Dedup.prunedCorpusSigs(spark, sigTable, Seq(102L).toDF("corpus_id"), P)
      .where(col("id") === 102L).count() == 1)
  }

  test("streaming sig-table self-fold: file count bounded across increments, layout and pruned dedup unaffected") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.streaming.IncrementalDedup

    val work = java.nio.file.Files.createTempDirectory("inc_fold_").toString
    val sigTable = s"$work/sigs"; val accepted = s"$work/accepted"
    val P = 4 // small so every batch's sigs land in ALL partitions —
              // the hot-partition shape where files accumulate per batch
    def text(i: Int) = (0 until 12).map(t => s"f${i}y$t").mkString(" ")
    val corpus = (0 until 16).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    corpus.write.parquet(accepted)
    Dedup.writeSignatures(
      Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 126), sigTable, P)
    def sigFiles: Int = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(sigTable))
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val seeded = sigFiles
    // 6 increments of 4 novel docs each, folding every 2: unfolded the
    // table would gain ~P files per batch (24+); folded it stays within
    // one merged + one fresh file per partition
    for (b <- 0 until 6) {
      IncrementalDedup.processBatch(
        (0 until 4).map(i => (1000L + b * 10 + i, text(100 + b * 10 + i)))
          .toDF("doc_id", "text"),
        "doc_id", sigTable, accepted, sigPartitions = P, foldEvery = 2)
    }
    val after = sigFiles
    assert(after <= seeded + 3 * P,
      s"sig table grew $seeded -> $after files across 6 batches — fold not bounding")
    // the folded table still serves: a dup of an early increment's doc
    // collides through the pruned verify and is refused
    val n = spark.read.parquet(accepted).count()
    IncrementalDedup.processBatch(
      Seq((9999L, text(100))).toDF("doc_id", "text"),
      "doc_id", sigTable, accepted, sigPartitions = P, foldEvery = 2)
    assert(spark.read.parquet(accepted).count() == n, "dup admitted after fold")
    // one signature per accepted doc survived the folds (verbatim rewrite)
    val sigsNow = spark.read.parquet(sigTable)
    assert(sigsNow.select("id").distinct().count() == sigsNow.count())
    // layout intact: partition dirs still match the stamped formula
    assert(sigsNow.where(col(Dedup.SigPartitionCol) =!=
      graft.operators.KeyedHistory.partValue(P, col("id"))).count() == 0)
  }

  test("streaming token budget: whole batches while they fit, the crossing batch cut, later batches empty; restart resumes mid-budget") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingTokenBudget
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stb_").toString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def doc(id: Long, n: Int) = (id, Array.fill(n)("w").mkString(" "))
    val input = MemoryStream[(Long, String)]
    // budget 10: batch0 = 6 tokens (whole), batch1 = 3+3+3 crosses at 10
    val q = StreamingTokenBudget.admitStream(
      input.toDF().toDF("doc_id", "text"), root, budgetTokens = 10L,
      idCol = "doc_id", numBuckets = 8) { admitted =>
      out ++= admitted.select("doc_id")
        .collect().map(r => (r.getLong(0), 0L))
      ()
    }.option("checkpointLocation", s"$root/ckpt").start()
    try {
      input.addData(doc(1L, 4), doc(2L, 2))
      q.processAllAvailable()
      assert(out.map(_._1).toSet == Set(1L, 2L))
      val st1 = StreamingTokenBudget.readState(spark, root).get
      assert(st1.totalAfter == 6L && !StreamingTokenBudget.exhausted(spark, root))
      // the crossing batch: remaining 4, three 3-token docs — the
      // content-keyed prefix keeps the first 4-token mass (crossing doc
      // included), so exactly TWO of the three survive
      input.addData(doc(3L, 3), doc(4L, 3), doc(5L, 3))
      q.processAllAvailable()
      val afterCross = StreamingTokenBudget.readState(spark, root).get
      assert(afterCross.totalAfter == 12L, afterCross.toString)
      assert(out.size == 4, out.toString)
      assert(StreamingTokenBudget.exhausted(spark, root))
      // post-budget batch admits nothing
      input.addData(doc(6L, 2))
      q.processAllAvailable()
      assert(out.size == 4)
    } finally q.stop()
    // a RETRY of the recorded batch re-emits the identical slice and does
    // not advance the state (no double count)
    val st = StreamingTokenBudget.readState(spark, root).get
    val replay = StreamingTokenBudget.admitCommitted(
      Seq(doc(6L, 2)).toDF("doc_id", "text"), st.batchId, root,
      budgetTokens = 10L, idCol = "doc_id", numBuckets = 8)
    assert(replay.count() == 0)
    assert(StreamingTokenBudget.readState(spark, root).get == st)
    // a RESTARTED query (fresh checkpoint feeding later batch ids)
    // resumes against the persisted total — still exhausted
    val more = StreamingTokenBudget.admitCommitted(
      Seq(doc(7L, 5)).toDF("doc_id", "text"), st.batchId + 1, root,
      budgetTokens = 10L, idCol = "doc_id", numBuckets = 8)
    assert(more.count() == 0)
    // config drift and checkpoint mismatch are loud
    intercept[IllegalArgumentException] {
      StreamingTokenBudget.admitCommitted(
        Seq(doc(8L, 1)).toDF("doc_id", "text"), st.batchId + 2, root,
        budgetTokens = 99L, idCol = "doc_id", numBuckets = 8)
    }
    intercept[IllegalStateException] {
      StreamingTokenBudget.admitCommitted(
        Seq(doc(8L, 1)).toDF("doc_id", "text"), 0L, root,
        budgetTokens = 10L, idCol = "doc_id", numBuckets = 8)
    }
  }

  test("streaming mixture budget: strata admit independently, unbudgeted passes whole, replay and config drift handled") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingTokenBudget
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stbm_").toString
    def doc(id: Long, g: String, n: Int) =
      (id, g, Array.fill(n)("w").mkString(" "))
    val budgets = Map("a" -> 5L, "b" -> 9L)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingTokenBudget.admitStreamMix(
      input.toDF().toDF("doc_id", "grp", "text"), root, budgets,
      idCol = "doc_id", strataCol = "grp", numBuckets = 8) { admitted =>
      out ++= admitted.select("doc_id").collect().map(_.getLong(0)); ()
    }.option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 0: a fits whole (3 <= 5), b fits whole (4 <= 9),
      // unbudgeted z always passes
      input.addData(doc(1L, "a", 3), doc(2L, "b", 4), doc(3L, "z", 50))
      q.processAllAvailable()
      assert(out.toSet == Set(1L, 2L, 3L))
      val st1 = StreamingTokenBudget.readMixState(spark, root).get
      assert(st1.after == Map("a" -> 3L, "b" -> 4L))
      // batch 1: a crosses (remaining 2, three 2-token docs -> the
      // id-ordered prefix keeps exactly one); b still fits (4+3 <= 9);
      // z passes
      input.addData(doc(4L, "a", 2), doc(5L, "a", 2), doc(6L, "a", 2),
        doc(7L, "b", 3), doc(8L, "z", 50))
      q.processAllAvailable()
      val st2 = StreamingTokenBudget.readMixState(spark, root).get
      assert(st2.after == Map("a" -> 5L, "b" -> 7L), st2.toString)
      assert(StreamingTokenBudget.exhaustedStrata(spark, root) == Set("a"))
      // batch 2: a admits nothing, b crosses (remaining 2), z passes
      input.addData(doc(9L, "a", 1), doc(10L, "b", 3), doc(11L, "z", 1))
      q.processAllAvailable()
      val st3 = StreamingTokenBudget.readMixState(spark, root).get
      assert(st3.after == Map("a" -> 5L, "b" -> 10L), st3.toString)
      assert(StreamingTokenBudget.exhaustedStrata(spark, root) == Set("a", "b"))
      assert(!out.contains(9L) && out.contains(10L) && out.contains(11L))
    } finally q.stop()
    // replay of the recorded batch: same slice, state untouched
    val st = StreamingTokenBudget.readMixState(spark, root).get
    val replay = StreamingTokenBudget.admitCommittedMix(
      Seq(doc(9L, "a", 1), doc(10L, "b", 3), doc(11L, "z", 1))
        .toDF("doc_id", "grp", "text"),
      st.batchId, root, budgets, "doc_id", "grp", numBuckets = 8)
    assert(replay.select("doc_id").as[Long].collect().toSet == Set(10L, 11L))
    assert(StreamingTokenBudget.readMixState(spark, root).get == st)
    // budget drift and bad stratum names are loud
    intercept[IllegalArgumentException] {
      StreamingTokenBudget.admitCommittedMix(
        Seq(doc(12L, "a", 1)).toDF("doc_id", "grp", "text"),
        st.batchId + 1, root, Map("a" -> 99L), "doc_id", "grp")
    }
    intercept[IllegalArgumentException] {
      StreamingTokenBudget.admitCommittedMix(
        Seq(doc(12L, "a", 1)).toDF("doc_id", "grp", "text"),
        st.batchId + 1, root, Map("a:b" -> 5L), "doc_id", "grp")
    }
  }

  test("streaming token budget: mid-budget crash replay recomputes the identical crossing cut from total_before") {
    import graft.streaming.StreamingTokenBudget
    val root = java.nio.file.Files.createTempDirectory("stb_replay_").toString
    def doc(id: Long, n: Int) = (id, Array.fill(n)("w").mkString(" "))
    val b0 = Seq(doc(1L, 4)).toDF("doc_id", "text")
    val first = StreamingTokenBudget.admitCommitted(b0, 0L, root, 10L,
      "doc_id", numBuckets = 8)
    assert(first.count() == 1)
    // crossing batch commits...
    val b1 = Seq(doc(2L, 3), doc(3L, 3), doc(4L, 3)).toDF("doc_id", "text")
    val cut = StreamingTokenBudget.admitCommitted(b1, 1L, root, 10L,
      "doc_id", numBuckets = 8)
    val cutIds = cut.select("doc_id").as[Long].collect().sorted
    assert(cutIds.length == 2, cutIds.toString) // remaining 6 over 3-token docs
    // ...then the sink crashes and foreachBatch replays batch 1: the cut
    // must be recomputed bit-identically from the recorded total_before
    val replay = StreamingTokenBudget.admitCommitted(b1, 1L, root, 10L,
      "doc_id", numBuckets = 8)
    assert(replay.select("doc_id").as[Long].collect().sorted.sameElements(cutIds))
    assert(StreamingTokenBudget.readState(spark, root).get.totalAfter == 10L)
  }
}
