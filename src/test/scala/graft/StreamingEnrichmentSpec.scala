package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingEnrichment
import graft.streaming.StreamingEnrichment.{AppAttrs, EnrichInput, EnrichedEvent}

/** J1 streaming enrichment: first-wins attrs, cache-miss passthrough,
  * component resolution (reference ElasticSearchCacheManager semantics).
  */
class StreamingEnrichmentSpec extends SparkSpecBase {
  import spark.implicits._

  private val attrsA = AppAttrs("appName", "SPARK", "alice", "c-am", Seq("t1"))
  private val attrsB = AppAttrs("otherName", "MAPREDUCE", "bob", "c-am", Seq())

  private def appEv(app: String, a: AppAttrs, ts: Long) =
    EnrichInput(app, isAppEvent = true, Some(a), "APPLICATION_EVENT", "", "", ts)
  private def ev(app: String, tpe: String, container: String, comp: String, ts: Long) =
    EnrichInput(app, isAppEvent = false, None, tpe, container, comp, ts)

  test("batch: events are enriched with first-wins attrs; misses pass through") {
    val in = Seq(
      appEv("app1", attrsA, 100L),
      appEv("app1", attrsB, 200L),               // later attrs must NOT win
      ev("app1", "GC_EVENT", "c-am", "UNKNOWN", 300L),
      ev("app1", "FS_EVENT", "c-2", "UNKNOWN", 400L),
      ev("app2", "GC_EVENT", "c-9", "EXECUTOR", 100L)) // no app event → miss
      .toDS()
    val out = StreamingEnrichment.enrich(in).collect().sortBy(_.tsMillis)
    val gc1 = out.find(e => e.applicationId == "app1" && e.eventType == "GC_EVENT").get
    assert(gc1.enriched && gc1.username.contains("alice") && gc1.component == "APP_MASTER")
    val fs = out.find(_.eventType == "FS_EVENT").get
    assert(fs.component == "APP_SLAVE" && fs.framework.contains("SPARK"))
    val miss = out.find(_.applicationId == "app2").get
    assert(!miss.enriched && miss.component == "EXECUTOR" && miss.username.isEmpty)
  }

  test("streaming: attrs persist across micro-batches; first-wins holds") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EnrichInput]
    val q = StreamingEnrichment.enrich(input.toDS())
      .writeStream.format("memory").queryName("enriched").outputMode(OutputMode.Append).start()
    try {
      input.addData(appEv("appX", attrsA, 1L))
      q.processAllAvailable()
      input.addData(appEv("appX", attrsB, 2L), ev("appX", "GC_EVENT", "c-1", "UNKNOWN", 3L))
      q.processAllAvailable()
      val rows = spark.table("enriched").as[EnrichedEvent].collect()
      assert(rows.length == 1)
      assert(rows.head.username.contains("alice")) // batch-1 attrs won
      assert(rows.head.component == "APP_SLAVE")
    } finally q.stop()
  }

  test("J2: component learned from headers overrides later UNKNOWN (registry first-wins)") {
    val in = Seq(
      appEv("app1", attrsA, 10L),
      ev("app1", "GC_EVENT", "c-7", "EXECUTOR", 100L),  // header teaches c-7 → EXECUTOR
      ev("app1", "FS_EVENT", "c-7", "UNKNOWN", 200L),   // registry hit → EXECUTOR, not APP_SLAVE
      ev("app1", "FS_EVENT", "c-7", "MAP", 300L))       // registry STILL wins (first-wins)
      .toDS()
    val out = StreamingEnrichment.enrich(in).collect().sortBy(_.tsMillis)
    assert(out.map(_.component).toSeq == Seq("EXECUTOR", "EXECUTOR", "EXECUTOR"))
  }

  test("J2: AM resolution is learned into the registry and persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EnrichInput]
    val q = StreamingEnrichment.enrich(input.toDS())
      .writeStream.format("memory").queryName("enriched_j2").outputMode(OutputMode.Append).start()
    try {
      input.addData(appEv("appZ", attrsA, 1L), ev("appZ", "GC_EVENT", "c-am", "UNKNOWN", 2L))
      q.processAllAvailable()
      // next batch: same container, still UNKNOWN → resolved from the
      // learned registry entry (APP_MASTER), exercising cross-batch state
      input.addData(ev("appZ", "FS_EVENT", "c-am", "UNKNOWN", 3L))
      q.processAllAvailable()
      val rows = spark.table("enriched_j2").as[EnrichedEvent].collect().sortBy(_.tsMillis)
      assert(rows.map(_.component).toSeq == Seq("APP_MASTER", "APP_MASTER"))
    } finally q.stop()
  }

  test("J2: UNKNOWN is never learned — registry stays empty on cache miss") {
    // no app event: enrichment (incl. registry) never runs, UNKNOWN passes
    // through and must not poison the registry for later batches
    val in = Seq(
      ev("app3", "GC_EVENT", "c-5", "UNKNOWN", 100L),
      appEv("app3", attrsA, 150L),
      ev("app3", "FS_EVENT", "c-5", "UNKNOWN", 200L)).toDS()
    val out = StreamingEnrichment.enrich(in).collect().sortBy(_.tsMillis)
    assert(out.map(_.component).toSeq == Seq("UNKNOWN", "APP_SLAVE"))
  }

  test("in-batch ordering is by event time, not arrival order") {
    // app event at ts=50 arrives "after" the fact event in the input Seq,
    // but the fold sorts by event time → the event at ts=100 IS enriched.
    val in = Seq(
      ev("appY", "GC_EVENT", "c-1", "EXECUTOR", 100L),
      appEv("appY", attrsA, 50L)).toDS()
    val out = StreamingEnrichment.enrich(in).collect()
    assert(out.length == 1 && out.head.enriched)
  }
}
