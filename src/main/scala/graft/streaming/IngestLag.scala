package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener

/** ST11 — ingest-lag observability for the streaming sinks.
  *
  * The reference pipeline stamps `latest_timestamp` into every parquet
  * footer so operators can monitor how far the HDFS tables trail the live
  * stream (reference: readers/hdfs/.../ProtoParquetWriterWithOffset.java:33,116-122
  * and ExtraMetadataWriteSupport.java:23-41 — the footer metadata is read
  * back by the lag dashboards). The Spark-native seat of that information
  * is the StreamingQueryListener bus: every micro-batch's
  * [[org.apache.spark.sql.streaming.StreamingQueryProgress]] already
  * carries the batch's max event time and the current watermark — no
  * bespoke footer protocol, no extra read of the sink — so the engine's
  * analog is a listener, not a footer stamp.
  *
  * Per query this tracks, updated on every progress event:
  *  - `maxEventTimeMs` — the newest event time the sink has absorbed: the
  *    exact meaning of the reference's footer `latest_timestamp`;
  *  - `eventTimeLagMs` — now − maxEventTime: how far the table trails the
  *    world (the number the reference dashboards alert on);
  *  - `watermarkLagMs` — now − watermark: the delay bound on day-close
  *    markers ([[EventSink.writeDayCloseMarkers]] closes a day once the
  *    watermark leaves it, so day-close lag ≤ watermarkLag + the grace);
  *  - `closedThroughDay` — the newest UTC day the current watermark has
  *    fully closed ([[EventSink.closedDayFromWatermark]] − 1).
  *
  * Wire it once per session:
  * {{{
  *   val lag = new IngestLagListener()
  *   spark.streams.addListener(lag)
  *   // ... queries run; poll lag.snapshot / lag.maxEventTimeLagMs ...
  * }}}
  * Stateless queries (no watermark/event-time column) still get a row with
  * batch progress but no lag numbers — visible, not invented.
  */
class IngestLagListener(clock: () => Long = () => System.currentTimeMillis())
  extends StreamingQueryListener {

  import IngestLagListener.SinkLag

  private val byQuery = new ConcurrentHashMap[java.util.UUID, SinkLag]()

  private def parseIso(s: String): Option[Long] =
    try Some(java.time.Instant.parse(s).toEpochMilli) catch { case _: Exception => None }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val now = clock()
    val et = p.eventTime.asScala
    // RUNNING max over batches: a batch's reported "max" is that batch's
    // own newest event time, and later batches can carry older data — the
    // "newest absorbed" position (the footer-latest_timestamp semantic)
    // must never regress, including on empty triggers where "max" is
    // absent entirely
    val prev = Option(byQuery.get(p.id))
    val maxEt = (et.get("max").flatMap(parseIso).toSeq ++
      prev.flatMap(_.maxEventTimeMs).toSeq).maxOption
    // the engine's watermark is monotone per query; max is a cheap belt
    // against progress events delivered after a restart reset
    val wm = (et.get("watermark").flatMap(parseIso).filter(_ > 0).toSeq ++
      prev.flatMap(_.watermarkMs).toSeq).maxOption
    byQuery.put(p.id, SinkLag(
      queryId = p.id,
      queryName = Option(p.name).getOrElse(""),
      sink = p.sink.description,
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      maxEventTimeMs = maxEt,
      watermarkMs = wm,
      eventTimeLagMs = maxEt.map(now - _),
      watermarkLagMs = wm.map(now - _),
      closedThroughDay = wm.map(m =>
        EventSink.closedDayFromWatermark(m).minusDays(1L)),
      observedAtMs = now))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Latest position per live-or-finished query. */
  def snapshot: Map[java.util.UUID, SinkLag] = byQuery.asScala.toMap

  /** The worst event-time lag across all tracked sinks — the single
    * number an alert hangs off (None until any query reports event time).
    */
  def maxEventTimeLagMs: Option[Long] = {
    val lags = byQuery.values.asScala.flatMap(_.eventTimeLagMs)
    if (lags.isEmpty) None else Some(lags.max)
  }

  /** The worst WATERMARK lag across all tracked sinks — the alert twin of
    * [[maxEventTimeLagMs]] for the day-close path: day markers trail the
    * watermark, so this bounds how stale the `_DONE` stamps can be.
    */
  def maxWatermarkLagMs: Option[Long] = {
    val lags = byQuery.values.asScala.flatMap(_.watermarkLagMs)
    if (lags.isEmpty) None else Some(lags.max)
  }

  // full JSON string escape — query names and sink descriptions are
  // caller-authored free text; a quote, backslash or control char in
  // either must not produce a broken log line
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One log-friendly JSON line per tracked query (stable field order). */
  def report: Seq[String] =
    byQuery.values.asScala.toSeq.sortBy(_.queryId.toString).map { l =>
      s"""{"query":${jstr(l.queryName)},"sink":${jstr(l.sink)}""" +
        s""","batch":${l.batchId},"max_event_time_ms":${l.maxEventTimeMs.getOrElse(-1L)}""" +
        s""","event_time_lag_ms":${l.eventTimeLagMs.getOrElse(-1L)}""" +
        s""","watermark_lag_ms":${l.watermarkLagMs.getOrElse(-1L)}""" +
        s""","closed_through_day":"${l.closedThroughDay.map(_.toString).getOrElse("")}"}"""
    }

  /** Emit [[report]] lines through `out` every `intervalMs` on a daemon
    * timer — the "expose lag on a timer" operational loop. Returns a
    * handle; `close()` stops the timer (idempotent).
    */
  def startReporting(intervalMs: Long,
                     out: String => Unit = line =>
                       org.slf4j.LoggerFactory.getLogger(classOf[IngestLagListener])
                         .info(line)): AutoCloseable = {
    require(intervalMs > 0, s"report interval must be positive (got $intervalMs)")
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "ingest-lag-report"); t.setDaemon(true); t
    })
    exec.scheduleAtFixedRate(
      () => try report.foreach(out) catch { case _: Exception => () },
      intervalMs, intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    () => exec.shutdownNow()
  }
}

/** Session-default listener wiring: the production entry points
  * ([[EventRouter.routeTyped]], [[EventSink.partitionedStreamWriter]])
  * register ONE shared listener per SparkSession by default, so ST11 lag
  * numbers exist without any caller opt-in — the reference's footer stamps
  * are likewise always-on, not a debug flag.
  */
object IngestLagListener {

  /** One query's latest observed ingest position. `None` lag fields mean
    * the query reports no event-time metrics (no watermark in the plan).
    */
  final case class SinkLag(
      queryId: java.util.UUID,
      queryName: String,
      sink: String,
      batchId: Long,
      numInputRows: Long,
      maxEventTimeMs: Option[Long],
      watermarkMs: Option[Long],
      eventTimeLagMs: Option[Long],
      watermarkLagMs: Option[Long],
      closedThroughDay: Option[java.time.LocalDate],
      observedAtMs: Long)

  // WEAK keys: a default-on registry must not pin sessions — a multi-tenant
  // driver creating one session per job (the Thrift-server pattern) would
  // otherwise accumulate every dead session's state forever. The listener
  // holds no reference back to its session, so an unreachable session (and
  // with it its query manager and this listener) stays collectable.
  // Explicit synchronization: WeakHashMap is not thread-safe, and a racy
  // get/put would double-register listeners on the same bus.
  private val bySession =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, IngestLagListener]()

  /** The session's shared listener, registered on first use (thread-safe,
    * once per session).
    */
  def forSession(spark: org.apache.spark.sql.SparkSession): IngestLagListener =
    bySession.synchronized {
      val existing = bySession.get(spark)
      if (existing != null) existing
      else {
        val l = new IngestLagListener()
        spark.streams.addListener(l)
        bySession.put(spark, l)
        l
      }
    }
}
