package graft.heuristics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A1-A9: the heuristics reader's per-(app,attempt,container) aggregations
  * as declarative DataFrame recipes, with severity applied as a CASE
  * projection over the aggregated counters (the pure rules live in
  * [[Severity]]; these are their distributed folds).
  *
  * The reference folds these in mutable per-key maps on one consumer
  * thread (reference: readers/heuristics/src/main/java/.../Heuristics.java:129-158);
  * here each is a groupBy over (application_id, attempt_id, container_id) —
  * partial aggregation map-side, one shuffle on the app key, linear scale-out.
  * The streaming flavor reuses the same folds via [[graft.streaming.Sessionizer]].
  */
object HeuristicAggs {

  private val appKey: Seq[Column] =
    Seq(col("application_id"), col("attempt_id"), col("container_id"))

  /** A1 GCCause: count of GC events whose cause is in the flagged set
    * (reference: GCCause.java:22-29 — "Metadata GC Threshold", "Ergonomics").
    */
  def gcCause(gcEvents: DataFrame): DataFrame =
    gcEvents.groupBy(appKey: _*)
      .agg(count(when(col("cause").isin("Metadata GC Threshold", "Ergonomics"), 1)).as("flagged_gc"))
      .withColumn("severity",
        when(col("flagged_gc") > 0, Severity.Moderate).otherwise(Severity.None))

  /** GC generation classification (reference: GCHelper.java:22-48). */
  val gcGenKind: Column = when(col("collector_name").isin(
      "PS MarkSweep", "MarkSweepCompact", "ConcurrentMarkSweep", "G1 Old Generation"), "MAJOR")
    .when(col("collector_name").isin(
      "Copy", "PS Scavenge", "ParNew", "G1 Young Generation"), "MINOR")
    .otherwise("UNKNOWN")

  /** A2 G1GC: count + cumulative pause of MAJOR G1 collections
    * (reference: G1GC.java:18-46).
    */
  def g1FullGc(gcEvents: DataFrame): DataFrame =
    gcEvents
      .where(col("collector_name") === "G1 Old Generation")
      .groupBy(appKey: _*)
      .agg(count(lit(1)).as("major_gc"), sum(col("pause_time")).as("major_pause_ms"))
      .withColumn("severity",
        when(col("major_gc") > 0, Severity.Severe).otherwise(Severity.None))

  /** A3 HeapUsage: max(used) vs max heap; discarded when a major GC ran
    * (reference: HeapUsage.java:72-89). Input: heap-projected JVMSTATS
    * (see [[graft.operators.JvmStats.heapProjection]]) unioned with GC events.
    */
  def heapUsage(heapStats: DataFrame, gcEvents: DataFrame): DataFrame = {
    val heap = heapStats.groupBy(appKey: _*)
      .agg(max(col("heap_used")).as("peak"), max(col("heap_max")).as("max"))
    val majors = gcEvents.where(gcGenKind === "MAJOR")
      .groupBy(appKey: _*).agg(count(lit(1)).as("major_gc"))
    val joined = heap.join(majors, Seq("application_id", "attempt_id", "container_id"), "left")
      .na.fill(0L, Seq("major_gc"))
      // Integer division on purpose (reference HeapUsage.java:83 uses Java
      // long division): ratio truncates, so e.g. max=1000, peak=700 gives
      // exactly 30 → LOW is NOT triggered, matching the reference boundary.
      .withColumn("ratio",
        when(col("max") > col("peak"), expr("(max - peak) * 100 div max")))
    joined.withColumn("severity",
      when(col("major_gc") > 0 || col("max") <= col("peak"), Severity.None)
        .when(col("ratio") > 70, Severity.Severe)
        .when(col("ratio") > 50, Severity.Moderate)
        .when(col("ratio") > 30, Severity.Low)
        .otherwise(Severity.None))
  }

  /** A4 Threads: max(live count) vs last(total created)
    * (reference: Threads.java:16-57).
    */
  def threads(threadStats: DataFrame, tsCol: String = "timestamp"): DataFrame =
    threadStats.groupBy(appKey: _*)
      .agg(
        max(col("thread_count")).as("max_count"),
        max_by(col("thread_total"), col(tsCol)).as("last_total"))
      // Integer division (reference Threads.java:44): max_count=9 over
      // total=1000 is ratio 0 → MODERATE, not 0.9 → LOW.
      .withColumn("ratio",
        when(col("last_total") > 0, expr("max_count * 100 div last_total")))
      .withColumn("severity",
        when(col("last_total") === 0 || col("ratio") > 10, Severity.None)
          .when(col("ratio") <= 0, Severity.Moderate)
          .otherwise(Severity.Low))

  /** A5 CodeCacheUsage: peak(used) vs cache capacity; MODERATE iff the peak
    * came within 5 % of max — integer division, same boundary semantics as
    * the reference (CodeCacheUsage.java:28-47). Input columns: appKey +
    * (cc_used, cc_max, tsCol).
    *
    * Last-value fidelity: the reference keeps the LAST-seen `max` property
    * (plain assignment per event) — `max_by(cc_max, ts)`, like
    * [[threads]]'s `last_total` — not max-over-time (cc_max is normally
    * constant, but a mid-run -XX:ReservedCodeCacheSize restart would
    * diverge). Degenerate cache_max = 0 yields MODERATE exactly like the
    * reference (`max > peak` is false there): deliberately no `> 0` guard.
    */
  def codeCacheUsage(codeCacheStats: DataFrame, tsCol: String = "timestamp"): DataFrame =
    codeCacheStats.groupBy(appKey: _*)
      .agg(max(col("cc_used")).as("peak"),
        max_by(col("cc_max"), col(tsCol)).as("cache_max"))
      .withColumn("severity",
        when(!(col("cache_max") > col("peak") &&
            expr("(cache_max - peak) * 100 div cache_max") >= 5), Severity.Moderate)
          .otherwise(Severity.None))

  /** A6/A7 delta-rate heuristics (Locks/Safepoints): max over the per-event
    * rate (count delta per second), thresholded
    * (reference: Locks.java:17-61, Safepoints.java:16-48).
    */
  def maxDeltaRate(stats: DataFrame, counterCol: String, tsMillisCol: String): DataFrame = {
    val w = Window.partitionBy(appKey: _*).orderBy(col(tsMillisCol))
    stats
      .withColumn("_prev_c", lag(col(counterCol), 1).over(w))
      .withColumn("_prev_t", lag(col(tsMillisCol), 1).over(w))
      .where(col("_prev_t").isNotNull && col(tsMillisCol) =!= col("_prev_t"))
      .withColumn("rate",
        (col(counterCol) - col("_prev_c")) * 1000 / (col(tsMillisCol) - col("_prev_t")))
      .groupBy(appKey: _*)
      .agg(max(col("rate")).cast("long").as("max_rate"))
  }

  def locks(lockStats: DataFrame): DataFrame =
    maxDeltaRate(lockStats, "contendedlockattempts", "ts_millis")
      .withColumn("severity",
        when(col("max_rate") > 500, Severity.Critical)
          .when(col("max_rate") > 100, Severity.Severe)
          .when(col("max_rate") > 50, Severity.Moderate)
          .when(col("max_rate") > 10, Severity.Low)
          .otherwise(Severity.None))

  def safepoints(safepointStats: DataFrame): DataFrame =
    maxDeltaRate(safepointStats, "safepoint_count", "ts_millis")
      .withColumn("severity",
        when(col("max_rate") > 10, Severity.Critical)
          .when(col("max_rate") > 7, Severity.Severe)
          .when(col("max_rate") > 5, Severity.Moderate)
          .when(col("max_rate") > 3, Severity.Low)
          .otherwise(Severity.None))

  /** A8 FileHeuristic: per-(app,attempt) counts pivoted by FS action
    * (reference: FileHeuristic.java:31-97; actions enums/FsAction.java).
    */
  val fsActions: Seq[String] = Seq("READ", "WRITE", "RENAME", "DELETE", "APPEND",
    "ADD_BLOCK", "LIST_STATUS", "GET_CONTENT_SUMMARY")

  def fileHeuristic(fsEvents: DataFrame, maxCreatedFiles: Long = 100000L): DataFrame =
    fsEvents
      .groupBy(col("application_id"), col("attempt_id"))
      .pivot(col("action"), fsActions)
      .count()
      .na.fill(0L, fsActions)
      .withColumn("severity",
        when(col("WRITE") > maxCreatedFiles, Severity.Severe)
          .when(col("WRITE") > maxCreatedFiles / 2, Severity.Moderate)
          .when(col("WRITE") > maxCreatedFiles / 10, Severity.Low)
          .otherwise(Severity.None))

  /** A9 FlinkCheckpointDuration: max(last_checkpoint_duration) per (app, job)
    * (reference: flink/FlinkCheckpointDuration.java:45-53).
    */
  def flinkCheckpointDuration(flinkJobEvents: DataFrame): DataFrame =
    flinkJobEvents
      .groupBy(col("application_id"), col("job_name"))
      .agg(max(col("last_checkpoint_duration")).as("max_checkpoint_ms"))
      .withColumn("severity",
        when(col("max_checkpoint_ms") > 15 * 60 * 1000L, Severity.Severe)
          .otherwise(Severity.None))

  /** A10 Extractor: per-container event counts by type
    * (reference: tool/Extractor.java:36-47).
    */
  def extractorCounts(events: DataFrame): DataFrame =
    events.groupBy(col("container_id"), col("event_type")).count()
}
