package graft.serving

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.filters.Filters
import graft.functions.{Functions => F}
import graft.operators.Aggregations

/** The dashboard query surface (SURVEY §2.6, extracted from the 10 Grafana
  * dashboards) as a typed Scala API over the garmadon-shaped event tables.
  *
  * Every method returns a lazy DataFrame plan: filter → (time-bucket ×
  * group) → metric aggs, the `date_histogram`+`terms`+metric census
  * {sum, avg, count, max, cardinality, percentiles, derivative,
  * raw_document}. Partition-pruning note: on the day-partitioned sink
  * layout (event_type, day), every one of these prunes to the queried
  * event type's partitions before scanning.
  */
object Dashboards {

  /** "FS OPS $action per user (top 20)" + "FS Latency $action per user"
    * (garmadon-hdfs.json:441 and the latency twin): count + p99 latency
    * by action × user per bucket, for one normalized uri. The §7.2
    * flagship shape. `exactPercentiles` swaps the approx sketch for the
    * exact interpolated percentile — oracle-parity/test mode; serving
    * keeps the default sketch (SCALE.md).
    */
  def fsOpsPerUser(fsEvents: DataFrame, uri: String, interval: String = "30 seconds",
                   aliases: Map[String, String] = Map.empty,
                   exactPercentiles: Boolean = false): DataFrame =
    fsOpsPerGroup(fsEvents, Seq(col("hdfs_user")), uri, interval, aliases,
      exactPercentiles)

  /** "FS OPS $action per application (top 20)" (garmadon-hdfs.json). */
  def fsOpsPerApplication(fsEvents: DataFrame, uri: String,
                          interval: String = "30 seconds",
                          aliases: Map[String, String] = Map.empty): DataFrame =
    fsOpsPerGroup(fsEvents, Seq(col("application_id")), uri, interval, aliases)

  /** "FS OPS $action per framework/component" (garmadon-hdfs.json). */
  def fsOpsPerFrameworkComponent(fsEvents: DataFrame, uri: String,
                                 interval: String = "30 seconds",
                                 aliases: Map[String, String] = Map.empty): DataFrame =
    fsOpsPerGroup(fsEvents, Seq(col("framework"), col("component")), uri, interval, aliases)

  /** "FS OPS/Latency action per App/Attempt/Container on $uri" — the
    * per-application drill-down (garmadon-yarn-application.json FS row).
    */
  def fsOpsPerContainer(fsEvents: DataFrame, uri: String,
                        interval: String = "30 seconds",
                        aliases: Map[String, String] = Map.empty): DataFrame =
    fsOpsPerGroup(fsEvents,
      Seq(col("application_id"), col("attempt_id"), col("container_id")),
      uri, interval, aliases)

  /** "FS OPS $action per host-user-pid" — the standalone-JVM drill-down
    * (garmadon-hdfs.json).
    */
  def fsOpsPerHostUserPid(fsEvents: DataFrame, uri: String,
                          interval: String = "30 seconds",
                          aliases: Map[String, String] = Map.empty): DataFrame =
    fsOpsPerGroup(fsEvents, Seq(col("hostname"), col("hdfs_user"), col("pid")),
      uri, interval, aliases)

  /** The shared shape of every per-entity FS panel: normalize + filter the
    * uri, bucket time, group by (entity × action), count + p99 latency.
    * On the day-partitioned (event_type, day) sink layout the uri filter
    * and event-type pruning reach the scan; the single group-by exchange
    * is keyed (bucket, entity, action) — no global sort, no window.
    */
  private def fsOpsPerGroup(fsEvents: DataFrame, groupCols: Seq[Column], uri: String,
                            interval: String, aliases: Map[String, String],
                            exactPercentiles: Boolean = false): DataFrame = {
    val p99 =
      if (exactPercentiles) expr("percentile(method_duration_millis, 0.99)")
      else percentile_approx(col("method_duration_millis"), lit(0.99), lit(10000))
    fsEvents
      .withColumn("uri", F.normalizeUri(col("uri"), aliases))
      .where(col("uri") === uri)
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols :+ col("action")): _*)
      .agg(count(lit(1)).as("n"), p99.as("p99_ms"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("action") :+
        col("n") :+ col("p99_ms")): _*)
  }

  /** "FS OPS for $uri" / "Failures" (garmadon-hdfs.json): per-action (or
    * failure-only) op counts per bucket over the normalized uri.
    */
  def fsOpsPerAction(fsEvents: DataFrame, uri: String, interval: String = "30 seconds",
                     aliases: Map[String, String] = Map.empty,
                     failuresOnly: Boolean = false): DataFrame = {
    val base = fsEvents
      .withColumn("uri", F.normalizeUri(col("uri"), aliases))
      .where(col("uri") === uri)
    (if (failuresOnly) base.where(col("status") === "FAILURE") else base)
      .groupBy(window(col("timestamp"), interval).as("bucket"), col("action"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket.start").as("bucket_start"), col("action"), col("n"))
  }

  /** Time-bucketed FS op counts + latency percentiles by action. */
  def fsOpsLatency(fsEvents: DataFrame, interval: String = "30 seconds"): DataFrame =
    fsEvents
      .groupBy(window(col("timestamp"), interval).as("bucket"), col("action"))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("method_duration_millis"), lit(0.99), lit(10000)).as("p99_ms"))
      .select(col("bucket.start").as("bucket_start"), col("action"), col("n"), col("p99_ms"))

  /** "YARN Memory Used/Reserved" (garmadon-compute.json): sum(value),
    * sum(limit) of container MEMORY per 10 s bucket.
    */
  def containerMemory(containerEvents: DataFrame, interval: String = "10 seconds"): DataFrame =
    containerEvents
      .where(col("type") === "MEMORY")
      .groupBy(window(col("timestamp"), interval).as("bucket"))
      .agg(sum(col("value")).as("used"), sum(col("limit")).as("reserved"))
      .select(col("bucket.start").as("bucket_start"), col("used"), col("reserved"))

  /** Running containers / apps (cardinality panels, garmadon-compute.json). */
  def runningCardinality(events: DataFrame, interval: String = "30 seconds"): DataFrame =
    events
      .groupBy(window(col("timestamp"), interval).as("bucket"))
      .agg(
        approx_count_distinct(col("container_id")).as("n_containers"),
        approx_count_distinct(col("application_id")).as("n_apps"))
      .select(col("bucket.start").as("bucket_start"), col("n_containers"), col("n_apps"))

  /** GC pause time per collector per bucket (garmadon-jvm.json). */
  def gcPause(gcEvents: DataFrame, interval: String = "30 seconds"): DataFrame =
    gcEvents
      .groupBy(window(col("timestamp"), interval).as("bucket"), col("collector_name"))
      .agg(sum(col("pause_time")).as("pause_ms"), count(lit(1)).as("n_gcs"),
        max(col("pause_time")).as("max_pause_ms"))
      .select(col("bucket.start").as("bucket_start"), col("collector_name"),
        col("pause_ms"), col("n_gcs"), col("max_pause_ms"))

  /** Q9 derivative panels: rate-of-change of a bucketed max (GC CPU time/s,
    * threads created/s — garmadon-jvm.json derivative aggs).
    *
    * Scale note: the `groupCols = Nil` flavor runs an unpartitioned window
    * (Spark logs "No Partition Defined") — deliberately. The window's input
    * is the ALREADY-AGGREGATED bucket series, whose size is timeRange /
    * interval — bounded by the dashboard's time axis (thousands of rows),
    * independent of corpus size. A single-partition sort over that is
    * cheaper than any gap-sensitive self-join rewrite; per-entity panels
    * pass groupCols and get a partitioned window.
    */
  def bucketedDerivative(events: DataFrame, valueCol: Column, interval: String,
                         groupCols: Seq[Column] = Nil): DataFrame = {
    val bucketed = events
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols): _*)
      .agg(max(valueCol).as("v"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("v")): _*)
    val w = groupCols match {
      case Nil => Window.orderBy(col("bucket_start"))
      case gs => Window.partitionBy(gs: _*).orderBy(col("bucket_start"))
    }
    bucketed.withColumn("dv_per_bucket", col("v") - lag(col("v"), 1).over(w))
  }

  /** The generic date_histogram × terms × {sum,avg,max,min} series — the
    * panel shape every remaining graph of the 10 dashboards reduces to
    * (YARN memory/vcore sums, OS disk/network byte sums, Spark
    * task/stage shuffle metrics, Flink job/checkpoint metrics, …): an
    * optional row filter, a time bucket, optional terms keys, one metric
    * agg over a typed column. One exchange keyed (bucket × terms), fully
    * partial-aggregated map-side; on the (event_type, day) sink layout
    * the event-type filter prunes partitions before the scan.
    */
  def metricSeries(events: DataFrame, valueCol: Column, agg: String = "sum",
                   interval: String = "30 seconds",
                   groupCols: Seq[Column] = Nil,
                   where: Column = lit(true)): DataFrame = {
    val folded = agg match {
      case "sum" => sum(valueCol)
      case "avg" => avg(valueCol)
      case "max" => max(valueCol)
      case "min" => min(valueCol)
      case "count" => count(valueCol)
      case other => throw new IllegalArgumentException(
        s"metricSeries agg must be sum/avg/max/min/count, got '$other'")
    }
    events.where(where)
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols): _*)
      .agg(folded.as("v"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("v")): _*)
  }

  /** The percentile-series shape ("Task runtime", latency percentiles
    * outside the FS family): approx p-quantile of a typed column per
    * bucket × terms keys. Sketch-based — the oracle-parity exact flavor
    * lives on the FS path ([[fsOpsPerUser]] `exactPercentiles`).
    */
  def percentileSeries(events: DataFrame, valueCol: Column, p: Double,
                       interval: String = "30 seconds",
                       groupCols: Seq[Column] = Nil,
                       where: Column = lit(true)): DataFrame =
    events.where(where)
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols): _*)
      .agg(percentile_approx(valueCol, lit(p), lit(10000)).as("v"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("v")): _*)

  /** The cardinality-series shape ("Applications/Containers running",
    * "#Applications Per User/Framework", "Top app running container"):
    * approx distinct of a key per bucket (× optional terms keys) —
    * HLL++ partial-aggregated, same single exchange as [[metricSeries]].
    */
  def cardinalitySeries(events: DataFrame, keyCol: Column,
                        interval: String = "30 seconds",
                        groupCols: Seq[Column] = Nil,
                        where: Column = lit(true)): DataFrame =
    events.where(where)
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols): _*)
      .agg(approx_count_distinct(keyCol).as("v"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("v")): _*)

  /** Any single-metric JVMSTATS series panel of garmadon-jvm.json (CPU,
    * HEAP/OFF-HEAP/metaspace usage, #Threads, #File Descriptors, compile
    * counts/time/threads, safepoint count/sync/total time): the props-map
    * key is bucketed and folded with the panel's metric agg. One method =
    * the whole date_histogram × {avg,max,sum} census over the stable
    * MapType form (`JvmStats.toPropsMap`); the serving pivot
    * (`pivotKnown`) is not needed per panel.
    */
  def jvmSeries(jvmStats: DataFrame, key: String, agg: String = "avg",
                interval: String = "30 seconds",
                groupCols: Seq[Column] = Nil): DataFrame = {
    val v = element_at(col("props"), key).cast("double")
    val folded = agg match {
      case "avg" => avg(v)
      case "max" => max(v)
      case "sum" => sum(v)
      case other => throw new IllegalArgumentException(
        s"jvmSeries agg must be avg/max/sum (the dashboards' census), got '$other'")
    }
    jvmStats
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols): _*)
      .agg(folded.as("v"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("v")): _*)
  }

  /** "GC CPU time" (garmadon-jvm.json:684-770): the rate of a cumulative
    * per-collector GC time counter — date_histogram bucket, hidden `max`,
    * `derivative` pipeline agg — as one series per group (app, collector,
    * pid… whatever the panel's terms agg keys on).
    */
  def gcCpuTime(jvmStats: DataFrame, valueCol: Column, interval: String = "30 seconds",
                groupCols: Seq[Column] = Seq(col("application_id"))): DataFrame =
    bucketedDerivative(jvmStats, valueCol, interval, groupCols)

  /** "GC Count" (garmadon-jvm.json): bucketed max of the cumulative
    * per-collector count counter (no derivative — the panel plots the
    * counter itself).
    */
  def gcCount(jvmStats: DataFrame, valueCol: Column, interval: String = "30 seconds",
              groupCols: Seq[Column] = Nil): DataFrame =
    jvmStats
      .groupBy((window(col("timestamp"), interval).as("bucket") +: groupCols): _*)
      .agg(max(valueCol).as("v"))
      .select((col("bucket.start").as("bucket_start") +: groupCols :+ col("v")): _*)

  /** "#Threads Created" (garmadon-jvm.json): derivative of the bucketed
    * cumulative threads_total.
    */
  def threadsCreatedRate(jvmStats: DataFrame, interval: String = "30 seconds",
                         groupCols: Seq[Column] = Nil): DataFrame =
    bucketedDerivative(jvmStats, col("threads_total"), interval, groupCols)

  /** "Threads created/s per container" for ONE application
    * (garmadon-yarn-application.json's per-app derivative panel): the
    * thread-total derivative bucketed per container — a partitioned
    * window over (application_id, container_id), never single-partition.
    * Input: JVMSTATS pivot rows carrying `threads_total`.
    */
  def appThreadsRate(jvmStats: DataFrame, applicationId: String,
                     interval: String = "30 seconds"): DataFrame =
    bucketedDerivative(
      jvmStats.where(col("application_id") === applicationId),
      col("threads_total"), interval,
      groupCols = Seq(col("application_id"), col("container_id")))

  /** "Container memory used vs limit" for ONE application
    * (garmadon-yarn-application.json): per-container MEMORY series — the
    * drill-down flavor of [[containerMemory]]'s cluster-wide panel.
    */
  def appContainerMemory(containerEvents: DataFrame, applicationId: String,
                         interval: String = "10 seconds"): DataFrame =
    containerEvents
      .where(col("application_id") === applicationId && col("type") === "MEMORY")
      .groupBy(window(col("timestamp"), interval).as("bucket"), col("container_id"))
      .agg(max(col("value")).as("used"), max(col("limit")).as("limit"))
      .select(col("bucket.start").as("bucket_start"), col("container_id"),
        col("used"), col("limit"))

  /** "Stage duration / task count" per stage for one application
    * (garmadon-spark-job.json): one row per completed stage attempt,
    * duration = completion ts − start_time.
    */
  def sparkStageDurations(stageEvents: DataFrame, applicationId: String): DataFrame =
    stageEvents
      .where(col("application_id") === applicationId && col("status") === "COMPLETED")
      .select(col("stage_id"), col("stage_attempt_id"), col("stage_name"),
        col("num_tasks"),
        (unix_millis(col("timestamp")) - col("start_time")).as("duration_ms"))

  /** Top-K users by FS op volume (terms-with-size panels). */
  def topUsers(fsEvents: DataFrame, k: Int = 20): DataFrame =
    Aggregations.topK(fsEvents, Seq(col("hdfs_user")), count(lit(1)), "n_ops", k,
      Seq(col("hdfs_user")))

  /** Q10/Q11 raw-document + annotation queries: latest rows matching a
    * predicate (state transitions, restore times).
    */
  def rawEvents(events: DataFrame, predicate: Column, n: Int = 100): DataFrame =
    events.where(predicate).orderBy(col("timestamp").desc).limit(n)

  /** Annotation query: stage/app state-transition points
    * (garmadon-spark-job.json annotations).
    */
  def stateAnnotations(events: DataFrame, applicationId: String, state: String = "BEGIN"): DataFrame =
    rawEvents(events,
      Filters.hasType("SPARK_STAGE_STATE_EVENT") &&
        col("application_id") === applicationId && col("state") === state)
      .select(col("timestamp"), col("tags"))
}
