package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dashboard/heuristics aggregation surface as reusable DataFrame
  * recipes (reference operator families Q1-Q10 from the Grafana census and
  * A1-A10 from the heuristics reader — see SURVEY.md §2.5-2.6).
  *
  * Everything is a declarative groupBy/agg/window plan: partial (map-side)
  * aggregation, shuffle-on-group-keys and whole-stage codegen come from
  * Catalyst. Nothing here collects to the driver.
  */
object Aggregations {

  /** Q1: fixed-interval time-bucketed aggregation (ES date_histogram).
    * Bucket column is a truncated timestamp → groupBy shuffles on it.
    */
  def timeBucketAgg(df: DataFrame, ts: Column, interval: String, extraKeys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((date_trunc(interval, ts).as("bucket") +: extraKeys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Q2: top-K groups by a metric (ES terms-with-size). Global agg first
    * (shuffle on keys), then a single-partition sort of only the group rows
    * — never a global sort of the input.
    */
  def topK(df: DataFrame, keys: Seq[Column], metric: Column, metricName: String, k: Int, tieBreak: Seq[Column] = Nil): DataFrame =
    df.groupBy(keys: _*)
      .agg(metric.as(metricName))
      .orderBy((col(metricName).desc +: tieBreak): _*)
      .limit(k)

  /** Q9/A6/A7: derivative / delta-rate over an ordered per-key series.
    * rate = (value - lag(value)) * 1000 / (ts_ms - lag(ts_ms)); the
    * reference tracks the max rate per container
    * (reference: readers/heuristics/src/main/java/.../Locks.java:17-61,
    * Safepoints.java:16-48).
    */
  def deltaRatePerSec(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val tsMs = (unix_micros(ts) / 1000L)
    df.withColumn("_prev_v", lag(value, 1).over(w))
      .withColumn("_prev_ms", lag(tsMs, 1).over(w))
      .withColumn("rate_per_sec",
        (value - col("_prev_v")) * 1000.0 / (tsMs - col("_prev_ms")))
      .drop("_prev_v", "_prev_ms")
  }

  /** Q9: discrete derivative (difference of consecutive values) per key. */
  def derivative(df: DataFrame, key: Column, order: Seq[Column], value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn(as, value - lag(value, 1).over(w))
  }

  /** D10 (batch flavor): sessionize an event stream by inactivity gap —
    * gaps-and-islands with one pass of window functions (a new session
    * starts when the gap to the previous event exceeds `gapSeconds`).
    * Adds `session_id` (0-based per key). Streaming flavor lives in
    * [[graft.streaming.Sessionizer]].
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val gapMs = gapSeconds * 1000L
    val tsMs = unix_micros(ts) / 1000L
    val isNew = when(lag(tsMs, 1).over(w).isNull, 1L)
      .when(tsMs - (unix_micros(lag(ts, 1).over(w)) / 1000L) > gapMs, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }

  /** A8-style pivot: per-key counts fanned out to one column per category.
    * Categories are passed explicitly → stable schema (SURVEY §7.4 risk 1).
    */
  def pivotCounts(df: DataFrame, key: Column, cat: Column, categories: Seq[String]): DataFrame =
    df.groupBy(key)
      .pivot(cat, categories)
      .count()
      .na.fill(0L, categories)
}
