package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Input-encoding drift at the table boundary.
  *
  * A 100 TB ingest sees upstream writers that disagree about timestamp
  * flavor: tz-aware TIMESTAMP (Spark, Hive), tz-naive TIMESTAMP_NTZ micros
  * (pandas/pyarrow), TIMESTAMP(NANOS) that Spark 4 only reads as long
  * (legacy pipelines). The driver's own testdata has ALREADY drifted twice
  * across rounds (nanos → NTZ), each time breaking every
  * `unix_millis(ts)` call site at analysis time — [[Tables.load]]
  * normalizes all flavors to session-TZ TimestampType once, at the scan
  * boundary, so every downstream window/watermark/unix_millis site is
  * encoding-agnostic. These cases pin that contract against the NEXT
  * drift.
  */
class TablesDriftSpec extends SparkSpecBase {

  private def work() =
    java.nio.file.Files.createTempDirectory("tables_drift_").toString

  /** The downstream shape that drift breaks: unix_millis over ts. */
  private def millisSum(df: DataFrame): Long =
    df.agg(sum(unix_millis(col("ts")))).first().getLong(0)

  private val rows = Seq(
    (1L, Timestamp.from(java.time.Instant.parse("2024-03-01T10:15:30.123456Z"))),
    (2L, Timestamp.from(java.time.Instant.parse("2024-03-02T23:59:59.999999Z"))),
    (3L, Timestamp.from(java.time.Instant.parse("1999-12-31T00:00:00Z"))))

  private def baseline: DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts")
  }

  test("tz-aware TimestampType passes through untouched") {
    val dir = work()
    baseline.write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(millisSum(loaded) == millisSum(baseline))
  }

  test("TIMESTAMP_NTZ (pandas-style tz-naive micros) is cast to TimestampType, values identical in UTC") {
    val dir = work()
    // write an NTZ flavor of the same instants (session TZ is UTC, so the
    // local-datetime rendering equals the instant's UTC wall clock)
    baseline.select(col("event_id"),
        col("ts").cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType, "fixture must be NTZ on disk")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(millisSum(loaded) == millisSum(baseline))
    // the round-6 regression shape: this used to throw DATATYPE_MISMATCH
    assert(loaded.where(unix_micros(col("ts")) > 0).count() == 3)
  }

  test("long ts named 'ts' (the NANOS-as-long legacy read) is restored to microsecond TimestampType") {
    val dir = work()
    baseline.select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts")) // nanos since epoch, LongType
      .write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(millisSum(loaded) == millisSum(baseline))
  }

  test("non-ts long columns and other types are NOT touched") {
    val dir = work()
    import spark.implicits._
    Seq((1L, 42L, "x")).toDF("event_id", "user_id", "props")
      .write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("event_id").dataType == LongType)
    assert(loaded.schema("user_id").dataType == LongType)
    assert(loaded.schema("props").dataType == StringType)
  }

  test("every NTZ column is normalized, not just ts") {
    val dir = work()
    baseline.select(col("event_id"),
        col("ts").cast(TimestampNTZType).as("ts"),
        col("ts").cast(TimestampNTZType).as("updated_at"))
      .write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(loaded.schema("updated_at").dataType == TimestampType)
    assert(loaded.agg(sum(unix_millis(col("updated_at")))).first().getLong(0)
      == millisSum(baseline))
  }
}
