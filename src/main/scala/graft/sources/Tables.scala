package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the engine's batch tables.
  *
  * The reference dumps per-event-type Parquet tables to HDFS
  * (reference: readers/hdfs/src/main/java/.../HdfsExporter.java:56-136); our batch
  * surface reads day-partitioned Parquet the same way. Test data is the
  * driver-generated star schema + `events` stream table (TESTDATA.md).
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = starTables ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's `events` table carries TIMESTAMP(NANOS) parquet columns,
    // which vanilla Spark 4 refuses; read nanos as long and restore a
    // microsecond TimestampType column (values are exact microseconds).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Normalize upstream timestamp-encoding drift at the table boundary.
    *
    * Large ingests see writers that disagree about timestamp flavor: pandas
    * emits tz-naive TIMESTAMP_NTZ micros, legacy pipelines emit
    * TIMESTAMP(NANOS) that Spark only reads as long, tz-aware writers emit
    * plain TimestampType. The engine's operators uniformly expect
    * TimestampType (session TZ is UTC in every entry point, so NTZ→TZ is
    * value-identical). Normalizing here — once, at the scan boundary — is
    * what keeps every downstream `unix_millis`/window/watermark site
    * encoding-agnostic.
    */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType => acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if f.name == "ts" =>
          acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => acc
      }
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")

  /** Register all tables as temp views so `spark.sql` works against them. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
