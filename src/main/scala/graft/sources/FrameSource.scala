package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.EventModel

/** S1-S3: ingestion of the binary wire stream into a typed envelope table.
  *
  * The reference's reader polls Kafka byte[] records and lazily decodes
  * marker → header → body (reference: readers/common/src/main/java/.../reader/
  * GarmadonReader.java:162-239). Our Spark shape: the Kafka source DataFrame
  * (`value: binary`, `offset: long`, ...) → [[decodeFrames]] → a DataFrame
  * with (event_type, timestamp, kafka_offset, header, body) where corrupt
  * frames become nulls and are filtered (counted upstream via metrics),
  * and all type predicates land on the small `event_type` column before
  * any body decode — Catalyst orders the filter before the projection.
  */
object FrameSource {

  final case class DecodedFrame(
      event_type: String,
      type_marker: Int,
      timestamp_millis: Long,
      header: Array[Byte],
      body: Array[Byte],
      kafka_offset: Long)

  /** Decode a stream/batch of (value, offset) binary records into envelope
    * rows, dropping corrupt frames (PERMISSIVE semantics). Works on both
    * batch and streaming Datasets.
    */
  def decodeFrames(spark: SparkSession, raw: DataFrame,
                   valueCol: String = "value", offsetCol: String = "offset"): DataFrame = {
    import spark.implicits._
    val pairs = raw.select(col(valueCol).as("v"), col(offsetCol).cast("long").as("o"))
      .as[(Array[Byte], Long)]
    pairs.flatMap { case (bytes, off) =>
      EventModel.decode(bytes).map { f =>
        DecodedFrame(EventModel.typeMarkers.getOrElse(f.typeMarker, s"UNKNOWN_${f.typeMarker}"),
          f.typeMarker, f.timestampMillis, f.header, f.body, off)
      }
    }.toDF()
      .withColumn("timestamp", timestamp_millis(col("timestamp_millis")))
  }

  /** Kafka streaming source for the event topic (S1). Not exercised in the
    * offline test environment (no broker) but the production entry point.
    */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
}
