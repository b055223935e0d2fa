package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.model.EventModel
import graft.sources.FrameSource

/** The multi-type streaming read path: ONE pass over the wire stream,
  * fanned out to per-type typed tables inside a single `foreachBatch`.
  *
  * The reference runs one consumer that dispatches each decoded message to
  * every registered per-type writer (reference: readers/hdfs/src/main/java/
  * .../HdfsExporter.java:91-140 — 18 event writers behind one
  * GarmadonReader). The naive Spark translation — N independent
  * `typedTable` streaming queries — re-reads the Kafka topic N times.
  * This router is the scale-correct shape: decode the envelope once per
  * micro-batch, persist the decoded batch, then filter + proto-decode +
  * append each type's partition of it (the marker filter makes each
  * branch's body decode touch only its own rows).
  *
  * Day-partitioned layout and the day-close markers ride along: after each
  * batch, days the watermark has passed get their `_DONE` markers
  * ([[EventSink.writeDayCloseMarkers]]).
  */
object EventRouter {

  /** Route a raw wire stream (`value` binary, `offset` long) to
    * `basePath/<event_type>/` typed day-partitioned parquet tables.
    *
    * @param types the event types to materialize (default: all known)
    * @param lateness watermark grace for the day-close markers
    */
  def routeTyped(raw: DataFrame, basePath: String, checkpoint: String,
                 types: Seq[String] = EventModel.typeMarkers.values.toSeq.sorted,
                 lateness: String = "26 hours",
                 trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        routeBatch(batch, basePath, types)
      }
  }

  /** One micro-batch (also the batch/backfill entry): decode the envelope
    * once, cache it, append every type's typed rows to its table.
    */
  def routeBatch(batch: DataFrame, basePath: String, types: Seq[String]): Unit = {
    val frames = FrameSource.decodeFramesFast(batch, acceptedTypes = types)
    frames.persist()
    try {
      import org.apache.spark.sql.functions.{col, date_trunc, to_date}
      types.foreach { tpe =>
        val typed = FrameSource.typedTable(frames, tpe)
        // empty micro-batches for a type must not create empty files
        if (!typed.isEmpty) {
          // per-type tables partition by day only — the type IS the
          // directory (reference's one-table-per-descriptor layout);
          // unionView re-tags event_type when reading across types
          typed.drop("event_type")
            .withColumn("day", to_date(date_trunc("day", col("timestamp"))))
            .sortWithinPartitions(col("day"), col("timestamp"))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("day").parquet(s"$basePath/$tpe")
        }
      }
    } finally frames.unpersist()
  }

  /** Watermark epilogue: write `_DONE` markers for all routed tables once
    * the watermark (already lateness-adjusted by Spark) passes a day.
    * Call from a `StreamingQueryListener` or after `processAllAvailable`
    * with the query's `lastProgress.eventTime("watermark")`.
    */
  def closeDays(spark: SparkSession, basePath: String, types: Seq[String],
                watermarkMillis: Long): Seq[String] = {
    val closedBefore = EventSink.closedDayFromWatermark(watermarkMillis)
    types.flatMap { tpe =>
      // typed tables are partitioned by day only (type is the directory)
      val root = new org.apache.hadoop.fs.Path(s"$basePath/$tpe")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(root)) Nil
      else for {
        dayDir <- fs.listStatus(root).toSeq
        if dayDir.isDirectory && dayDir.getPath.getName.startsWith("day=")
        day = java.time.LocalDate.parse(dayDir.getPath.getName.stripPrefix("day="))
        if day.isBefore(closedBefore)
        marker = new org.apache.hadoop.fs.Path(dayDir.getPath, "_DONE")
        if !fs.exists(marker)
      } yield {
        fs.create(marker).close()
        marker.toString
      }
    }
  }
}
