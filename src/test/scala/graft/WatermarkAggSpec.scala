package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Q1/ST4 streaming flavor: watermarked windowed aggregation — the
  * dashboard date_histogram running as an incremental streaming query with
  * late-data expiry (the reference's 26 h day-close grace, scaled down).
  */
class WatermarkAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)

  test("windowed counts emit on watermark passage; too-late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("timestamp", "event_type")
      .withWatermark("timestamp", "10 minutes")
      .groupBy(window(col("timestamp"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: events in window [0,10); watermark advances to 15-10=5 → window still open
      input.addData(ts(1) -> "FS_EVENT", ts(3) -> "FS_EVENT", ts(15) -> "GC_EVENT")
      q.processAllAvailable()
      // batch 2: event at 25 pushes watermark to 15 → window [0,10) closes and emits
      input.addData(ts(25) -> "GC_EVENT")
      q.processAllAvailable()
      val closed = spark.table("wm_out").as[(java.sql.Timestamp, String, Long)].collect()
      assert(closed.contains((ts(0), "FS_EVENT", 2L)))
      // batch 3: a record at minute 2 is now older than the watermark → dropped
      input.addData(ts(2) -> "FS_EVENT")
      q.processAllAvailable()
      input.addData(ts(40) -> "GC_EVENT") // close everything up to 30
      q.processAllAvailable()
      val all = spark.table("wm_out").as[(java.sql.Timestamp, String, Long)].collect()
      // the late FS_EVENT at minute 2 never re-opens or re-emits window [0,10)
      assert(all.count(r => r._1 == ts(0) && r._2 == "FS_EVENT") == 1)
      assert(all.find(r => r._1 == ts(0) && r._2 == "FS_EVENT").get._3 == 2L)
    } finally q.stop()
  }
}
