package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventSink

/** Day-partitioned sink layout, compaction and retention (S7/ST5/Q12). */
class EventSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def sampleEvents(n: Int, day: String) = {
    val base = java.sql.Timestamp.valueOf(s"$day 08:00:00")
    (0 until n).map(i =>
      ("FS_EVENT", new java.sql.Timestamp(base.getTime + i * 1000L), s"c$i"))
      .toDF("event_type", "timestamp", "container_id")
  }

  test("writePartitioned lays out event_type=/day= directories") {
    val dir = Files.createTempDirectory("sink").toString
    EventSink.writePartitioned(sampleEvents(10, "2024-03-01"), dir)
    EventSink.writePartitioned(sampleEvents(5, "2024-03-02"), dir)
    val d1 = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val d2 = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-02")
    assert(d1.isDirectory && d2.isDirectory)
    // partition pruning works: filter reads only one day
    val read = spark.read.parquet(dir).where(col("day") === "2024-03-01")
    assert(read.count() == 10)
  }

  test("compactPartition rewrites many small files into one") {
    val dir = Files.createTempDirectory("compact").toString
    // 12 separate appends → ≥12 files in the partition
    (0 until 12).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    val part = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val before = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 12)
    val did = EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 8)
    assert(did)
    val after = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    assert(spark.read.parquet(dir).count() == 24) // no data lost
  }

  test("dropExpiredPartitions removes only days older than retention") {
    val dir = Files.createTempDirectory("retention").toString
    EventSink.writePartitioned(sampleEvents(3, "2024-03-01"), dir)
    EventSink.writePartitioned(sampleEvents(3, "2024-03-05"), dir)
    val dropped = EventSink.dropExpiredPartitions(spark, dir, "FS_EVENT",
      java.time.LocalDate.parse("2024-03-07"), retainDays = 4)
    assert(dropped.size == 1 && dropped.head.contains("day=2024-03-01"))
    assert(spark.read.parquet(dir).count() == 3)
  }
}
