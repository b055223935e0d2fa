package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{EventModel, ProtoDescriptors}
import graft.sources.EventTables
import graft.streaming.EventRouter

/** Decode-once multi-type routing: one wire stream → N typed day-partitioned
  * tables in a single foreachBatch pass (the scale-correct multi-writer).
  */
class EventRouterSpec extends SparkSpecBase {
  import spark.implicits._

  private val header = ProtoDescriptors.header.encode(Seq(
    "app_r", "1", "router", "u", "c_1", "h", "", "YARN", "EXECUTOR", "",
    Seq("YARN_APPLICATION"), "", "", "", 0, ""))

  private def fsFrame(ts: Long, action: String, off: Long): (Array[Byte], Long) =
    (EventModel.encode(EventModel.Frame(1, ts,
      header, ProtoDescriptors.fsEvent.encode(Seq(
        "/src", "", action, "hdfs://root", 5L, "u", "SUCCESS")))), off)

  private def gcFrame(ts: Long, pause: Long, off: Long): (Array[Byte], Long) =
    (EventModel.encode(EventModel.Frame(1000, ts,
      header, ProtoDescriptors.gcStatisticsData.encode(
        Seq("PS Scavenge", pause, "Allocation Failure") ++ Seq.fill(10)(0L) ++ Seq(0.0f)))), off)

  private val day1 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private val day2 = java.sql.Timestamp.valueOf("2024-03-02 10:00:00").getTime

  test("streaming: one wire stream fans out to typed per-type day tables") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("router").toString
    val ckpt = Files.createTempDirectory("router_ckpt").toString
    val in = MemoryStream[(Array[Byte], Long)]
    val q = EventRouter.routeTyped(in.toDF().toDF("value", "offset"), base, ckpt,
      types = Seq("FS_EVENT", "GC_EVENT")).start()
    try {
      in.addData(fsFrame(day1, "WRITE", 1), fsFrame(day2, "READ", 2), gcFrame(day1, 12, 3))
      q.processAllAvailable()
    } finally q.stop()

    val fs = spark.read.parquet(s"$base/FS_EVENT")
    assert(fs.count() == 2)
    assert(fs.select("action").as[String].collect().toSet == Set("WRITE", "READ"))
    assert(fs.select("application_id").as[String].collect().toSet == Set("app_r"))
    // day partitioning prunes
    assert(fs.where(col("day") === "2024-03-01").count() == 1)
    val gc = spark.read.parquet(s"$base/GC_EVENT")
    assert(gc.count() == 1 && gc.select("pause_time").as[Long].head() == 12L)

    // cross-type union view over the routed tables
    val union = EventTables.unionView(Map(
      "FS_EVENT" -> fs.drop("day"), "GC_EVENT" -> gc.drop("day")))
    assert(union.count() == 3)
    assert(union.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("FS_EVENT" -> 2L, "GC_EVENT" -> 1L))

    // day-close epilogue: watermark inside day 2 closes day 1 only
    val closed = EventRouter.closeDays(spark, base, Seq("FS_EVENT", "GC_EVENT"), day2)
    assert(closed.size == 2) // FS_EVENT day1 + GC_EVENT day1
    assert(closed.forall(p => p.contains("day=2024-03-01") && p.endsWith("_DONE")))
  }

  test("routeTyped's in-plan watermark populates query progress (closeDays' input)") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("router_wm").toString
    val ckpt = Files.createTempDirectory("router_wm_ckpt").toString
    val in = MemoryStream[(Array[Byte], Long)]
    val q = EventRouter.routeTyped(in.toDF().toDF("value", "offset"), base, ckpt,
      types = Seq("FS_EVENT"), lateness = "1 hour").start()
    try {
      in.addData(fsFrame(day1, "WRITE", 1))
      q.processAllAvailable()
      in.addData(fsFrame(day2, "READ", 2))
      q.processAllAvailable()
      // the decode+withWatermark lives INSIDE the streaming plan, so the
      // progress carries the lateness-adjusted watermark closeDays needs
      val wm = q.lastProgress.eventTime.get("watermark")
      assert(wm != null, "no watermark entry in query progress")
      val wmMillis = java.time.Instant.parse(wm).toEpochMilli
      assert(wmMillis == day1 - 3600 * 1000L,
        s"watermark $wmMillis should be first batch's max event time minus the 1h grace")
      // and it drives the day-close markers end to end
      val closed = EventRouter.closeDays(spark, base, Seq("FS_EVENT"), wmMillis)
      assert(closed.isEmpty) // watermark still inside day 1 — nothing closes
    } finally q.stop()
  }

  test("a type whose only frames fail proto decode creates no table directory") {
    val base = Files.createTempDirectory("router_corrupt").toString
    // valid envelope (marker 1000 = GC_EVENT, real timestamp) but a body
    // the proto decoder nulls out (truncated varint tag): the type is in
    // the pre-decode present set yet yields zero typed rows — must not
    // leave a schema-less empty table dir behind
    val corrupt = (EventModel.encode(EventModel.Frame(1000, day1,
      header, Array[Byte](0xFF.toByte))), 1L)
    val b = Seq(fsFrame(day1, "WRITE", 2), corrupt).toDF("value", "offset")
    EventRouter.routeBatch(b, base, Seq("FS_EVENT", "GC_EVENT"))
    assert(spark.read.parquet(s"$base/FS_EVENT").count() == 1)
    assert(!new java.io.File(s"$base/GC_EVENT").exists(),
      "corrupt-only GC_EVENT batch must not create an empty table dir")
  }

  test("batch routeBatch appends without duplicating other types") {
    val base = Files.createTempDirectory("router_b").toString
    val b1 = Seq(fsFrame(day1, "WRITE", 1)).toDF("value", "offset")
    val b2 = Seq(fsFrame(day1, "DELETE", 2), gcFrame(day1, 7, 3)).toDF("value", "offset")
    EventRouter.routeBatch(b1, base, Seq("FS_EVENT", "GC_EVENT"))
    EventRouter.routeBatch(b2, base, Seq("FS_EVENT", "GC_EVENT"))
    assert(spark.read.parquet(s"$base/FS_EVENT").count() == 2)
    assert(spark.read.parquet(s"$base/GC_EVENT").count() == 1)
  }
}
