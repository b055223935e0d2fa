package graft

import org.apache.spark.sql.functions._

import graft.model.EventModel
import graft.model.EventModel.Frame
import graft.sources.FrameSource

/** Envelope ingestion: flatmap vs fast-expression decode equivalence,
  * lazy-filter semantics, corrupt-frame drops (S2/S3).
  */
class FrameSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def frames: Seq[(Array[Byte], Long)] = Seq(
    EventModel.encode(Frame(1, 1700000000001L, Array[Byte](1, 2), Array[Byte](3, 4, 5))) -> 10L,
    EventModel.encode(Frame(1000, 1700000000002L, Array[Byte](9), Array[Byte]())) -> 11L,
    EventModel.encode(Frame(424242, 1700000000003L, Array[Byte](), Array[Byte](7))) -> 12L, // unknown marker
    Array.fill[Byte](10)(1) -> 13L, // corrupt: too short
    EventModel.encode(Frame(3, 1700000000004L, Array[Byte](1), Array[Byte](2))).dropRight(1) -> 14L) // corrupt: truncated

  lazy val raw = frames.toDF("value", "offset")

  test("fast and flatmap decodes agree row-for-row") {
    val slow = FrameSource.decodeFrames(spark, raw)
      .select("event_type", "type_marker", "timestamp_millis", "kafka_offset")
      .orderBy("kafka_offset").collect().toSeq
    val fast = FrameSource.decodeFramesFast(raw)
      .select("event_type", "type_marker", "timestamp_millis", "kafka_offset")
      .orderBy("kafka_offset").collect().toSeq
    assert(slow == fast)
    assert(slow.size == 3) // both corrupt frames dropped
    assert(slow.map(_.getString(0)) == Seq("FS_EVENT", "GC_EVENT", "UNKNOWN_424242"))
  }

  test("fast decode preserves header/body payloads") {
    val r = FrameSource.decodeFramesFast(raw).where(col("kafka_offset") === 10L)
      .select("header", "body").collect().head
    assert(r.getAs[Array[Byte]]("header").toSeq == Seq[Byte](1, 2))
    assert(r.getAs[Array[Byte]]("body").toSeq == Seq[Byte](3, 4, 5))
  }

  test("acceptedTypes filters on the marker before type mapping") {
    val out = FrameSource.decodeFramesFast(raw, acceptedTypes = Seq("GC_EVENT"))
    assert(out.select("event_type").as[String].collect().toSeq == Seq("GC_EVENT"))
  }

  test("timestamp column restores event-time millis") {
    val ts = FrameSource.decodeFramesFast(raw).where(col("kafka_offset") === 10L)
      .select(unix_millis(col("timestamp"))).as[Long].head()
    assert(ts == 1700000000001L)
  }
}
