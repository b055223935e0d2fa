package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.EventModel
import graft.model.EventModel.Frame

/** Envelope codec: roundtrip + corrupt-frame rejection (the reference's
  * length-validation semantics, GarmadonReader.java:169-192).
  */
class EventModelSpec extends AnyFunSuite {

  test("registry has the 20 reference markers with correct names") {
    assert(EventModel.typeMarkers.size == 20)
    assert(EventModel.typeMarkers(0) == "PATH_EVENT")
    assert(EventModel.typeMarkers(1000) == "GC_EVENT")
    assert(EventModel.typeMarkers(3003) == "SPARK_TASK_EVENT")
    assert(EventModel.typeMarkers(5005) == "FLINK_KAFKA_CONSUMER_EVENT")
    assert(EventModel.markerForName("FS_EVENT") == 1)
  }

  test("encode/decode roundtrip over seeded random frames") {
    val rnd = new scala.util.Random(42)
    val markers = EventModel.typeMarkers.keys.toSeq.sorted
    (1 to 200).foreach { _ =>
      val header = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      val body = Array.fill[Byte](rnd.nextInt(256))(rnd.nextInt().toByte)
      val f = Frame(markers(rnd.nextInt(markers.size)), math.abs(rnd.nextLong()), header, body)
      assert(EventModel.decode(EventModel.encode(f)).contains(f))
    }
  }

  test("corrupt frames decode to None, not exceptions") {
    assert(EventModel.decode(null).isEmpty)
    assert(EventModel.decode(Array[Byte]()).isEmpty)
    assert(EventModel.decode(Array.fill[Byte](10)(1)).isEmpty)
    // valid delimiter but truncated payload
    val good = EventModel.encode(Frame(1, 42L, Array[Byte](1, 2), Array[Byte](3)))
    assert(EventModel.decode(good.dropRight(1)).isEmpty)
    assert(EventModel.decode(good ++ Array[Byte](0)).isEmpty)
  }

  test("negative declared lengths are rejected") {
    val buf = java.nio.ByteBuffer.allocate(20)
    buf.putInt(1); buf.putLong(0L); buf.putInt(-4); buf.putInt(4)
    assert(EventModel.decode(buf.array()).isEmpty)
  }
}
