package graft.model

import java.nio.{ByteBuffer, ByteOrder}

/** The event data model: shared header envelope + type-marker registry +
  * wire-frame codec.
  *
  * Wire format (reference: schema/src/main/java/.../protocol/ProtocolMessage.java:27-42,
  * ProtocolConstants.java:10): a 20-byte frame delimiter
  * `int32 typeMarker | int64 timestampMillis | int32 headerLen | int32 bodyLen`
  * followed by header bytes and body bytes. The reference encodes
  * header/body as protobuf; our codec treats them as opaque byte payloads
  * (the engine's typed decode happens relationally, after the marker
  * filter, mirroring the reference's lazy deserialization,
  * GarmadonReader.java:201-238).
  */
object EventModel {

  /** Marker ↔ event-type-name registry
    * (reference: schema/src/main/java/.../serialization/GarmadonSerialization.java:20-41).
    */
  val typeMarkers: Map[Int, String] = Map(
    0 -> "PATH_EVENT",
    1 -> "FS_EVENT",
    3 -> "STATE_EVENT",
    1000 -> "GC_EVENT",
    1001 -> "JVMSTATS_EVENT",
    2000 -> "CONTAINER_MONITORING_EVENT",
    3000 -> "SPARK_STAGE_EVENT",
    3001 -> "SPARK_STAGE_STATE_EVENT",
    3002 -> "SPARK_EXECUTOR_STATE_EVENT",
    3003 -> "SPARK_TASK_EVENT",
    3004 -> "SPARK_EXECUTOR_STORAGE_STATUS_EVENT",
    3005 -> "SPARK_RDD_STORAGE_STATUS_EVENT",
    4000 -> "APPLICATION_EVENT",
    4001 -> "CONTAINER_EVENT",
    5000 -> "FLINK_JOB_MANAGER_EVENT",
    5001 -> "FLINK_JOB_EVENT",
    5002 -> "FLINK_TASK_MANAGER_EVENT",
    5003 -> "FLINK_TASK_EVENT",
    5004 -> "FLINK_OPERATOR_EVENT",
    5005 -> "FLINK_KAFKA_CONSUMER_EVENT")

  val markerForName: Map[String, Int] = typeMarkers.map(_.swap)

  /** Frame delimiter size (4 + 8 + 4 + 4 bytes). */
  val FrameDelimiterSize = 20

  /** Tag vocabulary (reference: schema/.../events/Header.java:30-36). */
  val tags: Seq[String] =
    Seq("YARN_APPLICATION", "FORWARDER", "RESOURCEMANAGER", "NODEMANAGER", "STANDALONE")

  /** Component vocabulary (reference: schema/.../enums/Component.java). */
  val components: Seq[String] = Seq("UNKNOWN", "APP_MASTER", "APP_SLAVE", "EXECUTOR",
    "TASK_MANAGER", "MAP", "REDUCE", "JOB_SETUP", "JOB_CLEANUP", "TASK_CLEANUP")

  /** Framework vocabulary (reference: schema/.../enums/Framework.java). */
  val frameworks: Seq[String] = Seq("YARN", "MAPREDUCE", "SPARK", "APACHE FLINK")

  /** A decoded wire frame: marker + event-time + opaque header/body bytes. */
  final case class Frame(typeMarker: Int, timestampMillis: Long,
                         header: Array[Byte], body: Array[Byte]) {
    def eventType: Option[String] = typeMarkers.get(typeMarker)
    override def equals(o: Any): Boolean = o match {
      case f: Frame => f.typeMarker == typeMarker && f.timestampMillis == timestampMillis &&
        java.util.Arrays.equals(f.header, header) && java.util.Arrays.equals(f.body, body)
      case _ => false
    }
    override def hashCode: Int =
      (typeMarker, timestampMillis, java.util.Arrays.hashCode(header),
        java.util.Arrays.hashCode(body)).hashCode
  }

  /** Encode a frame to its wire bytes. */
  def encode(f: Frame): Array[Byte] = {
    val buf = ByteBuffer.allocate(FrameDelimiterSize + f.header.length + f.body.length)
      .order(ByteOrder.BIG_ENDIAN)
    buf.putInt(f.typeMarker)
    buf.putLong(f.timestampMillis)
    buf.putInt(f.header.length)
    buf.putInt(f.body.length)
    buf.put(f.header)
    buf.put(f.body)
    buf.array()
  }

  /** Decode wire bytes; `None` for corrupt frames (bad lengths) — the
    * reference counts and drops these rather than failing the stream
    * (reference: GarmadonReader.java:169-192); our relational equivalent is
    * decode-to-null + `filter(isNotNull)` (PERMISSIVE-mode semantics).
    */
  def decode(bytes: Array[Byte]): Option[Frame] = {
    if (bytes == null || bytes.length < FrameDelimiterSize) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val marker = buf.getInt
    val ts = buf.getLong
    val headerLen = buf.getInt
    val bodyLen = buf.getInt
    if (headerLen < 0 || bodyLen < 0 ||
        bytes.length != FrameDelimiterSize + headerLen + bodyLen) return None
    val header = new Array[Byte](headerLen)
    val body = new Array[Byte](bodyLen)
    buf.get(header); buf.get(body)
    Some(Frame(marker, ts, header, body))
  }

  /** The shared header (reference: schema/src/main/protobuf/event_header.proto:8-25). */
  final case class Header(
      applicationId: String = "",
      attemptId: String = "",
      applicationName: String = "",
      username: String = "",
      containerId: String = "",
      hostname: String = "",
      pid: String = "",
      framework: String = "",
      component: String = "",
      executorId: String = "",
      tags: Seq[String] = Nil,
      id: String = "",
      mainClass: String = "",
      javaVersion: String = "",
      javaFeature: Int = 0,
      frameworkVersion: String = "")
}
