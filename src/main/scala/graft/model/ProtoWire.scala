package graft.model

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal proto3 wire-format codec for the event bodies.
  *
  * The reference ships generated protobuf classes and flattens them via
  * reflection (reference: readers/common/src/main/java/.../protobuf/
  * ProtoConcatenator.java:81-168); this environment has no protobuf
  * runtime on the classpath, so the engine implements the (public,
  * documented) proto3 wire format directly — varint / fixed32 / fixed64 /
  * length-delimited — against hand-written field descriptors
  * ([[ProtoDescriptors]]). Decoding goes straight to Catalyst
  * `InternalRow`s (UTF8String, GenericArrayData), so a decode is one
  * allocation per row, no intermediate message objects.
  *
  * Semantics mirror `concatToMap(includeDefaultValueFields = true)`:
  *  - proto3 defaults are materialized ("" / 0 / false / enum name 0 /
  *    empty list) — absent fields never yield null columns;
  *  - enums surface as their NAME string
  *    (ProtoConcatenator.java:209-215 getRealFieldValue);
  *  - DOUBLE fields clamp -Inf to -Double.MaxValue
  *    (ProtoConcatenator.java:100) — floats are NOT clamped, matching the
  *    reference's type check;
  *  - unknown field numbers are skipped by wire type (forward compat);
  *  - corrupt payloads decode to null (PERMISSIVE — the caller filters).
  */
object ProtoWire {

  // ------------------------------------------------------- field model

  sealed trait PKind extends Serializable
  case object PString extends PKind
  case object PInt32 extends PKind
  case object PInt64 extends PKind
  case object PBool extends PKind
  case object PFloat extends PKind
  case object PDouble extends PKind
  /** Enum: varint index → NAME string (index 0 is the proto3 default). */
  final case class PEnum(names: IndexedSeq[String]) extends PKind
  case object PStringList extends PKind
  /** Repeated embedded message (JVMSTATS sections). */
  final case class PMessageList(desc: MessageDesc) extends PKind

  final case class FieldDesc(number: Int, name: String, kind: PKind) extends Serializable

  /** A message descriptor: ordered fields (order = column order). */
  final case class MessageDesc(name: String, fields: IndexedSeq[FieldDesc]) extends Serializable {

    /** The Spark schema this descriptor decodes to. */
    lazy val schema: StructType = StructType(fields.map(f => StructField(f.name, dataTypeOf(f.kind))))

    @transient private lazy val byNumber: Map[Int, Int] =
      fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap

    /** Decode one message payload to an InternalRow; null if corrupt. */
    def decode(bytes: Array[Byte]): InternalRow =
      try decodeRange(bytes, 0, bytes.length)
      catch { case NonFatal(_) => null }

    private[ProtoWire] def decodeRange(b: Array[Byte], start: Int, end: Int): InternalRow = {
      val n = fields.length
      val values = new Array[Any](n)
      var i = 0
      while (i < n) { values(i) = defaultOf(fields(i).kind); i += 1 }
      var repeated: Array[ArrayBuffer[Any]] = null

      var pos = start
      while (pos < end) {
        val key = readVarint(b, pos, end)
        pos = key._2
        val fieldNumber = (key._1 >>> 3).toInt
        val wireType = (key._1 & 7).toInt
        byNumber.get(fieldNumber) match {
          case None =>
            pos = skip(b, pos, end, wireType)
          case Some(idx) =>
            fields(idx).kind match {
              case PString =>
                val (len, p) = readLen(b, pos, end); pos = p
                values(idx) = UTF8String.fromBytes(b, pos, len); pos += len
              case PInt32 =>
                val (v, p) = readVarint(b, pos, end); pos = p; values(idx) = v.toInt
              case PInt64 =>
                val (v, p) = readVarint(b, pos, end); pos = p; values(idx) = v
              case PBool =>
                val (v, p) = readVarint(b, pos, end); pos = p; values(idx) = v != 0L
              case PFloat =>
                values(idx) = java.lang.Float.intBitsToFloat(readLE32(b, pos, end)); pos += 4
              case PDouble =>
                val d = java.lang.Double.longBitsToDouble(readLE64(b, pos, end)); pos += 8
                // reference ProtoConcatenator.java:100 clamps only DOUBLE
                values(idx) = if (d == Double.NegativeInfinity) -java.lang.Double.MAX_VALUE else d
              case PEnum(names) =>
                val (v, p) = readVarint(b, pos, end); pos = p
                val vi = v.toInt
                values(idx) = UTF8String.fromString(
                  if (vi >= 0 && vi < names.length) names(vi) else vi.toString)
              case PStringList =>
                val (len, p) = readLen(b, pos, end); pos = p
                if (repeated == null) repeated = new Array[ArrayBuffer[Any]](n)
                if (repeated(idx) == null) repeated(idx) = new ArrayBuffer[Any]
                repeated(idx) += UTF8String.fromBytes(b, pos, len); pos += len
              case PMessageList(desc) =>
                val (len, p) = readLen(b, pos, end); pos = p
                if (repeated == null) repeated = new Array[ArrayBuffer[Any]](n)
                if (repeated(idx) == null) repeated(idx) = new ArrayBuffer[Any]
                val row = desc.decodeRange(b, pos, pos + len)
                if (row == null) throw new IllegalArgumentException("corrupt embedded message")
                repeated(idx) += row; pos += len
            }
        }
      }
      if (repeated != null) {
        var j = 0
        while (j < n) {
          if (repeated(j) != null) values(j) = new GenericArrayData(repeated(j).toArray)
          j += 1
        }
      }
      new GenericInternalRow(values)
    }

    /** Encode Scala-typed values (aligned with `fields`) to wire bytes.
      * Proto3 emission rules: default values (empty string / 0 / false /
      * enum 0 / empty list) are not written. Used by the test fixtures and
      * the wire-roundtrip oracle query; doubles as the agent-side emitter.
      * Accepts String / Int / Long / Boolean / Float / Double /
      * Seq[String] / Seq[Seq[Any]] (embedded messages).
      */
    def encode(values: Seq[Any]): Array[Byte] = {
      require(values.length == fields.length, s"$name expects ${fields.length} values")
      val out = new java.io.ByteArrayOutputStream()
      fields.iterator.zip(values.iterator).foreach { case (f, v) =>
        f.kind match {
          case PString =>
            val s = v.asInstanceOf[String]
            if (s.nonEmpty) writeBytes(out, f.number, s.getBytes("UTF-8"))
          case PInt32 =>
            val x = v match { case i: Int => i.toLong; case l: Long => l }
            if (x != 0L) writeVarintField(out, f.number, x)
          case PInt64 =>
            val x = v match { case i: Int => i.toLong; case l: Long => l }
            if (x != 0L) writeVarintField(out, f.number, x)
          case PBool =>
            if (v.asInstanceOf[Boolean]) writeVarintField(out, f.number, 1L)
          case PFloat =>
            val x = v.asInstanceOf[Float]
            if (x != 0.0f) { writeKey(out, f.number, 5); writeLE32(out, java.lang.Float.floatToIntBits(x)) }
          case PDouble =>
            val x = v.asInstanceOf[Double]
            if (x != 0.0) { writeKey(out, f.number, 1); writeLE64(out, java.lang.Double.doubleToLongBits(x)) }
          case PEnum(names) =>
            val idx = v match {
              case s: String => val i = names.indexOf(s); require(i >= 0, s"unknown enum $s"); i
              case i: Int => i
            }
            if (idx != 0) writeVarintField(out, f.number, idx.toLong)
          case PStringList =>
            v.asInstanceOf[Seq[String]].foreach(s => writeBytes(out, f.number, s.getBytes("UTF-8")))
          case PMessageList(desc) =>
            v.asInstanceOf[Seq[Seq[Any]]].foreach(m => writeBytes(out, f.number, desc.encode(m)))
        }
      }
      out.toByteArray
    }
  }

  def dataTypeOf(k: PKind): DataType = k match {
    case PString => StringType
    case PInt32 => IntegerType
    case PInt64 => LongType
    case PBool => BooleanType
    case PFloat => FloatType
    case PDouble => DoubleType
    case PEnum(_) => StringType
    case PStringList => ArrayType(StringType)
    case PMessageList(desc) => ArrayType(desc.schema)
  }

  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  private def defaultOf(k: PKind): Any = k match {
    case PString => UTF8String.EMPTY_UTF8
    case PInt32 => 0
    case PInt64 => 0L
    case PBool => false
    case PFloat => 0.0f
    case PDouble => 0.0
    case PEnum(names) => UTF8String.fromString(names(0))
    case PStringList | PMessageList(_) => EmptyArray
  }

  // ------------------------------------------------------- wire reading

  /** Read an unsigned LEB128 varint; returns (value, newPos). */
  private def readVarint(b: Array[Byte], start: Int, end: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var pos = start
    while (shift < 64) {
      if (pos >= end) throw new IllegalArgumentException("truncated varint")
      val byte = b(pos)
      pos += 1
      result |= (byte & 0x7FL) << shift
      if ((byte & 0x80) == 0) return (result, pos)
      shift += 7
    }
    throw new IllegalArgumentException("varint too long")
  }

  private def readLen(b: Array[Byte], start: Int, end: Int): (Int, Int) = {
    val (v, p) = readVarint(b, start, end)
    val len = v.toInt
    if (len < 0 || p + len > end) throw new IllegalArgumentException("bad length")
    (len, p)
  }

  private def readLE32(b: Array[Byte], pos: Int, end: Int): Int = {
    if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
    (b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8) | ((b(pos + 2) & 0xFF) << 16) | ((b(pos + 3) & 0xFF) << 24)
  }

  private def readLE64(b: Array[Byte], pos: Int, end: Int): Long = {
    if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
    var r = 0L
    var i = 7
    while (i >= 0) { r = (r << 8) | (b(pos + i) & 0xFFL); i -= 1 }
    r
  }

  private def skip(b: Array[Byte], start: Int, end: Int, wireType: Int): Int = wireType match {
    case 0 => readVarint(b, start, end)._2
    case 1 => if (start + 8 > end) throw new IllegalArgumentException("truncated"); start + 8
    case 2 => val (len, p) = readLen(b, start, end); p + len
    case 5 => if (start + 4 > end) throw new IllegalArgumentException("truncated"); start + 4
    case _ => throw new IllegalArgumentException(s"unsupported wire type $wireType")
  }

  // ------------------------------------------------------- wire writing

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeKey(out: java.io.ByteArrayOutputStream, number: Int, wireType: Int): Unit =
    writeVarint(out, (number.toLong << 3) | wireType)

  private def writeVarintField(out: java.io.ByteArrayOutputStream, number: Int, v: Long): Unit = {
    writeKey(out, number, 0); writeVarint(out, v)
  }

  private def writeBytes(out: java.io.ByteArrayOutputStream, number: Int, bytes: Array[Byte]): Unit = {
    writeKey(out, number, 2); writeVarint(out, bytes.length.toLong); out.write(bytes, 0, bytes.length)
  }

  private def writeLE32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF); out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeLE64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }
}
