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

    /** Direct field-number → index table (hot-loop lookup without boxing;
      * field numbers here are small, max 35).
      */
    @transient private lazy val numberToIdx: Array[Int] = {
      val maxN = fields.map(_.number).max
      val a = Array.fill(maxN + 1)(-1)
      fields.zipWithIndex.foreach { case (f, i) => a(f.number) = i }
      a
    }

    /** Per-row default values, built once and cloned per decode (the boxed
      * zeros / empty strings / empty arrays are immutable and shared).
      */
    @transient private lazy val defaultsTemplate: Array[Any] =
      fields.map(f => defaultOf(f.kind)).toArray

    @transient private lazy val kindArr: Array[PKind] = fields.map(_.kind).toArray

    /** Interned enum-name UTF8Strings per field (no per-row allocation). */
    @transient private lazy val enumUtf8: Array[Array[UTF8String]] =
      fields.map(_.kind match {
        case PEnum(names) => names.map(UTF8String.fromString).toArray
        case _ => null
      }).toArray

    /** Decode one message payload to an InternalRow; null if corrupt. */
    def decode(bytes: Array[Byte]): InternalRow =
      try decodeRange(bytes, 0, bytes.length, new Cursor)
      catch { case NonFatal(_) => null }

    /** Hot loop: one Cursor per row, zero per-field allocations beyond the
      * decoded values themselves.
      */
    private[ProtoWire] def decodeRange(b: Array[Byte], start: Int, end: Int, cur: Cursor): InternalRow = {
      val n = fields.length
      val values = defaultsTemplate.clone()
      var repeated: Array[ArrayBuffer[Any]] = null
      val n2i = numberToIdx
      val kinds = kindArr

      cur.pos = start
      while (cur.pos < end) {
        val key = readVarint(b, cur, end)
        val fieldNumber = (key >>> 3).toInt
        val wireType = (key & 7).toInt
        val idx = if (fieldNumber >= 0 && fieldNumber < n2i.length) n2i(fieldNumber) else -1
        if (idx < 0) {
          skip(b, cur, end, wireType)
        } else {
          kinds(idx) match {
            case PString =>
              val len = readLen(b, cur, end)
              values(idx) = UTF8String.fromBytes(b, cur.pos, len); cur.pos += len
            case PInt32 =>
              values(idx) = readVarint(b, cur, end).toInt
            case PInt64 =>
              values(idx) = readVarint(b, cur, end)
            case PBool =>
              values(idx) = readVarint(b, cur, end) != 0L
            case PFloat =>
              values(idx) = java.lang.Float.intBitsToFloat(readLE32(b, cur.pos, end)); cur.pos += 4
            case PDouble =>
              val d = java.lang.Double.longBitsToDouble(readLE64(b, cur.pos, end)); cur.pos += 8
              // reference ProtoConcatenator.java:100 clamps only DOUBLE
              values(idx) = if (d == Double.NegativeInfinity) -java.lang.Double.MAX_VALUE else d
            case PEnum(names) =>
              val vi = readVarint(b, cur, end).toInt
              val interned = enumUtf8(idx)
              values(idx) =
                if (vi >= 0 && vi < interned.length) interned(vi)
                else UTF8String.fromString(vi.toString)
            case PStringList =>
              val len = readLen(b, cur, end)
              if (repeated == null) repeated = new Array[ArrayBuffer[Any]](n)
              if (repeated(idx) == null) repeated(idx) = new ArrayBuffer[Any]
              repeated(idx) += UTF8String.fromBytes(b, cur.pos, len); cur.pos += len
            case PMessageList(desc) =>
              val len = readLen(b, cur, end)
              if (repeated == null) repeated = new Array[ArrayBuffer[Any]](n)
              if (repeated(idx) == null) repeated(idx) = new ArrayBuffer[Any]
              val innerEnd = cur.pos + len
              val row = desc.decodeRange(b, cur.pos, innerEnd, new Cursor)
              if (row == null) throw new IllegalArgumentException("corrupt embedded message")
              repeated(idx) += row; cur.pos = innerEnd
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

  /** Mutable read position — one per decoded row, so the readers return
    * bare values with no per-field tuple allocation.
    */
  private[ProtoWire] final class Cursor { var pos: Int = 0 }

  /** Read an unsigned LEB128 varint at `cur.pos`, advancing the cursor. */
  private def readVarint(b: Array[Byte], cur: Cursor, end: Int): Long = {
    var result = 0L
    var shift = 0
    var pos = cur.pos
    while (shift < 64) {
      if (pos >= end) throw new IllegalArgumentException("truncated varint")
      val byte = b(pos)
      pos += 1
      result |= (byte & 0x7FL) << shift
      if ((byte & 0x80) == 0) { cur.pos = pos; return result }
      shift += 7
    }
    throw new IllegalArgumentException("varint too long")
  }

  private def readLen(b: Array[Byte], cur: Cursor, end: Int): Int = {
    val len = readVarint(b, cur, end).toInt
    if (len < 0 || cur.pos + len > end) throw new IllegalArgumentException("bad length")
    len
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

  private def skip(b: Array[Byte], cur: Cursor, end: Int, wireType: Int): Unit = wireType match {
    case 0 => readVarint(b, cur, end); ()
    case 1 =>
      if (cur.pos + 8 > end) throw new IllegalArgumentException("truncated"); cur.pos += 8
    case 2 => val len = readLen(b, cur, end); cur.pos += len
    case 5 =>
      if (cur.pos + 4 > end) throw new IllegalArgumentException("truncated"); cur.pos += 4
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
