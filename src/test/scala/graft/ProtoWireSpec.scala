package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.model.{BodySchemas, EventModel, ProtoDescriptors, ProtoWire}
import graft.model.ProtoWire._
import graft.sources.FrameSource

/** Typed protobuf decode (S2 completion): wire-format correctness,
  * ProtoConcatenator flatten semantics (proto3 defaults, enum names,
  * -Inf clamp), and the frames → typed-table pipeline.
  */
class ProtoWireSpec extends SparkSpecBase {
  import spark.implicits._

  test("every descriptor schema matches BodySchemas (names + types)") {
    assert(ProtoDescriptors.header.schema == BodySchemas.headerSchema)
    BodySchemas.byEventType.foreach { case (tpe, schema) =>
      assert(ProtoDescriptors.byEventType(tpe).schema == schema, s"schema mismatch for $tpe")
    }
    assert(ProtoDescriptors.byEventType.keySet == EventModel.typeMarkers.values.toSet)
  }

  test("header roundtrip incl. repeated tags and skipped field number 7") {
    val values = Seq("app_1", "2", "my app", "bob", "container_42", "host-a", "1234",
      "SPARK", "EXECUTOR", "7", Seq("YARN_APPLICATION", "FORWARDER"), "id-9",
      "org.Main", "17.0.2", 17, "3.5")
    val row = ProtoDescriptors.header.decode(ProtoDescriptors.header.encode(values))
    val schema = ProtoDescriptors.header.schema
    assert(row.getString(0) == "app_1")
    assert(row.getString(schema.fieldIndex("pid")) == "1234")
    assert(row.getArray(schema.fieldIndex("tags")).toArray[Any](
      org.apache.spark.sql.types.StringType).map(_.toString).toSeq ==
      Seq("YARN_APPLICATION", "FORWARDER"))
    assert(row.getInt(schema.fieldIndex("java_feature")) == 17)
    assert(row.getString(schema.fieldIndex("framework_version")) == "3.5")
  }

  test("proto3 defaults materialize on empty payloads (includeDefaultValueFields)") {
    val row = ProtoDescriptors.fsEvent.decode(Array.emptyByteArray)
    val s = ProtoDescriptors.fsEvent.schema
    assert(row.getString(s.fieldIndex("src_path")) == "")
    assert(row.getLong(s.fieldIndex("method_duration_millis")) == 0L)
    assert(row.getString(s.fieldIndex("status")) == "UNKNOWN") // enum default = name of 0
    val h = ProtoDescriptors.header.decode(Array.emptyByteArray)
    assert(h.getArray(ProtoDescriptors.header.schema.fieldIndex("tags")).numElements() == 0)
  }

  test("enum decodes to NAME; negative int32 varint roundtrips") {
    val fs = ProtoDescriptors.fsEvent
    val row = fs.decode(fs.encode(Seq("/a", "/b", "RENAME", "hdfs://x", 12345L, "joe", "FAILURE")))
    assert(row.getString(fs.schema.fieldIndex("status")) == "FAILURE")
    val ce = ProtoDescriptors.containerEvent
    val r2 = ce.decode(ce.encode(Seq("DONE", "GUARANTEED", "oom", -104, 5L, 9L, true,
      "host-b", "http://log", 4, 2048)))
    assert(r2.getInt(ce.schema.fieldIndex("exit_status")) == -104)
    assert(r2.getBoolean(ce.schema.fieldIndex("is_finished")))
  }

  test("double fields clamp -Inf to -MaxValue; floats pass through (ProtoConcatenator.java:100)") {
    val ft = ProtoDescriptors.flinkTaskEvent
    val values: Seq[Any] = Seq("j", "n", "t", "tn", "0") ++ Seq.fill(12)(0L) ++
      Seq(Double.NegativeInfinity, 1.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0) ++ Seq("0", 0L, 0L)
    val row = ft.decode(ft.encode(values))
    assert(row.getDouble(ft.schema.fieldIndex("num_bytes_out_per_second")) == -java.lang.Double.MAX_VALUE)
    assert(row.getDouble(ft.schema.fieldIndex("num_bytes_in_local_per_second")) == 1.5)
    val gc = ProtoDescriptors.gcStatisticsData
    val gr = gc.decode(gc.encode(Seq("G1 Old Generation", 250L, "Ergonomics") ++
      Seq.fill(10)(0L) ++ Seq(Float.NegativeInfinity)))
    assert(gr.getFloat(gc.schema.fieldIndex("gc_pause_ratio_1_min")) == Float.NegativeInfinity)
  }

  test("unknown field numbers are skipped (forward compat); corrupt payloads decode to null") {
    // PathEvent bytes plus an unknown field 99 (varint) and 98 (length-delimited)
    val base = ProtoDescriptors.pathEvent.encode(Seq("/p", "READ"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    // field numbers >= 16 need multi-byte varint keys: key(99,0)=792 -> 98 06
    out.write(Array[Byte](0x98.toByte, 0x06, 0x07)) // field 99, varint 7
    out.write(Array[Byte](0x92.toByte, 0x06, 0x02, 0x61, 0x62)) // field 98 len-delim, "ab"
    val row = ProtoDescriptors.pathEvent.decode(out.toByteArray)
    assert(row.getString(0) == "/p" && row.getString(1) == "READ")
    assert(ProtoDescriptors.pathEvent.decode(Array[Byte](0x0A, 0x7F)) == null) // truncated string
  }

  test("JVMSTATS nested sections roundtrip into the pivot-ready shape") {
    val sections: Seq[Any] = Seq(
      Seq("heap", Seq(Seq("used", "1024"), Seq("max", "4096"))),
      Seq("threads", Seq(Seq("count", "33"))))
    val bytes = ProtoDescriptors.jvmStatisticsData.encode(Seq(sections))
    val row = ProtoDescriptors.jvmStatisticsData.decode(bytes)
    val arr = row.getArray(0)
    assert(arr.numElements() == 2)
    val heap = arr.getStruct(0, 2)
    assert(heap.getString(0) == "heap")
    assert(heap.getArray(1).numElements() == 2)
    assert(heap.getArray(1).getStruct(1, 2).getString(1) == "4096")
  }

  test("all 20 body descriptors roundtrip non-default values") {
    ProtoDescriptors.byEventType.foreach { case (tpe, desc) =>
      val values: Seq[Any] = desc.fields.zipWithIndex.map { case (f, i) =>
        f.kind match {
          case PString => s"v$i"
          case PInt32 => i + 1
          case PInt64 => (i + 1).toLong * 1000L
          case PBool => true
          case PFloat => (i + 1).toFloat / 2
          case PDouble => (i + 1).toDouble / 4
          case PEnum(names) => names.last
          case PStringList => Seq(s"a$i", s"b$i")
          case PMessageList(_) => Seq.empty[Seq[Any]]
        }
      }
      val row = desc.decode(desc.encode(values))
      assert(row != null, s"decode failed for $tpe")
      desc.fields.zipWithIndex.foreach { case (f, i) =>
        val got = f.kind match {
          case PString | PEnum(_) => row.getString(i)
          case PInt32 => row.getInt(i)
          case PInt64 => row.getLong(i)
          case PBool => row.getBoolean(i)
          case PFloat => row.getFloat(i)
          case PDouble => row.getDouble(i)
          case PStringList => row.getArray(i).toArray[Any](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq
          case PMessageList(_) => Seq.empty[Seq[Any]]
        }
        assert(got == values(i), s"$tpe.${f.name}: $got != ${values(i)}")
      }
    }
  }

  test("typedTable: frames decode into the flattened per-type table (schema = fullSchema)") {
    val header = ProtoDescriptors.header.encode(Seq(
      "app_7", "1", "pipeline", "alice", "container_3", "host-z", "99",
      "YARN", "EXECUTOR", "", Seq("YARN_APPLICATION"), "", "", "", 0, ""))
    val fsBody = ProtoDescriptors.fsEvent.encode(Seq(
      "/tmp/in", "/tmp/out", "RENAME", "hdfs://root", 77L, "alice", "SUCCESS"))
    val gcBody = ProtoDescriptors.gcStatisticsData.encode(
      Seq("G1 Young Generation", 12L, "Allocation Failure") ++ Seq.fill(10)(0L) ++ Seq(0.0f))
    val raw = Seq(
      EventModel.encode(EventModel.Frame(1, 1700000000001L, header, fsBody)) -> 1L,
      EventModel.encode(EventModel.Frame(1000, 1700000000002L, header, gcBody)) -> 2L,
      EventModel.encode(EventModel.Frame(1, 1700000000003L, header, Array[Byte](0x0A, 0x7F))) -> 3L // corrupt body
    ).toDF("value", "offset")
    val frames = FrameSource.decodeFramesFast(raw)

    val fs = FrameSource.typedTable(frames, "FS_EVENT")
    // compare names+types (nullability of kafka_offset differs by source)
    assert(fs.schema.map(f => (f.name, f.dataType)) ==
      BodySchemas.fullSchema("FS_EVENT").map(f => (f.name, f.dataType)))
    val fsRows = fs.collect()
    assert(fsRows.length == 1) // corrupt body dropped
    val r = fsRows.head
    assert(r.getAs[String]("application_id") == "app_7")
    assert(r.getAs[String]("action") == "RENAME")
    assert(r.getAs[Long]("method_duration_millis") == 77L)
    assert(r.getAs[String]("status") == "SUCCESS")
    assert(r.getAs[Long]("kafka_offset") == 1L)

    val gc = FrameSource.typedTable(frames, "GC_EVENT")
    val g = gc.collect().head
    assert(g.getAs[String]("collector_name") == "G1 Young Generation")
    assert(g.getAs[Long]("pause_time") == 12L)
    assert(g.getAs[String]("cause") == "Allocation Failure")
  }

  test("typedTable feeds the heuristics layer directly") {
    val header = ProtoDescriptors.header.encode(Seq(
      "app_9", "1", "p", "u", "c_1", "h", "", "YARN", "EXECUTOR", "",
      Seq("YARN_APPLICATION"), "", "", "", 0, ""))
    def gcFrame(cause: String, off: Long): (Array[Byte], Long) =
      EventModel.encode(EventModel.Frame(1000, 1700000000000L + off,
        header, ProtoDescriptors.gcStatisticsData.encode(
          Seq("PS Scavenge", 5L, cause) ++ Seq.fill(10)(0L) ++ Seq(0.0f)))) -> off
    val raw = Seq(gcFrame("Ergonomics", 1), gcFrame("Allocation Failure", 2),
      gcFrame("Metadata GC Threshold", 3)).toDF("value", "offset")
    val typed = FrameSource.typedTable(FrameSource.decodeFramesFast(raw), "GC_EVENT")
    val out = graft.heuristics.HeuristicAggs.gcCause(
      typed.withColumnRenamed("attempt_id", "attempt_id")).collect()
    assert(out.length == 1 && out.head.getAs[Long]("flagged_gc") == 2L)
  }
}
