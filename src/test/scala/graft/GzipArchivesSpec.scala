package graft

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import graft.sources.GzipArchives

/** Multi-member gzip archive ingest: RFC 1952 member walk, CRC/ISIZE
  * verification, corruption quarantine, and interop with the JDK's own
  * (boundary-losing) reader.
  */
class GzipArchivesSpec extends SparkSpecBase {
  import spark.implicits._

  private val records = Seq(
    "the quick brown fox", "", "repeated " * 100, "unicode: héllo wörld ✓",
    "x").map(_.getBytes("UTF-8"))

  test("splitMembers recovers every record and boundary exactly") {
    val archive = GzipArchives.buildArchive(records)
    val (members, clean) = GzipArchives.splitMembers(archive)
    assert(clean)
    assert(members.map(new String(_, "UTF-8")) == records.map(new String(_, "UTF-8")))
  }

  test("interop: the JDK's GZIPInputStream reads the same bytes, fused") {
    val archive = GzipArchives.buildArchive(records)
    val fused = new GZIPInputStream(new ByteArrayInputStream(archive)).readAllBytes()
    assert(fused.toSeq == records.flatten)
    // and our splitter handles members written by GZIPOutputStream too
    val jdkMember = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(records(0)); gz.close()
      bos.toByteArray
    }
    val (m2, c2) = GzipArchives.splitMembers(jdkMember ++ GzipArchives.gzipMember(records(2)))
    assert(c2 && m2.length == 2 && m2(0).toSeq == records(0).toSeq)
  }

  test("optional header fields (FNAME, FEXTRA, FHCRC) are skipped correctly") {
    val base = GzipArchives.gzipMember(records(0))
    def withFlag(flag: Int, inject: Array[Byte]): Array[Byte] = {
      val out = base.clone()
      out(3) = (out(3) | flag).toByte
      out.take(10) ++ inject ++ out.drop(10)
    }
    val fname = withFlag(0x08, "some/file.txt".getBytes("ISO-8859-1") :+ 0.toByte)
    val fextra = withFlag(0x04, Array[Byte](3, 0, 9, 9, 9)) // xlen=3 + payload
    val fhcrc = withFlag(0x02, Array[Byte](0x11, 0x22))
    Seq(fname, fextra, fhcrc).foreach { m =>
      val (members, clean) = GzipArchives.splitMembers(m ++ GzipArchives.gzipMember(records(4)))
      assert(clean && members.length == 2 && members(0).toSeq == records(0).toSeq)
    }
  }

  test("corruption yields the clean prefix and never garbage") {
    val archive = GzipArchives.buildArchive(records)
    // flip a byte inside the THIRD member's deflate payload
    val m0 = GzipArchives.gzipMember(records(0))
    val m1 = GzipArchives.gzipMember(records(1))
    val corrupt = archive.clone()
    val at = m0.length + m1.length + 15
    corrupt(at) = (corrupt(at) ^ 0x55).toByte
    val (members, clean) = GzipArchives.splitMembers(corrupt)
    assert(!clean && members.length <= 2)
    members.zip(records).foreach { case (m, r) => assert(m.toSeq == r.toSeq) }
    // a flipped CRC byte (payload intact) must also fail the member
    val badCrc = archive.clone()
    badCrc(m0.length - 6) = (badCrc(m0.length - 6) ^ 0x01).toByte
    val (mc, cc) = GzipArchives.splitMembers(badCrc)
    assert(!cc && mc.isEmpty)
    // truncations at every offset fail soft
    (0 until archive.length by 11).foreach(cut => GzipArchives.splitMembers(archive.take(cut)))
    // random fuzz never throws
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val z = archive.clone()
      (0 until 4).foreach(_ => z(rnd.nextInt(z.length)) = rnd.nextInt().toByte)
      GzipArchives.splitMembers(z)
    }
    assert(GzipArchives.splitMembers(null)._1.isEmpty)
    assert(GzipArchives.splitMembers(Array.emptyByteArray)._1.isEmpty)
  }

  test("explodeArchives is partition-parallel, ordered, and flags corrupt tails") {
    val archives = Seq(
      (1L, GzipArchives.buildArchive(records)),
      (2L, GzipArchives.buildArchive(records.take(2)) ++ Array.fill[Byte](20)(9)),
      (3L, Array.fill[Byte](8)(1))).toDS()
    val out = GzipArchives.explodeArchives(archives.repartition(3))
      .collect().sortBy(r => (r.archive_id, r.member_idx))
    val a1 = out.filter(_.archive_id == 1L)
    assert(a1.length == records.length && a1.forall(_.ok))
    assert(a1.map(_.member_idx).toSeq == records.indices)
    val a2 = out.filter(_.archive_id == 2L)
    assert(a2.length == 3 && a2.take(2).forall(_.ok) && !a2.last.ok && a2.last.content == null)
    val a3 = out.filter(_.archive_id == 3L)
    assert(a3.length == 1 && !a3.head.ok)
  }

  test("readArchiveDir ingests on-disk archives through the binaryFile source") {
    val dir = graft.sources.BucketedTables.scratchDir("graft_gz_")
    java.nio.file.Files.write(dir.resolve("a.gz"),
      GzipArchives.buildArchive(records))
    java.nio.file.Files.write(dir.resolve("b.gz"),
      GzipArchives.buildArchive(records.take(2)))
    java.nio.file.Files.write(dir.resolve("ignore.txt"), "not an archive".getBytes)
    val out = GzipArchives.readArchiveDir(spark, dir.toString).collect()
    assert(out.forall(_.ok))
    val byFile = out.groupBy(r => new java.io.File(new java.net.URI(r.path).getPath).getName)
    assert(byFile.keySet == Set("a.gz", "b.gz"))
    assert(byFile("a.gz").length == records.length && byFile("b.gz").length == 2)
    assert(byFile("a.gz").sortBy(_.member_idx).map(_.content.toSeq).toSeq ==
      records.map(_.toSeq))
  }

  test("streamArchiveDir: continuous ingest — exactly-once per archive across batches AND restarts") {
    val dir = graft.sources.BucketedTables.scratchDir("graft_gzs_")
    val ckpt = graft.sources.BucketedTables.scratchDir("graft_gzck_")
    val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Boolean)]
    def fileName(p: String) = new java.io.File(new java.net.URI(p).getPath).getName
    def start() = GzipArchives.streamArchiveDir(spark, dir.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[GzipArchives.FileMemberRow], _: Long) =>
        sink.synchronized {
          sink ++= batch.collect().map(r => (fileName(r.path), r.member_idx, r.ok))
        }
        ()
      }
      .start()
    java.nio.file.Files.write(dir.resolve("a.gz"), GzipArchives.buildArchive(records))
    val q1 = start()
    q1.processAllAvailable()
    // a second archive lands while the query runs — next trigger picks it up
    java.nio.file.Files.write(dir.resolve("b.gz"), GzipArchives.buildArchive(records.take(2)))
    q1.processAllAvailable()
    q1.stop()
    assert(sink.count(_._1 == "a.gz") == records.length)
    assert(sink.count(_._1 == "b.gz") == 2)
    // restart from the same checkpoint: old archives are NOT re-split,
    // a post-restart arrival is
    java.nio.file.Files.write(dir.resolve("c.gz"), GzipArchives.buildArchive(records.take(1)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(sink.count(_._1 == "a.gz") == records.length,
      "restart must not re-ingest committed archives")
    assert(sink.count(_._1 == "c.gz") == 1)
    assert(sink.forall(_._3), "all fixture archives are clean")
  }
}
