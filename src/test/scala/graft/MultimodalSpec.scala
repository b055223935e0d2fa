package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
import graft.sources.Tables

/** Multimodal plumbing: schema, partition-parallel decode, corrupt rows,
  * batch shape. The codec itself is a deterministic stub (no media libs in
  * the container) — these tests pin the Spark-side contract.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val media = Multimodal.fakeMediaFromDocs(spark, Tables.documents(spark, sfDir))

  test("fake media table has the declared schema") {
    assert(media.toDF().schema("content").dataType.typeName == "binary")
    assert(media.toDF().schema("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
  }

  test("extractFeatures is deterministic, partition-parallel, fixed-dim") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media.repartition(7)).orderBy("media_id").collect()
    assert(f1.length == 500 && f1.forall(_.feature.length == Multimodal.FeatureDim))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.byte_entropy_q == b.byte_entropy_q &&
        a.feature.toSeq == b.feature.toSeq })
  }

  test("corrupt (null/empty) blobs produce ok=false rows, not failures") {
    val rows = Seq(
      MediaRow(1L, null, MediaMeta("jpg", 10, 10, 0)),
      MediaRow(2L, Array[Byte](), MediaMeta("jpg", 10, 10, 0)),
      MediaRow(3L, "payload".getBytes, MediaMeta("png", 10, 10, 0))).toDS()
    val out = Multimodal.extractFeatures(rows).orderBy("media_id").collect()
    assert(out.map(_.ok).toSeq == Seq(false, false, true))
  }

  test("resize shrinks metadata and blob proportionally") {
    val out = Multimodal.resize(media, maxDim = 64).collect()
    assert(out.forall(r => r.meta.width <= 64 && r.meta.height <= 64))
  }

  test("sampleFrames emits bounded deterministic frame rows") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_ts_ms", "byte_offset"))
    val perDoc = frames.groupBy("media_id").count().agg(max("count")).as[Long].head()
    assert(perDoc <= 64)
  }

  test("blob pointers: packBlobs externalizes large blobs, resolveBlobs restores them exactly") {
    val dir = java.nio.file.Files.createTempDirectory("packs").toString
    val packed = Multimodal.packBlobs(media, dir, inlineMax = 100)
    packed.cache()
    val rows = packed.collect()
    val (external, inline) = rows.partition(_.ref.isDefined)
    assert(external.nonEmpty && inline.nonEmpty, "threshold must split the fixture both ways")
    assert(external.forall(_.content == null), "externalized rows carry no inline bytes")
    assert(inline.forall(r => r.content == null || r.content.length <= 100))
    // pack files exist, one per writing partition
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("pack-")))
    // metadata predicates run without touching any blob bytes
    val pngs = packed.filter(_.meta.format == "png").count()
    assert(pngs > 0)
    // resolve restores the original bytes byte-for-byte
    val original = media.collect().map(r => r.media_id -> r.content.toSeq).toMap
    val restored = Multimodal.resolveBlobs(packed).collect()
    assert(restored.length == original.size)
    restored.foreach(r => assert(r.content.toSeq == original(r.media_id), s"blob ${r.media_id} differs"))
    packed.unpersist()
  }

  test("sweepOrphanPacks deletes losing-attempt files, preserves referenced packs byte-exact") {
    val dir = java.nio.file.Files.createTempDirectory("packs_sweep").toString
    val ptrTable = s"$dir/pointers"
    // commit the pointer table the way production would (write, read back)
    Multimodal.packBlobs(media, dir, inlineMax = 100).write.parquet(ptrTable)
    import org.apache.spark.sql.Encoders
    val committed = spark.read.parquet(ptrTable).as(
      Encoders.product[graft.multimodal.Multimodal.PackedMediaRow])
    // a losing task attempt's leftover: same partition id, different attempt
    val orphan = java.nio.file.Path.of(dir, "pack-0-99999.bin")
    java.nio.file.Files.write(orphan, Array.fill[Byte](64)(7))
    val swept = Multimodal.sweepOrphanPacks(committed, dir)
    assert(swept.exists(_.endsWith("pack-0-99999.bin")), s"orphan not swept: $swept")
    assert(!java.nio.file.Files.exists(orphan))
    // every committed pointer still resolves byte-exact after the sweep
    val original = media.collect().map(r => r.media_id -> r.content.toSeq).toMap
    val restored = Multimodal.resolveBlobs(committed).collect()
    assert(restored.length == original.size)
    restored.foreach(r => assert(r.content.toSeq == original(r.media_id)))
  }
}
