package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{AviMjpeg, JdkMedia, Multimodal}
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
import graft.sources.Tables

/** MJPEG-in-AVI: RIFF demux + real JDK JPEG frame decode. The fixture
  * writer emits the published byte layout; the demux/decode chain must
  * recover the exact frame count, dims, timing and (bucket-quantized —
  * JPEG is lossy, see [[AviMjpeg.solidJpeg]]) colors.
  */
class AviMjpegSpec extends SparkSpecBase {
  import spark.implicits._

  private def bucket(mean: Double): Long = math.floor(mean / 16.0).toLong

  test("writer→demux roundtrip recovers frame count, dims, duration and bucketed colors") {
    (0L until 120L).foreach { id =>
      val w = ((id % 3).toInt + 2) * 16
      val h = ((id % 2).toInt + 2) * 16
      val n = (id % 3).toInt + 1
      val usPerFrame = ((id % 4) + 1L) * 20000L
      val frames = (0 until n).map { f =>
        AviMjpeg.solidJpeg(w, h,
          (((id + 17L * f) % 14L) * 16L + 8L).toInt,
          (((id * 7L + 29L * f) % 14L) * 16L + 8L).toInt,
          (((id * 31L + 41L * f) % 14L) * 16L + 8L).toInt)
      }
      val avi = AviMjpeg.mjpegAvi(frames, w, h, usPerFrame)
      assert(AviMjpeg.probe(avi).contains((n * usPerFrame / 1000L, n.toLong, w, h)),
        s"probe mismatch for id=$id")
      val out = AviMjpeg.decodeAviFrames(id, avi)
      assert(out.length == n && out.forall(_.ok), s"decode failed for id=$id")
      out.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.frame == f && fr.width == w && fr.height == h)
        assert(bucket(fr.mean_r) == (id + 17L * f) % 14L, s"r drift id=$id f=$f mean=${fr.mean_r}")
        assert(bucket(fr.mean_g) == (id * 7L + 29L * f) % 14L, s"g drift id=$id f=$f")
        assert(bucket(fr.mean_b) == (id * 31L + 41L * f) % 14L, s"b drift id=$id f=$f")
      }
    }
  }

  test("frameStride skips frames but keeps container indices") {
    val frames = (0 until 5).map(f => AviMjpeg.solidJpeg(32, 32, f * 40 + 8, 8, 8))
    val avi = AviMjpeg.mjpegAvi(frames, 32, 32, 40000L)
    val sampled = AviMjpeg.decodeAviFrames(7L, avi, frameStride = 2)
    assert(sampled.map(_.frame) == Seq(0, 2, 4))
    assert(sampled.forall(_.ok))
    // stride 1 is the identity
    assert(AviMjpeg.decodeAviFrames(7L, avi).length == 5)
  }

  test("corrupt, truncated and hostile containers fail soft — never throw") {
    assert(AviMjpeg.probe(null).isEmpty && AviMjpeg.probe(Array.emptyByteArray).isEmpty)
    val nullOut = AviMjpeg.decodeAviFrames(1L, null)
    assert(nullOut.length == 1 && !nullOut.head.ok && nullOut.head.frame == 0)
    val avi = AviMjpeg.mjpegAvi(Seq(AviMjpeg.solidJpeg(32, 32, 100, 100, 100)), 32, 32, 40000L)
    // every truncation point parses soft
    (0 until avi.length by 7).foreach { cut =>
      AviMjpeg.probe(avi.take(cut))
      AviMjpeg.decodeAviFrames(1L, avi.take(cut))
    }
    // random fuzz: bit flips anywhere in the container must not throw
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val mutated = avi.clone()
      (0 until 5).foreach(_ => mutated(rnd.nextInt(mutated.length)) = rnd.nextInt().toByte)
      AviMjpeg.probe(mutated)
      AviMjpeg.decodeAviFrames(1L, mutated)
    }
    // a frame chunk holding garbage JPEG bytes flags THAT frame only
    val twoFrames = AviMjpeg.mjpegAvi(
      Seq(AviMjpeg.solidJpeg(32, 32, 100, 100, 100), Array.fill[Byte](64)(0x5a)),
      32, 32, 40000L)
    val out = AviMjpeg.decodeAviFrames(2L, twoFrames)
    assert(out.map(_.ok) == Seq(true, false))
    // a hostile chunk size claiming past EOF fails the parse, not the task
    val evil = avi.clone()
    evil(4) = 0xff.toByte; evil(5) = 0xff.toByte // riff size absurdly large is tolerated (clamped)
    AviMjpeg.probe(evil)
  }

  test("frames nested in 'rec ' LISTs are found (interleaved-capture layout)") {
    // hand-wrap the movi payload of a normal file inside a rec LIST by
    // rebuilding: RIFF(AVI ){hdrl, movi{LIST(rec ){00dc}}}
    val jpeg = AviMjpeg.solidJpeg(32, 32, 100, 150, 200)
    val normal = AviMjpeg.mjpegAvi(Seq(jpeg), 32, 32, 40000L)
    // locate the movi LIST and splice its children into a rec LIST
    val s = new String(normal, "ISO-8859-1")
    val moviAt = s.indexOf("movi")
    assert(moviAt > 0)
    val moviChildren = java.util.Arrays.copyOfRange(normal, moviAt + 4, normal.length)
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val rec = "LIST".getBytes("ISO-8859-1") ++ le(4 + moviChildren.length) ++
      "rec ".getBytes("ISO-8859-1") ++ moviChildren
    val movi = "LIST".getBytes("ISO-8859-1") ++ le(4 + rec.length) ++
      "movi".getBytes("ISO-8859-1") ++ rec
    val headerPart = java.util.Arrays.copyOfRange(normal, 12, moviAt - 8)
    val body = "AVI ".getBytes("ISO-8859-1") ++ headerPart ++ movi
    val wrapped = "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
    val out = AviMjpeg.decodeAviFrames(3L, wrapped)
    assert(out.length == 1 && out.head.ok && out.head.width == 32)
  }

  test("decodeVideoFrames is partition-parallel and partitioning-invariant") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 60)
    val media = AviMjpeg.aviMediaFromDocs(docs)
    val a = AviMjpeg.decodeVideoFrames(media).orderBy("media_id", "frame").collect()
    val b = AviMjpeg.decodeVideoFrames(media.repartition(7), frameStride = 1)
      .orderBy("media_id", "frame").collect()
    assert(a.length == b.length && a.nonEmpty)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.frame == y.frame && x.mean_r == y.mean_r })
    // row count = sum of (id % 3) + 1 over the ids
    assert(a.length == (0L until 60L).map(id => (id % 3) + 1).sum)
  }

  test("probeVideos routes AVI metadata through the shared VideoMeta schema") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 40)
    val metas = AviMjpeg.probeVideos(AviMjpeg.aviMediaFromDocs(docs))
      .collect().map(m => m.media_id -> m).toMap
    (0L until 40L).foreach { id =>
      val m = metas(id)
      val n = (id % 3) + 1
      val usPerFrame = ((id % 4) + 1L) * 20000L
      assert(m.ok && m.duration_ms == n * usPerFrame / 1000L && m.n_tracks == 1)
      assert(m.width == ((id % 3) + 2) * 16 && m.height == ((id % 2) + 2) * 16)
    }
    // garbage rows come back ok = false through the same schema
    val bad = Seq(MediaRow(99L, Array.fill[Byte](40)(7), MediaMeta("avi", 0, 0, 0L))).toDS()
    assert(!AviMjpeg.probeVideos(bad).collect().head.ok)
  }

  test("videoNearDups pairs exactly the same-tone-group videos") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 48)
    val pairs = AviMjpeg.videoNearDups(
        AviMjpeg.aviToneMediaFromDocs(docs), meanTol = 8.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 48L; b <- (a + 1) until 48L; if a % 8 == b % 8
    } yield (a, b)).toSet
    assert(pairs == expected)
  }

  test("DIB frames: bottom-up/top-down orientation, compression gate, short payload") {
    // two-tone 4x2 frame: TOP image row red, BOTTOM blue. Bottom-up DIB
    // stores the bottom row FIRST, so payload row 0 is blue.
    val w = 4; val h = 2; val stride = 12
    val payload = new Array[Byte](stride * h)
    (0 until w).foreach { x => payload(x * 3) = 0xFF.toByte }              // stored row 0: blue
    (0 until w).foreach { x => payload(stride + x * 3 + 2) = 0xFF.toByte } // stored row 1: red
    val avi = AviMjpeg.dibAvi(Seq(payload), w, h, 40000L)
    val fr = AviMjpeg.decodeAviFrames(1L, avi)
    assert(fr.length == 1 && fr.head.ok && fr.head.width == w && fr.head.height == h)
    // BT.601 integer luma: red = (77*255)>>8 = 76, blue = (29*255)>>8 = 28
    assert(fr.head.luma_grid(0) == 76.0f, "top-left grid cell must be the RED row")
    assert(fr.head.mean_r == 127.5 && fr.head.mean_b == 127.5 && fr.head.mean_g == 0.0)

    // negative biHeight = TOP-DOWN rows: patch strf's biHeight to -2 —
    // now stored row 0 IS the top row, so the top-left cell is blue
    def indexOfStrf(b: Array[Byte]): Int =
      b.indices.find(i => i + 4 <= b.length &&
        new String(b, i, 4, "ISO-8859-1") == "strf").get
    val topDown = avi.clone()
    val hOff = indexOfStrf(topDown) + 8 + 8 // strf payload + biHeight offset
    topDown(hOff) = 0xFE.toByte; topDown(hOff + 1) = 0xFF.toByte
    topDown(hOff + 2) = 0xFF.toByte; topDown(hOff + 3) = 0xFF.toByte
    val fd = AviMjpeg.decodeAviFrames(1L, topDown)
    assert(fd.head.ok && fd.head.luma_grid(0) == 28.0f,
      "negative biHeight flips row order: top-left cell must be the BLUE row")

    // non-zero biCompression on a ##db stream: flagged, never guessed at
    val rle = avi.clone()
    val cOff = indexOfStrf(rle) + 8 + 16 // biCompression offset
    rle(cOff) = 1 // BI_RLE8
    assert(AviMjpeg.decodeAviFrames(1L, rle).forall(!_.ok))

    // a frame payload shorter than stride x height: flagged, not crashed
    val shortAvi = AviMjpeg.dibAvi(Seq(payload.dropRight(1)), w, h, 40000L)
    assert(AviMjpeg.decodeAviFrames(1L, shortAvi).forall(!_.ok))
  }

  test("RLE8 frames: runs, absolute mode, delta skips, alignment, malformed flags") {
    val pal = Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF) // red green blue white
    // 4x2, bottom-up: bottom row = run(2, red) + run(1, green) +
    // run(1, blue); EOL; top row = delta(2,0) → 2 BLACK, run(2, white);
    // EOB. (Absolute mode needs >= 3 pixels — 0-2 are escapes — so the
    // 3-pixel absolute case lives in payload2 below.)
    val payload = Array[Byte](
      2, 0,
      1, 1, 1, 2,
      0, 0,
      0, 2, 2, 0,
      2, 3,
      0, 1)
    val avi = AviMjpeg.dib8Avi(Seq(payload), 4, 2, 40000L, pal, rle = true)
    val fr = AviMjpeg.decodeAviFrames(1L, avi)
    assert(fr.length == 1 && fr.head.ok && fr.head.width == 4 && fr.head.height == 2)
    assert(fr.head.mean_r == 127.5 && fr.head.mean_g == 95.625 &&
      fr.head.mean_b == 95.625)
    // orientation: TOP row is the delta-skipped black + white half
    assert(fr.head.luma_grid(0) == 0.0f && fr.head.luma_grid(3) == 255.0f)

    // absolute mode with ODD count pays a pad byte (word alignment)
    val payload2 = Array[Byte](0, 3, 0, 1, 2, 0 /* pad */, 2, 3, 0, 1)
    val avi2 = AviMjpeg.dib8Avi(Seq(payload2), 5, 1, 40000L, pal, rle = true)
    val f2 = AviMjpeg.decodeAviFrames(1L, avi2).head
    assert(f2.ok && f2.mean_r == 153.0 && f2.mean_g == 153.0 && f2.mean_b == 153.0)

    // malformed: run past the row width / palette-index overflow / RLE
    // with top-down biHeight — each flags, never throws
    Seq(
      Array[Byte](9, 0, 0, 1),    // 9 pixels into a 4-wide row
      Array[Byte](2, 9, 0, 1),    // index 9 past the 4-entry palette
      Array[Byte](2, 0)           // runs off without an EOB
    ).foreach { bad =>
      val b = AviMjpeg.dib8Avi(Seq(bad), 4, 2, 40000L, pal, rle = true)
      assert(AviMjpeg.decodeAviFrames(1L, b).forall(!_.ok), bad.mkString(","))
    }

    // uncompressed 8-bit flavor: solid index rows round-trip exactly
    val solid = AviMjpeg.dib8Avi(
      (0 until 2).map(f => AviMjpeg.dib8Frame(5, 3, f)), 5, 3, 40000L, pal, rle = false)
    val sf = AviMjpeg.decodeAviFrames(1L, solid)
    assert(sf.map(_.ok) == Seq(true, true))
    assert(sf(0).mean_r == 255.0 && sf(0).mean_g == 0.0) // palette[0] red
    assert(sf(1).mean_g == 255.0 && sf(1).mean_r == 0.0) // palette[1] green
  }

  test("videoNearDups pairs the SAME content across container flavors (MJPEG vs DIB)") {
    // one gray tone carried by a lossy MJPEG container and a lossless DIB
    // container: decoded means differ by <= 3 (JPEG wobble), the shared
    // banded-grid core must pair them; a far tone must not pair
    val v = 120 // equal channels => BT.601 luma == v
    val rows = Seq(
      MediaRow(1L, AviMjpeg.mjpegAvi(
        (0 until 2).map(_ => AviMjpeg.solidJpeg(32, 32, v, v, v)), 32, 32, 40000L),
        MediaMeta("avi", 32, 32, 80L)),
      MediaRow(2L, AviMjpeg.dibAvi(
        (0 until 3).map(_ => AviMjpeg.dibFrame(16, 8, v, v, v)), 16, 8, 40000L),
        MediaMeta("avi", 16, 8, 120L)),
      MediaRow(3L, AviMjpeg.dibAvi(
        Seq(AviMjpeg.dibFrame(16, 8, v + 60, v + 60, v + 60)), 16, 8, 40000L),
        MediaMeta("avi", 16, 8, 40L))).toDS()
    val pairs = AviMjpeg.videoNearDups(rows, meanTol = 8.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"cross-flavor same-tone must pair, far tone must not: $pairs")
  }

  test("media gate admits AVI by real probe: duration floor applies") {
    val rows = Seq(
      // 3 frames × 40 ms = 120 ms — passes a 100 ms floor
      MediaRow(1L, AviMjpeg.mjpegAvi(
        (0 until 3).map(_ => AviMjpeg.solidJpeg(32, 32, 50, 50, 50)), 32, 32, 40000L),
        MediaMeta("avi", 32, 32, 120L)),
      // 1 frame × 40 ms = 40 ms — fails the floor
      MediaRow(2L, AviMjpeg.mjpegAvi(
        Seq(AviMjpeg.solidJpeg(32, 32, 50, 50, 50)), 32, 32, 40000L),
        MediaMeta("avi", 32, 32, 40L)),
      // garbage claiming to be avi — fails (verify-or-drop)
      MediaRow(3L, Array.fill[Byte](64)(3), MediaMeta("avi", 32, 32, 999L))).toDS()
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val passed = JdkMedia.mediaQualityGate(docs, "doc_id", rows, minVideoMs = 100L)
      .as[Long].collect().toSet
    assert(passed == Set(1L))
  }
}
