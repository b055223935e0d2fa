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

  test("REAL image codec: JDK ImageIO decode recovers exact dims/means from PNG; lossy JPEG approximately; corrupt bytes fail soft") {
    import graft.multimodal.JdkMedia
    // solid PNG: lossless → channel means are EXACTLY the fill color
    val png = JdkMedia.solidPng(20, 10, 30, 200, 90)
    val rows = Seq(
      MediaRow(1L, png, MediaMeta("png", 20, 10, 0L)),
      MediaRow(2L, Array.fill[Byte](64)(13), MediaMeta("png", 1, 1, 0L)), // garbage
      MediaRow(3L, null, MediaMeta("png", 1, 1, 0L))).toDS()
    val out = JdkMedia.decodeImages(rows).collect().map(f => f.media_id -> f).toMap
    val f1 = out(1L)
    assert(f1.ok && f1.width == 20 && f1.height == 10)
    assert(f1.mean_r == 30.0 && f1.mean_g == 200.0 && f1.mean_b == 90.0)
    // solid color ⇒ every luma grid cell is the same BT.601 luma
    val expectedLuma = ((77 * 30 + 150 * 200 + 29 * 90) >> 8).toFloat
    assert(f1.luma_grid.length == JdkMedia.GridDim * JdkMedia.GridDim)
    assert(f1.luma_grid.forall(_ == expectedLuma))
    assert(!out(2L).ok && !out(3L).ok, "corrupt/null must fail soft, not kill the task")

    // JPEG through the same chain: lossy, so means land NEAR the fill
    val jimg = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x => jimg.setRGB(x, y, (100 << 16) | (150 << 8) | 50)))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbos)
    val jf = JdkMedia.decodeImage(9L, jbos.toByteArray)
    assert(jf.ok && jf.width == 16 && jf.height == 16)
    assert(math.abs(jf.mean_r - 100) < 12 && math.abs(jf.mean_g - 150) < 12 &&
      math.abs(jf.mean_b - 50) < 12, s"jpeg means drifted: $jf")
  }

  test("REAL image codec: BMP and GIF containers decode through the same chain (JDK-native formats)") {
    import graft.multimodal.JdkMedia
    def encodeAs(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    // BMP is raw RGB (lossless); GIF palettizes, but a single-color image
    // fits any palette exactly — both must round-trip the fill precisely
    val rows = Seq(
      MediaRow(1L, encodeAs("bmp", 12, 5, (60 << 16) | (70 << 8) | 80), MediaMeta("bmp", 12, 5, 0L)),
      MediaRow(2L, encodeAs("gif", 6, 9, (200 << 16) | (10 << 8) | 120), MediaMeta("gif", 6, 9, 0L))).toDS()
    val out = JdkMedia.decodeImages(rows).collect().map(f => f.media_id -> f).toMap
    val bmp = out(1L)
    assert(bmp.ok && bmp.width == 12 && bmp.height == 5)
    assert(bmp.mean_r == 60.0 && bmp.mean_g == 70.0 && bmp.mean_b == 80.0)
    val gif = out(2L)
    assert(gif.ok && gif.width == 6 && gif.height == 9)
    assert(gif.mean_r == 200.0 && gif.mean_g == 10.0 && gif.mean_b == 120.0)
  }

  test("REAL image resize: bilinear downscale to maxDim, verified by re-decoding the emitted PNG") {
    import graft.multimodal.JdkMedia
    val rows = Seq(
      MediaRow(1L, JdkMedia.solidPng(100, 40, 10, 20, 30), MediaMeta("png", 100, 40, 0L)),
      MediaRow(2L, JdkMedia.solidPng(8, 6, 1, 2, 3), MediaMeta("png", 8, 6, 0L)), // within bounds
      MediaRow(3L, Array.fill[Byte](32)(5), MediaMeta("png", 9, 9, 0L))).toDS() // undecodable
    val out = JdkMedia.resizeImages(rows, maxDim = 25).collect().map(r => r.media_id -> r).toMap
    val resized = JdkMedia.decodeImage(1L, out(1L).content)
    assert(resized.ok && resized.width == 25 && resized.height == 10)
    assert(out(1L).meta.width == 25 && out(1L).meta.height == 10)
    // solid color survives bilinear resampling exactly
    assert(resized.mean_r == 10.0 && resized.mean_g == 20.0 && resized.mean_b == 30.0)
    // small image passes through byte-identical; undecodable passes through
    assert(out(2L).content.toSeq == JdkMedia.solidPng(8, 6, 1, 2, 3).toSeq)
    assert(out(3L).content.length == 32 && out(3L).meta.width == 9)
  }

  test("resizeImages corrects meta.format to the re-encoded container (PNG), keeps it on pass-through") {
    import graft.multimodal.JdkMedia
    // a JPEG over maxDim gets re-encoded as PNG — the meta must say so
    val jimg = new java.awt.image.BufferedImage(80, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 40).foreach(y => (0 until 80).foreach(x => jimg.setRGB(x, y, 0x406080)))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbos)
    val rows = Seq(
      MediaRow(1L, jbos.toByteArray, MediaMeta("jpg", 80, 40, 0L)),
      MediaRow(2L, jbos.toByteArray, MediaMeta("jpg", 80, 40, 0L))).toDS()
    val out = JdkMedia.resizeImages(rows, maxDim = 25).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).meta.format == "png" && out(1L).meta.width == 25)
    // bytes-sniff agrees with the stamped format: PNG magic
    assert(out(1L).content.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    // within-bounds pass-through keeps the original bytes AND format
    val small = JdkMedia.resizeImages(rows, maxDim = 100).collect().head
    assert(small.meta.format == "jpg" && small.content.toSeq == jbos.toByteArray.toSeq)
  }

  test("imageNearDups banding: a one-bit aHash flip still pairs (Hamming-tolerant candidates); exact-equality would miss it") {
    import graft.multimodal.JdkMedia
    // 4x4 grayscale images, one pixel per luma-grid cell (gray v has BT.601
    // luma exactly v). 8 cells at 200, 7 at 50, one tuned cell m: the cell
    // bit is m > mean ⟺ m > 130, so m=126 vs m=134 flips EXACTLY one aHash
    // bit while the contents stay near-identical (mean gap 0.5, centered
    // cosine ~0.9997) — the JPEG-wobble scenario the banding exists for
    def img(m: Int): Array[Byte] = {
      val vals = Seq.fill(8)(200) ++ Seq.fill(7)(50) :+ m
      val bi = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      vals.zipWithIndex.foreach { case (v, i) =>
        bi.setRGB(i % 4, i / 4, (v << 16) | (v << 8) | v) }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos); bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, img(126), MediaMeta("png", 4, 4, 0L)),
      MediaRow(2L, img(134), MediaMeta("png", 4, 4, 0L))).toDS()
    val banded = JdkMedia.imageNearDups(rows)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == Set((1L, 2L)), s"one-bit flip must survive banding: $banded")
    // the pre-banding behavior (maxHamming = 0 ⇒ exact bucket equality)
    // cannot see the pair — the recall gap this round closed
    val exact = JdkMedia.imageNearDups(rows, maxHamming = 0)
      .select("id_a", "id_b").collect()
    assert(exact.isEmpty, "exact-hash bucketing should miss the flipped pair")
  }

  test("banding monotonicity: growing maxHamming only ADDS pairs (candidates widen, verify unchanged)") {
    import graft.multimodal.JdkMedia
    // 30 random small images: noise, near-copies (one perturbed pixel) and
    // uniform tones — a mixed population exercising all verify branches
    val rnd = new scala.util.Random(11)
    def noisy(seed: Int): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val bi = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 8).foreach(x => bi.setRGB(x, y, r.nextInt(0xFFFFFF))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos); bos.toByteArray
    }
    val rows = (0 until 30).map { i =>
      val bytes =
        if (i % 3 == 0) JdkMedia.solidPng(6, 6, i * 8 % 251, i * 8 % 251, i * 8 % 251)
        else noisy(i / 2) // pairs of near-identical seeds
      MediaRow(i.toLong, bytes, MediaMeta("png", 8, 8, 0L))
    }.toDS()
    def pairsAt(mh: Int) = JdkMedia.imageNearDups(rows, maxHamming = mh)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p0 = pairsAt(0); val p1 = pairsAt(1); val p2 = pairsAt(2)
    // banding is candidate-only: the verify filter is identical, so a
    // wider Hamming tolerance can only ever ADD pairs, never lose one
    assert(p0.subsetOf(p1), s"mh=0 pairs lost at mh=1: ${p0 -- p1}")
    assert(p1.subsetOf(p2), s"mh=1 pairs lost at mh=2: ${p1 -- p2}")
    assert(p1.nonEmpty, "fixture must pair at the default tolerance")
  }

  test("animated GIF: decodeImageFrames yields one exact feature row per frame; stride sampling; corrupt fails soft") {
    import graft.multimodal.JdkMedia
    val gif = JdkMedia.solidGif(5, 4, Seq((10, 20, 30), (200, 100, 50), (0, 255, 0)))
    val frames = JdkMedia.decodeImageFrames(7L, gif)
    assert(frames.length == 3, s"3-frame GIF must decode to 3 rows: ${frames.length}")
    assert(frames.map(_.frame) == Seq(0, 1, 2))
    assert(frames.forall(f => f.ok && f.width == 5 && f.height == 4))
    // solid frames survive the GIF palette exactly
    assert(frames(0).mean_r == 10.0 && frames(0).mean_g == 20.0 && frames(0).mean_b == 30.0)
    assert(frames(1).mean_r == 200.0 && frames(1).mean_g == 100.0 && frames(1).mean_b == 50.0)
    assert(frames(2).mean_r == 0.0 && frames(2).mean_g == 255.0 && frames(2).mean_b == 0.0)
    // single-frame formats flow through the same path as one row
    val png = JdkMedia.solidPng(6, 6, 1, 2, 3)
    val one = JdkMedia.decodeImageFrames(8L, png)
    assert(one.length == 1 && one.head.ok && one.head.mean_r == 1.0)
    // corrupt → one ok=false row, never a throw
    assert(JdkMedia.decodeImageFrames(9L, Array.fill[Byte](50)(3)).map(_.ok) == Seq(false))
    assert(JdkMedia.decodeImageFrames(10L, null).map(_.ok) == Seq(false))
    // the Spark stage: stride 2 keeps frames 0 and 2
    val ds = Seq(MediaRow(1L, gif, MediaMeta("gif", 5, 4, 300L))).toDS()
    val sampled = JdkMedia.decodeFrames(ds, frameStride = 2).collect()
    assert(sampled.map(_.frame).sorted.toSeq == Seq(0, 2))
  }

  test("imageNearDups: cross-format and resized copies pair; different content and brightness-shifted uniforms don't") {
    import graft.multimodal.JdkMedia
    def pattern(w: Int, h: Int, leftWhite: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val white = if (leftWhite) x < w / 2 else x >= w / 2
        img.setRGB(x, y, if (white) 0xFFFFFF else 0x000000)
      })
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val halfL = pattern(64, 64, leftWhite = true)
    val rows = Seq(
      MediaRow(1L, enc(halfL, "png"), MediaMeta("png", 64, 64, 0L)),
      MediaRow(2L, enc(halfL, "bmp"), MediaMeta("bmp", 64, 64, 0L)), // same pixels, other container
      MediaRow(3L, JdkMedia.resizeImage(enc(halfL, "png"), 32).get._1, MediaMeta("png", 32, 32, 0L)),
      MediaRow(4L, enc(pattern(64, 64, leftWhite = false), "png"), MediaMeta("png", 64, 64, 0L)), // mirrored content
      MediaRow(5L, JdkMedia.solidPng(10, 10, 100, 100, 100), MediaMeta("png", 10, 10, 0L)), // uniform gray
      MediaRow(6L, JdkMedia.solidPng(12, 8, 100, 100, 100), MediaMeta("png", 12, 8, 0L)),   // same gray, other dims
      MediaRow(7L, JdkMedia.solidPng(10, 10, 180, 180, 180), MediaMeta("png", 10, 10, 0L)), // brighter uniform
      MediaRow(8L, Array.fill[Byte](40)(9), MediaMeta("png", 1, 1, 0L))).toDS() // undecodable
    val pairs = JdkMedia.imageNearDups(rows)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the three encodings/sizes of the same picture form one clique
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"cross-format/resize dups not found: $pairs")
    // same-color uniforms pair (the both-uniform acceptance path)
    assert(pairs.contains((5L, 6L)))
    // mirrored content: same mean, opposite aHash — must NOT pair
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // brightness-shifted uniform shares the aHash-0 bucket but fails the
    // mean test — cosine alone would have called it a duplicate
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
    assert(!pairs.exists(p => p._1 == 8L || p._2 == 8L), "undecodable rows must not pair")
  }

  test("codec fuzz: random bytes, truncated containers and header-only prefixes never throw — only ok=false") {
    import graft.multimodal.JdkMedia
    val rnd = new scala.util.Random(42)
    val png = JdkMedia.solidPng(30, 20, 1, 2, 3)
    val wav = JdkMedia.constWav(8000, 500, 1000)
    val blobs: Seq[Array[Byte]] =
      (0 until 150).map(_ => Array.fill(rnd.nextInt(400))(rnd.nextInt().toByte)) ++
        // truncations of REAL containers (magic bytes intact, payload cut):
        // the adversarial case ImageIO/AudioSystem throw on internally
        (1 until 20).map(i => png.take(png.length * i / 20)) ++
        (1 until 20).map(i => wav.take(wav.length * i / 20)) :+
        Array.emptyByteArray :+ null
    blobs.zipWithIndex.foreach { case (b, i) =>
      val img = JdkMedia.decodeImage(i.toLong, b) // must not throw
      assert(img.ok || img.width == 0, s"blob $i: failed decode must zero out")
      JdkMedia.decodeAudio(i.toLong, b) // must not throw
      JdkMedia.resizeImage(b, 16) // must not throw
      JdkMedia.decodeImageFrames(i.toLong, b) // must not throw (frame walker)
      JdkMedia.audioRmsGrid(i.toLong, b) // must not throw (envelope grid)
    }
    // the full-container inputs at 100% truncation (i.e. intact) decode fine
    assert(JdkMedia.decodeImage(0L, png).ok && JdkMedia.decodeAudio(0L, wav).ok)
    assert(JdkMedia.decodeImageFrames(0L, png).head.ok &&
      JdkMedia.audioRmsGrid(0L, wav).nonEmpty)
  }

  test("REAL audio codec: JDK WAV decode recovers rate/frames/duration and exact RMS; corrupt fails soft") {
    import graft.multimodal.JdkMedia
    val wav = JdkMedia.constWav(sampleRate = 8000, nFrames = 4000, amplitude = 16384)
    val rows = Seq(
      MediaRow(1L, wav, MediaMeta("wav", 0, 0, 500L)),
      MediaRow(2L, Array.fill[Byte](100)(42), MediaMeta("wav", 0, 0, 0L))).toDS()
    val out = JdkMedia.decodeAudios(rows).collect().map(f => f.media_id -> f).toMap
    val a = out(1L)
    assert(a.ok && a.sample_rate == 8000 && a.channels == 1 && a.n_frames == 4000)
    assert(a.duration_ms == 500L)
    assert(a.rms == 16384.0 / 32768.0, s"constant-amplitude RMS must be exact: ${a.rms}")
    assert(!out(2L).ok)
  }

  test("audioNearDups: same PCM in WAV vs AIFF pairs; mirrored envelope and level-shifted tones don't; corrupt excluded") {
    import graft.multimodal.JdkMedia
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def container(samples: Array[Short], tpe: AudioFileFormat.Type, big: Boolean): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        val (lo, hi) = ((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
        if (big) { data(2 * i) = hi; data(2 * i + 1) = lo }
        else { data(2 * i) = lo; data(2 * i + 1) = hi }
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, big)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    // stepped envelope: quiet first half, loud second — a non-uniform grid
    val env = Array.tabulate(3200)(i => (if (i < 1600) 2000 else 12000).toShort)
    val rows = Seq(
      MediaRow(1L, container(env, AudioFileFormat.Type.WAVE, big = false), MediaMeta("wav", 0, 0, 400L)),
      MediaRow(2L, container(env, AudioFileFormat.Type.AIFF, big = true), MediaMeta("aiff", 0, 0, 400L)),
      MediaRow(3L, container(env.reverse, AudioFileFormat.Type.WAVE, big = false), MediaMeta("wav", 0, 0, 400L)),
      MediaRow(4L, JdkMedia.constWav(8000, 1000, 1000), MediaMeta("wav", 0, 0, 125L)),
      MediaRow(5L, JdkMedia.constWav(8000, 800, 1050), MediaMeta("wav", 0, 0, 100L)), // gap 50 <= 100
      MediaRow(6L, JdkMedia.constWav(8000, 1000, 5000), MediaMeta("wav", 0, 0, 125L)), // gap 4000
      MediaRow(7L, Array.fill[Byte](64)(1), MediaMeta("wav", 0, 0, 0L))).toDS()
    val pairs = JdkMedia.audioNearDups(rows)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // container-independence: WAV and AIFF of the SAME samples pair
    assert(pairs.contains((1L, 2L)), s"cross-container dup not found: $pairs")
    // close constant tones pair on the RMS test (uniform grids)
    assert(pairs.contains((4L, 5L)))
    // mirrored envelope: same RMS, opposite grid — must NOT pair
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"mirrored envelope paired: $pairs")
    // level-shifted constant fails the RMS gap
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L), "undecodable rows must not pair")
    assert(pairs == Set((1L, 2L), (4L, 5L)), s"unexpected extra pairs: $pairs")
    // the grid itself is container-independent, byte-for-byte
    val gw = JdkMedia.audioRmsGrid(1L, container(env, AudioFileFormat.Type.WAVE, big = false)).get
    val ga = JdkMedia.audioRmsGrid(2L, container(env, AudioFileFormat.Type.AIFF, big = true)).get
    assert(gw.toSeq == ga.toSeq)
  }

  test("MP4 probe: box-tree metadata recovered exactly; 64-bit sizes, truncations and garbage fail soft") {
    import graft.multimodal.Mp4Probe
    val mp4 = Mp4Probe.minimalMp4(durationMs = 12345L, width = 640, height = 360, nTracks = 2)
    assert(Mp4Probe.probe(mp4).contains((12345L, 2, 640, 360)))
    // a size==0 trailing box (extends to EOF) and a 64-bit-size free box
    // ahead of moov must both be walked over correctly
    def u32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val free64 = u32(1L) ++ "free".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 24) ++ Array.fill[Byte](8)(7)
    assert(Mp4Probe.probe(free64 ++ mp4).contains((12345L, 2, 640, 360)))
    val trailing = mp4 ++ (u32(0L) ++ "mdat".getBytes("ISO-8859-1") ++ Array.fill[Byte](5)(1))
    assert(Mp4Probe.probe(trailing).contains((12345L, 2, 640, 360)))
    // audio-only container: tracks but no dimensions
    assert(Mp4Probe.probe(Mp4Probe.minimalMp4(500L, 0, 0, 1)).contains((500L, 1, 0, 0)))
    // fail-soft: truncations at every cut, random bytes, empty, null
    (1 until mp4.length by 7).foreach { cut =>
      Mp4Probe.probe(mp4.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(7)
    (0 until 100).foreach(_ => Mp4Probe.probe(Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte)))
    assert(Mp4Probe.probe(Array.emptyByteArray).isEmpty && Mp4Probe.probe(null).isEmpty)
    // a container whose moov is cut mid-mvhd must NOT half-parse
    val cutMoov = mp4.take(mp4.length - 40)
    assert(Mp4Probe.probe(cutMoov).isEmpty)
    // the Spark stage: ok rows + fail-soft rows through one pass
    val rows = Seq(
      MediaRow(1L, mp4, MediaMeta("mp4", 640, 360, 12345L)),
      MediaRow(2L, Array.fill[Byte](40)(9), MediaMeta("mp4", 0, 0, 0L))).toDS()
    val out = Mp4Probe.probeVideos(rows).collect().map(v => v.media_id -> v).toMap
    assert(out(1L).ok && out(1L).duration_ms == 12345L && out(1L).width == 640)
    assert(!out(2L).ok)
  }

  test("8-bit PCM sign conventions: unsigned WAV and signed AIFF of the same waveform decode identically; non-PCM rejected") {
    import graft.multimodal.JdkMedia
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def write(data: Array[Byte], fmt: AudioFormat, tpe: AudioFileFormat.Type): Array[Byte] = {
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, data.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    // the same ramp waveform, stored per each container's convention:
    // WAV 8-bit is UNSIGNED (sample + 128), AIFF 8-bit is signed
    val signedRamp = Array.tabulate(2000)(i => ((i % 201) - 100).toByte)
    val unsignedRamp = signedRamp.map(b => (b + 128).toByte)
    val wav = write(unsignedRamp, new AudioFormat(8000f, 8, 1, false, false),
      AudioFileFormat.Type.WAVE)
    val aiff = write(signedRamp, new AudioFormat(8000f, 8, 1, true, true),
      AudioFileFormat.Type.AIFF)
    val gw = JdkMedia.audioRmsGrid(1L, wav).get
    val ga = JdkMedia.audioRmsGrid(2L, aiff).get
    assert(gw.toSeq == ga.toSeq, "same waveform must grid identically across containers")
    val dw = JdkMedia.decodeAudio(1L, wav); val da = JdkMedia.decodeAudio(2L, aiff)
    assert(dw.ok && da.ok && dw.rms == da.rms)
    // silence in 8-bit WAV is 0x80 — must decode as ~0 RMS, not full scale
    val silence = write(Array.fill[Byte](800)(0x80.toByte),
      new AudioFormat(8000f, 8, 1, false, false), AudioFileFormat.Type.WAVE)
    assert(JdkMedia.decodeAudio(3L, silence).rms == 0.0)
    // non-PCM (ULAW) containers fail soft instead of decoding garbage
    val ulaw =
      try Some(write(Array.fill[Byte](400)(0x40),
        new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
        AudioFileFormat.Type.WAVE))
      catch { case _: Exception => None } // JDK build without ULAW-WAV write
    ulaw.foreach { u =>
      assert(!JdkMedia.decodeAudio(4L, u).ok)
      assert(JdkMedia.audioRmsGrid(4L, u).isEmpty)
    }
  }

  test("MP4 probe: zero-payload tkhd at end-of-buffer fails soft, never throws") {
    import graft.multimodal.Mp4Probe
    def u32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bx(t: String, p: Array[Byte]) = u32(p.length + 8L) ++ t.getBytes("ISO-8859-1") ++ p
    // moov(mvhd-valid, trak(tkhd with EMPTY payload)) ending exactly at EOF:
    // the version-byte read must be bounds-checked, not trusted
    val mvhd = bx("mvhd", u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(1000L) ++ u32(777L))
    val evil = bx("moov", mvhd ++ bx("trak", bx("tkhd", Array.emptyByteArray)))
    assert(Mp4Probe.probe(evil).isEmpty, "malformed tkhd must fail the probe soft")
  }

  test("mediaQualityGate: byte-sniffed modality floors; stale meta ignored; missing/undecodable media fails") {
    import graft.multimodal.{JdkMedia, Mp4Probe}
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
      .toDF("doc_id", "text")
    val mediaRows = Seq(
      // passes: 10x8 PNG over the min-dim 3 floor
      MediaRow(1L, JdkMedia.solidPng(10, 8, 1, 2, 3), MediaMeta("png", 10, 8, 0L)),
      // fails: 2-pixel-tall image under the floor
      MediaRow(2L, JdkMedia.solidPng(10, 2, 1, 2, 3), MediaMeta("png", 10, 2, 0L)),
      // passes: 500 ms WAV — and its meta LIES ("png"); the sniffer must
      // route it to the audio decoder anyway
      MediaRow(3L, JdkMedia.constWav(8000, 4000, 1000), MediaMeta("png", 0, 0, 500L)),
      // fails: 5 ms WAV under the 30 ms floor
      MediaRow(4L, JdkMedia.constWav(8000, 40, 1000), MediaMeta("wav", 0, 0, 5L)),
      // passes: 4 s MP4 over the 3 s floor
      MediaRow(5L, Mp4Probe.minimalMp4(4000L, 320, 240, 1), MediaMeta("mp4", 320, 240, 4000L))
      // doc 6: NO media row at all — must fail the gate
    ).toDS()
    val kept = JdkMedia.mediaQualityGate(docs, "doc_id", mediaRows,
      minImageDim = 3, minAudioMs = 30L, minVideoMs = 3000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L), s"gate kept: $kept")
    // garbage bytes never pass, never throw
    assert(!JdkMedia.mediaPasses(Array.fill[Byte](64)(9), 1, 0L, 0L))
    assert(!JdkMedia.mediaPasses(null, 1, 0L, 0L))
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

  test("pHash recall: a JPEG re-encode that aHash misses in EVERY band still pairs via the DCT hash") {
    import java.awt.image.BufferedImage
    import graft.multimodal.JdkMedia
    // textured near-mean JPEG blocks: each 8x8 cell IS one JPEG block,
    // its mean sits +-1 from the global mean, and a +-9 checkerboard
    // inside forces non-exact DCT quantization — at quality 0.3 the DC
    // error flips ~6 of 16 aHash bits across all four bands, while the
    // big +-30 structure keeps every pHash bit in place (Hamming 0)
    val deltas = Array(1, -1, 1, -1, 30, -30, 1, -1, -1, 1, -30, 30, -1, 1, -1, 1)
    val im = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = 128 + deltas((y / 8) * 4 + (x / 8)) + 9 * (2 * ((x + y) % 2) - 1)
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def png(i: BufferedImage) = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", bos); bos.toByteArray
    }
    def jpgQ(i: BufferedImage, q: Float) = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(i, null, null), p)
      w.dispose(); ios.close()
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, png(im), Multimodal.MediaMeta("png", 32, 32, 0L)),
      Multimodal.MediaRow(2L, jpgQ(im, 0.3f), Multimodal.MediaMeta("jpg", 32, 32, 0L))).toDS()
    // the pHash itself is re-encode-stable here
    val hashes = JdkMedia.imagePHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(2L)) <= 1,
      s"pHash must survive the re-encode, Hamming ${java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))}")
    // aHash misses even at its widest supported tolerance (3 of 4 bands
    // may differ): the re-encode flips bits in all four bands
    assert(JdkMedia.imageNearDups(media, maxHamming = 3).isEmpty,
      "this fixture must defeat aHash banding — if it pairs, the recall case is stale")
    // ...and the DCT-hash front-end recovers the pair, same verify core
    val pairs = JdkMedia.imageNearDupsPHash(media)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)),
      s"pHash banding must recover the re-encode pair, got $pairs")
  }
}
