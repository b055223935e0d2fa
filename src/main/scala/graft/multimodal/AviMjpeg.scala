package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL video frame decoding — for the video flavors this environment
  * can fully open with zero external libraries: '''Motion-JPEG in an AVI
  * container''' and '''DIB frames in an AVI''' (uncompressed 24-bit BGR,
  * uncompressed 8-bit palettized, and RLE8-compressed 8-bit).
  * An AVI is a RIFF chunk tree (plain little-endian length-prefixed walk,
  * the RIFF sibling of [[Mp4Probe]]'s ISO-BMFF walk); an MJPEG stream's
  * `00dc` chunks are ordinary JPEG images — which `javax.imageio` decodes
  * natively — and a DIB stream's `00db` chunks are byte rows (or RLE runs)
  * needing no codec at all ([[decodeDib]], [[decodeDib8]], [[decodeRle8]],
  * driven by the strf header's format + RGBQUAD palette). Demux by byte
  * arithmetic, decode each frame with its flavor's decoder: real pixels
  * out of a real video container, no stub.
  *
  * This moves the declared stub boundary: [[Multimodal.FakeCodec]] now
  * covers only INTER-FRAME compressed codecs (H.264/VP9/AV1 — the JDK
  * ships no decoder for those and never will in this environment), while
  * container metadata ([[Mp4Probe]], [[AviMjpeg.probe]]) and MJPEG pixels
  * are handled for real.
  *
  * Scale note — frame-stride sampling here SKIPS decode work, unlike the
  * GIF path ([[JdkMedia.decodeFrames]]): MJPEG frames are independent
  * (no delta chain), so a stride-N pass demuxes cheap byte ranges and
  * decodes only every Nth frame — the 100 TB video-sampling shape where
  * the JPEG decode, not the demux, is the cost.
  *
  * Total like every decoder in the package: corrupt/truncated/hostile
  * bytes → `ok = false` rows or `None`, never a task failure; the chunk
  * walker is bounds-checked at every step.
  */
object AviMjpeg {

  /** Parsed container facts + the frame byte ranges (offsets into the
    * original array — demux copies nothing; decode reads the slices).
    * `isDib` per frame: `##db` (uncompressed DIB) vs `##dc` (compressed,
    * MJPEG here). `dibWidth`/`dibHeight`/`dibBitCount`/`dibCompression`
    * are the video stream's `strf` BITMAPINFOHEADER facts the raw-DIB
    * decode needs (biHeight keeps its SIGN: positive = bottom-up rows,
    * negative = top-down).
    */
  private final case class Parsed(
      usPerFrame: Long,
      nStreams: Int,
      width: Int,
      height: Int,
      frames: IndexedSeq[(Int, Int, Boolean)],
      dibWidth: Int = 0,
      dibHeight: Int = 0,
      dibBitCount: Int = 0,
      dibCompression: Long = -1L,
      palette: Array[Int] = Array.emptyIntArray)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Walk the sibling RIFF chunks in [from, to): `visit(fourcc,
    * payloadFrom, payloadTo)` per chunk, payloads padded to even offsets
    * per the RIFF rule. False on any malformed length — a half-parsed
    * container must not masquerade as parsed (same stance as the ISO-BMFF
    * walker).
    */
  private def walkChunks(b: Array[Byte], from: Int, to: Int)
                        (visit: (String, Int, Int) => Boolean): Boolean = {
    var o = from
    while (o < to) {
      if (o + 8 > to) return false
      val size = le32(b, o + 4)
      if (size < 0 || size > Int.MaxValue - 8 || o + 8 + size > to) return false
      if (!visit(fourcc(b, o), o + 8, o + 8 + size.toInt)) return false
      o += 8 + size.toInt + (size.toInt & 1)
    }
    true
  }

  /** Is this chunk id a video-frame chunk (`##dc` compressed / `##db`
    * uncompressed DIB)? The two digits are the stream number.
    */
  private def isFrameChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')

  private def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (bytes == null || bytes.length < 12) return None
    // belt over the bounds-checked walker, like Mp4Probe: fail-soft is
    // absolute, even a walker bug must degrade to None
    try parseChecked(bytes) catch { case _: Exception => None }
  }

  private def parseChecked(bytes: Array[Byte]): Option[Parsed] = {
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    val riffSize = le32(bytes, 4)
    // tolerate a truncated-at-EOF riff size stamp but never overread
    val end = math.min(bytes.length.toLong, 8 + riffSize).toInt
    if (end < 12) return None
    var usPerFrame = -1L
    var nStreams = 0
    var width = 0
    var height = 0
    var dibW = 0; var dibH = 0; var dibBits = 0; var dibComp = -1L
    var palette: Array[Int] = Array.emptyIntArray
    val frames = IndexedSeq.newBuilder[(Int, Int, Boolean)]
    // frames may sit directly in 'movi' or nested inside 'rec ' LISTs
    def collectFrames(from: Int, to: Int): Boolean =
      walkChunks(bytes, from, to) { (id, f, t) =>
        if (isFrameChunk(id)) { frames += ((f, t, id(3) == 'b')); true }
        else if (id == "LIST" && t - f >= 4 && fourcc(bytes, f) == "rec ")
          collectFrames(f + 4, t)
        else true // idx1, JUNK, audio chunks — skip
      }
    val ok = walkChunks(bytes, 12, end) { (id, f, t) =>
      if (id != "LIST" || t - f < 4) true // top-level non-LIST (JUNK, idx1)
      else fourcc(bytes, f) match {
        case "hdrl" =>
          walkChunks(bytes, f + 4, t) { (hid, hf, ht) =>
            if (hid == "avih") {
              // dwMicroSecPerFrame @0, dwStreams @24, dwWidth @32,
              // dwHeight @36 — 56-byte main header
              if (ht - hf < 40) false
              else {
                usPerFrame = le32(bytes, hf)
                nStreams = le32(bytes, hf + 24).toInt
                width = le32(bytes, hf + 32).toInt
                height = le32(bytes, hf + 36).toInt
                true
              }
            } else if (hid == "LIST" && ht - hf >= 4 &&
                fourcc(bytes, hf) == "strl") {
              // the VIDEO stream's strf (BITMAPINFOHEADER) carries the
              // facts a raw `##db` decode needs; keep the FIRST vids
              // stream's header (multi-stream files put audio in its own
              // strl with a WAVEFORMATEX strf — skipped by the flag)
              var isVids = false
              walkChunks(bytes, hf + 4, ht) { (sid, sf, st) =>
                if (sid == "strh" && st - sf >= 4)
                  isVids = fourcc(bytes, sf) == "vids"
                else if (sid == "strf" && isVids && st - sf >= 20 && dibComp < 0) {
                  // biWidth @4, biHeight @8 (SIGNED), biBitCount @14,
                  // biCompression @16
                  dibW = le32(bytes, sf + 4).toInt
                  dibH = le32(bytes, sf + 8).toInt // sign-preserving by cast
                  dibBits = (bytes(sf + 14) & 0xff) | ((bytes(sf + 15) & 0xff) << 8)
                  dibComp = le32(bytes, sf + 16)
                  if (dibBits == 8 && st - sf >= 40) {
                    // 8-bit DIBs carry an RGBQUAD palette (B,G,R,reserved)
                    // right after the 40-byte header: biClrUsed @32
                    // entries, 0 meaning the full 256
                    val clrUsed = le32(bytes, sf + 32).toInt
                    val n = math.min(if (clrUsed <= 0) 256 else clrUsed,
                      (st - sf - 40) / 4)
                    palette = Array.tabulate(math.max(n, 0)) { i =>
                      val o = sf + 40 + i * 4
                      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
                        (bytes(o) & 0xff)
                    }
                  }
                }
                true
              }
            } else true
          }
        case "movi" => collectFrames(f + 4, t)
        case _      => true
      }
    }
    if (!ok || usPerFrame < 0) None
    else Some(Parsed(usPerFrame, nStreams, width, height, frames.result(),
      dibW, dibH, dibBits, dibComp, palette))
  }

  /** Probe one container's metadata — the AVI seat of [[Mp4Probe.probe]]:
    * `Some(duration_ms, n_frames, width, height)` iff the RIFF tree parses
    * and holds an `avih`. Duration = frame count × frame interval (the
    * MJPEG case: one `##dc` chunk per frame).
    */
  def probe(bytes: Array[Byte]): Option[(Long, Long, Int, Int)] =
    parse(bytes).map(p =>
      (p.frames.length.toLong * p.usPerFrame / 1000L, p.frames.length.toLong,
        p.width, p.height))

  /** Decode one raw uncompressed DIB frame (`##db`, `biCompression = 0`,
    * 24-bit BGR) into a BufferedImage — plain byte arithmetic, no codec:
    * rows are 4-byte aligned, stored bottom-up when `biHeight > 0` (the
    * standard) and top-down when negative. LOSSLESS, unlike the JPEG
    * path — decoded channel means equal the written fill exactly, which
    * is what lets `q_video_dib` gate EXACT values with no bucket
    * quantization. None on any size/format mismatch.
    */
  private[multimodal] def decodeDib(b: Array[Byte], from: Int, to: Int,
                                    w: Int, hSigned: Int): Option[java.awt.image.BufferedImage] = {
    if (w <= 0 || hSigned == 0 || w > (1 << 15)) return None
    val h = math.abs(hSigned)
    if (h > (1 << 15)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if ((to - from).toLong < stride.toLong * h) return None
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var yOut = 0
    while (yOut < h) {
      val srcRow = if (hSigned > 0) h - 1 - yOut else yOut
      var o = from + srcRow * stride
      var x = 0
      while (x < w) {
        val bb = b(o) & 0xff; val g = b(o + 1) & 0xff; val r = b(o + 2) & 0xff
        img.setRGB(x, yOut, (r << 16) | (g << 8) | bb)
        x += 1; o += 3
      }
      yOut += 1
    }
    Some(img)
  }

  /** Decode one uncompressed 8-bit PALETTIZED DIB frame: each byte is an
    * index into the strf's RGBQUAD palette, rows 4-byte aligned,
    * bottom-up/top-down by the biHeight sign exactly like the 24-bit
    * flavor. Lossless. None on size/palette mismatch.
    */
  private[multimodal] def decodeDib8(b: Array[Byte], from: Int, to: Int,
                                     w: Int, hSigned: Int,
                                     pal: Array[Int]): Option[java.awt.image.BufferedImage] = {
    if (w <= 0 || hSigned == 0 || w > (1 << 15) || pal.isEmpty) return None
    val h = math.abs(hSigned)
    if (h > (1 << 15)) return None
    val stride = ((w + 3) / 4) * 4
    if ((to - from).toLong < stride.toLong * h) return None
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var yOut = 0
    while (yOut < h) {
      val srcRow = if (hSigned > 0) h - 1 - yOut else yOut
      var o = from + srcRow * stride
      var x = 0
      while (x < w) {
        val idx = b(o) & 0xff
        if (idx >= pal.length) return None // index past the stated palette
        img.setRGB(x, yOut, pal(idx))
        x += 1; o += 1
      }
      yOut += 1
    }
    Some(img)
  }

  /** Decode one RLE8-compressed DIB frame (`biCompression = 1`) — the
    * published run-length encoding: `(count, index)` pairs, with
    * count = 0 escaping to end-of-line (0), end-of-bitmap (1), delta
    * (2: dx, dy follow) or absolute mode (3-255: that many raw indices,
    * word-aligned). Rows are bottom-up (the spec forbids top-down RLE —
    * negative biHeight returns None). Pixels a delta/early-EOL skips stay
    * black — deterministic, matching the common renderer behavior. Still
    * plain byte arithmetic: no entropy coding, no codec. None on any
    * malformed run (the frame flags, the task never fails).
    */
  private[multimodal] def decodeRle8(b: Array[Byte], from: Int, to: Int,
                                     w: Int, hSigned: Int,
                                     pal: Array[Int]): Option[java.awt.image.BufferedImage] = {
    if (w <= 0 || hSigned <= 0 || w > (1 << 15) || hSigned > (1 << 15) ||
      pal.isEmpty) return None
    val h = hSigned
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB) // zero-filled = black
    var x = 0
    var row = 0 // row 0 = BOTTOM image row (bottom-up like every DIB)
    var o = from
    var done = false
    while (!done) {
      if (o + 2 > to) return None // ran off the chunk without an EOB
      val n = b(o) & 0xff; val v = b(o + 1) & 0xff
      o += 2
      if (n > 0) { // encoded run: n copies of palette[v]
        if (v >= pal.length || row >= h || x + n > w) return None
        val rgb = pal(v); val y = h - 1 - row
        var i = 0
        while (i < n) { img.setRGB(x + i, y, rgb); i += 1 }
        x += n
      } else v match {
        case 0 => x = 0; row += 1; if (row > h) return None // end of line
        case 1 => done = true // end of bitmap
        case 2 => // delta: skip (dx, dy) — skipped pixels stay black
          if (o + 2 > to) return None
          x += b(o) & 0xff; row += b(o + 1) & 0xff; o += 2
          if (x > w || row > h) return None
        case cnt => // absolute mode: cnt raw indices, word-aligned
          if (o + cnt > to || row >= h || x + cnt > w) return None
          val y = h - 1 - row
          var i = 0
          while (i < cnt) {
            val idx = b(o + i) & 0xff
            if (idx >= pal.length) return None
            img.setRGB(x + i, y, pal(idx)); i += 1
          }
          x += cnt
          o += cnt + (cnt & 1)
      }
    }
    Some(img)
  }

  /** Decode the frames of one AVI: demux the frame byte ranges, then run
    * every `frameStride`-th one through its decoder — `##dc` chunks
    * through the JDK JPEG codec (MJPEG), `##db` chunks through the raw
    * uncompressed-DIB byte walk ([[decodeDib]], honoring the `strf`
    * header's dims/bit count/compression — only `biCompression = 0` at
    * 24 bpp is raw bytes; anything else is flagged, not guessed at).
    * Unparseable container → one `ok = false` row for frame 0; a frame
    * whose bytes fail mid-stream → that frame flagged, the rest
    * decoded. Frame indices are the CONTAINER indices (stride keeps
    * 0, N, 2N, … so sampled output is self-describing).
    */
  def decodeAviFrames(id: Long, bytes: Array[Byte],
                      frameStride: Int = 1): Seq[JdkMedia.FrameFeatures] = {
    require(frameStride >= 1, s"frameStride must be >= 1 (got $frameStride)")
    def failedFrame(i: Int) = JdkMedia.FrameFeatures(id, i, ok = false, 0, 0,
      0.0, 0.0, 0.0, Array.fill(JdkMedia.GridDim * JdkMedia.GridDim)(0.0f))
    parse(bytes) match {
      case None => Seq(failedFrame(0))
      case Some(p) if p.frames.isEmpty => Seq(failedFrame(0))
      case Some(p) =>
        p.frames.indices.collect {
          case i if i % frameStride == 0 =>
            val (f, t, isDib) = p.frames(i)
            val img =
              if (isDib) {
                (p.dibCompression, p.dibBitCount) match {
                  case (0L, 24) =>
                    decodeDib(bytes, f, t, p.dibWidth, p.dibHeight).orNull
                  case (0L, 8) =>
                    decodeDib8(bytes, f, t, p.dibWidth, p.dibHeight, p.palette).orNull
                  case (1L, 8) =>
                    decodeRle8(bytes, f, t, p.dibWidth, p.dibHeight, p.palette).orNull
                  case _ => null // other DIB flavors: flag, don't guess
                }
              } else {
                try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes, f, t - f))
                catch { case _: Exception => null }
              }
            if (img == null) failedFrame(i)
            else {
              val feat = JdkMedia.featuresOf(id, img)
              JdkMedia.FrameFeatures(id, i, feat.ok, feat.width, feat.height,
                feat.mean_r, feat.mean_g, feat.mean_b, feat.luma_grid)
            }
        }
    }
  }

  // ------------------------------------------------------- Spark stages

  /** Partition-parallel MJPEG AVI frame decode — the REAL video seat of
    * [[JdkMedia.decodeFrames]]. `frameStride` skips JPEG decode work,
    * not just rows (see object scaladoc).
    */
  def decodeVideoFrames(media: Dataset[Multimodal.MediaRow],
                        frameStride: Int = 1): Dataset[JdkMedia.FrameFeatures] = {
    require(frameStride >= 1, s"frameStride must be >= 1 (got $frameStride)")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r =>
      decodeAviFrames(r.media_id, r.content, frameStride)))
  }

  /** Partition-parallel container probe, [[Mp4Probe.probeVideos]]-shaped
    * (`n_tracks` = the avih stream count) so AVI and MP4 corpora route
    * through one metadata schema.
    */
  def probeVideos(media: Dataset[Multimodal.MediaRow]): Dataset[Mp4Probe.VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      parse(r.content) match {
        case Some(p) => Mp4Probe.VideoMeta(r.media_id, ok = true,
          p.frames.length.toLong * p.usPerFrame / 1000L, p.nStreams, p.width, p.height)
        case None => Mp4Probe.VideoMeta(r.media_id, ok = false, 0L, 0, 0, 0)
      }
    })
  }

  /** Cross-container VIDEO near-duplicates over DECODED frames — the video
    * seat of [[JdkMedia.imageNearDups]]/[[JdkMedia.audioNearDups]], through
    * the same banded-grid core: a video's signature is the per-cell MEAN of
    * its frames' luma grids (frame-order invariant, robust to a re-encode
    * that drops or duplicates a frame), candidates from the banded grid
    * aHash, verify by mean gap + centered cosine. `frameStride` bounds the
    * decode cost per video exactly as in [[decodeVideoFrames]]. Videos
    * with zero decodable frames are excluded. Same scale shape as the
    * other modalities: one decode pass, id-only candidate shuffle, capped
    * buckets, no all-pairs stage.
    */
  def videoNearDups(media: Dataset[Multimodal.MediaRow],
                    threshold: Double = 0.98,
                    meanTol: Double = 4.0,
                    maxBucket: Int = 100000,
                    maxHamming: Int = 1,
                    frameStride: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    val cells = JdkMedia.GridDim * JdkMedia.GridDim
    val feats = media
      .mapPartitions(_.flatMap { r =>
        val frames = decodeAviFrames(r.media_id, r.content, frameStride)
          .filter(_.ok)
        if (frames.isEmpty) None
        else {
          val acc = new Array[Double](cells)
          frames.foreach { fr =>
            var i = 0
            while (i < cells) { acc(i) += fr.luma_grid(i); i += 1 }
          }
          Some(JdkMedia.gridFeatureRow(r.media_id, acc.map(_ / frames.length)))
        }
      })
      .toDF("id", "ahash", "mean", "centered", "norm0")
    JdkMedia.bandedCenteredPairs(feats, cells, maxHamming, maxBucket,
      threshold, meanTol)
  }

  // ------------------------------------------------- fixture generators

  /** A solid-color JPEG via the JDK's own encoder. JPEG is LOSSY — a solid
    * fill's decoded channel means wobble by up to ±3 around the fill (DC
    * quantization + YCbCr rounding, measured across the full color range
    * on this codec) — so oracle gates over JPEG fixtures must quantize:
    * fills sit at 16-bucket CENTERS (value ≡ 8 mod 16) and the gate
    * compares `floor(mean / 16)`, leaving 5 levels of margin.
    */
  def solidJpeg(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def u16le(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def u32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(id.getBytes("ISO-8859-1"))
    u32le(out, payload.length.toLong)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0) // RIFF even-pad
    out.toByteArray
  }

  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("ISO-8859-1") ++ payload)

  /** A minimal valid MJPEG AVI: RIFF(AVI ){ LIST hdrl{ avih, LIST strl{
    * strh 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST movi{ 00dc×n } }
    * — the same writer-reader roundtrip discipline as
    * [[Mp4Probe.minimalMp4]] and the proto wire fixtures: the writer emits
    * the published byte layout, demux + decode must recover the exact
    * numbers.
    */
  def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Long): Array[Byte] =
    aviContainer(frames, "00dc", w, h, usPerFrame, handler = "MJPG",
      biCompressionFourcc = Some("MJPG"), biBitCount = 24)

  /** One solid-color 24-bit uncompressed DIB frame payload: bottom-up BGR
    * rows, 4-byte aligned — the raw bytes a `00db` chunk carries.
    */
  def dibFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var o = y * stride
      var x = 0
      while (x < w) {
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1; o += 3
      }
      y += 1
    }
    out
  }

  /** A minimal valid uncompressed-DIB AVI (`00db` frames,
    * `biCompression = 0`, 24 bpp) — the LOSSLESS sibling of [[mjpegAvi]]:
    * no codec anywhere, so decoded channel means equal the written fill
    * exactly and the oracle gate needs no bucket quantization.
    */
  def dibAvi(frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Long): Array[Byte] =
    aviContainer(frames, "00db", w, h, usPerFrame, handler = "DIB ",
      biCompressionFourcc = None, biBitCount = 24)

  /** One solid uncompressed 8-bit palettized DIB frame payload: every
    * byte is `idx`, rows 4-byte aligned.
    */
  def dib8Frame(w: Int, h: Int, idx: Int): Array[Byte] = {
    val stride = ((w + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * stride + x) = idx.toByte; x += 1 }
      y += 1
    }
    out
  }

  /** One solid RLE8 frame payload: per row, runs of up to 255 copies of
    * `idx`, an end-of-line escape after every row but the last, and the
    * end-of-bitmap escape closing the frame.
    */
  def rle8SolidFrame(w: Int, h: Int, idx: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var row = 0
    while (row < h) {
      var rem = w
      while (rem > 0) {
        val n = math.min(rem, 255)
        out.write(n); out.write(idx)
        rem -= n
      }
      row += 1
      if (row < h) { out.write(0); out.write(0) } // EOL
    }
    out.write(0); out.write(1) // EOB
    out.toByteArray
  }

  /** A minimal valid 8-bit palettized AVI — `rle = false` writes
    * uncompressed index rows (`biCompression = 0`), `rle = true` RLE8
    * payloads (`biCompression = 1`); the RGBQUAD palette rides in strf.
    * Both lossless like [[dibAvi]].
    */
  def dib8Avi(frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Long,
              paletteArgb: Array[Int], rle: Boolean): Array[Byte] =
    aviContainer(frames, "00db", w, h, usPerFrame,
      handler = if (rle) "RLE8" else "DIB ", biCompressionFourcc = None,
      biBitCount = 8, biCompressionNum = if (rle) 1L else 0L,
      paletteArgb = paletteArgb)

  private def aviContainer(frames: Seq[Array[Byte]], frameChunkId: String,
                           w: Int, h: Int, usPerFrame: Long, handler: String,
                           biCompressionFourcc: Option[String],
                           biBitCount: Int,
                           biCompressionNum: Long = 0L,
                           paletteArgb: Array[Int] = Array.emptyIntArray): Array[Byte] = {
    require(frames.nonEmpty, "aviContainer needs >= 1 frame")
    val avih = {
      val o = new ByteArrayOutputStream()
      u32le(o, usPerFrame)           // dwMicroSecPerFrame
      u32le(o, 0L); u32le(o, 0L)     // dwMaxBytesPerSec, dwPaddingGranularity
      u32le(o, 0L)                   // dwFlags
      u32le(o, frames.length.toLong) // dwTotalFrames
      u32le(o, 0L)                   // dwInitialFrames
      u32le(o, 1L)                   // dwStreams
      u32le(o, 0L)                   // dwSuggestedBufferSize
      u32le(o, w.toLong); u32le(o, h.toLong)
      (0 until 4).foreach(_ => u32le(o, 0L)) // dwReserved
      chunk("avih", o.toByteArray)
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      o.write("vids".getBytes("ISO-8859-1")) // fccType
      o.write(handler.getBytes("ISO-8859-1")) // fccHandler
      u32le(o, 0L); u16le(o, 0); u16le(o, 0) // dwFlags, wPriority, wLanguage
      u32le(o, 0L)                           // dwInitialFrames
      u32le(o, usPerFrame)                   // dwScale
      u32le(o, 1000000L)                     // dwRate (fps = rate/scale)
      u32le(o, 0L)                           // dwStart
      u32le(o, frames.length.toLong)         // dwLength
      u32le(o, 0L)                           // dwSuggestedBufferSize
      u32le(o, 10000L)                       // dwQuality
      u32le(o, 0L)                           // dwSampleSize
      u16le(o, 0); u16le(o, 0); u16le(o, w); u16le(o, h) // rcFrame
      chunk("strh", o.toByteArray)
    }
    val strf = {
      val o = new ByteArrayOutputStream()
      u32le(o, 40L)                          // biSize
      u32le(o, w.toLong); u32le(o, h.toLong)
      u16le(o, 1); u16le(o, biBitCount)      // biPlanes, biBitCount
      biCompressionFourcc match {            // biCompression: fourcc or numeric
        case Some(cc) => o.write(cc.getBytes("ISO-8859-1"))
        case None     => u32le(o, biCompressionNum)
      }
      u32le(o, w.toLong * h * 3)             // biSizeImage
      u32le(o, 0L); u32le(o, 0L)             // pels-per-meter
      u32le(o, paletteArgb.length.toLong)    // biClrUsed
      u32le(o, 0L)                           // biClrImportant
      paletteArgb.foreach { c =>             // RGBQUAD: B, G, R, reserved
        o.write(c & 0xff); o.write((c >>> 8) & 0xff)
        o.write((c >>> 16) & 0xff); o.write(0)
      }
      chunk("strf", o.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.flatMap(fb => chunk(frameChunkId, fb)).toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"))
    u32le(out, body.length.toLong)
    out.write(body)
    out.toByteArray
  }

  /** Deterministic REAL MJPEG-AVI media table from the documents table —
    * the video analog of [[JdkMedia.gifMediaFromDocs]], with the JPEG
    * lossiness discipline from [[solidJpeg]]: frame count 1-3, dims,
    * frame interval and per-frame bucket-center colors all by modular
    * arithmetic on doc_id, so the oracle recomputes every decoded frame's
    * (width, height, floor(mean/16)) and the header-derived duration.
    */
  def aviMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    Multimodal.fanOutIds(docs).map { id =>
      val w = ((id % 3).toInt + 2) * 16
      val h = ((id % 2).toInt + 2) * 16
      val n = (id % 3).toInt + 1
      val usPerFrame = ((id % 4) + 1L) * 20000L
      val frames = (0 until n).map { f =>
        solidJpeg(w, h,
          (((id + 17L * f) % 14L) * 16L + 8L).toInt,
          (((id * 7L + 29L * f) % 14L) * 16L + 8L).toInt,
          (((id * 31L + 41L * f) % 14L) * 16L + 8L).toInt)
      }
      Multimodal.MediaRow(id, mjpegAvi(frames, w, h, usPerFrame),
        Multimodal.MediaMeta("avi", w, h, n * usPerFrame / 1000L))
    }
  }

  /** Deterministic uncompressed-DIB AVI table — the LOSSLESS video
    * fixture: solid 24-bit `00db` frames with EXACT per-frame colors by
    * modular arithmetic on doc_id (`r = (id + 17f) % 256` etc.), widths
    * 3–8 so the 4-byte DIB row padding is exercised in every residue.
    * Because no codec touches the pixels, the oracle gate
    * (`q_video_dib`) compares decoded channel means EXACTLY — no JPEG
    * wobble, no bucket quantization.
    */
  def aviDibMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (id % 6).toInt + 3
      val h = (id % 4).toInt + 2
      val n = (id % 3).toInt + 1
      val usPerFrame = ((id % 4) + 1L) * 20000L
      val frames = (0 until n).map { f =>
        dibFrame(w, h,
          ((id + 17L * f) % 256L).toInt,
          ((id * 7L + 29L * f) % 256L).toInt,
          ((id * 31L + 41L * f) % 256L).toInt)
      }
      Multimodal.MediaRow(id, dibAvi(frames, w, h, usPerFrame),
        Multimodal.MediaMeta("avi", w, h, n * usPerFrame / 1000L))
    }
  }

  /** Deterministic 8-bit PALETTIZED AVI table — covers BOTH 8-bit DIB
    * flavors in one fixture: even doc_ids write RLE8 (`biCompression=1`),
    * odd ids uncompressed index rows (`biCompression=0`). Per doc a
    * 16-entry palette from id arithmetic (`palette[i] = ((id+11i)%256,
    * (3id+17i)%256, (7id+23i)%256)`), frame f solid at index
    * `(id+f)%16` — every decoded mean is palette arithmetic the oracle
    * replays exactly (lossless, like the 24-bit flavor).
    */
  def aviPal8MediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (id % 6).toInt + 3
      val h = (id % 4).toInt + 2
      val n = (id % 3).toInt + 1
      val usPerFrame = ((id % 4) + 1L) * 20000L
      val pal = Array.tabulate(16) { i =>
        ((((id + 11L * i) % 256L).toInt) << 16) |
          ((((id * 3L + 17L * i) % 256L).toInt) << 8) |
          (((id * 7L + 23L * i) % 256L).toInt)
      }
      val rle = id % 2 == 0
      val frames = (0 until n).map { f =>
        val idx = ((id + f) % 16L).toInt
        if (rle) rle8SolidFrame(w, h, idx) else dib8Frame(w, h, idx)
      }
      Multimodal.MediaRow(id, dib8Avi(frames, w, h, usPerFrame, pal, rle),
        Multimodal.MediaMeta("avi", w, h, n * usPerFrame / 1000L))
    }
  }

  /** Deterministic GRAY-TONE MJPEG-AVI table for the near-dup gate: every
    * frame of video id is the solid gray v = (id % 8) · 28 + 8 (equal
    * channels ⇒ BT.601 luma == v exactly), so two videos are near-dups
    * iff they share id % 8. Tone groups sit 28 apart while JPEG wobble
    * moves a video's decoded mean by ≤ 3 — same-group measured gaps stay
    * ≤ 6, cross-group ≥ 22, so a mean tolerance of 8 separates them with
    * margin on BOTH sides and the pair set is pure id arithmetic.
    */
  def aviToneMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    Multimodal.fanOutIds(docs).map { id =>
      val w = ((id % 3).toInt + 2) * 16
      val h = ((id % 2).toInt + 2) * 16
      val n = (id % 3).toInt + 1
      val v = ((id % 8L) * 28L + 8L).toInt
      val frames = (0 until n).map(_ => solidJpeg(w, h, v, v, v))
      Multimodal.MediaRow(id, mjpegAvi(frames, w, h, 40000L),
        Multimodal.MediaMeta("avi", w, h, n * 40L))
    }
  }
}
