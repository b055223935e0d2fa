package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Dataset

/** REAL MP4/ISO-BMFF container METADATA probing — no decoding, no external
  * libraries: the ISO base-media box grammar (ISO/IEC 14496-12) is a plain
  * length-prefixed tree, walkable with nothing but byte arithmetic. The
  * JDK ships no video DECODER (frame pixels stay behind the documented
  * [[Multimodal.FakeCodec]] stub), but a 100 TB video corpus is filtered,
  * routed and sampled on container metadata long before any frame is
  * decoded — duration gates, resolution floors, track sanity — and THAT
  * layer is implementable for real: `moov/mvhd` carries
  * (timescale, duration), each `trak/tkhd` carries track dimensions as
  * 16.16 fixed-point.
  *
  * Total like every decoder here: truncated/garbage bytes → None /
  * `ok = false` rows, never a task failure. The walker is bounds-checked
  * at every step and depth-limited (a hostile box claiming a huge size or
  * nesting forever must not loop or overread).
  */
object Mp4Probe {

  /** Probed container facts: `duration_ms` from mvhd (timescale-scaled),
    * track count, and the first video track's pixel dimensions (0×0 when
    * no track carries dimensions — audio-only containers).
    */
  final case class VideoMeta(
      media_id: Long,
      ok: Boolean,
      duration_ms: Long,
      n_tracks: Int,
      width: Int,
      height: Int)

  private def failed(id: Long) = VideoMeta(id, ok = false, 0L, 0, 0, 0)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, "ISO-8859-1")

  /** Walk the sibling boxes in [from, to), invoking `visit(type, payloadFrom,
    * payloadTo)` for each. Returns false on any malformed length (caller
    * fails the whole probe — a half-parsed container must not masquerade
    * as parsed).
    */
  private def walk(b: Array[Byte], from: Int, to: Int)
                  (visit: (String, Int, Int) => Boolean): Boolean = {
    var o = from
    while (o < to) {
      if (o + 8 > to) return false
      val size32 = be32(b, o)
      val (size, headerLen) =
        if (size32 == 1L) {
          if (o + 16 > to) return false
          (be64(b, o + 8), 16)
        } else if (size32 == 0L) ((to - o).toLong, 8) // box extends to end
        else (size32, 8)
      if (size < headerLen || o + size > to) return false
      if (!visit(boxType(b, o), o + headerLen, o + size.toInt)) return false
      o += size.toInt
    }
    true
  }

  /** Probe one container. `Some(duration_ms, n_tracks, width, height)` iff
    * the byte tree parses and holds a `moov/mvhd`.
    */
  def probe(bytes: Array[Byte]): Option[(Long, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 8) return None
    // belt over the bounds-checked walker: the fail-soft contract is
    // absolute, so even a walker bug must degrade to None, never a throw
    try probeChecked(bytes) catch { case _: Exception => None }
  }

  private def probeChecked(bytes: Array[Byte]): Option[(Long, Int, Int, Int)] = {
    var timescale = 0L
    var duration = -1L
    var tracks = 0
    var width = 0
    var height = 0
    val ok = walk(bytes, 0, bytes.length) { (tpe, from, to) =>
      tpe match {
        case "moov" =>
          walk(bytes, from, to) { (inner, f, t) =>
            inner match {
              case "mvhd" =>
                if (t - f < 4) false
                else {
                  val version = bytes(f) & 0xff
                  if (version == 1) {
                    if (t - f < 4 + 8 + 8 + 4 + 8) false
                    else {
                      timescale = be32(bytes, f + 20)
                      duration = be64(bytes, f + 24)
                      true
                    }
                  } else {
                    if (t - f < 4 + 4 + 4 + 4 + 4) false
                    else {
                      timescale = be32(bytes, f + 12)
                      duration = be32(bytes, f + 16)
                      true
                    }
                  }
                }
              case "trak" =>
                tracks += 1
                walk(bytes, f, t) { (leaf, lf, lt) =>
                  // payload emptiness BEFORE the version read: a size-8
                  // tkhd ending at EOF would otherwise index past the
                  // array (the fail-soft contract forbids any throw)
                  if (leaf != "tkhd") true
                  else if (lt - lf < 1) false
                  else {
                    val version = bytes(lf) & 0xff
                    // tkhd payload: ver/flags(4) times(8|16) id(4) rsvd(4)
                    // dur(4|8) rsvd(8) layer(2) alt(2) vol(2) rsvd(2)
                    // matrix(36) width(4) height(4) — dims are 16.16 fixed
                    val need = if (version == 1) 4 + 16 + 8 + 8 + 8 + 8 + 36 + 8
                               else 4 + 8 + 8 + 4 + 8 + 8 + 36 + 8
                    if (lt - lf < need) false
                    else {
                      val w = (be32(bytes, lt - 8) >> 16).toInt
                      val h = (be32(bytes, lt - 4) >> 16).toInt
                      if (width == 0 && w > 0) { width = w; height = h }
                      true
                    }
                  }
                }
              case _ => true
            }
          }
        case _ => true // ftyp, mdat, free — skip
      }
    }
    if (!ok || duration < 0 || timescale <= 0) None
    else Some((duration * 1000L / timescale, tracks, width, height))
  }

  /** Partition-parallel container probe of the blob column — the video
    * seat of [[JdkMedia.decodeImages]] for the metadata layer (pixels
    * stay behind the stub; see the object scaladoc).
    */
  def probeVideos(media: Dataset[Multimodal.MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      probe(r.content) match {
        case Some((durMs, n, w, h)) => VideoMeta(r.media_id, ok = true, durMs, n, w, h)
        case None => failed(r.media_id)
      }
    })
  }

  // ------------------------------------------------- fixture generators

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val size = payload.length + 8
    out.write((size >>> 24) & 0xff); out.write((size >>> 16) & 0xff)
    out.write((size >>> 8) & 0xff); out.write(size & 0xff)
    out.write(tpe.getBytes("ISO-8859-1"))
    out.write(payload)
    out.toByteArray
  }

  private def u32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A minimal valid ISO-BMFF tree: ftyp + moov(mvhd, n×trak(tkhd)) — the
    * same writer-reader roundtrip discipline as the proto wire fixtures
    * (`q_wire_roundtrip`): the writer emits the published byte layout, the
    * probe must recover the exact numbers.
    */
  def minimalMp4(durationMs: Long, width: Int, height: Int, nTracks: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L) ++
      "isom".getBytes("ISO-8859-1"))
    // mvhd v0: ver/flags, creation, modification, timescale=1000, duration,
    // rate, volume+reserved, matrix, predefined, next_track_id
    val mvhd = box("mvhd", u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(1000L) ++
      u32(durationMs) ++ u32(0x00010000L) ++ Array.fill[Byte](2 + 10)(0) ++
      Array.fill[Byte](36)(0) ++ Array.fill[Byte](24)(0) ++ u32(nTracks + 1L))
    val traks = (0 until nTracks).map { i =>
      // tkhd v0: ver/flags, creation, modification, track_id, reserved,
      // duration, reserved(8), layer, alternate, volume, reserved, matrix,
      // width, height (16.16) — only the FIRST track carries dimensions
      val (w, h) = if (i == 0) (width, height) else (0, 0)
      box("trak", box("tkhd", u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(i + 1L) ++
        u32(0L) ++ u32(durationMs) ++ Array.fill[Byte](8)(0) ++
        Array.fill[Byte](2 + 2 + 2 + 2)(0) ++ Array.fill[Byte](36)(0) ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16)))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov
  }

  /** Deterministic MP4 media table from the documents table — duration,
    * dimensions and track count by modular arithmetic on doc_id, so the
    * oracle recomputes every probed row (the video analog of
    * [[JdkMedia.pngMediaFromDocs]], metadata layer only).
    */
  def mp4MediaFromDocs(docs: org.apache.spark.sql.DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id")).as[Long].map { id =>
      val dur = (id % 9000L) + 1000L
      val w = ((id % 16L) + 1L).toInt * 80
      val h = ((id % 9L) + 1L).toInt * 80
      val n = (id % 3L).toInt + 1
      Multimodal.MediaRow(id, minimalMp4(dur, w, h, n),
        Multimodal.MediaMeta("mp4", w, h, dur))
    }
  }
}
