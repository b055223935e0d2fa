package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** REAL media codecs over the JDK's own decoders — no external libraries:
  * `javax.imageio` ships PNG/JPEG/BMP/GIF/WBMP codecs and
  * `javax.sound.sampled` ships WAV/AIFF/AU PCM parsing in every JDK 17,
  * headless included. This replaces the declared stub boundary for the
  * formats the JDK covers; video (and exotic codecs) remain behind the
  * [[Multimodal.FakeCodec]] stub with the same Spark-side contract.
  *
  * All entry points are total: corrupt or unsupported bytes produce an
  * `ok = false` row, never a task failure — one poisoned blob in a 100 TB
  * scan must not kill the stage. Decoders run partition-parallel inside
  * `mapPartitions` (executor-local, constant memory, no driver
  * involvement) exactly like the stubbed stages.
  */
object JdkMedia {

  // ImageIO defaults to spilling decode scratch to a disk cache — keep the
  // hot path in memory; and never let AWT try to touch a display
  locally {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  val GridDim = 4 // luma features: GridDim × GridDim mean-intensity grid

  /** Decoded image row: dimensions, per-channel means (0-255 scale) and a
    * GridDim² mean-luma grid feature — the cheap content signature a
    * training pipeline filters and near-dups on before any model runs.
    */
  final case class ImageFeatures(
      media_id: Long,
      ok: Boolean,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
      luma_grid: Array[Float])

  /** One decoded FRAME of a multi-frame container (animated GIF — the one
    * multi-frame format the JDK ships a decoder for): [[ImageFeatures]]
    * plus the frame index. Single-frame formats yield exactly one row.
    */
  final case class FrameFeatures(
      media_id: Long,
      frame: Int,
      ok: Boolean,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
      luma_grid: Array[Float])

  /** Decoded audio row (PCM containers the JDK parses — WAV/AIFF/AU):
    * format facts + RMS amplitude, the audio analog of the image means.
    */
  final case class AudioFeatures(
      media_id: Long,
      ok: Boolean,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms: Double)

  private def failedImage(id: Long) =
    ImageFeatures(id, ok = false, 0, 0, 0.0, 0.0, 0.0,
      Array.fill(GridDim * GridDim)(0.0f))

  /** Decode one image blob. Double accumulation in row-major pixel order —
    * deterministic, so solid-color fixtures round-trip exactly and the
    * DuckDB oracle can recompute the means.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): ImageFeatures = {
    if (bytes == null || bytes.isEmpty) return failedImage(id)
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // truncated/poisoned container
    if (img == null) return failedImage(id) // unsupported format reads as null
    featuresOf(id, img)
  }

  /** The pixel loop over an already-decoded frame — shared by the whole-
    * image path and the per-frame GIF path so a frame's features and an
    * image's features are bit-identical for identical pixels.
    */
  private[multimodal] def featuresOf(id: Long, img: BufferedImage): ImageFeatures = {
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return failedImage(id)
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0
    val grid = Array.fill(GridDim * GridDim)(0.0)
    val cnt = Array.fill(GridDim * GridDim)(0L)
    // bulk row grabs: per-pixel getRGB pays a color-model dispatch per
    // call — a row buffer amortizes it (~an order of magnitude on real
    // photos) while bounding memory at one row regardless of image size
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val rowCell = (y * GridDim / h) * GridDim
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        // ITU-R BT.601 integer luma, the classic (77r + 150g + 29b) >> 8
        val luma = (77 * r + 150 * g + 29 * b) >> 8
        sl += luma
        val cell = rowCell + (x * GridDim / w)
        grid(cell) += luma
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    // an image smaller than the grid leaves cells with no pixels: backfill
    // them with the image's OVERALL mean luma, not 0 — a 0 would make the
    // feature depend on the image's SHAPE (which cells happen to be empty)
    // and break the uniform-image invariant (uniform ⇒ uniform grid) that
    // the near-dup verify and the oracle gate rely on
    val meanLuma = sl / n
    ImageFeatures(id, ok = true, w, h, sr / n, sg / n, sb / n,
      Array.tabulate(GridDim * GridDim)(i =>
        if (cnt(i) == 0) meanLuma.toFloat else (grid(i) / cnt(i)).toFloat))
  }

  /** Real image resize: bilinear `Graphics2D` scale to fit `maxDim`,
    * re-encoded PNG (lossless, JDK-native). Returns None for undecodable
    * bytes; images already within bounds pass through untouched (no
    * re-encode churn).
    */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (math.max(w, h) <= maxDim) return Some((bytes, w, h))
    val scale = maxDim.toDouble / math.max(w, h)
    val nw = math.max(1, math.round(w * scale).toInt)
    val nh = math.max(1, math.round(h * scale).toInt)
    val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try {
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, nw, nh, null)
    } finally g2.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some((bos.toByteArray, nw, nh))
  }

  /** Decode EVERY frame of an image container — the real multi-frame path
    * `ImageIO.read`'s frame-0-only convenience hides: an `ImageReader`
    * enumerates frames via `getNumImages(true)` / `read(i)`, which for an
    * animated GIF yields one [[FrameFeatures]] row per animation frame
    * (the JDK's only multi-frame decoder; PNG/JPEG/BMP come back as one
    * frame through the same code path). Frames are the STORED rasters:
    * a delta-encoded GIF frame reflects its own pixels, not the composed
    * screen — full-frame animations (the normal training-data case) are
    * exact. Total like every decoder here: corrupt bytes → one
    * `ok = false` row, a frame that fails mid-sequence → that frame
    * flagged, the rest decoded.
    */
  def decodeImageFrames(id: Long, bytes: Array[Byte]): Seq[FrameFeatures] = {
    def failedFrame(i: Int) = FrameFeatures(id, i, ok = false, 0, 0, 0.0, 0.0, 0.0,
      Array.fill(GridDim * GridDim)(0.0f))
    if (bytes == null || bytes.isEmpty) return Seq(failedFrame(0))
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return Seq(failedFrame(0))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq(failedFrame(0))
      val reader = readers.next()
      try {
        // seekForwardOnly = false: getNumImages(true) walks the whole
        // container to count frames, which needs backward seeks
        reader.setInput(iis, false, true)
        val n = try reader.getNumImages(true) catch { case _: Exception => -1 }
        if (n <= 0) return Seq(failedFrame(0))
        (0 until n).map { i =>
          val img = try reader.read(i) catch { case _: Exception => null }
          if (img == null) failedFrame(i)
          else {
            val f = featuresOf(id, img)
            FrameFeatures(id, i, f.ok, f.width, f.height,
              f.mean_r, f.mean_g, f.mean_b, f.luma_grid)
          }
        }
      } finally reader.dispose()
    } finally { try iis.close() catch { case _: Exception => () } }
  }

  val AudioGridDim = 16 // audioNearDups: windowed-RMS grid width

  /** Windowed-RMS signature of one PCM container — the audio analog of the
    * image luma grid: the sample stream split into [[AudioGridDim]] equal
    * spans, RMS per span (channels mixed in frame order, like
    * [[decodeAudio]]'s overall RMS). Container-independent: the same PCM
    * in a WAV and an AIFF (endianness and headers differ, samples don't)
    * produces the identical grid. None for bytes the JDK cannot parse;
    * spans an ultra-short clip leaves empty are backfilled with the
    * overall RMS (same shape-independence trick as the image grid).
    */
  def audioRmsGrid(id: Long, bytes: Array[Byte],
                   windows: Int = AudioGridDim): Option[Array[Double]] = {
    if (bytes == null || bytes.isEmpty) return None
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (in == null) return None
    try {
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      if (bits != 16 && bits != 8) return None
      // integer-PCM only, with the sign convention the container actually
      // uses: 8-bit WAV is PCM_UNSIGNED (silence = 0x80), 8-bit AIFF is
      // signed — decoding both as signed would make the SAME waveform
      // produce different grids per container, breaking the cross-container
      // pairing this grid exists for; ULAW/ALAW/float are not PCM ints
      val enc = fmt.getEncoding
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      if (!signed && !unsigned) return None
      if (bits == 16 && !signed) return None // nonstandard; refuse, don't guess
      val data = in.readAllBytes()
      val step = bits / 8
      val nSamples = data.length / step
      if (nSamples == 0) return None
      val bigEndian = fmt.isBigEndian
      val sq = new Array[Double](windows)
      val cnt = new Array[Long](windows)
      var s = 0
      var acc = 0.0
      while (s < nSamples) {
        val i = s * step
        val sample =
          if (bits == 16) {
            val (lo, hi) = if (bigEndian) (data(i + 1), data(i)) else (data(i), data(i + 1))
            (((hi & 0xff) << 8) | (lo & 0xff)).toShort.toDouble / 32768.0
          } else if (signed) (data(i).toDouble) / 128.0
          else ((data(i) & 0xff) - 128).toDouble / 128.0
        val w = (s.toLong * windows / nSamples).toInt
        sq(w) += sample * sample
        cnt(w) += 1
        acc += sample * sample
        s += 1
      }
      val overall = math.sqrt(acc / nSamples)
      Some(Array.tabulate(windows)(w =>
        if (cnt(w) == 0) overall else math.sqrt(sq(w) / cnt(w))))
    } catch { case _: Exception => None } finally in.close()
  }

  /** Cross-container AUDIO near-duplicates — the audio seat of
    * [[imageNearDups]], sharing its banded-grid core: the same PCM in a
    * WAV and an AIFF (or a replayed capture at a slightly different
    * level) has byte-disjoint containers but near-identical windowed-RMS
    * envelopes. Candidates from the banded grid aHash (Hamming ≤
    * `maxHamming`), verify = overall-RMS gap ≤ `rmsTol` (normalized
    * 0..1 scale — 100/32768 ≈ a 100-amplitude step of a 16-bit sample)
    * AND centered-envelope cosine ≥ `threshold`, with constant signals
    * (uniform grids — silence, test tones) accepted on the RMS test
    * alone. Failed decodes are excluded. Same scale shape as the image
    * flavor: one decode pass, capped hash buckets, no all-pairs stage.
    */
  def audioNearDups(media: Dataset[Multimodal.MediaRow],
                    threshold: Double = 0.98,
                    rmsTol: Double = 100.0 / 32768.0,
                    maxBucket: Int = 100000,
                    maxHamming: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    val feats = media
      .mapPartitions(_.flatMap(r =>
        audioRmsGrid(r.media_id, r.content).map(g => gridFeatureRow(r.media_id, g))))
      .toDF("id", "ahash", "mean", "centered", "norm0")
    bandedCenteredPairs(feats, AudioGridDim, maxHamming, maxBucket,
      threshold, rmsTol)
  }

  /** Decode one PCM audio container (WAV/AIFF/AU). RMS over all channels
    * in frame order, 16/8-bit PCM both handled; compressed payloads the
    * JDK cannot parse come back ok = false.
    */
  def decodeAudio(id: Long, bytes: Array[Byte]): AudioFeatures = {
    def failed = AudioFeatures(id, ok = false, 0, 0, 0L, 0L, 0.0)
    if (bytes == null || bytes.isEmpty) return failed
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (in == null) return failed
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val bits = fmt.getSampleSizeInBits
      if (bits != 16 && bits != 8) return failed
      // same PCM-encoding discipline as [[audioRmsGrid]]: 8-bit WAV is
      // UNSIGNED (silence = 0x80) — decoding it as signed reads silence
      // as full-scale; non-PCM (ULAW/ALAW/float) fails soft
      val enc = fmt.getEncoding
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      if (!signed && !unsigned) return failed
      if (bits == 16 && !signed) return failed
      val data = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      var i = 0; var acc = 0.0; var nSamples = 0L
      while (i + (bits / 8) <= data.length) {
        val sample =
          if (bits == 16) {
            val (lo, hi) = if (bigEndian) (data(i + 1), data(i)) else (data(i), data(i + 1))
            (((hi & 0xff) << 8) | (lo & 0xff)).toShort.toDouble / 32768.0
          } else if (signed) (data(i).toDouble) / 128.0
          else ((data(i) & 0xff) - 128).toDouble / 128.0
        acc += sample * sample
        nSamples += 1
        i += bits / 8
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(acc / nSamples)
      val durMs =
        if (fmt.getFrameRate > 0) (frames * 1000.0 / fmt.getFrameRate).toLong else 0L
      AudioFeatures(id, ok = true, fmt.getSampleRate.toInt, fmt.getChannels,
        frames, durMs, rms)
    } catch { case _: Exception => failed } finally in.close()
  }

  // ------------------------------------------------------- Spark stages

  /** Partition-parallel REAL image decode of the blob column — the
    * production counterpart of [[Multimodal.extractFeatures]]'s stub.
    */
  def decodeImages(media: Dataset[Multimodal.MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => decodeImage(r.media_id, r.content)))
  }

  /** Partition-parallel REAL resize: decodable images are resampled (and
    * their meta corrected to the REAL decoded dimensions AND the re-encoded
    * container format — the resampled bytes are always PNG, whatever came
    * in, and a meta column claiming "jpg" over PNG bytes would lie to any
    * consumer that trusts it); undecodable blobs pass through untouched
    * with their claimed meta — resize is a best-effort normalization
    * stage, not a validator (pair it with [[decodeImages]]' ok flag to
    * quarantine corrupt rows).
    */
  def resizeImages(media: Dataset[Multimodal.MediaRow], maxDim: Int): Dataset[Multimodal.MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      resizeImage(r.content, maxDim) match {
        case Some((nb, nw, nh)) =>
          // reference identity distinguishes the pass-through (original
          // bytes, original format kept) from the re-encode (always PNG)
          val fmt = if (nb eq r.content) r.meta.format else "png"
          Multimodal.MediaRow(r.media_id, nb,
            r.meta.copy(format = fmt, width = nw, height = nh))
        case None => r
      }
    }
  }

  /** Partition-parallel REAL audio decode (WAV/AIFF/AU). */
  def decodeAudios(media: Dataset[Multimodal.MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => decodeAudio(r.media_id, r.content)))
  }

  /** Partition-parallel multi-frame decode with stride sampling: frames
    * with index ≡ 0 (mod `frameStride`) survive — the REAL seat of the
    * [[Multimodal.sampleFrames]] plumbing for the one multi-frame format
    * the JDK decodes (animated GIF). Sampling drops ROWS, not decode work:
    * GIF frames are delta-chained, so the reader walks every frame
    * regardless — the win is downstream (feature rows shipped, shuffled,
    * stored), which is where frame sampling pays at scale anyway.
    */
  def decodeFrames(media: Dataset[Multimodal.MediaRow],
                   frameStride: Int = 1): Dataset[FrameFeatures] = {
    require(frameStride >= 1, s"frameStride must be >= 1 (got $frameStride)")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r =>
      decodeImageFrames(r.media_id, r.content)
        .filter(f => f.frame % frameStride == 0)))
  }

  /** Cross-format image near-duplicates — what byte-hash dedup cannot
    * see: a PNG and a BMP (or a bilinear-resized copy) of the same
    * picture decode to near-identical luma grids regardless of container
    * bytes. The classic average-hash scheme over the decoded grid:
    *
    *  - '''candidates''': the 16-bit aHash (bit i = cell i's luma > the
    *    image's mean luma — robust to re-encode brightness wobble because
    *    the threshold moves with the image), banded Manku-style into 4
    *    4-bit bands: two hashes within Hamming distance ≤ `maxHamming`
    *    differ in at most `maxHamming` bands, so they agree on some
    *    (4 − maxHamming)-band subset — pigeonhole-exact recall, the same
    *    block trick as [[graft.operators.Dedup.simHashPairsWide]]. Exact
    *    bucket equality (the pre-banding scheme) missed any re-encode
    *    whose luma wobble flipped even ONE grid bit — a cell near the
    *    image mean, common in JPEG round-trips of real photos. Pairs form
    *    only within a (subset, key) bucket, buckets capped
    *    ([[graft.operators.Dedup.capBuckets]]) like every bucketed
    *    self-join in the engine;
    *  - '''verify''': mean-luma gap ≤ `meanTol` AND cosine of the
    *    MEAN-CENTERED grids ≥ `threshold`. Cosine on raw grids would be
    *    scale-invariant garbage here (any two uniform images — any
    *    brightness — score 1.0); centering kills that, and the uniform×
    *    uniform case (centered norm 0 on both sides, cosine undefined)
    *    is accepted on the mean test alone, which is exactly the right
    *    semantic for blank-ish frames.
    *
    * Failed decodes are excluded (no content to compare). The 16-cell
    * grid is a coarse signature: right for exact/near-exact duplicate
    * sweeps (re-encodes, resizes), not semantic similarity. Scale shape:
    * one decode pass, hash-bucketed id-only candidates, capped buckets,
    * 17-double verify rows — no all-pairs stage anywhere. Returns
    * (id_a, id_b, mean_gap, centered_cosine).
    */
  def imageNearDups(media: Dataset[Multimodal.MediaRow],
                    threshold: Double = 0.98,
                    meanTol: Double = 4.0,
                    maxBucket: Int = 100000,
                    maxHamming: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    val feats = decodeImages(media)
      .filter(_.ok)
      .map(f => gridFeatureRow(f.media_id, f.luma_grid.map(_.toDouble)))
      .toDF("id", "ahash", "mean", "centered", "norm0")
    bandedCenteredPairs(feats, GridDim * GridDim, maxHamming, maxBucket,
      threshold, meanTol)
  }

  /** The (ahash, mean, centered, norm0) signature row of one content grid
    * — shared by the image (luma grid) and audio (windowed-RMS grid)
    * near-dup front-ends: bit i of the aHash = cell i above the grid's
    * own mean (threshold moves with the content, so re-encode level
    * wobble doesn't flip everything), `centered` is the mean-subtracted
    * grid the verify cosine runs on, `norm0` flags a uniform grid (the
    * centered-cosine-undefined case the verify accepts on the mean test
    * alone).
    */
  private[multimodal] def gridFeatureRow(id: Long, grid: Array[Double])
      : (Long, Long, Double, Seq[Double], Boolean) = {
    val mean = grid.sum / grid.length
    val centered = grid.map(_ - mean)
    var ah = 0L
    var i = 0
    while (i < grid.length) {
      if (grid(i) > mean) ah |= 1L << i
      i += 1
    }
    (id, ah, mean, centered.toSeq, centered.forall(_ == 0.0))
  }

  /** The modality-independent banded-grid near-dup core: candidates from
    * Manku-style band subsets of a `bits`-bit aHash (4 bands of bits/4 —
    * pigeonhole-exact for Hamming ≤ `maxHamming`), verified by mean gap ≤
    * `meanTol` AND centered cosine ≥ `threshold` (both-uniform pairs pass
    * on the mean test alone). Input schema (id, ahash, mean, centered,
    * norm0); emits (id_a, id_b, mean_gap, centered_cosine). Buckets
    * capped per (subset, key) like every bucketed self-join.
    */
  /** The Manku-style band-subset keys of a `bits`-bit aHash: one row per
    * (id, subset) with the packed subset key `bk` — a Hamming ≤
    * `maxHamming` pair agrees on ≥ (bands − maxHamming) bands, hence on
    * at least one enumerated subset; packed subset values keep the key
    * as wide as the tolerance allows (12 bits at the default
    * maxHamming = 1 vs 4 bits for single-band keys). Shared by the
    * self-join pair finder and the history "against" matcher so both
    * sides of an incremental store compute IDENTICAL keys.
    */
  private[graft] def bandSubsetKeys(feats: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val bands = 4
    require(bits % bands == 0, s"grid hash width $bits must split into $bands bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"aHash banding tolerates 0 <= maxHamming < $bands bit flips (got $maxHamming)")
    val width = bits / bands
    val mask = (1L << width) - 1L
    def bandVal(ah: Column, b: Int): Column =
      call_function("shiftright", ah, lit(width * b)).bitwiseAND(lit(mask))
    val subsets = (0 until bands).combinations(bands - maxHamming).toSeq.zipWithIndex
    feats.select(col("id"), col("mean"), col("centered"), col("norm0"),
      explode(array(subsets.map { case (ss, si) =>
        struct(lit(si).as("t"),
          ss.zipWithIndex.map { case (b, pos) =>
            call_function("shiftleft", bandVal(col("ahash"), b), lit(width * pos))
          }.reduce(_.bitwiseOR(_)).as("bk"))
      }: _*)).as("s"))
      .select(col("id"), col("mean"), col("centered"), col("norm0"),
        col("s.t").as("t"), col("s.bk").as("bk"))
  }

  private[multimodal] def bandedCenteredPairs(feats: DataFrame, bits: Int, maxHamming: Int,
                                  maxBucket: Int, threshold: Double,
                                  meanTol: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val blocked = bandSubsetKeys(feats, bits, maxHamming)
    val bounded = graft.operators.Dedup.capBuckets(blocked, Seq("t", "bk"), maxBucket)
    val a = bounded.select(col("t"), col("bk"), col("id").as("id_a"), col("mean").as("mean_a"),
      col("centered").as("c_a"), col("norm0").as("z_a"))
    val b = bounded.select(col("t"), col("bk"), col("id").as("id_b"), col("mean").as("mean_b"),
      col("centered").as("c_b"), col("norm0").as("z_b"))
    a.join(b, Seq("t", "bk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        abs(col("mean_a") - col("mean_b")).as("mean_gap"),
        graft.functions.Functions.cosine(col("c_a"), col("c_b")).as("centered_cosine"),
        (col("z_a") && col("z_b")).as("_both_uniform"))
      .where(col("mean_gap") <= meanTol &&
        (col("centered_cosine") >= threshold || col("_both_uniform")))
      .drop("_both_uniform")
      .dropDuplicates("id_a", "id_b")
  }

  /** Which of `batchFeats`' images perceptually match ANYTHING in
    * `historyFeats` — the incremental-store flavor of
    * [[bandedCenteredPairs]] (same band-subset keys, same mean-gap +
    * centered-cosine verify). Returns the matched batch ids, one row
    * each.
    *
    * Scale shape: the BATCH side (micro-batch-sized by construction) is
    * broadcast, so the corpus-sized history is a single MAP-ONLY scan —
    * no history-keyed exchange, no bucket cap needed (an oversized
    * history bucket costs linear verify work inside the scan, never a
    * shuffle blowup; output collapses to ≤ batch-size matched ids
    * before the one small distinct exchange).
    */
  private[multimodal] def bandedCenteredMatchesAgainst(
      batchFeats: DataFrame, historyFeats: DataFrame, bits: Int,
      maxHamming: Int, threshold: Double, meanTol: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val b = bandSubsetKeys(batchFeats, bits, maxHamming)
      .select(col("t"), col("bk"), col("id").as("batch_id_"),
        col("mean").as("mean_b"), col("centered").as("c_b"),
        col("norm0").as("z_b"))
    val h = bandSubsetKeys(historyFeats, bits, maxHamming)
      .select(col("t"), col("bk"), col("mean").as("mean_h"),
        col("centered").as("c_h"), col("norm0").as("z_h"))
    graft.operators.KeyedHistory.probeFrames(h, b, Seq("t", "bk"))
      .where(centeredMatch(threshold, meanTol))
      .select(col("batch_id_").as("id"))
      .distinct()
  }

  /** The ONE near-dup verify predicate of the banded-grid family, over
    * columns `(mean_h, c_h, z_h)` × `(mean_b, c_b, z_b)`: mean gap ≤
    * `meanTol` AND (centered cosine ≥ `threshold` OR both sides uniform)
    * — shared by the in-memory matcher above and
    * [[IncrementalPairs]]' partition-pruned history probe so the two
    * flavors can never verify differently.
    */
  private[multimodal] def centeredMatch(threshold: Double, meanTol: Double)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    abs(col("mean_h") - col("mean_b")) <= meanTol &&
      (graft.functions.Functions.cosine(col("c_h"), col("c_b")) >= threshold ||
        (col("z_h") && col("z_b")))
  }

  // ------------------------------------------------ cross-modal gating

  /** Byte-sniffed modality of a blob — decoders trust content, never the
    * meta column (a stale/wrong format stamp must not route a blob to the
    * wrong parser).
    */
  private def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 12) "unknown"
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "image"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "image" // JPEG
    else if (b(0) == 'B' && b(1) == 'M') "image"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "image"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "audio"
    else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F') "audio"
    else if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') "audio"
    else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') "video"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') "video"
    else "unknown"
  }

  /** Does one blob pass the media-quality floor? Modality comes from the
    * BYTES (see [[sniff]]); each modality applies its own floor over the
    * REAL decode/probe: images must decode with min(width, height) ≥
    * `minImageDim`, audio must parse with duration ≥ `minAudioMs`, video
    * containers must probe with duration ≥ `minVideoMs`. Unknown or
    * undecodable blobs fail — a quality gate admits only what it could
    * verify.
    */
  def mediaPasses(bytes: Array[Byte], minImageDim: Int,
                  minAudioMs: Long, minVideoMs: Long): Boolean =
    sniff(bytes) match {
      case "image" =>
        val f = decodeImage(0L, bytes)
        f.ok && math.min(f.width, f.height) >= minImageDim
      case "audio" =>
        val a = decodeAudio(0L, bytes)
        a.ok && a.duration_ms >= minAudioMs
      case "video" =>
        // container dispatch on the sniffed leader: ISO-BMFF (ftyp) vs
        // RIFF-AVI — both probe to a duration the floor applies to
        if (bytes(0) == 'R') AviMjpeg.probe(bytes).exists(_._1 >= minVideoMs)
        else Mp4Probe.probe(bytes).exists(_._1 >= minVideoMs)
      case _ => false
    }

  /** The CROSS-MODAL gate stage of a multimodal training pipeline: keep
    * only the docs whose media blob passes [[mediaPasses]] — the stage-0
    * companion to [[graft.operators.TrainingPipeline.prepare]] (run the
    * text pipeline over `mediaQualityGate(docs, …)` output). One
    * partition-parallel decode pass over the media table emits passing
    * ids only; docs filter by left-semi join (no media bytes ever ride
    * the join). A doc with NO media row fails the gate — same
    * verify-or-drop stance as undecodable bytes.
    */
  def mediaQualityGate(docs: DataFrame, idCol: String,
                       media: Dataset[Multimodal.MediaRow],
                       minImageDim: Int = 1, minAudioMs: Long = 0L,
                       minVideoMs: Long = 0L): DataFrame = {
    import media.sparkSession.implicits._
    val passing = media
      .mapPartitions(_.collect {
        case r if mediaPasses(r.content, minImageDim, minAudioMs, minVideoMs) => r.media_id
      })
      .toDF(idCol)
    docs.join(passing, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------- fixture generators

  /** A solid-color PNG — the deterministic fixture: decode must return
    * exactly (r, g, b) as the channel means, making the real codec
    * chain oracle-checkable (PNG is lossless).
    */
  // ------------------------------------------------------- perceptual DCT hash

  /** pHash geometry: 32×32 luma → integer DCT → top-left 8×8. */
  val PHashDim = 32

  /** Fixed-point DCT basis: `PHashCos(k)(n) = round(1024 ·
    * cos((2n+1)kπ/64))` for k in 0..7, n in 0..31 — the SINGLE source of
    * truth for both the Spark kernel ([[phash64]]) and the oracle's SQL
    * replay (SparkEntry embeds these exact integers as a VALUES table),
    * so there is no cross-engine cosine to disagree about. With scale
    * 2^10 every DCT intermediate stays < 2^39 and the full coefficient
    * < 2^45 — exact 64-bit integer arithmetic in any engine.
    */
  val PHashCos: Array[Array[Long]] =
    Array.tabulate(8, PHashDim)((k, n) =>
      math.round(1024.0 * math.cos((2 * n + 1) * k * math.Pi / (2.0 * PHashDim))))

  /** 32×32 integer luma grid of a decoded frame: BT.601 integer luma per
    * pixel, box-averaged into cells (floor division). A 32×32 input maps
    * one pixel per cell — EXACT, which is what lets a fixture replay the
    * grid from arithmetic. Empty cells (image smaller than the grid)
    * backfill with the overall floor-mean, like [[featuresOf]].
    */
  private[graft] def lumaGrid32(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val d = PHashDim
    val sum = new Array[Long](d * d)
    val cnt = new Array[Long](d * d)
    var totalLuma = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val rowCell = (y * d / h) * d
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        val luma = (77 * r + 150 * g + 29 * b) >> 8
        totalLuma += luma
        val cell = rowCell + (x * d / w)
        sum(cell) += luma
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val mean = (totalLuma / (w.toLong * h)).toInt
    Array.tabulate(d * d)(i => if (cnt(i) == 0) mean else (sum(i) / cnt(i)).toInt)
  }

  /** The 63-bit perceptual DCT hash of a 32×32 luma grid: separable
    * integer DCT (basis [[PHashCos]]), top-left 8×8 coefficients, DC
    * dropped, bit (u·8+v−1) set iff the coefficient exceeds the LOWER
    * MEDIAN of the 63 AC coefficients (the 32nd smallest — an integer
    * pick, no averaging, so the threshold replays exactly). Bits stay
    * below 2^63, so the hash is a non-negative BIGINT everywhere.
    *
    * Robust where aHash is brittle: aHash thresholds each cell against
    * the image mean, so a JPEG re-encode of content sitting NEAR the
    * mean flips bits freely; the DCT coefficients aggregate global
    * structure and move far less under re-encode wobble.
    */
  def phash64(luma: Array[Int]): Long = {
    require(luma.length == PHashDim * PHashDim,
      s"phash64 wants a ${PHashDim}x$PHashDim grid, got ${luma.length} cells")
    val d = PHashDim
    // T(v)(y) = Σ_x cos(v,x) · luma(y,x)
    val t = Array.ofDim[Long](8, d)
    var v = 0
    while (v < 8) {
      var y = 0
      while (y < d) {
        var s = 0L
        var x = 0
        while (x < d) { s += PHashCos(v)(x) * luma(y * d + x); x += 1 }
        t(v)(y) = s
        y += 1
      }
      v += 1
    }
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var vv = 0
      while (vv < 8) {
        var s = 0L
        var y = 0
        while (y < d) { s += PHashCos(u)(y) * t(vv)(y); y += 1 }
        f(u * 8 + vv) = s
        vv += 1
      }
      u += 1
    }
    val sortedAc = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sortedAc)
    val median = sortedAc(31) // lower median of 63
    var hash = 0L
    var k = 1
    while (k < 64) {
      if (f(k) > median) hash |= 1L << (k - 1)
      k += 1
    }
    hash
  }

  /** Decode + pHash every media row: `(media_id, ok, phash)`. Map-only. */
  def imagePHashes(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new ByteArrayInputStream(r.content))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
        (r.media_id, false, 0L)
      else (r.media_id, true, phash64(lumaGrid32(img)))
    }).toDF("media_id", "ok", "phash")
  }

  /** [[imageNearDups]] with pHash candidates: the 63-bit DCT hash feeds
    * the same Manku-banded core (4 bands of 16 bits), the same
    * mean-gap + centered-cosine verify over a 4×4 grid (derived from the
    * 32×32 pHash grid — one decode per image). Catches the JPEG
    * re-encodes of near-mean content whose aHash bits wobble past the
    * banding tolerance (see [[phash64]]); same scale shape — id-only
    * bucketed candidates, capped buckets, no all-pairs stage.
    */
  def imageNearDupsPHash(media: Dataset[Multimodal.MediaRow],
                         threshold: Double = 0.98,
                         meanTol: Double = 4.0,
                         maxBucket: Int = 100000,
                         maxHamming: Int = 1): DataFrame = {
    val feats = phashFeatureRows(media).where(
      org.apache.spark.sql.functions.col("ok")).drop("ok")
    bandedCenteredPairs(feats, 64, maxHamming, maxBucket, threshold, meanTol)
  }

  /** ONE decode per image → the pHash near-dup signature row
    * `(id, ok, ahash, mean, centered, norm0)`: `ahash` is the 63-bit DCT
    * pHash ([[phash64]]), the verify features come from the 4×4 grid of
    * 8×8 block means of the same 32×32 luma grid. `ok = false` rows mark
    * undecodable payloads (zeroed features) — kept so callers like
    * [[PairCuration]] can ledger the decode gate before banding; the
    * near-dup front-ends filter them out.
    */
  private[multimodal] def phashFeatureRows(
      media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new ByteArrayInputStream(r.content))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
        (r.media_id, false, 0L, 0.0, Seq.empty[Double], false)
      else {
        val g32 = lumaGrid32(img)
        val ph = phash64(g32)
        // 4×4 verify grid = 8×8 block means of the 32-grid
        val g16 = Array.tabulate(16) { c =>
          val (cy, cx) = (c / 4, c % 4)
          var s = 0.0
          var y = cy * 8
          while (y < cy * 8 + 8) {
            var x = cx * 8
            while (x < cx * 8 + 8) { s += g32(y * PHashDim + x); x += 1 }
            y += 1
          }
          s / 64.0
        }
        val (_, _, mean, centered, norm0) = gridFeatureRow(r.media_id, g16)
        (r.media_id, true, ph, mean, centered, norm0)
      }
    }).toDF("id", "ok", "ahash", "mean", "centered", "norm0")
  }

  /** Deterministic 32×32 gradient-PNG media table from the documents
    * table — [[pngMediaFromDocs]]' structured sibling for the pHash gate:
    * r = g = b = (id mod 32) + (id mod 4)·x + ((3·id) mod 4)·y +
    * 16·((x+y+id) mod 2), every value ≤ 233 so nothing clips, equal
    * channels so BT.601 luma == the value — the oracle recomputes the
    * whole 32×32 grid (and from it the integer DCT) from id arithmetic.
    */
  def gradientPngMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    Multimodal.fanOutIds(docs).map { id =>
      val d = PHashDim
      val img = new BufferedImage(d, d, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < d) {
        var x = 0
        while (x < d) {
          val v = ((id % 32) + (id % 4) * x + ((3 * id) % 4) * y +
            16 * ((x + y + id) % 2)).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRow(id, bos.toByteArray,
        Multimodal.MediaMeta("png", d, d, 0L))
    }
  }

  def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** An animated GIF from full frames via the JDK's own sequence writer
    * (`ImageWriter.writeToSequence` — the GIF writer is the one JDK codec
    * that supports it). Solid-color frames survive GIF's palette exactly
    * (a one-color image fits any palette), so multi-frame fixtures stay
    * oracle-recomputable.
    */
  def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "animatedGif needs >= 1 frame")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** [[animatedGif]] over solid-color frames — (w, h, per-frame rgb). */
  def solidGif(w: Int, h: Int, colors: Seq[(Int, Int, Int)]): Array[Byte] =
    animatedGif(colors.map { case (r, g, b) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      img
    })

  /** A mono 16-bit little-endian PCM WAV holding a constant amplitude —
    * RMS is exactly |amplitude|/32768, deterministic for the spec.
    */
  def constWav(sampleRate: Int, nFrames: Int, amplitude: Short): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      data(2 * i) = (amplitude & 0xff).toByte
      data(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic REAL-PNG media table derived from the documents table
    * (id → dimensions and color by modular arithmetic): the oracle-side
    * recomputes the expected decode output from the same arithmetic,
    * gating the encode → Spark decode → feature chain numerically.
    */
  def pngMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    Multimodal.fanOutIds(docs).map { id =>
      val w = (id % 13).toInt + 1
      val h = (id % 7).toInt + 1
      val r = (id % 251).toInt
      val g = (id * 7 % 251).toInt
      val b = (id * 31 % 251).toInt
      Multimodal.MediaRow(id, solidPng(w, h, r, g, b),
        Multimodal.MediaMeta("png", w, h, 0L))
    }
  }

  /** Deterministic REAL animated-GIF media table from the documents table:
    * id → frame count (1-3), dimensions and per-frame solid colors by
    * modular arithmetic, so the oracle recomputes every decoded frame's
    * (width, height, means) from the same arithmetic — gating the
    * multi-frame encode → [[decodeFrames]] chain numerically end-to-end.
    */
  def gifMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    Multimodal.fanOutIds(docs).map { id =>
      val w = (id % 11).toInt + 2
      val h = (id % 5).toInt + 2
      val n = (id % 3).toInt + 1
      val colors = (0 until n).map(f => (
        ((id + 17L * f) % 251).toInt,
        ((id * 7 + 29L * f) % 251).toInt,
        ((id * 31 + 41L * f) % 251).toInt))
      Multimodal.MediaRow(id, solidGif(w, h, colors),
        Multimodal.MediaMeta("gif", w, h, n * 100L))
    }
  }

  /** Mixed-modality media table from the documents table — doc_id % 4
    * picks the modality (0 → solid PNG, 1 → constant WAV, 2 → minimal
    * MP4, 3 → MJPEG AVI — all four REAL container paths), every
    * parameter by the same arithmetic as the single-modality fixtures,
    * so the cross-modal gate's pass set is oracle-recomputable. The AVI
    * branch stretches its frame interval so container durations span the
    * gate's video floor: (id%3+1) frames × (id%9+1)·500 ms.
    */
  def mixedMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 4) match {
        case 0 =>
          val w = (id % 13).toInt + 1
          val h = (id % 7).toInt + 1
          Multimodal.MediaRow(id, solidPng(w, h, (id % 251).toInt,
            (id * 7 % 251).toInt, (id * 31 % 251).toInt),
            Multimodal.MediaMeta("png", w, h, 0L))
        case 1 =>
          val frames = (id % 400).toInt + 100
          Multimodal.MediaRow(id, constWav(8000, frames, ((id * 37) % 32768).toInt.toShort),
            Multimodal.MediaMeta("wav", 0, 0, frames * 1000L / 8000L))
        case 2 =>
          val dur = (id % 9000L) + 1000L
          Multimodal.MediaRow(id, Mp4Probe.minimalMp4(dur, 320, 240, 1),
            Multimodal.MediaMeta("mp4", 320, 240, dur))
        case _ =>
          val n = (id % 3).toInt + 1
          val usPerFrame = ((id % 9) + 1L) * 500000L
          val frames = (0 until n).map(_ => AviMjpeg.solidJpeg(32, 32, 120, 120, 120))
          Multimodal.MediaRow(id, AviMjpeg.mjpegAvi(frames, 32, 32, usPerFrame),
            Multimodal.MediaMeta("avi", 32, 32, n * usPerFrame / 1000L))
      }
    }
  }

  /** Deterministic REAL-WAV media table from the documents table, the
    * audio analog of [[pngMediaFromDocs]]: constant-amplitude PCM ⇒ the
    * decoded RMS is exactly amplitude/32768 and frames/duration follow
    * the id arithmetic — all recomputable by the oracle.
    */
  def wavMediaFromDocs(docs: DataFrame): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id")).as[Long].map { id =>
      val frames = (id % 400).toInt + 100
      val amp = ((id * 37) % 32768).toInt.toShort
      Multimodal.MediaRow(id, constWav(8000, frames, amp),
        Multimodal.MediaMeta("wav", 0, 0, frames * 1000L / 8000L))
    }
  }
}
