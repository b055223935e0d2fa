package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Design for 100 TB: media bytes ride in a single BinaryType column of a
  * Parquet table (or pointers to object storage when blobs exceed row-group
  * sanity); metadata is a typed struct so planning-time predicates
  * (format, width, duration) prune row groups WITHOUT touching the bytes —
  * Parquet column pruning means `WHERE meta.format = 'png'` never reads the
  * blob column. Decode runs partition-parallel via `mapPartitions` over a
  * typed Dataset (the Scala analog of Python's mapInPandas: batch-shaped,
  * schema-stable, executor-local).
  *
  * Codec status: image (PNG/JPEG/BMP/GIF incl. animated frames) and PCM
  * audio (WAV/AIFF/AU) decode for REAL via the JDK's own codecs
  * ([[JdkMedia]]); video container metadata probes for real
  * ([[Mp4Probe]], [[AviMjpeg.probe]]) and MJPEG-in-AVI frames (plain
  * JPEGs) plus all three DIB-in-AVI flavors (raw 24-bit BGR, 8-bit
  * palettized, RLE8 — byte arithmetic, no codec at all) decode for real
  * ([[AviMjpeg.decodeVideoFrames]]).
  * Only INTER-FRAME compressed video codecs (H.264/VP9/AV1) remain behind
  * the deterministic `FakeCodec` stub — the JDK ships no decoder for
  * those — which still pins the Spark-side plumbing: schema,
  * partitioning, batch shape and null/corrupt handling.
  */
object Multimodal {

  /** The doc-id stream every deterministic media fixture maps its encoder
    * over, FANNED OUT to the session's shuffle parallelism (r15, guide
    * §2.5 input skew): the documents table is one parquet file at bench
    * scale, so the `.as[Long].map(encode)` fixtures — and the decode
    * chains fused onto them — otherwise run as ONE task (JobProfile:
    * q_video_frames spent its whole wall in two single-task jobs). The
    * repartition moves 8 bytes/row; the encode/decode work it spreads is
    * orders of magnitude heavier at any scale, and content is a pure
    * function of the id, so results are identical under any layout.
    */
  private[graft] def fanOutIds(docs: DataFrame): Dataset[Long] = {
    import org.apache.spark.sql.Encoders
    graft.operators.Dedup.fanout(docs.select(col("doc_id")), col("doc_id"))
      .as(Encoders.scalaLong)
  }

  /** Typed metadata carried next to the blob. */
  final case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

  /** A media row: id + opaque bytes + typed metadata. */
  final case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)

  /** Decoded features emitted by the (stubbed) decoder. */
  final case class MediaFeatures(
      media_id: Long,
      ok: Boolean,
      n_bytes: Int,
      byte_entropy_q: Double,   // quantized entropy proxy from the fake codec
      feature: Array[Float])    // fixed-size feature vector

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false))), nullable = true)))

  val FeatureDim = 16

  /** Deterministic stand-in for decoders the JDK does not ship (inter-frame
    * video codecs — see the object scaladoc for what decodes for real). A
    * real deployment swaps `decodeOne` for the codec call (??? boundary);
    * the Spark-side contract — per-partition batching, nullable-corrupt
    * rows, fixed feature dim — is what the engine guarantees.
    */
  object FakeCodec {
    def decodeOne(id: Long, bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.isEmpty)
        return MediaFeatures(id, ok = false, 0, 0.0, Array.fill(FeatureDim)(0.0f))
      // entropy proxy: distinct-byte ratio, deterministic
      val distinct = bytes.distinct.length.toDouble / math.min(bytes.length, 256)
      val feat = Array.tabulate(FeatureDim) { i =>
        var h = 1125899906842597L
        var j = i
        while (j < bytes.length) { h = 31 * h + bytes(j); j += FeatureDim }
        (h % 1000).toFloat / 1000.0f
      }
      MediaFeatures(id, ok = true, bytes.length, math.rint(distinct * 1000) / 1000, feat)
    }
  }

  /** Feature extraction: partition-parallel decode of the blob column.
    * Batch-shaped like mapInPandas — one iterator per partition, constant
    * memory, no driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(r => FakeCodec.decodeOne(r.media_id, r.content)) }
  }

  /** "Resize" stage: a metadata-only transform — rewrites the meta struct
    * and truncates the blob deterministically (stub for the real resample).
    */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val m = r.meta
      val scale = if (math.max(m.width, m.height) <= maxDim) 1.0
        else maxDim.toDouble / math.max(m.width, m.height)
      val nw = math.max(1, (m.width * scale).toInt)
      val nh = math.max(1, (m.height * scale).toInt)
      val nBytes = if (r.content == null) null
        else r.content.take(math.max(1, (r.content.length * scale * scale).toInt))
      MediaRow(r.media_id, nBytes, m.copy(width = nw, height = nh))
    }
  }

  /** Frame sampling for video-ish blobs: emit one row per sampled "frame"
    * (deterministic offsets), exploding by a computed array — the Spark
    * shape of frame extraction (flatMap, partition-local).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.max(1, (r.meta.durationMs / math.max(1L, everyMs)).toInt)
      (0 until math.min(n, 64)).map { i =>
        val off = if (r.content == null || r.content.isEmpty) 0
          else (i.toLong * 2654435761L % math.max(1, r.content.length)).toInt
        (r.media_id, i, i * everyMs, off)
      }
    }.toDF("media_id", "frame_idx", "frame_ts_ms", "byte_offset")
  }

  // --------------------------------------------- blob pointers (scale path)

  /** Pointer to an externally-stored blob: object + byte range. */
  final case class BlobRef(uri: String, offset: Long, length: Int)

  /** A media row whose blob may be inline (small) or external (large). */
  final case class PackedMediaRow(
      media_id: Long, content: Array[Byte], ref: Option[BlobRef], meta: MediaMeta)

  /** Externalize blobs above `inlineMax` bytes: each partition appends its
    * large blobs to one pack file (`packDir/pack-<pid>.bin`) and emits a
    * (uri, offset, length) pointer; small blobs stay inline. This is the
    * "pointers to object storage when blobs exceed row-group sanity" path:
    * the parquet table keeps row groups small and metadata predicates never
    * drag multi-MB byte ranges through the scan. One pack file per TASK
    * ATTEMPT (`pack-<pid>-<attemptId>.bin`) ⇒ no write contention,
    * sequential appends, and — critically — a speculative duplicate or
    * retried attempt of the same partition writes its OWN file instead of
    * truncating the one the winning attempt's BlobRefs point into
    * (file:// and s3a:// have no lease to stop a concurrent second
    * writer). Losing attempts leave orphan pack files; they cost space,
    * not correctness — sweep files not referenced by the committed pointer
    * table. Works on any Hadoop filesystem (file:// in tests,
    * hdfs:///s3a:// in production).
    *
    * Materialize the result (write the pointer table to parquet, or cache
    * it) before resolving: packBlobs has a write side effect, so a lazy
    * recomputation would rewrite the pack files mid-read.
    */
  def packBlobs(media: Dataset[MediaRow], packDir: String, inlineMax: Int): Dataset[PackedMediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      // attempt-unique name: concurrent attempts of one partition must never
      // share a file (UUID fallback covers the no-TaskContext local case)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(tc => tc.taskAttemptId().toString)
        .getOrElse(java.util.UUID.randomUUID().toString.take(8))
      val path = new org.apache.hadoop.fs.Path(s"$packDir/pack-$pid-$attempt.bin")
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      var offset = 0L
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => if (out != null) out.close()))
      it.map { r =>
        if (r.content != null && r.content.length > inlineMax) {
          if (out == null) {
            val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
            out = fs.create(path, false)
          }
          val off = offset
          out.write(r.content)
          offset += r.content.length
          PackedMediaRow(r.media_id, null, Some(BlobRef(path.toString, off, r.content.length)), r.meta)
        } else PackedMediaRow(r.media_id, r.content, None, r.meta)
      }
    }
  }

  /** Sweep orphan pack files: delete `pack-*.bin` files under `packDir`
    * that no committed pointer references (the files losing/speculative
    * task attempts left behind — [[packBlobs]] gives every attempt its own
    * file precisely so the losers are deletable garbage, not corruption).
    * `packed` must be the COMMITTED pointer table (read back from its
    * parquet location, not the lazy packBlobs plan — re-evaluating that
    * plan would write fresh pack files while this sweeps).
    *
    * The referenced-uri set is one distinct over a string column collected
    * to the driver — bounded by #successful tasks, not by rows. Returns
    * the deleted paths.
    */
  def sweepOrphanPacks(packed: Dataset[PackedMediaRow], packDir: String): Seq[String] = {
    val referenced = packed.select("ref.uri").where(col("ref").isNotNull)
      .distinct().collect().map(_.getString(0))
      .map(u => new org.apache.hadoop.fs.Path(u).toUri.getPath).toSet
    val dir = new org.apache.hadoop.fs.Path(packDir)
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("pack-") && p.getName.endsWith(".bin"))
      .filterNot(p => referenced.contains(p.toUri.getPath))
      .map { p => fs.delete(p, false); p.toString }
  }

  /** Re-inline external blobs by positioned reads against the pack files —
    * one open stream per (partition, uri), `readFully(offset)` per row, so
    * a selective downstream (metadata predicates pruned BEFORE resolving)
    * fetches only the byte ranges it actually needs.
    */
  def resolveBlobs(packed: Dataset[PackedMediaRow]): Dataset[MediaRow] = {
    import packed.sparkSession.implicits._
    packed.mapPartitions { it =>
      val streams = scala.collection.mutable.Map.empty[String, org.apache.hadoop.fs.FSDataInputStream]
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => streams.values.foreach(_.close())))
      it.map { r =>
        r.ref match {
          case None => MediaRow(r.media_id, r.content, r.meta)
          case Some(ref) =>
            val in = streams.getOrElseUpdate(ref.uri, {
              val p = new org.apache.hadoop.fs.Path(ref.uri)
              p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
            })
            val buf = new Array[Byte](ref.length)
            in.readFully(ref.offset, buf)
            MediaRow(r.media_id, buf, r.meta)
        }
      }
    }
  }

  /** Build a deterministic fake media table from the documents table (test
    * fixture path: text bytes stand in for media bytes).
    */
  def fakeMediaFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, n) =>
        MediaRow(id, text.getBytes("UTF-8"),
          MediaMeta(if (id % 3 == 0) "png" else "jpg", (n % 640).toInt + 1, ((n * 7) % 480).toInt + 1, n * 40))
      }
  }
}
