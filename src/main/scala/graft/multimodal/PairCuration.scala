package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextExpressions, Functions => F}
import graft.operators.Dedup

/** Cross-modal (image, caption) pair curation — the LAION-shape
  * image-text gate composed from the engine's per-modality pieces into
  * ONE audited pipeline: a pair survives only if its IMAGE decodes and
  * wins its perceptual near-dup group AND its CAPTION passes the text
  * gates and is the first carrier of its content.
  *
  * Stage order (each tapped into the ledger, q_pipeline_full-style):
  *   1. `input`          — the pair count in.
  *   2. `image_decode`   — undecodable image payloads drop; the decode
  *                         runs ONCE per image and yields everything the
  *                         later stages need ([[JdkMedia.phashFeatureRows]]:
  *                         the 63-bit DCT pHash + the 4×4 verify grid),
  *                         so no stage ever re-touches the bytes.
  *   3. `caption_quality` — whitespace-token count inside
  *                         [minCaptionTokens, maxCaptionTokens] and zero
  *                         blocklist-phrase hits (Aho–Corasick, one text
  *                         pass regardless of phrase count). Runs BEFORE
  *                         the near-dup exchange so the banding only
  *                         carries rows that could survive.
  *   4. `image_neardup_keep_best` — perceptual collapse keyed by the
  *                         IMAGE: pHash-banded candidates verified by
  *                         mean-gap + centered cosine (the shared
  *                         [[JdkMedia.bandedCenteredPairs]] core), then
  *                         one keep-best per connected group — the
  *                         surviving pair is the one with the LONGEST
  *                         caption (ties → min id), the standard "keep
  *                         the best-captioned copy" rule.
  *   5. `final`          — exact caption dedup: among survivors, the
  *                         min-id pair per identical caption content
  *                         (keyed by a 128-bit caption hash pair).
  *
  * Scale shape: after stage 2 every exchange carries only
  * (id, caption, hash, 16 doubles) — the image BYTES never shuffle; the
  * banding join is id-only with per-bucket caps; the collapse is the
  * connected-components label loop plus one partial-aggregated `min_by`
  * over the component key; the caption dedup is one partial-aggregated
  * exchange on a 128-bit caption hash pair (never the raw caption
  * bytes, which are Zipf-heavy). Callers that need the full original
  * rows semi-join the survivor ids back (id-only), exactly like the
  * release layer.
  */
object PairCuration {

  /** @param minCaptionTokens  whitespace-token floor for captions
    * @param maxCaptionTokens  token ceiling (alt-text spam / runaway
    *                          scrapes)
    * @param blockPhrases      C4-style phrase blocklist (empty = off)
    * @param threshold         centered-cosine floor for the image verify
    * @param meanTol           luma mean-gap tolerance for the image verify
    * @param maxBucket         per-band bucket cap for the candidate join
    * @param maxHamming        pHash Hamming tolerance the banding covers
    */
  final case class Config(
      minCaptionTokens: Int = 4,
      maxCaptionTokens: Int = 512,
      blockPhrases: Seq[String] = Nil,
      threshold: Double = 0.98,
      meanTol: Double = 4.0,
      maxBucket: Int = 100000,
      maxHamming: Int = 1)

  /** Curate `pairs(idCol, imageCol: binary, captionCol: string, …)`.
    * Returns the survivor frame `(idCol, captionCol, phash)` plus the
    * per-stage ledger — survivors carry the pHash so downstream serving
    * (e.g. an incremental pair store) can band against it without
    * re-decoding.
    */
  def curatePairsAudited(pairs: DataFrame, idCol: String,
                         imageCol: String = "image",
                         captionCol: String = "caption",
                         cfg: Config = Config())
      : (DataFrame, Seq[(String, Long)]) = {
    val (out, ledger) = curateCore(pairs, idCol, imageCol, captionCol, cfg)
    (out.select(col(idCol), col(captionCol), col("ahash").as("phash")), ledger)
  }

  /** The full curation pass with the survivors' PERCEPTUAL FEATURES kept
    * (`ahash, mean, centered, norm0` — everything
    * [[JdkMedia.bandedCenteredPairs]]-shaped serving needs), so the
    * incremental store ([[IncrementalPairs]]) can band and verify new
    * batches against history without re-decoding a single image.
    * [[curatePairsAudited]] is this minus the feature columns.
    */
  private[multimodal] def curateCore(pairs: DataFrame, idCol: String,
                                     imageCol: String, captionCol: String,
                                     cfg: Config)
      : (DataFrame, Seq[(String, Long)]) = {
    require(cfg.minCaptionTokens >= 1 &&
      cfg.maxCaptionTokens >= cfg.minCaptionTokens,
      s"caption token bounds must satisfy 1 <= min <= max, got " +
        s"[${cfg.minCaptionTokens}, ${cfg.maxCaptionTokens}]")
    val spark = pairs.sparkSession
    import spark.implicits._

    val ledger = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val staged = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def tap(name: String, df: DataFrame): DataFrame = {
      val p = df.localCheckpoint(true)
      ledger += name -> p.count()
      staged += p
      p
    }

    // decode ONCE; from here on the pipeline is slim rows only
    val media = pairs
      .select(col(idCol).cast(LongType), col(imageCol))
      .as[(Long, Array[Byte])]
      .map { case (i, c) =>
        Multimodal.MediaRow(i, c, Multimodal.MediaMeta("unknown", 0, 0, 0L))
      }
    val feats = JdkMedia.phashFeatureRows(media)
    val slim = pairs.select(col(idCol), col(captionCol))
      .join(feats.withColumnRenamed("id", idCol), Seq(idCol))

    val input = tap("input", slim)
    val decoded = tap("image_decode", input.where(col("ok")).drop("ok"))

    val nTok: Column = F.tokenCount(col(captionCol))
    val qualityPred: Column = {
      val inBounds = nTok.between(cfg.minCaptionTokens, cfg.maxCaptionTokens)
      if (cfg.blockPhrases.isEmpty) inBounds
      else inBounds &&
        TextExpressions.phrase_matches(col(captionCol), cfg.blockPhrases) === 0
    }
    val quality = tap("caption_quality", decoded.where(qualityPred))

    val candidates = JdkMedia.bandedCenteredPairs(
      quality.select(col(idCol).as("id"), col("ahash"), col("mean"),
        col("centered"), col("norm0")),
      bits = 64, maxHamming = cfg.maxHamming, maxBucket = cfg.maxBucket,
      threshold = cfg.threshold, meanTol = cfg.meanTol)
    val collapsed = tap("image_neardup_keep_best",
      Dedup.keepBestPerGroup(quality, idCol, candidates,
        scoreCol = nTok.cast(LongType)))

    // Caption-exact keep-one via the engine's exact-dedup discipline:
    // group on a 128-bit caption hash PAIR (caption strings are Zipf-heavy
    // at LAION scale — "stock photo"-class heads repeat 10^6-10^7 times,
    // and raw caption bytes should never be a shuffle key), keep min id
    // with map-side partial aggregation. A row_number() window here would
    // funnel every copy of a hot caption into one task.
    val out = tap("final", Dedup.dropExactDups(
        collapsed.select(col(idCol), col(captionCol), col("ahash"),
          col("mean"), col("centered"), col("norm0")),
        idCol, captionCol))
    staged.dropRight(1).foreach(_.unpersist())
    (out, ledger.toSeq)
  }

  // ------------------------------------------------------ release layer

  private def pairStats(pairs: DataFrame, idCol: String, imageCol: String,
                        captionCol: String): String = {
    val r = pairs.agg(
      count(lit(1)).as("n"),
      coalesce(sum(graft.functions.Functions.tokenCount(col(captionCol))
        .cast(LongType)), lit(0L)).as("toks"),
      coalesce(sum(crc32(col(captionCol))), lit(0L)).as("cap_fp"),
      coalesce(sum(crc32(col(imageCol))), lit(0L)).as("img_fp")).head()
    s"${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}:${r.getLong(3)}"
  }

  /** Publish curated pairs as a verifiable RELEASE — the multimodal
    * counterpart of [[graft.operators.TrainingPipeline.writeRelease]]:
    * image blobs above `inlineMax` are externalized into per-partition
    * pack files ([[Multimodal.packBlobs]] — parquet rows stay slim, one
    * sequential pack read per partition at training time), the pair
    * table (id, caption, pointer) lands as parquet, and the manifest
    * records `n : caption-token sum : caption-crc32 sum : image-crc32
    * sum` computed from a full READ-BACK (pointer resolution included),
    * so a torn pack or lost partition is caught at publish time.
    * [[readPairRelease]] re-verifies the same stats on every open.
    */
  def writePairRelease(pairs: DataFrame, root: String,
                       idCol: String = "pair_id",
                       imageCol: String = "image",
                       captionCol: String = "caption",
                       inlineMax: Int = 1 << 16): String = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val gen = s"gen-${System.currentTimeMillis()}-" +
      java.util.UUID.randomUUID().toString.take(8)
    val media = pairs
      .select(col(idCol).cast(LongType), col(imageCol))
      .as[(Long, Array[Byte])]
      .map { case (i, b) =>
        Multimodal.MediaRow(i, b, Multimodal.MediaMeta("unknown", 0, 0, 0L))
      }
    Multimodal.packBlobs(media, s"$root/$gen/packs", inlineMax)
      .toDF()
      .select(col("media_id").as(idCol), col("content"), col("ref"), col("meta"))
      .join(pairs.drop(imageCol), Seq(idCol))
      .write.parquet(s"$root/$gen/data")
    // stats from the read-back THROUGH the pointers: the manifest
    // witnesses the bytes a reader will actually get
    val stats = pairStats(openPairData(spark, root, gen, idCol, imageCol),
      idCol, imageCol, captionCol)
    graft.operators.Manifests.writeAtomic(spark, s"$root/_PAIRS.json",
      s"""{"generation":"$gen","idCol":"$idCol","imageCol":"$imageCol",""" +
        s""""captionCol":"$captionCol","pairs":"$stats"}""")
    gen
  }

  private def openPairData(spark: org.apache.spark.sql.SparkSession,
                           root: String, gen: String, idCol: String,
                           imageCol: String): DataFrame = {
    import spark.implicits._
    val data = spark.read.parquet(s"$root/$gen/data")
    val resolved = Multimodal.resolveBlobs(
        data.select(col(idCol).as("media_id"), col("content"), col("ref"),
          col("meta")).as[Multimodal.PackedMediaRow])
      .toDF()
      .select(col("media_id").as(idCol), col("content").as(imageCol))
    data.drop("content", "ref", "meta").join(resolved, Seq(idCol))
  }

  /** Open a pair release and RE-VERIFY it against its manifest (count,
    * caption tokens, caption and image crc32 sums over the
    * pointer-resolved bytes) — a torn pack, a swept-too-early blob or a
    * lost partition fails loudly, never silently-different pairs.
    */
  def readPairRelease(spark: org.apache.spark.sql.SparkSession,
                      root: String): DataFrame = {
    val m = graft.operators.Manifests.read(spark, s"$root/_PAIRS.json")
      .getOrElse(throw new IllegalStateException(s"no _PAIRS.json under $root"))
    val gen = graft.operators.Manifests.strField(m, "generation")
    val idCol = graft.operators.Manifests.strField(m, "idCol")
    val imageCol = graft.operators.Manifests.strField(m, "imageCol")
    val captionCol = graft.operators.Manifests.strField(m, "captionCol")
    val expected = graft.operators.Manifests.strField(m, "pairs")
    val df = openPairData(spark, root, gen, idCol, imageCol)
    val got = pairStats(df, idCol, imageCol, captionCol)
    if (got != expected)
      throw new IllegalStateException(
        s"pair release $root/$gen fails verification:\n" +
          s"  manifest: $expected\n  on disk:  $got")
    df
  }
}
