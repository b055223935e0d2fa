package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}

/** The composed training-data preparation pipeline: documents in →
  * deduplicated, decontaminated, quality-filtered, deterministically split
  * corpus out. Each stage is one of the individually-gated operators; this
  * is the composition a pretraining-data user actually runs, end to end:
  *
  *  0. (multimodal corpora) media-quality gate — run [[prepare]] over
  *     [[graft.multimodal.JdkMedia.mediaQualityGate]]'s output to keep
  *     only docs whose media blob REAL-decodes past the per-modality
  *     floors (image min-dim, audio/video min-duration);
  *  0.5. (optional) corpus-level paragraph dedup — CCNet's boilerplate
  *     removal, each distinct paragraph kept once corpus-wide;
  *  1. exact dedup (content-hash, min-id representative);
  *  2. near-dup clustering (MinHash-LSH pairs → connected components) with
  *     the QUALITY-argmax representative per cluster, not min-id — dup
  *     clusters should keep their best member;
  *  3. test-set decontamination (drop docs sharing any k-gram with the
  *     eval set — optional, on when `evalDocs` is given);
  *  4. quality floor (composite length/punct/stopword score);
  *  5. LM familiarity floor against a reference-slice bigram model
  *     (CCNet-style — optional, on when `lmRefDocs` is given);
  *  6. per-group relative quality gate (Gopher-style keep-top-fraction
  *     per source, map-only percentile threshold — optional);
  *  7. deterministic content-hash train/val split;
  *  8. temperature upsampling of small train strata toward the target mix
  *     (deterministic epoch-tagged repetition — optional; the val side is
  *     never repeated).
  *
  * Everything is a single declarative plan per stage; the near-dup stage
  * materializes its component table (see [[Dedup.connectedComponents]]).
  * At corpus scale, run stages as separate jobs writing intermediate
  * tables — the signature table and the component table are real
  * artifacts (the increment path [[Dedup.minHashLshPairsAgainst]] needs
  * the former on every batch). Downstream, [[TextAnalysis.packSequences]]
  * turns the train side into fixed-budget training sequences.
  */
object TrainingPipeline {

  /** @param minQuality   drop docs scoring below this (0 disables)
    * @param trainPct     content-hash split percentage for the train side
    * @param nearDupThreshold exact n-gram Jaccard cutoff for near-dup pairs
    * @param decontaminateK eval-overlap shingle size (8 ≈ the standard
    *                     n-gram-overlap decontamination window)
    * @param gateGroupCol per-group RELATIVE quality gate (Gopher-style):
    *                     when set, keep the top `gateKeepFrac` of each
    *                     group (e.g. source) by the pipeline's quality
    *                     column — map-only percentile-threshold flavor,
    *                     reusing the already-computed score
    * @param gateKeepFrac fraction each gate group keeps (1.0 disables)
    * @param minFamiliarity CCNet-style LM floor: drop docs whose
    *                     [[TextAnalysis.lmFamiliarity]] against
    *                     `lmRefDocs`' bigram model falls below this
    *                     (0 disables; requires `lmRefDocs` in [[prepare]])
    * @param upsampleStrataCol when set, temperature-upsample the TRAIN side
    *                     per this stratum column ([[TextAnalysis.upsample]]
    *                     with [[TextAnalysis.upsampleFactors]]): small
    *                     high-quality strata are repeated toward the
    *                     τ-target mix, epoch-tagged; every output row then
    *                     carries an `epoch` column (val rows always 0)
    * @param upsampleMaxFactor repetition cap for the upsample stage
    */
  final case class Config(
    shingleK: Int = 3,
    nearDupThreshold: Double = 0.5,
    margin: Double = 0.2,
    minQuality: Double = 0.0,
    trainPct: Int = 90,
    stopwords: Seq[String] = TextAnalysis.defaultStopwords,
    decontaminateK: Int = 8,
    gateGroupCol: Option[String] = None,
    gateKeepFrac: Double = 1.0,
    gateAccuracy: Int = 10000,
    minFamiliarity: Double = 0.0,
    upsampleStrataCol: Option[String] = None,
    upsampleTemperature: Double = 0.5,
    upsampleMaxFactor: Double = 8.0,
    upsampleSeed: Long = 3L,
    // text repair BEFORE any hashing: mojibake repair + Unicode NFC, so
    // canonically-identical spellings dedup/fingerprint together (both
    // map-only with already-clean fast paths — ~free on healthy corpora)
    preClean: Boolean = false,
    // model-based quality filter: when a labeled seed is passed to
    // prepare(), an integer perceptron trains on it and only docs the
    // model predicts +1 survive ([[LinearClassifier]]; voted flavor by
    // default — bit-deterministic on any cluster layout)
    classifierLabelCol: String = "y",
    classifierBuckets: Int = 4096,
    classifierEpochs: Int = 8,
    classifierVoted: Boolean = true,
    // CCNet-style corpus-level paragraph dedup BEFORE document-level
    // dedup: boilerplate (banners, navigation, footers) is removed from
    // every doc but its first carrier, and docs that were pure
    // boilerplate disappear — which also makes the document-level stages
    // see content, not chrome ([[TextAnalysis.dedupParagraphs]])
    paragraphDedup: Boolean = false,
    // INTRA-document repeated-line removal (the RefinedWeb pass) before
    // any corpus-level stage: map-only codegen scalar, shrinks what the
    // paragraph-dedup exchange carries ([[TextAnalysis.dedupLines]])
    lineDedup: Boolean = false,
    // the Gopher rule bundle as a drop stage (integer cross-multiplied
    // verdict, [[TextAnalysis.gopherFilter]]); bounds configurable
    gopherRules: Boolean = false,
    gopherMinWords: Long = 50L,
    gopherMaxWords: Long = 100000L,
    // C4-style PHRASE blocklist (Aho–Corasick, one text pass per doc
    // regardless of phrase count); empty = stage off
    blockPhrases: Seq[String] = Nil)

  /** Run the full preparation over `docs(idCol, textCol, …)`. Output keeps
    * the input columns and adds `quality` and `split` — plus `familiarity`
    * when the LM floor runs. `evalDocs`, when given, enables the
    * decontamination stage against that eval set; `lmRefDocs` is the LM
    * reference slice (required when `minFamiliarity` > 0).
    */
  def prepare(docs: DataFrame, idCol: String, textCol: String = "text",
              cfg: Config = Config(), evalDocs: Option[DataFrame] = None,
              lmRefDocs: Option[DataFrame] = None,
              classifierSeed: Option[DataFrame] = None): DataFrame =
    prepareImpl(docs, idCol, textCol, cfg, evalDocs, lmRefDocs,
      classifierSeed, (_, df) => df)

  /** [[prepare]] in AUDIT mode: additionally returns the drop ledger —
    * (stage, surviving rows) at every stage boundary, in pipeline order —
    * the number a curation run is actually judged by ("decontamination
    * dropped 4 %, the gate dropped 31 %"). Each audited stage is
    * `localCheckpoint`-ed and counted: the checkpoint both materializes
    * the stage (one cheap cached count) and TRUNCATES its lineage —
    * without truncation the pipeline's self-join stages grow the logical
    * plan multiplicatively and mere plan stringification can exhaust the
    * driver heap. The trade (vs [[prepare]], which keeps pure lineage):
    * checkpoint blocks are unrecoverable on executor loss, so a mid-audit
    * failure means rerunning the audit — acceptable for a diagnostic
    * pass, which is what this is. (`observe`-style free metrics are not
    * used because several stages are legitimately referenced twice in
    * the final plan and would double-count.) The returned frame is
    * checkpointed and already materialized; intermediate stage blocks
    * are released before returning.
    */
  def prepareAudited(docs: DataFrame, idCol: String, textCol: String = "text",
                     cfg: Config = Config(), evalDocs: Option[DataFrame] = None,
                     lmRefDocs: Option[DataFrame] = None,
                     classifierSeed: Option[DataFrame] = None)
      : (DataFrame, Seq[(String, Long)]) = {
    val ledger = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val staged = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val tap = (name: String, df: DataFrame) => {
      val p = df.localCheckpoint(true)
      ledger += name -> p.count()
      staged += p
      p
    }
    val out = prepareImpl(docs, idCol, textCol, cfg, evalDocs, lmRefDocs,
        classifierSeed, tap)
      .localCheckpoint(true)
    ledger += "final" -> out.count()
    // release the intermediate rungs: the final frame's lineage is
    // truncated to its own blocks, so nothing references them any more.
    // unpersist() here is best-effort (checkpoint blocks live at the RDD
    // layer, not the SQL cache manager); the guarantee is that once this
    // method returns, the rung RDDs are unreachable and the
    // ContextCleaner reclaims their blocks
    staged.foreach(_.unpersist())
    (out, ledger.toSeq)
  }

  private def prepareImpl(docs: DataFrame, idCol: String, textCol: String,
                          cfg: Config, evalDocs: Option[DataFrame],
                          lmRefDocs: Option[DataFrame],
                          classifierSeed: Option[DataFrame],
                          tap: (String, DataFrame) => DataFrame): DataFrame = {
    require(cfg.gateKeepFrac > 0.0 && cfg.gateKeepFrac <= 1.0,
      s"gateKeepFrac must be in (0, 1], got ${cfg.gateKeepFrac}")
    require(cfg.minFamiliarity == 0.0 || lmRefDocs.isDefined,
      "minFamiliarity > 0 requires lmRefDocs (the LM reference slice)")
    // text repair FIRST when enabled: every downstream stage hashes the
    // text (exact dedup, shingles, fingerprints, splits), so mojibake and
    // decomposed Unicode must be gone before the first hash or equivalent
    // docs land in different buckets
    val repaired =
      if (cfg.preClean)
        TextAnalysis.normalizeText(TextAnalysis.fixMojibake(docs, textCol), textCol)
      else docs
    // intra-doc line dedup after repair (lines must hash canonically),
    // before the corpus-level stages — map-only, no ledger tap needed
    // (it rewrites text, it never drops documents)
    val cleaned0 =
      if (cfg.lineDedup) TextAnalysis.dedupLines(repaired, textCol, textCol)
      else repaired
    // paragraph dedup AFTER text repair (paragraphs must hash canonically)
    // and BEFORE doc-level dedup (two docs differing only in boilerplate
    // become exact dups once the boilerplate is stripped)
    val cleaned =
      if (cfg.paragraphDedup)
        tap("paragraph_dedup",
          TextAnalysis.dedupParagraphs(cleaned0, idCol, textCol)
            .drop("n_kept", "n_total"))
      else cleaned0
    // quality is computed ONCE, before clustering: the same column orders
    // the keep-best window AND survives as the output score (recomputing
    // the three full-text scans inside the window ordering would double
    // the corpus-scan work and could drift from the emitted value)
    // cheap map-only drop gates BEFORE the dedup shuffles: the Gopher
    // rule bundle and the phrase blocklist shrink what every keyed
    // stage downstream carries
    val ruleGated0 =
      if (cfg.gopherRules)
        tap("gopher_rules",
          TextAnalysis.gopherFilter(cleaned, textCol,
            cfg.gopherMinWords, cfg.gopherMaxWords)
            .where(col("gopher_keep"))
            .drop("n_words", "sum_word_len", "n_alpha_words", "n_hash",
              "n_ellipsis", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
              "n_stop_hits", "gopher_keep"))
      else cleaned
    val ruleGated =
      if (cfg.blockPhrases.nonEmpty)
        tap("phrase_blocklist",
          TextAnalysis.phraseBlocklistFilter(ruleGated0, cfg.blockPhrases, textCol))
      else ruleGated0
    val exact = tap("exact_dedup", Dedup.dropExactDups(ruleGated, idCol, textCol)
      .withColumn("quality", F.qualityScore(col(textCol), cfg.stopwords)))
    val pairs = Dedup.minHashNearDupsExact(exact, idCol, textCol,
      cfg.shingleK, cfg.nearDupThreshold, cfg.margin)
      .select(col("id_a"), col("id_b"))
    val canonical = tap("near_dup_keep_best",
      Dedup.keepBestPerGroup(exact, idCol, pairs, col("quality")))
    // decontaminate after dedup: the contaminated-id scan then runs over
    // the already-shrunk canonical set, and a dup cluster whose survivor
    // overlaps the eval set is dropped wholesale (its members were dups of
    // a contaminated doc)
    val decontaminated = evalDocs match {
      case Some(ev) => tap("decontaminated",
        TextAnalysis.decontaminate(canonical, ev, idCol, cfg.decontaminateK, textCol))
      case None => canonical
    }
    val filtered =
      if (cfg.minQuality > 0.0)
        tap("quality_floor", decontaminated.where(col("quality") >= cfg.minQuality))
      else decontaminated
    // model-based quality filter: train on the labeled seed (one-time,
    // bounded driver state = the weight vector), keep docs predicted +1 —
    // map-only scoring, so the stage adds no shuffle to the pipeline
    val modelFiltered = classifierSeed match {
      case Some(seedDf) =>
        val model =
          if (cfg.classifierVoted)
            LinearClassifier.trainVotedPerceptron(seedDf, idCol,
              cfg.classifierLabelCol, cfg.classifierBuckets,
              cfg.classifierEpochs, textCol)
          else
            LinearClassifier.trainPerceptron(seedDf, idCol,
              cfg.classifierLabelCol, cfg.classifierBuckets,
              cfg.classifierEpochs, textCol)
        tap("classifier_gate",
          LinearClassifier.score(filtered, model, textCol)
            .where(col("pred") === 1).drop("score", "pred"))
      case None => filtered
    }
    val lmStage = lmRefDocs.isDefined && cfg.minFamiliarity > 0.0
    val gateStage = cfg.gateGroupCol.isDefined && cfg.gateKeepFrac < 1.0
    // the optional stages reference their input MULTIPLE times (the LM
    // scorer twice + its join-back, the gate's threshold agg + filter);
    // without a stage boundary each reference re-executes the whole
    // dedup→keep-best→decontaminate lineage. persist, not localCheckpoint:
    // checkpoint blocks are non-replicated and unrecoverable on executor
    // loss, while a persisted partition recomputes from lineage — this and
    // the split materialization below must agree or the recoverability
    // claim is only as strong as the weaker point. At corpus scale write
    // the intermediate table instead (see the object doc)
    val base =
      if (lmStage || gateStage)
        modelFiltered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else modelFiltered
    // CCNet-style LM floor: model table from the reference slice (small by
    // construction → broadcast), score the survivors, drop the unfamiliar
    val familiar =
      if (lmStage) {
        val lm = TextAnalysis.bigramCounts(lmRefDocs.get, textCol)
        val fam = TextAnalysis.lmFamiliarity(
          base.select(col(idCol), col(textCol)), lm, idCol, textCol)
          .select(col(idCol), col("familiarity"))
        tap("lm_floor", base.join(fam, Seq(idCol))
          .where(col("familiarity") >= cfg.minFamiliarity))
      } else base
    // per-group relative gate reusing the pipeline's own quality column
    // (no re-score) — one shared implementation with qualityGateApprox,
    // null-safe on the group key
    val gated = cfg.gateGroupCol match {
      case Some(g) if gateStage =>
        tap("group_gate",
          TextAnalysis.gateScoredByGroup(familiar, g, cfg.gateKeepFrac, cfg.gateAccuracy))
      case _ => familiar
    }
    val split = TextAnalysis.hashSplit(gated, cfg.trainPct, textCol)
    cfg.upsampleStrataCol match {
      case Some(sc) =>
        // factors come from the FINAL train mix (post-gates, post-split) —
        // counting an earlier stage would correct toward a mix that no
        // longer exists. The stage references `split` three times (factor
        // count, train side, val side): materialize it once. persist (not
        // localCheckpoint) so a lost executor recomputes the partition from
        // lineage instead of failing the job — checkpoint blocks are
        // non-replicated and unrecoverable on a real cluster.
        val mat = split.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val train = mat.where(col("split") === "train")
        val factors = TextAnalysis.upsampleFactors(train, sc,
          cfg.upsampleTemperature, cfg.upsampleMaxFactor)
        // plumb the configured cap through as upsample's repeat bound —
        // otherwise any upsampleMaxFactor above upsample's default
        // maxRepeat (16) would be an unusable configuration that throws
        TextAnalysis.upsample(train, sc, factors, cfg.upsampleSeed,
          maxRepeat = math.max(16, math.ceil(cfg.upsampleMaxFactor).toInt),
          textCol = textCol)
          .unionByName(mat.where(col("split") =!= "train")
            .withColumn("epoch", lit(0)))
      case None => split
    }
  }

  // ------------------------------------------------------- release layer

  private def splitStats(df: DataFrame, textCol: String): String =
    df.groupBy("split")
      .agg(count(lit(1)).as("n"),
        sum(crc32(col(textCol))).as("fp"),
        sum(F.tokenCount(col(textCol))
          .cast(org.apache.spark.sql.types.LongType)).as("toks"))
      .collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}:${r.getLong(2)}:${r.getLong(3)}")
      .sorted.mkString(",")

  /** Publish the prepared corpus as a verifiable RELEASE: data written
    * split-partitioned under a generation dir, then a `_DATASET.json`
    * manifest (atomic rename, written LAST) carrying per-split row/
    * token counts, an order-insensitive content fingerprint (sum of
    * crc32(text) — bounded at 2^32 per row, no overflow below ~2^31
    * rows per split) and the audit ledger. The stats are computed from
    * what LANDED (read back), not from the input plan — the manifest
    * describes the files, not the intent. A crash before the manifest
    * leaves an unreferenced gen dir, never a half-described release.
    */
  def writeRelease(data: DataFrame, root: String, textCol: String = "text",
                   ledger: Seq[(String, Long)] = Nil): String = {
    require(data.columns.contains("split"),
      "release data must carry the split column (run prepare() first)")
    require(data.columns.contains(textCol), s"no column $textCol")
    val spark = data.sparkSession
    val gen = s"gen-${System.currentTimeMillis()}-" +
      java.util.UUID.randomUUID().toString.take(8)
    data.write.partitionBy("split").parquet(s"$root/$gen/data")
    val splits = splitStats(spark.read.parquet(s"$root/$gen/data"), textCol)
    val ledgerStr = ledger.map { case (k, v) => s"$k=$v" }.mkString(",")
    // fp_version: the train/val membership is DERIVED from the content
    // fingerprint (hashSplit), so a release is only interpretable under
    // the arithmetic that cut it — an incremental pipeline straddling a
    // fingerprint bump would otherwise migrate documents between train
    // and test (holdout leakage) with no error anywhere
    Manifests.writeAtomic(spark, s"$root/_DATASET.json",
      s"""{"generation":"$gen","textCol":"$textCol",""" +
        s""""fp_version":${F.FingerprintVersion},""" +
        s""""splits":"$splits","ledger":"$ledgerStr"}""")
    gen
  }

  /** Open a release and RE-VERIFY it against its manifest: per-split
    * row count, token count and content fingerprint must all match, or
    * the read fails loudly — a torn copy, a lost partition or silent
    * data drift is an error, never silently-different training data.
    */
  def readRelease(spark: org.apache.spark.sql.SparkSession,
                  root: String): DataFrame = {
    val m = Manifests.read(spark, s"$root/_DATASET.json").getOrElse(
      throw new IllegalStateException(s"no _DATASET.json under $root"))
    val fpv = try Manifests.numField(m, "fp_version").toInt catch {
      case e: IllegalStateException => throw new IllegalStateException(
        s"release $root predates fingerprint versioning (current " +
          s"v${F.FingerprintVersion}): its train/val split was cut under " +
          "unknown fingerprint arithmetic — appending or re-splitting " +
          "against it can migrate documents across the holdout boundary; " +
          "re-release from source", e)
    }
    require(fpv == F.FingerprintVersion,
      s"release $root was split under fingerprint v$fpv but this build " +
        s"runs v${F.FingerprintVersion} — the same document now maps to a " +
        "different split, so mixing them leaks holdout data; re-release " +
        "from source (or pin the engine version that cut it)")
    val gen = Manifests.strField(m, "generation")
    val textCol = Manifests.strField(m, "textCol")
    val expected = Manifests.strField(m, "splits")
    val df = spark.read.parquet(s"$root/$gen/data")
    val got = splitStats(df, textCol)
    if (got != expected)
      throw new IllegalStateException(
        s"release $root/$gen fails verification:\n  manifest: $expected\n  on disk:  $got")
    df
  }
}
