package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Manifests

/** STREAMING cross-modal pair curation — [[PairCuration.curatePairsAudited]]
  * per micro-batch, with admission AGAINST HISTORY: a pair survives only
  * if it passes the batch-local gates AND its image matches nothing the
  * store has admitted before AND its caption content is unseen.
  *
  * The store is one `history/` parquet table per root:
  * `(batch_id, id, ahash, mean, centered, norm0, cap_h, cap_h2)` — the
  * survivors' decode-once perceptual features (exactly what
  * [[JdkMedia.bandedCenteredPairs]]-shaped serving needs; images are
  * NEVER re-decoded and never stored here) plus the 128-bit caption hash
  * pair (the exact-dedup key discipline — caption bytes are not needed
  * to refuse a re-arrival).
  *
  * Scale shape per batch: the batch side of both history checks is
  * broadcast (micro-batches are small by construction), so history is
  * two MAP-ONLY scans — no corpus-keyed exchange anywhere; the image
  * check needs no bucket cap (an oversized band bucket costs linear
  * verify work inside the scan, and the output collapses to ≤ batch-size
  * matched ids).
  *
  * REPLAY IDEMPOTENCE — the [[graft.streaming.StreamingTokenBudget]]
  * discipline, not dedup algebra: `_PAIRSTATE` records the committed
  * batch high-water mark and is flipped atomically LAST, and every
  * history READ is filtered to `batch_id <= committed`. A replay of a
  * fully committed batch SKIPS (no double admit, no re-append); a replay
  * after a crash mid-write recomputes against exactly the committed
  * prefix — the crashed attempt's partial appends are invisible to the
  * filter — and re-runs the same writes (the accepted table is
  * AT-LEAST-ONCE like every sink here, dedup downstream on id; a
  * re-appended history row is a harmless duplicate for membership
  * checks, reclaimable by maintenance compaction). Single writer per
  * root, which foreachBatch guarantees.
  */
object IncrementalPairs {

  val StateName = "_PAIRSTATE"

  def committedBatchId(spark: SparkSession, root: String): Option[Long] =
    Manifests.read(spark, s"$root/$StateName")
      .map(m => Manifests.numField(m, "batch_id").toLong)

  private def historySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("batch_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ahash", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("mean", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("centered",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
    org.apache.spark.sql.types.StructField("norm0", org.apache.spark.sql.types.BooleanType),
    org.apache.spark.sql.types.StructField("cap_h", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cap_h2", org.apache.spark.sql.types.LongType)))

  /** The COMMITTED history snapshot: rows of batches at or below the
    * high-water mark. A crashed attempt's partial appends carry a
    * batch_id above it and are invisible — this is what makes replay
    * recompute the identical admission set.
    */
  private def committedHistory(spark: SparkSession, root: String,
                               committed: Option[Long]): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$root/history")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hwm = committed.getOrElse(-1L)
    if (hwm < 0)
      spark.createDataFrame(new java.util.ArrayList[Row](), historySchema)
    else {
      // a committed high-water mark with NO history dir is provably
      // inconsistent (every committed batch appended its survivors
      // before the flip — unless it admitted zero rows, in which case
      // parquet wrote the dir anyway). Treating it as empty would
      // silently re-admit every duplicate of everything ever admitted;
      // the one legitimate cause is a compactHistory crash mid-swap,
      // whose recoverable copy this names.
      require(fs.exists(path),
        s"$root/$StateName records committed batch $hwm but $path does not " +
          s"exist — if $path.compact_old exists, a compactHistory crashed " +
          "mid-swap: restore it (rename back) or run compactHistory again " +
          "(it self-heals); otherwise the store is corrupt")
      spark.read.parquet(path.toString).where(col("batch_id") <= hwm)
    }
  }

  /** Curate one micro-batch against the store at `root`, appending
    * admitted pairs `(idCol, captionCol, phash)` to `acceptedPath` and
    * their features to the history. Returns the batch ledger (the
    * [[PairCuration.curatePairsAudited]] stages plus
    * `history_image_dup` / `history_caption_dup` / `admitted`), or
    * `replay_skipped -> batchId` when the batch is already committed.
    */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   acceptedPath: String, idCol: String = "pair_id",
                   imageCol: String = "image", captionCol: String = "caption",
                   cfg: PairCuration.Config = PairCuration.Config())
      : Seq[(String, Long)] = {
    require(batchId >= 0, s"batchId must be non-negative, got $batchId")
    val spark = batch.sparkSession
    val committed = committedBatchId(spark, root)
    if (committed.exists(batchId <= _))
      return Seq("replay_skipped" -> batchId)

    val (curated0, ledger) = PairCuration.curateCore(
      batch, idCol, imageCol, captionCol, cfg)
    try {
      val curated = curated0
        .withColumn("cap_h", xxhash64(col(captionCol)))
        .withColumn("cap_h2", xxhash64(lit(1L), col(captionCol)))
      val history = committedHistory(spark, root, committed)

      // image leg: banded broadcast-batch match against history features.
      // Both dup frames are MATERIALIZED (≤ batch-size id lists) so the
      // ledger counts and the anti-joins below share ONE history scan per
      // leg — lazily they would each re-scan the corpus-sized history.
      val imageDups = JdkMedia.bandedCenteredMatchesAgainst(
        curated.select(col(idCol).as("id"), col("ahash"), col("mean"),
          col("centered"), col("norm0")),
        history.select(col("id"), col("ahash"), col("mean"), col("centered"),
          col("norm0")),
        bits = 64, maxHamming = cfg.maxHamming, threshold = cfg.threshold,
        meanTol = cfg.meanTol).localCheckpoint(true)
      // caption leg: 128-bit hash-pair membership, history scanned
      // map-only against the broadcast batch keys (history's own id is
      // dropped first — both sides carry one)
      val captionDups = history
        .select(col("cap_h"), col("cap_h2"))
        .join(broadcast(curated.select(col(idCol).as("id"),
          col("cap_h"), col("cap_h2"))), Seq("cap_h", "cap_h2"))
        .select(col("id")).distinct().localCheckpoint(true)

      val nImageDup = imageDups.count()
      val nCaptionDup = captionDups.count()
      val admitted = curated
        .join(imageDups.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
        .join(captionDups.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      imageDups.unpersist()
      captionDups.unpersist()
      try {
        val nAdmitted = admitted.count()
        // accepted FIRST (at-least-once), state second, manifest flip LAST
        admitted
          .select(col(idCol), col(captionCol), col("ahash").as("phash"))
          .write.mode(SaveMode.Append).parquet(acceptedPath)
        admitted
          .select(lit(batchId).as("batch_id"), col(idCol).as("id"),
            col("ahash"), col("mean"), col("centered"), col("norm0"),
            col("cap_h"), col("cap_h2"))
          .write.mode(SaveMode.Append).parquet(s"$root/history")
        Manifests.writeAtomic(spark, s"$root/$StateName",
          s"""{"batch_id":$batchId,"admitted":$nAdmitted}""")
        ledger ++ Seq("history_image_dup" -> nImageDup,
          "history_caption_dup" -> nCaptionDup, "admitted" -> nAdmitted)
      } finally { admitted.unpersist(); () }
    } finally {
      // curateCore returns its final stage CHECKPOINTED (batch-query
      // hygiene); in a per-batch loop that is one pinned frame per batch
      // forever — release it
      curated0.unpersist(); ()
    }
  }

  /** Maintenance: collapse the rare duplicate rows a crash-replay leaves
    * behind (the replayed attempt re-appends rows the crashed attempt
    * already wrote under the SAME batch_id — harmless for membership
    * checks, reclaimed here). One `min_by` keep-one per id on the
    * history, rewritten via the engine's locked rewrite discipline is
    * overkill for an append-only side table — a plain rewrite-to-temp +
    * swap suffices because the single-writer contract (foreachBatch)
    * means no appender is live during maintenance. Returns rows removed.
    */
  def compactHistory(spark: SparkSession, root: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$root/history")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$root/history.compact_old")
    // self-heal a prior run's crash between its two swap renames: the
    // .compact_old dir IS the history (the new dir never landed) —
    // restore it before anything else reads or rewrites
    if (!fs.exists(path) && fs.exists(old)) {
      if (!fs.rename(old, path))
        throw new java.io.IOException(
          s"compactHistory: crash-recovery rename $old -> $path failed")
    }
    if (!fs.exists(path)) return 0L
    val hist = spark.read.parquet(path.toString)
    val before = hist.count()
    val cols = hist.columns
    val deduped = hist
      .groupBy(col("id"))
      .agg(min_by(struct(cols.map(col): _*), col("batch_id")).as("_r"))
      .select(cols.map(c => col("_r").getField(c).as(c)): _*)
      .localCheckpoint(true)
    val after = deduped.count()
    if (after == before) { deduped.unpersist(); return 0L }
    val tmp = new org.apache.hadoop.fs.Path(s"$root/history.compact_tmp")
    fs.delete(tmp, true)
    deduped.write.parquet(tmp.toString)
    deduped.unpersist()
    // swap: old dir out of the way first (a crash between the renames
    // leaves .old as the recoverable copy, never zero copies — restored
    // by the self-heal above on the next call, or named by
    // committedHistory's loud failure if a batch runs first)
    fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compactHistory: rename $path -> $old failed")
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(
        s"compactHistory: rename $tmp -> $path failed — restore from $old")
    fs.delete(old, true)
    before - after
  }

  /** The streaming wrapper: micro-batches of `(idCol, imageCol,
    * captionCol)` rows through [[processBatch]], batch ids from the
    * engine (exactly what the replay skip keys on — Structured Streaming
    * re-offers a batch under the SAME id after a restart).
    */
  def curateStream(pairs: DataFrame, root: String, acceptedPath: String,
                   idCol: String = "pair_id", imageCol: String = "image",
                   captionCol: String = "caption",
                   cfg: PairCuration.Config = PairCuration.Config())
      : DataStreamWriter[Row] =
    pairs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, acceptedPath, idCol, imageCol,
          captionCol, cfg)
        ()
      }
}
