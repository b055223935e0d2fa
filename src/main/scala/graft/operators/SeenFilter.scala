package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{BloomFilter, Functions => F}

/** Sharded Bloom "seen set" — the incremental exact-dedup PROBE for
  * corpora where joining each new batch against the full history is the
  * bottleneck: the history is folded once into a fixed-size bit filter,
  * and every later batch is marked `maybe_seen` by a broadcast join +
  * arithmetic bit test — a map-only probe whose cost is independent of
  * history size. `maybe_seen = false` is EXACT (never seen — safe to
  * admit with no further work); `maybe_seen = true` is a candidate set
  * to confirm against the (partition-pruned) store, sized by the false-
  * positive rate ≈ (1 − e^{−k·n/m})^k. This is the standard two-tier
  * shape: the filter eliminates the no-hit majority, the exact check
  * only pays for hits.
  *
  * The filter is a DataFrame of `(shard, words, seed, k_hashes, m_bits,
  * num_shards)` — self-describing, parquet-round-trippable, OR-mergeable
  * ([[mergeFilters]]) so daily increments compose without replaying
  * history. Sharding (shard = fp mod numShards) keeps each aggregation
  * buffer at mBits/8 bytes while the TOTAL capacity scales with
  * numShards × mBits; the probe side broadcasts numShards × mBits/8
  * bytes (size it to a few hundred MB at most — 2^30 total bits = 128 MB
  * covers ~10^8 history keys per 1% FP at k=7).
  *
  * Keys are the portable content fingerprint, and bit positions are the
  * exact double-hashing arithmetic of [[graft.functions.BloomFilter]] —
  * so the filter's behavior, false positives included, is replayable by
  * any engine (the oracle gates accept/reject bit-for-bit, not just "no
  * false negatives").
  */
object SeenFilter {

  private def checkParams(kHashes: Int, mBits: Int, numShards: Int): Unit = {
    require(kHashes >= 1 && kHashes <= 16, s"kHashes must be in [1,16], got $kHashes")
    require(mBits >= 64 && mBits <= (1 << 24),
      s"mBits must be in [64, 2^24] (per-shard aggregate buffer = mBits/8 bytes; " +
        s"grow numShards for more capacity), got $mBits")
    require(numShards >= 1 && numShards <= (1 << 16),
      s"numShards must be in [1, 2^16], got $numShards")
  }

  /** A derived filter geometry: per-shard bits, shard count, hash count.
    * `totalBits` is the capacity the FP math sees; `fppAt(n)` is the
    * standard Bloom estimate (1 − e^{−kn/m})^k for n inserted keys,
    * assuming the fingerprint spreads shards evenly (it is a content
    * hash, so it does).
    */
  final case class Geometry(kHashes: Int, mBits: Int, numShards: Int) {
    def totalBits: Long = mBits.toLong * numShards
    def broadcastBytes: Long = totalBits / 8
    def fppAt(n: Long): Double =
      math.pow(1.0 - math.exp(-kHashes.toDouble * n / totalBits), kHashes)
  }

  /** Size a filter for `expectedKeys` at `targetFpp` — the standard
    * m = −n·ln p/ln²2, k = (m/n)·ln 2 sizing, AUTOMATICALLY sharded so
    * no single aggregation buffer exceeds `maxShardBits` (the manual
    * "grow numShards yourself" step this replaces). The geometry is
    * driver-side metadata: the filter's replayable arithmetic only
    * consumes the resulting integers, so the floating-point sizing here
    * never touches oracle parity. Probe cost is a broadcast of
    * `broadcastBytes` — 10⁹ keys at 1 % is ~1.2 GB, at which point
    * shard the HISTORY (several stores) or relax the target instead.
    */
  def geometryFor(expectedKeys: Long, targetFpp: Double = 0.01,
                  maxShardBits: Int = 1 << 24): Geometry = {
    require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
    require(targetFpp > 0 && targetFpp < 1, s"targetFpp must be in (0,1), got $targetFpp")
    require(maxShardBits >= 64 && maxShardBits <= (1 << 24),
      s"maxShardBits must be in [64, 2^24], got $maxShardBits")
    val ln2 = math.log(2.0)
    val mTotal = math.ceil(-expectedKeys.toDouble * math.log(targetFpp) / (ln2 * ln2)).toLong
    val numShards = math.max(1L, (mTotal + maxShardBits - 1) / maxShardBits)
    require(numShards <= (1 << 16),
      s"$expectedKeys keys at $targetFpp needs $numShards shards (> 2^16); " +
        "split the history across stores or relax the target")
    val perShard = (mTotal + numShards - 1) / numShards
    val mBits = math.min(maxShardBits.toLong, ((perShard + 63) / 64) * 64).toInt
    val k = math.max(1, math.min(16,
      math.round(mBits.toDouble * numShards / expectedKeys * ln2).toInt))
    Geometry(math.max(k, 1), math.max(mBits, 64), numShards.toInt)
  }

  /** [[buildFilter]] with the geometry derived from a capacity target
    * instead of hand-picked constants.
    */
  def buildFilterAuto(history: DataFrame, expectedKeys: Long,
                      targetFpp: Double = 0.01, textCol: String = "text",
                      seed: Long = 1L): DataFrame = {
    val g = geometryFor(expectedKeys, targetFpp)
    buildFilter(history, textCol, seed, g.kHashes, g.mBits, g.numShards)
  }

  /** Fold `history` into the sharded filter. One map-side-combinable
    * aggregate pass; null/absent text contributes nothing. The result
    * always carries EXACTLY `numShards` rows (empty shards get zero
    * words), so the filter is self-describing even over an empty
    * history — a store initialized before any data still knows its
    * geometry.
    */
  def buildFilter(history: DataFrame, textCol: String = "text",
                  seed: Long = 1L, kHashes: Int = 5,
                  mBits: Int = 1 << 20, numShards: Int = 16): DataFrame =
    buildFilterKeyed(history,
      TextAnalysis.portableFingerprint(col(textCol)),
      seed, kHashes, mBits, numShards)

  /** [[buildFilter]] over an arbitrary KEY expression instead of the text
    * fingerprint — the flavor a hash-keyed store fronts its exact probe
    * with (e.g. [[graft.multimodal.IncrementalPairs]]' caption leg keys on
    * `pmod(xxhash64(caption), P)`). CONTRACT: `fp` must be deterministic
    * and land in `[0, BloomFilter.P)` — the position arithmetic assumes
    * it; reduce wider hashes with `pmod(h, BloomFilter.P)` (the reduction
    * can only ADD false positives, never false negatives).
    */
  def buildFilterKeyed(history: DataFrame, fp: Column,
                       seed: Long = 1L, kHashes: Int = 5,
                       mBits: Int = 1 << 20, numShards: Int = 16): DataFrame = {
    checkParams(kHashes, mBits, numShards)
    val agged = history
      .select(fp.as("_fp"))
      .where(col("_fp").isNotNull)
      .select(pmod(col("_fp"), lit(numShards.toLong)).as("shard"),
        BloomFilter.positions(col("_fp"), seed, kHashes, mBits).as("_pos"))
      .groupBy("shard")
      .agg(BloomFilter.bitset_or_agg(col("_pos"), mBits).as("words"))
    // built per empty-shard ROW (≤ numShards of them), not as a plan
    // literal — a typedlit of mBits/64 longs is 2 MB of expression tree
    // at the buffer cap
    val zeroWords = array_repeat(lit(0L), (mBits + 63) / 64)
    history.sparkSession.range(numShards)
      .select(col("id").as("shard"))
      .join(agged, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("words"), zeroWords).as("words"),
        lit(seed).as("seed"), lit(kHashes).as("k_hashes"),
        lit(mBits).as("m_bits"), lit(numShards).as("num_shards"),
        lit(F.FingerprintVersion).as("fp_version"))
  }

  /** Loud guard against probing (or merging) a filter persisted under a
    * different FINGERPRINT arithmetic ([[F.FingerprintVersion]]): the
    * bits are positions of the old fold — every previously-seen document
    * would silently mark unseen (duplicate re-admission), and an
    * OR-merge would fuse two incompatible keyings into one filter.
    */
  private def checkFpVersion(filter: DataFrame, what: String): Unit = {
    require(filter.columns.contains("fp_version"),
      s"$what has no fp_version column — it predates fingerprint " +
        s"versioning (current v${F.FingerprintVersion}); rebuild it from " +
        "the history")
    val vs = filter.select("fp_version").distinct().collect().map(_.getInt(0))
    require(vs.forall(_ == F.FingerprintVersion),
      s"$what was built under fingerprint v${vs.mkString(",")} but this " +
        s"build fingerprints with v${F.FingerprintVersion} — membership " +
        "would be silently wrong; rebuild the filter from the history")
  }

  /** Mark each batch row with `maybe_seen` against `filter`. The filter
    * config rides in the filter DataFrame itself (one bounded collect of
    * the distinct config row — metadata, not data); shards with no
    * history rows are simply absent and everything hashing there is
    * unseen. An EMPTY filter (no history at all) marks nothing seen.
    */
  def markSeen(batch: DataFrame, filter: DataFrame,
               textCol: String = "text"): DataFrame =
    markSeenKeyed(batch, filter,
      TextAnalysis.portableFingerprint(col(textCol)))

  /** [[markSeen]] over an arbitrary key expression — MUST be the same
    * expression the filter was [[buildFilterKeyed]] with (same contract:
    * deterministic, in `[0, BloomFilter.P)`).
    */
  def markSeenKeyed(batch: DataFrame, filter: DataFrame,
                    fp: Column): DataFrame = {
    checkFpVersion(filter, "filter")
    val cfg = filter.select("seed", "k_hashes", "m_bits", "num_shards")
      .distinct().collect()
    require(cfg.length <= 1,
      s"filter carries ${cfg.length} distinct configs — refusing to probe a " +
        "mixed filter (merge inputs disagreed on seed/k/mBits/shards?)")
    if (cfg.isEmpty) return batch.withColumn("maybe_seen", lit(false))
    val (seed, k, mBits) =
      (cfg(0).getLong(0), cfg(0).getInt(1), cfg(0).getInt(2))
    val numShards = cfg(0).getInt(3)
    val inputCols = batch.columns.map(col)
    batch
      .withColumn("_fp", fp)
      .withColumn("_shard", pmod(col("_fp"), lit(numShards.toLong)))
      .join(broadcast(filter.select(col("shard").as("_shard"), col("words"))),
        Seq("_shard"), "left")
      .select(inputCols :+
        coalesce(BloomFilter.mightContain(col("words"), col("_fp"),
          seed, k, mBits), lit(false)).as("maybe_seen"): _*)
  }

  /** OR-merge two independently built filters (e.g. the served filter and
    * today's batch filter). Configs must match exactly — word-wise OR of
    * different geometries would silently corrupt membership.
    */
  def mergeFilters(a: DataFrame, b: DataFrame): DataFrame = {
    checkFpVersion(a, "left filter")
    checkFpVersion(b, "right filter")
    val merged = a.unionByName(b)
    val cfg = merged.select("seed", "k_hashes", "m_bits", "num_shards")
      .distinct().collect()
    require(cfg.length <= 1,
      "filters disagree on seed/k/mBits/shards — cannot merge")
    merged
      .groupBy("shard")
      .agg(BloomFilter.or_words_agg(col("words")).as("words"),
        first("seed").as("seed"), first("k_hashes").as("k_hashes"),
        first("m_bits").as("m_bits"), first("num_shards").as("num_shards"),
        first("fp_version").as("fp_version"))
      .select("shard", "words", "seed", "k_hashes", "m_bits", "num_shards",
        "fp_version")
  }

  /** The two-tier admission in one call: rows marked unseen pass through
    * immediately (exact — a Bloom filter has no false negatives); rows
    * marked `maybe_seen` are confirmed against `exactKeys` (a DataFrame
    * with `keyCol` of LongType fingerprints — typically the
    * partition-pruned key store) with a join whose LEFT side is only the
    * candidate slice, FP-rate-sized, not the batch.
    */
  def admitNew(batch: DataFrame, filter: DataFrame, exactKeys: DataFrame,
               keyCol: String, textCol: String = "text"): DataFrame = {
    val marked = markSeen(batch, filter, textCol)
    val unseen = marked.where(!col("maybe_seen")).drop("maybe_seen")
    val candidates = marked.where(col("maybe_seen")).drop("maybe_seen")
      .withColumn("_fp", TextAnalysis.portableFingerprint(col(textCol)))
    val confirmedNew = candidates
      .join(exactKeys.select(col(keyCol).cast(LongType).as("_fp")),
        Seq("_fp"), "left_anti")
      .drop("_fp")
    unseen.unionByName(confirmedNew)
  }
}

/** Crash-safe VERSIONED store for a [[SeenFilter]] — the serving shape
  * for streaming/daily admission: the current filter lives under a
  * `gen-<stamp>/` dir referenced by an atomic `_CURRENT` manifest
  * ([[Manifests]] rename protocol, same discipline as
  * [[IvfIndexStore]]); `appendBatch` marks the batch against the
  * CURRENT filter, OR-merges the batch's own filter in, and publishes a
  * new generation with the flip LAST — a crash at any point leaves
  * either the old generation current (re-run the batch) or the new one
  * complete. Replays are idempotent by algebra: OR-merging the same
  * batch twice is a no-op on the bits, so foreachBatch retries cannot
  * corrupt membership (they only leave an orphan generation for
  * [[recover]] to sweep).
  *
  * Single-writer is ENFORCED, not just contractual: [[appendBatch]]
  * holds a create-exclusive `.append_lock` across its whole
  * read→merge→flip (the protocol discipline of the incremental-dedup
  * signature table's `.relayout_lock`,
  * [[graft.streaming.IncrementalDedup]]). Without it, two concurrent
  * appenders read the same `_CURRENT`, each OR-merges only its OWN
  * batch, and the second flip silently DROPS the first batch's bits —
  * membership loss, i.e. dup re-admission that no drift check would
  * catch. A second writer now fails loudly instead; a crashed holder's
  * lock is swept by [[recover]] age-graced.
  *
  * THE LOCK IS ONLY AS ATOMIC AS THE FILESYSTEM'S CREATE-EXCLUSIVE:
  * `fs.create(path, overwrite = false)` is an atomic test-and-create on
  * HDFS and local POSIX filesystems — the store's supported homes. On
  * S3A-style object stores it is a non-atomic existence check followed
  * by a PUT, so two racing writers can BOTH acquire; do not home the
  * store there without fronting appends with a real coordination
  * service (or a single-writer scheduler). Torn acquisitions are
  * detectable: the holder's token+nonce lines are newline-terminated in
  * the same close, so a crash between create() and close() leaves
  * unterminated content — a PROVABLY torn lock (empty, or
  * newline-bearing but unterminated) is reclaimable by any writer after
  * a short grace ([[TornLockGraceMs]]) instead of blocking the store
  * for the full [[recover]] grace; non-empty newline-LESS content is
  * ambiguous (a pre-versioning release's complete lock looks exactly
  * like that) and is never torn-reclaimed. The reclaim itself is
  * arbitrated against stale-read racers by a fresh pre-delete
  * re-judgment plus a [[ReclaimConfirmMs]] post-create confirm window
  * on the nonce. A LIVE append refreshes the lock's mtime between its
  * internal jobs, so [[recover]]'s age sweep does not harvest the lock
  * of an append that merely runs long.
  */
object SeenFilterStore {

  import org.apache.spark.sql.SparkSession

  val CurrentName = "_CURRENT"
  val AppendLockName = ".append_lock"

  /** How old a TORN lock (created but never token-terminated — a crash
    * between create() and close()) must be before any writer may reclaim
    * it. The create→close window is one small metadata write, not a
    * Spark job, so 30 s is generous; a lock with a complete token is
    * never swept by this path.
    */
  val TornLockGraceMs: Long = 30 * 1000L

  /** How long a torn-lock reclaimer holds its freshly created lock before
    * the CONFIRMING nonce re-read declares acquisition. The delete+create
    * reclaim is not atomic, and a racer acting on stale observations can
    * delete a winner's live lock AFTER the winner's first nonce check
    * passed — the confirm delay means both-proceed now requires the racer
    * to stall longer than this between two ADJACENT filesystem metadata
    * calls (its pre-delete re-judgment and its delete), the same
    * bounded-stall assumption every lease-based lock rests on. Reclaim is
    * a crash path; the latency is paid only there.
    */
  val ReclaimConfirmMs: Long = 2000L

  private def stamp(): String =
    s"gen-${System.currentTimeMillis()}-${java.util.UUID.randomUUID().toString.take(8)}"

  def currentGen(spark: SparkSession, root: String): Option[String] =
    Manifests.read(spark, s"$root/$CurrentName").map(_.trim).filter(_.nonEmpty)

  private def genOrFail(spark: SparkSession, root: String): String =
    currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no $CurrentName under $root — init() first"))

  def currentFilter(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/${genOrFail(spark, root)}/filter")

  private def writeGen(spark: SparkSession, root: String,
                       filter: DataFrame): String = {
    val g = stamp()
    // everything lands BEFORE the flip; a crash here leaves an orphan
    // gen dir that recover() sweeps, never a torn current
    filter.write.parquet(s"$root/$g/filter")
    Manifests.writeAtomic(spark, s"$root/$CurrentName", g)
    g
  }

  /** Publish `filter` as the store's first (or replacement) generation. */
  def init(spark: SparkSession, root: String, filter: DataFrame): String =
    writeGen(spark, root, filter)

  /** Mark `batch` against the current filter AND fold the batch into a
    * new published generation (config inherited from the store). Returns
    * the marked batch — rows with `maybe_seen = false` are exactly-new,
    * probe-eagerly materialized BEFORE the flip so the returned frame
    * reflects the pre-batch filter even after the generation changes.
    */
  def appendBatch(spark: SparkSession, root: String, batch: DataFrame,
                  textCol: String = "text",
                  writerToken: Option[String] = None): DataFrame = {
    val lock = acquireAppendLock(spark, root, writerToken)
    try {
      val cur = currentFilter(spark, root)
      val cfg = cur.select("seed", "k_hashes", "m_bits", "num_shards")
        .distinct().collect()
      require(cfg.length == 1,
        s"store filter carries ${cfg.length} configs — corrupt generation?")
      val (seed, k, m, sh) = (cfg(0).getLong(0), cfg(0).getInt(1),
        cfg(0).getInt(2), cfg(0).getInt(3))
      val marked = SeenFilter.markSeen(batch, cur, textCol).localCheckpoint()
      // heartbeat between the append's internal jobs: a long mark or
      // merge must not look crash-stale to recover()'s age sweep
      touchLock(spark, lock)
      val merged = SeenFilter.mergeFilters(cur,
        SeenFilter.buildFilter(batch, textCol, seed, k, m, sh))
      touchLock(spark, lock)
      writeGen(spark, root, merged)
      marked
    } finally {
      val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(lock, false)
    }
  }

  private def touchLock(spark: SparkSession,
                        lock: org.apache.hadoop.fs.Path): Unit = {
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.setTimes(lock, System.currentTimeMillis(), -1)
    catch { case _: java.io.IOException => () } // best-effort heartbeat
  }

  /** Take the create-exclusive writer lock, or fail LOUDLY if another
    * `appendBatch` holds it (see object doc for why a silent second
    * writer loses bits). A lock left by a crash is age-swept by
    * [[recover]]; the failure message says so.
    *
    * Lock content is `token\nnonce\n` — the token is the caller's
    * identity, the nonce is unique per ACQUISITION ATTEMPT, and the
    * final newline is the write-completed terminator (fewer than two
    * terminated lines = the holder crashed between create() and
    * close(): a TORN lock).
    *
    * `writerToken` is the RETRY escape hatch: an existing complete lock
    * carrying the SAME non-empty token is reclaimed — a foreachBatch
    * retry of micro-batch N can only run after its earlier attempt died
    * (Structured Streaming never runs the same batch twice
    * concurrently), so its own leftover lock must be crash residue, not
    * a live writer. A torn lock older than [[TornLockGraceMs]] is
    * reclaimable by ANY writer. Both reclaim paths are a
    * delete-then-create with no atomicity between them, so after the
    * create the acquirer RE-READS the lock and verifies its own nonce —
    * two writers racing the same stale lock resolve to exactly one
    * winner (the one whose create landed last; every earlier create was
    * deleted by a later racer's delete, which its nonce check detects).
    */
  private def acquireAppendLock(spark: SparkSession, root: String,
                                writerToken: Option[String]): org.apache.hadoop.fs.Path = {
    val lock = new org.apache.hadoop.fs.Path(s"$root/$AppendLockName")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = writerToken.getOrElse("")
    require(!token.contains("\n"), s"writer token cannot contain newlines: $token")
    val nonce = java.util.UUID.randomUUID().toString
    val payload = token + "\n" + nonce + "\n"
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lock, false)
        out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    def readContent(): Option[String] =
      try {
        val in = fs.open(lock)
        val b = in.readAllBytes()
        in.close()
        Some(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      } catch { case _: java.io.IOException => None }
    def isComplete(c: String): Boolean =
      c.endsWith("\n") && c.count(_ == '\n') >= 2
    // PROVABLY torn under the current protocol: empty (create landed, no
    // bytes) or newline-bearing but unterminated. Non-empty NEWLINE-LESS
    // content is AMBIGUOUS — the pre-versioning release wrote complete
    // locks as a bare token with no terminator, so "batch-3" could be a
    // LIVE old-version writer, not crash residue; such locks are never
    // torn-reclaimed (only the same-token retry path or recover()'s age
    // sweep releases them — fail loudly otherwise).
    def isProvablyTorn(c: String): Boolean =
      c.isEmpty || (c.contains("\n") && !isComplete(c))
    def isLegacyAmbiguous(c: String): Boolean = c.nonEmpty && !c.contains("\n")
    def agedPastTearGrace(): Boolean =
      try System.currentTimeMillis() -
        fs.getFileStatus(lock).getModificationTime > TornLockGraceMs
      catch { case _: java.io.IOException => false }
    var acquired = tryCreate()
    var sawLegacy = false
    if (!acquired) {
      val content = readContent()
      sawLegacy = content.exists(isLegacyAmbiguous)
      val sameToken = token.nonEmpty && content.exists(c =>
        (isComplete(c) && c.takeWhile(_ != '\n') == token) ||
          // legacy bare-token lock of OUR OWN token: the retry protocol
          // (one attempt of a writer at a time) makes it reclaimable by
          // its owner even though its liveness is unprovable
          (isLegacyAmbiguous(c) && c == token))
      val tornStale = content.exists(isProvablyTorn) && agedPastTearGrace()
      if (sameToken || tornStale) {
        // contemporaneous re-judgment IMMEDIATELY before the destructive
        // delete: the reclaim race starts with a racer acting on reads
        // taken before another reclaimer's delete+create completed — a
        // fresh winner's lock is complete and seconds old, so re-reading
        // here refuses it (the torn path; the same-token path is
        // protocol-serialized and needs no re-check)
        val freshOk = sameToken ||
          (readContent().exists(isProvablyTorn) && agedPastTearGrace())
        if (freshOk) {
          fs.delete(lock, false)
          if (tryCreate()) {
            // the reclaim's delete+create is not atomic: verify OUR nonce
            // survived — a racer's delete/create landing in between shows
            // up as foreign content, and exactly one racer sees its own
            acquired = readContent().contains(payload)
            if (acquired && !sameToken) {
              // arbitration delay (see ReclaimConfirmMs): hold, then
              // confirm the nonce AGAIN — a stale-read racer that deletes
              // our live lock inside the window is caught here, and for
              // both to proceed it would have to stall longer than the
              // delay between two adjacent metadata calls
              Thread.sleep(ReclaimConfirmMs)
              acquired = readContent().contains(payload)
            }
          }
        }
      }
    }
    require(acquired,
      s"another appendBatch holds $lock — the seen-filter store is " +
        "single-writer (a concurrent append would silently drop this " +
        "batch's bits); wait for it, or run recover() if the holder crashed" +
        (if (sawLegacy) ". NOTE: the lock content is a pre-versioning " +
          "bare token whose holder's liveness cannot be proven — if that " +
          "writer is known dead, remove the lock manually or via " +
          "recover()'s age sweep" else ""))
    lock
  }

  /** Streaming admission: each micro-batch is marked against the CURRENT
    * generation, folded into a new published one, and the MARKED rows
    * handed to `route` (send `maybe_seen = false` rows to the accepted
    * sink, candidates to the exact-confirm path). A foreachBatch retry
    * re-marks against whichever generation is current and re-publishes —
    * a membership no-op by OR-algebra, so replays cannot corrupt the
    * served bits.
    */
  def admitStream(batches: DataFrame, root: String,
                  textCol: String = "text")
                 (route: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch id is the writer token: a RETRY of this micro-batch
        // reclaims its own crashed attempt's lock instead of waiting out
        // the recover() grace (no two attempts of one batch run
        // concurrently; a DIFFERENT writer still refuses loudly)
        route(appendBatch(batch.sparkSession, root, batch, textCol,
          writerToken = Some(s"batch-$batchId")))
      }

  /** Drop `gen-*` dirs `_CURRENT` does not reference — crashed or
    * superseded publications — and a crashed writer's `.append_lock`.
    * Age-graced (default 1 h) so a reader that resolved `_CURRENT` just
    * before a flip never loses the files it is scanning mid-query, and a
    * LIVE writer's lock is never swept from under it. A crash while
    * holding the lock leaves membership at the old generation (the flip
    * is last), so sweeping the stale lock re-opens the store with
    * nothing torn. Returns the number of dirs removed.
    */
  def recover(spark: SparkSession, root: String,
              graceMs: Long = 3600 * 1000L): Int = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val cur = currentGen(spark, root)
    val now = System.currentTimeMillis()
    val lock = new org.apache.hadoop.fs.Path(s"$root/$AppendLockName")
    if (fs.exists(lock) &&
        (now - fs.getFileStatus(lock).getModificationTime) > graceMs)
      fs.delete(lock, false)
    fs.listStatus(p).count { st =>
      val name = st.getPath.getName
      val stale = st.isDirectory && name.startsWith("gen-") &&
        !cur.contains(name) && (now - st.getModificationTime) > graceMs
      if (stale) fs.delete(st.getPath, true)
      stale
    }
  }
}
