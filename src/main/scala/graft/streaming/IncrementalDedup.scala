package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Dedup, DedupLayout, KeyedHistory}

/** The 100 TB daily-ingest near-dup story EXECUTED in streaming: each
  * micro-batch of new documents is deduplicated against a materialized
  * corpus SIGNATURE table — the corpus itself is never re-read and never
  * re-shingled — and the surviving (novel) docs are appended to the
  * accepted table and SIGNED into the signature table, so later batches
  * dedup against them too.
  *
  * Per batch: shingle+sign the increment ONCE ([[Dedup.minHashSignatures]],
  * reused for both the band join and the sig append), id-only band join
  * against the corpus signatures ([[Dedup.minHashCandidatePairsAgainst]] —
  * corpus-side bucket caps, candidate rows ≈ 24 B), estimate verify,
  * anti-join the batch down to novel docs. Writes are ordered
  * accepted-first, signatures-second: a batch replayed after a failure
  * between the two writes re-offers its docs (they are not yet
  * self-signed) and re-appends — AT-LEAST-ONCE on the accepted table,
  * like every sink here (dedup downstream on id); the opposite order
  * would silently DROP such docs (they would look like dups of
  * themselves). A batch replayed after BOTH writes committed is a no-op:
  * its docs are now in the signature table, so every one of them collides
  * with itself at est_jaccard 1.0 and is filtered — replay idempotence
  * falls out of the dedup semantics instead of needing a transaction.
  */
object IncrementalDedup {

  /** One increment batch against the `sigTablePath` signature table
    * ((id, sig) parquet, [[Dedup.minHashSignatures]] layout; must share
    * (shingleK, numHashes) across all writers). The batch is first
    * deduplicated INTERNALLY (a day's increment routinely contains its
    * own near-dups; the min-id member of each intra-batch pair survives),
    * then against the corpus. Novel docs append to `acceptedPath`, their
    * signatures to the signature table.
    *
    * `bandedTablePath`, when set, is a materialized [[Dedup.bandedTable]]
    * of the corpus ((id, band, bucket) parquet, same layout this method
    * then appends survivors' bands to): the per-batch corpus BANDING
    * disappears. With `bandedPreCapped` (seed the table with
    * [[Dedup.bandedTableCapped]]) the per-batch corpus-wide cap aggregate
    * disappears too, and with `broadcastIncrement` (default — micro-batch
    * increments are small by construction; pass false for huge backfill
    * batches) the candidate join is a map-only pass over the corpus
    * bands: zero corpus-keyed exchanges per batch, the measured
    * 2.1 M → ~1 k shuffle-records drop in SCALE.md's increment points.
    *
    * CONTRACT: the banded table must be produced with the SAME
    * (shingleK, numHashes, threshold→banding) as every processBatch call
    * that reads it — a drifted layout computes bucket values over
    * different hash slices, collides with nothing, and silently admits
    * every duplicate. ENFORCED via [[DedupLayout]] manifests:
    * the first write stamps `_LAYOUT.json` on the signature and banded
    * tables, and every later call verifies its own parameters against the
    * stamp (signature tables compare (shingleK, numHashes); banded tables
    * compare the full layout) and throws on drift instead of silently
    * admitting duplicates. Maintenance is ONE call:
    * [[Dedup.maintainServingTables]] (crash recovery on every table, sig
    * compaction, banded re-cap, accepted replay-dedup, optional grow-P
    * re-layout) at maintainer startup and on the compaction cadence.
    *
    * `broadcastIncrement` is auto-disabled when the batch's band rows
    * exceed `maxBroadcastBandRows` (a backfill-sized "increment" would
    * otherwise OOM the driver building the broadcast table); the count is
    * read off the already-persisted `newSigs`, so the guard costs no extra
    * pass over the text.
    *
    * `sigPartitions > 0` (the signature table was seeded with
    * [[Dedup.writeSignatures]]) removes the LAST corpus-linear per-batch
    * term: the verify stage's signature fetch becomes a partition-pruned
    * read of only the `hash(candidate_id) % P` partitions
    * ([[Dedup.prunedCorpusSigs]]) instead of a full corpus-sigs scan, so
    * per-batch bytes read scale with the candidate count, not the corpus.
    * Combined with a pre-capped banded table + broadcast increment, the
    * per-batch plan touches NO corpus-sized input at all. The value is
    * stamped/enforced via [[DedupLayout]] — a drifted P would prune to
    * the wrong partitions and silently admit every duplicate.
    */
  def processBatch(batch: DataFrame, idCol: String, sigTablePath: String,
                   acceptedPath: String, textCol: String = "text",
                   shingleK: Int = 3, numHashes: Int = 126,
                   threshold: Double = 0.5, maxBucket: Int = 1000,
                   bandedTablePath: Option[String] = None,
                   bandedPreCapped: Boolean = false,
                   broadcastIncrement: Boolean = true,
                   maxBroadcastBandRows: Long = 4000000L,
                   sigPartitions: Int = 0,
                   foldEvery: Int = 16): Unit = {
    val spark = batch.sparkSession
    val (nBands, rowsPerBand) = Dedup.lshBandingFor(numHashes, threshold)
    val layout = DedupLayout.Layout(shingleK, numHashes, nBands, rowsPerBand,
      threshold, maxBucket, sigPartitions)
    DedupLayout.ensure(spark, sigTablePath, layout, full = false)
    bandedTablePath.foreach(bp => DedupLayout.ensure(spark, bp, layout, full = true))
    // enforce relayoutSignatures' no-live-writer contract as a THREE-point
    // protocol: the re-layout holds `.relayout_lock` for its whole run,
    // and a batch appending mid-swap lands rows in a directory about to
    // be trashed. (1) batch start — refuse cheaply before any compute;
    // (2) immediately before the append — a re-layout that acquired the
    // lock mid-compute aborts the batch while nothing has been written
    // (clean retry); (3) after the append — a lock that appeared during
    // the writes means the just-appended rows may or may not be in the
    // re-layout's snapshot, so fail LOUDLY and have the caller replay the
    // batch once the re-layout completes (replay is safe: rows that did
    // survive re-collide against themselves and are filtered as dups;
    // trashed rows are re-admitted as novel). Point checks cannot close
    // the window entirely — the operational contract still stands — but
    // every interleaving now ends in a loud retry, never silent row loss.
    val relayoutLock = new org.apache.hadoop.fs.Path(s"$sigTablePath.relayout_lock")
    def assertNoRelayout(stage: String, hint: String): Unit =
      require(!relayoutLock.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(relayoutLock),
        s"$sigTablePath is being re-laid-out ($relayoutLock exists, detected " +
          s"$stage) — $hint")
    assertNoRelayout("at batch start",
      "increment batches must pause until relayoutSignatures completes " +
        "(or run recoverSignatureRelayout if it crashed)")
    // the lock-existence checks alone cannot see a re-layout that both
    // ACQUIRED AND RELEASED between two points — but every completed
    // re-layout re-stamps the layout manifest (it only runs when
    // sigPartitions changes), so comparing the stamp closes that window
    val layoutAtStart = DedupLayout.read(spark, sigTablePath)
    // bootstrap contract, stated loudly: the table must be seeded before
    // the first increment (minHashSignatures(...) -> writeSignatures) --
    // without this the first read dies in Spark's generic
    // path-not-found/schema-inference error with no hint at the fix
    require(layoutAtStart.isDefined || {
      val d = new org.apache.hadoop.fs.Path(sigTablePath)
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(d) && fs.listStatus(d).nonEmpty
    }, s"$sigTablePath does not exist (or is empty) -- seed the corpus " +
      "signature table first: Dedup.writeSignatures(Dedup.minHashSignatures(" +
      "corpus, ...), path, sigPartitions) (an increment-only stream cannot " +
      "bootstrap the table itself)")
    // partitioned tables read base ∪ the L0 delta tier (a plain read
    // skips _l0 — the last increments' sigs would be invisible to the
    // candidate join and their docs silently re-admitted); flat tables
    // have no delta tier and keep the plain read
    lazy val corpusSigs =
      if (sigPartitions > 0) Dedup.readAllSignatures(spark, sigTablePath)
      else spark.read.parquet(sigTablePath)
    val newSigs = Dedup.minHashSignatures(batch, idCol, textCol, shingleK, numHashes)
      .persist() // consumed by both band joins, the verifies AND the sig append
    try {
      // intra-batch near-dups first: without this, two copies arriving in
      // the SAME batch would both pass the corpus check and both be signed
      // permanently. One representative per CONNECTED COMPONENT survives
      // (not "drop every id_b of a pair": on a chain a~b~c that greedy
      // rule drops both b and c even though c's only match b is itself
      // dropped — over-removal). The pair graph is increment-sized, so
      // the component iteration is cheap per batch.
      val selfPairs = Dedup.estJaccardScores(
        Dedup.minHashCandidatePairs(newSigs, nBands, rowsPerBand, maxBucket),
        newSigs, newSigs, "id_a", "id_b", numHashes)
        .where(col("est_jaccard") >= threshold)
      // the candidate join's bucket cap drops oversized (band, bucket)
      // groups SILENTLY — for the INTRA-batch stage that means a flood
      // of > maxBucket near-identical copies of one novel doc produces
      // zero self-pairs and every copy is admitted and signed. The
      // module contract is "recall loss is visible, never silent":
      // surface it (increment-sized aggregate, cheap per batch).
      val oversizedSelf = Dedup.oversizedBuckets(
        Dedup.bandedTable(newSigs, nBands, rowsPerBand),
        Seq("band", "bucket"), maxBucket).count()
      if (oversizedSelf > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"incremental dedup: $oversizedSelf intra-batch band buckets " +
            s"exceed maxBucket=$maxBucket — copies beyond the cap in THIS " +
            "batch can pass the self-dedup stage as novel; raise maxBucket " +
            "or pre-dedup the source feed")
      val candidatePlan = bandedTablePath match {
        case Some(bp) =>
          val banded = spark.read.parquet(bp)
          // structural guard on top of the manifest check above — a
          // manifest can be stamped onto a dir whose data predates it,
          // and a wrong-SCHEMA table fails loudly here
          require(Seq("id", "band", "bucket").forall(banded.columns.contains),
            s"$bp is not a bandedTable layout (id, band, bucket): " +
              banded.columns.mkString(", "))
          // size guard: the broadcast side is nDocs × nBands rows; the
          // count reads the persisted sigs (materialized here anyway)
          val bcast = broadcastIncrement &&
            newSigs.count() * nBands <= maxBroadcastBandRows
          Dedup.minHashCandidatePairsAgainstBanded(
            newSigs, banded, nBands, rowsPerBand, maxBucket,
            preCapped = bandedPreCapped, broadcastIncrement = bcast)
        case None => Dedup.minHashCandidatePairsAgainst(
          newSigs, corpusSigs, nBands, rowsPerBand, maxBucket)
      }
      // pruned verify consumes the candidates twice (partition values +
      // the score join) — persist so the band join runs once
      val candidates =
        if (sigPartitions > 0) candidatePlan.persist() else candidatePlan
      val verifySigs =
        if (sigPartitions > 0)
          Dedup.prunedCorpusSigs(spark, sigTablePath,
            candidates.select("corpus_id"), sigPartitions)
        else corpusSigs
      val pairs = Dedup.estJaccardScores(candidates,
        newSigs, verifySigs, "new_id", "corpus_id", numHashes)
        .where(col("est_jaccard") >= threshold)
      // caller-owned component labels: unpersisted at the end of the batch
      // (the one-shot dropNearDupGroups flavor would leak one cached frame
      // per micro-batch — unbounded over a stream's lifetime)
      val comps = Dedup.connectedComponents(selfPairs.select("id_a", "id_b"))
      val novel = Dedup.filterNovel(
          Dedup.dropNearDupGroupsWith(batch, idCol, comps),
          idCol, pairs)
        .persist() // written twice (accepted + sig semi-join) — one compute
      try {
        assertNoRelayout("immediately before the append",
          "the batch aborted cleanly (nothing written) — retry it after " +
            "the re-layout completes")
        novel.write.mode(SaveMode.Append).parquet(acceptedPath)
        val novelSigs = newSigs
          .join(novel.select(col(idCol).as("id")), Seq("id"), "left_semi")
        // write order: accepted → BANDS → sigs. The banded path computes
        // candidates from the banded table, so a replay after a crash
        // between the bands and sigs writes re-collides through the
        // already-written bands and (because the estimate verify
        // inner-joins the sig table, where those ids are absent) passes
        // the docs as novel AGAIN — re-appending accepted (at-least-once,
        // documented) and bands (harmless: candidates dedup), while the
        // SIGNATURE table is only ever appended once per doc. Writing
        // sigs before bands would instead leave duplicate (id, sig) rows
        // on replay — breaking the one-signature-per-accepted-doc
        // invariant every consumer relies on.
        bandedTablePath.foreach { bp =>
          Dedup.bandedTable(novelSigs, nBands, rowsPerBand)
            .write.mode(SaveMode.Append).parquet(bp)
        }
        // partition-aware append: survivors land in the L0 delta tier
        // (one file per batch, not one per touched hash partition —
        // KeyedHistory's L0 discipline); later batches' pruned verifies
        // read base ∪ deltas, and the self-fold below absorbs deltas on
        // the fold cadence
        Dedup.writeSignatures(novelSigs, sigTablePath, sigPartitions,
          SaveMode.Append, l0 = sigPartitions > 0)
        assertNoRelayout("after the append",
          "a re-layout started during this batch's writes and may trash " +
            "them mid-swap — REPLAY this batch once it completes (replay " +
            "is dedup-safe: surviving rows re-collide with themselves, " +
            "trashed rows are re-admitted)")
        require(DedupLayout.read(spark, sigTablePath) == layoutAtStart,
          s"$sigTablePath was re-laid-out DURING this batch (layout stamp " +
            "changed since batch start) — the rows this batch appended " +
            "went to the swapped-out directory; REPLAY the batch (replay " +
            "is dedup-safe, see above)")
        // auto small-file fold ([[KeyedHistory.foldSmallFiles]]): each
        // batch appends up to P files to the partitioned sig table, so a
        // stream-fed table's file count — and the pruned verifies'
        // per-batch listing/footer reads — would grow linearly in
        // batches between maintainServingTables runs. Every foldEvery
        // batches (counted in _FOLDSTATE; this writer is the table's
        // single writer, same contract as the appends; foldEvery ≤ 0
        // disables) each partition's small files merge into one,
        // id-sorted. Crash windows duplicate rows harmlessly — the
        // replayed-sig shape compactSignatures already reclaims.
        if (sigPartitions > 0 && foldEvery > 0) {
          val statePath = s"$sigTablePath/_FOLDSTATE"
          val since = graft.operators.Manifests.read(spark, statePath)
            .flatMap(graft.operators.Manifests.numFieldOpt(_, "since"))
            .map(_.toLong).getOrElse(0L) + 1L
          if (since >= foldEvery) {
            KeyedHistory.foldSmallFiles(spark, sigTablePath, Seq("id"),
              partCol = Dedup.SigPartitionCol,
              p = sigPartitions, keyCols = Seq("id"))
            graft.operators.Manifests.writeAtomic(spark, statePath,
              """{"since":0}""")
          } else graft.operators.Manifests.writeAtomic(spark, statePath,
            s"""{"since":$since}""")
        }
      } finally {
        novel.unpersist(); comps.unpersist()
        if (sigPartitions > 0) { candidates.unpersist(); () }
      }
    } finally { newSigs.unpersist(); () }
  }

  /** The streaming wrapper: increments → [[processBatch]] per micro-batch.
    * Caller starts it with its own trigger/checkpoint. The serving shape —
    * pre-capped banded table + broadcast increment, the zero-corpus-
    * exchange plan in SCALE.md — is reachable directly:
    * `bandedPreCapped = true` over a [[Dedup.bandedTableCapped]] seed,
    * with the same broadcast auto-disable guard as [[processBatch]].
    */
  def dedupStream(increments: DataFrame, idCol: String, sigTablePath: String,
                  acceptedPath: String, textCol: String = "text",
                  shingleK: Int = 3, numHashes: Int = 126,
                  threshold: Double = 0.5, maxBucket: Int = 1000,
                  bandedTablePath: Option[String] = None,
                  bandedPreCapped: Boolean = false,
                  broadcastIncrement: Boolean = true,
                  maxBroadcastBandRows: Long = 4000000L,
                  sigPartitions: Int = 0,
                  foldEvery: Int = 16): DataStreamWriter[Row] =
    increments.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, sigTablePath, acceptedPath, textCol,
          shingleK, numHashes, threshold, maxBucket, bandedTablePath,
          bandedPreCapped, broadcastIncrement, maxBroadcastBandRows,
          sigPartitions, foldEvery)
      }
}
