package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupLayout}
import graft.streaming.IncrementalDedup

/** The serving-table maintenance loop and its failure windows: banded-table
  * re-cap, signature compaction, the `_LAYOUT.json` drift gate, swap-crash
  * recovery, and the accepted→bands→sigs crash-window replay semantics
  * documented on [[IncrementalDedup.processBatch]].
  */
class DedupMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def work(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val corpusText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val novelText =
    "cat dog bird fish horse sheep goat cow duck hen pig llama"

  /** Seed a one-doc corpus in the serving shape: accepted + sigs +
    * pre-capped banded table. Returns (sig, banded, accepted) paths.
    */
  private def seedCorpus(dir: String): (String, String, String) = {
    val sigTable = s"$dir/sigs"; val banded = s"$dir/bands"
    val accepted = s"$dir/accepted"
    val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
    corpus.write.parquet(accepted)
    val sigs = Dedup.minHashSignatures(corpus, "doc_id", "text", 3, 126)
    sigs.write.parquet(sigTable)
    val (nBands, rowsPerBand) = Dedup.lshBandingFor(126, 0.5)
    Dedup.bandedTableCapped(sigs, nBands, rowsPerBand, 1000).write.parquet(banded)
    (sigTable, banded, accepted)
  }

  // ----------------------------------------------------------- maintenance

  test("recapBandedTable drops drifted buckets and replay-duplicate rows don't inflate the count") {
    val dir = work("recap_")
    val banded = s"$dir/bands"
    // bucket (0, 100): 8 DISTINCT ids but 16 rows (every row replayed
    // once) — under a cap of 10 it must SURVIVE: phantom rows must not
    // count. bucket (1, 200): 30 distinct ids — over the cap, dropped.
    // bucket (2, 300): 3 ids — untouched.
    val rows =
      (0L until 8L).flatMap(i => Seq((i, 0, 100L), (i, 0, 100L))) ++
        (100L until 130L).map(i => (i, 1, 200L)) ++
        (200L until 203L).map(i => (i, 2, 300L))
    rows.toDF("id", "band", "bucket").write.parquet(banded)
    DedupLayout.write(spark, banded,
      DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000))

    assert(Dedup.recapBandedTable(spark, banded, maxBucket = 10))

    val after = spark.read.parquet(banded)
    val byBucket = after.groupBy("band", "bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(byBucket.get(0).contains(8L),
      s"deduped under-cap bucket must survive with distinct rows only: $byBucket")
    assert(!byBucket.contains(1), s"over-cap bucket must be dropped: $byBucket")
    assert(byBucket.get(2).contains(3L))
    // the manifest now records the cap actually in force
    assert(DedupLayout.read(spark, banded).map(_.maxBucket).contains(10))
    // swap left no residue
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$banded/.maint_trash")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$banded/.maint_lock")))
  }

  test("compactSignatures merges per-batch file sets and restores one sig per id") {
    val dir = work("sigcompact_")
    val sigTable = s"$dir/sigs"
    val docs = Seq((1L, corpusText), (2L, novelText)).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 126)
    sigs.write.parquet(sigTable) // initial corpus
    sigs.where(col("id") === 1L).write.mode("append").parquet(sigTable) // replay dup
    Dedup.minHashSignatures(Seq((3L, "x y z " + novelText)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 126).write.mode("append").parquet(sigTable) // later batch

    val before = spark.read.parquet(sigTable)
    assert(before.count() == 4 && before.select("id").distinct().count() == 3)

    assert(Dedup.compactSignatures(spark, sigTable, targetFiles = 1))

    val after = spark.read.parquet(sigTable)
    assert(after.count() == 3, "one row per id after compaction")
    assert(after.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val parquetFiles = fs.listStatus(new org.apache.hadoop.fs.Path(sigTable))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles.length == 1,
      s"expected 1 compacted file, got ${parquetFiles.length}")
    // second maintainer on an already-compacted table is a clean no-op-ish
    // rewrite (returns true — files exist), but a CONCURRENT one is locked
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$sigTable/.maint_lock"))
    assert(!Dedup.compactSignatures(spark, sigTable))
    fs.delete(new org.apache.hadoop.fs.Path(s"$sigTable/.maint_lock"), false)
  }

  test("relayoutSignatures grows P 32->128: content identical, pruned verify intact, crash-mid-swap recovered") {
    val dir = work("relayout_")
    val sigTable = s"$dir/sigs"
    val docs = (0L until 200L)
      .map(i => (i, s"doc $i " + corpusText + s" tail${i % 7}"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 126)
    Dedup.writeSignatures(sigs, sigTable, 32)
    DedupLayout.write(spark, sigTable, DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000, 32))
    def content = spark.read.parquet(sigTable).select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
    val before = content
    val ids = Seq(3L, 77L, 150L)
    def prunedFor(p: Int) = Dedup.prunedCorpusSigs(spark, sigTable, ids.toDF("id"), p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
      .view.filterKeys(ids.contains).toMap
    val prunedBefore = prunedFor(32)
    assert(prunedBefore.keySet == ids.toSet)

    // same-P call is a no-op; the grow runs and re-stamps
    assert(!Dedup.relayoutSignatures(spark, sigTable, 32))
    assert(Dedup.relayoutSignatures(spark, sigTable, 128))
    assert(DedupLayout.read(spark, sigTable).map(_.sigPartitions).contains(128))
    assert(content == before, "re-layout must move rows, not change them")
    assert(prunedFor(128) == prunedBefore,
      "pruned verify must serve identical sigs from the grown layout")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // the new layout really is partitioned at 128 (spot: >32 distinct dirs)
    val ptDirs = fs.listStatus(new org.apache.hadoop.fs.Path(sigTable))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("sig_pt="))
    assert(ptDirs.length > 32, s"expected >32 partition dirs, got ${ptDirs.length}")
    // no residue from the completed swap
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_trash")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_lock")))

    // a concurrent re-layout is refused by the lock
    val lock = new org.apache.hadoop.fs.Path(s"$sigTable.relayout_lock")
    fs.createNewFile(lock)
    assert(!Dedup.relayoutSignatures(spark, sigTable, 64))
    fs.delete(lock, false)

    // crash in the WORST window: old table moved to trash, new not yet in
    val trashRoot = new org.apache.hadoop.fs.Path(s"$sigTable.relayout_trash")
    fs.mkdirs(trashRoot)
    assert(fs.rename(new org.apache.hadoop.fs.Path(sigTable),
      new org.apache.hadoop.fs.Path(trashRoot, "crash-stamp")))
    fs.createNewFile(lock)
    // a fresh re-layout must refuse the un-recovered state, not eat it
    intercept[IllegalArgumentException] {
      Dedup.relayoutSignatures(spark, sigTable, 256)
    }
    assert(Dedup.recoverSignatureRelayout(spark, sigTable))
    assert(content == before, "recovery must restore the original table")
    assert(DedupLayout.read(spark, sigTable).map(_.sigPartitions).contains(128))
    assert(!fs.exists(trashRoot) && !fs.exists(lock))

    // roll-forward window: swap completed (live path present), trash left
    fs.mkdirs(new org.apache.hadoop.fs.Path(trashRoot, "old-gen"))
    assert(Dedup.recoverSignatureRelayout(spark, sigTable))
    assert(content == before && !fs.exists(trashRoot))
    // idempotent when clean
    assert(!Dedup.recoverSignatureRelayout(spark, sigTable))
  }

  test("increment batches refuse a sig table mid-re-layout (loud, not lost rows)") {
    val dir = work("relayout_guard_")
    val sigTable = s"$dir/sigs"; val accepted = s"$dir/accepted"
    val docs = (0L until 10L).map(i => (i, s"doc $i " + corpusText)).toDF("doc_id", "text")
    Dedup.writeSignatures(
      Dedup.minHashSignatures(docs, "doc_id", "text", 3, 126), sigTable, 8)
    DedupLayout.write(spark, sigTable, DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000, 8))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$sigTable.relayout_lock")
    fs.createNewFile(lock)
    val batch = Seq((100L, "a brand new unrelated doc")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IncrementalDedup.processBatch(
        batch, "doc_id", sigTable, accepted, sigPartitions = 8)
    }
    assert(e.getMessage.contains("re-laid-out"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(accepted)),
      "a refused batch must write nothing")
    fs.delete(lock, false)
    graft.streaming.IncrementalDedup.processBatch(
      batch, "doc_id", sigTable, accepted, sigPartitions = 8)
    assert(spark.read.parquet(accepted).count() == 1)
  }

  test("a re-layout acquiring the lock MID-batch aborts before the append") {
    val dir = work("relayout_midbatch_")
    val sigTable = s"$dir/sigs"; val accepted = s"$dir/accepted"
    val docs = (0L until 10L).map(i => (i, s"doc $i " + corpusText)).toDF("doc_id", "text")
    Dedup.writeSignatures(
      Dedup.minHashSignatures(docs, "doc_id", "text", 3, 126), sigTable, 8)
    DedupLayout.write(spark, sigTable, DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000, 8))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lockPath = s"$sigTable.relayout_lock"
    assert(!new java.io.File(lockPath).exists())
    // the batch's own first materialization acquires the lock — i.e. a
    // re-layout starts AFTER the batch-start check passed but before the
    // append; the pre-append re-check must abort with nothing written
    import spark.implicits._
    val batch = Seq((100L, "a brand new unrelated doc"))
      .toDF("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        new java.io.File(lockPath).createNewFile(); it
      }.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IncrementalDedup.processBatch(
        batch, "doc_id", sigTable, accepted, sigPartitions = 8)
    }
    assert(e.getMessage.contains("re-laid-out") &&
      e.getMessage.contains("before the append"), e.getMessage)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(accepted)),
      "the mid-batch abort must write nothing")
    // lock released → the same batch goes through cleanly on retry
    new java.io.File(lockPath).delete()
    graft.streaming.IncrementalDedup.processBatch(
      Seq((100L, "a brand new unrelated doc")).toDF("doc_id", "text"),
      "doc_id", sigTable, accepted, sigPartitions = 8)
    assert(spark.read.parquet(accepted).count() == 1)
  }

  test("maintainServingTables: one pass recovers, compacts, recaps, dedups accepted and grows P") {
    val dir = work("maintain_")
    val sigTable = s"$dir/sigs"; val banded = s"$dir/bands"; val accepted = s"$dir/accepted"
    val docs = (0L until 50L).map(i => (i, s"doc $i " + corpusText)).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 126)
    Dedup.writeSignatures(sigs, sigTable, 8)
    DedupLayout.write(spark, sigTable, DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000, 8))
    Dedup.bandedTableCapped(sigs, 42, 3, 1000).write.parquet(banded)
    DedupLayout.write(spark, banded, DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000, 8))
    docs.write.parquet(accepted)
    // damage: replayed sig append, duplicated band rows, replayed accepted
    Dedup.writeSignatures(sigs.where(col("id") < 5), sigTable, 8,
      org.apache.spark.sql.SaveMode.Append)
    Dedup.bandedTable(sigs.where(col("id") < 5), 42, 3)
      .write.mode("append").parquet(banded)
    docs.where(col("doc_id") < 5).write.mode("append").parquet(accepted)
    // crashed re-layout in the roll-forward window: live path intact,
    // trash + lock left behind
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_trash/old"))
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_lock"))

    val report = Dedup.maintainServingTables(spark, sigTable, Some(banded),
      Some(accepted), idCol = "doc_id", maxBucket = 1000,
      growSigPartitionsTo = Some(32))
    assert(report.recoveredRelayout && report.sigCompacted && report.bandedRecapped &&
      report.acceptedCompacted && report.sigRelayouted, s"report: $report")
    // one sig per id, grown layout, content intact
    val after = spark.read.parquet(sigTable)
    assert(after.count() == 50 && after.select("id").distinct().count() == 50)
    assert(DedupLayout.read(spark, sigTable).map(_.sigPartitions).contains(32))
    // accepted deduped; banded rows deduped back to the capped seed
    assert(spark.read.parquet(accepted).count() == 50)
    assert(spark.read.parquet(banded).dropDuplicates("id", "band", "bucket").count() ==
      spark.read.parquet(banded).count())
    // no maintenance residue anywhere
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_trash")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sigTable.relayout_lock")))
    // second pass over a healthy store: nothing to recover, grow is a no-op
    val again = Dedup.maintainServingTables(spark, sigTable, Some(banded),
      Some(accepted), idCol = "doc_id", maxBucket = 1000,
      growSigPartitionsTo = Some(32))
    assert(!again.recoveredRelayout && again.recoveredTables == 0 && !again.sigRelayouted)
    assert(spark.read.parquet(sigTable).count() == 50)
  }

  test("Maintenance.parallelSweep: ordered results, first failure surfaces AFTER the pool drains, empty input no-ops") {
    import graft.operators.Maintenance
    assert(Maintenance.parallelSweep(Seq.empty[Int], "noop")(identity) == Seq.empty)
    assert(Maintenance.parallelSweep(Seq(3, 1, 2), "order", parallelism = 2)(_ * 10)
      == Seq(30, 10, 20), "results must come back in input order")
    // a failing item propagates its exception, and the helper INTERRUPTS
    // and DRAINS the pool before rethrowing (the caller's next move is
    // recovery, whose contract is "no maintainer live") — the sibling
    // task must have EXITED, one way or the other, by the time the
    // exception reaches us
    val exited = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[java.io.IOException] {
      Maintenance.parallelSweep(Seq("boom", "slow"), "fail", parallelism = 2) {
        case "boom" => throw new java.io.IOException("disk gone")
        case s =>
          try Thread.sleep(5000)
          catch { case _: InterruptedException => () }
          finally exited.incrementAndGet()
          s
      }
    }
    assert(e.getMessage == "disk gone")
    assert(exited.get() == 1,
      "the sibling task must have exited (drained) before the failure surfaced")
    // timeout path: the sweep gives up, interrupts, and still drains
    val interrupted = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[java.util.concurrent.TimeoutException] {
      Maintenance.parallelSweep(Seq(1), "timeout", parallelism = 1,
        timeout = scala.concurrent.duration.Duration(200, "ms")) { _ =>
        try Thread.sleep(30000)
        catch { case _: InterruptedException => interrupted.incrementAndGet() }
        0
      }
    }
    assert(interrupted.get() == 1, "timed-out work must be interrupted, not abandoned")
  }

  test("recoverTableMaintenance restores originals of an interrupted swap") {
    val dir = work("recover_")
    val table = s"$dir/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(table)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(table)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val tPath = new org.apache.hadoop.fs.Path(table)
    val files = fs.listStatus(tPath).filter(_.getPath.getName.endsWith(".parquet"))
    // fake a crash mid-swap with stamp "t1": one original moved to trash,
    // a half-written maint file in place, lock left behind
    val trash = new org.apache.hadoop.fs.Path(s"$table/.maint_trash/t1")
    fs.mkdirs(trash)
    val victim = files.head.getPath
    fs.rename(victim, new org.apache.hadoop.fs.Path(trash, victim.getName))
    // the half-moved output: any parquet file under the table dir
    Seq((99L, "zz")).toDF("id", "v").write.parquet(s"$dir/half")
    val halfFile = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/half"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(halfFile, new org.apache.hadoop.fs.Path(table, "maint-t1-0.parquet"))
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$table/.maint_lock"))

    assert(Dedup.recoverTableMaintenance(spark, table))

    val restored = spark.read.parquet(table)
    assert(restored.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "originals are authoritative; half-moved maint files dropped")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$table/.maint_trash")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$table/.maint_lock")))
    // idempotent when clean
    assert(!Dedup.recoverTableMaintenance(spark, table))
  }

  test("rewriteTableDir refuses a FileStreamSink-tracked table") {
    val dir = work("slog_")
    val table = s"$dir/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(table)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // a stream-log marker anywhere up the ancestry marks the table as
    // log-resolved: renaming its files would corrupt every read
    val filesBefore = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).toSet
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$table/_spark_metadata"))
    assert(!Dedup.compactSignatures(spark, table))
    // untouched on disk (the dir now reads through the stream log, so
    // assert at the file level)
    val filesAfter = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).toSet
    assert(filesAfter == filesBefore, "table files untouched")
  }

  test("ensure() does not stamp a manifest onto an empty/missing table dir") {
    val dir = work("nostamp_")
    val layout = DedupLayout.Layout(3, 126, 42, 3, 0.5, 1000)
    // missing dir: no stamp, no dir created (a failed first batch must not
    // leave residue that blocks the seeding write)
    DedupLayout.ensure(spark, s"$dir/missing", layout, full = false)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/missing")))
    // dir with data: adopted and stamped
    val seeded = s"$dir/seeded"
    Seq((1L, "a")).toDF("id", "v").write.parquet(seeded)
    DedupLayout.ensure(spark, seeded, layout, full = false)
    assert(DedupLayout.read(spark, seeded).contains(layout))
    // re-stamp overwrites atomically (recap path)
    DedupLayout.write(spark, seeded, layout.copy(maxBucket = 77))
    assert(DedupLayout.read(spark, seeded).map(_.maxBucket).contains(77))
  }

  // -------------------------------------------------------- layout manifest

  test("layout manifest: drifted banding parameters fail loudly, not silently admit dups") {
    val dir = work("layout_")
    val (sigTable, banded, accepted) = seedCorpus(dir)
    val batch = Seq((11L, novelText)).toDF("doc_id", "text")
    // first call stamps _LAYOUT.json on both tables
    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)
    assert(DedupLayout.read(spark, sigTable).map(_.numHashes).contains(126))
    assert(DedupLayout.read(spark, banded).map(_.numHashes).contains(126))

    // drifted numHashes: refused on the SIGNATURE table already
    val e1 = intercept[IllegalStateException] {
      IncrementalDedup.processBatch(Seq((12L, "a b c")).toDF("doc_id", "text"),
        "doc_id", sigTable, accepted, numHashes = 64,
        bandedTablePath = Some(banded))
    }
    assert(e1.getMessage.contains("layout mismatch"))

    // drifted threshold: sig check passes (sigs don't depend on it), the
    // BANDED full-layout check refuses
    val e2 = intercept[IllegalStateException] {
      IncrementalDedup.processBatch(Seq((12L, "a b c")).toDF("doc_id", "text"),
        "doc_id", sigTable, accepted, threshold = 0.8,
        bandedTablePath = Some(banded))
    }
    assert(e2.getMessage.contains(banded))

    // same drifted threshold WITHOUT the banded table: allowed (one sig
    // table may serve several thresholds), and the pipeline still works
    IncrementalDedup.processBatch(Seq((13L, "p q r s t u v w x y z zz")).toDF("doc_id", "text"),
      "doc_id", sigTable, accepted, threshold = 0.8)
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
      .contains(13L))
  }

  // ------------------------------------------------- crash-window replays

  test("replay after accepted-only write: doc re-appended, signed exactly once") {
    val dir = work("replayA_")
    val (sigTable, banded, accepted) = seedCorpus(dir)
    val batch = Seq((11L, novelText)).toDF("doc_id", "text")
    // crash window: accepted write committed, bands + sigs writes lost
    batch.write.mode("append").parquet(accepted)

    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)

    val acceptedRows = spark.read.parquet(accepted)
      .where(col("doc_id") === 11L).count()
    assert(acceptedRows == 2, "at-least-once: replay re-appends the accepted doc")
    assert(spark.read.parquet(sigTable).where(col("id") === 11L).count() == 1,
      "one-signature-per-doc invariant holds through the replay")
    val (nBands, _) = Dedup.lshBandingFor(126, 0.5)
    assert(spark.read.parquet(banded).where(col("id") === 11L).count() == nBands)
  }

  test("replay after accepted+bands writes: sig appended once, recap clears the dup bands") {
    val dir = work("replayB_")
    val (sigTable, banded, accepted) = seedCorpus(dir)
    val batch = Seq((11L, novelText)).toDF("doc_id", "text")
    val (nBands, rowsPerBand) = Dedup.lshBandingFor(126, 0.5)
    val batchSigs = Dedup.minHashSignatures(batch, "doc_id", "text", 3, 126)
    // crash window: accepted + bands committed, sig write lost
    batch.write.mode("append").parquet(accepted)
    Dedup.bandedTable(batchSigs, nBands, rowsPerBand)
      .write.mode("append").parquet(banded)

    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)

    // the doc's bands were already live, but its sig was absent — the
    // estimate verify inner-joins the sig table, so the self-collision
    // dissolves and the doc passes as novel again (documented)
    assert(spark.read.parquet(sigTable).where(col("id") === 11L).count() == 1,
      "sig written exactly once across the replay")
    assert(spark.read.parquet(accepted).where(col("doc_id") === 11L).count() == 2)
    val dupBands = spark.read.parquet(banded).where(col("id") === 11L).count()
    assert(dupBands == 2L * nBands, "replay leaves duplicate band rows (harmless)")
    // ... and the maintenance loop erases them
    assert(Dedup.recapBandedTable(spark, banded, maxBucket = 1000))
    assert(spark.read.parquet(banded).where(col("id") === 11L).count() == nBands)
    // dedup still works after recap: a dup of doc 11 is rejected
    IncrementalDedup.processBatch(Seq((21L, novelText)).toDF("doc_id", "text"),
      "doc_id", sigTable, accepted, bandedTablePath = Some(banded),
      bandedPreCapped = true)
    assert(spark.read.parquet(accepted).where(col("doc_id") === 21L).count() == 0)
  }

  test("replay after full commit is a no-op (banded path)") {
    val dir = work("replayC_")
    val (sigTable, banded, accepted) = seedCorpus(dir)
    val batch = Seq((11L, novelText)).toDF("doc_id", "text")
    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)
    val acceptedBefore = spark.read.parquet(accepted).count()
    val sigsBefore = spark.read.parquet(sigTable).count()

    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)

    assert(spark.read.parquet(accepted).count() == acceptedBefore,
      "fully committed batch replays as a no-op")
    assert(spark.read.parquet(sigTable).count() == sigsBefore)
  }

  test("intra-batch chain dedup keeps one representative per component, not greedy pair-removal") {
    val dir = work("chain_")
    val (sigTable, banded, accepted) = seedCorpus(dir)
    // a ~ b ~ c chain: b near-dups a, c near-dups b, but c is NOT a
    // near-dup of a. Greedy "drop every id_b" removes both b and c;
    // component-representative keeps a (min id) only — c's match b is
    // itself removed, but c IS transitively in a's component, so exactly
    // one of {a,b,c} survives. The non-chained doc d always survives.
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val drift1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 x13 x14 x15 x16"
    val drift2 = "y1 y2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 x13 x14 x15 x16"
    val batch = Seq((31L, base), (32L, drift1), (33L, drift2),
      (34L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12")).toDF("doc_id", "text")
    IncrementalDedup.processBatch(batch, "doc_id", sigTable, accepted,
      bandedTablePath = Some(banded), bandedPreCapped = true)
    val kept = spark.read.parquet(accepted).select("doc_id").as[Long]
      .collect().toSet - 1L
    assert(kept == Set(31L, 34L),
      s"one representative of the 31~32~33 component + the loner, got $kept")
  }

  test("concurrent writeAtomic racers and readers never see a torn manifest") {
    import graft.operators.Manifests
    val dir = work("manifest_race_")
    val path = s"$dir/_CURRENT"
    // DIFFERENT-length payloads: equal lengths would mask length-based
    // tearing (the getFileStatus/open TOCTOU reproduces as a clean read)
    val a = """{"generation":"gen-aaaaaaaa-a"}"""
    val b = """{"generation":"gen-bbbbbbbb-racer-b-much-longer-payload-for-length-tears"}"""
    Manifests.writeAtomic(spark, path, a) // readers always find SOMETHING
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def guarded(f: => Unit) = new Thread(() =>
      try f catch { case t: Throwable => failures.add(t); () })
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // a READER racing the writers — not just a read after join()
    val reader = guarded {
      while (!stop.get()) {
        val read = Manifests.read(spark, path).get
        assert(read == a || read == b,
          s"reader raced into a torn manifest: $read")
        assert(Manifests.strField(read, "generation").startsWith("gen-"))
      }
    }
    reader.start()
    (1 to 20).foreach { _ =>
      val t1 = guarded(Manifests.writeAtomic(spark, path, a))
      val t2 = guarded(Manifests.writeAtomic(spark, path, b))
      t1.start(); t2.start(); t1.join(); t2.join()
      val read = Manifests.read(spark, path).get
      assert(read == a || read == b,
        s"manifest must be one COMPLETE payload, got: $read")
    }
    stop.set(true); reader.join()
    assert(failures.isEmpty, {
      val t = failures.peek(); s"racer/reader thread failed: $t"
    })
  }
}
