package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventSink

/** Day-partitioned sink layout, compaction and retention (S7/ST5/Q12). */
class EventSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def sampleEvents(n: Int, day: String) = {
    val base = java.sql.Timestamp.valueOf(s"$day 08:00:00")
    (0 until n).map(i =>
      ("FS_EVENT", new java.sql.Timestamp(base.getTime + i * 1000L), s"c$i"))
      .toDF("event_type", "timestamp", "container_id")
  }

  test("writePartitioned lays out event_type=/day= directories") {
    val dir = Files.createTempDirectory("sink").toString
    EventSink.writePartitioned(sampleEvents(10, "2024-03-01"), dir)
    EventSink.writePartitioned(sampleEvents(5, "2024-03-02"), dir)
    val d1 = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val d2 = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-02")
    assert(d1.isDirectory && d2.isDirectory)
    // partition pruning works: filter reads only one day
    val read = spark.read.parquet(dir).where(col("day") === "2024-03-01")
    assert(read.count() == 10)
  }

  test("compactPartition rewrites many small files into one") {
    val dir = Files.createTempDirectory("compact").toString
    // 12 separate appends → ≥12 files in the partition
    (0 until 12).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    val part = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val before = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 12)
    val did = EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 8)
    assert(did)
    val after = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    assert(spark.read.parquet(dir).count() == 24) // no data lost
  }

  test("compacted files are time-sorted (Q12 row-group pruning)") {
    val dir = Files.createTempDirectory("sorted").toString
    // append out-of-order batches, then compact with the sort
    (0 until 10).foreach { i =>
      val base = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
      val shuffled = Seq(9, 3, 7, 1).map(j =>
        ("FS_EVENT", new java.sql.Timestamp(base.getTime + ((10 - i) * 100 + j) * 1000L), s"c$i$j"))
      EventSink.writePartitioned(shuffled.toDF("event_type", "timestamp", "container_id"), dir)
    }
    EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 2)
    val part = s"$dir/event_type=FS_EVENT/day=2024-03-01"
    val ts = spark.read.parquet(part).select("timestamp")
      .collect().map(_.getTimestamp(0).getTime).toSeq
    assert(ts == ts.sorted, "rows within the compacted file must be time-ordered")
  }

  test("zorder compaction lays rows on the Morton curve of two columns") {
    val dir = Files.createTempDirectory("zorder_compact").toString
    // rows with two independent keys, appended in hostile order
    (0 until 10).foreach { i =>
      val base = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
      val rows = Seq(9, 3, 7, 1).map { j =>
        ("FS_EVENT", new java.sql.Timestamp(base.getTime + ((i * 37 + j * 11) % 100) * 1000L),
          s"c${(i * 53 + j * 29) % 100}", ((i * 37 + j * 11) % 100).toLong,
          ((i * 53 + j * 29) % 100).toLong)
      }
      EventSink.writePartitioned(
        rows.toDF("event_type", "timestamp", "container_id", "ka", "kb"), dir)
    }
    assert(EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 2,
      zorderCols = Some(("ka", "kb"))))
    val part = s"$dir/event_type=FS_EVENT/day=2024-03-01"
    val zs = spark.read.parquet(part)
      .select(graft.operators.ZOrderLayout.zValue(col("ka"), col("kb")))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted, "rows must be Morton-ordered in the compacted file")
    assert(spark.read.parquet(part).count() == 40)
    // targetFiles > 1: files must carve DISJOINT z-ranges (range partition
    // on the z value, not round-robin) — otherwise every file spans the
    // full (ka, kb) domain and min/max skipping prunes nothing
    val dir3 = Files.createTempDirectory("zorder_multi").toString
    (0 until 10).foreach { i =>
      val base = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
      val rows = (0 until 8).map { j =>
        ("FS_EVENT", new java.sql.Timestamp(base.getTime + ((i * 37 + j * 11) % 100) * 1000L),
          s"c${(i * 53 + j * 29) % 100}", ((i * 37 + j * 11) % 100).toLong,
          ((i * 53 + j * 29) % 100).toLong)
      }
      EventSink.writePartitioned(
        rows.toDF("event_type", "timestamp", "container_id", "ka", "kb"), dir3)
    }
    assert(EventSink.compactPartition(spark, dir3,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 2,
      targetFiles = 3, zorderCols = Some(("ka", "kb"))))
    val part3 = s"$dir3/event_type=FS_EVENT/day=2024-03-01"
    val outFiles = new java.io.File(part3).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(outFiles.size > 1, "fixture must actually produce multiple files")
    val spans = outFiles.map { f =>
      val z = spark.read.parquet(f)
        .select(graft.operators.ZOrderLayout.zValue(col("ka"), col("kb")))
        .collect().map(_.getLong(0))
      assert(z.toSeq == z.toSeq.sorted, s"$f must be Morton-sorted inside")
      (z.min, z.max)
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi <= lo, s"z-spans overlap across files: $spans")
      case _ =>
    }
    assert(spark.read.parquet(part3).count() == 80)
    // absent zorder columns degrade to the plain sortCol path, not a failure
    val dir2 = Files.createTempDirectory("zorder_degrade").toString
    (0 until 10).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir2))
    assert(EventSink.compactPartition(spark, dir2,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 2,
      zorderCols = Some(("no_such", "cols"))))
    val ts2 = spark.read.parquet(s"$dir2/event_type=FS_EVENT/day=2024-03-01")
      .select("timestamp").collect().map(_.getTimestamp(0).getTime).toSeq
    assert(ts2 == ts2.sorted)
  }

  test("recoverCompaction restores originals after an interrupted swap") {
    val dir = Files.createTempDirectory("recover").toString
    (0 until 4).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    val part = new org.apache.hadoop.fs.Path(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash mid-swap: originals in the RUN's trash dir (the dir
    // name is the run stamp), one compacted file in
    val trash = new org.apache.hadoop.fs.Path(s"$dir/.compact_trash/42/event_type=FS_EVENT/day=2024-03-01")
    fs.mkdirs(trash)
    fs.listStatus(part).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new org.apache.hadoop.fs.Path(trash, f.getPath.getName)))
    val half = new org.apache.hadoop.fs.Path(part, "compacted-42-0.parquet")
    fs.create(half).close() // bogus partial compacted file
    val restored = EventSink.recoverCompaction(spark, dir)
    assert(restored.size == 1 && restored.head.contains("day=2024-03-01"))
    assert(!fs.exists(half), "half-moved compacted file must be dropped")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.compact_trash")))
    assert(spark.read.parquet(dir).count() == 8) // originals authoritative, no loss
  }

  test("recoverCompaction keeps prior-compaction originals (compacted-* names)") {
    val dir = Files.createTempDirectory("recover2").toString
    // first compaction completes: the partition's ORIGINALS are now named
    // compacted-<s1>-*.parquet
    (0 until 12).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    assert(EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 8))
    val part = new org.apache.hadoop.fs.Path(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val firstGen = fs.listStatus(part).map(_.getPath.getName)
      .filter(_.startsWith("compacted-")).toSeq
    assert(firstGen.size == 1)
    // two more small appends arrive
    (0 until 2).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    // second compaction crashes partway through the originals→trash loop:
    // the two new appends moved to the run's trash, but the
    // first-generation compacted original is still sitting in the partition,
    // and one of the new run's files already moved in
    val trash = new org.apache.hadoop.fs.Path(s"$dir/.compact_trash/99-abc/event_type=FS_EVENT/day=2024-03-01")
    fs.mkdirs(trash)
    fs.listStatus(part).filter(f => f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.getName.startsWith("compacted-"))
      .foreach(f => fs.rename(f.getPath, new org.apache.hadoop.fs.Path(trash, f.getPath.getName)))
    fs.create(new org.apache.hadoop.fs.Path(part, "compacted-99-abc-0.parquet")).close()
    val restored = EventSink.recoverCompaction(spark, dir)
    assert(restored.size == 1)
    val after = fs.listStatus(part).map(_.getPath.getName).toSet
    assert(firstGen.forall(after.contains),
      "prior-compaction originals must survive recovery")
    assert(!after.contains("compacted-99-abc-0.parquet"),
      "the interrupted run's half-moved file must be dropped")
    assert(spark.read.parquet(dir).count() == 28) // 24 compacted + 2×2 appended
  }

  test("concurrent compactors: in-flight run on another partition is untouched; same partition is locked out") {
    val dir = Files.createTempDirectory("recover3").toString
    (0 until 12).foreach { _ =>
      EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir)
      EventSink.writePartitioned(sampleEvents(2, "2024-03-02"), dir)
    }
    val partA = new org.apache.hadoop.fs.Path(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val fs = partA.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // run X is live mid-swap on partition A: lock held, originals in its
    // run-scoped trash, one output file already in
    val lockA = new org.apache.hadoop.fs.Path(
      s"$dir/.compact_locks/event_type=FS_EVENT__day=2024-03-01.lock")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/.compact_locks"))
    fs.createNewFile(lockA)
    val trashA = new org.apache.hadoop.fs.Path(s"$dir/.compact_trash/7-x/event_type=FS_EVENT/day=2024-03-01")
    fs.mkdirs(trashA)
    fs.listStatus(partA).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new org.apache.hadoop.fs.Path(trashA, f.getPath.getName)))
    fs.create(new org.apache.hadoop.fs.Path(partA, "compacted-7-x-0.parquet")).close()
    val trashFilesBefore = fs.listStatus(trashA).map(_.getPath.getName).toSet
    // a concurrent compactor on partition B proceeds and must NOT repair
    // (= clobber) run X's in-flight swap
    assert(EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-02"), maxFiles = 8))
    assert(fs.exists(trashA), "in-flight run's trash must survive a concurrent compactor")
    assert(fs.listStatus(trashA).map(_.getPath.getName).toSet == trashFilesBefore)
    assert(fs.exists(lockA), "in-flight run's lock must survive")
    assert(fs.exists(new org.apache.hadoop.fs.Path(partA, "compacted-7-x-0.parquet")))
    // a concurrent compactor on partition A itself is locked out
    assert(!EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 0))
    // run X crashes; startup recovery restores A (and only deletes X's
    // half-moved output), clears locks
    val restored = EventSink.recoverCompaction(spark, dir)
    assert(restored.exists(_.contains("day=2024-03-01")))
    assert(!fs.exists(lockA))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(partA, "compacted-7-x-0.parquet")))
    assert(spark.read.parquet(dir.toString).where(col("day") === "2024-03-01").count() == 24)
    assert(spark.read.parquet(dir.toString).where(col("day") === "2024-03-02").count() == 24)
  }

  test("manifest-pinned reads: every intermediate compaction state resolves to a complete snapshot") {
    val dir = Files.createTempDirectory("isolated").toString
    (0 until 10).foreach(_ => EventSink.writePartitioned(sampleEvents(3, "2024-03-01"), dir))
    val part = new org.apache.hadoop.fs.Path(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = 30L

    // state 1 — mid-swap, pre-flip: uncommitted compacted files sitting
    // next to the originals (what a reader sees if the compactor crashes
    // or is still running). Simulate by bootstrapping via a real compact
    // then planting an uncommitted file.
    fs.create(new org.apache.hadoop.fs.Path(part, "compacted-9999-zz-0.parquet")).close()
    // no manifest yet → garbage-looking file is indistinguishable from
    // data under listing semantics; after the FIRST real compaction the
    // manifest exists and the protocol takes over. Clean the plant and
    // compact with an effectively-infinite grace (originals stay).
    fs.delete(new org.apache.hadoop.fs.Path(part, "compacted-9999-zz-0.parquet"), false)
    assert(EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"),
      maxFiles = 1, sweepGraceMs = Long.MaxValue))

    // state 2 — post-flip, originals tombstoned-in-grace: BOTH file sets
    // are on disk; the resolving reader sees exactly the new snapshot,
    // once, while a plain lister would double-count
    val originals = fs.listStatus(part)
      .filter(f => f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.getName.startsWith("compacted-"))
    assert(originals.nonEmpty, "grace must keep the originals on disk")
    assert(EventSink.readIsolated(spark, dir).count() == n)
    assert(spark.read.parquet(dir).count() > n, "lister double-counts in grace — the isolated reader must not")

    // state 3 — a SECOND run crashes pre-flip: uncommitted files next to
    // the live compacted generation; still exactly n
    fs.create(new org.apache.hadoop.fs.Path(part, "compacted-123-abcd1234-0.parquet")).close()
    assert(EventSink.readIsolated(spark, dir).count() == n)
    fs.delete(new org.apache.hadoop.fs.Path(part, "compacted-123-abcd1234-0.parquet"), false)

    // state 4 — sweep after grace expiry: tombstones deleted, manifest
    // pruned, reader unchanged, and now the plain lister agrees again
    assert(EventSink.sweepCompacted(spark, dir, graceMs = 0L).nonEmpty)
    assert(EventSink.readIsolated(spark, dir).count() == n)
    assert(spark.read.parquet(dir).count() == n)
    // the sweep pruned the tombstones and kept the one live stamp
    val state = EventSink.readCompactionState(spark, part).get
    assert(state.tombstones.isEmpty && state.committed.size == 1, state.toString)

    // live concurrency: a reader loop races a real compaction+sweep and
    // must observe a complete snapshot at EVERY resolution
    (0 until 10).foreach(_ => EventSink.writePartitioned(sampleEvents(3, "2024-03-01"), dir))
    val total = n * 2
    @volatile var bad: Option[Long] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && bad.isEmpty) {
        val c = EventSink.readIsolated(spark, dir).count()
        if (c != total) bad = Some(c)
      }
    })
    reader.start()
    try {
      assert(EventSink.compactPartition(spark, dir,
        Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"),
        maxFiles = 1, sweepGraceMs = Long.MaxValue))
      EventSink.sweepCompacted(spark, dir, graceMs = Long.MaxValue) // no-op inside grace
    } finally { stop = true; reader.join(30000) }
    assert(bad.isEmpty, s"concurrent reader saw an incomplete snapshot: $bad")
    assert(EventSink.readIsolated(spark, dir).count() == total)
    // partition columns survive the explicit-file read (basePath)
    assert(EventSink.readIsolated(spark, dir).select("day").distinct().count() == 1)
    // subdir-restricted resolution (the partition-pruned flavor)
    assert(EventSink.readIsolated(spark, dir, "event_type=FS_EVENT/day=2024-03-01")
      .count() == total)
  }

  test("serving through the catalog: registerIsolatedView stays exact across a compaction + grace sweep where the plain catalog table double-counts") {
    val dir = Files.createTempDirectory("isoview").toString
    (0 until 6).foreach(_ => EventSink.writePartitioned(sampleEvents(3, "2024-03-01"), dir))
    val total = 18L
    // both registrations: the Hive-DDL catalog table (lister semantics)
    // and the manifest-resolved serving view
    EventSink.registerTable(spark, "cat_events_t", dir)
    EventSink.registerIsolatedView(spark, "iso_events_v", dir)
    assert(spark.table("cat_events_t").count() == total)
    assert(spark.table("iso_events_v").count() == total)

    // a reader loop through the CATALOG VIEW races the compaction+sweep,
    // re-registering each round (the serving cadence) — exact throughout
    @volatile var bad: Option[Long] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && bad.isEmpty) {
        EventSink.registerIsolatedView(spark, "iso_events_v", dir)
        val c = spark.table("iso_events_v").count()
        if (c != total) bad = Some(c)
      }
    })
    reader.start()
    try {
      assert(EventSink.compactPartition(spark, dir,
        Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"),
        maxFiles = 1, sweepGraceMs = Long.MaxValue))
      // in-grace: the catalog TABLE (plain lister) double-counts — the
      // exact window the view exists to close
      spark.sql("REFRESH TABLE cat_events_t")
      assert(spark.table("cat_events_t").count() > total,
        "fixture must be inside the grace window")
      EventSink.sweepCompacted(spark, dir, graceMs = Long.MaxValue) // no-op inside grace
    } finally { stop = true; reader.join(30000) }
    assert(bad.isEmpty, s"catalog-view reader saw an incomplete snapshot: $bad")
    // grace expiry AFTER the racing readers stop: a grace-0 sweep under
    // live readers is exactly the misconfiguration the grace contract
    // (grace ≥ longest query + registration staleness) exists to forbid
    EventSink.sweepCompacted(spark, dir, graceMs = 0L)
    EventSink.registerIsolatedView(spark, "iso_events_v", dir)
    assert(spark.table("iso_events_v").count() == total)
    // post-sweep the lister agrees again
    spark.sql("REFRESH TABLE cat_events_t")
    assert(spark.table("cat_events_t").count() == total)
    spark.sql("DROP TABLE cat_events_t")
    spark.catalog.dropTempView("iso_events_v")
  }

  test("a partition whose parquet all resolves dead fails LOUDLY instead of silently dropping from the query") {
    // construct the pathological state: compact with grace (originals
    // tombstoned but on disk, compacted live), then manually delete the
    // live compacted files — every remaining file resolves dead, and no
    // number of manifest re-reads can fix it (this is a foreign delete,
    // not the stale-manifest race the bounded retry loop closes)
    val dir = Files.createTempDirectory("zerolive").toString
    (0 until 4).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    assert(EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"),
      maxFiles = 1, sweepGraceMs = Long.MaxValue))
    val part = new org.apache.hadoop.fs.Path(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(part)
      .filter(_.getPath.getName.startsWith("compacted-"))
      .foreach(f => fs.delete(f.getPath, false))
    val e = intercept[IllegalStateException] {
      EventSink.readIsolated(spark, dir).count()
    }
    assert(e.getMessage.contains("resolved") && e.getMessage.contains("dead"),
      e.getMessage)
  }

  test("partition spec resolves by existence, not Map order; unpartitioned legacy trash restores") {
    // spec given in the WRONG key order must still find and compact the
    // physical event_type=/day= dir (Map iteration order silently
    // resolved to a nonexistent path and returned false forever)
    val dir = Files.createTempDirectory("specorder").toString
    (0 until 4).foreach(_ => EventSink.writePartitioned(sampleEvents(2, "2024-03-01"), dir))
    assert(EventSink.compactPartition(spark, dir,
      scala.collection.immutable.ListMap(
        "day" -> "2024-03-01", "event_type" -> "FS_EVENT"), maxFiles = 1))
    assert(spark.read.parquet(dir).count() == 8)
    val part = new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01")
    assert(part.listFiles().count(_.getName.endsWith(".parquet")) == 1)

    // legacy (pre-manifest) crashed swap of an UNPARTITIONED table:
    // originals sit DIRECTLY under .compact_trash/<stamp>/ with no
    // partition subdirs — recovery must restore them (the leaf-dirs-only
    // walk skipped the run root and the final trash delete destroyed the
    // only copy)
    val flat = Files.createTempDirectory("flat_table").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2)
      .write.mode("append").parquet(flat)
    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trash = new org.apache.hadoop.fs.Path(s"$flat/.compact_trash/77-zz")
    fs.mkdirs(trash)
    fs.listStatus(new org.apache.hadoop.fs.Path(flat))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new org.apache.hadoop.fs.Path(trash, f.getPath.getName)))
    fs.create(new org.apache.hadoop.fs.Path(flat, "compacted-77-zz-0.parquet")).close()
    val restored = EventSink.recoverCompaction(spark, flat)
    assert(restored.nonEmpty, "run-root originals must be restored")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$flat/.compact_trash")))
    assert(spark.read.parquet(flat).count() == 2, "no loss on the unpartitioned table")
  }

  test("writeDayCloseMarkers closes only watermark-passed days, idempotently (P9)") {
    val dir = Files.createTempDirectory("markers").toString
    EventSink.writePartitioned(sampleEvents(3, "2024-03-01"), dir)
    EventSink.writePartitioned(sampleEvents(3, "2024-03-02"), dir)
    EventSink.writePartitioned(sampleEvents(3, "2024-03-03"), dir)
    // watermark inside 2024-03-03 (08:00 of day 3 minus nothing): days 1-2 closed
    val closedBefore = EventSink.closedDayFromWatermark(
      java.sql.Timestamp.valueOf("2024-03-03 06:00:00").getTime)
    assert(closedBefore == java.time.LocalDate.parse("2024-03-03"))
    val created = EventSink.writeDayCloseMarkers(spark, dir, closedBefore)
    assert(created.size == 2)
    assert(created.forall(_.endsWith("_DONE")))
    assert(new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01/_DONE").exists())
    assert(new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-02/_DONE").exists())
    assert(!new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-03/_DONE").exists())
    // idempotent: nothing new on re-run
    assert(EventSink.writeDayCloseMarkers(spark, dir, closedBefore).isEmpty)
    // day 3 closes once the watermark passes into day 4
    val later = EventSink.writeDayCloseMarkers(spark, dir,
      java.time.LocalDate.parse("2024-03-04"))
    assert(later.size == 1 && later.head.contains("day=2024-03-03"))
  }

  test("ST1/ST8: restart from checkpoint resumes exactly where the stream stopped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("restart").toString
    val ckpt = Files.createTempDirectory("restart_ckpt").toString
    val in = MemoryStream[(String, java.sql.Timestamp, String)]
    def start() = EventSink.partitionedStreamWriter(
      in.toDF().toDF("event_type", "timestamp", "container_id"), dir, ckpt).start()

    val base = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
    def ev(i: Int) = ("FS_EVENT", new java.sql.Timestamp(base.getTime + i * 1000L), s"c$i")

    val q1 = start()
    try {
      in.addData(ev(1), ev(2))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(dir).count() == 2)

    // new query instance, same checkpoint: must pick up AFTER offset 2 —
    // the committed batch is not reprocessed, the new one is
    val q2 = start()
    try {
      in.addData(ev(3))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(dir)
    assert(rows.count() == 3, "restart must neither lose nor duplicate rows")
    assert(rows.select("container_id").as[String].collect().sorted.toSeq == Seq("c1", "c2", "c3"))
  }

  test("compaction and retention refuse a FileStreamSink table (_spark_metadata tracked)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("logsink").toString
    val ckpt = Files.createTempDirectory("logsink_ckpt").toString
    val in = MemoryStream[(String, java.sql.Timestamp, String)]
    val q = EventSink.partitionedStreamWriter(
      in.toDF().toDF("event_type", "timestamp", "container_id"), dir, ckpt).start()
    val base = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
    try {
      in.addData((0 until 12).map(i =>
        ("FS_EVENT", new java.sql.Timestamp(base.getTime + i * 1000L), s"c$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val before = spark.read.parquet(dir).count()
    // renaming files tracked by _spark_metadata would corrupt the table:
    // both maintenance ops must refuse and leave the layout untouched
    assert(!EventSink.compactPartition(spark, dir,
      Map("event_type" -> "FS_EVENT", "day" -> "2024-03-01"), maxFiles = 1))
    assert(EventSink.dropExpiredPartitions(spark, dir, "FS_EVENT",
      java.time.LocalDate.parse("2024-06-01"), retainDays = 1).isEmpty)
    // addressing a SUBDIRECTORY of the sink root as the table must refuse
    // too — the metadata log lives at the root, but the rename would
    // corrupt it all the same (guard walks ancestors)
    assert(!EventSink.compactPartition(spark, s"$dir/event_type=FS_EVENT",
      Map("day" -> "2024-03-01"), maxFiles = 1))
    assert(spark.read.parquet(dir).count() == before)
  }

  test("dropExpiredPartitions removes only days older than retention") {
    val dir = Files.createTempDirectory("retention").toString
    EventSink.writePartitioned(sampleEvents(3, "2024-03-01"), dir)
    EventSink.writePartitioned(sampleEvents(3, "2024-03-05"), dir)
    val dropped = EventSink.dropExpiredPartitions(spark, dir, "FS_EVENT",
      java.time.LocalDate.parse("2024-03-07"), retainDays = 4)
    assert(dropped.size == 1 && dropped.head.contains("day=2024-03-01"))
    assert(spark.read.parquet(dir).count() == 3)
  }
}
