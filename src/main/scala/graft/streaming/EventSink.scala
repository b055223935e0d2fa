package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** S7/ST4/ST5/Q12: the day-partitioned Parquet sink with late-data grace,
  * small-file compaction and retention.
  *
  * The reference hand-rolls offset recovery, heartbeats, tmp-file renames
  * and row-group merges (reference: readers/hdfs/src/main/java/.../writer/
  * PartitionedWriter.java, offset/HdfsOffsetComputer.java,
  * writer/ProtoParquetWriterWithOffset.java:99-180). In Spark all of ST1-ST3
  * collapses into the checkpointed file sink; what remains ours is the
  * layout (partition columns), the watermark (26 h late-data grace,
  * ReaderFactory.java:221-229), compaction and retention.
  *
  * Layout for 100 TB: partitionBy(event_type, day) — queries prune on both;
  * the union-view `event_type` filter becomes partition pruning, which is
  * exactly the reference's one candidate Catalyst rule (SURVEY §4.2).
  */
object EventSink {

  /** The day contract is UTC end to end (P8): the partition column
    * buckets via session-timezone `date_trunc` while
    * [[closedDayFromWatermark]] reckons UTC — under a non-UTC session a
    * _DONE marker could stamp a local-time bucket hours of event time
    * early, handing consumers a "complete" partition that still receives
    * in-grace rows. Refuse loudly rather than drift.
    */
  private def requireUtcSession(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT" || tz == "Z",
      s"day partitioning and the _DONE watermark contract both reckon " +
        s"days in UTC, but spark.sql.session.timeZone=$tz would bucket " +
        "day= dirs in local time — set the session timezone to UTC")
  }

  /** Streaming writer: day-partitioned parquet with 26 h watermark.
    *
    * Late-data semantics (same contract as the reference's delayed-path
    * writer): the watermark DRIVES THE DAY-CLOSE MARKERS, it does not drop
    * rows — a stateless file sink appends rows later than the grace into
    * their (already `_DONE`-stamped) day partition. `_DONE` therefore
    * means "complete up to the grace"; a consumer needing the
    * beyond-grace stragglers re-lists the partition (the reference's
    * consumers re-read the delayed path the same way).
    */
  def partitionedStreamWriter(events: DataFrame, path: String, checkpoint: String,
                              lateness: String = "26 hours",
                              trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                              monitorLag: Boolean = true)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    // ST11 default-on: the session's shared lag listener rides every
    // production sink (the reference's footer stamps are not opt-in either)
    if (monitorLag) IngestLagListener.forSession(events.sparkSession)
    requireUtcSession(events.sparkSession)
    events
      .withWatermark("timestamp", lateness)
      .withColumn("day", to_date(date_trunc("day", col("timestamp"))))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_type", "day")
      .trigger(trigger)
  }

  /** Batch writer with the same layout (used by tests and backfills).
    * Q12: rows are sorted by (partition cols, event time) within each task,
    * so every output file is time-ordered — parquet row-group min/max stats
    * then prune time-range predicates, the engine's equivalent of the
    * reference's index-time sort (ElasticSearchReader.java:177-184).
    * (Streaming writes can't sort — Spark disallows sort on unaggregated
    * streams — so the stream sink relies on [[compactPartition]]'s
    * sorted rewrite to restore time order.)
    */
  def writePartitioned(events: DataFrame, path: String, tsCol: String = "timestamp"): Unit = {
    requireUtcSession(events.sparkSession)
    events
      .withColumn("day", to_date(date_trunc("day", col(tsCol))))
      .sortWithinPartitions(col("event_type"), col("day"), col(tsCol))
      .write.mode(SaveMode.Append)
      .partitionBy("event_type", "day")
      .parquet(path)
  }

  /** ST5: small-file compaction — rewrite partitions whose file count
    * exceeds `maxFiles` into `targetFiles` time-sorted files. Idempotent
    * (re-running compacts nothing new). The reference merges row groups
    * binary-wise on close (ProtoParquetWriterWithOffset.java:137-172); a
    * relational rewrite is the Spark-native equivalent (no Catalyst support
    * for in-place merge) and restores the Q12 time-sort for row-group
    * pruning.
    *
    * Crash safety: originals are renamed into the RUN-SCOPED trash dir
    * `.compact_trash/<stamp>/<partPath>` BEFORE the compacted files move
    * in, so every intermediate state still holds a full copy of the data —
    * a crash mid-swap is repaired by [[recoverCompaction]] at writer
    * startup (originals are authoritative until the run's trash is
    * dropped, which happens only after all renames succeed).
    *
    * Concurrency: compactors of DIFFERENT partitions of one table may run
    * concurrently — each run owns its own trash dir, so nobody repairs (=
    * clobbers) somebody else's in-flight swap; that interference is
    * exactly why there is no auto-recovery on entry. Per PARTITION, a
    * create-exclusive lock file under `.compact_locks/` serializes
    * compactors: a second call on a locked partition returns false. A
    * crashed run — OR one whose swap threw after the first destructive
    * rename; the finally block treats that identically — leaves its lock
    * behind; [[recoverCompaction]] (startup, when no compactor is live)
    * clears locks along with the trash.
    */
  /** A table written by the checkpointed FileStreamSink tracks every part
    * file in `_spark_metadata`; renaming or deleting those files out from
    * under the log makes the table unreadable (reads resolve through the
    * log: missing originals throw, untracked replacements are invisible).
    * Compaction and retention therefore REFUSE log-tracked tables — the
    * deployment recipe for compactable tables is the foreachBatch append
    * layout ([[EventRouter.routeTyped]] / [[writePartitioned]]).
    */
  private[graft] def isStreamLogTracked(fs: org.apache.hadoop.fs.FileSystem, tablePath: String): Boolean = {
    // walk ANCESTORS too: callers may address a subdirectory of the sink's
    // root as the table (the per-type layout does exactly that), and the
    // log lives at the sink root — a same-level-only check would let the
    // swap proceed and corrupt the log-tracked table anyway
    var p = fs.makeQualified(new org.apache.hadoop.fs.Path(tablePath))
    while (p != null) {
      if (fs.exists(new org.apache.hadoop.fs.Path(p, "_spark_metadata"))) return true
      p = p.getParent
    }
    false
  }

  /** `sortCol` re-sorts the rewritten file so its row-group min/max stats
    * serve range predicates on that one column; `zorderCols` instead lays
    * the rows on the Morton curve of TWO columns
    * ([[graft.operators.ZOrderLayout.zValue]]) so stats stay tight on
    * BOTH — the "run z-order where you run compaction" step. With
    * `targetFiles > 1` the rows are RANGE-partitioned on the z value
    * first (mirroring [[graft.operators.ZOrderLayout.writeZOrdered]]),
    * so the output files carve disjoint z-spans — a round-robin split
    * would hand every file the full domain and stats would prune
    * nothing. When both
    * are set and the zorder columns exist, zorder wins; either silently
    * degrades to the other/nothing when its columns are absent (the
    * compactor must not fail a sweep over a heterogeneous table).
    *
    * READ FENCE: the swap (originals → `.compact_trash`, compacted in)
    * is crash-safe but not read-isolated — a query that LISTS the
    * partition mid-swap can see it empty or partially populated.
    * Compact during a maintenance window, or on tables whose readers
    * re-plan per query (the streaming gates here run compaction between
    * reads). Crash recovery: [[graft.operators.Dedup
    * .recoverTableMaintenance]]-style trash restore via the sweep.
    */
  def compactPartition(spark: SparkSession, tablePath: String, partitionSpec: Map[String, String],
                       maxFiles: Int = 8, targetFiles: Int = 1,
                       sortCol: Option[String] = Some("timestamp"),
                       zorderCols: Option[(String, String)] = None): Boolean = {
    val partPath = partitionSpec.map { case (k, v) => s"$k=$v" }.mkString("/")
    val dir = new org.apache.hadoop.fs.Path(s"$tablePath/$partPath")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    if (isStreamLogTracked(fs, tablePath)) return false
    // exclusive per-partition lock (atomic create-no-overwrite on HDFS;
    // object stores without atomic create should front this with their own
    // conditional-put — same caveat as every rename-based committer there)
    val lockDir = new org.apache.hadoop.fs.Path(s"$tablePath/.compact_locks")
    fs.mkdirs(lockDir)
    val lock = new org.apache.hadoop.fs.Path(lockDir, partPath.replace("/", "__") + ".lock")
    val locked = try fs.createNewFile(lock) catch { case _: java.io.IOException => false }
    if (!locked) return false
    // once the destructive swap begins, an exception must behave like a
    // crash: the lock stays behind (recoverCompaction clears it with the
    // trash at startup). Releasing it here would let a second compactor
    // consume the half-moved state, whose rows recovery then restores ON
    // TOP of the second run's output — duplicated data.
    var swapStarted = false
    var completed = false
    try {
      val files = fs.listStatus(dir).filter(f => f.getPath.getName.endsWith(".parquet"))
      if (files.length <= maxFiles) return false
      // The stamp names this run's trash/tmp dirs AND its output files:
      // recovery matches `compacted-<stamp>-*` against the trash dir name,
      // so half-moved files of an interrupted run are distinguishable from
      // prior-compaction originals (which are compacted-<otherStamp>-*).
      val stamp = System.currentTimeMillis() + "-" +
        java.util.UUID.randomUUID().toString.take(8)
      val tmp = new org.apache.hadoop.fs.Path(s"$tablePath/.compact_tmp/$stamp/$partPath")
      // read EXACTLY the snapshotted file list, not the directory: a live
      // writer may commit a new file between the listing above and the
      // read's own listing — a directory read would fold that file's rows
      // into the compacted output while the swap (driven by `files`) leaves
      // the file in place, duplicating its rows
      // coalesce for the single-file case: same result as repartition(1)
      // without the full shuffle exchange — at one Spark job per compacted
      // partition the per-job exchange is the dominant cost of a
      // many-partition compaction sweep
      val snapshot = spark.read
        .parquet(files.map(_.getPath.toString).toIndexedSeq: _*)
      val zPair = zorderCols.filter { case (a, b) =>
        snapshot.columns.contains(a) && snapshot.columns.contains(b) }
      val laid = zPair match {
        case Some((a, b)) =>
          // range-partition on the z value BEFORE the within-partition sort
          // (mirroring ZOrderLayout.writeZOrdered): a round-robin
          // repartition would hand every output file rows from the full
          // (a, b) domain, so with targetFiles > 1 each file's min/max
          // would span everything and parquet skipping would prune nothing
          val z = graft.operators.ZOrderLayout.zValue(col(a), col(b))
          val parted = if (targetFiles == 1) snapshot.coalesce(1)
                       else snapshot.repartitionByRange(targetFiles, z)
          parted.sortWithinPartitions(z)
        case None =>
          val compacted =
            if (targetFiles == 1) snapshot.coalesce(1) else snapshot.repartition(targetFiles)
          sortCol.filter(compacted.columns.contains)
            .map(c => compacted.sortWithinPartitions(col(c)))
            .getOrElse(compacted)
      }
      laid.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val newFiles = fs.listStatus(tmp).filter(f => f.getPath.getName.endsWith(".parquet"))
      // swap, never destroying the only copy: all originals → this run's
      // trash, new files in, then drop the run's trash
      val trash = new org.apache.hadoop.fs.Path(s"$tablePath/.compact_trash/$stamp/$partPath")
      fs.mkdirs(trash)
      // FileSystem.rename signals many failures by returning FALSE, not
      // throwing — proceeding past one would delete the trash (= the only
      // copy of the un-renamed rows). Escalate to an exception so the
      // mid-swap-failure path (lock retained, recovery restores) handles it.
      def renameOrThrow(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"rename failed: $src -> $dst")
      swapStarted = true
      files.foreach(f => renameOrThrow(f.getPath, new org.apache.hadoop.fs.Path(trash, f.getPath.getName)))
      newFiles.zipWithIndex.foreach { case (f, i) =>
        renameOrThrow(f.getPath, new org.apache.hadoop.fs.Path(dir, s"compacted-$stamp-$i.parquet"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/.compact_trash/$stamp"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/.compact_tmp/$stamp"), true)
      completed = true
      true
    } finally {
      if (completed || !swapStarted) fs.delete(lock, false)
    }
  }

  /** Repair interrupted [[compactPartition]] runs: every dir under
    * `.compact_trash/<stamp>/` is a swap that did not complete — drop the
    * `compacted-<stamp>-*` files that made it into the affected
    * partitions, restore the originals, and clear tmp dirs and locks.
    * Files named `compacted-<otherStamp>-*` are prior-compaction ORIGINALS
    * and must survive recovery. Returns the restored partition paths.
    *
    * Call at writer STARTUP, before any compactor starts (the reference's
    * equivalent is offset-based replay): it assumes no compactor is live —
    * it clears the lock files, and a live run's trash dir is
    * indistinguishable from a crashed one's.
    */
  def recoverCompaction(spark: SparkSession, tablePath: String): Seq[String] = {
    val unqualified = new org.apache.hadoop.fs.Path(s"$tablePath/.compact_trash")
    val fs = unqualified.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def clearAux(): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/.compact_tmp"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/.compact_locks"), true)
    }
    if (!fs.exists(unqualified)) { clearAux(); return Nil }
    // qualify so prefix-stripping below matches listStatus's URIs
    val trashRoot = fs.makeQualified(unqualified)
    def leafDirs(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val subdirs = fs.listStatus(p).filter(_.isDirectory)
      if (subdirs.isEmpty) Seq(p) else subdirs.toSeq.flatMap(d => leafDirs(d.getPath))
    }
    val restored = fs.listStatus(trashRoot).filter(_.isDirectory).toSeq.flatMap { runDir =>
      val stamp = runDir.getPath.getName
      val runRoot = fs.makeQualified(runDir.getPath)
      // every dir under the run's trash mirrors a partition dir
      leafDirs(runRoot).filter(_ != runRoot).map { trashDir =>
        val rel = trashDir.toString.stripPrefix(runRoot.toString).stripPrefix("/")
        val dir = new org.apache.hadoop.fs.Path(s"$tablePath/$rel")
        fs.mkdirs(dir)
        // originals are authoritative: drop this run's half-moved compacted
        // files (and only those) …
        fs.listStatus(dir)
          .filter(_.getPath.getName.startsWith(s"compacted-$stamp-"))
          .foreach(f => fs.delete(f.getPath, false))
        // … and move the originals back
        fs.listStatus(trashDir).foreach(f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dir, f.getPath.getName)))
        dir.toString
      }
    }
    fs.delete(trashRoot, true)
    clearAux()
    restored
  }

  /** P9/ST4: day-close markers — an empty `_DONE` file in every
    * (event_type, day) partition whose day is strictly before
    * `closedBefore`, so downstream batch consumers can poll "is day D
    * complete?" exactly like the reference's checkpoint files
    * (reference: readers/hdfs/src/main/java/.../writer/
    * DelayedDailyPathComputer.java:19-23, offset/FsBasedCheckpointer.java:45-60).
    * Pass `closedBefore = day(current watermark)`: Spark's watermark
    * already carries the lateness grace (the reference's temporalDelay),
    * so a day is closed once the watermark leaves it. Idempotent; returns
    * newly created marker paths.
    */
  def writeDayCloseMarkers(spark: SparkSession, tablePath: String,
                           closedBefore: java.time.LocalDate): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val typeRoots = fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("event_type="))
      .map(_.getPath)
    markClosedDayDirs(fs, typeRoots, closedBefore)
  }

  /** The one copy of the day-close marker protocol: under each root, every
    * `day=` dir strictly before `closedBefore` gets an idempotent `_DONE`.
    * Shared by [[writeDayCloseMarkers]] (event_type=/day= layout) and
    * [[EventRouter.closeDays]] (per-type tables, day= at the root).
    */
  private[streaming] def markClosedDayDirs(fs: org.apache.hadoop.fs.FileSystem,
                                           roots: Seq[org.apache.hadoop.fs.Path],
                                           closedBefore: java.time.LocalDate): Seq[String] =
    for {
      root <- roots
      if fs.exists(root)
      dayDir <- fs.listStatus(root).toSeq
      if dayDir.isDirectory && dayDir.getPath.getName.startsWith("day=")
      // a non-date partition dir (day=__HIVE_DEFAULT_PARTITION__ from a
      // null-timestamp event) must not crash the whole sweep — skip it;
      // it can never be "closed" by a watermark anyway
      day <- scala.util.Try(java.time.LocalDate.parse(
        dayDir.getPath.getName.stripPrefix("day="))).toOption.toSeq
      if day.isBefore(closedBefore)
      marker = new org.apache.hadoop.fs.Path(dayDir.getPath, "_DONE")
      if !fs.exists(marker)
    } yield {
      fs.create(marker).close()
      marker.toString
    }

  /** The day the watermark closes: everything strictly before
    * `day(watermarkMillis)` is final (UTC bucketing, P8).
    */
  def closedDayFromWatermark(watermarkMillis: Long): java.time.LocalDate =
    java.time.Instant.ofEpochMilli(watermarkMillis).atZone(java.time.ZoneOffset.UTC).toLocalDate

  /** Q12: retention — drop day partitions older than `retainDays` relative
    * to `today` (the reference's ILM hot→warm→delete collapses to partition
    * removal on a partitioned table).
    */
  def dropExpiredPartitions(spark: SparkSession, tablePath: String, eventType: String,
                            today: java.time.LocalDate, retainDays: Int): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(s"$tablePath/event_type=$eventType")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    // see isStreamLogTracked: deleting files a FileStreamSink log still
    // references corrupts every read of the table
    if (isStreamLogTracked(fs, tablePath)) return Nil
    val cutoff = today.minusDays(retainDays.toLong)
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        // skip non-date dirs (null-timestamp partition) — see the
        // marker sweep; retention never ages out what it cannot date
        p.getName.startsWith("day=") &&
          scala.util.Try(java.time.LocalDate.parse(p.getName.stripPrefix("day=")))
            .toOption.exists(_.isBefore(cutoff))
      }
      .map { p => fs.delete(p, true); p.toString }
  }

  /** S9: register the dump as a partitioned external table in the catalog. */
  def registerTable(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$path'")
    spark.sql(s"MSCK REPAIR TABLE $name")
  }
}
