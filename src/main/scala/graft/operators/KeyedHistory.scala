package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Hash-partitioned keyed HISTORY tables — the ONE banded-probe layout
  * discipline every incremental store shares. An incremental pipeline
  * (near-dup dedup, cross-modal pair curation) keeps a corpus-sized
  * side table of keys it must probe per micro-batch; scanning that table
  * per batch is O(corpus) work on a minutes cadence, which is the
  * classic 100 TB scale-killer. The fix is always the same three moves,
  * so they live here once:
  *
  *  1. '''layout''': rows land under `pt=<pmod(xxhash64(keys…), P)>`
  *     hive partitions ([[append]]), partition value a pure function of
  *     the key columns — writers and readers agree with zero
  *     coordination PROVIDED they agree on P (stamp it: the signature
  *     tables use [[DedupLayout]], the pair store `_PAIRLAYOUT`);
  *  2. '''pruned probe''': a batch collects the ≤ P distinct partition
  *     values its own keys hit ([[probePartitions]] — driver-bounded by
  *     P, never by the batch) and reads ONLY those partitions
  *     ([[prunedRead]]): per-batch bytes scale with the batch's key
  *     spread, not the corpus;
  *  3. '''broadcast-batch join''': the batch side of the probe join is
  *     broadcast ([[probe]] / [[probeFrames]]) so the history side —
  *     already pruned — is a map-only scan with no corpus-keyed
  *     exchange;
  *  4. '''L0 delta tier + fold''' (the metadata plane): per-batch
  *     appends land as ONE key-sorted file under `_l0/`
  *     ([[append]]`(l0 = true)`) instead of one file per touched
  *     partition (~P small files per batch at production key spreads);
  *     probes read base ∪ deltas ([[prunedRead]] includes the tier
  *     automatically), and [[foldSmallFiles]] absorbs deltas + small
  *     base files into the partitioned layout on the caller's cadence,
  *     size-tiered so amortized per-batch rewrite cost stays
  *     batch-proportional. Full readers MUST use [[readAll]] — a plain
  *     `spark.read.parquet(table)` silently skips `_l0`.
  *
  * [[Dedup.writeSignatures]]/[[Dedup.prunedCorpusSigs]] (MinHash
  * signature serving) and [[graft.multimodal.IncrementalPairs]] (banded
  * pHash + caption-hash history) are the two call sites; their stamped
  * P values guard the shared `pmod(xxhash64(…), P)` formula.
  *
  * Sizing P: pruning bites when P exceeds a batch's distinct key count,
  * so pick P ≫ the per-batch key spread (and grow it with the corpus
  * via a relayout-style rewrite — partitions are a pure key function,
  * so changing P is a whole-table rewrite, same as
  * [[Dedup.relayoutSignatures]]).
  */
object KeyedHistory {

  /** Default partition-column name; [[Dedup.SigPartitionCol]] predates
    * this module and keeps its historical `sig_pt`.
    */
  val PartCol = "pt"

  /** The L0 delta tier's directory. Underscore-prefixed on purpose:
    * Spark's file index treats `_`-dirs as metadata and skips them, so a
    * plain `spark.read.parquet(table)` never double-reads deltas — every
    * reader that WANTS them goes through [[prunedRead]]/[[readAll]],
    * which union them explicitly.
    */
  val L0Dir = "_l0"

  /** The L0 delta parquet files of a table — one `listStatus` of the
    * `_l0` dir plus one per delta subdir, both bounded by the fold
    * cadence (each [[append]]`(l0 = true)` adds ONE delta; each
    * [[foldSmallFiles]] absorbs them all).
    */
  def l0ParquetFiles(fs: org.apache.hadoop.fs.FileSystem,
                     dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val l0 = new org.apache.hadoop.fs.Path(dir, L0Dir)
    if (!fs.exists(l0)) Nil
    else fs.listStatus(l0).toIndexedSeq.filter(_.isDirectory).flatMap(d =>
      fs.listStatus(d.getPath).toIndexedSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath))
  }

  /** The hash partition a key tuple lives in: `pmod(xxhash64(keys…), P)`.
    * Pure function of the keys — see the object doc's coordination note.
    */
  def partValue(p: Int, keys: Column*): Column = {
    require(p > 0, s"partition count must be positive (got $p)")
    pmod(xxhash64(keys: _*), lit(p.toLong)).cast(IntegerType)
  }

  /** Append (or overwrite) `df` under the hash-partitioned layout. The
    * write repartitions ON the partition value first — without that,
    * every input task writes a file into every partition dir it touches
    * (tasks × P small files); with it, one file per touched partition
    * per call. `sortCols` sorts rows within each partition so parquet
    * row-group min/max stats serve the probe's key filters even inside
    * a partition the read cannot skip.
    */
  def append(df: DataFrame, path: String, p: Int, keyCols: Seq[String],
             sortCols: Seq[String] = Nil,
             mode: SaveMode = SaveMode.Append,
             partCol: String = PartCol,
             l0: Boolean = false): Unit = {
    require(keyCols.nonEmpty, "append needs at least one key column")
    require(!df.columns.contains(partCol),
      s"append: the frame already carries a '$partCol' column — it would " +
        "be silently overwritten by the partition value; rename it or " +
        "drop the stale partition column before re-appending")
    if (l0) {
      // L0 DELTA append: ONE flat key-sorted file per call under _l0/,
      // instead of one file per touched partition. At production key
      // spreads a batch touches ~P partitions, so dir-mode appends write
      // ~P small files per table per batch — millions of files a day on
      // a minutes cadence even with folding. The delta tier makes the
      // per-batch write O(1) files; probes read base ∪ deltas (deltas
      // are batch-sized and ≤ fold-cadence many), and foldSmallFiles
      // absorbs them into the partitioned base. Micro-batch-sized input
      // only (one file!) — backfills use dir-mode or fold right after.
      require(mode == SaveMode.Append, s"l0 appends are append-only (got $mode)")
      val stamp = System.currentTimeMillis() + "-" +
        java.util.UUID.randomUUID().toString.take(8)
      val one = df.coalesce(1)
      (if (sortCols.isEmpty) one
       else one.sortWithinPartitions(sortCols.map(col): _*))
        .write.mode(SaveMode.ErrorIfExists)
        .parquet(s"$path/$L0Dir/delta-$stamp")
    } else {
      val withPt = df
        .withColumn(partCol, partValue(p, keyCols.map(col): _*))
        .repartition(col(partCol))
      val laid =
        if (sortCols.isEmpty) withPt
        else withPt.sortWithinPartitions(sortCols.map(col): _*)
      laid.write.mode(mode).partitionBy(partCol).parquet(path)
    }
  }

  /** The distinct partition values `probe`'s key tuples hit — ≤ P ints,
    * driver-bounded by P (not by the probe's row count), so the collect
    * is always safe.
    */
  def probePartitions(probe: DataFrame, p: Int, keyCols: Seq[String]): Seq[Int] =
    probe.select(partValue(p, keyCols.map(col): _*).as("_pt"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** Partition-pruned read of the table at `path`: only partitions whose
    * value appears among `probe`'s key tuples are scanned (the values
    * become a static `partCol IN (…)` predicate, pruned at planning
    * time — the probe reads a STRICT subset of the table's partitions
    * whenever the batch's key spread is under P). Returns the DATA
    * columns (`partCol` dropped).
    *
    * `schema` is the data schema used when the table does not exist yet
    * or holds no partition dirs (a committed zero-row append writes only
    * `_SUCCESS`): the read resolves to an empty frame of the right shape
    * instead of dying in schema inference — an empty history is a normal
    * state for an incremental store's first batches.
    */
  /** The EXISTING partition dirs of a hash-partitioned table, value →
    * path — ONE top-level `listStatus` of ≤ P dir entries (plus state
    * files), O(P) driver metadata RPCs FLAT in the table's file count.
    * The per-probe listing story rests on this: file-level listing then
    * happens only inside the dirs a probe actually selects
    * ([[readPartitionDirs]]), never over the whole tree.
    */
  def partitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                    dir: org.apache.hadoop.fs.Path,
                    partCol: String = PartCol): Map[Int, org.apache.hadoop.fs.Path] =
    fs.listStatus(dir).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .flatMap { s =>
        val v = s.getPath.getName.stripPrefix(partCol + "=")
        try Some(v.toInt -> s.getPath) catch { case _: NumberFormatException => None }
      }
      .toMap

  /** Read ONLY the given partition dirs, `basePath`-anchored so the
    * partition column survives and carries each dir's value. Spark's
    * file index then lists just these dirs — the driver never stats an
    * unselected partition, and per-probe metadata cost is
    * O(files in the selected partitions), not O(files in the table).
    */
  def readPartitionDirs(spark: SparkSession, basePath: String,
                        dirs: Seq[org.apache.hadoop.fs.Path]): DataFrame =
    spark.read.option("basePath", basePath).parquet(dirs.map(_.toString): _*)

  def prunedRead(spark: SparkSession, path: String, p: Int,
                 keyCols: Seq[String], probe: DataFrame, schema: StructType,
                 partCol: String = PartCol,
                 pushKeyCol: Option[String] = None,
                 maxPushKeys: Int = 65536): DataFrame = {
    def empty = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return empty
    val dirsByValue = partitionDirs(fs, dir, partCol)
    val l0 = l0ParquetFiles(fs, dir)
    if (dirsByValue.isEmpty && l0.isEmpty) return empty
    // only the selected dirs reach the reader: partition pruning happens
    // at PATH CONSTRUCTION, before any file listing — a probe's driver
    // metadata cost is one O(P) dir listing plus the selected partitions'
    // files, flat in the table's total file count (the full-tree
    // `spark.read.parquet(table)` flavor re-listed every file of every
    // partition per probe: per-batch listing grew with the corpus even
    // though the pruned bytes did not). The L0 delta tier — not yet
    // folded into any partition — is read WHOLE alongside the pruned
    // base: deltas are batch-sized, ≤ fold-cadence many, and key-sorted
    // (the pushed key filter row-group-skips inside them too).
    def withL0(base: DataFrame): DataFrame =
      if (l0.isEmpty) base
      else base.unionByName(
        spark.read.schema(schema).parquet(l0.map(_.toString): _*))
    def prunedTo(pts: Seq[Int]): DataFrame = withL0 {
      val selected = pts.flatMap(dirsByValue.get)
      if (selected.isEmpty) empty
      else readPartitionDirs(spark, path, selected).drop(partCol)
    }
    pushKeyCol match {
      case Some(k) =>
        // SUPERSET filter on the highest-cardinality key column, redundant
        // with the caller's probe join but PUSHED into the parquet scan:
        // partitions are written sorted on their keys ([[append]]'s
        // sortCols), so row-group min/max stats skip non-matching row
        // groups INSIDE the partitions the pt filter could not prune —
        // bytes read stay ∝ the batch's keys even as each partition grows
        // with the corpus (partition pruning alone still reads
        // corpus/P × keys-hit bytes). ONE collect serves both the
        // partition values and the push keys (the partition is a function
        // of the full key tuple, so distinct (pt, key) pairs are bounded
        // by the distinct keys); an oversized key set (backfill batch)
        // falls back to partition-level pruning, never an error.
        val rows = probe
          .select(partValue(p, keyCols.map(col): _*).as("_pt"), col(k).as("_k"))
          .distinct().limit(maxPushKeys + 1).collect()
        if (rows.isEmpty) empty
        else if (rows.length <= maxPushKeys)
          prunedTo(rows.map(_.getInt(0)).distinct.toSeq)
            .where(col(k).isin(rows.map(_.get(1)).distinct.toIndexedSeq: _*))
        else {
          val pts = probePartitions(probe, p, keyCols)
          if (pts.isEmpty) empty else prunedTo(pts)
        }
      case None =>
        val pts = probePartitions(probe, p, keyCols)
        if (pts.isEmpty) empty else prunedTo(pts)
    }
  }

  /** The WHOLE table — partitioned base (partition column dropped) plus
    * the L0 delta tier. The full-read counterpart of [[prunedRead]] for
    * maintenance, seen-set rebuilds and tests: a plain
    * `spark.read.parquet(table)` silently SKIPS `_l0` (underscore dirs
    * are metadata to Spark's file index), which for a seen-set rebuild
    * would mean missing keys = false negatives = silent duplicate
    * re-admission. Resolves a missing/empty table to an empty frame of
    * `schema`.
    */
  def readAll(spark: SparkSession, path: String, schema: StructType,
              partCol: String = PartCol): DataFrame = {
    def empty = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return empty
    val dirs = partitionDirs(fs, dir, partCol)
    val l0 = l0ParquetFiles(fs, dir)
    val base =
      if (dirs.isEmpty) empty
      else readPartitionDirs(spark, path, dirs.values.toSeq).drop(partCol)
    if (l0.isEmpty) base
    else base.unionByName(
      spark.read.schema(schema).parquet(l0.map(_.toString): _*))
  }

  /** Merge each partition's accumulated SMALL files (< `smallBytes`)
    * into one file, preserving the hash-partitioned layout and
    * re-sorting on `sortCols` so parquet row-group min/max stats keep
    * serving the probes' pushed key filters after the merge. The
    * metadata-plane twin of the pruned probe: every [[append]] writes
    * one file per touched partition per batch, so a stream-fed table's
    * file count — and with it per-probe file listing and footer reads —
    * grows linearly in batches unless it folds. Size-tiered: files at
    * or above `smallBytes` are never rewritten again, so a row is
    * re-copied O(log) times over the table's life and the amortized
    * per-call cost is proportional to the data appended since the last
    * fold, never a corpus term.
    *
    * Rows are rewritten VERBATIM (any commit-marker columns survive, so
    * committed-prefix reads are unaffected). Crash windows leave only
    * harmless duplicate rows (merged copy + not-yet-deleted originals)
    * — the same class as an at-least-once replay's re-appends, for the
    * caller's keep-one maintenance to reclaim. CALLER owns write
    * exclusion: fold only from the table's single writer or under its
    * maintenance lock. Returns the number of files folded away.
    */
  def foldSmallFiles(spark: SparkSession, path: String, sortCols: Seq[String],
                     partCol: String = PartCol,
                     smallBytes: Long = 128L * 1024 * 1024,
                     p: Int = 0, keyCols: Seq[String] = Nil): Long = {
    val tPath = new org.apache.hadoop.fs.Path(path)
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tPath)) return 0L
    val dirs = partitionDirs(fs, tPath, partCol)
    val l0Root = new org.apache.hadoop.fs.Path(tPath, L0Dir)
    val deltaDirs =
      if (!fs.exists(l0Root)) Seq.empty
      else fs.listStatus(l0Root).toIndexedSeq.filter(_.isDirectory).map(_.getPath)
    val l0 = l0ParquetFiles(fs, tPath)
    require(l0.isEmpty || (p > 0 && keyCols.nonEmpty),
      s"$path holds an L0 delta tier — folding it into the base needs " +
        "(p, keyCols) to compute each delta row's partition")
    // sweep FILE-LESS delta dirs (a zero-row append writes only _SUCCESS;
    // unswept they leak one dir per empty batch forever). Safe under the
    // caller's write-exclusion contract: no delta dir can be mid-write.
    val emptyDeltas = {
      val withFiles = l0.map(_.getParent).toSet
      deltaDirs.filterNot(withFiles)
    }
    emptyDeltas.foreach(d => fs.delete(d, true))
    // only partitions holding ≥ 2 small files benefit (the L0 tier
    // always folds); this listing is O(files in the table), amortized
    // over the caller's fold cadence and bounded by the fold itself
    val smallByDir = dirs.toSeq.flatMap { case (v, d) =>
      val fls = fs.listStatus(d).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet") && s.getLen < smallBytes)
      if (fls.length >= 2) Some((v, fls.toSeq)) else None
    }
    if (smallByDir.isEmpty && l0.isEmpty) return 0L
    val tmp = new org.apache.hadoop.fs.Path(s"$path.fold_tmp")
    fs.delete(tmp, true)
    val basePart =
      if (smallByDir.isEmpty) None
      else Some(readPartitionDirs(spark, path, smallByDir.flatMap(_._2).map(_.getPath)))
    val l0Part =
      if (l0.isEmpty) None
      else Some(spark.read.parquet(l0.map(_.toString): _*)
        .withColumn(partCol, partValue(p, keyCols.map(col): _*)))
    val laid = (basePart, l0Part) match {
      case (Some(b), Some(d)) => b.unionByName(d)
      case (Some(b), None) => b
      case (None, Some(d)) => d
      case (None, None) => return 0L // unreachable
    }
    val re = laid.repartition(col(partCol))
    (if (sortCols.isEmpty) re
     else re.sortWithinPartitions(sortCols.map(col): _*))
      .write.partitionBy(partCol).parquet(tmp.toString)
    // merged files in FIRST, originals deleted second: a crash between
    // the two duplicates rows (harmless), never loses them
    partitionDirs(fs, tmp, partCol).foreach { case (v, d) =>
      fs.listStatus(d).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).foreach { f =>
        val destDir = dirs.getOrElse(v,
          new org.apache.hadoop.fs.Path(tPath, s"$partCol=$v"))
        fs.mkdirs(destDir)
        val dest = new org.apache.hadoop.fs.Path(destDir, f.getPath.getName)
        if (!fs.rename(f.getPath, dest))
          throw new java.io.IOException(
            s"foldSmallFiles: rename ${f.getPath} -> $dest failed")
      }
    }
    smallByDir.foreach(_._2.foreach(f => fs.delete(f.getPath, false)))
    l0.map(_.getParent).distinct.foreach(d => fs.delete(d, true))
    fs.delete(tmp, true)
    smallByDir.map(_._2.length).sum.toLong + l0.length
  }

  /** The banded-probe join shape both incremental stores share: history
    * keyed rows joined to the BROADCAST batch keys on `keyCols` — the
    * history side stays a map-only scan (pruned or not), the batch side
    * (micro-batch-sized by construction) never shuffles the history.
    * Pass `broadcastBatch = false` for backfill-sized batches.
    */
  def probeFrames(history: DataFrame, batchKeys: DataFrame,
                  keyCols: Seq[String],
                  broadcastBatch: Boolean = true): DataFrame =
    history.join(if (broadcastBatch) broadcast(batchKeys) else batchKeys,
      keyCols)

  /** [[prunedRead]] + [[probeFrames]]: the per-batch probe of a persisted
    * history — pruned to the batch's own partitions, filtered by
    * `historyFilter` (the committed-prefix predicate of a replay-
    * idempotent store), joined map-only to the broadcast batch keys.
    */
  def probe(spark: SparkSession, path: String, p: Int, keyCols: Seq[String],
            batchKeys: DataFrame, schema: StructType,
            historyFilter: Column = lit(true),
            partCol: String = PartCol,
            pushKeyCol: Option[String] = None,
            maxPushKeys: Int = 65536): DataFrame =
    probeFrames(
      prunedRead(spark, path, p, keyCols, batchKeys, schema, partCol,
        pushKeyCol, maxPushKeys)
        .where(historyFilter),
      batchKeys, keyCols)
}
