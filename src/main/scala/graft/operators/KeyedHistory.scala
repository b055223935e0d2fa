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
  *     exchange.
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
             partCol: String = PartCol): Unit = {
    require(keyCols.nonEmpty, "append needs at least one key column")
    require(!df.columns.contains(partCol),
      s"append: the frame already carries a '$partCol' column — it would " +
        "be silently overwritten by the partition value; rename it or " +
        "drop the stale partition column before re-appending")
    val withPt = df
      .withColumn(partCol, partValue(p, keyCols.map(col): _*))
      .repartition(col(partCol))
    val laid =
      if (sortCols.isEmpty) withPt
      else withPt.sortWithinPartitions(sortCols.map(col): _*)
    laid.write.mode(mode).partitionBy(partCol).parquet(path)
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
  def prunedRead(spark: SparkSession, path: String, p: Int,
                 keyCols: Seq[String], probe: DataFrame, schema: StructType,
                 partCol: String = PartCol,
                 pushKeyCol: Option[String] = None,
                 maxPushKeys: Int = 65536): DataFrame = {
    def empty = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return empty
    val hasParts = fs.listStatus(dir).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
    if (!hasParts) return empty
    def prunedTo(pts: Seq[Int]): DataFrame =
      spark.read.parquet(path).where(col(partCol).isin(pts: _*)).drop(partCol)
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
