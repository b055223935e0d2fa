package graft.operators

import org.apache.spark.sql.SparkSession

/** Layout manifest for MinHash signature / banded serving tables.
  *
  * The incremental-dedup contract (see [[graft.streaming.IncrementalDedup]])
  * requires every writer and reader of a signature or banded table to agree
  * on (shingleK, numHashes, nBands, rowsPerBand, threshold): a drifted
  * layout computes bucket values over different hash slices, collides with
  * nothing, and silently admits every duplicate — the worst failure mode
  * in the pipeline because nothing errors. This manifest turns that silent
  * admission into a loud mismatch: the first writer stamps `_LAYOUT.json`
  * next to the data, every later `processBatch` verifies its own
  * parameters against the stamp and refuses to run on drift.
  *
  * The underscore-prefixed name keeps the file invisible to Spark's
  * parquet listing (same convention as `_SUCCESS`).
  */
object DedupLayout {

  /** `sigPartitions = 0` is the flat legacy layout; > 0 means the
    * signature table is hash-partitioned on
    * `pmod(xxhash64(id), sigPartitions)` ([[Dedup.SigPartitionCol]]) so
    * per-batch candidate verification prunes to the partitions candidate
    * ids can live in instead of scanning the whole table. A
    * writer/reader drifting on this value would prune to the WRONG
    * partitions — candidates silently score against nothing and every
    * duplicate is admitted — hence it is part of the guarded layout.
    */
  case class Layout(shingleK: Int, numHashes: Int, nBands: Int,
                    rowsPerBand: Int, threshold: Double, maxBucket: Int,
                    sigPartitions: Int = 0) {
    /** The fields a SIGNATURE table depends on — banding/threshold only
      * shape the banded table and the candidate join, not the sigs
      * (partitioning shapes where sig ROWS live, so it is part of this
      * key).
      */
    def sigKey: (Int, Int, Int) = (shingleK, numHashes, sigPartitions)

    /** The fields a BANDED table depends on — everything EXCEPT
      * `sigPartitions` (banded rows are (id, band, bucket); where the
      * SIGNATURE rows live does not shape them). Including it would
      * brick ingest after a legitimate `relayoutSignatures` grow: the
      * sig manifest re-stamps with the new P, the banded manifest keeps
      * the old one, and a strict full compare rejects a perfectly valid
      * banded table forever.
      */
    def bandedKey: (Int, Int, Int, Int, Double, Int) =
      (shingleK, numHashes, nBands, rowsPerBand, threshold, maxBucket)
  }

  val ManifestName = "_LAYOUT.json"

  def toJson(l: Layout): String =
    s"""{"shingleK":${l.shingleK},"numHashes":${l.numHashes},"nBands":${l.nBands},""" +
      s""""rowsPerBand":${l.rowsPerBand},"threshold":${l.threshold},"maxBucket":${l.maxBucket},""" +
      s""""sigPartitions":${l.sigPartitions}}"""

  /** Minimal parser for the manifest WE write (flat object, numeric
    * fields) — no JSON library in the dependency budget.
    */
  def parse(s: String): Layout = {
    def num(field: String): String = {
      val m = ("\"" + field + "\"\\s*:\\s*([-0-9.eE]+)").r.findFirstMatchIn(s)
      m.map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"$ManifestName missing field '$field' in: $s"))
    }
    def optNum(field: String, default: String): String =
      ("\"" + field + "\"\\s*:\\s*([-0-9.eE]+)").r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse(default)
    Layout(num("shingleK").toInt, num("numHashes").toInt, num("nBands").toInt,
      num("rowsPerBand").toInt, num("threshold").toDouble, num("maxBucket").toInt,
      // absent in pre-partitioning stamps: those tables are flat
      optNum("sigPartitions", "0").toInt)
  }

  private def manifestPath(tablePath: String) =
    new org.apache.hadoop.fs.Path(s"$tablePath/$ManifestName")

  def read(spark: SparkSession, tablePath: String): Option[Layout] =
    Manifests.read(spark, manifestPath(tablePath).toString).map(parse)

  /** Stamp (or re-stamp) the manifest — atomic overwrite-rename via
    * [[Manifests.writeAtomic]] (see the crash-window rationale there).
    */
  def write(spark: SparkSession, tablePath: String, l: Layout): Unit =
    Manifests.writeAtomic(spark, manifestPath(tablePath).toString, toJson(l))

  /** Verify the caller's layout against the table's stamp; stamp it if the
    * table has none (adoption of a pre-manifest table). Stamping only
    * happens when the table already HAS data files: stamping an empty or
    * not-yet-written dir would (a) leave a stray manifest behind a failed
    * first batch that then blocks the seeding write's ErrorIfExists, and
    * (b) freeze the failed call's possibly-wrong parameters as truth.
    *
    * `full = true` (banded tables) compares every field EXCEPT
    * `sigPartitions` ([[Layout.bandedKey]] — banded rows do not depend
    * on the sig table's partitioning, and a strict compare would reject
    * valid banded tables after a re-layout grow); `full = false`
    * (signature tables) compares only (shingleK, numHashes,
    * sigPartitions) — the fields the sig bytes and their placement
    * actually depend on — so one signature table can serve several
    * banding/threshold configurations.
    */
  def ensure(spark: SparkSession, tablePath: String, l: Layout, full: Boolean): Unit =
    read(spark, tablePath) match {
      case None =>
        val dir = new org.apache.hadoop.fs.Path(tablePath)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // data may sit flat OR one level down in sig_pt=N partition dirs
        val hasData = fs.exists(dir) &&
          fs.listStatus(dir).exists(s =>
            s.getPath.getName.endsWith(".parquet") ||
              (s.isDirectory && s.getPath.getName.contains("=") &&
                fs.listStatus(s.getPath).exists(_.getPath.getName.endsWith(".parquet"))))
        if (hasData) write(spark, tablePath, l)
      case Some(existing) =>
        val ok =
          if (full) existing.bandedKey == l.bandedKey
          else existing.sigKey == l.sigKey
        if (!ok) throw new IllegalStateException(
          s"dedup layout mismatch at $tablePath: table was written with " +
            s"${toJson(existing)} but this call uses ${toJson(l)}" +
            (if (full) " (compared: all fields except sigPartitions)"
             else " (compared: shingleK, numHashes, sigPartitions)") +
            " — running with drifted parameters would silently admit duplicates; " +
            "re-sign the table or fix the caller's configuration")
    }
}
