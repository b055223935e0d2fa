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

  case class Layout(shingleK: Int, numHashes: Int, nBands: Int,
                    rowsPerBand: Int, threshold: Double, maxBucket: Int) {
    /** The fields a SIGNATURE table depends on — banding/threshold only
      * shape the banded table and the candidate join, not the sigs.
      */
    def sigKey: (Int, Int) = (shingleK, numHashes)
  }

  val ManifestName = "_LAYOUT.json"

  def toJson(l: Layout): String =
    s"""{"shingleK":${l.shingleK},"numHashes":${l.numHashes},"nBands":${l.nBands},""" +
      s""""rowsPerBand":${l.rowsPerBand},"threshold":${l.threshold},"maxBucket":${l.maxBucket}}"""

  /** Minimal parser for the manifest WE write (flat object, numeric
    * fields) — no JSON library in the dependency budget.
    */
  def parse(s: String): Layout = {
    def num(field: String): String = {
      val m = ("\"" + field + "\"\\s*:\\s*([-0-9.eE]+)").r.findFirstMatchIn(s)
      m.map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"$ManifestName missing field '$field' in: $s"))
    }
    Layout(num("shingleK").toInt, num("numHashes").toInt, num("nBands").toInt,
      num("rowsPerBand").toInt, num("threshold").toDouble, num("maxBucket").toInt)
  }

  private def manifestPath(tablePath: String) =
    new org.apache.hadoop.fs.Path(s"$tablePath/$ManifestName")

  def read(spark: SparkSession, tablePath: String): Option[Layout] = {
    val p = manifestPath(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
      } finally in.close()
    }
  }

  /** Stamp (or re-stamp) the manifest. Write-to-temp + OVERWRITE-rename
    * (FileContext — the one-arg FileSystem.rename can't replace, and a
    * delete-then-rename window would let a crash lose the manifest
    * entirely, after which the next caller re-stamps a possibly-drifted
    * layout as truth: the exact silent failure this file exists to
    * prevent). A reader never sees a torn or absent manifest.
    */
  def write(spark: SparkSession, tablePath: String, l: Layout): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = manifestPath(tablePath).getFileSystem(conf)
    val p = fs.makeQualified(manifestPath(tablePath))
    fs.mkdirs(p.getParent)
    val tmp = fs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$tablePath/.$ManifestName.tmp"))
    val out = fs.create(tmp, true)
    try out.write(toJson(l).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Verify the caller's layout against the table's stamp; stamp it if the
    * table has none (adoption of a pre-manifest table). Stamping only
    * happens when the table already HAS data files: stamping an empty or
    * not-yet-written dir would (a) leave a stray manifest behind a failed
    * first batch that then blocks the seeding write's ErrorIfExists, and
    * (b) freeze the failed call's possibly-wrong parameters as truth.
    *
    * `full = true` (banded tables) compares every field; `full = false`
    * (signature tables) compares only (shingleK, numHashes) — the fields
    * the sig bytes actually depend on — so one signature table can serve
    * several banding/threshold configurations.
    */
  def ensure(spark: SparkSession, tablePath: String, l: Layout, full: Boolean): Unit =
    read(spark, tablePath) match {
      case None =>
        val dir = new org.apache.hadoop.fs.Path(tablePath)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasData = fs.exists(dir) &&
          fs.listStatus(dir).exists(_.getPath.getName.endsWith(".parquet"))
        if (hasData) write(spark, tablePath, l)
      case Some(existing) =>
        val ok = if (full) existing == l else existing.sigKey == l.sigKey
        if (!ok) throw new IllegalStateException(
          s"dedup layout mismatch at $tablePath: table was written with " +
            s"${toJson(existing)} but this call uses ${toJson(l)}" +
            (if (full) "" else " (compared: shingleK, numHashes)") +
            " — running with drifted parameters would silently admit duplicates; " +
            "re-sign the table or fix the caller's configuration")
    }
}
