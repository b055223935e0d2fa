package graft.operators

import org.apache.spark.sql.SparkSession

/** Atomic small-file manifest IO shared by the serving-table layouts
  * ([[DedupLayout]]'s `_LAYOUT.json`, [[IvfIndexStore]]'s `_LAYOUT.json` and
  * `_CURRENT` generation pointer).
  *
  * Writes go to a dot-temp sibling and land via FileContext's
  * OVERWRITE-rename: the one-arg FileSystem.rename can't replace an existing
  * file, and a delete-then-rename window would let a crash lose the manifest
  * entirely — after which the next caller could re-stamp drifted parameters
  * as truth, exactly the silent failure these files exist to prevent. A
  * reader never sees a torn or absent manifest.
  *
  * Underscore-prefixed names keep the files invisible to Spark's parquet
  * listing (same convention as `_SUCCESS`).
  */
object Manifests {

  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Manifest IO bypasses the ChecksumFileSystem wrapper (local FS): with
    * two concurrent writers, the data-file rename and the `.crc` sidecar
    * rename are SEPARATE operations, so the surviving `_CURRENT` can end
    * up paired with the losing writer's checksum — readers then die with
    * ChecksumException, a torn publish in effect (caught by the
    * DedupMaintenanceSpec race test). Manifests are tiny JSON whose
    * integrity the rename protocol already guarantees; raw IO removes the
    * sidecar failure mode entirely. HDFS is unaffected (its checksums are
    * internal, not sidecar files).
    */
  private def fsFor(p: org.apache.hadoop.fs.Path,
                    conf: org.apache.hadoop.conf.Configuration): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  def read(spark: SparkSession, path: String): Option[String] = {
    val p = hPath(path)
    val fs = fsFor(p, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // stream to EOF — sizing the buffer from a getFileStatus AFTER the
        // open is a TOCTOU: a concurrent writeAtomic rename between the
        // two calls would make a fixed-size readFully throw (new payload
        // longer) or truncate (shorter). The open stream reads whichever
        // COMPLETE inode it latched onto.
        val buf = new java.io.ByteArrayOutputStream(256)
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  def writeAtomic(spark: SparkSession, path: String, content: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val raw = hPath(path)
    val fs = fsFor(raw, conf)
    val p = fs.makeQualified(raw)
    fs.mkdirs(p.getParent)
    // drop any pre-raw-era checksum sidecar: a stale .crc next to a
    // raw-written manifest would fail checksum-wrapped readers
    fs.delete(new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.crc"), false)
    // UUID-suffixed temp: a FIXED temp name would let two concurrent
    // writers truncate each other's in-flight file and rename a torn
    // manifest into place — the exact outage the atomic protocol exists
    // to prevent (same stamp discipline as rewriteTableDir)
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp"))
    // sweep STALE orphan temps (a writer that died pre-rename leaves its
    // uuid-temp behind forever; unlike gen-* orphans nothing else cleans
    // them). Age-gated so a concurrent writer's in-flight temp — seconds
    // old — is never deleted from under its rename.
    try {
      val cutoff = System.currentTimeMillis() - 3600 * 1000L
      fs.globStatus(new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.*.tmp"))
        .filter(st => st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, false))
    } catch { case _: java.io.IOException => () } // best-effort
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename on the RAW fs (atomic file move, no sidecar second step)
    if (!fs.rename(tmp, p)) {
      // raw rename can refuse when the destination exists (HDFS
      // semantics); fall back to the FileContext OVERWRITE flavor
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Minimal field extractor for the flat JSON objects WE write — no JSON
    * library in the dependency budget. Numeric / bare-word fields.
    */
  /** [[numField]] tolerant of absence — for fields ADDED to a manifest
    * format after stores stamped without them already exist (the reader
    * defaults; the next write carries the field).
    */
  def numFieldOpt(json: String, field: String): Option[String] =
    ("\"" + field + "\"\\s*:\\s*([-0-9.eE]+|true|false)").r.findFirstMatchIn(json)
      .map(_.group(1))

  def numField(json: String, field: String): String =
    ("\"" + field + "\"\\s*:\\s*([-0-9.eE]+|true|false)").r.findFirstMatchIn(json)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"manifest missing field '$field' in: $json"))

  def strField(json: String, field: String): String =
    ("\"" + field + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"manifest missing field '$field' in: $json"))
}
