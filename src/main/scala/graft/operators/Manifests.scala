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

  def read(spark: SparkSession, path: String): Option[String] = {
    val p = hPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  def writeAtomic(spark: SparkSession, path: String, content: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val raw = hPath(path)
    val fs = raw.getFileSystem(conf)
    val p = fs.makeQualified(raw)
    fs.mkdirs(p.getParent)
    // UUID-suffixed temp: a FIXED temp name would let two concurrent
    // writers truncate each other's in-flight file and rename a torn
    // manifest into place — the exact outage the atomic protocol exists
    // to prevent (same stamp discipline as rewriteTableDir)
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp"))
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Minimal field extractor for the flat JSON objects WE write — no JSON
    * library in the dependency budget. Numeric / bare-word fields.
    */
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
