package graft.sources

import java.io.InputStreamReader
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cluster-alias mapping for URI normalization: a `.properties` file of
  * `logical-name = canonical-uri` pairs (the deployment artifact the
  * reference loads as `hdfs-mapping.properties`,
  * reference: readers/common/src/main/java/.../reader/UriHelper.java:30-40)
  * feeding [[graft.functions.Functions.normalizeUri]]'s alias map.
  *
  * Loaded through the Hadoop FileSystem API so the mapping can live next
  * to the data (hdfs:/s3:/file:) — on a 1000-executor cluster the driver
  * reads it once and the aliases travel inside the Column expression as
  * literals, not as a lookup side-input.
  */
object UriAliases {

  /** Load alias properties from any Hadoop-visible path. Missing file ⇒
    * empty map (normalization then only strips ports), matching the
    * reference's optional-config behavior.
    *
    * Parsed by hand (first `=` splits key/value, `#`/`!` comment lines,
    * both sides trimmed) rather than `java.util.Properties`: alias KEYS
    * here are URIs, and Properties treats the `:` in `hdfs://` as a
    * key-value delimiter, silently truncating every key at "hdfs".
    */
  def load(spark: SparkSession, path: String): Map[String, String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try {
        val reader = new java.io.BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
        Iterator.continually(reader.readLine()).takeWhile(_ != null)
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("!"))
          .flatMap { l =>
            val i = l.indexOf('=')
            if (i <= 0) None else Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
          }
          .toMap
      } finally in.close()
    }
  }
}
