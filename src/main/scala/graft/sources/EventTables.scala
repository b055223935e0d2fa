package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.EventModel

/** The per-event-type table layout + union view.
  *
  * The reference's batch sink writes one Parquet table per event type
  * (18 descriptors, reference: readers/hdfs/src/main/java/.../ReaderFactory.java:54-94),
  * each row = header ++ body ++ (timestamp, kafka_offset). Cross-type
  * queries (the Extractor counts, dashboard annotations) need a union:
  * [[unionView]] aligns heterogeneous schemas with `unionByName
  * (allowMissingColumns)` — absent body columns become NULL, exactly the
  * dynamic-schema composition of ProtoConcatenator
  * (reference: readers/common/src/main/java/.../protobuf/ProtoConcatenator.java:117-168).
  *
  * On the day-partitioned sink layout (event_type, day) the union view is
  * a single scan of the parent directory — `event_type` predicates become
  * partition pruning, which is the preferred design SURVEY §4.2 calls out.
  */
object EventTables {

  /** Union heterogeneous per-type tables into one view, tagging each row
    * with its event type (P6).
    */
  def unionView(tables: Map[String, DataFrame]): DataFrame =
    tables.toSeq.sortBy(_._1).map { case (tpe, df) =>
      val tagged = if (df.columns.contains("event_type")) df
        else df.withColumn("event_type", lit(tpe))
      tagged
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  /** Load every `<type>.parquet` table under a directory into the map the
    * union view consumes — MANIFEST-RESOLVED
    * ([[graft.streaming.EventSink.readIsolated]]): on a table mid-
    * compaction with a grace window, a plain directory-listing read
    * double-counts (originals and compacted files are both on disk by
    * design); the isolated read resolves each partition through its
    * compaction manifest to exactly one complete snapshot. On a table
    * that has never been manifest-compacted the resolution is the plain
    * listing — same result, same one driver-side walk.
    */
  def loadAll(spark: SparkSession, dir: String, types: Seq[String] = EventModel.typeMarkers.values.toSeq): Map[String, DataFrame] =
    types.flatMap { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(t -> graft.streaming.EventSink.readIsolated(spark, p.toString))
      else None
    }.toMap
}
