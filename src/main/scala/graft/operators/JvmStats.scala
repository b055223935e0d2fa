package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P4/P5: the JVMSTATS section/property pivots.
  *
  * The JVMSTATS_EVENT body is a dynamic KV-of-KV document:
  * `sections ARRAY<STRUCT<name, properties ARRAY<STRUCT<name, value>>>>`
  * (reference: schema/src/main/protobuf/jvm_statistics_event.proto:8-18).
  * Two consumers shape it differently:
  *  - ES reader pivots every (section, property) into flat `{section}_{prop}`
  *    numeric columns and splits disk/network sections into one synthetic
  *    "OS" row per device (reference: readers/elasticsearch/src/main/java/
  *    .../EventHelper.java:20-44);
  *  - HDFS reader projects only the heap section into 4 fixed columns
  *    (reference: readers/hdfs/src/main/java/.../ReaderFactory.java:126-170).
  *
  * Schema-stability plan (SURVEY §7.4 risk 1): the engine's persistent form
  * is a `MapType` column (`toPropsMap`) — stable schema, `element_at`
  * queries; wide per-key pivots happen only in the serving layer over a
  * known key list (`pivotKnown`).
  */
object JvmStats {

  val sectionsType: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("properties", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("value", StringType))))))))

  /** Long format: one row per (section, property) — the relational explode. */
  def explodeFlat(df: DataFrame, sectionsCol: String = "sections"): DataFrame =
    df.withColumn("_s", explode(col(sectionsCol)))
      .withColumn("_p", explode(col("_s.properties")))
      .withColumn("section", col("_s.name"))
      .withColumn("property", col("_p.name"))
      .withColumn("value", col("_p.value"))
      .drop("_s", "_p", sectionsCol)

  /** Stable MapType form: `{section}_{property}` → value (string). */
  def toPropsMap(sectionsCol: Column): Column =
    map_from_entries(flatten(transform(sectionsCol,
      s => transform(s.getField("properties"),
        p => struct(concat_ws("_", s.getField("name"), p.getField("name")).as("key"),
          p.getField("value").as("value"))))))

  /** ES-style numeric extraction: value parsed as double where possible
    * (reference parses double-if-possible, EventHelper.java:31-38).
    */
  def numericProps(propsMap: Column): Column =
    map_filter(transform_values(propsMap, (_, v) => v.cast(DoubleType)), (_, v) => v.isNotNull)

  /** Serving-layer pivot over a KNOWN key list: one column per key. */
  def pivotKnown(df: DataFrame, propsMapCol: String, keys: Seq[String]): DataFrame =
    keys.foldLeft(df) { (acc, k) =>
      acc.withColumn(k, element_at(col(propsMapCol), k).cast(DoubleType))
    }

  /** P5: the HDFS reader's fixed heap projection (init/committed/used/max). */
  def heapProjection(df: DataFrame, sectionsCol: String = "sections"): DataFrame = {
    val heap = filter(col(sectionsCol), s => s.getField("name") === "heap")
    val m = map_from_entries(transform(flatten(transform(heap, s => s.getField("properties"))),
      p => struct(p.getField("name"), p.getField("value"))))
    df.withColumn("heap_init", element_at(m, "init").cast(LongType))
      .withColumn("heap_committed", element_at(m, "committed").cast(LongType))
      .withColumn("heap_used", element_at(m, "used").cast(LongType))
      .withColumn("heap_max", element_at(m, "max").cast(LongType))
      .drop(sectionsCol)
  }

  /** ES-style device split: disk/network sections carry `{device}_{metric}`
    * property names; emit one synthetic "OS" row per device
    * (reference: EventHelper.java:22-30). Input is the long format of
    * [[explodeFlat]] filtered to those sections.
    */
  def deviceSplit(flat: DataFrame): DataFrame =
    flat.where(col("section").isin("disk", "network"))
      .withColumn("device", substring_index(col("property"), "_", 1))
      .withColumn("metric", expr("substring(property, length(substring_index(property, '_', 1)) + 2)"))
      .withColumn("event_type", lit("OS"))
}
