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

  /** Stable MapType form: `{section}_{property}` → value (string), as ONE
    * codegen struct walk ([[graft.functions.TextExpressions
    * .all_section_props_map]]) — the nested
    * `transform(transform(…))`+`flatten`+`map_from_entries` combinator
    * it replaces carried two interpreted lambdas on the event path (the
    * heap projection got the same treatment in r12). First-wins on a
    * repeated key (a malformed event must not kill the job the way the
    * combinator's map-dedup EXCEPTION policy did).
    */
  def toPropsMap(sectionsCol: Column): Column =
    graft.functions.TextExpressions.all_section_props_map(sectionsCol)

  /** ES-style numeric extraction: value parsed as double where possible
    * (reference parses double-if-possible, EventHelper.java:31-38).
    */
  def numericProps(propsMap: Column): Column =
    map_filter(transform_values(propsMap, (_, v) => v.cast(DoubleType)), (_, v) => v.isNotNull)

  /** The curated `{section}_{property}` key list the reference's ES index
    * template maps explicitly (reference: readers/elasticsearch/src/main/
    * resources/template.json) — the default serving-layer pivot width.
    * Dynamic families (per-collector `gc(Name)_count/time`, per-device
    * disk/network metrics) are intentionally absent: those go through
    * [[deviceSplit]] / stay in the map form, like the template's
    * dynamic_templates.
    */
  val knownKeys: Seq[String] = Seq(
    "class_initialized", "class_inittime", "class_loaded", "class_loadtime",
    "class_unloaded", "class_veriftime",
    "code_committed", "code_init", "code_max", "code_used",
    "compile_count", "compile_failed", "compile_invalidated", "compile_threads",
    "compile_time",
    "compressedclassspace_committed", "compressedclassspace_init",
    "compressedclassspace_max", "compressedclassspace_used",
    "cpu_cores",
    "descriptors_max", "descriptors_open",
    "eden_committed", "eden_init", "eden_max", "eden_used",
    "gc_pause_ratio_1_min",
    "heap_committed", "heap_init", "heap_max", "heap_used",
    "machinecpu_ctxtswitches", "machinecpu_interrupts",
    "memory_physical", "memory_swap",
    "metaspace_committed", "metaspace_init", "metaspace_max", "metaspace_used",
    "nonheap_committed", "nonheap_init", "nonheap_max", "nonheap_used",
    "old_committed", "old_init", "old_max", "old_used",
    "os_physicalfree", "os_physicaltotal", "os_swapfree", "os_swaptotal", "os_virtual",
    "process_ctxtswitches", "process_interrupts", "process_read", "process_rss",
    "process_threads", "process_vsz", "process_written",
    "safepoints_count", "safepoints_synctime", "safepoints_totaltime",
    "survivor_committed", "survivor_init", "survivor_max", "survivor_used",
    "synclocks_contendedlockattempts", "synclocks_deflations",
    "synclocks_futilewakeups", "synclocks_inflations", "synclocks_monextant",
    "synclocks_notifications", "synclocks_parks",
    "threads_count", "threads_daemon", "threads_internal", "threads_total")

  /** Serving-layer pivot over a KNOWN key list: one column per key. */
  def pivotKnown(df: DataFrame, propsMapCol: String, keys: Seq[String] = knownKeys): DataFrame =
    keys.foldLeft(df) { (acc, k) =>
      acc.withColumn(k, element_at(col(propsMapCol), k).cast(DoubleType))
    }

  /** P5: the HDFS reader's fixed heap projection (init/committed/used/
    * max) — one codegen struct walk per event
    * ([[graft.functions.TextExpressions.SectionPropsMapExpr]]) instead
    * of the filter/transform/map_from_entries lambda stack (three
    * interpreted HOFs per JVMSTATS event on the wire path).
    */
  def heapProjection(df: DataFrame, sectionsCol: String = "sections"): DataFrame = {
    val m = graft.functions.TextExpressions.section_props_map(
      col(sectionsCol), "heap")
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
