package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.JvmStats

/** JVMSTATS pivots over garmadon-shaped nested fixtures (FIXTURES.md B3). */
class JvmStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("sections", JvmStats.sectionsType)))

  private def sec(name: String, props: (String, String)*) =
    Row(name, props.map { case (k, v) => Row(k, v) })

  lazy val df = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, Seq(
        sec("heap", "init" -> "100", "committed" -> "200", "used" -> "150", "max" -> "400"),
        sec("gc(PS Scavenge)", "count" -> "7", "time" -> "123"),
        sec("threads", "count" -> "42", "total" -> "50"))),
      Row(2L, Seq(
        sec("disk", "sda_reads" -> "11", "sda_writes" -> "3", "sdb_reads" -> "5"),
        sec("network", "eth0_rx" -> "1000")))),
    schema)

  test("explodeFlat yields one row per (section, property)") {
    val flat = JvmStats.explodeFlat(df)
    assert(flat.count() == 12)
    assert(flat.where($"section" === "heap" && $"property" === "used")
      .select("value").as[String].head() == "150")
  }

  test("toPropsMap builds {section}_{property} map; numericProps casts") {
    val m = df.select($"event_id", JvmStats.toPropsMap($"sections").as("props"))
    val used = m.where($"event_id" === 1)
      .select(element_at($"props", "heap_used")).as[String].head()
    assert(used == "150")
    val nums = m.select($"event_id", JvmStats.numericProps($"props").as("nums"))
      .where($"event_id" === 1)
      .select(element_at($"nums", "gc(PS Scavenge)_count")).as[Double].head()
    assert(nums == 7.0)
    // one codegen struct walk per event — no nested transform lambdas,
    // no flatten/map_from_entries (repartition blocks the LocalRelation
    // constant-fold so the runtime plan is visible)
    val plan = df.repartition(2)
      .select(JvmStats.toPropsMap($"sections"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_all_section_props"), plan)
    assert(!plan.contains("lambdafunction") && !plan.contains("map_from_entries"),
      plan)
    // event 2's map carries BOTH its sections through the one walk
    val e2 = m.where($"event_id" === 2).select($"props").head()
      .getMap[String, String](0)
    assert(e2.size == 4 && e2("network_eth0_rx") == "1000", e2.toString)
    // a repeated composite key is first-wins, not a job-killing
    // MAP_KEY_DEDUP exception (malformed events happen at crawl rates)
    val dup = spark.createDataFrame(java.util.Arrays.asList(
      Row(9L, Seq(sec("heap", "used" -> "1", "used" -> "2")))), schema)
      .select(JvmStats.toPropsMap($"sections")).head().getMap[String, String](0)
    assert(dup("heap_used") == "1", dup.toString)
    // a null sections array stays null
    assert(spark.createDataFrame(java.util.Arrays.asList(Row(9L, null)), schema)
      .select(JvmStats.toPropsMap($"sections")).head().isNullAt(0))
  }

  test("heapProjection extracts the 4 fixed heap columns (HDFS flavor)") {
    val out = JvmStats.heapProjection(df).where($"event_id" === 1)
      .select("heap_init", "heap_committed", "heap_used", "heap_max")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((100L, 200L, 150L, 400L)))
    // one codegen struct walk per event, not a filter/transform/
    // map_from_entries lambda stack (repartition blocks the
    // LocalRelation constant-fold so the runtime plan is visible)
    val plan = JvmStats.heapProjection(df.repartition(2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_section_props"), plan)
    assert(!plan.contains("lambdafunction") && !plan.contains("map_from_entries"),
      plan)
    // a missing section yields an empty map → all-null columns, and a
    // null sections array stays null — never a crash
    import graft.functions.TextExpressions
    val missing = df.where($"event_id" === 1).select(
      TextExpressions.section_props_map($"sections", "nope").as("m"),
      TextExpressions.section_props_map(lit(null).cast(
        graft.operators.JvmStats.sectionsType), "heap").as("n"))
      .head()
    assert(missing.getMap[String, String](0).size == 0 && missing.isNullAt(1))
  }

  test("pivotKnown widens the map over a known key list") {
    val m = df.select($"event_id", JvmStats.toPropsMap($"sections").as("props"))
    val wide = JvmStats.pivotKnown(m, "props", Seq("heap_used", "threads_count"))
    val r = wide.where($"event_id" === 1).select("heap_used", "threads_count")
      .as[(Double, Double)].head()
    assert(r == ((150.0, 42.0)))
  }

  test("deviceSplit emits one OS row per device metric") {
    val os = JvmStats.deviceSplit(JvmStats.explodeFlat(df))
    assert(os.count() == 4)
    val devices = os.select("device").distinct().as[String].collect().toSet
    assert(devices == Set("sda", "sdb", "eth0"))
    val m = os.where($"device" === "sda" && $"metric" === "reads")
      .select("value").as[String].head()
    assert(m == "11")
  }
}
