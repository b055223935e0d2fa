package graft

import org.apache.spark.sql.functions._

import graft.sources.EventTables
import graft.streaming.EventSink

/** Union view schema alignment + catalog registration (S9). */
class EventTablesSpec extends SparkSpecBase {
  import spark.implicits._

  test("unionView aligns heterogeneous schemas, nulls missing body columns") {
    val fs = Seq(("app1", "READ", 10L)).toDF("application_id", "action", "method_duration_millis")
    val gc = Seq(("app1", "PS Scavenge", 42L)).toDF("application_id", "collector_name", "pause_time")
    val u = EventTables.unionView(Map("FS_EVENT" -> fs, "GC_EVENT" -> gc))
    assert(u.count() == 2)
    assert(u.columns.toSet ==
      Set("application_id", "action", "method_duration_millis", "event_type", "collector_name", "pause_time"))
    val fsRow = u.where($"event_type" === "FS_EVENT").collect().head
    assert(fsRow.getAs[String]("collector_name") == null) // missing body col nulled
    // cross-type count query (A10 shape) works on the union
    val counts = u.groupBy("event_type").count().orderBy("event_type")
      .as[(String, Long)].collect().toSeq
    assert(counts == Seq(("FS_EVENT", 1L), ("GC_EVENT", 1L)))
  }

  test("registerTable creates a queryable catalog table over the sink layout") {
    val dir = java.nio.file.Files.createTempDirectory("cat").toString
    val events = Seq(("FS_EVENT", java.sql.Timestamp.valueOf("2024-03-01 08:00:00"), "c1"))
      .toDF("event_type", "timestamp", "container_id")
    EventSink.writePartitioned(events, dir)
    EventSink.registerTable(spark, "graft_events_test", dir)
    val n = spark.sql(
      "SELECT count(*) FROM graft_events_test WHERE event_type = 'FS_EVENT' AND day = '2024-03-01'")
      .as[Long].head()
    assert(n == 1L)
    spark.sql("DROP TABLE graft_events_test")
  }
}
