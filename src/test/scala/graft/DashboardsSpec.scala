package graft

import org.apache.spark.sql.functions._

import graft.serving.Dashboards

/** Dashboard recipes over garmadon-shaped fixtures (FIXTURES.md B1/B2). */
class DashboardsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)

  lazy val fsEvents = Seq(
    ("alice", "READ", "hdfs://root:8020", 10L, ts(0)),
    ("alice", "READ", "hdfs://root:8020", 30L, ts(5)),
    ("bob", "WRITE", "hdfs://root:8020", 100L, ts(40)),
    ("bob", "DELETE", "hdfs://other:8020", 5L, ts(41)))
    .toDF("hdfs_user", "action", "uri", "method_duration_millis", "timestamp")

  lazy val gcEvents = Seq(
    ("PS Scavenge", 12L, ts(1)), ("PS Scavenge", 20L, ts(2)), ("PS MarkSweep", 300L, ts(35)))
    .toDF("collector_name", "pause_time", "timestamp")

  test("fsOpsPerUser: normalized-uri filter + bucketed counts + p99") {
    val out = Dashboards.fsOpsPerUser(fsEvents, "hdfs://root", interval = "30 seconds")
    val rows = out.orderBy("bucket_start", "hdfs_user").collect()
    assert(rows.length == 2) // alice READ bucket 0, bob WRITE bucket 30; DELETE filtered (other uri)
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(2L, 1L))
  }

  test("containerMemory sums value/limit for MEMORY type only") {
    val ce = Seq(
      ("MEMORY", 100.0f, 512L, ts(0)), ("MEMORY", 200.0f, 512L, ts(3)), ("VCORE", 2.0f, 4L, ts(4)))
      .toDF("type", "value", "limit", "timestamp")
    val r = Dashboards.containerMemory(ce).collect()
    assert(r.length == 1 && r.head.getAs[Double]("used") == 300.0 && r.head.getAs[Long]("reserved") == 1024L)
  }

  test("gcPause buckets by collector") {
    val rows = Dashboards.gcPause(gcEvents).orderBy("bucket_start", "collector_name").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[Long]("pause_ms") == 32L && rows.head.getAs[Long]("n_gcs") == 2L)
    assert(rows.last.getAs[Long]("max_pause_ms") == 300L)
  }

  test("bucketedDerivative computes per-bucket delta of a max") {
    val threads = Seq((10L, ts(0)), (15L, ts(31)), (18L, ts(65)))
      .toDF("count", "timestamp")
    val out = Dashboards.bucketedDerivative(threads, col("count"), "30 seconds")
      .orderBy("bucket_start").select("dv_per_bucket").collect()
    assert(out.map(r => Option(r.get(0))).toSeq == Seq(None, Some(5L), Some(3L)))
  }

  test("topUsers returns K users by op count") {
    val out = Dashboards.topUsers(fsEvents, k = 1).collect()
    assert(out.length == 1 && out.head.getAs[String]("hdfs_user") == "alice"
      && out.head.getAs[Long]("n_ops") == 2L)
  }

  test("stateAnnotations filters typed state transitions") {
    val ev = Seq(
      ("SPARK_STAGE_STATE_EVENT", "app1", "BEGIN", Seq("YARN_APPLICATION"), ts(0)),
      ("SPARK_STAGE_STATE_EVENT", "app1", "END", Seq("YARN_APPLICATION"), ts(5)),
      ("GC_EVENT", "app1", "", Seq[String](), ts(6)))
      .toDF("event_type", "application_id", "state", "tags", "timestamp")
    val out = Dashboards.stateAnnotations(ev, "app1")
    assert(out.count() == 1)
    assert(out.columns.toSeq == Seq("timestamp", "tags"))
  }
}
