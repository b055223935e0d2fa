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

  private lazy val fsEventsFull = Seq(
    ("alice", "READ", "hdfs://root:8020", 10L, ts(0), "app_1", "SPARK", "EXECUTOR", "h1", "p1", "SUCCESS"),
    ("alice", "READ", "hdfs://root:8020", 30L, ts(5), "app_1", "SPARK", "EXECUTOR", "h1", "p1", "FAILURE"),
    ("bob", "WRITE", "hdfs://root:8020", 100L, ts(40), "app_2", "FLINK", "TASK_MANAGER", "h2", "p2", "SUCCESS"),
    ("bob", "DELETE", "hdfs://other:8020", 5L, ts(41), "app_2", "FLINK", "TASK_MANAGER", "h2", "p2", "SUCCESS"))
    .toDF("hdfs_user", "action", "uri", "method_duration_millis", "timestamp",
      "application_id", "framework", "component", "hostname", "pid", "status")

  private lazy val jvmProps = Seq(
    ("app_1", Map("heap_used" -> "100", "threads_count" -> "8", "compile_time" -> "40",
      "safepoints_count" -> "3", "descriptors_open" -> "17"), 900L, 5L, ts(0)),
    ("app_1", Map("heap_used" -> "300", "threads_count" -> "10", "compile_time" -> "70",
      "safepoints_count" -> "5", "descriptors_open" -> "18"), 1500L, 9L, ts(31)))
    .toDF("application_id", "props", "gc_time", "threads_total", "timestamp")

  test("panel census: every garmadon-jvm/garmadon-hdfs panel maps to a running operator") {
    // one executable row per CONCRETE panel of the two flagship dashboards
    // (reference grafana/garmadon-jvm.json + garmadon-hdfs.json): panel
    // title -> the Dashboards call that serves it. Raw-document/annotation
    // table panels map to rawEvents (covered in its own test below).
    val census: Seq[(String, String, org.apache.spark.sql.DataFrame)] = Seq(
      ("jvm", "CPU", Dashboards.jvmSeries(jvmProps, "cpu_%load", "sum")),
      ("jvm", "HEAP Usage", Dashboards.jvmSeries(jvmProps, "heap_used", "avg")),
      ("jvm", "OFF-HEAP Usage", Dashboards.jvmSeries(jvmProps, "nonheap_used", "avg")),
      ("jvm", "Metadata Space Used", Dashboards.jvmSeries(jvmProps, "metaspace_used", "avg")),
      ("jvm", "GC Pause duration", Dashboards.gcPause(gcEvents)),
      ("jvm", "GC CPU time", Dashboards.gcCpuTime(jvmProps, col("gc_time"))),
      ("jvm", "GC Count", Dashboards.gcCount(jvmProps, col("gc_time"))),
      ("jvm", "GC Events", Dashboards.rawEvents(gcEvents, col("pause_time") > 0)),
      ("jvm", "#Threads", Dashboards.jvmSeries(jvmProps, "threads_count", "avg")),
      ("jvm", "#Threads Created", Dashboards.threadsCreatedRate(jvmProps)),
      ("jvm", "#File Descriptors", Dashboards.jvmSeries(jvmProps, "descriptors_open", "avg")),
      ("jvm", "Compile Count", Dashboards.jvmSeries(jvmProps, "compile_count", "avg")),
      ("jvm", "Compile Time", Dashboards.jvmSeries(jvmProps, "compile_time", "avg")),
      ("jvm", "Number of compile threads", Dashboards.jvmSeries(jvmProps, "compile_threads", "avg")),
      ("jvm", "Safepoint Count", Dashboards.jvmSeries(jvmProps, "safepoints_count", "avg")),
      ("jvm", "Safepoint Time", Dashboards.jvmSeries(jvmProps, "safepoints_totaltime", "avg")),
      ("jvm", "FS action on $uri", Dashboards.fsOpsPerAction(fsEventsFull, "hdfs://root")),
      ("jvm", "FS Latency action on $uri", Dashboards.fsOpsLatency(fsEventsFull)),
      ("hdfs", "FS OPS for $uri:$path", Dashboards.fsOpsPerAction(fsEventsFull, "hdfs://root")),
      ("hdfs", "FS Latency for $uri:$path", Dashboards.fsOpsLatency(fsEventsFull)),
      ("hdfs", "Failures", Dashboards.fsOpsPerAction(fsEventsFull, "hdfs://root", failuresOnly = true)),
      ("hdfs", "FS OPS $action per user (top 20)", Dashboards.fsOpsPerUser(fsEventsFull, "hdfs://root")),
      ("hdfs", "FS Latency $action per user (top 20)", Dashboards.fsOpsPerUser(fsEventsFull, "hdfs://root")),
      ("hdfs", "FS OPS $action per application (top 20)", Dashboards.fsOpsPerApplication(fsEventsFull, "hdfs://root")),
      ("hdfs", "FS OPS per framework/component", Dashboards.fsOpsPerFrameworkComponent(fsEventsFull, "hdfs://root")),
      ("hdfs", "FS OPS per host-user-pid", Dashboards.fsOpsPerHostUserPid(fsEventsFull, "hdfs://root")))
    census.foreach { case (dash, panel, df) =>
      val n = df.count()
      assert(n >= 0, s"[$dash] $panel did not execute")
      assert(df.columns.contains("bucket_start") || df.columns.contains("timestamp") ||
        df.columns.contains("collector_name"),
        s"[$dash] $panel output carries no time axis: ${df.columns.mkString(",")}")
    }
    // spot-check semantics on the census fixtures: failures panel counts
    // only FAILURE rows; the framework/component panel groups both keys
    val fails = Dashboards.fsOpsPerAction(fsEventsFull, "hdfs://root", failuresOnly = true)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(fails == 1L)
    val fw = Dashboards.fsOpsPerFrameworkComponent(fsEventsFull, "hdfs://root")
    assert(fw.columns.toSeq.containsSlice(Seq("framework", "component")))
    assert(fw.count() == 2) // (SPARK, EXECUTOR) bucket 0, (FLINK, TASK_MANAGER) bucket 30
    // jvmSeries folds the props-map key with the panel's agg
    val heap = Dashboards.jvmSeries(jvmProps, "heap_used", "avg", "30 seconds")
      .orderBy("bucket_start").select("v").collect().map(_.getDouble(0)).toSeq
    assert(heap == Seq(100.0, 300.0))
    val gcRate = Dashboards.gcCpuTime(jvmProps, col("gc_time"), "30 seconds")
      .orderBy("bucket_start").select("dv_per_bucket").collect()
    assert(gcRate.map(r => Option(r.get(0))).toSeq == Seq(None, Some(600L)))
    intercept[IllegalArgumentException] {
      Dashboards.jvmSeries(jvmProps, "heap_used", "median")
    }
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

  test("appThreadsRate: per-app per-container partitioned thread derivative") {
    val jvm = Seq(
      ("app_1", "c1", 100L, ts(0)), ("app_1", "c1", 130L, ts(31)),
      ("app_1", "c2", 50L, ts(1)), ("app_1", "c2", 90L, ts(32)),
      ("app_2", "c9", 999L, ts(0)))
      .toDF("application_id", "container_id", "threads_total", "timestamp")
    val out = Dashboards.appThreadsRate(jvm, "app_1")
      .orderBy("container_id", "bucket_start").collect()
    assert(out.length == 4) // two containers × two buckets, app_2 filtered
    val deltas = out.map(r => Option(r.getAs[Long]("dv_per_bucket"))).toSeq
    assert(deltas == Seq(None, Some(30L), None, Some(40L)))
  }

  test("appContainerMemory: per-container used/limit for one app") {
    val ce = Seq(
      ("app_1", "c1", "MEMORY", 100.0f, 512L, ts(0)),
      ("app_1", "c1", "MEMORY", 250.0f, 512L, ts(3)),
      ("app_1", "c2", "MEMORY", 90.0f, 256L, ts(4)),
      ("app_1", "c1", "VCORE", 2.0f, 4L, ts(5)),
      ("app_2", "c3", "MEMORY", 999.0f, 999L, ts(6)))
      .toDF("application_id", "container_id", "type", "value", "limit", "timestamp")
    val rows = Dashboards.appContainerMemory(ce, "app_1")
      .orderBy("container_id").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[Float]("used") == 250.0f && rows.head.getAs[Long]("limit") == 512L)
    assert(rows.last.getAs[Float]("used") == 90.0f)
  }

  test("sparkStageDurations: completed stages only, duration from start_time") {
    val stages = Seq(
      ("app_1", "1", "0", "collect at X", 8, "COMPLETED", ts(10).getTime - 4000L, ts(10)),
      ("app_1", "2", "0", "save at Y", 4, "FAILED", ts(20).getTime - 1000L, ts(20)),
      ("app_2", "1", "0", "other", 1, "COMPLETED", ts(5).getTime, ts(5)))
      .toDF("application_id", "stage_id", "stage_attempt_id", "stage_name",
        "num_tasks", "status", "start_time", "timestamp")
    val rows = Dashboards.sparkStageDurations(stages, "app_1").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("stage_id") == "1")
    assert(rows.head.getAs[Long]("duration_ms") == 4000L)
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
