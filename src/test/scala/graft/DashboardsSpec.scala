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

  test("panel census: the remaining 8 dashboards' graph/table panels map to running operators") {
    import org.apache.spark.sql.DataFrame
    // typed fixtures for the event families the 8 dashboards read
    val ce = Seq( // CONTAINER_MONITORING_EVENT rows
      ("MEMORY", 512.0f, 1024L, ts(0), "app_1", "c1", "alice", "SPARK", "EXECUTOR"),
      ("MEMORY", 600.0f, 1024L, ts(31), "app_2", "c2", "bob", "FLINK", "TASK_MANAGER"),
      ("VCORE", 2.0f, 4L, ts(1), "app_1", "c1", "alice", "SPARK", "EXECUTOR"))
      .toDF("type", "value", "limit", "timestamp", "application_id", "container_id",
        "username", "framework", "component")
    val os = Seq( // OS rows (post-deviceSplit pivot: one row per host sample)
      ("h1", 55.0, 70.0, 12.0, 1000L, 2000L, 300L, 400L, 0L, 1L, ts(0)),
      ("h2", 25.0, 50.0, 2.0, 500L, 800L, 100L, 150L, 2L, 0L, ts(2)))
      .toDF("hostname", "cpu", "mem", "iowait", "writebytes", "readbytes",
        "rx", "tx", "errin", "errout", "timestamp")
    val tasks = Seq( // SPARK_TASK_EVENT metric rows
      ("COMPLETED", "PROCESS_LOCAL", "e1", 3L, 900L, 10L, 2048L, 5L, 3L, 7L, 4096L,
        12L, 100L, 8192L, 50L, 4096L, 1L << 20, 512L, 0L, 0L, ts(0), "app_1"),
      ("FAILED", "ANY", "e2", 3L, 1500L, 4L, 1024L, 2L, 1L, 3L, 2048L,
        6L, 40L, 4096L, 20L, 2048L, 1L << 19, 256L, 128L, 64L, ts(31), "app_1"))
      .toDF("status", "locality", "executor_id", "stage_id", "runtime_ms",
        "shuffle_read_records", "shuffle_read_bytes", "fetch_wait_ms", "shuffle_blocks",
        "shuffle_write_records", "shuffle_write_bytes", "write_time_ms",
        "input_records", "input_bytes", "output_records", "output_bytes",
        "peak_memory", "result_size", "spilled_mem", "spilled_disk",
        "timestamp", "application_id")
    val rdd = Seq(("rdd_7", "MEMORY", 4096L, "e1", ts(0)), ("bc_1", "BROADCAST", 128L, "e1", ts(1)))
      .toDF("block_id", "storage_kind", "memory_used", "executor_id", "timestamp")
    val flink = Seq( // FLINK job/checkpoint/kafka metric rows
      ("job_1", 60000L, 0L, 0L, 900L, 3L, 1L << 20, 0L, 120L, 50L, 4096L, 2L, 1L, 8L, 64L, ts(0)),
      ("job_1", 90000L, 500L, 1L, 1400L, 4L, 1L << 21, 2L, 300L, 80L, 8192L, 2L, 1L, 8L, 64L, ts(31)))
      .toDF("job_name", "uptime", "downtime", "restarts", "checkpoint_duration",
        "checkpoint_count", "checkpoint_size", "alignment_buffered",
        "kafka_lag", "kafka_records_rate", "kafka_bytes_rate",
        "num_task_managers", "num_running_jobs", "num_task_slots",
        "network_memory_segments", "timestamp")
    val flinkTasks = Seq(
      ("task_a", 1000L, 1L << 20, 900L, 1L << 19, 30L, 25L, 0.4, 2L, 5000L, 77L, ts(0)),
      ("task_a", 2500L, 1L << 21, 2100L, 1L << 20, 70L, 60L, 0.6, 1L, 9000L, 142L, ts(31)))
      .toDF("task_name", "records_in", "bytes_in", "records_out", "bytes_out",
        "buffers_out", "buffers_in", "buffers_usage", "queued_buffers",
        "kafka_committed_offset", "watermark", "timestamp")
    val appEvents = Seq(("app_1", "RUNNING", "http://tracker/app_1", ts(0)))
      .toDF("application_id", "state", "tracking_url", "timestamp")

    import Dashboards._
    def series(dash: String, panel: String, df: DataFrame) = (dash, panel, df)
    val census: Seq[(String, String, DataFrame)] = Seq(
      // --- garmadon-compute ---
      series("compute", "Applications/Containers running",
        cardinalitySeries(ce, col("container_id"), where = col("type") === "MEMORY")),
      series("compute", "YARN Memory Used/Reserved", containerMemory(ce)),
      series("compute", "YARN Vcores Used/Reserved",
        metricSeries(ce, col("value"), "sum", where = col("type") === "VCORE")),
      series("compute", "Disks bytes reads/writes", metricSeries(os, col("writebytes"), "sum")),
      series("compute", "Network tx/rx", metricSeries(os, col("rx"), "sum")),
      series("compute", "Top app running container",
        cardinalitySeries(ce, col("container_id"), groupCols = Seq(col("application_id")),
          where = col("type") === "MEMORY")),
      series("compute", "Top app reserved memory",
        metricSeries(ce, col("limit"), "sum", groupCols = Seq(col("application_id")),
          where = col("type") === "MEMORY")),
      series("compute", "Top app reserved vcores",
        metricSeries(ce, col("limit"), "sum", groupCols = Seq(col("application_id")),
          where = col("type") === "VCORE")),
      series("compute", "#Applications Per User",
        cardinalitySeries(ce, col("application_id"), groupCols = Seq(col("username")))),
      series("compute", "#Containers Per User",
        cardinalitySeries(ce, col("container_id"), groupCols = Seq(col("username")))),
      series("compute", "YARN Memory Reserved/Used per user",
        metricSeries(ce, col("value"), "sum", groupCols = Seq(col("username")),
          where = col("type") === "MEMORY")),
      series("compute", "#Applications Per Framework",
        cardinalitySeries(ce, col("application_id"), groupCols = Seq(col("framework")))),
      series("compute", "#Container Per Framework/Component",
        cardinalitySeries(ce, col("container_id"),
          groupCols = Seq(col("framework"), col("component")))),
      series("compute", "YARN Memory/Vcores per framework",
        metricSeries(ce, col("value"), "sum",
          groupCols = Seq(col("framework"), col("component")))),
      // --- garmadon-server-overview ---
      series("server-overview", "CPU Usage",
        metricSeries(os, col("cpu"), "avg", groupCols = Seq(col("hostname")))),
      series("server-overview", "MEM Usage",
        metricSeries(os, col("mem"), "avg", groupCols = Seq(col("hostname")))),
      series("server-overview", "I/O Disks",
        metricSeries(os, col("iowait"), "avg", groupCols = Seq(col("hostname")))),
      series("server-overview", "Disks bytes reads/writes",
        metricSeries(os, col("readbytes"), "sum", groupCols = Seq(col("hostname")))),
      series("server-overview", "Network tx/rx",
        metricSeries(os, col("tx"), "sum", groupCols = Seq(col("hostname")))),
      series("server-overview", "Network errin/errout",
        metricSeries(os, col("errin"), "sum", groupCols = Seq(col("hostname")))),
      // --- garmadon-spark-job (+ -stages/-executors drill-downs: same
      //     metrics, terms key = stage_id / executor_id) ---
      series("spark-job", "Stages/Executors Events", rawEvents(tasks, col("status") === "FAILED")),
      series("spark-job", "Number of Tasks",
        metricSeries(tasks, col("status"), "count", groupCols = Seq(col("status")))),
      series("spark-job", "Tasks locality",
        metricSeries(tasks, col("locality"), "count", groupCols = Seq(col("locality")))),
      series("spark-job", "Stage runtime", sparkStageDurations(
        Seq(("app_1", "COMPLETED", 3L, 0L, "s", 8L, 1000L, ts(9)))
          .toDF("application_id", "status", "stage_id", "stage_attempt_id",
            "stage_name", "num_tasks", "start_time", "timestamp"), "app_1")),
      series("spark-job", "Task runtime (percentiles)",
        percentileSeries(tasks, col("runtime_ms"), 0.75)),
      series("spark-job", "Shuffle read records/bytes",
        metricSeries(tasks, col("shuffle_read_records"), "sum")),
      series("spark-job", "Fetch wait time",
        metricSeries(tasks, col("fetch_wait_ms"), "sum")),
      series("spark-job", "Shuffle blocks fetched",
        metricSeries(tasks, col("shuffle_blocks"), "sum")),
      series("spark-job", "Shuffle write records/bytes",
        metricSeries(tasks, col("shuffle_write_bytes"), "sum")),
      series("spark-job", "Write blocking time",
        metricSeries(tasks, col("write_time_ms"), "sum")),
      series("spark-job", "Input/Output records+bytes",
        metricSeries(tasks, col("input_bytes"), "sum")),
      series("spark-job", "Peak memory",
        metricSeries(tasks, col("peak_memory"), "max")),
      series("spark-job", "TaskResult bytes",
        metricSeries(tasks, col("result_size"), "sum")),
      series("spark-job", "Spilled bytes",
        metricSeries(tasks, col("spilled_mem"), "sum")),
      series("spark-job-stages", "per-stage metric drill-down",
        metricSeries(tasks, col("shuffle_read_bytes"), "sum",
          groupCols = Seq(col("stage_id")))),
      series("spark-job-executors", "per-executor metric drill-down",
        metricSeries(tasks, col("runtime_ms"), "sum",
          groupCols = Seq(col("executor_id"), col("status")))),
      series("spark-job-executors", "RDD/BROADCAST/STREAM persistence",
        metricSeries(rdd, col("memory_used"), "sum",
          groupCols = Seq(col("storage_kind"), col("executor_id")))),
      // --- garmadon-flink-job / -job-tasks ---
      series("flink-job", "Uptime/Downtime", metricSeries(flink, col("uptime"), "max",
        groupCols = Seq(col("job_name")))),
      series("flink-job", "Number of restarts",
        metricSeries(flink, col("restarts"), "max", groupCols = Seq(col("job_name")))),
      series("flink-job", "Checkpoint Duration",
        metricSeries(flink, col("checkpoint_duration"), "max",
          groupCols = Seq(col("job_name")))),
      series("flink-job", "Number Of Checkpoints",
        metricSeries(flink, col("checkpoint_count"), "max",
          groupCols = Seq(col("job_name")))),
      series("flink-job", "Checkpoint Size",
        metricSeries(flink, col("checkpoint_size"), "max",
          groupCols = Seq(col("job_name")))),
      series("flink-job", "Alignement Buffered",
        metricSeries(flink, col("alignment_buffered"), "max",
          groupCols = Seq(col("job_name")))),
      series("flink-job", "Kafka lag",
        metricSeries(flink, col("kafka_lag"), "max", groupCols = Seq(col("job_name")))),
      series("flink-job", "Kafka records/bytes rate",
        metricSeries(flink, col("kafka_records_rate"), "avg",
          groupCols = Seq(col("job_name")))),
      series("flink-job", "Restore time tables", rawEvents(flink, col("restarts") > 0)),
      series("flink-job", "Number Of TaskManager/Jobs/Slots",
        metricSeries(flink, col("num_task_managers"), "max")),
      series("flink-job", "Network Memory Segments",
        metricSeries(flink, col("network_memory_segments"), "max")),
      series("flink-job-tasks", "Records/Bytes read+emitted",
        metricSeries(flinkTasks, col("records_in"), "max",
          groupCols = Seq(col("task_name")))),
      series("flink-job-tasks", "Buffers/Queues",
        metricSeries(flinkTasks, col("buffers_usage"), "avg",
          groupCols = Seq(col("task_name")))),
      series("flink-job-tasks", "Last watermark (table)",
        rawEvents(flinkTasks, col("watermark") > 0, n = 1)),
      series("flink-job-tasks", "Kafka Commits/Offsets",
        metricSeries(flinkTasks, col("kafka_committed_offset"), "max",
          groupCols = Seq(col("task_name")))),
      // --- garmadon-yarn-application (JVM rows reuse the garmadon-jvm
      //     census; the app-scoped extras:) ---
      series("yarn-application", "Tracking URLs",
        rawEvents(appEvents, col("tracking_url").isNotNull)),
      series("yarn-application", "Sum Vcore/Memory",
        metricSeries(ce, col("value"), "sum",
          where = col("application_id") === "app_1" && col("type") === "MEMORY")),
      series("yarn-application", "Vcore/Memory Per Component Container",
        metricSeries(ce, col("value"), "max",
          groupCols = Seq(col("component"), col("container_id")),
          where = col("application_id") === "app_1")),
      series("yarn-application", "FS OPS/Latency per App/Attempt/Container",
        fsOpsPerContainer(fsEventsFull
          .withColumn("attempt_id", lit("1"))
          .withColumn("container_id", concat(lit("c_"), col("pid"))), "hdfs://root")))

    census.foreach { case (dash, panel, df) =>
      assert(df.count() >= 0, s"[$dash] $panel did not execute")
      // every panel output is time-addressed: a bucket series, raw rows
      // with their timestamp, or a per-entity duration table
      assert(Seq("bucket_start", "timestamp", "duration_ms").exists(df.columns.contains),
        s"[$dash] $panel output carries no time axis: ${df.columns.mkString(",")}")
    }
    // spot-checks: the generic series fold correctly on the fixtures
    assert(metricSeries(ce, col("value"), "sum", where = col("type") === "VCORE")
      .agg(sum("v")).collect()(0).getDouble(0) == 2.0)
    assert(metricSeries(tasks, col("peak_memory"), "max")
      .agg(max("v")).collect()(0).getLong(0) == (1L << 20))
    assert(cardinalitySeries(ce, col("application_id"), groupCols = Seq(col("username")))
      .count() == 2) // alice bucket 0, bob bucket 30
    intercept[IllegalArgumentException] { metricSeries(ce, col("value"), "median") }
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
