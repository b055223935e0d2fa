package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType, StructField, StructType}

import graft.streaming.Sessionizer.{SessionEvent, SessionResult}
import graft.streaming.StreamingEnrichment.{AppAttrs, EnrichInput, EnrichedEvent}

/** Correctness-gate queries that execute through the Structured Streaming
  * engine end-to-end — file source → stateful operator → streaming sink —
  * instead of the batch planner the other gate queries use. The reference
  * is first of all a streaming system (its heuristics fold a Kafka stream:
  * reference readers/heuristics/src/main/java/.../Heuristics.java:141-167),
  * so at least one oracle row must cross the streaming engine, not just
  * the operator's batch mode.
  */
object StreamingGate {

  /** Sessionization through the streaming engine. Derives a deterministic
    * session-event stream from the events table (metric = floor(value*100),
    * integer-valued in double, so sums are exact and order-independent —
    * the fold order inside a micro-batch is not an engine contract), plus
    * one per-user END marker after the user's last event. The stream runs
    * `flatMapGroupsWithState` (via [[Sessionizer.sessionAggregate]]) under
    * `Trigger.AvailableNow` with a real checkpoint dir and a `foreachBatch`
    * parquet sink; every output row therefore crossed the streaming state
    * store. The DuckDB oracle recomputes the per-user session aggregate
    * relationally.
    */
  def streamSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val work = graft.sources.BucketedTables.scratchDir("graft_stream_gate_")
      .toFile.getAbsolutePath
    val srcDir = s"$work/src"; val outDir = s"$work/out"; val ckpt = s"$work/ckpt"

    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val base = events.select(
      col("user_id").cast(StringType).as("appKey"),
      col("event_type").as("containerId"),
      lit("METRIC").as("eventType"),
      lit("").as("state"),
      unix_millis(col("ts")).as("tsMillis"),
      floor(col("value") * 100).cast(DoubleType).as("metric"))
    val ends = events
      .groupBy(col("user_id").cast(StringType).as("appKey"))
      .agg((max(unix_millis(col("ts"))) + 1000L).as("tsMillis"))
      .select(col("appKey"), lit("end").as("containerId"),
        lit("STATE_EVENT").as("eventType"), lit("END").as("state"),
        col("tsMillis"), lit(0.0).as("metric"))
    // ONE file ⇒ one micro-batch ⇒ a user's END cannot precede that user's
    // events across batches (within a batch the operator folds the whole
    // iterator before acting on END, so intra-batch order is irrelevant)
    base.unionByName(ends).coalesce(1).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(Encoders.product[SessionEvent].schema)
      .parquet(srcDir)
      .as[SessionEvent]
    val query = Sessionizer.sessionAggregate(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[SessionResult], _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .start()
    query.awaitTermination()

    spark.read.parquet(outDir)
      .select(
        col("appKey").cast(LongType).as("user_id"),
        col("nContainers").cast(LongType).as("n_containers"),
        col("count").as("n_events"),
        col("sum").as("sum_metric"),
        col("max").as("max_metric"),
        col("min").as("min_metric"),
        col("durationMillis").as("duration_ms"),
        col("closedBy").as("closed_by"))
      .orderBy(col("user_id"))
  }

  /** S1→S2→S7 through the streaming engine: the reference's batch-dump
    * lifecycle (one consumer fanning decoded messages out to per-type
    * day-partitioned writers, then stamping finished days — reference
    * readers/hdfs/src/main/java/.../ReaderFactory.java:191-314) executed
    * end-to-end. Every events row is encoded as an FS_EVENT wire frame
    * (every 7th additionally as a GC_EVENT), the frames go through a file
    * stream → [[EventRouter.routeTyped]] (envelope decode + watermark
    * in-plan, per-type proto decode + day-partitioned append inside
    * `foreachBatch`) → [[EventRouter.closeDays]] with the query's final
    * watermark. The result re-reads the ROUTED TABLES from disk and
    * aggregates per (type, day, group); the DuckDB oracle recomputes the
    * same aggregate from the raw events columns, so any drift anywhere in
    * encode → stream → route → day-partition → read-back breaks the hash.
    * `day_partitioned` / `markers_ok` are Spark-side MEASURED layout
    * witnesses (day= dirs exist; every watermark-closed day carries
    * `_DONE`); `lag_listener_ok` additionally runs [[IngestLagListener]]
    * (ST11) on the route query and pins its bookkeeping to ground truth —
    * max absorbed event time == the events table's true max ts, watermark
    * == the engine's own lastProgress, lag arithmetic coherent. The
    * oracle contributes the data values and hardcodes the witnesses TRUE.
    */
  def streamRoute(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.model.{EventModel, ProtoDescriptors}
    // exit-time-cleaned scratch: the returned plan lazily reads the routed
    // tables, so eager deletion is impossible and a plain temp dir would
    // leak frames + tables + checkpoint on every invocation
    val work = graft.sources.BucketedTables.scratchDir("graft_stream_route_")
      .toFile.getAbsolutePath
    val srcDir = s"$work/frames"; val base = s"$work/tables"; val ckpt = s"$work/ckpt"

    // fanout (r15): the single-file events scan would otherwise run the
    // whole wire-encode map as one task (see Dedup.fanout)
    val rows = graft.operators.Dedup.fanout(
      graft.sources.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms")), col("event_id"))
      .as[(Long, Long, String, Long)]
    val frames = rows.mapPartitions { it =>
      it.flatMap { case (eventId, userId, eventType, tsMs) =>
        val header = ProtoDescriptors.header.encode(Seq(
          s"application_${userId % 20}", "1", "graft_pipeline", s"user_${userId % 7}",
          s"container_${eventId % 97}", s"host_${userId % 11}", "", "YARN", "EXECUTOR",
          "", Seq("YARN_APPLICATION"), "", "", "", 0, ""))
        val fsBody = ProtoDescriptors.fsEvent.encode(Seq(
          "", "", eventType.toUpperCase, "hdfs://root", eventId % 997,
          s"user_${userId % 7}", if (eventId % 10 == 0) "FAILURE" else "SUCCESS"))
        val fsFrame = (EventModel.encode(EventModel.Frame(
          EventModel.markerForName("FS_EVENT"), tsMs, header, fsBody)), eventId)
        if (eventId % 7 == 0) {
          val gcBody = ProtoDescriptors.gcStatisticsData.encode(Seq(
            if (eventId % 21 == 0) "G1 Old Generation" else "PS Scavenge",
            eventId % 50, "Allocation Failure",
            0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0.0f))
          Seq(fsFrame, (EventModel.encode(EventModel.Frame(
            EventModel.markerForName("GC_EVENT"), tsMs, header, gcBody)), eventId))
        } else Seq(fsFrame)
      }
    }.toDF("value", "offset")
    // two source files ⇒ two micro-batches (see maxFilesPerTrigger below):
    // the routed tables must come out identical however the engine batches
    frames.repartition(2).write.mode("overwrite").parquet(srcDir)

    // one file per micro-batch: the progress-reported watermark always
    // lags the current batch (it is computed from the PREVIOUS batches'
    // event-time stats), so a single-batch run would report epoch 0 and
    // close nothing — two batches leave the final watermark covering the
    // first file's max event time minus the grace (a random half of a
    // ~month of fixture days: many days close, which is all the boolean
    // witness needs)
    val raw = spark.readStream
      .schema(StructType(Seq(
        StructField("value", BinaryType), StructField("offset", LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val types = Seq("FS_EVENT", "GC_EVENT")
    // ST11 under the gate: the lag listener rides the real route query;
    // its bookkeeping is cross-checked below against ground truth the
    // oracle can also see (max event time) and against the engine's own
    // lastProgress (watermark) — deterministic, so it can sit in an
    // oracle-gated column
    val lag = new IngestLagListener()
    spark.streams.addListener(lag)
    val query = EventRouter.routeTyped(raw, base, ckpt, types,
        trigger = Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    // lifecycle epilogue: stamp the days the final watermark closed
    val wmMillis = Option(query.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(w => java.time.Instant.parse(w).toEpochMilli)
    val closed = wmMillis.toSeq.flatMap(EventRouter.closeDays(spark, base, types, _))

    val trueMaxTs = graft.sources.Tables.load(spark, sfDir, "events")
      .agg(max(unix_millis(col("ts")))).collect()(0).getLong(0)
    // the listener bus is async AND delivers per-batch: wait for DELIVERY
    // of the final batch's progress event (batchId == lastProgress's — the
    // same event that carries the final watermark), then judge correctness
    // separately. Folding a delivery timeout into lagListenerOk=false
    // would make a loaded-host bus flake indistinguishable from a real
    // bookkeeping bug inside an oracle-gated column — so a timeout THROWS
    // a distinct error (the gate reruns), and only a delivered-but-wrong
    // entry fails the witness.
    val lastBatchId = Option(query.lastProgress).map(_.batchId)
    val lagEntry = {
      val deadline = System.currentTimeMillis() + 60000
      def e = lag.snapshot.get(query.id)
      while (System.currentTimeMillis() < deadline &&
        !e.exists(s => lastBatchId.contains(s.batchId))) Thread.sleep(50)
      spark.streams.removeListener(lag)
      e
    }
    if (!lagEntry.exists(s => lastBatchId.contains(s.batchId)))
      throw new IllegalStateException(
        s"ST11 witness: the listener bus did not deliver batch $lastBatchId's " +
          s"progress within 60 s (last delivered: ${lagEntry.map(_.batchId)}) — " +
          "a bus-delivery flake on a loaded host, NOT a lag bookkeeping failure; " +
          "re-run the gate")
    val lagListenerOk = lagEntry.exists { e =>
      // footer-latest_timestamp analog == the true newest routed event time;
      // watermark bookkeeping == the engine's own lastProgress; lag is
      // coherent (observed - max event time)
      e.maxEventTimeMs.contains(trueMaxTs) &&
        e.watermarkMs == wmMillis &&
        e.eventTimeLagMs.contains(e.observedAtMs - trueMaxTs)
    }

    val hfs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dayDirs(tpe: String): Seq[org.apache.hadoop.fs.Path] =
      hfs.listStatus(new org.apache.hadoop.fs.Path(s"$base/$tpe")).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(_.getPath)
    val dayPartitioned = types.forall(dayDirs(_).nonEmpty)
    // every day strictly before the watermark's close day must be stamped,
    // and (with ~a month of fixture days vs a 26 h grace) some day must be
    val markersOk = closed.nonEmpty && wmMillis.exists { wm =>
      val closedBefore = EventSink.closedDayFromWatermark(wm)
      types.forall(dayDirs(_).forall { p =>
        val day = java.time.LocalDate.parse(p.getName.stripPrefix("day="))
        !day.isBefore(closedBefore) ||
          hfs.exists(new org.apache.hadoop.fs.Path(p, "_DONE"))
      })
    }

    def routedAgg(tpe: String, grp: Column, checksum: Column): DataFrame =
      spark.read.parquet(s"$base/$tpe")
        // normalize the inferred day= partition type to midnight-UTC
        // timestamp — the cross-engine day representation every other
        // gate query uses (DATE round-trips as pandas Timestamp anyway)
        .withColumn("day",
          col("day").cast(org.apache.spark.sql.types.DateType)
            .cast(org.apache.spark.sql.types.TimestampType))
        .groupBy(col("day"), grp.as("grp"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("application_id")).as("n_apps"),
          sum(checksum).as("checksum"))
        .select(lit(tpe).as("event_type"), col("day"), col("grp"),
          col("n"), col("n_apps"), col("checksum"))
    routedAgg("FS_EVENT", col("action"), col("method_duration_millis"))
      .unionByName(routedAgg("GC_EVENT", col("collector_name"), col("pause_time")))
      .withColumn("day_partitioned", lit(dayPartitioned))
      .withColumn("markers_ok", lit(markersOk))
      .withColumn("lag_listener_ok", lit(lagListenerOk))
      .orderBy(col("event_type"), col("day"), col("grp"))
  }

  /** ST5 + Q12 through the SINK MAINTENANCE lifecycle: fragmented
    * day-partitioned write → [[EventSink.compactPartition]] over every
    * partition → [[EventSink.dropExpiredPartitions]] (retention, 10 days
    * relative to the data's own max day) → re-read of the maintained
    * table. The reference analog is the HDFS writer's row-group merge on
    * close (readers/hdfs/.../ProtoParquetWriterWithOffset.java:99-180)
    * plus the ES reader's ILM retention
    * (readers/elasticsearch/.../ElasticSearchReader.java:205-228).
    *
    * The DuckDB oracle recomputes the per-(type, day) aggregate from raw
    * events restricted to the retained window — so lost or duplicated
    * rows in EITHER maintenance step break the hash. `compaction_ok`
    * (every surviving partition holds exactly one data file and at least
    * one compaction actually fired) and `retention_ok` (no expired day
    * dir survives, at least one was dropped) are Spark-side measured
    * layout witnesses the oracle hardcodes TRUE.
    */
  def sinkMaintenance(spark: SparkSession, sfDir: String): DataFrame = {
    val work = graft.sources.BucketedTables.scratchDir("graft_sink_maint_")
      .toFile.getAbsolutePath
    val table = s"$work/table"
    val raw = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").as("timestamp"))
    // fixture window: the last 14 days of data — enough beyond the 10-day
    // retention that real day dirs get dropped, without paying the write
    // cost of a month of partitions the retention deletes unread. The
    // surviving aggregate (what the oracle recomputes) is identical.
    // UTC explicitly: toLocalDateTime would render via the JVM default TZ
    // and shift the window by a day on non-UTC hosts (only the SESSION TZ
    // is pinned to UTC)
    val maxDayRow = raw.agg(max(date_trunc("day", col("timestamp")))).collect()(0)
    val maxDay = maxDayRow.getTimestamp(0).toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val events = raw.where(col("timestamp") >=
      lit(java.sql.Timestamp.from(
        maxDay.minusDays(13L).atStartOfDay(java.time.ZoneOffset.UTC).toInstant)))
    // 4-way pre-shuffle ⇒ multiple files per (event_type, day) partition —
    // the small-file state a streaming appender leaves behind
    EventSink.writePartitioned(events.repartition(4), table)

    // day formatted executor-side: decoding a DateType on the driver needs
    // sun.util.calendar access that plain JDK17 launchers (no --add-opens)
    // deny — strings decode everywhere
    val parts = spark.read.parquet(table)
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd"))
      .distinct()
      .collect() // bounded: days × types, metadata-sized
      .map(r => (r.getString(0), r.getString(1)))
    // retention FIRST: no point compacting partitions about to expire
    val today = maxDay.plusDays(1L)
    val retainDays = 10
    val dropped = parts.map(_._1).distinct.flatMap(tpe =>
      EventSink.dropExpiredPartitions(spark, table, tpe, today, retainDays))
    val droppedSet = dropped.map(p =>
      new org.apache.hadoop.fs.Path(p).getName.stripPrefix("day=")).toSet
    // compact the survivors CONCURRENTLY: different partitions of one
    // table may be compacted in parallel (per-partition locks; scheduler
    // is thread-safe) — one Spark job per partition run serially would
    // make the sweep latency O(partitions). Shared pool harness:
    // graft.operators.Maintenance (same interrupt/drain-on-failure
    // discipline as IvfIndexStore.compactGeneration).
    graft.operators.Maintenance.parallelSweep(
      parts.toSeq.filter { case (_, day) => !droppedSet.contains(day) },
      s"sinkMaintenance at $table") { case (tpe, day) =>
      EventSink.compactPartition(spark, table,
        Map("event_type" -> tpe, "day" -> day),
        maxFiles = 1, targetFiles = 1, sortCol = Some("timestamp"))
    }

    // measured witnesses over the maintained layout
    val hfs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = today.minusDays(retainDays.toLong)
    var sawCompacted = false
    var compactionOk = true
    var retentionOk = dropped.nonEmpty
    hfs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_type="))
      .foreach { tdir =>
        hfs.listStatus(tdir.getPath)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
          .foreach { ddir =>
            val day = java.time.LocalDate.parse(ddir.getPath.getName.stripPrefix("day="))
            if (day.isBefore(cutoff)) retentionOk = false
            val dataFiles = hfs.listStatus(ddir.getPath)
              .filter(_.getPath.getName.endsWith(".parquet"))
            if (dataFiles.length != 1) compactionOk = false
            if (dataFiles.exists(_.getPath.getName.startsWith("compacted-")))
              sawCompacted = true
          }
      }

    // the manifest-resolving reader must agree with the plain lister on
    // the maintained table (tombstones swept at grace 0, so both views
    // are the committed snapshot) — the isolated-read contract witnessed
    // inside the oracle gate
    val isolatedOk =
      EventSink.readIsolated(spark, table).count() == spark.read.parquet(table).count()

    spark.read.parquet(table)
      .withColumn("day", col("day")
        .cast(org.apache.spark.sql.types.DateType)
        .cast(org.apache.spark.sql.types.TimestampType))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("checksum"))
      .withColumn("compaction_ok", lit(compactionOk && sawCompacted))
      .withColumn("retention_ok", lit(retentionOk))
      .withColumn("isolated_read_ok", lit(isolatedOk))
      .orderBy(col("event_type"), col("day"))
  }

  /** J1/J2 through the streaming engine: per-app first-wins attrs, the
    * container→component registry and AM resolution, all held in
    * `flatMapGroupsWithState` keyed state. The fixture derives fact
    * events from the events table (event "time" = event_id, globally
    * unique, so the in-batch event-time fold has no ties) plus TWO app
    * events per application with different attrs — the earlier one must
    * win. Every (app, container)'s component is decided by that
    * container's FIRST event (a real component is learned; UNKNOWN
    * resolves APP_MASTER/APP_SLAVE against the AM container and the
    * resolution is learned back), and every later event hits the learned
    * registry entry — which the oracle reproduces with arg_min per
    * container.
    */
  def streamEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val work = graft.sources.BucketedTables.scratchDir("graft_stream_enrich_")
      .toFile.getAbsolutePath
    val srcDir = s"$work/src"; val outDir = s"$work/out"; val ckpt = s"$work/ckpt"

    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val facts = events.select(col("event_id"), col("user_id"), col("event_type"))
      .as[(Long, Long, String)]
      .map { case (eid, uid, etype) =>
        EnrichInput(s"app_${uid % 50}", isAppEvent = false, None, etype,
          s"container_${eid % 5}",
          if (eid % 3 == 0) "UNKNOWN" else "EXECUTOR", eid)
      }
    val appEvents = events.select((col("user_id") % 50).as("a")).distinct().as[Long]
      .flatMap { a =>
        Seq(
          EnrichInput(s"app_$a", isAppEvent = true,
            Some(AppAttrs(s"name_first_$a", "SPARK", s"user_${a % 7}",
              "container_0", Seq("YARN_APPLICATION"))),
            "APPLICATION_EVENT", "", "", -2L),
          // later app event with different attrs: must NOT win
          EnrichInput(s"app_$a", isAppEvent = true,
            Some(AppAttrs(s"name_second_$a", "SPARK2", s"other_$a",
              "container_1", Seq.empty)),
            "APPLICATION_EVENT", "", "", -1L))
      }
    facts.union(appEvents).coalesce(1).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(Encoders.product[EnrichInput].schema)
      .parquet(srcDir)
      .as[EnrichInput]
    val query = StreamingEnrichment.enrich(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[EnrichedEvent], _: Long) =>
        batch.write.mode("append").parquet(outDir); ()
      }
      .start()
    query.awaitTermination()

    spark.read.parquet(outDir)
      .select(
        col("applicationId").as("application_id"),
        col("eventType").as("event_type"),
        col("containerId").as("container_id"),
        col("tsMillis").as("ts_ms"),
        col("applicationName").as("application_name"),
        col("framework"),
        col("username"),
        col("component"),
        col("enriched"))
      .orderBy(col("ts_ms"))
  }
}
