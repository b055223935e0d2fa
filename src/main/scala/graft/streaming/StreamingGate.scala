package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

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
    val work = Files.createTempDirectory("graft_stream_gate_").toFile.getAbsolutePath
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
    val work = Files.createTempDirectory("graft_stream_enrich_").toFile.getAbsolutePath
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
