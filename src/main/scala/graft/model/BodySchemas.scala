package graft.model

import org.apache.spark.sql.types._

/** Relational schemas for all 20 event bodies of the union (SURVEY §1.3).
  *
  * Mechanical translation of the protobuf messages (proto3 semantics:
  * non-null with zero defaults; enums surface as their NAME strings, the
  * flattener's behavior at reference: readers/common/src/main/java/.../
  * protobuf/ProtoConcatenator.java:209-215):
  *  - data_access_event.proto:8-30 (PathEvent, FsEvent, StateEvent)
  *  - jvm_statistics_event.proto:8-39 (JVMStatisticsData, GCStatisticsData)
  *  - container_event.proto:8-11 (ContainerResourceEvent)
  *  - resourcemanager_event.proto:8-35 (ApplicationEvent, ContainerEvent)
  *  - spark_event.proto:8-137 (Stage/StageState/ExecutorState/Task/
  *    ExecutorStorageStatus/RDDStorageStatus)
  *  - flink_event.proto:8-102 (JobManager/TaskManager/Job/Task/Operator/
  *    KafkaConsumer)
  *
  * A full event row = [[headerSchema]] ++ body ++ (timestamp, kafka_offset)
  * — composed by [[fullSchema]], mirroring the dynamic composition of
  * ProtoConcatenator (reference: ProtoConcatenator.java:117-168).
  */
object BodySchemas {

  /** event_header.proto:8-25. */
  val headerSchema: StructType = StructType(Seq(
    StructField("application_id", StringType),
    StructField("attempt_id", StringType),
    StructField("application_name", StringType),
    StructField("username", StringType),
    StructField("container_id", StringType),
    StructField("hostname", StringType),
    StructField("pid", StringType),
    StructField("framework", StringType),
    StructField("component", StringType),
    StructField("executor_id", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("id", StringType),
    StructField("main_class", StringType),
    StructField("java_version", StringType),
    StructField("java_feature", IntegerType),
    StructField("framework_version", StringType)))

  private def fields(fs: (String, DataType)*): StructType =
    StructType(fs.map { case (n, t) => StructField(n, t) })

  val pathEvent: StructType = fields("path" -> StringType, "type" -> StringType)

  val fsEvent: StructType = fields(
    "src_path" -> StringType, "dst_path" -> StringType, "action" -> StringType,
    "uri" -> StringType, "method_duration_millis" -> LongType,
    "hdfs_user" -> StringType, "status" -> StringType)

  val stateEvent: StructType = fields("state" -> StringType)

  /** Nested KV-of-KV document (pivots in [[graft.operators.JvmStats]]). */
  val jvmStatisticsData: StructType =
    StructType(Seq(StructField("sections", graft.operators.JvmStats.sectionsType)))

  val gcStatisticsData: StructType = fields(
    "collector_name" -> StringType, "pause_time" -> LongType, "cause" -> StringType,
    "eden_before" -> LongType, "eden_after" -> LongType,
    "survivor_before" -> LongType, "survivor_after" -> LongType,
    "old_before" -> LongType, "old_after" -> LongType,
    "code_before" -> LongType, "code_after" -> LongType,
    "metaspace_before" -> LongType, "metaspace_after" -> LongType,
    "gc_pause_ratio_1_min" -> FloatType)

  val containerResourceEvent: StructType = fields(
    "type" -> StringType, "limit" -> LongType, "value" -> FloatType)

  val applicationEvent: StructType = fields(
    "state" -> StringType, "queue" -> StringType, "tracking_url" -> StringType,
    "original_tracking_url" -> StringType, "yarn_tags" -> ArrayType(StringType),
    "am_container_id" -> StringType, "project_name" -> StringType,
    "workflow_name" -> StringType, "memory_seconds" -> LongType,
    "vcore_seconds" -> LongType, "final_status" -> StringType,
    "start_time" -> LongType, "finish_time" -> LongType)

  val containerEvent: StructType = fields(
    "state" -> StringType, "type" -> StringType, "reason" -> StringType,
    "exit_status" -> IntegerType, "start_time" -> LongType, "finish_time" -> LongType,
    "is_finished" -> BooleanType, "container_hostname" -> StringType,
    "log_url" -> StringType, "vcores_reserved" -> IntegerType,
    "memory_reserved" -> IntegerType)

  /** The 27 shared TaskMetrics fields of StageEvent/TaskEvent. */
  private val taskMetricsFields: Seq[(String, DataType)] = Seq(
    "executor_cpu_time" -> LongType, "executor_deserialize_cpu_time" -> LongType,
    "executor_run_time" -> LongType, "jvm_gc_time" -> LongType,
    "executor_deserialize_time" -> LongType, "result_serialization_time" -> LongType,
    "result_size" -> LongType, "peak_execution_memory" -> LongType,
    "disk_bytes_spilled" -> LongType, "memory_bytes_spilled" -> LongType,
    "shuffle_read_records" -> LongType, "shuffle_read_fetch_wait_time" -> LongType,
    "shuffle_read_local_bytes" -> LongType, "shuffle_read_remote_bytes" -> LongType,
    "shuffle_read_total_bytes" -> LongType, "shuffle_read_local_blocks_fetched" -> LongType,
    "shuffle_read_remote_blocks_fetched" -> LongType, "shuffle_read_total_blocks_fetched" -> LongType,
    "shuffle_write_shuffle_records" -> LongType, "shuffle_write_shuffle_time" -> LongType,
    "shuffle_write_shuffle_bytes" -> LongType,
    "input_records" -> LongType, "input_bytes" -> LongType,
    "output_records" -> LongType, "output_bytes" -> LongType)

  val sparkStageEvent: StructType = fields(
    (Seq("start_time" -> (LongType: DataType), "stage_name" -> StringType,
      "stage_id" -> StringType, "stage_attempt_id" -> StringType,
      "num_tasks" -> IntegerType, "status" -> StringType,
      "failure_reason" -> StringType) ++ taskMetricsFields): _*)

  val sparkStageStateEvent: StructType = fields(
    "state" -> StringType, "stage_name" -> StringType, "stage_id" -> StringType,
    "stage_attempt_id" -> StringType, "num_tasks" -> IntegerType)

  val sparkExecutorStateEvent: StructType = fields(
    "state" -> StringType, "executor_hostname" -> StringType,
    "reason" -> StringType, "task_failures" -> IntegerType)

  val sparkTaskEvent: StructType = fields(
    (Seq("start_time" -> (LongType: DataType), "task_id" -> StringType,
      "stage_id" -> StringType, "stage_attempt_id" -> StringType,
      "executor_hostname" -> StringType, "status" -> StringType,
      "failure_reason" -> StringType) ++ taskMetricsFields ++ Seq(
      "type" -> (StringType: DataType), "locality" -> StringType,
      "attempt_number" -> IntegerType)): _*)

  val sparkExecutorStorageStatus: StructType = fields(
    "executor_hostname" -> StringType,
    "rdd_off_heap_memory_used" -> LongType, "rdd_memory_used" -> LongType,
    "rdd_disk_used" -> LongType,
    "stream_off_heap_memory_used" -> LongType, "stream_memory_used" -> LongType,
    "stream_disk_used" -> LongType,
    "broadcast_off_heap_memory_used" -> LongType, "broadcast_memory_used" -> LongType,
    "broadcast_disk_used" -> LongType)

  val sparkRddStorageStatus: StructType = fields(
    "rdd_name" -> StringType, "off_heap_memory_used" -> LongType,
    "memory_used" -> LongType, "disk_used" -> LongType)

  val flinkJobManagerEvent: StructType = fields(
    "num_registered_task_managers" -> LongType, "num_running_jobs" -> LongType,
    "task_slots_available" -> LongType, "task_slots_total" -> LongType)

  val flinkTaskManagerEvent: StructType = fields(
    "network_total_memory_segments" -> LongType,
    "network_available_memory_segments" -> LongType)

  val flinkJobEvent: StructType = fields(
    "job_id" -> StringType, "job_name" -> StringType, "uptime" -> LongType,
    "downtime" -> LongType, "restarting_time" -> LongType, "full_restarts" -> LongType,
    "total_number_of_checkpoints" -> LongType,
    "number_of_in_progress_checkpoints" -> IntegerType,
    "number_of_completed_checkpoints" -> LongType,
    "number_of_failed_checkpoints" -> LongType,
    "last_checkpoint_restore_timestamp" -> LongType,
    "last_checkpoint_size" -> LongType, "last_checkpoint_duration" -> LongType,
    "last_checkpoint_alignment_buffered" -> LongType,
    "last_checkpoint_external_path" -> StringType)

  val flinkTaskEvent: StructType = fields(
    "job_id" -> StringType, "job_name" -> StringType, "task_id" -> StringType,
    "task_name" -> StringType, "task_attempt_num" -> StringType,
    "buffers_input_queue_length" -> LongType, "buffers_output_queue_length" -> LongType,
    "buffers_in_pool_usage" -> LongType, "buffers_out_pool_usage" -> LongType,
    "num_records_out" -> LongType, "num_records_in" -> LongType,
    "num_bytes_out" -> LongType, "num_bytes_in_local" -> LongType,
    "num_bytes_in_remote" -> LongType, "num_buffers_out" -> LongType,
    "num_buffers_in_local" -> LongType, "num_buffers_in_remote" -> LongType,
    "num_bytes_out_per_second" -> DoubleType,
    "num_bytes_in_local_per_second" -> DoubleType,
    "num_bytes_in_remote_per_second" -> DoubleType,
    "num_buffers_out_per_second" -> DoubleType,
    "num_buffers_in_local_per_second" -> DoubleType,
    "num_buffers_in_remote_per_second" -> DoubleType,
    "num_records_in_per_second" -> DoubleType,
    "num_records_out_per_second" -> DoubleType,
    "subtask_index" -> StringType, "current_input_watermark" -> LongType,
    "num_late_records_dropped" -> LongType)

  val flinkOperatorEvent: StructType = fields(
    "job_id" -> StringType, "job_name" -> StringType, "task_id" -> StringType,
    "task_name" -> StringType, "operator_id" -> StringType, "operator_name" -> StringType,
    "subtask_index" -> StringType, "current_input_watermark" -> LongType,
    "num_late_records_dropped" -> LongType, "current_input_1_watermark" -> LongType,
    "current_input_2_watermark" -> LongType, "current_output_watermark" -> LongType,
    "num_splits_processed" -> LongType, "commits_succeeded" -> LongType,
    "commits_failed" -> LongType, "records_lag_max" -> DoubleType,
    "records_consumed_rate" -> DoubleType, "bytes_consumed_rate" -> DoubleType)

  val flinkKafkaConsumerEvent: StructType = fields(
    "job_id" -> StringType, "job_name" -> StringType, "task_id" -> StringType,
    "task_name" -> StringType, "operator_id" -> StringType, "operator_name" -> StringType,
    "subtask_index" -> StringType, "topic" -> StringType, "partition" -> StringType,
    "current_offsets" -> LongType, "committed_offsets" -> LongType)

  /** Body schema per event-type name — every marker in the registry. */
  val byEventType: Map[String, StructType] = Map(
    "PATH_EVENT" -> pathEvent,
    "FS_EVENT" -> fsEvent,
    "STATE_EVENT" -> stateEvent,
    "GC_EVENT" -> gcStatisticsData,
    "JVMSTATS_EVENT" -> jvmStatisticsData,
    "CONTAINER_MONITORING_EVENT" -> containerResourceEvent,
    "SPARK_STAGE_EVENT" -> sparkStageEvent,
    "SPARK_STAGE_STATE_EVENT" -> sparkStageStateEvent,
    "SPARK_EXECUTOR_STATE_EVENT" -> sparkExecutorStateEvent,
    "SPARK_TASK_EVENT" -> sparkTaskEvent,
    "SPARK_EXECUTOR_STORAGE_STATUS_EVENT" -> sparkExecutorStorageStatus,
    "SPARK_RDD_STORAGE_STATUS_EVENT" -> sparkRddStorageStatus,
    "APPLICATION_EVENT" -> applicationEvent,
    "CONTAINER_EVENT" -> containerEvent,
    "FLINK_JOB_MANAGER_EVENT" -> flinkJobManagerEvent,
    "FLINK_JOB_EVENT" -> flinkJobEvent,
    "FLINK_TASK_MANAGER_EVENT" -> flinkTaskManagerEvent,
    "FLINK_TASK_EVENT" -> flinkTaskEvent,
    "FLINK_OPERATOR_EVENT" -> flinkOperatorEvent,
    "FLINK_KAFKA_CONSUMER_EVENT" -> flinkKafkaConsumerEvent)

  /** Full flattened row schema: header ++ body ++ (timestamp, kafka_offset). */
  def fullSchema(eventType: String): StructType =
    StructType(headerSchema.fields ++ byEventType(eventType).fields ++ Seq(
      StructField("timestamp", TimestampType),
      StructField("kafka_offset", LongType),
      StructField("event_type", StringType)))
}
