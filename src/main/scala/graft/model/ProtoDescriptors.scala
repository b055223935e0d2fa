package graft.model

import graft.model.ProtoWire._

/** Wire descriptors for the shared header and all 20 event bodies —
  * field numbers and types transcribed from the reference protos
  * (reference: schema/src/main/protobuf/event_header.proto:8-25,
  * data_access_event.proto:8-30, jvm_statistics_event.proto:8-39,
  * container_event.proto:8-11, resourcemanager_event.proto:8-35,
  * spark_event.proto:8-137, flink_event.proto:8-102).
  *
  * Each descriptor's derived `schema` must equal the corresponding
  * [[BodySchemas]] StructType (asserted in ProtoWireSpec) — BodySchemas
  * stays the documentation-of-record; these add the wire numbers.
  */
object ProtoDescriptors {

  private def m(name: String, fs: (Int, String, PKind)*): MessageDesc =
    MessageDesc(name, fs.toIndexedSeq.map { case (n, nm, k) => FieldDesc(n, nm, k) })

  /** event_header.proto:8-25 — note field 7 is reserved/skipped. */
  val header: MessageDesc = m("Header",
    (1, "application_id", PString), (2, "attempt_id", PString),
    (3, "application_name", PString), (4, "username", PString),
    (5, "container_id", PString), (6, "hostname", PString),
    (8, "pid", PString), (9, "framework", PString), (10, "component", PString),
    (11, "executor_id", PString), (12, "tags", PStringList), (13, "id", PString),
    (14, "main_class", PString), (15, "java_version", PString),
    (16, "java_feature", PInt32), (17, "framework_version", PString))

  val pathEvent: MessageDesc = m("PathEvent", (1, "path", PString), (2, "type", PString))

  val fsEvent: MessageDesc = m("FsEvent",
    (1, "src_path", PString), (2, "dst_path", PString), (3, "action", PString),
    (4, "uri", PString), (5, "method_duration_millis", PInt64),
    (6, "hdfs_user", PString),
    (7, "status", PEnum(Vector("UNKNOWN", "FAILURE", "SUCCESS"))))

  val stateEvent: MessageDesc = m("StateEvent", (1, "state", PString))

  private val property = m("Property", (1, "name", PString), (2, "value", PString))
  private val section = m("Section", (1, "name", PString), (2, "properties", PMessageList(property)))

  /** Column names pluralized to match [[BodySchemas.jvmStatisticsData]]
    * (proto names are singular `section`/`property`).
    */
  val jvmStatisticsData: MessageDesc = m("JVMStatisticsData", (1, "sections", PMessageList(section)))

  val gcStatisticsData: MessageDesc = m("GCStatisticsData",
    (1, "collector_name", PString), (2, "pause_time", PInt64), (3, "cause", PString),
    (4, "eden_before", PInt64), (5, "eden_after", PInt64),
    (6, "survivor_before", PInt64), (7, "survivor_after", PInt64),
    (8, "old_before", PInt64), (9, "old_after", PInt64),
    (10, "code_before", PInt64), (11, "code_after", PInt64),
    (12, "metaspace_before", PInt64), (13, "metaspace_after", PInt64),
    (14, "gc_pause_ratio_1_min", PFloat))

  val containerResourceEvent: MessageDesc = m("ContainerResourceEvent",
    (1, "type", PString), (2, "limit", PInt64), (3, "value", PFloat))

  val applicationEvent: MessageDesc = m("ApplicationEvent",
    (1, "state", PString), (2, "queue", PString), (3, "tracking_url", PString),
    (4, "original_tracking_url", PString), (5, "yarn_tags", PStringList),
    (6, "am_container_id", PString), (7, "project_name", PString),
    (8, "workflow_name", PString), (9, "memory_seconds", PInt64),
    (10, "vcore_seconds", PInt64), (11, "final_status", PString),
    (12, "start_time", PInt64), (13, "finish_time", PInt64))

  val containerEvent: MessageDesc = m("ContainerEvent",
    (1, "state", PString), (2, "type", PString), (3, "reason", PString),
    (4, "exit_status", PInt32), (5, "start_time", PInt64), (6, "finish_time", PInt64),
    (7, "is_finished", PBool), (8, "container_hostname", PString),
    (9, "log_url", PString), (10, "vcores_reserved", PInt32), (11, "memory_reserved", PInt32))

  /** spark_event.proto StageEvent/TaskEvent share fields 8-32 (TaskMetrics). */
  private val taskMetrics: Seq[(Int, String, PKind)] = Seq(
    (8, "executor_cpu_time", PInt64), (9, "executor_deserialize_cpu_time", PInt64),
    (10, "executor_run_time", PInt64), (11, "jvm_gc_time", PInt64),
    (12, "executor_deserialize_time", PInt64), (13, "result_serialization_time", PInt64),
    (14, "result_size", PInt64), (15, "peak_execution_memory", PInt64),
    (16, "disk_bytes_spilled", PInt64), (17, "memory_bytes_spilled", PInt64),
    (18, "shuffle_read_records", PInt64), (19, "shuffle_read_fetch_wait_time", PInt64),
    (20, "shuffle_read_local_bytes", PInt64), (21, "shuffle_read_remote_bytes", PInt64),
    (22, "shuffle_read_total_bytes", PInt64), (23, "shuffle_read_local_blocks_fetched", PInt64),
    (24, "shuffle_read_remote_blocks_fetched", PInt64), (25, "shuffle_read_total_blocks_fetched", PInt64),
    (26, "shuffle_write_shuffle_records", PInt64), (27, "shuffle_write_shuffle_time", PInt64),
    (28, "shuffle_write_shuffle_bytes", PInt64),
    (29, "input_records", PInt64), (30, "input_bytes", PInt64),
    (31, "output_records", PInt64), (32, "output_bytes", PInt64))

  val sparkStageEvent: MessageDesc = m("StageEvent",
    (Seq((1, "start_time", PInt64: PKind), (2, "stage_name", PString),
      (3, "stage_id", PString), (4, "stage_attempt_id", PString),
      (5, "num_tasks", PInt32), (6, "status", PString),
      (7, "failure_reason", PString)) ++ taskMetrics): _*)

  val sparkStageStateEvent: MessageDesc = m("StageStateEvent",
    (1, "state", PString), (2, "stage_name", PString), (3, "stage_id", PString),
    (4, "stage_attempt_id", PString), (5, "num_tasks", PInt32))

  val sparkExecutorStateEvent: MessageDesc = m("ExecutorStateEvent",
    (1, "state", PString), (2, "executor_hostname", PString),
    (3, "reason", PString), (4, "task_failures", PInt32))

  val sparkTaskEvent: MessageDesc = m("TaskEvent",
    (Seq((1, "start_time", PInt64: PKind), (2, "task_id", PString),
      (3, "stage_id", PString), (4, "stage_attempt_id", PString),
      (5, "executor_hostname", PString), (6, "status", PString),
      (7, "failure_reason", PString)) ++ taskMetrics ++ Seq(
      (33, "type", PString: PKind), (34, "locality", PString),
      (35, "attempt_number", PInt32))): _*)

  val sparkExecutorStorageStatus: MessageDesc = m("ExecutorStorageStatus",
    (1, "executor_hostname", PString),
    (2, "rdd_off_heap_memory_used", PInt64), (3, "rdd_memory_used", PInt64),
    (4, "rdd_disk_used", PInt64),
    (5, "stream_off_heap_memory_used", PInt64), (6, "stream_memory_used", PInt64),
    (7, "stream_disk_used", PInt64),
    (8, "broadcast_off_heap_memory_used", PInt64), (9, "broadcast_memory_used", PInt64),
    (10, "broadcast_disk_used", PInt64))

  val sparkRddStorageStatus: MessageDesc = m("RDDStorageStatus",
    (1, "rdd_name", PString), (2, "off_heap_memory_used", PInt64),
    (3, "memory_used", PInt64), (4, "disk_used", PInt64))

  val flinkJobManagerEvent: MessageDesc = m("JobManagerEvent",
    (1, "num_registered_task_managers", PInt64), (2, "num_running_jobs", PInt64),
    (3, "task_slots_available", PInt64), (4, "task_slots_total", PInt64))

  val flinkTaskManagerEvent: MessageDesc = m("TaskManagerEvent",
    (1, "network_total_memory_segments", PInt64),
    (2, "network_available_memory_segments", PInt64))

  val flinkJobEvent: MessageDesc = m("JobEvent",
    (1, "job_id", PString), (2, "job_name", PString), (3, "uptime", PInt64),
    (4, "downtime", PInt64), (5, "restarting_time", PInt64), (6, "full_restarts", PInt64),
    (7, "total_number_of_checkpoints", PInt64),
    (8, "number_of_in_progress_checkpoints", PInt32),
    (9, "number_of_completed_checkpoints", PInt64),
    (10, "number_of_failed_checkpoints", PInt64),
    (11, "last_checkpoint_restore_timestamp", PInt64),
    (12, "last_checkpoint_size", PInt64), (13, "last_checkpoint_duration", PInt64),
    (14, "last_checkpoint_alignment_buffered", PInt64),
    (15, "last_checkpoint_external_path", PString))

  val flinkTaskEvent: MessageDesc = m("FlinkTaskEvent",
    (1, "job_id", PString), (2, "job_name", PString), (3, "task_id", PString),
    (4, "task_name", PString), (5, "task_attempt_num", PString),
    (6, "buffers_input_queue_length", PInt64), (7, "buffers_output_queue_length", PInt64),
    (8, "buffers_in_pool_usage", PInt64), (9, "buffers_out_pool_usage", PInt64),
    (10, "num_records_out", PInt64), (11, "num_records_in", PInt64),
    (12, "num_bytes_out", PInt64), (13, "num_bytes_in_local", PInt64),
    (14, "num_bytes_in_remote", PInt64), (15, "num_buffers_out", PInt64),
    (16, "num_buffers_in_local", PInt64), (17, "num_buffers_in_remote", PInt64),
    (18, "num_bytes_out_per_second", PDouble),
    (19, "num_bytes_in_local_per_second", PDouble),
    (20, "num_bytes_in_remote_per_second", PDouble),
    (21, "num_buffers_out_per_second", PDouble),
    (22, "num_buffers_in_local_per_second", PDouble),
    (23, "num_buffers_in_remote_per_second", PDouble),
    (24, "num_records_in_per_second", PDouble),
    (25, "num_records_out_per_second", PDouble),
    (26, "subtask_index", PString), (27, "current_input_watermark", PInt64),
    (28, "num_late_records_dropped", PInt64))

  val flinkOperatorEvent: MessageDesc = m("OperatorEvent",
    (1, "job_id", PString), (2, "job_name", PString), (3, "task_id", PString),
    (4, "task_name", PString), (5, "operator_id", PString), (6, "operator_name", PString),
    (7, "subtask_index", PString), (8, "current_input_watermark", PInt64),
    (9, "num_late_records_dropped", PInt64), (10, "current_input_1_watermark", PInt64),
    (11, "current_input_2_watermark", PInt64), (12, "current_output_watermark", PInt64),
    (13, "num_splits_processed", PInt64), (14, "commits_succeeded", PInt64),
    (15, "commits_failed", PInt64), (16, "records_lag_max", PDouble),
    (17, "records_consumed_rate", PDouble), (18, "bytes_consumed_rate", PDouble))

  val flinkKafkaConsumerEvent: MessageDesc = m("KafkaConsumerEvent",
    (1, "job_id", PString), (2, "job_name", PString), (3, "task_id", PString),
    (4, "task_name", PString), (5, "operator_id", PString), (6, "operator_name", PString),
    (7, "subtask_index", PString), (8, "topic", PString), (9, "partition", PString),
    (10, "current_offsets", PInt64), (11, "committed_offsets", PInt64))

  /** Body descriptor per event-type name — every marker in the registry. */
  val byEventType: Map[String, MessageDesc] = Map(
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
}
