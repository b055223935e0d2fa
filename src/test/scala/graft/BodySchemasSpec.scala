package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{BodySchemas, EventModel}

/** Data-model completeness: every registry marker has a body schema; field
  * shapes match the proto definitions (SURVEY §1.3).
  */
class BodySchemasSpec extends AnyFunSuite {

  test("every type marker has a body schema and a full composed schema") {
    EventModel.typeMarkers.values.foreach { t =>
      assert(BodySchemas.byEventType.contains(t), s"missing body schema for $t")
      val full = BodySchemas.fullSchema(t)
      assert(full.fieldNames.startsWith(BodySchemas.headerSchema.fieldNames))
      assert(full.fieldNames.contains("timestamp") && full.fieldNames.contains("kafka_offset"))
    }
    assert(BodySchemas.byEventType.size == 20)
  }

  test("field counts match the proto messages") {
    assert(BodySchemas.headerSchema.size == 16)          // event_header.proto:8-25
    assert(BodySchemas.fsEvent.size == 7)                // data_access_event.proto:13-26
    assert(BodySchemas.gcStatisticsData.size == 14)      // jvm_statistics_event.proto:20-39
    assert(BodySchemas.sparkStageEvent.size == 32)       // spark_event.proto:8-49
    assert(BodySchemas.sparkTaskEvent.size == 35)        // spark_event.proto:66-113
    assert(BodySchemas.applicationEvent.size == 13)      // resourcemanager_event.proto:8-22
    assert(BodySchemas.containerEvent.size == 11)        // resourcemanager_event.proto:24-35
    assert(BodySchemas.flinkJobEvent.size == 15)         // flink_event.proto:20-36
    assert(BodySchemas.flinkTaskEvent.size == 28)        // flink_event.proto:38-67
    assert(BodySchemas.flinkOperatorEvent.size == 18)    // flink_event.proto:69-88
    assert(BodySchemas.flinkKafkaConsumerEvent.size == 11) // flink_event.proto:91-102
  }

  test("no duplicate field names within any composed schema") {
    EventModel.typeMarkers.values.foreach { t =>
      val names = BodySchemas.fullSchema(t).fieldNames
      assert(names.distinct.length == names.length, s"dup fields in $t")
    }
  }
}
