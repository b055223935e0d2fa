package graft

import org.apache.spark.sql.functions._

import graft.heuristics.{HeuristicAggs, Severity}

/** A1-A9 aggregation recipes over garmadon-shaped fixtures, asserting the
  * reference's severity boundaries end-to-end (the distributed analog of
  * the reference's heuristics unit tests, e.g. HeapUsageTest.java:24-50).
  */
class HeuristicAggsSpec extends SparkSpecBase {
  import spark.implicits._

  private val key = ("app1", "1", "c1")

  test("gcCause flags Metadata GC Threshold / Ergonomics counts (A1)") {
    val gc = Seq(
      (key._1, key._2, key._3, "Metadata GC Threshold", "PS Scavenge", 10L),
      (key._1, key._2, key._3, "Allocation Failure", "PS Scavenge", 12L),
      ("app2", "1", "c9", "Allocation Failure", "PS Scavenge", 5L))
      .toDF("application_id", "attempt_id", "container_id", "cause", "collector_name", "pause_time")
    val out = HeuristicAggs.gcCause(gc).orderBy("application_id").collect()
    assert(out(0).getAs[Long]("flagged_gc") == 1L && out(0).getAs[Int]("severity") == Severity.Moderate)
    assert(out(1).getAs[Long]("flagged_gc") == 0L && out(1).getAs[Int]("severity") == Severity.None)
  }

  test("g1FullGc counts major G1 collections and sums pauses (A2)") {
    val gc = Seq(
      (key._1, key._2, key._3, "G1 Old Generation", 100L),
      (key._1, key._2, key._3, "G1 Old Generation", 150L),
      (key._1, key._2, key._3, "G1 Young Generation", 5L))
      .toDF("application_id", "attempt_id", "container_id", "collector_name", "pause_time")
    val r = HeuristicAggs.g1FullGc(gc).collect().head
    assert(r.getAs[Long]("major_gc") == 2L && r.getAs[Long]("major_pause_ms") == 250L
      && r.getAs[Int]("severity") == Severity.Severe)
  }

  test("heapUsage severity boundaries incl. major-GC discard (A3)") {
    def heapRow(app: String, used: Long, max: Long) =
      (app, "1", "c1", used, max)
    val heap = Seq(heapRow("low", 69L, 100L), heapRow("none", 80L, 100L),
      heapRow("sev", 20L, 100L), heapRow("gcd", 10L, 100L))
      .toDF("application_id", "attempt_id", "container_id", "heap_used", "heap_max")
    val gc = Seq(("gcd", "1", "c1", "PS MarkSweep", 10L))
      .toDF("application_id", "attempt_id", "container_id", "collector_name", "pause_time")
    val out = HeuristicAggs.heapUsage(heap, gc)
      .select("application_id", "severity").as[(String, Int)].collect().toMap
    assert(out("low") == Severity.Low)      // ratio 31
    assert(out("none") == Severity.None)    // ratio 20
    assert(out("sev") == Severity.Severe)   // ratio 80
    assert(out("gcd") == Severity.None)     // major GC discards
  }

  test("locks delta-rate thresholds (A6)") {
    // rate = (c - prev) * 1000 / dt_ms: 600 contentions over 1s => 600/s CRITICAL
    val stats = Seq(
      (key._1, key._2, key._3, 0L, 1000L), (key._1, key._2, key._3, 600L, 2000L))
      .toDF("application_id", "attempt_id", "container_id", "contendedlockattempts", "ts_millis")
    val r = HeuristicAggs.locks(stats).collect().head
    assert(r.getAs[Long]("max_rate") == 600L && r.getAs[Int]("severity") == Severity.Critical)
  }

  test("safepoints delta-rate thresholds (A7)") {
    val stats = Seq(
      (key._1, key._2, key._3, 0L, 0L), (key._1, key._2, key._3, 4L, 1000L))
      .toDF("application_id", "attempt_id", "container_id", "safepoint_count", "ts_millis")
    val r = HeuristicAggs.safepoints(stats).collect().head
    assert(r.getAs[Long]("max_rate") == 4L && r.getAs[Int]("severity") == Severity.Low)
  }

  test("fileHeuristic pivots 8 actions and grades WRITE volume (A8)") {
    val fs = Seq(
      ("app1", "1", "WRITE"), ("app1", "1", "WRITE"), ("app1", "1", "READ"),
      ("app2", "1", "DELETE"))
      .toDF("application_id", "attempt_id", "action")
    val out = HeuristicAggs.fileHeuristic(fs, maxCreatedFiles = 10L)
      .orderBy("application_id").collect()
    assert(out(0).getAs[Long]("WRITE") == 2L && out(0).getAs[Long]("READ") == 1L)
    assert(out(0).getAs[Int]("severity") == Severity.Low) // 2 > 10/10
    assert(out(1).getAs[Long]("DELETE") == 1L && out(1).getAs[Int]("severity") == Severity.None)
  }

  test("flinkCheckpointDuration sticky severe over 15 min (A9)") {
    val flink = Seq(("app1", "jobA", 16L * 60 * 1000), ("app1", "jobB", 1000L))
      .toDF("application_id", "job_name", "last_checkpoint_duration")
    val out = HeuristicAggs.flinkCheckpointDuration(flink)
      .select("job_name", "severity").as[(String, Int)].collect().toMap
    assert(out("jobA") == Severity.Severe && out("jobB") == Severity.None)
  }

  test("extractorCounts groups by container and type (A10)") {
    val ev = Seq(("c1", "GC_EVENT"), ("c1", "GC_EVENT"), ("c1", "FS_EVENT"), ("c2", "FS_EVENT"))
      .toDF("container_id", "event_type")
    val out = HeuristicAggs.extractorCounts(ev).orderBy("container_id", "event_type")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("c1", "FS_EVENT", 1L), ("c1", "GC_EVENT", 2L), ("c2", "FS_EVENT", 1L)))
  }
}
