package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.heuristics.HeuristicAggs
import graft.serving.HeuristicsSink

/** S8: heuristic results → JDBC (embedded Derby stands in for the MySQL
  * the reference targets; Spark's JDBC writer creates the table from the
  * DataFrame schema).
  */
class HeuristicsSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:heurdb;create=true"
  private val driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def gcEvents = Seq(
    ("app_1", "1", "c1", "Ergonomics"),
    ("app_1", "1", "c1", "Metadata GC Threshold"),
    ("app_1", "1", "c2", "Allocation Failure"),
    ("app_2", "1", "c3", "Allocation Failure"))
    .toDF("application_id", "attempt_id", "container_id", "cause")

  test("resultRows matches the reference row shape (HeuristicsResultDB.java:27-30)") {
    val rows = HeuristicsSink.resultRows(
      HeuristicAggs.gcCause(gcEvents),
      "com.criteo.hadoop.garmadon.heuristics.GCCause", scoreCol = Some("flagged_gc"))
      .orderBy("yarn_app_result_id", "heuristic_name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("app_1", "app_1", "app_2"))
    assert(rows.head.getString(1) == "com.criteo.hadoop.garmadon.heuristics.GCCause")
    assert(rows.head.getString(2) == "GCCause@1")
    // app_1/c1: 2 flagged → MODERATE(2), score 2; the others: none flagged
    assert(rows.map(r => (r.getInt(3), r.getInt(4))).toSet == Set((2, 2), (0, 0)))
    assert(rows.forall(_.getInt(5) == 1)) // ready
  }

  test("writeResults + spark.read.jdbc roundtrip through Derby") {
    val results = HeuristicsSink.resultRows(
      HeuristicAggs.gcCause(gcEvents),
      "com.criteo.hadoop.garmadon.heuristics.GCCause", scoreCol = Some("flagged_gc"))
    HeuristicsSink.writeResults(results, url, "heur_batch", driver = driver)
    val p = new java.util.Properties()
    p.setProperty("driver", driver.get)
    val back = spark.read.jdbc(url, "heur_batch", p)
    assert(back.count() == 3)
    // only app_1/c1 has flagged causes (Ergonomics, Metadata GC Threshold)
    assert(back.where(col("severity") > 0).count() == 1)
  }

  test("detailRows carry named counters keyed by the composite result key") {
    val details = HeuristicsSink.detailRows(
      HeuristicAggs.gcCause(gcEvents),
      "com.criteo.hadoop.garmadon.heuristics.GCCause",
      Seq("flagged_gc" -> "flagged_gc", "severity" -> "severity"))
    val d = details.orderBy("yarn_app_result_id", "name").collect()
    assert(d.length == 6) // 3 results x 2 details
    assert(d.head.getString(1) == "GCCause@1")
    assert(d.map(_.getString(2)).distinct.sorted.toSeq == Seq("flagged_gc", "severity"))
  }

  test("detail rows WRITE through JDBC (null details column must be a typed varchar, not SQL void)") {
    val details = HeuristicsSink.detailRows(
      HeuristicAggs.gcCause(gcEvents),
      "com.criteo.hadoop.garmadon.heuristics.GCCause",
      Seq("flagged_gc" -> "flagged_gc"))
    // a bare lit(null) NullType column made this throw at CREATE TABLE
    // ("Can't get JDBC type for void") — the sink's stated purpose
    HeuristicsSink.writeResults(details, url, "heur_details_t", driver = driver)
    val p = new java.util.Properties()
    p.setProperty("driver", driver.get)
    val back = spark.read.jdbc(url, "heur_details_t", p)
    assert(back.count() == 3 && back.where(col("details").isNull).count() == 3)
  }

  test("per-instance heuristics disambiguate the composite key via instanceCol — no detail fan-out") {
    val cls = "com.criteo.hadoop.garmadon.heuristics.GCCause"
    // gcCause groups per (app, attempt, container): two containers of one
    // attempt share (app, GCCause@attempt) — instanceCol rides the
    // container into the name so the join key is unique per result row
    val perContainer = HeuristicAggs.gcCause(gcEvents)
    val results = HeuristicsSink.resultRows(perContainer, cls,
      instanceCol = Some("container_id"))
    val details = HeuristicsSink.detailRows(perContainer, cls,
      Seq("flagged_gc" -> "flagged_gc"), instanceCol = Some("container_id"))
    val joined = results.join(details, Seq("yarn_app_result_id", "heuristic_name"))
    assert(joined.count() == details.count(),
      "the composite-key join must not fan out across same-attempt containers")
    assert(results.select("heuristic_name").as[String].collect()
      .forall(_.split("@").length == 3))
  }

  test("streamWriter inserts per micro-batch (foreachBatch JDBC)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, String, String)]
    val stream = in.toDF().toDF("application_id", "attempt_id", "container_id", "cause")
    // pre-aggregated per batch: normalize each micro-batch inside foreachBatch
    val q = stream.writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
      HeuristicsSink.writeResults(
        HeuristicsSink.resultRows(HeuristicAggs.gcCause(batch),
          "com.criteo.hadoop.garmadon.heuristics.GCCause", scoreCol = Some("flagged_gc")),
        url, "heur_stream", driver = driver)
    }.start()
    try {
      in.addData(("app_9", "1", "c1", "Ergonomics"))
      q.processAllAvailable()
      in.addData(("app_9", "1", "c2", "Allocation Failure"))
      q.processAllAvailable()
    } finally q.stop()
    val p = new java.util.Properties()
    p.setProperty("driver", driver.get)
    val back = spark.read.jdbc(url, "heur_stream", p)
    assert(back.count() == 2) // one result row per micro-batch
  }
}
