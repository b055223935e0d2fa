package graft

import org.apache.spark.sql.functions._

import graft.filters.Filters

/** Filter algebra semantics incl. De Morgan equivalences (mirrors the
  * reference's GarmadonMessageFiltersTest).
  */
class FiltersSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val df = Seq(
    ("FS_EVENT", Seq("YARN_APPLICATION"), "c1", "SPARK"),
    ("FS_EVENT", Seq("FORWARDER"), "c2", "MAPREDUCE"),
    ("GC_EVENT", Seq("YARN_APPLICATION", "STANDALONE"), "c1", "SPARK"),
    ("STATE_EVENT", Seq.empty[String], "c3", "YARN"))
    .toDF("event_type", "tags", "container_id", "framework")

  test("hasType / hasTag / hasContainerId / hasFramework") {
    assert(df.where(Filters.hasType("FS_EVENT")).count() == 2)
    assert(df.where(Filters.hasTag("YARN_APPLICATION")).count() == 2)
    assert(df.where(Filters.hasContainerId("c1")).count() == 2)
    assert(df.where(Filters.hasFramework("SPARK")).count() == 2)
    assert(df.where(Filters.hasAnyType("FS_EVENT", "GC_EVENT")).count() == 3)
  }

  test("ANY / NONE constants") {
    assert(df.where(Filters.any).count() == 4)
    assert(df.where(Filters.none).count() == 0)
  }

  test("and/or/not composition (the heuristics route F9)") {
    val route = Filters.and(
      Filters.hasTag("YARN_APPLICATION"),
      Filters.hasType("GC_EVENT"),
      Filters.or(Filters.hasFramework("SPARK"), Filters.hasFramework("MAPREDUCE")))
    assert(df.where(route).count() == 1)
  }

  test("matchedRoutes: every row delivered to EVERY matching route, non-matching rows dropped, one scan") {
    import org.apache.spark.sql.functions.{col, explode}
    val routes = Seq(
      "gc" -> Filters.hasType("GC_EVENT"),
      "spark_all" -> Filters.hasFramework("SPARK"),
      "none_route" -> Filters.none)
    val routed = df.withColumn("route", explode(Filters.matchedRoutes(routes)))
    val byRoute = routed.groupBy("route").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRoute == Map(
      "gc" -> df.where(Filters.hasType("GC_EVENT")).count(),
      "spark_all" -> df.where(Filters.hasFramework("SPARK")).count()))
    // a SPARK GC row rides both routes (the overlap duplication semantic)
    val overlap = df.where(Filters.hasType("GC_EVENT") && Filters.hasFramework("SPARK")).count()
    assert(routed.groupBy("container_id", "event_type").count()
      .where(col("count") >= 2).count() == overlap)
    // single scan: exactly one relation in the plan
    val scans = routed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.LeafNode => r
    }
    assert(scans.length == 1, s"route fan-out must not re-scan per route: $scans")
    // routeFanout: same rows, plus an explicit OR pre-filter that reaches
    // a REAL scan as a pushed filter (the LocalRelation fixture would let
    // the optimizer evaluate it away, so assert over parquet)
    val fanned = Filters.routeFanout(df, routes)
    assert(fanned.select("container_id", "route").collect().toSet
      == routed.select("container_id", "route").collect().toSet)
    val dir = java.nio.file.Files.createTempDirectory("route_fanout_").toString + "/t"
    df.write.parquet(dir)
    val plan = Filters.routeFanout(spark.read.parquet(dir), routes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("Or("),
      s"the route disjunction must reach the parquet scan as a pushed Or filter:\n$plan")
  }

  test("De Morgan: !(a && b) === !a || !b over the sample") {
    val a = Filters.hasType("FS_EVENT"); val b = Filters.hasFramework("SPARK")
    val left = df.where(Filters.not(Filters.and(a, b))).select("container_id", "event_type")
    val right = df.where(Filters.or(Filters.not(a), Filters.not(b))).select("container_id", "event_type")
    assert(left.except(right).count() == 0 && right.except(left).count() == 0)
  }
}
