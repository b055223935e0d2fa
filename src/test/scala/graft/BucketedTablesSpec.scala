package graft

import org.apache.spark.sql.functions._

import graft.sources.{BucketedTables, Tables}

/** Bucketed co-located joins: the layout must delete the join shuffle on
  * BOTH sides (and the sorts), and the result must equal the unbucketed
  * join exactly.
  */
class BucketedTablesSpec extends SparkSpecBase {

  // stamp-suffixed names + exit-time dir cleanup, same hygiene as
  // q_bucketed_join: concurrent suites sharing a warehouse must not race
  private lazy val workDir = BucketedTables.scratchDir("bucketed_spec_")
  private lazy val work = workDir.toString
  private lazy val stamp = workDir.getFileName.toString.stripPrefix("bucketed_spec_")
  private lazy val lineitemTable = s"spec_bkt_lineitem_$stamp"
  private lazy val ordersTable = s"spec_bkt_orders_$stamp"

  private def writeFixtures(): Unit = {
    BucketedTables.writeBucketed(
      Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")),
      lineitemTable, "l_orderkey", 4, Some(s"$work/lineitem"))
    BucketedTables.writeBucketed(
      Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
      ordersTable, "o_orderkey", 4, Some(s"$work/orders"))
  }

  test("bucketed-bucketed equi-join plans zero shuffles and zero sorts") {
    writeFixtures()
    def joined = BucketedTables.bucketedEquiJoin(spark,
      lineitemTable, ordersTable, "l_orderkey", "o_orderkey")
    assert(BucketedTables.countShuffles(joined) == 0)
    // and it is a sort-merge join, not a broadcast that would hide the test
    val smj = BucketedTables.PlanWitness.collectNodes(joined) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty)
    // sortBy(key) also deletes the SMJ sorts — but since Spark 3.0 the scan
    // only propagates bucket sort order under the legacy flag (and only
    // when every bucket is a single file, which writeBucketed guarantees
    // via its pre-write repartition)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val sorts = BucketedTables.PlanWitness.collectNodes(joined) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.isEmpty, s"expected no sorts, got: $sorts")
    } finally spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
  }

  test("bucketed join result equals the unbucketed join") {
    writeFixtures()
    val bucketed = BucketedTables.bucketedEquiJoin(spark,
      lineitemTable, ordersTable, "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val plain = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("single-side bucketing still shuffles the other side (one exchange)") {
    writeFixtures()
    val unbucketedOrders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val joined = spark.table(lineitemTable).hint("merge")
      .join(unbucketedOrders, col("l_orderkey") === col("o_orderkey"))
    assert(BucketedTables.countShuffles(joined) == 1)
  }
}
