package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.KeyedHistory

/** The shared hash-partitioned history primitive: layout determinism,
  * pruned probes, empty/unborn-table resolution, key pushdown bounds.
  */
class KeyedHistorySpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  test("append + prunedRead round-trip: partition value is a pure key function; probes prune to the probe's partitions") {
    val dir = java.nio.file.Files.createTempDirectory("kh_").toString
    val rows = spark.range(1000).select(col("id").as("k"), (col("id") * 7).as("v"))
    KeyedHistory.append(rows, dir, 16, Seq("k"), sortCols = Seq("k"))
    // every row lands where partValue says — writers and readers agree
    // with zero coordination
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.where(col(KeyedHistory.PartCol) =!=
      KeyedHistory.partValue(16, col("k"))).count() == 0)
    // a 3-key probe plans a subset of partitions and finds its rows
    val probe = Seq(5L, 17L, 999L).toDF("k")
    val pts = KeyedHistory.probePartitions(probe, 16, Seq("k"))
    assert(pts.nonEmpty && pts.size <= 3)
    val pruned = KeyedHistory.prunedRead(spark, dir, 16, Seq("k"), probe, schema)
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == pts.size)
    // the probe JOIN (probeFrames) does the exact match
    assert(KeyedHistory.probeFrames(pruned, probe, Seq("k")).count() == 3)
    assert(KeyedHistory.probe(spark, dir, 16, Seq("k"), probe, schema)
      .select("v").as[Long].collect().toSet == Set(35L, 119L, 6993L))
  }

  test("unborn, empty and missing tables resolve to an empty frame of the declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("kh_empty_").toString
    // missing dir
    val missing = KeyedHistory.prunedRead(spark, s"$dir/nope", 8, Seq("k"),
      Seq(1L).toDF("k"), schema)
    assert(missing.isEmpty && missing.schema == schema)
    // a committed ZERO-ROW append writes only _SUCCESS (no partition
    // dirs) — the read must not die in schema inference
    KeyedHistory.append(spark.range(0).select(col("id").as("k"),
      col("id").as("v")), s"$dir/zero", 8, Seq("k"))
    val zero = KeyedHistory.prunedRead(spark, s"$dir/zero", 8, Seq("k"),
      Seq(1L).toDF("k"), schema)
    assert(zero.isEmpty && zero.schema == schema)
    // an empty PROBE reads nothing
    KeyedHistory.append(Seq((1L, 2L)).toDF("k", "v"), s"$dir/one", 8, Seq("k"))
    assert(KeyedHistory.prunedRead(spark, s"$dir/one", 8, Seq("k"),
      spark.range(0).select(col("id").as("k")), schema).isEmpty)
  }

  test("pushKeyCol: a small key set lands in PushedFilters; an oversized one falls back to partition pruning, same answers") {
    val dir = java.nio.file.Files.createTempDirectory("kh_push_").toString
    KeyedHistory.append(
      spark.range(5000).select(col("id").as("k"), (col("id") % 9).as("v")),
      dir, 8, Seq("k"), sortCols = Seq("k"))
    val probe = Seq(3L, 4100L).toDF("k")
    val pushed = KeyedHistory.prunedRead(spark, dir, 8, Seq("k"), probe,
      schema, pushKeyCol = Some("k"))
    // the superset In() filter reaches the scan node
    val scanMeta = pushed.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.get
    assert(scanMeta.contains("In(k"), scanMeta)
    // oversized key set: silent fallback, identical row answers
    val bigProbe = spark.range(200).select(col("id").as("k"))
    val capped = KeyedHistory.prunedRead(spark, dir, 8, Seq("k"), bigProbe,
      schema, pushKeyCol = Some("k"), maxPushKeys = 50)
    val uncapped = KeyedHistory.prunedRead(spark, dir, 8, Seq("k"), bigProbe,
      schema)
    assert(KeyedHistory.probeFrames(capped, bigProbe, Seq("k")).count() ==
      KeyedHistory.probeFrames(uncapped, bigProbe, Seq("k")).count())
  }

  test("sig-table delegation: Dedup.writeSignatures/prunedCorpusSigs ride the same formula (sig_pt layout unchanged)") {
    val dir = java.nio.file.Files.createTempDirectory("kh_sig_").toString + "/sigs"
    val sigs = spark.range(100).select(col("id"),
      array(lit(1L), lit(2L)).as("sig"))
    graft.operators.Dedup.writeSignatures(sigs, dir, 4, SaveMode.ErrorIfExists)
    // layout: sig_pt dirs whose value is partValue(4, id)
    val back = spark.read.parquet(dir)
    assert(back.columns.contains(graft.operators.Dedup.SigPartitionCol))
    assert(back.where(col(graft.operators.Dedup.SigPartitionCol) =!=
      KeyedHistory.partValue(4, col("id"))).count() == 0)
    val pruned = graft.operators.Dedup.prunedCorpusSigs(spark, dir,
      Seq(11L, 42L).toDF("id"), 4)
    assert(pruned.where(col("id").isin(11L, 42L)).count() == 2)
  }
}
