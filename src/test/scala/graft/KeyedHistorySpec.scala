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

  test("METADATA-flat probes: the scan's root paths are exactly the selected partition dirs — an unselected dir is never listed") {
    val dir = java.nio.file.Files.createTempDirectory("kh_meta_").toString
    KeyedHistory.append(
      spark.range(2000).select(col("id").as("k"), (col("id") * 3).as("v")),
      dir, 16, Seq("k"), sortCols = Seq("k"))
    val allDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(KeyedHistory.PartCol + "="))
      .map(_.getName).toSet
    assert(allDirs.size > 4, s"fixture too small: $allDirs")
    val probe = Seq(7L, 1999L).toDF("k")
    val pts = KeyedHistory.probePartitions(probe, 16, Seq("k")).toSet
    val pruned = KeyedHistory.prunedRead(spark, dir, 16, Seq("k"), probe, schema)
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // partition pruning happens at PATH CONSTRUCTION: the relation's
    // root paths (what the file index lists) are only the selected dirs,
    // so the driver's file-level metadata cost is O(selected partitions'
    // files) — the old full-tree read listed every file of every
    // partition per probe, the O(batches²) cumulative term at scale
    val roots = scan.relation.location.rootPaths.map(_.getName).toSet
    assert(roots.subsetOf(allDirs), s"scan roots $roots not partition dirs")
    assert(roots == pts.map(v => s"${KeyedHistory.PartCol}=$v").intersect(allDirs),
      s"scan lists $roots, probe selected $pts")
    assert(roots.size < allDirs.size, "probe listed the whole table")
    // and the rows still come back right
    assert(KeyedHistory.probeFrames(pruned, probe, Seq("k"))
      .select("v").as[Long].collect().toSet == Set(21L, 5997L))
  }

  test("pushed In() SKIPS row groups inside a selected partition: bytes ∝ probe keys even when partition pruning is vacuous (P=1)") {
    val dir = java.nio.file.Files.createTempDirectory("kh_rg_").toString
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    try {
      // tiny row groups so one file holds MANY of them — the scale shape
      // of a corpus partition, where the pushed filter (not partition
      // pruning) must carry the bytes claim
      hc.setInt("parquet.block.size", 16 * 1024)
      hc.setInt("parquet.page.size", 4 * 1024)
      KeyedHistory.append(
        spark.range(200000).select(col("id").as("k"), (col("id") * 3).as("v"))
          .coalesce(1),
        dir, 1, Seq("k"), sortCols = Seq("k"))
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      hc.unset("parquet.page.size")
    }
    val probe = Seq(31337L, 99123L, 170001L).toDF("k")
    val pruned = KeyedHistory.prunedRead(spark, dir, 1, Seq("k"), probe,
      schema, pushKeyCol = Some("k"))
    // the mechanism: the In() reaches the parquet scan…
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata.getOrElse("PushedFilters", "").contains("In(k"),
      scan.metadata.getOrElse("PushedFilters", ""))
    // …and it BITES: rows surfaced by the reader are a sliver of the
    // partition (row-group min/max stats over the k-sorted file skip
    // non-matching groups before any IO; numOutputRows counts what the
    // reader actually materialized)
    // execute THE SAME plan the scan node belongs to (a fresh count()
    // would build a new execution whose metrics this node never sees)
    assert(pruned.queryExecution.toRdd.count() == 3)
    val surfaced = scan.metrics("numOutputRows").value
    assert(surfaced > 0 && surfaced < 20000,
      s"reader materialized $surfaced of 200000 rows — row-group skip not biting")
  }

  test("L0 delta tier: one file per append, probes see base ∪ deltas, fold absorbs into the partitioned base, empty deltas swept") {
    val dir = java.nio.file.Files.createTempDirectory("kh_l0_").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tPath = new org.apache.hadoop.fs.Path(dir)
    // base via a dir-mode write, then two L0 batches + one empty batch
    KeyedHistory.append(
      spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")),
      dir, 8, Seq("k"), sortCols = Seq("k"))
    KeyedHistory.append(Seq((1000L, 1L), (1001L, 2L)).toDF("k", "v"),
      dir, 8, Seq("k"), sortCols = Seq("k"), l0 = true)
    KeyedHistory.append(Seq((2000L, 3L)).toDF("k", "v"),
      dir, 8, Seq("k"), sortCols = Seq("k"), l0 = true)
    KeyedHistory.append(spark.range(0).select(col("id").as("k"),
      col("id").as("v")), dir, 8, Seq("k"), l0 = true)
    // a FILE-LESS delta dir (crash before any task commit): fold sweeps it
    fs.mkdirs(new org.apache.hadoop.fs.Path(tPath,
      s"${KeyedHistory.L0Dir}/delta-craSHED-000"))
    assert(KeyedHistory.l0ParquetFiles(fs, tPath).size == 3,
      "one delta file per append (zero-row appends write an empty file)")
    // probes see base AND delta rows before any fold
    val probe = Seq(5L, 1000L, 2000L).toDF("k")
    assert(KeyedHistory.probe(spark, dir, 8, Seq("k"), probe, schema)
      .select("v").as[Long].collect().toSet == Set(10L, 1L, 3L))
    // readAll = everything; a plain read of the table sees only base
    assert(KeyedHistory.readAll(spark, dir, schema).count() == 103)
    assert(spark.read.parquet(dir).count() == 100)
    // the fold absorbs deltas into the partitioned layout and sweeps
    // the empty delta dir; answers unchanged, layout intact
    assert(KeyedHistory.foldSmallFiles(spark, dir, Seq("k"),
      p = 8, keyCols = Seq("k")) > 0)
    assert(KeyedHistory.l0ParquetFiles(fs, tPath).isEmpty)
    val l0Sub = new org.apache.hadoop.fs.Path(tPath, KeyedHistory.L0Dir)
    assert(!fs.exists(l0Sub) || fs.listStatus(l0Sub).forall(!_.isDirectory),
      "empty delta dirs must be swept")
    assert(spark.read.parquet(dir).count() == 103)
    assert(spark.read.parquet(dir).where(col(KeyedHistory.PartCol) =!=
      KeyedHistory.partValue(8, col("k"))).count() == 0,
      "folded delta rows must land in the partition their key hashes to")
    assert(KeyedHistory.probe(spark, dir, 8, Seq("k"), probe, schema)
      .select("v").as[Long].collect().toSet == Set(10L, 1L, 3L))
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
