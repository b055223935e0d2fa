package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{IncrementalPairs, JdkMedia, PairCuration}

/** Incremental (streaming) cross-modal pair store: admission against
  * history on both legs, replay idempotence by committed high-water
  * mark, crash-attempt invisibility.
  */
class IncrementalPairsSpec extends SparkSpecBase {
  import spark.implicits._

  private val cfg = PairCuration.Config(minCaptionTokens = 2, meanTol = 2.0)

  private def png(v: Int) = JdkMedia.solidPng(8, 8, v, v, v)

  test("batch 2 pairs matching batch 1 history drop on the right leg; novel pairs admit; replay skips") {
    val root = java.nio.file.Files.createTempDirectory("incpairs_").toString
    val accepted = s"$root/accepted"
    // batch 1: three pairs, distinct images (luma 0/60/120), distinct captions
    val b1 = Seq(
      (1L, png(0), "alpha beta gamma"),
      (2L, png(60), "delta epsilon zeta"),
      (3L, png(120), "eta theta iota"))
      .toDF("pair_id", "image", "caption")
    val led1 = IncrementalPairs.processBatch(b1, 0L, root, accepted, cfg = cfg).toMap
    assert(led1("admitted") == 3, led1.toString)
    assert(led1("history_image_dup") == 0 && led1("history_caption_dup") == 0)
    assert(IncrementalPairs.committedBatchId(spark, root).contains(0L))

    // batch 2: 11 = image dup of 1 (same luma, fresh caption);
    // 12 = caption dup of 2 (fresh luma, same caption string);
    // 13 = novel on both legs
    val b2 = Seq(
      (11L, png(0), "fresh caption one"),
      (12L, png(180), "delta epsilon zeta"),
      (13L, png(240), "totally new words"))
      .toDF("pair_id", "image", "caption")
    val led2 = IncrementalPairs.processBatch(b2, 1L, root, accepted, cfg = cfg).toMap
    assert(led2("history_image_dup") == 1, led2.toString)
    assert(led2("history_caption_dup") == 1, led2.toString)
    assert(led2("admitted") == 1, led2.toString)
    val ids = spark.read.parquet(accepted).select("pair_id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 2L, 3L, 13L), ids.toString)

    // replay of the COMMITTED batch 1: skip — no recompute, no re-append
    val replay = IncrementalPairs.processBatch(b2, 1L, root, accepted, cfg = cfg).toMap
    assert(replay == Map("replay_skipped" -> 1L), replay.toString)
    assert(spark.read.parquet(accepted).count() == 4)

    // survivors carry the pHash for downstream banding; history carries
    // features + caption hash pair, never image bytes or caption bytes
    // beyond the accepted table
    val hist = spark.read.parquet(s"$root/history")
    assert(hist.columns.toSet == Set("batch_id", "id", "ahash", "mean",
      "centered", "norm0", "cap_h", "cap_h2"), hist.columns.mkString(","))
    assert(hist.count() == 4)
  }

  test("a crashed attempt's partial history append is invisible: replay recomputes against the committed prefix") {
    val root = java.nio.file.Files.createTempDirectory("incpairs_crash_").toString
    val accepted = s"$root/accepted"
    val b1 = Seq((1L, png(0), "alpha beta gamma"))
      .toDF("pair_id", "image", "caption")
    IncrementalPairs.processBatch(b1, 0L, root, accepted, cfg = cfg)
    // simulate batch 1 crashing AFTER its history append but BEFORE the
    // manifest flip: rows stamped batch_id=1 exist, high-water mark is 0
    val b2 = Seq((21L, png(90), "brand new pair"))
      .toDF("pair_id", "image", "caption")
    spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, 21L, 0L, 90.0,
        Seq.fill(16)(0.0), true,
        xxhash64Lit("brand new pair"), xxhash64SaltedLit("brand new pair"))),
      spark.read.parquet(s"$root/history").schema)
      .write.mode("append").parquet(s"$root/history")
    // the replayed batch must NOT see the crashed attempt's row (it would
    // self-collide and be dropped = permanent loss); it recomputes against
    // committed batch 0 only and admits
    val led = IncrementalPairs.processBatch(b2, 1L, root, accepted, cfg = cfg).toMap
    assert(led("admitted") == 1, led.toString)
    assert(spark.read.parquet(accepted).select("pair_id").as[Long]
      .collect().toSet == Set(1L, 21L))
    // maintenance reclaims the crashed attempt's now-duplicate row
    // (id 21 appears under the crashed stamp AND the committed replay)
    assert(spark.read.parquet(s"$root/history").count() == 3)
    assert(IncrementalPairs.compactHistory(spark, root) == 1L)
    val hist = spark.read.parquet(s"$root/history")
    assert(hist.count() == 2)
    assert(hist.select("id").as[Long].collect().toSet == Set(1L, 21L))
    // idempotent: nothing more to reclaim
    assert(IncrementalPairs.compactHistory(spark, root) == 0L)
  }

  private def xxhash64Lit(s: String): Long =
    spark.range(1).select(xxhash64(lit(s))).as[Long].head()
  private def xxhash64SaltedLit(s: String): Long =
    spark.range(1).select(xxhash64(lit(1L), lit(s))).as[Long].head()

  test("streaming restart: a re-offered batch under the same id is a no-op; the stream continues past it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("incpairs_stream_").toString
    val accepted = s"$root/accepted"
    val ckpt = java.nio.file.Files.createTempDirectory("incpairs_ckpt_").toString
    val in = MemoryStream[(Long, Array[Byte], String)]
    def start() = IncrementalPairs.curateStream(
      in.toDF().toDF("pair_id", "image", "caption"), root, accepted, cfg = cfg)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    in.addData((1L, png(0), "alpha beta gamma"))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(accepted).count() == 1)
    val hwm = IncrementalPairs.committedBatchId(spark, root).get

    // restart from the checkpoint: batch 0 is not re-offered as new data;
    // the next batch admits the novel pair and drops the image dup
    val q2 = start()
    in.addData((2L, png(0), "image dup caption"), (3L, png(200), "second novel pair"))
    q2.processAllAvailable()
    q2.stop()
    assert(IncrementalPairs.committedBatchId(spark, root).get > hwm)
    val ids = spark.read.parquet(accepted).select("pair_id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 3L), ids.toString)
  }
}
