package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IvfIndexStore, Manifests, Similarity}
import graft.sources.Tables

/** The versioned IVF serving store: generation flip, map-only append,
  * centroid-fingerprint drift gate, replay compaction, crash recovery.
  */
class IvfIndexStoreSpec extends SparkSpecBase {
  private val sf01 = "/root/testdata/sf0.01"

  private def work(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def topKSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.select(col("query_id").cast("long"), col("rank"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("writeGeneration + topK matches the in-memory IVF path") {
    val root = work("ivfstore_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    val gen = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    assert(IvfIndexStore.currentGeneration(spark, root).contains(gen))
    val queries = embs.where(col("vec_id") < 3)
    val served = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2)
    val direct = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, centroids, nProbe = 2)
    assert(topKSet(served) == topKSet(direct))
  }

  test("append is picked up by serving; result matches in-memory IVF over the merged corpus") {
    val root = work("ivfstore_append_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val base = embs.where(col("vec_id") % 5 =!= 0)
    val increment = embs.where(col("vec_id") % 5 === 0)
    // centroids trained on the full set so base/merged assignment agrees
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, base, "vec_id", "embedding", centroids, root)
    IvfIndexStore.append(spark, increment, "vec_id", "embedding", root)
    val queries = embs.where(col("vec_id") < 3)
    val served = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2)
    val direct = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, centroids, nProbe = 2)
    assert(topKSet(served) == topKSet(direct))
    // empty increment is a no-op, not an error
    IvfIndexStore.append(spark, increment.where(lit(false)), "vec_id", "embedding", root)
  }

  test("append refuses wrong dimension (even one bad row mid-increment) and wrong column names") {
    val root = work("ivfstore_dim_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    def causeChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // MIXED increment: most rows the right dim, ONE truncated — a
    // first-row peek would admit it; the per-row guard must fail the write
    val mixed = embs.withColumn("embedding",
      when(col("vec_id") === 77L, slice(col("embedding"), 1, 3))
        .otherwise(col("embedding")))
    val e1 = intercept[Throwable] {
      IvfIndexStore.append(spark, mixed, "vec_id", "embedding", root)
    }
    assert(causeChain(e1).contains("does not match the index dimension"))
    val e2 = intercept[IllegalArgumentException] {
      IvfIndexStore.append(spark,
        embs.withColumnRenamed("embedding", "emb"), "vec_id", "emb", root)
    }
    assert(e2.getMessage.contains("do not match the index stamp"))
    // generation builds refuse an empty or mixed-dim corpus outright
    val e3 = intercept[IllegalArgumentException] {
      IvfIndexStore.writeGeneration(spark, embs.where(lit(false)),
        "vec_id", "embedding", centroids, work("ivfstore_empty_corpus_"))
    }
    assert(e3.getMessage.contains("EMPTY corpus"))
    val e4 = intercept[Throwable] {
      IvfIndexStore.writeGeneration(spark, mixed, "vec_id", "embedding",
        centroids, work("ivfstore_mixed_corpus_"))
    }
    assert(causeChain(e4).contains("does not match the centroid dimension"))
  }

  test("centroid drift is a loud serve-time error, not silent bad recall") {
    val root = work("ivfstore_drift_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    val gen = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    // overwrite the centroid table with drifted values, stamp untouched
    val drifted = centroids.map(_.map(_ * 1.5))
    Similarity.writeCentroids(spark, drifted, s"$root/$gen/centroids")
    val e = intercept[IllegalStateException] {
      IvfIndexStore.topK(spark, embs.where(col("vec_id") < 2), root, k = 3, nProbe = 2)
    }
    assert(e.getMessage.contains("centroid fingerprint mismatch"))
  }

  test("retrain flips the generation atomically; stale + orphan gens swept; old gen served until flip") {
    val root = work("ivfstore_retrain_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    val g1 = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    // crashed build: a gen dir that never got the _CURRENT flip
    val orphan = s"$root/gen-000-orphan"
    new java.io.File(s"$orphan/index").mkdirs()
    assert(IvfIndexStore.currentGeneration(spark, root).contains(g1), "orphan must not serve")
    val g2 = IvfIndexStore.retrain(spark, embs, "vec_id", "embedding", root,
      numCentroids = 8, iters = 1)
    assert(IvfIndexStore.currentGeneration(spark, root).contains(g2))
    assert(IvfIndexStore.readLayout(spark, root, g2).numCentroids == 8)
    // default sweep has a grace period: the just-superseded generation and
    // the fresh orphan both SURVIVE (an in-flight reader could still be on
    // them); only an explicit zero grace drops them
    assert(IvfIndexStore.dropStaleGenerations(spark, root).isEmpty,
      "graced sweep must not drop fresh generations")
    val dropped = IvfIndexStore.dropStaleGenerations(spark, root, minAgeMs = 0L)
    assert(dropped.toSet == Set(g1, "gen-000-orphan"))
    // serving still works from the surviving generation
    val served = IvfIndexStore.topK(spark, embs.where(col("vec_id") < 2), root, k = 3, nProbe = 2)
    assert(served.count() > 0)
  }

  test("sweep grace runs from the FLIP tombstone, not the gen dir's build mtime; observation-stamped orphans get a full grace") {
    val root = work("ivfstore_grace_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    val g1 = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    // age the BUILD mtime of g1 into the distant past: under the old
    // mtime-based grace, the moment a retrain flips _CURRENT this dir
    // already looks expired and gets deleted under live readers
    val g1Dir = java.nio.file.Path.of(root, g1)
    java.nio.file.Files.setLastModifiedTime(g1Dir,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))
    val g2 = IvfIndexStore.retrain(spark, embs, "vec_id", "embedding", root,
      numCentroids = 4, iters = 1)
    // tombstone written at the flip — the grace measures from NOW, so the
    // ancient build mtime must not make g1 sweepable
    assert(java.nio.file.Files.exists(g1Dir.resolve(IvfIndexStore.StaleSinceName)))
    assert(IvfIndexStore.dropStaleGenerations(spark, root).isEmpty,
      "superseded gen with fresh flip tombstone must survive the graced sweep")
    // a never-flipped orphan: first graced sweep only STARTS its clock
    val orphan = s"$root/gen-000-grace-orphan"
    new java.io.File(s"$orphan/index").mkdirs()
    assert(IvfIndexStore.dropStaleGenerations(spark, root).isEmpty,
      "first observation must stamp, not delete")
    val orphanStamp = java.nio.file.Path.of(orphan, IvfIndexStore.StaleSinceName)
    assert(java.nio.file.Files.exists(orphanStamp))
    // still inside its grace on the second sweep
    assert(IvfIndexStore.dropStaleGenerations(spark, root).isEmpty)
    // age the orphan's TOMBSTONE past the grace → deletable
    java.nio.file.Files.setLastModifiedTime(orphanStamp,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))
    assert(IvfIndexStore.dropStaleGenerations(spark, root) == Seq("gen-000-grace-orphan"))
    // g1's flip tombstone aged too → goes on the next sweep; serving intact
    java.nio.file.Files.setLastModifiedTime(g1Dir.resolve(IvfIndexStore.StaleSinceName),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))
    assert(IvfIndexStore.dropStaleGenerations(spark, root) == Seq(g1))
    assert(IvfIndexStore.currentGeneration(spark, root).contains(g2))
    assert(IvfIndexStore.topK(spark, embs.where(col("vec_id") < 2), root,
      k = 3, nProbe = 2).count() > 0)
  }

  test("retrain under serve: continuous reads survive the flip and the graced sweep; zero torn reads") {
    val root = work("ivfstore_serve_retrain_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 8, iters = 1)
    val g1 = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    val queries = embs.where(col("vec_id") < 3)
    // an in-flight plan resolved against g1 BEFORE the retrain: its scan is
    // pinned to g1's files, the exact reader the sweep grace protects
    val inflight = IvfIndexStore.topK(spark, queries, root, k = 3, nProbe = 2)
    // a reader loop hammering the store across the flip — every serve must
    // succeed, against whichever generation its _CURRENT resolution saw
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    @volatile var serves = 0
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          if (IvfIndexStore.topK(spark, queries, root, k = 3, nProbe = 2).count() == 0)
            failure = Some(new AssertionError("empty serve"))
          serves += 1
        } catch { case t: Throwable => failure = Some(t) }
      }
    })
    reader.start()
    val g2 =
      try {
        val g = IvfIndexStore.retrain(spark, embs, "vec_id", "embedding", root,
          numCentroids = 16, iters = 1)
        // sweep immediately after the flip, WITH the default grace: g1 must
        // survive because readers (the loop + the pinned plan) are live
        assert(IvfIndexStore.dropStaleGenerations(spark, root).isEmpty,
          "graced sweep deleted a generation readers are still on")
        // the pre-flip plan still reads g1's files without error
        assert(inflight.count() > 0, "in-flight read on the superseded generation tore")
        g
      } finally { stop = true; reader.join(60000) }
    assert(failure.isEmpty, s"a serve failed across the retrain flip: $failure")
    assert(serves > 0, "reader loop never completed a serve")
    assert(IvfIndexStore.currentGeneration(spark, root).contains(g2))
    // grace elapsed (no reader live now) → the superseded generation goes
    assert(IvfIndexStore.dropStaleGenerations(spark, root, minAgeMs = 0L) == Seq(g1))
    assert(IvfIndexStore.topK(spark, queries, root, k = 3, nProbe = 2).count() > 0)
  }

  test("maintain: one pass recovers crashed swaps, compacts replays, sweeps aged stale gens, reports drift") {
    val root = work("ivfstore_maintain_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    val gen = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    // replay: re-append a slice that is already in the index
    val replay = embs.where(col("vec_id") < 50)
    IvfIndexStore.append(spark, replay, "vec_id", "embedding", root)
    // crash a compaction mid-swap in one partition: trash holds the
    // original file, a half-moved maint file sits in the dir
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val idx = new org.apache.hadoop.fs.Path(IvfIndexStore.indexPath(root, gen))
    val cid0 = fs.listStatus(idx).filter(_.getPath.getName.startsWith("cid=")).head.getPath
    val victim = fs.listStatus(cid0).filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val trash = new org.apache.hadoop.fs.Path(cid0, ".maint_trash/stamp1")
    fs.mkdirs(trash)
    assert(fs.rename(victim, new org.apache.hadoop.fs.Path(trash, victim.getName)))
    fs.createNewFile(new org.apache.hadoop.fs.Path(cid0, ".maint_lock"))
    // an aged orphan generation (tombstone past the grace)
    val orphan = s"$root/gen-000-maintain-orphan"
    new java.io.File(s"$orphan/index").mkdirs()
    val stamp = java.nio.file.Path.of(orphan, IvfIndexStore.StaleSinceName)
    java.nio.file.Files.writeString(stamp, "0")
    java.nio.file.Files.setLastModifiedTime(stamp,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))

    val report = IvfIndexStore.maintain(spark, root)
    assert(report.recoveredPartitions >= 1, s"crashed swap not repaired: $report")
    assert(report.compactedPartitions >= 1, s"nothing compacted: $report")
    assert(report.droppedGenerations == Seq("gen-000-maintain-orphan"), s"sweep: $report")
    // replayed ids surface exactly once after the pass
    val served = IvfIndexStore.topK(spark, embs.where(col("vec_id") < 3), root,
      k = 5, nProbe = 4)
    val dupRanks = served.groupBy("query_id", "neighbor_id").count()
      .where(col("count") > 1).count()
    assert(dupRanks == 0, "replay duplicates survived maintenance")
    // healthy second pass: nothing to recover or drop
    val again = IvfIndexStore.maintain(spark, root)
    assert(again.recoveredPartitions == 0 && again.droppedGenerations.isEmpty)
  }

  test("replayed append duplicates surface a neighbor once after compactGeneration") {
    val root = work("ivfstore_replay_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val base = embs.where(col("vec_id") % 5 =!= 0)
    val increment = embs.where(col("vec_id") % 5 === 0)
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, base, "vec_id", "embedding", centroids, root)
    IvfIndexStore.append(spark, increment, "vec_id", "embedding", root)
    IvfIndexStore.append(spark, increment, "vec_id", "embedding", root) // replay
    val gen = IvfIndexStore.currentGeneration(spark, root).get
    val idx = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
    assert(idx.count() > idx.select("vec_id").distinct().count(), "replay seeded dups")
    val rewritten = IvfIndexStore.compactGeneration(spark, root)
    assert(rewritten > 0)
    val after = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
    assert(after.count() == after.select("vec_id").distinct().count())
    // one row per (query, neighbor) in the served result
    val served = IvfIndexStore.topK(spark, embs.where(col("vec_id") < 3), root, k = 5, nProbe = 2)
    val pairs = served.select("query_id", "neighbor_id")
    assert(pairs.count() == pairs.distinct().count())
    assert(topKSet(served) == topKSet(
      Similarity.ivfTopK(embs.where(col("vec_id") < 3), embs, "vec_id", "embedding",
        k = 5, centroids, nProbe = 2)))
  }

  test("compactGeneration crash mid-swap is repaired by recoverGenerationMaintenance") {
    val root = work("ivfstore_crash_")
    val embs = Tables.load(spark, sf01, "embeddings").where(col("vec_id") < 200)
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    val gen = IvfIndexStore.currentGeneration(spark, root).get
    val before = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // fake a crash mid-swap in one partition: originals moved to trash, lock held
    val cidDir = new java.io.File(IvfIndexStore.indexPath(root, gen)).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).head
    val stamp = "t1"
    val trash = new java.io.File(cidDir, s".maint_trash/$stamp"); trash.mkdirs()
    new java.io.File(cidDir, ".maint_lock").createNewFile()
    cidDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      assert(f.renameTo(new java.io.File(trash, f.getName)))
    }
    val repaired = IvfIndexStore.recoverGenerationMaintenance(spark, root)
    assert(repaired == 1)
    val after = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(after == before)
    // lock released: a fresh compaction succeeds
    assert(IvfIndexStore.compactGeneration(spark, root) > 0)
  }

  test("quantized generation: append + serve with exact re-rank matches quantized in-memory path") {
    val root = work("ivfstore_quant_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val base = embs.where(col("vec_id") % 5 =!= 0)
    val increment = embs.where(col("vec_id") % 5 === 0)
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, base, "vec_id", "embedding", centroids, root,
      quantized = true)
    IvfIndexStore.append(spark, increment, "vec_id", "embedding", root)
    val queries = embs.where(col("vec_id") < 3)
    // quantized serving without the re-rank corpus is a loud contract error
    val e = intercept[IllegalArgumentException] {
      IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2)
    }
    assert(e.getMessage.contains("quantized"))
    val served = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2,
      corpusForRerank = Some(embs))
    val direct = {
      val dir = work("ivfstore_quant_direct_")
      Similarity.writeIvfIndexQuantized(embs, "vec_id", "embedding", centroids, s"$dir/index")
      Similarity.ivfTopKFromQuantizedIndex(spark, queries, s"$dir/index", embs,
        "vec_id", "embedding", k = 5, centroids, nProbe = 2)
    }
    assert(topKSet(served) == topKSet(direct))
  }

  test("driftStats population sums to the index size and flags a planted imbalance") {
    val root = work("ivfstore_stats_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    val stats = IvfIndexStore.driftStats(spark, root).persist()
    val total = stats.agg(sum("n")).first().getLong(0)
    assert(total == embs.count())
    // cosines to the own centroid are sane
    assert(stats.where(col("mean_cos") < -1.0001 || col("mean_cos") > 1.0001).count() == 0)
    val balanced = IvfIndexStore.retrainAdvised(stats, maxImbalance = 1000.0)
    stats.unpersist()
    assert(!balanced, "absurd threshold must not advise a retrain")
    // plant heavy skew: replay one cluster's rows many times via append
    val gen = IvfIndexStore.currentGeneration(spark, root).get
    val heavy = embs.where(col("vec_id") % 7 === 0)
    (1 to 3).foreach(_ => IvfIndexStore.append(spark, heavy, "vec_id", "embedding", root))
    val skewed = IvfIndexStore.driftStats(spark, root)
    assert(IvfIndexStore.retrainAdvised(skewed, maxImbalance = 2.0) ||
      skewed.agg(max("n")).first().getLong(0) > total / 16,
      "planted mass must be visible in the stats")
    assert(gen == IvfIndexStore.currentGeneration(spark, root).get)
  }

  test("appendStream: micro-batches land in the current generation; serving sees them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = work("ivfstore_stream_")
    val ckpt = work("ivfstore_stream_ckpt_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val base = embs.where(col("vec_id") % 5 =!= 0)
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, base, "vec_id", "embedding", centroids, root)
    val incRows = embs.where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val input = MemoryStream[(Long, Seq[Double])]
    val q = IvfIndexStore.appendStream(
        input.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        "vec_id", "embedding", root)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val (half1, half2) = incRows.splitAt(incRows.length / 2)
      input.addData(half1: _*); q.processAllAvailable()
      input.addData(half2: _*); q.processAllAvailable()
    } finally q.stop()
    val queries = embs.where(col("vec_id") < 3)
    val served = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2)
    val direct = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, centroids, nProbe = 2)
    assert(topKSet(served) == topKSet(direct))
  }

  test("dedupAppendBatch: corpus near-dups rejected, intra-batch keeps one representative, replay is idempotent") {
    val root = work("ivfstore_dedup_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val corpus = embs.where(col("vec_id") % 5 =!= 0)
    val centroids = Similarity.trainCentroids(corpus, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, corpus, "vec_id", "embedding", centroids, root)
    val novel = embs.where(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val planted = corpus.where(col("vec_id") < 40)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    // an intra-batch pair: two copies of a NEGATED corpus vector (novel —
    // cosine −1 to its source, ≤ background to everything else)
    val negated = embs.where(col("vec_id") === 1)
      .select(col("vec_id"), transform(col("embedding"), x => -x).as("embedding"))
    val intraPair = negated.select(lit(300001L).as("vec_id"), col("embedding"))
      .unionByName(negated.select(lit(300002L).as("vec_id"), col("embedding")))
    val batch = novel.unionByName(planted).unionByName(intraPair)
    val accepted = IvfIndexStore.dedupAppendBatch(spark, batch, "vec_id", "embedding",
      root, threshold = 0.95)
    val acceptedIds = accepted.select("vec_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val expectedNovel = novel.select("vec_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet + 300001L
    assert(acceptedIds == expectedNovel,
      s"diff: +${acceptedIds -- expectedNovel} -${expectedNovel -- acceptedIds}")
    // survivors are IN the index now
    val gen = IvfIndexStore.currentGeneration(spark, root).get
    val indexed = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(expectedNovel.subsetOf(indexed))
    // REPLAY the whole batch: every doc now self-matches at cosine 1.0 →
    // nothing accepted, nothing re-appended (idempotent, not at-least-once)
    val replayed = IvfIndexStore.dedupAppendBatch(spark, batch, "vec_id", "embedding",
      root, threshold = 0.95)
    assert(replayed.count() == 0)
    val after = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
    assert(after.count() == after.select("vec_id").distinct().count(),
      "replay must not seed duplicate rows")
    // quantized layout refuses the dedup probe loudly
    val qroot = work("ivfstore_dedup_quant_")
    IvfIndexStore.writeGeneration(spark, corpus, "vec_id", "embedding", centroids,
      qroot, quantized = true)
    val e = intercept[IllegalArgumentException] {
      IvfIndexStore.dedupAppendBatch(spark, batch, "vec_id", "embedding", qroot, 0.95)
    }
    assert(e.getMessage.contains("full-precision"))
  }

  test("dedupAppendStream: semantic dedup per micro-batch through the store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = work("ivfstore_dedupstream_")
    val ckpt = work("ivfstore_dedupstream_ckpt_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val corpus = embs.where(col("vec_id") % 5 =!= 0)
    val centroids = Similarity.trainCentroids(corpus, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, corpus, "vec_id", "embedding", centroids, root)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val novelRows = rowsOf(embs.where(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    val plantedRows = rowsOf(corpus.where(col("vec_id") < 40)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
    val input = MemoryStream[(Long, Seq[Double])]
    val q = IvfIndexStore.dedupAppendStream(
        input.toDF().toDF("vec_id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        "vec_id", "embedding", root, threshold = 0.95)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(novelRows: _*); q.processAllAvailable()
      // batch 2: dups of batch-1 SURVIVORS (proves survivors were indexed)
      input.addData(plantedRows ++ novelRows.take(10)
        .map { case (id, v) => (id + 500000L, v) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val gen = IvfIndexStore.currentGeneration(spark, root).get
    val indexed = spark.read.parquet(IvfIndexStore.indexPath(root, gen))
      .select("vec_id").as[Long].collect().toSet
    assert(novelRows.map(_._1).toSet.subsetOf(indexed), "batch-1 novels indexed")
    assert(plantedRows.map(_._1).toSet.intersect(indexed).isEmpty, "corpus dups rejected")
    assert(!indexed.exists(_ >= 500000L), "dups of batch-1 survivors rejected")
  }

  test("filtered vector search: metadata predicate reaches the pruned scan; results match a post-filtered full search") {
    val root = work("ivfstore_filter_")
    val embs = Tables.load(spark, sf01, "embeddings") // vec_id, embedding, label
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root,
      payloadCols = Seq("label"))
    val queries = embs.where(col("vec_id") < 3)
    val filt = Some(col("label") === 3)
    val served = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2,
      metadataFilter = filt)
    // reference: the same probed search over a PRE-filtered in-memory
    // corpus (self-exclusion parity is free: a label≠3 query is absent
    // from both sides, a label=3 query is excluded by id in both)
    val direct = Similarity.ivfTopK(queries, embs.where(col("label") === 3),
      "vec_id", "embedding", k = 5, centroids, nProbe = 2)
    assert(topKSet(served) == topKSet(direct), "filtered serve ≠ pre-filtered probe")
    // every served neighbor satisfies the predicate
    val labels = embs.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(served.join(labels, "neighbor_id").where(col("label") =!= 3).count() == 0)
    // the predicate reaches the parquet scan as a pushed filter
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("label"),
      s"label predicate must be pushed into the index scan:\n$plan")
    // appended rows carry the payload and are filterable
    val inc = embs.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 400000L).as("vec_id"), col("embedding"), col("label"))
    IvfIndexStore.append(spark, inc, "vec_id", "embedding", root)
    val served2 = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2,
      metadataFilter = filt)
    val incLabels = inc.select(col("vec_id").as("neighbor_id"), col("label"))
      .unionByName(labels)
    assert(served2.join(incLabels, "neighbor_id").where(col("label") =!= 3).count() == 0)
    // quantized store refuses metadata filters and payload columns loudly
    val qroot = work("ivfstore_filter_quant_")
    val eq = intercept[IllegalArgumentException] {
      IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids,
        qroot, quantized = true, payloadCols = Seq("label"))
    }
    assert(eq.getMessage.contains("not supported on the quantized layout"))
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids,
      qroot, quantized = true)
    val ef = intercept[IllegalArgumentException] {
      IvfIndexStore.topK(spark, queries, qroot, k = 5, nProbe = 2,
        corpusForRerank = Some(embs), metadataFilter = filt)
    }
    assert(ef.getMessage.contains("metadata filters are not supported"))
    assert(topKSet(served).nonEmpty && topKSet(direct).nonEmpty)
  }

  test("deleteIds erases rows from storage and serving; untouched partitions keep their files") {
    import spark.implicits._
    val root = work("ivfstore_delete_")
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    val gen = IvfIndexStore.currentGeneration(spark, root).get
    val idxPath = IvfIndexStore.indexPath(root, gen)
    // victims: the current top-1 neighbors of the queries (so serving
    // change is observable), plus some arbitrary ids
    val queries = embs.where(col("vec_id") < 3)
    val top1 = IvfIndexStore.topK(spark, queries, root, k = 1, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSeq
    val victims = (top1 ++ Seq(100L, 101L, 987654L)).distinct // incl. a nonexistent id
    val existingVictims = embs.where(col("vec_id").isin(victims: _*)).count()
    // file mtimes of untouched partitions must not change
    val affectedCids = spark.read.parquet(idxPath)
      .where(col("vec_id").isin(victims: _*))
      .select("cid").distinct().as[Int].collect().toSet
    val untouched = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=") &&
        !affectedCids.contains(f.getName.stripPrefix("cid=").toInt))
    val mtimesBefore = untouched.map(d => d.getName ->
      d.listFiles().map(f => f.getName -> f.lastModified()).toMap).toMap
    val rewritten = IvfIndexStore.deleteIds(spark, root, victims)
    assert(rewritten == affectedCids.size)
    // gone from storage
    assert(spark.read.parquet(idxPath)
      .where(col("vec_id").isin(victims: _*)).count() == 0)
    // gone from serving: no served neighbor is a victim
    val served = IvfIndexStore.topK(spark, queries, root, k = 5, nProbe = 2)
    assert(served.where(col("neighbor_id").isin(victims: _*)).count() == 0)
    // non-victim rows intact
    assert(spark.read.parquet(idxPath).count() == embs.count() - existingVictims)
    untouched.foreach { d =>
      val now = d.listFiles().map(f => f.getName -> f.lastModified()).toMap
      assert(now == mtimesBefore(d.getName), s"untouched partition ${d.getName} was rewritten")
    }
    // idempotent + empty-list no-op
    assert(IvfIndexStore.deleteIds(spark, root, victims) == 0)
    assert(IvfIndexStore.deleteIds(spark, root, Nil) == 0)
  }

  test("an unstamped generation refuses to serve; manifest parse errors are loud") {
    val root = work("ivfstore_unstamped_")
    val embs = Tables.load(spark, sf01, "embeddings").where(col("vec_id") < 50)
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 2, iters = 1)
    val gen = IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, root)
    new java.io.File(s"$root/$gen/${IvfIndexStore.LayoutName}").delete()
    val e = intercept[IllegalStateException] {
      IvfIndexStore.topK(spark, embs.where(col("vec_id") < 2), root, k = 2, nProbe = 1)
    }
    assert(e.getMessage.contains("unstamped"))
    Manifests.writeAtomic(spark, s"$root/$gen/${IvfIndexStore.LayoutName}", "{}")
    val e2 = intercept[IllegalStateException] {
      IvfIndexStore.topK(spark, embs.where(col("vec_id") < 2), root, k = 2, nProbe = 1)
    }
    assert(e2.getMessage.contains("missing field"))
    // no _CURRENT at all
    val e3 = intercept[IllegalStateException] {
      IvfIndexStore.topK(spark, embs, work("ivfstore_empty_"), k = 2, nProbe = 1)
    }
    assert(e3.getMessage.contains("no committed generation"))
  }
}
