package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Measured-recall and skew-cap behavior of the LSH family (VERDICT r1
  * items 4/6: banded ANN must have measured recall vs brute force, and
  * every bucketed self-join must exercise its cap on a skew fixture).
  */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"

  test("lshTopK recall@5 >= 0.9 vs bruteForceTopK on sf0.01 embeddings") {
    val embs = Tables.load(spark, sf01, "embeddings")
    val queries = embs.where(col("vec_id") < 20)
    val lsh = Similarity.lshTopK(queries, embs, "vec_id", "embedding",
      k = 5, bands = 40, bitsPerBand = 2)
      .select(col("query_id"), col("neighbor_id"))
    val brute = Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    val hit = lsh.intersect(brute).count().toDouble
    val total = brute.count().toDouble
    val recall = hit / total
    info(f"lshTopK recall@5 = $recall%.3f ($hit%.0f/$total%.0f)")
    assert(recall >= 0.9, s"recall@5 $recall below 0.9")
  }

  test("simHashPairsWide emits exactly the quarter-blocked pair set (pigeonhole equivalence)") {
    val docs = Tables.load(spark, sf01, "documents")
    val quarters = Dedup.simHashPairs(docs, "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming")
    val wide = Dedup.simHashPairsWide(docs, "doc_id", maxHamming = 3, blocks = 6)
      .select("id_a", "id_b", "hamming")
    // plain collect-compare: exceptAll over this plan trips a Catalyst
    // BindReferences internal error (hamming attr lost under the
    // replication-count rewrite) in Spark 4.1
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val qs = pairSet(quarters)
    assert(pairSet(wide) == qs, "both blockings must find the identical Hamming<=3 pair set")
    assert(qs.nonEmpty, "fixture must produce pairs for the equivalence to mean anything")
  }

  test("ivfTopK: deterministic centroids, measured recall vs brute force on sf0.01") {
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    val again = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    assert(centroids.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "centroid training must be deterministic")
    val queries = embs.where(col("vec_id") < 20)
    val ivf = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, centroids, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"))
    val brute = Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    val hit = ivf.intersect(brute).count().toDouble
    val total = brute.count().toDouble
    val recall = hit / total
    info(f"ivfTopK recall@5 = $recall%.3f (nProbe 8/16 clusters)")
    assert(recall >= 0.8, s"recall@5 $recall below 0.8")
    // probing half the clusters must not degenerate to scanning the corpus
    val perQueryCandidates = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 1000000, centroids, nProbe = 8)
      .groupBy("query_id").count().agg(max("count")).first().getLong(0)
    assert(perQueryCandidates < embs.count(), "IVF must prune the corpus per query")
  }

  test("trainCentroids init: hash-threshold sample prunes the seed scan, seeds identical to the unsampled init") {
    import spark.implicits._
    // 200k synthetic vectors >> InitSampleFactor·k (k=2 → 20k): sampling is
    // ACTIVE, unlike the sf0.01 fixtures where n is far below the target
    val n = 200000L
    val corpus = spark.range(n)
      .select(col("id").as("vid"),
        array(col("id").cast("double"), (col("id") % 7).cast("double"),
          (col("id") % 13).cast("double")).as("vec"))
      .localCheckpoint() // freeze: both inits must read the exact same rows
    val k = 2
    // the sampled frame carries the pruning predicate (the plan witness:
    // at 100 TB this filter is what keeps the init from reading the
    // corpus' vector payloads) and passes ~target rows, never everything
    val sampled = Similarity.initSampled(corpus, "vid", k, n)
    assert(sampled.queryExecution.optimizedPlan.toString.contains("xxhash64"),
      "sampled init must filter on the id hash")
    val passed = sampled.count()
    assert(passed < n / 5, s"sample must prune most of the corpus (passed $passed of $n)")
    assert(passed >= k, "sample must retain at least k seed candidates")
    // identical-seeds guarantee: filter and order share the hash, so the
    // k smallest hashes survive the filter ⇒ same seeds as a full scan
    val viaTrain = Similarity.trainCentroids(corpus, "vid", "vec", k, iters = 0)
    val full = corpus.orderBy(xxhash64(col("vid").cast("string"))).limit(k)
      .select(col("vec")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    assert(viaTrain.map(_.toSeq).toSeq == full,
      "sampled init must produce byte-identical seeds to the unsampled init")
  }

  test("ivfTopKFromIndex: persisted partitionBy(cid) layout prunes to probed clusters") {
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", centroids, s"$dir/index")
    Similarity.writeCentroids(spark, centroids, s"$dir/centroids")
    // the index round-trips its own metadata
    val loaded = Similarity.readCentroids(spark, s"$dir/centroids")
    assert(loaded.map(_.toSeq).toSeq == centroids.map(_.toSeq).toSeq)
    // few queries, few probes: the probed-cid union must stay a strict
    // subset of the 16 clusters for the pruning assertion to bite
    val queries = embs.where(col("vec_id") < 3)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, queries, s"$dir/index",
      "vec_id", "embedding", k = 5, loaded, nProbe = 2)
    val direct = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, centroids, nProbe = 2)
    // same ANN semantics as the in-memory path
    assert(fromIndex.select("query_id", "rank", "neighbor_id").collect().toSet ==
      direct.select("query_id", "rank", "neighbor_id").collect().toSet)
    // and the scan actually prunes: a cid predicate over the layout reads
    // only the matching partitions' files (inputFiles ignores pruning, and
    // AQE hides the scan node in executedPlan, so count the statically
    // selected files on the pre-AQE physical plan)
    import org.apache.spark.sql.execution.FileSourceScanExec
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.sparkPlan
        .collect { case s: FileSourceScanExec => s }
        .map(_.selectedPartitions.totalNumberOfFiles).sum
    val probed = embs.where(col("vec_id") < 3)
      .select(explode(graft.functions.VectorExpressions
        .centroid_probes(col("embedding"), loaded, 2)).as("cid"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val prunedFiles = filesRead(
      spark.read.parquet(s"$dir/index").where(col("cid").isin(probed: _*)))
    val allFiles = filesRead(spark.read.parquet(s"$dir/index"))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"index scan must touch only probed clusters ($prunedFiles/$allFiles files)")
  }

  test("ivfTopKFromQuantizedIndex: int8 layout matches the exact path after re-rank, smaller on disk") {
    val embs = Tables.load(spark, sf01, "embeddings")
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_quant").toString
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", centroids, s"$dir/full")
    Similarity.writeIvfIndexQuantized(embs, "vec_id", "embedding", centroids, s"$dir/quant")
    val queries = embs.where(col("vec_id") < 5)
    val fromQuant = Similarity.ivfTopKFromQuantizedIndex(spark, queries, s"$dir/quant",
      embs, "vec_id", "embedding", k = 5, centroids, nProbe = 2)
    val direct = Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 5, centroids, nProbe = 2)
    // exact re-rank of the preselected shortlist reproduces the exact path.
    // Make preselect truncation OBSERVABLE on failure (the lossy-cap
    // convention): report how deep in the approx ranking the true top-k
    // sat, so a fixture/dim change that pushes a true neighbor past
    // k*preselect fails with a margin diagnostic, not a bare set mismatch.
    val quantSet = fromQuant.select("query_id", "rank", "neighbor_id").collect().toSet
    val directSet = direct.select("query_id", "rank", "neighbor_id").collect().toSet
    if (quantSet != directSet) {
      val missing = directSet.diff(quantSet)
      fail(s"quantized path diverged from exact; true-top-k rows lost to the " +
        s"k*preselect approx shortlist (raise preselect or inspect codes): $missing")
    }
    // quantized rows must occupy less disk than the float layout
    def bytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    assert(bytes(s"$dir/quant") < bytes(s"$dir/full"),
      s"quantized index (${bytes(s"$dir/quant")}) not smaller than float (${bytes(s"$dir/full")})")
    // cid assignment must come from the ORIGINAL vector: every (id, cid) in
    // the quantized layout matches the float layout
    val qCids = spark.read.parquet(s"$dir/quant").select("vec_id", "cid")
    val fCids = spark.read.parquet(s"$dir/full").select("vec_id", "cid")
    assert(qCids.exceptAll(fCids).isEmpty && fCids.exceptAll(qCids).isEmpty)
  }

  test("embeddingNearDups finds every exact-cosine pair >= threshold (full recall on sf0.01)") {
    val embs = Tables.load(spark, sf01, "embeddings").limit(200)
    val lshPairs = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
      threshold = 0.4, bands = 48, bitsPerBand = 4)
      .select("id_a", "id_b")
    // exact ground truth by brute force on the 200-vector slice
    val a = embs.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = embs.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .where(graft.functions.Functions.cosine(col("v_a"), col("v_b")) >= 0.4)
      .select("id_a", "id_b")
    assert(lshPairs.exceptAll(exact).count() == 0, "LSH emitted a pair below threshold")
    assert(exact.exceptAll(lshPairs).count() == 0, "LSH missed a qualifying pair")
  }

  test("capBuckets drops oversized buckets and oversizedBuckets reports them (skew fixture)") {
    // 50 identical vectors land in one bucket in every band
    val skew = (0L until 50L).map(i => (i, Seq.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val banded = skew.select(col("vec_id"),
      graft.functions.VectorExpressions.hyperplane_sig(col("embedding"), 4, 0).as("sig"))
    val over = Dedup.oversizedBuckets(banded, Seq("sig"), maxBucket = 10)
    assert(over.count() == 1)
    assert(over.select("bucket_size").as[Long].head() == 50L)
    val capped = Dedup.capBuckets(banded, Seq("sig"), maxBucket = 10)
    assert(capped.count() == 0)

    // near-dup path: identical docs in one oversized bucket produce no
    // pairs once capped, and the same corpus with a loose cap finds all
    val docs = (0L until 30L).map(i => (i, "same boilerplate text repeated here often")).toDF("doc_id", "text")
    val cappedPairs = Dedup.simHashPairs(docs, "doc_id", maxBucket = 10)
    assert(cappedPairs.count() == 0)
    val loosePairs = Dedup.simHashPairs(docs, "doc_id", maxBucket = 1000)
    assert(loosePairs.count() == 30L * 29L / 2)
    val cappedMh = Dedup.minHashLshPairs(docs, "doc_id", maxBucket = 10)
    assert(cappedMh.count() == 0)
  }

  test("zero-norm vectors: cosine is 0.0 (never NaN) through every ANN path") {
    import graft.operators.IvfIndexStore
    val embs = Tables.load(spark, sf01, "embeddings")
      .select("vec_id", "embedding").where(col("vec_id") < 300)
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val zeros = Seq(900001L, 900002L).map(id => (id, Seq.fill(dim)(0.0f)))
      .toDF("vec_id", "embedding")
    val mixed = embs.unionByName(zeros)

    // the expression itself: zero × nonzero and zero × zero both 0.0
    val cosRows = zeros.as("a").crossJoin(mixed.limit(3).as("b"))
      .select(graft.functions.Functions.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[Double].collect()
    assert(cosRows.nonEmpty && cosRows.forall(_ == 0.0),
      s"zero-norm cosine must be exactly 0.0, got ${cosRows.toList}")

    // near-dup pairs: no NaN escapes, zero vectors pair with nothing
    val pairs = Dedup.embeddingNearDups(mixed, "vec_id", "embedding",
      threshold = 0.4, bands = 48, bitsPerBand = 4).persist()
    assert(pairs.where(isnan(col("cosine"))).count() == 0)
    assert(pairs.where(col("id_a") >= 900000L || col("id_b") >= 900000L).count() == 0,
      "a zero vector similar to nothing must not pair")
    pairs.unpersist()

    // persisted-index serving with zero vectors BOTH in the index and in
    // the query batch: every score finite, the zero query ranks real
    // neighbors at cosine 0.0 instead of NaN-poisoning the top-k gate
    val root = java.nio.file.Files.createTempDirectory("simzero_").toString
    val centroids = Similarity.trainCentroids(embs, "vec_id", "embedding", k = 4, iters = 1)
    IvfIndexStore.writeGeneration(spark, mixed, "vec_id", "embedding", centroids, root)
    val queries = embs.where(col("vec_id") < 2).unionByName(zeros.limit(1))
    val served = IvfIndexStore.topK(spark, queries, root, k = 3, nProbe = 2).persist()
    assert(served.where(isnan(col("cosine"))).count() == 0)
    assert(served.where(col("query_id") === 900001L).count() > 0,
      "the zero query must still rank (finite-scored) neighbors")
    assert(served.where(col("query_id") === 900001L && col("cosine") =!= 0.0).count() == 0)
    served.unpersist()

    // semantic dedup: zero-norm batch rows are dropped up front (they can
    // never self-match on replay — see dedupAppendBatch's scaladoc), real
    // rows still dedup; replay stays idempotent with zeros aboard
    val droot = java.nio.file.Files.createTempDirectory("simzero_dedup_").toString
    IvfIndexStore.writeGeneration(spark, embs, "vec_id", "embedding", centroids, droot)
    val batch = embs.where(col("vec_id") < 10) // all dups of indexed rows
      .select((col("vec_id") + 700000L).as("vec_id"), col("embedding"))
      .unionByName(zeros)
    val accepted = IvfIndexStore.dedupAppendBatch(spark, batch, "vec_id", "embedding",
      droot, threshold = 0.95)
    assert(accepted.where(col("vec_id").isin(900001L, 900002L)).count() == 0,
      "zero-norm rows must be dropped, not admitted")
    val replayed = IvfIndexStore.dedupAppendBatch(spark, batch, "vec_id", "embedding",
      droot, threshold = 0.95)
    assert(replayed.count() == 0, "replay with zero vectors aboard must stay idempotent")
    val gen = IvfIndexStore.currentGeneration(spark, droot).get
    assert(spark.read.parquet(IvfIndexStore.indexPath(droot, gen))
      .where(col("vec_id").isin(900001L, 900002L)).count() == 0,
      "zero-norm rows must never reach the index")
  }

  test("minHashNearDupsExact matches exact n-gram Jaccard ground truth on sf0.01 docs") {
    val docs = Tables.load(spark, sf01, "documents")
    val found = Dedup.minHashNearDupsExact(docs, "doc_id", threshold = 0.5, margin = 0.2)
    // ground truth: 25 planted near-dup pairs, all J >= 0.9 (checked vs DuckDB)
    assert(found.count() == 25)
    assert(found.where(col("jaccard") < 0.9).count() == 0)
  }

  test("semDeDup drops co-clustered duplicates, keeps cross-cluster twins (the published trade)") {
    // two far-apart cluster anchors; dups are exact copies of corpus rows
    val c0 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val c1 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    def mix(a: Double, b: Double, c: Double, d: Double) =
      Array(a.toFloat, b.toFloat, c.toFloat, d.toFloat)
    val rows = Seq(
      (0L, c0), (1L, c1),                       // the centroid-defining rows
      (10L, mix(0.9, 0.1, 0.0, 0.0)),           // near c0
      (11L, mix(0.9, 0.1, 0.0, 0.0)),           // exact dup of 10 -> dropped
      (12L, mix(0.1, 0.9, 0.0, 0.0)),           // near c1
      (13L, mix(0.0, 0.8, 0.1, 0.0)),           // near c1, not a dup of 12
      // near-identical PAIR that lands on OPPOSITE sides of the boundary:
      // both survive - SemDeDup's documented cross-cluster blind spot
      (20L, mix(0.71, 0.70, 0.0, 0.0)),
      (21L, mix(0.70, 0.71, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val kept = Similarity.semDeDup(rows, "vec_id", "embedding", cents,
      threshold = 0.995).select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(11L), "co-clustered exact dup must drop")
    assert(kept.contains(10L), "min-id representative survives")
    assert(Set(12L, 13L).subsetOf(kept), "non-dups survive")
    assert(Set(20L, 21L).subsetOf(kept),
      "boundary-split near-dups both survive (documented trade)")
    // deterministic under repartitioning
    val again = Similarity.semDeDup(rows.repartition(5), "vec_id", "embedding",
      cents, threshold = 0.995).select("vec_id").as[Long].collect().toSet
    assert(again == kept)
    // nProbe = 2: each doc joins its TWO nearest clusters' candidate
    // sets, so the boundary twins now meet and the max-id one drops —
    // the blind spot above is the tunable, not a law
    val kept2 = Similarity.semDeDup(rows, "vec_id", "embedding", cents,
      threshold = 0.995, nProbe = 2).select("vec_id").as[Long].collect().toSet
    assert(kept2.contains(20L) && !kept2.contains(21L),
      s"nProbe=2 must catch the boundary-split pair, kept: $kept2")
    // everything the nProbe=1 pass decided stays decided
    assert(!kept2.contains(11L) && Set(10L, 12L, 13L).subsetOf(kept2))
    // and it is replay-stable like the single-probe flavor
    val again2 = Similarity.semDeDup(rows.repartition(3), "vec_id", "embedding",
      cents, threshold = 0.995, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(again2 == kept2)
    intercept[IllegalArgumentException] {
      Similarity.semDeDup(rows, "vec_id", "embedding", Array.empty, 0.9)
    }
    intercept[IllegalArgumentException] { // nProbe beyond k is a config bug
      Similarity.semDeDup(rows, "vec_id", "embedding", cents, 0.9, nProbe = 3)
    }
  }
}
