package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale-constant measurement for the dedup path: runs MinHash-LSH over
  * the documents table at sf0.01, sf0.1 and a synthetic 10× sf0.1, and
  * records the numbers the plan-shape arguments in SCALE.md rest on —
  * candidate-pair volume, shuffle bytes, capped-bucket drops — against
  * corpus growth. A near-dup plan whose candidate count grows faster than
  * the corpus is N²-bound no matter how clean its per-stage shapes are;
  * this makes that constant VISIBLE instead of argued.
  *
  * The 10× corpus tags every token with a per-copy marker, so shingle
  * sets are disjoint across copies: within-copy near-dup structure is
  * preserved (each copy is the original corpus), cross-copy pairs are
  * impossible — the truth-pair count scales exactly 10× and any
  * super-linear candidate growth is the LSH's own background-collision
  * rate, which is what we are measuring.
  *
  * Prints one JSON line per scale point plus a final linearity verdict
  * (candidates-per-doc at 10× vs 1×; ≤ 2× tolerated — band-bucket
  * populations grow with corpus size, so a mild super-linearity from
  * fuller buckets is expected and capped by maxBucket).
  */
object ScaleBench {

  /** Counting local filesystem (`cfile://`): every metadata call
    * (listStatus / getFileStatus) and file open routed through it is
    * counted, so the `incmeta` section MEASURES per-batch driver
    * metadata cost (dir listings + file stats + footer-read opens)
    * instead of asserting it. Bench-only tooling — registered via
    * `fs.cfile.impl` on the session's Hadoop conf.
    */
  final class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
    override def getScheme: String = "cfile"
    override def getUri: java.net.URI = CountingLocalFs.FsUri
    override def listStatus(f: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] = {
      CountingLocalFs.lists.incrementAndGet(); super.listStatus(f)
    }
    override def getFileStatus(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus = {
      CountingLocalFs.stats.incrementAndGet(); super.getFileStatus(f)
    }
    override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
      CountingLocalFs.opens.incrementAndGet(); super.open(f, bufferSize)
    }
  }
  object CountingLocalFs {
    private val FsUri = java.net.URI.create("cfile:///")
    val lists = new AtomicLong(0L)
    val stats = new AtomicLong(0L)
    val opens = new AtomicLong(0L)
    def snap(): (Long, Long, Long) = (lists.get(), stats.get(), opens.get())
  }

  private final class ShuffleBytesListener extends SparkListener {
    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    /** Bytes read from input sources (parquet scans) — the number that
      * exposes whether a per-batch plan scans corpus-sized tables.
      */
    val inputBytes = new AtomicLong(0L)
    // per-TASK accumulation: stage-level `stageInfo.taskMetrics` proved
    // unreliable for input bytes (a 148 MB parquet scan reported 0.08 MB —
    // caught by the initsample section's full-scan control); task-end
    // metrics are the complete, documented channel
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  private def measure(spark: SparkSession, label: String, docs: DataFrame,
                      threshold: Double, maxBucket: Int): (Long, Long) = {
    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val nDocs = docs.count()
    val numHashes = 126
    val (nBands, rowsPerBand) = {
      val b = Dedup.lshBandingFor(numHashes, threshold)
      (b._1, b._2)
    }
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, numHashes).persist()
    val banded = sigs.select(col("id"),
      posexplode(graft.functions.VectorExpressions
        .sig_band_hashes(col("sig"), nBands, rowsPerBand)).as(Seq("band", "bucket")))
    val cappedBuckets = Dedup.oversizedBuckets(banded, Seq("band", "bucket"), maxBucket).count()
    // verified REUSES the persisted sigs and the counted candidate stage —
    // re-running minHashLshPairs(docs, …) here would re-shingle and re-join
    // from scratch and the listener would publish ~2× the real plan's
    // shuffle bytes/time as the measured constants
    val candDf = Dedup.minHashCandidatePairs(sigs, nBands, rowsPerBand, maxBucket).persist()
    val candidates = candDf.count()
    val verified = Dedup.estJaccardScores(candDf, sigs, sigs, "id_a", "id_b", numHashes)
      .where(col("est_jaccard") >= threshold)
      .count()
    candDf.unpersist()
    sigs.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    // the listener bus is async; give it a moment to drain before reading
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    val mb = listener.bytes.get() / 1024.0 / 1024.0
    println(f"""{"scale_point":"$label","n_docs":$nDocs,"bands":$nBands,"rows_per_band":$rowsPerBand,""" +
      f""""candidate_pairs":$candidates,"verified_pairs":$verified,"capped_buckets":$cappedBuckets,""" +
      f""""shuffle_mb":$mb%.1f,"shuffle_records":${listener.records.get()},"sec":$secs%.1f}""")
    (nDocs, candidates)
  }

  /** The 10× corpus: copy c SUFFIXES every token with `_c<i>` — a
    * bijective per-copy token rename, so within-copy Jaccard structure
    * (true pairs AND background similarity) is preserved exactly while
    * shingle sets are disjoint across copies. (Inserting the marker as
    * its own token instead creates `(marker, X, marker)` shingles keyed
    * by a single original token — background Jaccard explodes and the
    * measurement stops being about the LSH.)
    */
  private def scaled(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      docs.select(
        (col("doc_id") * copies + i).as("doc_id"),
        concat(regexp_replace(col("text"), " ", s"_c$i "), lit(s"_c$i")).as("text"))
    }.reduce(_ unionByName _)

  /** Increment-dedup scale point — THE daily-ingest question: with a
    * FIXED-size increment, does deduping against a growing corpus
    * signature table get more expensive? Measures the asymmetric band
    * join ([[Dedup.minHashCandidatePairsAgainst]]) of one FIXED increment
    * (750 docs: the sf0.01 slice + 250 planted corpus dups) against 1×
    * and 10× corpus signatures. Candidates per
    * increment doc should stay ~flat: band-bucket keyspace grows with the
    * corpus (MinHash buckets are full band hashes), and corpus-side
    * bucket caps bound any hot bucket — if this grows super-linearly the
    * daily-ingest story is N·corpus-bound, not increment-bound.
    */
  private def measureIncrement(spark: SparkSession, label: String,
                               increment: DataFrame, corpus: DataFrame,
                               threshold: Double, maxBucket: Int,
                               preBanded: Boolean = false,
                               sigPartitions: Int = 0,
                               pruneSigs: Boolean = true): (Long, Long, Double) = {
    val numHashes = 126
    val (nBands, rowsPerBand) = Dedup.lshBandingFor(numHashes, threshold)
    val corpusSigs = Dedup.minHashSignatures(corpus, "doc_id", "text", 3, numHashes)
      .persist()
    val nCorpus = corpusSigs.count() // materialize BEFORE timing the increment
    // the partitioned flavor reads the sig table from DISK (pruning is a
    // file-level property) — written once ahead of the batch, like the
    // production serving table it models
    val sigPathOpt = if (sigPartitions > 0) {
      val p = graft.sources.BucketedTables.scratchDir("scale_sigpt_").toString + "/sigs"
      Dedup.writeSignatures(corpusSigs, p, sigPartitions)
      Some(p)
    } else None
    // the banded flavor: the (band, bucket, id) table exists AHEAD of the
    // batch (that is its point) — also outside the timed window
    val bandedOpt = if (preBanded) {
      // the serving shape: pre-CAPPED banded table, so the batch needs
      // neither the corpus banding nor the corpus-wide cap aggregate
      val b = Dedup.bandedTableCapped(corpusSigs, nBands, rowsPerBand, maxBucket)
        .persist()
      b.count(); Some(b)
    } else None
    // the listener window covers ONLY the per-batch work: corpus signing (and
    // for the pre-banded point, the ahead-of-time banding) is setup, and
    // counting its shuffles would mask exactly the per-batch difference
    // this point exists to show
    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val newSigs = Dedup.minHashSignatures(increment, "doc_id", "text", 3, numHashes)
      .persist()
    val nInc = newSigs.count()
    val candDf = (bandedOpt match {
      case Some(b) => Dedup.minHashCandidatePairsAgainstBanded(
        newSigs, b, nBands, rowsPerBand, maxBucket,
        preCapped = true, broadcastIncrement = true)
      case None => Dedup.minHashCandidatePairsAgainst(
        newSigs, corpusSigs, nBands, rowsPerBand, maxBucket)
    }).persist()
    val candidates = candDf.count()
    // the verify-stage signature fetch — the term under test: the flat
    // flavor joins the whole corpus sig table, the partitioned flavor
    // prunes to the candidates' hash partitions (bytes read should track
    // the CANDIDATE count, not n_corpus)
    val verifySigs = sigPathOpt match {
      case Some(p) if pruneSigs => Dedup.prunedCorpusSigs(spark, p,
        candDf.select("corpus_id"), sigPartitions)
      // full-scan-from-disk control point: same table, same layout, no
      // pruning — what the pruned flavor's input_mb is compared against
      case Some(p) => spark.read.parquet(p).select(col("id"), col("sig"))
      case None => corpusSigs
    }
    // verify-stage-only window: candDf/newSigs are already cached, so the
    // bytes in THIS window are dominated by the signature fetch — the
    // term the pruned layout exists to bound (the outer window's input
    // also counts the cached banded-table scan of the candidate join,
    // which grows with the corpus by design and would mask the fetch)
    val verifyListener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(verifyListener)
    val verified = Dedup.estJaccardScores(candDf, newSigs, verifySigs,
        "new_id", "corpus_id", numHashes)
      .where(col("est_jaccard") >= threshold)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    candDf.unpersist(); newSigs.unpersist(); corpusSigs.unpersist()
    bandedOpt.foreach(_.unpersist())
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    spark.sparkContext.removeSparkListener(verifyListener)
    val mb = listener.bytes.get() / 1024.0 / 1024.0
    val inMb = listener.inputBytes.get() / 1024.0 / 1024.0
    val verifyInMb = verifyListener.inputBytes.get() / 1024.0 / 1024.0
    println(f"""{"scale_point":"$label","n_increment":$nInc,"n_corpus":$nCorpus,""" +
      f""""candidate_pairs":$candidates,"verified_pairs":$verified,""" +
      f""""shuffle_mb":$mb%.1f,"shuffle_records":${listener.records.get()},""" +
      f""""input_mb":$inMb%.2f,"verify_input_mb":$verifyInMb%.2f,"sec":$secs%.1f}""")
    (nInc, candidates, verifyInMb)
  }

  /** Embedding-LSH scale point: candidate volume for hyperplane banding at
    * the production operating point (threshold ~0.9). Unlike MinHash
    * banding (bucket = full band hash, cardinality grows with the corpus),
    * hyperplane buckets are a FIXED 2^bits keyspace — with fixed bits,
    * candidates grow ~N²/2^bits per band, so bits must grow with
    * log2(corpus) (bands re-sized to hold recall). The harness measures
    * both the naive fixed-bits 10× point (expected super-linear) and the
    * tuned bits+log2(copies) point (expected flat), making the documented
    * tuning rule a measured fact.
    */
  private def measureEmb(spark: SparkSession, label: String, embs: DataFrame,
                         bands: Int, bitsPerBand: Int, maxBucket: Int): (Long, Long) = {
    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val base = embs.select(col("vec_id").as("id"), col("embedding").as("v")).persist()
    val nDocs = base.count()
    val candidates = Dedup.embeddingCandidatePairs(base, bands, bitsPerBand, maxBucket).count()
    base.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    val mb = listener.bytes.get() / 1024.0 / 1024.0
    println(f"""{"scale_point":"$label","n_docs":$nDocs,"bands":$bands,"bits_per_band":$bitsPerBand,""" +
      f""""candidate_pairs":$candidates,"cand_per_doc":${candidates.toDouble / nDocs}%.2f,""" +
      f""""shuffle_mb":$mb%.1f,"sec":$secs%.1f}""")
    (nDocs, candidates)
  }

  /** 10× embeddings via per-copy deterministic sign flips: within-copy
    * cosines are EXACTLY preserved (both vectors flip the same dims), so
    * truth pairs scale exactly 10×; cross-copy cosines become random-sign
    * sums (|cos| ~ 1/√dim ≈ 0.125) — never near-dups at the 0.9 operating
    * point. Any super-linear candidate growth is the LSH's own bucket
    * crowding, the constant under test.
    */
  private def scaledEmb(embs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      embs.select(
        (col("vec_id") * copies + i).as("vec_id"),
        transform(col("embedding"),
          (x, d) => when(pmod(xxhash64(lit(i), d), lit(2L)) === 0L, x).otherwise(-x))
          .as("embedding"))
    }.reduce(_ unionByName _)

  /** Span-removal scale point: [[graft.operators.TextAnalysis.dropSharedSpans]]
    * is linear by construction (gram-keyed aggregates, k× covered-position
    * fan-out bounded by total gram occurrences) — this measures that
    * constant. On the token-renamed 10× corpus, cross-copy grams are
    * disjoint, so shared-gram structure (and covered volume) scales
    * exactly with the corpus; super-linear shuffle records would mean the
    * plan shape regressed.
    */
  private def measureSpans(spark: SparkSession, label: String, docs: DataFrame,
                           k: Int, witness: Boolean = false): (Long, Long) = {
    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val nDocs = docs.count()
    val out = graft.operators.TextAnalysis.dropSharedSpans(docs, "doc_id", k)
      .agg(sum(col("n_tokens_kept")).as("kept"),
        count(when(col("kept_text") === "", 1)).as("emptied"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    val mb = listener.bytes.get() / 1024.0 / 1024.0
    val records = listener.records.get()
    // derivation witness (cheap point only): the corpus must be shingled
    // ONCE — the pinned gram exchange is reused by both plan arms, and a
    // regression here doubles the operator's most expensive scan. Runs
    // the operator's own plan (the aggregate above collapses it into a
    // different one) and counts shingling Generate nodes in the final
    // adaptive plan.
    val gens = if (witness) {
      val spans = graft.operators.TextAnalysis.dropSharedSpans(docs, "doc_id", k)
      // collect() (NOT foreach: that detours via .rdd with a fresh
      // QueryExecution, leaving THIS plan un-finalized and the witness
      // reading the pre-AQE tree where reuse has not been applied yet)
      spans.collect()
      graft.sources.BucketedTables.PlanWitness.collectNodes(spans) {
        case g: org.apache.spark.sql.execution.GenerateExec
          if g.boundGenerator.toString.toLowerCase(java.util.Locale.ROOT).contains("shingle") => g
      }.size
    } else -1
    val witnessField = if (witness) f""","shingle_derivations":$gens""" else ""
    println(f"""{"scale_point":"$label","n_docs":$nDocs,"k":$k,"kept_tokens":${out.getLong(0)},""" +
      f""""emptied_docs":${out.getLong(1)},"shuffle_mb":$mb%.1f,"shuffle_records":$records$witnessField,"sec":$secs%.1f}""")
    (nDocs, records)
  }

  def main(args: Array[String]): Unit = {
    // %f formatting must be locale-independent or the JSON line breaks
    // on decimal-comma locales
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val threshold = 0.5
    val maxBucket = 1000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // section selector: no args = all; any of "minhash", "emb", "spans",
    // "increment".
    // Unknown names fail fast — a typo'd section must not produce a
    // successful-looking run that measured nothing.
    val known = Set("minhash", "emb", "spans", "increment", "recap", "ivfappend",
      "ivfdedup", "knntopk", "relayout", "initsample", "gzip", "bpe", "avi",
      "preclean", "bloom", "shuffle", "classifier", "crawl", "dsir", "robots",
      "kernels", "keepbest", "incpairs", "incmeta")
    val sections = if (args.isEmpty) known else args.toSet
    require(sections.subsetOf(known),
      s"unknown ScaleBench section(s) ${(sections -- known).mkString(", ")} — " +
        s"valid: ${known.mkString(", ")}")
    val small = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")

    if (sections("minhash")) {
      measure(spark, "sf0.01", small, threshold, maxBucket)
      val (n1, c1) = measure(spark, "sf0.1", base, threshold, maxBucket)
      val (n10, c10) = measure(spark, "sf0.1 x10", scaled(base, 10), threshold, maxBucket)
      val perDoc1 = c1.toDouble / n1
      val perDoc10 = c10.toDouble / n10
      val ratio = perDoc10 / perDoc1
      println(f"""{"linearity":{"cand_per_doc_1x":$perDoc1%.3f,"cand_per_doc_10x":$perDoc10%.3f,""" +
        f""""ratio":$ratio%.2f,"linear_ok":${ratio <= 2.0}}}""")
    }

    if (sections("emb")) {
      // ---- embedding-LSH points (production threshold ~0.9 regime) ----
      val embBase = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", "embedding")
      val emb10 = scaledEmb(embBase, 10)
      val (en1, ec1) = measureEmb(spark, "emb sf0.1 16x12", embBase, bands = 16, bitsPerBand = 12, maxBucket = 100000)
      // naive: same layout at 10× — expected super-linear (fixed 2^12 buckets)
      val (_, ecNaive) = measureEmb(spark, "emb x10 16x12 naive", emb10, bands = 16, bitsPerBand = 12, maxBucket = 100000)
      // tuned: bits += ~log2(10), bands re-sized to hold the miss bound at 0.9
      // ((1-p^16)^31 ≈ (1-p^12)^16 for p = 1 − acos(0.9)/π)
      val (en10, ecTuned) = measureEmb(spark, "emb x10 31x16 tuned", emb10, bands = 31, bitsPerBand = 16, maxBucket = 100000)
      val embPerDoc1 = ec1.toDouble / en1
      val embNaivePerDoc = ecNaive.toDouble / en10
      val embTunedPerDoc = ecTuned.toDouble / en10
      println(f"""{"emb_linearity":{"cand_per_doc_1x":$embPerDoc1%.2f,"naive_10x":$embNaivePerDoc%.2f,""" +
        f""""tuned_10x":$embTunedPerDoc%.2f,"tuned_ratio":${embTunedPerDoc / embPerDoc1}%.2f,""" +
        f""""tuned_linear_ok":${embTunedPerDoc / embPerDoc1 <= 2.0}}}""")
    }

    if (sections("increment")) {
      // ---- increment-dedup points: fixed 750-doc increment vs a 1× and
      //      a 10× corpus signature table. The increment is the "_c0"-
      //      renamed sf0.01 slice so its true-match structure against
      //      copy 0 is IDENTICAL at both scales; copies 1-9 are
      //      shingle-disjoint, so any candidate growth is pure corpus-
      //      size background — the constant that decides whether daily
      //      ingest is increment-bound or corpus-bound. ----
      // 250 docs COPIED from the corpus (same _c0 rename as corpus copy 0
      // ⇒ exact dups of corpus members at every scale) + the 500-doc
      // sf0.01 slice (novel): verified pairs must stay ~constant while
      // candidates absorb only background
      val planted = scaled(base.orderBy("doc_id").limit(250), 1)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val inc = scaled(small, 1).unionByName(planted)
      val (in1, ic1, _) = measureIncrement(spark, "inc vs sf0.1",
        inc, scaled(base, 1), threshold, maxBucket)
      val (in10, ic10, _) = measureIncrement(spark, "inc vs sf0.1 x10",
        inc, scaled(base, 10), threshold, maxBucket)
      // the materialized-banded-table flavor at 10×: identical pairs, and
      // the per-batch shuffle drops to increment scale (the corpus-side
      // banding — the one corpus-linear term — happened ahead of time)
      measureIncrement(spark, "inc vs sf0.1 x10 pre-banded",
        inc, scaled(base, 10), threshold, maxBucket, preBanded = true)
      val perDoc1 = ic1.toDouble / in1
      val perDoc10 = ic10.toDouble / in10
      println(f"""{"increment_linearity":{"cand_per_doc_1x":$perDoc1%.2f,""" +
        f""""cand_per_doc_10x":$perDoc10%.2f,"ratio":${perDoc10 / perDoc1}%.2f,""" +
        f""""flat_ok":${perDoc10 / perDoc1 <= 2.0}}}""")

      // ---- sig-fetch pruning points: the verify stage's signature fetch
      //      was the LAST per-batch term linear in the corpus (the
      //      candidate join above is increment-bound once pre-banded, but
      //      estJaccardScores still scanned the whole (id, sig) table
      //      each batch). With the hash-partitioned layout the fetch
      //      prunes to the candidates' sig_pt partitions, so per-batch
      //      bytes READ must stay ~flat across a 10× corpus while the
      //      full-scan control grows ~10×. Candidate/verified pairs are
      //      identical by construction (pruning only removes rows the
      //      inner join would drop). P follows the production sizing rule
      //      (writeSignatures scaladoc): large vs the per-batch distinct
      //      candidate count (~300 here) and GROWN with the corpus so the
      //      per-partition byte size stays constant — P=512 at 1×,
      //      P=5120 at 10×. ----
      val (_, _, full1) = measureIncrement(spark, "inc vs sf0.1 pre-banded disk-sigs full",
        inc, scaled(base, 1), threshold, maxBucket, preBanded = true,
        sigPartitions = 512, pruneSigs = false)
      val (_, _, full10) = measureIncrement(spark, "inc vs sf0.1 x10 pre-banded disk-sigs full",
        inc, scaled(base, 10), threshold, maxBucket, preBanded = true,
        sigPartitions = 5120, pruneSigs = false)
      val (_, _, pr1) = measureIncrement(spark, "inc vs sf0.1 pre-banded pruned-sigs",
        inc, scaled(base, 1), threshold, maxBucket, preBanded = true,
        sigPartitions = 512)
      val (_, _, pr10) = measureIncrement(spark, "inc vs sf0.1 x10 pre-banded pruned-sigs",
        inc, scaled(base, 10), threshold, maxBucket, preBanded = true,
        sigPartitions = 5120)
      println(f"""{"sig_fetch_pruning":{"verify_mb_full_1x":$full1%.2f,""" +
        f""""verify_mb_full_10x":$full10%.2f,"verify_mb_pruned_1x":$pr1%.2f,""" +
        f""""verify_mb_pruned_10x":$pr10%.2f,""" +
        f""""pruned_vs_full_10x":${pr10 / math.max(full10, 0.01)}%.3f,""" +
        f""""pruned_flat_ok":${pr10 <= math.max(2.0 * pr1, 1.0)}}}""")
    }

    if (sections("recap")) {
      // ---- banded-table maintenance point: the serving table's capped
      //      invariant drifts as survivor appends (and crash-window
      //      replays — duplicate rows) land in it; `recapBandedTable`
      //      must return the max bucket to ≤ cap in one rewrite. The
      //      drift fixture is the sf0.1 corpus seeded CAPPED, then its
      //      own bands appended twice more: once verbatim (pure replay
      //      duplicates, erased by the dedup) and once id-shifted
      //      (distinct ids — genuine over-cap growth, dropped by the
      //      re-cap). ----
      val numHashes = 126
      val (nBands, rowsPerBand) = Dedup.lshBandingFor(numHashes, threshold)
      val dir = graft.sources.BucketedTables.scratchDir("scale_recap_").toString
      val bandedPath = s"$dir/bands"
      val corpusSigs = Dedup.minHashSignatures(scaled(base, 1), "doc_id", "text", 3, numHashes)
        .persist()
      corpusSigs.count()
      Dedup.bandedTableCapped(corpusSigs, nBands, rowsPerBand, maxBucket)
        .write.parquet(bandedPath)
      val bands = Dedup.bandedTable(corpusSigs, nBands, rowsPerBand)
      bands.write.mode("append").parquet(bandedPath) // replay duplicates
      bands.select((col("id") + 10000000L).as("id"), col("band"), col("bucket"))
        .write.mode("append").parquet(bandedPath) // distinct-id drift
      corpusSigs.unpersist()
      def maxBucketSize(): Long = spark.read.parquet(bandedPath)
        .groupBy("band", "bucket").count()
        .agg(max("count")).collect()(0).getLong(0)
      val driftedMax = maxBucketSize()
      val rowsBefore = spark.read.parquet(bandedPath).count()
      val t0 = System.nanoTime()
      val done = Dedup.recapBandedTable(spark, bandedPath, maxBucket)
      val secs = (System.nanoTime() - t0) / 1e9
      val cappedMax = maxBucketSize()
      val rowsAfter = spark.read.parquet(bandedPath).count()
      println(f"""{"scale_point":"recap sf0.1","rows_before":$rowsBefore,"rows_after":$rowsAfter,""" +
        f""""max_bucket_before":$driftedMax,"max_bucket_after":$cappedMax,""" +
        f""""cap":$maxBucket,"sec":$secs%.1f,"recap_ok":${done && cappedMax <= maxBucket}}""")
    }

    if (sections("ivfappend")) {
      // ---- IVF-store append point — the ANN daily-ingest question: with
      //      a FIXED increment, does appending into a growing index get
      //      more expensive? The append path reads NOTHING of the
      //      existing index (centroid assignment is a literal-array
      //      codegen map; the write is a partitioned append), so the
      //      measured cost must be flat in index size and the shuffle
      //      record count ~0 (map-only). ----
      val embBase = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", "embedding")
      val increment = embBase.where(col("vec_id") < 500)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
        .persist()
      val nInc = increment.count()
      def point(label: String, corpus: DataFrame): (Long, Double) = {
        val root = graft.sources.BucketedTables.scratchDir("scale_ivfappend_").toString
        val centroids = graft.operators.Similarity.trainCentroids(
          corpus, "vec_id", "embedding", k = 16, iters = 2)
        graft.operators.IvfIndexStore.writeGeneration(
          spark, corpus, "vec_id", "embedding", centroids, root) // setup, untimed
        val nCorpus = corpus.count()
        val listener = new ShuffleBytesListener
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        graft.operators.IvfIndexStore.append(spark, increment, "vec_id", "embedding", root)
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(listener)
        println(f"""{"scale_point":"$label","n_increment":$nInc,"n_corpus":$nCorpus,""" +
          f""""shuffle_records":${listener.records.get()},"sec":$secs%.1f}""")
        (listener.records.get(), secs)
      }
      val (rec1, sec1) = point("ivf append vs sf0.1", embBase)
      val (rec10, sec10) = point("ivf append vs sf0.1 x10", scaledEmb(embBase, 10))
      increment.unpersist()
      println(f"""{"ivf_append_linearity":{"sec_1x":$sec1%.1f,"sec_10x":$sec10%.1f,""" +
        f""""ratio":${sec10 / sec1}%.2f,"map_only_ok":${rec1 == 0 && rec10 == 0},""" +
        f""""flat_ok":${sec10 / sec1 <= 2.0}}}""")
    }

    if (sections("ivfdedup")) {
      // ---- Semantic-dedup batch cost vs index size — the HONEST scale
      //      shape: unlike the pre-banded text flavor (increment-bound),
      //      the IVF probe reads the PROBED PARTITIONS, which grow
      //      linearly with the corpus (the standard IVF trade: ~nProbe/k
      //      of the corpus per batch, hard-bounded by maxBucket per
      //      cluster). Measured so the growth is a number, not a hope:
      //      the per-batch cost ratio at 10x the index should track the
      //      probed-slice growth, NOT the full corpus. ----
      val embBase = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", "embedding")
      val batch = embBase.where(col("vec_id") < 500)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
        .persist()
      val nBatch = batch.count()
      def point(label: String, corpus: DataFrame): Double = {
        val root = graft.sources.BucketedTables.scratchDir("scale_ivfdedup_").toString
        val centroids = graft.operators.Similarity.trainCentroids(
          corpus, "vec_id", "embedding", k = 16, iters = 1)
        graft.operators.IvfIndexStore.writeGeneration(
          spark, corpus, "vec_id", "embedding", centroids, root) // setup, untimed
        val nCorpus = corpus.count()
        val listener = new ShuffleBytesListener
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val accepted = graft.operators.IvfIndexStore.dedupAppendBatch(
          spark, batch, "vec_id", "embedding", root, threshold = 0.95)
        val nAccepted = accepted.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(listener)
        val mb = listener.bytes.get() / 1024.0 / 1024.0
        println(f"""{"scale_point":"$label","n_batch":$nBatch,"n_corpus":$nCorpus,""" +
          f""""n_accepted":$nAccepted,"shuffle_mb":$mb%.1f,""" +
          f""""shuffle_records":${listener.records.get()},"sec":$secs%.1f}""")
        secs
      }
      val s1 = point("ivf dedup-batch vs sf0.1", embBase)
      val s10 = point("ivf dedup-batch vs sf0.1 x10", scaledEmb(embBase, 10))
      batch.unpersist()
      // the probed slice is ~nProbe/k of the corpus: 10x corpus -> 10x
      // probed rows, but the batch-side work (signatures, components,
      // window) is fixed — wall time should grow FAR slower than 10x
      println(f"""{"ivf_dedup_linearity":{"sec_1x":$s1%.1f,"sec_10x":$s10%.1f,""" +
        f""""ratio":${s10 / s1}%.2f,"sublinear_ok":${s10 / s1 <= 5.0}}}""")
    }

    if (sections("relayout")) {
      // ---- grow-P re-layout point: WHY the maintenance step exists, as a
      //      number. A 10× corpus signature table laid out at P=512 (right
      //      for 1×, undersized at 10×: per-partition bytes grew ~10×, so
      //      each pruned candidate partition costs ~10× to read) is grown
      //      to P=5120 by Dedup.relayoutSignatures; the SAME batch's
      //      pruned verify fetch is measured before and after. Expected:
      //      verify bytes drop toward the 1×-corpus constant, verified
      //      pairs identical (the re-layout is lossless and the candidate
      //      set never touched the sig table). ----
      val numHashes = 126
      val (nBands, rowsPerBand) = Dedup.lshBandingFor(numHashes, threshold)
      val corpusSigs = Dedup.minHashSignatures(scaled(base, 10), "doc_id", "text", 3, numHashes)
        .persist()
      val nCorpus = corpusSigs.count()
      val sigPath = graft.sources.BucketedTables.scratchDir("scale_relayout_").toString + "/sigs"
      Dedup.writeSignatures(corpusSigs, sigPath, 512)
      graft.operators.DedupLayout.write(spark, sigPath,
        graft.operators.DedupLayout.Layout(3, numHashes, nBands, rowsPerBand,
          threshold, maxBucket, 512))
      val bandedDf = Dedup.bandedTableCapped(corpusSigs, nBands, rowsPerBand, maxBucket)
        .persist()
      bandedDf.count()
      corpusSigs.unpersist()
      val planted = scaled(base.orderBy("doc_id").limit(250), 1)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val inc = scaled(small, 1).unionByName(planted)
      val newSigs = Dedup.minHashSignatures(inc, "doc_id", "text", 3, numHashes).persist()
      newSigs.count()
      val cands = Dedup.minHashCandidatePairsAgainstBanded(
          newSigs, bandedDf, nBands, rowsPerBand, maxBucket,
          preCapped = true, broadcastIncrement = true)
        .persist()
      val nCands = cands.count()
      // the measured quantity is the ON-DISK BYTES of the partitions the
      // candidate set prunes to — the exact I/O a cluster reader issues
      // (file-level partition pruning reads those files and nothing else;
      // FS-statistics counters are footer-dominated locally and blind to
      // this, see the initsample note)
      def verifyPoint(label: String, p: Int): (Long, Double) = {
        val verified = Dedup.estJaccardScores(cands, newSigs,
            Dedup.prunedCorpusSigs(spark, sigPath, cands.select("corpus_id"), p),
            "new_id", "corpus_id", numHashes)
          .where(col("est_jaccard") >= threshold).count()
        val pts = cands.select(Dedup.sigPartition(col("corpus_id"), p).as("pt"))
          .distinct().collect().map(_.getInt(0))
        val fs = new org.apache.hadoop.fs.Path(sigPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val prunedBytes = pts.map { pt =>
          val d = new org.apache.hadoop.fs.Path(s"$sigPath/${Dedup.SigPartitionCol}=$pt")
          if (fs.exists(d)) fs.getContentSummary(d).getLength else 0L
        }.sum
        val mb = prunedBytes / 1024.0 / 1024.0
        println(f"""{"scale_point":"$label","n_corpus":$nCorpus,"candidate_pairs":$nCands,""" +
          f""""verified_pairs":$verified,"pruned_partitions":${pts.length},""" +
          f""""pruned_table_mb":$mb%.2f}""")
        (verified, mb)
      }
      val (vBefore, mbBefore) = verifyPoint("relayout verify P=512 (undersized at 10x)", 512)
      val t0 = System.nanoTime()
      require(Dedup.relayoutSignatures(spark, sigPath, 5120), "re-layout must run")
      val relayoutSecs = (System.nanoTime() - t0) / 1e9
      val (vAfter, mbAfter) = verifyPoint("relayout verify P=5120 (grown)", 5120)
      cands.unpersist(); newSigs.unpersist(); bandedDf.unpersist()
      println(f"""{"relayout_grow_p":{"pruned_mb_before":$mbBefore%.2f,""" +
        f""""pruned_mb_after":$mbAfter%.2f,"cut_x":${mbBefore / math.max(mbAfter, 0.01)}%.1f,""" +
        f""""relayout_sec":$relayoutSecs%.1f,"lossless_ok":${vBefore == vAfter}}}""")
    }

    if (sections("initsample")) {
      // ---- centroid-init seed-scan point: the old init materialized the
      //      corpus' VECTOR payloads through a TakeOrderedAndProject to
      //      keep k; the new one orders on an id-only projection (+ hash
      //      prefilter) and fetches k vectors via pushable isin. On a
      //      parquet corpus whose bytes are ~all embedding (148 MB of
      //      incompressible doubles), the wall-clock cost of the seed
      //      choice must drop hard (the id column is ~2% of the bytes)
      //      and the seeds must be IDENTICAL. Wall time is the metric —
      //      FS-statistics byte counters proved footer-dominated for
      //      local parquet scans (the full-scan control below reads
      //      148 MB and reports 0.08), so bytes would measure metadata,
      //      not data. ----
      // ~2 GB: big enough that scan bytes dominate the fixed ~0.5 s of
      // extra job launches the two-pass init pays (at 300 MB the overhead
      // wins and the point measures job latency, not the scan)
      val dim = 256
      val n = 1000000L
      val vecPath = graft.sources.BucketedTables.scratchDir("scale_initsample_").toString + "/vecs"
      // INCOMPRESSIBLE payloads (hash-valued doubles): a patterned fixture
      // compresses so hard the vector column stops dominating the table's
      // bytes and the measurement measures parquet compression instead
      spark.range(n)
        .select(col("id").as("vec_id"),
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.sequence(lit(0), lit(dim - 1)),
            i => xxhash64(col("id") * lit(dim) + i).cast("double")).as("embedding"))
        .write.parquet(vecPath)
      val corpus = spark.read.parquet(vecPath)
      val tableMb = {
        val p = new org.apache.hadoop.fs.Path(vecPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength / 1024.0 / 1024.0
      }
      println(f"""{"scale_point":"initsample corpus","n":$n,"dim":$dim,"table_mb":$tableMb%.1f}""")
      val k = 8
      val hash = xxhash64(col("vec_id").cast("string"))
      def measureInit(label: String)(run: => Array[Array[Double]]): (Seq[Seq[Double]], Double) = {
        val t0 = System.nanoTime()
        val seeds = run
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"scale_point":"$label","n_corpus":$n,"k":$k,"sec":$secs%.2f}""")
        (seeds.map(_.toSeq).toSeq, secs)
      }
      def legacyInit() = corpus.orderBy(hash, col("vec_id")).limit(k)
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      def newInit() =
        graft.operators.Similarity.trainCentroids(corpus, "vec_id", "embedding", k, iters = 0)
      // warm both paths (JIT + page cache) so the timed gap is plan shape,
      // not first-touch costs — same discipline as the knntopk section
      legacyInit(); newInit()
      val (legacySeeds, legacySec) = measureInit("init legacy full-vector TakeOrdered")(legacyInit())
      val (newSeeds, newSec) = measureInit("init id-only + hash prefilter")(newInit())
      println(f"""{"init_seed_scan":{"legacy_sec":$legacySec%.2f,"new_sec":$newSec%.2f,""" +
        f""""cut_x":${legacySec / math.max(newSec, 0.001)}%.1f,""" +
        f""""seeds_identical":${legacySeeds == newSeeds}}}""")
    }

    if (sections("spans")) {
      // ---- span-removal points (linear-by-construction check); the
      //      sf0.01 point also witnesses single-derivation shingling ----
      measureSpans(spark, "spans sf0.01", small, k = 8, witness = true)
      val (sn1, sr1) = measureSpans(spark, "spans sf0.1", base, k = 8)
      val (sn10, sr10) = measureSpans(spark, "spans sf0.1 x10", scaled(base, 10), k = 8)
      val spansPerDoc1 = sr1.toDouble / sn1
      val spansPerDoc10 = sr10.toDouble / sn10
      println(f"""{"spans_linearity":{"records_per_doc_1x":$spansPerDoc1%.1f,""" +
        f""""records_per_doc_10x":$spansPerDoc10%.1f,"ratio":${spansPerDoc10 / spansPerDoc1}%.2f,""" +
        f""""linear_ok":${spansPerDoc10 / spansPerDoc1 <= 2.0}}}""")
    }
    if (sections("knntopk")) {
      // ---- brute-force ANN ranking: row_number window vs the bounded
      //      TopKAggregate (identical output, spec-asserted). Spark 4's
      //      InferWindowGroupLimit already bounds the window form's
      //      shuffle records, so the measured difference is (a) records
      //      through the ranking exchange (k rows vs ONE array row per
      //      partition×query) and (b) wall time — WindowGroupLimit sorts
      //      every scored row within each partition before limiting,
      //      the aggregate's O(k) gate never sorts the scored stream.
      //      The wall-time gap is the corpus-sized local sort. ----
      val embs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", "embedding").repartition(cpus.toInt).persist()
      val nCorpus = embs.count()
      val queries = embs.where(col("vec_id") < 100)
      val k = 5
      def rankedWindow(): DataFrame = {
        val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
        c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
          .withColumn("cosine", graft.functions.Functions.cosine(col("qv"), col("cv")))
          .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
          .select("query_id", "rank", "neighbor_id", "cosine")
      }
      def runPoint(label: String, df: => DataFrame): Long = {
        val listener = new ShuffleBytesListener
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(listener)
        val mb = listener.bytes.get() / 1024.0 / 1024.0
        println(f"""{"knn_topk":"$label","n_corpus":$nCorpus,"result_rows":$n,""" +
          f""""shuffle_mb":$mb%.1f,"shuffle_records":${listener.records.get()},"sec":$secs%.1f}""")
        listener.records.get()
      }
      // warm BOTH forms before timing (JIT + page cache): the previous
      // window-first ordering handed the aggregate a warmed JVM and
      // biased the reported wall-time gap toward it
      rankedWindow().count()
      graft.operators.Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", k).count()
      val recWindow = runPoint("window", rankedWindow())
      val recAgg = runPoint("topk_agg",
        graft.operators.Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", k))
      embs.unpersist()
      println(f"""{"knn_topk_shuffle_cut":{"window_records":$recWindow,"agg_records":$recAgg,""" +
        f""""cut_x":${recWindow.toDouble / math.max(recAgg, 1L)}%.1f}}""")
    }

    if (sections("keepbest")) {
      // ---- keep-best-per-component on a FLOOD component: one group with
      //      10^6 members (the boilerplate/template-flood shape real
      //      crawls produce) + 10^5 singletons. The retired row_number()
      //      window form vs keepBestPerGroupPlan's partial-aggregated
      //      min_by. Spark 4 partially rescues the rank-1 window via
      //      InferWindowGroupLimit (map-side top-1 per key), so the
      //      honest comparison reports BOTH wall time and shuffled
      //      records — the aggregate must be no slower and shuffle no
      //      more; without the inference (any non-rank predicate, any
      //      engine without the rule) the window degrades to a
      //      single-task million-row sort. ----
      val flood = 1000000L
      val singles = 100000L
      val docs = spark.range(flood + singles).select(col("id").as("doc_id"),
        concat(lit("document body "), col("id")).as("text"),
        (col("id") % 997L).cast("double").as("score"))
      // caller-owned labels, precomputed so the measurement isolates the
      // keep-one stage (not the component loop): ids < flood share
      // component 0, the rest are singletons
      val comps = spark.range(flood + singles).select(col("id"),
        when(col("id") < flood, lit(0L)).otherwise(col("id")).as("component"))
        .localCheckpoint(true)
      def windowForm(): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_comp")).orderBy(col("score").desc, col("doc_id"))
        docs.join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("_comp", coalesce(col("component"), col("doc_id")))
          .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
          .drop("_rn", "_comp", "component")
      }
      def aggForm(): DataFrame =
        graft.operators.Dedup.keepBestPerGroupPlan(docs, "doc_id", comps, col("score"))
      def runKeep(label: String, df: => DataFrame): (Double, Long) = {
        val listener = new ShuffleBytesListener
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(listener)
        require(n == singles + 1, s"keepbest $label kept $n groups, expected ${singles + 1}")
        println(f"""{"keep_best":"$label","groups":${singles + 1},"rows_in":${flood + singles},""" +
          f""""shuffle_records":${listener.records.get()},"sec":$secs%.2f}""")
        (secs, listener.records.get())
      }
      windowForm().count(); aggForm().count() // warm both before timing
      val (wSec, wRec) = runKeep("window", windowForm())
      val (aSec, aRec) = runKeep("min_by_agg", aggForm())
      println(f"""{"keep_best_flood":{"window_sec":$wSec%.2f,"agg_sec":$aSec%.2f,""" +
        f""""window_records":$wRec,"agg_records":$aRec,""" +
        f""""rec_cut_x":${wRec.toDouble / math.max(aRec, 1L)}%.2f}}""")
      comps.unpersist()
    }

    if (sections("incpairs")) {
      // ---- incremental pair store: per-batch cost vs HISTORY size. The
      //      r14 design claim is BYTES-PER-BATCH ∝ batch, not history:
      //      the band-indexed store probes only the partitions the
      //      batch's own keys hit (bk/id additionally pushed into the
      //      scans), and the caption leg is fronted by the Bloom
      //      seen-set, so an all-novel batch touches captions/ not at
      //      all. Measured: the same 240-pair batch against synthetic
      //      histories of 10^5 and 10^6 feature rows; shuffle records
      //      must stay ~flat (broadcast batch side on both legs) AND
      //      input bytes must stay far below the store's growth (the
      //      retired flavor re-scanned the full history twice per
      //      batch — bytes were linear in the corpus by construction).
      //      Residual per-batch history terms: the Bloom read
      //      (~1.2 bytes/key — 400x smaller than the feature rows) and
      //      the probed band partitions' footers. ----
      import graft.multimodal.{IncrementalPairs, JdkMedia, PairCuration}
      def store(h: Long): (String, String) = {
        val work = graft.sources.BucketedTables.scratchDir(s"sb_incpairs_${h}_").toString
        // synthetic committed history: h feature rows (16-double verify
        // grids, distinct hashes/captions so nothing collides with the
        // probe batch), stamped batch 0 + the _PAIRSTATE flip
        spark.range(h).select(
            lit(0L).as("batch_id"), col("id"),
            (col("id") + 1000000L).as("ahash"),
            (col("id") % 97L).cast("double").as("mean"),
            array((0 until 16).map(i => (col("id") % (i + 2)).cast("double")): _*)
              .as("centered"),
            lit(false).as("norm0"),
            xxhash64(concat(lit("hist cap "), col("id"))).as("cap_h"),
            xxhash64(lit(1L), concat(lit("hist cap "), col("id"))).as("cap_h2"))
          .write.parquet(s"$work/store/history")
        graft.operators.Manifests.writeAtomic(spark,
          s"$work/store/${IncrementalPairs.StateName}",
          """{"batch_id":0,"admitted":""" + h + "}")
        // flat → band-indexed: builds bands/, captions/, the caption
        // Bloom and the layout stamp (the production migration path,
        // exercised here at 10^6 rows as a bonus)
        IncrementalPairs.indexHistory(spark, s"$work/store")
        (s"$work/store", s"$work/accepted")
      }
      val batch = spark.range(240).select(col("id").as("pair_id"),
          concat(lit("probe caption number "), col("id").cast("string")).as("caption"))
        .collect().map(r => (r.getLong(0),
          JdkMedia.solidPng(8, 8, (r.getLong(0) % 40).toInt * 6,
            (r.getLong(0) % 40).toInt * 6, (r.getLong(0) % 40).toInt * 6),
          r.getString(1)))
      import spark.implicits._
      val batchDf = batch.toSeq.toDF("pair_id", "image", "caption")
        .repartition(8).localCheckpoint(true)
      val cfg = PairCuration.Config(minCaptionTokens = 2, meanTol = 2.0)
      def storeBytes(root: String): Long = {
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      }
      // the steady-state batch: a SECOND batch against the same store,
      // where the per-generation base-bloom cache is already warm — the
      // bloom read (the residual history-proportional term of the first
      // batch) disappears and bytes drop to the batch's own key spread
      val warmBatch = spark.range(240).select(col("id").as("pair_id"),
          concat(lit("steady caption number "), col("id").cast("string")).as("caption"))
        .collect().map(r => (1000L + r.getLong(0),
          JdkMedia.solidPng(8, 8, (r.getLong(0) % 40).toInt * 6 + 3,
            (r.getLong(0) % 40).toInt * 6 + 3, (r.getLong(0) % 40).toInt * 6 + 3),
          r.getString(1)))
      import spark.implicits._
      val warmDf = warmBatch.toSeq.toDF("pair_id", "image", "caption")
        .repartition(8).localCheckpoint(true)
      def measure(body: => Map[String, Long]): (Double, Long, Long, Map[String, Long]) = {
        val listener = new ShuffleBytesListener
        val dbg = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val in = sc.stageInfo.taskMetrics.inputMetrics.bytesRead
            if (in > 100000 && sys.env.contains("SPARK_GRAFT_INCPAIRS_DEBUG"))
              System.err.println(f"[incpairs-stage] ${in / 1048576.0}%.2f MB  ${sc.stageInfo.name.take(120)}")
          }
        }
        spark.sparkContext.addSparkListener(dbg)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val led = body
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(listener)
        spark.sparkContext.removeSparkListener(dbg)
        (secs, listener.records.get(), listener.inputBytes.get(), led)
      }
      def point(h: Long): (Double, Long, Long, Long) = {
        val (root, acc) = store(h)
        val (secs, recs, bytes, led) = measure(
          IncrementalPairs.processBatch(batchDf, 1L, root, acc, cfg = cfg).toMap)
        require(led("admitted") == 40L, s"history must not collide: $led")
        val (wSecs, _, wBytes, wLed) = measure(
          IncrementalPairs.processBatch(warmDf, 2L, root, acc, cfg = cfg).toMap)
        println(f"""{"incpairs":{"history":$h,"sec":$secs%.2f,""" +
          f""""shuffle_records":$recs,""" +
          f""""input_mb":${bytes / 1048576.0}%.2f,""" +
          f""""warm_sec":$wSecs%.2f,"warm_input_mb":${wBytes / 1048576.0}%.2f,""" +
          f""""store_mb":${storeBytes(root) / 1048576.0}%.2f,""" +
          f""""admitted":${led("admitted")},"warm_admitted":${wLed("admitted")}}}""")
        (secs, recs, bytes, wBytes)
      }
      point(100000L) // warm (JIT + codec paths)
      val (s1, r1, b1, w1) = point(100000L)
      val (s10, r10, b10, w10) = point(1000000L)
      println(f"""{"incpairs_linearity":{"sec_1x":$s1%.2f,"sec_10x":$s10%.2f,""" +
        f""""wall_ratio":${s10 / math.max(s1, 1e-9)}%.2f,""" +
        f""""records_1x":$r1,"records_10x":$r10,""" +
        f""""records_ratio":${r10.toDouble / math.max(r1, 1L)}%.2f,""" +
        f""""input_mb_1x":${b1 / 1048576.0}%.2f,"input_mb_10x":${b10 / 1048576.0}%.2f,""" +
        f""""bytes_ratio":${b10.toDouble / math.max(b1, 1L)}%.2f,""" +
        f""""warm_mb_1x":${w1 / 1048576.0}%.2f,"warm_mb_10x":${w10 / 1048576.0}%.2f,""" +
        f""""warm_bytes_ratio":${w10.toDouble / math.max(w1, 1L)}%.2f}}""")
      batchDf.unpersist(); warmDf.unpersist()
    }

    if (sections("incmeta")) {
      // ---- pair-store METADATA plane: per-batch driver metadata calls
      //      (dir listings, file stats, footer-read opens) across a
      //      12-batch stream, auto-fold ON (foldEvery=4) vs OFF. The
      //      r15 claim: probes list only their selected partition dirs
      //      (path-construction pruning) and the self-fold bounds files
      //      per partition, so per-batch metadata cost is FLAT in batch
      //      count; with the fold disabled the same run trends upward
      //      with the accumulating per-batch files. Solid PNGs all pHash
      //      to 0, concentrating every batch's band keys in the same 4
      //      partitions — the hot-partition worst case for both file
      //      accumulation and listing. Measured through a counting
      //      FileSystem (cfile://), not inferred. ----
      import graft.multimodal.{IncrementalPairs, PairCuration, JdkMedia}
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.cfile.impl", classOf[CountingLocalFs].getName)
      val cfg = PairCuration.Config(minCaptionTokens = 2, meanTol = 2.0)
      val nBatches = 10 // luma = 3·(b·8+i) must stay ≤ 255 (80 pairs)
      val perBatch = 8
      // SMALL parts so the partition-dir axis SATURATES within the run
      // (dirs touched per batch is ≤ P by construction — the flat O(P)
      // term at any scale); what's left growing across batches is FILE
      // count, the axis the self-fold bounds. At the production default
      // (1024) this toy run would sit entirely in the pre-saturation
      // regime and measure dir-count growth instead of the fold.
      val metaParts = 8
      def run(foldEvery: Int): (Seq[Long], Seq[Long], Seq[Long], Seq[Int]) = {
        val localRoot = graft.sources.BucketedTables.scratchDir(
          s"sb_incmeta_f${foldEvery}_").toString
        val root = "cfile://" + localRoot + "/store"
        val acc = "cfile://" + localRoot + "/accepted"
        def storeFiles: Int = {
          val base = java.nio.file.Paths.get(localRoot, "store")
          if (!java.nio.file.Files.exists(base)) 0
          else {
            val s = java.nio.file.Files.walk(base)
            try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
            finally s.close()
          }
        }
        val out = (0 until nBatches).map { b =>
          import spark.implicits._
          // luma gap 3 > meanTol: no in-batch near-dup chains (a chain
          // drives iterative CC — irrelevant to the metadata claim);
          // checkpointed so per-batch lineage stays flat (the incpairs
          // section's discipline)
          val df = (0 until perBatch).map { i =>
            val luma = 3 * (b * perBatch + i) // unique per pair across the run
            (b * 1000L + i, JdkMedia.solidPng(8, 8, luma, luma, luma),
              s"incmeta fold=$foldEvery batch $b caption $i")
          }.toDF("pair_id", "image", "caption").localCheckpoint(true)
          val (l0, s0, o0) = CountingLocalFs.snap()
          IncrementalPairs.processBatch(df, b.toLong, root, acc, cfg = cfg,
            parts = metaParts, foldEvery = foldEvery)
          val (l1, s1, o1) = CountingLocalFs.snap()
          df.unpersist()
          (l1 - l0, s1 - s0, o1 - o0, storeFiles)
        }
        (out.map(_._1), out.map(_._2), out.map(_._3), out.map(_._4))
      }
      val (flL, flS, flO, flF) = run(foldEvery = 4)
      val (nfL, nfS, nfO, nfF) = run(foldEvery = 0)
      def arr(xs: Seq[Long]): String = xs.mkString("[", ",", "]")
      // STEADY-STATE trend: fold batches ((i+1) % foldEvery == 0) carry
      // the fold's own amortized IO — exclude them (and the 2-batch cold
      // start) so the trend isolates the per-batch probe/append cost.
      // Fold-on should sit ~1×; fold-off drifts up with file count.
      def trend(xs: Seq[Long]): Double = {
        val s = xs.zipWithIndex.collect {
          case (x, i) if i >= 2 && (i + 1) % 4 != 0 => x.toDouble
        }
        s.takeRight(2).sum / 2.0 / math.max(s.take(2).sum / 2.0, 1e-9)
      }
      println(f"""{"incmeta":{"batches":$nBatches,"fold_every":4,""" +
        f""""fold_lists":${arr(flL)},"fold_stats":${arr(flS)},""" +
        f""""fold_opens":${arr(flO)},"fold_files":${arr(flF.map(_.toLong))},""" +
        f""""nofold_lists":${arr(nfL)},"nofold_stats":${arr(nfS)},""" +
        f""""nofold_opens":${arr(nfO)},"nofold_files":${arr(nfF.map(_.toLong))},""" +
        f""""fold_list_trend":${trend(flL)}%.2f,""" +
        f""""nofold_list_trend":${trend(nfL)}%.2f,""" +
        f""""fold_open_trend":${trend(flO)}%.2f,""" +
        f""""nofold_open_trend":${trend(nfO)}%.2f}}""")
    }

    if (sections("gzip")) {
      // ---- archive-ingest throughput: the boundary-recovering member
      //      split (header walk + raw inflate + per-member CRC32/ISIZE
      //      verify) vs the JDK's fused GZIPInputStream over the SAME
      //      blobs — the control does the identical inflate work but
      //      recovers no record boundaries, so the gap IS the price of
      //      boundaries + verification. Fixture: sf0.1 docs expanded to
      //      ~0.4 MB members (rep-indexed so deflate sees realistic
      //      partial redundancy, not one giant match), 64 archives,
      //      measured as multi-GB of uncompressed output. Split runs
      //      FIRST (JIT warmup bias favors the control — conservative
      //      for the overhead claim). ----
      import spark.implicits._
      import graft.sources.GzipArchives
      val reps = sys.env.getOrElse("SPARK_GRAFT_GZIP_REPS", "1200").toInt
      val nArch = 64
      val archives = base.as[(Long, String)]
        .groupByKey(_._1 % nArch)
        .mapGroups { (aid, it) =>
          val members = it.toSeq.sortBy(_._1).map { case (_, text) =>
            val sb = new StringBuilder(text.length * reps + 8 * reps)
            var r = 0
            while (r < reps) { sb.append(text).append(" #").append(r).append(' '); r += 1 }
            sb.toString.getBytes("UTF-8")
          }
          (aid, GzipArchives.buildArchive(members))
        }
        .repartition(16)
        .persist()
      val compMb = archives.map(_._2.length.toLong).reduce(_ + _) / 1e6 // materializes
      // one untimed pass per path (JIT + page cache + plan warm) — without
      // it the first-measured path absorbs all warmup cost and the three
      // numbers are not comparable (observed: op "faster" than its own
      // split subset in a busy-JVM full-section sweep)
      GzipArchives.explodeArchives(archives)
        .toDF().agg(count(lit(1))).head()
      archives.map { case (_, b) => GzipArchives.splitMembers(b)._1.length }.reduce(_ + _)
      val t0 = System.nanoTime()
      val (nMembers, uncBytes) = GzipArchives.explodeArchives(archives)
        .toDF().agg(count(lit(1)), sum(length(col("content"))))
        .as[(Long, Long)].head()
      val splitS = (System.nanoTime() - t0) / 1e9
      // closure-level split: identical boundary walk + inflate + CRC
      // verify + per-member array materialization, but no Spark rows —
      // isolates the splitter's arithmetic from the encoder cost of
      // actually SHIPPING 1.8 GB of member rows (which the end-to-end
      // operator pays because having the records is its whole point)
      val t1 = System.nanoTime()
      val closureBytes = archives.map { case (_, b) =>
        val (ms, clean) = GzipArchives.splitMembers(b)
        require(clean, "bench fixture must split clean")
        var n = 0L; ms.foreach(m => n += m.length)
        n
      }.reduce(_ + _)
      val closureS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val fusedBytes = archives.map { case (_, b) =>
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
        try {
          var n = 0L; val buf = new Array[Byte](65536)
          var r = in.read(buf)
          while (r > 0) { n += r; r = in.read(buf) }
          n
        } finally in.close()
      }.reduce(_ + _)
      val fusedS = (System.nanoTime() - t2) / 1e9
      archives.unpersist()
      val mb = uncBytes / 1e6
      println(f"""{"gzip":{"archives":$nArch,"members":$nMembers,"comp_mb":$compMb%.1f,""" +
        f""""unc_mb":$mb%.1f,"op_s":$splitS%.2f,"op_mb_s":${mb / splitS}%.0f,""" +
        f""""split_s":$closureS%.2f,"split_mb_s":${mb / closureS}%.0f,""" +
        f""""fused_s":$fusedS%.2f,"fused_mb_s":${mb / fusedS}%.0f,""" +
        f""""verify_overhead_x":${closureS / fusedS}%.2f,""" +
        f""""bytes_match":${uncBytes == fusedBytes && closureBytes == fusedBytes}}}""")
    }
    if (sections("avi")) {
      // ---- video frame-stride economics: MJPEG frames are independent,
      //      so stride-N demuxes cheap byte ranges and DECODES only every
      //      Nth frame — the claim in AviMjpeg's scaladoc, measured.
      //      500 × 30-frame 256² videos; stride 4 should cut wall time
      //      close to the decode fraction it skips. ----
      import spark.implicits._
      import graft.multimodal.{AviMjpeg, Multimodal}
      val nFrames = 30
      val media = spark.range(500).as[Long].map { id =>
        val frames = (0 until nFrames).map(f =>
          AviMjpeg.solidJpeg(256, 256,
            ((id % 13) * 16 + 8).toInt, ((f % 13) * 16 + 8).toInt, 60))
        Multimodal.MediaRow(id, AviMjpeg.mjpegAvi(frames, 256, 256, 40000L),
          Multimodal.MediaMeta("avi", 256, 256, nFrames * 40L))
      }.repartition(16).persist()
      media.count() // materialize the encode fixture outside the timing
      def run(stride: Int): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = AviMjpeg.decodeVideoFrames(media, stride).filter(_.ok).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      run(1) // warmup
      val (t1, n1) = run(1)
      val (t4, n4) = run(4)
      media.unpersist()
      println(f"""{"avi":{"videos":500,"frames":$n1,"stride1_s":$t1%.2f,""" +
        f""""fps":${n1 / t1}%.0f,"stride4_s":$t4%.2f,"stride4_frames":$n4,""" +
        f""""cut_x":${t1 / t4}%.1f}}""")
    }

    if (sections("preclean")) {
      // ---- preClean codegen vs the round-9 Row-encoder map: the stage
      //      that touches EVERY raw document before the first hash
      //      (fixMojibake → normalizeText). The codegen path is one
      //      WholeStageCodegen Project; the control replays the old
      //      whole-row Dataset.map shape (Deserialize/SerializeFromObject
      //      around a Row encoder) over the SAME per-string functions —
      //      so the delta is purely the encoder round-trip. Output
      //      asserted identical. Fixture: sf0.1 docs ×160 copies,
      //      one third Latin-1-garbled / one third CP1252-garbled / one
      //      third clean with decomposed accents (so both repair and
      //      NFC actually fire), PLUS eight ride-along metadata columns
      //      — a real curation row carries url/source/lang/timestamps,
      //      and the whole-row shape pays to rebuild ALL of them while
      //      the column shape touches only text. ----
      import spark.implicits._
      import graft.operators.TextAnalysis
      val garbled = (0 until 160).map(i =>
          base.select((col("doc_id") * 160 + i).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .as[(Long, String)]
        .map { case (id, text) =>
          val t = (id % 3) match {
            case 0 => new String(("wé " + text).getBytes("UTF-8"),
              java.nio.charset.StandardCharsets.ISO_8859_1)
            case 1 => new String(("it’s " + text).getBytes("UTF-8"),
              "windows-1252")
            case _ => "wé " + text // decomposed accent — NFC recomposes
          }
          (id, t)
        }.toDF("doc_id", "text")
      val fixture = (1 to 4).foldLeft(garbled) { (df, i) =>
          df.withColumn(s"meta_s$i",
              concat(lit("src-"), (col("doc_id") % 97).cast("string")))
            .withColumn(s"meta_l$i", col("doc_id") * i)
        }
        .repartition(16).persist()
      val totalChars = fixture.agg(sum(length(col("text")))).head.getLong(0)
      val nfc = java.text.Normalizer.Form.NFC
      def encoderStage(df: DataFrame)(f: String => String): DataFrame = {
        val idx = df.schema.fieldIndex("text")
        implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
          org.apache.spark.sql.Encoders.row(df.schema)
        df.map { r =>
          val t = r.getAs[String](idx)
          val out = f(t)
          if (out eq t) r
          else {
            val vals = r.toSeq.toArray
            vals(idx) = out
            org.apache.spark.sql.Row.fromSeq(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
      }
      def normalizeStr(t: String): String =
        if (t == null || java.text.Normalizer.isNormalized(t, nfc)) t
        else java.text.Normalizer.normalize(t, nfc)
      // the ACTUAL round-9 pipeline shape: two separate whole-row maps
      // (fixMojibake, then normalizeText), each its own encoder round-trip
      def encoderTwoStage(df: DataFrame): DataFrame =
        encoderStage(encoderStage(df)(TextAnalysis.fixMojibakeString))(normalizeStr)
      // the best the whole-row style could do: both functions in ONE map
      def encoderControl(df: DataFrame): DataFrame =
        encoderStage(df)(t => normalizeStr(TextAnalysis.fixMojibakeString(t)))
      def runPoint(df: => DataFrame): (Double, (Long, Long)) = {
        val t0 = System.nanoTime()
        // crc32 sum: order-insensitive content witness, bounded far below
        // long overflow (2^32 per row × row count)
        val r = df.agg(sum(length(col("text"))), sum(crc32(col("text")))).head
        ((System.nanoTime() - t0) / 1e9, (r.getLong(0), r.getLong(1)))
      }
      def codegenPath = TextAnalysis.normalizeText(
        TextAnalysis.fixMojibake(fixture, "text"), "text")
      runPoint(codegenPath); runPoint(encoderControl(fixture)) // warmups
      runPoint(encoderTwoStage(fixture))
      // 0.7 s runs on a busy JVM: median of 3 interleaved rounds
      def median3(run: => (Double, (Long, Long))): (Double, (Long, Long)) = {
        val rs = (0 until 3).map(_ => run)
        (rs.map(_._1).sorted.apply(1), rs.head._2)
      }
      val (tNew, sNew) = median3(runPoint(codegenPath))
      val (tOld1, sOld1) = median3(runPoint(encoderControl(fixture)))
      val (tOld2, sOld2) = median3(runPoint(encoderTwoStage(fixture)))
      fixture.unpersist()
      val mb = totalChars / 1e6
      println(f"""{"preclean":{"mb":$mb%.1f,"codegen_s":$tNew%.2f,""" +
        f""""codegen_mb_s":${mb / tNew}%.0f,"encoder_fused_s":$tOld1%.2f,""" +
        f""""encoder_two_stage_s":$tOld2%.2f,""" +
        f""""speedup_vs_fused_x":${tOld1 / tNew}%.2f,""" +
        f""""speedup_vs_pipeline_x":${tOld2 / tNew}%.2f,""" +
        f""""match":${sNew == sOld1 && sNew == sOld2}}}""")
    }

    if (sections("bpe")) {
      // ---- BPE encode throughput: the per-partition word memo's value
      //      on Zipf text (the replace chain runs once per DISTINCT word
      //      per task, not per occurrence). Control = wordCacheSize 0
      //      (every entry evicted — all misses), same code path, output
      //      asserted identical. Corpus: sf0.1 docs expanded ×400
      //      (within-doc ×40 repeat, 10 id-shifted copies) ≈ 600 MB of
      //      text through 150 trained merges. ----
      import graft.operators.Bpe
      val expanded = (0 until 10).map(i =>
          base.select((col("doc_id") * 10 + i).as("doc_id"),
            concat_ws(" ", array_repeat(col("text"), 40)).as("text")))
        .reduce(_ unionByName _)
        .repartition(16).persist()
      val totalChars = expanded.agg(sum(length(col("text")))).head.getLong(0)
      val merges = Bpe.trainBpe(base, "text", numMerges = 150)
      // consume BOTH output columns (n_tokens + the token stream itself,
      // via its length) — the realistic contract: downstream chunk/pack
      // reads the tokens, so neither form may let serializer pruning
      // skip materializing them
      def run(cache: Int): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = Bpe.applyBpe(expanded, "doc_id", merges, wordCacheSize = cache)
          .agg(sum("n_tokens"), sum(length(col("tokens")))).head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // inline legacy control: the retired typed-mapPartitions flavor
      // (deser/reser of every document) with the identical memo and
      // merge arithmetic — the kernel-vs-mapPartitions point
      def runLegacy(): (Double, Long) = {
        import spark.implicits._
        val ms = merges.sortBy(_.rank).map(m => (m.lhs, m.rhs))
        val t0 = System.nanoTime()
        val n = expanded.select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)]
          .mapPartitions { it =>
            val memo = new java.util.LinkedHashMap[String, String](1024, 0.75f, false) {
              override def removeEldestEntry(
                  e: java.util.Map.Entry[String, String]): Boolean = size() > (1 << 16)
            }
            def enc(w: String): String = {
              val hit = memo.get(w)
              if (hit != null) hit
              else {
                var s = graft.operators.Bpe.padSymbols(w)
                ms.foreach { case (a, b) => s = s.replace(s" $a $b ", s" $a$b ") }
                val out = s.trim; memo.put(w, out); out
              }
            }
            it.map { case (id, text) =>
              val tokens = text.split("\\s+").iterator.filter(_.nonEmpty)
                .map(enc).mkString(" ")
              (id, if (tokens.isEmpty) 0L else (tokens.count(_ == ' ') + 1).toLong,
                tokens)
            }
          }.toDF("id", "n_tokens", "tokens")
          .agg(sum("n_tokens"), sum(length(col("tokens")))).head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      run(1 << 16); runLegacy() // warmup BOTH forms (JIT + page cache)
      // median of 3 per form: single-shot times on a shared host swing
      // ±40% run to run, far above the effect under measurement
      def median3(f: => (Double, Long)): (Double, Long) = {
        val rs = Seq(f, f, f)
        (rs.map(_._1).sorted.apply(1), rs.head._2)
      }
      val (tCached, nTok) = median3(run(1 << 16))
      val (tCold, nTokCold) = run(0)
      val (tLegacy, nTokLegacy) = median3(runLegacy())
      expanded.unpersist()
      val mb = totalChars / 1e6
      println(f"""{"bpe":{"mb":$mb%.1f,"merges":${merges.length},"tokens":$nTok,""" +
        f""""cached_s":$tCached%.2f,"cached_mb_s":${mb / tCached}%.0f,""" +
        f""""cached_mtok_s":${nTok / 1e6 / tCached}%.1f,""" +
        f""""uncached_s":$tCold%.2f,"speedup_x":${tCold / tCached}%.1f,""" +
        f""""legacy_mappart_s":$tLegacy%.2f,""" +
        f""""kernel_vs_mappart_x":${tLegacy / tCached}%.2f,""" +
        f""""match":${nTok == nTokCold && nTok == nTokLegacy}}}""")
    }
    if (sections("crawl")) {
      // ---- HTML → text extraction throughput: realistic page chrome
      //      (nav lists, script/style payloads, entities) around the
      //      sf0.1 text, ×160 copies ≈ 460 MB of HTML through the
      //      single-pass parser. The content witness doubles as a
      //      correctness check at scale (every page must extract to the
      //      same arithmetic-derived shape). Linearity point at ×4. ----
      import graft.functions.TextExpressions
      def pages(copies: Int): DataFrame = (0 until copies).map { i =>
        base.select((col("doc_id") * copies + i).as("doc_id"), concat(
          lit("<html><head><title>T"), col("doc_id").cast("string"),
          lit("</title><style>body{margin:0} p>a{color:#00f}</style>" +
            "<script>if (a < b && c > d) { track('<div>x</div>'); }</script>" +
            "</head><body><nav><ul><li>Home</li><li>About</li></ul></nav>" +
            "<!-- boilerplate --><p>"), col("text"),
          lit("</p><div>tail &amp; chrome &#65;</div></body></html>"))
          .as("html"))
      }.reduce(_ unionByName _)
      val small = pages(16).repartition(16).persist()
      val big = pages(160).repartition(16).persist()
      val mbSmall = small.agg(sum(length(col("html")))).head.getLong(0) / 1e6
      val mbBig = big.agg(sum(length(col("html")))).head.getLong(0) / 1e6
      def run(df: DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = df.select(TextExpressions.html_text(col("html")).as("t"))
          .agg(sum(length(col("t"))), sum(crc32(col("t")))).head
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      run(small); run(big) // warm (JIT on the parser)
      val (tS, _) = run(small)
      val (tB, outChars) = run(big)
      // boilerplate clean over the same pages: the classifying walker
      // (block features + three integer tests) vs plain extraction —
      // the overhead a curation run pays for dropping the nav chrome
      def runClean(df: DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = df.select(TextExpressions.html_clean(col("html"),
          5, 3, 10, 1, 5).as("t"))
          .agg(sum(length(col("t"))), sum(crc32(col("t")))).head
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      runClean(big) // warm
      val (tC, cleanChars) = runClean(big)
      small.unpersist(); big.unpersist()
      println(f"""{"crawl":{"html_mb_1x":$mbSmall%.1f,"html_mb_10x":$mbBig%.1f,""" +
        f""""extract_1x_s":$tS%.2f,"extract_10x_s":$tB%.2f,""" +
        f""""mb_s":${mbBig / tB}%.0f,"scaling_x":${tB / tS}%.1f,""" +
        f""""out_chars":$outChars,"clean_10x_s":$tC%.2f,""" +
        f""""clean_mb_s":${mbBig / tC}%.0f,"clean_chars":$cleanChars}}""")
    }

    if (sections("robots")) {
      // ---- robots.txt politeness gate: the crawl-frontier stage that
      //      runs over EVERY URL. Fixture: 50 hosts × 40 realistic rules
      //      (plain prefixes, deep allows, wildcard-query disallows,
      //      anchored *.pdf$ blocks). New path = ONE codegen byte-walk
      //      scalar (graft_robots_verdict); legacy control = the
      //      interpreted aggregate() HOF + regexp_like(column-pattern)
      //      fold it replaced (Pattern.compile per URL × rule), run on a
      //      20× smaller slice and compared per-URL. Witness: the allow
      //      count is arithmetic (k = id mod 40; blocked iff k mod 4 = 0
      //      — /d0,/d4..,/d36 are the only matching rules). ----
      import graft.operators.RobotsFilter
      val robotsTxt = "User-agent: *\n" + (0 until 40).map { j =>
        if (j % 4 == 0) s"Disallow: /d$j"
        else if (j % 4 == 1) s"Allow: /d${j - 1}/ok"
        else if (j % 4 == 2) s"Disallow: /*?x$j="
        else "Disallow: /p" + j + "*.pdf$"
      }.mkString("\n") + "\n"
      val robots = spark.range(50).select(
        concat(lit("h"), col("id").cast("string"), lit(".ex")).as("host"),
        lit(robotsTxt).as("content"))
      def urls(n: Long): DataFrame = spark.range(n).select(col("id"),
        concat(lit("http://h"), (col("id") % 50).cast("string"), lit(".ex/d"),
          (col("id") % 40).cast("string"), lit("/p"),
          col("id").cast("string")).as("url"))
      def runNew(n: Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val allowed = RobotsFilter.markAllowed(urls(n), robots, "url")
          .where(col("allowed")).count()
        ((System.nanoTime() - t0) / 1e9, allowed)
      }
      runNew(200000L) // warm
      val nNew = 4000000L
      val (tNew, allowedNew) = runNew(nNew)
      require(allowedNew == nNew / 40 * 30,
        s"robots witness: expected ${nNew / 40 * 30} allowed, got $allowedNew")
      // legacy control — the exact pre-round-12 formulation
      def toRx(p: String): String = {
        val anchored = p.endsWith("$")
        val body = if (anchored) p.dropRight(1) else p
        val sb = new StringBuilder("^")
        body.foreach {
          case '*' => sb ++= ".*"
          case c if "\\.[]{}()+-?^$|".indexOf(c) >= 0 => sb += '\\'; sb += c
          case c => sb += c
        }
        if (anchored) sb += '$'
        sb.toString
      }
      import spark.implicits._
      val legacyRules = RobotsFilter.robotsRules(robots, "*")
        .as[(String, Seq[String], Seq[Boolean])]
        .map { case (h, pats, als) =>
          (h, pats.zip(als).map { case (p, a) =>
            (toRx(p), p.length, if (a) 1 else 0) }) }
        .toDF("host", "rules")
      val nLegacy = 200000L
      def runLegacy(): (Double, Long) = {
        val zero = struct(lit(-1).as("len"), lit(1).as("allow"))
        val best = aggregate(coalesce(col("_rules"), array()), zero,
          (acc, r) => when(
            regexp_like(col("_path"), r.getField("_1")) &&
              (r.getField("_2") > acc.getField("len") ||
                (r.getField("_2") === acc.getField("len") &&
                  r.getField("_3") === 1)),
            struct(r.getField("_2").as("len"), r.getField("_3").as("allow")))
            .otherwise(acc))
        val t0 = System.nanoTime()
        val allowed = urls(nLegacy)
          .withColumn("_host", lower(parse_url(col("url"), lit("HOST"))))
          .withColumn("_path", coalesce(parse_url(col("url"), lit("PATH")), lit("/")))
          .join(broadcast(legacyRules.select(lower(col("host")).as("_host"),
            col("rules").as("_rules"))), Seq("_host"), "left")
          .where(best.getField("allow") === 1).count()
        ((System.nanoTime() - t0) / 1e9, allowed)
      }
      runLegacy() // warm
      val (tLegacy, allowedLegacy) = runLegacy()
      require(allowedLegacy == nLegacy / 40 * 30,
        s"robots legacy witness: expected ${nLegacy / 40 * 30}, got $allowedLegacy")
      val newRate = nNew / tNew
      val legacyRate = nLegacy / tLegacy
      println(f"""{"robots":{"urls":$nNew,"rules_per_host":40,""" +
        f""""kernel_s":$tNew%.2f,"kernel_urls_s":$newRate%.0f,""" +
        f""""legacy_urls":$nLegacy,"legacy_s":$tLegacy%.2f,""" +
        f""""legacy_urls_s":$legacyRate%.0f,""" +
        f""""speedup_x":${newRate / legacyRate}%.1f}}""")
    }

    if (sections("kernels")) {
      // ---- round-12 HOF-purge kernels, each measured against the EXACT
      //      combinator form it replaced (interpreted higher-order
      //      lambdas), value-witnessed equal on a slice before timing.
      //      Forcing is a noop write (every output column evaluated). ----
      import graft.functions.{TextExpressions, VectorExpressions}
      def force(df: DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // (a) tracking-param strip: byte walk vs ArrayFilter+rlike+join
      def queries(n: Long): DataFrame = spark.range(n).select(
        concat(lit("utm_source=s"), (col("id") % 7).cast("string"),
          lit("&x="), (col("id") % 13).cast("string"),
          lit("&gclid=g&q="), col("id").cast("string"),
          lit("&utm_medium=m&y=2")).as("q"))
      def legacyStrip(q: Column): Column = array_join(
        filter(split(q, "&"), p => !p.rlike("^(utm_[^&=]*|fbclid|gclid)=")), "&")
      val qsmall = queries(50000L)
      require(qsmall.where(TextExpressions.strip_tracking(col("q")) =!=
        legacyStrip(col("q"))).count() == 0, "strip kernel diverges from the legacy form")
      val nStrip = 8000000L
      val qs = queries(nStrip).persist(); qs.count()
      force(qs.select(TextExpressions.strip_tracking(col("q")).as("v"))) // warm
      val tStripK = force(qs.select(TextExpressions.strip_tracking(col("q")).as("v")))
      force(qs.select(legacyStrip(col("q")).as("v"))) // warm
      val tStripL = force(qs.select(legacyStrip(col("q")).as("v")))
      qs.unpersist()
      // (b) int8 quantize build pass: VecMaxAbs+VecInt8Codes vs
      //     array_max(transform)+transform(when(...))
      val embBase = graft.sources.Tables.load(spark, "/root/testdata/sf0.1",
        "embeddings").select("vec_id", "embedding")
      val embs = scaledEmb(embBase, 20).persist()
      val nEmb = embs.count()
      def legacyMaxAbs(v: Column): Column =
        array_max(transform(v, x => abs(x.cast("double"))))
      def legacyCodes(v: Column, m: Column): Column =
        transform(v, x => when(m === 0d, lit(0).cast("byte"))
          .otherwise(floor(x.cast("double") / m * 127d + 0.5d).cast("byte")))
      def kernelQuant(df: DataFrame): DataFrame = {
        val m = VectorExpressions.vec_max_abs(col("embedding"))
        df.select(col("vec_id"), m.as("max_abs"),
          VectorExpressions.vec_int8_codes(col("embedding"), m).as("codes"))
      }
      def legacyQuant(df: DataFrame): DataFrame = {
        val m = legacyMaxAbs(col("embedding"))
        df.select(col("vec_id"), m.as("max_abs"),
          legacyCodes(col("embedding"), m).as("codes"))
      }
      val quantDiff = kernelQuant(embBase)
        .withColumnRenamed("max_abs", "ma_k").withColumnRenamed("codes", "c_k")
        .join(legacyQuant(embBase)
          .withColumnRenamed("max_abs", "ma_l").withColumnRenamed("codes", "c_l"),
          Seq("vec_id"))
        .where(col("ma_k") =!= col("ma_l") || col("c_k") =!= col("c_l"))
        .count()
      require(quantDiff == 0,
        s"quantize kernel diverges from the legacy form on $quantDiff rows")
      force(kernelQuant(embs)) // warm
      val tQuantK = force(kernelQuant(embs))
      force(legacyQuant(embs)) // warm
      val tQuantL = force(legacyQuant(embs))
      embs.unpersist()
      // (c) bigram stream: WordShingles byte walk vs zip_with(slice,
      //     slice, concat) under the same size>=2 guard
      def legacyBigrams(text: Column): Column = {
        val toks = split(text, " ")
        when(size(toks) >= 2,
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
      }
      require(small.where(graft.operators.TextAnalysis.bigramStream(col("text")) =!=
        legacyBigrams(col("text"))).count() == 0,
        "bigram kernel diverges from the legacy form")
      val docs10 = scaled(base, 10).persist()
      val nDocs = docs10.count()
      force(docs10.select(graft.operators.TextAnalysis.bigramStream(col("text")).as("v"))) // warm
      val tBgK = force(docs10.select(
        graft.operators.TextAnalysis.bigramStream(col("text")).as("v")))
      force(docs10.select(legacyBigrams(col("text")).as("v"))) // warm
      val tBgL = force(docs10.select(legacyBigrams(col("text")).as("v")))
      docs10.unpersist()
      println(f"""{"kernels":{""" +
        f""""strip_urls":$nStrip,"strip_kernel_s":$tStripK%.2f,""" +
        f""""strip_legacy_s":$tStripL%.2f,"strip_speedup_x":${tStripL / tStripK}%.1f,""" +
        f""""quant_vecs":$nEmb,"quant_kernel_s":$tQuantK%.2f,""" +
        f""""quant_legacy_s":$tQuantL%.2f,"quant_speedup_x":${tQuantL / tQuantK}%.1f,""" +
        f""""bigram_docs":$nDocs,"bigram_kernel_s":$tBgK%.2f,""" +
        f""""bigram_legacy_s":$tBgL%.2f,"bigram_speedup_x":${tBgL / tBgK}%.1f}}""")
    }

    if (sections("bloom")) {
      // ---- Bloom seen-set: THE claim is that the probe is independent
      //      of history size (broadcast bits + map-only bit test) while
      //      the exact anti-join control pays the history scan + shuffle
      //      every batch. History at 1× and 10× (distinct content per
      //      copy via a copy-unique pad token so fingerprints differ),
      //      batch FIXED (4 copies seen + one unseen slice). ----
      import graft.operators.{SeenFilter, TextAnalysis}
      def padded(copies: Int): DataFrame = (0 until copies).map { i =>
        base.select((col("doc_id") * copies + i).as("doc_id"),
          concat(col("text"), lit(" " + "y" * (i + 1))).as("text"))
      }.reduce(_ unionByName _)
      val hist1 = padded(10).repartition(16).persist()
      val hist10 = padded(100).repartition(16).persist()
      val batch = padded(4)
        .unionByName(base.select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" zq unseen")).as("text")))
        .repartition(16).persist()
      val (n1, n10, nB) = (hist1.count(), hist10.count(), batch.count())
      def point(hist: DataFrame): (Double, Double, Long) = {
        val t0 = System.nanoTime()
        val filter = SeenFilter.buildFilter(hist, seed = 3L, kHashes = 5,
          mBits = 1 << 20, numShards = 16).persist()
        filter.count()
        val tBuild = (System.nanoTime() - t0) / 1e9
        def probe(): (Double, Long) = {
          val t1 = System.nanoTime()
          val seen = SeenFilter.markSeen(batch, filter)
            .where(col("maybe_seen")).count()
          ((System.nanoTime() - t1) / 1e9, seen)
        }
        probe() // warm (broadcast + JIT)
        val (tProbe, seen) = probe()
        filter.unpersist()
        (tBuild, tProbe, seen)
      }
      def control(hist: DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val newRows = TextAnalysis.fingerprint(batch).select("doc_id", "fp")
          .join(TextAnalysis.fingerprint(hist).select("fp").distinct(),
            Seq("fp"), "left_anti").count()
        ((System.nanoTime() - t0) / 1e9, newRows)
      }
      val (b1, p1, s1) = point(hist1)
      val (b10, p10, s10) = point(hist10)
      control(hist1) // warm
      val (c1a, nNew1) = control(hist1)
      val (c10a, nNew10) = control(hist10)
      hist1.unpersist(); hist10.unpersist(); batch.unpersist()
      val filterMb = 16.0 * (1 << 20) / 8 / 1e6
      // seen must cover the 4 in-history copies; extras are FPs on the
      // unseen slice — correctness witness, not timing
      val nSeenTrue = nB - base.count()
      println(f"""{"bloom":{"n_hist_1x":$n1,"n_hist_10x":$n10,"n_batch":$nB,""" +
        f""""filter_mb":$filterMb%.1f,"build_1x_s":$b1%.2f,"build_10x_s":$b10%.2f,""" +
        f""""probe_1x_s":$p1%.2f,"probe_10x_s":$p10%.2f,""" +
        f""""probe_flat_ok":${p10 <= p1 * 1.5 + 0.5},""" +
        f""""anti_join_1x_s":$c1a%.2f,"anti_join_10x_s":$c10a%.2f,""" +
        f""""seen_1x":$s1,"seen_10x":$s10,"seen_true":$nSeenTrue,""" +
        f""""fp_1x":${s1 - nSeenTrue},"fp_10x":${s10 - nSeenTrue},""" +
        f""""exact_new_1x":$nNew1,"exact_new_10x":$nNew10}}""")
    }

    if (sections("shuffle")) {
      // ---- Deterministic corpus shuffle: bucketed global rank vs the
      //      naive global-window row_number. The permutation witness
      //      (Σ pos = n(n−1)/2, max = n−1) rides inside the timed
      //      action. The SCALE argument is the per-task row bound, not
      //      the local clock: the naive window funnels ALL n rows
      //      through one task's sort (reported as single_task_rows),
      //      the bucketed rank's biggest task sorts max_bucket_rows ≈
      //      n/1024 — the difference between "impossible at 10^11 rows"
      //      and "any executor can hold it". ----
      import graft.operators.TextAnalysis
      val c1 = scaled(base, 100).repartition(16).persist()
      val c10 = scaled(base, 1000).repartition(32).persist()
      val (m1, m10) = (c1.count(), c10.count())
      def point(df: DataFrame, n: Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = TextAnalysis.corpusShuffle(df, "doc_id", seed = 5L,
            numBuckets = 1024)
          .agg(sum(col("shuffle_pos")), max(col("shuffle_pos"))).head
        val secs = (System.nanoTime() - t0) / 1e9
        require(r.getLong(0) == n * (n - 1) / 2 && r.getLong(1) == n - 1,
          s"not a dense permutation: $r for n=$n")
        // biggest per-task sort the bucketed flavor pays (one extra
        // metadata-sized job, outside the timed window on purpose)
        val maxBucket = df
          .select((pmod((TextAnalysis.portableFingerprint(col("text")) + 5L) *
            2654435761L, lit(1000000007L)) /
            ((1000000007L + 1023) / 1024)).cast("long").as("b"))
          .groupBy("b").count().agg(max("count")).head.getLong(0)
        (secs, maxBucket)
      }
      def naive(df: DataFrame, n: Long): Double = {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("_key"), col("doc_id"))
        val key = pmod((TextAnalysis.portableFingerprint(col("text")) + 5L) *
          2654435761L, lit(1000000007L))
        val t0 = System.nanoTime()
        val r = df.withColumn("_key", key)
          .withColumn("pos", row_number().over(w).cast("long") - 1L)
          .agg(sum(col("pos")), max(col("pos"))).head
        val secs = (System.nanoTime() - t0) / 1e9
        require(r.getLong(0) == n * (n - 1) / 2, s"naive witness failed: $r")
        secs
      }
      point(c1, m1) // warm
      val (t1, mb1) = point(c1, m1)
      val (t10, mb10) = point(c10, m10)
      naive(c1, m1) // warm
      val tn1 = naive(c1, m1)
      val tn10 = naive(c10, m10)
      // ---- Token-budget cut on the same corpora: the bucketed global
      //      token cumsum vs the naive global-window control — same
      //      per-task bound story as the shuffle (the budget cut is the
      //      shuffle's offset trick applied to token mass). The cut
      //      witness (budget met by the crossing doc, nothing after)
      //      rides inside the timed action. ----
      def budgetPoint(df: DataFrame, budget: Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = TextAnalysis.tokenBudgetSample(df, "doc_id", budget,
            seed = 5L, numBuckets = 1024)
          .agg(count(lit(1)), max(col("cum_tokens"))).head
        val secs = (System.nanoTime() - t0) / 1e9
        require(r.getLong(1) >= budget,
          s"budget $budget not met: max cum ${r.getLong(1)}")
        (secs, r.getLong(0))
      }
      def budgetNaive(df: DataFrame, budget: Long): Long = {
        val key = pmod((TextAnalysis.portableFingerprint(col("text")) + 5L) *
          2654435761L, lit(1000000007L))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("_key"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        df.withColumn("_key", key)
          .withColumn("_t", size(split(col("text"), " ")).cast("long"))
          .withColumn("_cum", sum(col("_t")).over(w))
          .where(col("_cum") - col("_t") < budget)
          .count()
      }
      val halfTokens10 = c10.select(sum(size(split(col("text"), " "))
        .cast("long"))).head.getLong(0) / 2
      budgetPoint(c10, halfTokens10) // warm
      val (tb10, kept10) = budgetPoint(c10, halfTokens10)
      val naiveKept = budgetNaive(c10, halfTokens10)
      require(naiveKept == kept10,
        s"bucketed cut kept $kept10 rows, naive global window kept $naiveKept")
      c1.unpersist(); c10.unpersist()
      println(f"""{"shuffle":{"n_1x":$m1,"n_10x":$m10,"bucketed_1x_s":$t1%.2f,""" +
        f""""bucketed_10x_s":$t10%.2f,"scaling_x":${t10 / t1}%.1f,""" +
        f""""naive_window_1x_s":$tn1%.2f,"naive_window_10x_s":$tn10%.2f,""" +
        f""""speedup_10x_x":${tn10 / t10}%.2f,""" +
        f""""single_task_rows_naive":$m10,"max_bucket_rows":$mb10,""" +
        f""""task_bound_ratio":${m10.toDouble / mb10}%.0f,""" +
        f""""token_budget_10x_s":$tb10%.2f,"token_budget_kept":$kept10,""" +
        f""""token_budget_naive_agrees":true}}""")
    }

    if (sections("classifier")) {
      // ---- Perceptron: train cost is epochs × (two aggregates over the
      //      labeled set) — linear in labeled rows; scoring is map-only
      //      and reported as corpus MB/s. Labels from content arithmetic
      //      (fingerprint parity) so both classes exist at any scale. ----
      import graft.operators.{LinearClassifier, TextAnalysis}
      val lab1 = scaled(base, 10)
        .withColumn("y", when(pmod(TextAnalysis.portableFingerprint(col("text")),
          lit(2L)) === 0L, 1).otherwise(-1))
        .repartition(16).persist()
      val lab10 = scaled(base, 100)
        .withColumn("y", when(pmod(TextAnalysis.portableFingerprint(col("text")),
          lit(2L)) === 0L, 1).otherwise(-1))
        .repartition(16).persist()
      val corpus = scaled(base, 100).repartition(16).persist()
      val (l1, l10) = (lab1.count(), lab10.count())
      val corpusChars = corpus.agg(sum(length(col("text")))).head.getLong(0)
      def train(df: DataFrame): (Double, LinearClassifier.Model) = {
        val t0 = System.nanoTime()
        val m = LinearClassifier.trainPerceptron(df, "doc_id", "y",
          numBuckets = 4096, epochs = 4)
        ((System.nanoTime() - t0) / 1e9, m)
      }
      train(lab1) // warm
      val (tt1, model) = train(lab1)
      val (tt10, _) = train(lab10)
      def scorePoint(): Double = {
        val t0 = System.nanoTime()
        LinearClassifier.score(corpus, model)
          .agg(sum(col("score")), count(when(col("pred") === 1, 1))).head
        (System.nanoTime() - t0) / 1e9
      }
      scorePoint() // warm
      val ts = scorePoint()
      lab1.unpersist(); lab10.unpersist(); corpus.unpersist()
      val mb = corpusChars / 1e6
      println(f"""{"classifier":{"n_labeled_1x":$l1,"n_labeled_10x":$l10,""" +
        f""""epochs":4,"buckets":4096,"train_1x_s":$tt1%.2f,"train_10x_s":$tt10%.2f,""" +
        f""""train_scaling_x":${tt10 / tt1}%.1f,""" +
        f""""score_mb":$mb%.1f,"score_s":$ts%.2f,"score_mb_s":${mb / ts}%.0f}}""")
    }

    if (sections("dsir")) {
      // ---- DSIR: fit = TWO bucket-count aggregates (target + raw,
      //      map-side combined) — expected linear in raw size; scoring
      //      is the classifier's map-only fold with a double
      //      accumulator, reported as corpus MB/s; the cut is a
      //      TakeOrdered. Target = the fingerprint-parity slice, so the
      //      fit sees both corpora at every scale. ----
      import graft.operators.{ImportanceResampler, TextAnalysis}
      val raw1 = scaled(base, 10).repartition(16).persist()
      val raw10 = scaled(base, 100).repartition(16).persist()
      val target = raw1.where(pmod(
        TextAnalysis.portableFingerprint(col("text")), lit(4L)) === 0L)
        .persist()
      val (n1, n10, nt) = (raw1.count(), raw10.count(), target.count())
      val chars10 = raw10.agg(sum(length(col("text")))).head.getLong(0)
      def fit(raw: DataFrame): (Double, ImportanceResampler.Weights) = {
        val t0 = System.nanoTime()
        val w = ImportanceResampler.fitWeights(target, raw, numBuckets = 1 << 14)
        ((System.nanoTime() - t0) / 1e9, w)
      }
      fit(raw1) // warm
      val (tf1, w) = fit(raw1)
      val (tf10, _) = fit(raw10)
      def selectPoint(): Double = {
        val t0 = System.nanoTime()
        ImportanceResampler.selectTopK(raw10, w, 1000, "doc_id").count()
        (System.nanoTime() - t0) / 1e9
      }
      selectPoint() // warm
      val tsel = selectPoint()
      raw1.unpersist(); raw10.unpersist(); target.unpersist()
      val mb10 = chars10 / 1e6
      println(f"""{"dsir":{"n_raw_1x":$n1,"n_raw_10x":$n10,"n_target":$nt,""" +
        f""""buckets":${1 << 14},"fit_1x_s":$tf1%.2f,"fit_10x_s":$tf10%.2f,""" +
        f""""fit_scaling_x":${tf10 / tf1}%.1f,"select_mb":$mb10%.1f,""" +
        f""""select_s":$tsel%.2f,"select_mb_s":${mb10 / tsel}%.0f}}""")
    }
    spark.stop()
  }
}
