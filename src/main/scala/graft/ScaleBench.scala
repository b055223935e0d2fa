package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private final class ShuffleBytesListener extends SparkListener {
    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
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
    val candidates = Dedup.minHashCandidatePairs(sigs, nBands, rowsPerBand, maxBucket).count()
    val verified = Dedup.minHashLshPairs(docs, "doc_id", numHashes = numHashes,
      threshold = threshold, maxBucket = maxBucket).count()
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

  def main(args: Array[String]): Unit = {
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
    val small = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    measure(spark, "sf0.01", small, threshold, maxBucket)
    val (n1, c1) = measure(spark, "sf0.1", base, threshold, maxBucket)
    val (n10, c10) = measure(spark, "sf0.1 x10", scaled(base, 10), threshold, maxBucket)
    val perDoc1 = c1.toDouble / n1
    val perDoc10 = c10.toDouble / n10
    val ratio = perDoc10 / perDoc1
    println(f"""{"linearity":{"cand_per_doc_1x":$perDoc1%.3f,"cand_per_doc_10x":$perDoc10%.3f,""" +
      f""""ratio":$ratio%.2f,"linear_ok":${ratio <= 2.0}}}""")
    spark.stop()
  }
}
