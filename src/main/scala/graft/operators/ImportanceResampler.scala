package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.{Functions => F}

/** DSIR-shaped importance resampling (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling") — pick the raw-corpus
  * slice whose hashed n-gram distribution looks like a TARGET corpus
  * (a curated reference set), the data-selection step between quality
  * gating and mixing:
  *
  *  1. '''fit''': bag-of-hashed-ngrams generative models of the target
  *     and the raw corpus — two map-side-combined bucket-count
  *     aggregates over [[LinearClassifier.bucketStream]]'s portable
  *     feature hashing (unigrams, optionally fastText-style bigrams),
  *     collected driver-side (the one bounded collect: D ≤ 2^18
  *     buckets, the same weight-vector bound the classifier documents);
  *  2. '''score''': per-document log importance weight
  *     `log w(x) = Σ_f c_f(x)·(log p̂_target(f) − log p̂_raw(f))` with
  *     add-α smoothing — a MAP-ONLY fold of each document's feature
  *     stream against the broadcast weight array, no shuffle (the
  *     classifier-scoring shape);
  *  3. '''select''': top-k by log-weight, optionally Gumbel-perturbed —
  *     the paper's importance RESAMPLING rather than argmax selection.
  *     The Gumbel noise is deterministic: `u` is the salted Knuth-mixed
  *     content fingerprint scaled into (0,1), so the draw is
  *     replay-stable, partitioning-independent and seed-decorrelated
  *     like every sampling decision in this engine. The cut is a
  *     TakeOrdered (k·partitions candidates), never a global sort.
  *
  * Scores are double-valued (log-ratios), so like BM25's log-idf flavor
  * the oracle gates the selected IDS + RANKS under the deterministic
  * (score desc, id) tie-break, not the raw doubles — fixture gaps far
  * exceed any libm ulp divergence (measured in the gate comment).
  */
object ImportanceResampler {

  private val P = 1000000007L
  private val Knuth = 2654435761L

  /** Learned log-ratio weights per bucket (dense, D-sized). */
  final case class Weights(w: Array[Double], numBuckets: Int, alpha: Double,
                           bigrams: Boolean)

  /** Corpus-level feature-bucket counts `(bucket, cnt)` — one
    * map-side-combinable aggregate over the occurrence stream.
    */
  def bucketCounts(corpus: DataFrame, numBuckets: Int,
                   textCol: String = "text",
                   bigrams: Boolean = false): DataFrame =
    LinearClassifier.bucketStream(corpus, Nil, numBuckets, textCol, bigrams)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Fit the importance weights from the target and raw corpora.
    * `alpha` is add-α smoothing over the D buckets (unseen buckets get
    * mass α/(N + αD) — a raw-only feature scores negative, a
    * target-only feature positive, never ±∞).
    */
  def fitWeights(target: DataFrame, raw: DataFrame, numBuckets: Int,
                 alpha: Double = 1.0, textCol: String = "text",
                 bigrams: Boolean = false): Weights = {
    require(numBuckets >= 2 && numBuckets <= (1 << 18),
      s"numBuckets must be in [2, 2^18] (driver holds one double per bucket), got $numBuckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    def counts(corpus: DataFrame): Array[Long] = {
      val arr = new Array[Long](numBuckets)
      bucketCounts(corpus, numBuckets, textCol, bigrams).collect().foreach { r =>
        arr(r.getLong(0).toInt) = r.getLong(1)
      }
      arr
    }
    val t = counts(target)
    val r = counts(raw)
    val logT = math.log(t.sum + alpha * numBuckets)
    val logR = math.log(r.sum + alpha * numBuckets)
    val w = new Array[Double](numBuckets)
    var b = 0
    while (b < numBuckets) {
      w(b) = (math.log(t(b) + alpha) - logT) - (math.log(r(b) + alpha) - logR)
      b += 1
    }
    Weights(w, numBuckets, alpha, bigrams)
  }

  /** Add a `logw` column: the document's log importance weight — a
    * map-only codegen fold of its hashed token stream against the
    * weight array (shipped via `addReferenceObj`, not a plan literal),
    * in token order (deterministic under any partitioning; identical
    * accumulation order to the HOF form it replaced). An empty document
    * scores 0.
    */
  def scoreDocs(docs: DataFrame, weights: Weights,
                textCol: String = "text"): DataFrame =
    docs.withColumn("logw", graft.functions.TextExpressions.token_fold_double(
      col(textCol), weights.w, weights.bigrams))

  /** Deterministic standard-Gumbel draw from the salted content
    * fingerprint: `u = (Knuth-mix(fp + seed) + 1)/(p + 2)` lies strictly
    * inside (0,1), so `−ln(−ln u)` is always finite. Exactly the salted
    * selector arithmetic the samplers share, continued into doubles.
    */
  private[graft] def gumbel(textCol: Column, seed: Long): Column = {
    val s = ((seed % P) + P) % P
    val mix = pmod((TextAnalysis.portableFingerprint(textCol) + lit(s)) * lit(Knuth), lit(P))
    val u = (mix.cast("double") + lit(1.0)) / lit((P + 2).toDouble)
    -log(-log(u))
  }

  /** The k raw documents most target-like: score, optionally perturb
    * with deterministic Gumbel noise (`gumbelSeed` — the paper's
    * resampling; None = plain top-k), cut by (key desc, id asc) as a
    * TakeOrdered. Returns (rank, id, logw).
    */
  def selectTopK(raw: DataFrame, weights: Weights, k: Int, idCol: String,
                 textCol: String = "text",
                 gumbelSeed: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val scored = scoreDocs(raw, weights, textCol)
    val keyed = gumbelSeed match {
      case Some(s) => scored.withColumn("_key", col("logw") + gumbel(col(textCol), s))
      case None => scored.withColumn("_key", col("logw"))
    }
    // orderBy + limit plans as TakeOrderedAndProject (k·partitions
    // candidates, no global sort); the rank window runs over k rows only
    val top = keyed.select(col(idCol), col("_key"), col("logw"))
      .orderBy(col("_key").desc, col(idCol).asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_key").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(idCol), col("logw"))
  }
}
