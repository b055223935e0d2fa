package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{Functions => F}

/** In-engine training of a linear text-quality classifier — the
  * fastText-shaped "model-based quality filter" stage of a training-data
  * pipeline (CCNet / GPT-3-style: a linear model over hashed
  * bag-of-words features scores every document; the gate keeps the
  * high-scoring slice). Both TRAINING and SCORING run as DataFrame
  * jobs — no single-machine sklearn step with a corpus-sized collect.
  *
  * The learner is the batch perceptron with unit learning rate and
  * INTEGER weights: per epoch, `w += Σ_misclassified y_i·x_i` and
  * `b += Σ y_i` (the bias rides as an implicit always-on feature,
  * bucket −1). Every quantity — token-hash buckets, counts, weights,
  * margins, scores — is exact 64-bit integer arithmetic, so training is
  * bit-reproducible under ANY partitioning (the epoch sums are
  * order-insensitive integer sums) and replayable by another engine:
  * the oracle re-runs all epochs in SQL and must land on identical
  * scores. A float learner (logistic/SGD) trades that determinism away
  * for calibrated probabilities; the perceptron keeps the decision
  * boundary and stays exact.
  *
  * Feature hashing is portable arithmetic over the token
  * ([[graft.functions.Functions.portableTokenHash]]: polyHash over all
  * codepoints, mult 131 mod p — a `list_reduce` in any other engine):
  * bucket(t) = hash(t) mod D, intermediates < 2^63 for any realistic
  * token. Empty tokens are dropped on both sides.
  *
  * Scale shape: features are one explode + one (id, bucket) count
  * aggregate, persisted once and reused by every epoch; an epoch is two
  * aggregates over the labeled set (margins per doc, then deltas per
  * bucket for the misclassified slice) with the current weights
  * broadcast as a literal array — the one bounded collect is the D+1
  * weight vector per epoch (D ≤ 2^18 by contract). Scoring the corpus
  * is MAP-ONLY: a fold over the token array against the broadcast
  * weights, no shuffle at all.
  */
object LinearClassifier {

  val P: Long = 1000000007L

  /** Trained model: dense weights by bucket, integer bias, config.
    * `bigrams` records whether adjacent-token-pair features were hashed
    * in alongside unigrams (fastText's word-n-gram trick — scoring must
    * extract the same feature set). `hashVersion` pins the token-hash
    * arithmetic the buckets were computed under
    * ([[graft.functions.Functions.TokenHashVersion]]): a model persisted
    * under one hash and scored under another maps every token to the
    * wrong bucket — [[score]] `require()`s the match so stale artifacts
    * fail loudly instead of mis-scoring.
    */
  case class Model(weights: Array[Long], bias: Long, numBuckets: Int,
                   epochs: Int, bigrams: Boolean = false,
                   hashVersion: Int = F.TokenHashVersion) {
    require(weights.length == numBuckets)
  }

  /** Persist a model as a self-describing one-row DataFrame
    * `(weights, bias, num_buckets, epochs, bigrams, hash_version)` —
    * parquet-round-trippable; [[modelFromRow]] restores it with the
    * hash-version guard.
    */
  def modelToRow(spark: org.apache.spark.sql.SparkSession,
                 model: Model): DataFrame = {
    import spark.implicits._
    Seq((model.weights.toSeq, model.bias, model.numBuckets, model.epochs,
      model.bigrams, model.hashVersion))
      .toDF("weights", "bias", "num_buckets", "epochs", "bigrams",
        "hash_version")
  }

  /** Restore a persisted model row. A missing `hash_version` column
    * (pre-versioning artifact) or a value differing from this build's
    * [[graft.functions.Functions.TokenHashVersion]] is a loud error —
    * every bucket lookup would be silently wrong.
    */
  def modelFromRow(df: DataFrame): Model = {
    require(df.columns.contains("hash_version"),
      "model row has no hash_version column — it predates token-hash " +
        s"versioning (current v${F.TokenHashVersion}); retrain the model")
    val rows = df.select("weights", "bias", "num_buckets", "epochs",
      "bigrams", "hash_version").collect()
    require(rows.length == 1, s"expected one model row, got ${rows.length}")
    val r = rows(0)
    val m = Model(r.getSeq[Long](0).toArray, r.getLong(1), r.getInt(2),
      r.getInt(3), r.getBoolean(4), r.getInt(5))
    require(m.hashVersion == F.TokenHashVersion,
      s"model was trained under token-hash v${m.hashVersion} but this " +
        s"build hashes with v${F.TokenHashVersion} — scores would be " +
        "silently wrong; retrain the model")
    m
  }

  /** Portable token→bucket hash (pure codegen arithmetic; the shared
    * [[graft.functions.Functions.portableTokenHash]] reduced mod D).
    */
  def tokenBucket(t: Column, numBuckets: Int): Column =
    pmod(F.portableTokenHash(t), lit(numBuckets.toLong))

  /** Adjacent-pair (bigram) bucket: `(th(a)·131 + th(b)) mod p mod D` —
    * both token hashes < p ≈ 1e9, so the combine stays far below 2^63
    * and replays exactly in any engine.
    */
  def bigramBucket(a: Column, b: Column, numBuckets: Int): Column =
    pmod(pmod(F.portableTokenHash(a) * 131L + F.portableTokenHash(b),
      lit(P)), lit(numBuckets.toLong))

  /** The non-empty token ARRAY (bigram pairing needs the positions):
    * `array_remove` is a codegen collection op, unlike the
    * `filter(…, len > 0)` HOF it replaced (ArrayFilter is
    * CodegenFallback, and this feeds [[ImportanceResampler]]'s
    * corpus-level bucket counts, not just the bounded labeled set).
    */
  private def cleanTokens(textCol: String): Column =
    array_remove(F.tokens(col(textCol)), "")

  /** One row per feature OCCURRENCE: `carryCols ++ (bucket)` — the
    * hashed unigram (and optionally fastText-style bigram) stream both
    * the classifier's per-doc features and [[ImportanceResampler]]'s
    * corpus-level bucket counts aggregate over. Empty tokens drop AFTER
    * the explode (a codegen Filter, no array lambda).
    */
  private[operators] def bucketStream(docs: DataFrame, carryCols: Seq[String],
                                      numBuckets: Int, textCol: String,
                                      bigrams: Boolean): DataFrame = {
    val carry = carryCols.map(col)
    val tok = docs
      .select(carry :+ explode(F.tokens(col(textCol))).as("_t"): _*)
      .where(length(col("_t")) > 0)
      .select(carry :+ tokenBucket(col("_t"), numBuckets).as("bucket"): _*)
    if (!bigrams) tok
    else tok.unionByName(docs
      .select(carry :+ cleanTokens(textCol).as("_ts"): _*)
      .where(size(col("_ts")) >= 2)
      .select(carry ++ Seq(col("_ts"),
        explode(sequence(lit(1), size(col("_ts")) - 1)).as("_i")): _*)
      .select(carry :+ bigramBucket(
        element_at(col("_ts"), col("_i")),
        element_at(col("_ts"), col("_i") + 1), numBuckets).as("bucket"): _*))
  }

  /** Sparse hashed features `(idCol, bucket, cnt)` plus the implicit
    * bias feature (bucket −1, cnt 1) per document; with `bigrams`,
    * adjacent-pair buckets are hashed into the SAME bucket space
    * (fastText-style).
    */
  def features(docs: DataFrame, idCol: String, numBuckets: Int,
               textCol: String = "text",
               bigrams: Boolean = false): DataFrame = {
    val counted = bucketStream(docs, Seq(idCol), numBuckets, textCol, bigrams)
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val bias = docs.select(col(idCol), lit(-1L).as("bucket"),
      lit(1L).as("cnt"))
    counted.unionByName(bias)
  }

  /** Train `epochs` batch-perceptron epochs over `labeled` (labelCol is
    * ±1). Deterministic: same data + config ⇒ bit-identical model, on
    * any cluster layout.
    */
  def trainPerceptron(labeled: DataFrame, idCol: String, labelCol: String,
                      numBuckets: Int, epochs: Int,
                      textCol: String = "text",
                      bigrams: Boolean = false): Model =
    trainImpl(labeled, idCol, labelCol, numBuckets, epochs, textCol, bigrams)._1

  /** The VOTED flavor: score with Σ_e w_e (the weight vector after each
    * epoch, summed) — the integer-preserving form of the averaged
    * perceptron (averaging divides by E; summing keeps the same decision
    * boundary and stays exact). Less sensitive to whichever epoch the
    * loop stopped on, at zero extra job cost.
    */
  def trainVotedPerceptron(labeled: DataFrame, idCol: String,
                           labelCol: String, numBuckets: Int, epochs: Int,
                           textCol: String = "text",
                           bigrams: Boolean = false): Model =
    trainImpl(labeled, idCol, labelCol, numBuckets, epochs, textCol, bigrams)._2

  private def trainImpl(labeled: DataFrame, idCol: String, labelCol: String,
                        numBuckets: Int, epochs: Int,
                        textCol: String, bigrams: Boolean = false): (Model, Model) = {
    require(numBuckets >= 2 && numBuckets <= (1 << 18),
      s"numBuckets must be in [2, 2^18] (the driver holds one long per bucket), got $numBuckets")
    require(epochs >= 1 && epochs <= 64, s"epochs must be in [1,64], got $epochs")
    // hash-partition the feature table by doc id ONCE before persisting
    // (r15, guide §2.4): every epoch both groups by (id, _y) and joins the
    // misclassified ids back on id — with an unpartitioned cache each of
    // the E epochs re-shuffles the full feature table twice; partitioned
    // on a subset of both keys, the cached layout satisfies the epoch
    // aggregates' and join's distribution, so epochs run exchange-free on
    // the persisted partitions. Pinned count (Dedup.fanout) so AQE cannot
    // coalesce the CACHED layout to 1-2 partitions and serialize every
    // epoch's compute. Integer sums — bit-identical under any layout.
    val feats = Dedup.fanout(
      features(labeled, idCol, numBuckets, textCol, bigrams)
        .join(labeled.select(col(idCol), col(labelCol).cast(LongType).as("_y")),
          Seq(idCol)), col(idCol))
      .persist()
    try {
      var w = new Array[Long](numBuckets)
      var b = 0L
      val vw = new Array[Long](numBuckets)
      var vb = 0L
      var e = 0
      while (e < epochs) {
        // margin_i = y_i · (Σ w[bucket]·cnt + b); the weight array ships
        // via addReferenceObj (ONE serialized object per epoch plan),
        // not a 2^18-element literal in the expression tree
        val weightOf = when(col("bucket") === -1L, lit(b))
          .otherwise(graft.functions.TextExpressions.long_array_get(
            col("bucket"), w))
        val deltas = feats
          .groupBy(col(idCol), col("_y"))
          .agg(sum(col("cnt") * weightOf).as("_dot"))
          .where(col("_y") * col("_dot") <= 0) // misclassified (ties count)
          .select(col(idCol))
          .join(feats, Seq(idCol))
          .groupBy(col("bucket"))
          .agg(sum(col("_y") * col("cnt")).as("_d"))
          // bounded collect: ≤ numBuckets+1 rows — the weight vector
          .collect()
        val next = w.clone()
        deltas.foreach { r =>
          val bkt = r.getLong(0)
          if (bkt == -1L) b += r.getLong(1)
          else next(bkt.toInt) += r.getLong(1)
        }
        w = next
        var i = 0
        while (i < numBuckets) { vw(i) += w(i); i += 1 }
        vb += b
        e += 1
      }
      (Model(w, b, numBuckets, epochs, bigrams),
        Model(vw, vb, numBuckets, epochs, bigrams))
    } finally feats.unpersist()
  }

  /** Score + classify every document MAP-ONLY: one codegen pass over the
    * text ([[graft.functions.TextExpressions.TokenFoldLong]] — weights
    * ship via `addReferenceObj`, not a plan literal; the whole stage
    * stays inside WholeStageCodegen). The fold is an integer sum, so the
    * score is identical in any engine. `pred` is +1 iff score > 0,
    * matching the training convention that a zero margin is
    * misclassified.
    */
  def score(docs: DataFrame, model: Model,
            textCol: String = "text"): DataFrame = {
    require(model.hashVersion == F.TokenHashVersion,
      s"model was trained under token-hash v${model.hashVersion} but " +
        s"this build hashes with v${F.TokenHashVersion} — scores would " +
        "be silently wrong; retrain the model")
    docs
      .withColumn("score", graft.functions.TextExpressions.token_fold_long(
        col(textCol), model.weights, model.bias, model.bigrams))
      .withColumn("pred", when(col("score") > 0, 1).otherwise(-1))
  }

  /** Train on `labeled`, keep the corpus slice predicted +1 — the
    * model-based quality gate in one call.
    */
  def qualityFilter(docs: DataFrame, labeled: DataFrame, idCol: String,
                    labelCol: String, numBuckets: Int = 1 << 12,
                    epochs: Int = 8, textCol: String = "text"): DataFrame = {
    val model = trainPerceptron(labeled, idCol, labelCol, numBuckets,
      epochs, textCol)
    score(docs, model, textCol).where(col("pred") === 1)
      .drop("score", "pred")
  }
}
