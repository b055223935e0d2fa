package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearClassifier
import graft.sources.Tables

/** Integer batch perceptron: learns separable data, is bit-deterministic
  * under repartitioning, scores map-only.
  */
class LinearClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  // clearly separable synthetic corpus: +1 docs carry "excellent prose",
  // −1 docs carry "spam junk", shared filler words on both sides
  private def synth = {
    val pos = (0L until 40L).map(i =>
      (i, 1, s"excellent prose quality writing filler$i common words"))
    val neg = (40L until 80L).map(i =>
      (i, -1, s"spam junk clickbait garbage filler$i common words"))
    (pos ++ neg).toDF("doc_id", "y", "text")
  }

  test("perceptron separates a separable corpus (train accuracy 100%) and the margin criterion counts ties") {
    val docs = synth
    val model = LinearClassifier.trainPerceptron(docs, "doc_id", "y",
      numBuckets = 64, epochs = 8)
    val scored = LinearClassifier.score(docs, model)
    val acc = scored.where(col("pred") === col("y")).count()
    assert(acc == 80, s"separable data must reach 100% train accuracy, got $acc/80")
  }

  test("training is bit-deterministic under repartitioning and row order") {
    val docs = synth
    val a = LinearClassifier.trainPerceptron(docs, "doc_id", "y",
      numBuckets = 64, epochs = 5)
    val b = LinearClassifier.trainPerceptron(
      docs.orderBy(rand(13)).repartition(7), "doc_id", "y",
      numBuckets = 64, epochs = 5)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias,
      "integer epoch sums must be partitioning-invariant")
  }

  test("voted flavor: epochs=1 voted == final; multi-epoch voted still separates and stays deterministic") {
    val docs = synth
    val f1 = LinearClassifier.trainPerceptron(docs, "doc_id", "y", 64, 1)
    val v1 = LinearClassifier.trainVotedPerceptron(docs, "doc_id", "y", 64, 1)
    assert(f1.weights.toSeq == v1.weights.toSeq && f1.bias == v1.bias)
    val v8 = LinearClassifier.trainVotedPerceptron(docs, "doc_id", "y", 64, 8)
    val acc = LinearClassifier.score(docs, v8)
      .where(col("pred") === col("y")).count()
    assert(acc == 80, s"voted flavor must also separate, got $acc/80")
    val v8b = LinearClassifier.trainVotedPerceptron(
      docs.repartition(5), "doc_id", "y", 64, 8)
    assert(v8.weights.toSeq == v8b.weights.toSeq && v8.bias == v8b.bias)
  }

  test("bigram features separate word-ORDER classes that unigrams cannot") {
    // identical bags of words, opposite order: only pair features can
    // tell them apart. The trailing marker is SHARED across the pair
    // (x$k on both sides) so the unigram bags really are identical —
    // a class-unique token would let unigrams memorize the classes.
    val docs = ((0L until 30L).map(i => (i, 1, s"good service bad none x$i")) ++
      (30L until 60L).map(i => (i, -1, s"bad service good none x${i - 30}")))
      .toDF("doc_id", "y", "text")
    val uni = LinearClassifier.trainPerceptron(docs, "doc_id", "y",
      numBuckets = 256, epochs = 10)
    val uniAcc = LinearClassifier.score(docs, uni)
      .where(col("pred") === col("y")).count()
    assert(uniAcc <= 40, s"unigram bags are identical — accuracy $uniAcc/60 should stay near chance")
    val bi = LinearClassifier.trainPerceptron(docs, "doc_id", "y",
      numBuckets = 256, epochs = 10, bigrams = true)
    val biAcc = LinearClassifier.score(docs, bi)
      .where(col("pred") === col("y")).count()
    assert(biAcc == 60, s"bigram features must separate word order, got $biAcc/60")
    // scoring refuses nothing: a unigram model still scores the same docs
    assert(!uni.bigrams && bi.bigrams)
  }

  test("features: bias row per doc, empty text gets only the bias feature") {
    val docs = Seq((1L, "a b a"), (2L, "")).toDF("doc_id", "text")
    val f = LinearClassifier.features(docs, "doc_id", numBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(f.count(_._1 == 2L) == 1 && f.filter(_._1 == 2L).head._2 == -1L)
    assert(f.filter(_._1 == 1L).map(_._3).sum == 4L) // 3 tokens + bias
  }

  test("scoring is map-only and fully codegen: no exchange, no interpreted HOF") {
    val docs = Tables.load(spark, sfDir, "documents")
    val model = LinearClassifier.Model(new Array[Long](32), 1L, 32, 1)
    val plan = LinearClassifier.score(docs, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("graft_token_fold"), plan)
    assert(!plan.contains("aggregate(") && !plan.contains("lambdafunction"), plan)
    assert(plan.contains("*("), s"scoring must stay inside WholeStageCodegen:\n$plan")
  }

  test("qualityFilter keeps exactly the +1-predicted slice; config bounds are loud") {
    val docs = synth
    val kept = LinearClassifier.qualityFilter(docs, docs, "doc_id", "y",
      numBuckets = 64, epochs = 8)
    assert(kept.select("doc_id").as[Long].collect().toSet == (0L until 40L).toSet)
    intercept[IllegalArgumentException] {
      LinearClassifier.trainPerceptron(docs, "doc_id", "y",
        numBuckets = 1, epochs = 1)
    }
    intercept[IllegalArgumentException] {
      LinearClassifier.trainPerceptron(docs, "doc_id", "y",
        numBuckets = 64, epochs = 0)
    }
  }

  test("the feature stream is lambda-free (unigram and bigram): no ArrayFilter HOF on the corpus-sized bucket pass") {
    val docs = synth
    Seq(false, true).foreach { bg =>
      val plan = LinearClassifier.features(docs, "doc_id", 64,
          bigrams = bg).queryExecution.executedPlan.toString
      assert(!plan.contains("lambdafunction") && !plan.contains("filter("),
        s"bigrams=$bg:\n$plan")
    }
  }

  test("model round-trips through its persisted row; hash_version gates score and load") {
    val docs = synth
    val model = LinearClassifier.trainPerceptron(docs, "doc_id", "y",
      numBuckets = 64, epochs = 4, bigrams = true)
    assert(model.hashVersion == graft.functions.Functions.TokenHashVersion)
    val row = LinearClassifier.modelToRow(spark, model)
    val back = LinearClassifier.modelFromRow(row)
    assert(back == model.copy(weights = back.weights) &&
      back.weights.toSeq == model.weights.toSeq)
    val a = LinearClassifier.score(docs, model).select("doc_id", "score")
    val b = LinearClassifier.score(docs, back).select("doc_id", "score")
    assert(a.collect().toSeq == b.collect().toSeq)
    // a model persisted under the old hash arithmetic must refuse to score
    val stale = model.copy(hashVersion = 1)
    val e1 = intercept[IllegalArgumentException] {
      LinearClassifier.score(docs, stale)
    }
    assert(e1.getMessage.contains("token-hash v1"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      LinearClassifier.modelFromRow(row.withColumn("hash_version", lit(1)))
    }
    assert(e2.getMessage.contains("token-hash v1"), e2.getMessage)
    // a pre-versioning row (column absent) is equally loud
    val e3 = intercept[IllegalArgumentException] {
      LinearClassifier.modelFromRow(row.drop("hash_version"))
    }
    assert(e3.getMessage.contains("predates"), e3.getMessage)
  }
}
