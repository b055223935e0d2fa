package graft

import org.apache.spark.sql.functions._

import graft.operators.ImportanceResampler

/** DSIR importance resampling: weight fitting against hand arithmetic,
  * map-only scoring, target-likeness of the selection, replay
  * stability, and the deterministic Gumbel draw.
  */
class ImportanceResamplerSpec extends SparkSpecBase {
  import spark.implicits._

  private val D = 8
  // the shared portable token hash (Functions.portableTokenHash), mod D
  private def bucket(t: String): Int = {
    var h = 0L
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h = (h * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    (h % D).toInt
  }

  test("fitWeights matches the add-alpha log-ratio arithmetic") {
    val target = Seq((1L, "aa aa bb")).toDF("doc_id", "text")
    val raw = Seq((1L, "aa bb bb cc")).toDF("doc_id", "text")
    val w = ImportanceResampler.fitWeights(target, raw, D)
    // expected: per-bucket occurrence counts with add-1 smoothing over D —
    // built by SUMMING per-token streams (tokens may share a bucket at
    // D=8: "aa" and "cc" do under the polynomial hash)
    def counts(tokens: Seq[String]): Map[Int, Long] =
      tokens.groupBy(bucket).map { case (b, ts) => b -> ts.size.toLong }
        .withDefaultValue(0L)
    val tCnt = counts(Seq("aa", "aa", "bb"))
    val rCnt = counts(Seq("aa", "bb", "bb", "cc"))
    val (logT, logR) = (math.log(3.0 + D), math.log(4.0 + D))
    for (b <- 0 until D) {
      val expected = (math.log(tCnt(b) + 1.0) - logT) - (math.log(rCnt(b) + 1.0) - logR)
      assert(math.abs(w.w(b) - expected) < 1e-15, s"bucket $b")
    }
  }

  test("scoreDocs: token-order fold of the weight array; empty doc scores 0") {
    val target = Seq((1L, "aa aa bb")).toDF("doc_id", "text")
    val raw = Seq((1L, "aa bb bb cc")).toDF("doc_id", "text")
    val w = ImportanceResampler.fitWeights(target, raw, D)
    val scored = ImportanceResampler.scoreDocs(
      Seq((1L, "aa cc"), (2L, "")).toDF("doc_id", "text"), w)
    val m = scored.collect().map(r => r.getLong(0) -> r.getAs[Double]("logw")).toMap
    assert(math.abs(m(1L) - (w.w(bucket("aa")) + w.w(bucket("cc")))) < 1e-15)
    assert(m(2L) == 0.0)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be map-only:\n$plan")
    // codegen witness over a real scan (a local Seq constant-folds to
    // LocalTableScan): one graft_token_fold_d scalar inside a
    // WholeStageCodegen stage, no interpreted HOF fold left
    val filePlan = ImportanceResampler.scoreDocs(
      graft.sources.Tables.load(spark, sfDir, "documents"), w)
      .queryExecution.executedPlan.toString
    assert(filePlan.contains("graft_token_fold_d"),
      s"expected the codegen fold:\n$filePlan")
    assert(!filePlan.contains("aggregate(") && !filePlan.contains("lambdafunction"),
      s"scoring must not fall back to the interpreted HOF:\n$filePlan")
    assert(filePlan.contains("*("),
      s"scoring must stay inside WholeStageCodegen:\n$filePlan")
  }

  test("selection prefers target-like documents and is partitioning-stable") {
    val target = (0 until 20).map(i => (i.toLong, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val raw = ((0 until 30).map(i => (i.toLong, "the quick brown fox jumps")) ++
      (30 until 60).map(i => (i.toLong, "zzz qqq kkk vvv www"))).toDF("doc_id", "text")
    val w = ImportanceResampler.fitWeights(target, raw, 32)
    val top = ImportanceResampler.selectTopK(raw, w, 30, "doc_id")
    val ids = top.select("doc_id").as[Long].collect().toSet
    assert(ids == (0 until 30).map(_.toLong).toSet,
      "top-30 must be exactly the target-like slice")
    val reTop = ImportanceResampler.selectTopK(raw.repartition(7), w, 30, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(reTop == top.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "ranks must not depend on partitioning")
  }

  test("gumbel draw: deterministic, finite, seed-decorrelated") {
    // target == raw ⇒ every bucket weight is EXACTLY 0, so the top-k key
    // is pure Gumbel noise — isolating the draw itself. Token lengths
    // grow with the id, so every doc's content fingerprint (the noise
    // input) is distinct.
    val raw = (0 until 40).map(i => (i.toLong, "w" + "x" * i))
      .toDF("doc_id", "text")
    val w = ImportanceResampler.fitWeights(raw, raw, 32)
    assert(w.w.forall(_ == 0.0), "target == raw must zero every weight")
    def run(seed: Long) = ImportanceResampler
      .selectTopK(raw, w, 15, "doc_id", gumbelSeed = Some(seed))
      .select("doc_id").as[Long].collect().toSeq
    assert(run(3L) == run(3L), "same seed must replay identically")
    assert(run(3L) != run(4L), "different seeds must decorrelate the draw")
    val keys = ImportanceResampler.scoreDocs(raw, w)
      .withColumn("g", col("logw") + lit(0.0))
      .collect()
    assert(keys.forall(r => !r.getAs[Double]("logw").isNaN))
  }

  test("bucketCounts totals equal the token stream; loud parameter refusal") {
    val docs = Seq((1L, "a b c"), (2L, "a a")).toDF("doc_id", "text")
    val total = ImportanceResampler.bucketCounts(docs, 16)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == 5L)
    intercept[IllegalArgumentException] {
      ImportanceResampler.fitWeights(docs, docs, 1)
    }
    intercept[IllegalArgumentException] {
      ImportanceResampler.fitWeights(docs, docs, 16, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      ImportanceResampler.selectTopK(docs,
        ImportanceResampler.fitWeights(docs, docs, 16), 0, "doc_id")
    }
  }
}
