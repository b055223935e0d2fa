package graft

import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.operators.FrequencySketch
import graft.sources.Tables

/** Count–min sketch: upper-bound property, exactness at generous width,
  * merge ≡ union, partitioning invariance.
  */
class FrequencySketchSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  private def trueCounts = docs
    .select(explode(filter(F.tokens(col("text")), t => length(t) > 0)).as("token"))
    .groupBy("token").count()

  test("estimates are upper bounds everywhere; exact at generous width; tight width overestimates somewhere") {
    val wide = FrequencySketch.tokenSketch(docs, seed = 9L, depth = 4,
      width = 1 << 14)
    val est = FrequencySketch.estimateTokens(trueCounts, wide, "token")
    assert(est.where(col("est") < col("count")).count() == 0,
      "count-min must never underestimate")
    assert(est.where(col("est") =!= col("count")).count() == 0,
      "at 4×2^14 counters for this vocabulary every estimate should be exact")
    val tight = FrequencySketch.tokenSketch(docs, seed = 9L, depth = 3,
      width = 16)
    val estT = FrequencySketch.estimateTokens(trueCounts, tight, "token")
    assert(estT.where(col("est") < col("count")).count() == 0)
    assert(estT.where(col("est") > col("count")).count() > 0,
      "3×16 counters must collide for this vocabulary")
  }

  test("sketch is partitioning-invariant and mergeSketches(halves) == whole") {
    val a = FrequencySketch.tokenSketch(docs, seed = 3L, depth = 3, width = 256)
    val b = FrequencySketch.tokenSketch(
      docs.orderBy(rand(7)).repartition(5), seed = 3L, depth = 3, width = 256)
    assert(a.select("grid", "total_tokens").exceptAll(
      b.select("grid", "total_tokens")).isEmpty)
    val merged = FrequencySketch.mergeSketches(
      FrequencySketch.tokenSketch(docs.where(col("doc_id") % 2 === 0),
        seed = 3L, depth = 3, width = 256),
      FrequencySketch.tokenSketch(docs.where(col("doc_id") % 2 =!= 0),
        seed = 3L, depth = 3, width = 256))
    assert(merged.select("grid", "total_tokens").exceptAll(
      a.select("grid", "total_tokens")).isEmpty,
      "element-wise sum of disjoint-slice sketches must equal the union's sketch")
    intercept[IllegalArgumentException] {
      FrequencySketch.mergeSketches(a,
        FrequencySketch.tokenSketch(docs, seed = 3L, depth = 3, width = 512))
        .collect()
    }
  }

  test("estimateTokens is map-only against the broadcast grid; bounds are loud") {
    val sketch = FrequencySketch.tokenSketch(docs, depth = 3, width = 256)
    val keys = Seq("the", "value").toDF("token")
    val plan = FrequencySketch.estimateTokens(keys, sketch, "token")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException] {
      FrequencySketch.tokenSketch(docs, depth = 0)
    }
    intercept[IllegalArgumentException] {
      FrequencySketch.tokenSketch(docs, width = 4)
    }
  }

  test("approxTopTokens: full-sample flavor recovers the exact top-k; sampled flavor is partitioning-stable") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    // generous width → estimates exact → top-k == exact top-k at frac 1.0
    val top = FrequencySketch.approxTopTokens(docs, 10, seed = 3L,
      depth = 4, width = 1 << 18, sampleFrac = 1.0)
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("est"))).toSeq
    val exact = docs
      .select(explode(filter(graft.functions.Functions.tokens(col("text")),
        t => length(t) > 0)).as("token"))
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == exact, s"full-sample approx must equal exact top-k:\n$top\nvs\n$exact")
    val s1 = FrequencySketch.approxTopTokens(docs, 10, seed = 3L,
      depth = 4, width = 1 << 14, sampleFrac = 0.3, sampleSeed = 9L).collect().toSeq
    val s2 = FrequencySketch.approxTopTokens(docs.repartition(13), 10, seed = 3L,
      depth = 4, width = 1 << 14, sampleFrac = 0.3, sampleSeed = 9L).collect().toSeq
    assert(s1 == s2, "sampled candidates must not depend on partitioning")
    intercept[IllegalArgumentException] {
      FrequencySketch.approxTopTokens(docs, 10, sampleFrac = 0.0)
    }
  }

  test("the corpus pass is lambda-free: empty-token drop is a codegen Filter after the explode, not an ArrayFilter HOF") {
    val plan = FrequencySketch.tokenSketch(docs, depth = 3, width = 256)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction") && !plan.contains("filter("),
      plan)
  }

  test("hash_version rides the sketch row and gates every probe: stale or version-less artifacts fail loudly") {
    val sketch = FrequencySketch.tokenSketch(docs, depth = 3, width = 256)
    assert(sketch.select("hash_version").head.getInt(0) == F.TokenHashVersion)
    val keys = Seq("the").toDF("token")
    // a sketch persisted under an older hash arithmetic (doctored version)
    val stale = sketch.withColumn("hash_version", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      FrequencySketch.estimateTokens(keys, stale, "token").collect()
    }
    assert(e1.getMessage.contains("token-hash v1"), e1.getMessage)
    // a pre-versioning artifact (column absent entirely)
    val versionless = sketch.drop("hash_version")
    val e2 = intercept[IllegalArgumentException] {
      FrequencySketch.estimateTokens(keys, versionless, "token").collect()
    }
    assert(e2.getMessage.contains("predates"), e2.getMessage)
    intercept[IllegalArgumentException] {
      FrequencySketch.mergeSketches(sketch, stale).collect()
    }
    // merge of matching sketches carries the version through
    assert(FrequencySketch.mergeSketches(sketch, sketch)
      .select("hash_version").head.getInt(0) == F.TokenHashVersion)
  }

  test("geometryFor: the (epsilon, delta) guarantee sizes the grid; untenable epsilon is loud") {
    assert(FrequencySketch.geometryFor(0.001, 0.01) == ((5, 2719)))
    assert(FrequencySketch.geometryFor(0.3, 0.5) == ((1, 10)))
    intercept[IllegalArgumentException] { FrequencySketch.geometryFor(1e-7, 0.01) }
    intercept[IllegalArgumentException] { FrequencySketch.geometryFor(0.0, 0.01) }
  }
}
