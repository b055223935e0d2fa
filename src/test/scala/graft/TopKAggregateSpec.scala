package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate
import graft.operators.Similarity
import graft.sources.Tables

class TopKAggregateSpec extends SparkSpecBase {

  test("topk_by matches the row_number window form on real embeddings") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = embs.where(col("vec_id") < 5)
    // windowed reference implementation, same ordering/tie-break contract
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", graft.functions.Functions.cosine(col("qv"), col("cv")))
      // multiple input partitions so partial buffers serialize + merge
      .repartition(7)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val expected = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val got = Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
    assert(got.size == 25)
  }

  test("ties on score break by id ascending, identical to the window rule") {
    import spark.implicits._
    // 10 rows per group, all score ties within a pair of score levels
    val df = Seq.tabulate(20)(i => (i % 2, if (i < 10) 2.0 else 1.0, i.toLong))
      .toDF("g", "score", "id").repartition(5)
    val out = df.groupBy("g")
      .agg(TopKAggregate.topk_by(col("score"), col("id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("g"), col("i"), col("e.id"), col("e.score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // group 0: score-2.0 ids are {0,2,4,6,8} -> top3 by id asc = 0,2,4
    assert(out == Set(
      (0, 0, 0L, 2.0), (0, 1, 2L, 2.0), (0, 2, 4L, 2.0),
      (1, 0, 1L, 2.0), (1, 1, 3L, 2.0), (1, 2, 5L, 2.0)))
  }

  test("string ids round-trip the partial-buffer serialization") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i => ("g", i / 100.0, f"doc$i%03d"))
      .toDF("g", "score", "id").repartition(6)
    val out = df.groupBy("g")
      .agg(TopKAggregate.topk_by(col("score"), col("id"), 2).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select(col("e.id"), col("e.score"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toList
    assert(out == List(("doc299", 2.99), ("doc298", 2.98)))
  }

  test("NaN scores rank first (window parity) and never poison the worst-entry gate") {
    import spark.implicits._
    // NaN rows arrive FIRST so a broken comparator would install NaN as the
    // worst-entry gate and reject every later candidate; 400 rows per
    // partition exceed the compact trigger, exercising sortWith under NaN
    // (the old `>`/`==` comparator was intransitive there — TimSort could
    // throw "Comparison method violates its general contract")
    val rows = Seq.tabulate(3)(i => ("g", Double.NaN, 9000L + i)) ++
      Seq.tabulate(400)(i => ("g", i / 100.0, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(4)
    val got = df.groupBy("g")
      .agg(TopKAggregate.topk_by(col("score"), col("id"), 5).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select(col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // Spark's double ordering sorts NaN above every value: the window form
    // ranked the NaN rows first (id asc within the NaN tie), then the best
    // finite scores — the aggregate must match exactly
    assert(got.map(_._1) == List(9000L, 9001L, 9002L, 399L, 398L))
    assert(got.take(3).forall(_._2.isNaN) && !got(3)._2.isNaN)
  }

  test("groups smaller than k return all rows, ranked") {
    import spark.implicits._
    val df = Seq((1, 0.5, 10L), (1, 0.9, 11L)).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(TopKAggregate.topk_by(col("score"), col("id"), 5).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select(col("e.id")).as[Long].collect().toList
    assert(out == List(11L, 10L))
  }
}
