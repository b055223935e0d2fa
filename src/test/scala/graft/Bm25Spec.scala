package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** BM25: kernel against a hand-computed reference, production log-idf
  * path, determinism and plan hygiene.
  */
class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b"), (2L, "a a c"), (3L, "b b b"), (4L, "c c c c")).toDF("doc_id", "text")

  /** The reference kernel, scalar Scala — same operation order. */
  private def ref(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double,
                  logIdf: Boolean): Double = {
    val rawIdf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val idf = if (logIdf) math.log(rawIdf + 1.0) else rawIdf
    idf * ((tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
  }

  test("scores match the hand-computed kernel exactly (both idf flavors)") {
    val avgdl = (2 + 3 + 3 + 4).toDouble / 4.0
    Seq(true, false).foreach { li =>
      val out = Bm25.scores(docs, "doc_id", Seq("a", "b"), logIdf = li)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expect = Map(
        1L -> (ref(1, 2, 2, 4, avgdl, li) + ref(1, 2, 2, 4, avgdl, li)), // a then b
        2L -> ref(2, 2, 3, 4, avgdl, li),
        3L -> ref(3, 2, 3, 4, avgdl, li))
      assert(out.keySet == expect.keySet, s"logIdf=$li")
      expect.foreach { case (id, s) =>
        assert(out(id) == s, s"doc $id logIdf=$li: ${out(id)} vs $s") }
    }
  }

  test("search ranks by (score desc, doc_id) with a deterministic cut") {
    val top = Bm25.search(docs, "doc_id", Seq("a", "b"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    val all = Bm25.scores(docs, "doc_id", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1).toSeq
    assert(top == all.take(2))
    // identical under repartitioning (fixed fold order)
    val top2 = Bm25.search(docs.repartition(7), "doc_id", Seq("a", "b"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top2 == top)
  }

  test("docs without any query term never appear; empty query refused") {
    val ids = Bm25.scores(docs, "doc_id", Seq("a")).select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
    intercept[IllegalArgumentException] { Bm25.scores(docs, "doc_id", Seq.empty) }
    // an empty corpus is a named error (df is undefined), not an NPE
    intercept[IllegalArgumentException] {
      Bm25.scores(docs.where(lit(false)), "doc_id", Seq("a"))
    }
  }

  test("searchMany: each query's results are bit-identical to the per-query path") {
    val queries = Seq(("q1", "a"), ("q1", "b"), ("q2", "c"), ("q3", "b"))
      .toDF("query_id", "term")
    val batched = Bm25.searchMany(docs, "doc_id", queries, k = 3, logIdf = false)
      .collect()
      .groupBy(_.getString(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    val single = Map(
      "q1" -> Seq("a", "b"), "q2" -> Seq("c"), "q3" -> Seq("b"))
      .map { case (q, ts) =>
        q -> Bm25.search(docs, "doc_id", ts, k = 3, logIdf = false)
          .as[(Long, Double)].collect().toSeq
      }
    assert(batched.keySet == single.keySet)
    single.foreach { case (q, expect) =>
      assert(batched(q) == expect, s"query $q: ${batched(q)} vs $expect")
    }
    // malformed query table refused loudly
    intercept[IllegalArgumentException] {
      Bm25.searchMany(docs, "doc_id", Seq(("x", "y")).toDF("qid", "word"), k = 1)
    }
  }

  test("tokenization is lambda-free: array_remove, not an ArrayFilter HOF, on the corpus passes") {
    val plan = Bm25.scores(docs, "doc_id", Seq("a"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan)
  }

  test("the tf shuffle carries only query-term rows (filter below the aggregate)") {
    val plan = Bm25.scores(docs, "doc_id", Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    // tree strings print children after parents: the term filter must
    // appear below the tf Aggregate and above its Generate (explode) —
    // i.e. the shuffle input is already query-filtered
    val aggAt = plan.indexOf("Aggregate [doc_id")
    val filterAt = plan.indexOf("Filter term", aggAt)
    val genAt = plan.indexOf("Generate explode", aggAt)
    assert(aggAt >= 0 && filterAt >= 0 && genAt >= 0,
      s"missing tf-aggregate/filter/explode markers in plan:\n$plan")
    assert(aggAt < filterAt && filterAt < genAt,
      s"term filter must sit between the tf aggregate and the explode:\n$plan")
  }
}
