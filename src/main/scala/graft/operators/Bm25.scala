package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** BM25 lexical retrieval over the corpus — the term-statistics
  * complement to the embedding ANN path: data-selection and
  * decontamination pipelines rank corpus documents against reference
  * text lexically (importance resampling, contamination triage, quality
  * probes) long before any embedding exists.
  *
  * Relational shape (the scale story):
  *
  *  - term frequencies come from ONE explode → group pass, with the
  *    query-term filter applied BEFORE the group so the shuffle carries
  *    only query-term rows (|query| terms × matching docs, not the
  *    corpus token stream);
  *  - document lengths are a MAP-ONLY column
  *    (`size(array_remove(split(...), ""))` — no explode, no shuffle);
  *  - document frequencies and corpus scalars (N, avgdl) are tiny
  *    aggregates broadcast into the scoring join;
  *  - per-document scores fold the term contributions in SORTED term
  *    order — a fixed fold order, which together with the all-basic-IEEE
  *    kernel below makes the score BIT-REPRODUCIBLE across engines and
  *    partitionings;
  *  - top-k is a TakeOrdered, no global sort.
  *
  * Scoring kernel: the classic Robertson weighting
  * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`. With
  * `logIdf = true` (production default) idf is `ln(1 + (N−df+0.5)/(df+0.5))`;
  * with `logIdf = false` the raw odds ratio `(N−df+0.5)/(df+0.5)` is used
  * — rank-equivalent per term, and built ONLY from IEEE basic ops
  * (+,−,×,÷ are correctly rounded everywhere; `ln` is not), which is what
  * lets the oracle gate (`q_bm25`) compare scores bit-for-bit instead of
  * ids-only. The log flavor has its own gate, `q_bm25_log`: DuckDB's `ln`
  * replays the kernel and the comparison is the retrieved ID SET + RANKS
  * under the deterministic (score DESC, doc_id) order — valid because the
  * fixture's adjacent score gaps (measured ≥ 7.7e-5 relative) dwarf any
  * libm ulp divergence, so the order cannot flip between engines.
  */
object Bm25 {

  /** Tokenize to non-empty whitespace terms — the same semantics the
    * oracle replays (`list_filter(string_split(text, ' '), x -> x != '')`).
    * `array_remove` (codegen) rather than a `filter(…)` lambda
    * (ArrayFilter is CodegenFallback): regex `\s+` splitting can only
    * produce empty segments, never whitespace ones, so removing `""`
    * IS the non-empty filter.
    */
  private def terms(textCol: Column): Column =
    array_remove(split(textCol, "\\s+"), "")

  /** Per-document BM25 scores for `query` over the corpus: one row per
    * matching doc, `(doc_id, score)`. See the object scaladoc for the
    * plan shape and the reproducibility contract.
    */
  def scores(docs: DataFrame, idCol: String, query: Seq[String],
             textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
             logIdf: Boolean = true): DataFrame = {
    require(query.nonEmpty, "BM25 needs at least one query term")
    val qTerms = query.distinct
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(terms(col(textCol))).as("term"))
    // query filter BEFORE the tf group: the shuffle carries only hits
    val tf = toks.where(col("term").isin(qTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(terms(col(textCol))).cast("long").as("dl"))
    val df = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    // corpus scalars: two tiny driver values, folded in as literals so the
    // scoring expression is pure column arithmetic (sum() is null on an
    // empty corpus — surface that as a named error, not an NPE)
    val head = docs.select(
        count(lit(1)), sum(size(terms(col(textCol)))).cast("long"))
      .collect().head
    require(!head.isNullAt(1) && head.getLong(0) > 0,
      "BM25 needs a non-empty corpus (document frequencies are undefined on zero docs)")
    val (nDocs, totalLen) = (head.getLong(0), head.getLong(1))
    val avgdl = totalLen.toDouble / nDocs.toDouble
    // the kernel, in the EXACT operation order the oracle mirrors
    val dfD = col("df").cast(DoubleType)
    val tfD = col("tf").cast(DoubleType)
    val dlD = col("dl").cast(DoubleType)
    val rawIdf = (lit(nDocs.toDouble) - dfD + lit(0.5)) / (dfD + lit(0.5))
    val idf = if (logIdf) log(rawIdf + lit(1.0)) else rawIdf
    val norm = lit(1.0 - b) + lit(b) * (dlD / lit(avgdl))
    val termScore = idf * ((tfD * lit(k1 + 1.0)) / (tfD + lit(k1) * norm))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"), col("term"), termScore.as("s"))
      .groupBy("doc_id")
      // fixed fold order: sort the (term, s) pairs, then sum left-to-right
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0),
        (acc, x) => acc + x.getField("s")).as("score"))
  }

  /** Top-k retrieval: `(doc_id, score)` ordered by (score DESC, doc_id). */
  def search(docs: DataFrame, idCol: String, query: Seq[String], k: Int,
             textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
             logIdf: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    scores(docs, idCol, query, textCol, k1, b, logIdf)
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  /** Batched retrieval — N queries amortized over ONE corpus pass, the
    * production shape (per-query [[search]] calls re-scan the corpus N
    * times). `queries(query_id, term)` is broadcast everywhere it
    * appears (it is query-sized by construction): the corpus token
    * stream semi-joins against the UNION of all query terms before the
    * tf group (one filtered shuffle for all queries), df is counted per
    * (query, term), and each (query, doc) folds its term contributions
    * in the same sorted order as [[scores]] — so a single-query batch is
    * BIT-IDENTICAL to [[scores]] (spec-asserted). Emits one row per
    * (query_id, doc) with `rank ≤ k` per query via the standard window
    * (queries × k rows total — never a global sort of scored docs).
    */
  def searchMany(docs: DataFrame, idCol: String, queries: DataFrame, k: Int,
                 textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
                 logIdf: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    require(Seq("query_id", "term").forall(queries.columns.contains),
      s"queries needs (query_id, term) columns, got ${queries.columns.mkString(", ")}")
    val q = broadcast(queries.select(col("query_id"), col("term")).distinct())
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(terms(col(textCol))).as("term"))
    // one filtered tf shuffle for ALL queries: the semi-join keeps only
    // tokens ANY query mentions
    val tf = toks.join(q.select("term").distinct(), Seq("term"), "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(terms(col(textCol))).cast("long").as("dl"))
    val head = docs.select(
        count(lit(1)), sum(size(terms(col(textCol)))).cast("long"))
      .collect().head
    require(!head.isNullAt(1) && head.getLong(0) > 0,
      "BM25 needs a non-empty corpus (document frequencies are undefined on zero docs)")
    val (nDocs, totalLen) = (head.getLong(0), head.getLong(1))
    val avgdl = totalLen.toDouble / nDocs.toDouble
    // df is per (query, term) — identical to the per-query value since
    // df depends on the term alone; carrying query_id keeps the fold
    // grouping one join away
    val perQuery = tf.join(q, Seq("term"))
    val df = perQuery.groupBy("query_id", "term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val dfD = col("df").cast(DoubleType)
    val tfD = col("tf").cast(DoubleType)
    val dlD = col("dl").cast(DoubleType)
    val rawIdf = (lit(nDocs.toDouble) - dfD + lit(0.5)) / (dfD + lit(0.5))
    val idf = if (logIdf) log(rawIdf + lit(1.0)) else rawIdf
    val norm = lit(1.0 - b) + lit(b) * (dlD / lit(avgdl))
    val termScore = idf * ((tfD * lit(k1 + 1.0)) / (tfD + lit(k1) * norm))
    val scored = perQuery.join(broadcast(df), Seq("query_id", "term"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("term"), termScore.as("s"))
      .groupBy("query_id", "doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0),
        (acc, x) => acc + x.getField("s")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(desc("score"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
