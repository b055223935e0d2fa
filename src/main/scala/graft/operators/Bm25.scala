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
  *  - document lengths are a MAP-ONLY column (`size(filter(split(...)))`
  *    — no explode, no shuffle);
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
  * ids-only.
  */
object Bm25 {

  /** Tokenize to non-empty whitespace terms — the same semantics the
    * oracle replays (`list_filter(string_split(text, ' '), x -> x != '')`).
    */
  private def terms(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

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
}
