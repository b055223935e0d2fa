package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F, VectorExpressions}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast,
  *    so the corpus is scanned once, map-side, with a per-partition top-k
  *    (the `row_number` window partitioned by query) — correct baseline,
  *    O(|Q|·|corpus|) work but zero corpus shuffle.
  *  - [[lshTopK]]: B independent random-hyperplane bands (the IVF/LSH scale
  *    path) — a query only scores corpus vectors sharing ≥1 band bucket.
  *    The band join carries ids only (vectors join back after candidate
  *    dedup), buckets are capped, and signatures come from the codegen
  *    [[VectorExpressions.HyperplaneSig]] (the Column-fold form was
  *    interpreted and dominated the query cost).
  *
  * Recall tuning: P(candidate) = 1 − (1 − p^bits)^bands, p = 1 − θ/π.
  * High-similarity neighbors need few bands; low-similarity corpora (like
  * the synthetic testdata, max cosine ≈ 0.5) need many bands of few bits.
  * Measured recall vs [[bruteForceTopK]] is asserted in SimilaritySpec.
  */
object Similarity {

  /** Banded hyperplane signatures of a vector column: one row per (id,
    * band, sig), seed = band index.
    */
  private def bandSigs(df: DataFrame, idOut: String, vec: Column,
                       bands: Int, bitsPerBand: Int): DataFrame =
    df.select(col(idOut),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          VectorExpressions.hyperplane_sig(vec, bitsPerBand, b).as("sig"))): _*)).as("bk"))
      .select(col(idOut), col("bk.band").as("band"), col("bk.sig").as("sig"))

  /** Exact brute-force cosine top-k: for each query row, the k most similar
    * corpus rows (excluding itself). Returns (query_id, rank, neighbor_id,
    * cosine). Deterministic: ties broken by neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", F.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Banded-LSH approximate top-k: queries score only corpus vectors that
    * share ≥1 of `bands` hyperplane buckets. Work per query ≈ bands ×
    * bucket size (capped), not the corpus size.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, bands: Int = 16, bitsPerBand: Int = 8,
              maxBucket: Int = 100000): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qSigs = bandSigs(q, "query_id", col("qv"), bands, bitsPerBand)
    val cSigs = Dedup.capBuckets(
      bandSigs(c, "neighbor_id", col("cv"), bands, bitsPerBand),
      Seq("band", "sig"), maxBucket)
    val candidates = cSigs.join(qSigs, Seq("band", "sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .join(q, "query_id")
      .join(c, "neighbor_id")
      .withColumn("cosine", F.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Per-group vector statistics (count, min/max L2 norm) — the sanity
    * profile of an embedding table. min/max are order-independent →
    * deterministic under any partitioning.
    */
  def normStats(embs: DataFrame, groupCol: String, vecCol: String): DataFrame =
    embs.select(col(groupCol), F.vecNorm(col(vecCol)).as("norm"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        round(min(col("norm")), 4).as("min_norm"),
        round(max(col("norm")), 4).as("max_norm"))
}
