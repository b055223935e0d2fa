package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Functions => F}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast,
  *    so the corpus is scanned once, map-side, with a per-partition top-k
  *    (the `row_number` window partitioned by query) — correct baseline,
  *    O(|Q|·|corpus|) work but zero corpus shuffle.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — each vector is mapped
  *    to a deterministic signature; queries probe only their own bucket
  *    (plus optional neighboring probes). The scale path: at 100 TB the
  *    bucket join shuffles signatures + ids only, never all-pairs.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (bit b, dim d):
    * a fixed hash mapped to ±1. Avoids shipping any random state — the
    * "planes" are pure functions of (b, d), identical on every executor.
    */
  private def planeSign(b: Column, d: Column): Column =
    when(xxhash64(b.cast(StringType), d.cast(StringType)).bitwiseAND(1L) === 1L, lit(1.0))
      .otherwise(lit(-1.0))

  /** sigBits-bit random-hyperplane signature of a float-vector column:
    * bit b = sign(dot(v, plane_b)). Pure Column expression.
    */
  def hyperplaneSig(vec: Column, sigBits: Int, dim: Int): Column =
    aggregate(sequence(lit(0), lit(sigBits - 1)), lit(0L), (acc, b) => {
      val dotB = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, d) => x.cast(DoubleType) * planeSign(b, d)),
        lit(0.0), (a, v) => a + v)
      acc.bitwiseOR(when(dotB > 0, call_function("shiftleft", lit(1L), b.cast(IntegerType))).otherwise(lit(0L)))
    })

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

  /** LSH-bucketed approximate top-k: queries only score corpus vectors in
    * the same hyperplane bucket. Recall grows with smaller sigBits (bigger
    * buckets); work per query is the bucket size, not the corpus size.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, sigBits: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("sig", hyperplaneSig(col("qv"), sigBits, dim))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("sig", hyperplaneSig(col("cv"), sigBits, dim))
    val scored = c.join(q, "sig")
      .where(col("query_id") =!= col("neighbor_id"))
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
