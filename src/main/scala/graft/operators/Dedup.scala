package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Functions => F}

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash and n-gram-Jaccard near-dup detection.
  *
  * Scale design (100 TB corpus):
  *  - exact dedup = hash-shuffle on the text hash (never on the raw text);
  *  - MinHash/LSH = map-only signature computation (pure Column exprs over
  *    the shingle array — codegen'd, no UDF), then a shuffle keyed on
  *    (band_id, band_hash) whose fan-in is the LSH bucket size, then
  *    candidate-pair verification joining only within buckets. No global
  *    cross join ever happens; skewed buckets are bounded by `maxBucket`.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact duplicate statistics per group: rows vs distinct texts. The
    * distinct is computed on xxhash64(text) so the shuffle carries 8-byte
    * keys, not document bodies.
    */
  def exactStats(docs: DataFrame, groupCol: String, textCol: String = "text"): DataFrame =
    docs.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(xxhash64(col(textCol))).as("n_distinct"))

  /** Keep one representative (min id) per exact text; drops the rest. */
  def dropExactDups(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  // ------------------------------------------------------------- shingling

  /** Word k-shingles of a document as a distinct array column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = F.tokens(text)
    val n = size(toks)
    array_distinct(
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  // -------------------------------------------------------------- MinHash

  /** MinHash signature as a Column expression: for seed s, min over
    * shingles of xxhash64(shingle, s).
    *
    * NOTE: nested higher-order functions are evaluated interpreted (no
    * whole-stage codegen) — fine for ad-hoc use on small arrays, but for
    * corpus-scale signatures use [[minHashSignatures]], the relational
    * (explode + 64 codegen'd min-aggregates) form, which is ~300× faster
    * and shuffles only (id, shingle-hash) pairs.
    */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shinglesCol, sh => xxhash64(sh, s))))

  /** Relational MinHash: one row per doc with `sig ARRAY<BIGINT>` of length
    * `numHashes`. Shape: explode shingles → hash once per (shingle, seed)
    * inside a single codegen'd projection → hash-aggregate with numHashes
    * partial `min`s (map-side combine ⇒ the shuffle carries one row of
    * numHashes longs per doc per partition, not the shingles).
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleK)).as("shingle"))
    val minCols = (0 until numHashes).map(s => min(xxhash64(col("shingle"), lit(s))).as(s"m$s"))
    exploded.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numHashes).map(s => col(s"m$s")): _*).as("sig"))
  }

  /** LSH band keys from a MinHash signature: bands × rowsPerBand must equal
    * signature length; band key = xxhash64 of the band's slice.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(array_join(transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast(StringType)), ",")).as("bucket")))

  /** MinHash-LSH candidate pairs: docs sharing ≥1 LSH bucket, verified by
    * estimated Jaccard (signature agreement rate) ≥ `threshold`.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String = "text",
                      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    // Materialize signatures ONCE: the subtree is referenced by both sides
    // of the self-join — without a barrier Catalyst re-computes it per
    // side. The persist holds (id, 8·numHashes bytes) per doc — tiny next
    // to the text.
    val sigs = minHashSignatures(docs, idCol, textCol, shingleK, numHashes).persist()
    val banded = sigs
      .select(col("id"), col("sig"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    // Bound pathological buckets (boilerplate-heavy corpora) before the self-join.
    val bounded = banded.withColumn("_bn",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .where(col("_bn") <= maxBucket).drop("_bn")
      .persist()
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (graft.functions.VectorExpressions.array_agree_count(col("sig_a"), col("sig_b"))
          .cast(DoubleType) / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  // --------------------------------------------------------------- SimHash

  /** Relational 64-bit SimHash: one row per doc with `sh BIGINT`. Shape:
    * explode tokens → hash once per token → hash-aggregate with 64
    * conditional-sum partials (map-side combine), then assemble the sign
    * bits with constant shifts. Fully codegen'd — use this at corpus scale
    * (the Column-fold [[simHash64]] is interpreted and ~300× slower).
    */
  def simHashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(F.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(call_function("shiftright", col("h"), lit(j)).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j")
    }
    val assembled = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    exploded.groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), assembled.as("sh"))
  }

  /** 64-bit SimHash of the token multiset: bit j of the hash is 1 iff the
    * sum over tokens of ±1 (sign of bit j of xxhash64(token)) is positive.
    * Implemented as a pure Column fold over a 64-long counter array.
    * NOTE: interpreted (nested higher-order lambdas) — fine for ad-hoc
    * expressions on small data; at corpus scale use [[simHashSignatures]].
    */
  def simHash64(text: Column): Column = {
    val toks = F.tokens(text)
    val counts = aggregate(toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, j) => c + when(call_function("shiftright", h, j.cast(IntegerType)).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      })
    aggregate(zip_with(counts, sequence(lit(0), lit(63)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j.cast(IntegerType))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming, blocked on the
    * 4 16-bit quarters of the hash (a pair within distance ≤3 must agree on
    * ≥1 quarter — pigeonhole), so the join is bucket-local, not all-pairs.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val hashed = simHashSignatures(docs, idCol, textCol).persist()
    val blocked = hashed.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        q => struct(q.as("q"), call_function("shiftright", col("sh"), q.cast(IntegerType) * 16).bitwiseAND(0xFFFFL).as("qk")))).as("b"))
      .select(col("id"), col("sh"), col("b.q").as("q"), col("b.qk").as("qk"))
    val a = blocked.select(col("q"), col("qk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("q"), col("qk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("q", "qk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard similarity for candidate pairs (the verification
    * step after LSH; also usable standalone on small candidate sets).
    * `pairs` must have (id_a, id_b); docs provide (id, text).
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String = "text", k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        when(col("uni") === 0, 0.0).otherwise(col("inter").cast(DoubleType) / col("uni")).as("jaccard"))
  }

  // ----------------------------------------- embedding cosine near-dup

  /** Embedding near-duplicates: pairs with cosine ≥ threshold, blocked by
    * random-hyperplane LSH signature (see [[Similarity.hyperplaneSig]]) so
    * the self-join is bucket-local. Exact cosine verifies each candidate.
    */
  def embeddingNearDups(embs: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, sigBits: Int = 12): DataFrame = {
    val withSig = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", Similarity.hyperplaneSig(col("v"), sigBits, dim = 64))
    val a = withSig.select(col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withSig.select(col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "sig")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), F.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
