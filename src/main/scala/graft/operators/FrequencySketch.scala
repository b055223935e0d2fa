package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CountMin, Functions => F}

/** Corpus token-frequency estimation by count–min sketch — the bounded-
  * memory answer to "how often does this token/URL/n-gram occur across
  * 100 TB" when an exact `groupBy(token)` (a corpus-sized shuffle and a
  * vocabulary-sized result) is not affordable per question. The sketch
  * is built ONCE in a single map-side-combinable pass (fixed
  * depth×width grid regardless of corpus size), and any later batch of
  * candidate keys is answered MAP-ONLY against the broadcast grid —
  * estimates are upper bounds, exact for keys that avoid collisions in
  * at least one row, overestimating by at most the collision mass with
  * probability 1−(1/2)^depth per the standard CM bound.
  *
  * Like [[SeenFilter]], the counter positions are exact BIGINT
  * arithmetic (double hashing over [[F.portableTokenHash]]), so the
  * grid and every estimate — collisions included — replay bit-for-bit
  * in the oracle. The sketch is a self-describing one-row DataFrame
  * `(grid, total_tokens, seed, depth, width, hash_version)`,
  * parquet-round-trippable — `hash_version` pins the token-hash
  * arithmetic the grid was built under ([[F.TokenHashVersion]]), and
  * [[estimateTokens]]/[[mergeSketches]] `require()` it so a sketch
  * persisted under an older hash fails loudly instead of returning
  * silently-wrong estimates;
  * sketches over disjoint corpus slices merge by element-wise addition
  * into exactly the union's sketch ([[mergeSketches]]).
  */
object FrequencySketch {

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 8 && width <= (1 << 21),
      s"width must be in [8, 2^21] (aggregate buffer = depth×width longs), got $width")
  }

  /** Size a grid from the standard count-min guarantee: any estimate
    * overshoots the true count by more than `epsilon · totalTokens`
    * with probability at most `delta` — width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉
    * (Cormode & Muthukrishnan 2005). Driver-side sizing metadata only;
    * the grid arithmetic the oracle replays consumes the resulting
    * integers. Clamped to the aggregate-buffer bounds [[checkParams]]
    * enforces — a tighter ε than width 2^21 allows (ε < 1.3e-6) is a
    * loud error, not a silent cap.
    */
  def geometryFor(epsilon: Double, delta: Double = 0.01): (Int, Int) = {
    require(epsilon > 0 && epsilon < 1, s"epsilon must be in (0,1), got $epsilon")
    require(delta > 0 && delta < 1, s"delta must be in (0,1), got $delta")
    val width = math.ceil(math.E / epsilon).toLong
    require(width <= (1 << 21),
      s"epsilon=$epsilon needs width $width > 2^21; relax epsilon or shard the corpus")
    val depth = math.min(8, math.max(1, math.ceil(math.log(1.0 / delta)).toInt))
    (depth, math.max(8, width.toInt))
  }

  /** One pass over the corpus → the token sketch. Empty tokens are
    * dropped (both engines see the same stream) — AFTER the explode, as
    * a codegen `Filter`, not an `ArrayFilter` lambda on the array (the
    * HOF is CodegenFallback and this is the sketch's corpus pass).
    */
  def tokenSketch(docs: DataFrame, textCol: String = "text",
                  seed: Long = 1L, depth: Int = 4,
                  width: Int = 1 << 16): DataFrame = {
    checkParams(depth, width)
    docs
      .select(explode(F.tokens(col(textCol))).as("_t"))
      .where(length(col("_t")) > 0)
      .select(CountMin.positions(F.portableTokenHash(col("_t")), seed,
        depth, width).as("_pos"))
      .agg(CountMin.countmin_agg(col("_pos"), depth, width).as("grid"),
        count(lit(1)).as("total_tokens"))
      .select(col("grid"), col("total_tokens"), lit(seed).as("seed"),
        lit(depth).as("depth"), lit(width).as("width"),
        lit(F.TokenHashVersion).as("hash_version"))
  }

  /** Loud guard against probing a sketch persisted under a different
    * token-hash arithmetic: a missing column means a pre-versioning
    * artifact (built under hash v1); a value mismatch means the hash
    * changed after the sketch was written. Either way every estimate
    * would be silently wrong — refuse instead.
    */
  private def checkHashVersion(sketch: DataFrame, what: String): Unit = {
    require(sketch.columns.contains("hash_version"),
      s"$what has no hash_version column — it predates token-hash " +
        s"versioning (current v${F.TokenHashVersion}); rebuild it from " +
        "the corpus before probing")
    val vs = sketch.select("hash_version").distinct().collect()
      .map(_.getInt(0))
    require(vs.forall(_ == F.TokenHashVersion),
      s"$what was built under token-hash v${vs.mkString(",")} but this " +
        s"build hashes with v${F.TokenHashVersion} — estimates would be " +
        "silently wrong; rebuild the sketch from the corpus")
  }

  /** Estimate the corpus frequency of every key in `keys(keyCol)` —
    * map-only against the broadcast grid (ONE bounded collect of the
    * single sketch row). Adds `est` (upper bound, ≥ the true count).
    */
  def estimateTokens(keys: DataFrame, sketch: DataFrame,
                     keyCol: String): DataFrame = {
    checkHashVersion(sketch, "sketch")
    val rows = sketch.select("grid", "seed", "depth", "width").collect()
    require(rows.length == 1, s"expected one sketch row, got ${rows.length}")
    val grid = rows(0).getSeq[Long](0).toArray
    val (seed, depth, width) =
      (rows(0).getLong(1), rows(0).getInt(2), rows(0).getInt(3))
    // grid rides as ONE addReferenceObj per plan (CountMin.estimate),
    // not a typedlit literal — 16 MB of plan tree at the counter cap
    keys.withColumn("est",
      CountMin.estimate(grid, F.portableTokenHash(col(keyCol)),
        seed, depth, width))
  }

  /** Heavy hitters by sketch: estimate every candidate key, keep the
    * top k by (estimate desc, key asc — deterministic ties). Candidates
    * typically come from a deterministic content-selected sample, so
    * the whole chain is engine-recomputable; because count–min never
    * underestimates, no true heavy hitter IN the candidate set can be
    * pushed out of the top k by a measurement error — only collision
    * OVERestimates can pull extras in, bounded by the standard ε·N.
    * `orderBy + limit` plans as TakeOrdered (per-partition top-k +
    * driver merge), not a global sort.
    */
  def heavyHitters(candidates: DataFrame, sketch: DataFrame,
                   keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    estimateTokens(candidates, sketch, keyCol)
      .orderBy(col("est").desc, col(keyCol))
      .limit(k)
  }

  /** The whole approximate-top-tokens pass in one call — the composition
    * the sketch exists FOR: the grid absorbs the full corpus (one
    * map-side-combined pass), while the CANDIDATE set comes from a
    * deterministic hash-sampled document slice (salted Knuth-mixed
    * content selector < frac·10⁴, the engine's shared replay-stable
    * sampling arithmetic) — a corpus-frequent token appears in a sample
    * of documents with near-certainty (missing a token of document
    * frequency d needs all d carriers to miss the sample: (1−f)^d), so
    * the candidate explode runs over the sample, not the corpus, and the
    * cut is a TakeOrdered over estimates. Never-underestimate means no
    * CANDIDATE hitter is displaced by a smaller one; recall is governed
    * by `sampleFrac` against document frequency, not token count.
    */
  def approxTopTokens(corpus: DataFrame, k: Int, textCol: String = "text",
                      seed: Long = 1L, depth: Int = 4, width: Int = 1 << 16,
                      sampleFrac: Double = 0.1,
                      sampleSeed: Long = 2L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(sampleFrac > 0 && sampleFrac <= 1,
      s"sampleFrac must be in (0,1], got $sampleFrac")
    val sketch = tokenSketch(corpus, textCol, seed, depth, width)
    val cut = math.floor(sampleFrac * 10000).toLong
    val seedReduced = ((sampleSeed % 1000000007L) + 1000000007L) % 1000000007L
    val selector = pmod(
      (TextAnalysis.portableFingerprint(col(textCol)) + lit(seedReduced)) * 2654435761L,
      lit(1000000007L)) % 10000L
    val candidates = corpus.where(selector < cut)
      .select(explode(F.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .distinct()
    heavyHitters(candidates, sketch, "token", k)
  }

  /** Element-wise-sum merge of sketches over disjoint corpus slices;
    * configs must match exactly.
    */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame = {
    checkHashVersion(a, "left sketch")
    checkHashVersion(b, "right sketch")
    val merged = a.unionByName(b)
    val cfg = merged.select("seed", "depth", "width").distinct().collect()
    require(cfg.length <= 1,
      "sketches disagree on seed/depth/width — cannot merge")
    merged.agg(
      graft.functions.CountMin.sum_words_agg(col("grid")).as("grid"),
      sum("total_tokens").cast("long").as("total_tokens"),
      first("seed").as("seed"), first("depth").as("depth"),
      first("width").as("width"),
      first("hash_version").as("hash_version"))
  }
}
