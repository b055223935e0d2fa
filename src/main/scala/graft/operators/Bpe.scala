package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A REAL byte-pair-encoding tokenizer (Sennrich et al., ACL 2016 — the
  * subword scheme production LLM tokenizers descend from), replacing the
  * "BPE-ish regex" approximation in token counting with the actual
  * algorithm: train merge rules from corpus pair statistics, then encode
  * text by applying the rules in rank order.
  *
  * Scale shape, the part that matters at 100 TB:
  *
  *  - '''training''' touches the corpus exactly ONCE — a distributed
  *    word-count aggregate (map-side combined, output vocabulary-sized).
  *    The merge loop then runs driver-side over the COMPRESSED
  *    `(word, count)` vocabulary — bounded by `maxVocab` (frequency-
  *    ordered, deterministic tiebreak), which is how production
  *    tokenizers train too (on a vocab/sample, never the raw corpus);
  *  - '''encoding''' is map-only: the learned rules (a few thousand
  *    strings) ride to executors as a closure constant, each partition
  *    encodes independently, no shuffle.
  *
  * Determinism contract (what makes the oracle possible): pair counts
  * are weighted by word frequency; the winning pair maximizes
  * `(count, -lexicographic)` — i.e. ties break to the SMALLEST (left,
  * right) pair; merges apply as non-overlapping left-to-right replacement
  * of `" a b "` with `" ab "` on the space-padded symbol string, which is
  * the exact semantics of both `java.lang.String.replace` and SQL
  * `replace` — so DuckDB replays training AND encoding byte-for-byte
  * (`q_bpe_train`, `q_bpe_apply`).
  *
  * No end-of-word marker: merges never cross word boundaries (each word
  * is padded separately), which keeps the rules replayable by any engine
  * with plain string replace. Token streams concatenate per-word tokens
  * in word order.
  */
object Bpe {

  /** One learned merge rule: at `rank`, symbol pair (lhs, rhs) → lhs+rhs. */
  final case class Merge(rank: Int, lhs: String, rhs: String)

  /** The space-padded symbol form of a word: `"key"` → `" k e y "`.
    * Initial symbols are CODEPOINTS, not UTF-16 units — `map(_.toString)`
    * would split an astral character (emoji, rare CJK) into two lone
    * surrogate halves, producing invalid-string symbols the oracle's
    * codepoint-based `string_split(t, '')` replay could never agree
    * with.
    */
  private[graft] def padSymbols(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    if (word.isEmpty) sb.append(' ') // "" → "  ", the historical shape
    sb.toString
  }

  /** Apply one merge rule to a padded symbol string — non-overlapping
    * left-to-right, the shared Java/SQL `replace` semantics.
    */
  private def applyMerge(padded: String, lhs: String, rhs: String): String =
    padded.replace(s" $lhs $rhs ", s" $lhs$rhs ")

  /** Codepoint-lexicographic comparison — identical to UTF-8 binary
    * order (what UTF8String / the oracle sort under), unlike Java's
    * UTF-16 code-unit `compareTo`.
    */
  private def cmpCodepoints(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Train `numMerges` BPE rules from the corpus. One distributed
    * word-count pass; merge loop over the capped vocabulary (see object
    * scaladoc). Stops early if no adjacent pair remains. Deterministic:
    * same corpus → same rules, any partitioning.
    */
  def trainBpe(docs: DataFrame, textCol: String = "text", numMerges: Int = 1000,
               maxVocab: Int = 100000): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive (got $numMerges)")
    val vocab = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words = vocab.map { case (w, n) => (padSymbols(w), n) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, n) =>
        val syms = s.trim.split(" ")
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties to the CODEPOINT-lexicographically smallest
        // pair — the collation ORDER BY cnt DESC, a, b resolves to in
        // both the DataFrame flavor (UTF8String binary order) and the
        // oracle. Scala's default String ordering is UTF-16 code-unit
        // order, which DISAGREES for supplementary symbols vs
        // U+E000..U+FFFF (a surrogate unit 0xD8xx sorts below 0xE000
        // while the UTF-8 byte 0xF0 sorts above 0xEE) — with astral
        // symbols now representable ([[padSymbols]]) the tie-break must
        // share one collation everywhere.
        val ((a, b), _) = counts.min(new Ordering[((String, String), Long)] {
          def compare(u: ((String, String), Long),
                      v: ((String, String), Long)): Int = {
            val byCount = java.lang.Long.compare(v._2, u._2) // count DESC
            if (byCount != 0) byCount
            else {
              val byLhs = cmpCodepoints(u._1._1, v._1._1)
              if (byLhs != 0) byLhs else cmpCodepoints(u._1._2, v._1._2)
            }
          }
        })
        merges += Merge(rank, a, b)
        words = words.map { case (s, n) => (applyMerge(s, a, b), n) }
        rank += 1
      }
    }
    merges.result()
  }

  /** [[trainBpe]] with NO vocabulary cap — the flavor for corpora whose
    * distinct-word count exceeds what the driver should hold: the
    * vocabulary stays a DataFrame for the whole merge loop. Each rank is
    * one vocabulary-sized pair-count aggregate (map-side combined; the
    * winning pair reaches the driver as a TakeOrdered of ONE row) plus
    * one map-only literal `replace` — the corpus itself is still touched
    * exactly once, by the initial word count. The per-rank
    * `localCheckpoint` truncates the growing replace lineage so rank R's
    * plan never replays ranks 0..R−1 (the [[graft.operators.Dedup
    * .connectedComponents]] iterative-frame discipline); the
    * checkpointed frame is vocabulary-sized, not corpus-sized.
    *
    * Bit-identical to [[trainBpe]] when the vocab fits its cap: same
    * frequency weighting, same `(count desc, lhs, rhs)` winner rule, and
    * SQL `replace` shares `java.lang.String.replace`'s non-overlapping
    * left-to-right semantics — so the same oracle replays both.
    */
  def trainBpeDistributed(docs: DataFrame, textCol: String = "text",
                          numMerges: Int = 1000): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive (got $numMerges)")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].map { case (w, n) => (padSymbols(w), n) }
      .toDF("s", "n")
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words
        .select(split(trim(col("s")), " ").as("syms"), col("n"))
        .where(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(rank, a, b)
        val prev = words
        words = words.withColumn("s", call_function("replace",
            col("s"), lit(s" $a $b "), lit(s" $a$b ")))
          .localCheckpoint(true)
        prev.unpersist()
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one word into its BPE tokens under `merges` (already
    * rank-ordered).
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var s = padSymbols(word)
    merges.foreach(m => s = applyMerge(s, m.lhs, m.rhs))
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      s.trim.split(" ")).filter(_.nonEmpty)
  }

  /** The executor-side BPE encoder the codegen kernel static-invokes:
    * rank-ordered merge rules plus a bounded per-THREAD word → encoding
    * memo (natural text is Zipf-distributed, so hot words dominate and
    * the replace chain runs once per distinct word per thread;
    * eldest-entry eviction caps the heap on high-cardinality text).
    * ThreadLocal because a deserialized plan's reference objects can be
    * shared across an executor's task threads; the memo is pure cache,
    * so thread-locality costs only warm-up, never correctness.
    */
  final class Encoder(lhs: Array[String], rhs: Array[String],
                      cacheSize: Int) extends Serializable {
    @transient private lazy val memo =
      new ThreadLocal[java.util.LinkedHashMap[String, String]] {
        override def initialValue(): java.util.LinkedHashMap[String, String] =
          new java.util.LinkedHashMap[String, String](1024, 0.75f, false) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, String]): Boolean =
              size() > cacheSize
          }
      }

    private def encodeWord(w: String,
                           m: java.util.LinkedHashMap[String, String]): String = {
      val hit = m.get(w)
      if (hit != null) hit
      else {
        var s = padSymbols(w)
        var i = 0
        while (i < lhs.length) { s = applyMerge(s, lhs(i), rhs(i)); i += 1 }
        val out = s.trim
        m.put(w, out)
        out
      }
    }

    /** Whole-document encode: whitespace-split words, each encoded (its
      * tokens internally single-space-joined), re-joined with single
      * spaces — the flat token stream whose separator count is the token
      * count. Bit-identical to the retired mapPartitions flavor. One
      * ThreadLocal lookup per DOCUMENT, not per word.
      */
    def encode(text: org.apache.spark.unsafe.types.UTF8String)
        : org.apache.spark.unsafe.types.UTF8String = {
      val m = memo.get()
      org.apache.spark.unsafe.types.UTF8String.fromString(
        text.toString.split("\\s+").iterator.filter(_.nonEmpty)
          .map(encodeWord(_, m)).mkString(" "))
    }
  }

  /** [[Encoder.encode]] as a codegen scalar: the merges ride as ONE plan
    * reference object ([[CodegenContext.addReferenceObj]]), the encode
    * stays inside WholeStageCodegen — the retired typed `mapPartitions`
    * deserialized and re-serialized every document on the one
    * every-document stage of the tokenizer path.
    */
  case class BpeEncodeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
                           encoder: Encoder)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType
    override def prettyName: String = "graft_bpe_encode"

    override def nullSafeEval(v: Any): Any =
      encoder.encode(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("graftBpeEncoder", encoder,
        classOf[Encoder].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
    }

    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
  }

  def bpe_encode(text: org.apache.spark.sql.Column, encoder: Encoder)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      BpeEncodeExpr(org.apache.spark.sql.graft.Bridge.toExpression(text), encoder))

  /** Distributed BPE encode: map-only over the corpus, rules shipped as
    * one plan reference object (vocabulary-sized). Emits one row per doc:
    * `(id, n_tokens, tokens)` with tokens space-joined in word order —
    * the schema both the oracle gate and downstream token budgeting
    * (chunk/pack) consume. The encode is a codegen kernel
    * ([[BpeEncodeExpr]]); n_tokens = separators + 1 computed as plain
    * length arithmetic in the same codegen stage.
    */
  def applyBpe(docs: DataFrame, idCol: String, merges: Seq[Merge],
               textCol: String = "text",
               wordCacheSize: Int = 1 << 16): DataFrame = {
    val sorted = merges.sortBy(_.rank)
    val enc = new Encoder(sorted.map(_.lhs).toArray, sorted.map(_.rhs).toArray,
      wordCacheSize)
    docs
      .select(col(idCol).cast(LongType).as("id"),
        bpe_encode(col(textCol), enc).as("tokens"))
      .select(col("id"),
        graft.functions.TextExpressions.joined_token_count(col("tokens"))
          .as("n_tokens"),
        col("tokens"))
  }
}
