package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable text hashing.
  *
  * [[PortableTokenHash64]] is the 62-bit token hash the SimHash family is
  * defined over: two polynomial rolling hashes of the token's Unicode code
  * points, each mod a 31-bit prime, packed `h1 | (h2 << 31)`. Every term is
  * expressible in 64-bit integer SQL with no overflow (h < 2^31, h*137 +
  * cp < 2^39), so DuckDB (or any ANSI engine) can reproduce the exact hash:
  *
  * {{{
  * list_reduce(list_prepend(CAST(0 AS BIGINT),
  *     list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
  *   (h, c) -> (h * 131 + c) % 2147483647)          -- h1; h2 uses 137 / 2147483629
  * }}}
  *
  * That portability is what makes the SimHash near-dup operator
  * oracle-checkable end-to-end (signatures, Hamming distances and pair sets
  * all match a reference engine bit-for-bit) — unlike xxhash64, which no
  * other engine implements compatibly.
  */
object TextExpressions {

  val Mult1 = 131L
  val Mod1 = 2147483647L // 2^31 - 1
  val Mult2 = 137L
  val Mod2 = 2147483629L // largest prime < 2^31

  private[graft] def polyHash(s: String, mult: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  private[graft] def portableHash64(s: String): Long =
    polyHash(s, Mult1, Mod1) | (polyHash(s, Mult2, Mod2) << 31)

  /** 62-bit portable token hash (see object scaladoc). Null in → null out. */
  case class PortableTokenHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any =
      portableHash64(v.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // call through the name addNewFunction RETURNS: when a very large
      // WholeStageCodegen plan spills generated functions into a nested
      // private class, the bare name would fail to compile and the whole
      // stage would silently fall back to interpreted execution
      val fn = ctx.addNewFunction("graftPolyHash",
        """
          |private long graftPolyHash(String s, long mult, long mod) {
          |  long h = 0L;
          |  int i = 0;
          |  while (i < s.length()) {
          |    int cp = s.codePointAt(i);
          |    h = (h * mult + cp) % mod;
          |    i += Character.charCount(cp);
          |  }
          |  return h;
          |}
        """.stripMargin)
      nullSafeCodeGen(ctx, ev, v => {
        val s = ctx.freshName("s")
        // operator kept at end-of-line: a generated line beginning with `|`
        // is eaten by the outer class-assembly stripMargin (see
        // FrameExpressions.readerFuncs note)
        s"""
           |String $s = $v.toString();
           |${ev.value} = $fn($s, ${Mult1}L, ${Mod1}L) |
           |  ($fn($s, ${Mult2}L, ${Mod2}L) << 31);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def portable_token_hash(c: Column): Column = column(PortableTokenHash64(expression(c)))

  /** The count-min / hashed-feature prime (also the modulus of every other
    * replayable-hash kernel in this engine).
    */
  val ModP = 1000000007L

  /** Polynomial token hash in [0, 1e9+7): polyHash over ALL codepoints
    * (mult 131, mod 1e9+7). The key for frequency sketches
    * ([[graft.operators.FrequencySketch]]) and hashed features
    * ([[graft.operators.LinearClassifier]]): unlike the earlier
    * (length, first, last) 3-feature hash, tokens sharing those three
    * values ("the"/"tie", "cat"/"cut") no longer collide identically
    * across EVERY counter row, so sketch estimates stay inside the
    * advertised ε·N bound. Replayable in SQL as
    * `list_reduce(list_prepend(0, [unicode(ch) FOR ch IN
    * string_split(t,'')]), (h,cp) -> (h*131+cp) % 1000000007)` —
    * intermediates < 131·10^9 + 2^21 < 2^63 both engines.
    */
  case class PolyTokenHashP(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any =
      polyHash(v.asInstanceOf[UTF8String].toString, Mult1, ModP)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // use the RETURNED (possibly class-qualified) name — see
      // PortableTokenHash64.doGenCode
      val fn = ctx.addNewFunction("graftPolyHashP",
        s"""
          |private long graftPolyHashP(String s) {
          |  long h = 0L;
          |  int i = 0;
          |  while (i < s.length()) {
          |    int cp = s.codePointAt(i);
          |    h = (h * ${Mult1}L + cp) % ${ModP}L;
          |    i += Character.charCount(cp);
          |  }
          |  return h;
          |}
        """.stripMargin)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $fn($v.toString());")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def poly_token_hash(c: Column): Column = column(PolyTokenHashP(expression(c)))

  /** Codegen linear scorer over the hashed token stream of a TEXT column
    * — one pass, weights shipped via `addReferenceObj` (the
    * [[PhraseMatches]] pattern), kernel in [[TokenFolds.foldLong]].
    * Replaces the interpreted `aggregate()` HOF fold (CodegenFallback)
    * AND the D-element `typedlit` weight literal that rode the plan in
    * [[graft.operators.LinearClassifier.score]].
    */
  case class TokenFoldLong(child: Expression, weights: Array[Long],
                           bias: Long, bigrams: Boolean) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_token_fold"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.foldLong(v.asInstanceOf[UTF8String].toString, weights, bias, bigrams)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("graftFoldW", weights, "long[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.foldLong(" +
          s"$v.toString(), $wRef, ${bias}L, $bigrams);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def token_fold_long(text: Column, weights: Array[Long], bias: Long,
                      bigrams: Boolean): Column =
    column(TokenFoldLong(expression(text), weights, bias, bigrams))

  /** [[TokenFoldLong]]'s double flavor — DSIR log-importance scoring
    * ([[graft.operators.ImportanceResampler.scoreDocs]]); accumulation
    * order matches the replaced HOF bit-for-bit ([[TokenFolds.foldDouble]]).
    */
  case class TokenFoldDouble(child: Expression, weights: Array[Double],
                             bigrams: Boolean) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_token_fold_d"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.foldDouble(v.asInstanceOf[UTF8String].toString, weights, bigrams)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("graftFoldWd", weights, "double[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.foldDouble(" +
          s"$v.toString(), $wRef, $bigrams);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def token_fold_double(text: Column, weights: Array[Double],
                        bigrams: Boolean): Column =
    column(TokenFoldDouble(expression(text), weights, bigrams))

  /** `arr[index]` against a driver-built long array shipped via
    * `addReferenceObj` — the per-epoch weight lookup of the perceptron's
    * margin pass, replacing a `typedlit` literal array of up to 2^18
    * longs serialized into EVERY epoch's plan. Index must be in
    * [0, arr.length) — the caller owns the bound (perceptron buckets are
    * `pmod`-produced).
    */
  case class LongArrayGet(child: Expression, arr: Array[Long]) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_weight_at"

    override def nullSafeEval(v: Any): Any = arr(v.asInstanceOf[Long].toInt)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("graftWeightArr", arr, "long[]")
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $aRef[(int) $v];")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def long_array_get(index: Column, arr: Array[Long]): Column =
    column(LongArrayGet(expression(index), arr))

  /** The nine Gopher signals in one codegen pass
    * ([[TokenFolds.gopherStats]]) — the rule bundle runs over EVERY raw
    * document as a pre-dedup pipeline gate, so its word aggregates must
    * not be interpreted HOF folds.
    */
  case class GopherStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_gopher_stats"

    override def nullSafeEval(v: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        TokenFolds.gopherStats(v.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.TokenFolds.gopherStats($v.toString()));")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def gopher_stats(text: Column): Column = column(GopherStatsExpr(expression(text)))

  /** `[n_tokens, n_stop_tokens]` in one codegen pass
    * ([[TokenFolds.stopStats]]; the stopword set rides as a plan
    * reference object) — the stopword-ratio HOF replacement on the
    * quality-score path.
    */
  case class StopStatsExpr(child: Expression, stops: java.util.HashSet[String])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_stop_stats"

    override def nullSafeEval(v: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        TokenFolds.stopStats(v.asInstanceOf[UTF8String].toString, stops))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("graftStopSet", stops,
        "java.util.HashSet<String>")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.TokenFolds.stopStats($v.toString(), $setRef));")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def stop_stats(text: Column, stopwords: Seq[String]): Column = {
    val set = new java.util.HashSet[String]()
    stopwords.foreach(set.add)
    column(StopStatsExpr(expression(text), set))
  }

  /** The portable document fingerprint (content fold — per-token
    * codepoint polynomial folded ·31, see [[TokenFolds.fingerprint]])
    * as a codegen scalar — every sampler, split, shuffle, seen-store
    * key and Gumbel draw keys on it, so it must not be the one
    * interpreted HOF on an otherwise codegen'd every-document path.
    */
  case class PortableFingerprintExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fingerprint"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.fingerprint(v.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.fingerprint($v.toString());")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def portable_fingerprint(text: Column): Column =
    column(PortableFingerprintExpr(expression(text)))

  /** Word k-shingles of a single-space-tokenized string, as an array of
    * strings — semantically identical to
    * `transform(sequence(0, greatest(n-k, 0)), i -> array_join(slice(tokens, i+1, k), " "))`
    * but generated as one tight byte scan: with a single-space separator,
    * every k-gram IS a contiguous substring of the original text (split +
    * rejoin reproduces the original bytes), so each shingle is an
    * offset/length view over one shared byte array — no per-token objects,
    * no interpreted lambdas. The HOF form was ~8 s per evaluation at sf0.1
    * (and 30-120 s when a planner decision moved it to a single thread);
    * this is <0.5 s.
    */
  case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      evalShingles(v.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = ctx.addNewFunction("graftWordShingles",
        s"""
           |private org.apache.spark.sql.catalyst.util.GenericArrayData graftWordShingles(
           |    org.apache.spark.unsafe.types.UTF8String s, int k) {
           |  byte[] b = s.getBytes();
           |  int len = b.length;
           |  int n = 1;
           |  for (int p = 0; p < len; p++) if (b[p] == 0x20) n++;
           |  int[] starts = new int[n + 1];
           |  starts[0] = 0;
           |  int t = 1;
           |  for (int p = 0; p < len; p++) if (b[p] == 0x20) starts[t++] = p + 1;
           |  starts[n] = len + 1; // sentinel: end of token i is starts[i+1] - 2 + 1
           |  int m = java.lang.Math.max(n - k, 0) + 1;
           |  org.apache.spark.unsafe.types.UTF8String[] out =
           |    new org.apache.spark.unsafe.types.UTF8String[m];
           |  for (int i = 0; i < m; i++) {
           |    int endTok = java.lang.Math.min(i + k - 1, n - 1);
           |    int start = starts[i];
           |    int end = starts[endTok + 1] - 1;
           |    out[i] = org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, end - start);
           |  }
           |  return new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
           |}
         """.stripMargin)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn($v, $k);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private[graft] def evalShingles(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val b = s.getBytes
    val len = b.length
    var n = 1
    var p = 0
    while (p < len) { if (b(p) == 0x20) n += 1; p += 1 }
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var t = 1
    p = 0
    while (p < len) { if (b(p) == 0x20) { starts(t) = p + 1; t += 1 }; p += 1 }
    starts(n) = len + 1
    val m = math.max(n - k, 0) + 1
    val out = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val endTok = math.min(i + k - 1, n - 1)
      val start = starts(i)
      val end = starts(endTok + 1) - 1
      out(i) = UTF8String.fromBytes(b, start, end - start)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  def word_shingles(text: Column, k: Int): Column = column(WordShingles(expression(text), k))

  /** Unicode normalization (`java.text.Normalizer`) as a codegen scalar —
    * the column-shaped form of [[graft.operators.TextAnalysis.normalizeText]]'s
    * per-string logic, so the preClean stage that touches EVERY raw
    * document stays inside WholeStageCodegen (the earlier whole-row
    * `Dataset.map` inserted a Deserialize/Serialize pair around a Row
    * encoder). Keeps the quick-check fast path: an already-normalized
    * string is returned as the SAME UTF8String — no copy, no rebuild.
    * `form` is validated at construction (unknown form → loud, plan time).
    */
  case class NormalizeForm(child: Expression, form: String) extends UnaryExpression {
    // resolves the form name eagerly so a typo fails at plan time, and the
    // codegen below can safely splice the enum constant name into Java
    private val resolvedForm = java.text.Normalizer.Form.valueOf(form)
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any = {
      val u = v.asInstanceOf[UTF8String]
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, resolvedForm)) u
      else UTF8String.fromString(java.text.Normalizer.normalize(s, resolvedForm))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val s = ctx.freshName("s")
        val f = s"java.text.Normalizer.Form.${resolvedForm.name}"
        s"""
           |String $s = $v.toString();
           |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
           |  ? $v
           |  : org.apache.spark.unsafe.types.UTF8String.fromString(
           |      java.text.Normalizer.normalize($s, $f));
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def normalize_unicode(text: Column, form: String): Column =
    column(NormalizeForm(expression(text), form))

  /** Mojibake repair as a codegen scalar — static-invokes the one shared
    * implementation [[graft.operators.TextAnalysis.fixMojibakeString]]
    * (Scala objects emit static forwarders, so generated Java calls it
    * directly). Untouched strings come back as the SAME UTF8String: the
    * repair function returns its input by reference when the exact test
    * fails, and reference equality is checked here before any re-encode.
    */
  case class FixMojibake(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any = {
      val u = v.asInstanceOf[UTF8String]
      val s = u.toString
      val r = graft.operators.TextAnalysis.fixMojibakeString(s)
      if (r eq s) u else UTF8String.fromString(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val s = ctx.freshName("s")
        val r = ctx.freshName("r")
        s"""
           |String $s = $v.toString();
           |String $r = graft.operators.TextAnalysis.fixMojibakeString($s);
           |${ev.value} = ($r == (Object) $s)
           |  ? $v
           |  : org.apache.spark.unsafe.types.UTF8String.fromString($r);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def fix_mojibake(text: Column): Column = column(FixMojibake(expression(text)))

  /** HTML → text extraction as a codegen scalar — static-invokes the one
    * shared parser [[graft.operators.HtmlExtract.extractTextString]]
    * (single-pass state machine, fail-soft on crawl garbage).
    */
  case class HtmlText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(
        graft.operators.HtmlExtract.extractTextString(
          v.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        s"""
           |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  graft.operators.HtmlExtract.extractTextString($v.toString()));
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def html_text(html: Column): Column = column(HtmlText(expression(html)))

  /** HTML → boilerplate-stripped content text as a codegen scalar —
    * static-invokes [[graft.operators.Boilerplate.cleanHtmlString]]
    * (same single-pass walker as [[HtmlText]], plus the integer-exact
    * block classification). Thresholds are plan-time constants spliced
    * into the generated call; the stopword set (the classification
    * LANGUAGE) ships as a plan reference object.
    */
  case class HtmlClean(child: Expression, minWords: Int, ldNum: Int,
                       ldDen: Int, swNum: Int, swDen: Int,
                       stopwords: Seq[String]) extends UnaryExpression {
    require(minWords >= 0 && ldDen > 0 && swDen > 0,
      "HtmlClean thresholds must be non-negative with positive denominators")
    // built eagerly: an empty stopword list fails at plan time
    private val stopSet = graft.operators.Boilerplate.toSet(stopwords)
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(
        graft.operators.Boilerplate.cleanHtmlString(
          v.asInstanceOf[UTF8String].toString,
          minWords, ldNum, ldDen, swNum, swDen, stopSet))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("graftBoilerplateStops", stopSet,
        "java.util.HashSet<String>")
      nullSafeCodeGen(ctx, ev, v => {
        s"""
           |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  graft.operators.Boilerplate.cleanHtmlString($v.toString(),
           |    $minWords, $ldNum, $ldDen, $swNum, $swDen, $setRef));
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def html_clean(html: Column, minWords: Int, ldNum: Int, ldDen: Int,
                 swNum: Int, swDen: Int,
                 stopwords: Seq[String] =
                   graft.operators.TextAnalysis.defaultStopwords): Column =
    column(HtmlClean(expression(html), minWords, ldNum, ldDen, swNum, swDen,
      stopwords))

  /** Intra-document line dedup as a codegen scalar — static-invokes
    * [[graft.operators.TextAnalysis.dedupLinesString]] (keep the first
    * occurrence of every non-empty line, preserve order and paragraph
    * breaks).
    */
  case class DedupLines(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(
        graft.operators.TextAnalysis.dedupLinesString(
          v.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        s"""
           |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  graft.operators.TextAnalysis.dedupLinesString($v.toString()));
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def dedup_lines(text: Column): Column = column(DedupLines(expression(text)))

  /** Total phrase-blocklist occurrences in a string — the
    * [[AhoCorasick]] automaton (built once at plan time, shipped as a
    * plan reference object) run per row inside codegen: one pass over
    * the text regardless of phrase count, where a `contains` chain
    * scans once per phrase. Exact-case, substring-level by contract.
    */
  case class PhraseMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
    // built eagerly: an invalid phrase list fails at PLAN time, loudly
    private val ac = AhoCorasick(patterns)
    override def dataType: DataType = IntegerType

    override def nullSafeEval(v: Any): Any =
      ac.countMatches(v.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val acRef = ctx.addReferenceObj("graftAhoCorasick", ac,
        classOf[AhoCorasick].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $acRef.countMatches($v.toString());")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def phrase_matches(text: Column, patterns: Seq[String]): Column =
    column(PhraseMatches(expression(text), patterns))

  /** Sentence-boundary chunks as a codegen scalar — static-invokes
    * [[graft.operators.TextAnalysis.sentenceChunksString]] (rule-based
    * segmentation + greedy token-budget packing), returning
    * `ARRAY<STRING>`.
    */
  case class SentenceChunks(child: Expression, maxTokens: Int) extends UnaryExpression {
    require(maxTokens >= 1, s"maxTokens must be positive, got $maxTokens")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    private def toArrayData(chunks: Array[String]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        chunks.map(UTF8String.fromString(_): AnyRef))

    override def nullSafeEval(v: Any): Any =
      toArrayData(graft.operators.TextAnalysis.sentenceChunksString(
        v.asInstanceOf[UTF8String].toString, maxTokens))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = ctx.addNewFunction("graftSentenceChunks",
        """
          |private org.apache.spark.sql.catalyst.util.GenericArrayData graftSentenceChunks(
          |    String s, int maxTokens) {
          |  String[] chunks = graft.operators.TextAnalysis.sentenceChunksString(s, maxTokens);
          |  Object[] out = new Object[chunks.length];
          |  for (int i = 0; i < chunks.length; i++)
          |    out[i] = org.apache.spark.unsafe.types.UTF8String.fromString(chunks[i]);
          |  return new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
          |}
        """.stripMargin)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $fn($v.toString(), $maxTokens);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def sentence_chunks(text: Column, maxTokens: Int): Column =
    column(SentenceChunks(expression(text), maxTokens))

  /** The per-URL robots verdict as ONE codegen scalar — static-invokes
    * [[TokenFolds.robotsVerdict]]: longest-match fold over the host's
    * broadcast rule arrays with RFC 9309 `*`/`$` matching as a direct
    * char walk. Replaces the interpreted `aggregate()` HOF +
    * `regexp_like(column-pattern)` form, which paid a `Pattern.compile`
    * per URL × rule (the column-side pattern defeats Spark's regex
    * cache) and ran row-at-a-time — the politeness gate runs over EVERY
    * crawl-frontier URL, so its per-row constant factor is the gate's
    * whole cost at corpus scale. Null rules (host without a robots row)
    * → null out; the caller coalesces to allowed.
    */
  case class RobotsVerdictExpr(path: Expression, patterns: Expression,
                               allows: Expression) extends TernaryExpression {
    override def first: Expression = path
    override def second: Expression = patterns
    override def third: Expression = allows
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_robots_verdict"

    override def nullSafeEval(p: Any, pats: Any, als: Any): Any =
      TokenFolds.robotsVerdict(p.asInstanceOf[UTF8String],
        pats.asInstanceOf[ArrayData], als.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, pats, als) =>
        s"${ev.value} = graft.functions.TokenFolds.robotsVerdict($p, $pats, $als);")

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(path = newFirst, patterns = newSecond, allows = newThird)
  }

  def robots_verdict(path: Column, patterns: Column, allows: Column): Column =
    column(RobotsVerdictExpr(expression(path), expression(patterns),
      expression(allows)))

  /** Tracking-parameter strip for URL canonicalization as ONE codegen
    * scalar — static-invokes [[TokenFolds.stripTracking]] (byte walk
    * over the query string). Replaces the `filter(split(query, "&"),
    * p => !p.rlike(…))` + `array_join` pair, whose ArrayFilter lambda is
    * an interpreted HOF running once per URL on the canonicalization
    * path every crawl-side operator shares.
    */
  case class StripTrackingExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_strip_tracking"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.stripTracking(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.stripTracking($v);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def strip_tracking(query: Column): Column =
    column(StripTrackingExpr(expression(query)))

  /** One named section's properties as `map<string,string>` — the
    * codegen walk behind [[graft.operators.JvmStats.heapProjection]]
    * (static-invokes [[TokenFolds.sectionPropsMap]]); see that kernel
    * for the triple-HOF stack it replaces and the first-wins duplicate
    * policy.
    */
  case class SectionPropsMapExpr(child: Expression, section: String)
      extends UnaryExpression {
    private val secU = UTF8String.fromString(section)
    override def dataType: DataType =
      MapType(StringType, StringType, valueContainsNull = true)
    override def prettyName: String = "graft_section_props"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.sectionPropsMap(v.asInstanceOf[ArrayData], secU)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftSectionName", secU,
        classOf[UTF8String].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.sectionPropsMap($v, $ref);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def section_props_map(sections: Column, section: String): Column =
    column(SectionPropsMapExpr(expression(sections), section))

  /** EVERY section's properties as one `{section}_{property}` map — the
    * codegen walk behind [[graft.operators.JvmStats.toPropsMap]]
    * (static-invokes [[TokenFolds.allSectionPropsMap]]); same shape as
    * [[SectionPropsMapExpr]] with the section-name filter replaced by a
    * key concat.
    */
  case class AllSectionPropsMapExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType =
      MapType(StringType, StringType, valueContainsNull = true)
    override def prettyName: String = "graft_all_section_props"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.allSectionPropsMap(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.allSectionPropsMap($v);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def all_section_props_map(sections: Column): Column =
    column(AllSectionPropsMapExpr(expression(sections)))

  /** Token count of a single-space-joined stream (0 for empty, spaces+1
    * otherwise) as one codegen byte walk — static-invokes
    * [[TokenFolds.joinedTokenCount]]. For joiner-produced streams (BPE
    * token columns): counting via `replace`+`length` copies the whole
    * document, and `size(split(…))` allocates the array, on the one
    * every-document tokenizer stage.
    */
  case class JoinedTokenCountExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_joined_token_count"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.joinedTokenCount(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.joinedTokenCount($v);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def joined_token_count(stream: Column): Column =
    column(JoinedTokenCountExpr(expression(stream)))

  /** Per-document ordered text rebuild — join one string field out of an
    * `array<struct>` (already sorted by `array_sort` inside the
    * aggregate) with a separator, as a codegen scalar static-invoking
    * [[TokenFolds.joinStructField]]. Replaces the
    * `transform(sorted, x -> x.field)` + `array_join`/`concat_ws` pair,
    * whose lambda is an interpreted HOF (CodegenFallback) running once
    * per surviving document after the keyed exchange.
    *
    * `numFields`/`fieldIdx` are plan-time constants: the caller names
    * the struct shape it built two lines earlier.
    */
  case class JoinOrderedStructs(child: Expression, numFields: Int,
                                fieldIdx: Int, sep: String)
      extends UnaryExpression {
    require(numFields > 0 && fieldIdx >= 0 && fieldIdx < numFields,
      s"fieldIdx $fieldIdx out of range for $numFields-field structs")
    private val sepU = UTF8String.fromString(sep)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_join_structs"

    override def nullSafeEval(v: Any): Any =
      TokenFolds.joinStructField(v.asInstanceOf[ArrayData], numFields,
        fieldIdx, sepU)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sepRef = ctx.addReferenceObj("graftJoinSep", sepU,
        "org.apache.spark.unsafe.types.UTF8String")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.TokenFolds.joinStructField(" +
          s"$v, $numFields, $fieldIdx, $sepRef);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def join_ordered_structs(sorted: Column, numFields: Int, fieldIdx: Int,
                           sep: String): Column =
    column(JoinOrderedStructs(expression(sorted), numFields, fieldIdx, sep))
}
