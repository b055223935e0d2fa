package graft.functions

/** Per-row token-stream fold kernels — the single-pass, allocation-light
  * bodies behind the codegen scoring expressions in [[TextExpressions]]
  * ([[TextExpressions.TokenFoldLong]] / [[TextExpressions.TokenFoldDouble]] /
  * [[TextExpressions.PortableFingerprintExpr]]). Generated code
  * static-invokes these (the [[graft.operators.Boilerplate]] pattern), so
  * the classifier/DSIR stages that touch EVERY raw document stay inside
  * WholeStageCodegen instead of falling back to the interpreted
  * `aggregate()` higher-order function.
  *
  * Tokenization matches [[Functions.tokens]] + the empty filter exactly:
  * segments between single spaces (`split(text, " ")`), empty segments
  * skipped. The token hash is [[Functions.portableTokenHash]]'s
  * arithmetic (polyHash over all codepoints, mult 131 mod 1e9+7); the
  * bigram combine is [[graft.operators.LinearClassifier.bigramBucket]]'s
  * `(h(a)·131 + h(b)) mod p mod D`. Floating-point accumulation order in
  * [[foldDouble]] is the SAME as the HOF form it replaced — unigram fold
  * in token order, bigram fold in pair order, summed at the end — so
  * every gated double is bit-identical.
  */
object TokenFolds {

  final val P = 1000000007L

  /** Integer linear score: bias + Σ w[bucket(t)] (+ Σ w[bigramBucket]
    * when `bigrams`). Exact 64-bit arithmetic, order-insensitive.
    */
  def foldLong(s: String, w: Array[Long], bias: Long, bigrams: Boolean): Long = {
    val d = w.length
    var uni = bias
    var bi = 0L
    var prev = -1L
    var i = 0
    val n = s.length
    while (i <= n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        var h = 0L
        var k = i
        while (k < j) {
          val cp = s.codePointAt(k)
          h = (h * 131L + cp) % P
          k += Character.charCount(cp)
        }
        uni += w((h % d).toInt)
        if (bigrams && prev >= 0L)
          bi += w((((prev * 131L + h) % P) % d).toInt)
        prev = h
      }
      i = j + 1
    }
    uni + bi
  }

  /** Double linear score (DSIR log importance weight): Σ w[bucket(t)]
    * (+ bigram terms), empty text scores 0. Accumulation order matches
    * the replaced HOF fold bit-for-bit (see object doc).
    */
  def foldDouble(s: String, w: Array[Double], bigrams: Boolean): Double = {
    val d = w.length
    var uni = 0.0
    var bi = 0.0
    var prev = -1L
    var i = 0
    val n = s.length
    while (i <= n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        var h = 0L
        var k = i
        while (k < j) {
          val cp = s.codePointAt(k)
          h = (h * 131L + cp) % P
          k += Character.charCount(cp)
        }
        uni += w((h % d).toInt)
        if (bigrams && prev >= 0L)
          bi += w((((prev * 131L + h) % P) % d).toInt)
        prev = h
      }
      i = j + 1
    }
    uni + bi
  }

  /** The Gopher stop terms, in signal-bit order (rule A1.1's eight). */
  val GopherStops: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** All nine Gopher signals in ONE pass — bit-identical to the Column
    * formulation it replaces (which leaned on interpreted HOF folds for
    * the word aggregates):
    * `[n_words, sum_word_len, n_alpha_words, n_hash, n_ellipsis,
    * n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_hits]`.
    * Semantics pinned to the originals: words split on Java `\s+`
    * (space/tab/LF/VT/FF/CR), word length in CODEPOINTS, alpha =
    * contains [A-Za-z]; `...` counted non-overlapping left-to-right
    * (the regexp_replace arithmetic); lines split on `\n` and trimmed
    * of SPACES only (Spark `trim` semantics — a tab-only line still
    * counts); stop hits = number of DISTINCT stop terms present
    * (array_contains sums, not occurrences).
    */
  def gopherStats(s: String): Array[Long] = {
    val out = new Array[Long](9)
    val n = s.length
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' ||
      c == '\u000B' || c == '\f' || c == '\r'
    var i = 0
    var stopMask = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        var j = i
        var alpha = false
        while (j < n && !isWs(s.charAt(j))) {
          val c = s.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha = true
          j += 1
        }
        out(0) += 1
        out(1) += s.codePointCount(i, j)
        if (alpha) out(2) += 1
        var t = 0
        while (t < GopherStops.length) {
          val st = GopherStops(t)
          if (j - i == st.length && s.regionMatches(i, st, 0, st.length))
            stopMask |= 1 << t
          t += 1
        }
        i = j
      }
    }
    out(8) = java.lang.Integer.bitCount(stopMask)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '#') { out(3) += 1; i += 1 }
      else if (c == '.' && i + 2 < n && s.charAt(i + 1) == '.' &&
               s.charAt(i + 2) == '.') { out(4) += 1; i += 3 }
      else i += 1
    }
    i = 0
    while (i <= n) {
      var j = s.indexOf('\n', i)
      if (j < 0) j = n
      var a = i
      var b = j
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        out(5) += 1
        val c0 = s.charAt(a)
        if ((c0 == '•' || c0 == '-' || c0 == '*') && a + 1 < b &&
            s.charAt(a + 1) == ' ') out(6) += 1
        if (b - a >= 3 && s.charAt(b - 1) == '.' && s.charAt(b - 2) == '.' &&
            s.charAt(b - 3) == '.') out(7) += 1
      }
      i = j + 1
    }
    out
  }

  /** `[n_tokens, n_stop_tokens]` over the single-space token stream —
    * the stopword-ratio numerator/denominator in one pass, replacing a
    * `filter(isInCollection)` HOF. Matches `split(text, " ")` exactly:
    * EMPTY segments count toward n_tokens (they never match a stopword).
    */
  def stopStats(s: String, stops: java.util.HashSet[String]): Array[Long] = {
    var nTok = 0L
    var nStop = 0L
    var i = 0
    val n = s.length
    while (i <= n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      nTok += 1
      if (j > i && stops.contains(s.substring(i, j))) nStop += 1
      i = j + 1
    }
    Array(nTok, nStop)
  }

  /** The portable document fingerprint: token-LENGTH fold
    * `(acc·31 + len) mod p` over `split(text, " ")` — INCLUDING empty
    * segments, exactly like the `aggregate(tokens(text), …)` column form
    * it replaces (split keeps empties; the fingerprint never filtered
    * them). Lengths are codepoint counts (Spark `length` = UTF8String
    * codepoints, not UTF-16 units).
    */
  def fingerprint(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i <= n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      acc = (acc * 31L + s.codePointCount(i, j)) % P
      i = j + 1
    }
    acc
  }
}
