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
