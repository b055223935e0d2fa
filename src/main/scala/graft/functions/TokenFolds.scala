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

  /** RFC 9309 path-pattern match as a direct BYTE walk over the UTF-8
    * encodings — `*` matches any byte run, a trailing `$` anchors the
    * pattern at the end of the path, everything else (including `?`) is
    * a literal, and a pattern without `$` matches any PREFIX of the
    * path. Greedy single-star backtracking (the classic O(n·m) wildcard
    * walk): on a mismatch the most recent `*` absorbs one more byte and
    * the suffix retries. Byte-wise is EXACTLY equivalent to
    * codepoint-wise here: UTF-8 is self-synchronizing — a pattern's
    * first byte is never a continuation byte, so a match can never begin
    * mid-character, and absorption positions that split a character
    * simply fail to match and walk on. No `Pattern.compile`, no regex
    * semantics anywhere, no string materialization — wildcard matching
    * is replayable arithmetic, which is what lets the robots verdict
    * stay oracle-checkable while running inside codegen.
    */
  def robotsMatch(path: org.apache.spark.unsafe.types.UTF8String,
                  pattern: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val pnAll = pattern.numBytes
    // `$` is ASCII 0x24: as a final byte it can never be the tail of a
    // multi-byte character (continuations are >= 0x80), so this is exact
    val anchored = pnAll > 0 && pattern.getByte(pnAll - 1) == '$'.toByte
    val pn = if (anchored) pnAll - 1 else pnAll
    val star = '*'.toByte
    val n = path.numBytes
    var p = 0
    var s = 0
    var starP = -1
    var starS = 0
    while (true) {
      if (p == pn) {
        if (!anchored || s == n) return true
        // anchored with path left over: the last * absorbs one more byte
        if (starP < 0) return false
        starS += 1
        if (starS > n) return false
        s = starS; p = starP + 1
      } else if (pattern.getByte(p) == star) {
        starP = p
        starS = s
        p += 1
      } else if (s < n && pattern.getByte(p) == path.getByte(s)) {
        p += 1; s += 1
      } else {
        if (starP < 0) return false
        starS += 1
        if (starS > n) return false
        s = starS; p = starP + 1
      }
    }
    false // unreachable: the loop exits via return
  }

  /** String flavor of [[robotsMatch]] — the spec-level reference entry
    * point; delegates to the byte walk.
    */
  def robotsMatch(path: String, pattern: String): Boolean =
    robotsMatch(org.apache.spark.unsafe.types.UTF8String.fromString(path),
      org.apache.spark.unsafe.types.UTF8String.fromString(pattern))

  /** The per-URL robots verdict: longest-match fold over the host's rule
    * arrays (parallel `patterns`/`allows`, broadcast-joined onto the URL
    * row), RFC tie-break — equal-length rules resolve to allow; no
    * matching rule means allowed. Specificity is the raw pattern's OCTET
    * length (`*` and `$` count) — RFC 9309's most-octets rule, identical
    * to character length for ASCII patterns. One pass over the rules,
    * one byte walk per candidate rule, zero per-URL string allocation.
    */
  def robotsVerdict(path: org.apache.spark.unsafe.types.UTF8String,
                    patterns: org.apache.spark.sql.catalyst.util.ArrayData,
                    allows: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = patterns.numElements()
    while (i < n) {
      val pat = patterns.getUTF8String(i)
      val len = pat.numBytes
      val allow = allows.getBoolean(i)
      // only rules that could improve the fold pay for a byte walk
      if ((len > bestLen || (len == bestLen && allow && !bestAllow)) &&
          robotsMatch(path, pat)) {
        bestLen = len
        bestAllow = allow
      }
      i += 1
    }
    bestAllow
  }

  /** Join one STRING field out of an array of structs with a separator —
    * the per-document text rebuild after an ordered
    * `array_sort(collect_list(struct(pos, str)))` aggregation
    * (paragraph-dedup reassembly, shared-span token rebuild). The sort
    * already happened in the aggregate; this kernel is just the field
    * projection + join, replacing an interpreted `transform()` lambda
    * (CodegenFallback) on the post-aggregation document path. Null
    * elements/fields are skipped, matching `concat_ws`/`array_join`.
    */
  def joinStructField(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                      numFields: Int, fieldIdx: Int,
                      sep: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, numFields)
        if (!row.isNullAt(fieldIdx)) parts(i) = row.getUTF8String(fieldIdx)
      }
      i += 1
    }
    // concatWs skips null inputs — same contract as array_join/concat_ws
    org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
  }

  /** Collect one named section's properties into a string map — the walk
    * behind [[graft.operators.JvmStats.heapProjection]], replacing a
    * `map_from_entries(transform(flatten(transform(filter(sections, …)`
    * triple-lambda stack (each an interpreted HOF, run once per JVMSTATS
    * event on the wire path). Sections shape is fixed by the proto
    * schema: `array<struct<name, properties: array<struct<name, value>>>>`.
    * Duplicate property keys keep the FIRST occurrence (the HOF form
    * threw under the default map-key dedup policy; first-wins is the
    * fail-soft choice for malformed agent payloads).
    */
  def sectionPropsMap(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                      section: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.sql.catalyst.util.MapData = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val vals = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getStruct(i, 2)
        if (!s.isNullAt(0) && s.getUTF8String(0) == section && !s.isNullAt(1)) {
          val props = s.getArray(1)
          val m = props.numElements()
          var j = 0
          while (j < m) {
            if (!props.isNullAt(j)) {
              val p = props.getStruct(j, 2)
              if (!p.isNullAt(0) && seen.add(p.getUTF8String(0))) {
                keys += p.getUTF8String(0)
                vals += (if (p.isNullAt(1)) null else p.getUTF8String(1))
              }
            }
            j += 1
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray))
  }

  /** Token count of a SINGLE-SPACE-JOINED stream: 0 for empty, spaces+1
    * otherwise — one byte walk, no split allocation (0x20 never occurs
    * inside a UTF-8 multi-byte sequence, so the byte count is exact).
    * For streams a joiner produced (BPE token streams), not free text.
    */
  def joinedTokenCount(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes
    if (n == 0) return 0L
    var c = 1L
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  private val Underscore = org.apache.spark.unsafe.types.UTF8String.fromString("_")

  /** ALL sections' properties flattened to one `{section}_{property}` →
    * value map — the event-sized walk behind
    * [[graft.operators.JvmStats.toPropsMap]], replacing the nested
    * interpreted `transform(transform(…))` + `flatten` +
    * `map_from_entries` stack. Key join mirrors `concat_ws("_", s, p)`
    * (null names are skipped, not rendered); duplicate composite keys
    * are FIRST-WINS like [[sectionPropsMap]] (the combinator form
    * inherited Spark's map-dedup EXCEPTION policy — a malformed event
    * repeating a key should not kill the job); null section/property
    * structs are skipped.
    */
  def allSectionPropsMap(arr: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.util.MapData = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val vals = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getStruct(i, 2)
        val sName = if (s.isNullAt(0)) null else s.getUTF8String(0)
        if (!s.isNullAt(1)) {
          val props = s.getArray(1)
          val m = props.numElements()
          var j = 0
          while (j < m) {
            if (!props.isNullAt(j)) {
              val p = props.getStruct(j, 2)
              val pName = if (p.isNullAt(0)) null else p.getUTF8String(0)
              val key =
                if (sName == null && pName == null)
                  org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
                else if (sName == null) pName
                else if (pName == null) sName
                else org.apache.spark.unsafe.types.UTF8String.concat(
                  sName, Underscore, pName)
              if (seen.add(key)) {
                keys += key
                vals += (if (p.isNullAt(1)) null else p.getUTF8String(1))
              }
            }
            j += 1
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray))
  }

  /** Drop tracking parameters from a URL query string — the byte-walk
    * form of `filter(split(query, "&"), p => !p.rlike("^(utm_[^&=]*|fbclid|gclid)="))`
    * + `array_join(…, "&")` (an interpreted ArrayFilter on the per-URL
    * canonicalization path). A param is tracking iff it starts with
    * `utm_` and carries a `=` anywhere after (the `[^&=]*` run is
    * implicit: `&` cannot appear inside a split param and the scan stops
    * at the FIRST `=`), or is literally `fbclid=…` / `gclid=…`. Empty
    * params ("a=1&&b=2") are kept, exactly like the lambda form. All
    * delimiters are ASCII, so the byte walk is exact on any UTF-8 query.
    * Returns the kept params re-joined with `&` ("" when none survive).
    */
  def stripTracking(query: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.unsafe.types.UTF8String = {
    val b = query.getBytes
    val n = b.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var first = true
    while (i <= n) {
      var j = i
      while (j < n && b(j) != '&') j += 1
      // param = bytes [i, j)
      var drop = false
      if (j - i >= 5 && b(i) == 'u' && b(i + 1) == 't' && b(i + 2) == 'm' &&
          b(i + 3) == '_') {
        var k = i + 4
        while (k < j && b(k) != '=') k += 1
        drop = k < j
      } else if (j - i >= 7 && b(i) == 'f' && b(i + 1) == 'b' &&
          b(i + 2) == 'c' && b(i + 3) == 'l' && b(i + 4) == 'i' &&
          b(i + 5) == 'd' && b(i + 6) == '=') {
        drop = true
      } else if (j - i >= 6 && b(i) == 'g' && b(i + 1) == 'c' &&
          b(i + 2) == 'l' && b(i + 3) == 'i' && b(i + 4) == 'd' &&
          b(i + 5) == '=') {
        drop = true
      }
      if (!drop) {
        if (!first) sb.append('&')
        sb.append(new String(b, i, j - i, java.nio.charset.StandardCharsets.UTF_8))
        first = false
      }
      i = j + 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  /** The portable document fingerprint: CONTENT fold
    * `(acc·31 + polyHash(token)) mod p` over `split(text, " ")` —
    * including empty segments (contributing 0), where polyHash is the
    * shared per-token codepoint polynomial
    * ([[graft.functions.Functions.portableTokenHash]]'s arithmetic,
    * mult 131 mod p). Replaced the earlier token-LENGTH fold
    * `(acc·31 + len)`, under which ANY two documents with the same
    * token-length sequence collided with probability 1 ("the cat sat"
    * vs "his dog ran") — catastrophic for the Bloom seen-store (silent
    * document loss at ingest) and a correlated-fate bias for every
    * fingerprint-keyed sampler/split/shuffle over templated corpora.
    * Still engine-portable: a nested `list_reduce` in the oracle, exact
    * BIGINT arithmetic (acc·31 + h < 32·10⁹ ≪ 2⁶³), codepoints not
    * UTF-16 units.
    */
  def fingerprint(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i <= n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      var h = 0L
      var k = i
      while (k < j) {
        val cp = s.codePointAt(k)
        h = (h * 131L + cp) % P
        k += Character.charCount(cp)
      }
      acc = (acc * 31L + h) % P
      i = j + 1
    }
    acc
  }
}
