package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Functions => F}

/** Text-analysis operators for a training-data pipeline over a `documents`
  * table (doc_id, text, lang, source, n_chars). All transforms are pure
  * Column expressions → whole-stage codegen, no shuffles except the final
  * aggregations; at 100 TB this runs as a map-only stage over the corpus.
  */
object TextAnalysis {

  /** Default English-ish stopword list used by quality scoring. */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Per-document token statistics: token count (single-space split,
    * oracle-parity flavor), char count, mean token length.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", F.tokenCount(t))
      .withColumn("n_chars_computed", length(t))
      .withColumn("mean_token_len", F.meanTokenLength(t))
  }

  /** Per-document quality signals + composite score. */
  def qualitySignals(docs: DataFrame, stopwords: Seq[String] = defaultStopwords, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", F.tokenCount(t))
      .withColumn("punct_ratio", F.punctRatio(t))
      .withColumn("stopword_ratio", F.stopwordRatio(t, stopwords))
      .withColumn("quality", F.qualityScore(t, stopwords))
  }

  /** The Gopher quality rules (Rae et al. 2021, appendix A1.1) as exact
    * INTEGER per-document signals — the published rule set pretraining
    * curation standardized on, kept in integer counts so thresholds
    * apply by cross-multiplication and the whole verdict is
    * bit-reproducible in any engine:
    *
    *   - `n_words` / `sum_word_len` — word count and total word length
    *     (whitespace-class split; mean-word-length bounds become
    *     `3·n ≤ Σlen ≤ 10·n`);
    *   - `n_alpha_words` — words carrying ≥ 1 ASCII letter (the ≥ 80 %
    *     alphabetic rule);
    *   - `n_hash` / `n_ellipsis` — '#' and '...' occurrences (the
    *     symbol-to-word ratio ≤ 0.1 rule);
    *   - `n_lines` / `n_bullet_lines` / `n_ellipsis_lines` — bullet-led
    *     (`•`/`-`/`*` + space) and '...'-terminated lines (≤ 90 %
    *     non-bullet, ≤ 30 % ellipsis rules);
    *   - `n_stop_hits` — how many of the 8 Gopher stop words appear
    *     (`the be to of and that have with`; rule: ≥ 2).
    *
    * Map-only column arithmetic; [[gopherFilter]] applies the published
    * thresholds.
    */
  def gopherSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // ONE codegen pass computes all nine signals (TokenFolds.gopherStats
    // — semantics pinned bit-for-bit to the original Column formulation,
    // whose word aggregates were interpreted HOF folds on an
    // every-document pipeline path); q_gopher gates each signal
    val g = graft.functions.TextExpressions.gopher_stats(col(textCol))
    docs
      .withColumn("_gs", g)
      .withColumn("n_words", element_at(col("_gs"), 1))
      .withColumn("sum_word_len", element_at(col("_gs"), 2))
      .withColumn("n_alpha_words", element_at(col("_gs"), 3))
      .withColumn("n_hash", element_at(col("_gs"), 4))
      .withColumn("n_ellipsis", element_at(col("_gs"), 5))
      .withColumn("n_lines", element_at(col("_gs"), 6))
      .withColumn("n_bullet_lines", element_at(col("_gs"), 7))
      .withColumn("n_ellipsis_lines", element_at(col("_gs"), 8))
      .withColumn("n_stop_hits", element_at(col("_gs"), 9))
      .drop("_gs")
  }

  /** [[gopherSignals]] + the published keep verdict, integer
    * cross-multiplied (no doubles anywhere): word count in
    * [minWords, maxWords], mean word length in [3, 10], symbol ratio
    * ≤ 1/10, bullet lines ≤ 9/10, ellipsis lines ≤ 3/10, alphabetic
    * words ≥ 8/10, stop hits ≥ 2.
    */
  def gopherFilter(docs: DataFrame, textCol: String = "text",
                   minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val g = gopherSignals(docs, textCol)
    g.withColumn("gopher_keep",
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        lit(3L) * col("n_words") <= col("sum_word_len") &&
        col("sum_word_len") <= lit(10L) * col("n_words") &&
        lit(10L) * (col("n_hash") + col("n_ellipsis")) <= col("n_words") &&
        lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines") &&
        lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines") &&
        lit(10L) * col("n_alpha_words") >= lit(8L) * col("n_words") &&
        col("n_stop_hits") >= 2L)
  }

  /** Exact stopword-mass ratio per group: sums exact integer token counts
    * and divides ONCE, with no rounding — a single IEEE division of exact
    * integers is bit-identical across engines and partitionings (round-of-
    * double is not: engines disagree near decimal ties).
    */
  def stopwordMassByGroup(docs: DataFrame, groupCol: String, stopwords: Seq[String] = defaultStopwords, textCol: String = "text"): DataFrame = {
    // one codegen pass for both counts (see Functions.stopwordRatio)
    val st = graft.functions.TextExpressions.stop_stats(col(textCol), stopwords)
    docs
      .select(col(groupCol), element_at(st, 1).as("_tot"),
        element_at(st, 2).as("_stop"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_tot").as("total_tokens"),
        (sum("_stop").cast(DoubleType) / sum("_tot")).as("stopword_mass"))
  }

  /** Language ID via character n-gram profile scoring (the classic
    * heuristic: score each candidate language by how many of its signature
    * trigrams/words occur). Profiles are data-derived signature tokens per
    * language; pure Column expr (array intersection), no UDF.
    */
  def languageId(docs: DataFrame,
                 profiles: Map[String, Seq[String]] = LanguageProfiles.profiles,
                 textCol: String = "text"): DataFrame = {
    val toks = F.tokens(col(textCol))
    // score(lang) = #tokens found in profile(lang); predicted = argmax, stable tiebreak on lang name
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, sig) =>
      struct(size(filter(toks, t => t.isInCollection(sig))).as("score"), lit(lang).as("lang"))
    }
    docs.withColumn("lang_pred",
      greatest(scored: _*).getField("lang"))
  }

  /** The portable rolling-fingerprint Column ([[fingerprint]]'s formula as
    * a reusable expression): fold (acc·31 + polyHash(token)) mod 1e9+7
    * over the token sequence — order-sensitive CONTENT identity
    * ([[graft.functions.TokenFolds.fingerprint]] for the collision story
    * of the length-only fold it replaced).
    */
  def portableFingerprint(text: Column): Column =
    graft.functions.TextExpressions.portable_fingerprint(text)

  /** Deterministic rolling polynomial fingerprint of the token sequence,
    * mod p so it is engine-portable (no silent 64-bit wrap): order-sensitive
    * document identity for near-dup bookkeeping.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fp", portableFingerprint(col(textCol)))

  /** Deterministic train/validation split: the side is a pure function of
    * document CONTENT (fingerprint mod 100 < trainPct), so it is stable
    * across runs, engines, partitionings and corpus growth — a doc never
    * changes sides because the rows around it changed, which `sample()`
    * (RNG order) cannot promise. The portable fingerprint keeps the split
    * engine-recomputable; production pipelines wanting better mixing swap
    * in [[fingerprintStrong]]'s xxhash64 flavor (same shape, Spark-local).
    */
  def hashSplit(docs: DataFrame, trainPct: Int, textCol: String = "text"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct must be 0..100, got $trainPct")
    docs.withColumn("split",
      when(portableFingerprint(col(textCol)) % 100 < trainPct, "train")
        .otherwise("val"))
  }

  /** C4-style blocklist gate: drop every doc containing ANY blocklisted
    * token. A MAP-ONLY predicate — `arrays_overlap` over the split token
    * array against a literal array, codegen'd, no explode, no shuffle,
    * no join — which is the right shape for the typical few-hundred-word
    * list; a 10⁵+-entry list should flip to an explode + broadcast
    * anti-join instead (same result, lookup cost amortized per token).
    * Exact whole-token matching, deliberately: substring blocking is a
    * different (and false-positive-prone) contract.
    */
  def blocklistFilter(docs: DataFrame, blocklist: Seq[String],
                      textCol: String = "text"): DataFrame = {
    require(blocklist.nonEmpty, "blocklistFilter needs at least one term")
    // null text rides THROUGH (it contains no blocklisted token): the
    // raw !arrays_overlap(null, ...) predicate is SQL null, which
    // where() treats as false — silently deleting null-text docs a
    // "drop docs containing a blocked token" contract has no claim on
    docs.where(col(textCol).isNull || !arrays_overlap(
      split(col(textCol), "\\s+"),
      lit(blocklist.distinct.toArray)))
  }

  /** Multi-letter abbreviations whose trailing `.` is NOT a sentence
    * boundary even when an uppercase word follows ("Mr. Smith",
    * "etc. The next…"). A bounded public set (the usual
    * titles/latinisms/months every rule-based splitter carries);
    * dotted single-letter acronyms (U.S., e.g., i.e., a.m., initials)
    * are recognized STRUCTURALLY and need no listing.
    */
  private val Abbreviations: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "rev", "hon",
      "capt", "sgt", "col", "gen", "lt", "etc", "vs", "cf", "al", "fig",
      "vol", "dept", "univ", "inc", "ltd", "corp", "approx",
      "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept",
      "oct", "nov", "dec").foreach(s.add)
    s
  }

  /** Rule-based sentence segmentation — deterministic by contract, the
    * same class of splitter CCNet/jusText-era pipelines use: a boundary
    * is a run of `.` / `!` / `?` followed by whitespace and an uppercase
    * letter or digit (or end of text), and a newline is always a
    * boundary. "e.g. this" does not split (lowercase follows), and the
    * uppercase-follows rule is gated by an abbreviation check on a
    * SINGLE `.`: a dotted acronym (U.S., e.g., i.e., a.m.), a
    * name-initial (a bare uppercase letter preceded by a capitalized
    * word, "John F. Kennedy"), or a listed title/latinism/month
    * ([[Abbreviations]]) is not a boundary, so "U.S. Government" and
    * "Mr. Smith" stay whole — while "plan B. Next" and "did I. Then"
    * split. The residual cost of rule-based splitting is a rare
    * suppressed TRUE boundary after a sentence-final abbreviation
    * ("…and more etc. The next…") — acceptable for CHUNKING (a
    * boundary too few never cuts mid-clause the way a token-window
    * chunk does). Sentences are trimmed; empties dropped. Null in →
    * null out.
    */
  def splitSentencesString(text: String): Array[String] = {
    if (text == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(from: Int, to: Int): Unit = {
      val s = text.substring(from, to).trim
      if (s.nonEmpty) out += s
    }
    def isUpperOrDigit(c: Char) =
      (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
    val n = text.length
    // the word ending just before `endExcl` is an abbreviation: a dotted
    // acronym (U.S, e.g, a.m — letters and dots strictly alternating
    // with at least one INTERIOR dot, so length >= 3), a bare single
    // letter ONLY in name-initial context (uppercase preceded by a
    // capitalized word: "John F. Kennedy" — but "plan B. Next",
    // "vitamin C. The", "did I. Then" are true boundaries and split),
    // or a listed title/latinism/month
    def isAbbrev(endExcl: Int): Boolean = {
      var w = endExcl - 1
      while (w >= 0 && {
        val d = text.charAt(w); d != ' ' && d != '\t' && d != '\n'
      }) w -= 1
      val word = text.substring(w + 1, endExcl)
      if (word.isEmpty) return false
      if (word.length == 1 && Character.isLetter(word.charAt(0))) {
        if (!Character.isUpperCase(word.charAt(0))) return false
        var e = w
        while (e >= 0 && {
          val d = text.charAt(e); d == ' ' || d == '\t'
        }) e -= 1
        var b = e
        while (b >= 0 && {
          val d = text.charAt(b); d != ' ' && d != '\t' && d != '\n'
        }) b -= 1
        return b < e && Character.isUpperCase(text.charAt(b + 1))
      }
      var acronym = word.length >= 3 && word.length % 2 == 1
      var p = 0
      while (acronym && p < word.length) {
        acronym = if (p % 2 == 0) Character.isLetter(word.charAt(p))
                  else word.charAt(p) == '.'
        p += 1
      }
      acronym || Abbreviations.contains(word.toLowerCase(java.util.Locale.ROOT))
    }
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') {
        emit(start, i); start = i + 1; i += 1
      } else if (c == '.' || c == '!' || c == '?') {
        var j = i + 1
        while (j < n && {
          val d = text.charAt(j); d == '.' || d == '!' || d == '?'
        }) j += 1
        var k = j
        while (k < n && (text.charAt(k) == ' ' || text.charAt(k) == '\t')) k += 1
        if (k == n) {
          emit(start, j); start = k; i = k
        } else if (k > j && isUpperOrDigit(text.charAt(k)) &&
                   !(c == '.' && j == i + 1 && isAbbrev(i))) {
          emit(start, j); start = k; i = k
        } else i = j
      } else i += 1
    }
    emit(start, n)
    out.toArray
  }

  /** Greedy sentence-boundary chunking: pack consecutive sentences into
    * chunks of at most `maxTokens` whitespace-tokens (a single oversized
    * sentence becomes its own chunk — never cut mid-sentence; that is
    * this chunker's whole point vs the token-window [[chunk]]). Chunks
    * rejoin with single spaces. Pure per-string walk.
    */
  def sentenceChunksString(text: String, maxTokens: Int): Array[String] = {
    if (text == null) return null
    def tokenCount(s: String): Int = {
      var cnt = 0; var i = 0; val n = s.length
      while (i < n) {
        while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
        if (i < n) { cnt += 1; while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1 }
      }
      cnt
    }
    val sentences = splitSentencesString(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var curTokens = 0
    sentences.foreach { s =>
      val t = tokenCount(s)
      if (curTokens > 0 && curTokens + t > maxTokens) {
        out += cur.toString; cur.setLength(0); curTokens = 0
      }
      if (cur.length > 0) cur.append(' ')
      cur.append(s)
      curTokens += t
    }
    if (cur.length > 0) out += cur.toString
    out.toArray
  }

  /** One row per chunk: `(idCol, chunk_idx, chunk)` — sentence-boundary
    * chunking over the corpus, map-only codegen scalar + posexplode.
    */
  def chunkBySentences(docs: DataFrame, idCol: String, maxTokens: Int,
                       textCol: String = "text"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be positive, got $maxTokens")
    docs.select(col(idCol),
        posexplode(graft.functions.TextExpressions.sentence_chunks(
          col(textCol), maxTokens)).as(Seq("chunk_idx", "chunk")))
  }

  /** PHRASE blocklist (multi-word, substring-level — the C4 contract
    * [[blocklistFilter]]'s whole-token overlap cannot express: "click
    * here", "lorem ipsum"): every doc is marked with its total phrase
    * occurrence count via the Aho–Corasick automaton — ONE pass over
    * the text regardless of phrase count, map-only codegen
    * ([[graft.functions.TextExpressions.PhraseMatches]]). Exact-case by
    * contract: lowercase both sides to case-fold.
    */
  def markPhraseHits(docs: DataFrame, phrases: Seq[String],
                     textCol: String = "text"): DataFrame =
    docs.withColumn("n_phrase_hits",
      graft.functions.TextExpressions.phrase_matches(col(textCol), phrases))

  /** Keep only docs containing NO blocklisted phrase. */
  def phraseBlocklistFilter(docs: DataFrame, phrases: Seq[String],
                            textCol: String = "text"): DataFrame =
    // null text passes (no phrase present) — see [[blocklistFilter]]
    docs.where(col(textCol).isNull || graft.functions.TextExpressions
      .phrase_matches(col(textCol), phrases) === 0)

  /** Per-doc token-repetition signals — the Gopher-style repetition
    * filters (a doc dominated by one token, or with a collapsed
    * vocabulary, is boilerplate/spam): `top_token_share` = most frequent
    * token's share, `distinct_ratio` = vocabulary size / length. Shaped
    * relationally (explode → two keyed aggregations), so at corpus scale
    * it is two map-side-combined shuffles, not a per-row O(n²) scan;
    * bigram flavors reuse [[Dedup.shingles]](k=2) as the token stream.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(F.tokens(col(textCol))).as("tok"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        (max("cnt").cast(DoubleType) / sum("cnt")).as("top_token_share"),
        (count(lit(1)).cast(DoubleType) / sum("cnt")).as("distinct_ratio"))
  }

  /** Deterministic stratified downsampling — the data-mixture control step
    * (downweight overrepresented languages/sources to a target mix): keep
    * each stratum's docs with probability `fractions(stratum)` where the
    * selection is a pure function of content and `seed` (salted fingerprint
    * mod 10⁴), so the sample is replay/partitioning-stable and
    * engine-recomputable — `sample()`'s RNG order is neither. Strata absent
    * from `fractions` are kept whole. Different `seed`s decorrelate this
    * selection from [[hashSplit]] (which uses the unsalted fingerprint).
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long = 1L,
                       textCol: String = "text"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    // multiplicative (Knuth) mix so different seeds select decorrelated
    // subsets (an additive salt only shifts the selector by a constant —
    // near-identical samples). The seed is reduced mod p FIRST: fp and the
    // reduced seed are each < 10^9, so (fp + seed') × 2654435761 ≈ 5·10^18
    // stays below Long.MaxValue — an unreduced large seed (e.g. a
    // timestamp) would silently wrap in 64-bit and break the documented
    // exact-arithmetic recomputability of the selection.
    val salted = sampleSelector(textCol, seed)
    val frac = coalesce(
      element_at(typedlit(fractions), col(strataCol)), lit(1.0))
    // integer gate: keep iff selector < floor(frac·10⁴). Selector and cut
    // are both longs, so there is no float-threshold comparison to straddle;
    // the only double ops (frac·10⁴, floor) are single correctly-rounded
    // IEEE operations — bit-identical in any engine given the same frac —
    // unlike a raw `sel < frac·10⁴` double compare where a 1-ulp fraction
    // drift flips docs whose selector sits on the cut.
    docs.where(pmod(salted, lit(10000L)) < floor(frac * 10000))
  }

  /** Unicode normalization (NFC by default) — the canonical-equivalence
    * cleaning step hash-based dedup REQUIRES: 'é' as one codepoint and as
    * `e` + combining acute are byte-different but canonically identical
    * text, so every content hash upstream (exact dedup, fingerprints,
    * shingles, URL keys) treats un-normalized variants as different
    * documents. Map-only over the rows (`java.text.Normalizer` per
    * partition) with the quick-check fast path: an already-normalized
    * string (the overwhelming case on real corpora) is detected by a
    * scan and returned as-is, no rebuild. `form` is any
    * `java.text.Normalizer.Form` name — NFC is the web-standard storage
    * form; NFKC additionally folds compatibility characters (fullwidth,
    * ligatures) and belongs in MATCHING keys, not stored text. Null text
    * passes through.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text",
                    form: String = "NFC"): DataFrame = {
    require(docs.columns.contains(textCol), s"no column $textCol")
    // codegen scalar, not a whole-row Dataset.map: the preClean stage runs
    // over every raw document, and a Row-encoder map would break
    // WholeStageCodegen with a Deserialize/Serialize pair per row (judged
    // the one non-codegen map left in the pipeline hot path in round 9)
    docs.withColumn(textCol,
      graft.functions.TextExpressions.normalize_unicode(col(textCol), form))
  }

  /** The 27 Windows-1252 codepoints above U+00FF, inverse-mapped to their
    * CP1252 byte (0x80–0x9F minus the five undefined slots 0x81/8D/8F/90/9D).
    * `-1` = not a CP1252-only char. A `@switch` match compiles to a
    * lookupswitch — no boxing or hashing in the per-char scan.
    */
  @inline private def cp1252Byte(c: Char): Int = (c: @annotation.switch) match {
    case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
    case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
    case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
    case 'Š' => 0x8a; case '‹' => 0x8b; case 'Œ' => 0x8c
    case 'Ž' => 0x8e; case '‘' => 0x91; case '’' => 0x92
    case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
    case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
    case '™' => 0x99; case 'š' => 0x9a; case '›' => 0x9b
    case 'œ' => 0x9c; case 'ž' => 0x9e; case 'Ÿ' => 0x9f
    case _ => -1
  }

  /** Repair one string's mojibake (UTF-8 bytes mis-decoded as Latin-1 OR
    * Windows-1252 — the classic crawl corruptions: 'é' arrives as 'Ã©',
    * ''' (E2 80 99) arrives as 'â€™'). The test is exact, not fuzzy: if
    * every char COULD have come from such a mis-decode — i.e. is ≤ U+00FF
    * (Latin-1 identity range, which CP1252 shares outside 0x80–0x9F) or
    * is one of the 27 CP1252-only codepoints ([[cp1252Byte]]) — and the
    * inverse byte mapping parses as STRICT UTF-8 with at least one
    * multi-byte sequence, the re-decoded string is returned; otherwise
    * the input is returned untouched. Plain ASCII and almost all
    * legitimate Latin-1/CP1252 text never match: 'Ã ' followed by a
    * space is 0xC3 0x20 (invalid UTF-8), a price like "20€" maps to
    * 0x80 with no lead byte (invalid UTF-8). The one inherent false
    * positive: text whose mapped bytes HAPPEN to form valid UTF-8 —
    * e.g. a document literally discussing 'Ã©' — is "repaired"; no
    * byte-level test can distinguish that from real mojibake (it IS the
    * same byte string), which is why this is a curation stage, not a
    * lossless transform. One pass by contract: doubly-mojibake'd text
    * repairs one layer per application (compose with itself if a corpus
    * needs more — each layer is the same exact test).
    */
  def fixMojibakeString(s: String): String = {
    if (s == null || s.isEmpty) return s
    val bytes = new Array[Byte](s.length)
    var i = 0
    var multi = false
    while (i < s.length) {
      val c = s.charAt(i)
      val b = if (c <= 0xff) c.toInt else cp1252Byte(c)
      if (b < 0) return s // cannot be a Latin-1/CP1252 mis-decode
      if (b >= 0x80) multi = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!multi) return s // pure ASCII — nothing to repair
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  /** [[fixMojibakeString]] over the corpus — map-only, other columns ride
    * along untouched (codegen column replacement, same shape as
    * [[normalizeText]]).
    */
  def fixMojibake(docs: DataFrame, textCol: String = "text"): DataFrame = {
    require(docs.columns.contains(textCol), s"no column $textCol")
    docs.withColumn(textCol,
      graft.functions.TextExpressions.fix_mojibake(col(textCol)))
  }

  /** Exact-k-per-group sampling — the "take k docs per source/language"
    * companion to [[stratifiedSample]]'s fractional cut: rank the group's
    * docs by the same salted Knuth-mixed content selector (ties broken by
    * `idCol`) and keep ranks ≤ k. Deterministic and replay-stable like
    * the fractional flavor (a re-run, a repartition or corpus reordering
    * select the same docs; different seeds select decorrelated subsets),
    * and exact-count where fractions can only promise expectation.
    *
    * Shape (the default, [[sampleKPerGroupAgg]]): one map-side-combinable
    * bounded top-k aggregate ([[graft.functions.TopKAggregate]], O(k)
    * buffers) + a broadcast semi-join of the picked (group, id) pairs —
    * no per-group sort, safe on Zipf group keys at any group size.
    */
  /** THE salted content selector — the single definition every
    * fingerprint-keyed sampler shares (stratifiedSample, upsample,
    * sampleKPerGroup, hash splits, corpus shuffle, token budgets): the
    * replay-stability and cross-operator decorrelation contracts all
    * hinge on this one formula staying bit-identical, so no caller may
    * re-derive it inline. Seed reduced mod p FIRST so (fp + seed') ×
    * 2654435761 stays < 2^63 for ANY seed (timestamps included).
    */
  private[operators] def sampleSelector(textCol: String, seed: Long): Column = {
    val seedReduced = ((seed % 1000000007L) + 1000000007L) % 1000000007L
    pmod(
      (portableFingerprint(col(textCol)) + lit(seedReduced)) * 2654435761L,
      lit(1000000007L))
  }

  /** DEFAULT = the bounded top-k aggregate ([[sampleKPerGroupAgg]]):
    * group keys are Zipf in practice (source/language), and the window
    * flavor funnels every row of a hot group through one task's sort.
    * [[sampleKPerGroupWindow]] remains as the documented
    * exact-comparison arm (identical selection, unit-pinned).
    */
  def sampleKPerGroup(docs: DataFrame, groupCol: String, idCol: String, k: Int,
                      seed: Long = 1L, textCol: String = "text"): DataFrame =
    sampleKPerGroupAgg(docs, groupCol, idCol, k, seed, textCol)

  /** The window form — kept ONLY as the exact-comparison control arm for
    * the aggregate default (OperatorsSpec pins their selections equal);
    * not for corpus-scale use: `row_number()` over a Zipf group key sorts
    * each whole group in one task.
    */
  def sampleKPerGroupWindow(docs: DataFrame, groupCol: String, idCol: String, k: Int,
                            seed: Long = 1L, textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(sampleSelector(textCol, seed), col(idCol))
    docs.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** [[sampleKPerGroup]] through the bounded top-k aggregate instead of
    * the window — IDENTICAL selection (same salted selector ascending,
    * ties by id; the aggregate's (score desc, id asc) order receives the
    * NEGATED selector, exact since the selector is < 2^31 ≪ 2^53), but
    * the scale shape the window cannot give: one map-side-combinable
    * aggregate per group (O(k) buffers, no per-group sort of the whole
    * group) plus a semi-join of the picked (group, id) pairs back onto
    * the corpus — the right flavor when groups run to 10⁸+ docs. The
    * picked set is groups × k rows, so the join side broadcasts.
    */
  def sampleKPerGroupAgg(docs: DataFrame, groupCol: String, idCol: String,
                         k: Int, seed: Long = 1L,
                         textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val picked = docs
      .select(col(groupCol), col(idCol),
        sampleSelector(textCol, seed).cast(DoubleType).as("_sel"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate.topk_by(-col("_sel"), col(idCol), k)
        .as("_top"))
      .select(col(groupCol), explode(col("_top.id")).as(idCol))
    docs.join(broadcast(picked), Seq(groupCol, idCol), "left_semi")
  }

  /** CCNet-style corpus-level PARAGRAPH dedup — the stage that removes
    * boilerplate (headers, cookie banners, navigation) from a web crawl:
    * split every document on newlines, keep each distinct non-empty
    * paragraph ONCE across the whole corpus (winner = smallest
    * (doc, position) — deterministic, replay-stable), reassemble each
    * document from its surviving paragraphs in original order. Documents
    * whose paragraphs all lose disappear (CCNet's behavior — they were
    * pure boilerplate). Emits `(idCol, textCol, n_kept, n_total)`.
    *
    * Scale shape: one posexplode (map-only), ONE shuffle on the
    * paragraph text for the winner window (same exchange a groupBy
    * would pay; the window's per-key sort is over occurrence lists,
    * which boilerplate skew caps at corpus-doc count — heavy keys are
    * exactly the paragraphs being deleted), one shuffle back on the doc
    * id to reassemble. No corpus-sized driver state, no all-pairs
    * anything. Exact by construction (full paragraph text is the key, no
    * hash-collision question).
    */
  /** INTRA-document line dedup (the RefinedWeb/Gopher "remove duplicated
    * lines within a document" pass — distinct from [[dedupParagraphs]],
    * which is corpus-level): split on newlines, keep the FIRST
    * occurrence of every non-empty line, preserve order, rejoin. EMPTY
    * lines are exempt — they are paragraph structure, not content, and
    * deduping them would silently merge paragraphs.
    * Pure per-string walk, null passes through — runs as the codegen
    * scalar [[graft.functions.TextExpressions.dedup_lines]]; map-only,
    * no shuffle (the corpus-level flavor needs one; this one doesn't).
    */
  def dedupLinesString(text: String): String = {
    if (text == null) return null
    val seen = new java.util.HashSet[String]()
    val out = new java.lang.StringBuilder(text.length)
    var i = 0
    val n = text.length
    var first = true
    while (i <= n) {
      var j = i
      while (j < n && text.charAt(j) != '\n') j += 1
      val line = text.substring(i, j)
      if (line.isEmpty || seen.add(line)) {
        if (!first) out.append('\n')
        out.append(line)
        first = false
      }
      i = j + 1
    }
    out.toString
  }

  /** Column form of [[dedupLinesString]] (codegen scalar, map-only). */
  def dedupLines(docs: DataFrame, textCol: String = "text",
                 outCol: String = "text"): DataFrame =
    docs.withColumn(outCol,
      graft.functions.TextExpressions.dedup_lines(col(textCol)))

  def dedupParagraphs(docs: DataFrame, idCol: String,
                      textCol: String = "text"): DataFrame = {
    val paras = docs.select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_para")))
      .where(length(trim(col("_para"))) > 0)
    val totals = paras.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_total"))
    // keep-first per distinct paragraph as a partial-aggregated `min_by`
    // keyed by a 128-bit paragraph hash PAIR — NOT a row_number() window
    // over the raw paragraph: the heavy keys are exactly the boilerplate
    // being deleted (a promo banner repeated in 10^7 docs), a window
    // funnels every copy into one task with no map-side reduction, and
    // raw paragraph bytes should never ride a shuffle key (the
    // dropExactDups discipline; two independent xxhash64 = ~1e-19
    // expected collisions at 10^10 paragraphs)
    val reassembled = paras
      .groupBy(xxhash64(col("_para")).as("_ph"),
        xxhash64(lit(1L), col("_para")).as("_ph2"))
      .agg(min_by(struct(col("_id"), col("_pos"), col("_para")),
        struct(col("_id"), col("_pos"))).as("_w"))
      .select(col("_w").getField("_id").as("_id"),
        col("_w").getField("_pos").as("_pos"),
        col("_w").getField("_para").as("_para"))
      .groupBy(col("_id"))
      // sort_array, not array_sort: same natural struct ordering on the
      // non-null (_pos, _para) rows, but WITHOUT the comparator lambda
      // array_sort plants in the plan
      .agg(sort_array(collect_list(struct(col("_pos"), col("_para"))))
        .as("_ordered"),
        count(lit(1)).as("n_kept"))
      // ordered rebuild as ONE codegen scalar in the post-agg Project
      // (field-project + join; the sort already happened above) — the
      // transform() lambda it replaces was an interpreted HOF per
      // surviving doc
      .select(col("_id"),
        graft.functions.TextExpressions.join_ordered_structs(
          col("_ordered"), numFields = 2, fieldIdx = 1, sep = "\n")
          .as(textCol),
        col("n_kept"))
      .join(totals, Seq("_id"))
      .withColumnRenamed("_id", idCol)
    // ride-along columns survive (the pipeline depends on it); the inner
    // join is what drops all-boilerplate docs
    docs.drop(textCol).join(reassembled, Seq(idCol))
  }

  /** Stronger (xxhash64-based) rolling fingerprint — Spark-native flavor,
    * used internally where oracle parity is not required.
    */
  def fingerprintStrong(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fp_strong", F.docFingerprint(col(textCol)))

  /** Temperature-flattened per-stratum keep fractions — the standard
    * multilingual/source mixture control (sampled mass ∝ p^τ): stratum s
    * with corpus share p_s is kept with probability f_s ∝ p_s^(τ−1),
    * normalized so the SMALLEST stratum keeps fraction 1 and every larger
    * stratum is downweighted (downweight-only — a fraction > 1 would mean
    * upsampling, which [[stratifiedSample]] cannot do). τ = 1 keeps
    * everything (no flattening); τ → 0 equalizes strata masses.
    *
    * Driver-side: one tiny groupBy-count collect (#strata rows), pure
    * function of the counts — feed the result to [[stratifiedSample]],
    * which applies it with the replay-stable salted-fingerprint selector.
    */
  def temperatureFractions(docs: DataFrame, strataCol: String,
                           temperature: Double): Map[String, Double] = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0, 1], got $temperature")
    val counts = stratumCounts(docs, strataCol, "temperatureFractions")
    // f_s = (p_s/p_min)^(τ−1) = (n_min/n_s)^(1−τ): anchoring at the
    // smallest stratum directly (corpus total cancels) is one op per
    // stratum, and τ = ½ — the common flattening choice — goes through
    // sqrt, which IEEE 754 guarantees correctly rounded (pow is only
    // ~1-ulp): an engine recomputing n_min/n_s then sqrt reproduces the
    // fraction BIT-EXACTLY, so the floor(frac·10⁴) cut downstream cannot
    // drift across engines.
    val nMin = counts.values.min
    counts.map { case (s, n) =>
      val ratio = nMin.toDouble / n
      s -> (if (temperature == 0.5) math.sqrt(ratio)
            else math.pow(ratio, 1.0 - temperature))
    }
  }

  /** Driver-side per-stratum doc counts (one tiny #strata-row collect),
    * with the contract checks the mixture-control map lookups rely on.
    */
  private def stratumCounts(docs: DataFrame, strataCol: String,
                            caller: String): Map[String, Long] = {
    require(docs.schema(strataCol).dataType == StringType,
      s"$caller: '$strataCol' must be StringType — factors key into a " +
        s"Map[String, Double] consumed by a per-row map lookup; " +
        s"got ${docs.schema(strataCol).dataType.simpleString} (cast it first)")
    val counts = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, s"$caller: empty corpus (no strata)")
    // a null stratum key cannot be looked up by the map lookup — those
    // docs would silently be kept whole while still inflating the totals,
    // skewing every other stratum's factor
    require(!counts.contains(null),
      s"$caller: null values in '$strataCol' — fill or filter them first")
    counts
  }

  /** Temperature-controlled UPSAMPLING factors — the other half of mixture
    * control ([[temperatureFractions]] downweights large strata toward the
    * target mix; this repeats small high-quality strata toward it):
    * stratum s gets factor f_s = (n_max/n_s)^(1−τ) ≥ 1, anchored at the
    * LARGEST stratum (factor exactly 1 — never repeated), capped at
    * `maxFactor` so a tiny stratum cannot explode into thousands of
    * epochs. τ = ½ goes through IEEE-correctly-rounded sqrt and `min`
    * (exact), so an engine recomputing n_max/n_s reproduces every factor
    * bit-exactly — same cross-engine determinism contract as
    * [[temperatureFractions]]. Feed the result to [[upsample]].
    */
  def upsampleFactors(docs: DataFrame, strataCol: String, temperature: Double,
                      maxFactor: Double = 8.0): Map[String, Double] = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0, 1], got $temperature")
    require(maxFactor >= 1.0, s"maxFactor must be >= 1, got $maxFactor")
    val counts = stratumCounts(docs, strataCol, "upsampleFactors")
    val nMax = counts.values.max
    counts.map { case (s, n) =>
      val ratio = nMax.toDouble / n
      val f = if (temperature == 0.5) math.sqrt(ratio)
              else math.pow(ratio, 1.0 - temperature)
      s -> math.min(f, maxFactor)
    }
  }

  /** Deterministic stratified upsampling: a doc in stratum s with factor
    * f emits `floor(f)` guaranteed copies plus one extra copy iff its
    * salted selector < floor(frac(f)·10⁴) — so a stratum's emitted mass
    * converges to f× its input mass, and WHICH docs get the extra epoch
    * is a pure function of content and `seed` (replay/partitioning-stable
    * and engine-recomputable, like [[stratifiedSample]]; `sample()`-style
    * RNG repetition is neither). Copies are tagged with an `epoch` column
    * (0-based) so downstream shuffles/packing can keep replicas apart and
    * training can cap repetition per epoch. Strata absent from `factors`
    * are emitted once. Map-only (explode of a ≤`maxRepeat` sequence): no
    * shuffle, no skew — the 100 TB shape.
    *
    * The fractional gate is the same integer floor(frac·10⁴) cut as
    * [[stratifiedSample]]: both per-stratum constants (`floor(f)` and the
    * cut) are computed ONCE driver-side from IEEE-exact ops (floor, the
    * exact subtraction f − floor(f), one rounding multiply), so any
    * engine replaying the factor chain reproduces the exact copy count of
    * every doc.
    */
  def upsample(docs: DataFrame, strataCol: String, factors: Map[String, Double],
               seed: Long = 3L, maxRepeat: Int = 16,
               textCol: String = "text"): DataFrame = {
    require(factors.values.forall(_ >= 1.0),
      "upsample factors must be >= 1 (downweighting is stratifiedSample's job)")
    require(factors.values.forall(_ <= maxRepeat),
      s"a factor exceeds maxRepeat=$maxRepeat — raise the cap explicitly " +
        "or lower upsampleFactors' maxFactor")
    val whole: Map[String, Int] =
      factors.map { case (s, f) => s -> math.floor(f).toInt }
    val cut: Map[String, Long] =
      factors.map { case (s, f) => s -> math.floor((f - math.floor(f)) * 10000).toLong }
    val sel = pmod(sampleSelector(textCol, seed), lit(10000L))
    val copies = coalesce(element_at(typedlit(whole), col(strataCol)), lit(1)) +
      when(sel < coalesce(element_at(typedlit(cut), col(strataCol)), lit(0L)), 1)
        .otherwise(0)
    docs.withColumn("epoch", explode(sequence(lit(0), copies - 1)))
  }

  // ------------------------------------------------- corpus-LM scoring

  /** Adjacent-token bigram strings ("w1 w2") of a document, in order —
    * the codegen [[graft.functions.TextExpressions.WordShingles]] kernel
    * at k = 2 (one byte walk; same single-space tokenization as
    * [[F.tokens]], and a k-shingle over tokens (i, i+1) is byte-for-byte
    * the `concat(a, " ", b)` pair, empties included). Replaces a
    * `zip_with(slice, slice, concat)` lambda — interpreted HOF, and this
    * feeds the corpus-sized LM-familiarity scoring pass. Empty/one-token
    * docs yield an empty array (the shingle kernel returns the whole
    * string when n < k, so the `size >= 2` guard is load-bearing).
    */
  def bigramStream(text: Column): Column = {
    val toks = F.tokens(text)
    when(size(toks) >= 2,
      graft.functions.TextExpressions.word_shingles(text, 2))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Reference bigram count table — the "language model" of the CCNet-style
    * LM filter, with corpus counts standing in for a trained KenLM/neural
    * model (no model artifacts exist in this environment; the relational
    * shape — build the model table once from a reference slice, score the
    * whole corpus against it — is exactly the production one). One row per
    * distinct adjacent token pair: (bigram, c).
    *
    * At 100 TB the reference slice is small by construction (a curated
    * wiki-like subset), so this table broadcasts; a full-corpus reference
    * degrades gracefully to a shuffle join on `bigram` with map-side
    * combine on both derivations.
    */
  def bigramCounts(refDocs: DataFrame, textCol: String = "text"): DataFrame =
    refDocs
      .select(explode(bigramStream(col(textCol))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).cast(LongType).as("c"))

  /** Per-doc familiarity against a [[bigramCounts]] reference table — the
    * LM-filter decision signals: how much of the document's bigram stream
    * the reference model has seen. `familiarity` = hit_bigrams/n_bigrams
    * (a single IEEE division of exact integers — engine-bit-identical);
    * `hit_mass` = total reference count over the doc's hit bigrams (an
    * exact integer weight favoring common constructions). A true mean
    * log-probability would sum doubles in engine-specific order and is
    * deliberately NOT the gated column; consumers wanting it can derive
    * ln-space scores from (hit_mass, n_bigrams) downstream.
    *
    * Plan shape: explode → left join on bigram (broadcast when the model
    * is a curated slice) → one keyed aggregation per doc; docs with no
    * bigrams re-enter via the final left join with zeroed signals.
    */
  def lmFamiliarity(docs: DataFrame, lm: DataFrame, idCol: String,
                    textCol: String = "text"): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(bigramStream(col(textCol))).as("bigram"))
    val stats = exploded
      .join(lm, Seq("bigram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("c")).as("hit_bigrams"),
        coalesce(sum(col("c")), lit(0L)).as("hit_mass"))
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("hit_bigrams"), lit(0L)).as("hit_bigrams"),
        coalesce(col("hit_mass"), lit(0L)).as("hit_mass"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("hit_bigrams").cast(DoubleType) / col("n_bigrams"))
          .as("familiarity"))
  }

  /** CCNet-style familiarity BUCKETS — the published pipeline's
    * head/middle/tail split: within each `groupCol` (CCNet buckets per
    * language), rank docs by [[lmFamiliarity]] against the reference
    * model and `ntile` them into `nBuckets` equal-count bands (bucket 1 =
    * most familiar = "head"). Downstream curation keeps/mixes bands
    * rather than hard-thresholding. Ordering is (familiarity DESC, id) —
    * the familiarity column is one IEEE division over integer counts, so
    * the banding is engine-recomputable like the rest of the LM chain.
    *
    * Scale: the exact ntile is one shuffle + per-group sort — the
    * oracle-parity flavor, fine at source/language-shard group sizes. At
    * full corpus scale compute per-group `percentile_approx` thresholds
    * over `familiarity` and band with a map-only CASE (the
    * [[qualityGateApprox]] pattern); this exact flavor is that
    * approximation's correctness reference.
    */
  def familiarityBuckets(docs: DataFrame, lm: DataFrame, idCol: String,
                         groupCol: String, nBuckets: Int = 3,
                         textCol: String = "text"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    val scored = lmFamiliarity(docs.select(col(idCol), col(textCol)), lm, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(desc("familiarity"), col(idCol))
    docs.select(col(idCol), col(groupCol))
      .join(scored, Seq(idCol))
      .withColumn("bucket", ntile(nBuckets).over(w))
  }

  // ------------------------------------------------- quality gating

  /** Per-group quality gate (the Gopher-style per-source filter): keep the
    * top `keepNum/keepDen` fraction of each group's documents by composite
    * quality score. RANK-based, not threshold-based — a float quality
    * threshold makes boundary membership hinge on double comparisons near
    * the cut, while `row_number × keepDen ≤ n_group × keepNum` is exact
    * integer arithmetic (ties broken by `idCol`, so the kept set is fully
    * deterministic and engine-recomputable). Keeps ⌊n·num/den⌋ per group.
    *
    * Scale: the exact gate is one shuffle + sort per group (row_number
    * window) — fine when groups are source-sized shards. At full 100 TB
    * prefer the two-pass flavor: `percentile_approx` per group (tiny
    * driver-side threshold map, like [[temperatureFractions]]) then a
    * map-only filter; the exact rank gate is the oracle-parity flavor and
    * the correctness reference for that approximation.
    */
  def qualityGate(docs: DataFrame, groupCol: String, idCol: String,
                  keepNum: Int, keepDen: Int,
                  stopwords: Seq[String] = defaultStopwords,
                  textCol: String = "text"): DataFrame = {
    require(keepDen > 0 && keepNum >= 0 && keepNum <= keepDen,
      s"keep fraction must be 0..1, got $keepNum/$keepDen")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("quality").desc, col(idCol).asc)
    qualitySignals(docs, stopwords, textCol)
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .withColumn("_n_grp", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .where(col("rnk") * keepDen <= col("_n_grp") * keepNum)
      .drop("_n_grp")
  }

  /** The 100 TB flavor of [[qualityGate]]: per-group `percentile_approx`
    * quality threshold (one tiny aggregate, #groups rows) broadcast back,
    * then a MAP-ONLY filter — no per-group total sort, so the corpus is
    * never globally ordered. The cut is approximate at the boundary
    * (within `percentile_approx`'s rank error, ±1/accuracy of the group)
    * and threshold-based (ties at the threshold all survive), which is why
    * the exact rank gate above stays the oracle/correctness reference.
    */
  def qualityGateApprox(docs: DataFrame, groupCol: String, keepFrac: Double,
                        accuracy: Int = 10000,
                        stopwords: Seq[String] = defaultStopwords,
                        textCol: String = "text"): DataFrame =
    gateScoredByGroup(qualitySignals(docs, stopwords, textCol),
      groupCol, keepFrac, accuracy)

  /** The threshold-gate core over a PRE-SCORED DataFrame — shared by
    * [[qualityGateApprox]] and `TrainingPipeline.prepare`'s gate stage (one
    * implementation, one boundary semantics). The group match is NULL-SAFE
    * (`<=>`): a null group is a real stratum (scraped-corpus metadata is
    * full of them) and gates like any other — a plain equi-join would
    * silently drop every null-group row, diverging from the exact
    * [[qualityGate]] whose window partition keeps them.
    */
  private[graft] def gateScoredByGroup(scored: DataFrame, groupCol: String,
                                       keepFrac: Double, accuracy: Int,
                                       scoreCol: String = "quality"): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"keepFrac must be in (0, 1], got $keepFrac")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    val thresholds = scored
      .groupBy(col(groupCol))
      .agg(percentile_approx(col(scoreCol), lit(1.0 - keepFrac), lit(accuracy))
        .as("_thr"))
      .withColumnRenamed(groupCol, "_gate_grp")
    scored
      .join(broadcast(thresholds), col(groupCol) <=> col("_gate_grp"))
      .where(col(scoreCol) >= col("_thr"))
      .drop("_gate_grp", "_thr")
  }

  // ------------------------------------------------- decontamination

  /** Distinct k-token shingles of an eval/benchmark set — the
    * contamination reference. Eval sets are small by nature (10³–10⁵
    * docs), so the result is broadcastable; [[contaminatedIds]] relies on
    * that.
    */
  def evalGrams(evalDocs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    evalDocs.select(explode(Dedup.shingles(col(textCol), k)).as("gram")).distinct()

  /** Ids of corpus docs sharing ≥ 1 k-token shingle with the eval set —
    * test-set contamination detection (the n-gram-overlap decontamination
    * step every pretraining pipeline runs before training). Shape:
    * explode corpus shingles → broadcast LEFT SEMI against the eval gram
    * set → distinct ids. The corpus stream is never shuffled (the semi
    * join is map-side against the broadcast hash set); the only shuffle is
    * the distinct over the contaminated-id set, which is bounded by the
    * corpus rows that actually overlap the eval set.
    */
  def contaminatedIds(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                      k: Int = 8, textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .join(broadcast(evalGrams(evalDocs, k, textCol)), Seq("gram"), "left_semi")
      .select(idCol).distinct()

  /** Drop contaminated docs. The contaminated-id set is broadcast on the
    * anti-join: it is at most the overlap support, normally orders of
    * magnitude below the corpus (a corpus where most docs overlap the eval
    * set has a bigger problem than a shuffle).
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    k: Int = 8, textCol: String = "text"): DataFrame =
    docs.join(broadcast(contaminatedIds(docs, evalDocs, idCol, k, textCol)),
      Seq(idCol), "left_anti")

  // ------------------------------------------- duplicated-span statistics

  /** Per-doc duplicated n-gram statistics — the relational approximation
    * of exact substring dedup (the "dup-fraction" signal: how much of a
    * doc's content also appears elsewhere in the corpus): for each doc,
    * the fraction of its DISTINCT k-grams occurring in ≥ 2 distinct
    * documents. Shape: explode per-doc-distinct shingles → ONE pinned
    * gram-keyed exchange feeding both the doc-count aggregate and the
    * join back → id-keyed aggregate. Both consumers read the same shuffle
    * output (see [[pinForReuse]]), so the corpus is tokenized/shingled
    * ONCE per invocation; gram keys stay as strings for engine-neutral
    * exactness (an xxhash64 pre-hash would shrink the shuffle ~2× at the
    * cost of collision-corrupted counts and oracle replayability).
    *
    * `grams`, when given, must be a pre-materialized positioned gram
    * table ([[positionedGrams]] at the same k, written or persisted by
    * the caller) — the occurrence stream is then read from it instead of
    * being derived from `docs` at all.
    */
  def dupNgramStats(docs: DataFrame, idCol: String, k: Int = 3,
                    textCol: String = "text",
                    grams: Option[DataFrame] = None): DataFrame = {
    val gramStream = grams
      .map(_.select(col(idCol), col("gram")).distinct())
      .getOrElse(docs.select(col(idCol),
        explode(Dedup.shingles(col(textCol), k)).as("gram")))
    val byGram = pinForReuse(gramStream.select(col(idCol), col("gram")))
    // count(id) = #docs containing the gram, since the stream is per-doc
    // distinct AND null-free (pinForReuse filters); counting the id —
    // not lit(1) — makes this arm consume the same (id, gram) column set
    // as the join arm, so column pruning cannot specialize (and un-share)
    // the pinned exchange with a narrower Project
    val gramDocs = byGram.groupBy(col("gram"))
      .agg(count(col(idCol)).as("n_docs_with"))
    val shared = sum(when(col("n_docs_with") >= 2, 1L).otherwise(0L))
    byGram.join(gramDocs, Seq("gram"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        shared.as("n_shared"),
        (shared.cast(DoubleType) / count(lit(1))).as("dup_fraction"))
  }

  /** The positioned k-gram occurrence stream (idCol, gpos, gram) both
    * span operators consume — expose it so a pipeline running
    * [[dupNgramStats]] AND [[dropSharedSpans]] over the same corpus can
    * write/persist it once and pass it to both.
    */
  def positionedGrams(docs: DataFrame, idCol: String, k: Int,
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      posexplode(graft.functions.TextExpressions.word_shingles(col(textCol), k))
        .as(Seq("gpos", "gram")))

  /** Pin a gram-keyed exchange so MULTIPLE consumers of the stream map to
    * ONE shuffle of one derivation: Catalyst's ReuseExchange (and AQE's
    * stage reuse) dedups identical exchange subtrees, so two plan arms
    * that each need gram-keyed clustering read the same shuffle files
    * instead of re-scanning + re-shingling the corpus per arm. Aggregates
    * downstream lose their map-side partial step (the shuffle now carries
    * raw occurrences), but the join arm always shipped the full stream
    * anyway — the same bytes now move once, and the corpus scan count
    * halves.
    *
    * The explicit not-null filter (semantics-neutral: a null id or gram
    * neither joins nor counts downstream) pre-empts the per-arm inferred
    * constraints (`isnotnull` from the join key on one arm, from the
    * distinct aggregate on the other) that would otherwise specialize
    * each arm's subtree below the exchange and break their identity —
    * ReuseExchange only fires on IDENTICAL canonical subtrees.
    */
  private def pinForReuse(gramStream: DataFrame): DataFrame =
    gramStream
      .where(gramStream.columns.map(col(_).isNotNull).reduce(_ && _))
      .repartition(col("gram"))

  /** Remove corpus-duplicated spans from each document — the transform
    * behind the dup-fraction signal ([[dupNgramStats]]): every token
    * covered by a k-gram occurring in ≥ 2 distinct documents is dropped,
    * and the survivors are rejoined in order. This is the span-level
    * complement of document-level dedup: boilerplate shared across
    * otherwise-distinct docs (headers, license blocks, navigation) is cut
    * without discarding the documents.
    *
    * Shape: positioned token/gram streams (posexplode — NON-distinct
    * shingles, every occurrence covers its span) → ONE pinned gram-keyed
    * exchange ([[pinForReuse]]) feeding both the distinct-doc count and
    * the shared-gram join that marks covered positions → anti-join
    * against the token stream → per-doc ordered rebuild
    * (sort_array(collect_list(struct(pos, tok))) + the codegen
    * join-structs kernel). The corpus is
    * tokenized once and shingled ONCE (both gram consumers read the same
    * shuffle output — plan-witnessed in OperatorsSpec); per-doc state in
    * the rebuild is bounded by document length. Emits (idCol, kept_text,
    * n_tokens_kept); docs whose every token is covered keep an empty
    * string.
    *
    * `grams`, when given, must be a pre-materialized [[positionedGrams]]
    * table at the same k — a pipeline also running [[dupNgramStats]]
    * writes the stream once and passes it to both.
    */
  def dropSharedSpans(docs: DataFrame, idCol: String, k: Int = 8,
                      textCol: String = "text",
                      grams: Option[DataFrame] = None): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(F.tokens(col(textCol))).as(Seq("pos", "tok")))
    val byGram = pinForReuse(
      grams.map(_.select(col(idCol), col("gpos"), col("gram")))
        .getOrElse(positionedGrams(docs, idCol, k, textCol)))
    // countDistinct needs no extra exchange (gram-partitioning satisfies
    // the (gram, id) clustering of its first phase). The min(gpos) rider
    // keeps this arm consuming the same (id, gpos, gram) column set as
    // the join arm — pruning would otherwise specialize (and un-share)
    // the pinned exchange with a narrower Project — and must stay LIVE:
    // it is referenced in the filter (trivially true: positions are
    // non-negative, but not provably so to the optimizer, which would
    // prune an unreferenced aggregate away again)
    val shared = byGram
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("n_docs_with"),
        min(col("gpos")).as("_prune_pin"))
      .where(col("n_docs_with") >= 2 && col("_prune_pin") >= 0)
      .select(col("gram"))
    val covered = byGram.join(shared, Seq("gram"))
      .select(col(idCol),
        explode(sequence(col("gpos"), col("gpos") + (k - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
    docs.select(col(idCol))
      .join(
        kept.groupBy(col(idCol))
          // sort_array: natural ordering, no comparator lambda (see
          // dedupParagraphs)
          .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("_ordered"))
          .select(col(idCol),
            // codegen rebuild — see dedupParagraphs' reassembly note
            graft.functions.TextExpressions.join_ordered_structs(
              col("_ordered"), numFields = 2, fieldIdx = 1, sep = " ")
              .as("kept_text"),
            size(col("_ordered")).cast(LongType).as("n_tokens_kept")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
  }

  // ------------------------------------------------------------ chunking

  /** Fixed-size token windows with stride — the embedding/retrieval
    * preprocessing shape (stride < chunkTokens gives overlapping chunks).
    * Map-only: posexplode over a stride sequence + array slice, no
    * shuffle, stays in whole-stage codegen; at corpus scale this is a pure
    * scan → scan stage. Emits (idCol, chunk_idx, chunk_tokens,
    * chunk_text); the final chunk may be shorter than `chunkTokens`, and a
    * window whose content the PREVIOUS window already fully covered is not
    * emitted (it would add zero new tokens — duplicate chunks inflate a
    * retrieval index and return duplicate hits). Kept starts are a prefix
    * of the stride grid, so `chunk_idx` stays contiguous from 0.
    */
  def chunk(docs: DataFrame, idCol: String, chunkTokens: Int, stride: Int,
            textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0, s"stride must be positive, got $stride")
    require(stride <= chunkTokens,
      s"stride ($stride) > chunkTokens ($chunkTokens) would skip tokens")
    docs
      .select(col(idCol), F.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "_start")))
      // keep a window iff the previous one did not already reach the end:
      // prev end = start − stride + chunkTokens < n  ⇔  start + (c−s) < n
      .where(col("_start") === 0 ||
        col("_start") + (chunkTokens - stride) < size(col("_toks")))
      .select(col(idCol), col("chunk_idx"),
        least(size(col("_toks")) - col("_start"), lit(chunkTokens))
          .cast(LongType).as("chunk_tokens"),
        concat_ws(" ", slice(col("_toks"), col("_start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  // ----------------------------------------------------- sequence packing

  /** Deterministic concatenate-and-cut sequence packing — the standard
    * pretraining batching step (docs are concatenated in a fixed order and
    * cut every `budgetTokens` tokens; a doc belongs to the pack where it
    * STARTS, and may span the cut into the next pack). Layout: each doc
    * goes to a content-hash bin (`fp mod numBins`); within a bin the order
    * is (fingerprint, id) — fully content-determined, so the packing is
    * replay/partitioning-stable and engine-recomputable.
    *
    * Scale: the window is partitioned by bin, so the sort is per-bin after
    * a hash shuffle — size `numBins` so a bin holds ~10⁴–10⁶ docs
    * (numBins ≈ corpusTokens / (budgetTokens × targetPacksPerBin)) and no
    * single-partition WindowExec appears. Emits (idCol, n_tokens, bin,
    * pack_id) where pack_id is the cut index within the bin.
    */
  def packSequences(docs: DataFrame, idCol: String, budgetTokens: Int,
                    numBins: Int, textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(numBins > 0, s"numBins must be positive, got $numBins")
    val w = Window.partitionBy(col("bin")).orderBy(col("fp"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), portableFingerprint(col(textCol)).as("fp"),
        F.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("bin", pmod(col("fp"), lit(numBins.toLong)))
      .withColumn("_cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"_cum_before DIV $budgetTokens"))
      .drop("_cum_before", "fp")
  }

  // ------------------------------------------------ deterministic shuffle

  /** Deterministic global shuffle position for every document — the
    * reproducible corpus ordering a training run needs (epoch order must
    * be replayable for debugging/ablation, and `orderBy(rand())` is
    * neither replayable across engines nor stable across partitionings).
    * The order key is the salted Knuth-mixed selector of
    * [[stratifiedSample]] — a pure function of (content, seed), so the
    * permutation is engine-recomputable and different seeds give
    * decorrelated orders — with ties (identical text) broken by `idCol`.
    *
    * Emits the input columns plus `shuffle_pos` (0-based, dense, one per
    * row). A sharded-output writer follows with
    * `repartitionByRange(shards, col("shuffle_pos")).sortWithinPartitions("shuffle_pos")`
    * — contiguous position ranges per shard, no further shuffle.
    *
    * Scale shape: NO global sort and no single-partition window. The key
    * space [0, p) is cut into `numBuckets` contiguous RANGES (bucket =
    * key / ceil(p/B), so bucket order IS key order); per-bucket counts
    * (≤ B rows, metadata-sized — the one bounded collect, B ≤ 2^20) give
    * each bucket its starting offset, and a per-bucket `row_number`
    * window (one hash exchange on the bucket id; the Knuth mix keeps
    * buckets balanced for any content skew — identical docs tie on the
    * key but still spread by id within one bucket's sort) yields
    * `shuffle_pos = offset(bucket) + rank − 1`.
    */
  def corpusShuffle(docs: DataFrame, idCol: String, seed: Long = 1L,
                    numBuckets: Int = 1024,
                    textCol: String = "text"): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets must be in [1, 2^20] (driver holds one count per bucket), got $numBuckets")
    val p = 1000000007L
    val bucketWidth = (p + numBuckets - 1) / numBuckets // ceil(p/B)
    val keyed = docs.withColumn("_key", sampleSelector(textCol, seed))
      .withColumn("_bucket", (col("_key") / bucketWidth).cast(LongType))
    // bounded collect: ≤ numBuckets rows of (bucket, count) — metadata,
    // not data (same contract as the stratum-count collects above)
    val counts = keyed.groupBy("_bucket").count()
      .collect().map { r =>
        // null text -> null fingerprint -> null bucket: name the fix
        // instead of NPE-ing on getLong (null text is in-contract
        // upstream: normalizeText/fixMojibake pass it through)
        require(!r.isNullAt(0), s"corpusShuffle: null $textCol rows have " +
          "no shuffle key - drop or repair null-text documents first")
        r.getLong(0) -> r.getLong(1)
      }.sortBy(_._1)
    // dense cumulative offsets (empty buckets inherit the running sum);
    // shipped via addReferenceObj, not a typedlit map — at the 2^20
    // bucket cap a literal map is megabytes of plan tree per task
    val offsets = new Array[Long](numBuckets)
    var acc = 0L
    var next = 0
    counts.foreach { case (b, n) =>
      while (next <= b.toInt) { offsets(next) = acc; next += 1 }
      acc += n
    }
    while (next < numBuckets) { offsets(next) = acc; next += 1 }
    val w = Window.partitionBy(col("_bucket")).orderBy(col("_key"), col(idCol))
    keyed
      .withColumn("shuffle_pos",
        graft.functions.TextExpressions.long_array_get(col("_bucket"), offsets) +
          row_number().over(w).cast(LongType) - 1L)
      .drop("_key", "_bucket")
  }

  /** Deterministic TOKEN-budget sampling: keep the corpus prefix — in
    * salted content-shuffle order, the same order [[corpusShuffle]]
    * serves — whose cumulative whitespace-token count stays under
    * `budgetTokens` (the doc that CROSSES the budget is kept, so the
    * budget is met, then the cut is hard). Pretraining mixtures are
    * specified in TOKENS, not documents; a doc-count sample under- or
    * over-shoots by the doc-length mix, this cut does not.
    *
    * Scale shape — a global running sum WITHOUT a global sort, the
    * [[corpusShuffle]] trick: the selector space splits into `numBuckets`
    * contiguous key ranges, per-bucket token totals come back to the
    * driver (≤ numBuckets rows of metadata), the cumulative offset of
    * each bucket ships back via one plan reference object, and the
    * in-bucket window adds the local running sum — every doc's GLOBAL
    * cumulative token count, one bucket exchange, per-task sort bounded
    * by the bucket. Output adds `cum_tokens` (inclusive of the row), so
    * any reader re-verifies the cut.
    */
  def tokenBudgetSample(docs: DataFrame, idCol: String, budgetTokens: Long,
                        seed: Long = 1L, numBuckets: Int = 1024,
                        textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets must be in [1, 2^20] (driver holds one sum per bucket), got $numBuckets")
    val p = 1000000007L
    val bucketWidth = (p + numBuckets - 1) / numBuckets
    val keyed = docs
      .withColumn("_key", sampleSelector(textCol, seed))
      .withColumn("_bucket", (col("_key") / bucketWidth).cast(LongType))
      .withColumn("_toks", F.tokenCount(col(textCol)).cast(LongType))
    // bounded collect: ≤ numBuckets rows of (bucket, token sum) — metadata
    val sums = keyed.groupBy("_bucket").agg(sum(col("_toks")).as("_s"))
      .collect().map { r =>
        require(!r.isNullAt(0), s"tokenBudgetSample: null $textCol rows " +
          "have no budget key - drop or repair null-text documents first")
        r.getLong(0) -> r.getLong(1)
      }.sortBy(_._1)
    val offsets = new Array[Long](numBuckets)
    var acc = 0L
    var next = 0
    sums.foreach { case (b, s) =>
      while (next <= b.toInt) { offsets(next) = acc; next += 1 }
      acc += s
    }
    while (next < numBuckets) { offsets(next) = acc; next += 1 }
    val w = Window.partitionBy(col("_bucket")).orderBy(col("_key"), col(idCol))
    keyed
      .withColumn("cum_tokens",
        graft.functions.TextExpressions.long_array_get(col("_bucket"), offsets) +
          sum(col("_toks")).over(w))
      // keep iff the doc STARTS before the budget line — the crossing
      // doc is the last survivor
      .where(col("cum_tokens") - col("_toks") < budgetTokens)
      .drop("_key", "_bucket", "_toks")
  }

  /** Per-stratum token budgets — the mixture-in-TOKENS cut ("2 B tokens
    * of code, 500 M of forums"): each stratum keeps its own
    * [[tokenBudgetSample]] prefix under `budgets(stratum)`; strata
    * absent from the map pass through whole. Same no-global-sort shape,
    * one (stratum, bucket) exchange; the driver holds ≤ strata×buckets
    * metadata rows. Output adds `cum_tokens` (within-stratum,
    * row-inclusive).
    */
  def tokenBudgetMix(docs: DataFrame, idCol: String, strataCol: String,
                     budgets: Map[String, Long], seed: Long = 1L,
                     numBuckets: Int = 1024,
                     textCol: String = "text"): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMix needs at least one budget")
    require(budgets.values.forall(_ > 0),
      s"budgets must be positive, got $budgets")
    require(numBuckets > 0 && numBuckets <= (1 << 16),
      s"numBuckets must be in [1, 2^16] (driver holds strata x buckets sums), got $numBuckets")
    val p = 1000000007L
    val bucketWidth = (p + numBuckets - 1) / numBuckets
    val keyed = docs
      .withColumn("_key", sampleSelector(textCol, seed))
      .withColumn("_bucket", (col("_key") / bucketWidth).cast(LongType))
      .withColumn("_toks", F.tokenCount(col(textCol)).cast(LongType))
    // bounded collect: ≤ |strata| × numBuckets metadata rows
    val sums = keyed.groupBy(col(strataCol).as("_g"), col("_bucket"))
      .agg(sum(col("_toks")).as("_s"))
      .collect()
      .map { r =>
        require(!r.isNullAt(1), s"tokenBudgetMix: null $textCol rows " +
          "have no budget key - drop or repair null-text documents first")
        (Option(r.get(0)).map(_.toString).orNull, r.getLong(1), r.getLong(2))
      }
      .groupBy(_._1)
    // dense per-stratum offsets, concatenated into ONE array: stratum g's
    // bucket b sits at stratumBase(g) + b. A NULL stratum has no base
    // row (a map literal cannot key on null): its cum_tokens is null
    // and, with no budget addressable either, it passes through whole.
    val strata = sums.keys.toSeq.filter(_ != null).sorted
    val base = strata.zipWithIndex.map { case (g, i) => g -> i * numBuckets }.toMap
    val offsets = new Array[Long](strata.length * numBuckets)
    strata.foreach { g =>
      var acc = 0L
      var next = 0
      sums(g).sortBy(_._2).foreach { case (_, b, s) =>
        while (next <= b.toInt) { offsets(base(g) + next) = acc; next += 1 }
        acc += s
      }
      while (next < numBuckets) { offsets(base(g) + next) = acc; next += 1 }
    }
    val baseCol = element_at(typedlit(base), col(strataCol)) // |strata| entries: tiny
    val w = Window.partitionBy(col(strataCol), col("_bucket"))
      .orderBy(col("_key"), col(idCol))
    val budgetCol = element_at(typedlit(budgets), col(strataCol))
    keyed
      .withColumn("cum_tokens",
        graft.functions.TextExpressions.long_array_get(
          baseCol + col("_bucket"), offsets) + sum(col("_toks")).over(w))
      .where(budgetCol.isNull ||
        col("cum_tokens") - col("_toks") < budgetCol)
      .drop("_key", "_bucket", "_toks")
  }

  /** Write the corpus as `numShards` training shards in shuffled order:
    * shard files hold CONTIGUOUS `shuffle_pos` ranges (repartitionByRange
    * + in-partition sort — one range exchange on top of
    * [[corpusShuffle]]'s bucket exchange), so a trainer streams shard 0,
    * 1, 2… and sees exactly the seeded global permutation. Rows keep
    * `shuffle_pos` so any reader can re-verify the order.
    */
  def writeShuffled(docs: DataFrame, idCol: String, path: String,
                    numShards: Int, seed: Long = 1L,
                    numBuckets: Int = 1024,
                    textCol: String = "text"): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    corpusShuffle(docs, idCol, seed, numBuckets, textCol)
      .repartitionByRange(numShards, col("shuffle_pos"))
      .sortWithinPartitions("shuffle_pos")
      .write.mode("overwrite").parquet(path)
    // the permutation is a pure function of (content fingerprint, seed):
    // stamp the arithmetic version so an append/extend under a bumped
    // fingerprint — which would interleave two DIFFERENT permutations in
    // one shard set — fails loudly at open instead (manifest LAST, after
    // the data landed)
    Manifests.writeAtomic(docs.sparkSession, s"$path/_SHUFFLE.json",
      s"""{"seed":$seed,"num_shards":$numShards,"num_buckets":$numBuckets,""" +
        s""""fp_version":${graft.functions.Functions.FingerprintVersion}}""")
  }

  /** Open a [[writeShuffled]] shard set, verifying its `_SHUFFLE.json`
    * stamp: a shard set permuted under a different fingerprint version
    * (or missing the manifest entirely — pre-versioning, or a torn
    * write) fails loudly. Returns rows with their `shuffle_pos`.
    */
  def readShuffled(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val m = Manifests.read(spark, s"$path/_SHUFFLE.json").getOrElse(
      throw new IllegalStateException(
        s"no _SHUFFLE.json under $path — the shard set predates shuffle " +
          s"versioning or its publish was torn; rebuild with writeShuffled"))
    val fpv = Manifests.numField(m, "fp_version").toInt
    require(fpv == graft.functions.Functions.FingerprintVersion,
      s"shard set $path was permuted under fingerprint v$fpv but this " +
        s"build runs v${graft.functions.Functions.FingerprintVersion} — " +
        "extending it would interleave two different permutations; " +
        "rebuild the shards")
    spark.read.parquet(path)
  }
}
