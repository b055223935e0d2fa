package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function library — all pure `Column` expressions (whole-stage
  * codegen friendly; no Scala UDFs on the hot path).
  *
  * Covers the reference's per-record transforms
  * (reference: readers/common/src/main/java/.../reader/GarmadonMessage.java:70-120,
  * UriHelper.java:30-40, protobuf/ProtoConcatenator.java:81-106) plus the
  * text-analysis scalar layer a large-scale training-data pipeline needs.
  */
object Functions {

  // ---------------------------------------------------------------- P3: URIs

  /** Canonicalize a cluster URI: drop the port, then apply an alias map
    * (reference: readers/common/src/main/java/.../reader/UriHelper.java:30-40 and
    * hdfs-mapping.properties semantics). The alias map is tiny → a `when`
    * chain, fully codegen'd; no lookup UDF, no broadcast needed.
    */
  def normalizeUri(uri: Column, aliases: Map[String, String] = Map.empty): Column = {
    val noPort = regexp_replace(uri, ":[0-9]+$", "")
    aliases.foldLeft(noPort) { case (acc, (from, to)) =>
      when(acc === from, lit(to)).otherwise(acc)
    }
  }

  /** Strip a URI prefix from a path column (reference: GarmadonMessage.java:77-86). */
  def stripUriPrefix(path: Column, uri: Column): Column =
    when(path.startsWith(uri), path.substr(length(uri) + 1, length(path)))
      .otherwise(path)

  // ------------------------------------------------------- P1: scalar clamps

  /** The reference clamps -Inf doubles to -MaxDouble before indexing
    * (reference: ProtoConcatenator.java:209-215).
    */
  def clampNegInf(c: Column): Column =
    when(c === lit(Double.NegativeInfinity), lit(-Double.MaxValue)).otherwise(c)

  // ------------------------------------------------------ P8: time bucketing

  /** Event-time day bucket in UTC (reference: writer/PartitionedWriter.java:102-106). */
  def dayBucket(ts: Column): Column = to_date(date_trunc("day", ts))

  /** Fixed-interval time bucket (the dashboards' date_histogram). */
  def timeBucket(ts: Column, interval: String): Column = date_trunc(interval, ts)

  /** S6: hourly index routing — the serving-index name an event routes to,
    * `prefix-yyyy-MM-dd-HH` in UTC event time
    * (reference: readers/elasticsearch/.../ElasticSearchReader.java:62,141-144).
    * Pure codegen'd Column so the router never leaves the scan stage; the
    * same expression doubles as a generated partition column for a
    * partitioned sink.
    */
  def hourlyIndexName(prefix: Column, ts: Column): Column =
    concat(prefix, lit("-"), date_format(ts, "yyyy-MM-dd-HH"))

  // ------------------------------------------------- P4 analog: JSON pivots

  /** Extract an int property from a JSON props column (the analog of the
    * reference's dynamic section/property pivot,
    * reference: readers/elasticsearch/src/main/java/.../EventHelper.java:20-44).
    */
  def jsonInt(props: Column, key: String): Column =
    get_json_object(props, s"$$.$key").cast(LongType)

  def jsonDouble(props: Column, key: String): Column =
    get_json_object(props, s"$$.$key").cast(DoubleType)

  // --------------------------------------------------------- money / decimal

  /** Exact-decimal cast used before SUM so aggregates are order-independent
    * (double summation is not associative; decimal is exact). Cast back to
    * double at the end of the aggregation for a stable, engine-neutral type.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact revenue term: extendedprice * (1 - discount), in decimal. */
  def revenueTerm(extendedprice: Column, discount: Column): Column =
    dec(extendedprice) * (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec(discount))

  // ------------------------------------------------------------ text analysis

  /** Whitespace tokenization on single spaces (oracle-parity flavor). */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenization: word-ish chunks, a BPE-ish approximation that keeps
    * punctuation as its own tokens. `array_remove` (codegen), not a
    * `filter` lambda — a `+`-quantified separator can only yield EMPTY
    * segments (at the edges), so removing `""` is the non-empty filter.
    */
  def tokensRegex(text: Column): Column =
    array_remove(split(text, "[^\\p{L}\\p{N}']+"), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Portable per-TOKEN hash in [0, 1e9+7): a polynomial hash over ALL
    * codepoints (mult 131, mod 1e9+7) — the key for hashed features
    * ([[graft.operators.LinearClassifier]]) and frequency sketches
    * ([[graft.operators.FrequencySketch]]), recomputable by any engine
    * as a `list_reduce` over `string_split(t, '')` codepoints. Replaced
    * the earlier (length, first, last) 3-feature hash, under which every
    * token triple-sibling ("the"/"tie") shared ALL counter positions and
    * conflated counts far beyond the count-min ε·N bound.
    */
  def portableTokenHash(t: Column): Column = TextExpressions.poly_token_hash(t)

  /** Version tag of [[portableTokenHash]]'s arithmetic, stamped into every
    * persisted artifact keyed by it (frequency-sketch rows, classifier
    * models) and `require()`d on read: a sketch built under one hash and
    * probed under another returns silently-wrong estimates — the grid
    * carries no other signal of the mismatch. v1 was the (length, first,
    * last) 3-feature hash; v2 is the full polynomial (mult 131 mod 1e9+7)
    * over all codepoints. Bump on ANY change to the arithmetic.
    */
  val TokenHashVersion: Int = 2

  /** Version tag of [[graft.operators.TextAnalysis.portableFingerprint]]'s
    * arithmetic — the key under the Bloom seen-store, samplers, splits
    * and shuffles — stamped into persisted filters and `require()`d on
    * probe, for the same reason as [[TokenHashVersion]]: a store built
    * under one fingerprint and probed under another silently re-admits
    * every duplicate. v1 was the token-LENGTH fold; v2 is the content
    * fold (per-token codepoint polynomial ·131, folded ·31) TOGETHER
    * with [[BloomFilter]]'s non-degenerate probe step (h2 mod (p−1)+1 —
    * both landed in the same release). Bump on ANY change to either
    * arithmetic.
    */
  val FingerprintVersion: Int = 2

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast(DoubleType)
        / length(text).cast(DoubleType))

  /** Fraction of tokens that are in the stopword list — one codegen pass
    * ([[TextExpressions.StopStatsExpr]]; set via `addReferenceObj`)
    * instead of a `filter(isInCollection)` HOF: this sits inside
    * [[qualityScore]], which the pipeline computes for every document.
    * Denominator counts ALL split segments (empties included), exactly
    * like the `size(tokens)` form it replaces.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val st = TextExpressions.stop_stats(text, stopwords)
    val nTok = element_at(st, 1)
    val nStop = element_at(st, 2)
    when(nTok === 0L, lit(0.0))
      .otherwise(nStop.cast(DoubleType) / nTok.cast(DoubleType))
  }

  /** Mean token length (characters per token). */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType)
        / size(toks).cast(DoubleType))
  }

  /** Simple quality score in [0,1]: penalizes very short docs, high
    * punctuation density and stopword-free (keyword-spam) text. The exact
    * formula is ours; the *shape* (length/punct/stopword signals) is the
    * standard quality heuristic for pretraining corpora.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast(DoubleType) / lit(50.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5, lit(1.0))
    (lenScore + punctScore + stopScore) / 3
  }

  /** Baseline PII scrubbing for training corpora: masks emails (including
    * IP-literal and single-label domains via the local-part catch-all),
    * bare IPv4 literals, separator-formatted phone numbers and 7+-digit
    * runs with typed placeholders. Rule order matters: emails first (an
    * address must not first lose its digits to the number rule), then the
    * catch-all `local@host`, then bare IPs, then number shapes. Pure
    * regexp_replace chain — codegen'd, and the patterns are deliberately
    * RE2-compatible (character classes, bounded repeats, `\b`) so an
    * engine-neutral oracle can replay them exactly.
    *
    * This is the BASELINE pattern set — a real deployment extends it
    * (international phone formats, IBANs, national id shapes, …); the
    * point here is the operator shape: a deterministic, engine-replayable
    * masking pass that stays inside whole-stage codegen.
    */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val emailAny = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phoneSep = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
    val digits = "[0-9]{7,}"
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, email, "<EMAIL>"),
            emailAny, "<EMAIL>"),
          ipv4, "<IP>"),
        phoneSep, "<NUM>"),
      digits, "<NUM>")
  }

  /** Deterministic 64-bit rolling (polynomial) fingerprint of the token
    * sequence: hash = fold(h * 31 + xxhash64(token)). Order-sensitive, so
    * permuted documents get different fingerprints (unlike a bag hash).
    */
  def docFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc * 31 + xxhash64(t))

  // --------------------------------------------------------------- embeddings

  /** Elementwise dot product of two float-array columns, computed in double.
    * Backed by the codegen'd [[VectorExpressions.VecDot]] (left-to-right
    * double accumulation — bit-identical to a sequential fold).
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.vec_dot(a, b)

  /** L2 norm of a float-array column, computed in double (codegen'd). */
  def vecNorm(v: Column): Column = VectorExpressions.vec_norm(v)

  /** Cosine similarity of two float-array columns (codegen'd). */
  def cosine(a: Column, b: Column): Column = VectorExpressions.vec_cosine(a, b)
}
