package graft.sources

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** HTTP response parsing — the layer between WARC `response` records and
  * the HTML pipeline. A real crawl's WARC payload is not bare HTML: it is
  * the captured HTTP response (`HTTP/1.1 200 OK`, header lines, a blank
  * line, then the entity body in whatever encoding the origin server
  * chose). This parser recovers the status code, the declared media type
  * and the entity body DECODED BY ITS DECLARED CHARSET — the step that
  * turns crawl bytes into the one canonical UTF-8 string every downstream
  * text operator assumes.
  *
  * Charset resolution follows the WHATWG order real browsers (and crawl
  * extractors) use: (1) the `charset=` parameter of the `Content-Type`
  * response header; (2) an HTML `<meta charset=…>` / `http-equiv`
  * declaration sniffed from the first [[SniffWindow]] BYTES of the body
  * (every supported charset is an ASCII superset, so the ASCII-level scan
  * is sound before the charset is known); (3) UTF-8. Decoding never
  * throws: malformed sequences decode with U+FFFD replacement, and an
  * unsupported charset label falls back to UTF-8 — fail-soft, like every
  * ingest stage here.
  *
  * Scale shape: pure per-record byte arithmetic, mapPartitions, no
  * shuffle — the same flatMap-only ingest contract as [[GzipArchives]]
  * and [[WarcRecords]].
  */
object HttpPayload {

  /** How many leading body bytes the meta-charset sniff may inspect
    * (the WHATWG prescan window).
    */
  val SniffWindow = 1024

  final case class HttpRow(
      ok: Boolean,
      status: Int,
      content_type: String,
      charset: String,
      body: Array[Byte])

  private val Crlf2 = Array[Byte]('\r', '\n', '\r', '\n')

  private def indexOfCrlf2(b: Array[Byte]): Int = {
    var i = 0
    val n = b.length - 3
    while (i < n) {
      if (b(i) == Crlf2(0) && b(i + 1) == Crlf2(1) &&
          b(i + 2) == Crlf2(2) && b(i + 3) == Crlf2(3)) return i
      i += 1
    }
    -1
  }

  /** Charsets this engine decodes natively. Labels are matched
    * case-insensitively with the common aliases crawl servers emit.
    * Anything else falls back to UTF-8 (fail-soft, never a throw).
    */
  private[graft] def resolveCharset(label: String): (String, Charset) =
    label.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "utf-8" | "utf8" => ("utf-8", StandardCharsets.UTF_8)
      case "iso-8859-1" | "latin-1" | "latin1" | "iso8859-1" =>
        ("iso-8859-1", StandardCharsets.ISO_8859_1)
      case "windows-1252" | "cp1252" | "win-1252" =>
        ("windows-1252", Charset.forName("windows-1252"))
      case "us-ascii" | "ascii" => ("us-ascii", StandardCharsets.US_ASCII)
      case _ => ("utf-8", StandardCharsets.UTF_8)
    }

  /** Decode `bytes` by `charset` with U+FFFD replacement (never throws). */
  def decodeBody(bytes: Array[Byte], charsetLabel: String): String = {
    val (_, cs) = resolveCharset(if (charsetLabel == null) "utf-8" else charsetLabel)
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Extract the `charset=` parameter from a Content-Type value
    * (`text/html; charset=UTF-8`), or null. Quotes stripped.
    */
  private[graft] def charsetParam(contentType: String): String = {
    if (contentType == null) return null
    // case-insensitive scan on the ORIGINAL string (regionMatches):
    // indexing it with an offset found in a lowercased COPY is wrong —
    // toLowerCase can change string LENGTH ('İ' → "i̇" is two chars), so
    // the offset would misalign or run past the end on hostile headers
    var at = -1
    var i0 = 0
    while (at < 0 && i0 + 8 <= contentType.length) {
      if (contentType.regionMatches(true, i0, "charset=", 0, 8)) at = i0
      i0 += 1
    }
    if (at < 0) return null
    var s = contentType.substring(at + 8).trim
    val semi = s.indexOf(';')
    if (semi >= 0) s = s.substring(0, semi).trim
    if (s.length >= 2 && (s.charAt(0) == '"' || s.charAt(0) == '\'') &&
        s.charAt(s.length - 1) == s.charAt(0))
      s = s.substring(1, s.length - 1).trim
    if (s.isEmpty) null else s
  }

  /** Sniff an HTML meta charset declaration from the first
    * [[SniffWindow]] bytes: finds `charset=` inside a `<meta` tag
    * (covers both `<meta charset="x">` and the `http-equiv` +
    * `content="text/html; charset=x"` spelling), value delimited by
    * quote, space, `;`, `/` or `>`. ASCII-level scan — sound because
    * every supported charset is an ASCII superset. Returns null when
    * absent.
    */
  private[graft] def sniffMetaCharset(body: Array[Byte]): String = {
    val n = math.min(body.length, SniffWindow)
    val s = new String(body, 0, n, StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val meta = s.indexOf("<meta", from)
      if (meta < 0) return null
      val end0 = s.indexOf('>', meta)
      val end = if (end0 < 0) s.length else end0
      val cs = s.indexOf("charset=", meta)
      if (cs >= 0 && cs < end) {
        var i = cs + 8
        if (i < end && (s.charAt(i) == '"' || s.charAt(i) == '\'')) i += 1
        var j = i
        while (j < end && {
          val c = s.charAt(j)
          c != '"' && c != '\'' && c != ' ' && c != ';' && c != '/' && c != '>'
        }) j += 1
        if (j > i) return s.substring(i, j)
      }
      from = end + 1
    }
    null // unreachable
  }

  /** Hard cap on a single record's decoded entity (de-chunked or
    * decompressed): a hostile capture (a gzip bomb, a lying chunk size)
    * must never be able to blow one task's memory. Exceeding it flags
    * the row `ok = false` — fail-soft, like every malformed input here.
    */
  val MaxEntity: Long = 1L << 26 // 64 MiB

  /** Decode a `Transfer-Encoding: chunked` entity starting at `from`:
    * hex-size line (`;extensions` ignored) CRLF data CRLF …, terminated
    * by a 0-size chunk (trailers ignored). Returns null on malformed
    * framing — the caller flags the row rather than letting chunk-size
    * lines flow into the decoded text as garbage.
    */
  private[graft] def dechunk(b: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = from
    while (true) {
      var eol = pos
      while (eol + 1 < b.length && !(b(eol) == '\r' && b(eol + 1) == '\n')) eol += 1
      if (eol + 1 >= b.length) return null // size line without CRLF
      val line = new String(b, pos, eol - pos, StandardCharsets.ISO_8859_1)
      val sizeStr = {
        val semi = line.indexOf(';')
        (if (semi >= 0) line.substring(0, semi) else line).trim
      }
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException => return null }
      if (size < 0 || size > MaxEntity || out.size + size > MaxEntity) return null
      pos = eol + 2
      if (size == 0) return out.toByteArray // terminal chunk; ignore trailers
      if (pos + size + 2 > b.length) return null // data overruns the capture
      out.write(b, pos, size.toInt)
      pos += size.toInt + 2
      if (!(b(pos - 2) == '\r' && b(pos - 1) == '\n')) return null
    }
    null // unreachable
  }

  /** Drain `in` under [[MaxEntity]]; null on any IO error or overflow. */
  private def drainCapped(in: java.io.InputStream): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > MaxEntity) return null
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null
      case _: RuntimeException => null // ZipException subclasses IOException, but stay safe
    } finally in.close()

  /** `Content-Encoding: gzip` — null on corrupt stream or bomb. */
  private[graft] def gunzip(b: Array[Byte]): Array[Byte] =
    try drainCapped(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)))
    catch { case _: java.io.IOException => null }

  /** `Content-Encoding: deflate` — RFC 9110 deflate is zlib-wrapped, but
    * plenty of servers send raw DEFLATE; try zlib first, raw second.
    */
  private[graft] def inflate(b: Array[Byte]): Array[Byte] = {
    val zlib = drainCapped(new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(b)))
    if (zlib != null) zlib
    else drainCapped(new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(b), new java.util.zip.Inflater(true)))
  }

  /** Parse one captured HTTP response. Returns `ok = false` (null
    * fields, null body) when the payload does not start with an HTTP
    * status line — a crawl carries plenty of non-HTTP records and this
    * layer must never throw on them. The entity body is truncated to
    * the HTTP `Content-Length` when the capture carries trailing
    * garbage (never padded when short).
    *
    * Transfer/content codings are honored, not ignored: a declared
    * `Transfer-Encoding: chunked` is de-chunked (Content-Length is then
    * ignored, per RFC 9112), `Content-Encoding: gzip`/`deflate` is
    * decompressed, and any OTHER declared coding (br, zstd, compress, a
    * non-chunked transfer coding) flags the row `ok = false` — raw
    * framing lines or compressed bytes must never flow into the decoded
    * `text` as corpus garbage under an `ok = true` verdict. Charset
    * resolution (header param → meta sniff → UTF-8) runs on the fully
    * DECODED entity.
    */
  def parseHttpBytes(payload: Array[Byte]): HttpRow = {
    val bad = HttpRow(ok = false, -1, null, null, null)
    if (payload == null || payload.length < 12) return bad
    // status line: HTTP/<d>.<d> SP <3 digits> [SP reason]
    if (!(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' &&
          payload(3) == 'P' && payload(4) == '/')) return bad
    val sep = indexOfCrlf2(payload)
    val headEnd = if (sep < 0) payload.length else sep
    val head = new String(payload, 0, headEnd, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n", -1)
    val status0 = lines(0)
    val sp1 = status0.indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > status0.length) return bad
    val codeStr = {
      val rest = status0.substring(sp1 + 1)
      val sp2 = rest.indexOf(' ')
      if (sp2 < 0) rest else rest.substring(0, sp2)
    }
    val status =
      try codeStr.toInt
      catch { case _: NumberFormatException => return bad }
    // headers: case-insensitive keys, FIRST occurrence wins (same
    // deterministic policy as WarcRecords)
    var contentType: String = null
    var contentLength = -1L
    var transferEnc: String = null
    var contentEnc: String = null
    var i = 1
    while (i < lines.length) {
      val ln = lines(i)
      val c = ln.indexOf(':')
      if (c > 0) {
        val k = ln.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = ln.substring(c + 1).trim
        k match {
          case "content-type" => if (contentType == null) contentType = v
          case "content-length" => if (contentLength < 0)
            contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
          case "transfer-encoding" => if (transferEnc == null) transferEnc = v
          case "content-encoding" => if (contentEnc == null) contentEnc = v
          case _ =>
        }
      }
      i += 1
    }
    val bodyStart = if (sep < 0) payload.length else sep + 4
    // transfer coding first (chunked framing supersedes Content-Length),
    // then content coding — both fail-soft to ok=false, never garbage
    var body: Array[Byte] = null
    if (transferEnc != null) {
      if (transferEnc.trim.toLowerCase(java.util.Locale.ROOT) != "chunked") return bad
      body = dechunk(payload, bodyStart)
      if (body == null) return bad
    } else {
      var bodyLen = payload.length - bodyStart
      if (contentLength >= 0 && contentLength < bodyLen) bodyLen = contentLength.toInt
      body = java.util.Arrays.copyOfRange(payload, bodyStart, bodyStart + bodyLen)
    }
    if (contentEnc != null) {
      contentEnc.trim.toLowerCase(java.util.Locale.ROOT) match {
        case "gzip" | "x-gzip" =>
          body = gunzip(body)
          if (body == null) return bad
        case "deflate" =>
          body = inflate(body)
          if (body == null) return bad
        case "identity" | "" =>
        case _ => return bad // br, zstd, compress: undecodable here
      }
    }
    // charset resolution: header param, then meta sniff, then UTF-8
    val label0 = charsetParam(contentType)
    val label = if (label0 != null) label0 else sniffMetaCharset(body)
    val (canonical, _) = resolveCharset(if (label == null) "utf-8" else label)
    val mime = if (contentType == null) null else {
      val semi = contentType.indexOf(';')
      (if (semi < 0) contentType else contentType.substring(0, semi)).trim.toLowerCase(java.util.Locale.ROOT)
    }
    HttpRow(ok = true, status, mime, canonical, body)
  }

  final case class ResponseRow(
      archive_id: Long,
      member_idx: Int,
      ok: Boolean,
      target_uri: String,
      status: Int,
      mime: String,
      charset: String,
      text: String)

  /** Decode every binary-payload WARC row ([[WarcRecords.parseMembersBinary]]
    * output) into a charset-decoded response row. Rows whose WARC parse
    * already failed, or whose payload is not an HTTP response, come
    * through as `ok = false`. Map-only.
    */
  def parseResponses(warcRows: DataFrame): DataFrame = {
    import warcRows.sparkSession.implicits._
    warcRows
      .select(col("archive_id"), col("member_idx"), col("ok"),
        col("target_uri"), col("body"))
      .as[(Long, Int, Boolean, String, Array[Byte])]
      .mapPartitions(_.map { case (aid, idx, ok, uri, payload) =>
        if (!ok || payload == null)
          ResponseRow(aid, idx, ok = false, uri, -1, null, null, null)
        else {
          val h = parseHttpBytes(payload)
          if (!h.ok) ResponseRow(aid, idx, ok = false, uri, -1, null, null, null)
          else ResponseRow(aid, idx, ok = true, uri, h.status, h.content_type,
            h.charset, decodeBody(h.body, h.charset))
        }
      })
      .toDF()
  }
}
