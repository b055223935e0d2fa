package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** WARC record parsing — the layer between [[GzipArchives]]' member
  * splitter and the text pipeline: a WET/WARC archive member is one
  * record (`WARC/x.y` version line, `Key: Value` header lines, a blank
  * line, then the payload), and this parser recovers the typed fields a
  * curation run keys on (record type, target URI, date, content type /
  * length) plus the payload, truncated to `Content-Length` bytes when
  * the member carries trailing garbage. Pure per-member string walk —
  * `mapPartitions`, no shuffle, the same flatMap-only ingest shape as
  * the archive splitter — and fail-SOFT: a member without a WARC
  * version line yields `ok = false` with null fields, never an
  * exception mid-ingest.
  *
  * Header semantics per the public WARC spec (ISO 28500 shape): header
  * keys are case-insensitive, values are trimmed, the FIRST occurrence
  * of a repeated key wins (malformed records repeat keys; first-wins is
  * deterministic), and unknown keys are ignored.
  */
object WarcRecords {

  /** First-wins fold of the five WARC header fields this reader consumes
    * — ONE definition for both the string and byte record flavors:
    * `(type, target_uri, date, content_type, content_length)`.
    */
  private def headerFields(lines: Array[String])
      : (String, String, String, String, Long) = {
    var (t, uri, date, ct) = (null: String, null: String, null: String, null: String)
    var cl = -1L
    var i = 1
    while (i < lines.length) {
      val ln = lines(i)
      val c = ln.indexOf(':')
      if (c > 0) {
        val k = ln.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = ln.substring(c + 1).trim
        k match {
          case "warc-type" => if (t == null) t = v
          case "warc-target-uri" => if (uri == null) uri = v
          case "warc-date" => if (date == null) date = v
          case "content-type" => if (ct == null) ct = v
          case "content-length" => if (cl < 0)
            cl = try v.toLong catch { case _: NumberFormatException => -1L }
          case _ =>
        }
      }
      i += 1
    }
    (t, uri, date, ct, cl)
  }


  final case class WarcRow(
      archive_id: Long,
      member_idx: Int,
      ok: Boolean,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      body: String)

  /** Back a truncation cut off to the start of the last INCOMPLETE UTF-8
    * sequence, so decoding a Content-Length-cut payload never
    * manufactures a trailing U+FFFD that is the CUT's artifact (U+FFFD
    * from genuinely invalid bytes inside the payload is preserved
    * faithfully — the decoder sees those bytes unchanged).
    */
  private def utf8SafeCut(bytes: Array[Byte], cut0: Int): Int = {
    var cut = cut0
    if (cut > 0) {
      var p = cut - 1
      while (p > 0 && (bytes(p) & 0xC0) == 0x80) p -= 1
      val lead = bytes(p) & 0xFF
      val need =
        if (lead < 0x80) 1
        else if ((lead & 0xE0) == 0xC0) 2
        else if ((lead & 0xF0) == 0xE0) 3
        else if ((lead & 0xF8) == 0xF0) 4
        else 1 // invalid lead byte: leave the cut alone
      if (p + need > cut) cut = p
    }
    cut
  }

  /** Parse one record already decoded to a string (WET conversion
    * records are UTF-8 text). Returns null fields + ok=false on a
    * non-WARC member.
    *
    * A THIN DECODE over [[parseRecordBytes]]: the record is measured and
    * Content-Length-cut on its RAW bytes first, then the payload is
    * decoded — so the cut position is byte-exact even when invalid UTF-8
    * sits before the boundary (the retired parallel implementation
    * measured re-encoded U+FFFD replacements, shifting the cut a few
    * bytes early per bad byte). When the cut lands mid multi-byte
    * sequence the decode backs off to the last complete code point
    * ([[utf8SafeCut]]), so no trailing U+FFFD is manufactured by the
    * truncation itself.
    */
  def parseRecordString(rec: String): (Boolean, String, String, String, String, Long, String) = {
    if (rec == null) return (false, null, null, null, null, -1L, null)
    parseBytesThenDecode(rec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def parseBytesThenDecode(raw: Array[Byte])
      : (Boolean, String, String, String, String, Long, String) = {
    val (ok, t, uri, date, ct, cl, body, rawBodyLen) = parseRecordCore(raw)
    if (!ok) return (false, null, null, null, null, -1L, null)
    // only a cut that actually SHORTENED the raw payload can have split a
    // sequence; an un-truncated payload's trailing bytes are the record's
    // own, decoded as-is (incomplete tail → U+FFFD, faithfully)
    val truncated = cl >= 0 && cl < rawBodyLen
    val end = if (truncated) utf8SafeCut(body, body.length) else body.length
    (true, t, uri, date, ct, cl,
      new String(body, 0, end, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Parse every exploded archive member ([[GzipArchives.explodeArchives]]
    * output) into typed WARC rows. Members already flagged `ok = false`
    * by the splitter (CRC/truncation markers) pass through as
    * `ok = false` rows. Parses the member's RAW bytes (the
    * [[parseRecordString]] cut discipline) — no whole-member decode
    * before the header walk.
    */
  def parseMembers(members: Dataset[GzipArchives.MemberRow]): DataFrame = {
    import members.sparkSession.implicits._
    members.mapPartitions(_.map { m =>
      if (!m.ok || m.content == null)
        WarcRow(m.archive_id, m.member_idx, ok = false, null, null, null,
          null, -1L, null)
      else {
        val (ok, t, uri, date, ct, cl, body) = parseBytesThenDecode(m.content)
        WarcRow(m.archive_id, m.member_idx, ok, t, uri, date, ct, cl, body)
      }
    }).toDF()
  }

  final case class WarcBinaryRow(
      archive_id: Long,
      member_idx: Int,
      ok: Boolean,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      body: Array[Byte])

  /** Parse one record as BYTES — the full-WARC shape, where `response`
    * records carry captured HTTP responses whose entity bodies are raw
    * octets in the origin server's encoding (not necessarily UTF-8; the
    * string flavor above is only sound for WET conversion records). The
    * header block is decoded as UTF-8 (the spec allows raw UTF-8 in
    * values like WARC-Target-URI; the lenient decoder can never throw);
    * the payload is returned UNDECODED and truncated to `Content-Length`
    * BYTES directly — no encode/decode round-trip.
    */
  def parseRecordBytes(rec: Array[Byte]): (Boolean, String, String, String, String, Long, Array[Byte]) = {
    val (ok, t, uri, date, ct, cl, body, _) = parseRecordCore(rec)
    (ok, t, uri, date, ct, cl, body)
  }

  /** The one record walk both flavors share; the extra last element is
    * the RAW payload length before the Content-Length cut (the string
    * flavor needs it to know whether a cut actually happened).
    */
  private def parseRecordCore(rec: Array[Byte])
      : (Boolean, String, String, String, String, Long, Array[Byte], Int) = {
    if (rec == null) return (false, null, null, null, null, -1L, null, 0)
    // find the \r\n\r\n header/payload separator at the byte level
    var sep = -1
    var i = 0
    val n = rec.length - 3
    while (i < n && sep < 0) {
      if (rec(i) == '\r' && rec(i + 1) == '\n' &&
          rec(i + 2) == '\r' && rec(i + 3) == '\n') sep = i
      i += 1
    }
    val headEnd = if (sep < 0) rec.length else sep
    // UTF-8, not Latin-1: WARC-Target-URI may carry raw UTF-8 per the WARC
    // spec, and a Latin-1 decode would mojibake each UTF-8 byte into its
    // own char. The separator scan and Content-Length cut above/below run
    // on BYTE offsets, so the header decode never affects the payload cut;
    // String's lenient decoder maps genuinely invalid bytes to U+FFFD and
    // can never throw mid-ingest.
    val head = new String(rec, 0, headEnd, java.nio.charset.StandardCharsets.UTF_8)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/"))
      return (false, null, null, null, null, -1L, null, 0)
    val (t, uri, date, ct, cl) = headerFields(lines)
    val bodyStart = if (sep < 0) rec.length else sep + 4
    val rawBodyLen = rec.length - bodyStart
    var bodyLen = rawBodyLen
    if (cl >= 0 && cl < bodyLen) bodyLen = cl.toInt
    val body = java.util.Arrays.copyOfRange(rec, bodyStart, bodyStart + bodyLen)
    (true, t, uri, date, ct, cl, body, rawBodyLen)
  }

  /** [[parseMembers]] with the payload kept as BYTES — feeds
    * [[HttpPayload.parseResponses]] for full-WARC response records.
    */
  def parseMembersBinary(members: Dataset[GzipArchives.MemberRow]): DataFrame = {
    import members.sparkSession.implicits._
    members.mapPartitions(_.map { m =>
      if (!m.ok || m.content == null)
        WarcBinaryRow(m.archive_id, m.member_idx, ok = false, null, null,
          null, null, -1L, null)
      else {
        val (ok, t, uri, date, ct, cl, body) = parseRecordBytes(m.content)
        WarcBinaryRow(m.archive_id, m.member_idx, ok, t, uri, date, ct, cl, body)
      }
    }).toDF()
  }
}
