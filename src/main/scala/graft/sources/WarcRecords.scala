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

  /** Parse one record already decoded to a string (WET conversion
    * records are UTF-8 text). Returns null fields + ok=false on a
    * non-WARC member.
    */
  def parseRecordString(rec: String): (Boolean, String, String, String, String, Long, String) = {
    if (rec == null) return (false, null, null, null, null, -1L, null)
    val sep = rec.indexOf("\r\n\r\n")
    val head = if (sep < 0) rec else rec.substring(0, sep)
    val body0 = if (sep < 0) "" else rec.substring(sep + 4)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/"))
      return (false, null, null, null, null, -1L, null)
    val (t, uri, date, ct, cl) = headerFields(lines)
    // Content-Length counts BYTES; truncate the payload when the member
    // carries trailing garbage (never pad when it is short — fail-soft).
    // A cut landing mid multi-byte sequence backs off to the last
    // COMPLETE code point, so this flavor never manufactures a trailing
    // U+FFFD the byte-level flavor (parseRecordBytes) would not carry.
    // KNOWN DRIFT: this string flavor measures RE-ENCODED UTF-8 — if the
    // member carried invalid UTF-8 before the boundary, each U+FFFD
    // replacement re-encodes as 3 bytes and the cut shifts by the
    // difference (a few bytes early per bad byte). The byte flavor is
    // exact; route binary/dirty archives through parseRecordBytes.
    val body =
      if (cl < 0) body0
      else {
        val bytes = body0.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (cl < bytes.length) {
          var cut = cl.toInt
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
          new String(bytes, 0, cut, java.nio.charset.StandardCharsets.UTF_8)
        } else body0
      }
    (true, t, uri, date, ct, cl, body)
  }

  /** Parse every exploded archive member ([[GzipArchives.explodeArchives]]
    * output) into typed WARC rows. Members already flagged `ok = false`
    * by the splitter (CRC/truncation markers) pass through as
    * `ok = false` rows.
    */
  def parseMembers(members: Dataset[GzipArchives.MemberRow]): DataFrame = {
    import members.sparkSession.implicits._
    members.mapPartitions(_.map { m =>
      if (!m.ok || m.content == null)
        WarcRow(m.archive_id, m.member_idx, ok = false, null, null, null,
          null, -1L, null)
      else {
        val s = new String(m.content, java.nio.charset.StandardCharsets.UTF_8)
        val (ok, t, uri, date, ct, cl, body) = parseRecordString(s)
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
    * header block is ASCII by spec and is decoded as ISO-8859-1 (an
    * ASCII superset, so a stray high byte in a malformed header can
    * never throw); the payload is returned UNDECODED and truncated to
    * `Content-Length` BYTES directly — no encode/decode round-trip.
    */
  def parseRecordBytes(rec: Array[Byte]): (Boolean, String, String, String, String, Long, Array[Byte]) = {
    if (rec == null) return (false, null, null, null, null, -1L, null)
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
    val head = new String(rec, 0, headEnd, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/"))
      return (false, null, null, null, null, -1L, null)
    val (t, uri, date, ct, cl) = headerFields(lines)
    val bodyStart = if (sep < 0) rec.length else sep + 4
    var bodyLen = rec.length - bodyStart
    if (cl >= 0 && cl < bodyLen) bodyLen = cl.toInt
    val body = java.util.Arrays.copyOfRange(rec, bodyStart, bodyStart + bodyLen)
    (true, t, uri, date, ct, cl, body)
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
