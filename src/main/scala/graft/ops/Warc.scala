package graft.ops

import scala.collection.mutable.ArrayBuffer

/** WARC (ISO 28500 / the public WARC/1.x spec) container walk — the
  * archive format web crawls actually ship in (Common Crawl et al.).
  * Reader subset: WARC/1.x records framed by `Content-Length`,
  * case-insensitive named headers, `response` records carrying an
  * HTTP/1.x message whose body is the page. Anything structurally
  * broken — wrong magic, missing/unparseable Content-Length, a length
  * running past EOF, a response payload with no HTTP header block —
  * becomes a QUARANTINE row with a reason, never an exception (the
  * same accept-and-reject census contract as the CSV/NDJSON ingest
  * gates), and the walk RESYNCS at the next `WARC/1.` magic the way
  * public WARC tooling recovers from torn records.
  *
  * Scale shape: one archive file = one task. A crawl ingest lists
  * file paths, distributes them, and each executor walks its files
  * record-by-record — the registry query models exactly that with one
  * synthesized archive per source group.
  *
  * Reference behavior modeled: etielle treats unreadable payloads as
  * path misses, not hard errors (fluent.py's null-safe traversal);
  * torn records here land in the quarantine census the same way.
  */
object Warc {

  /** One accepted response record: the raw `WARC-Record-ID` header
    * value (empty when absent), the target URI, and the HTTP body. */
  final case class Page(recordId: String, uri: String, body: String)

  /** One well-formed parse result: `pages` are the response records in
    * file order, `others` counts well-formed non-response records
    * (warcinfo, request, …), `quarantined` holds one reason per torn
    * record. */
  final case class Parsed(pages: Vector[Page], others: Int,
      quarantined: Vector[String])

  private val Crlf = "\r\n"

  /** Serialize one response record: WARC headers, then the HTTP
    * message as the Content-Length-framed payload. */
  def responseRecord(uri: String, recordId: String, html: String): Array[Byte] = {
    val http = "HTTP/1.1 200 OK" + Crlf +
      "Content-Type: text/html; charset=utf-8" + Crlf + Crlf + html
    val payload = http.getBytes("UTF-8")
    val hdr = "WARC/1.0" + Crlf +
      "WARC-Type: response" + Crlf +
      s"WARC-Target-URI: $uri" + Crlf +
      s"WARC-Record-ID: <urn:graft:$recordId>" + Crlf +
      "Content-Type: application/http;msgtype=response" + Crlf +
      s"Content-Length: ${payload.length}" + Crlf + Crlf
    hdr.getBytes("UTF-8") ++ payload ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  /** Serialize the archive-head warcinfo record. */
  def warcinfoRecord(software: String): Array[Byte] = {
    val payload = s"software: $software$Crlf".getBytes("UTF-8")
    val hdr = "WARC/1.0" + Crlf +
      "WARC-Type: warcinfo" + Crlf +
      s"Content-Length: ${payload.length}" + Crlf + Crlf
    hdr.getBytes("UTF-8") ++ payload ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(at + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def indexOf(b: Array[Byte], s: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - s.length
    while (i <= last) {
      if (startsWith(b, i, s)) return i
      i += 1
    }
    -1
  }

  /** Walk one archive byte-for-byte. Total function: any bytes in, a
    * census of pages + others + quarantine reasons out. */
  def parse(b: Array[Byte]): Parsed = {
    val pages = Vector.newBuilder[Page]
    val quarantined = Vector.newBuilder[String]
    var others = 0
    var i = 0
    var done = false
    while (!done && i < b.length) {
      // inter-record CRLF padding
      while (i < b.length && (b(i) == '\r'.toByte || b(i) == '\n'.toByte))
        i += 1
      if (i >= b.length) done = true
      else if (!startsWith(b, i, "WARC/1.")) {
        quarantined += "bad_magic"
        val nxt = indexOf(b, "WARC/1.", i + 1)
        if (nxt < 0) done = true else i = nxt
      } else {
        val hdrEnd = indexOf(b, Crlf + Crlf, i)
        if (hdrEnd < 0) { quarantined += "truncated"; done = true }
        else {
          // named headers: case-insensitive names, value after ':'
          val headers = new String(b, i, hdrEnd - i, "UTF-8")
            .split(Crlf).iterator.drop(1) // first line is the version
            .flatMap { line =>
              val c = line.indexOf(':')
              if (c < 0) None
              else Some(line.substring(0, c).trim.toLowerCase ->
                line.substring(c + 1).trim)
            }
            .toMap
          val len = headers.get("content-length")
            .flatMap(v => v.toLongOption).filter(_ >= 0)
          len match {
            case None =>
              quarantined += "no_length"
              val nxt = indexOf(b, "WARC/1.", hdrEnd + 4)
              if (nxt < 0) done = true else i = nxt
            case Some(n) if hdrEnd + 4 + n > b.length =>
              quarantined += "truncated"; done = true
            case Some(n) =>
              val p0 = hdrEnd + 4
              i = (p0 + n).toInt
              if (headers.get("warc-type").contains("response")) {
                val httpEnd = indexOf(b, Crlf + Crlf, p0) match {
                  case e if e >= 0 && e + 4 <= p0 + n => e
                  case _ => -1
                }
                if (httpEnd < 0 || !startsWith(b, p0, "HTTP/"))
                  quarantined += "bad_http"
                else {
                  val body = new String(b, httpEnd + 4,
                    (p0 + n - (httpEnd + 4)).toInt, "UTF-8")
                  pages += Page(headers.getOrElse("warc-record-id", ""),
                    headers.getOrElse("warc-target-uri", ""), body)
                }
              } else others += 1
          }
        }
      }
    }
    Parsed(pages.result(), others, quarantined.result())
  }

  /** Concatenate records into one archive. */
  def archive(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    records.foreach(out ++= _)
    out.toArray
  }

  /** The four deterministically torn records the ingest gate appends
    * to every synthesized archive — reasons in file order: a response
    * whose payload has no HTTP header block, a wrong-magic record, a
    * record with no Content-Length, and a record whose declared length
    * runs past EOF. */
  def corruptRecords: Seq[Array[Byte]] = Seq(
    ("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
      "Content-Length: 7" + Crlf + Crlf + "NOTHTTP" + Crlf + Crlf)
      .getBytes("UTF-8"),
    ("BAD!/9.9" + Crlf + "WARC-Type: junk" + Crlf + Crlf).getBytes("UTF-8"),
    ("WARC/1.0" + Crlf + "WARC-Type: metadata" + Crlf + Crlf)
      .getBytes("UTF-8"),
    ("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
      "Content-Length: 999999" + Crlf + Crlf + "abc").getBytes("UTF-8"))
}
