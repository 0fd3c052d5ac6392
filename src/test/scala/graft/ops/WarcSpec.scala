package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  test("response records roundtrip URI and body through the record walk") {
    val recs = Seq(
      Warc.warcinfoRecord("spec"),
      Warc.responseRecord("http://x/1", "1", "<p>one</p>\ntwo"),
      Warc.responseRecord("http://x/2", "2", ""))
    val p = Warc.parse(Warc.archive(recs))
    assert(p.others === 1)
    assert(p.quarantined === Vector())
    assert(p.pages === Vector(
      Warc.Page("<urn:graft:1>", "http://x/1", "<p>one</p>\ntwo"),
      Warc.Page("<urn:graft:2>", "http://x/2", "")))
  }

  test("torn records quarantine with reasons and the walk resyncs") {
    val recs = Seq(Warc.responseRecord("http://x/1", "1", "ok")) ++
      Warc.corruptRecords
    val p = Warc.parse(Warc.archive(recs))
    assert(p.pages.map(_.uri) === Vector("http://x/1"))
    assert(p.quarantined ===
      Vector("bad_http", "bad_magic", "no_length", "truncated"))
  }

  test("a good record AFTER a torn one is recovered by the resync") {
    val recs = Seq(
      Warc.corruptRecords(1), // wrong magic
      Warc.responseRecord("http://x/9", "9", "body"))
    val p = Warc.parse(Warc.archive(recs))
    assert(p.quarantined === Vector("bad_magic"))
    assert(p.pages === Vector(Warc.Page("<urn:graft:9>", "http://x/9", "body")))
  }

  test("hostile bytes never throw") {
    assert(Warc.parse(Array.empty[Byte]).pages.isEmpty)
    assert(Warc.parse("WARC/1.0".getBytes("UTF-8")).quarantined ===
      Vector("truncated"))
    assert(Warc.parse("\r\n\r\n\r\n".getBytes("UTF-8")).quarantined ===
      Vector())
    val negLen = ("WARC/1.0\r\nContent-Length: -5\r\n\r\n").getBytes("UTF-8")
    assert(Warc.parse(negLen).quarantined === Vector("no_length"))
    val junk = Array.tabulate[Byte](512)(i => (i * 37).toByte)
    val r = Warc.parse(junk)
    assert(r.pages.isEmpty) // garbage: quarantined, not decoded
  }

  test("case-insensitive header names frame the payload") {
    val rec = ("WARC/1.0\r\nwarc-type: RESPONSE\r\ncontent-length: 4\r\n\r\n" +
      "abcd\r\n\r\n").getBytes("UTF-8")
    val p = Warc.parse(rec)
    // type value comparison is exact ("response"): RESPONSE is counted
    // as a non-response record, but framing still consumes 4 bytes
    assert(p.others === 1 && p.quarantined.isEmpty)
  }
}
