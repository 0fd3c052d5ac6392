package graft.ops

import graft.SparkTestBase

/** URL canonicalization + crawl front-door gate. */
class UrlGateSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Map[String, org.apache.spark.sql.Row] =
    Corpus.urlCanonicalize(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url"), "url")
      .collect().map(r => r.getAs[String]("url") -> r).toMap

  test("host case, default port, www, query, fragment, trailing slash") {
    val m = canon(
      "HTTPS://WWW.Ex.COM:443/A/b//?q=1#f",
      "https://ex.com/A/b",
      "http://ex.com:80",
      "https://ex.com:8080/x")
    assert(m("HTTPS://WWW.Ex.COM:443/A/b//?q=1#f")
      .getAs[String]("canon_url") === "https://ex.com/A/b")
    assert(m("https://ex.com/A/b").getAs[String]("canon_url") ===
      "https://ex.com/A/b") // distinct raw forms, one canonical form
    assert(m("http://ex.com:80").getAs[String]("canon_url") ===
      "http://ex.com/") // empty path -> /
    // :8080 is NOT a default port: a different origin survives
    assert(m("https://ex.com:8080/x").getAs[String]("canon_url") ===
      "https://ex.com:8080/x")
  }

  test("path case is preserved; host case is not") {
    val m = canon("https://Ex.com/CaseSensitive")
    assert(m("https://Ex.com/CaseSensitive").getAs[String]("canon_url") ===
      "https://ex.com/CaseSensitive")
  }

  test("registered domain is the last two host labels") {
    val m = canon("https://a.b.site.org/x")
    assert(m("https://a.b.site.org/x").getAs[String]("domain") === "site.org")
  }

  test("gate: blocklist beats dup, lowest id keeps the canonical URL") {
    val df = Seq(
      (1L, "https://www.keep.com/p"),
      (2L, "https://keep.com/p/"),      // canonical dup of 1
      (3L, "https://bad.com/p"),
      (4L, "https://sub.bad.com/q")     // registered domain still bad.com
    ).toDF("id", "url")
    val out = Corpus.urlGate(df, "id", "url", Seq("bad.com"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("reason"))
      .toMap
    assert(out(1L) === "ok")
    assert(out(2L) === "duplicate_url")
    assert(out(3L) === "blocked_domain")
    assert(out(4L) === "blocked_domain")
  }
}
