package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** HTML → text extraction: the FIRST stage of a crawl pipeline, turning
  * raw page markup into the clean `text` column every downstream corpus
  * operator (dedup, gopher rules, LM scoring, packing) consumes.
  *
  * The algorithm is the classic public-heuristic chain (the same family
  * as jusText / trafilatura / the C4 preprocessing rules, simplified to
  * a deterministic, engine-portable form):
  *
  *   1. drop comments (`<!-- … -->`), then `<script>` and `<style>`
  *      elements wholesale (their character data is code, not content);
  *   2. split into lines on `\n` (crawl HTML is line-structured enough
  *      that line granularity is the standard boilerplate unit —
  *      jusText's "block");
  *   3. per line, measure LINK DENSITY: the characters inside `<a>`
  *      elements versus the tag-stripped line. A line that is mostly
  *      anchor text is navigation/boilerplate (jusText's core rule) —
  *      drop it when 2·anchor_chars > line_chars;
  *   4. strip the remaining tags, decode the five XML entities +
  *      `&nbsp;` (amp LAST, so `&amp;lt;` decodes to the literal
  *      `&lt;` exactly once, the standard order), collapse space/tab
  *      runs, trim;
  *   5. keep non-empty lines, re-joined with `\n`.
  *
  * Every step is a regular-expression rewrite, so the DuckDB oracle can
  * re-derive the whole chain independently (regexp_replace +
  * list_filter/list_transform over string_split) and the gate compares
  * full content hashes, not just counts.
  *
  * Reference behavior modeled: etielle ingests pre-structured payloads
  * and treats unparseable content as null-path misses (fluent.py's
  * null-safe traversal); here a page with no extractable content yields
  * an empty string, never an error, and the operator is map-only — one
  * projection, no shuffle, no per-document state, so it scales to a
  * 100 TB crawl exactly like the codec seams.
  */
object TextExtract {

  private val Comments = "(?s)<!--.*?-->".r
  private val Script = "(?is)<script[^>]*>.*?</script>".r
  private val Style = "(?is)<style[^>]*>.*?</style>".r
  private val Tags = "<[^>]*>".r
  private val Anchor = java.util.regex.Pattern.compile(
    "(?is)<a[^>]*>([^<]*)</a>")
  private val SpaceRuns = "[ \t]+".r

  /** SQL-`trim` semantics (spaces only), so the Scala side and the
    * DuckDB oracle agree on edge whitespace other than ' '. */
  private def trimSpaces(s: String): String = {
    var a = 0; var z = s.length
    while (a < z && s.charAt(a) == ' ') a += 1
    while (z > a && s.charAt(z - 1) == ' ') z -= 1
    s.substring(a, z)
  }

  private def decodeEntities(s: String): String =
    s.replace("&nbsp;", " ")
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&#39;", "'")
      .replace("&amp;", "&")

  /** Extract clean text from one HTML page (see object doc for the
    * rule chain). Total function: any string in, clean text out. */
  def htmlToText(html: String): String = {
    val noScript = Style.replaceAllIn(
      Script.replaceAllIn(Comments.replaceAllIn(html, ""), ""), "")
    noScript
      .split("\n", -1)
      .iterator
      .flatMap { line =>
        val stripped = trimSpaces(Tags.replaceAllIn(line, ""))
        if (stripped.isEmpty) None
        else {
          var anchorChars = 0
          val m = Anchor.matcher(line)
          while (m.find()) anchorChars += m.group(1).length
          if (2 * anchorChars > stripped.length) None // link-dense: nav
          else {
            val clean = trimSpaces(
              SpaceRuns.replaceAllIn(decodeEntities(stripped), " "))
            if (clean.isEmpty) None else Some(clean)
          }
        }
      }
      .mkString("\n")
  }

  /** Escape a text payload for embedding INSIDE an HTML element —
    * the inverse seam the fixture builder and real page generators
    * share (amp first, the standard order). */
  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Map-only distributed extraction: (id, html) rows → (id, text,
    * n_lines, n_chars). One projection, no shuffle; the page parse is
    * per-row pure Scala on the executor, same seam as the media
    * decoders. */
  def extractHtml(pages: Dataset[(Long, String)])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    pages
      .map { case (id, html) =>
        val text = htmlToText(html)
        val nLines = if (text.isEmpty) 0L else (text.count(_ == '\n') + 1).toLong
        (id, text, nLines, text.length.toLong)
      }
      .toDF("doc_id", "text", "n_lines", "n_chars")
  }
}
