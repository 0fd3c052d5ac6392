package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TextExtractSpec extends AnyFunSuite {
  import TextExtract.htmlToText

  test("strips script/style/comments wholesale, case-insensitively") {
    val html = "<SCRIPT>if (a < b) { x(); }</SCRIPT>body text here\n" +
      "<Style media=\"all\">p > a { }</Style>more body\n" +
      "<!-- multi\nline\ncomment -->tail"
    assert(htmlToText(html) === "body text here\nmore body\ntail")
  }

  test("link-dense lines drop; mixed lines survive") {
    val nav = """<a href="/">Home</a> <a href="/x">Next</a>"""
    val mixed = """Read the full report at <a href="/r">report</a> today"""
    assert(htmlToText(nav) === "")
    assert(htmlToText(mixed) === "Read the full report at report today")
    // exactly half anchor chars is KEPT (rule is strict >)
    assert(htmlToText("<a href=\"/\">abcd</a> abc") === "abcd abc")
  }

  test("entities decode once, amp last; whitespace collapses") {
    assert(htmlToText("A &amp;lt; B") === "A &lt; B")
    assert(htmlToText("x&nbsp;&nbsp;y   z\t w") === "x y z w")
    assert(htmlToText("&quot;q&quot; &#39;s&#39; 1 &lt; 2 &gt; 0") ===
      "\"q\" 's' 1 < 2 > 0")
  }

  test("whitespace-only and entity-to-whitespace lines are dropped") {
    assert(htmlToText("<p>  </p>\n&nbsp;\nreal") === "real")
  }

  test("total function on hostile markup, never throws") {
    assert(htmlToText("") === "")
    // no closing '>': not a tag — survives as text (HTML5 tokenizers
    // likewise emit an unterminated '<' at EOF as character data)
    assert(htmlToText("<unclosed") === "<unclosed")
    assert(htmlToText("<script>never closed\nstill code") ===
      "never closed\nstill code") // no </script>: not an element, text
    assert(htmlToText("plain no markup") === "plain no markup")
  }

  test("escape/extract roundtrip preserves payload text") {
    val payload = "5 < 6 & \"seven\" > 'four'"
    // quote/apostrophe are legal inside element text; only & < > escape
    val page = s"<p>${TextExtract.escapeHtml(payload)}</p>"
    assert(htmlToText(page) === payload)
  }
}
