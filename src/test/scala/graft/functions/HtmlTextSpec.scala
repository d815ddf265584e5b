package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HtmlText: tag stripping, script/style/comment removal, entity
  * decoding, block structure, the link-density boilerplate filter,
  * and the expression plumbing.
  */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  test("tags strip, blocks become lines, inline tags merge") {
    val html = "<div>Hello <b>bold</b> world</div><p>Second  para</p>"
    assert(HtmlText.extract(html, mainOnly = false) ==
      "Hello bold world\nSecond para")
  }

  test("script, style, title, noscript and comments are removed") {
    val html =
      """<html><head><title>Page</title><style>p {a: b}</style>
        |<script type="text/javascript">if (1 < 2) { alert("</p>hi"); }</script>
        |</head><body><!-- note --><p>Real text</p>
        |<noscript>enable js</noscript></body></html>""".stripMargin
    assert(HtmlText.extract(html, mainOnly = false) == "Real text")
  }

  test("entities decode, including numeric and hex") {
    val html = "<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65;&#x42; &nbsp;e &unknown;</p>"
    assert(HtmlText.extract(html, mainOnly = false) ==
      "a & b <c> \"d\" AB e &unknown;")
  }

  test("decoded entities never re-parse as markup") {
    // &lt;script&gt; is literal text, not a tag
    val html = "<p>use &lt;script&gt; tags</p>"
    assert(HtmlText.extract(html, mainOnly = false) == "use <script> tags")
  }

  test("attributes containing > inside quotes do not break tag matching") {
    val html = """<p title="a > b" data-x='1 > 0'>ok</p><div data-s="x>y">more</div>"""
    assert(HtmlText.extract(html, mainOnly = false) == "ok\nmore")
  }

  test("link-density filter drops chrome blocks, keeps content") {
    val html =
      """<nav><a href="/">Home</a> <a href="/d">Docs</a></nav>
        |<p>An article paragraph with plenty of running text and one
        |<a href="/ref">reference link</a> inside it.</p>
        |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>""".stripMargin
    val main = HtmlText.extract(html, mainOnly = true)
    assert(main.startsWith("An article paragraph"))
    assert(main.contains("reference link")) // low-density link text stays
    assert(!main.contains("Home") && !main.contains("Terms"))
    // the full extraction keeps everything
    val full = HtmlText.extract(html, mainOnly = false)
    assert(full.contains("Home") && full.contains("Terms"))
  }

  test("null and malformed input") {
    assert(HtmlText.extract(null, mainOnly = false) == null)
    assert(HtmlText.extract("", mainOnly = true) == "")
    assert(HtmlText.extract("no tags at all", mainOnly = true) == "no tags at all")
    // unclosed tag at EOF: the fragment before it survives
    assert(HtmlText.extract("<p>text<div", mainOnly = false).startsWith("text"))
  }

  test("expressions extract in a distributed plan") {
    val rows = Seq(
      (1L, "<nav><a href='/'>Home</a></nav><p>Body text</p>"),
      (2L, "<p>a &amp; b</p>"))
    val both = rows.toDF("id", "html").repartition(2)
      .select(col("id"),
        HtmlText.htmlMainText(col("html")).as("m"),
        HtmlText.htmlText(col("html")).as("f"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(both(0) == ((1L, "Body text", "Home\nBody text")))
    assert(both(1) == ((2L, "a & b", "a & b")))
  }
}
