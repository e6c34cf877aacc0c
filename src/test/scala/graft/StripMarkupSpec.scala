package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Markup stripping: block removal, tag stripping, entity decode order,
  * whitespace collapse — each pinned on hand-written HTML. */
class StripMarkupSpec extends SparkSuite {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextFunctions.stripMarkup(col("h")))
      .collect().head.getString(0)

  test("script/style/comment blocks vanish wholesale, tags strip") {
    val html = """<html><head><title>T</title>
      |<style>body { margin: 0 }</style>
      |<script>if (1 < 2) { alert("</p>"); }</script></head>
      |<body><!-- hidden --><p>Hello <b>world</b></p></body></html>"""
      .stripMargin
    assert(strip(html) === "T Hello world")
  }

  test("entities decode once, &amp; last") {
    assert(strip("<p>Q&amp;A: 1 &lt; 2 &gt; 0 &quot;x&quot; &#39;y&#39;</p>")
      === "Q&A: 1 < 2 > 0 \"x\" 'y'")
    // &amp;lt; is a LITERAL '&lt;' — must not double-decode to '<'
    assert(strip("a &amp;lt; b") === "a &lt; b")
  }

  test("unclosed script removes nothing downstream; bare text passes") {
    // no </script>: the lazy block pattern can't match, the tag strip
    // still removes <script> itself
    assert(strip("<script>var x = 1; no close") === "var x = 1; no close")
    assert(strip("plain   text\n\nwith\tspace") === "plain text with space")
  }

  test("multiple blocks and attribute-bearing tags") {
    val html = "<script a=\"1\">x</script>mid<script b='2'>y</script>" +
      "<a href=\"http://e\">link</a>"
    assert(strip(html) === "mid link")
  }
}
