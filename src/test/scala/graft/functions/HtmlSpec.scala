package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlSpec extends SparkSpec {

  private def one(html: String): (String, String, Int) = {
    val s = spark
    import s.implicits._
    val r = Seq(html).toDF("h")
      .select(Text.stripHtml(col("h")).as("c"),
        Text.htmlTitle(col("h")).as("t"),
        Text.htmlLinkCount(col("h")).as("n"))
      .collect()(0)
    (r.getString(0), r.getString(1), r.getInt(2))
  }

  test("stripHtml drops script/style/comments, strips tags, decodes entities, collapses ws") {
    val (c, t, n) = one(
      """<html><head><title> My Page </title><style>p{x:1}</style></head>
        |<body><script>if (a &lt; b) { x(); }</script><!-- note
        |spanning lines --><p>Hello   &amp;   world &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>
        |<a href="http://x">one</a> and <A HREF='y'>two</A></body></html>""".stripMargin)
    assert(c === "Hello & world <tag> \"q\" 's' one and two")
    assert(t === "My Page")
    assert(n === 2)
  }

  test("stripHtml decodes &amp;lt; to literal &lt; (amp last)") {
    val (c, _, _) = one("<p>a &amp;lt; b</p>")
    assert(c === "a &lt; b")
  }

  test("no-title and no-link documents return empty string and zero") {
    val (c, t, n) = one("plain text, no markup")
    assert(c === "plain text, no markup" && t === "" && n === 0)
  }

  test("unclosed script swallows to end of string (non-greedy needs a closer)") {
    // an unclosed <script> leaves its body: the non-greedy .*?</script>
    // finds no closer, so the SCRIPT rule doesn't fire and the generic
    // tag rule strips just the tags — deterministic, same in RE2
    val (c, _, _) = one("<p>keep</p><script>var x;")
    assert(c === "keep var x;")
  }
}
