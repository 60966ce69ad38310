package graft

import org.apache.spark.sql.functions._
import graft.text.Html

/** HTML → text extraction: tag/block stripping, entity decode order,
  * link extraction, null/absent handling, fail-closed malformed HTML. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String) = Html.extractAll(
    Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html").head()

  test("script/style/comment blocks vanish; tags become spaces; " +
       "whitespace collapses") {
    val r = one("""<html><head><style>p { x: 1 }</style></head>
      <body><script>if (a < b) { alert("hi") }</script>
      <h1>Head</h1><!-- gone --><p>one</p><p>two</p></body></html>""")
    assert(r.getString(2) == "Head one two")
  }

  test("entities decode with &amp; LAST: &amp;lt; yields the literal " +
       "&lt;, never <") {
    val r = one("<p>5 &lt; 7 &amp;&amp; x &gt; 2, &quot;q&quot; " +
      "&#39;a&#39;&nbsp;end &amp;lt;</p>")
    assert(r.getString(2) == "5 < 7 && x > 2, \"q\" 'a' end &lt;")
  }

  test("title extracted and decoded; absent title is empty") {
    assert(one("<title>A &amp; B</title><p>x</p>").getString(1) == "A & B")
    assert(one("<p>x</p>").getString(1) == "")
  }

  test("links in document order; count matches") {
    val r = one("""<a href="https://a.com/1">a</a>text
      <a class="c" href="/rel?q=2">b</a>""")
    assert(r.getSeq[String](3) == Seq("https://a.com/1", "/rel?q=2"))
    assert(r.getLong(4) == 2L)
    // attribute names merely ENDING in href can't hijack the capture
    val d = one("""<a data-href="/tracker" href="/real">x</a>
      <a data-href="/only">y</a>""")
    assert(d.getSeq[String](3) == Seq("/real"), d.getSeq[String](3))
  }

  private def boiler(html: String) =
    Seq((1L, html)).toDF("doc_id", "html")
      .select(Html.dropBoilerplate(org.apache.spark.sql.functions
        .col("html")).as("p"))
      .select("p.clean_text", "p.n_blocks", "p.n_kept").head()

  test("dropBoilerplate: nav and link rows drop on density, short " +
       "blocks on word count, content survives") {
    val r = boiler(
      """<html><body>
        <nav><a href="/">Home page</a> <a href="/a">About the site</a>
        <a href="/c">Contact and imprint</a></nav>
        <p>This article body has plenty of genuine prose words to keep
        around for training purposes.</p>
        <div>Copyright 2026 Corp</div>
        <p>Read more: <a href="/n">the next related article in the
        series</a></p></body></html>""")
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L,
      s"blocks=${r.getLong(1)} kept=${r.getLong(2)}: ${r.getString(0)}")
    assert(r.getString(0).startsWith("This article body has plenty"))
    assert(!r.getString(0).contains("Home page") &&
      !r.getString(0).contains("Copyright") &&
      !r.getString(0).contains("Read more"))
  }

  test("dropBoilerplate: density boundary is inclusive; a mostly-prose " +
       "block with one short link is kept") {
    val r = boiler("<p>a genuine paragraph of useful words with " +
      """<a href="/x">one link</a> inside it that should stay</p>""")
    assert(r.getLong(2) == 1L && r.getString(0).contains("one link"))
  }

  test("dropBoilerplate: unclosed anchor fails OPEN (prose is never " +
       "deleted on a parse ambiguity); script blocks never count as " +
       "blocks") {
    val r = boiler("""<script>var x = 1;</script><p>five or more real
      words here <a href="/x">with an unterminated anchor</p>""")
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getString(0).contains("unterminated anchor"))
    // null html → null struct
    val n = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "html")
      .select(Html.dropBoilerplate(org.apache.spark.sql.functions
        .col("html")).as("p")).head()
    assert(n.isNullAt(0))
  }

  test("metaRobotsNoindex: any attribute order/quoting trips; noindex " +
       "in a NON-robots tag or a robots index tag does not") {
    def f(h: String) = Seq((1L, h)).toDF("id", "h")
      .select(Html.metaRobotsNoindex(
        org.apache.spark.sql.functions.col("h"))).head().getBoolean(0)
    assert(f("""<meta name="robots" content="noindex, nofollow">"""))
    assert(f("""<meta content='noindex' name='robots'>"""))
    assert(f("""<meta name=robots content=noindex>"""))
    assert(f("""<META NAME="ROBOTS" CONTENT="NOINDEX">"""))
    assert(!f("""<meta name="robots" content="index, follow">"""))
    assert(!f("""<meta name="description" content="noindex appears">"""))
    assert(!f("""<p>robots noindex</p>"""))
    // attribute-boundary negatives: data-name/data-content must not
    // count as name/content, and noindexING is not the noindex token
    assert(!f("""<meta data-name="robots" data-content="noindex">"""))
    assert(!f("""<meta name="robots" content="noindexing disabled">"""))
    assert(!f("""<meta name="robots" content="foonoindex">"""))
    // two tags: the conditions must hold within ONE tag
    assert(!f("""<meta name="robots" content="index">
                 <meta name="keywords" content="noindex">"""))
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "h")
      .select(Html.metaRobotsNoindex(
        org.apache.spark.sql.functions.col("h"))).head()
    assert(n.isNullAt(0))
  }

  test("null html stays null; unclosed <script> fails closed (swallows " +
       "to end of document, never leaks script text)") {
    val n = Html.extractAll(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "html"),
      "doc_id", "html").head()
    assert(n.isNullAt(1) && n.isNullAt(2) && n.isNullAt(3) && n.isNullAt(4))
    val r = one("<p>keep</p><script>var secret = 1;")
    assert(r.getString(2) == "keep")
  }
}
