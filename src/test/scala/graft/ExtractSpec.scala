package graft

import org.apache.spark.sql.functions._

import graft.llm.Extract

/** [[graft.llm.Extract.mainContent]] — deterministic HTML main-content
  * extraction: hand-derived pages, the link-density boundary, entity
  * decode order, and the malformed-HTML degradation direction (keep
  * chrome, never drop content). */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, density: Double = 0.5): (String, Long, Long) = {
    val r = Extract.mainContent(Seq((0L, html)).toDF("doc_id", "html"),
      maxLinkDensity = density).collect()(0)
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("hand-derived page: chrome drops, content survives in order") {
    val html =
      "<html><head><title>T</title><style>p{}</style>" +
        "<script>if(a<b){x()}</script></head><body>" +
        "<nav><a href='/'>Home</a> | <a href='/a'>About</a></nav>" +
        "<h1>Title Here</h1>" +
        "<p>First paragraph with enough words to matter.</p>" +
        "<p>Second one, with a single <a href='/r'>link</a> inside.</p>" +
        "<div><a href='/c'>Terms</a> <a href='/d'>Privacy</a></div>" +
        "<!-- comment --></body></html>"
    val (text, kept, dropped) = extract(html)
    assert(text == "Title Here\nFirst paragraph with enough words to matter." +
      "\nSecond one, with a single link inside.")
    assert(kept == 3L && dropped > 0L)
  }

  test("link-density boundary: exactly half links keeps; over half drops") {
    // visible "aaaa bbbb" (9), anchor "aaaa" (4): 4 <= 4.5 → kept
    val (t1, k1, _) = extract("<p><a href='/'>aaaa</a> bbbb</p>")
    assert(t1 == "aaaa bbbb" && k1 == 1L)
    // visible "aaaaaa bbb" (10), anchor "aaaaaa" (6): 6 > 5 → dropped
    val (t2, k2, _) = extract("<p><a href='/'>aaaaaa</a> bbb</p>")
    assert(t2 == "" && k2 == 0L)
    // density 1.0 keeps even pure-link lines
    val (t3, k3, _) = extract("<p><a href='/'>only links</a></p>", density = 1.0)
    assert(t3 == "only links" && k3 == 1L)
  }

  test("entities decode once, &amp; last; nested anchor tags count as link text") {
    val (t, _, _) = extract("<p>a &amp;lt; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>")
    assert(t == "a &lt; b <tag> \"q\" 's' x y")
    // <a><b>bold</b></a>: inner tags stripped before measuring link text
    val (t2, k2, _) = extract("<p><a href='/'><b>12345678</b></a> abc</p>")
    assert(t2 == "" && k2 == 0L) // 8 link chars vs 12 visible → dropped
  }

  test("malformed HTML degrades toward keeping: unclosed tags never eat content") {
    // unclosed <p and stray > — the tag regex consumes only <...>, text rides
    val (t, _, _) = extract("<p>good text<div>more > text")
    assert(t.contains("good text") && t.contains("more > text"))
    // an unclosed <a swallows to the next '>', not the document
    val (t2, _, _) = extract("<p>before <a href='/x broken text</p><p>after paragraph here</p>")
    assert(t2.contains("after paragraph here"))
  }

  test("line structure: literal newlines and block tags both split; empty lines drop") {
    val (t, kept, _) = extract("<p>one</p>\n\n<p>two\nthree</p>")
    assert(t == "one\ntwo\nthree" && kept == 3L)
  }

  test("title: read from raw head, tags stripped, entities decoded, missing = ''") {
    val pages = Seq(
      (0L, "<html><head><title>A &amp; B <b>Guide</b>\n  2024</title>" +
        "<style>t{}</style></head><body><p>x</p></body></html>"),
      (1L, "<html><head></head><body>no title</body></html>"),
      (2L, "<HTML><HEAD><TITLE lang='en'>Upper Case</TITLE></HEAD></HTML>"))
      .toDF("doc_id", "html")
    val t = Extract.title(pages).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t(0L) == "A & B Guide 2024") // tags out, ws squeezed, &amp; last
    assert(t(1L) == "")                 // no tag → the no-match convention
    assert(t(2L) == "Upper Case")       // (?is): case + attr tolerated
  }

  test("mainContentRow ≡ mainContent row-for-row on adversarial pages and real text") {
    // every fixture class the other tests exercise, plus real corpus text
    // wrapped in gate-style chrome — the zero-shuffle HOF twin must agree
    // on text AND counts everywhere
    val fixtures = Seq(
      "<html><head><script>if(a<b){x()}</script></head><body>" +
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
        "<p>Real content with words.</p><!-- c --></body></html>",
      "<p><a href='/'>aaaa</a> bbbb</p>",
      "<p><a href='/'>aaaaaa</a> bbb</p>",
      "<p>a &amp;lt; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>",
      "<p>good text<div>more > text",
      "<p>one</p>\n\n<p>two\nthree</p>",
      "")
    val fixed = fixtures.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id") + 1000L as "doc_id", concat(
        lit("<html><body><nav><a href='/'>Home</a></nav><p>"),
        col("text"), lit("</p></body></html>")).as("html"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    for (docs <- Seq(fixed, real); d <- Seq(0.5, 1.0)) {
      assert(rows(Extract.mainContentRow(docs, maxLinkDensity = d)) ==
        rows(Extract.mainContent(docs, maxLinkDensity = d)))
    }
    // NULL html: absent from BOTH (filtered here, lost to the groupBy there)
    val withNull = Seq((0L, null.asInstanceOf[String]), (1L, "<p>ok</p>"))
      .toDF("doc_id", "html")
    assert(Extract.mainContentRow(withNull).count() == 1L &&
      Extract.mainContent(withNull).count() == 1L)
  }
}
