package graft.text

import graft.SparkSpec

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String) = {
    val r = Extract.fromHtml(Seq((1L, html)).toDF("doc_id", "html"), "html", "doc_id")
      .collect().head
    (r.getAs[String]("body_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"),
      r.getAs[Long]("n_links"), r.getAs[Long]("malformed"))
  }

  test("nav chrome and footer are removed, body text survives intact") {
    val html =
      """<html><head><title>T</title><style>body{color:red;}</style>
        |<script type="text/javascript">var x = "<p>not text</p>";</script></head>
        |<body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
        |<p>The quick brown fox jumps over the lazy dog near the river bank.</p>
        |<p>A second real paragraph with enough words to clearly pass the filter.</p>
        |<!-- tracking pixel comment -->
        |<div class="footer"><a href="/p">Privacy</a> | <a href="/t">Terms</a></div>
        |</body></html>""".stripMargin.replace("\n", "")
    val (body, kept, _, links, mal) = one(html)
    assert(body ==
      "The quick brown fox jumps over the lazy dog near the river bank." +
        "\nA second real paragraph with enough words to clearly pass the filter.")
    assert(kept == 2L)
    assert(links == 5L)
    assert(mal == 0L)
  }

  test("script/style bodies never leak, even when they contain markup-ish text") {
    val (body, _, _, _, _) = one(
      "<style>.a{content:'hello world wide web today'}</style>" +
        "<script>var s = 'seven words of fake script payload here';</script>" +
        "<p>Only this sentence should remain in the output text.</p>")
    assert(body == "Only this sentence should remain in the output text.")
  }

  test("entities decode after stripping; &amp; decodes last") {
    val (body, _, _, _, mal) = one(
      "<p>Fish &amp; Chips &lt;test&gt; cost &quot;ten&quot; pounds &#39;cash&#39; today</p>")
    assert(body == "Fish & Chips <test> cost \"ten\" pounds 'cash' today")
    assert(mal == 0L, "decoded entities must NOT trip the malformed flag")
  }

  test("low-alphanumeric separator rows drop without any links") {
    val (body, kept, dropped, _, _) = one(
      "<p>============ * * * ============</p>" +
        "<p>Real content sentence with plenty of ordinary words inside it.</p>")
    assert(body == "Real content sentence with plenty of ordinary words inside it.")
    assert(kept == 1L && dropped >= 1L)
  }

  test("unterminated tag is flagged malformed, not failed; other docs unaffected") {
    val df = Seq(
      (1L, "<p>Good document body with a full sentence of words.</p>"),
      (2L, "<p>Broken document body with a full sentence of words.</p><div class=")
    ).toDF("doc_id", "html")
    val rows = Extract.fromHtml(df, "html", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("malformed"), r.getAs[String]("body_text")))).toMap
    assert(rows(1L)._1 == 0L)
    assert(rows(2L)._1 == 1L)
    assert(rows(1L)._2 == "Good document body with a full sentence of words.")
    // the broken doc still yields its body text (with the stray fragment)
    assert(rows(2L)._2.startsWith("Broken document body"))
  }

  test("fully-boilerplate documents yield empty body_text, not null") {
    val (body, kept, _, _, _) = one(
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>")
    assert(body == "")
    assert(kept == 0L)
  }

  test("fromHtmlRowLocal (the streaming variant) matches fromHtml row-for-row") {
    val docs = Seq(
      (1L, "<html><style>x{}</style><body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
        "<p>Real paragraph body with plenty of ordinary words in it.</p>" +
        "<p>Fish &amp; Chips &lt;menu&gt; special price today only here</p>" +
        "<!-- c --><div class='f'><a href='p'>P</a> | <a href='t'>T</a></div></body></html>"),
      (2L, "<p>Short.</p>"),
      (3L, "<p>Broken doc body with a full sentence of words right here.</p><div class="),
      (4L, "not html at all just some plain words sitting here quietly")
    ).toDF("doc_id", "html")
    val a = Extract.fromHtml(docs, "html", "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Extract.fromHtmlRowLocal(docs, "html", "doc_id")
      .select("doc_id", "body_text", "n_kept", "n_dropped", "n_links", "malformed")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("composes into LineDedup: shared chrome line removed corpus-wide") {
    val mk = (i: Long) =>
      (i, s"<p>Subscribe to our newsletter for updates every single week.</p>" +
        s"<p>Unique content number $i with several distinct meaningful words here.</p>")
    val cleaned = Extract.fromHtml((1L to 5L).map(mk).toDF("doc_id", "html"), "html", "doc_id")
    val deduped = graft.dedup.LineDedup.clean(cleaned, "body_text", "doc_id")
    val byId = deduped.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    // the shared subscribe line survives only in the keeper (doc 1)
    assert(byId(1L).contains("Subscribe"))
    (2L to 5L).foreach(i => assert(!byId(i).contains("Subscribe"), s"doc $i"))
    (1L to 5L).foreach(i => assert(byId(i).contains(s"Unique content number $i")))
  }
}
