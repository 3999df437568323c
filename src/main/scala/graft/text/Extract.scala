package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — every crawl pipeline's front door
  * (the trafilatura/resiliparse stage): strip script/style/comments,
  * turn block-tag boundaries into line structure, drop boilerplate
  * lines by the classic density rules (too few words, link-dominated
  * nav/footer chrome, low alphanumeric density), and reassemble the
  * surviving lines in order. DOM-free by design: the whole pass is
  * regex/HOF column algebra in the portable Java∩RE2 subset, so it is
  * codegen'd end-to-end AND the oracle replays it in SQL.
  *
  * Malformed markup (an unterminated tag leaves a stray `<` after
  * stripping) is FLAGGED per document, never failed — the
  * [[graft.media.Multimodal]] convention.
  *
  * Scale shape: posexplode lines → row-local regex columns → one
  * groupBy(doc) whose per-group state is the document itself (the
  * [[graft.dedup.LineDedup]] reassembly) — no window, no corpus-wide
  * state; composes directly into LineDedup for cross-document
  * boilerplate and [[graft.dedup.SpanDedup]] downstream.
  */
object Extract {

  /** Block-level elements whose open/close tags become line breaks.
    * Prefix-sloppy on purpose (`p` also hits `<pre>`): boilerplate
    * segmentation, not DOM fidelity.
    */
  private val BlockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|footer|nav|blockquote"

  /** One row per input document: `idCol`, `body_text` (kept lines
    * joined with \n, order preserved), `n_kept`, `n_dropped`,
    * `n_links`, `malformed` (0/1). A line is kept when it has at least
    * `minWords` words, is not link-dominated (words ≥ `linkWordFactor`
    * × its pre-strip `<a` count — the nav/footer rule), and at least
    * `minAlphaFrac` of its characters are alphanumeric (kills "Home |
    * About | Contact" separator rows even without links).
    */
  def fromHtml(
      df: DataFrame,
      htmlCol: String,
      idCol: String,
      minWords: Int = 3,
      linkWordFactor: Int = 4,
      minAlphaFrac: Double = 0.5): DataFrame = {
    // document-level strips: script/style bodies, comments, then block
    // boundaries -> \n (all in the Java∩RE2 regex subset, global)
    val t4 = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(col(htmlCol),
            "(?is)<script[^>]*>.*?</script[^>]*>", " "),
          "(?is)<style[^>]*>.*?</style[^>]*>", " "),
        "(?s)<!--.*?-->", " "),
      s"(?i)</?($BlockTags)[^>]*>", "\n")

    val lines = df.select(
      col(idCol),
      posexplode(split(t4, "\n")).as(Seq("__pos", "__raw")))

    // link census BEFORE inline tags are stripped
    val nLinks = regexp_count(col("__raw"), lit("(?i)<a[ \t>]"))
    // strip remaining (inline) tags, squeeze whitespace
    val s1 = trim(regexp_replace(
      regexp_replace(col("__raw"), "<[^>]*>", " "), "[ \t]+", " "))
    // a '<' surviving the strip = unterminated tag = malformed markup
    // (checked BEFORE entity decoding reintroduces legitimate '<')
    val mal = when(instr(s1, "<") > 0, 1L).otherwise(0L)
    // minimal entity decode (&amp; LAST so &amp;lt; -> &lt;, not <)
    val dec = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(s1, "&nbsp;", " "),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    val dec2 = trim(regexp_replace(dec, " +", " "))

    val enriched = lines
      .withColumn("__nl", nLinks.cast("long"))
      .withColumn("__mal", mal)
      .withColumn("__line", dec2)
      .withColumn("__words",
        when(col("__line") === "", 0).otherwise(size(split(col("__line"), " "))).cast("long"))
      .withColumn("__alpha",
        length(regexp_replace(col("__line"), "[^A-Za-z0-9]", "")).cast("long"))
    val keep = col("__words") >= minWords &&
      (col("__nl") === 0L || col("__words") >= lit(linkWordFactor.toLong) * col("__nl")) &&
      col("__alpha").cast("double") / length(col("__line")).cast("double") >= minAlphaFrac

    enriched
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(keep, struct(col("__pos"), col("__line"))))),
            s => s("__line")),
          "\n").as("body_text"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, 0L).otherwise(1L)).as("n_dropped"),
        sum(col("__nl")).as("n_links"),
        max(col("__mal")).as("malformed"))
  }

  /** The same extraction as ONE row-local projection — the whole line
    * pipeline as HOF array algebra (split → transform → filter →
    * array_join) with no posexplode and no groupBy, so it runs inside a
    * STREAM with zero state (see
    * [[graft.streaming.DocStream.extractGateStream]]). Output schema ≡
    * [[fromHtml]]; ExtractSpec pins row-for-row parity.
    */
  def fromHtmlRowLocal(
      df: DataFrame,
      htmlCol: String,
      idCol: String,
      minWords: Int = 3,
      linkWordFactor: Int = 4,
      minAlphaFrac: Double = 0.5): DataFrame = {
    val t4 = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(col(htmlCol),
            "(?is)<script[^>]*>.*?</script[^>]*>", " "),
          "(?is)<style[^>]*>.*?</style[^>]*>", " "),
        "(?s)<!--.*?-->", " "),
      s"(?i)</?($BlockTags)[^>]*>", "\n")
    def lineStruct(raw: Column): Column = {
      val nl = regexp_count(raw, lit("(?i)<a[ \t>]")).cast("long")
      val s1 = trim(regexp_replace(regexp_replace(raw, "<[^>]*>", " "), "[ \t]+", " "))
      val mal = when(instr(s1, "<") > 0, 1L).otherwise(0L)
      val dec = regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(s1, "&nbsp;", " "),
                "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&amp;", "&")
      val dec2 = trim(regexp_replace(dec, " +", " "))
      struct(dec2.as("line"), nl.as("nl"), mal.as("mal"))
    }
    val enriched = transform(split(t4, "\n"), lineStruct _)
    val keptOf = filter(enriched, s =>
      keepLine(s("line"), s("nl"), minWords, linkWordFactor, minAlphaFrac))
    df.withColumn("__lines", enriched)
      .withColumn("__kept", keptOf)
      .withColumn("body_text",
        array_join(transform(col("__kept"), s => s("line")), "\n"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("n_dropped", (size(col("__lines")) - size(col("__kept"))).cast("long"))
      .withColumn("n_links",
        aggregate(col("__lines"), lit(0L), (acc, s) => acc + s("nl")))
      .withColumn("malformed",
        aggregate(col("__lines"), lit(0L), (acc, s) => greatest(acc, s("mal"))))
      .drop("__lines", "__kept")
  }

  /** The keep-rule as a standalone Column over (line, nLinks) — exposed
    * for composition tests.
    */
  private[text] def keepLine(
      line: Column,
      nLinks: Column,
      minWords: Int,
      linkWordFactor: Int,
      minAlphaFrac: Double): Column = {
    val words = when(line === "", 0).otherwise(size(split(line, " "))).cast("long")
    val alpha = length(regexp_replace(line, "[^A-Za-z0-9]", "")).cast("long")
    words >= minWords &&
      (nLinks === 0L || words >= lit(linkWordFactor.toLong) * nLinks) &&
      alpha.cast("double") / length(line).cast("double") >= minAlphaFrac
  }
}
