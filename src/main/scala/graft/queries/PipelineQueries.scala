package graft.queries

import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Exact, MinHashLsh, NGramJaccard, SimHash}
import graft.media.Multimodal
import graft.sim.{AnnIvf, AnnLsh, Cosine}
import graft.streaming.EventOps
import graft.text.{Fingerprint, LangId, Redact, TextStats}
import graft.util.Tables

/** LLM-data-pipeline operator coverage (SURVEY.md §2 P/T/S/X rows). */
object PipelineQueries {

  // ---- P1: exact dedup --------------------------------------------------

  val q20 = Q(
    "q20_dedup_exact",
    (s, dir) => Exact.dedupGroups(Tables.documents(s, dir), "text", "doc_id"),
    Some(
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin
    )
  )

  // ---- P2: MinHash LSH near-duplicate pairs (oracle) ---------------------
  // FULLY oracle-checked approximate dedup: the oracle replays the exact
  // minhash signatures (shared 60-bit md5 gram hash; identical affine-
  // permutation constants interpolated below; all arithmetic < 2^62 so
  // BIGINT suffices in both engines) and declares a candidate where ANY
  // band's 4-lane signature slice is equal — the semantics the Spark
  // side implements with band-bucket hashing (bucket-hash collisions
  // without slice equality are ~2^-64, deterministic, and absent at this
  // sf). Production keeps the faster xxhash64 gram hash (same trade as
  // q22/q30, SURVEY §8b).
  private val mhCoefs = MinHashLsh.coefficients(64, 42L)

  val q21 = Q(
    "q21_minhash_pairs",
    (s, dir) =>
      MinHashLsh
        .nearDuplicates(
          Tables.documents(s, dir),
          "text",
          "doc_id",
          threshold = 0.05,
          gramHash = graft.functions.SharedHash.md5Long60),
    Some(
      s"""WITH consts AS (SELECT ${mhCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${mhCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') AS g
         |       FROM toks, UNNEST(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
         |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text, ' ')) < 3),
         |grams AS (SELECT DISTINCT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("g")} AS sh
         |  FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |hl AS (SELECT doc_id, list(sh % 2147483647) AS hs, list(sh) AS ss FROM grams GROUP BY doc_id),
         |sig AS (SELECT doc_id, ss,
         |    list_transform(range(64), i ->
         |      list_min(list_transform(hs, h -> (ca[i + 1] * h + cb[i + 1]) % 2147483647))) AS s
         |  FROM hl CROSS JOIN consts),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ss AS sa, b.ss AS sb
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(16), bb ->
         |    list_slice(a.s, bb * 4 + 1, bb * 4 + 4) = list_slice(b.s, bb * 4 + 1, bb * 4 + 4))) > 0),
         |j AS (SELECT id_a, id_b,
         |    round(len(list_filter(sa, x -> list_contains(sb, x)))::DOUBLE /
         |      (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))), 4) AS jaccard
         |  FROM cand)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.05""".stripMargin
    )
  )

  // ---- P3: SimHash fingerprints (oracle via shared md5-derived hash) -----
  // The custom SimHashAgg aggregate is exercised end to end; the token
  // hash is the 60-bit md5 prefix BOTH engines can compute (DuckDB has
  // no xxhash64 — production default stays xxhash64, see SimHash).
  // Bits 60..63 of a 60-bit hash are always 0, so their vote sums are
  // strictly negative and the oracle only needs bits 0..59.

  private val simhashOracle: String = {
    val hash = graft.functions.SharedHash.md5Long60Sql("tok")
    val sums = (0 until 60)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val fold = (0 until 60).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |h AS (SELECT doc_id, $hash AS h FROM t),
       |v AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
       |SELECT doc_id, $fold AS simhash FROM v""".stripMargin
  }

  val q22 = Q(
    "q22_simhash",
    (s, dir) =>
      SimHash.fingerprintsWith(
        Tables.documents(s, dir), "text", "doc_id", graft.functions.SharedHash.md5Long60),
    Some(simhashOracle)
  )

  // ---- P4: exact n-gram Jaccard join (oracle via list algebra) ----------

  val q23 = Q(
    "q23_ngram_jaccard",
    (s, dir) =>
      NGramJaccard
        .similarityJoin(Tables.documents(s, dir), "text", "doc_id", "source", n = 2)
        .where(col("jaccard") > 0.0),
    Some(
      """WITH t AS (
        |  SELECT source AS block, doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS ngrams
        |  FROM documents)
        |SELECT a.block, a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))::DOUBLE /
        |    (len(a.ngrams) + len(b.ngrams) - len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))), 4) AS jaccard
        |FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g))) > 0""".stripMargin
    )
  )

  // ---- P5: embedding cosine near-dup pairs (oracle) ----------------------

  val q24 = Q(
    "q24_embed_neardup",
    (s, dir) =>
      Cosine.nearDupPairs(
        Tables.embeddings(s, dir).where(col("vec_id") < 500),
        "vec_id",
        "embedding",
        threshold = 0.35
      ),
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
        |  FROM embeddings WHERE vec_id < 500),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v*b.v) AS dot
        |      FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot/(na.nrm*nb.nrm), 4) AS cos_sim
        |FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        |WHERE dot/(na.nrm*nb.nrm) >= 0.35""".stripMargin
    )
  )

  // ---- P6: brute-force cosine top-k (oracle) -----------------------------

  val q25 = Q(
    "q25_cosine_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Cosine.topK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
    },
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
        |      FROM f a JOIN f b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |      GROUP BY 1, 2),
        |c AS (SELECT qid, nid, dot/(na.nrm*nb.nrm) AS cos FROM d
        |      JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid),
        |r AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk FROM c)
        |SELECT qid, nid, round(cos, 4) AS cos_sim FROM r WHERE rk <= 5""".stripMargin
    )
  )

  // ---- P7: LSH ANN (rows+spec: recall vs brute force) --------------------

  val q26 = Q(
    "q26_ann_lsh",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      AnnLsh.topK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", dims = 64, k = 5)
    },
    None
  )

  // ---- T1: token stats (oracle) ------------------------------------------

  val q27 = Q(
    "q27_token_stats",
    (s, dir) =>
      TextStats
        .withTokenStats(Tables.documents(s, dir), "text")
        .select(
          col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_uniq_tokens").cast("long").as("n_uniq_tokens"),
          col("n_chars_obs").cast("long").as("n_chars_obs"),
          col("avg_token_len"),
          col("est_bpe_tokens"),
          col("n_bpe_regex").cast("long").as("n_bpe_regex")
        ),
    Some(
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
        |  len(text) AS n_chars_obs,
        |  round(len(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')), 4) AS avg_token_len,
        |  ceil(len(text)::DOUBLE / 4.0)::BIGINT AS est_bpe_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_regex
        |FROM documents""".stripMargin
    )
  )

  // ---- T2: quality score (oracle) ----------------------------------------

  val q28 = Q(
    "q28_quality",
    (s, dir) =>
      TextStats
        .withQuality(Tables.documents(s, dir), "text")
        .select(
          col("doc_id"), col("stop_frac"), col("uniq_frac"), col("punct_frac"), col("quality")),
    Some(
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    len(toks)::DOUBLE AS n,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in'], tk)))::DOUBLE AS stops,
        |    len(list_distinct(toks))::DOUBLE AS uniq,
        |    len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE AS punct,
        |    len(replace(text, ' ', ''))::DOUBLE AS nonspace
        |  FROM t)
        |SELECT doc_id,
        |  round(stops/n, 4) AS stop_frac,
        |  round(uniq/n, 4) AS uniq_frac,
        |  round(punct/nonspace, 4) AS punct_frac,
        |  round(least(n/100.0, 1.0)*0.4 + (1.0 - stops/n)*0.3 + (uniq/n)*0.3, 4) AS quality
        |FROM f""".stripMargin
    )
  )

  // ---- T3: language ID (oracle) ------------------------------------------

  val q29 = Q(
    "q29_lang_id",
    (s, dir) =>
      LangId
        .withLangId(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("pred_lang")),
    Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is'], tk))) AS h_en,
        |    len(list_filter(toks, tk -> list_contains(['el','la','de','que','y'], tk))) AS h_es,
        |    len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist'], tk))) AS h_de,
        |    len(list_filter(toks, tk -> list_contains(['le','les','une','et','est'], tk))) AS h_fr,
        |    len(list_filter(toks, tk -> list_contains(['的','是','在','了','我'], tk))) AS h_zh
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN greatest(h_en, h_es, h_de, h_fr, h_zh) = 0 THEN 'und'
        |       WHEN h_en = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'en'
        |       WHEN h_es = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'es'
        |       WHEN h_de = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'de'
        |       WHEN h_fr = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM h""".stripMargin
    )
  )

  // ---- T4: document fingerprint (oracle via shared md5-derived hash) -----
  // Same rolling polynomial mod 2^31−1 on both engines: DuckDB folds
  // with list_reduce, Spark with the codegen'd `aggregate` HOF.

  val q30 = Q(
    "q30_fingerprint",
    (s, dir) =>
      Fingerprint
        .withFingerprintWith(
          Tables.documents(s, dir), "text", graft.functions.SharedHash.md5Long60)
        .select(col("doc_id"), col("fingerprint")),
    Some(
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(0::BIGINT,
         |      list_transform(string_split(text, ' '),
         |        tok -> ${graft.functions.SharedHash.md5Long60Sql("tok")} % 2147483647)),
         |    (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fingerprint
         |FROM documents""".stripMargin
    )
  )

  // ---- T5: corpus vocabulary stats (oracle) ------------------------------

  val q45 = Q(
    "q45_vocab_top",
    (s, dir) =>
      graft.text.Vocab.top(Tables.documents(s, dir), "text", "doc_id", k = 50),
    Some(
      """WITH v AS (
        |  SELECT tok AS token, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok)
        |SELECT token, term_freq, doc_freq FROM v
        |ORDER BY term_freq DESC, token LIMIT 50""".stripMargin
    )
  )

  // ---- T6: deterministic train/val/test split (oracle) -------------------
  // Assignment is a pure function of (salt, doc_id) via the shared
  // md5-60bit hash, so DuckDB reproduces it bit-for-bit — the property
  // that makes the split trustworthy at 100 TB.

  val q46 = Q(
    "q46_split",
    (s, dir) =>
      graft.ops.Sampling
        .deterministicSplit(Tables.documents(s, dir), "doc_id")
        .select(col("doc_id"), col("split")),
    Some(
      s"""SELECT doc_id,
         |  CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("'graft:' || doc_id::VARCHAR")} % 10000 AS b
         |  FROM documents)""".stripMargin
    )
  )

  // ---- S1: tumbling-window event aggregate (oracle) ----------------------

  val q31 = Q(
    "q31_events_window",
    (s, dir) => EventOps.hourlyAgg(Tables.events(s, dir)),
    Some(
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS ws, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
    )
  )

  // ---- S2: sessionization (oracle) ---------------------------------------

  val q32 = Q(
    "q32_sessionize",
    (s, dir) => EventOps.sessionize(Tables.events(s, dir), gapMinutes = 30),
    Some(
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value,
        |    (sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session
        |  FROM g)
        |SELECT user_id, session, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM s GROUP BY user_id, session""".stripMargin
    )
  )

  // ---- S3: JSON props extraction (oracle) --------------------------------

  val q33 = Q(
    "q33_json_props",
    (s, dir) => EventOps.propsKAgg(Tables.events(s, dir)),
    Some(
      """SELECT event_type, count(*) AS n,
        |  round(avg(json_extract_string(props, '$.k')::INTEGER), 6) AS avg_k,
        |  max(json_extract_string(props, '$.k')::INTEGER) AS max_k
        |FROM events GROUP BY event_type""".stripMargin
    )
  )

  // ---- X1: multimodal binary plumbing (oracle on the hashable columns) ---
  // The full mapPartitions decode path runs (md5 + feature extraction per
  // payload); the driver-checked projection carries only driver-hashable
  // columns — the float feature vector itself is pinned by MultimodalSpec
  // (round-1 lesson: the harness cannot sort/hash an array<float> column).

  val q34 = Q(
    "q34_media_features",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal
        .extractFeatures(media)
        .toDF()
        .select(
          col("media_id"),
          col("kind"),
          col("n_bytes").cast("long").as("n_bytes"),
          col("content_md5")
        )
    },
    Some(
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  strlen(text) AS n_bytes, md5(text) AS content_md5
        |FROM documents""".stripMargin
    )
  )

  // ---- P7b: IVF ANN (rows+spec: recall vs brute force) -------------------

  val q35 = Q(
    "q35_ann_ivf",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      AnnIvf.topK(
        emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 5, numCentroids = 16, nProbe = 4)
    },
    None
  )

  // ---- S8: as-of join (oracle via DuckDB's native ASOF JOIN) -------------
  // Each event carries the user's most recent purchase value at that
  // moment (>= semantics). The purchase side is deduped per (user, ts)
  // so the match is deterministic in both engines.

  val q39 = Q(
    "q39_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("p_value"))
      graft.ops.AsOf
        .joinAsOf(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          purchases,
          keys = Seq("user_id"),
          leftTs = "ts",
          rightTs = "ts",
          payload = Seq("p_value"))
        .select(col("event_id"), col("user_id"), round(col("p_value"), 4).as("last_purchase"))
    },
    Some(
      """WITH p AS (
        |  SELECT user_id, ts, max(value) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id, round(p.p_value, 4) AS last_purchase
        |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin
    )
  )

  // ---- S9: range join (oracle via DuckDB inequality join) ----------------
  // Which events fall inside each event type's launch window (first 2h
  // of that type's activity)? Bin-exploded equi-join, never a cross
  // product (see ops.RangeJoin).

  val q40 = Q(
    "q40_range_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val windows = ev
        .groupBy(col("event_type").as("wtype"))
        .agg(min(col("ts")).as("ws"))
        .withColumn("we", col("ws") + expr("INTERVAL 2 HOURS"))
      graft.ops.RangeJoin
        .pointInInterval(
          ev.select(col("event_id"), col("ts")),
          windows,
          pointTs = "ts",
          startTs = "ws",
          endTs = "we",
          binSeconds = 3600L)
        .select(col("event_id"), col("wtype"))
    },
    Some(
      """WITH w AS (
        |  SELECT event_type AS wtype, min(ts) AS ws, min(ts) + INTERVAL 2 HOUR AS we
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, w.wtype
        |FROM events e JOIN w ON e.ts >= w.ws AND e.ts <= w.we""".stripMargin
    )
  )

  // ---- P8: dedup clustering — pairs → connected components (oracle) ------
  // The production step after pair generation: cluster near-duplicate
  // pairs and label every document with its component (min doc_id;
  // isolated docs are their own component). Edges come from the
  // SQL-expressible n-gram Jaccard join so DuckDB can rebuild the same
  // graph and resolve components with a recursive CTE.

  val q44 = Q(
    "q44_dedup_components",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = NGramJaccard
        .similarityJoin(docs, "text", "doc_id", "source", n = 2)
        .where(col("jaccard") >= 0.3)
      val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
      docs
        .select(col("doc_id"))
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
    },
    Some(
      """WITH RECURSIVE t AS (
        |  SELECT source AS block, doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS ngrams
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
        |  WHERE round(len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))::DOUBLE /
        |    (len(a.ngrams) + len(b.ngrams) - len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))), 4) >= 0.3),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b)
        |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin
    )
  )

  // ---- T7: sparse TF-IDF vectors — top-k terms per doc (oracle) ----------

  val q47 = Q(
    "q47_tfidf_top",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vec = graft.text.TfIdf.vectors(docs, "text", "doc_id")
      graft.text.TfIdf
        .topTerms(vec, "doc_id", k = 3)
        .select(col("doc_id"), col("token"), round(col("tfidf"), 4).as("tfidf"))
    },
    Some(
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1,2),
        |idf AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |v AS (SELECT tf.doc_id, tf.token, tf.tf * (ln((1.0+n.n)/(1.0+idf.dfreq)) + 1.0) AS w
        |      FROM tf JOIN idf USING(token) CROSS JOIN n)
        |SELECT doc_id, token, round(w, 4) AS tfidf
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, token) AS rn FROM v)
        |WHERE rn <= 3""".stripMargin
    )
  )

  // ---- T7b: sparse cosine similarity join on unit tf-idf vectors ---------
  // Posting-list self-join (pairs only for docs sharing a token), run on
  // a doc_id-bounded slice as the exact baseline — at corpus scale the
  // same operator runs after maxDfFrac head-token pruning, which is what
  // bounds the posting-list blowup on Zipfian vocabularies.

  val q48 = Q(
    "q48_tfidf_cosine",
    (s, dir) => {
      val docs = Tables.documents(s, dir).where(col("doc_id") < 200)
      val vec = graft.text.TfIdf.vectors(docs, "text", "doc_id")
      val unit = graft.text.TfIdf.unitVectors(vec, "doc_id")
      graft.text.TfIdf
        .similarityJoin(unit, "doc_id", threshold = 0.85)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
    },
    Some(
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents WHERE doc_id < 200),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1,2),
        |idf AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM (SELECT DISTINCT doc_id FROM t)),
        |v AS (SELECT tf.doc_id, tf.token, tf.tf * (ln((1.0+n.n)/(1.0+idf.dfreq)) + 1.0) AS w
        |      FROM tf JOIN idf USING(token) CROSS JOIN n),
        |nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM v GROUP BY 1),
        |u AS (SELECT v.doc_id, token, w/nrm AS w FROM v JOIN nrm USING(doc_id)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w*b.w) AS c
        |      FROM u a JOIN u b ON a.token = b.token AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT id_a, id_b, round(c, 4) AS cos_sim FROM p WHERE c >= 0.85""".stripMargin
    )
  )

  // ---- T8: Gopher/C4 repetition filters (oracle) -------------------------

  val q49 = Q(
    "q49_repetition",
    (s, dir) =>
      graft.text.Repetition
        .stats(Tables.documents(s, dir), "text", "doc_id")
        .select(
          col("doc_id"),
          col("n_tokens"),
          round(col("frac_top_token"), 4).as("frac_top_token"),
          round(col("frac_unique"), 4).as("frac_unique"),
          round(col("frac_top_bigram"), 4).as("frac_top_bigram")),
    Some(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents),
        |tok AS (SELECT doc_id, unnest(a) AS tok, unnest(generate_series(1, len(a))) AS pos FROM t),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1,2),
        |ts AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_tok, count(*) AS n_unique FROM tc GROUP BY 1),
        |bi AS (SELECT doc_id, tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok2 FROM tok),
        |bc AS (SELECT doc_id, tok, tok2, count(*) AS c FROM bi WHERE tok2 IS NOT NULL GROUP BY 1,2,3),
        |bs AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bi FROM bc GROUP BY 1)
        |SELECT ts.doc_id, n_tokens::BIGINT AS n_tokens,
        |  round(top_tok/n_tokens, 4) AS frac_top_token,
        |  round(n_unique/n_tokens, 4) AS frac_unique,
        |  round(coalesce(top_bi/n_bigrams, 0), 4) AS frac_top_bigram
        |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id""".stripMargin
    )
  )

  // ---- P9: exact-substring shared-span audit, Lee et al. 2021 (oracle) ---
  // Spark hashes spans (xxhash64) while the oracle groups raw span text:
  // distinct counts and min-owner are hash-invariant, so the contract
  // still pins the semantics exactly.

  val q50 = Q(
    "q50_span_dedup",
    (s, dir) =>
      graft.dedup.SpanDedup.spanStats(Tables.documents(s, dir), "text", "doc_id", n = 8),
    Some(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents),
        |g0 AS (SELECT doc_id, array_to_string(a[i:i+7], ' ') AS g
        |       FROM t, UNNEST(generate_series(1, len(a)-7)) AS u(i) WHERE len(a) >= 8),
        |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text,' ')) < 8),
        |grams AS (SELECT DISTINCT doc_id, g FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
        |own AS (SELECT g, min(doc_id) AS owner, count(*) AS ndocs FROM grams GROUP BY g)
        |SELECT doc_id, count(*) AS n_spans,
        |  sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
        |  sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END)::BIGINT AS n_foreign
        |FROM grams JOIN own USING(g) GROUP BY doc_id""".stripMargin
    )
  )

  // ---- P7c: product-quantization ANN with exact re-rank (rows+spec) ------
  // Approximate scores have no SQL analogue; correctness is pinned by
  // SimSpec (lossless-reconstruction + recall-vs-brute-force tests).

  val q51 = Q(
    "q51_ann_pq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnPq
        .topK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
          k = 5, m = 16, kCent = 16, rerank = 50, sampleN = 512)
        .orderBy(col("qid"), col("nid"))
    },
    None
  )

  // ---- P9b: benchmark decontamination (oracle) ---------------------------
  // Every 50th document stands in for the eval set; the check is the
  // real one: which corpus docs share an exact 8-token span with it.

  val q52 = Q(
    "q52_decontaminate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.dedup.SpanDedup.contamination(
        docs, docs.where(col("doc_id") % 50 === 0), "text", "doc_id", n = 8)
    },
    Some(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents),
        |g0 AS (SELECT doc_id, array_to_string(a[i:i+7], ' ') AS g
        |       FROM t, UNNEST(generate_series(1, len(a)-7)) AS u(i) WHERE len(a) >= 8),
        |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text,' ')) < 8),
        |grams AS (SELECT DISTINCT doc_id, g FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
        |probe AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
        |SELECT doc_id, count(*) AS n_spans,
        |  sum(CASE WHEN p.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
        |FROM grams LEFT JOIN probe p USING(g) GROUP BY doc_id""".stripMargin
    )
  )

  // ---- P9c: Bloom-prefiltered decontamination. Output is IDENTICAL to
  // q52 by construction (the Bloom filter only prunes the exact join's
  // input; the exact semi-join decides), so it shares q52's oracle —
  // the driver hash-checks that the sketch path changes NOTHING.
  val q75 = Q(
    "q75_decontaminate_bloom",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.dedup.SpanDedup.contaminationBloom(
        docs, docs.where(col("doc_id") % 50 === 0), "text", "doc_id", n = 8)
    },
    Some(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents),
        |g0 AS (SELECT doc_id, array_to_string(a[i:i+7], ' ') AS g
        |       FROM t, UNNEST(generate_series(1, len(a)-7)) AS u(i) WHERE len(a) >= 8),
        |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text,' ')) < 8),
        |grams AS (SELECT DISTINCT doc_id, g FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
        |probe AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
        |SELECT doc_id, count(*) AS n_spans,
        |  sum(CASE WHEN p.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
        |FROM grams LEFT JOIN probe p USING(g) GROUP BY doc_id""".stripMargin
    )
  )

  // ---- T6c: deterministic exact-count stratified sample (oracle) ---------

  val q53 = Q(
    "q53_take_per_stratum",
    (s, dir) =>
      graft.ops.Sampling
        .takePerStratum(Tables.documents(s, dir), "lang", "doc_id", n = 5)
        .select(col("doc_id"), col("lang")),
    Some(
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY ${graft.functions.SharedHash.md5Long60Sql("'graft:' || doc_id::VARCHAR")}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 5""".stripMargin
    )
  )

  // ---- P10: end-to-end fuzzy-dedup pipeline (oracle) ---------------------
  // The composed production path: minhash candidates -> Jaccard verify ->
  // connected components -> keep the min-id doc per cluster. The oracle
  // composes the q21 signature replay (shared md5 gram hash, identical
  // permutation constants) with the q44 recursive-CTE reachability — so
  // even the APPROXIMATE end-to-end dedup output is hash-checked.
  val q54 = Q(
    "q54_dedup_pipeline",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = MinHashLsh.nearDuplicates(
        docs,
        "text",
        "doc_id",
        threshold = 0.5,
        gramHash = graft.functions.SharedHash.md5Long60)
      val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
      docs
        .select(col("doc_id"))
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
        .where(col("component") === col("doc_id")) // survivors: cluster canonicals
        .select(col("doc_id"))
    },
    Some(
      s"""WITH RECURSIVE consts AS (SELECT ${mhCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${mhCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') AS g
         |       FROM toks, UNNEST(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
         |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text, ' ')) < 3),
         |grams AS (SELECT DISTINCT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("g")} AS sh
         |  FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |hl AS (SELECT doc_id, list(sh % 2147483647) AS hs, list(sh) AS ss FROM grams GROUP BY doc_id),
         |sig AS (SELECT doc_id, ss,
         |    list_transform(range(64), i ->
         |      list_min(list_transform(hs, h -> (ca[i + 1] * h + cb[i + 1]) % 2147483647))) AS s
         |  FROM hl CROSS JOIN consts),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(16), bb ->
         |    list_slice(a.s, bb * 4 + 1, bb * 4 + 4) = list_slice(b.s, bb * 4 + 1, bb * 4 + 4))) > 0
         |  AND round(len(list_filter(a.ss, x -> list_contains(b.ss, x)))::DOUBLE /
         |    (len(a.ss) + len(b.ss) - len(list_filter(a.ss, x -> list_contains(b.ss, x)))), 4) >= 0.5),
         |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b)
         |SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) = id""".stripMargin
    )
  )

  // ---- T9: fixed-window chunking with overlap (oracle) -------------------

  val q55 = Q(
    "q55_chunk",
    (s, dir) =>
      graft.text.Chunker.chunk(Tables.documents(s, dir), "text", "doc_id", chunkSize = 20, overlap = 5),
    Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |c AS (SELECT doc_id, a, len(a)::BIGINT AS n,
        |        CASE WHEN len(a) <= 20 THEN 1
        |             ELSE (len(a) - 20 + 14) // 15 + 1 END AS nc
        |      FROM t)
        |SELECT doc_id, i AS chunk_id, i * 15 AS start_tok,
        |  least(i * 15 + 20, n) - i * 15 AS n_tokens,
        |  array_to_string(a[i * 15 + 1 : least(i * 15 + 20, n)], ' ') AS chunk_text
        |FROM c, UNNEST(generate_series(0, nc - 1)) AS u(i)""".stripMargin
    )
  )

  // ---- T10: deterministic sequence packing (oracle) ----------------------
  // The oracle replays the global running sum as ONE window cumsum in
  // deterministic (salted-hash, id) order; the Spark side never runs a
  // global sort or window — fixed key ranges + per-range offsets give
  // the identical assignment with one bounded shuffle.
  val q56 = Q(
    "q56_pack_bins",
    (s, dir) =>
      graft.ops.Packing.packBins(
        Tables.documents(s, dir).withColumn("n_tok", size(split(col("text"), " "))),
        "doc_id",
        "n_tok",
        budget = 1024,
        salt = "pack",
        parts = 32),
    Some(
      s"""WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n,
         |  ${graft.functions.SharedHash.md5Long60Sql("'pack:' || doc_id::VARCHAR")} AS k
         |  FROM documents),
         |c AS (SELECT doc_id, n,
         |  (sum(n) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING))::BIGINT - n AS cb
         |  FROM t)
         |SELECT doc_id, n AS n_tokens, cb // 1024 AS bin, cb % 1024 AS bin_pos FROM c""".stripMargin
    )
  )

  // ---- P11: embedding centroids / mean pooling (oracle) ------------------
  // One-pass VecSumAgg centroid per label, exploded to long format so the
  // oracle (per-dim avg over an unnest) can hash-compare. Both engines
  // accumulate float32 inputs in double, so 4-dp rounding is stable.
  val q57 = Q(
    "q57_embed_centroids",
    (s, dir) =>
      graft.sim.Embed
        .centroids(Tables.embeddings(s, dir), "embedding", "label")
        .select(col("label"), col("n"), posexplode(col("centroid")).as(Seq("dim0", "c0")))
        .select(col("label"), col("n"), (col("dim0") + 1).cast("long").as("dim"),
          round(col("c0"), 4).as("cv")),
    Some(
      """SELECT label, count(*) AS n, i AS dim,
        |  round(sum(embedding[i]) / count(*), 4) AS cv
        |FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i)
        |GROUP BY label, i""".stripMargin
    )
  )

  // ---- P11b: nearest-centroid assignment (oracle) ------------------------
  // Broadcast the tiny centroid table, codegen dot per (vector, centroid),
  // keep the argmax — corpus scanned once, never shuffled on vectors.
  val q58 = Q(
    "q58_embed_assign",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.Embed
        .assign(emb, graft.sim.Embed.centroids(emb, "embedding", "label"), "embedding", "vec_id")
        .select(col("vec_id"), col("assigned").cast("long").as("assigned"))
    },
    Some(
      """WITH cent AS (
        |  SELECT label, i AS dim, (sum(embedding[i]) / count(*))::FLOAT AS cv
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i)
        |  GROUP BY label, i),
        |score AS (
        |  SELECT e.vec_id, c.label,
        |    sum(e.embedding[c.dim]::DOUBLE * c.cv::DOUBLE) /
        |      (sqrt(sum(e.embedding[c.dim]::DOUBLE * e.embedding[c.dim]::DOUBLE)) *
        |       sqrt(sum(c.cv::DOUBLE * c.cv::DOUBLE))) AS cos
        |  FROM embeddings e CROSS JOIN cent c
        |  GROUP BY e.vec_id, c.label)
        |SELECT vec_id, label::BIGINT AS assigned FROM score
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label) = 1""".stripMargin
    )
  )

  // ---- T11: temperature-based mixture sampling (oracle) ------------------
  // n_s^alpha rebalancing toward low-resource strata; keep decision is a
  // pure function of (salt, id, stratum counts) — the oracle replays it
  // bit-for-bit (both engines: double pow/sum, same md5-hash threshold).
  val q60 = Q(
    "q60_temperature_sample",
    (s, dir) =>
      graft.ops.Sampling
        .temperatureSample(Tables.documents(s, dir), "lang", "doc_id", alpha = 0.5, targetN = 200)
        .select(col("doc_id"), col("lang")),
    Some(
      s"""WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
         |p AS (SELECT lang,
         |        least(1.0, pow(n, 0.5) / sum(pow(n, 0.5)) OVER () * 200 / n) AS pr
         |      FROM c)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN p USING (lang)
         |WHERE ${graft.functions.SharedHash.md5Long60Sql("'graft:' || d.doc_id::VARCHAR")}::DOUBLE
         |      / 1152921504606846976.0 < p.pr""".stripMargin
    )
  )

  // ---- T11b: temperature sampling WITH upsampling (oracle) ---------------
  // targetN = 4× the corpus forces p > 1 everywhere: floor(p) guaranteed
  // copies + one salted-Bernoulli extra copy per doc. The oracle replays
  // the copy count and lateral-generates the same 0-based copy indices.
  val q61 = Q(
    "q61_temperature_upsample",
    (s, dir) =>
      graft.ops.Sampling
        .temperatureSampleReplicated(
          Tables.documents(s, dir), "lang", "doc_id", alpha = 0.5, targetN = 2000)
        .select(col("doc_id"), col("lang"), col("copy")),
    Some(
      s"""WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
         |p AS (SELECT lang,
         |        pow(n, 0.5) / sum(pow(n, 0.5)) OVER () * 2000 / n AS pr
         |      FROM c),
         |k AS (SELECT d.doc_id, d.lang,
         |        (floor(p.pr) + CASE WHEN
         |          ${graft.functions.SharedHash.md5Long60Sql("'graft:' || d.doc_id::VARCHAR")}::DOUBLE
         |            / 1152921504606846976.0 < p.pr - floor(p.pr)
         |          THEN 1 ELSE 0 END)::BIGINT AS nc
         |      FROM documents d JOIN p USING (lang))
         |SELECT doc_id, lang, unnest(generate_series(0, nc - 1)) AS copy
         |FROM k WHERE nc > 0""".stripMargin
    )
  )

  // ---- P7e: IVF-PQ composed index (rows-only; recall + plan pinned by
  // SimSpec) — residual-encoded codes probed through nProbe cells with
  // exact re-rank; the full 100 TB ANN layout.
  val q62 = Q(
    "q62_ann_ivfpq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnIvfPq.topK(
        emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 5, numCentroids = 8, m = 16, kCent = 16, nProbe = 4, rerank = 50, sampleN = 512)
    },
    None
  )

  // ---- P2b: weighted (ICWS) minhash near-dup (rows-only; generalized-
  // Jaccard estimation + exact-verify parity pinned by DedupSpec) --------
  val q63 = Q(
    "q63_weighted_minhash",
    (s, dir) =>
      graft.dedup.WeightedMinHash
        .nearDuplicates(Tables.documents(s, dir), "text", "doc_id", threshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
    None
  )

  // ---- P7f: graph ANN — NN-Descent k-NN graph + beam search (rows-only;
  // edge recall, sweep improvement and search recall pinned by SimSpec) --
  val q64 = Q(
    "q64_ann_graph",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnGraph.topK(
        emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", dims = 64,
        k = 5, graphK = 8, sweeps = 2, beam = 12, hops = 4, entries = 6)
    },
    None
  )

  // ---- T12: PII redaction (oracle) ----------------------------------------
  // PII is constructed deterministically from doc_id on BOTH sides (the
  // synthetic corpus contains none), so the oracle replays the exact
  // masks and counts bit-for-bit — Spark java.util.regex vs DuckDB RE2 on
  // the shared portable pattern subset.
  val q65 = Q(
    "q65_redact",
    (s, dir) => {
      val withPii = Tables.documents(s, dir).withColumn(
        "text2",
        concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com at 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 or +1415"), lpad(col("doc_id").cast("string"), 7, "0")))
      graft.text.Redact
        .withRedaction(withPii, "text2")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          col("text_redacted"))
    },
    Some(
      s"""WITH t AS (SELECT doc_id,
         |  text || ' contact user' || doc_id::VARCHAR || '@example.com at 10.0.' ||
         |    (doc_id % 256)::VARCHAR || '.7 or +1415' || lpad(doc_id::VARCHAR, 7, '0') AS text2
         |  FROM documents),
         |r AS (SELECT doc_id, text2,
         |  regexp_replace(text2, '${Redact.EmailPattern}', '[EMAIL]', 'g') AS after_email
         |  FROM t),
         |r2 AS (SELECT doc_id, text2, after_email,
         |  regexp_replace(after_email, '${Redact.Ipv4Pattern}', '[IP]', 'g') AS after_ip
         |  FROM r)
         |SELECT doc_id,
         |  len(regexp_extract_all(text2, '${Redact.EmailPattern}')) AS n_emails,
         |  len(regexp_extract_all(after_email, '${Redact.Ipv4Pattern}')) AS n_ips,
         |  len(regexp_extract_all(after_ip, '${Redact.PhonePattern}')) AS n_phones,
         |  regexp_replace(after_ip, '${Redact.PhonePattern}', '[PHONE]', 'g') AS text_redacted
         |FROM r2""".stripMargin
    )
  )

  // ---- T13: per-stratum profile, exercised in exact mode (FULL
  // oracle — exact distincts replay in SQL; the HLL sketch default's
  // error contract + partitioning invariance stay pinned by TextSpec) --
  val q66 = Q(
    "q66_strata_profile",
    (s, dir) =>
      graft.text.Vocab
        .strataProfile(Tables.documents(s, dir), "text", "doc_id", "lang", exact = true)
        .orderBy(col("lang")),
    Some(
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |t AS (SELECT lang, count(*)::BIGINT AS n_tokens,
        |        count(DISTINCT token)::BIGINT AS approx_vocab FROM tok GROUP BY 1),
        |d AS (SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |        count(DISTINCT doc_id)::BIGINT AS approx_docs FROM documents GROUP BY 1)
        |SELECT t.lang, n_tokens, n_docs, approx_vocab, approx_docs
        |FROM t JOIN d ON t.lang = d.lang ORDER BY t.lang""".stripMargin
    )
  )

  // ---- P12: semantic dedup — centroid cells → within-cell cosine pairs
  // → connected components (oracle: the ENTIRE pipeline replays in SQL —
  // q58's assignment, exact within-cell cosine, q44's recursive-CTE
  // reachability — so the approximate end-to-end output is hash-checked;
  // threshold margin to the nearest pair is 1.9e-4, far above engine
  // float noise).
  val q67 = Q(
    "q67_semantic_dedup",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.SemanticDedup.components(
        emb, graft.sim.Embed.centroids(emb, "embedding", "label"),
        "vec_id", "embedding", threshold = 0.3)
    },
    Some(
      """WITH RECURSIVE cent AS (
        |  SELECT label, i AS dim, (sum(embedding[i]) / count(*))::FLOAT AS cv
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i)
        |  GROUP BY label, i),
        |score AS (
        |  SELECT e.vec_id, c.label,
        |    sum(e.embedding[c.dim]::DOUBLE * c.cv::DOUBLE) /
        |      (sqrt(sum(e.embedding[c.dim]::DOUBLE * e.embedding[c.dim]::DOUBLE)) *
        |       sqrt(sum(c.cv::DOUBLE * c.cv::DOUBLE))) AS cos
        |  FROM embeddings e CROSS JOIN cent c
        |  GROUP BY e.vec_id, c.label),
        |asg AS (
        |  SELECT vec_id, label FROM score
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label) = 1),
        |f AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
        |      FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |p0 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |       FROM asg a JOIN asg b ON a.label = b.label AND a.vec_id < b.vec_id),
        |dots AS (SELECT p0.id_a, p0.id_b, sum(fa.v * fb.v) AS dot
        |         FROM p0 JOIN f fa ON fa.vec_id = p0.id_a
        |                 JOIN f fb ON fb.vec_id = p0.id_b AND fb.i = fa.i
        |         GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM dots
        |      JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        |      WHERE dot / (na.nrm * nb.nrm) >= 0.3),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b)
        |SELECT id AS vec_id, min(r) AS component FROM reach GROUP BY id""".stripMargin
    )
  )

  // ---- X1b: REAL media decode (rows-only; decoded dims/means/RMS pinned
  // exactly by MultimodalSpec). Payloads are genuine PNG/WAV bytes
  // synthesized per row from doc_id (the container has no media files),
  // decoded with the JDK's own ImageIO / AudioSystem codecs; every third
  // row is deliberately corrupt and must degrade, not fail the scan.
  val q69 = Q(
    "q69_media_decode",
    (s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select("doc_id", "text")
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload = (id % 3) match {
            case 0 => graft.media.Multimodal.encodePng(16, 16, seed = id)
            case 1 => graft.media.Multimodal.encodeWav(1600, 8000, 200.0 + (id % 40))
            case _ => text.getBytes("UTF-8") // corrupt: not decodable media
          }
          val kind = if (id % 3 == 1) "audio" else "image"
          graft.media.Multimodal.MediaRow(id, kind, payload, 0, 0)
        }
      graft.media.Multimodal.decodeReal(media)
        .select(
          col("media_id"), col("kind"), col("decode_ok"),
          col("width"), col("height"), col("n_samples"),
          round(col("mean_c0"), 4).as("mean_c0"))
    },
    None
  )

  // ---- T1b: REAL BPE tokenization (rows-only; no SQL engine runs
  // ranked byte-pair merges — hand-computed merge tables, round-trip
  // losslessness, tie-breaks and partition invariance are pinned by
  // BpeSpec). The vocab is TRAINED on the corpus in-query (one
  // distributed word-count pass + bounded driver merge loop), then
  // tokenization is an embarrassingly parallel broadcast-vocab pass.
  // `roundtrip_ok` re-decodes every document inside the query: any
  // lossy row would flip the column and the rows check.
  val q71 = Q(
    "q71_bpe_tokenize",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.text.Bpe.trainOn(docs, "text", numMerges = 200, maxWords = 20000)
      val toks = graft.text.Bpe.withTokens(docs, "text", vocab)
      graft.text.Bpe.decodeCol(toks, "tokens", "__rt", vocab)
        .select(
          col("doc_id"),
          col("n_tokens_bpe"),
          length(col("text")).as("n_chars"),
          round(
            length(col("text")).cast("double") /
              greatest(col("n_tokens_bpe"), lit(1)).cast("double"), 4)
            .as("chars_per_token"),
          (col("__rt") === col("text")).as("roundtrip_ok"))
        .orderBy(col("doc_id"))
    },
    None
  )

  // ---- T14: n-gram LM perplexity scoring (CCNet-style quality filter,
  // stupid-backoff bigram model). The ENTIRE train+score pipeline is
  // column algebra, so the oracle replays it end to end: same counts,
  // same backoff cases, same rounding. Rounding margins probed at
  // sf0.01: avg_logprob (4dp) and ppl (2dp) are far from any boundary
  // relative to engine float noise (~1e-15 relative).
  val q72 = Q(
    "q72_ngram_ppl",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.train(docs, "text", "doc_id")
      graft.text.NgramLm.score(docs, "text", "doc_id", model)
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS token,
        |    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
        |    string_split(text, ' ') AS l
        |  FROM documents),
        |t2 AS (SELECT doc_id, token, pos,
        |         CASE WHEN pos >= 1 THEN l[pos] END AS prev FROM toks),
        |uni AS (SELECT token, count(*)::BIGINT AS c1 FROM t2 GROUP BY token),
        |bi AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM t2
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT sum(c1)::DOUBLE AS t FROM uni),
        |s AS (
        |  SELECT t2.doc_id,
        |    CASE WHEN t2.pos = 0 THEN ln(u.c1::DOUBLE / tot.t)
        |         WHEN b.c2 IS NOT NULL THEN ln(b.c2::DOUBLE / up.c1)
        |         ELSE ln(0.4 * u.c1::DOUBLE / tot.t) END AS logp
        |  FROM t2
        |  JOIN uni u ON u.token = t2.token
        |  LEFT JOIN uni up ON up.token = t2.prev
        |  LEFT JOIN bi b ON b.prev = t2.prev AND b.token = t2.token
        |  CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens, round(avg(logp), 4) AS avg_logprob,
        |  round(exp(-avg(logp)), 2) AS ppl
        |FROM s GROUP BY doc_id""".stripMargin
    )
  )

  // ---- P10b: quality-aware dedup survivors — q44's near-dup components
  // composed with q28's quality score, best member kept per cluster
  // (TopK k=1, ties → lowest id). The oracle replays the WHOLE
  // composition: n-gram Jaccard pairs → recursive-CTE reachability →
  // quality → row_number survivor.
  val q73 = Q(
    "q73_dedup_keep_best",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = NGramJaccard
        .similarityJoin(docs, "text", "doc_id", "source", n = 2)
        .where(col("jaccard") >= 0.3)
      val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
      val withComp = docs
        .select(col("doc_id"))
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
      val scored = graft.text.TextStats
        .withQuality(docs, "text")
        .select(col("doc_id"), col("quality"))
      graft.dedup.Survivors.keepBest(withComp, scored, "doc_id", "component", "quality")
    },
    Some(
      """WITH RECURSIVE t AS (
        |  SELECT source AS block, doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS ngrams
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
        |  WHERE round(len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))::DOUBLE /
        |    (len(a.ngrams) + len(b.ngrams) - len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))), 4) >= 0.3),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
        |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        |toksq AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |fq AS (
        |  SELECT doc_id,
        |    len(toks)::DOUBLE AS n,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in'], tk)))::DOUBLE AS stops,
        |    len(list_distinct(toks))::DOUBLE AS uniq
        |  FROM toksq),
        |q AS (SELECT doc_id,
        |        round(least(n/100.0, 1.0)*0.4 + (1.0 - stops/n)*0.3 + (uniq/n)*0.3, 4) AS quality
        |      FROM fq)
        |SELECT component, doc_id, quality FROM (
        |  SELECT c.component, c.doc_id, q.quality,
        |    row_number() OVER (PARTITION BY c.component ORDER BY q.quality DESC, c.doc_id) AS rn
        |  FROM comp c JOIN q USING (doc_id))
        |WHERE rn = 1""".stripMargin
    )
  )

  // ---- P9d: variable-length exact-substring audit (oracle) --------------
  // Lee et al.'s real criterion — every repeated span of >= L tokens —
  // via prefix-doubling fingerprints (no suffix array needed for a
  // length-THRESHOLD audit; see RepeatedSpans). Spark compares 8-byte
  // doubling hashes; the oracle groups raw L-gram text: interval unions,
  // run lengths and min-owners are hash-invariant, so every output
  // column is pinned exactly.
  val q76 = Q(
    "q76_repeated_spans",
    (s, dir) =>
      graft.dedup.RepeatedSpans.stats(Tables.documents(s, dir), "text", "doc_id", minLen = 12),
    Some(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents),
        |grams AS (SELECT doc_id, i AS p, array_to_string(a[i:i+11], ' ') AS g
        |          FROM t, UNNEST(generate_series(1, len(a)-11)) AS u(i) WHERE len(a) >= 12),
        |own AS (SELECT g, min(doc_id) AS owner, count(*) AS nocc FROM grams GROUP BY g),
        |flagged AS (SELECT doc_id, p, owner FROM grams JOIN own USING(g) WHERE nocc > 1),
        |runs AS (SELECT doc_id, p, owner,
        |           lead(p) OVER (PARTITION BY doc_id ORDER BY p) - p AS gap,
        |           p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS run
        |         FROM flagged),
        |per_run AS (SELECT doc_id, run, count(*) AS run_starts,
        |              sum(least(coalesce(gap, 12), 12)) AS run_cov,
        |              sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS run_foreign
        |            FROM runs GROUP BY doc_id, run),
        |per_doc AS (SELECT doc_id, sum(run_starts) AS n_rep_starts, sum(run_cov) AS rep_tokens,
        |              max(run_starts) + 11 AS max_rep_len, sum(run_foreign) AS n_foreign
        |            FROM per_run GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_rep_starts, 0)::BIGINT AS n_rep_starts,
        |  coalesce(rep_tokens, 0)::BIGINT AS rep_tokens,
        |  coalesce(max_rep_len, 0)::BIGINT AS max_rep_len,
        |  coalesce(n_foreign, 0)::BIGINT AS n_foreign
        |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN per_doc USING (doc_id)""".stripMargin
    )
  )

  // ---- P13: C4-style line-level dedup (oracle) --------------------------
  // The corpus has no newlines, so both engines derive the SAME line
  // structure first (10-token lines) — then every duplicated line is
  // removed except its earliest (doc, pos) occurrence and documents are
  // reassembled in order. The oracle replays it with window functions
  // over raw line text; Spark groups 8-byte xxhash64 keys and broadcasts
  // only the duplicated-line table (see LineDedup).
  val q77 = Q(
    "q77_line_dedup",
    (s, dir) => {
      val toks = split(col("text"), " ")
      // Column `/` is double division: floor+cast for the line count
      val m = greatest(floor((size(toks) + lit(9)) / lit(10)).cast("int"), lit(1))
      val lined = Tables.documents(s, dir).select(
        col("doc_id"),
        array_join(
          transform(sequence(lit(0), m - 1),
            i => array_join(slice(toks, i * 10 + 1, lit(10)), " ")),
          "\n").as("lt"))
      graft.dedup.LineDedup.clean(lined, "lt", "doc_id", "\n", minCount = 2)
    },
    Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |lined AS (SELECT doc_id,
        |    list_transform(range(greatest((len(ts)+9)//10, 1)),
        |      i -> array_to_string(ts[i*10+1:i*10+10], ' ')) AS ls
        |  FROM t),
        |lines AS (SELECT doc_id, i AS pos, ls[i+1] AS line
        |  FROM lined, UNNEST(range(len(ls))) AS u(i)),
        |marked AS (SELECT doc_id, pos, line,
        |    count(*) OVER (PARTITION BY line) AS cnt,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |  FROM lines)
        |SELECT doc_id,
        |  coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE cnt < 2 OR rn = 1), '') AS clean_text,
        |  count(*) FILTER (WHERE NOT (cnt < 2 OR rn = 1)) AS n_removed,
        |  count(*) AS n_lines
        |FROM marked GROUP BY doc_id""".stripMargin
    )
  )

  // ---- T16: BM25 ranked retrieval (oracle) ------------------------------
  // Queries are 3-term bags drawn deterministically from the corpus
  // (docs 0-7, token positions 1/11/21). Every score is pinned to 4
  // decimals: the slot-ordered sum makes the float arithmetic identical
  // on both engines, and the rank-5/6 gaps (min 2.6e-4 at sf0.01) dwarf
  // cross-engine libm noise.
  val q78 = Q(
    "q78_bm25",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val qs = docs
        .filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), split(col("text"), " ").as("__qt"))
        .select(
          col("qid"),
          // try_element_at: a query doc shorter than the slot position
          // yields a NULL term, which the term join drops — exactly the
          // oracle's ts[i] list semantics
          posexplode(array(
            try_element_at(col("__qt"), lit(1)),
            try_element_at(col("__qt"), lit(11)),
            try_element_at(col("__qt"), lit(21)))).as(Seq("qpos", "term")))
      graft.text.Bm25.topK(docs, "text", "doc_id", qs, k = 5)
        .withColumn("score", round(col("score"), 4))
    },
    Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |stats AS (SELECT count(*) AS n, avg(len(ts)) AS avgdl FROM t),
        |tf AS (SELECT doc_id, u.term, count(*) AS tf, any_value(dl) AS dl
        |       FROM (SELECT doc_id, ts, len(ts) AS dl FROM t), UNNEST(ts) AS u(term)
        |       GROUP BY doc_id, u.term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT doc_id AS qid, i AS qpos,
        |         ts[CASE i WHEN 0 THEN 1 WHEN 1 THEN 11 ELSE 21 END] AS term
        |       FROM t, UNNEST(range(3)) AS u(i) WHERE doc_id < 8),
        |ts2 AS (SELECT qt.qid, qt.qpos, tf.doc_id,
        |    ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5)) *
        |    (tf.tf * 2.2) /
        |    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (SELECT avgdl FROM stats))) AS s
        |  FROM qt JOIN tf ON qt.term = tf.term JOIN df ON qt.term = df.term),
        |scored AS (SELECT qid, doc_id,
        |    coalesce(max(s) FILTER (WHERE qpos = 0), 0) +
        |    coalesce(max(s) FILTER (WHERE qpos = 1), 0) +
        |    coalesce(max(s) FILTER (WHERE qpos = 2), 0) AS score
        |  FROM ts2 GROUP BY qid, doc_id),
        |ranked AS (SELECT qid, doc_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
        |  FROM scored)
        |SELECT qid, rn AS rank, doc_id, round(score, 4) AS score
        |FROM ranked WHERE rn <= 5""".stripMargin
    )
  )

  // ---- T21: pipeline attrition audit (oracle) ---------------------------
  // The Dolma/RefinedWeb-style funnel: five REAL gates (language ID,
  // quality, repetition, exact dedup, decontamination — each one an
  // already-oracled graft operator) composed as VERDICTS, attributing to
  // every document the first stage that would drop it. The oracle
  // replays all five gates plus the CASE attribution, so the entire
  // funnel is hash-pinned. Gate thresholds sit on values both engines
  // compute bit-identically (single integer divisions / the 4-decimal
  // pre-rounded quality score; margins probed).
  val q81 = Q(
    "q81_attrition",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val lang = LangId.withLangId(docs, "text").select(col("doc_id"), col("pred_lang"))
      val quality = TextStats.withQuality(docs, "text").select(col("doc_id"), col("quality"))
      val rep = graft.text.Repetition.stats(docs, "text", "doc_id")
        .select(col("doc_id"), col("frac_top_token"))
      val keepers = docs.groupBy(md5(col("text")).as("__h")).agg(min(col("doc_id")).as("__keep_id"))
      val dup = docs.select(col("doc_id"), md5(col("text")).as("__h"))
        .join(keepers, Seq("__h")).select(col("doc_id"), col("__keep_id"))
      val decon = graft.dedup.SpanDedup
        .contamination(docs, docs.where(col("doc_id") % 50 === 0), "text", "doc_id", n = 8)
        .select(col("doc_id"), col("n_hits"))
      val joined = docs.select(col("doc_id"), col("lang"))
        .join(lang, Seq("doc_id")).join(quality, Seq("doc_id")).join(rep, Seq("doc_id"))
        .join(dup, Seq("doc_id")).join(decon, Seq("doc_id"))
      graft.ops.Attrition
        .firstFailed(joined, Seq(
          "lang" -> (col("pred_lang") === col("lang")),
          "quality" -> (col("quality") >= 0.55),
          "repetition" -> (col("frac_top_token") <= 0.15),
          "exact_dup" -> (col("doc_id") === col("__keep_id")),
          "decontam" -> (col("n_hits") === 0)))
        .select(col("doc_id"), coalesce(col("first_failed"), lit("kept")).as("first_failed"))
    },
    Some(
      """WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents),
        |h AS (SELECT doc_id,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is'], tk))) AS h_en,
        |    len(list_filter(toks, tk -> list_contains(['el','la','de','que','y'], tk))) AS h_es,
        |    len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist'], tk))) AS h_de,
        |    len(list_filter(toks, tk -> list_contains(['le','les','une','et','est'], tk))) AS h_fr,
        |    len(list_filter(toks, tk -> list_contains(['的','是','在','了','我'], tk))) AS h_zh
        |  FROM t),
        |pl AS (SELECT doc_id,
        |    CASE WHEN greatest(h_en, h_es, h_de, h_fr, h_zh) = 0 THEN 'und'
        |         WHEN h_en = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'en'
        |         WHEN h_es = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'es'
        |         WHEN h_de = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'de'
        |         WHEN h_fr = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'fr'
        |         ELSE 'zh' END AS pred_lang
        |  FROM h),
        |f AS (SELECT doc_id, len(toks)::DOUBLE AS n,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in'], tk)))::DOUBLE AS stops,
        |    len(list_distinct(toks))::DOUBLE AS uniq
        |  FROM t),
        |qual AS (SELECT doc_id,
        |    round(least(n/100.0, 1.0)*0.4 + (1.0 - stops/n)*0.3 + (uniq/n)*0.3, 4) AS quality
        |  FROM f),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |rep AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS ftt FROM tc GROUP BY 1),
        |dup AS (SELECT DISTINCT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        |  FROM documents),
        |g0 AS (SELECT s.doc_id, array_to_string(s.a[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents) s,
        |       UNNEST(generate_series(1, len(s.a) - 7)) AS u(i) WHERE len(s.a) >= 8),
        |gshort AS (SELECT doc_id, text AS g FROM documents
        |  WHERE len(string_split(text, ' ')) < 8),
        |grams AS (SELECT DISTINCT doc_id, g FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
        |probe AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
        |dec AS (SELECT doc_id, sum(CASE WHEN p.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
        |  FROM grams LEFT JOIN probe p USING (g) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN pl.pred_lang <> d.lang THEN 'lang'
        |       WHEN q.quality < 0.55 THEN 'quality'
        |       WHEN r.ftt > 0.15 THEN 'repetition'
        |       WHEN d.doc_id <> u.keep_id THEN 'exact_dup'
        |       WHEN x.n_hits > 0 THEN 'decontam'
        |       ELSE 'kept' END AS first_failed
        |FROM documents d
        |  JOIN pl USING (doc_id) JOIN qual q USING (doc_id) JOIN rep r USING (doc_id)
        |  JOIN dup u USING (doc_id) JOIN dec x USING (doc_id)""".stripMargin
    )
  )

  // ---- P14: PCA / whitening over embeddings (rows-only: the Jacobi
  // eigensolve is not ANSI-SQL-expressible; SimSpec pins the fit against
  // a driver-side dense covariance eigendecomposition and the planted
  // principal direction, LinAlgSpec pins the solver itself) ------------
  val q82 = Q(
    "q82_pca",
    (s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val m = graft.sim.Pca.fit(emb, "embedding", k = 8)
      val cum = m.varianceExplained.scanLeft(0.0)(_ + _).tail
      m.eigenvalues.indices.map { i =>
        (i, BigDecimal(m.eigenvalues(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(m.varianceExplained(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(cum(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("component", "eigenvalue", "var_explained", "cum_explained")
    },
    None
  )

  // ---- T17: exact per-stratum heavy hitters via a Misra–Gries candidate
  // pass + exact verification (FULL oracle: the sketch only prunes — the
  // MG containment guarantee makes the candidate set a superset of every
  // token with cnt·100 > n, so the exact pass reproduces DuckDB's plain
  // group-by answer; the threshold is integer arithmetic on both
  // engines, no float margin) -----------------------------------------
  val q83 = Q(
    "q83_heavy_hitters",
    (s, dir) =>
      graft.text.Vocab
        .heavyHitters(Tables.documents(s, dir), "text", "lang", pct = 100, capacity = 256)
        .select(col("lang"), col("token"), col("cnt"), col("n_tokens")),
    Some(
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |n AS (SELECT lang, count(*) AS n_tokens FROM t GROUP BY lang),
        |c AS (SELECT lang, token, count(*) AS cnt FROM t GROUP BY lang, token)
        |SELECT c.lang, c.token, c.cnt, n.n_tokens
        |FROM c JOIN n USING (lang) WHERE c.cnt * 100 > n.n_tokens""".stripMargin
    )
  )

  // ---- P7h: OPQ — PCA-rotated, eigenvalue-allocated PQ (rows-only:
  // ANN recall isn't SQL-expressible; SimSpec pins the rotation
  // invariants and the 0.23→0.86 recall win on the unbalanced corpus;
  // the exact-rerank output here goes through the same TopK machinery
  // q51 pins) ----------------------------------------------------------
  val q84 = Q(
    "q84_opq_topk",
    (s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      graft.sim.Opq.topK(
        emb.where($"vec_id" < 8), emb, "vec_id", "embedding", dims = 64,
        k = 5, m = 16, kCent = 16, rerank = 50, sampleN = 512)
    },
    None
  )

  // ---- T18: within-doc repeat mining by suffix automaton (FULL oracle:
  // lrs via a bounded n-gram replay — the corpus's max repeated span is
  // 4 tokens, probed; the SQL bound of 12 leaves 3× headroom, and the
  // automaton's answer is exact so any doc beyond the bound would
  // mismatch loudly rather than silently — plus the distinct-substring
  // count brute-forced over ALL gram lengths, a complete witness of the
  // automaton construction) --------------------------------------------
  val q85 = Q(
    "q85_repeat_mining",
    (s, dir) =>
      graft.text.RepeatMining.perDoc(Tables.documents(s, dir), "text", "doc_id"),
    Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT doc_id, n, i, array_to_string(ts[i:i+n-1], ' ') AS gram
        |  FROM t, UNNEST(generate_series(1, 12)) AS ns(n),
        |       UNNEST(generate_series(1, len(ts) - n + 1)) AS ii(i)),
        |rep AS (SELECT doc_id, n, gram, min(i) AS fp
        |  FROM g GROUP BY doc_id, n, gram HAVING count(*) >= 2),
        |lrs AS (SELECT doc_id, max(n) AS l FROM rep GROUP BY doc_id),
        |pick AS (SELECT r.doc_id, r.n AS lrs_len,
        |    (array_agg(r.gram ORDER BY r.fp))[1] AS lrs_gram
        |  FROM rep r JOIN lrs ON r.doc_id = lrs.doc_id AND r.n = lrs.l
        |  GROUP BY r.doc_id, r.n),
        |allg AS (SELECT doc_id, n, array_to_string(ts[i:i+n-1], ' ') AS gram
        |  FROM t, UNNEST(generate_series(1, greatest(len(ts), 1))) AS ns(n),
        |       UNNEST(generate_series(1, len(ts) - n + 1)) AS ii(i)),
        |ds AS (SELECT doc_id, count(DISTINCT gram) AS distinct_subs FROM allg GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(pick.lrs_len, 0) AS lrs_len,
        |  coalesce(pick.lrs_gram, '') AS lrs_gram,
        |  coalesce(ds.distinct_subs, 0) AS distinct_subs
        |FROM t LEFT JOIN pick ON t.doc_id = pick.doc_id
        |LEFT JOIN ds ON t.doc_id = ds.doc_id""".stripMargin
    )
  )

  // ---- T1c: unigram-LM tokenizer (rows-only: lattice EM isn't
  // SQL-expressible; UnigramLmSpec pins a hand-computed E-step, Viterbi
  // vs brute force, the tie-break, and determinism — while
  // roundtrip_ok is re-checked in-query per document, q71-style) -------
  val q86 = Q(
    "q86_unigram_tokenize",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val v = graft.text.UnigramLm.train(
        docs, "text", targetVocab = 800, maxPieceLen = 6, seedSize = 2000)
      graft.text.UnigramLm.withPieces(docs, "text", "doc_id", v)
        .select(
          col("doc_id"), col("n_pieces"), col("roundtrip_ok"),
          xxhash64(concat_ws("", col("pieces"))).as("pieces_hash"))
    },
    None
  )

  // ---- T19: token-budget mix selection (FULL oracle incl. the running
  // totals: both engines order by the shared md5-60 hash and sum exact
  // BIGINTs — the two-level bucket prefix provably changes nothing, it
  // only bounds partition sizes; budget tiers derived from the source
  // name so both sides compute them independently) ---------------------
  val q87 = Q(
    "q87_token_budget",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      val budgets = docs.select("source").distinct().as[String].collect()
        .map(src => src -> (if (src.stripPrefix("src").toInt % 2 == 0) 500L else 900L))
        .toMap
      graft.ops.TokenBudget.select(docs, "doc_id", "source", "n_tok", budgets)
        .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tokens"))
    },
    Some(
      s"""WITH t AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tok,
         |    ${graft.functions.SharedHash.md5Long60Sql("'graft:' || doc_id::VARCHAR")} AS h
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tok,
         |    (sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id))::BIGINT AS cum_tokens FROM t)
         |SELECT doc_id, source, n_tok, cum_tokens FROM c
         |WHERE cum_tokens <=
         |  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 500 ELSE 900 END""".stripMargin
    )
  )

  // ---- P15: per-dimension embedding standardization (FULL oracle in
  // long form: DuckDB recomputes μ/σ per dim with avg/stddev_samp —
  // mathematically identical to the one-pass moment form. Margins
  // probed at sf0.01: nearest z to a 1e-6 rounding boundary is
  // 1.84e-11 away while the cross-engine moment noise is ≤ ~1e-12,
  // and the post-round max |Δz| measures exactly 0.0) ------------------
  val q88 = Q(
    "q88_embed_standardize",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val (_, _, tf) = graft.sim.Embed.standardizer(emb, "embedding")
      emb.select(col("vec_id"), posexplode(tf(col("embedding"))).as(Seq("dim0", "z")))
        .select(
          col("vec_id"), (col("dim0") + 1).as("dim"),
          round(col("z"), 6).as("z"))
    },
    Some(
      """WITH s AS (SELECT i AS dim, avg(embedding[i]::DOUBLE) AS mu,
        |    stddev_samp(embedding[i]::DOUBLE) AS sd
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i) GROUP BY i)
        |SELECT e.vec_id, s.dim,
        |  round((e.embedding[s.dim]::DOUBLE - s.mu) / s.sd, 6) AS z
        |FROM embeddings e, s""".stripMargin
    )
  )

  // ---- T20: model-based quality filter (rows-only: the logistic fit
  // isn't SQL-expressible; TextSpec pins held-out separation on planted
  // populations — here the weak supervision is a source-name tier, and
  // the query exercises the full train→score→aggregate composition) ----
  val q89 = Q(
    "q89_quality_model",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("label",
          (expr("CAST(substr(source, 4) AS INT)") % 2).cast("double"))
      val m = graft.text.QualityModel.train(docs, "text", "label")
      graft.text.QualityModel.score(docs, "text", m)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("q_score")), 4).as("mean_q"))
        .orderBy(col("source"))
    },
    None
  )

  // ---- T22: DSIR importance resampling (Xie et al. 2023) — pick raw
  // documents that look like the target domain: log w = log p_tgt −
  // log p_bg under two stupid-backoff bigram LMs (the q72 machinery,
  // twice), Gumbel top-k without replacement with the noise drawn from
  // the deterministic md5-60 hash. FULL oracle: both LM replays + the
  // exact hash-Gumbel keys + the same (key DESC, doc_id) order. Margins
  // probed at sf0.01: min adjacent-key gap across the cut is orders of
  // magnitude above cross-engine libm noise, and the 4dp roundings sit
  // far from boundaries (probe script in the round notes).
  val q92 = Q(
    "q92_dsir",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = graft.text.NgramLm.train(docs.where(col("source") === "src0"), "text", "doc_id")
      val background = graft.text.NgramLm.train(docs, "text", "doc_id")
      graft.text.Dsir
        .resample(docs, "text", "doc_id", target, background, k = 60)
        .select(
          col("rank"), col("doc_id"), col("n_tokens"),
          round(col("log_w"), 4).as("log_w"), round(col("key"), 4).as("key"))
        .orderBy(col("rank"))
    },
    Some(
      s"""WITH toks0 AS (
         |  SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS token,
         |    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
         |    string_split(text, ' ') AS l
         |  FROM documents),
         |toks AS (SELECT doc_id, token, pos,
         |           CASE WHEN pos >= 1 THEN l[pos] END AS prev FROM toks0),
         |tdocs AS (SELECT doc_id FROM documents WHERE source = 'src0'),
         |ttoks AS (SELECT t.* FROM toks t JOIN tdocs USING (doc_id)),
         |uni_b AS (SELECT token, count(*)::BIGINT AS c1 FROM toks GROUP BY token),
         |bi_b AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM toks
         |         WHERE prev IS NOT NULL GROUP BY 1, 2),
         |tot_b AS (SELECT sum(c1)::DOUBLE AS t FROM uni_b),
         |uni_t AS (SELECT token, count(*)::BIGINT AS c1 FROM ttoks GROUP BY token),
         |bi_t AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM ttoks
         |         WHERE prev IS NOT NULL GROUP BY 1, 2),
         |tot_t AS (SELECT sum(c1)::DOUBLE AS t FROM uni_t),
         |s AS (
         |  SELECT tk.doc_id,
         |    (CASE WHEN tk.pos = 0 THEN ln(COALESCE(ut.c1::DOUBLE, 0.5) / tot_t.t)
         |          WHEN bt.c2 IS NOT NULL THEN ln(bt.c2::DOUBLE / utp.c1)
         |          ELSE ln(0.4 * COALESCE(ut.c1::DOUBLE, 0.5) / tot_t.t) END)
         |  - (CASE WHEN tk.pos = 0 THEN ln(COALESCE(ub.c1::DOUBLE, 0.5) / tot_b.t)
         |          WHEN bb.c2 IS NOT NULL THEN ln(bb.c2::DOUBLE / ubp.c1)
         |          ELSE ln(0.4 * COALESCE(ub.c1::DOUBLE, 0.5) / tot_b.t) END) AS lr
         |  FROM toks tk
         |  LEFT JOIN uni_t ut ON ut.token = tk.token
         |  LEFT JOIN uni_t utp ON utp.token = tk.prev
         |  LEFT JOIN bi_t bt ON bt.prev = tk.prev AND bt.token = tk.token
         |  LEFT JOIN uni_b ub ON ub.token = tk.token
         |  LEFT JOIN uni_b ubp ON ubp.token = tk.prev
         |  LEFT JOIN bi_b bb ON bb.prev = tk.prev AND bb.token = tk.token
         |  CROSS JOIN tot_t CROSS JOIN tot_b),
         |w AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(lr) AS log_w
         |      FROM s GROUP BY doc_id),
         |keyed AS (SELECT doc_id, n_tokens, log_w,
         |    log_w - ln(-ln(GREATEST(
         |      ${graft.functions.SharedHash.md5Long60Sql("'dsir:' || doc_id::VARCHAR")}::DOUBLE
         |        / 1152921504606846976.0, 1e-18))) AS key
         |  FROM w)
         |SELECT row_number() OVER (ORDER BY key DESC, doc_id) AS rank,
         |  doc_id, n_tokens, round(log_w, 4) AS log_w, round(key, 4) AS key
         |FROM keyed ORDER BY key DESC, doc_id LIMIT 60""".stripMargin
    )
  )

  // ---- T22b: DSIR corpus-fraction threshold path — the 100 TB shape
  // (quantile sketch → row-local filter, no corpus-sized heap). The
  // sketch runs at relErr 1e-6: exact at this scale, so the threshold
  // is the ascending order statistic at rank ceil((1-f)·n) and the
  // oracle replays the cut as an order-statistic LIMIT (quantile_cont
  // would INTERPOLATE between elements — that value can never equal a
  // `key >= element` cut; the rank form is the exact semantic). Kept
  // set = every key >= that element: n − ceil((1-f)·n) + 1 rows.
  // Margins: the cut boundary gap is the adjacent-Gumbel-key gap
  // (md5-60 derived, ≫ libm noise — probed at sf0.01 alongside the
  // q92 roundings).
  val q93 = Q(
    "q93_dsir_fraction",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = graft.text.NgramLm.train(docs.where(col("source") === "src0"), "text", "doc_id")
      val background = graft.text.NgramLm.train(docs, "text", "doc_id")
      graft.text.Dsir
        .selectFraction(
          docs, "text", "doc_id", target, background, fraction = 0.25, relErr = 1e-6)
        .select(
          col("doc_id"), col("n_tokens"),
          round(col("log_w"), 4).as("log_w"), round(col("key"), 4).as("key"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""WITH toks0 AS (
         |  SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS token,
         |    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
         |    string_split(text, ' ') AS l
         |  FROM documents),
         |toks AS (SELECT doc_id, token, pos,
         |           CASE WHEN pos >= 1 THEN l[pos] END AS prev FROM toks0),
         |tdocs AS (SELECT doc_id FROM documents WHERE source = 'src0'),
         |ttoks AS (SELECT t.* FROM toks t JOIN tdocs USING (doc_id)),
         |uni_b AS (SELECT token, count(*)::BIGINT AS c1 FROM toks GROUP BY token),
         |bi_b AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM toks
         |         WHERE prev IS NOT NULL GROUP BY 1, 2),
         |tot_b AS (SELECT sum(c1)::DOUBLE AS t FROM uni_b),
         |uni_t AS (SELECT token, count(*)::BIGINT AS c1 FROM ttoks GROUP BY token),
         |bi_t AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM ttoks
         |         WHERE prev IS NOT NULL GROUP BY 1, 2),
         |tot_t AS (SELECT sum(c1)::DOUBLE AS t FROM uni_t),
         |s AS (
         |  SELECT tk.doc_id,
         |    (CASE WHEN tk.pos = 0 THEN ln(COALESCE(ut.c1::DOUBLE, 0.5) / tot_t.t)
         |          WHEN bt.c2 IS NOT NULL THEN ln(bt.c2::DOUBLE / utp.c1)
         |          ELSE ln(0.4 * COALESCE(ut.c1::DOUBLE, 0.5) / tot_t.t) END)
         |  - (CASE WHEN tk.pos = 0 THEN ln(COALESCE(ub.c1::DOUBLE, 0.5) / tot_b.t)
         |          WHEN bb.c2 IS NOT NULL THEN ln(bb.c2::DOUBLE / ubp.c1)
         |          ELSE ln(0.4 * COALESCE(ub.c1::DOUBLE, 0.5) / tot_b.t) END) AS lr
         |  FROM toks tk
         |  LEFT JOIN uni_t ut ON ut.token = tk.token
         |  LEFT JOIN uni_t utp ON utp.token = tk.prev
         |  LEFT JOIN bi_t bt ON bt.prev = tk.prev AND bt.token = tk.token
         |  LEFT JOIN uni_b ub ON ub.token = tk.token
         |  LEFT JOIN uni_b ubp ON ubp.token = tk.prev
         |  LEFT JOIN bi_b bb ON bb.prev = tk.prev AND bb.token = tk.token
         |  CROSS JOIN tot_t CROSS JOIN tot_b),
         |w AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(lr) AS log_w
         |      FROM s GROUP BY doc_id),
         |keyed AS (SELECT doc_id, n_tokens, log_w,
         |    log_w - ln(-ln(GREATEST(
         |      ${graft.functions.SharedHash.md5Long60Sql("'dsir:' || doc_id::VARCHAR")}::DOUBLE
         |        / 1152921504606846976.0, 1e-18))) AS key
         |  FROM w)
         |SELECT doc_id, n_tokens, round(log_w, 4) AS log_w, round(key, 4) AS key
         |FROM keyed
         |QUALIFY row_number() OVER (ORDER BY key DESC, doc_id)
         |  <= (SELECT count(*) - ceil(0.75 * count(*)) + 1 FROM w)
         |ORDER BY doc_id""".stripMargin
    )
  )

  // ---- P4b: edit-distance-verified near-dup (FULL oracle: the q21
  // signature/banding replay + DuckDB levenshtein — the verify filter,
  // budget floor, and 4dp ratio are replayed exactly; Spark's side runs
  // the per-row THRESHOLDED DP, whose kept set and distances equal the
  // full DP's by construction) ------------------------------------------
  val q95 = Q(
    "q95_edit_dedup",
    (s, dir) =>
      graft.dedup.EditDedup
        .pairs(
          Tables.documents(s, dir), "text", "doc_id",
          maxDistRatio = 0.3,
          gramHash = graft.functions.SharedHash.md5Long60)
        .orderBy(col("id_a"), col("id_b")),
    Some(
      s"""WITH consts AS (SELECT ${mhCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${mhCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') AS g
         |       FROM toks, UNNEST(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
         |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text, ' ')) < 3),
         |grams AS (SELECT DISTINCT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("g")} AS sh
         |  FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |hl AS (SELECT doc_id, list(sh % 2147483647) AS hs FROM grams GROUP BY doc_id),
         |sig AS (SELECT doc_id,
         |    list_transform(range(64), i ->
         |      list_min(list_transform(hs, h -> (ca[i + 1] * h + cb[i + 1]) % 2147483647))) AS s
         |  FROM hl CROSS JOIN consts),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(16), bb ->
         |    list_slice(a.s, bb * 4 + 1, bb * 4 + 4) = list_slice(b.s, bb * 4 + 1, bb * 4 + 4))) > 0),
         |v AS (SELECT id_a, id_b, levenshtein(ta.text, tb.text) AS d,
         |    greatest(length(ta.text), length(tb.text)) AS ml
         |  FROM cand
         |  JOIN documents ta ON ta.doc_id = id_a
         |  JOIN documents tb ON tb.doc_id = id_b)
         |SELECT id_a, id_b, d::BIGINT AS edit_dist, round(d::DOUBLE / ml, 4) AS edit_ratio
         |FROM v WHERE d <= floor(0.3 * ml)
         |ORDER BY id_a, id_b""".stripMargin
    )
  )

  // ---- T23: hybrid retrieval via Reciprocal Rank Fusion (FULL oracle:
  // both systems' rankings replayed — BM25 with q78's exact formula,
  // tf-idf cosine with q48's — then the fusion arithmetic. Cross-engine
  // rank stability: BM25 scores are a fixed-order slot fold (exact same
  // doubles on both engines, q78's guarantee); the cosine is a
  // shuffle-order float sum, so ranking happens on the 6dp-ROUNDED
  // cosine in both engines (margins probed); rrf contributions
  // 1/(60+rank) are exact rationals folded in fixed system order) ------
  val q96 = Q(
    "q96_hybrid_rrf",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val qs = docs
        .filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), split(col("text"), " ").as("__qt"))
        .select(
          col("qid"),
          posexplode(array(
            try_element_at(col("__qt"), lit(1)),
            try_element_at(col("__qt"), lit(11)),
            try_element_at(col("__qt"), lit(21)))).as(Seq("qpos", "term")))
      val bm = graft.text.Bm25.topK(docs, "text", "doc_id", qs, k = 10)
        .select(col("qid"), col("doc_id").as("id"), col("rank"))
      // deliberately NOT persisted: the doc_id < 8 filter pushes
      // through the partition-key window, so the query branch only
      // tokenizes 8 docs — while caching `unit` would materialize the
      // corpus-sized token-level frame into InMemoryRelation's columnar
      // encoding (measured: persist + eager result 8.4s vs 4.6s lazy;
      // the FE-GLM persist-vs-checkpoint lesson in §8f)
      val unit = graft.text.TfIdf.unitVectors(
        graft.text.TfIdf.vectors(docs, "text", "doc_id"), "doc_id")
      val qv = unit.where(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), col("token"), col("w").as("qw"))
      val cosTop = unit
        .join(broadcast(qv), Seq("token"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(round(sum(col("qw") * col("w")), 6).as("cos"))
        .groupBy(col("qid"))
        .agg(graft.functions.TopK.agg(col("cos"), col("doc_id"), 10).as("__topk"))
        .select(col("qid"), posexplode(col("__topk")).as(Seq("__r", "__kv")))
        .select(col("qid"), (col("__r") + 1).cast("long").as("rank"),
          col("__kv.payload").as("id"))
      graft.text.Hybrid.rrf(Seq(bm, cosTop), k = 10)
        .select(col("qid"), col("rank"), col("id"),
          round(col("rrf_score"), 6).as("rrf_score"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |stats AS (SELECT count(*) AS n, avg(len(ts)) AS avgdl FROM t),
        |tf AS (SELECT doc_id, u.term, count(*) AS tf, any_value(dl) AS dl
        |       FROM (SELECT doc_id, ts, len(ts) AS dl FROM t), UNNEST(ts) AS u(term)
        |       GROUP BY doc_id, u.term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT doc_id AS qid, i AS qpos,
        |         ts[CASE i WHEN 0 THEN 1 WHEN 1 THEN 11 ELSE 21 END] AS term
        |       FROM t, UNNEST(range(3)) AS u(i) WHERE doc_id < 8),
        |ts2 AS (SELECT qt.qid, qt.qpos, tf.doc_id,
        |    ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5)) *
        |    (tf.tf * 2.2) /
        |    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (SELECT avgdl FROM stats))) AS s
        |  FROM qt JOIN tf ON qt.term = tf.term JOIN df ON qt.term = df.term),
        |bmscored AS (SELECT qid, doc_id,
        |    coalesce(max(s) FILTER (WHERE qpos = 0), 0) +
        |    coalesce(max(s) FILTER (WHERE qpos = 1), 0) +
        |    coalesce(max(s) FILTER (WHERE qpos = 2), 0) AS score
        |  FROM ts2 GROUP BY qid, doc_id),
        |bmrank AS (SELECT qid, doc_id AS id, row_number()
        |    OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
        |  FROM bmscored QUALIFY rk <= 10),
        |tok AS (SELECT doc_id, unnest(ts) AS token FROM t),
        |tf2 AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |idf AS (SELECT token, count(*) AS dfreq FROM tf2 GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM (SELECT DISTINCT doc_id FROM tok)),
        |v AS (SELECT tf2.doc_id, tf2.token,
        |        tf2.tf * (ln((1.0 + nn.n) / (1.0 + idf.dfreq)) + 1.0) AS w
        |      FROM tf2 JOIN idf USING (token) CROSS JOIN nn),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM v GROUP BY 1),
        |u2 AS (SELECT v.doc_id, token, w / nrm AS w FROM v JOIN nrm USING (doc_id)),
        |cos AS (SELECT q.doc_id AS qid, d.doc_id AS id, round(sum(q.w * d.w), 6) AS c
        |        FROM u2 q JOIN u2 d ON q.token = d.token
        |        WHERE q.doc_id < 8 GROUP BY 1, 2),
        |cosrank AS (SELECT qid, id, row_number()
        |    OVER (PARTITION BY qid ORDER BY c DESC, id) AS rk
        |  FROM cos QUALIFY rk <= 10),
        |tagged AS (
        |  SELECT qid, id, rk, 0 AS sys FROM bmrank
        |  UNION ALL SELECT qid, id, rk, 1 AS sys FROM cosrank),
        |fused AS (SELECT qid, id,
        |    coalesce(max(CASE WHEN sys = 0 THEN 1.0 / (60 + rk) END), 0) +
        |    coalesce(max(CASE WHEN sys = 1 THEN 1.0 / (60 + rk) END), 0) AS rrf
        |  FROM tagged GROUP BY qid, id)
        |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS rank,
        |  id, round(rrf, 6) AS rrf_score
        |FROM fused QUALIFY rank <= 10
        |ORDER BY qid, rank""".stripMargin
    )
  )

  // ---- P16: semantic decontamination — per-corpus-row max cosine
  // against a broadcast probe (eval/benchmark) set + hit flag; the
  // embedding-space complement of span decontamination (q52/q75):
  // paraphrased test material shares no 8-gram but carries
  // near-identical embeddings. Threshold 0.35 probed at sf0.01: cut
  // margin 6.9e-4 and 4dp-rounding margin 1.7e-8 vs ~1e-12 engine
  // noise; 24 planted hits.
  val q97 = Q(
    "q97_semantic_decon",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.Cosine
        .decontaminate(
          emb, emb.where(col("vec_id") % 50 === 0), "vec_id", "embedding", threshold = 0.35,
          excludeSelfId = true) // probe drawn from the corpus itself
        .orderBy(col("vec_id"))
    },
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |d AS (SELECT c.vec_id AS cid, p.vec_id AS pid, sum(c.v*p.v) AS dot
        |      FROM f c JOIN f p ON c.i = p.i AND p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id
        |      GROUP BY 1, 2),
        |m AS (SELECT cid AS vec_id, max(dot / (nc.nrm * np.nrm)) AS mc
        |      FROM d JOIN n nc ON nc.vec_id = cid JOIN n np ON np.vec_id = pid
        |      GROUP BY 1)
        |SELECT vec_id, round(mc, 4) AS max_probe_cos, (mc >= 0.35)::INT AS hit
        |FROM m ORDER BY vec_id""".stripMargin
    )
  )

  // ---- T24: CCNet-style perplexity partitioning (FULL oracle: the
  // q93 target-LM scoring replay + the exact order-statistic cut rule
  // — histogram, running count, min(ppl) at ceil(phi*n) — and the
  // bucket CASE, all replayed verbatim; cut literals are the same
  // doubles on both engines via Double.toString round-trip) ------------
  val q98 = Q(
    "q98_ppl_buckets",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.train(docs.where(col("source") === "src0"), "text", "doc_id")
      graft.text.PplBuckets
        .bucket(docs, "text", "doc_id", model)
        .orderBy(col("doc_id"))
    },
    Some(
      s"""WITH toks0 AS (
         |  SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS token,
         |    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
         |    string_split(text, ' ') AS l
         |  FROM documents),
         |toks AS (SELECT doc_id, token, pos,
         |           CASE WHEN pos >= 1 THEN l[pos] END AS prev FROM toks0),
         |tdocs AS (SELECT doc_id FROM documents WHERE source = 'src0'),
         |ttoks AS (SELECT t.* FROM toks t JOIN tdocs USING (doc_id)),
         |uni_t AS (SELECT token, count(*)::BIGINT AS c1 FROM ttoks GROUP BY token),
         |bi_t AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM ttoks
         |         WHERE prev IS NOT NULL GROUP BY 1, 2),
         |tot_t AS (SELECT sum(c1)::DOUBLE AS t FROM uni_t),
         |sc AS (
         |  SELECT tk.doc_id,
         |    CASE WHEN tk.pos = 0 THEN ln(COALESCE(ut.c1::DOUBLE, 0.5) / tot_t.t)
         |         WHEN bt.c2 IS NOT NULL THEN ln(bt.c2::DOUBLE / utp.c1)
         |         ELSE ln(0.4 * COALESCE(ut.c1::DOUBLE, 0.5) / tot_t.t) END AS logp
         |  FROM toks tk
         |  LEFT JOIN uni_t ut ON ut.token = tk.token
         |  LEFT JOIN uni_t utp ON utp.token = tk.prev
         |  LEFT JOIN bi_t bt ON bt.prev = tk.prev AND bt.token = tk.token
         |  CROSS JOIN tot_t),
         |w AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |        round(exp(-avg(logp)), 2) AS ppl
         |      FROM sc GROUP BY doc_id),
         |hist AS (SELECT ppl, count(*)::BIGINT AS c FROM w GROUP BY ppl),
         |cum AS (SELECT ppl, sum(c) OVER (ORDER BY ppl) AS cum FROM hist),
         |tot AS (SELECT sum(c)::DOUBLE AS n FROM hist),
         |cuts AS (SELECT
         |    min(CASE WHEN cum >= ceil(${(1.0 / 3.0).toString} * n) THEN ppl END) AS cut0,
         |    min(CASE WHEN cum >= ceil(${(2.0 / 3.0).toString} * n) THEN ppl END) AS cut1
         |  FROM cum CROSS JOIN tot)
         |SELECT doc_id, n_tokens, ppl,
         |  CASE WHEN ppl <= cut0 THEN 'head'
         |       WHEN ppl <= cut1 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM w CROSS JOIN cuts ORDER BY doc_id""".stripMargin
    )
  )

  // ---- P17: content-defined chunking dedup (FULL oracle: boundary
  // hashes, cut lists, chunk segmentation, chunk hashes, and the
  // cross-doc dup stats all replayed — the shared 60-bit md5 hash makes
  // the window predicate engine-portable) ------------------------------
  val q99 = Q(
    "q99_cdc_dedup",
    (s, dir) =>
      graft.dedup.CdcChunks
        .dedupStats(Tables.documents(s, dir), "text", "doc_id", window = 8, divisor = 32)
        .orderBy(col("doc_id")),
    Some(
      s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) >= 1),
         |pos AS (SELECT doc_id, text, unnest(generate_series(8, n - 1)) AS i
         |        FROM d WHERE n >= 9),
         |b AS (SELECT doc_id, i FROM pos
         |      WHERE ${graft.functions.SharedHash.md5Long60Sql("substr(text, i - 7, 8)")} % 32 = 0),
         |cuts AS (SELECT doc_id, list_sort(list(i)) AS c FROM b GROUP BY doc_id),
         |j AS (SELECT d.doc_id, d.text, d.n, COALESCE(cuts.c, []) AS c
         |      FROM d LEFT JOIN cuts USING (doc_id)),
         |ch0 AS (SELECT doc_id, text, n, c, unnest(generate_series(0, len(c))) AS jx FROM j),
         |seg AS (SELECT doc_id, jx,
         |          CASE WHEN jx = 0 THEN 1 ELSE c[jx] + 1 END AS s,
         |          CASE WHEN jx = len(c) THEN n ELSE c[jx + 1] END AS e, text FROM ch0),
         |hx AS (SELECT doc_id, jx, e - s + 1 AS clen,
         |         ${graft.functions.SharedHash.md5Long60Sql("substr(text, s, e - s + 1)")} AS h
         |       FROM seg),
         |occ AS (SELECT h, count(DISTINCT doc_id) AS nd FROM hx GROUP BY h)
         |SELECT hx.doc_id, count(*)::BIGINT AS n_chunks,
         |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
         |  sum(CASE WHEN nd > 1 THEN clen ELSE 0 END)::BIGINT AS dup_chars
         |FROM hx JOIN occ ON occ.h = hx.h
         |GROUP BY hx.doc_id ORDER BY doc_id""".stripMargin
    )
  )

  // ---- P18: filtered ANN — metadata predicate applied INSIDE the IVF
  // probe (one index serves every filter). Run here in the exact mode
  // (nProbe = numCentroids: every cell probed), so the DuckDB oracle is
  // the filtered brute-force top-k; SimSpec pins the approximate-nProbe
  // recall and the partitioned path's PushedFilters plan shape. --------
  val q100 = Q(
    "q100_ann_filtered",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnIvf.topKFiltered(
        emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
        predicate = col("label").isin(1, 3),
        k = 5, numCentroids = 8, nProbe = 8)
    },
    Some(
      """WITH f AS (
        |  SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
        |      FROM f a JOIN f b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |        AND b.label IN (1, 3)
        |      GROUP BY 1, 2),
        |c AS (SELECT qid, nid, dot/(na.nrm*nb.nrm) AS cos FROM d
        |      JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid),
        |r AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk FROM c)
        |SELECT qid, nid, round(cos, 4) AS cos_sim FROM r WHERE rk <= 5""".stripMargin
    )
  )

  // ---- P17b: CDC boilerplate removal — q99's chunking composed with a
  // first-occurrence keeper election and row-local text rebuild. FULL
  // oracle: the whole chain INCLUDING the reconstructed clean_text
  // string is replayed (string_agg over kept chunks in chunk order). --
  val q101 = Q(
    "q101_cdc_clean",
    (s, dir) =>
      graft.dedup.CdcChunks
        .removeDupChunks(Tables.documents(s, dir), "text", "doc_id", window = 8, divisor = 32)
        .orderBy(col("doc_id")),
    Some(
      s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) >= 1),
         |pos AS (SELECT doc_id, text, unnest(generate_series(8, n - 1)) AS i
         |        FROM d WHERE n >= 9),
         |b AS (SELECT doc_id, i FROM pos
         |      WHERE ${graft.functions.SharedHash.md5Long60Sql("substr(text, i - 7, 8)")} % 32 = 0),
         |cuts AS (SELECT doc_id, list_sort(list(i)) AS c FROM b GROUP BY doc_id),
         |j AS (SELECT d.doc_id, d.text, d.n, COALESCE(cuts.c, []) AS c
         |      FROM d LEFT JOIN cuts USING (doc_id)),
         |ch0 AS (SELECT doc_id, text, n, c, unnest(generate_series(0, len(c))) AS jx FROM j),
         |seg AS (SELECT doc_id, jx,
         |          CASE WHEN jx = 0 THEN 1 ELSE c[jx] + 1 END AS s,
         |          CASE WHEN jx = len(c) THEN n ELSE c[jx + 1] END AS e, text FROM ch0),
         |hx AS (SELECT doc_id, jx, e - s + 1 AS clen, substr(text, s, e - s + 1) AS ctext,
         |         ${graft.functions.SharedHash.md5Long60Sql("substr(text, s, e - s + 1)")} AS h
         |       FROM seg),
         |k AS (SELECT doc_id, jx, clen, ctext,
         |        row_number() OVER (PARTITION BY h ORDER BY doc_id, jx) AS rk FROM hx),
         |kept AS (SELECT doc_id, jx, clen, ctext FROM k WHERE rk = 1),
         |agg AS (SELECT doc_id, string_agg(ctext, '' ORDER BY jx) AS clean_text,
         |          count(*)::BIGINT AS n_kept, sum(clen) AS kc
         |        FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
         |  COALESCE(agg.n_kept, 0)::BIGINT AS n_kept,
         |  (d.n - COALESCE(agg.kc, 0))::BIGINT AS removed_chars
         |FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin
    )
  )

  // ---- P17c: gear-kernel CDC dedup (rows+spec: the FNV/gear hashes are
  // not SQL-replayable — q99's md5 twin pins the stats semantics, the
  // GearChunks spec pins the kernel: coverage, bounds, resync,
  // codegen/eval parity) -----------------------------------------------
  val q102 = Q(
    "q102_cdc_gear",
    (s, dir) =>
      graft.dedup.CdcChunks
        .dedupStatsGear(
          Tables.documents(s, dir), "text", "doc_id", minLen = 16, maxLen = 256, maskBits = 5)
        .orderBy(col("doc_id")),
    None
  )

  // ---- Z21: corpus snapshot diff (FULL oracle: the derived "next
  // crawl" snapshot, the full-outer status CASE, and the CDC chunk
  // replay of BOTH versions of every edited doc — retained_chars is
  // the (id, hash) semi-join sum, replayed verbatim) --------------------
  val q103 = Q(
    "q103_corpus_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // deterministic "next crawl": every 17th id dropped, every 13th
      // surviving id re-headered (edit most chunks survive), every 11th
      // re-published under a fresh id
      val next = docs
        .where(col("doc_id") % 17 =!= 0)
        .withColumn(
          "text",
          when(col("doc_id") % 13 === 0, concat(lit("NEWHEADER "), col("text")))
            .otherwise(col("text")))
        .unionByName(
          docs
            .where(col("doc_id") % 11 === 0)
            .select(
              (col("doc_id") + 1000000L).as("doc_id"),
              concat(lit("added "), col("text")).as("text")))
      graft.ops.CorpusDiff
        .diff(docs, next, "text", "doc_id", window = 8, divisor = 32)
        .orderBy(col("doc_id"))
    },
    Some {
      def chunkChain(p: String, src: String, txt: String) =
        s"""${p}d AS (SELECT doc_id, $txt AS text, len($txt) AS n FROM $src WHERE len($txt) >= 1),
           |${p}pos AS (SELECT doc_id, text, unnest(generate_series(8, n - 1)) AS i
           |            FROM ${p}d WHERE n >= 9),
           |${p}b AS (SELECT doc_id, i FROM ${p}pos
           |      WHERE ${graft.functions.SharedHash.md5Long60Sql("substr(text, i - 7, 8)")} % 32 = 0),
           |${p}cuts AS (SELECT doc_id, list_sort(list(i)) AS c FROM ${p}b GROUP BY doc_id),
           |${p}j AS (SELECT ${p}d.doc_id, ${p}d.text, ${p}d.n, COALESCE(${p}cuts.c, []) AS c
           |      FROM ${p}d LEFT JOIN ${p}cuts USING (doc_id)),
           |${p}ch AS (SELECT doc_id, text, n, c, unnest(generate_series(0, len(c))) AS jx FROM ${p}j),
           |${p}seg AS (SELECT doc_id, jx,
           |          CASE WHEN jx = 0 THEN 1 ELSE c[jx] + 1 END AS s,
           |          CASE WHEN jx = len(c) THEN n ELSE c[jx + 1] END AS e, text FROM ${p}ch),
           |${p}hx AS (SELECT doc_id, e - s + 1 AS clen,
           |         ${graft.functions.SharedHash.md5Long60Sql("substr(text, s, e - s + 1)")} AS h
           |       FROM ${p}seg)""".stripMargin
      s"""WITH olds AS (SELECT doc_id, text FROM documents),
         |nw AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 13 = 0 THEN 'NEWHEADER ' || text ELSE text END AS text
         |  FROM documents WHERE doc_id % 17 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, 'added ' || text FROM documents WHERE doc_id % 11 = 0),
         |fj AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.text AS ot, n.text AS nt
         |      FROM olds o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id),
         |st AS (SELECT doc_id, ot, nt,
         |        CASE WHEN ot IS NULL THEN 'added' WHEN nt IS NULL THEN 'removed'
         |             WHEN ot = nt THEN 'unchanged' ELSE 'edited' END AS status FROM fj),
         |ed AS (SELECT doc_id, ot, nt FROM st WHERE status = 'edited'),
         |${chunkChain("n", "ed", "nt")},
         |${chunkChain("o", "ed", "ot")},
         |ohset AS (SELECT DISTINCT doc_id, h FROM ohx),
         |ret AS (SELECT nhx.doc_id, sum(nhx.clen)::BIGINT AS ret
         |        FROM nhx JOIN ohset ON ohset.doc_id = nhx.doc_id AND ohset.h = nhx.h
         |        GROUP BY 1)
         |SELECT st.doc_id, status, len(ot)::BIGINT AS old_chars, len(nt)::BIGINT AS new_chars,
         |  (CASE WHEN status = 'unchanged' THEN len(nt)
         |        WHEN status = 'edited' THEN COALESCE(ret.ret, 0)
         |        WHEN status = 'added' THEN 0 END)::BIGINT AS retained_chars
         |FROM st LEFT JOIN ret USING (doc_id) ORDER BY st.doc_id""".stripMargin
    }
  )

  // ---- P7i: SQ8 scalar-quantized ANN (rows+spec like the other ANN
  // families: quantization rounds through float arithmetic DuckDB
  // cannot replay bit-for-bit; SimSpec pins decode error bounds, fused
  // adc ≡ decode-then-dot parity, recall vs exact brute force, and the
  // catalog round-trip) -------------------------------------------------
  val q109 = Q(
    "q109_ann_sq8",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnSq8
        .topK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5, rerank = 20)
        .orderBy(col("qid"), col("cos_sim").desc, col("nid"))
    },
    None
  )

  // ---- T25: PMI collocation mining (FULL oracle: unigram/bigram
  // counts, the N-total cross join, and the log-ratio replayed; the
  // selection gate is the INTEGER min-count so the row set is exact) ----
  val q104 = Q(
    "q104_collocations",
    (s, dir) =>
      graft.text.Collocations
        .pmi(Tables.documents(s, dir), "text", minCount = 5)
        .orderBy(col("prev"), col("token")),
    Some(
      """WITH toks AS (SELECT string_split(text, ' ') AS a FROM documents),
        |uni AS (SELECT unnest(a) AS token FROM toks),
        |uc AS (SELECT token, count(*)::BIGINT AS c1 FROM uni GROUP BY 1),
        |tot AS (SELECT sum(c1)::DOUBLE AS n FROM uc),
        |pr AS (SELECT a[i] AS prev, a[i + 1] AS token
        |       FROM toks, unnest(generate_series(1, len(a) - 1)) AS u(i) WHERE len(a) >= 2),
        |bc AS (SELECT prev, token, count(*)::BIGINT AS c_pair FROM pr
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT bc.prev, bc.token, c_pair, up.c1 AS c_prev, ut.c1 AS c_tok,
        |  round(ln(c_pair::DOUBLE * tot.n / (up.c1::DOUBLE * ut.c1::DOUBLE)), 4) AS pmi
        |FROM bc JOIN uc up ON up.token = bc.prev JOIN uc ut ON ut.token = bc.token
        |CROSS JOIN tot ORDER BY bc.prev, bc.token""".stripMargin
    )
  )

  // ---- T26: Gopher-style rule filter (FULL oracle: every rule's
  // arithmetic replayed — the per-rule booleans make the gate auditable
  // and feed the attrition funnel) --------------------------------------
  val q105 = Q(
    "q105_rule_filter",
    (s, dir) =>
      graft.text.RuleFilter
        .withRules(Tables.documents(s, dir), "text")
        .select(
          col("doc_id"),
          col("r_word_count"),
          col("r_mean_word_len"),
          col("r_alpha"),
          col("r_stopwords"),
          col("r_dup_tokens"),
          col("r_symbols"),
          col("keep"))
        .orderBy(col("doc_id")),
    Some(
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS a FROM documents),
         |m AS (SELECT doc_id,
         |  len(a)::BIGINT AS n,
         |  len(replace(text, ' ', ''))::BIGINT AS chars,
         |  len(list_filter(a, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS alpha,
         |  len(list_intersect(a, ${TextStats.stopwords.map(w => s"'$w'").mkString("[", ",", "]")})) AS nstop,
         |  len(list_distinct(a))::BIGINT AS dst,
         |  (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')))::BIGINT
         |    AS sym
         |  FROM t),
         |r AS (SELECT doc_id,
         |  n >= ${graft.text.RuleFilter.MinWords} AND n <= ${graft.text.RuleFilter.MaxWords} AS r_word_count,
         |  chars >= 2 * n AND chars <= 10 * n AS r_mean_word_len,
         |  5 * alpha >= 4 * n AS r_alpha,
         |  nstop >= ${graft.text.RuleFilter.MinDistinctStopwords} AS r_stopwords,
         |  5 * dst >= 2 * n AS r_dup_tokens,
         |  10 * sym <= n AS r_symbols
         |  FROM m)
         |SELECT doc_id, r_word_count, r_mean_word_len, r_alpha, r_stopwords, r_dup_tokens,
         |  r_symbols,
         |  r_word_count AND r_mean_word_len AND r_alpha AND r_stopwords AND r_dup_tokens
         |    AND r_symbols AS keep
         |FROM r ORDER BY doc_id""".stripMargin
    )
  )

  // ---- P19: canonicalization-keyed exact dedup (FULL oracle: the
  // lower/strip/collapse/trim chain and md5 replayed; n_variants counts
  // the raw texts each canonical group merged). The corpus has no
  // natural reformatted copies at sf0.01, so the query plants them the
  // q103 way: every 10th doc re-published uppercased with punctuation
  // churn — raw exact dedup (q20) sees distinct texts, the canonical
  // key merges them. ----------------------------------------------------
  val q106 = Q(
    "q106_canonical_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val churned = docs
        .where(col("doc_id") % 10 === 0)
        .select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text"))
      graft.dedup.Canonical
        .dedupGroups(docs.unionByName(churned), "text", "doc_id")
        .orderBy(col("canon_hash"))
    },
    Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) || ' !!' FROM documents WHERE doc_id % 10 = 0)
        |SELECT
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS canon_hash,
        |  min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies,
        |  count(DISTINCT text)::BIGINT AS n_variants
        |FROM corpus GROUP BY 1 ORDER BY 1""".stripMargin
    )
  )

  // ---- T27: n-gram novelty / information-density scoring (FULL
  // oracle on the integer-exact columns: distinct-shingle pass, corpus
  // df, novel count and the single-division novel_frac — whose only
  // midpoint hits at sf0.01 are binary-EXACT rationals (k/32), which
  // both engines round away from zero identically. info_density is an
  // avg of 1/df rationals: probed margins put rows 9e-13 from a 4dp
  // midpoint, within summation-order noise — so it stays OUT of the
  // hashed projection and is pinned by CurationSpec instead. Short docs
  // contribute their whole text, q21's convention. ----------------------
  val q107 = Q(
    "q107_novelty",
    (s, dir) =>
      graft.text.Novelty
        .score(Tables.documents(s, dir), "text", "doc_id", n = 3,
          gramHash = graft.functions.SharedHash.md5Long60)
        .select("doc_id", "n_grams", "n_novel", "novel_frac")
        .orderBy(col("doc_id")),
    Some(
      s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS a FROM documents),
        |g0 AS (SELECT doc_id,
        |         ${graft.functions.SharedHash.md5Long60Sql("array_to_string(a[i:i+2], ' ')")} AS gram
        |       FROM toks, unnest(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
        |gshort AS (SELECT doc_id, ${graft.functions.SharedHash.md5Long60Sql("text")} AS gram
        |           FROM toks WHERE len(a) < 3),
        |grams AS (SELECT DISTINCT doc_id, gram
        |          FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
        |dfreq AS (SELECT gram, count(*)::BIGINT AS df FROM grams GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_grams,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS novel_frac
        |FROM grams JOIN dfreq USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T28: length-bucketed batch assignment (FULL oracle: the
  // power-of-two CASE ladder — integer comparisons, no float log2 —
  // the sharded row_number batching and per-batch padding replayed) ----
  val q108 = Q(
    "q108_length_buckets",
    (s, dir) =>
      graft.ops.LengthBuckets
        .assign(Tables.documents(s, dir), "text", "doc_id", batchSize = 8, nShards = 4)
        .orderBy(col("doc_id")),
    Some(
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
        |b AS (SELECT doc_id, n_tokens,
        |  CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
        |       WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
        |       WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
        |       WHEN n_tokens <= 1024 THEN 1024 ELSE 4096 END AS bucket,
        |  doc_id % 4 AS shard FROM t),
        |r AS (SELECT *, (row_number() OVER (PARTITION BY bucket, shard ORDER BY doc_id) - 1) // 8
        |        AS batch_idx FROM b),
        |f AS (SELECT *, max(n_tokens) OVER (PARTITION BY bucket, shard, batch_idx) AS batch_max
        |      FROM r)
        |SELECT doc_id, n_tokens, bucket, shard, batch_idx, batch_max,
        |  batch_max - n_tokens AS pad
        |FROM f ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T29: Count-Min sketch with FULL oracle replay — the affine
  // hash rows are the q21 minhash constants over the shared md5-60
  // token hash, so DuckDB rebuilds every cell and replays the min-over-
  // rows point query exactly (integer arithmetic < 2^62 throughout).
  // Probes are the 20 globally-hottest tokens (integer count cut,
  // deterministic tie-break). ------------------------------------------
  private val cmsW = 64
  private val cmsD = 4
  private val cmsCoefs = MinHashLsh.coefficients(cmsD, 7L)

  val q110 = Q(
    "q110_cms_counts",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      val probes = toks
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
      val sketches = graft.text.Vocab.cmsSketch(
        docs, "text", "lang", cmsW, cmsD, seed = 7L,
        tokenHash = graft.functions.SharedHash.md5Long60)
      graft.text.Vocab
        .cmsEstimates(
          sketches, probes, "token", "lang", cmsW, cmsD, seed = 7L,
          tokenHash = graft.functions.SharedHash.md5Long60)
        .orderBy(col("lang"), col("token"))
    },
    Some(
      s"""WITH consts AS (SELECT ${cmsCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${cmsCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toks AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
         |hs AS (SELECT lang, token,
         |         ${graft.functions.SharedHash.md5Long60Sql("token")} % 2147483647 AS hh
         |       FROM toks),
         |cells AS (
         |  SELECT lang, r, ((ca[r + 1] * hh + cb[r + 1]) % 2147483647) % $cmsW AS idx,
         |         count(*)::BIGINT AS c
         |  FROM hs CROSS JOIN consts, unnest(range($cmsD)) AS t(r)
         |  GROUP BY 1, 2, 3),
         |probes AS (SELECT token FROM (
         |  SELECT token, count(*) AS cnt FROM toks GROUP BY 1
         |  ORDER BY cnt DESC, token LIMIT 20)),
         |ph AS (SELECT token,
         |         ${graft.functions.SharedHash.md5Long60Sql("token")} % 2147483647 AS hh
         |       FROM probes),
         |pidx AS (SELECT token, r, ((ca[r + 1] * hh + cb[r + 1]) % 2147483647) % $cmsW AS idx
         |         FROM ph CROSS JOIN consts, unnest(range($cmsD)) AS t(r)),
         |est AS (SELECT s.lang, p.token, min(COALESCE(c.c, 0)) AS est
         |        FROM (SELECT DISTINCT lang FROM documents) s
         |        CROSS JOIN pidx p
         |        LEFT JOIN cells c ON c.lang = s.lang AND c.r = p.r AND c.idx = p.idx
         |        GROUP BY 1, 2)
         |SELECT lang, token, est FROM est ORDER BY lang, token""".stripMargin
    )
  )

  // ---- T30: eval-split construction — the T6c exact-count stratified
  // take elects a per-language eval set, the P9b 8-gram decontamination
  // then certifies the REMAINING train side against it (FULL oracle:
  // the bit-for-bit take replay composed with the span replay — the
  // whole pipeline, not the stages in isolation). ----------------------
  val q111 = Q(
    "q111_eval_split",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val eval = graft.ops.Sampling
        .takePerStratum(docs, "lang", "doc_id", n = 3)
        .select(col("doc_id"))
      val train = docs.join(eval, Seq("doc_id"), "left_anti")
      graft.dedup.SpanDedup
        .contamination(train, docs.join(eval, Seq("doc_id")), "text", "doc_id", n = 8)
        .withColumn("contaminated", col("n_hits") > 0)
        .orderBy(col("doc_id"))
    },
    Some(
      s"""WITH ev AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      PARTITION BY lang
         |      ORDER BY ${graft.functions.SharedHash.md5Long60Sql("'graft:' || doc_id::VARCHAR")}, doc_id) AS rn
         |    FROM documents)
         |  WHERE rn <= 3),
         |t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+7], ' ') AS g
         |       FROM t, UNNEST(generate_series(1, len(a) - 7)) AS u(i) WHERE len(a) >= 8),
         |gshort AS (SELECT doc_id, text AS g FROM documents
         |           WHERE len(string_split(text, ' ')) < 8),
         |grams AS (SELECT DISTINCT doc_id, g
         |          FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |probe AS (SELECT DISTINCT g FROM grams JOIN ev USING (doc_id)),
         |tr AS (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM ev))
         |SELECT g.doc_id, count(*) AS n_spans,
         |  sum(CASE WHEN p.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
         |  sum(CASE WHEN p.g IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
         |FROM grams g JOIN tr USING (doc_id) LEFT JOIN probe p USING (g)
         |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin
    )
  )

  // ---- P20: feature-hash embeddings + semantic top-k over PLAIN TEXT
  // (FULL oracle: index/sign hashing, signed-histogram cells, dense
  // assembly, L2 normalization and the pairwise cosine all replayed;
  // ranks bind to the 4dp-ROUNDED cosine in both engines — q96's
  // lesson — with nid tie-break) ---------------------------------------
  val q112 = Q(
    "q112_hash_embed",
    (s, dir) => {
      val emb = graft.sim.HashEmbed
        .embed(Tables.documents(s, dir), "text", "doc_id", dims = 64,
          tokenHash = graft.functions.SharedHash.md5Long60)
      val probes = emb.where(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("embedding").as("qv"))
      val scored = emb
        .select(col("doc_id").as("nid"), col("embedding").as("nv"))
        .crossJoin(broadcast(probes))
        .where(col("qid") =!= col("nid"))
        .withColumn(
          "cos_sim",
          round(
            aggregate(zip_with(col("qv"), col("nv"), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x),
            4))
      graft.functions.TopK.perKey(scored, Seq("qid"), "cos_sim", "nid", 3)
        .select(col("qid"), col("nid"), col("cos_sim"))
        .orderBy(col("qid"), col("cos_sim").desc, col("nid"))
    },
    Some(
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |hs AS (SELECT doc_id, ${graft.functions.SharedHash.md5Long60Sql("token")} AS h FROM toks),
         |cells AS (SELECT doc_id, h % 64 AS idx,
         |            sum(1 - 2 * ((h >> 30) & 1))::BIGINT AS s
         |          FROM hs GROUP BY 1, 2),
         |dense AS (SELECT d.doc_id, i.i AS idx, COALESCE(c.s, 0) AS s
         |          FROM (SELECT DISTINCT doc_id FROM documents) d
         |          CROSS JOIN (SELECT unnest(range(64)) AS i) i
         |          LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.idx = i.i),
         |nrm AS (SELECT doc_id, sqrt(sum(s * s)) AS n FROM dense GROUP BY 1),
         |vecs AS (SELECT dense.doc_id, idx,
         |           CASE WHEN n > 0 THEN s::DOUBLE / n ELSE s::DOUBLE END AS v
         |         FROM dense JOIN nrm USING (doc_id)),
         |pairs AS (SELECT a.doc_id AS qid, b.doc_id AS nid, sum(a.v * b.v) AS cos
         |          FROM vecs a JOIN vecs b ON a.idx = b.idx
         |            AND a.doc_id < 10 AND b.doc_id <> a.doc_id
         |          GROUP BY 1, 2),
         |r AS (SELECT qid, nid, round(cos, 4) AS cos_sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY round(cos, 4) DESC, nid) AS rk
         |      FROM pairs)
         |SELECT qid, nid, cos_sim FROM r WHERE rk <= 3 ORDER BY qid, cos_sim DESC, nid""".stripMargin
    )
  )

  // ---- T31: character-class / script profile (FULL oracle — outputs
  // are deliberately integer-only, so the replay is exact by
  // construction; the dominant CASE compares integers in fixed order) --
  val q113 = Q(
    "q113_script_profile",
    (s, dir) =>
      graft.text.TextStats
        .withScriptProfile(Tables.documents(s, dir), "text")
        .select("doc_id", "n_chars_p", "n_letters", "n_digits", "n_spaces", "n_punct",
          "n_tokens_p", "n_alpha_tokens", "n_digit_tokens", "dominant")
        .orderBy(col("doc_id")),
    Some(
      """SELECT doc_id,
        |  len(text)::BIGINT AS n_chars_p,
        |  len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_letters,
        |  len(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digits,
        |  (len(text) - len(replace(text, ' ', '')))::BIGINT AS n_spaces,
        |  (len(text) - len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |    - len(regexp_replace(text, '[^0-9]', '', 'g'))
        |    - (len(text) - len(replace(text, ' ', ''))))::BIGINT AS n_punct,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens_p,
        |  len(list_filter(string_split(text, ' '),
        |    x -> regexp_matches(x, '^[A-Za-z]+$')))::BIGINT AS n_alpha_tokens,
        |  len(list_filter(string_split(text, ' '),
        |    x -> regexp_matches(x, '^[0-9]+$')))::BIGINT AS n_digit_tokens,
        |  CASE
        |    WHEN len(regexp_replace(text, '[^A-Za-z]', '', 'g')) >= len(regexp_replace(text, '[^0-9]', '', 'g'))
        |     AND len(regexp_replace(text, '[^A-Za-z]', '', 'g')) >=
        |       (len(text) - len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |         - len(regexp_replace(text, '[^0-9]', '', 'g'))
        |         - (len(text) - len(replace(text, ' ', ''))))
        |    THEN 'alpha'
        |    WHEN len(regexp_replace(text, '[^0-9]', '', 'g')) >=
        |       (len(text) - len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |         - len(regexp_replace(text, '[^0-9]', '', 'g'))
        |         - (len(text) - len(replace(text, ' ', ''))))
        |    THEN 'digit'
        |    ELSE 'punct' END AS dominant
        |FROM documents ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T32: Zipf-slope vocabulary diagnostic — the corpus statistics
  // engine eating its own dogfood: Vocab.top supplies the (rank, freq)
  // frame and the C4 OLS operator fits ln(freq) ~ ln(rank); a natural
  // corpus is near slope -1, strong deviations flag synthetic or
  // templated text. FULL oracle via DuckDB regr_slope/regr_intercept
  // (the q04 pattern; deterministic top-100 cut via (freq DESC, token)).
  val q114 = Q(
    "q114_zipf_slope",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val top = graft.text.Vocab
        .top(Tables.documents(s, dir), "text", "doc_id", k = 100)
        .withColumn(
          "rank",
          row_number().over(Window.orderBy(col("term_freq").desc, col("token"))))
      val logs = top.select(
        log(col("rank").cast("double")).as("x"),
        log(col("term_freq").cast("double")).as("y"))
      val m = graft.ml.Ols.fit(logs, "y", Seq("x"))
      Seq((BigDecimal(m.coef(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(m.coef(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        m.n))
        .toDF("slope", "intercept", "n")
    },
    Some(
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |uc AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY 1),
        |top AS (SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS r
        |        FROM uc ORDER BY c DESC, token LIMIT 100),
        |l AS (SELECT ln(r::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM top)
        |SELECT round(regr_slope(y, x), 4) AS slope,
        |  round(regr_intercept(y, x), 4) AS intercept,
        |  count(*)::BIGINT AS n
        |FROM l""".stripMargin
    )
  )

  // ---- T33: KMV corpus-overlap sketches (FULL oracle — the kept
  // hash values are the k smallest distinct md5-60 token hashes, which
  // DuckDB replays with row_number() OVER (ORDER BY h); theta, the
  // restricted intersections/unions and both estimates are
  // deterministic functions of those values, so the whole frame
  // hash-matches). k = 16 keeps every sf0.01 sketch FULL (per-source
  // vocab ≈ 30 distinct tokens), exercising the estimator branch, not
  // just the exact-set degenerate case.
  val q115 = Q(
    "q115_corpus_overlap",
    (s, dir) => {
      val sk = graft.text.CorpusOverlap
        .sketches(Tables.documents(s, dir), "text", "source", k = 16)
      graft.text.CorpusOverlap.pairOverlap(sk)
        .orderBy(col("src_a"), col("src_b"))
    },
    Some(
      s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
         |hs AS (SELECT DISTINCT source, ${graft.functions.SharedHash.md5Long60Sql("tok")} AS h FROM toks),
         |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM hs),
         |sk AS (SELECT source, h FROM rk WHERE r <= 16),
         |th AS (SELECT source, count(*) AS nk,
         |         CASE WHEN count(*) >= 16 THEN max(h) ELSE 1152921504606846976 END AS theta
         |       FROM sk GROUP BY 1),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b,
         |         least(a.theta, b.theta) AS theta
         |       FROM th a JOIN th b ON a.source < b.source),
         |fa AS (SELECT p.src_a, p.src_b, s.h FROM pr p
         |       JOIN sk s ON s.source = p.src_a AND s.h < p.theta),
         |fb AS (SELECT p.src_a, p.src_b, s.h FROM pr p
         |       JOIN sk s ON s.source = p.src_b AND s.h < p.theta),
         |un AS (SELECT src_a, src_b, count(DISTINCT h) AS n_union
         |       FROM (SELECT * FROM fa UNION ALL SELECT * FROM fb) GROUP BY 1, 2),
         |ix AS (SELECT fa.src_a, fa.src_b, count(*) AS n_inter FROM fa
         |       JOIN fb ON fa.src_a = fb.src_a AND fa.src_b = fb.src_b AND fa.h = fb.h
         |       GROUP BY 1, 2)
         |SELECT p.src_a, p.src_b, p.theta,
         |  COALESCE(ix.n_inter, 0)::BIGINT AS n_inter,
         |  un.n_union::BIGINT AS n_union,
         |  round(COALESCE(ix.n_inter, 0) / un.n_union, 4) AS jaccard_kmv,
         |  round(COALESCE(ix.n_inter, 0) * (1152921504606846976.0 / p.theta), 4) AS inter_est
         |FROM pr p
         |JOIN un ON un.src_a = p.src_a AND un.src_b = p.src_b
         |LEFT JOIN ix ON ix.src_a = p.src_a AND ix.src_b = p.src_b
         |ORDER BY p.src_a, p.src_b""".stripMargin
    )
  )

  // ---- P7j: binary sign-quantized ANN (FULL oracle — sign packing,
  // the popcount scan, the (hamming, nid) shortlist cut AND the exact
  // cosine rerank all replay in DuckDB; the only float arithmetic is
  // the rerank cosine, rounded like q24/q25/q112). shortlist = 40 of
  // 499 keeps the approximation real (a wrong shortlist changes the
  // answer) while recall stays pinned by AnnBinarySpec.
  val q116 = Q(
    "q116_ann_binary",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnBinary
        .topK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
          k = 3, shortlist = 40)
        .orderBy(col("qid"), col("cos_sim").desc, col("nid"))
    },
    Some(
      """WITH dims AS (SELECT unnest(range(64)) AS i),
        |sb AS (SELECT e.vec_id, d.i // 32 AS w, d.i % 32 AS b,
        |         CASE WHEN e.embedding[d.i + 1] < 0 THEN 1 ELSE 0 END AS bit
        |       FROM embeddings e CROSS JOIN dims d),
        |words AS (SELECT vec_id, w, sum(bit * (1::BIGINT << b))::BIGINT AS word
        |          FROM sb GROUP BY 1, 2),
        |ham AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |          sum(bit_count(xor(a.word, b.word)))::BIGINT AS hamming
        |        FROM words a JOIN words b ON a.w = b.w
        |          AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |        GROUP BY 1, 2),
        |cand AS (SELECT qid, nid FROM
        |           (SELECT qid, nid,
        |              row_number() OVER (PARTITION BY qid ORDER BY hamming, nid) AS r
        |            FROM ham)
        |         WHERE r <= 40),
        |nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nv FROM
        |          (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
        |        GROUP BY 1),
        |dots AS (SELECT c.qid, c.nid,
        |           sum(eq.embedding[d.i + 1]::DOUBLE * en.embedding[d.i + 1]::DOUBLE) AS dot
        |         FROM cand c
        |         JOIN embeddings eq ON eq.vec_id = c.qid
        |         JOIN embeddings en ON en.vec_id = c.nid
        |         CROSS JOIN dims d GROUP BY 1, 2),
        |scored AS (SELECT dots.qid, dots.nid,
        |             round(dot / (q.nv * n.nv), 4) AS cos_sim
        |           FROM dots JOIN nrm q ON q.vec_id = dots.qid
        |           JOIN nrm n ON n.vec_id = dots.nid),
        |rk AS (SELECT qid, nid, cos_sim,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS r
        |       FROM scored)
        |SELECT qid, nid, cos_sim FROM rk WHERE r <= 3
        |ORDER BY qid, cos_sim DESC, nid""".stripMargin
    )
  )

  // ---- T34: WordPiece tokenizer (rows-only by design — likelihood-
  // score training is iterative and not ANSI-SQL-expressible, the
  // declared pattern for all three tokenizer families; semantics are
  // pinned by WordPieceSpec: BERT greedy longest-match reference
  // cases, the PMI-vs-frequency trainer difference vs BPE, UNK-free
  // roundtrip on the training corpus, catalog persistence parity).
  // n_unk is 0 here BY CONSTRUCTION (vocab trained on the same corpus
  // covers its alphabet) — the column is real signal on held-out text.
  val q117 = Q(
    "q117_wordpiece",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.text.WordPiece.trainOn(docs, "text", numMerges = 64)
      graft.text.WordPiece.tokenize(docs, "text", "doc_id", vocab)
        .select("doc_id", "n_pieces", "n_unk")
        .orderBy("doc_id")
    },
    None
  )

  // ---- T35: G² log-likelihood keyness per source (FULL oracle — G²
  // is a per-row closed form over integer counts, no summation; the
  // overrepresentation gate is an EXACT integer cross-product; ranking
  // binds to the 4dp-rounded statistic per the q96/q112 convention) --
  val q118 = Q(
    "q118_keyness",
    (s, dir) =>
      graft.text.Keyness
        .topKeyness(Tables.documents(s, dir), "text", "source", k = 5)
        .orderBy(col("corpus"), col("rk")),
    Some(
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT source AS corpus, token, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2),
        |ct AS (SELECT corpus, sum(cnt)::BIGINT AS n1 FROM c GROUP BY 1),
        |tt AS (SELECT token, sum(cnt)::BIGINT AS tok_total FROM c GROUP BY 1),
        |g AS (SELECT sum(cnt)::BIGINT AS n FROM c),
        |s AS (SELECT c.corpus, c.token, c.cnt AS n_self, tt.tok_total - c.cnt AS n_rest,
        |        2.0 * (CASE WHEN c.cnt > 0
        |                 THEN c.cnt::DOUBLE * ln(c.cnt::DOUBLE /
        |                   (ct.n1::DOUBLE * tt.tok_total::DOUBLE / g.n::DOUBLE))
        |                 ELSE 0.0 END
        |             + CASE WHEN tt.tok_total - c.cnt > 0
        |                 THEN (tt.tok_total - c.cnt)::DOUBLE * ln((tt.tok_total - c.cnt)::DOUBLE /
        |                   ((g.n - ct.n1)::DOUBLE * tt.tok_total::DOUBLE / g.n::DOUBLE))
        |                 ELSE 0.0 END) AS g2,
        |        c.cnt * (g.n - ct.n1) > (tt.tok_total - c.cnt) * ct.n1 AS over
        |      FROM c JOIN ct USING (corpus) JOIN tt USING (token) CROSS JOIN g),
        |rk AS (SELECT corpus, token, n_self, n_rest, round(g2, 4) AS g2,
        |         row_number() OVER (PARTITION BY corpus
        |           ORDER BY round(g2, 4) DESC, token) AS rk
        |       FROM s WHERE over)
        |SELECT corpus, token, n_self, n_rest, g2, rk FROM rk WHERE rk <= 5
        |ORDER BY corpus, rk""".stripMargin
    )
  )

  // ---- T36: Jensen–Shannon source drift vs the global distribution
  // (FULL oracle — the sum runs over the dense corpus×vocab frame on
  // both engines; 4dp rounding absorbs summation-order noise, margins
  // probed per the float-threshold protocol) -------------------------
  val q119 = Q(
    "q119_js_drift",
    (s, dir) =>
      graft.text.Keyness
        .jsDivergence(Tables.documents(s, dir), "text", "source")
        .orderBy(col("corpus")),
    Some(
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT source AS corpus, token, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2),
        |ct AS (SELECT corpus, sum(cnt)::BIGINT AS n1 FROM c GROUP BY 1),
        |tt AS (SELECT token, sum(cnt)::BIGINT AS tok_total FROM c GROUP BY 1),
        |g AS (SELECT sum(cnt)::BIGINT AS n FROM c),
        |dense AS (SELECT ct.corpus, tt.token, COALESCE(c.cnt, 0) AS cnt,
        |            ct.n1, tt.tok_total, g.n
        |          FROM ct CROSS JOIN tt
        |          LEFT JOIN c ON c.corpus = ct.corpus AND c.token = tt.token
        |          CROSS JOIN g),
        |terms AS (SELECT corpus,
        |            CASE WHEN cnt > 0
        |              THEN 0.5 * (cnt::DOUBLE / n1::DOUBLE) *
        |                ln((cnt::DOUBLE / n1::DOUBLE) /
        |                   ((cnt::DOUBLE / n1::DOUBLE + tok_total::DOUBLE / n::DOUBLE) / 2.0))
        |              ELSE 0.0 END
        |          + CASE WHEN tok_total > 0
        |              THEN 0.5 * (tok_total::DOUBLE / n::DOUBLE) *
        |                ln((tok_total::DOUBLE / n::DOUBLE) /
        |                   ((cnt::DOUBLE / n1::DOUBLE + tok_total::DOUBLE / n::DOUBLE) / 2.0))
        |              ELSE 0.0 END AS term
        |          FROM dense)
        |SELECT corpus, round(sum(term), 4) AS js_div FROM terms GROUP BY corpus
        |ORDER BY corpus""".stripMargin
    )
  )

  // ---- P21: hard-negative mining (FULL oracle — a three-operator
  // composition replayed end-to-end: the q54 signature/banding/verify/
  // reachability cluster replay + the q112 hash-embed replay + the
  // exclusion join + the rank cut on the ROUNDED cosine; the q54/q111
  // composition argument — stages verified alone can still disagree at
  // the seams) -------------------------------------------------------
  val q120 = Q(
    "q120_hard_negatives",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.sim.HardNegatives
        .mine(docs, "text", "doc_id", docs.where(col("doc_id") < 10), dims = 64, k = 3)
        .orderBy(col("qid"), col("rank"))
    },
    Some(
      s"""WITH RECURSIVE consts AS (SELECT ${mhCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${mhCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toksw AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') AS g
         |       FROM toksw, UNNEST(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
         |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text, ' ')) < 3),
         |grams AS (SELECT DISTINCT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("g")} AS sh
         |  FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |hl AS (SELECT doc_id, list(sh % 2147483647) AS hs, list(sh) AS ss FROM grams GROUP BY doc_id),
         |sig AS (SELECT doc_id, ss,
         |    list_transform(range(64), i ->
         |      list_min(list_transform(hs, h -> (ca[i + 1] * h + cb[i + 1]) % 2147483647))) AS s
         |  FROM hl CROSS JOIN consts),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(16), bb ->
         |    list_slice(a.s, bb * 4 + 1, bb * 4 + 4) = list_slice(b.s, bb * 4 + 1, bb * 4 + 4))) > 0
         |  AND round(len(list_filter(a.ss, x -> list_contains(b.ss, x)))::DOUBLE /
         |    (len(a.ss) + len(b.ss) - len(list_filter(a.ss, x -> list_contains(b.ss, x)))), 4) >= 0.5),
         |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
         |clus AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |hs2 AS (SELECT doc_id, ${graft.functions.SharedHash.md5Long60Sql("token")} AS h FROM toks),
         |cells AS (SELECT doc_id, h % 64 AS idx,
         |            sum(1 - 2 * ((h >> 30) & 1))::BIGINT AS s
         |          FROM hs2 GROUP BY 1, 2),
         |dense AS (SELECT d.doc_id, i.i AS idx, COALESCE(c.s, 0) AS s
         |          FROM (SELECT DISTINCT doc_id FROM documents) d
         |          CROSS JOIN (SELECT unnest(range(64)) AS i) i
         |          LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.idx = i.i),
         |nrm AS (SELECT doc_id, sqrt(sum(s * s)) AS n FROM dense GROUP BY 1),
         |vecs AS (SELECT dense.doc_id, idx,
         |           CASE WHEN n > 0 THEN s::DOUBLE / n ELSE s::DOUBLE END AS v
         |         FROM dense JOIN nrm USING (doc_id)),
         |pairsc AS (SELECT a.doc_id AS qid, b.doc_id AS nid, round(sum(a.v * b.v), 4) AS cos_sim
         |           FROM vecs a JOIN vecs b ON a.idx = b.idx
         |             AND a.doc_id < 10 AND b.doc_id <> a.doc_id
         |           GROUP BY 1, 2),
         |keep AS (SELECT pc.qid, pc.nid, pc.cos_sim
         |         FROM pairsc pc
         |         JOIN clus cq ON cq.doc_id = pc.qid
         |         JOIN clus cn ON cn.doc_id = pc.nid
         |         WHERE cq.cluster <> cn.cluster),
         |rk AS (SELECT qid, nid, cos_sim,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |       FROM keep)
         |SELECT qid, nid, cos_sim, rank FROM rk WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin
    )
  )

  // ---- P22: chunk-pooled long-document embeddings (FULL oracle —
  // the q55 chunker replay feeds the q112 embed replay per chunk,
  // sum-pool + normalize per doc, cosine top-3 on the rounded value;
  // 4dp absorbs pool-summation order, margins probed) ---------------
  val q121 = Q(
    "q121_doc_embed",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.sim.DocEmbed
        .topK(docs, "text", "doc_id", docs.where(col("doc_id") < 10), k = 3)
        .orderBy(col("qid"), col("cos_sim").desc, col("nid"))
    },
    Some(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |c AS (SELECT doc_id, a, len(a)::BIGINT AS n,
         |        CASE WHEN len(a) <= 20 THEN 1
         |             ELSE (len(a) - 20 + 14) // 15 + 1 END AS nc
         |      FROM t),
         |chunks AS (SELECT doc_id, doc_id::VARCHAR || ':' || i::VARCHAR AS cid,
         |             array_to_string(a[i * 15 + 1 : least(i * 15 + 20, n)], ' ') AS chunk_text
         |           FROM c, UNNEST(generate_series(0, nc - 1)) AS u(i)),
         |toks AS (SELECT doc_id, cid, unnest(string_split(chunk_text, ' ')) AS token FROM chunks),
         |hs AS (SELECT doc_id, cid, ${graft.functions.SharedHash.md5Long60Sql("token")} AS h FROM toks),
         |cells AS (SELECT doc_id, cid, h % 64 AS idx,
         |            sum(1 - 2 * ((h >> 30) & 1))::BIGINT AS s
         |          FROM hs GROUP BY 1, 2, 3),
         |dense AS (SELECT ch.doc_id, ch.cid, i.i AS idx, COALESCE(cl.s, 0) AS s
         |          FROM chunks ch
         |          CROSS JOIN (SELECT unnest(range(64)) AS i) i
         |          LEFT JOIN cells cl ON cl.cid = ch.cid AND cl.idx = i.i),
         |cnrm AS (SELECT cid, sqrt(sum(s * s)) AS cn FROM dense GROUP BY 1),
         |cvecs AS (SELECT dense.doc_id, dense.cid, idx,
         |            CASE WHEN cn > 0 THEN s::DOUBLE / cn ELSE s::DOUBLE END AS v
         |          FROM dense JOIN cnrm USING (cid)),
         |pool AS (SELECT doc_id, idx, sum(v) AS sv FROM cvecs GROUP BY 1, 2),
         |dnrm AS (SELECT doc_id, sqrt(sum(sv * sv)) AS dn FROM pool GROUP BY 1),
         |dvecs AS (SELECT pool.doc_id, idx,
         |            CASE WHEN dn > 0 THEN sv / dn ELSE sv END AS v
         |          FROM pool JOIN dnrm USING (doc_id)),
         |pairs AS (SELECT a.doc_id AS qid, b.doc_id AS nid, round(sum(a.v * b.v), 4) AS cos_sim
         |          FROM dvecs a JOIN dvecs b ON a.idx = b.idx
         |            AND a.doc_id < 10 AND b.doc_id <> a.doc_id
         |          GROUP BY 1, 2),
         |r AS (SELECT qid, nid, cos_sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
         |      FROM pairs)
         |SELECT qid, nid, cos_sim FROM r WHERE rk <= 3
         |ORDER BY qid, cos_sim DESC, nid""".stripMargin
    )
  )

  // ---- T37a: DEFLATE compression-ratio quality tagger (rows-only by
  // design — DuckDB has no zlib; determinism and the repetition-
  // separates-from-prose property are pinned in CompressSpec) --------
  val q122 = Q(
    "q122_deflate_ratio",
    (s, dir) =>
      graft.text.Compressibility
        .deflateRatio(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id")),
    None
  )

  // ---- T37b: per-doc token Shannon entropy (FULL oracle — closed
  // form on integer counts, one per-doc sum; 4dp margins probed) -----
  val q123 = Q(
    "q123_token_entropy",
    (s, dir) =>
      graft.text.Compressibility
        .tokenEntropy(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id")),
    Some(
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2),
        |t AS (SELECT doc_id, sum(cnt)::BIGINT AS n FROM c GROUP BY 1)
        |SELECT c.doc_id,
        |  max(t.n) AS n_tokens_e,
        |  count(*)::BIGINT AS n_distinct,
        |  round(-sum((c.cnt::DOUBLE / t.n::DOUBLE) * ln(c.cnt::DOUBLE / t.n::DOUBLE)), 4) AS entropy
        |FROM c JOIN t USING (doc_id)
        |GROUP BY c.doc_id
        |ORDER BY c.doc_id""".stripMargin
    )
  )

  // ---- T38a: per-source percentile calibration (FULL oracle — the
  // q28 quality replay + percent_rank, an exact rational (rank−1)/(n−1)
  // on the 4dp-rounded score so ties resolve identically) ------------
  val q124 = Q(
    "q124_quality_pct",
    (s, dir) =>
      graft.ops.Calibrate
        .percentileWithin(
          TextStats.withQuality(Tables.documents(s, dir), "text"),
          "quality", Seq("source"))
        .select(col("doc_id"), col("source"), col("quality"), col("pct_rank"))
        .orderBy(col("doc_id")),
    Some(
      """WITH t AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (
        |  SELECT doc_id, source,
        |    len(toks)::DOUBLE AS n,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in'], tk)))::DOUBLE AS stops,
        |    len(list_distinct(toks))::DOUBLE AS uniq
        |  FROM t),
        |q AS (SELECT doc_id, source,
        |        round(least(n/100.0, 1.0)*0.4 + (1.0 - stops/n)*0.3 + (uniq/n)*0.3, 4) AS quality
        |      FROM f)
        |SELECT doc_id, source, quality,
        |  round(percent_rank() OVER (PARTITION BY source ORDER BY quality), 4) AS pct_rank
        |FROM q ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T38b: robust z (median/MAD) per source (FULL oracle — exact
  // sort-based median both engines, outputs rounded 4dp because the
  // two engines' interpolation arithmetic may differ in the last ulp) -
  val q125 = Q(
    "q125_robust_z",
    (s, dir) =>
      graft.ops.Calibrate
        .robustZ(Tables.documents(s, dir), "n_chars", Seq("source"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"), col("robust_z"))
        .orderBy(col("doc_id")),
    Some(
      """WITH m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
        |           FROM documents GROUP BY 1),
        |d AS (SELECT doc_id, documents.source, n_chars, med
        |      FROM documents JOIN m ON m.source = documents.source),
        |md AS (SELECT source, quantile_cont(abs(n_chars - med), 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  round(d.med, 4) AS med, round(md.mad, 4) AS mad,
        |  CASE WHEN md.mad > 0
        |    THEN round((d.n_chars - d.med) / (1.4826 * md.mad), 4)
        |    ELSE 0.0 END AS robust_z
        |FROM d JOIN md ON md.source = d.source
        |ORDER BY d.doc_id""".stripMargin
    )
  )

  // ---- T12b: Luhn-validated card redaction (FULL oracle). The corpus
  // has no digit runs, so the query CONSTRUCTS deterministic
  // candidates from doc_id — even ids get a computed Luhn check digit
  // and 4-4-4-4 spacing (valid, redacted, separators stripped), odd
  // ids get a bare 15-digit run that passes only when Luhn happens to
  // hold (~10%, data-dependent) — both engines replay construction,
  // checksum, and the redacted text itself. -------------------------
  val q126 = Q(
    "q126_card_redact",
    (s, dir) => {
      val base15 = concat(
        lit("4"),
        lpad(pmod(col("doc_id") * lit(2654435761L), lit(100000000000000L)).cast("string"),
          14, "0"))
      // parity-shifted sum of base15 (appended digit occupies the
      // un-doubled last slot): luhnSum(base15 || '0')
      val s0 = graft.text.Redact.luhnSum(concat(base15, lit("0")))
      val check = pmod(lit(10) - pmod(s0, lit(10)), lit(10)).cast("string")
      val full16 = concat(base15, check)
      val spaced = concat_ws(" ",
        substring(full16, 1, 4), substring(full16, 5, 4),
        substring(full16, 9, 4), substring(full16, 13, 4))
      val cand = when(col("doc_id") % 2 === 0, spaced).otherwise(base15)
      val df = Tables.documents(s, dir)
        .withColumn("txt", concat(col("text"), lit(" card "), cand))
      graft.text.Redact.withCardRedaction(df, "txt")
        .select(col("doc_id"), col("n_card_candidates"), col("n_cards"),
          col("n_luhn_rejected"), col("text_cards_redacted"))
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH cons AS (
        |  SELECT doc_id, text,
        |    '4' || lpad(((doc_id * 2654435761) % 100000000000000)::VARCHAR, 14, '0') AS base15
        |  FROM documents),
        |chk AS (
        |  SELECT doc_id, text, base15,
        |    list_sum(list_transform(range(1, len(base15 || '0') + 1), i ->
        |      CASE WHEN (len(base15 || '0') - i) % 2 = 1
        |        THEN CASE WHEN 2 * substr(base15 || '0', i, 1)::INT > 9
        |               THEN 2 * substr(base15 || '0', i, 1)::INT - 9
        |               ELSE 2 * substr(base15 || '0', i, 1)::INT END
        |        ELSE substr(base15 || '0', i, 1)::INT END))::BIGINT AS s0
        |  FROM cons),
        |cand AS (
        |  SELECT doc_id,
        |    text || ' card ' ||
        |      CASE WHEN doc_id % 2 = 0 THEN
        |        substr(f16, 1, 4) || ' ' || substr(f16, 5, 4) || ' ' ||
        |        substr(f16, 9, 4) || ' ' || substr(f16, 13, 4)
        |      ELSE base15 END AS txt
        |  FROM (SELECT *, base15 || ((10 - (s0 % 10)) % 10)::VARCHAR AS f16 FROM chk)),
        |ext AS (
        |  SELECT doc_id, txt,
        |    regexp_extract_all(txt, '\b(?:[0-9][ -]?){12,18}[0-9]\b') AS cands
        |  FROM cand),
        |val AS (
        |  SELECT doc_id, txt, cands,
        |    list_filter(cands, c ->
        |      len(replace(replace(c, ' ', ''), '-', '')) BETWEEN 13 AND 19
        |      AND list_sum(list_transform(
        |            range(1, len(replace(replace(c, ' ', ''), '-', '')) + 1), i ->
        |        CASE WHEN (len(replace(replace(c, ' ', ''), '-', '')) - i) % 2 = 1
        |          THEN CASE WHEN 2 * substr(replace(replace(c, ' ', ''), '-', ''), i, 1)::INT > 9
        |                 THEN 2 * substr(replace(replace(c, ' ', ''), '-', ''), i, 1)::INT - 9
        |                 ELSE 2 * substr(replace(replace(c, ' ', ''), '-', ''), i, 1)::INT END
        |          ELSE substr(replace(replace(c, ' ', ''), '-', ''), i, 1)::INT END)) % 10 = 0
        |    ) AS valid
        |  FROM ext)
        |SELECT doc_id,
        |  len(cands)::BIGINT AS n_card_candidates,
        |  len(valid)::BIGINT AS n_cards,
        |  (len(cands) - len(valid))::BIGINT AS n_luhn_rejected,
        |  list_reduce(list_prepend(txt, valid), (acc, c) -> replace(acc, c, '[CARD]'))
        |    AS text_cards_redacted
        |FROM val ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T39: Efraimidis–Spirakis weighted sampling without
  // replacement (FULL oracle — the exponential-clock keys are a
  // deterministic function of the salted hash, so DuckDB rebuilds
  // every key and replays the exact top-n cut; boundary margins
  // probed) ----------------------------------------------------------
  val q127 = Q(
    "q127_weighted_take",
    (s, dir) =>
      graft.ops.Sampling
        .weightedTake(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          "doc_id", "n_chars", n = 50)
        .select(col("doc_id"), col("n_chars"), round(col("__key"), 4).as("es_key"))
        .orderBy(col("doc_id")),
    Some(
      s"""WITH k AS (SELECT doc_id, n_chars,
         |  -ln((${graft.functions.SharedHash.md5Long60Sql("'graft:' || doc_id::VARCHAR")} + 1.0)
         |      / 1152921504606846976.0) / n_chars::DOUBLE AS key
         |  FROM documents)
         |SELECT doc_id, n_chars, round(key, 4) AS es_key
         |FROM (SELECT * FROM k ORDER BY key, doc_id LIMIT 50)
         |ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T40: skip-gram pair generation with word2vec subsampling
  // (FULL oracle — the keep draw is the salted-hash uniform of
  // (doc, pos), so subsampling, re-positioning and the window pairing
  // all replay; t = 1e-3 makes the subsample real on this corpus:
  // common tokens drop ~75% of occurrences) -------------------------
  val q128 = Q(
    "q128_skipgram",
    (s, dir) =>
      graft.text.SkipGram
        .pairCounts(Tables.documents(s, dir), "text", "doc_id", window = 2, t = 1e-3)
        .orderBy(col("center"), col("context")),
    Some(
      s"""WITH toks AS (SELECT doc_id, i AS pos, a[i + 1] AS token
         |  FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |    UNNEST(generate_series(0, len(a) - 1)) AS u(i)),
         |f AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY 1),
         |n AS (SELECT count(*)::BIGINT AS n FROM toks),
         |kp AS (SELECT t.doc_id, t.pos, t.token,
         |         least(1.0, (sqrt((f.c::DOUBLE / n.n::DOUBLE) / 0.001) + 1.0) * 0.001
         |           / (f.c::DOUBLE / n.n::DOUBLE)) AS p,
         |         ${graft.functions.SharedHash.md5Long60Sql(
               "'sg:' || t.doc_id::VARCHAR || ':' || t.pos::VARCHAR")}::DOUBLE
         |           / 1152921504606846976.0 AS u
         |       FROM toks t JOIN f USING (token) CROSS JOIN n),
         |kept AS (SELECT doc_id, token,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS np
         |         FROM kp WHERE u < p),
         |prs AS (SELECT a.token AS center, b.token AS context
         |        FROM kept a JOIN kept b ON a.doc_id = b.doc_id
         |          AND a.np <> b.np AND abs(a.np - b.np) <= 2)
         |SELECT center, context, count(*)::BIGINT AS cnt FROM prs
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
  )

  // ---- P20b: idf-weighted hash embeddings (FULL oracle — q112's
  // replay with the T7 smoothed-idf weight joined on the token hash;
  // cells are double sums so 4dp absorbs summation order, margins
  // probed) ----------------------------------------------------------
  val q129 = Q(
    "q129_hash_embed_idf",
    (s, dir) => {
      val emb = graft.sim.HashEmbed
        .embedIdf(Tables.documents(s, dir), "text", "doc_id", dims = 64,
          tokenHash = graft.functions.SharedHash.md5Long60)
      val probes = emb.where(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("embedding").as("qv"))
      val scored = emb
        .select(col("doc_id").as("nid"), col("embedding").as("nv"))
        .crossJoin(broadcast(probes))
        .where(col("qid") =!= col("nid"))
        .withColumn(
          "cos_sim",
          round(
            aggregate(zip_with(col("qv"), col("nv"), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x),
            4))
      graft.functions.TopK.perKey(scored, Seq("qid"), "cos_sim", "nid", 3)
        .select(col("qid"), col("nid"), col("cos_sim"))
        .orderBy(col("qid"), col("cos_sim").desc, col("nid"))
    },
    Some(
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |hs AS (SELECT doc_id, ${graft.functions.SharedHash.md5Long60Sql("token")} AS h FROM toks),
         |dfq AS (SELECT h, count(DISTINCT doc_id)::BIGINT AS dfc FROM hs GROUP BY 1),
         |nn AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents),
         |cells AS (SELECT hs.doc_id, hs.h % 64 AS idx,
         |            sum((1 - 2 * ((hs.h >> 30) & 1))::DOUBLE *
         |                (ln((1.0 + nn.n) / (dfq.dfc::DOUBLE + 1.0)) + 1.0)) AS s
         |          FROM hs JOIN dfq USING (h) CROSS JOIN nn GROUP BY 1, 2),
         |dense AS (SELECT d.doc_id, i.i AS idx, COALESCE(c.s, 0.0) AS s
         |          FROM (SELECT DISTINCT doc_id FROM documents) d
         |          CROSS JOIN (SELECT unnest(range(64)) AS i) i
         |          LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.idx = i.i),
         |nrm AS (SELECT doc_id, sqrt(sum(s * s)) AS nv FROM dense GROUP BY 1),
         |vecs AS (SELECT dense.doc_id, idx,
         |           CASE WHEN nv > 0 THEN s / nv ELSE s END AS v
         |         FROM dense JOIN nrm USING (doc_id)),
         |pairs AS (SELECT a.doc_id AS qid, b.doc_id AS nid, round(sum(a.v * b.v), 4) AS cos_sim
         |          FROM vecs a JOIN vecs b ON a.idx = b.idx
         |            AND a.doc_id < 10 AND b.doc_id <> a.doc_id
         |          GROUP BY 1, 2),
         |r AS (SELECT qid, nid, cos_sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
         |      FROM pairs)
         |SELECT qid, nid, cos_sim FROM r WHERE rk <= 3
         |ORDER BY qid, cos_sim DESC, nid""".stripMargin
    )
  )

  // ---- P7k: multi-probe LSH (rows-only like every recall-floor ANN
  // row — the splitmix64 plane construction has no SQL replay; the
  // probe-set algebra and the recall-vs-single-probe gain are pinned
  // in SimSpec) ------------------------------------------------------
  val q130 = Q(
    "q130_ann_multiprobe",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.AnnLsh
        .topKMultiProbe(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
          dims = 64, k = 5, numPlanes = 4, numTables = 4, numProbes = 5)
        .orderBy(col("qid"), col("cos_sim").desc, col("nid"))
    },
    None
  )

  // ---- S21a/b: ordered funnel analysis (FULL oracles — the one-pass
  // per-user fold is equivalent to the sequential-minimum definition
  // under the (ts, step) tie rule; the oracle replays the sequential
  // form, so the equivalence itself is what the hash-match checks) ---
  private val funnelSteps = Seq("signup", "view", "click", "purchase")

  val q131 = Q(
    "q131_funnel_users",
    (s, dir) =>
      graft.ops.Funnel
        .userFunnel(Tables.events(s, dir), "user_id", "event_type", "ts", funnelSteps)
        .orderBy(col("user_id")),
    Some(
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
        |       JOIN s3 ON s3.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1)
        |SELECT s1.user_id,
        |  CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
        |       WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS steps_completed,
        |  s1.t1 AS t_first,
        |  COALESCE(t4, t3, t2, s1.t1) AS t_done
        |FROM s1
        |LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |LEFT JOIN s4 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin
    )
  )

  val q132 = Q(
    "q132_funnel_conversion",
    (s, dir) =>
      graft.ops.Funnel
        .conversion(Tables.events(s, dir), "user_id", "event_type", "ts", funnelSteps)
        .orderBy(col("step")),
    Some(
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
        |       JOIN s3 ON s3.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1),
        |cnt AS (SELECT 1 AS step, 'signup' AS step_name, (SELECT count(*) FROM s1)::BIGINT AS users
        |        UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)::BIGINT
        |        UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)::BIGINT
        |        UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)::BIGINT)
        |SELECT step, step_name, users,
        |  round(users::DOUBLE / (SELECT users FROM cnt WHERE step = 1)::DOUBLE, 4) AS conv_rate
        |FROM cnt ORDER BY step""".stripMargin
    )
  )

  // ---- S22: cohort retention (FULL oracle — integer epoch-day
  // buckets on both engines, no calendar-truncation conventions) -----
  val q133 = Q(
    "q133_retention",
    (s, dir) =>
      graft.ops.Cohorts
        .retention(Tables.events(s, dir), "user_id", "ts")
        .orderBy(col("cohort_day"), col("day_offset")),
    Some(
      """WITH act AS (SELECT DISTINCT user_id,
        |               floor(epoch(ts) / 86400)::BIGINT AS day FROM events),
        |fd AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*)::BIGINT AS cohort_size FROM fd GROUP BY 1),
        |r AS (SELECT fd.cohort_day, act.day - fd.cohort_day AS day_offset,
        |        count(DISTINCT act.user_id)::BIGINT AS n_active
        |      FROM act JOIN fd ON fd.user_id = act.user_id
        |      GROUP BY 1, 2)
        |SELECT r.cohort_day, r.day_offset, r.n_active, sz.cohort_size,
        |  round(r.n_active::DOUBLE / sz.cohort_size::DOUBLE, 4) AS retention
        |FROM r JOIN sz ON sz.cohort_day = r.cohort_day
        |ORDER BY r.cohort_day, r.day_offset""".stripMargin
    )
  )

  // ---- T3b: language-confusion matrix (FULL oracle — the q29
  // classifier replay aggregated against the declared label) ---------
  val q134 = Q(
    "q134_lang_confusion",
    (s, dir) =>
      graft.text.LangId
        .confusion(Tables.documents(s, dir), "text", "lang")
        .orderBy(col("label"), col("pred_lang")),
    Some(
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, tk -> list_contains(['the','a','of','and','is'], tk))) AS h_en,
        |    len(list_filter(toks, tk -> list_contains(['el','la','de','que','y'], tk))) AS h_es,
        |    len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist'], tk))) AS h_de,
        |    len(list_filter(toks, tk -> list_contains(['le','les','une','et','est'], tk))) AS h_fr,
        |    len(list_filter(toks, tk -> list_contains(['的','是','在','了','我'], tk))) AS h_zh
        |  FROM t),
        |p AS (SELECT lang AS label,
        |  CASE WHEN greatest(h_en, h_es, h_de, h_fr, h_zh) = 0 THEN 'und'
        |       WHEN h_en = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'en'
        |       WHEN h_es = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'es'
        |       WHEN h_de = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'de'
        |       WHEN h_fr = greatest(h_en, h_es, h_de, h_fr, h_zh) THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |  FROM h),
        |c AS (SELECT label, pred_lang, count(*)::BIGINT AS n FROM p GROUP BY 1, 2),
        |tt AS (SELECT label, sum(n)::BIGINT AS label_total FROM c GROUP BY 1)
        |SELECT c.label, c.pred_lang, c.n, tt.label_total,
        |  round(c.n::DOUBLE / tt.label_total::DOUBLE, 4) AS share
        |FROM c JOIN tt ON tt.label = c.label
        |ORDER BY c.label, c.pred_lang""".stripMargin
    )
  )

  // ---- T12c: k-anonymity audit on quasi-identifiers (FULL oracle —
  // pure integer group arithmetic) -----------------------------------
  val q135 = Q(
    "q135_k_anonymity",
    (s, dir) =>
      graft.ops.Anonymity
        .audit(Tables.documents(s, dir), Seq("source", "lang"), k = 5)
        .orderBy(col("source"), col("lang")),
    Some(
      """SELECT source, lang, count(*)::BIGINT AS group_n,
        |  count(*) < 5 AS at_risk
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin
    )
  )

  // ---- Z10: per-source dataset-card report (FULL oracle — the whole
  // composition replayed: volume counts + the q115 KMV estimate + the
  // q28 quality mean + the q119 JS drift, joined on source) ----------
  val q136 = Q(
    "q136_source_report",
    (s, dir) =>
      graft.ops.SourceReport
        .build(Tables.documents(s, dir), "text", "source", kmvK = 16)
        .orderBy(col("source")),
    Some(
      s"""WITH vol AS (SELECT source, count(*)::BIGINT AS n_docs,
         |               sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
         |             FROM documents GROUP BY 1),
         |toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
         |hs AS (SELECT DISTINCT source, ${graft.functions.SharedHash.md5Long60Sql("tok")} AS h FROM toks),
         |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM hs),
         |sk AS (SELECT source, h FROM rk WHERE r <= 16),
         |vocab AS (SELECT source,
         |            CASE WHEN count(*) >= 16
         |              THEN round(15.0 * (1152921504606846976.0 / max(h)), 4)
         |              ELSE count(*)::DOUBLE END AS distinct_est
         |          FROM sk GROUP BY 1),
         |qf AS (SELECT source,
         |         len(string_split(text, ' '))::DOUBLE AS n,
         |         len(list_filter(string_split(text, ' '),
         |           tk -> list_contains(['the','a','of','and','is','to','in'], tk)))::DOUBLE AS stops,
         |         len(list_distinct(string_split(text, ' ')))::DOUBLE AS uniq
         |       FROM documents),
         |qual AS (SELECT source, round(avg(round(
         |           least(n/100.0, 1.0)*0.4 + (1.0 - stops/n)*0.3 + (uniq/n)*0.3, 4)), 4)
         |           AS mean_quality
         |         FROM qf GROUP BY 1),
         |c AS (SELECT source AS corpus, tok AS token, count(*)::BIGINT AS cnt
         |      FROM toks GROUP BY 1, 2),
         |ct AS (SELECT corpus, sum(cnt)::BIGINT AS n1 FROM c GROUP BY 1),
         |tt AS (SELECT token, sum(cnt)::BIGINT AS tok_total FROM c GROUP BY 1),
         |g AS (SELECT sum(cnt)::BIGINT AS n FROM c),
         |dense AS (SELECT ct.corpus, tt.token, COALESCE(c.cnt, 0) AS cnt,
         |            ct.n1, tt.tok_total, g.n
         |          FROM ct CROSS JOIN tt
         |          LEFT JOIN c ON c.corpus = ct.corpus AND c.token = tt.token
         |          CROSS JOIN g),
         |terms AS (SELECT corpus,
         |            CASE WHEN cnt > 0
         |              THEN 0.5 * (cnt::DOUBLE / n1::DOUBLE) *
         |                ln((cnt::DOUBLE / n1::DOUBLE) /
         |                   ((cnt::DOUBLE / n1::DOUBLE + tok_total::DOUBLE / n::DOUBLE) / 2.0))
         |              ELSE 0.0 END
         |          + CASE WHEN tok_total > 0
         |              THEN 0.5 * (tok_total::DOUBLE / n::DOUBLE) *
         |                ln((tok_total::DOUBLE / n::DOUBLE) /
         |                   ((cnt::DOUBLE / n1::DOUBLE + tok_total::DOUBLE / n::DOUBLE) / 2.0))
         |              ELSE 0.0 END AS term
         |          FROM dense),
         |drift AS (SELECT corpus AS source, round(sum(term), 4) AS js_div
         |          FROM terms GROUP BY corpus)
         |SELECT vol.source, vol.n_docs, vol.n_tokens, vocab.distinct_est,
         |  qual.mean_quality, drift.js_div
         |FROM vol JOIN vocab USING (source) JOIN qual USING (source)
         |JOIN drift USING (source)
         |ORDER BY vol.source""".stripMargin
    )
  )

  // ---- T41: tokenizer bake-off (rows-only — three trainings are
  // iterative; the fertility relationships are pinned in TextSpec).
  // The selection telemetry a pipeline runs before committing a
  // tokenizer: tokens/word (fertility) and bytes/token per family on
  // the SAME corpus.
  val q137 = Q(
    "q137_tokenizer_bakeoff",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val base = docs.agg(
        sum(size(split(col("text"), " ")).cast("long")).as("w"),
        sum(octet_length(col("text")).cast("long")).as("b")).head()
      val (nWords, nBytes) = (base.getLong(0), base.getLong(1))
      val bpeN = graft.text.Bpe
        .tokenize(docs, "text", "doc_id", graft.text.Bpe.trainOn(docs, "text", 32))
        .agg(sum("n_tokens_bpe")).head().getLong(0)
      val wpN = graft.text.WordPiece
        .tokenize(docs, "text", "doc_id", graft.text.WordPiece.trainOn(docs, "text", 32))
        .agg(sum("n_pieces")).head().getLong(0)
      val ugN = graft.text.UnigramLm
        .withPieces(docs, "text", "doc_id",
          graft.text.UnigramLm.train(docs, "text", targetVocab = 400,
            maxPieceLen = 6, seedSize = 1000))
        .agg(sum("n_pieces").cast("long")).head().getLong(0)
      Seq(
        ("whitespace", nWords), ("bpe", bpeN), ("wordpiece", wpN), ("unigram", ugN))
        .toDF("family", "n_tokens")
        .withColumn("tokens_per_word",
          round(col("n_tokens").cast("double") / nWords.toDouble, 4))
        .withColumn("bytes_per_token",
          round(lit(nBytes.toDouble) / col("n_tokens").cast("double"), 4))
        .orderBy(col("family"))
    },
    None
  )

  // ---- P2d: dedup threshold sweep (FULL oracle — the q21/q54
  // signature+banding replay WITHOUT the threshold filter, verified
  // Jaccard binned and cumulated) ------------------------------------
  val q138 = Q(
    "q138_dedup_sweep",
    (s, dir) =>
      MinHashLsh
        .thresholdSweep(Tables.documents(s, dir), "text", "doc_id", bins = 10,
          gramHash = graft.functions.SharedHash.md5Long60)
        .orderBy(col("bin")),
    Some(
      s"""WITH consts AS (SELECT ${mhCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${mhCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') AS g
         |       FROM toks, UNNEST(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
         |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text, ' ')) < 3),
         |grams AS (SELECT DISTINCT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("g")} AS sh
         |  FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |hl AS (SELECT doc_id, list(sh % 2147483647) AS hs, list(sh) AS ss FROM grams GROUP BY doc_id),
         |sig AS (SELECT doc_id, ss,
         |    list_transform(range(64), i ->
         |      list_min(list_transform(hs, h -> (ca[i + 1] * h + cb[i + 1]) % 2147483647))) AS s
         |  FROM hl CROSS JOIN consts),
         |p AS (SELECT round(len(list_filter(a.ss, x -> list_contains(b.ss, x)))::DOUBLE /
         |        (len(a.ss) + len(b.ss) - len(list_filter(a.ss, x -> list_contains(b.ss, x)))), 4) AS j
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(16), bb ->
         |    list_slice(a.s, bb * 4 + 1, bb * 4 + 4) = list_slice(b.s, bb * 4 + 1, bb * 4 + 4))) > 0),
         |h AS (SELECT least(floor(j * 10), 9)::INT AS bin, count(*)::BIGINT AS n_pairs
         |      FROM p GROUP BY 1)
         |SELECT bin, round(bin::DOUBLE / 10, 4) AS lo, round((bin + 1)::DOUBLE / 10, 4) AS hi,
         |  n_pairs, sum(n_pairs) OVER (ORDER BY bin DESC)::BIGINT AS n_pairs_ge_lo
         |FROM h ORDER BY bin""".stripMargin
    )
  )

  // ---- Z3b: forward as-of join (FULL oracle — the earliest-following
  // right row picked by a plain min-ts subjoin in DuckDB, vs the
  // Spark union+window compilation: two independent formulations of
  // the same semantics) ----------------------------------------------
  val q139 = Q(
    "q139_asof_forward",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("p_value"))
      graft.ops.AsOf
        .joinAsOfForward(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          purchases,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          payload = Seq("p_value"))
        .select(col("event_id"), col("user_id"), round(col("p_value"), 4).as("next_purchase"))
    },
    Some(
      """WITH p AS (
        |  SELECT user_id, ts, max(value) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |nxt AS (
        |  SELECT e.event_id, min(p.ts) AS mts
        |  FROM events e JOIN p ON p.user_id = e.user_id AND p.ts >= e.ts
        |  GROUP BY e.event_id)
        |SELECT e.event_id, e.user_id, round(p.p_value, 4) AS next_purchase
        |FROM events e
        |LEFT JOIN nxt ON nxt.event_id = e.event_id
        |LEFT JOIN p ON p.user_id = e.user_id AND p.ts = nxt.mts""".stripMargin
    )
  )

  // ---- Z3c: backward as-of with tolerance (FULL oracle — ASOF join
  // plus the staleness filter replayed independently) ----------------
  val q140 = Q(
    "q140_asof_tolerance",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("p_value"))
      graft.ops.AsOf
        .joinAsOfTolerance(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          purchases,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          payload = Seq("p_value"), toleranceSec = 3600.0)
        .select(col("event_id"), col("user_id"),
          round(col("p_value"), 4).as("recent_purchase"))
    },
    Some(
      """WITH p AS (
        |  SELECT user_id, ts, max(value) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN epoch(e.ts) - epoch(p.ts) <= 3600.0
        |    THEN round(p.p_value, 4) ELSE NULL END AS recent_purchase
        |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin
    )
  )

  // ---- T42: per-source KS drift on a numeric column (FULL oracle —
  // exact integer ratios until the final rounding; the discrete-data
  // supremum is attained at data points, so both engines scan the
  // same dense frame) ------------------------------------------------
  val q141 = Q(
    "q141_ks_drift",
    (s, dir) =>
      graft.ops.Drift
        .ksTest(Tables.documents(s, dir), "n_chars", "source")
        .orderBy(col("source")),
    Some(
      """WITH c AS (SELECT source AS g, n_chars AS v, count(*)::BIGINT AS c
        |           FROM documents GROUP BY 1, 2),
        |vals AS (SELECT v, sum(c)::BIGINT AS cv FROM c GROUP BY 1),
        |grps AS (SELECT g, sum(c)::BIGINT AS ng FROM c GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM c),
        |dense AS (SELECT grps.g, vals.v, COALESCE(c.c, 0) AS c, vals.cv, grps.ng, tot.n
        |          FROM grps CROSS JOIN vals
        |          LEFT JOIN c ON c.g = grps.g AND c.v = vals.v
        |          CROSS JOIN tot),
        |cums AS (SELECT g, ng, n,
        |           sum(c) OVER (PARTITION BY g ORDER BY v) AS cum_g,
        |           sum(cv) OVER (PARTITION BY g ORDER BY v) AS cum_all
        |         FROM dense),
        |sel AS (SELECT g AS source, max(ng)::BIGINT AS n_group,
        |          round(max(abs(cum_g::DOUBLE / ng::DOUBLE - cum_all::DOUBLE / n::DOUBLE)), 4)
        |            AS d_stat,
        |          max(n)::BIGINT AS n_all
        |        FROM cums GROUP BY g),
        |lamf AS (SELECT source, n_group, d_stat,
        |           (sqrt(en) + 0.12 + 0.11/sqrt(en)) * d_stat AS lam
        |         FROM (SELECT *, n_group::DOUBLE * n_all::DOUBLE
        |                 / (n_group + n_all)::DOUBLE AS en FROM sel))
        |SELECT source, n_group, d_stat,
        |  floor(least(1.0, greatest(0.0, 2.0 * (
        |    SELECT sum(CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
        |      * exp(-2.0*k*k*lam*lam))
        |    FROM (SELECT unnest(range(1, 26)) AS k))))*1e6+0.5)/1e6 AS p_value
        |FROM lamf ORDER BY source""".stripMargin
    )
  )

  // ---- C37: model scoring + per-group specification diagnostic
  // (FULL oracle — fitted values from the q05 Cramer β replay,
  // aggregated per group; per-row outputs would inherit the ~1e-9
  // relative solver difference between QR and Cramer, but GROUP MEANS
  // cancel it — rounded 2dp with margins probed) ---------------------
  val q142 = Q(
    "q142_ols_score_groups",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = graft.ml.Ols.fit(li, "l_extendedprice", Seq("l_quantity", "l_discount"))
      li.withColumn("__fit", graft.ml.Ols.fittedCol(m))
        .withColumn("__res", graft.ml.Ols.residualCol(m, "l_extendedprice"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("__fit")), 2).as("mean_fitted"),
          round(avg(col("__res")), 2).as("mean_resid"))
        .orderBy(col("l_returnflag"))
    },
    Some(
      """WITH s AS (
        |  SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx, sum(l_discount) AS sz,
        |    sum(l_extendedprice) AS sy, sum(l_quantity*l_quantity) AS sxx,
        |    sum(l_quantity*l_discount) AS sxz, sum(l_discount*l_discount) AS szz,
        |    sum(l_quantity*l_extendedprice) AS sxy, sum(l_discount*l_extendedprice) AS szy
        |  FROM lineitem),
        |b AS (SELECT
        |  (sy*(sxx*szz-sxz*sxz) - sx*(sxy*szz-sxz*szy) + sz*(sxy*sxz-sxx*szy))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)) AS b0,
        |  (n*(sxy*szz-sxz*szy) - sy*(sx*szz-sxz*sz) + sz*(sx*szy-sxy*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)) AS b1,
        |  (n*(sxx*szy-sxy*sxz) - sx*(sx*szy-sxy*sz) + sy*(sx*sxz-sxx*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)) AS b2
        |  FROM s)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(avg(b.b0 + b.b1 * l_quantity + b.b2 * l_discount), 2) AS mean_fitted,
        |  round(avg(l_extendedprice - (b.b0 + b.b1 * l_quantity + b.b2 * l_discount)), 2)
        |    AS mean_resid
        |FROM lineitem CROSS JOIN b
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  )

  // ---- T43: trained multinomial naive Bayes (FULL oracle — training
  // counts are integers, every score a closed form over them, the
  // argmax comparator bound to (score DESC, label); top-2 gaps probed
  // vs summation-order noise) ----------------------------------------
  val q143 = Q(
    "q143_naive_bayes",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val m = graft.text.NaiveBayes.train(docs, "text", "lang")
      graft.text.NaiveBayes.predict(docs, "text", "doc_id", m)
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT lang AS label, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
        |lt AS (SELECT label, sum(c)::BIGINT AS n_l FROM c GROUP BY 1),
        |v AS (SELECT count(DISTINCT token)::DOUBLE AS vocab FROM c),
        |dl AS (SELECT lang AS label, count(*)::BIGINT AS d_l FROM documents GROUP BY 1),
        |nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |lik AS (SELECT c.label, c.token,
        |          ln((c.c::DOUBLE + 1.0) / (lt.n_l::DOUBLE + v.vocab)) AS ll
        |        FROM c JOIN lt USING (label) CROSS JOIN v),
        |stats AS (SELECT dl.label, ln(dl.d_l::DOUBLE / nd.n) AS log_prior,
        |            ln(1.0 / (lt.n_l::DOUBLE + v.vocab)) AS unseen_ll
        |          FROM dl JOIN lt USING (label) CROSS JOIN nd CROSS JOIN v),
        |sc AS (SELECT t.doc_id, s.label, sum(COALESCE(l.ll, s.unseen_ll)) AS sum_ll
        |       FROM (SELECT doc_id, token FROM toks) t
        |       CROSS JOIN (SELECT label, unseen_ll FROM stats) s
        |       LEFT JOIN lik l ON l.label = s.label AND l.token = t.token
        |       GROUP BY 1, 2),
        |fs AS (SELECT sc.doc_id, sc.label, st.log_prior + sc.sum_ll AS score
        |       FROM sc JOIN stats st ON st.label = sc.label),
        |rk AS (SELECT doc_id, label, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS r
        |       FROM fs)
        |SELECT a.doc_id, a.label AS nb_label, round(a.score - b.score, 4) AS margin
        |FROM rk a JOIN rk b ON b.doc_id = a.doc_id AND b.r = 2
        |WHERE a.r = 1 ORDER BY a.doc_id""".stripMargin
    )
  )

  // ---- T44: Welch's t per source vs rest (FULL oracle — integer
  // moment sums, identical expression tree on both sides) --------------

  val q151 = Q(
    "q151_welch_t",
    (s, dir) =>
      graft.ops.Stats
        .welchT(Tables.documents(s, dir), "n_chars", "source")
        .orderBy(col("source")),
    Some(
      """WITH g AS (SELECT source AS g, count(*)::BIGINT AS n1,
        |             sum(n_chars)::DOUBLE AS s1, sum(n_chars::DOUBLE * n_chars::DOUBLE) AS q1
        |           FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n1)::BIGINT AS nt, sum(s1) AS st, sum(q1) AS qt FROM g),
        |d AS (SELECT g, n1, (nt - n1) AS n2, s1, (st - s1) AS s2, q1, (qt - q1) AS q2
        |      FROM g CROSS JOIN tot),
        |e AS (SELECT g, n1, n2,
        |        s1/n1::DOUBLE AS m1, s2/n2::DOUBLE AS m2,
        |        (q1 - s1*s1/n1::DOUBLE)/(n1 - 1)::DOUBLE AS v1,
        |        (q2 - s2*s2/n2::DOUBLE)/(n2 - 1)::DOUBLE AS v2
        |      FROM d),
        |f AS (SELECT g, n1, m1, m2, v1, v2, n2,
        |        v1/n1::DOUBLE + v2/n2::DOUBLE AS se2 FROM e)
        |SELECT g AS source, n1 AS n_group,
        |  round(m1, 4) AS mean_group, round(m2, 4) AS mean_rest,
        |  round((m1 - m2)/sqrt(se2), 4) AS t_welch,
        |  round(se2*se2 / ((v1/n1::DOUBLE)*(v1/n1::DOUBLE)/(n1-1)::DOUBLE
        |                 + (v2/n2::DOUBLE)*(v2/n2::DOUBLE)/(n2-1)::DOUBLE), 2) AS df_welch
        |FROM f ORDER BY source""".stripMargin
    )
  )

  // ---- T45: chi-square independence lang × source (FULL oracle —
  // closed form over observed cells + missing-cell mass) ---------------

  val q152 = Q(
    "q152_chi2",
    (s, dir) => graft.ops.Stats.chiSquare(Tables.documents(s, dir), "lang", "source"),
    Some(
      """WITH cells AS (SELECT lang AS ca, source AS cb, count(*)::DOUBLE AS o
        |               FROM documents GROUP BY 1, 2),
        |ma AS (SELECT ca, sum(o) AS na FROM cells GROUP BY 1),
        |mb AS (SELECT cb, sum(o) AS nb FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM cells),
        |ex AS (SELECT o, na*nb/n AS e, (o - na*nb/n) AS d, ca, cb
        |       FROM cells JOIN ma USING (ca) JOIN mb USING (cb) CROSS JOIN tot),
        |agg AS (SELECT sum(d*d/e) AS obs_term, sum(e) AS e_obs,
        |          count(DISTINCT ca)::DOUBLE AS ka, count(DISTINCT cb)::DOUBLE AS kb
        |        FROM ex)
        |SELECT round(obs_term + ((SELECT n FROM tot) - e_obs), 4) AS chi2,
        |  ((ka - 1)*(kb - 1))::BIGINT AS dof,
        |  (SELECT n::BIGINT FROM tot) AS n,
        |  round(sqrt((obs_term + ((SELECT n FROM tot) - e_obs))
        |    / ((SELECT n FROM tot) * least(ka - 1, kb - 1))), 4) AS cramers_v
        |FROM agg""".stripMargin
    )
  )

  // ---- T46: corpus-mix concentration HHI/entropy/Gini (FULL oracle —
  // integer counts, rank-sum Gini over a deterministic total order) ----

  val q153 = Q(
    "q153_concentration",
    (s, dir) =>
      graft.ops.Stats
        .concentration(Tables.documents(s, dir), "lang", "source")
        .orderBy(col("lang")),
    Some(
      """WITH counts AS (SELECT lang AS p, source AS c, count(*)::BIGINT AS n
        |                FROM documents GROUP BY 1, 2),
        |rk AS (SELECT p, c, n, row_number() OVER (PARTITION BY p ORDER BY n ASC, c ASC) AS rk
        |       FROM counts)
        |SELECT p AS lang, count(*)::BIGINT AS k, sum(n)::BIGINT AS n_total,
        |  round(sum(n::DOUBLE * n::DOUBLE) / (sum(n)::DOUBLE * sum(n)::DOUBLE), 4) AS hhi,
        |  round(-sum(n::DOUBLE * ln(n::DOUBLE)) / sum(n)::DOUBLE + ln(sum(n)::DOUBLE), 4)
        |    AS entropy,
        |  round(2.0 * sum(rk::DOUBLE * n::DOUBLE) / (count(*)::DOUBLE * sum(n)::DOUBLE)
        |    - (count(*) + 1)::DOUBLE / count(*)::DOUBLE, 4) AS gini
        |FROM rk GROUP BY p ORDER BY lang""".stripMargin
    )
  )

  // ---- T47: distinct-n lexical diversity per source (FULL oracle —
  // the md5-60 gram hash replayed so both engines count the same keys) -

  val q154 = Q(
    "q154_diversity",
    (s, dir) =>
      graft.text.Diversity
        .distinctN(
          Tables.documents(s, dir), "text", "source",
          ns = Seq(1, 2), gramHash = graft.functions.SharedHash.md5Long60)
        .orderBy(col("source")),
    Some {
      val h1 = graft.functions.SharedHash.md5Long60Sql("gram")
      """WITH t AS (SELECT source AS g, text, string_split(text, ' ') AS toks FROM documents),
        |base AS (SELECT g, count(*)::BIGINT AS n_docs, sum(len(toks))::BIGINT AS n_tokens
        |         FROM t GROUP BY 1),
        |g1 AS (SELECT g, unnest(toks) AS gram FROM t),
        |s1 AS (SELECT g, count(*)::BIGINT AS grams_1, count(DISTINCT HASH1)::BIGINT AS distinct_1
        |       FROM g1 GROUP BY 1),
        |g2 AS (SELECT g, unnest(CASE WHEN len(toks) >= 2
        |         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |         ELSE [text] END) AS gram
        |       FROM t),
        |s2 AS (SELECT g, count(*)::BIGINT AS grams_2, count(DISTINCT HASH1)::BIGINT AS distinct_2
        |       FROM g2 GROUP BY 1)
        |SELECT g AS source, n_docs, n_tokens, grams_1, distinct_1,
        |  round(distinct_1::DOUBLE / grams_1::DOUBLE, 4) AS d1,
        |  grams_2, distinct_2,
        |  round(distinct_2::DOUBLE / grams_2::DOUBLE, 4) AS d2
        |FROM base JOIN s1 USING (g) JOIN s2 USING (g) ORDER BY source""".stripMargin
        .replace("HASH1", h1)
    }
  )

  // ---- T48: exact ROC AUC via rank-sum with tie handling (FULL oracle
  // — integer pos/neg counts, one cumulative window) -------------------

  val q155 = Q(
    "q155_auc",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("lbl", (col("lang") === "en").cast("int"))
      val a = graft.ml.Eval.auc(docs, "n_chars", "lbl")
      val cnt = docs.agg(sum("lbl").cast("long"), count(lit(1))).head()
      val base = s.range(1).toDF()
      base
        .withColumn("auc", lit(BigDecimal(a).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .withColumn("n_pos", lit(cnt.getLong(0)))
        .withColumn("n_neg", lit(cnt.getLong(1) - cnt.getLong(0)))
        .drop("id")
    },
    Some(
      """WITH l AS (SELECT n_chars::DOUBLE AS s,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lbl
        |           FROM documents),
        |c AS (SELECT s, sum(lbl)::DOUBLE AS pos, sum(1 - lbl)::DOUBLE AS neg
        |      FROM l GROUP BY 1),
        |cum AS (SELECT s, pos, neg,
        |          COALESCE(sum(neg) OVER (ORDER BY s
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |        FROM c)
        |SELECT
        |  round(sum(pos*(nb + neg/2)) /
        |    ((SELECT sum(pos) FROM c) * (SELECT sum(neg) FROM c)), 6) AS auc,
        |  (SELECT sum(pos)::BIGINT FROM c) AS n_pos,
        |  (SELECT sum(neg)::BIGINT FROM c) AS n_neg
        |FROM cum""".stripMargin
    )
  )

  // ---- T49: token dispersion / burstiness (FULL oracle — integer
  // per-doc counts, closed-form zero-doc mass, deterministic top-k) ----

  val q160 = Q(
    "q160_dispersion",
    (s, dir) =>
      graft.text.Dispersion.tokenDispersion(Tables.documents(s, dir), "text", "doc_id", k = 30),
    Some(
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, doc_id, count(*)::DOUBLE AS c FROM t GROUP BY 1, 2),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |a AS (SELECT tok, count(*)::BIGINT AS doc_freq, sum(c) AS tf, sum(c*c) AS sq
        |      FROM c GROUP BY 1)
        |SELECT tok AS token, doc_freq, tf::BIGINT AS term_freq,
        |  round(((sq - tf*tf/n.n)/(n.n - 1.0))/(tf/n.n), 4) AS vmr
        |FROM a CROSS JOIN n
        |ORDER BY term_freq DESC, token LIMIT 30""".stripMargin
    )
  )

  // ---- T50: isotonic calibration (rows-only: PAV is a driver-side
  // stack over the score-collapsed frame, not SQL; CalibrateSpec pins
  // hand PAV blocks, monotonicity, mass preservation, the guard) -------

  val q161 = Q(
    "q161_isotonic",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("lbl", (col("lang") === "en").cast("int"))
      graft.ops.Calibrate.isotonic(docs, "n_chars", "lbl")
        .select(col("score_lo"), col("score_hi"), round(col("p_cal"), 6).as("p_cal"), col("n"))
        .orderBy(col("score_lo"))
    },
    // FULL oracle: PAV via its minimax characterization — fitted value
    // at point i = max_{j<=i} min_{k>=i} weightedMean(y[j..k]), an
    // O(points²) interval frame (points = distinct scores, bounded);
    // runs of equal fitted values (9dp, block-mean gaps are O(0.01))
    // are the PAV blocks, and each block's p_cal recomputes from the
    // SAME integer sums PAV pooled — bit-exact at the 6dp round
    Some(
      """WITH g AS (SELECT n_chars::DOUBLE AS s,
        |             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS sy,
        |             count(*)::DOUBLE AS w
        |           FROM documents GROUP BY 1),
        |o AS (SELECT s, sy, w, row_number() OVER (ORDER BY s) AS i FROM g),
        |p AS (SELECT i, s, sum(sy) OVER (ORDER BY i) AS cy,
        |        sum(w) OVER (ORDER BY i) AS cw FROM o),
        |a AS (SELECT j.i AS j, k.i AS k,
        |        (k.cy - coalesce(jp.cy, 0.0)) / (k.cw - coalesce(jp.cw, 0.0)) AS m
        |      FROM p j JOIN p k ON k.i >= j.i
        |      LEFT JOIN p jp ON jp.i = j.i - 1),
        |mn AS (SELECT j, k AS i,
        |         min(m) OVER (PARTITION BY j ORDER BY k DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mji
        |       FROM a),
        |f AS (SELECT i, max(mji) AS yhat FROM mn GROUP BY i),
        |r AS (SELECT o.i, o.s, o.sy, o.w, round(f.yhat, 9) AS yq
        |      FROM o JOIN f ON f.i = o.i),
        |blk AS (SELECT *, i - row_number() OVER (PARTITION BY yq ORDER BY i) AS grp
        |        FROM r)
        |SELECT min(s) AS score_lo, max(s) AS score_hi,
        |  round(sum(sy)/sum(w), 6) AS p_cal, sum(w)::BIGINT AS n
        |FROM blk GROUP BY yq, grp ORDER BY score_lo""".stripMargin
    )
  )

  // ---- C50: event-study dynamic DiD (rows-only: two-way FE absorption
  // is iterative; PanelSpec pins exact dynamic effects and flat
  // pre-trends on staggered adoption) ----------------------------------

  val q162 = Q(
    "q162_event_study",
    (s, dir) => {
      val o = Tables.normalizeTs(Tables.orders(s, dir), "o_orderdate")
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      val panel = o
        .withColumn("etime",
          min(when(col("o_orderpriority") === "1-URGENT", col("yr"))).over(w))
        .groupBy(col("o_custkey"), col("yr"), col("etime"))
        .agg(avg(col("o_totalprice")).as("y"))
      val es = graft.ml.Panel.eventStudy(panel, "y", "o_custkey", "yr", "etime",
        leads = 2, lags = 2)
      import s.implicits._
      es.relOrder.zip(es.model.coef)
        .map { case (r, c) =>
          (r, BigDecimal(c).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .toDF("rel", "tau")
        .orderBy(col("rel"))
    },
    None
  )

  // ---- P16: PageRank (FULL oracle — the same 10 synchronous power
  // iterations UNROLLED into SQL CTEs, dangling mass included) ---------

  private def pageRankOracleSql(iters: Int, d: Double): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e AS MATERIALIZED (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
              |            's' || l_suppkey::VARCHAR AS dst
              |          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
              |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
              |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
              |od AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),
              |r0 AS MATERIALIZED (SELECT node, (SELECT 1.0/n FROM nn) AS rank FROM nodes)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |d$k AS MATERIALIZED (SELECT COALESCE(sum(rank), 0) AS dm
                |        FROM r${k - 1} LEFT JOIN od ON node = od.src WHERE od.src IS NULL),
                |c$k AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank/od.outdeg) AS contrib
                |        FROM r${k - 1} r JOIN od ON r.node = od.src JOIN e ON e.src = r.node
                |        GROUP BY 1),
                |r$k AS MATERIALIZED (SELECT nodes.node,
                |          (SELECT (1.0-$d)/n FROM nn)
                |            + $d*(COALESCE(c$k.contrib, 0) + (SELECT dm FROM d$k)/(SELECT n FROM nn)) AS rank
                |        FROM nodes LEFT JOIN c$k USING (node))""".stripMargin
    }
    sb ++= s"\nSELECT node, round(rank, 8) AS rank FROM r$iters"
    sb.toString
  }

  val q166 = Q(
    "q166_pagerank",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val edges = o.join(li, col("l_orderkey") === col("o_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
      graft.graph.PageRank.run(edges, iters = 10)
        .select(col("node"), round(col("rank"), 8).as("rank"))
        .orderBy(col("node"))
    },
    Some(pageRankOracleSql(10, 0.85))
  )

  // ---- T51: market-basket association rules (FULL oracle — integer
  // counts, closed forms, string-ordered pairs on both engines) --------

  val q167 = Q(
    "q167_basket_rules",
    (s, dir) =>
      graft.ops.MarketBasket
        .pairRules(Tables.lineitem(s, dir), "l_orderkey", "l_suppkey", minSupport = 30L)
        .orderBy(col("item_a"), col("item_b")),
    Some(
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_suppkey::VARCHAR AS i FROM lineitem),
        |nb AS (SELECT count(DISTINCT b)::DOUBLE AS n FROM bi),
        |ic AS (SELECT i, count(*)::BIGINT AS n_i FROM bi GROUP BY 1),
        |p AS (SELECT l.i AS item_a, r.i AS item_b, count(*)::BIGINT AS n_ab
        |      FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
        |      GROUP BY 1, 2 HAVING count(*) >= 30)
        |SELECT item_a, item_b, n_ab, a.n_i AS n_a, c.n_i AS n_b,
        |  (SELECT n::BIGINT FROM nb) AS n_baskets,
        |  round(n_ab::DOUBLE/(SELECT n FROM nb), 6) AS support,
        |  round(n_ab::DOUBLE/a.n_i::DOUBLE, 6) AS conf_a_to_b,
        |  round(n_ab::DOUBLE/c.n_i::DOUBLE, 6) AS conf_b_to_a,
        |  round((SELECT n FROM nb)*n_ab::DOUBLE/(a.n_i::DOUBLE*c.n_i::DOUBLE), 6) AS lift
        |FROM p JOIN ic a ON a.i = item_a JOIN ic c ON c.i = item_b
        |ORDER BY item_a, item_b""".stripMargin
    )
  )

  // ---- T52: Kaplan–Meier survival over user activity spans (FULL
  // oracle — integer day buckets, suffix-sum risk sets, ln/exp product)

  val q168 = Q(
    "q168_kaplan_meier",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val per = ev
        .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val maxDay = per.agg(max("d1")).head().getLong(0)
      val spans = per.select(
        (col("d1") - col("d0") + 1).cast("double").as("dur"),
        when(col("d1") < maxDay - 7, 1).otherwise(0).as("ev"))
      graft.ml.Survival.kaplanMeier(spans, "dur", "ev")
    },
    Some(
      """WITH d AS (SELECT user_id, floor(epoch(ts)/86400)::BIGINT AS day FROM events),
        |p AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
        |mx AS (SELECT max(d1) AS m FROM p),
        |sp AS (SELECT (d1 - d0 + 1)::DOUBLE AS t,
        |         CASE WHEN d1 < (SELECT m FROM mx) - 7 THEN 1 ELSE 0 END AS ev FROM p),
        |c AS (SELECT t, sum(ev)::BIGINT AS d, sum(1 - ev)::BIGINT AS cns FROM sp GROUP BY 1),
        |r AS (SELECT t, d, cns,
        |        (sum(d + cns) OVER (ORDER BY t DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS n_risk FROM c),
        |k AS (SELECT t, n_risk, d, cns,
        |        CASE WHEN d > 0
        |          THEN ln(greatest(1.0 - d::DOUBLE/n_risk::DOUBLE, 1e-300)) ELSE 0.0 END AS lt
        |      FROM r)
        |SELECT t, n_risk, d AS d_events, cns AS n_censored,
        |  floor(exp(sum(lt) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e6 + 0.5) / 1e6 AS survival
        |FROM k ORDER BY t""".stripMargin
    )
  )

  // ---- T53: decile lift table (FULL oracle — total-ordered ntile,
  // integer counts, identical ratio expressions) -----------------------

  val q169 = Q(
    "q169_lift_table",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("lbl", (col("lang") === "en").cast("int"))
      graft.ml.Eval.liftTable(docs, "n_chars", "lbl", Seq("doc_id"), buckets = 10)
    },
    Some(
      """WITH r AS (SELECT doc_id, n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lbl,
        |             ntile(10) OVER (ORDER BY n_chars DESC, doc_id ASC) AS bkt
        |           FROM documents),
        |b AS (SELECT bkt AS bucket, count(*)::BIGINT AS n, sum(lbl)::BIGINT AS n_pos
        |      FROM r GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS nt, sum(n_pos)::DOUBLE AS pt FROM b),
        |c AS (SELECT bucket, n, n_pos,
        |        sum(n_pos) OVER (ORDER BY bucket) AS cum_pos,
        |        sum(n) OVER (ORDER BY bucket) AS cum_n FROM b)
        |SELECT bucket, n, n_pos,
        |  round(n_pos::DOUBLE/n::DOUBLE, 6) AS resp_rate,
        |  round((n_pos::DOUBLE/n::DOUBLE)/((SELECT pt FROM t)/(SELECT nt FROM t)), 4) AS lift,
        |  round((cum_pos::DOUBLE/cum_n::DOUBLE)/((SELECT pt FROM t)/(SELECT nt FROM t)), 4)
        |    AS cum_lift
        |FROM c ORDER BY bucket""".stripMargin
    )
  )

  // ---- P17: margin-based bitext mining (rows-only: FloatVec cosine +
  // bounded-heap top-k are engine expressions; BitextSpec pins planted
  // pairs, hub rejection, orphan rejection) ----------------------------

  val q170 = Q(
    "q170_bitext",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val src = emb.where(col("vec_id") % 2 === 0)
      val tgt = emb.where(col("vec_id") % 2 === 1)
      graft.sim.Bitext
        .mineParallel(src, tgt, "vec_id", "embedding", k = 4, minMargin = 1.0, minCos = 0.3)
        .orderBy(col("src_id"))
    },
    // FULL oracle (r12): brute-force cross-side cosines via the q97
    // unnest idiom, the bounded-heap top-k replayed as row_number over
    // (cos DESC, id ASC) — the heap's exact goodness order — both
    // directions' top-4 means, the ratio margin and both gates. The
    // top-k SET selection binds on raw cosines (sum-order noise
    // ~1e-15); the k-th/(k+1)-th gaps and both gate margins are probed.
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |sc AS (SELECT s.vec_id AS sid, t.vec_id AS tid, sum(s.v*t.v) AS dot
        |       FROM f s JOIN f t ON s.i = t.i
        |       WHERE s.vec_id % 2 = 0 AND t.vec_id % 2 = 1
        |       GROUP BY 1, 2),
        |cosd AS (SELECT sid, tid, dot/(ns.nrm*nt.nrm) AS c
        |         FROM sc JOIN n ns ON ns.vec_id = sid
        |                 JOIN n nt ON nt.vec_id = tid),
        |fwd AS (SELECT sid, tid, c,
        |          row_number() OVER (PARTITION BY sid ORDER BY c DESC, tid) AS rn
        |        FROM cosd),
        |bwd AS (SELECT sid, tid, c,
        |          row_number() OVER (PARTITION BY tid ORDER BY c DESC, sid) AS rn
        |        FROM cosd),
        |avgs AS (SELECT sid, avg(c) AS avg_s FROM fwd WHERE rn <= 4 GROUP BY 1),
        |avgt AS (SELECT tid, avg(c) AS avg_t FROM bwd WHERE rn <= 4 GROUP BY 1),
        |best AS (SELECT sid, tid, c FROM fwd WHERE rn = 1),
        |o AS (SELECT b.sid, b.tid, b.c,
        |        b.c/((avg_s + avg_t)/2.0) AS margin
        |      FROM best b JOIN avgs USING (sid) JOIN avgt USING (tid))
        |SELECT sid AS src_id, tid AS tgt_id,
        |  round(c, 4) AS cos_sim, round(margin, 4) AS margin
        |FROM o WHERE margin >= 1.0 AND c >= 0.3
        |ORDER BY src_id""".stripMargin
    )
  )

  // ---- T54: binned calibration report (FULL oracle — exact bin
  // arithmetic, per-bin sums with divisions last; sum-dependent 6dp
  // margins probed ≥ 2.4e-8 at sf0.001/0.01/0.1 vs ~1e-12 engine noise;
  // acc is an exact integer ratio) -------------------------------------

  val q171 = Q(
    "q171_calibration",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("p", least(col("n_chars") / 600.0, lit(1.0)))
        .withColumn("lbl", (col("lang") === "en").cast("int"))
      graft.ml.Eval.calibration(docs, "p", "lbl", bins = 10)
    },
    Some(
      """WITH s AS (SELECT least(n_chars/600.0, 1.0) AS p,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |b AS (SELECT least(floor(p*10), 9)::INT AS bin, count(*)::BIGINT AS n,
        |        sum(y)::BIGINT AS n_pos, sum(p) AS sp, sum((p-y)*(p-y)) AS sq
        |      FROM s GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS nt, sum(abs(sp - n_pos)) AS gapsum, sum(sq) AS sqt FROM b)
        |SELECT bin, n, n_pos,
        |  round(sp/n, 6) AS conf,
        |  round(n_pos::DOUBLE/n, 6) AS acc,
        |  round(abs(sp - n_pos)/n, 6) AS gap,
        |  round((SELECT gapsum FROM t)/(SELECT nt FROM t), 6) AS ece,
        |  round((SELECT sqt FROM t)/(SELECT nt FROM t), 6) AS brier
        |FROM b ORDER BY bin""".stripMargin
    )
  )

  // ---- P23: triangle counting + clustering coefficient over the part
  // co-occurrence graph (FULL oracle — the DuckDB side replays the
  // naive a<b<c three-way join, the engine runs degree orientation;
  // both count each unordered triangle exactly once, and every output
  // value is integer or a single exact-integer-ratio division) --------

  val q172 = Q(
    "q172_triangles",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      val edges = a.join(b, Seq("ok"))
        .where(col("pa") =!= col("pb"))
        .select(col("pa").as("src"), col("pb").as("dst"))
      graft.graph.Triangles.perNode(edges).orderBy("node")
    },
    Some(
      """WITH pe AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS u,
        |         greatest(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS v
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |deg AS (SELECT node, count(*)::BIGINT AS degree
        |        FROM (SELECT u AS node FROM pe UNION ALL SELECT v FROM pe) GROUP BY 1),
        |tri AS MATERIALIZED (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM pe e1 JOIN pe e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN pe e3 ON e3.u = e1.v AND e3.v = e2.v),
        |pn AS (SELECT node, count(*)::BIGINT AS triangles
        |       FROM (SELECT a AS node FROM tri UNION ALL
        |             SELECT b FROM tri UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT d.node, d.degree, COALESCE(pn.triangles, 0)::BIGINT AS triangles,
        |  CASE WHEN d.degree < 2 THEN 0.0
        |       ELSE round(2.0*COALESCE(pn.triangles, 0)/(d.degree*(d.degree - 1)), 6)
        |  END AS coeff
        |FROM deg d LEFT JOIN pn ON d.node = pn.node ORDER BY d.node""".stripMargin
    )
  )

  // ---- P24: label-propagation communities (FULL oracle — the same 4
  // synchronous min-label-tie-break sweeps unrolled as materialized
  // CTEs, every vote an integer count) ---------------------------------

  private def labelPropOracleSql(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH eh AS MATERIALIZED (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS u,
             |            's' || l_suppkey::VARCHAR AS v
             |          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |e AS MATERIALIZED (SELECT u, v FROM eh UNION SELECT v, u FROM eh),
             |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM e)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |v$k AS MATERIALIZED (SELECT e.v AS node, l.label AS label, count(*) AS c
                |        FROM e JOIN l${k - 1} l ON e.u = l.node GROUP BY 1, 2),
                |l$k AS MATERIALIZED (SELECT node, label FROM (
                |        SELECT node, label,
                |          row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                |        FROM v$k) WHERE rn = 1)""".stripMargin
    }
    sb ++= s"\nSELECT node, label FROM l$iters ORDER BY node"
    sb.toString
  }

  val q173 = Q(
    "q173_label_prop",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val edges = o.join(li, col("l_orderkey") === col("o_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
      graft.graph.LabelProp.run(edges, iters = 4).orderBy("node")
    },
    Some(labelPropOracleSql(4))
  )

  // ---- Z13: SCD Type-2 dimension merge (FULL oracle — the three merge
  // cases replayed as joins; changed/unchanged/new keys all exercised,
  // every value copied or an exact IEEE +100.0) ------------------------

  val q174 = Q(
    "q174_scd2_merge",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val dim0 = graft.sources.Scd2
        .initial(cust, "c_custkey", Seq("c_mktsegment", "c_acctbal"), from = 0L)
      val updates = cust.where(col("c_custkey") % 7 === 0)
        .select(
          col("c_custkey"),
          concat(col("c_mktsegment"), lit("_V2")).as("c_mktsegment"),
          (col("c_acctbal") + 100.0).as("c_acctbal"))
        .unionByName(
          cust.where(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
            .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")))
        .unionByName(
          cust.where(col("c_custkey") % 97 === 0)
            .select(
              (col("c_custkey") + 1000000).as("c_custkey"),
              col("c_mktsegment"), col("c_acctbal")))
        .withColumn("eff", lit(5L))
      graft.sources.Scd2
        .merge(dim0, updates, "c_custkey", Seq("c_mktsegment", "c_acctbal"), "eff")
        .select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("valid_from"), col("valid_to"), col("is_current").cast("int").as("is_current"))
        .orderBy("c_custkey", "valid_from")
    },
    Some(
      """WITH upd AS (
        |  SELECT c_custkey, c_mktsegment || '_V2' AS c_mktsegment,
        |         c_acctbal + 100.0 AS c_acctbal
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 97 = 0),
        |kept AS (
        |  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
        |         0::BIGINT AS valid_from, NULL::BIGINT AS valid_to, 1 AS is_current
        |  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        |  WHERE u.c_custkey IS NULL
        |     OR (c.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment
        |         AND c.c_acctbal IS NOT DISTINCT FROM u.c_acctbal)),
        |closed AS (
        |  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
        |         0::BIGINT, 5::BIGINT, 0
        |  FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
        |  WHERE c.c_mktsegment IS DISTINCT FROM u.c_mktsegment
        |     OR c.c_acctbal IS DISTINCT FROM u.c_acctbal),
        |opened AS (
        |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
        |         5::BIGINT, NULL::BIGINT, 1
        |  FROM upd u LEFT JOIN customer c ON c.c_custkey = u.c_custkey
        |  WHERE c.c_custkey IS NULL
        |     OR c.c_mktsegment IS DISTINCT FROM u.c_mktsegment
        |     OR c.c_acctbal IS DISTINCT FROM u.c_acctbal)
        |SELECT * FROM kept UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM opened
        |ORDER BY c_custkey, valid_from""".stripMargin
    )
  )

  // ---- P29: Fellegi–Sunter record linkage (FULL oracle — roster B is
  // a deterministic perturbation of customer; the log-likelihood
  // weights are Scala doubles embedded in the SQL via Double.toString,
  // so both engines sum IDENTICAL doubles in the same left-to-right
  // order — the score replay is bit-exact before rounding) -------------

  private val rlRules = Seq(
    (graft.dedup.RecordLinkage.FieldRule("name", (l, r) => l <=> r, m = 0.92, u = 0.002),
      "c_name", "b_name"),
    (graft.dedup.RecordLinkage.FieldRule("seg", (l, r) => l <=> r, m = 0.95, u = 0.2),
      "c_mktsegment", "b_seg"),
    (graft.dedup.RecordLinkage.FieldRule("bal", (l, r) => l <=> r, m = 0.9, u = 0.01),
      "balbucket", "b_bal"))

  val q175 = Q(
    "q175_record_linkage",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val a = cust.select(
        col("c_custkey"), col("c_nationkey"), col("c_name"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100).as("balbucket"))
      val b = cust.where(col("c_custkey") % 2 === 0).select(
        (col("c_custkey") + 500000).as("b_id"),
        col("c_nationkey").as("b_nation"),
        when(col("c_custkey") % 11 === 0, concat(lit("X"), col("c_name")))
          .otherwise(col("c_name")).as("b_name"),
        when(col("c_custkey") % 13 === 0, lit("OTHER"))
          .otherwise(col("c_mktsegment")).as("b_seg"),
        when(col("c_custkey") % 17 === 0, floor(col("c_acctbal") / 100) + 1)
          .otherwise(floor(col("c_acctbal") / 100)).as("b_bal"))
      graft.dedup.RecordLinkage
        .linkPairs(a, b, "c_custkey", "b_id", Seq(("c_nationkey", "b_nation")),
          rlRules, minScore = 5.0)
        .select(
          col("c_custkey"), col("b_id"),
          col("agree_name").cast("int").as("agree_name"),
          col("agree_seg").cast("int").as("agree_seg"),
          col("agree_bal").cast("int").as("agree_bal"),
          col("score"))
        .orderBy("c_custkey", "b_id")
    },
    Some {
      val ws = rlRules.map(_._1).map(r => (r.agreeWeight, r.disagreeWeight))
      s"""WITH a AS (SELECT c_custkey, c_nationkey, c_name, c_mktsegment,
         |             floor(c_acctbal/100) AS balbucket FROM customer),
         |b AS (SELECT c_custkey + 500000 AS b_id, c_nationkey AS b_nation,
         |        CASE WHEN c_custkey % 11 = 0 THEN 'X' || c_name ELSE c_name END AS b_name,
         |        CASE WHEN c_custkey % 13 = 0 THEN 'OTHER' ELSE c_mktsegment END AS b_seg,
         |        CASE WHEN c_custkey % 17 = 0 THEN floor(c_acctbal/100) + 1
         |             ELSE floor(c_acctbal/100) END AS b_bal
         |      FROM customer WHERE c_custkey % 2 = 0),
         |p AS (SELECT c_custkey, b_id,
         |        (c_name IS NOT DISTINCT FROM b_name)::INT AS agree_name,
         |        (c_mktsegment IS NOT DISTINCT FROM b_seg)::INT AS agree_seg,
         |        (balbucket IS NOT DISTINCT FROM b_bal)::INT AS agree_bal
         |      FROM a JOIN b ON c_nationkey = b_nation),
         |sc AS (SELECT *,
         |        round((CASE WHEN agree_name = 1 THEN ${ws(0)._1} ELSE ${ws(0)._2} END)
         |          + (CASE WHEN agree_seg = 1 THEN ${ws(1)._1} ELSE ${ws(1)._2} END)
         |          + (CASE WHEN agree_bal = 1 THEN ${ws(2)._1} ELSE ${ws(2)._2} END), 4) AS score
         |       FROM p)
         |SELECT c_custkey, b_id, agree_name, agree_seg, agree_bal, score::DOUBLE AS score
         |FROM sc WHERE score >= 5.0 ORDER BY c_custkey, b_id""".stripMargin
    }
  )

  // ---- P30: Johnson–Lindenstrauss sign projection (FULL oracle — the
  // k×d ±1/√k matrix rebuilt in SQL from the shared md5-60 parity;
  // k = 16 keeps the scale an exact float 0.25, every product is exact
  // in double, and the sums proved order-invariant bit-for-bit at
  // sf0.01/0.1, so the REAL outputs replay with NO rounding) -----------

  val q176 = Q(
    "q176_jl_projection",
    (s, dir) => {
      val model = graft.sim.RandomProjection.fit(dim = 64, k = 16)
      graft.sim.RandomProjection
        .projectLong(Tables.embeddings(s, dir), "vec_id", "embedding", model)
        .orderBy("vec_id", "dim")
    },
    Some(
      """WITH mat AS MATERIALIZED (
        |  SELECT r, j,
        |    CASE WHEN ('0x' || substr(md5('jl:' || r::VARCHAR || ':' || j::VARCHAR), 1, 15))::UBIGINT
        |              % 2 = 0
        |         THEN 0.25::DOUBLE ELSE -0.25::DOUBLE END AS w
        |  FROM range(16) t1(r), range(64) t2(j)),
        |ex AS (SELECT vec_id, unnest(embedding)::DOUBLE AS x,
        |         unnest(range(len(embedding))) AS j
        |       FROM embeddings)
        |SELECT e.vec_id, m.r::INT AS dim, sum(m.w * e.x)::REAL AS val
        |FROM ex e JOIN mat m ON m.j = e.j
        |GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin
    )
  )

  // ---- T55: LDA topic model (rows-only: 10 EM iterations of joint
  // θ/φ coordinate ascent are not ANSI-SQL-expressible; LdaSpec pins
  // planted-topic recovery, monotone objective, K=1 closed form,
  // normalization, determinism) ----------------------------------------

  val q177 = Q(
    "q177_lda_topics",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .where(length(col("word")) > 0)
      val counts = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      // vocab cap: top 300 tokens by corpus count (ties by token) keeps
      // the φ frame compact without changing the plan shape
      val vocab = counts.groupBy("word").agg(sum("cnt").as("tot"))
        .orderBy(col("tot").desc, col("word")).limit(300).select("word")
      val capped = counts.join(vocab, "word")
      val model = graft.text.Lda.fit(capped, "doc_id", "word", "cnt", k = 4, iters = 10)
      graft.text.Lda.topWords(model, 8).orderBy("topic", "rank")
    },
    None
  )

  // ---- T56: Mann–Whitney U (FULL oracle — integer-exact U numerator
  // via the q155 prefix-sum replay, identical closed-form expression
  // trees for σ and z on both engines) ---------------------------------

  val q178 = Q(
    "q178_mann_whitney",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("lbl", (col("lang") === "en").cast("int"))
      graft.ml.Eval.mannWhitney(docs, "n_chars", "lbl")
    },
    Some(
      """WITH l AS (SELECT n_chars::DOUBLE AS s,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lbl FROM documents),
        |c AS (SELECT s, sum(lbl)::DOUBLE AS pos, sum(1 - lbl)::DOUBLE AS neg
        |      FROM l GROUP BY 1),
        |cum AS (SELECT s, pos, neg,
        |          COALESCE(sum(neg) OVER (ORDER BY s
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |        FROM c),
        |a AS (SELECT sum(pos*(nb + neg/2)) AS u,
        |        (SELECT sum(pos) FROM c) AS n1, (SELECT sum(neg) FROM c) AS n0,
        |        sum((pos + neg)*(pos + neg)*(pos + neg) - (pos + neg)) AS ties
        |      FROM cum)
        |SELECT n1::BIGINT AS n1, n0::BIGINT AS n0, u, n1*n0/2.0 AS mu,
        |  round(sqrt(n1*n0/12.0*((n1 + n0 + 1.0) - ties/((n1 + n0)*(n1 + n0 - 1.0)))), 6)
        |    AS sigma,
        |  round((u - n1*n0/2.0)
        |    / sqrt(n1*n0/12.0*((n1 + n0 + 1.0) - ties/((n1 + n0)*(n1 + n0 - 1.0)))), 6) AS z
        |FROM a""".stripMargin
    )
  )

  // ---- T57: Benjamini–Hochberg FDR over per-group KS drift (FULL
  // oracle — the q141 KS replay by lang, the asymptotic-p transform on
  // the 4dp-rounded D so both engines exponentiate identical doubles,
  // and the step-up rank rule with deterministic tie-break) -------------

  val q179 = Q(
    "q179_bh_fdr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      val ks = graft.ops.Drift.ksTest(docs, "n_chars", "lang")
      val withP = ks.withColumn(
        "p",
        round(
          least(
            lit(1.0),
            lit(2.0) * exp(lit(-2.0) *
              (col("n_group").cast("double") * n / (col("n_group").cast("double") + n)) *
              (col("d_stat") * col("d_stat")))),
          6))
      graft.ml.Diagnostics.bhFdr(withP, "p", alpha = 0.10, tieBreak = Seq("lang"))
        .select(
          col("lang"), col("n_group"), col("d_stat"), col("p"),
          col("rank"), col("bh_crit"), col("significant"))
        .orderBy("rank")
    },
    Some(
      """WITH c AS (SELECT lang AS g, n_chars AS v, count(*)::BIGINT AS c
        |           FROM documents GROUP BY 1, 2),
        |vals AS (SELECT v, sum(c)::BIGINT AS cv FROM c GROUP BY 1),
        |grps AS (SELECT g, sum(c)::BIGINT AS ng FROM c GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM c),
        |dense AS (SELECT grps.g, grps.ng, vals.v, vals.cv, COALESCE(c.c, 0) AS cc
        |          FROM grps CROSS JOIN vals LEFT JOIN c ON c.g = grps.g AND c.v = vals.v),
        |cum AS (SELECT g, ng, v,
        |          sum(cc) OVER (PARTITION BY g ORDER BY v) AS cg,
        |          sum(cv) OVER (PARTITION BY g ORDER BY v) AS ca
        |        FROM dense),
        |ks AS (SELECT g AS lang, max(ng) AS n_group,
        |         round(max(abs(cg::DOUBLE/ng - ca::DOUBLE/(SELECT n FROM tot))), 4) AS d_stat
        |       FROM cum GROUP BY 1),
        |p AS (SELECT lang, n_group, d_stat,
        |        round(least(1.0,
        |          2.0*exp(-2.0*(n_group::DOUBLE*(SELECT n FROM tot)
        |                         /(n_group::DOUBLE + (SELECT n FROM tot)))
        |                 *(d_stat*d_stat))), 6) AS p
        |      FROM ks),
        |r AS (SELECT *, row_number() OVER (ORDER BY p ASC, lang ASC) AS rank,
        |        round(0.10*row_number() OVER (ORDER BY p ASC, lang ASC)
        |              /(SELECT count(*) FROM p), 10) AS bh_crit
        |      FROM p),
        |k AS (SELECT COALESCE(max(CASE WHEN p <= bh_crit THEN rank END), 0) AS k_star FROM r)
        |SELECT lang, n_group, d_stat, p, rank, bh_crit,
        |  (rank <= (SELECT k_star FROM k))::INT AS significant
        |FROM r ORDER BY rank""".stripMargin
    )
  )

  // ---- C54: CUPED variance reduction (FULL oracle — per-user pre/post
  // sums, one moment pass, closed forms replayed with the same
  // association order) -------------------------------------------------

  val q180 = Q(
    "q180_cuped",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("value"),
          floor(unix_timestamp(col("ts")) / 86400).as("day"))
      val mm = ev.agg(min("day"), max("day")).head()
      val mid = (mm.getLong(0) + mm.getLong(1)) / 2
      val per = ev.groupBy("user_id").agg(
        sum(when(col("day") < mid, col("value")).otherwise(0.0)).as("x"),
        sum(when(col("day") >= mid, col("value")).otherwise(0.0)).as("y"))
        .withColumn("treat", (col("user_id") % 2 === 0).cast("int"))
      graft.ml.Causal.cuped(per, "y", "x", "treat")
    },
    Some(
      """WITH e AS (SELECT user_id, value, floor(epoch(ts)/86400)::BIGINT AS day FROM events),
        |mm AS (SELECT (min(day) + max(day))//2 AS mid FROM e),
        |per AS (SELECT user_id,
        |          sum(CASE WHEN day < (SELECT mid FROM mm) THEN value ELSE 0.0 END) AS x,
        |          sum(CASE WHEN day >= (SELECT mid FROM mm) THEN value ELSE 0.0 END) AS y,
        |          CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t
        |        FROM e GROUP BY 1),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy,
        |        sum(t::DOUBLE) AS n1, sum(t*y) AS sy1, sum(t*x) AS sx1
        |      FROM per)
        |SELECT n1::BIGINT AS n_treat, (n - n1)::BIGINT AS n_control,
        |  round(sy1/n1 - (sy - sy1)/(n - n1), 6) AS naive_est,
        |  round(sy1/n1 - (sy - sy1)/(n - n1)
        |    - ((sxy/n - (sx/n)*(sy/n))/(sxx/n - (sx/n)*(sx/n)))
        |      *(sx1/n1 - (sx - sx1)/(n - n1)), 6) AS cuped_est,
        |  round((sxy/n - (sx/n)*(sy/n))/(sxx/n - (sx/n)*(sx/n)), 6) AS theta,
        |  round(1.0 - (sxy/n - (sx/n)*(sy/n))*(sxy/n - (sx/n)*(sy/n))
        |    /((sxx/n - (sx/n)*(sx/n))*(syy/n - (sy/n)*(sy/n))), 6) AS var_reduction
        |FROM m""".stripMargin
    )
  )

  // ---- P31: personalized PageRank (FULL oracle — same unrolled-CTE
  // replay as q166 with the seed-restart arithmetic; the damping
  // constants ship as CAST('<Double.toString>' AS DOUBLE) so both
  // engines use bit-identical doubles) ---------------------------------

  private def pprOracleSql(iters: Int, d: Double): String = {
    val dS = s"CAST('${d.toString}' AS DOUBLE)"
    val rS = s"CAST('${(1.0 - d).toString}' AS DOUBLE)"
    val sb = new StringBuilder
    sb ++= s"""WITH e AS MATERIALIZED (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
              |            's' || l_suppkey::VARCHAR AS dst
              |          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
              |sn AS MATERIALIZED (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS node
              |          FROM orders WHERE o_custkey % 50 = 0),
              |sw0 AS (SELECT node, (1.0::DOUBLE)/(SELECT count(*) FROM sn) AS sw FROM sn),
              |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e
              |          UNION SELECT node FROM sn),
              |ns AS MATERIALIZED (SELECT nodes.node, COALESCE(sw0.sw, 0.0) AS sw
              |          FROM nodes LEFT JOIN sw0 ON nodes.node = sw0.node),
              |od AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),
              |r0 AS MATERIALIZED (SELECT node, sw AS rank FROM ns)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |d$k AS MATERIALIZED (SELECT COALESCE(sum(rank), 0) AS dm
                |        FROM r${k - 1} LEFT JOIN od ON node = od.src WHERE od.src IS NULL),
                |c$k AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank/od.outdeg) AS contrib
                |        FROM r${k - 1} r JOIN od ON r.node = od.src JOIN e ON e.src = r.node
                |        GROUP BY 1),
                |r$k AS MATERIALIZED (SELECT ns.node,
                |          $rS*ns.sw
                |            + $dS*(COALESCE(c$k.contrib, 0) + (SELECT dm FROM d$k)*ns.sw) AS rank
                |        FROM ns LEFT JOIN c$k ON ns.node = c$k.node)""".stripMargin
    }
    sb ++= s"\nSELECT node, round(rank, 8) AS rank FROM r$iters ORDER BY node"
    sb.toString
  }

  val q181 = Q(
    "q181_personalized_pagerank",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val edges = o.join(li, col("l_orderkey") === col("o_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
      val seeds = o.where(col("o_custkey") % 50 === 0)
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("node"))
        .distinct()
        .withColumn("weight", lit(1.0))
      graft.graph.PageRank.personalized(edges, seeds, iters = 10)
        .select(col("node"), round(col("rank"), 8).as("rank"))
        .orderBy("node")
    },
    Some(pprOracleSql(10, 0.85))
  )

  // ---- Z15: interval-overlap join (FULL oracle — DuckDB runs the
  // plain inequality join; the engine's binned equi-join with the
  // first-shared-bin dedup must produce the identical pair set) --------

  val q182 = Q(
    "q182_interval_overlap",
    (s, dir) => {
      val sp = Tables.events(s, dir)
        .select(col("user_id"), col("ts"),
          floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .groupBy("user_id", "day")
        .agg(min("ts").as("s"), max("ts").as("e"))
      val l = sp.where(col("user_id") % 10 === 0)
        .select(col("user_id").as("l_user"), col("day").as("l_day"),
          col("s").as("l_s"), col("e").as("l_e"))
      val r = sp.where(col("user_id") % 10 =!= 0)
        .select(col("user_id").as("r_user"), col("day").as("r_day"),
          col("s").as("r_s"), col("e").as("r_e"))
      graft.ops.RangeJoin
        .intervalOverlap(l, r, "l_s", "l_e", "r_s", "r_e", binSeconds = 86400)
        .select(
          col("l_user"), col("l_day"), col("r_user"), col("r_day"),
          // Spark `/` is double division; the cast truncates — equal to
          // DuckDB's `//` floor for these non-negative spans
          ((least(unix_micros(col("l_e")), unix_micros(col("r_e"))) -
            greatest(unix_micros(col("l_s")), unix_micros(col("r_s")))) / 1000000L)
            .cast("long").as("overlap_sec"))
        .orderBy("l_user", "l_day", "r_user", "r_day")
    },
    Some(
      """WITH sp AS (SELECT user_id, floor(epoch(ts)/86400)::BIGINT AS day,
        |              min(ts) AS s, max(ts) AS e
        |            FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id AS l_user, day AS l_day, s AS l_s, e AS l_e
        |      FROM sp WHERE user_id % 10 = 0),
        |r AS (SELECT user_id AS r_user, day AS r_day, s AS r_s, e AS r_e
        |      FROM sp WHERE user_id % 10 <> 0)
        |SELECT l_user, l_day, r_user, r_day,
        |  (least(epoch_us(l_e), epoch_us(r_e))
        |   - greatest(epoch_us(l_s), epoch_us(r_s)))//1000000 AS overlap_sec
        |FROM l JOIN r ON l_s <= r_e AND r_s <= l_e
        |ORDER BY l_user, l_day, r_user, r_day""".stripMargin
    )
  )

  // ---- P32: centroid silhouette (FULL oracle — exact double replay of
  // centroids, distances, a/b selection and the (b−a)/max ratio) -------

  val q183 = Q(
    "q183_silhouette",
    (s, dir) =>
      graft.sim.Embed
        .silhouette(Tables.embeddings(s, dir), "embedding", "label")
        .orderBy("label"),
    Some(
      """WITH f AS (SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
        |             unnest(range(len(embedding))) AS i FROM embeddings),
        |cent AS (SELECT label AS cl, i, sum(v)/count(*) AS c FROM f GROUP BY 1, 2),
        |d AS (SELECT f.vec_id, f.label, cent.cl,
        |        sqrt(greatest(0.0, sum((f.v - cent.c)*(f.v - cent.c)))) AS dist
        |      FROM f JOIN cent ON f.i = cent.i GROUP BY 1, 2, 3),
        |ab AS (SELECT vec_id, label,
        |         min(CASE WHEN cl = label THEN dist END) AS a,
        |         min(CASE WHEN cl <> label THEN dist END) AS b
        |       FROM d GROUP BY 1, 2),
        |sil AS (SELECT label, a, b,
        |          CASE WHEN greatest(a, b) > 0 THEN (b - a)/greatest(a, b)
        |               ELSE 0.0 END AS s
        |        FROM ab)
        |SELECT label, count(*)::BIGINT AS n, round(avg(s), 4) AS mean_sil,
        |  round(avg(a), 4) AS mean_own_dist, round(avg(b), 4) AS mean_other_dist
        |FROM sil GROUP BY 1 ORDER BY label""".stripMargin
    )
  )

  // ---- T59: stratified k-fold (FULL oracle — md5-60 order + dealt
  // round-robin, bit-for-bit) ------------------------------------------

  val q184 = Q(
    "q184_stratified_kfold",
    (s, dir) =>
      graft.ops.Sampling
        .stratifiedKFold(Tables.documents(s, dir), "doc_id", "lang", k = 5)
        .select(col("doc_id"), col("lang"), col("fold"))
        .orderBy("doc_id"),
    Some(
      s"""WITH t AS (SELECT doc_id, lang,
         |  ${graft.functions.SharedHash.md5Long60Sql("'cv:' || doc_id::VARCHAR")} AS hk
         |  FROM documents)
         |SELECT doc_id, lang,
         |  ((row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) - 1) % 5)::INT AS fold
         |FROM t ORDER BY doc_id""".stripMargin
    )
  )

  // ---- P33: HITS hubs/authorities (FULL oracle — 8 unrolled
  // iterations with the L2 normalization replayed per half-step) -------

  private def hitsOracleSql(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH e AS MATERIALIZED (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
             |            's' || l_suppkey::VARCHAR AS dst
             |          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |h0 AS MATERIALIZED (SELECT node, 1.0::DOUBLE AS hub FROM nodes)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |ar$k AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub) AS v
                |        FROM e JOIN h${k - 1} h ON h.node = e.src GROUP BY 1),
                |na$k AS (SELECT sqrt(sum(v*v)) AS s FROM ar$k),
                |a$k AS MATERIALIZED (SELECT nodes.node,
                |          COALESCE(ar$k.v, 0)/(SELECT s FROM na$k) AS auth
                |        FROM nodes LEFT JOIN ar$k ON nodes.node = ar$k.node),
                |hr$k AS MATERIALIZED (SELECT e.src AS node, sum(a.auth) AS v
                |        FROM e JOIN a$k a ON a.node = e.dst GROUP BY 1),
                |nh$k AS (SELECT sqrt(sum(v*v)) AS s FROM hr$k),
                |h$k AS MATERIALIZED (SELECT nodes.node,
                |          COALESCE(hr$k.v, 0)/(SELECT s FROM nh$k) AS hub
                |        FROM nodes LEFT JOIN hr$k ON nodes.node = hr$k.node)""".stripMargin
    }
    sb ++= s"""
              |SELECT h$iters.node, round(h$iters.hub, 8) AS hub,
              |  round(a$iters.auth, 8) AS auth
              |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node
              |ORDER BY h$iters.node""".stripMargin
    sb.toString
  }

  val q185 = Q(
    "q185_hits",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val edges = o.join(li, col("l_orderkey") === col("o_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
      graft.graph.Hits.run(edges, iters = 8)
        .select(col("node"), round(col("hub"), 8).as("hub"), round(col("auth"), 8).as("auth"))
        .orderBy("node")
    },
    Some(hitsOracleSql(8))
  )

  // ---- P34: k-core decomposition (FULL oracle — peeling is a MONOTONE
  // fixpoint, so a fixed 12-round unroll ≥ convergence replays it
  // exactly; the engine raises if it needs more rounds than the oracle
  // covers) ------------------------------------------------------------

  private def kcoreOracleSql(kk: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH e AS MATERIALIZED (
             |  SELECT DISTINCT least(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS u,
             |         greatest(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS v
             |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
             |  WHERE a.l_partkey <> b.l_partkey),
             |a0 AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
                |d$r AS MATERIALIZED (SELECT node, count(*)::BIGINT AS degree FROM (
                |    SELECT e.u AS node FROM e
                |      JOIN a${r - 1} x ON e.u = x.node JOIN a${r - 1} y ON e.v = y.node
                |    UNION ALL
                |    SELECT e.v FROM e
                |      JOIN a${r - 1} x ON e.u = x.node JOIN a${r - 1} y ON e.v = y.node)
                |  GROUP BY 1),
                |a$r AS MATERIALIZED (SELECT node FROM d$r WHERE degree >= $kk)""".stripMargin
    }
    sb ++= s"\nSELECT node, degree FROM d$rounds WHERE degree >= $kk ORDER BY node"
    sb.toString
  }

  val q186 = Q(
    "q186_kcore",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      val edges = a.join(b, Seq("ok"))
        .where(col("pa") =!= col("pb"))
        .select(col("pa").as("src"), col("pb").as("dst"))
      graft.graph.KCore.core(edges, k = 80, maxRounds = 12).orderBy("node")
    },
    Some(kcoreOracleSql(80, 12))
  )

  // ---- P35: covariance-aware embedding outliers (rows-only: the fit
  // is an eigendecomposition; OutliersSpec pins the direction-aware
  // behavior z-scoring can't see + a dense-reference parity) -----------

  val q187 = Q(
    "q187_mahalanobis",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.sim.Pca.fit(emb, "embedding", k = 16)
      graft.sim.Outliers
        .pcaMahalanobis(emb, "vec_id", "embedding", model, threshold = 32.0)
        .orderBy("vec_id")
    },
    None
  )

  // ---- C55: time-range rolling aggregates (FULL oracle — RANGE frames
  // over floored epoch seconds on both engines) ------------------------

  val q188 = Q(
    "q188_rolling_time",
    (s, dir) =>
      graft.ops.Grouped
        .rollingByTime(
          Tables.events(s, dir), Seq("user_id"), "ts", windowSec = 86400,
          Seq(c => sum(c), c => count(c)), "value", Seq("roll_sum", "roll_n"))
        .select(
          col("user_id"), col("event_id"),
          round(col("roll_sum"), 4).as("roll_sum"), col("roll_n"))
        .orderBy("user_id", "event_id"),
    Some(
      """SELECT user_id, event_id,
        |  round(sum(value) OVER w, 4) AS roll_sum,
        |  count(*) OVER w AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
        |             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
    )
  )

  // ---- S26: event-transition matrix (FULL oracle — one lead window
  // over a (ts, event_id) total order, integer counts, exact ratios) ---

  val q189 = Q(
    "q189_transitions",
    (s, dir) =>
      graft.ops.Transitions
        .matrix(Tables.events(s, dir), "user_id", "ts", "event_type", "event_id")
        .orderBy("from_type", "to_type"),
    Some(
      """WITH p AS (SELECT event_type AS from_type,
        |             COALESCE(lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id), '__end') AS to_type
        |           FROM events),
        |c AS (SELECT from_type, to_type, count(*)::BIGINT AS n FROM p GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n::DOUBLE/sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin
    )
  )

  // ---- T60: RFM segmentation features (FULL oracle — integer recency/
  // frequency, 4dp monetary, ntile over the rounded deterministic
  // order) -------------------------------------------------------------

  val q190 = Q(
    "q190_rfm",
    (s, dir) =>
      graft.ops.Stats
        .rfm(Tables.events(s, dir), "user_id", "ts", "value")
        .orderBy("user_id"),
    Some(
      """WITH mx AS (SELECT max(floor(epoch(ts))::BIGINT) AS m FROM events),
        |per AS (SELECT user_id,
        |          (((SELECT m FROM mx) - max(floor(epoch(ts))::BIGINT))//86400)::BIGINT
        |            AS recency_days,
        |          count(*)::BIGINT AS frequency,
        |          round(sum(value), 4) AS monetary
        |        FROM events GROUP BY 1)
        |SELECT user_id, recency_days, frequency, monetary,
        |  ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
        |  ntile(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
        |  ntile(5) OVER (ORDER BY monetary ASC, user_id) AS m_score
        |FROM per ORDER BY user_id""".stripMargin
    )
  )

  // ---- T61: A/B readout — two-proportion z + SRM guard (FULL oracle —
  // closed forms over one 2-row variant aggregate; 0.5 split constant
  // is exactly representable so the decimal-literal hazard is moot) ----

  val q191 = Q(
    "q191_abtest",
    (s, dir) =>
      graft.ops.Abtest.twoProportion(
        Tables.events(s, dir),
        when(col("user_id") % 2 === 0, "A").otherwise("B"),
        col("event_type") === "purchase",
        expectedA = 0.5),
    Some(
      """WITH per AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |         count(*)::DOUBLE AS n,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE AS conv
        |  FROM events GROUP BY 1),
        |w AS (SELECT
        |  sum(CASE WHEN v='A' THEN n END) AS na, sum(CASE WHEN v='A' THEN conv END) AS ca,
        |  sum(CASE WHEN v='B' THEN n END) AS nb, sum(CASE WHEN v='B' THEN conv END) AS cb
        |  FROM per)
        |SELECT na::BIGINT AS n_a, ca::BIGINT AS conv_a, nb::BIGINT AS n_b, cb::BIGINT AS conv_b,
        |  round(ca/na, 6) AS p_a, round(cb/nb, 6) AS p_b,
        |  round(cb/nb - ca/na, 6) AS lift,
        |  round((cb/nb - ca/na) /
        |        sqrt(((ca+cb)/(na+nb)) * (1 - (ca+cb)/(na+nb)) * (1/na + 1/nb)), 6) AS z,
        |  round((na - (na+nb)*0.5)*(na - (na+nb)*0.5)/((na+nb)*0.5)
        |      + (nb - (na+nb)*0.5)*(nb - (na+nb)*0.5)/((na+nb)*0.5), 6) AS srm_chi2
        |FROM w""".stripMargin
    )
  )

  // ---- C56: Spearman rank correlation per group (FULL oracle — both
  // engines build the same deterministic mid-ranks from row_number +
  // avg-over-ties windows; rank sums are exact multiples of 0.25 well
  // under 2^53, so the Pearson closed form is order-independent) -------

  val q192 = Q(
    "q192_spearman",
    (s, dir) =>
      graft.ops.Stats
        .spearman(
          Tables.lineitem(s, dir)
            .withColumn("tie", col("l_orderkey") * 10 + col("l_linenumber")),
          "l_returnflag", "l_quantity", "l_extendedprice", "tie")
        .orderBy("l_returnflag"),
    Some(
      """WITH t AS (SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y,
        |                  l_orderkey * 10 + l_linenumber AS tie FROM lineitem),
        |r1 AS (SELECT g, x, y,
        |         row_number() OVER (PARTITION BY g ORDER BY x, tie) AS rnx,
        |         row_number() OVER (PARTITION BY g ORDER BY y, tie) AS rny
        |       FROM t),
        |r2 AS (SELECT g,
        |         avg(rnx::DOUBLE) OVER (PARTITION BY g, x) AS rx,
        |         avg(rny::DOUBLE) OVER (PARTITION BY g, y) AS ry
        |       FROM r1)
        |SELECT g AS l_returnflag, count(*)::BIGINT AS n,
        |  round((count(*)::DOUBLE * sum(rx*ry) - sum(rx)*sum(ry)) /
        |        sqrt((count(*)::DOUBLE * sum(rx*rx) - sum(rx)*sum(rx)) *
        |             (count(*)::DOUBLE * sum(ry*ry) - sum(ry)*sum(ry))), 6) AS rho
        |FROM r2 GROUP BY g ORDER BY g""".stripMargin
    )
  )

  // ---- T62: Benford first-digit audit (FULL oracle — the leading digit
  // comes from EXACT integer arithmetic (cents as BIGINT → first decimal
  // char), and the nine expected shares are shipped to both engines as
  // identical binary64 literals, so no libm log10 in either plan) ------

  val q193 = Q(
    "q193_benford",
    (s, dir) =>
      graft.ops.Stats
        .benford(Tables.lineitem(s, dir), "l_extendedprice")
        .orderBy("digit"),
    Some {
      val cases = (1 to 9)
        .map(d => s"WHEN $d THEN CAST('${graft.ops.Stats.benfordShare(d)}' AS DOUBLE)")
        .mkString(" ")
      s"""WITH c AS (
         |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         |         count(*)::BIGINT AS n
         |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1),
         |t AS (SELECT sum(n)::DOUBLE AS tot FROM c),
         |e AS (SELECT digit, n, tot, CASE digit $cases END AS es FROM c, t)
         |SELECT digit, n,
         |  round(n / tot, 6) AS share,
         |  round(es, 6) AS exp_share,
         |  round(sum((n - es*tot)*(n - es*tot)/(es*tot)) OVER ()
         |      + (tot - sum(es*tot) OVER ()), 4) AS chi2
         |FROM e ORDER BY digit""".stripMargin
    }
  )

  // ---- C57: per-key EWMA smoothing + one-step-forecast spike flag
  // (FULL oracle — the inherently-sequential recurrence folds in IEEE
  // order on both engines: a codegen'd aggregate() HOF here, a
  // recursive CTE in DuckDB, with α and 1−α shipped as the same
  // binary64 literals) -------------------------------------------------

  val q194 = Q(
    "q194_ewma", {
      (s, dir) =>
        graft.ops.Ewma
          .smooth(Tables.events(s, dir), "user_id", "ts", "event_id", "value",
            alpha = 0.3, delta = 150.0)
          .orderBy("user_id", "event_id")
    },
    Some {
      val a = 0.3.toString
      val b = (1.0 - 0.3).toString
      s"""WITH RECURSIVE base AS (
         |  SELECT user_id, event_id, value,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events),
         |ew AS (
         |  SELECT user_id, event_id, value, rn, value AS s FROM base WHERE rn = 1
         |  UNION ALL
         |  SELECT b.user_id, b.event_id, b.value, b.rn,
         |         CAST('$a' AS DOUBLE) * b.value + CAST('$b' AS DOUBLE) * e.s
         |  FROM base b JOIN ew e ON b.user_id = e.user_id AND b.rn = e.rn + 1)
         |SELECT user_id, event_id, value,
         |  floor(s * 1e6 + 0.5) / 1e6 AS ewma,
         |  floor((value - lag(s) OVER (PARTITION BY user_id ORDER BY rn)) * 1e6 + 0.5) / 1e6 AS resid,
         |  coalesce(abs(value - lag(s) OVER (PARTITION BY user_id ORDER BY rn)) > 150, false) AS spike
         |FROM ew ORDER BY user_id, event_id""".stripMargin
    }
  )

  // ---- C58: nearest-neighbor matching with replacement (FULL oracle —
  // both engines run the identical sort-based two-window argmin; ids,
  // raw doubles, and exact-subtraction distances only, so the row set
  // hashes with no rounding at all) ------------------------------------

  val q195 = Q(
    "q195_nn_match",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
          col("o_orderkey").as("id"),
          (col("o_orderpriority") === "1-URGENT").cast("int").as("tr"),
          col("o_totalprice").as("sc"),
          floor(unix_timestamp(col("o_orderdate")) / 86400).cast("double").as("y"))
      graft.ml.Causal.nnMatch(o, "id", "tr", "sc", "y", caliper = 50.0)
        .orderBy("t_id")
    },
    Some(
      """WITH u AS (
        |  SELECT o_orderkey AS id,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
        |         o_totalprice AS sc,
        |         floor(epoch(o_orderdate)/86400)::DOUBLE AS y
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT','5-LOW')),
        |s AS (SELECT *,
        |  last_value(CASE WHEN tr=0 THEN sc END IGNORE NULLS) OVER pw AS psc,
        |  last_value(CASE WHEN tr=0 THEN id END IGNORE NULLS) OVER pw AS pid,
        |  last_value(CASE WHEN tr=0 THEN y END IGNORE NULLS) OVER pw AS py,
        |  first_value(CASE WHEN tr=0 THEN sc END IGNORE NULLS) OVER nw AS nsc,
        |  first_value(CASE WHEN tr=0 THEN id END IGNORE NULLS) OVER nw AS nid,
        |  first_value(CASE WHEN tr=0 THEN y END IGNORE NULLS) OVER nw AS ny
        |FROM u
        |WINDOW pw AS (ORDER BY sc, tr, id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |       nw AS (ORDER BY sc, tr, id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |m AS (SELECT id AS t_id, y AS y_t,
        |        CASE WHEN psc IS NOT NULL AND (nsc IS NULL OR sc - psc <= nsc - sc)
        |             THEN pid ELSE nid END AS c_id,
        |        CASE WHEN psc IS NOT NULL AND (nsc IS NULL OR sc - psc <= nsc - sc)
        |             THEN py ELSE ny END AS y_c,
        |        CASE WHEN psc IS NOT NULL AND (nsc IS NULL OR sc - psc <= nsc - sc)
        |             THEN sc - psc ELSE nsc - sc END AS dist
        |      FROM s WHERE tr = 1)
        |SELECT t_id, c_id, y_t, y_c, dist FROM m
        |WHERE c_id IS NOT NULL AND dist <= 50.0 ORDER BY t_id""".stripMargin
    )
  )

  // ---- C59: Cox proportional hazards, Breslow ties (rows-only: the
  // fit is iterative Newton on the partial likelihood; CoxSpec pins a
  // dense single-machine replica at 1e-9 and a planted hazard ratio) ---

  val q196 = Q(
    "q196_cox",
    (s, dir) => {
      // subject = order; duration = ship-span days; event = order
      // finalized ('F'); covariates = volume and mean discount
      val per = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(
          (datediff(max("l_shipdate"), min("l_shipdate")) + 1).cast("double").as("dur"),
          log1p(sum("l_quantity")).as("x_qty"),
          avg("l_discount").as("x_disc"))
        .join(
          Tables.orders(s, dir).select(
            col("o_orderkey").as("l_orderkey"),
            (col("o_orderstatus") === "F").cast("int").as("ev")),
          Seq("l_orderkey"))
      val m = graft.ml.Cox.fit(per, "dur", "ev", Seq("x_qty", "x_disc"))
      graft.ml.Cox.summary(s, m, Seq("x_qty", "x_disc")).orderBy("covariate")
    },
    // FULL oracle (r11): the whole Breslow Newton loop replays via
    // OracleSql.coxNewton2 — per pass, a PARTITION BY t window collapse
    // (the recursive term forbids GROUP BY), ascending prefix + total
    // windows as the suffix risk sets (exactly Rank.withPrefixSums'
    // tot − cum + value), the dt>0 event reduction, the logisticIrls2
    // pivot-order 2×2 solve; Wald SEs from the CARRIED last-pass
    // Hessian (Cox.fit's hLast; a maxIter exit recomputes at the
    // final β via cxh)
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT (date_diff('day', g.mn, g.mx) + 1)::DOUBLE AS t,
         |         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
         |         ln(1.0 + g.sq) AS x0, g.sd/g.cnt AS x1
         |  FROM (SELECT l_orderkey, min(l_shipdate) AS mn, max(l_shipdate) AS mx,
         |          sum(l_quantity) AS sq, sum(l_discount) AS sd,
         |          count(*)::DOUBLE AS cnt
         |        FROM lineitem GROUP BY 1) g
         |  JOIN orders o ON o.o_orderkey = g.l_orderkey),
         |${OracleSql.coxNewton2("src")},
         |cnt AS (SELECT count(*)::BIGINT AS n, sum(ev)::BIGINT AS nev FROM src)
         |SELECT covariate,
         |  floor(coef*1e6 + 0.5)/1e6 AS coef,
         |  floor(exp(coef)*1e6 + 0.5)/1e6 AS hazard_ratio,
         |  floor(se*1e6 + 0.5)/1e6 AS se,
         |  floor((coef/se)*1e6 + 0.5)/1e6 AS z,
         |  cnt.n, cnt.nev AS n_events, f.i::INT AS iters
         |FROM (
         |  SELECT 'x_qty' AS covariate, f2.b0 AS coef,
         |    sqrt(h.h11/(h.h00*h.h11 - h.h01*h.h01)) AS se
         |  FROM cxfin f2, cxh h
         |  UNION ALL
         |  SELECT 'x_disc', f2.b1,
         |    sqrt(h.h00/(h.h00*h.h11 - h.h01*h.h01))
         |  FROM cxfin f2, cxh h) o, cnt, cxfin f
         |ORDER BY covariate""".stripMargin
    }
  )

  // ---- T63: TextRank keywords (FULL oracle — tokenize → filtered
  // adjacency → symmetric distinct edges replayed in SQL, then the
  // q166 PageRank unroll over that edge CTE; unique keyword names make
  // the (score DESC, keyword) top-k a strict total order) --------------

  private def textRankOracleSql(minLen: Int, iters: Int, d: Double, topK: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
              |tk AS MATERIALIZED (SELECT doc_id, unnest(a) AS tok,
              |        unnest(generate_series(1, len(a))) AS pos FROM t),
              |f AS MATERIALIZED (SELECT doc_id, tok, pos FROM tk WHERE length(tok) >= $minLen),
              |pr AS MATERIALIZED (SELECT doc_id, tok,
              |        lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM f),
              |pe AS MATERIALIZED (SELECT prev, tok FROM pr
              |        WHERE prev IS NOT NULL AND prev <> tok),
              |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
              |        SELECT prev AS src, tok AS dst FROM pe
              |        UNION ALL SELECT tok AS src, prev AS dst FROM pe)),
              |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
              |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
              |od AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),
              |r0 AS MATERIALIZED (SELECT node, (SELECT 1.0/n FROM nn) AS rank FROM nodes)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |d$k AS MATERIALIZED (SELECT COALESCE(sum(rank), 0) AS dm
                |        FROM r${k - 1} LEFT JOIN od ON node = od.src WHERE od.src IS NULL),
                |c$k AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank/od.outdeg) AS contrib
                |        FROM r${k - 1} r JOIN od ON r.node = od.src JOIN e ON e.src = r.node
                |        GROUP BY 1),
                |r$k AS MATERIALIZED (SELECT nodes.node,
                |          (SELECT (1.0-$d)/n FROM nn)
                |            + $d*(COALESCE(c$k.contrib, 0) + (SELECT dm FROM d$k)/(SELECT n FROM nn)) AS rank
                |        FROM nodes LEFT JOIN c$k USING (node))""".stripMargin
    }
    sb ++= s"""
              |SELECT node AS keyword, round(rank, 8) AS score FROM r$iters
              |ORDER BY score DESC, keyword LIMIT $topK""".stripMargin
    sb.toString
  }

  val q197 = Q(
    "q197_textrank",
    (s, dir) =>
      graft.text.TextRank.keywords(
        Tables.documents(s, dir), "doc_id", "text",
        minLen = 4, iters = 10, damping = 0.85, topK = 30),
    Some(textRankOracleSql(4, 10, 0.85, 30))
  )

  // ---- T64: Gini concentration per group (FULL oracle — every sum in
  // exact BIGINT cents, one final division of identical integers, the
  // portable floor-quantizer; tie order provably cancels) --------------

  val q198 = Q(
    "q198_gini",
    (s, dir) =>
      graft.ops.Stats
        .gini(Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag"),
    Some(
      """WITH x AS (SELECT l_returnflag AS g,
        |             CAST(round(l_extendedprice*100) AS BIGINT) AS x FROM lineitem),
        |r AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS i FROM x),
        |a AS (SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |             sum(i*x)::BIGINT AS six FROM r GROUP BY g)
        |SELECT g AS l_returnflag, n, sx AS sum_cents,
        |  floor(((2*six - (n+1)*sx)::DOUBLE / (n*sx)::DOUBLE) * 1e6 + 0.5) / 1e6 AS gini
        |FROM a ORDER BY g""".stripMargin
    )
  )

  // ---- X2: perceptual-hash image near-dup dedup (rows-only: no SQL
  // engine decodes PNG; PerceptualHashSpec pins hash determinism,
  // edit-locality, and pair completeness). Payloads are genuine PNGs
  // synthesized per row; every 5th doc joins one of 20 duplicate
  // classes, every 11th is corrupt and must degrade ---------------------

  val q199 = Q(
    "q199_image_neardup",
    (s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select("doc_id", "text")
        .where(col("doc_id") < 2000)
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload =
            if (id % 11 == 0) text.getBytes("UTF-8") // corrupt
            else {
              val seed = if (id % 5 == 0) 100000L + ((id / 5) % 20) else id
              graft.media.Multimodal.encodePng(24, 24, seed)
            }
          graft.media.Multimodal.MediaRow(id, "image", payload, 0, 0)
        }
      val hashes = graft.media.PerceptualHash.hashAll(media).where(col("ok"))
      graft.media.PerceptualHash.nearDupPairs(hashes, "media_id", "phash", maxHamming = 3)
        .orderBy("id_a", "id_b")
    },
    None
  )

  // ---- X3: audio quality profiling (rows-only: no SQL engine decodes
  // WAV; AudioSpec pins RMS/ZCR/clipping/silence against closed forms
  // on synthesized tones). Every 4th payload is overdriven (clipped),
  // every 7th is low-amplitude near-silence, every 9th corrupt --------

  val q200 = Q(
    "q200_audio_profile",
    (s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select("doc_id", "text")
        .where(col("doc_id") < 3000)
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload =
            if (id % 9 == 0) text.getBytes("UTF-8")
            else {
              val amp =
                if (id % 4 == 0) 48000.0
                else if (id % 7 == 0) 40.0
                else 16384.0
              graft.media.Multimodal.encodeWav(1600, 8000, 100.0 + (id % 50) * 10.0, amp)
            }
          graft.media.Multimodal.MediaRow(id, "audio", payload, 0, 0)
        }
      graft.media.AudioProfile.profileAll(media).toDF()
        .select(
          col("media_id"), col("ok"), col("n_frames"), col("rate"),
          round(col("duration_sec"), 4).as("duration_sec"),
          round(col("rms"), 4).as("rms"),
          round(col("zcr"), 4).as("zcr"),
          round(col("clip_ratio"), 4).as("clip_ratio"),
          round(col("silence_ratio"), 4).as("silence_ratio"))
        .orderBy("media_id")
    },
    None
  )

  // ---- C60: Oaxaca–Blinder decomposition (FULL oracle — conditional
  // moment sums + OLS closed forms, floor-quantized; margins probed:
  // the moment sums are ~1e-15-relative summation noise against 6dp) --

  val q201 = Q(
    "q201_oaxaca",
    (s, dir) =>
      graft.ml.Decompose.oaxaca(
        Tables.lineitem(s, dir), "l_returnflag", "R", "A",
        "l_extendedprice", "l_quantity"),
    Some(
      """WITH m AS (
        |  SELECT
        |    sum(CASE WHEN l_returnflag='R' THEN 1.0 END) AS na,
        |    sum(CASE WHEN l_returnflag='R' THEN l_quantity END) AS sxa,
        |    sum(CASE WHEN l_returnflag='R' THEN l_extendedprice END) AS sya,
        |    sum(CASE WHEN l_returnflag='R' THEN l_quantity*l_quantity END) AS sxxa,
        |    sum(CASE WHEN l_returnflag='R' THEN l_quantity*l_extendedprice END) AS sxya,
        |    sum(CASE WHEN l_returnflag='A' THEN 1.0 END) AS nb,
        |    sum(CASE WHEN l_returnflag='A' THEN l_quantity END) AS sxb,
        |    sum(CASE WHEN l_returnflag='A' THEN l_extendedprice END) AS syb,
        |    sum(CASE WHEN l_returnflag='A' THEN l_quantity*l_quantity END) AS sxxb,
        |    sum(CASE WHEN l_returnflag='A' THEN l_quantity*l_extendedprice END) AS sxyb
        |  FROM lineitem WHERE l_returnflag IN ('R','A')),
        |d AS (SELECT na, nb,
        |        sxa/na AS mxa, sya/na AS mya, sxb/nb AS mxb, syb/nb AS myb,
        |        (sxya - na*(sxa/na)*(sya/na)) / (sxxa - na*(sxa/na)*(sxa/na)) AS ba,
        |        (sxyb - nb*(sxb/nb)*(syb/nb)) / (sxxb - nb*(sxb/nb)*(sxb/nb)) AS bb
        |      FROM m)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  floor((mya - myb)*1e6 + 0.5)/1e6 AS gap,
        |  floor((bb*(mxa - mxb))*1e6 + 0.5)/1e6 AS explained,
        |  floor((((mya - ba*mxa) - (myb - bb*mxb)) + mxa*(ba - bb))*1e6 + 0.5)/1e6 AS unexplained,
        |  floor(ba*1e6 + 0.5)/1e6 AS beta_a,
        |  floor(bb*1e6 + 0.5)/1e6 AS beta_b
        |FROM d""".stripMargin
    )
  )

  // ---- C61: Huber robust regression (FULL oracle, r12: the whole
  // proposal-2 IRLS as a recursive CTE — per pass the EXACT median
  // |residual| via quantile_cont as a window aggregate (Spark's
  // `percentile` and DuckDB's quantile_cont share the (n−1)·p
  // interpolation), σ = max(MAD/0.6745, 1e-12), the Huber weight
  // row-locally, the weighted 3-param normal equations through
  // OracleSql.pivotSolve3 (bit-exact LinAlg elimination), stop on
  // max |Δβ| < 1e-9; the i = 0 seed row is the plain-OLS init) ---------

  val q202 = Q(
    "q202_huber",
    (s, dir) => {
      val m = graft.ml.Robust.huber(
        Tables.lineitem(s, dir), "l_extendedprice", Seq("l_quantity", "l_discount"))
      graft.ml.Robust.summary(s, m).orderBy("name")
    },
    Some {
      val sums =
        """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
          |             sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
          |             sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
          |             sum(w*y) OVER () AS c1, sum(w*x1*y) OVER () AS c2,
          |             sum(w*x2*y) OVER () AS c3""".stripMargin
      val solvedInit = OracleSql.pivotSolve3(
        s"""(SELECT count(*)::DOUBLE AS s11, sum(x1) AS s12, sum(x2) AS s13,
           |    sum(x1*x1) AS s22, sum(x1*x2) AS s23, sum(x2*x2) AS s33,
           |    sum(y) AS c1, sum(x1*y) AS c2, sum(x2*y) AS c3
           |  FROM src)""".stripMargin,
        "s11", "s12", "s13", "s22", "s23", "s33", "c1", "c2", "c3",
        "nb0", "nb1", "nb2")
      val solvedStep = OracleSql.pivotSolve3(
        s"""(
           |  SELECT DISTINCT i, b0, b1, b2, sigma,
           |             $sums
           |  FROM (
           |    SELECT i, b0, b1, b2, x1, x2, y, sigma,
           |      least(1.0, (1.345*sigma)/greatest(abs(r), 1e-300)) AS w
           |    FROM (
           |      SELECT i, b0, b1, b2, x1, x2, y, r,
           |        greatest(md/0.6745, 1e-12) AS sigma
           |      FROM (
           |        SELECT q.i, q.b0, q.b1, q.b2, d.x1, d.x2, d.y,
           |          d.y - (q.b0 + q.b1*d.x1 + q.b2*d.x2) AS r,
           |          quantile_cont(abs(d.y - (q.b0 + q.b1*d.x1 + q.b2*d.x2)), 0.5)
           |            OVER () AS md
           |        FROM hbit q, src d WHERE q.i < 30 AND NOT q.done)
           |    )
           |  )
           |)""".stripMargin,
        "s11", "s12", "s13", "s22", "s23", "s33", "c1", "c2", "c3",
        "nb0", "nb1", "nb2")
      s"""WITH RECURSIVE src AS (
         |  SELECT l_extendedprice::DOUBLE AS y, l_quantity::DOUBLE AS x1,
         |         l_discount::DOUBLE AS x2
         |  FROM lineitem),
         |hbit AS (
         |  SELECT 0 AS i, nb0 AS b0, nb1 AS b1, nb2 AS b2,
         |    0.0::DOUBLE AS sigma, 0.0::DOUBLE AS swt, false AS done
         |  FROM $solvedInit
         |  UNION ALL
         |  SELECT i + 1, nb0, nb1, nb2, sigma, s11,
         |    greatest(abs(nb0 - b0), abs(nb1 - b1), abs(nb2 - b2)) < 1e-9
         |  FROM $solvedStep
         |),
         |hbfin AS (SELECT * FROM hbit WHERE i = (SELECT max(i) FROM hbit)),
         |names(name, ord) AS (VALUES ('(intercept)', 0), ('l_quantity', 1),
         |                            ('l_discount', 2))
         |SELECT name,
         |  floor((CASE ord WHEN 0 THEN b0 WHEN 1 THEN b1 ELSE b2 END)*1e6
         |    + 0.5)/1e6 AS coef,
         |  floor(sigma*1e6 + 0.5)/1e6 AS sigma,
         |  i::INT AS iters,
         |  CAST(floor(swt + 0.5) AS BIGINT) AS n
         |FROM hbfin, names ORDER BY name""".stripMargin
    }
  )

  // ---- T65: split-conformal prediction intervals (FULL oracle — id%2
  // split, regr_slope closed form vs the engine Gram solve (q04/q05
  // precedent), EXACT integer order-statistic rank; 2dp outputs with a
  // probed 6e-5 midpoint margin vs ~1e-7 coefficient noise) -------------------------------------------------------------

  val q203 = Q(
    "q203_conformal",
    (s, dir) =>
      graft.ml.Conformal
        .splitIntervals(
          Tables.lineitem(s, dir)
            .withColumn("rid", col("l_orderkey") * 10 + col("l_linenumber")),
          "rid", "l_extendedprice", Seq("l_quantity"),
          covNum = 9, covDen = 10, emitEvery = 251, emitResidue = 3)
        .orderBy("id"),
    Some(
      """WITH b AS (SELECT l_orderkey*10+l_linenumber AS id, l_quantity AS x,
        |             l_extendedprice AS y FROM lineitem),
        |m AS (SELECT regr_slope(y, x) AS b1, regr_intercept(y, x) AS b0
        |      FROM b WHERE id % 2 = 0),
        |c AS (SELECT id, abs(y - (b0 + b1*x)) AS r FROM b, m WHERE id % 2 = 1),
        |nc AS (SELECT count(*)::BIGINT AS n FROM c),
        |rk AS (SELECT least((9*(n+1) + 9) // 10, n) AS k FROM nc),
        |o AS (SELECT r, row_number() OVER (ORDER BY r, id) AS rn FROM c),
        |qv AS (SELECT o.r AS q FROM o, rk WHERE o.rn = rk.k)
        |SELECT id,
        |  floor((b0+b1*x)*1e2+0.5)/1e2 AS pred,
        |  floor((b0+b1*x-q)*1e2+0.5)/1e2 AS lo,
        |  floor((b0+b1*x+q)*1e2+0.5)/1e2 AS hi
        |FROM b, m, qv WHERE id % 251 = 3 ORDER BY id""".stripMargin
    )
  )

  // ---- T66: PSI drift score (FULL oracle — reference-decile edges are
  // exact order statistics (identical element both engines), integer
  // bin counts; only the final ln is float, 6dp probed) ----------------

  val q204 = Q(
    "q204_psi",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.ops.Drift
        .psi(
          li.where(col("l_returnflag") === "A"),
          li.where(col("l_returnflag") === "R"),
          "l_extendedprice")
        .orderBy("bin")
    },
    Some(
      """WITH rv AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem WHERE l_returnflag='A'),
        |n AS (SELECT count(*)::BIGINT AS n FROM rv),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM rv),
        |ed AS (SELECT o.v AS e FROM o, n
        |       WHERE rn IN ((1*n)//10,(2*n)//10,(3*n)//10,(4*n)//10,(5*n)//10,
        |                    (6*n)//10,(7*n)//10,(8*n)//10,(9*n)//10)),
        |refb AS (SELECT (SELECT count(*) FROM ed WHERE ed.e < l.l_extendedprice::DOUBLE)::INT AS bin
        |         FROM lineitem l WHERE l_returnflag='A'),
        |curb AS (SELECT (SELECT count(*) FROM ed WHERE ed.e < l.l_extendedprice::DOUBLE)::INT AS bin
        |         FROM lineitem l WHERE l_returnflag='R'),
        |rc AS (SELECT bin, count(*)::BIGINT AS n_ref FROM refb GROUP BY 1),
        |cc AS (SELECT bin, count(*)::BIGINT AS n_cur FROM curb GROUP BY 1),
        |bins AS (SELECT unnest(generate_series(0, 9))::INT AS bin),
        |j AS (SELECT bins.bin, COALESCE(rc.n_ref, 0) AS n_ref, COALESCE(cc.n_cur, 0) AS n_cur
        |      FROM bins LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)),
        |t AS (SELECT sum(n_ref)::DOUBLE AS tr, sum(n_cur)::DOUBLE AS tc FROM j)
        |SELECT bin, n_ref, n_cur,
        |  round(n_ref/tr, 6) AS p_ref,
        |  round(n_cur/tc, 6) AS p_cur,
        |  round(sum(((n_cur/tc + 1e-6) - (n_ref/tr + 1e-6)) *
        |            ln((n_cur/tc + 1e-6)/(n_ref/tr + 1e-6))) OVER (), 6) AS psi
        |FROM j, t ORDER BY bin""".stripMargin
    )
  )

  // ---- C62: Bradley–Terry preference ranking (FULL oracle — 8 fixed
  // MM sweeps, sweep 1 plain, sweeps 2–8 log-space over-relaxed at
  // ω = 1.5 (π·(mm/π)^1.5 as π·r·sqrt(r): IEEE sqrt/multiply, no libm
  // pow — bit-replayable), UNROLLED as chained CTEs, one per sweep,
  // each free to reference its predecessor twice (both duel endpoints)
  // — the restriction-free alternative to a recursive CTE; ranks on
  // the 6dp-quantized strength so ordering is engine-stable. Was 12
  // plain sweeps — the relaxed tail contracts at |1−ω(1−ρ)| < ρ, so 8
  // sweeps land deeper than 12 plain did; the spec's dense replica and
  // the 30-sweep-plain fixpoint comparison pin the semantics) ----------

  val q205 = Q(
    "q205_bradley_terry",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          col("l_extendedprice").as("p"), col("l_linenumber").as("ln"))
      val a = li.select(col("ok"), col("sk").as("sa"), col("p").as("pa"), col("ln").as("la"))
      val b = li.select(col("ok"), col("sk").as("sb"), col("p").as("pb"), col("ln").as("lb"))
      // duel: within an order, the pricier line's supplier beats the
      // cheaper's (la < lb dedups the unordered pair)
      val duels = a.join(b, Seq("ok"))
        .where(col("la") < col("lb") && col("sa") =!= col("sb") && col("pa") =!= col("pb"))
        .select(
          when(col("pa") > col("pb"), col("sa")).otherwise(col("sb")).as("winner"),
          when(col("pa") > col("pb"), col("sb")).otherwise(col("sa")).as("loser"))
      graft.ml.BradleyTerry.fit(duels, "winner", "loser", iters = 8, omega = 1.5)
        .orderBy("item")
    },
    Some {
      val sweeps = (1 to 8).map { k =>
        val step =
          if (k == 1) "mm"
          // parenthesized exactly like the Spark expression
          // pi * (r * sqrt(r)) — float multiply is not associative
          else "CASE WHEN mm = 0.0 OR pi = 0.0 THEN mm ELSE pi * ((mm/pi) * sqrt(mm/pi)) END"
        s"""p$k AS MATERIALIZED (
           |  SELECT item, $step AS pi FROM (
           |    SELECT it.item, p.pi AS pi,
           |      CASE WHEN d.denom IS NULL OR d.denom = 0.0 THEN 0.0
           |           ELSE it.wins / d.denom END AS mm
           |    FROM items it JOIN p${k - 1} p ON p.item = it.item LEFT JOIN (
           |      SELECT item, sum(d) AS denom FROM (
           |        SELECT g.i AS item, g.n / (a.pi + b.pi) AS d FROM games g
           |          JOIN p${k - 1} a ON a.item = g.i JOIN p${k - 1} b ON b.item = g.j
           |        UNION ALL
           |        SELECT g.j, g.n / (a.pi + b.pi) FROM games g
           |          JOIN p${k - 1} a ON a.item = g.i JOIN p${k - 1} b ON b.item = g.j
           |      ) GROUP BY item) d ON d.item = it.item))""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
         |              l_extendedprice AS p, l_linenumber AS ln FROM lineitem),
         |duels AS MATERIALIZED (
         |  SELECT CASE WHEN a.p > b.p THEN a.sk ELSE b.sk END::VARCHAR AS w,
         |         CASE WHEN a.p > b.p THEN b.sk ELSE a.sk END::VARCHAR AS l
         |  FROM li a JOIN li b ON a.ok = b.ok
         |  WHERE a.ln < b.ln AND a.sk <> b.sk AND a.p <> b.p),
         |games AS MATERIALIZED (SELECT least(w, l) AS i, greatest(w, l) AS j,
         |            count(*)::DOUBLE AS n
         |          FROM duels GROUP BY 1, 2),
         |wins AS (SELECT w AS item, count(*)::DOUBLE AS wins FROM duels GROUP BY 1),
         |items AS MATERIALIZED (SELECT u.item, coalesce(wins.wins, 0.0) AS wins FROM (
         |            SELECT i AS item FROM games
         |            UNION SELECT j FROM games) u
         |          LEFT JOIN wins ON wins.item = u.item),
         |p0 AS (SELECT item, 1.0::DOUBLE AS pi FROM items),
         |$sweeps,
         |tot AS (SELECT sum(pi) AS t FROM p8),
         |normed AS (SELECT item,
         |             floor((pi / (SELECT t FROM tot))*1e6+0.5)/1e6 AS pi FROM p8),
         |tg AS (SELECT item, sum(n)::BIGINT AS games FROM (
         |         SELECT i AS item, n FROM games
         |         UNION ALL SELECT j, n FROM games) GROUP BY 1)
         |SELECT n.item, n.pi, it.wins::BIGINT AS wins, tg.games,
         |  (row_number() OVER (ORDER BY n.pi DESC, n.item))::INT AS rank
         |FROM normed n JOIN items it ON it.item = n.item
         |  JOIN tg ON tg.item = n.item
         |ORDER BY n.item""".stripMargin
    }
  )

  // ---- C63: Fama–MacBeth two-pass regression (FULL oracle — per-period
  // closed-form slopes, T-row reduction, floor-quantized; margins are
  // moment-sum noise ~1e-15 relative vs 6dp) ---------------------------

  val q206 = Q(
    "q206_fama_macbeth",
    (s, dir) =>
      graft.ml.Panel.famaMacBeth(
        Tables.lineitem(s, dir).withColumn("yr", year(col("l_shipdate"))),
        "yr", "l_extendedprice", "l_quantity"),
    Some(
      """WITH per AS (
        |  SELECT year(l_shipdate) AS t, count(*)::DOUBLE AS n,
        |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
        |    sum(l_quantity*l_quantity) AS sxx,
        |    sum(l_quantity*l_extendedprice) AS sxy
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT t, n, sxx - sx*sx/n AS vx,
        |        (sxy - sx*sy/n) / (sxx - sx*sx/n) AS b FROM per),
        |k AS (SELECT count(*)::DOUBLE AS np, sum(b) AS sb, sum(b*b) AS sbb
        |      FROM b WHERE n >= 2 AND vx > 0),
        |tt AS (SELECT count(*)::BIGINT AS n_total FROM b)
        |SELECT CAST(np AS BIGINT) AS n_periods,
        |  n_total - CAST(np AS BIGINT) AS n_dropped,
        |  floor((sb/np)*1e6 + 0.5)/1e6 AS b_mean,
        |  floor(sqrt((sbb - sb*sb/np)/(np - 1)/np)*1e6 + 0.5)/1e6 AS se,
        |  floor(((sb/np)/sqrt((sbb - sb*sb/np)/(np - 1)/np))*1e6 + 0.5)/1e6 AS t_stat
        |FROM k, tt""".stripMargin
    )
  )

  // ---- T67: quantile normalization onto a reference distribution
  // (FULL oracle — pure rank arithmetic: min-rank ties, exact integer
  // floor index, mapped values are SELECTED reference elements; no
  // float op anywhere) --------------------------------------------------

  val q207 = Q(
    "q207_quantile_map",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("rid", col("l_orderkey") * 10 + col("l_linenumber"))
      graft.ops.Calibrate
        .quantileMap(
          li.where(col("l_returnflag") === "A"),
          li.where(col("l_returnflag") === "R" && col("rid") % 101 === 7),
          "l_extendedprice", "rid")
        .orderBy("id")
    },
    Some(
      """WITH rv AS (SELECT l_extendedprice::DOUBLE AS rv,
        |              row_number() OVER (ORDER BY l_extendedprice) AS idx
        |            FROM lineitem WHERE l_returnflag='A'),
        |nr AS (SELECT count(*)::BIGINT AS n FROM rv),
        |cu AS (SELECT l_orderkey*10+l_linenumber AS id, l_extendedprice::DOUBLE AS v
        |       FROM lineitem WHERE l_returnflag='R' AND (l_orderkey*10+l_linenumber) % 101 = 7),
        |nc AS (SELECT count(*)::BIGINT AS n FROM cu),
        |rk AS (SELECT id, v, rank() OVER (ORDER BY v) AS rk FROM cu),
        |ix AS (SELECT id, v,
        |         CASE WHEN (SELECT n FROM nc) <= 1 THEN 1
        |              ELSE 1 + (rk - 1) * ((SELECT n FROM nr) - 1) // ((SELECT n FROM nc) - 1)
        |         END AS idx
        |       FROM rk)
        |SELECT ix.id, ix.v, rv.rv AS mapped FROM ix JOIN rv USING (idx)
        |ORDER BY ix.id""".stripMargin
    )
  )

  // ---- C64: two-group log-rank test (FULL oracle — integer risk-set
  // suffix sums, hypergeometric E/V closed forms, q168's span
  // construction split by user parity) ---------------------------------

  val q208 = Q(
    "q208_logrank",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val per = ev
        .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val maxDay = per.agg(max("d1")).head().getLong(0)
      val spans = per.select(
        (col("d1") - col("d0") + 1).cast("double").as("dur"),
        when(col("d1") < maxDay, 1).otherwise(0).as("ev"),
        when(col("user_id") % 2 === 0, "A").otherwise("B").as("grp"))
      graft.ml.Survival.logRank(spans, "dur", "ev", "grp", "A")
    },
    Some(
      """WITH d AS (SELECT user_id, floor(epoch(ts)/86400)::BIGINT AS day FROM events),
        |p AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
        |mx AS (SELECT max(d1) AS m FROM p),
        |sp AS (SELECT (d1 - d0 + 1)::DOUBLE AS t,
        |         CASE WHEN d1 < (SELECT m FROM mx) THEN 1 ELSE 0 END AS ev,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp FROM p),
        |c AS (SELECT t, sum(ev)::BIGINT AS d, count(*)::BIGINT AS tot,
        |        sum(CASE WHEN grp='A' THEN ev ELSE 0 END)::BIGINT AS d1,
        |        sum(CASE WHEN grp='A' THEN 1 ELSE 0 END)::BIGINT AS tot1
        |      FROM sp GROUP BY 1),
        |r AS (SELECT t, d, d1,
        |        sum(tot) OVER (ORDER BY t DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nj,
        |        sum(tot1) OVER (ORDER BY t DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1j
        |      FROM c),
        |k AS (SELECT d1, d::DOUBLE * (n1j::DOUBLE/nj::DOUBLE) AS e,
        |        d::DOUBLE * (n1j::DOUBLE/nj::DOUBLE) * (1.0 - n1j::DOUBLE/nj::DOUBLE)
        |          * (nj - d)::DOUBLE / (nj - 1)::DOUBLE AS v
        |      FROM r WHERE d > 0 AND nj > 1)
        |SELECT sum(d1)::BIGINT AS o_a,
        |  floor(sum(e)*1e6 + 0.5)/1e6 AS e_a,
        |  floor((sum(d1::DOUBLE - e)*sum(d1::DOUBLE - e)/sum(v))*1e6 + 0.5)/1e6 AS chi2
        |FROM k""".stripMargin
    )
  )

  // ---- C65: Baron–Kenny mediation + Sobel (FULL oracle — centered
  // closed forms for both regressions and both SEs replayed in SQL;
  // 4dp, margins probed vs the Gram-solve noise) -----------------------

  val q209 = Q(
    "q209_mediation",
    (s, dir) =>
      graft.ml.Decompose.mediation(
        Tables.lineitem(s, dir), "l_quantity", "l_discount", "l_extendedprice"),
    Some(
      """WITH s AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    sum(l_quantity) AS sx, sum(l_discount) AS sm, sum(l_extendedprice) AS sy,
        |    sum(l_quantity*l_quantity) AS sxx, sum(l_discount*l_discount) AS smm,
        |    sum(l_extendedprice*l_extendedprice) AS syy,
        |    sum(l_quantity*l_discount) AS sxm, sum(l_quantity*l_extendedprice) AS sxy,
        |    sum(l_discount*l_extendedprice) AS smy
        |  FROM lineitem),
        |cen AS (SELECT n,
        |    sxx - sx*sx/n AS cxx, smm - sm*sm/n AS cmm, syy - sy*sy/n AS cyy,
        |    sxm - sx*sm/n AS cxm, sxy - sx*sy/n AS cxy, smy - sm*sy/n AS cmy
        |  FROM s),
        |ab AS (SELECT n, cxx, cmm, cxm, cxy, cmy, cyy,
        |    cxm/cxx AS a,
        |    (cmm - cxm*cxm/cxx)/(n - 2) / cxx AS se_a2,
        |    (cxx*cmy - cxm*cxy)/(cxx*cmm - cxm*cxm) AS b,
        |    (cmm*cxy - cxm*cmy)/(cxx*cmm - cxm*cxm) AS cprime
        |  FROM cen),
        |fin AS (SELECT n, a, b, cprime, se_a2,
        |    (cyy - cprime*cxy - b*cmy)/(n - 3) * cxx/(cxx*cmm - cxm*cxm) AS se_b2
        |  FROM ab)
        |SELECT CAST(n AS BIGINT) AS n,
        |  floor(a*1e4 + 0.5)/1e4 AS a_path,
        |  floor(b*1e4 + 0.5)/1e4 AS b_path,
        |  floor(cprime*1e4 + 0.5)/1e4 AS direct,
        |  floor(a*b*1e4 + 0.5)/1e4 AS indirect,
        |  floor((a*b/sqrt(a*a*se_b2 + b*b*se_a2))*1e4 + 0.5)/1e4 AS sobel_z
        |FROM fin""".stripMargin
    )
  )

  // ---- C66: always-valid sequential p (mSPRT) (FULL oracle — six
  // conditional cumulative sums over the same (ts, id) order, identical
  // closed forms, τ² shipped as the same binary64 literal) -------------

  val q210 = Q(
    "q210_msprt",
    (s, dir) =>
      graft.ops.Abtest.msprt(
        Tables.events(s, dir),
        when(col("user_id") % 2 === 0, "A").otherwise("B"),
        col("value"), "ts", "event_id",
        tau = 1.0, minPerArm = 30, emitEvery = 500)
        .orderBy("at_event"),
    Some(
      """WITH b AS (
        |  SELECT value::DOUBLE AS v,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
        |    row_number() OVER (ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (SELECT rn,
        |    sum(ia) OVER w AS na, sum(1 - ia) OVER w AS nb,
        |    sum(CASE WHEN ia = 1 THEN v ELSE 0.0 END) OVER w AS sa,
        |    sum(CASE WHEN ia = 0 THEN v ELSE 0.0 END) OVER w AS sb,
        |    sum(CASE WHEN ia = 1 THEN v*v ELSE 0.0 END) OVER w AS qa,
        |    sum(CASE WHEN ia = 0 THEN v*v ELSE 0.0 END) OVER w AS qb
        |  FROM b
        |  WINDOW w AS (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |k AS (SELECT rn, na, nb,
        |    sb/nb::DOUBLE - sa/na::DOUBLE AS delta,
        |    ((qa - sa*sa/na::DOUBLE + (qb - sb*sb/nb::DOUBLE)) / (na + nb - 2.0))
        |      * (1.0/na::DOUBLE + 1.0/nb::DOUBLE) AS bv
        |  FROM c WHERE na >= 30 AND nb >= 30 AND rn % 500 = 0)
        |SELECT rn AS at_event, na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  floor(delta*1e6 + 0.5)/1e6 AS delta,
        |  floor(least(1.0, 1.0/(sqrt(bv/(bv + 1.0)) *
        |    exp(delta*delta*1.0/(2.0*bv*(bv + 1.0)))))*1e6 + 0.5)/1e6 AS p_av
        |FROM k ORDER BY at_event""".stripMargin
    )
  )

  // ---- T68: Cohen's kappa inter-annotator agreement (FULL oracle —
  // label-space counts, per-LABEL margin join for p_e, closed forms) --

  val q211 = Q(
    "q211_cohen_kappa",
    (s, dir) => {
      // two deterministic "raters" over documents: a length heuristic
      // and a vocabulary heuristic — correlated but not identical
      val docs = Tables.documents(s, dir)
        .withColumn("rater_a", when(col("n_chars") >= 300, "keep").otherwise("drop"))
        .withColumn("rater_b",
          when(length(col("text")) - length(regexp_replace(col("text"), "table", "")) >= 10,
            "keep").otherwise("drop"))
      graft.ops.Agreement.cohenKappa(docs, "rater_a", "rater_b")
    },
    Some(
      """WITH r AS (
        |  SELECT CASE WHEN n_chars >= 300 THEN 'keep' ELSE 'drop' END AS a,
        |         CASE WHEN length(text) - length(replace(text, 'table', '')) >= 10
        |              THEN 'keep' ELSE 'drop' END AS b
        |  FROM documents),
        |cells AS (SELECT a, b, count(*)::BIGINT AS c FROM r GROUP BY 1, 2),
        |ma AS (SELECT a AS lbl, sum(c)::DOUBLE AS na FROM cells GROUP BY 1),
        |mb AS (SELECT b AS lbl, sum(c)::DOUBLE AS nb FROM cells GROUP BY 1),
        |pe AS (SELECT COALESCE(sum(na*nb), 0.0) AS pesum FROM ma JOIN mb USING (lbl)),
        |ag AS (SELECT sum(c)::DOUBLE AS nn,
        |         sum(CASE WHEN a = b THEN c ELSE 0 END)::DOUBLE AS agree FROM cells)
        |SELECT CAST(nn AS BIGINT) AS n,
        |  floor((agree/nn)*1e6 + 0.5)/1e6 AS p_o,
        |  floor((pesum/(nn*nn))*1e6 + 0.5)/1e6 AS p_e,
        |  floor(((agree/nn - pesum/(nn*nn)) / (1.0 - pesum/(nn*nn)))*1e6 + 0.5)/1e6 AS kappa
        |FROM ag, pe""".stripMargin
    )
  )

  // ---- C67: partial correlation (FULL oracle — one nine-moment pass,
  // identical closed forms both engines) -------------------------------

  val q212 = Q(
    "q212_partial_corr",
    (s, dir) =>
      graft.ops.Agreement.partialCorr(
        Tables.lineitem(s, dir), "l_quantity", "l_extendedprice", "l_discount"),
    Some(
      """WITH m AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy, sum(l_discount) AS sz,
        |    sum(l_quantity*l_quantity) AS sxx, sum(l_extendedprice*l_extendedprice) AS syy,
        |    sum(l_discount*l_discount) AS szz,
        |    sum(l_quantity*l_extendedprice) AS sxy, sum(l_quantity*l_discount) AS sxz,
        |    sum(l_extendedprice*l_discount) AS syz
        |  FROM lineitem),
        |c AS (SELECT n,
        |    (n*sxy - sx*sy)/sqrt((n*sxx - sx*sx)*(n*syy - sy*sy)) AS rxy,
        |    (n*sxz - sx*sz)/sqrt((n*sxx - sx*sx)*(n*szz - sz*sz)) AS rxz,
        |    (n*syz - sy*sz)/sqrt((n*syy - sy*sy)*(n*szz - sz*sz)) AS ryz
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n,
        |  floor(rxy*1e6 + 0.5)/1e6 AS r_xy,
        |  floor(rxz*1e6 + 0.5)/1e6 AS r_xz,
        |  floor(ryz*1e6 + 0.5)/1e6 AS r_yz,
        |  floor(((rxy - rxz*ryz)/sqrt((1.0 - rxz*rxz)*(1.0 - ryz*ryz)))*1e6 + 0.5)/1e6
        |    AS r_xy_given_z
        |FROM c""".stripMargin
    )
  )

  // ---- T69: HTML/boilerplate extraction (FULL oracle — the portable
  // Java∩RE2 regex pipeline replayed line-by-line in SQL: script/style/
  // comment strips, block tags → newlines, per-line link census, tag
  // strip, entity decode, density keep-rule, ordered reassembly. All
  // emitted columns are strings/integers; the one float comparison
  // (alpha density ≥ 0.5) divides small exact integers identically on
  // both engines. Nav chrome, a footer, a comment, entities, and an
  // UNTERMINATED tag (doc_id % 7 — flagged malformed, not failed) are
  // planted around each document's real text, the q106 convention. ----
  val q213 = Q(
    "q213_html_extract",
    (s, dir) => {
      val html = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(
          lit("<html><head><title>T</title><style>body{color:red;}</style></head><body>"),
          lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
            " <a href=\"/contact\">Contact</a></nav>"),
          lit("<p>"), col("text"), lit("</p>"),
          when(col("doc_id") % 5 === 0,
            lit("<p>Fish &amp; Chips &lt;menu&gt; special today only here</p>"))
            .otherwise(lit("")),
          lit("<!-- tracking -->"),
          lit("<div class=\"footer\"><a href=\"/p\">Privacy</a> |" +
            " <a href=\"/t\">Terms</a></div>"),
          lit("</body></html>"),
          when(col("doc_id") % 7 === 0, lit("<div class=broken")).otherwise(lit("")))
          .as("html"))
      graft.text.Extract.fromHtml(html, "html", "doc_id").orderBy("doc_id")
    },
    Some(
      """WITH plant AS (
        |  SELECT doc_id,
        |    '<html><head><title>T</title><style>body{color:red;}</style></head><body>' ||
        |    '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' ||
        |    '<p>' || text || '</p>' ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN '<p>Fish &amp; Chips &lt;menu&gt; special today only here</p>' ELSE '' END ||
        |    '<!-- tracking -->' ||
        |    '<div class="footer"><a href="/p">Privacy</a> | <a href="/t">Terms</a></div>' ||
        |    '</body></html>' ||
        |    CASE WHEN doc_id % 7 = 0 THEN '<div class=broken' ELSE '' END AS html
        |  FROM documents),
        |t AS (SELECT doc_id,
        |  string_split(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script[^>]*>.*?</script[^>]*>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style[^>]*>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|footer|nav|blockquote)[^>]*>',
        |      chr(10), 'g'),
        |    chr(10)) AS a
        |  FROM plant),
        |l AS (SELECT doc_id, i AS pos, a[i] AS raw
        |      FROM t, unnest(generate_series(1, len(a))) AS u(i)),
        |s AS (SELECT doc_id, pos,
        |        len(regexp_extract_all(raw, '(?i)<a[ \t>]'))::BIGINT AS nl,
        |        trim(regexp_replace(regexp_replace(raw, '<[^>]*>', ' ', 'g'),
        |          '[ \t]+', ' ', 'g')) AS s1
        |      FROM l),
        |d AS (SELECT doc_id, pos, nl,
        |        CASE WHEN position('<' IN s1) > 0 THEN 1 ELSE 0 END AS mal,
        |        trim(regexp_replace(
        |          replace(replace(replace(replace(replace(replace(s1,
        |            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |            '&#39;', ''''), '&amp;', '&'),
        |          ' +', ' ', 'g')) AS ln
        |      FROM s),
        |k AS (SELECT doc_id, pos, nl, mal, ln,
        |        CASE WHEN ln = '' THEN 0 ELSE len(string_split(ln, ' ')) END AS w,
        |        length(regexp_replace(ln, '[^A-Za-z0-9]', '', 'g')) AS al
        |      FROM d),
        |f AS (SELECT doc_id, pos, nl, mal, ln,
        |        (w >= 3 AND (nl = 0 OR w >= 4*nl)
        |          AND al::DOUBLE / length(ln) >= 0.5) AS keep
        |      FROM k)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN keep THEN ln END, chr(10) ORDER BY pos), '') AS body_text,
        |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
        |  sum(nl)::BIGINT AS n_links,
        |  max(mal)::BIGINT AS malformed
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T70: readability indices (FULL oracle — the vowel-group
  // syllable heuristic replayed per word via unnest; sentence
  // punctuation PLANTED by a deterministic replace (the corpus has
  // none); all counts integer-exact, the four scores fixed-literal
  // arithmetic over small-int ratios with identical association,
  // floor-quantized 6dp) ----------------------------------------------
  val q214 = Q(
    "q214_readability",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(
        col("doc_id"),
        expr("replace(text, ' table ', '. Table ')").as("text"))
      graft.text.Readability.scores(docs, "text", "doc_id").orderBy("doc_id")
    },
    Some(
      """WITH plant AS (
        |  SELECT doc_id, replace(text, ' table ', '. Table ') AS text FROM documents),
        |t AS (SELECT doc_id, text, string_split(text, ' ') AS a FROM plant),
        |w AS (SELECT doc_id, lower(a[i]) AS lw
        |      FROM t, unnest(generate_series(1, len(a))) AS u(i)),
        |syl AS (SELECT doc_id,
        |          sum(greatest(1,
        |            len(regexp_extract_all(lw, '[aeiouy]+')) -
        |            CASE WHEN regexp_matches(lw, '[a-z]e$')
        |                  AND NOT regexp_matches(lw, 'le$')
        |                  AND len(regexp_extract_all(lw, '[aeiouy]+')) >= 2
        |                 THEN 1 ELSE 0 END))::BIGINT AS n_syllables
        |        FROM w GROUP BY doc_id),
        |base AS (SELECT doc_id,
        |           len(string_split(text, ' '))::BIGINT AS n_words,
        |           greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT AS n_sentences,
        |           length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::BIGINT AS n_letters
        |         FROM t WHERE len(string_split(text, ' ')) > 0),
        |j AS (SELECT b.doc_id, n_words, n_sentences, n_syllables, n_letters,
        |        n_words::DOUBLE / n_sentences::DOUBLE AS wps,
        |        n_syllables::DOUBLE / n_words::DOUBLE AS spw,
        |        n_letters::DOUBLE / n_words::DOUBLE AS lpw
        |      FROM base b JOIN syl USING (doc_id))
        |SELECT doc_id, n_words, n_sentences, n_syllables, n_letters,
        |  floor((206.835 - 1.015 * wps - 84.6 * spw) * 1e6 + 0.5) / 1e6 AS flesch_ease,
        |  floor((0.39 * wps + 11.8 * spw - 15.59) * 1e6 + 0.5) / 1e6 AS fk_grade,
        |  floor((0.0588 * (lpw * 100.0) -
        |    0.296 * (n_sentences::DOUBLE / n_words::DOUBLE * 100.0) - 15.8) * 1e6 + 0.5) / 1e6
        |    AS coleman_liau,
        |  floor((4.71 * lpw + 0.5 * wps - 21.43) * 1e6 + 0.5) / 1e6 AS ari
        |FROM j ORDER BY doc_id""".stripMargin
    )
  )

  // ---- T71: Nelson-Aalen cumulative hazard (FULL oracle — q168's
  // span construction, suffix-sum risk set cast ::BIGINT per the R9
  // HUGEINT lesson, prefix sum of d/n in identical ascending order,
  // floor-quantized 6dp) ----------------------------------------------
  val q215 = Q(
    "q215_nelson_aalen",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val per = ev
        .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val maxDay = per.agg(max("d1")).head().getLong(0)
      val spans = per.select(
        (col("d1") - col("d0") + 1).cast("double").as("dur"),
        when(col("d1") < maxDay - 7, 1).otherwise(0).as("ev"))
      graft.ml.Survival.nelsonAalen(spans, "dur", "ev")
    },
    Some(
      """WITH d AS (SELECT user_id, floor(epoch(ts)/86400)::BIGINT AS day FROM events),
        |p AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
        |mx AS (SELECT max(d1) AS m FROM p),
        |sp AS (SELECT (d1 - d0 + 1)::DOUBLE AS t,
        |         CASE WHEN d1 < (SELECT m FROM mx) - 7 THEN 1 ELSE 0 END AS ev FROM p),
        |c AS (SELECT t, sum(ev)::BIGINT AS d, sum(1 - ev)::BIGINT AS cns FROM sp GROUP BY 1),
        |r AS (SELECT t, d,
        |        (sum(d + cns) OVER (ORDER BY t DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS n_risk FROM c),
        |h AS (SELECT t, n_risk, d,
        |        sum(d::DOUBLE / n_risk::DOUBLE) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
        |      FROM r)
        |SELECT t, n_risk, d AS d_events,
        |  floor(ch * 1e6 + 0.5) / 1e6 AS cum_hazard,
        |  floor(exp(-ch) * 1e6 + 0.5) / 1e6 AS survival_fh
        |FROM h ORDER BY t""".stripMargin
    )
  )

  // ---- P36: leakage-safe train/val/test split (FULL oracle — q54's
  // minhash+CC replay extended with the component-min cluster id and
  // the shared-md5 bucket assignment; every emitted column is an
  // integer or a label from exact integer thresholds) ------------------
  val q216 = Q(
    "q216_leakage_safe_split",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Splits.leakageSafe(
        docs.select(col("doc_id"), col("text")), "text", "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        gramHash = graft.functions.SharedHash.md5Long60)
        .select(col("doc_id"), col("cluster_id"), col("split_bucket"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""WITH RECURSIVE consts AS (SELECT ${mhCoefs.map(_._1).mkString("[", ",", "]")}::BIGINT[] AS ca,
         |                       ${mhCoefs.map(_._2).mkString("[", ",", "]")}::BIGINT[] AS cb),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |g0 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') AS g
         |       FROM toks, UNNEST(generate_series(1, len(a) - 2)) AS u(i) WHERE len(a) >= 3),
         |gshort AS (SELECT doc_id, text AS g FROM documents WHERE len(string_split(text, ' ')) < 3),
         |grams AS (SELECT DISTINCT doc_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("g")} AS sh
         |  FROM (SELECT * FROM g0 UNION ALL SELECT * FROM gshort)),
         |hl AS (SELECT doc_id, list(sh % 2147483647) AS hs, list(sh) AS ss FROM grams GROUP BY doc_id),
         |sig AS (SELECT doc_id, ss,
         |    list_transform(range(64), i ->
         |      list_min(list_transform(hs, h -> (ca[i + 1] * h + cb[i + 1]) % 2147483647))) AS s
         |  FROM hl CROSS JOIN consts),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE len(list_filter(range(16), bb ->
         |    list_slice(a.s, bb * 4 + 1, bb * 4 + 4) = list_slice(b.s, bb * 4 + 1, bb * 4 + 4))) > 0
         |  AND round(len(list_filter(a.ss, x -> list_contains(b.ss, x)))::DOUBLE /
         |    (len(a.ss) + len(b.ss) - len(list_filter(a.ss, x -> list_contains(b.ss, x)))), 4) >= 0.5),
         |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
         |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |buck AS (SELECT doc_id, cluster_id,
         |    ${graft.functions.SharedHash.md5Long60Sql("cluster_id::VARCHAR || '|' || 'graft-split'")} % 1000000
         |      AS split_bucket
         |  FROM comp)
         |SELECT doc_id, cluster_id, split_bucket,
         |  CASE WHEN split_bucket < 800000 THEN 'train'
         |       WHEN split_bucket < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM buck ORDER BY doc_id""".stripMargin
    )
  )

  // shared daily per-type event-count series for q217/q218
  private def dailySeries(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .select(col("event_type"), floor(unix_timestamp(col("ts")) / 86400).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
  private val dailySeriesSql =
    """d AS (SELECT event_type AS k, floor(epoch(ts)/86400)::BIGINT AS t,
      |        count(*)::BIGINT AS v FROM events GROUP BY 1, 2)""".stripMargin

  // ---- S28: CUSUM changepoint detection (FULL oracle — the Page
  // recursion via the prefix-sum - running-min identity: cumulative
  // ROWS windows evaluate sequentially on both engines, and the
  // explicit-moment mu/sigma are exact doubles for integer series, so
  // every emitted float matches bit-for-bit pre-quantization) ----------
  val q217 = Q(
    "q217_cusum",
    (s, dir) =>
      graft.ops.Changepoint.cusum(dailySeries(s, dir), "event_type", "day", "n")
        .select(col("event_type"), col("day"), col("n"), col("sigma"),
          col("cusum_pos"), col("cusum_neg"), col("alarm"))
        .orderBy("event_type", "day"),
    Some(
      s"""WITH $dailySeriesSql,
        |st AS (SELECT k, avg(v::DOUBLE) AS mu,
        |         sqrt(greatest(0.0, avg(v::DOUBLE * v::DOUBLE) -
        |           avg(v::DOUBLE) * avg(v::DOUBLE))) AS sigma
        |       FROM d GROUP BY 1),
        |s AS (SELECT d.k, t, v, sigma,
        |        sum(v::DOUBLE - mu - 0.5 * sigma) OVER pw AS sp,
        |        sum(v::DOUBLE - mu + 0.5 * sigma) OVER pw AS sn
        |      FROM d JOIN st USING (k)
        |      WINDOW pw AS (PARTITION BY d.k ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (SELECT k, t, v, sigma,
        |        floor((sp - least(0.0, min(sp) OVER pw)) * 1e6 + 0.5) / 1e6 AS cusum_pos,
        |        floor((greatest(0.0, max(sn) OVER pw) - sn) * 1e6 + 0.5) / 1e6 AS cusum_neg
        |      FROM s WINDOW pw AS (PARTITION BY k ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT k AS event_type, t AS day, v AS n,
        |  floor(sigma * 1e6 + 0.5) / 1e6 AS sigma, cusum_pos, cusum_neg,
        |  (CASE WHEN sigma > 0 AND (cusum_pos > 4.0 * sigma OR cusum_neg > 4.0 * sigma)
        |        THEN 1 ELSE 0 END)::BIGINT AS alarm
        |FROM c ORDER BY event_type, day""".stripMargin
    )
  )

  // ---- S29: classical seasonal decomposition (FULL oracle — the
  // 7-day centered MA is an exact integer sum / 7.0, the per-position
  // seasonal means re-centered per key; trend bit-identical, seasonal/
  // resid carry only summation-order ulps under the 6dp quantizer) -----
  val q218 = Q(
    "q218_seasonal_decompose",
    (s, dir) =>
      graft.ops.Seasonal.decompose(dailySeries(s, dir), "event_type", "day", "n", period = 7)
        .select(col("event_type"), col("day"), col("n"), col("pos"),
          col("trend"), col("seasonal"), col("resid"))
        .orderBy("event_type", "day"),
    Some(
      s"""WITH $dailySeriesSql,
        |b AS (SELECT k, t, v, (t % 7)::BIGINT AS pos,
        |        CASE WHEN count(v) OVER cw = 7
        |             THEN (sum(v::DOUBLE) OVER cw) / 7.0 END AS trend
        |      FROM d WINDOW cw AS (PARTITION BY k ORDER BY t
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (SELECT k, pos, avg(v::DOUBLE - trend) AS smean
        |       FROM b WHERE trend IS NOT NULL GROUP BY 1, 2),
        |ce AS (SELECT k, pos, smean - avg(smean) OVER (PARTITION BY k) AS seasonal FROM se)
        |SELECT b.k AS event_type, t AS day, v AS n, b.pos,
        |  floor(trend * 1e6 + 0.5) / 1e6 AS trend,
        |  floor(seasonal * 1e6 + 0.5) / 1e6 AS seasonal,
        |  CASE WHEN trend IS NOT NULL AND seasonal IS NOT NULL
        |       THEN floor((v::DOUBLE - trend - seasonal) * 1e6 + 0.5) / 1e6 END AS resid
        |FROM b LEFT JOIN ce ON b.k = ce.k AND b.pos = ce.pos
        |ORDER BY event_type, day""".stripMargin
    )
  )

  // ---- T72: URL parse/normalize + registrable domain (FULL oracle —
  // URLs synthesized deterministically from source/doc_id with planted
  // scheme case, www, ports, co.uk second-levels, tracking params,
  // fragments, trailing slashes, and a malformed residue class; the
  // regex pipeline replays verbatim; every output string/integer) -----
  val q219 = Q(
    "q219_url_parse",
    (s, dir) => {
      val urls = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(
          when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("https")),
          lit("://"),
          when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("")),
          col("source"),
          when(col("doc_id") % 4 === 0, lit(".example.co.uk")).otherwise(lit(".example.com")),
          when(col("doc_id") % 5 === 0, lit(":8080")).otherwise(lit("")),
          lit("/articles/item-"), col("doc_id"),
          when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 2 === 0,
            concat(lit("?utm_source=feed&id="), col("doc_id"), lit("&utm_campaign=x")))
            .otherwise(concat(lit("?id="), col("doc_id"))),
          when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
          .as("url"))
        // a malformed residue class: no scheme at all
        .withColumn("url", when(col("doc_id") % 97 === 0, lit("not a url")).otherwise(col("url")))
      graft.text.Urls.parse(urls, "url")
        .select(col("doc_id"), col("scheme"), col("host"), col("registered_domain"),
          col("path"), col("depth"), col("n_params"), col("url_norm"))
        .orderBy("doc_id")
    },
    Some(
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 97 = 0 THEN 'not a url' ELSE
        |      (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
        |      (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) || source ||
        |      (CASE WHEN doc_id % 4 = 0 THEN '.example.co.uk' ELSE '.example.com' END) ||
        |      (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) ||
        |      '/articles/item-' || doc_id ||
        |      (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
        |      (CASE WHEN doc_id % 2 = 0
        |            THEN '?utm_source=feed&id=' || doc_id || '&utm_campaign=x'
        |            ELSE '?id=' || doc_id END) ||
        |      (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)
        |    END AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) AS scheme,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
        |      '^[^@]*@', ''), ':[0-9]+$', '') AS host,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS q
        |  FROM u),
        |r AS (SELECT doc_id, url, scheme, host, path, q,
        |    regexp_replace(host, '^www\.', '') AS bare
        |  FROM p),
        |d AS (SELECT doc_id, url, scheme, host, path, q,
        |    CASE WHEN host = '' THEN ''
        |         WHEN regexp_extract(bare,
        |            '([^.]+\.(?:co|com|org|net|ac|gov|edu)\.[a-z][a-z])$', 1) <> ''
        |           THEN regexp_extract(bare,
        |            '([^.]+\.(?:co|com|org|net|ac|gov|edu)\.[a-z][a-z])$', 1)
        |         WHEN regexp_extract(bare, '([^.]+\.[^.]+)$', 1) <> ''
        |           THEN regexp_extract(bare, '([^.]+\.[^.]+)$', 1)
        |         ELSE bare END AS registered_domain,
        |    list_aggregate(list_filter(string_split(q, '&'),
        |      x -> x <> '' AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]*|fbclid|gclid)=')),
        |      'string_agg', '&') AS keptq
        |  FROM r)
        |SELECT doc_id, scheme, host, registered_domain, path,
        |  len(regexp_extract_all(path, '[^/]+'))::BIGINT AS depth,
        |  len(regexp_extract_all(q, '[^&]+'))::BIGINT AS n_params,
        |  CASE WHEN host = '' THEN '' ELSE
        |    scheme || '://' || host ||
        |    (CASE WHEN regexp_matches(path, '.+/$')
        |          THEN substring(path, 1, length(path) - 1) ELSE path END) ||
        |    (CASE WHEN coalesce(keptq, '') <> '' THEN '?' || keptq ELSE '' END)
        |  END AS url_norm
        |FROM d ORDER BY doc_id""".stripMargin
    )
  )

  // ---- C68: propensity stratification (rows-only: the logistic
  // propensity is iterative IRLS; CausalSpec pins bias removal on a
  // planted confounder and the exact-ntile stratum balance) ------------
  val q220 = Q(
    "q220_stratified_ate",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey").as("id"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("tr"),
        (col("o_totalprice") / lit(1000.0)).as("x"),
        floor(unix_timestamp(col("o_orderdate")) / 86400).cast("double").as("y"))
      graft.ml.Causal.stratifiedATE(o, "y", "tr", Seq("x"), "id", strata = 5)
    },
    // FULL oracle: propensity via the shared 2-param IRLS recursive
    // CTE, exact-count strata via SQL-standard ntile over (e, id) —
    // the same assignment Rank.withGlobalNtile computes — then plain
    // conditional means and the null-arm-excluded weighted total
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT o_orderkey AS id,
         |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END AS y,
         |         o_totalprice/1000.0 AS x,
         |         floor(epoch(o_orderdate)/86400) AS yout
         |  FROM orders),
         |${OracleSql.logisticIrls2("src")},
         |sc AS (SELECT src.id, src.x, src.y AS tr, src.yout,
         |         least(greatest(
         |           1.0/(1.0 + exp(-least(greatest(f.b0 + src.x*f.b1, -30.0), 30.0))),
         |           0.01), 0.99) AS e
         |       FROM src, fin f),
         |nt AS (SELECT *, ntile(5) OVER (ORDER BY e, id) AS stratum FROM sc),
         |per AS (SELECT stratum::INT AS stratum, count(*)::BIGINT AS n,
         |          sum(tr)::BIGINT AS n_treat,
         |          avg(CASE WHEN tr = 1.0 THEN yout END) AS mt,
         |          avg(CASE WHEN tr = 0.0 THEN yout END) AS mc
         |        FROM nt GROUP BY 1),
         |tot AS (SELECT
         |    sum(CASE WHEN mt IS NOT NULL AND mc IS NOT NULL
         |          THEN (mt - mc)*n::DOUBLE END) AS num,
         |    sum(CASE WHEN mt IS NOT NULL AND mc IS NOT NULL
         |          THEN n::DOUBLE END) AS den
         |  FROM per)
         |SELECT stratum, n, n_treat,
         |  floor(mt*1e6+0.5)/1e6 AS mean_t,
         |  floor(mc*1e6+0.5)/1e6 AS mean_c,
         |  CASE WHEN mt IS NOT NULL AND mc IS NOT NULL
         |    THEN floor((mt - mc)*1e6+0.5)/1e6 END AS ate_s,
         |  floor((SELECT num/den FROM tot)*1e6+0.5)/1e6 AS ate
         |FROM per ORDER BY stratum""".stripMargin
    }
  )

  // ---- Z2 (promoted to oracle): skew-salted join ≡ the plain join —
  // the oracle RUNS the plain join; any salt-induced row loss,
  // duplication, or mis-keying breaks the per-nation aggregate hash ---
  val q221 = Q(
    "q221_salted_join",
    (s, dir) => {
      val facts = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("k"), col("l_quantity"))
      val dim = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("k"), col("s_nationkey"))
      graft.ops.Salt.saltedJoin(facts, dim, "k", factor = 8)
        .groupBy(col("s_nationkey"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("double")).cast("long").as("sum_qty"))
        .orderBy("s_nationkey")
    },
    Some(
      """SELECT s_nationkey, count(*)::BIGINT AS n_rows,
        |  sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    )
  )

  // ---- C15 (promoted to oracle): get_all_dummies — first categorical
  // keeps every category, later ones drop their (sorted) last, the
  // reference's collinearity convention (hdfe.py:35-43) ----------------
  val q222 = Q(
    "q222_all_dummies",
    (s, dir) =>
      graft.ops.Dummies.allDummies(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderstatus")),
        Seq("o_orderpriority", "o_orderstatus"))
        .drop("o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS "o_orderpriority_1-URGENT",
        |  CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS "o_orderpriority_2-HIGH",
        |  CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS "o_orderpriority_3-MEDIUM",
        |  CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS "o_orderpriority_4-NOT SPECIFIED",
        |  CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS "o_orderpriority_5-LOW",
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o_orderstatus_F,
        |  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS o_orderstatus_O
        |FROM orders ORDER BY o_orderkey""".stripMargin
    )
  )

  // ---- T73: precision-recall curve + average precision (FULL oracle
  // — integer TP/FP ratios per distinct threshold; AP is one float sum
  // quantized 6dp; DuckDB replays the descending cumulative windows) --
  val q223 = Q(
    "q223_pr_curve",
    (s, dir) =>
      graft.ml.Eval.prCurve(
        Tables.documents(s, dir).withColumn("lbl", (col("lang") === "en").cast("int")),
        "n_chars", "lbl"),
    Some(
      """WITH c AS (SELECT n_chars::DOUBLE AS s,
        |             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos,
        |             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS neg
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(pos)::DOUBLE AS p FROM c),
        |r AS (SELECT s, pos,
        |        (sum(pos) OVER (ORDER BY s DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS tp,
        |        (sum(neg) OVER (ORDER BY s DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS fp
        |      FROM c),
        |a AS (SELECT sum(pos::DOUBLE / (SELECT p FROM t) * (tp::DOUBLE / (tp + fp)::DOUBLE))
        |        AS ap FROM r)
        |SELECT s AS threshold, tp, fp,
        |  floor((tp::DOUBLE / (tp + fp)::DOUBLE) * 1e6 + 0.5) / 1e6 AS "precision",
        |  floor((tp::DOUBLE / (SELECT p FROM t)) * 1e6 + 0.5) / 1e6 AS recall,
        |  floor((SELECT ap FROM a) * 1e6 + 0.5) / 1e6 AS ap
        |FROM r ORDER BY threshold DESC""".stripMargin
    )
  )

  // ---- T74: NDCG@k per query group (FULL oracle — deterministic
  // total orders via tie column, 2^rel exact for small ints, the
  // log2 discount written as ln(x)/ln(2) on BOTH engines) -------------
  val q224 = Q(
    "q224_ndcg",
    (s, dir) =>
      graft.ml.Eval.ndcg(
        Tables.documents(s, dir)
          .withColumn("rel",
            when(col("lang") === "en", 2).when(col("lang") === "de", 1).otherwise(0)),
        "source", "n_chars", "rel", "doc_id", k = 10)
        .orderBy("source"),
    Some(
      """WITH r AS (SELECT source, doc_id, n_chars,
        |             CASE WHEN lang = 'en' THEN 2 WHEN lang = 'de' THEN 1 ELSE 0 END AS rel,
        |             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rs,
        |             row_number() OVER (PARTITION BY source ORDER BY rel DESC, doc_id) AS rr
        |           FROM documents),
        |g AS (SELECT source, count(*)::BIGINT AS n_results,
        |        sum(CASE WHEN rs <= 10
        |              THEN (pow(2.0, rel) - 1.0) / (ln(rs::DOUBLE + 1.0) / ln(2.0)) END) AS dcg,
        |        sum(CASE WHEN rr <= 10
        |              THEN (pow(2.0, rel) - 1.0) / (ln(rr::DOUBLE + 1.0) / ln(2.0)) END) AS idcg
        |      FROM r GROUP BY 1)
        |SELECT source, n_results,
        |  floor(coalesce(dcg, 0.0) * 1e6 + 0.5) / 1e6 AS dcg,
        |  floor(coalesce(idcg, 0.0) * 1e6 + 0.5) / 1e6 AS idcg,
        |  floor((CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS ndcg
        |FROM g ORDER BY source""".stripMargin
    )
  )

  // ---- T75: Murphy Brier decomposition (FULL oracle — binned sums,
  // Konig-Huygens resolution identity, divisions last) ----------------
  val q225 = Q(
    "q225_brier_decomposition",
    (s, dir) =>
      graft.ml.Eval.brierDecomposition(
        Tables.documents(s, dir)
          .withColumn("p", (col("n_chars") % 100).cast("double") / lit(100.0))
          .withColumn("lbl", (col("lang") === "en").cast("int")),
        "p", "lbl", bins = 10),
    Some(
      """WITH b AS (SELECT least(floor(((n_chars % 100)::DOUBLE / 100.0) * 10), 9)::INT AS bin,
        |             (n_chars % 100)::DOUBLE / 100.0 AS p,
        |             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |           FROM documents),
        |per AS (SELECT bin, count(*)::DOUBLE AS n, sum(p) AS sp, sum(y) AS sy,
        |          sum(pow(p - y, 2)) AS sq
        |        FROM b GROUP BY 1),
        |t AS (SELECT sum(n) AS nt, sum(sy) AS syt, sum(sq) AS sqt,
        |        sum(n * pow(sp / n - sy / n, 2)) AS reln,
        |        sum(n * pow(sy / n, 2)) AS resn
        |      FROM per)
        |SELECT nt::BIGINT AS n,
        |  floor((sqt / nt) * 1e6 + 0.5) / 1e6 AS brier,
        |  floor((reln / nt) * 1e6 + 0.5) / 1e6 AS reliability,
        |  floor((resn / nt - (syt / nt) * (syt / nt)) * 1e6 + 0.5) / 1e6 AS resolution,
        |  floor(((syt / nt) * (1.0 - syt / nt)) * 1e6 + 0.5) / 1e6 AS uncertainty,
        |  floor((sqt / nt - (reln / nt - (resn / nt - (syt / nt) * (syt / nt)) +
        |    (syt / nt) * (1.0 - syt / nt))) * 1e6 + 0.5) / 1e6 AS brier_residue
        |FROM t""".stripMargin
    )
  )

  // ---- T76: experiment sizing closed forms (FULL oracle — the probit
  // constants ship as round-trip binary64 literals, q194's CAST('…' AS
  // DOUBLE) convention; every remaining op is identical-order IEEE
  // scalar arithmetic, so ceil(n) matches bit-for-bit; the spec still
  // pins textbook values and the requiredN/mde round trip) -------------
  val q226 = Q(
    "q226_power_analysis",
    (s, dir) => {
      // size the purchase-rate experiment the q191 readout measures:
      // baseline from the corpus, target lift 10% relative
      val base = Tables.events(s, dir)
        .agg(avg((col("event_type") === "purchase").cast("double"))).head().getDouble(0)
      graft.ops.Abtest.requiredN(s, math.max(0.01, math.floor(base * 1e4) / 1e4),
        mde = 0.01)
    },
    Some {
      val za = graft.ops.Abtest.probit(1 - 0.05 / 2).toString
      val zb = graft.ops.Abtest.probit(0.8).toString
      s"""WITH b AS (SELECT avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
         |             AS base FROM events),
         |p AS (SELECT greatest(0.01::DOUBLE, floor(base * 1e4) / 1e4) AS p0 FROM b),
         |c AS (SELECT p0, p0 + 0.01::DOUBLE AS p1 FROM p),
         |s AS (SELECT p0, p1,
         |        CAST('$za' AS DOUBLE) * sqrt(2 * ((p0 + p1) / 2) * (1 - (p0 + p1) / 2)) +
         |        CAST('$zb' AS DOUBLE) * sqrt(p0 * (1 - p0) + p1 * (1 - p1)) AS se
         |      FROM c)
         |SELECT p0, p1, 0.05::DOUBLE AS alpha, 0.8::DOUBLE AS "power",
         |  CAST(ceil(se * se / (0.01::DOUBLE * 0.01::DOUBLE)) AS BIGINT) AS n_per_arm
         |FROM s""".stripMargin
    }
  )

  // ---- C69: pandas expanding + pct_change parity (FULL oracle —
  // cumulative ROWS windows evaluate sequentially on both engines;
  // pct_change is a row-local ratio of lagged values) -------------------
  val q227 = Q(
    "q227_expanding_pct",
    (s, dir) => {
      val ser = dailySeries(s, dir)
      val exp = graft.ops.Grouped.expanding(
        ser, Seq("event_type"), "day",
        Seq(c => avg(c.cast("double")), c => max(c)), "n", Seq("run_mean_raw", "run_max"))
        .withColumn("run_mean",
          floor(col("run_mean_raw") * 1e6 + 0.5).cast("double") / 1e6)
        .drop("run_mean_raw")
      graft.ops.Lags.pctChange(exp, Seq("event_type"), Seq("day"), "n", "pct")
        .select(col("event_type"), col("day"), col("n"), col("run_mean"),
          col("run_max"), col("pct"))
        .orderBy("event_type", "day")
    },
    Some(
      s"""WITH $dailySeriesSql
        |SELECT k AS event_type, t AS day, v AS n,
        |  floor((avg(v::DOUBLE) OVER cw) * 1e6 + 0.5) / 1e6 AS run_mean,
        |  (max(v) OVER cw)::BIGINT AS run_max,
        |  CASE WHEN lag(v, 1) OVER pw IS NOT NULL AND lag(v, 1) OVER pw <> 0
        |       THEN floor((v::DOUBLE - lag(v, 1) OVER pw) / abs(lag(v, 1) OVER pw)
        |              * 1e6 + 0.5) / 1e6 END AS pct
        |FROM d
        |WINDOW cw AS (PARTITION BY k ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       pw AS (PARTITION BY k ORDER BY t)
        |ORDER BY event_type, day""".stripMargin
    )
  )

  // ---- C70: per-group forward/backward fill (FULL oracle — planted
  // null gaps, IGNORE NULLS growing frames both directions) ------------
  val q228 = Q(
    "q228_fill_gaps",
    (s, dir) => {
      val gapped = dailySeries(s, dir)
        .withColumn("v", when(col("day") % 3 === 0, lit(null)).otherwise(col("n")))
        .select("event_type", "day", "v")
      val fwd = graft.ops.Lags.fillGaps(
        gapped.withColumnRenamed("v", "v_ffill"), Seq("event_type"), Seq("day"), "v_ffill")
      val bwd = graft.ops.Lags.fillGaps(
        gapped.withColumnRenamed("v", "v_bfill"), Seq("event_type"), Seq("day"), "v_bfill",
        direction = "backward")
      fwd.join(bwd, Seq("event_type", "day"))
        .join(gapped, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("v"), col("v_ffill"), col("v_bfill"))
        .orderBy("event_type", "day")
    },
    Some(
      s"""WITH $dailySeriesSql,
        |g AS (SELECT k, t, CASE WHEN t % 3 = 0 THEN NULL ELSE v END AS v FROM d)
        |SELECT k AS event_type, t AS day, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_bfill
        |FROM g ORDER BY event_type, day""".stripMargin
    )
  )

  // ---- T77: multi-class confusion + macro/micro F1 (FULL oracle — a
  // deterministic corrupted predictor over documents; counts, margins,
  // and closed forms replayed; absent-class conventions pinned) --------
  val q229 = Q(
    "q229_confusion_f1",
    (s, dir) =>
      graft.ml.Eval.confusion(
        Tables.documents(s, dir)
          .withColumn("pred",
            when(col("n_chars") % 5 === 0, lit("en")).otherwise(col("lang"))),
        "lang", "pred"),
    Some(
      """WITH rows_ AS (SELECT lang AS t,
        |    CASE WHEN n_chars % 5 = 0 THEN 'en' ELSE lang END AS p FROM documents),
        |cells AS (SELECT t, p, count(*)::BIGINT AS n FROM rows_ GROUP BY 1, 2),
        |tr AS (SELECT t AS class, sum(n)::BIGINT AS n_true FROM cells GROUP BY 1),
        |pr AS (SELECT p AS class, sum(n)::BIGINT AS n_pred FROM cells GROUP BY 1),
        |tp AS (SELECT t AS class, n::BIGINT AS tp FROM cells WHERE t = p),
        |per AS (SELECT coalesce(tr.class, pr.class) AS class,
        |          coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
        |          coalesce(tp, 0) AS tp
        |        FROM tr FULL OUTER JOIN pr ON tr.class = pr.class
        |          LEFT JOIN tp ON coalesce(tr.class, pr.class) = tp.class),
        |f AS (SELECT class, n_true, n_pred, tp,
        |        CASE WHEN n_pred > 0 THEN tp::DOUBLE / n_pred ELSE 0.0 END AS prec,
        |        CASE WHEN n_true > 0 THEN tp::DOUBLE / n_true ELSE 0.0 END AS rec
        |      FROM per),
        |ff AS (SELECT *, CASE WHEN prec + rec > 0
        |         THEN 2.0 * prec * rec / (prec + rec) ELSE 0.0 END AS f1 FROM f)
        |SELECT class, n_true, n_pred, tp,
        |  floor(prec * 1e6 + 0.5) / 1e6 AS "precision",
        |  floor(rec * 1e6 + 0.5) / 1e6 AS recall,
        |  floor(f1 * 1e6 + 0.5) / 1e6 AS f1,
        |  floor((sum(tp) OVER () )::DOUBLE / (sum(n_true) OVER ())::DOUBLE * 1e6 + 0.5) / 1e6
        |    AS accuracy,
        |  floor((avg(f1) OVER ()) * 1e6 + 0.5) / 1e6 AS macro_f1,
        |  floor((sum(tp) OVER ())::DOUBLE / (sum(n_true) OVER ())::DOUBLE * 1e6 + 0.5) / 1e6
        |    AS micro_f1
        |FROM ff ORDER BY class""".stripMargin
    )
  )

  // ---- P37: exact MIPS top-k (FULL oracle — q25's machinery on the
  // RAW dot product; the augmentation path that feeds the cosine ANN
  // stack is spec-pinned in MipsSpec) ----------------------------------
  val q230 = Q(
    "q230_mips_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.Mips.topK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
    },
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
        |      FROM f a JOIN f b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |      GROUP BY 1, 2),
        |r AS (SELECT qid, nid, dot,
        |        row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rk FROM d)
        |SELECT qid, nid, round(dot, 4) AS dot FROM r WHERE rk <= 5""".stripMargin
    )
  )

  // ---- P38: directional n-gram containment (FULL oracle — planted
  // doc-in-doc pairs: each %9 doc's 15-token prefix becomes its own
  // document; containment(short→long) ≈ 1 where Jaccard stays low) -----
  val q231 = Q(
    "q231_containment",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
      val quotes = docs
        .where(col("doc_id") % 9 === 0)
        .select(
          (col("doc_id") + 2000000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 15)).as("text"),
          col("source"))
      graft.dedup.NGramJaccard
        .containmentJoin(docs.unionByName(quotes), "text", "doc_id", "source",
          n = 2, minContainment = 0.8)
        .orderBy("block", "id_a", "id_b")
    },
    Some(
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(string_split(text, ' ')[1:15], ' '), source
        |  FROM documents WHERE doc_id % 9 = 0),
        |t AS (
        |  SELECT source AS block, doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS ngrams
        |  FROM corpus),
        |p AS (SELECT a.block, a.doc_id AS id_a, b.doc_id AS id_b,
        |        len(list_filter(a.ngrams, g -> list_contains(b.ngrams, g)))::DOUBLE AS inter,
        |        len(a.ngrams) AS la, len(b.ngrams) AS lb
        |      FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id)
        |SELECT block, id_a, id_b,
        |  round(inter / la, 4) AS cont_a_in_b,
        |  round(inter / lb, 4) AS cont_b_in_a
        |FROM p
        |WHERE round(inter / la, 4) >= 0.8 OR round(inter / lb, 4) >= 0.8
        |ORDER BY block, id_a, id_b""".stripMargin
    )
  )

  // ---- S30: Holt-Winters forecast (FULL oracle — the triple-recursion
  // replays as a recursive CTE carrying (level, trend, season-list)
  // state per key, the q194/q278 loop-replay convention; smoothing
  // constants ship as round-trip binary64 literals in the exact Scala
  // op order, so every emitted 6dp value matches) ----------------------
  val q232 = Q(
    "q232_holt_winters",
    (s, dir) =>
      graft.ops.Forecast.holtWinters(
        dailySeries(s, dir), "event_type", "day", "n", period = 7, horizon = 7)
        .orderBy("event_type", "day"),
    Some {
      val al = 0.3.toString; val al1 = (1.0 - 0.3).toString
      val be = 0.1.toString; val be1 = (1.0 - 0.1).toString
      val ga = 0.2.toString; val ga1 = (1.0 - 0.2).toString
      s"""WITH RECURSIVE d AS (SELECT event_type AS k, floor(epoch(ts)/86400)::BIGINT AS t,
         |        count(*)::BIGINT AS v FROM events GROUP BY 1, 2),
         |b0 AS (SELECT k, t, v::DOUBLE AS v,
         |        row_number() OVER (PARTITION BY k ORDER BY t) - 1 AS i,
         |        count(*) OVER (PARTITION BY k) AS cnt
         |       FROM d),
         |ys AS (SELECT k, cnt, max(t) AS last_t, list(v ORDER BY i) AS y
         |       FROM b0 WHERE cnt >= 14 GROUP BY k, cnt),
         |ini AS (SELECT k, cnt, last_t, y,
         |         ((((((y[1]+y[2])+y[3])+y[4])+y[5])+y[6])+y[7])/7 AS m1,
         |         ((((((y[8]+y[9])+y[10])+y[11])+y[12])+y[13])+y[14])/7 AS m2
         |        FROM ys),
         |rec AS (
         |  SELECT k, cnt, last_t, y,
         |    list_transform(range(1, 8), j -> y[j] - m1) AS s,
         |    m1 AS l, (m2 - m1)/7 AS b, 6::BIGINT AS i,
         |    CAST(NULL AS DOUBLE) AS lv, CAST(NULL AS DOUBLE) AS tr,
         |    CAST(NULL AS DOUBLE) AS sv, CAST(NULL AS DOUBLE) AS ft
         |  FROM ini
         |  UNION ALL
         |  SELECT k, cnt, last_t, y,
         |    list_transform(range(1, 8),
         |      j -> CASE WHEN j = pos THEN snew ELSE s[j] END),
         |    lnew, bnew, i + 1, lnew, bnew, snew, fitted
         |  FROM (
         |    SELECT p.*,
         |      CAST('$be' AS DOUBLE)*(p.lnew - p.l) + CAST('$be1' AS DOUBLE)*p.b AS bnew,
         |      CAST('$ga' AS DOUBLE)*(p.yi - p.lnew) + CAST('$ga1' AS DOUBLE)*p.sprev AS snew
         |    FROM (
         |      SELECT q.*, ((q.i + 1) % 7) + 1 AS pos, q.y[q.i + 2] AS yi,
         |        q.s[((q.i + 1) % 7) + 1] AS sprev,
         |        q.l + q.b + q.s[((q.i + 1) % 7) + 1] AS fitted,
         |        CAST('$al' AS DOUBLE)*(q.y[q.i + 2] - q.s[((q.i + 1) % 7) + 1])
         |          + CAST('$al1' AS DOUBLE)*(q.l + q.b) AS lnew
         |      FROM rec q WHERE q.i + 1 <= q.cnt - 1
         |    ) p
         |  )
         |),
         |out AS (
         |  SELECT k, t, v, CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
         |         CAST(NULL AS DOUBLE) AS seasonal, CAST(NULL AS DOUBLE) AS fitted,
         |         false AS is_forecast
         |  FROM b0 WHERE cnt < 14
         |  UNION ALL
         |  SELECT b0.k, b0.t, b0.v, NULL, NULL,
         |         floor((b0.v - ini.m1)*1e6+0.5)/1e6, NULL, false
         |  FROM b0 JOIN ini ON b0.k = ini.k WHERE b0.i < 7
         |  UNION ALL
         |  SELECT r.k, b0.t, b0.v, floor(r.lv*1e6+0.5)/1e6, floor(r.tr*1e6+0.5)/1e6,
         |         floor(r.sv*1e6+0.5)/1e6, floor(r.ft*1e6+0.5)/1e6, false
         |  FROM rec r JOIN b0 ON b0.k = r.k AND b0.i = r.i WHERE r.i >= 7
         |  UNION ALL
         |  SELECT r.k, r.last_t + h.j, NULL, NULL, NULL,
         |         floor(r.s[CAST((r.cnt - 1 + h.j) % 7 AS BIGINT) + 1]*1e6+0.5)/1e6,
         |         floor((r.l + h.j*r.b + r.s[CAST((r.cnt - 1 + h.j) % 7 AS BIGINT) + 1])
         |           *1e6+0.5)/1e6, true
         |  FROM rec r CROSS JOIN (SELECT unnest(range(1, 8)) AS j) h
         |  WHERE r.i = r.cnt - 1
         |)
         |SELECT k AS event_type, t AS day, v AS n, level, trend, seasonal, fitted,
         |       is_forecast
         |FROM out ORDER BY event_type, day""".stripMargin
    }
  )

  // ---- P39: multi-source BFS hop distance (FULL oracle — the q54
  // recursive-CTE convention with a hop bound; undirected q166 edges;
  // first discovery = min distance on both engines) --------------------
  val q233 = Q(
    "q233_bfs_distance",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val directed = o.join(li, col("l_orderkey") === col("o_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      val edges = directed
        .unionByName(directed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val seeds = Tables.customer(s, dir)
        .where(col("c_custkey") < 5)
        .select(concat(lit("c"), col("c_custkey").cast("string")).as("node"))
      graft.graph.Bfs.hopDistance(edges, seeds, maxHops = 4).orderBy("node")
    },
    Some(
      """WITH RECURSIVE d0 AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM d0 UNION SELECT dst, src FROM d0),
        |seeds AS (SELECT 'c' || c_custkey AS node FROM customer WHERE c_custkey < 5),
        |reach(node, d) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, reach.d + 1 FROM e JOIN reach ON e.src = reach.node
        |  WHERE reach.d < 4)
        |SELECT node, min(d) AS dist FROM reach GROUP BY 1 ORDER BY node""".stripMargin
    )
  )

  // ---- Z18: gaps-and-islands interval union (FULL oracle — keyed
  // running-max windows, integer second arithmetic; half-hour activity
  // windows per event merge into per-user sessions-of-coverage) --------
  val q234 = Q(
    "q234_interval_islands",
    (s, dir) => {
      val spans = Tables.events(s, dir).select(
        col("user_id"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) + 1800L).as("e"))
      graft.ops.Islands.coverage(spans, "user_id", "s", "e")
        .orderBy("user_id", "island")
    },
    Some(
      """WITH sp AS (SELECT user_id, floor(epoch(ts))::BIGINT AS s,
        |              floor(epoch(ts))::BIGINT + 1800 AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |        CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             THEN 1 ELSE 0 END AS nw
        |      FROM sp),
        |i AS (SELECT user_id, s, e,
        |        (sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS island
        |      FROM m),
        |isl AS (SELECT user_id, island, min(s) AS island_start, max(e) AS island_end,
        |          count(*)::BIGINT AS n_spans
        |        FROM i GROUP BY 1, 2)
        |SELECT user_id, island, island_start, island_end, n_spans,
        |  (island_end - island_start) AS covered,
        |  (count(*) OVER (PARTITION BY user_id))::BIGINT AS n_islands,
        |  (sum(island_end - island_start) OVER (PARTITION BY user_id))::BIGINT AS total_covered
        |FROM isl ORDER BY user_id, island""".stripMargin
    )
  )

  // ---- T78: paired t-test (FULL oracle — explicit-moment variance,
  // per-user first-half/second-half activity means as matched pairs) ---
  val q235 = Q(
    "q235_paired_t",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("value"))
      val mm = ev.agg(min("sec"), max("sec")).head()
      val mid = (mm.getLong(0) + mm.getLong(1)) / 2
      val pairs = ev
        .groupBy("user_id")
        .agg(
          avg(when(col("sec") <= mid, col("value"))).as("x"),
          avg(when(col("sec") > mid, col("value"))).as("y"))
        .where(col("x").isNotNull && col("y").isNotNull)
      graft.ops.Stats.pairedT(pairs, "x", "y")
    },
    Some(
      """WITH ev AS (SELECT user_id, floor(epoch(ts))::BIGINT AS sec, value FROM events),
        |mm AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM ev),
        |p AS (SELECT user_id,
        |        avg(CASE WHEN sec <= (SELECT mid FROM mm) THEN value END) AS x,
        |        avg(CASE WHEN sec > (SELECT mid FROM mm) THEN value END) AS y
        |      FROM ev GROUP BY 1),
        |q AS (SELECT x - y AS d FROM p WHERE x IS NOT NULL AND y IS NOT NULL),
        |t AS (SELECT count(*)::DOUBLE AS n, sum(d) AS sd, sum(d*d) AS qd FROM q)
        |SELECT n::BIGINT AS n,
        |  floor((sd / n) * 1e6 + 0.5) / 1e6 AS mean_diff,
        |  floor(sqrt((qd - sd*sd/n) / (n - 1)) * 1e6 + 0.5) / 1e6 AS sd_diff,
        |  floor(((sd / n) / sqrt(((qd - sd*sd/n) / (n - 1)) / n)) * 1e6 + 0.5) / 1e6 AS t
        |FROM t""".stripMargin
    )
  )

  // ---- T79: one-way ANOVA + eta-squared (FULL oracle — one k-row
  // moment aggregate, closed forms, divisions last) --------------------
  val q236 = Q(
    "q236_anova",
    (s, dir) =>
      graft.ops.Stats.anovaOneWay(Tables.events(s, dir), "value", "event_type"),
    Some(
      """WITH g AS (SELECT event_type, count(*)::DOUBLE AS nj, sum(value) AS sj,
        |             sum(value*value) AS qj
        |           FROM events GROUP BY 1),
        |t AS (SELECT count(*)::DOUBLE AS k, sum(nj) AS n, sum(sj) AS st, sum(qj) AS qt,
        |        sum(sj*sj/nj) AS sb_raw FROM g)
        |SELECT k::BIGINT AS k, n::BIGINT AS n,
        |  floor((sb_raw - st*st/n) * 1e2 + 0.5) / 1e2 AS ss_between,
        |  floor((qt - sb_raw) * 1e2 + 0.5) / 1e2 AS ss_within,
        |  floor((((sb_raw - st*st/n) / (k - 1)) / ((qt - sb_raw) / (n - k))) * 1e6 + 0.5) / 1e6
        |    AS f_stat,
        |  floor(((sb_raw - st*st/n) / (qt - st*st/n)) * 1e6 + 0.5) / 1e6 AS eta_sq
        |FROM t""".stripMargin
    )
  )

  // ---- T80: Brown-Forsythe/Levene variance-homogeneity test (FULL
  // oracle — exact group medians via the q17 percentile bridge, then
  // the q236 ANOVA closed form over |x - med|) -------------------------
  val q237 = Q(
    "q237_levene",
    (s, dir) =>
      graft.ops.Stats.leveneTest(Tables.events(s, dir), "value", "event_type"),
    Some(
      """WITH meds AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |              FROM events GROUP BY 1),
        |z AS (SELECT e.event_type, abs(e.value - m.med) AS z
        |      FROM events e JOIN meds m USING (event_type)),
        |g AS (SELECT event_type, count(*)::DOUBLE AS nj, sum(z) AS sj, sum(z*z) AS qj
        |      FROM z GROUP BY 1),
        |t AS (SELECT count(*)::DOUBLE AS k, sum(nj) AS n, sum(sj) AS st, sum(qj) AS qt,
        |        sum(sj*sj/nj) AS sb_raw FROM g)
        |SELECT k::BIGINT AS k, n::BIGINT AS n,
        |  floor((sb_raw - st*st/n) * 1e2 + 0.5) / 1e2 AS ss_between,
        |  floor((qt - sb_raw) * 1e2 + 0.5) / 1e2 AS ss_within,
        |  floor((((sb_raw - st*st/n) / (k - 1)) / ((qt - sb_raw) / (n - k))) * 1e6 + 0.5) / 1e6
        |    AS f_stat,
        |  floor(((sb_raw - st*st/n) / (qt - st*st/n)) * 1e6 + 0.5) / 1e6 AS eta_sq
        |FROM t""".stripMargin
    )
  )

  // ---- C71: GLM average marginal effects (rows-only: the logit fit
  // is iterative; GlmSpec pins AME against a numerical derivative) -----
  val q238 = Q(
    "q238_logit_ame",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(
        (col("o_orderpriority") === "1-URGENT").cast("int").as("y"),
        (col("o_totalprice") / lit(100000.0)).as("x_price"),
        (unix_timestamp(col("o_orderdate")) / lit(86400.0 * 3650)).as("x_age"))
      val m = graft.ml.Glm.logistic(o, "y", Seq("x_price", "x_age"))
      graft.ml.Glm.averageMarginalEffects(o, m).orderBy("name")
    },
    // FULL oracle (r11): the 3-parameter logistic replays via
    // OracleSql.logisticIrls3 (pivot-mirrored solves); the AME is one
    // scoring aggregate — mean dμ/dη = avg μ(1−μ) at the final β — and
    // coef·meanDeriv per covariate, floor-quantized like the query
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT (o_totalprice/100000.0)::DOUBLE AS x1,
         |         epoch(o_orderdate)/315360000.0 AS x2,
         |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END AS y
         |  FROM orders),
         |${OracleSql.logisticIrls3("src")},
         |md AS (SELECT sum(mu*(1.0 - mu))/count(*) AS m FROM (
         |  SELECT 1.0/(1.0 + exp(-least(greatest(
         |    f.b0 + src.x1*f.b1 + src.x2*f.b2, -30.0), 30.0))) AS mu
         |  FROM src, lg3fin f))
         |SELECT name, floor(coef*1e6 + 0.5)/1e6 AS coef,
         |  floor((coef*(SELECT m FROM md))*1e6 + 0.5)/1e6 AS ame
         |FROM (SELECT 'x_price' AS name, b1 AS coef FROM lg3fin
         |      UNION ALL SELECT 'x_age', b2 FROM lg3fin)
         |ORDER BY name""".stripMargin
    }
  )

  // ---- T81: Kaplan-Meier with Greenwood bands (FULL oracle — q168's
  // replay plus one more prefix sum; the d = n terminal convention is
  // explicit on both sides) --------------------------------------------
  val q239 = Q(
    "q239_km_greenwood",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val per = ev
        .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val maxDay = per.agg(max("d1")).head().getLong(0)
      val spans = per.select(
        (col("d1") - col("d0") + 1).cast("double").as("dur"),
        when(col("d1") < maxDay - 7, 1).otherwise(0).as("ev"))
      graft.ml.Survival.kaplanMeierCI(spans, "dur", "ev")
    },
    Some(
      """WITH d AS (SELECT user_id, floor(epoch(ts)/86400)::BIGINT AS day FROM events),
        |p AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
        |mx AS (SELECT max(d1) AS m FROM p),
        |sp AS (SELECT (d1 - d0 + 1)::DOUBLE AS t,
        |         CASE WHEN d1 < (SELECT m FROM mx) - 7 THEN 1 ELSE 0 END AS ev FROM p),
        |c AS (SELECT t, sum(ev)::BIGINT AS d, sum(1 - ev)::BIGINT AS cns FROM sp GROUP BY 1),
        |r AS (SELECT t, d, cns,
        |        (sum(d + cns) OVER (ORDER BY t DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS n_risk FROM c),
        |k AS (SELECT t, n_risk, d, cns,
        |        CASE WHEN d > 0
        |          THEN ln(greatest(1.0 - d::DOUBLE/n_risk::DOUBLE, 1e-300)) ELSE 0.0 END AS lt,
        |        CASE WHEN d > 0 AND n_risk > d
        |          THEN d::DOUBLE / (n_risk::DOUBLE * (n_risk - d)::DOUBLE) ELSE 0.0 END AS gw
        |      FROM r),
        |w AS (SELECT t, n_risk, d, cns,
        |        exp(sum(lt) OVER pa) AS surv,
        |        exp(sum(lt) OVER pa) * sqrt(sum(gw) OVER pa) AS se
        |      FROM k WINDOW pa AS (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT t, n_risk, d AS d_events, cns AS n_censored,
        |  floor(surv * 1e6 + 0.5) / 1e6 AS survival,
        |  floor(se * 1e6 + 0.5) / 1e6 AS se,
        |  floor(greatest(0.0, surv - 1.959964 * se) * 1e6 + 0.5) / 1e6 AS ci_lo,
        |  floor(least(1.0, surv + 1.959964 * se) * 1e6 + 0.5) / 1e6 AS ci_hi
        |FROM w ORDER BY t""".stripMargin
    )
  )

  // ---- C72: OLS fit statistics (FULL oracle — SSR re-minimized from
  // the SQL closed-form slope is first-order insensitive to coefficient
  // ulps, so R2/RMSE/AIC agree far inside their quantizers) ------------
  val q240 = Q(
    "q240_ols_fit_stats",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_totalprice").cast("double").as("y"),
        floor(unix_timestamp(col("o_orderdate")) / 86400).cast("double").as("x"))
      val m = graft.ml.Ols.fit(o, "y", Seq("x"))
      graft.ml.Ols.fitStats(s, m)
    },
    Some(
      """WITH d AS (SELECT o_totalprice::DOUBLE AS y,
        |             floor(epoch(o_orderdate)/86400)::DOUBLE AS x FROM orders),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM d),
        |cf AS (SELECT n, (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b,
        |         (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx)/n AS a,
        |         syy - sy*sy/n AS sst FROM m),
        |rr AS (SELECT cf.n AS n, cf.sst AS sst,
        |         sum((y - a - b*x)*(y - a - b*x)) AS ssr
        |       FROM d CROSS JOIN cf GROUP BY cf.n, cf.sst)
        |SELECT n::BIGINT AS n, 2::BIGINT AS k,
        |  floor((1.0 - ssr/sst) * 1e6 + 0.5) / 1e6 AS r2,
        |  floor((1.0 - (ssr/sst) * (n - 1.0)/(n - 2.0)) * 1e6 + 0.5) / 1e6 AS adj_r2,
        |  floor(sqrt(ssr/n) * 1e6 + 0.5) / 1e6 AS rmse,
        |  floor((-0.5 * n * (ln(2.0 * pi()) + ln(ssr/n) + 1.0)) * 1e2 + 0.5) / 1e2 AS log_lik,
        |  floor((6.0 + n * (ln(2.0 * pi()) + ln(ssr/n) + 1.0)) * 1e2 + 0.5) / 1e2 AS aic,
        |  floor((3.0 * ln(n) + n * (ln(2.0 * pi()) + ln(ssr/n) + 1.0)) * 1e2 + 0.5) / 1e2 AS bic
        |FROM rr""".stripMargin
    )
  )

  // ---- T82: per-key time-bucket quota (FULL oracle — keyed
  // row_number over integer buckets, the crawl-politeness cap) ---------
  val q241 = Q(
    "q241_quota_cap",
    (s, dir) =>
      graft.ops.Quota.perKeyWindow(
        Tables.events(s, dir).select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", bucketSec = 86400L, limit = 3)
        .select(col("event_id"), col("user_id"), col("bucket"), col("kept"))
        .orderBy("event_id"),
    Some(
      """WITH b AS (SELECT event_id, user_id,
        |             floor(epoch(ts))::BIGINT // 86400 AS bucket,
        |             row_number() OVER (PARTITION BY user_id, floor(epoch(ts))::BIGINT // 86400
        |               ORDER BY ts, event_id) AS rn
        |           FROM events)
        |SELECT event_id, user_id, bucket,
        |  (CASE WHEN rn <= 3 THEN 1 ELSE 0 END)::BIGINT AS kept
        |FROM b ORDER BY event_id""".stripMargin
    )
  )

  // ---- T83: Laplace-noised count release (FULL oracle — the seeded
  // inverse-CDF noise is a pure function of (seed, group) via the
  // shared md5-60, so DuckDB regenerates the identical release) --------
  val q242 = Q(
    "q242_dp_counts",
    (s, dir) =>
      graft.ops.Privacy.laplaceCounts(
        Tables.documents(s, dir), "source", epsilon = 0.5)
        .orderBy("source"),
    Some(
      s"""WITH g AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1),
        |u AS (SELECT source, n,
        |        ((${graft.functions.SharedHash.md5Long60Sql("'graft-release' || '|' || source")})::DOUBLE + 0.5)
        |          / 1152921504606846976.0 - 0.5 AS uu
        |      FROM g),
        |l AS (SELECT source, n,
        |        -2.0 * sign(uu) * ln(1.0 - 2.0 * abs(uu)) AS lap
        |      FROM u)
        |SELECT source, n,
        |  floor(lap * 1e6 + 0.5) / 1e6 AS noise,
        |  greatest(0, floor(n + floor(lap * 1e6 + 0.5) / 1e6 + 0.5)::BIGINT) AS released
        |FROM l ORDER BY source""".stripMargin
    )
  )

  // ---- C73: Kendall τ-b per entity (FULL oracle — integer pair
  // classification via the bounded-group self-join; one final division)
  val q243 = Q(
    "q243_kendall_tau",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"),
        col("value"),
        unix_timestamp(col("ts")).cast("double").as("tsec"),
        col("event_id"))
      graft.ops.Stats.kendallTau(ev, "user_id", "value", "tsec", "event_id")
        .orderBy("user_id")
    },
    Some(
      """WITH b AS (SELECT user_id AS g, value::DOUBLE AS x,
        |             floor(epoch(ts))::DOUBLE AS y, event_id AS i FROM events),
        |p AS (SELECT l.g AS g, l.x - r.x AS dx, l.y - r.y AS dy
        |      FROM b l JOIN b r ON l.g = r.g AND l.i < r.i),
        |c AS (SELECT g,
        |        sum(CASE WHEN dx <> 0 AND dy <> 0 AND sign(dx) = sign(dy)
        |              THEN 1 ELSE 0 END)::BIGINT AS concordant,
        |        sum(CASE WHEN dx <> 0 AND dy <> 0 AND sign(dx) <> sign(dy)
        |              THEN 1 ELSE 0 END)::BIGINT AS discordant,
        |        sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END)::BIGINT AS tied_x,
        |        sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END)::BIGINT AS tied_y
        |      FROM p GROUP BY 1),
        |nn AS (SELECT g, count(*)::BIGINT AS n FROM b GROUP BY 1)
        |SELECT nn.g AS user_id, nn.n AS n, concordant, discordant, tied_x, tied_y,
        |  floor((concordant - discordant)::DOUBLE /
        |    sqrt(((nn.n*(nn.n-1)//2 - tied_x) * (nn.n*(nn.n-1)//2 - tied_y))::DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS tau_b
        |FROM c JOIN nn USING (g) ORDER BY user_id""".stripMargin
    )
  )

  // ---- C74: Kruskal–Wallis H (FULL oracle — ops.Rank global mid-ranks
  // replayed by rank() + tie-count windows; exact half-integer ranks) --
  val q244 = Q(
    "q244_kruskal_wallis",
    (s, dir) =>
      graft.ops.Stats.kruskalWallis(
        Tables.orders(s, dir), "o_totalprice", "o_orderpriority", "o_orderkey"),
    Some(
      """WITH b AS (SELECT o_orderpriority AS g, o_totalprice::DOUBLE AS v,
        |             o_orderkey AS tb FROM orders),
        |r AS (SELECT g, v,
        |        rank() OVER (ORDER BY v) + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS r
        |      FROM b),
        |pg AS (SELECT g, count(*)::DOUBLE AS ng, sum(r) AS rg FROM r GROUP BY 1),
        |gs AS (SELECT sum(rg*rg/ng) AS sr2, count(*)::BIGINT AS k, sum(ng) AS nn FROM pg),
        |tt AS (SELECT sum(t*t*t - t) AS t3t
        |       FROM (SELECT count(*)::DOUBLE AS t FROM b GROUP BY v))
        |SELECT nn::BIGINT AS n, k, (k-1)::BIGINT AS dof,
        |  floor((12.0/(nn*(nn+1))*sr2 - 3.0*(nn+1)) * 1e6 + 0.5)/1e6 AS h,
        |  floor(((12.0/(nn*(nn+1))*sr2 - 3.0*(nn+1)) /
        |    (1.0 - t3t/(nn*nn*nn - nn))) * 1e6 + 0.5)/1e6 AS h_adj
        |FROM gs CROSS JOIN tt""".stripMargin
    )
  )

  // ---- C75: Jarque–Bera normality per group (FULL oracle — textually
  // identical raw→central moment algebra on both engines) --------------
  val q245 = Q(
    "q245_jarque_bera",
    (s, dir) =>
      graft.ops.Stats.jarqueBera(Tables.documents(s, dir), "lang", "n_chars")
        .orderBy("lang"),
    Some(
      """WITH a AS (SELECT lang AS g, count(*)::DOUBLE AS n, sum(x) AS s1,
        |             sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
        |           FROM (SELECT lang, n_chars::DOUBLE AS x FROM documents) GROUP BY 1),
        |m AS (SELECT g, n, s1/n AS mu, s2, s3, s4 FROM a),
        |c AS (SELECT g, n,
        |        s2/n - mu*mu AS m2,
        |        s3/n - 3.0*mu*s2/n + 2.0*mu*mu*mu AS m3,
        |        s4/n - 4.0*mu*s3/n + 6.0*mu*mu*s2/n - 3.0*mu*mu*mu*mu AS m4
        |      FROM m),
        |k AS (SELECT g, n, m3/sqrt(m2*m2*m2) AS skew, m4/(m2*m2) AS kurt FROM c)
        |SELECT g AS lang, n::BIGINT AS n,
        |  floor(skew*1e6+0.5)/1e6 AS skewness,
        |  floor(kurt*1e6+0.5)/1e6 AS kurtosis,
        |  floor(n/6.0*(skew*skew + (kurt-3.0)*(kurt-3.0)/4.0)*1e6+0.5)/1e6 AS jb
        |FROM k ORDER BY lang""".stripMargin
    )
  )

  // ---- C76: McNemar paired flip test (FULL oracle — integer discordant
  // cells over per-user derived binaries) ------------------------------
  val q246 = Q(
    "q246_mcnemar",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id").agg(
        (sum(when(col("event_type") === "purchase", 1).otherwise(0)) >
          sum(when(col("event_type") === "click", 1).otherwise(0))).cast("int").as("a"),
        (sum(when(col("event_type") === "error", 1).otherwise(0)) >
          sum(when(col("event_type") === "view", 1).otherwise(0))).cast("int").as("b"))
      graft.ops.Stats.mcnemar(per, "a", "b")
    },
    Some(
      """WITH per AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) >
        |              sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
        |      THEN 1 ELSE 0 END AS a,
        |    CASE WHEN sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) >
        |              sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
        |      THEN 1 ELSE 0 END AS b
        |  FROM events GROUP BY 1),
        |agg AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN a=1 AND b=1 THEN 1 ELSE 0 END)::BIGINT AS n_both,
        |    sum(CASE WHEN a=0 AND b=0 THEN 1 ELSE 0 END)::BIGINT AS n_neither,
        |    sum(CASE WHEN a=1 AND b=0 THEN 1 ELSE 0 END)::BIGINT AS a_only,
        |    sum(CASE WHEN a=0 AND b=1 THEN 1 ELSE 0 END)::BIGINT AS b_only
        |  FROM per)
        |SELECT n, n_both, n_neither, a_only, b_only,
        |  CASE WHEN a_only + b_only = 0 THEN 0.0
        |       ELSE floor((abs(a_only - b_only)::DOUBLE - 1.0) *
        |              (abs(a_only - b_only)::DOUBLE - 1.0) /
        |              (a_only + b_only)::DOUBLE * 1e6 + 0.5)/1e6 END AS chi2
        |FROM agg""".stripMargin
    )
  )

  // ---- C77: per-key ACF + Ljung–Box (FULL oracle — keyed row_number,
  // one band self-join covering all lags, ≤maxLag-row cumulative Q) ----
  val q247 = Q(
    "q247_ljung_box",
    (s, dir) =>
      graft.ml.Diagnostics.ljungBox(
        Tables.events(s, dir), "user_id", "ts", "value", "event_id", maxLag = 3)
        .orderBy("user_id", "lag"),
    Some(
      """WITH b AS (SELECT user_id AS k,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |             value::DOUBLE AS x FROM events),
        |m AS (SELECT k, count(*)::BIGINT AS n, avg(x) AS mu,
        |        sum(x*x) - count(*)*avg(x)*avg(x) AS den
        |      FROM b GROUP BY 1
        |      HAVING count(*) > 3 AND (sum(x*x) - count(*)*avg(x)*avg(x)) > 0),
        |l AS (SELECT a.k AS k, a.rn - bb.rn AS lag, a.x AS xt, bb.x AS xl
        |      FROM b a JOIN b bb ON a.k = bb.k AND a.rn - bb.rn BETWEEN 1 AND 3),
        |r AS (SELECT l.k AS k, l.lag AS lag, any_value(m.n) AS n,
        |        sum((xt - m.mu)*(xl - m.mu)) / any_value(m.den) AS rho_raw
        |      FROM l JOIN m ON l.k = m.k GROUP BY 1, 2),
        |q AS (SELECT k, lag, n, rho_raw,
        |        n*(n+2) * sum(rho_raw*rho_raw/(n - lag))
        |          OVER (PARTITION BY k ORDER BY lag ROWS UNBOUNDED PRECEDING) AS lb_raw
        |      FROM r)
        |SELECT k AS user_id, lag::BIGINT AS lag, n,
        |  floor(rho_raw*1e6+0.5)/1e6 AS rho,
        |  floor(lb_raw*1e6+0.5)/1e6 AS lb_q
        |FROM q ORDER BY user_id, lag""".stripMargin
    )
  )

  // ---- C78: Theil–Sen robust trend per entity (FULL oracle — pairwise
  // slopes via the bounded-group self-join; exact interpolating median
  // on both engines) ---------------------------------------------------
  val q248 = Q(
    "q248_theil_sen",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"),
        unix_timestamp(col("ts")).cast("double").as("tsec"),
        col("value"),
        col("event_id"))
      graft.ops.Stats.theilSen(ev, "user_id", "tsec", "value", "event_id")
        .orderBy("user_id")
    },
    Some(
      """WITH b AS (SELECT user_id AS g, floor(epoch(ts))::DOUBLE AS x,
        |             value::DOUBLE AS y, event_id AS i FROM events),
        |sl AS (SELECT l.g AS g, (l.y - r.y)/(l.x - r.x) AS s
        |       FROM b l JOIN b r ON l.g = r.g AND l.i < r.i WHERE l.x <> r.x),
        |m AS (SELECT g, count(*)::BIGINT AS n_pairs, quantile_cont(s, 0.5) AS bb
        |      FROM sl GROUP BY 1),
        |fin AS (SELECT b.g AS g, count(*)::BIGINT AS n,
        |          any_value(m.n_pairs) AS n_pairs, any_value(m.bb) AS bb,
        |          quantile_cont(y - m.bb * x, 0.5) AS aa
        |        FROM b JOIN m ON b.g = m.g GROUP BY 1)
        |SELECT g AS user_id, n, n_pairs,
        |  floor(bb*1e6+0.5)/1e6 AS slope,
        |  floor(aa*1e6+0.5)/1e6 AS intercept
        |FROM fin ORDER BY user_id""".stripMargin
    )
  )

  // ---- P40: link prediction over the customer–supplier bipartite graph
  // (FULL oracle — wedge join + integer common-neighbor counts;
  // Adamic–Adar's 1/ln(deg) summed over ~10² terms sits 10 orders
  // inside the quantizer) ----------------------------------------------
  val q249 = Q(
    "q249_link_pred",
    (s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      graft.graph.LinkPred.bipartiteScores(edges, "cust", "supp", minCommon = 20L)
        .orderBy("node_a", "node_b")
    },
    Some(
      """WITH e AS (SELECT DISTINCT o_custkey AS l, l_suppkey AS r
        |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |ld AS (SELECT l, count(*)::BIGINT AS dl FROM e GROUP BY 1),
        |rd AS (SELECT r, count(*)::BIGINT AS dr FROM e GROUP BY 1),
        |w AS (SELECT a.r AS ra, b.r AS rb, ld.dl AS dl
        |      FROM e a JOIN e b ON a.l = b.l AND a.r < b.r JOIN ld ON a.l = ld.l),
        |p AS (SELECT ra, rb, count(*)::BIGINT AS cn,
        |        sum(CASE WHEN dl > 1 THEN 1.0/ln(dl::DOUBLE) ELSE 0.0 END) AS aa_raw
        |      FROM w GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT ra AS node_a, rb AS node_b, cn, da.dr AS deg_a, db.dr AS deg_b,
        |  floor(aa_raw*1e6+0.5)/1e6 AS aa,
        |  floor(cn::DOUBLE/(da.dr + db.dr - cn)*1e6+0.5)/1e6 AS jaccard
        |FROM p JOIN rd da ON p.ra = da.r JOIN rd db ON p.rb = db.r
        |ORDER BY node_a, node_b""".stripMargin
    )
  )

  // ---- C79: Lorenz curve by exact global decile (FULL oracle —
  // Rank.withGlobalNtile replayed by ntile(); integer-cents cumsums) ---
  val q250 = Q(
    "q250_lorenz",
    (s, dir) =>
      graft.ops.Stats.lorenz(
        Tables.customer(s, dir), "c_acctbal", "c_custkey", buckets = 10)
        .orderBy("bucket"),
    Some(
      """WITH b AS (SELECT (round(c_acctbal*100))::BIGINT AS x, c_custkey AS tb
        |           FROM customer WHERE c_acctbal > 0),
        |t AS (SELECT x, ntile(10) OVER (ORDER BY x, tb) AS bucket FROM b),
        |p AS (SELECT bucket, count(*)::BIGINT AS n, sum(x)::BIGINT AS cents
        |      FROM t GROUP BY 1),
        |c AS (SELECT bucket, n, cents,
        |        (sum(cents) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_cents,
        |        sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
        |        sum(n) OVER () AS tot_n, sum(cents) OVER () AS tot_c
        |      FROM p)
        |SELECT bucket::INT AS bucket, n, cents, cum_cents,
        |  floor(cum_n::DOUBLE/tot_n*1e6+0.5)/1e6 AS cum_pop_share,
        |  floor(cum_cents::DOUBLE/tot_c*1e6+0.5)/1e6 AS cum_value_share
        |FROM c ORDER BY bucket""".stripMargin
    )
  )

  // ---- C80: Cochran–Mantel–Haenszel stratified 2×2 (FULL oracle —
  // integer per-stratum cells; the chi-square is computed from the RAW
  // sums in a separate CTE layer so DuckDB's alias-shadowing lateral
  // references can't quantize early) -----------------------------------
  val q251 = Q(
    "q251_cmh",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("strat"),
        (col("o_totalprice") > 250000).cast("int").as("exposed"),
        (col("o_orderstatus") === "F").cast("int").as("outcome"))
      graft.ops.Stats.cmh(o, "strat", "exposed", "outcome")
    },
    Some(
      """WITH b AS (SELECT o_orderpriority AS s,
        |    CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS e,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o
        |  FROM orders),
        |per AS (SELECT s,
        |    sum(CASE WHEN e=1 AND o=1 THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(e)::BIGINT AS r1, sum(1-e)::BIGINT AS r2,
        |    sum(o)::BIGINT AS c1, sum(1-o)::BIGINT AS c2,
        |    count(*)::BIGINT AS nn
        |  FROM b GROUP BY 1),
        |v AS (SELECT *, nn > 1 AND r1 > 0 AND r2 > 0 AND c1 > 0 AND c2 > 0 AS ok FROM per),
        |agg AS (SELECT count(*)::BIGINT AS strata,
        |    sum(CASE WHEN ok THEN a ELSE 0 END)::BIGINT AS sum_a,
        |    sum(CASE WHEN ok THEN r1::DOUBLE*c1/nn ELSE 0.0 END) AS sum_e,
        |    sum(CASE WHEN ok THEN r1::DOUBLE*r2*c1*c2/(nn::DOUBLE*nn*(nn-1)) ELSE 0.0 END) AS sum_v
        |  FROM v),
        |fin AS (SELECT strata, sum_a, sum_e, sum_v,
        |    CASE WHEN sum_v = 0 THEN 0.0
        |         ELSE (abs(sum_a - sum_e) - 0.5)*(abs(sum_a - sum_e) - 0.5)/sum_v END AS chi_raw
        |  FROM agg)
        |SELECT strata, sum_a,
        |  floor(sum_e*1e6+0.5)/1e6 AS sum_e,
        |  floor(sum_v*1e6+0.5)/1e6 AS sum_v,
        |  CASE WHEN sum_v = 0 THEN 0.0 ELSE floor(chi_raw*1e6+0.5)/1e6 END AS cmh_chi2
        |FROM fin""".stripMargin
    )
  )

  /** k-step-unrolled greedy MMR replay (the [[pageRankOracleSql]]
    * convention): candidate shortlist + pairwise sims once, then per
    * round one argmax CTE (selection compares the 1e-6-quantized score
    * with cid tie-break — the documented Mmr determinism contract) and
    * one running-max update CTE. Float constants are interpolated from
    * the SAME Scala doubles the Spark plan uses (λ and 1−λ), so both
    * engines evaluate identical binary64 literals.
    */
  private def mmrOracleSql(k: Int, lambda: Double, nQueries: Int, shortlist: Int): String = {
    val lam = lambda.toString
    val om = (1.0 - lambda).toString
    val sb = new StringBuilder
    sb ++= s"""WITH f AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
              |            unnest(range(len(embedding))) AS i FROM embeddings),
              |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
              |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
              |      FROM f a JOIN f b ON a.i = b.i AND a.vec_id < $nQueries AND b.vec_id <> a.vec_id
              |      GROUP BY 1, 2),
              |c AS (SELECT qid, nid, dot/(na.nrm*nb.nrm) AS cos FROM d
              |      JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid),
              |cand AS (SELECT qid, nid AS cid, round(cos, 4) AS rel FROM
              |         (SELECT qid, nid, cos,
              |            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk FROM c)
              |         WHERE rk <= $shortlist),
              |pd AS (SELECT x.qid AS qid, x.cid AS ca, y.cid AS cb, sum(fa.v*fb.v) AS dot
              |       FROM cand x JOIN cand y ON x.qid = y.qid AND x.cid <> y.cid
              |       JOIN f fa ON fa.vec_id = x.cid
              |       JOIN f fb ON fb.vec_id = y.cid AND fa.i = fb.i
              |       GROUP BY 1, 2, 3),
              |ps AS (SELECT qid, ca, cb, dot/(na.nrm*nb.nrm) AS cos FROM pd
              |       JOIN n na ON na.vec_id = ca JOIN n nb ON nb.vec_id = cb),
              |s0 AS (SELECT qid, cid, rel, -1.0 AS ms FROM cand)""".stripMargin
    for (i <- 1 to k) {
      sb ++= s""",
                |p$i AS (SELECT qid, cid, rel, ms FROM
                |        (SELECT *, row_number() OVER (PARTITION BY qid
                |           ORDER BY floor(($lam*rel - $om*ms)*1e6 + 0.5) DESC, cid) AS rk
                |         FROM s${i - 1})
                |        WHERE rk = 1)""".stripMargin
      if (i < k) sb ++= s""",
                |s$i AS (SELECT r.qid AS qid, r.cid AS cid, r.rel AS rel, greatest(r.ms, p.cos) AS ms
                |        FROM s${i - 1} r JOIN p$i ON r.qid = p$i.qid AND r.cid <> p$i.cid
                |        JOIN ps p ON p.qid = r.qid AND p.ca = r.cid AND p.cb = p$i.cid)""".stripMargin
    }
    sb ++= s"""
              |SELECT qid, sel_rank, cid, rel,
              |  floor(ms*1e4 + 0.5)/1e4 AS maxsim,
              |  floor(($lam*rel - $om*ms)*1e4 + 0.5)/1e4 AS score
              |FROM (${(1 to k).map(i => s"SELECT qid, cid, rel, ms, $i AS sel_rank FROM p$i").mkString(" UNION ALL ")})
              |ORDER BY qid, sel_rank""".stripMargin
    sb.toString
  }

  // ---- P41: MMR diversified re-rank (FULL oracle — the greedy
  // selection replays because the argmax compares 1e-6-quantized
  // scores with cid tie-break; candidates come from the q25-proven
  // cosine shortlist replay) -------------------------------------------
  val q252 = Q(
    "q252_mmr_rerank",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val shortlist = Cosine.topK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", k = 20)
      val cands = shortlist.join(
        emb.select(col("vec_id").as("nid"), col("embedding").as("vec")), Seq("nid"))
      graft.sim.Mmr.rerank(cands, "qid", "nid", "cos_sim", "vec", k = 5, lambda = 0.7)
        .withColumnRenamed("cid", "cid_out")
        .select(col("qid"), col("sel_rank"), col("cid_out").as("cid"),
          col("rel"), col("maxsim"), col("score"))
        .orderBy("qid", "sel_rank")
    },
    Some(mmrOracleSql(k = 5, lambda = 0.7, nQueries = 5, shortlist = 20))
  )

  // ---- T84: multi-arm unit-level SRM gate (FULL oracle — distinct
  // (arm, unit) counts, broadcast expected shares, chi-square GoF) -----
  val q253 = Q(
    "q253_srm",
    (s, dir) =>
      graft.ops.Abtest.srm(
        Tables.events(s, dir), "user_id",
        when(col("user_id") % 10 === 0, "holdout").otherwise("main"),
        Seq(("holdout", 0.1), ("main", 0.9)))
        .orderBy("arm"),
    Some(
      """WITH per AS (SELECT arm, count(*)::BIGINT AS n_units FROM
        |    (SELECT DISTINCT CASE WHEN user_id % 10 = 0 THEN 'holdout' ELSE 'main' END AS arm,
        |       user_id FROM events)
        |  GROUP BY 1),
        |e AS (SELECT 'holdout' AS arm, 0.1::DOUBLE AS exp_share
        |      UNION ALL SELECT 'main', 0.9::DOUBLE),
        |j AS (SELECT e.arm AS arm, exp_share, coalesce(n_units, 0)::BIGINT AS n_units
        |      FROM e LEFT JOIN per ON e.arm = per.arm),
        |t AS (SELECT *, (sum(n_units) OVER ())::DOUBLE AS tot, count(*) OVER () AS k FROM j)
        |SELECT arm, n_units,
        |  floor(exp_share*tot*1e6+0.5)/1e6 AS expected_units,
        |  floor((sum((n_units - exp_share*tot)*(n_units - exp_share*tot)/(exp_share*tot))
        |    OVER ())*1e6+0.5)/1e6 AS chi2,
        |  (k - 1)::BIGINT AS dof
        |FROM t ORDER BY arm""".stripMargin
    )
  )

  // ---- S32/T85: order-3 sequential patterns (FULL oracle — stacked
  // lead() over the keyed sort; share fixed BEFORE the support prune) --
  val q254 = Q(
    "q254_seq_patterns",
    (s, dir) =>
      graft.ops.Transitions.ngrams(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id",
        n = 3, minCount = 5L)
        .orderBy("pattern"),
    Some(
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT event_type || '>' || s1 || '>' || s2 AS pattern FROM s
        |      WHERE s1 IS NOT NULL AND s2 IS NOT NULL),
        |cc AS (SELECT pattern, count(*)::BIGINT AS n FROM g GROUP BY 1),
        |t AS (SELECT pattern, n,
        |        floor(n::DOUBLE / sum(n) OVER () * 1e6 + 0.5)/1e6 AS share FROM cc)
        |SELECT pattern, n, share FROM t WHERE n >= 5 ORDER BY pattern""".stripMargin
    )
  )

  // ---- C81: Tukey IQR fences per group (FULL oracle — exact
  // interpolating quartiles are bit-identical across engines, so the
  // unquantized fence comparisons agree row-for-row) -------------------
  val q255 = Q(
    "q255_iqr_fences",
    (s, dir) =>
      graft.ops.Stats.iqrFences(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag"),
    Some(
      """WITH b AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS x FROM lineitem),
        |q AS (SELECT g, count(*)::BIGINT AS n,
        |        quantile_cont(x, 0.25) AS q1v, quantile_cont(x, 0.75) AS q3v
        |      FROM b GROUP BY 1),
        |f AS (SELECT g, n, q1v, q3v,
        |        q1v - 1.5*(q3v-q1v) AS lov, q3v + 1.5*(q3v-q1v) AS hiv FROM q),
        |c AS (SELECT b.g AS g, any_value(f.n) AS n,
        |        any_value(q1v) AS q1r, any_value(q3v) AS q3r,
        |        any_value(lov) AS lor, any_value(hiv) AS hir,
        |        sum(CASE WHEN x < lov THEN 1 ELSE 0 END)::BIGINT AS n_low,
        |        sum(CASE WHEN x > hiv THEN 1 ELSE 0 END)::BIGINT AS n_high
        |      FROM b JOIN f ON b.g = f.g GROUP BY 1)
        |SELECT g AS l_returnflag, n,
        |  floor(q1r*1e6+0.5)/1e6 AS q1, floor(q3r*1e6+0.5)/1e6 AS q3,
        |  floor((q3r-q1r)*1e6+0.5)/1e6 AS iqr,
        |  floor(lor*1e6+0.5)/1e6 AS fence_lo, floor(hir*1e6+0.5)/1e6 AS fence_hi,
        |  n_low, n_high
        |FROM c ORDER BY l_returnflag""".stripMargin
    )
  )

  // ---- T86: Laplace-noised clipped-sum release (FULL oracle — the
  // q242 seeded-noise contract extended to sums; clip bounds fix the
  // sensitivity) -------------------------------------------------------
  val q256 = Q(
    "q256_dp_sum",
    (s, dir) =>
      graft.ops.Privacy.laplaceSum(
        Tables.events(s, dir), "event_type", "value",
        lo = 0.0, hi = 150.0, epsilon = 0.5)
        .orderBy("event_type"),
    Some(
      s"""WITH g AS (SELECT event_type, count(*)::BIGINT AS n,
        |        sum(least(greatest("value"::DOUBLE, 0.0), 150.0)) AS csum,
        |        sum(CASE WHEN "value" < 0.0 OR "value" > 150.0 THEN 1 ELSE 0 END)::BIGINT AS n_clipped
        |      FROM events GROUP BY 1),
        |u AS (SELECT event_type, n, csum, n_clipped,
        |        ((${graft.functions.SharedHash.md5Long60Sql("'graft-release' || '|' || event_type")})::DOUBLE + 0.5)
        |          / 1152921504606846976.0 - 0.5 AS uu
        |      FROM g),
        |l AS (SELECT event_type, n, csum, n_clipped,
        |        -300.0 * sign(uu) * ln(1.0 - 2.0 * abs(uu)) AS lap
        |      FROM u)
        |SELECT event_type, n,
        |  floor(csum * 1e6 + 0.5) / 1e6 AS clipped_sum,
        |  n_clipped,
        |  floor(lap * 1e6 + 0.5) / 1e6 AS noise,
        |  floor((csum + floor(lap * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6 AS released
        |FROM l ORDER BY event_type""".stripMargin
    )
  )

  // ---- T87: Chao1 unseen-vocabulary estimate per language (FULL
  // oracle — integer frequency-spectrum cells + two closed forms) ------
  val q257 = Q(
    "q257_chao1",
    (s, dir) =>
      graft.text.Vocab.chao1(Tables.documents(s, dir), "text", "lang")
        .orderBy("lang"),
    Some(
      """WITH toks AS (SELECT lang AS g, unnest(string_split(text, ' ')) AS token FROM documents),
        |fr AS (SELECT g, token, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |s AS (SELECT g, sum(tf)::BIGINT AS n_tokens, count(*)::BIGINT AS s_obs,
        |        sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
        |        sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        |      FROM fr GROUP BY 1)
        |SELECT g AS lang, n_tokens, s_obs, f1, f2,
        |  floor((s_obs + f1::DOUBLE*(f1-1)/(2.0*(f2+1)))*1e6+0.5)/1e6 AS chao1,
        |  floor((1.0 - f1::DOUBLE/n_tokens)*1e6+0.5)/1e6 AS coverage
        |FROM s ORDER BY lang""".stripMargin
    )
  )

  // ---- C82: τ-restricted mean survival time (FULL oracle — the q168
  // KM replay in the lead-free DROP form the distributed operator uses:
  // area = τ − Σ_{t≤τ} (S_prev − S)(τ − t), both survivals 6dp) --------
  val q258 = Q(
    "q258_rmst",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val per = ev
        .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val maxDay = per.agg(max("d1")).head().getLong(0)
      val spans = per.select(
        (col("d1") - col("d0") + 1).cast("double").as("dur"),
        when(col("d1") < maxDay - 7, 1).otherwise(0).as("ev"))
      graft.ml.Survival.rmst(spans, "dur", "ev", tau = 30.0)
    },
    Some(
      """WITH d AS (SELECT user_id, floor(epoch(ts)/86400)::BIGINT AS day FROM events),
        |p AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
        |mx AS (SELECT max(d1) AS m FROM p),
        |sp AS (SELECT (d1 - d0 + 1)::DOUBLE AS t,
        |         CASE WHEN d1 < (SELECT m FROM mx) - 7 THEN 1 ELSE 0 END AS ev FROM p),
        |c AS (SELECT t, sum(ev)::BIGINT AS dd, sum(1 - ev)::BIGINT AS cns FROM sp GROUP BY 1),
        |r AS (SELECT t, dd, (sum(dd + cns) OVER (ORDER BY t DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS n_risk FROM c),
        |k AS (SELECT t, CASE WHEN dd > 0
        |         THEN ln(greatest(1.0 - dd::DOUBLE/n_risk::DOUBLE, 1e-300)) ELSE 0.0 END AS lt
        |      FROM r),
        |w AS (SELECT t,
        |        floor(exp(sum(lt) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))*1e6+0.5)/1e6 AS s,
        |        floor(exp(coalesce(sum(lt) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))*1e6+0.5)/1e6
        |          AS s_prev
        |      FROM k)
        |SELECT 30.0::DOUBLE AS tau,
        |  floor((30.0 - coalesce(sum(CASE WHEN t <= 30.0
        |    THEN (s_prev - s) * (30.0 - t) ELSE 0.0 END), 0.0))*1e6+0.5)/1e6 AS rmst
        |FROM w""".stripMargin
    )
  )

  // ---- T88: exact-size seeded permutation test (FULL oracle — each
  // permutation is a rank over the shared md5-60 of (seed, rep, unit);
  // sizes preserved, counts compared at 1e-9 quantization) -------------
  val q259 = Q(
    "q259_permutation_test",
    (s, dir) =>
      graft.ops.Abtest.permutationTest(
        Tables.events(s, dir), "user_id", "value",
        when(col("user_id") % 2 === 0, "A").otherwise("B"),
        reps = 200),
    Some(
      """WITH u AS (SELECT user_id AS u, avg(value::DOUBLE) AS y,
        |             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |           FROM events GROUP BY user_id),
        |sz AS (SELECT sum(CASE WHEN arm='A' THEN 1 ELSE 0 END)::BIGINT AS na,
        |          sum(CASE WHEN arm='B' THEN 1 ELSE 0 END)::BIGINT AS nb FROM u),
        |ob AS (SELECT avg(CASE WHEN arm='A' THEN y END)
        |          - avg(CASE WHEN arm='B' THEN y END) AS obs FROM u),
        |r AS (SELECT unnest(range(1, 201)) AS rep),
        |h AS (SELECT r.rep AS rep, u.u AS u, u.y AS y,
        |        ('0x' || substr(md5('graft-perm' || '|' || rep::VARCHAR || '|' || u.u::VARCHAR), 1, 15))::UBIGINT::BIGINT AS hv
        |      FROM r CROSS JOIN u),
        |rk AS (SELECT rep, y, row_number() OVER (PARTITION BY rep ORDER BY hv, u) AS rk FROM h),
        |pd AS (SELECT rep,
        |        sum(CASE WHEN rk <= (SELECT na FROM sz) THEN y END) / (SELECT na FROM sz)::DOUBLE
        |        - sum(CASE WHEN rk > (SELECT na FROM sz) THEN y END) / (SELECT nb FROM sz)::DOUBLE AS pdiff
        |      FROM rk GROUP BY rep),
        |ng AS (SELECT sum(CASE WHEN abs(floor(pdiff*1e9+0.5)/1e9) >=
        |          abs(floor((SELECT obs FROM ob)*1e9+0.5)/1e9) THEN 1 ELSE 0 END)::BIGINT AS n_ge
        |       FROM pd)
        |SELECT (SELECT na FROM sz) AS n_a, (SELECT nb FROM sz) AS n_b,
        |  floor((SELECT obs FROM ob)*1e6+0.5)/1e6 AS obs_diff,
        |  n_ge,
        |  floor((1 + n_ge)::DOUBLE / 201.0 * 1e6 + 0.5)/1e6 AS p_value
        |FROM ng""".stripMargin
    )
  )

  // ---- Z19: column-level dataset profile (FULL oracle — one stats row
  // unpivoted; numeric and string ranges typed separately so the
  // replay never casts a double through a string) ----------------------
  val q260 = Q(
    "q260_table_profile",
    (s, dir) =>
      graft.ops.Profile.table(
        Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"),
        Seq("event_id", "user_id", "event_type", "value"))
        .orderBy("col_name"),
    Some(
      """SELECT 'event_id' AS col_name, count(*)::BIGINT AS n,
        |  (count(*) - count(event_id))::BIGINT AS n_null,
        |  count(DISTINCT event_id)::BIGINT AS n_distinct,
        |  min(event_id)::DOUBLE AS min_num, max(event_id)::DOUBLE AS max_num,
        |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM events
        |UNION ALL
        |SELECT 'user_id', count(*)::BIGINT, (count(*) - count(user_id))::BIGINT,
        |  count(DISTINCT user_id)::BIGINT,
        |  min(user_id)::DOUBLE, max(user_id)::DOUBLE, NULL::VARCHAR, NULL::VARCHAR FROM events
        |UNION ALL
        |SELECT 'event_type', count(*)::BIGINT, (count(*) - count(event_type))::BIGINT,
        |  count(DISTINCT event_type)::BIGINT,
        |  NULL::DOUBLE, NULL::DOUBLE, min(event_type), max(event_type) FROM events
        |UNION ALL
        |SELECT 'value', count(*)::BIGINT, (count(*) - count("value"))::BIGINT,
        |  count(DISTINCT "value")::BIGINT,
        |  min("value")::DOUBLE, max("value")::DOUBLE, NULL::VARCHAR, NULL::VARCHAR FROM events
        |ORDER BY col_name""".stripMargin
    )
  )

  // ---- C83: exact grouped mode with deterministic tie-break (FULL
  // oracle — integer counts, smallest-value-wins convention) -----------
  val q261 = Q(
    "q261_mode_by_group",
    (s, dir) =>
      graft.ops.Stats.modeByGroup(Tables.events(s, dir), "user_id", "event_type")
        .orderBy("user_id"),
    Some(
      """WITH c AS (SELECT user_id, event_type AS v, count(*)::BIGINT AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, v, n,
        |        (count(*) OVER (PARTITION BY user_id))::BIGINT AS nd,
        |        row_number() OVER (PARTITION BY user_id ORDER BY n DESC, v) AS rk FROM c)
        |SELECT user_id, v AS mode, n AS n_mode, nd AS n_distinct
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin
    )
  )

  // ---- T89: Page–Hinkley drift detector, batch form (FULL oracle — a
  // SEQUENTIAL recursive-CTE replay, the q233 convention: DuckDB's
  // windowed SUM accumulates via segment tree (~1e-12 off the
  // sequential order) while the true PH values of 2-decimal inputs sit
  // EXACTLY on quantizer midpoints, so only an order-preserving fold —
  // same parenthesization as Spark's running windows — replays the
  // bits; ~80 recursive steps, all keys advancing per step) ------------
  val q262 = Q(
    "q262_page_hinkley",
    (s, dir) =>
      graft.ops.Changepoint.pageHinkley(
        Tables.events(s, dir).select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id", "value", delta = 0.005, lambda = 50.0)
        .select("event_id", "user_id", "ph_up", "ph_dn", "alarm")
        .orderBy("event_id"),
    Some(
      """WITH RECURSIVE b AS (SELECT user_id AS k, event_id, value::DOUBLE AS v,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |      FROM events),
        |ph AS (
        |  SELECT k, event_id, rn, 1::BIGINT AS n, v AS sumx,
        |         ((v - v) - 0.005::DOUBLE) AS mup, ((v - v) - 0.005::DOUBLE) AS minu,
        |         ((-(v - v)) - 0.005::DOUBLE) AS mdn, ((-(v - v)) - 0.005::DOUBLE) AS mind
        |  FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.k, b.event_id, b.rn, p.n + 1, p.sumx + b.v,
        |         p.mup + ((b.v - (p.sumx + b.v)/(p.n + 1)) - 0.005::DOUBLE),
        |         least(p.minu, p.mup + ((b.v - (p.sumx + b.v)/(p.n + 1)) - 0.005::DOUBLE)),
        |         p.mdn + ((-(b.v - (p.sumx + b.v)/(p.n + 1))) - 0.005::DOUBLE),
        |         least(p.mind, p.mdn + ((-(b.v - (p.sumx + b.v)/(p.n + 1))) - 0.005::DOUBLE))
        |  FROM ph p JOIN b ON b.k = p.k AND b.rn = p.rn + 1)
        |SELECT event_id, k AS user_id,
        |  floor((mup - minu)*1e6+0.5)/1e6 AS ph_up,
        |  floor((mdn - mind)*1e6+0.5)/1e6 AS ph_dn,
        |  (CASE WHEN floor((mup - minu)*1e6+0.5)/1e6 > 50.0
        |     OR floor((mdn - mind)*1e6+0.5)/1e6 > 50.0 THEN 1 ELSE 0 END)::BIGINT AS alarm
        |FROM ph ORDER BY event_id""".stripMargin
    )
  )

  // ---- C84: per-key time-grid forward fill (FULL oracle — integer
  // bucket grid + IGNORE NULLS carry; values pass through untouched) ---
  val q263 = Q(
    "q263_fill_forward",
    (s, dir) =>
      graft.ops.Resample.fillForward(
        Tables.events(s, dir), "user_id", "ts", "event_id", "value", stepSec = 21600L)
        .orderBy("user_id", "bucket"),
    Some(
      """WITH b AS (SELECT user_id AS k, (floor(epoch(ts)/21600)*21600)::BIGINT AS bucket,
        |             ts, event_id AS tie, value::DOUBLE AS v FROM events),
        |o AS (SELECT k, bucket, v AS v_obs FROM
        |        (SELECT *, row_number() OVER (PARTITION BY k, bucket
        |           ORDER BY ts DESC, tie DESC) AS rn FROM b) WHERE rn = 1),
        |s AS (SELECT k, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY 1),
        |g AS (SELECT k, unnest(generate_series(b0, b1, 21600)) AS bucket FROM s),
        |j AS (SELECT g.k AS k, g.bucket AS bucket, o.v_obs AS v_obs
        |      FROM g LEFT JOIN o ON g.k = o.k AND g.bucket = o.bucket)
        |SELECT k AS user_id, bucket,
        |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        |  (CASE WHEN v_obs IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS observed
        |FROM j ORDER BY user_id, bucket""".stripMargin
    )
  )

  // ---- Z20: nearest-neighbor time join (FULL oracle — a LATERAL
  // argmin replays the two-direction window trick; backward wins exact
  // ties; the right frame is unique per (key, ts) by construction) -----
  val q264 = Q(
    "q264_join_nearest",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val right = ev
        .groupBy(col("user_id"),
          (floor(unix_timestamp(col("ts")) / 172800) * 172800).cast("long").as("b"))
        .agg((floor(avg(col("value").cast("double")) * 1e6 + 0.5)
          .cast("double") / 1e6).as("ref_val"))
        .select(col("user_id"), timestamp_seconds(col("b") + 86400).as("rts"), col("ref_val"))
      graft.ops.AsOf.joinNearest(
        ev.select("event_id", "user_id", "ts"), right,
        Seq("user_id"), "ts", "rts", Seq("ref_val"), toleranceSec = 86400L)
        .select("event_id", "user_id", "ref_val", "matched_dist_ms")
        .orderBy("event_id")
    },
    Some(
      """WITH r AS (SELECT user_id AS k, (floor(epoch(ts)/172800)*172800)::BIGINT AS b,
        |             floor(avg(value::DOUBLE)*1e6+0.5)/1e6 AS ref_val
        |           FROM events GROUP BY 1, 2),
        |rr AS (SELECT k, (b + 86400)*1000 AS rms, ref_val FROM r),
        |l AS (SELECT event_id, user_id, epoch_ms(ts) AS lms FROM events)
        |SELECT l.event_id, l.user_id, nn.ref_val, nn.d AS matched_dist_ms
        |FROM l LEFT JOIN LATERAL (
        |  SELECT rr.ref_val AS ref_val, abs(rr.rms - l.lms) AS d
        |  FROM rr WHERE rr.k = l.user_id AND abs(rr.rms - l.lms) <= 86400000
        |  ORDER BY d, (CASE WHEN rr.rms <= l.lms THEN 0 ELSE 1 END), rr.rms
        |  LIMIT 1) nn ON true
        |ORDER BY l.event_id""".stripMargin
    )
  )

  // ---- T90: sentence segmentation (FULL oracle — mark-then-split in
  // the portable Java∩RE2 subset; dense per-doc indices). The corpus
  // text carries no punctuation, so the query plants terminators
  // deterministically (same left-to-right regex pass on both engines)
  // before splitting — every doc becomes genuinely multi-sentence. ----
  val q265 = Q(
    "q265_sentences",
    (s, dir) => {
      val punct = Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_replace(col("text"), " (table|query|window) ", ". $1 ").as("text"))
      graft.text.Sentences.split(punct, "text", "doc_id")
        .orderBy("doc_id", "sent_idx")
    },
    Some(
      """WITH m AS (SELECT doc_id,
        |             regexp_replace(
        |               regexp_replace(text, ' (table|query|window) ', '. \1 ', 'g'),
        |               '([.!?]+)\s+', '\1' || chr(30), 'g') AS t
        |           FROM documents),
        |e AS (SELECT doc_id, unnest(string_split(t, chr(30))) AS s,
        |        unnest(range(len(string_split(t, chr(30))))) AS pos FROM m),
        |f AS (SELECT doc_id, pos, trim(s) AS sentence FROM e WHERE length(trim(s)) > 0),
        |r AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS sent_idx,
        |        sentence FROM f)
        |SELECT doc_id, sent_idx, sentence,
        |  len(regexp_split_to_array(sentence, '\s+'))::BIGINT AS n_words
        |FROM r ORDER BY doc_id, sent_idx""".stripMargin
    )
  )

  // ---- T91: group-fairness audit table (FULL oracle — integer cells,
  // quantized rates, ratios from the QUANTIZED rates in a second CTE
  // layer; reference row cross-joined) ---------------------------------
  val q266 = Q(
    "q266_fairness_audit",
    (s, dir) => {
      val df = Tables.events(s, dir).select(
        concat(lit("g"), (col("user_id") % 3).cast("string")).as("cohort"),
        (col("event_type") === "purchase").cast("int").as("y"),
        (col("value") > 60).cast("int").as("p"))
      graft.ml.Fairness.groupRates(df, "cohort", "y", "p", refGroup = "g0")
        .orderBy("cohort")
    },
    Some(
      """WITH b AS (SELECT 'g' || (user_id % 3)::VARCHAR AS g,
        |    CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN "value" > 60 THEN 1 ELSE 0 END AS p FROM events),
        |per AS (SELECT g, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |    sum(p)::BIGINT AS n_pred_pos,
        |    sum(CASE WHEN y=1 AND p=1 THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN y=0 AND p=1 THEN 1 ELSE 0 END)::BIGINT AS fp
        |  FROM b GROUP BY 1),
        |rated AS (SELECT g, n, n_pos, n_pred_pos, tp, fp,
        |    CASE WHEN n > 0 THEN floor(n_pos::DOUBLE/n*1e6+0.5)/1e6 END AS base_rate,
        |    CASE WHEN n > 0 THEN floor(n_pred_pos::DOUBLE/n*1e6+0.5)/1e6 END AS pred_pos_rate,
        |    CASE WHEN n_pos > 0 THEN floor(tp::DOUBLE/n_pos*1e6+0.5)/1e6 END AS tpr,
        |    CASE WHEN n - n_pos > 0 THEN floor(fp::DOUBLE/(n - n_pos)*1e6+0.5)/1e6 END AS fpr,
        |    CASE WHEN n_pred_pos > 0 THEN floor(tp::DOUBLE/n_pred_pos*1e6+0.5)/1e6 END AS ppv
        |  FROM per),
        |ref AS (SELECT pred_pos_rate AS rppr, tpr AS rtpr, fpr AS rfpr
        |        FROM rated WHERE g = 'g0')
        |SELECT g AS cohort, n, n_pos, n_pred_pos, tp, fp,
        |  base_rate, pred_pos_rate, tpr, fpr, ppv,
        |  CASE WHEN rppr > 0 AND pred_pos_rate IS NOT NULL
        |    THEN floor(pred_pos_rate/rppr*1e6+0.5)/1e6 END AS parity_ratio,
        |  CASE WHEN rtpr > 0 AND tpr IS NOT NULL
        |    THEN floor(tpr/rtpr*1e6+0.5)/1e6 END AS tpr_ratio,
        |  CASE WHEN rfpr > 0 AND fpr IS NOT NULL
        |    THEN floor(fpr/rfpr*1e6+0.5)/1e6 END AS fpr_ratio
        |FROM rated CROSS JOIN ref ORDER BY cohort""".stripMargin
    )
  )

  // ---- C85: OHLC candle resample (FULL oracle — first/last by
  // (ts, tie) via row_number, integer tie-breaks, decimal-sum vsum
  // lands on quantizer grid POINTS, never midpoints) --------------------
  val q267 = Q(
    "q267_ohlc",
    (s, dir) =>
      graft.ops.Resample.ohlc(
        Tables.events(s, dir), "user_id", "ts", "event_id", "value", stepSec = 86400L)
        .select(col("user_id"), col("bucket"),
          col("open").as("open_v"), col("high").as("high_v"),
          col("low").as("low_v"), col("close").as("close_v"),
          col("n"), col("vsum"))
        .orderBy("user_id", "bucket"),
    Some(
      """WITH b AS (SELECT user_id AS k, (floor(epoch(ts)/86400)*86400)::BIGINT AS bucket,
        |             ts, event_id AS tie, value::DOUBLE AS v FROM events),
        |m AS (SELECT k, bucket, v,
        |        row_number() OVER (PARTITION BY k, bucket ORDER BY ts, tie) AS rn,
        |        count(*) OVER (PARTITION BY k, bucket) AS cnt FROM b)
        |SELECT k AS user_id, bucket,
        |  max(CASE WHEN rn = 1 THEN v END) AS open_v,
        |  max(v) AS high_v, min(v) AS low_v,
        |  max(CASE WHEN rn = cnt THEN v END) AS close_v,
        |  count(*)::BIGINT AS n,
        |  floor(sum(v)*1e6+0.5)/1e6 AS vsum
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
  )

  // ---- T90: Platt scaling (rows-only: the fit is the house IRLS
  // logistic — iterative MLE, the q80 convention; CalibrateSpec pins a
  // driver-side Newton replica at 1e-5 and monotonicity/range) ---------
  val q268 = Q(
    "q268_platt",
    (s, dir) => {
      val df = Tables.documents(s, dir).select(
        col("doc_id"),
        (col("n_chars") / lit(1000.0)).as("score"),
        (col("lang") === "en").cast("int").as("lbl"))
      graft.ops.Calibrate.platt(df, "score", "lbl").orderBy("doc_id")
    },
    // FULL oracle: the IRLS loop replays via the shared 2-parameter
    // recursive CTE (OracleSql.logisticIrls2 — window-sum sufficient
    // stats, LinAlg's exact 2x2 pivot order, same relative-deviance
    // stop). Per-pass sums differ from Spark's in ulps (summation
    // order), absorbed by the 6dp output quantizer.
    Some {
      s"""WITH RECURSIVE src AS (
        |  SELECT doc_id, n_chars::DOUBLE / 1000.0 AS x,
        |         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents),
        |${OracleSql.logisticIrls2("src")}
        |SELECT d.doc_id, d.x AS score,
        |  CASE WHEN d.y > 0.5 THEN 1 ELSE 0 END::INT AS lbl,
        |  floor((1.0/(1.0 + exp(-(f.b0 + d.x*f.b1))))*1e6 + 0.5)/1e6 AS p_platt
        |FROM src d, fin f ORDER BY d.doc_id""".stripMargin
    }
  )

  // ---- C86: Qini / uplift deciles (FULL oracle — ntile via the Z17
  // range-exchange rank (never a single-partition window), integer
  // per-bucket cells, every cumulative over the buckets-row aggregate;
  // all emitted doubles are single closed forms in identical IEEE op
  // order on both engines, window sums ::BIGINT per the q168 lesson) ---
  val q269 = Q(
    "q269_qini",
    (s, dir) => {
      val df = Tables.events(s, dir).select(
        (col("user_id") % 2).cast("int").as("t"),
        (col("event_type") === "purchase").cast("int").as("y"),
        col("value").as("s0"),
        col("event_id").as("tb"))
      graft.ml.Uplift.qiniDeciles(df, "t", "y", "s0", "tb").orderBy("bucket")
    },
    Some(
      """WITH b AS (SELECT (user_id % 2)::INT AS t,
        |    CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y,
        |    value::DOUBLE AS s, event_id AS tb FROM events),
        |r AS (SELECT t, y, ntile(10) OVER (ORDER BY s DESC, tb) AS bucket FROM b),
        |per AS (SELECT bucket, count(*)::BIGINT AS n,
        |    sum(t)::BIGINT AS nt, sum(1-t)::BIGINT AS nc,
        |    sum(y*t)::BIGINT AS rt, sum(y*(1-t))::BIGINT AS rc
        |  FROM r GROUP BY 1),
        |c AS (SELECT bucket, n, nt, nc, rt, rc,
        |    (sum(n) OVER w)::BIGINT AS cum_n,
        |    (sum(nt) OVER w)::BIGINT AS cum_nt,
        |    (sum(nc) OVER w)::BIGINT AS cum_nc,
        |    (sum(rt) OVER w)::BIGINT AS cum_rt,
        |    (sum(rc) OVER w)::BIGINT AS cum_rc,
        |    (sum(n) OVER ())::BIGINT AS tot_n,
        |    (sum(nt) OVER ())::BIGINT AS tot_nt,
        |    (sum(nc) OVER ())::BIGINT AS tot_nc,
        |    (sum(rt) OVER ())::BIGINT AS tot_rt,
        |    (sum(rc) OVER ())::BIGINT AS tot_rc
        |  FROM per
        |  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bucket, n, nt, nc, rt, rc, cum_nt, cum_nc, cum_rt, cum_rc,
        |  CASE WHEN cum_nt > 0 AND cum_nc > 0
        |    THEN floor((cum_rt::DOUBLE / cum_nt - cum_rc::DOUBLE / cum_nc)*1e6+0.5)/1e6
        |  END AS uplift_at_k,
        |  CASE WHEN cum_nc > 0
        |    THEN floor((cum_rt - cum_rc::DOUBLE * cum_nt / cum_nc)*1e6+0.5)/1e6
        |  END AS qini,
        |  CASE WHEN tot_nc > 0
        |    THEN floor(((tot_rt - tot_rc::DOUBLE * tot_nt / tot_nc) * cum_n / tot_n)*1e6+0.5)/1e6
        |  END AS random_qini
        |FROM c ORDER BY bucket""".stripMargin
    )
  )

  // ---- S34/T91: multi-touch attribution (FULL oracle — user-keyed
  // equi-join + integer-microsecond window filter, per-conversion keyed
  // windows, all five models as closed forms; unix_micros ≡ epoch_us so
  // no second-truncation drift; libm pow differences are ulp-level
  // against a 6dp quantizer) -------------------------------------------
  val q270 = Q(
    "q270_attribution",
    (s, dir) =>
      graft.ops.Attribution.credit(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id",
        conversionType = "purchase", touchTypes = Seq("click", "view", "signup"),
        lookbackSec = 604800L, halfLifeSec = 86400.0)
        .orderBy("channel"),
    Some(
      """WITH conv AS (SELECT user_id AS u, epoch_us(ts) AS cts, event_id AS cid
        |              FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS u, epoch_us(ts) AS tts, event_type AS channel,
        |        event_id AS tid
        |      FROM events WHERE event_type IN ('click','view','signup')),
        |j AS (SELECT c.cid, t.channel, t.tid, c.cts - t.tts AS dt
        |      FROM conv c JOIN t ON c.u = t.u
        |      WHERE c.cts - t.tts >= 0 AND c.cts - t.tts <= 604800000000),
        |r AS (SELECT cid, channel, tid, dt,
        |        count(*) OVER (PARTITION BY cid) AS k,
        |        row_number() OVER (PARTITION BY cid ORDER BY dt DESC, tid ASC) AS ra,
        |        row_number() OVER (PARTITION BY cid ORDER BY dt ASC, tid DESC) AS rd,
        |        power(2.0, -(dt::DOUBLE / 86400000000.0)) AS raw,
        |        sum(power(2.0, -(dt::DOUBLE / 86400000000.0)))
        |          OVER (PARTITION BY cid) AS rawsum
        |      FROM j)
        |SELECT channel, count(*)::BIGINT AS touches,
        |  count(DISTINCT cid)::BIGINT AS conversions,
        |  floor(sum(1.0 / k)*1e6+0.5)/1e6 AS credit_linear,
        |  floor(sum(raw / rawsum)*1e6+0.5)/1e6 AS credit_decay,
        |  floor(sum(CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5
        |                 WHEN ra = 1 OR rd = 1 THEN 0.4
        |                 ELSE 0.2 / (k - 2) END)*1e6+0.5)/1e6 AS credit_position,
        |  floor(sum(CASE WHEN rd = 1 THEN 1.0 ELSE 0.0 END)*1e6+0.5)/1e6 AS credit_last,
        |  floor(sum(CASE WHEN ra = 1 THEN 1.0 ELSE 0.0 END)*1e6+0.5)/1e6 AS credit_first
        |FROM r GROUP BY channel ORDER BY channel""".stripMargin
    )
  )

  // ---- C87: IPW covariate balance table (FULL oracle — caller-supplied
  // deterministic propensity, one 10-moment corpus aggregate, per-
  // covariate reshape on the one-row frame; population-style variances
  // documented in the op) ----------------------------------------------
  val q271 = Q(
    "q271_balance",
    (s, dir) => {
      val df = Tables.events(s, dir).select(
        (col("user_id") % 2).cast("int").as("t"),
        least(greatest(col("value") / lit(120.0), lit(0.05)), lit(0.95)).as("e0"),
        col("value").cast("double").as("v"),
        hour(col("ts")).cast("double").as("hh"),
        (col("user_id") % 7).cast("double").as("u7"))
      graft.ml.Causal.balanceTable(df, "t", "e0", Seq("v", "hh", "u7"))
        .orderBy("covariate")
    },
    Some {
      def cov(name: String, x: String) =
        s"""SELECT '$name' AS covariate,
           |  tx_$x/nt AS mt, cx_$x/nc AS mc,
           |  txx_$x/nt - (tx_$x/nt)*(tx_$x/nt) AS vt,
           |  cxx_$x/nc - (cx_$x/nc)*(cx_$x/nc) AS vc,
           |  wtx_$x/swt AS mtw, wcx_$x/swc AS mcw,
           |  wtxx_$x/swt - (wtx_$x/swt)*(wtx_$x/swt) AS vtw,
           |  wcxx_$x/swc - (wcx_$x/swc)*(wcx_$x/swc) AS vcw
           |FROM a""".stripMargin
      s"""WITH b AS (SELECT (user_id % 2)::DOUBLE AS t,
         |    least(greatest("value"/120.0, 0.05), 0.95) AS e0,
         |    "value"::DOUBLE AS v, hour(ts)::DOUBLE AS hh,
         |    (user_id % 7)::DOUBLE AS u7 FROM events),
         |w AS (SELECT t, least(greatest(e0, 0.01), 0.99) AS e, v, hh, u7 FROM b),
         |a AS (SELECT sum(t) AS nt, sum(1.0 - t) AS nc,
         |    sum(t/e) AS swt, sum((1.0-t)/(1.0-e)) AS swc,
         |    sum(t*v) AS tx_v, sum(t*v*v) AS txx_v,
         |    sum((1.0-t)*v) AS cx_v, sum((1.0-t)*v*v) AS cxx_v,
         |    sum(t/e*v) AS wtx_v, sum(t/e*v*v) AS wtxx_v,
         |    sum((1.0-t)/(1.0-e)*v) AS wcx_v, sum((1.0-t)/(1.0-e)*v*v) AS wcxx_v,
         |    sum(t*hh) AS tx_hh, sum(t*hh*hh) AS txx_hh,
         |    sum((1.0-t)*hh) AS cx_hh, sum((1.0-t)*hh*hh) AS cxx_hh,
         |    sum(t/e*hh) AS wtx_hh, sum(t/e*hh*hh) AS wtxx_hh,
         |    sum((1.0-t)/(1.0-e)*hh) AS wcx_hh, sum((1.0-t)/(1.0-e)*hh*hh) AS wcxx_hh,
         |    sum(t*u7) AS tx_u7, sum(t*u7*u7) AS txx_u7,
         |    sum((1.0-t)*u7) AS cx_u7, sum((1.0-t)*u7*u7) AS cxx_u7,
         |    sum(t/e*u7) AS wtx_u7, sum(t/e*u7*u7) AS wtxx_u7,
         |    sum((1.0-t)/(1.0-e)*u7) AS wcx_u7, sum((1.0-t)/(1.0-e)*u7*u7) AS wcxx_u7
         |  FROM w),
         |rows_ AS (${cov("v", "v")} UNION ALL ${cov("hh", "hh")} UNION ALL ${cov("u7", "u7")})
         |SELECT covariate,
         |  floor(mt*1e6+0.5)/1e6 AS mean_t, floor(mc*1e6+0.5)/1e6 AS mean_c,
         |  CASE WHEN vt + vc > 0
         |    THEN floor((mt-mc)/sqrt((vt+vc)/2.0)*1e6+0.5)/1e6 END AS smd,
         |  floor(mtw*1e6+0.5)/1e6 AS mean_t_w, floor(mcw*1e6+0.5)/1e6 AS mean_c_w,
         |  CASE WHEN vtw + vcw > 0
         |    THEN floor((mtw-mcw)/sqrt((vtw+vcw)/2.0)*1e6+0.5)/1e6 END AS smd_w
         |FROM rows_ ORDER BY covariate""".stripMargin
    }
  )

  // ---- T92: Cochran–Armitage trend test (FULL oracle — level-sized
  // aggregate, closed forms in identical op order) ---------------------
  val q272 = Q(
    "q272_trend_test",
    (s, dir) => {
      val df = Tables.events(s, dir).select(
        (col("user_id") % 5).cast("double").as("dose"),
        (col("event_type") === "purchase").cast("int").as("succ"))
      graft.ops.Stats.cochranArmitage(df, "dose", "succ")
    },
    Some(
      """WITH b AS (SELECT (user_id % 5)::DOUBLE AS s,
        |    CASE WHEN event_type='purchase' THEN 1.0 ELSE 0.0 END AS y FROM events),
        |l AS (SELECT s, count(*)::BIGINT AS ni, sum(y) AS ri FROM b GROUP BY 1),
        |a AS (SELECT sum(ni)::BIGINT AS n, count(*)::BIGINT AS levels, sum(ri) AS r,
        |        sum(s*ri) AS sr, sum(s*ni::DOUBLE) AS sn, sum(s*s*ni::DOUBLE) AS ssn
        |      FROM l)
        |SELECT n, levels,
        |  floor((sr - r/n::DOUBLE*sn)*1e6+0.5)/1e6 AS t_stat,
        |  floor(((r/n::DOUBLE)*(1.0 - r/n::DOUBLE)*(ssn - sn*sn/n::DOUBLE))*1e6+0.5)/1e6
        |    AS var_t,
        |  floor(((sr - r/n::DOUBLE*sn) /
        |    sqrt((r/n::DOUBLE)*(1.0 - r/n::DOUBLE)*(ssn - sn*sn/n::DOUBLE)))*1e6+0.5)/1e6
        |    AS z,
        |  floor((power(sr - r/n::DOUBLE*sn, 2.0) /
        |    ((r/n::DOUBLE)*(1.0 - r/n::DOUBLE)*(ssn - sn*sn/n::DOUBLE)))*1e6+0.5)/1e6
        |    AS chi2
        |FROM a""".stripMargin
    )
  )

  // ---- T93: empirical-Bayes rate shrinkage (FULL oracle — group-sized
  // aggregates, method-of-moments prior, posterior means; prior-
  // undefined spread → null release, documented) -----------------------
  val q273 = Q(
    "q273_eb_shrink",
    (s, dir) =>
      graft.ops.Stats.ebShrink(
        Tables.documents(s, dir).withColumn("en", (col("lang") === "en").cast("int")),
        "source", "en")
        .orderBy("source"),
    Some(
      """WITH per AS (SELECT source AS g, count(*)::BIGINT AS n,
        |    sum(CASE WHEN lang='en' THEN 1.0 ELSE 0.0 END) AS y
        |  FROM documents GROUP BY 1),
        |p2 AS (SELECT g, n, y, y/n::DOUBLE AS p FROM per),
        |pr AS (SELECT count(*)::BIGINT AS gk, sum(p) AS sp, sum(p*p) AS spp FROM p2),
        |pr2 AS (SELECT gk, sp/gk::DOUBLE AS m,
        |    CASE WHEN gk > 1
        |      THEN (spp - sp*sp/gk::DOUBLE)/(gk - 1)::DOUBLE END AS v FROM pr),
        |pr3 AS (SELECT m, CASE WHEN v > 0 THEN m*(1.0-m)/v - 1.0 END AS kp FROM pr2)
        |SELECT g AS source, n, y::BIGINT AS y, floor(p*1e6+0.5)/1e6 AS rate_raw,
        |  CASE WHEN kp > 0
        |    THEN floor((y + m*kp)/(n::DOUBLE + kp)*1e6+0.5)/1e6 END AS rate_shrunk,
        |  CASE WHEN kp > 0 THEN floor(m*kp*1e6+0.5)/1e6 END AS alpha,
        |  CASE WHEN kp > 0 THEN floor((1.0-m)*kp*1e6+0.5)/1e6 END AS beta
        |FROM p2 CROSS JOIN pr3 ORDER BY source""".stripMargin
    )
  )

  // ---- C88: DerSimonian–Laird meta-analysis (FULL oracle — per-study
  // effects built from per-nation Welch contrasts in kilodollars
  // (magnitudes ~1e2 keep 6dp margins wide), Q folds algebraically,
  // both passes map-side-combined aggregates) --------------------------
  val q274 = Q(
    "q274_meta",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .where(col("o_orderstatus").isin("F", "O"))
        .select(
          col("c_nationkey").as("study"),
          (col("o_orderstatus") === "F").cast("int").as("f"),
          (col("o_totalprice") / lit(1000.0)).as("x"))
      val per = o.groupBy("study").agg(
        sum(when(col("f") === 1, col("x"))).as("s1"),
        sum(when(col("f") === 1, col("x") * col("x"))).as("s11"),
        sum(col("f")).cast("double").as("n1"),
        sum(when(col("f") === 0, col("x"))).as("s0"),
        sum(when(col("f") === 0, col("x") * col("x"))).as("s00"),
        sum(lit(1) - col("f")).cast("double").as("n0"))
        .where(col("n1") > 1 && col("n0") > 1)
        .select(
          col("study"),
          (col("s1") / col("n1") - col("s0") / col("n0")).as("effect"),
          sqrt(
            (col("s11") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1) / col("n1") +
              (col("s00") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1) / col("n0"))
            .as("se"))
      graft.ml.Meta.combine(per, "effect", "se")
    },
    Some(
      """WITH b AS (SELECT c_nationkey AS study,
        |    CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END AS f,
        |    o_totalprice/1000.0 AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderstatus IN ('F','O')),
        |per AS (SELECT study,
        |    sum(CASE WHEN f=1 THEN x END) AS s1,
        |    sum(CASE WHEN f=1 THEN x*x END) AS s11,
        |    sum(f)::DOUBLE AS n1,
        |    sum(CASE WHEN f=0 THEN x END) AS s0,
        |    sum(CASE WHEN f=0 THEN x*x END) AS s00,
        |    sum(1-f)::DOUBLE AS n0
        |  FROM b GROUP BY 1 HAVING sum(f) > 1 AND sum(1-f) > 1),
        |st AS (SELECT study, s1/n1 - s0/n0 AS eff,
        |    sqrt((s11 - s1*s1/n1)/(n1-1)/n1 + (s00 - s0*s0/n0)/(n0-1)/n0) AS se
        |  FROM per),
        |f AS (SELECT count(*)::BIGINT AS k, sum(1.0/(se*se)) AS sw,
        |    sum(1.0/(se*se)*eff) AS swb, sum(1.0/(se*se)*eff*eff) AS swbb,
        |    sum((1.0/(se*se))*(1.0/(se*se))) AS sww
        |  FROM st WHERE se IS NOT NULL AND se > 0),
        |f2 AS (SELECT k, sw, swb,
        |    CASE WHEN k > 1 THEN swbb - swb*swb/sw END AS q_raw,
        |    CASE WHEN k > 1 THEN sw - sww/sw END AS c_dl FROM f),
        |f3 AS (SELECT k, sw, swb, q_raw,
        |    CASE WHEN k > 1
        |      THEN greatest(0.0, (q_raw - (k-1)::DOUBLE)/c_dl) END AS tau2_raw FROM f2),
        |r AS (SELECT f3.k, f3.sw, f3.swb, f3.q_raw, f3.tau2_raw,
        |    sum(CASE WHEN f3.tau2_raw IS NOT NULL
        |        THEN 1.0/(st.se*st.se + f3.tau2_raw) END) AS swr,
        |    sum(CASE WHEN f3.tau2_raw IS NOT NULL
        |        THEN 1.0/(st.se*st.se + f3.tau2_raw)*st.eff END) AS swrb
        |  FROM st CROSS JOIN f3 WHERE st.se IS NOT NULL AND st.se > 0
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT k, floor(swb/sw*1e6+0.5)/1e6 AS beta_fixed,
        |  floor(sqrt(1.0/sw)*1e6+0.5)/1e6 AS se_fixed,
        |  floor(q_raw*1e6+0.5)/1e6 AS q_stat,
        |  floor(tau2_raw*1e6+0.5)/1e6 AS tau2,
        |  CASE WHEN q_raw > 0
        |    THEN floor(greatest(0.0, (q_raw - (k-1)::DOUBLE)/q_raw)*1e6+0.5)/1e6 END AS i2,
        |  floor(swrb/swr*1e6+0.5)/1e6 AS beta_random,
        |  floor(sqrt(1.0/swr)*1e6+0.5)/1e6 AS se_random
        |FROM r""".stripMargin
    )
  )

  // ---- T94: Cronbach's alpha (FULL oracle — integer count "ratings",
  // complete-unit filter, sample variances; every sum integer-exact
  // until the final divisions) -----------------------------------------
  val q275 = Q(
    "q275_cronbach",
    (s, dir) => {
      val ratings = Tables.events(s, dir)
        .groupBy(col("user_id").as("u"), col("event_type").as("it"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.ops.Agreement.cronbachAlpha(ratings, "u", "it", "v")
    },
    Some(
      """WITH r AS (SELECT user_id AS u, event_type AS it, count(*)::DOUBLE AS v
        |  FROM events GROUP BY 1, 2),
        |k AS (SELECT count(DISTINCT it)::BIGINT AS k FROM r),
        |pu AS (SELECT u, count(*)::BIGINT AS rows_u, count(DISTINCT it)::BIGINT AS items_u,
        |    sum(v) AS tot FROM r GROUP BY 1),
        |comp AS (SELECT pu.* FROM pu CROSS JOIN k
        |  WHERE pu.items_u = k.k AND pu.rows_u = k.k),
        |ts AS (SELECT count(*)::BIGINT AS nc, sum(tot) AS st, sum(tot*tot) AS stt FROM comp),
        |iv AS (SELECT sum((sii - si*si/ni::DOUBLE)/(ni - 1)::DOUBLE) AS sum_var_items
        |  FROM (SELECT it, count(*)::BIGINT AS ni, sum(v) AS si, sum(v*v) AS sii
        |        FROM r WHERE u IN (SELECT u FROM comp) GROUP BY 1)),
        |nu AS (SELECT count(*)::BIGINT AS n_units FROM pu)
        |SELECT k.k AS k_items, nu.n_units, ts.nc AS n_complete,
        |  floor(iv.sum_var_items*1e6+0.5)/1e6 AS sum_var_items,
        |  floor((ts.stt - ts.st*ts.st/ts.nc::DOUBLE)/(ts.nc - 1)::DOUBLE*1e6+0.5)/1e6
        |    AS var_total,
        |  CASE WHEN k.k > 1 AND ts.nc > 1
        |    THEN floor((k.k::DOUBLE/(k.k - 1)::DOUBLE) *
        |      (1.0 - iv.sum_var_items /
        |        ((ts.stt - ts.st*ts.st/ts.nc::DOUBLE)/(ts.nc - 1)::DOUBLE))*1e6+0.5)/1e6
        |  END AS alpha
        |FROM ts CROSS JOIN iv CROSS JOIN k CROSS JOIN nu""".stripMargin
    )
  )

  // ---- T95: Fleiss' kappa (FULL oracle — deterministic fixed-n panel:
  // each user's first 6 events by (ts, event_id); (item×category)
  // count cells, integer arithmetic to the final divisions) ------------
  val q276 = Q(
    "q276_fleiss",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ratings = Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 6)
        .select(col("user_id").as("item"), col("event_type").as("cat"))
      graft.ops.Agreement.fleissKappa(ratings, "item", "cat", raters = 6)
    },
    Some(
      """WITH r AS (SELECT user_id AS i, event_type AS c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |rt AS (SELECT i, c FROM r WHERE rn <= 6),
        |elig AS (SELECT i FROM rt GROUP BY i HAVING count(*) = 6),
        |cells AS (SELECT rt.i, rt.c, count(*)::BIGINT AS nij
        |  FROM rt WHERE rt.i IN (SELECT i FROM elig) GROUP BY 1, 2),
        |pi AS (SELECT i, (sum(nij*nij) - 6)::DOUBLE / 30.0 AS pi FROM cells GROUP BY 1),
        |pb AS (SELECT count(*)::BIGINT AS n_items, sum(pi) AS spi FROM pi),
        |pe AS (SELECT sum((nj::DOUBLE/(ni2*6)::DOUBLE)*(nj::DOUBLE/(ni2*6)::DOUBLE)) AS p_e
        |  FROM (SELECT c, sum(nij) AS nj FROM cells GROUP BY 1)
        |  CROSS JOIN (SELECT n_items AS ni2 FROM pb))
        |SELECT pb.n_items, 6::BIGINT AS raters,
        |  floor(pb.spi/pb.n_items::DOUBLE*1e6+0.5)/1e6 AS p_bar,
        |  floor(pe.p_e*1e6+0.5)/1e6 AS p_e,
        |  CASE WHEN pe.p_e < 1.0
        |    THEN floor((pb.spi/pb.n_items::DOUBLE - pe.p_e)/(1.0 - pe.p_e)*1e6+0.5)/1e6
        |  END AS kappa
        |FROM pb CROSS JOIN pe""".stripMargin
    )
  )

  // ---- T96: ICC(1,1) intraclass correlation (FULL oracle — group-sized
  // aggregate, algebraic SSB/SSW from integer sums, unbalanced n̄₀) -----
  val q277 = Q(
    "q277_icc",
    (s, dir) =>
      graft.ops.Agreement.icc(Tables.documents(s, dir), "source", "n_chars"),
    Some(
      """WITH per AS (SELECT source AS g, count(*)::BIGINT AS ni,
        |    sum(n_chars::DOUBLE) AS si, sum(n_chars::DOUBLE*n_chars::DOUBLE) AS sii
        |  FROM documents GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS g, sum(ni)::BIGINT AS n, sum(si) AS sx,
        |    sum(sii) AS sxx, sum(si*si/ni::DOUBLE) AS snm2, sum(ni*ni)::BIGINT AS sn2
        |  FROM per)
        |SELECT n, g AS groups,
        |  floor((snm2 - sx*sx/n::DOUBLE)/(g - 1)::DOUBLE*1e6+0.5)/1e6 AS msb,
        |  floor((sxx - snm2)/(n - g)::DOUBLE*1e6+0.5)/1e6 AS msw,
        |  floor((n::DOUBLE - sn2::DOUBLE/n::DOUBLE)/(g - 1)::DOUBLE*1e6+0.5)/1e6 AS n0,
        |  CASE WHEN g > 1 AND n > g THEN
        |    floor(((snm2 - sx*sx/n::DOUBLE)/(g - 1)::DOUBLE - (sxx - snm2)/(n - g)::DOUBLE) /
        |      ((snm2 - sx*sx/n::DOUBLE)/(g - 1)::DOUBLE +
        |        ((n::DOUBLE - sn2::DOUBLE/n::DOUBLE)/(g - 1)::DOUBLE - 1.0) *
        |          ((sxx - snm2)/(n - g)::DOUBLE))*1e6+0.5)/1e6
        |  END AS icc
        |FROM a""".stripMargin
    )
  )

  // ---- C89: IPF raking (FULL oracle — the whole 20-sweep loop replays
  // as a recursive CTE with windows inside the recursive term; IPF is
  // contractive so cross-engine sum-order noise stays ~1e-13 vs the 6dp
  // quantizer; zero-mass guard identical on both sides). Narrative: a
  // quantity-biased lineitem subsample raked back to the full table's
  // returnflag × linestatus margins -------------------------------------
  val q278 = Q(
    "q278_raking",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val cells = li.where(col("l_quantity") < 20)
        .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(count(lit(1)).cast("double").as("n"))
      val rt = li.groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).cast("double").as("target"))
      val ct = li.groupBy(col("l_linestatus").as("ls"))
        .agg(count(lit(1)).cast("double").as("target"))
      graft.ml.Raking.ipf(cells, "rf", "ls", "n", rt, ct, iters = 20)
        .select(col("rf"), col("ls"), col("n").cast("long").as("n"),
          col("weight"), col("raked"))
        .orderBy("rf", "ls")
    },
    Some(
      """WITH RECURSIVE cells AS (
        |  SELECT l_returnflag AS r, l_linestatus AS c, count(*)::DOUBLE AS n
        |  FROM lineitem WHERE l_quantity < 20 GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag AS r, count(*)::DOUBLE AS tr FROM lineitem GROUP BY 1),
        |ct AS (SELECT l_linestatus AS c, count(*)::DOUBLE AS tc FROM lineitem GROUP BY 1),
        |it AS (
        |  SELECT cells.r, cells.c, cells.n, 1.0::DOUBLE AS w, 0 AS i
        |  FROM cells JOIN rt ON cells.r = rt.r JOIN ct ON cells.c = ct.c
        |  UNION ALL
        |  SELECT r, c, n,
        |    CASE WHEN (sum(n * w2) OVER (PARTITION BY c)) > 0
        |      THEN w2 * tc / (sum(n * w2) OVER (PARTITION BY c)) ELSE 0.0 END,
        |    i + 1
        |  FROM (
        |    SELECT q.r, q.c, q.n, ct.tc, q.i,
        |      CASE WHEN (sum(q.n * q.w) OVER (PARTITION BY q.r)) > 0
        |        THEN q.w * rt.tr / (sum(q.n * q.w) OVER (PARTITION BY q.r))
        |        ELSE 0.0 END AS w2
        |    FROM it q JOIN rt ON q.r = rt.r JOIN ct ON q.c = ct.c
        |    WHERE q.i < 20
        |  )
        |)
        |SELECT r AS rf, c AS ls, n::BIGINT AS n,
        |  floor(w*1e6+0.5)/1e6 AS weight,
        |  floor(n*w*1e6+0.5)/1e6 AS raked
        |FROM it WHERE i = 20 ORDER BY rf, ls""".stripMargin
    )
  )

  // ---- C90: per-key one-lag Granger F (FULL oracle — keyed lag window,
  // the 3-variable regression folds to pairwise correlations so no
  // matrix solve; explicit variance guards mirror the CASEs) -----------
  val q279 = Q(
    "q279_granger",
    (s, dir) => {
      val df = Tables.events(s, dir).select(
        col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double").as("y"),
        (col("event_type") === "purchase").cast("double").as("x"))
      graft.ml.Diagnostics.grangerOneLag(df, "user_id", "ts", "event_id", "y", "x")
        .orderBy("user_id")
    },
    Some(
      """WITH b AS (SELECT user_id AS k, ts, event_id AS tb, value::DOUBLE AS y,
        |    CASE WHEN event_type='purchase' THEN 1.0 ELSE 0.0 END AS x FROM events),
        |l AS (SELECT k, y, lag(y) OVER w AS y1, lag(x) OVER w AS x1 FROM b
        |      WINDOW w AS (PARTITION BY k ORDER BY ts, tb)),
        |f AS (SELECT k, count(*)::BIGINT AS n, sum(y) AS sy, sum(y*y) AS syy,
        |        sum(y1) AS sa, sum(y1*y1) AS saa, sum(x1) AS sb, sum(x1*x1) AS sbb,
        |        sum(y*y1) AS sya, sum(y*x1) AS syb, sum(y1*x1) AS sab
        |      FROM l WHERE y1 IS NOT NULL AND x1 IS NOT NULL GROUP BY 1),
        |r AS (SELECT k, n,
        |    n*syy - sy*sy AS dyy, n*saa - sa*sa AS daa, n*sbb - sb*sb AS dbb,
        |    (n*sya - sy*sa)/sqrt((n*syy - sy*sy)*(n*saa - sa*sa)) AS r1,
        |    (n*syb - sy*sb)/sqrt((n*syy - sy*sy)*(n*sbb - sb*sb)) AS r2,
        |    (n*sab - sa*sb)/sqrt((n*saa - sa*sa)*(n*sbb - sb*sb)) AS r3
        |  FROM f),
        |u AS (SELECT k, n, dyy, daa, dbb, r1, r2, r3,
        |    (r1*r1 + r2*r2 - 2.0*r1*r2*r3)/(1.0 - r3*r3) AS r2u FROM r)
        |SELECT k AS user_id, n,
        |  CASE WHEN dyy > 0 AND daa > 0 THEN floor(r1*1e6+0.5)/1e6 END AS r_y_ylag,
        |  CASE WHEN dyy > 0 AND dbb > 0 THEN floor(r2*1e6+0.5)/1e6 END AS r_y_xlag,
        |  CASE WHEN n > 3 AND dyy > 0 AND daa > 0 AND dbb > 0
        |        AND abs(r3) < 1.0 AND r2u < 1.0
        |    THEN floor((r2u - r1*r1)/(1.0 - r2u)*(n - 3)::DOUBLE*1e6+0.5)/1e6
        |  END AS f_stat
        |FROM u ORDER BY user_id""".stripMargin
    )
  )

  // ---- C91: Chow structural-break test (FULL oracle — per-regime
  // 6-moment aggregate, SSRs as closed forms, no refits) ---------------
  val q280 = Q(
    "q280_chow",
    (s, dir) => {
      val df = Tables.orders(s, dir).select(
        (col("o_totalprice") / lit(1000.0)).as("y"),
        (floor(unix_timestamp(col("o_orderdate")) / 86400) / lit(1000.0)).as("x"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("regime"))
      graft.ml.Diagnostics.chow(df, "y", "x", "regime")
    },
    Some(
      """WITH b AS (SELECT o_totalprice/1000.0 AS y,
        |    floor(epoch(o_orderdate)/86400)/1000.0 AS x,
        |    CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END AS g FROM orders),
        |per AS (SELECT g, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM b GROUP BY 1),
        |a AS (SELECT sum(n)::BIGINT AS n, sum(sx) AS sx, sum(sy) AS sy,
        |    sum(sxx) AS sxx, sum(sxy) AS sxy, sum(syy) AS syy,
        |    min(n)::BIGINT AS n_min, count(*)::BIGINT AS regimes,
        |    sum((syy - sy*sy/n::DOUBLE) -
        |        power(sxy - sx*sy/n::DOUBLE, 2.0)/(sxx - sx*sx/n::DOUBLE)) AS ssr_split,
        |    min(sxx - sx*sx/n::DOUBLE) AS cxx_min,
        |    sum(CASE WHEN g = 1 THEN n ELSE 0 END)::BIGINT AS n_b
        |  FROM per)
        |SELECT n, (n - n_b)::BIGINT AS n_a, n_b,
        |  CASE WHEN sxx - sx*sx/n::DOUBLE > 0
        |    THEN floor(((syy - sy*sy/n::DOUBLE) -
        |      (sxy - sx*sy/n::DOUBLE)*(sxy - sx*sy/n::DOUBLE)/(sxx - sx*sx/n::DOUBLE))
        |      *1e6+0.5)/1e6 END AS ssr_pooled,
        |  CASE WHEN cxx_min > 0 THEN floor(ssr_split*1e6+0.5)/1e6 END AS ssr_split,
        |  CASE WHEN regimes = 2 AND n_min > 2 AND cxx_min > 0
        |        AND sxx - sx*sx/n::DOUBLE > 0 AND ssr_split > 0
        |    THEN floor(((((syy - sy*sy/n::DOUBLE) -
        |      (sxy - sx*sy/n::DOUBLE)*(sxy - sx*sy/n::DOUBLE)/(sxx - sx*sx/n::DOUBLE))
        |      - ssr_split)/2.0)/(ssr_split/(n - 4)::DOUBLE)*1e6+0.5)/1e6
        |  END AS f_stat
        |FROM a""".stripMargin
    )
  )

  // ---- T97: Wald–Wolfowitz runs test per key (FULL oracle — one keyed
  // lag + one keyed aggregate, closed z with degenerate keys null) -----
  val q281 = Q(
    "q281_runs_test",
    (s, dir) => {
      val df = Tables.events(s, dir).select(
        col("user_id"), col("ts"), col("event_id"),
        (col("value") > 50).cast("int").as("hot"))
      graft.ops.Stats.runsTest(df, "user_id", "ts", "event_id", "hot")
        .orderBy("user_id")
    },
    Some(
      """WITH b AS (SELECT user_id AS k, ts, event_id AS tb,
        |    CASE WHEN "value" > 50 THEN 1 ELSE 0 END AS bb FROM events),
        |l AS (SELECT k, bb,
        |    CASE WHEN lag(bb) OVER (PARTITION BY k ORDER BY ts, tb) IS NULL THEN 1
        |         WHEN lag(bb) OVER (PARTITION BY k ORDER BY ts, tb) <> bb THEN 1
        |         ELSE 0 END AS chg FROM b),
        |a AS (SELECT k, count(*)::BIGINT AS n, sum(bb)::BIGINT AS n1,
        |        sum(1-bb)::BIGINT AS n0, sum(chg)::BIGINT AS runs FROM l GROUP BY 1)
        |SELECT k AS user_id, n, n1, n0, runs,
        |  floor((1.0 + 2.0*n1*n0/n::DOUBLE)*1e6+0.5)/1e6 AS e_runs,
        |  CASE WHEN n1 > 0 AND n0 > 0 AND n > 1 AND
        |      (2.0*n1*n0)*(2.0*n1*n0 - n::DOUBLE)/(n::DOUBLE*n::DOUBLE*(n-1)::DOUBLE) > 0
        |    THEN floor((runs::DOUBLE - (1.0 + 2.0*n1*n0/n::DOUBLE)) /
        |      sqrt((2.0*n1*n0)*(2.0*n1*n0 - n::DOUBLE) /
        |        (n::DOUBLE*n::DOUBLE*(n-1)::DOUBLE))*1e6+0.5)/1e6
        |  END AS z
        |FROM a ORDER BY user_id""".stripMargin
    )
  )

  // ---- C92: per-row OLS influence (FULL oracle — one moment aggregate
  // broadcast back, every row a local closed form; leverage/Cook's D at
  // 1e9 quantization because h ~ 1/n is tiny by construction) ----------
  val q282 = Q(
    "q282_influence",
    (s, dir) => {
      val df = Tables.orders(s, dir).select(
        col("o_orderkey").as("id"),
        (col("o_totalprice") / lit(1000.0)).as("y"),
        (floor(unix_timestamp(col("o_orderdate")) / 86400) / lit(1000.0)).as("x"))
      graft.ml.Diagnostics.influenceSimple(df, "id", "y", "x").orderBy("id")
    },
    Some(
      """WITH b AS (SELECT o_orderkey AS id, o_totalprice/1000.0 AS y,
        |    floor(epoch(o_orderdate)/86400)/1000.0 AS x FROM orders),
        |m AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM b),
        |m2 AS (SELECT *, sxx - sx*sx/n::DOUBLE AS cxx, sxy - sx*sy/n::DOUBLE AS cxy,
        |    syy - sy*sy/n::DOUBLE AS cyy FROM m),
        |m3 AS (SELECT *, cxy/cxx AS slope FROM m2),
        |m4 AS (SELECT *, (sy - slope*sx)/n::DOUBLE AS icept,
        |    (cyy - cxy*cxy/cxx)/(n - 2)::DOUBLE AS s2 FROM m3),
        |r AS (SELECT id,
        |    CASE WHEN n > 2 AND cxx > 0 THEN y - (icept + slope*x) END AS e,
        |    CASE WHEN n > 2 AND cxx > 0
        |      THEN 1.0/n::DOUBLE + (x - sx/n::DOUBLE)*(x - sx/n::DOUBLE)/cxx END AS h,
        |    n, cxx, s2
        |  FROM b CROSS JOIN m4)
        |SELECT id, floor(e*1e6+0.5)/1e6 AS resid,
        |  floor(h*1e9+0.5)/1e9 AS leverage,
        |  CASE WHEN n > 2 AND cxx > 0 AND s2 > 0 AND h < 1.0
        |    THEN floor(e*e*h/(2.0*s2*(1.0-h)*(1.0-h))*1e9+0.5)/1e9
        |  END AS cooks_d
        |FROM r ORDER BY id""".stripMargin
    )
  )

  // ---- T98: training-mix budget allocation (FULL oracle — source-sized
  // closed forms; cap shortfall REPORTED not redistributed) ------------
  val q283 = Q(
    "q283_mix_budget",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val perSource = docs.groupBy("source")
        .agg(sum("n_chars").cast("double").as("toks"))
      val targets = perSource.select(
        col("source"),
        when(substring(col("source"), 4, 10).cast("int") < 5, lit(0.08))
          .otherwise(lit(0.04)).as("share"))
      val total = docs.agg(sum("n_chars")).head().getLong(0).toDouble
      graft.ops.Mixing.budgetAllocation(
        perSource, "source", "toks", targets,
        budget = 1.2 * total, maxEpochs = 1.5)
        .orderBy("source")
    },
    Some(
      """WITH tot AS (SELECT 1.2*sum(n_chars)::DOUBLE AS budget FROM documents),
        |ps AS (SELECT source, sum(n_chars)::DOUBLE AS n FROM documents GROUP BY 1),
        |t AS (SELECT source,
        |    CASE WHEN substr(source,4)::INT < 5 THEN 0.08 ELSE 0.04 END AS sh FROM ps),
        |b AS (SELECT ps.source, ps.n, t.sh,
        |    t.sh * tot.budget AS want, ps.n * 1.5 AS cap,
        |    least(t.sh * tot.budget, ps.n * 1.5) AS alloc
        |  FROM ps JOIN t ON ps.source = t.source CROSS JOIN tot),
        |a AS (SELECT sum(alloc) AS ta, sum(want - least(want, cap)) AS leftv FROM b)
        |SELECT source, n::BIGINT AS tokens,
        |  floor(sh*1e6+0.5)/1e6 AS share,
        |  floor(alloc*1e6+0.5)/1e6 AS alloc_tokens,
        |  CASE WHEN n > 0 THEN floor(alloc/n*1e6+0.5)/1e6 END AS epochs,
        |  cap < want AS capped,
        |  CASE WHEN ta > 0 THEN floor(alloc/ta*1e6+0.5)/1e6 END AS realized_share,
        |  floor(leftv*1e6+0.5)/1e6 AS leftover_tokens
        |FROM b CROSS JOIN a ORDER BY source""".stripMargin
    )
  )

  // ---- C93: Kish design effect over IPF unit weights (FULL oracle —
  // composes the q278 recursive-CTE raking, weights joined back to the
  // subsample rows, one aggregate) -------------------------------------
  val q284 = Q(
    "q284_design_effect",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sub = li.where(col("l_quantity") < 20)
      val cells = sub
        .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(count(lit(1)).cast("double").as("n"))
      val rt = li.groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).cast("double").as("target"))
      val ct = li.groupBy(col("l_linestatus").as("ls"))
        .agg(count(lit(1)).cast("double").as("target"))
      val w = graft.ml.Raking.ipf(cells, "rf", "ls", "n", rt, ct, iters = 20)
        .select(col("rf"), col("ls"), col("weight"))
      val units = sub
        .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .join(w, Seq("rf", "ls"))
      graft.ml.Raking.designEffect(units, "weight")
    },
    Some(
      """WITH RECURSIVE cells AS (
        |  SELECT l_returnflag AS r, l_linestatus AS c, count(*)::DOUBLE AS n
        |  FROM lineitem WHERE l_quantity < 20 GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag AS r, count(*)::DOUBLE AS tr FROM lineitem GROUP BY 1),
        |ct AS (SELECT l_linestatus AS c, count(*)::DOUBLE AS tc FROM lineitem GROUP BY 1),
        |it AS (
        |  SELECT cells.r, cells.c, cells.n, 1.0::DOUBLE AS w, 0 AS i
        |  FROM cells JOIN rt ON cells.r = rt.r JOIN ct ON cells.c = ct.c
        |  UNION ALL
        |  SELECT r, c, n,
        |    CASE WHEN (sum(n * w2) OVER (PARTITION BY c)) > 0
        |      THEN w2 * tc / (sum(n * w2) OVER (PARTITION BY c)) ELSE 0.0 END,
        |    i + 1
        |  FROM (
        |    SELECT q.r, q.c, q.n, ct.tc, q.i,
        |      CASE WHEN (sum(q.n * q.w) OVER (PARTITION BY q.r)) > 0
        |        THEN q.w * rt.tr / (sum(q.n * q.w) OVER (PARTITION BY q.r))
        |        ELSE 0.0 END AS w2
        |    FROM it q JOIN rt ON q.r = rt.r JOIN ct ON q.c = ct.c
        |    WHERE q.i < 20
        |  )
        |),
        |wt AS (SELECT r, c, floor(w*1e6+0.5)/1e6 AS weight FROM it WHERE i = 20),
        |u AS (SELECT wt.weight AS w
        |  FROM lineitem JOIN wt ON l_returnflag = wt.r AND l_linestatus = wt.c
        |  WHERE l_quantity < 20),
        |a AS (SELECT count(*)::BIGINT AS n, sum(w) AS sw, sum(w*w) AS sww FROM u)
        |SELECT n,
        |  CASE WHEN sw > 0 THEN floor(n::DOUBLE*sww/(sw*sw)*1e6+0.5)/1e6 END AS deff,
        |  CASE WHEN sww > 0 THEN floor(sw*sw/sww*1e6+0.5)/1e6 END AS n_eff
        |FROM a""".stripMargin
    )
  )

  // ---- C94: variance inflation factors (FULL oracle for k = 3 — the
  // inverse-correlation diagonal equals the closed 1/(1−R²_j) form the
  // SQL replays from pairwise correlations; the op itself is general-k
  // via one moment pass + driver k×k invert) ---------------------------
  val q285 = Q(
    "q285_vif",
    (s, dir) =>
      graft.ml.Collinearity.vif(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("covariate"),
    Some(
      """WITH b AS (SELECT l_quantity::DOUBLE AS x1, l_extendedprice::DOUBLE AS x2,
        |    l_discount::DOUBLE AS x3 FROM lineitem),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
        |    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x1*x3) AS s13,
        |    sum(x2*x2) AS s22, sum(x2*x3) AS s23, sum(x3*x3) AS s33 FROM b),
        |c AS (SELECT
        |    (n*s12 - s1*s2)/sqrt((n*s11 - s1*s1)*(n*s22 - s2*s2)) AS r12,
        |    (n*s13 - s1*s3)/sqrt((n*s11 - s1*s1)*(n*s33 - s3*s3)) AS r13,
        |    (n*s23 - s2*s3)/sqrt((n*s22 - s2*s2)*(n*s33 - s3*s3)) AS r23
        |  FROM m),
        |r2 AS (SELECT
        |    (r12*r12 + r13*r13 - 2.0*r12*r13*r23)/(1.0 - r23*r23) AS r2_1,
        |    (r12*r12 + r23*r23 - 2.0*r12*r23*r13)/(1.0 - r13*r13) AS r2_2,
        |    (r13*r13 + r23*r23 - 2.0*r13*r23*r12)/(1.0 - r12*r12) AS r2_3
        |  FROM c)
        |SELECT 'l_quantity' AS covariate,
        |  floor(1.0/(1.0 - r2_1)*1e6+0.5)/1e6 AS vif,
        |  floor((1.0 - (1.0 - r2_1))*1e6+0.5)/1e6 AS r2_others FROM r2
        |UNION ALL
        |SELECT 'l_extendedprice',
        |  floor(1.0/(1.0 - r2_2)*1e6+0.5)/1e6,
        |  floor((1.0 - (1.0 - r2_2))*1e6+0.5)/1e6 FROM r2
        |UNION ALL
        |SELECT 'l_discount',
        |  floor(1.0/(1.0 - r2_3)*1e6+0.5)/1e6,
        |  floor((1.0 - (1.0 - r2_3))*1e6+0.5)/1e6 FROM r2
        |ORDER BY covariate""".stripMargin
    )
  )

  // ---- C95: per-key AR(1) + 3-step forecast (FULL oracle — keyed lag
  // window, multiplied-form lag regression, forecasts unroll as nested
  // closed forms so nothing iterates) ----------------------------------
  val q286 = Q(
    "q286_ar1",
    (s, dir) =>
      graft.ops.Forecast.ar1(Tables.events(s, dir), "user_id", "ts", "event_id", "value")
        .orderBy("user_id"),
    Some(
      """WITH b AS (SELECT user_id AS k, ts, event_id AS tb, value::DOUBLE AS y FROM events),
        |l AS (SELECT k, y, lag(y) OVER (PARTITION BY k ORDER BY ts, tb) AS y1,
        |        row_number() OVER (PARTITION BY k ORDER BY ts DESC, tb DESC) AS rd FROM b),
        |m AS (SELECT k,
        |    sum(CASE WHEN y1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS np,
        |    sum(CASE WHEN y1 IS NOT NULL THEN y END) AS sy,
        |    sum(CASE WHEN y1 IS NOT NULL THEN y1 END) AS sa,
        |    sum(CASE WHEN y1 IS NOT NULL THEN y*y1 END) AS sya,
        |    sum(CASE WHEN y1 IS NOT NULL THEN y1*y1 END) AS saa,
        |    max(CASE WHEN rd = 1 THEN y END) AS y_last
        |  FROM l GROUP BY 1),
        |p AS (SELECT k, np, y_last, sy, sa,
        |    np::DOUBLE*saa - sa*sa AS dxx, np::DOUBLE*sya - sy*sa AS dxy FROM m),
        |p2 AS (SELECT k, np, y_last, sy, sa,
        |    CASE WHEN np >= 3 AND dxx > 0 THEN dxy/dxx END AS phi FROM p),
        |p3 AS (SELECT k, np, y_last, phi, (sy - phi*sa)/np::DOUBLE AS c0 FROM p2),
        |p4 AS (SELECT k, np, y_last, phi, c0, c0 + phi*y_last AS f1 FROM p3),
        |p5 AS (SELECT k, np, y_last, phi, c0, f1, c0 + phi*f1 AS f2 FROM p4)
        |SELECT k AS user_id, np AS n_pairs,
        |  floor(phi*1e6+0.5)/1e6 AS phi,
        |  floor(c0*1e6+0.5)/1e6 AS icept,
        |  y_last,
        |  floor(f1*1e6+0.5)/1e6 AS f1,
        |  floor(f2*1e6+0.5)/1e6 AS f2,
        |  floor((c0 + phi*f2)*1e6+0.5)/1e6 AS f3
        |FROM p5 ORDER BY user_id""".stripMargin
    )
  )

  // ---- T99: indirect standardization / SIR (FULL oracle — two
  // (group×stratum)-sized aggregates, closed forms) --------------------
  val q287 = Q(
    "q287_sir",
    (s, dir) => {
      val df = Tables.documents(s, dir).select(
        col("source"),
        expr("n_chars div 100").as("len_bucket"),
        (col("lang") === "en").cast("int").as("en"))
      graft.ops.Stats.indirectStandardization(df, "source", "len_bucket", "en")
        .orderBy("source")
    },
    Some(
      """WITH b AS (SELECT source AS g, n_chars // 100 AS s,
        |    CASE WHEN lang='en' THEN 1.0 ELSE 0.0 END AS e FROM documents),
        |cells AS (SELECT g, s, count(*)::BIGINT AS n, sum(e) AS o FROM b GROUP BY 1, 2),
        |ref AS (SELECT s, sum(o)/sum(n)::DOUBLE AS rate_ref FROM cells GROUP BY 1),
        |a AS (SELECT g, sum(n)::BIGINT AS n, sum(o) AS observed,
        |        sum(n::DOUBLE*rate_ref) AS expected
        |      FROM cells JOIN ref USING (s) GROUP BY 1)
        |SELECT g AS source, n, observed::BIGINT AS observed,
        |  floor(expected*1e6+0.5)/1e6 AS expected,
        |  CASE WHEN expected > 0
        |    THEN floor(observed/expected*1e6+0.5)/1e6 END AS sir
        |FROM a ORDER BY source""".stripMargin
    )
  )

  // ---- T100: cohort LTV curve (FULL oracle — integer cents, fixed
  // cohort-size denominator, cohort-keyed cumulative) ------------------
  val q288 = Q(
    "q288_cohort_ltv",
    (s, dir) =>
      graft.ops.Cohorts.ltv(
        Tables.events(s, dir).where(col("event_type") === "purchase"),
        "user_id", "ts", "value")
        .orderBy("cohort_day", "age"),
    Some(
      """WITH b AS (SELECT user_id AS u, floor(epoch(ts)/86400)::BIGINT AS day,
        |    round(value*100)::BIGINT AS cents FROM events WHERE event_type='purchase'),
        |fd AS (SELECT u, min(day) AS cohort_day FROM b GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*)::BIGINT AS cohort_size FROM fd GROUP BY 1),
        |pa AS (SELECT f.cohort_day, b.day - f.cohort_day AS age,
        |        sum(cents)::BIGINT AS rev_cents
        |      FROM b JOIN fd f USING (u) GROUP BY 1, 2),
        |c AS (SELECT cohort_day, age, rev_cents,
        |    (sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
        |  FROM pa)
        |SELECT c.cohort_day, age, cohort_size, rev_cents, cum AS cum_rev_cents,
        |  floor(cum::DOUBLE/100.0/cohort_size::DOUBLE*1e6+0.5)/1e6 AS cum_rev_per_user
        |FROM c JOIN sz USING (cohort_day) ORDER BY cohort_day, age""".stripMargin
    )
  )

  // ---- T101: out-of-fold target encoding (FULL oracle — shared md5-60
  // fold hash, (cat×fold) cells, leave-fold-out means, global-OOF
  // fallback flagged) ---------------------------------------------------
  val q289 = Q(
    "q289_target_encode",
    (s, dir) =>
      graft.ops.Encode.targetOof(
        Tables.events(s, dir), "event_id", "event_type", "value",
        folds = 5, salt = "graft9")
        .select("event_id", "event_type", "fold", "te", "te_fallback")
        .orderBy("event_id"),
    Some {
      val h = graft.functions.SharedHash.md5Long60Sql("'graft9:' || event_id::VARCHAR")
      s"""WITH b AS (SELECT event_id AS id, event_type AS c, value::DOUBLE AS y,
         |    ($h % 5)::INT AS fold FROM events),
         |cells AS (SELECT c, fold, count(*)::BIGINT AS nf, sum(y) AS sf
         |  FROM b GROUP BY 1, 2),
         |pc AS (SELECT c, sum(nf)::BIGINT AS nc, sum(sf) AS sc FROM cells GROUP BY 1),
         |pf AS (SELECT fold, sum(nf)::BIGINT AS nfg, sum(sf) AS sfg FROM cells GROUP BY 1),
         |tt AS (SELECT sum(nf)::BIGINT AS nt, sum(sf) AS st FROM cells),
         |oof AS (SELECT cells.c, cells.fold,
         |    CASE WHEN nc > nf THEN (sc - sf)/(nc - nf)::DOUBLE END AS tec,
         |    CASE WHEN nt > nfg THEN (st - sfg)/(nt - nfg)::DOUBLE END AS teg
         |  FROM cells JOIN pc USING (c) JOIN pf USING (fold) CROSS JOIN tt)
         |SELECT b.id AS event_id, b.c AS event_type, b.fold,
         |  floor(coalesce(tec, teg)*1e6+0.5)/1e6 AS te,
         |  tec IS NULL AS te_fallback
         |FROM b JOIN oof ON b.c = oof.c AND b.fold = oof.fold
         |ORDER BY event_id""".stripMargin
    }
  )

  // ---- C96: quantile treatment effects (FULL oracle — the q17
  // percentile ≡ quantile_cont bridge, one aggregate, per-τ reshape) ---
  val q290 = Q(
    "q290_qte",
    (s, dir) => {
      val df = Tables.orders(s, dir).select(
        (col("o_totalprice") / lit(1000.0)).as("y"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("t"))
      graft.ml.Causal.qte(df, "y", "t").orderBy("tau")
    },
    Some {
      val taus = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
      val base =
        """WITH b AS (SELECT CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END AS t,
          |    o_totalprice/1000.0 AS y FROM orders),
          |q AS (SELECT """.stripMargin +
          taus.zipWithIndex.map { case (tau, i) =>
            s"""quantile_cont(CASE WHEN t=1 THEN y END, $tau) AS qt_$i,
               |    quantile_cont(CASE WHEN t=0 THEN y END, $tau) AS qc_$i""".stripMargin
          }.mkString(",\n    ") + "\n  FROM b)\n"
      val rows = taus.zipWithIndex.map { case (tau, i) =>
        s"""SELECT $tau::DOUBLE AS tau,
           |  floor(qt_$i*1e6+0.5)/1e6 AS q_treat,
           |  floor(qc_$i*1e6+0.5)/1e6 AS q_control,
           |  floor((qt_$i - qc_$i)*1e6+0.5)/1e6 AS qte FROM q""".stripMargin
      }.mkString("\nUNION ALL\n")
      base + rows + "\nORDER BY tau"
    }
  )

  // ---- T102: row-level winsorize (FULL oracle — exact group
  // percentiles broadcast back, row-local clamp, raw values) -----------
  val q291 = Q(
    "q291_winsorize",
    (s, dir) =>
      graft.ops.Stats.winsorize(
        Tables.events(s, dir).select("event_id", "event_type", "value"),
        "value", Seq("event_type"))
        .orderBy("event_id"),
    Some(
      """WITH c AS (SELECT event_type, quantile_cont("value", 0.05) AS lo,
        |    quantile_cont("value", 0.95) AS hi FROM events GROUP BY 1)
        |SELECT event_id, events.event_type, "value",
        |  least(greatest("value", lo), hi) AS value_w
        |FROM events JOIN c USING (event_type) ORDER BY event_id""".stripMargin
    )
  )

  // ---- T103: Kneser–Ney bigram perplexity (FULL oracle — continuation
  // counts are two more groupBys over the bigram TYPE frame; the whole
  // train+score replays like q72) --------------------------------------
  val q292 = Q(
    "q292_kn_ppl",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.trainKN(docs, "text", "doc_id")
      val out = graft.text.NgramLm.scoreKN(docs, "text", "doc_id", model)
        .orderBy(col("doc_id"))
      out
    },
    Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS token,
        |    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
        |    string_split(text, ' ') AS l
        |  FROM documents),
        |t2 AS (SELECT doc_id, token, pos,
        |         CASE WHEN pos >= 1 THEN l[pos] END AS prev FROM toks),
        |bi AS (SELECT prev, token, count(*)::BIGINT AS c2 FROM t2
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT prev, sum(c2)::BIGINT AS ctot, count(*)::BIGINT AS n1f
        |        FROM bi GROUP BY 1),
        |cont AS (SELECT token, count(*)::BIGINT AS nprec FROM bi GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS nbt FROM bi),
        |s AS (SELECT t2.doc_id,
        |    CASE WHEN t2.pos = 0 OR cx.ctot IS NULL
        |      THEN coalesce(cn.nprec::DOUBLE / tot.nbt, 0.0)
        |      ELSE greatest(coalesce(b.c2::DOUBLE, 0.0) - 0.75, 0.0) / cx.ctot::DOUBLE
        |         + 0.75 * cx.n1f::DOUBLE / cx.ctot::DOUBLE *
        |           coalesce(cn.nprec::DOUBLE / tot.nbt, 0.0)
        |    END AS p
        |  FROM t2
        |  LEFT JOIN bi b ON b.prev = t2.prev AND b.token = t2.token
        |  LEFT JOIN ctx cx ON cx.prev = t2.prev
        |  LEFT JOIN cont cn ON cn.token = t2.token
        |  CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(greatest(p, 1e-10))), 4) AS avg_logprob,
        |  round(exp(-avg(ln(greatest(p, 1e-10)))), 2) AS ppl
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  )

  // ---- C97: interrupted time series (FULL oracle — per-segment
  // 5-moment fits from ONE conditional aggregate, slope + level change
  // at the breakpoint; kilodollar scale keeps 6dp margins wide) --------
  val q293 = Q(
    "q293_its",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(floor(unix_timestamp(col("o_orderdate")) / 86400).as("d"))
        .agg((sum("o_totalprice") / count(lit(1)) / lit(1000.0)).as("y"))
      graft.ml.Panel.interruptedTs(daily, "d", "y", breakpoint = 9300.0)
    },
    Some(
      """WITH daily AS (SELECT floor(epoch(o_orderdate)/86400) AS d,
        |    sum(o_totalprice)/count(*)/1000.0 AS y FROM orders GROUP BY 1),
        |b AS (SELECT CASE WHEN d::DOUBLE >= 9300.0 THEN 1 ELSE 0 END AS g,
        |    d::DOUBLE AS x, y FROM daily),
        |a AS (SELECT
        |    sum(CASE WHEN g=0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN g=0 THEN x END) AS sx_a, sum(CASE WHEN g=0 THEN y END) AS sy_a,
        |    sum(CASE WHEN g=0 THEN x*x END) AS sxx_a,
        |    sum(CASE WHEN g=0 THEN x*y END) AS sxy_a,
        |    sum(CASE WHEN g=1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN g=1 THEN x END) AS sx_b, sum(CASE WHEN g=1 THEN y END) AS sy_b,
        |    sum(CASE WHEN g=1 THEN x*x END) AS sxx_b,
        |    sum(CASE WHEN g=1 THEN x*y END) AS sxy_b
        |  FROM b),
        |f AS (SELECT n_a, n_b,
        |    CASE WHEN n_a > 2 AND sxx_a - sx_a*sx_a/n_a::DOUBLE > 0
        |      THEN (sxy_a - sx_a*sy_a/n_a::DOUBLE)/(sxx_a - sx_a*sx_a/n_a::DOUBLE)
        |    END AS sl_a,
        |    CASE WHEN n_b > 2 AND sxx_b - sx_b*sx_b/n_b::DOUBLE > 0
        |      THEN (sxy_b - sx_b*sy_b/n_b::DOUBLE)/(sxx_b - sx_b*sx_b/n_b::DOUBLE)
        |    END AS sl_b, sx_a, sy_a, sx_b, sy_b FROM a),
        |g2 AS (SELECT n_a, n_b, sl_a, sl_b,
        |    (sy_a - sl_a*sx_a)/n_a::DOUBLE + sl_a*9300.0 AS lv_a,
        |    (sy_b - sl_b*sx_b)/n_b::DOUBLE + sl_b*9300.0 AS lv_b FROM f)
        |SELECT n_a AS n_pre, n_b AS n_post,
        |  floor(sl_a*1e6+0.5)/1e6 AS slope_pre,
        |  floor(sl_b*1e6+0.5)/1e6 AS slope_post,
        |  CASE WHEN sl_a IS NOT NULL AND sl_b IS NOT NULL
        |    THEN floor((sl_b - sl_a)*1e6+0.5)/1e6 END AS slope_change,
        |  floor(lv_a*1e6+0.5)/1e6 AS level_pre,
        |  floor(lv_b*1e6+0.5)/1e6 AS level_post,
        |  CASE WHEN sl_a IS NOT NULL AND sl_b IS NOT NULL
        |    THEN floor((lv_b - lv_a)*1e6+0.5)/1e6 END AS level_change
        |FROM g2""".stripMargin
    )
  )

  // ---- T104: forecast accuracy scorecard (FULL oracle — naive-3
  // rolling-mean prediction built in-frame (sum/count windows, never
  // windowed avg — §8h bit-parity note), then one keyed aggregate of
  // closed-form MAE/RMSE/MAPE/sMAPE/MASE) ------------------------------
  val q294 = Q(
    "q294_forecast_acc",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-3, -1)
      val df = Tables.events(s, dir)
        .withColumn("pred", sum("value").over(w) / count("value").over(w))
      graft.ops.Forecast.accuracy(df, "user_id", "ts", "event_id", "value", "pred")
        .orderBy("user_id")
    },
    Some(
      """WITH b AS (SELECT user_id AS k, ts, event_id AS tb, value::DOUBLE AS y,
        |    sum(value) OVER w / count(value) OVER w AS p
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)),
        |l AS (SELECT k, y, p,
        |    lag(y) OVER (PARTITION BY k ORDER BY ts, tb) AS y1 FROM b),
        |m AS (SELECT k, count(*)::BIGINT AS n,
        |    sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS ns,
        |    sum(CASE WHEN p IS NOT NULL THEN abs(y - p) END) AS sae,
        |    sum(CASE WHEN p IS NOT NULL THEN (y - p)*(y - p) END) AS sse,
        |    sum(CASE WHEN p IS NOT NULL AND y <> 0.0 THEN abs(y - p)/abs(y) END) AS sape,
        |    sum(CASE WHEN p IS NOT NULL AND y <> 0.0 THEN 1 ELSE 0 END)::BIGINT AS nape,
        |    sum(CASE WHEN p IS NOT NULL AND abs(y) + abs(p) > 0.0
        |        THEN abs(y - p)/((abs(y) + abs(p))/2.0) END) AS ssm,
        |    sum(CASE WHEN p IS NOT NULL AND abs(y) + abs(p) > 0.0
        |        THEN 1 ELSE 0 END)::BIGINT AS nsm,
        |    sum(CASE WHEN y1 IS NOT NULL THEN abs(y - y1) END) AS snaive,
        |    sum(CASE WHEN y1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS nnaive
        |  FROM l GROUP BY 1)
        |SELECT k AS user_id, n, ns AS n_scored, (n - ns)::BIGINT AS n_unscored,
        |  CASE WHEN ns > 0 THEN floor(sae/ns::DOUBLE*1e6+0.5)/1e6 END AS mae,
        |  CASE WHEN ns > 0 THEN floor(sqrt(sse/ns::DOUBLE)*1e6+0.5)/1e6 END AS rmse,
        |  CASE WHEN nape > 0 THEN floor(sape/nape::DOUBLE*1e6+0.5)/1e6 END AS mape,
        |  CASE WHEN nsm > 0 THEN floor(ssm/nsm::DOUBLE*1e6+0.5)/1e6 END AS smape,
        |  CASE WHEN ns > 0 AND nnaive > 0 AND snaive > 0
        |    THEN floor((sae/ns::DOUBLE)/(snaive/nnaive::DOUBLE)*1e6+0.5)/1e6
        |  END AS mase
        |FROM m ORDER BY user_id""".stripMargin
    )
  )

  // ---- T105: Holm step-down FWER (FULL oracle — synthetic seeded p's
  // (the q242 seed-as-key convention), distributed running max via the
  // Z17 pid/carry machinery; max has no accumulation error so Holm and
  // Bonferroni are exact, Šidák's pow quantized) -----------------------
  val q295 = Q(
    "q295_holm",
    (s, dir) => {
      val df = Tables.documents(s, dir).select(
        col("doc_id"),
        (pmod(graft.functions.SharedHash.md5Long60(
          concat(lit("pval:"), col("doc_id").cast("string"))), lit(1000000L))
          .cast("double") / lit(1e6)).as("p"))
      graft.ml.Diagnostics.holm(df, "p", alpha = 0.05, tieBreak = Seq("doc_id"))
        .orderBy("doc_id")
    },
    Some {
      val h = graft.functions.SharedHash.md5Long60Sql("'pval:' || doc_id::VARCHAR")
      s"""WITH b AS (SELECT doc_id, ($h % 1000000)::DOUBLE/1e6 AS p FROM documents),
         |r AS (SELECT doc_id, p, row_number() OVER (ORDER BY p, doc_id) AS rank,
         |        count(*) OVER () AS m FROM b),
         |a AS (SELECT doc_id, p, rank::INT AS rank, m,
         |        least(1.0, max((m - rank + 1)::DOUBLE * p)
         |          OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)) AS p_holm FROM r)
         |SELECT doc_id, p, rank, p_holm,
         |  least(1.0, m::DOUBLE * p) AS p_bonf,
         |  floor((1.0 - power(1.0 - p, m::DOUBLE))*1e6+0.5)/1e6 AS p_sidak,
         |  CASE WHEN p_holm <= 0.05 THEN 1 ELSE 0 END AS significant
         |FROM a ORDER BY doc_id""".stripMargin
    }
  )

  // ---- T106: Gamma–Poisson EB rate shrinkage (FULL oracle — the T93
  // machinery for count-per-exposure; distinct-day exposure) -----------
  val q296 = Q(
    "q296_eb_rate",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id").agg(
        sum((col("event_type") === "purchase").cast("int")).as("y"),
        countDistinct(floor(unix_timestamp(col("ts")) / 86400)).as("e"))
      graft.ops.Stats.ebShrinkRate(per, "user_id", "y", "e").orderBy("user_id")
    },
    Some(
      """WITH per0 AS (SELECT user_id AS g,
        |    sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)::DOUBLE AS y,
        |    count(DISTINCT floor(epoch(ts)/86400))::DOUBLE AS e
        |  FROM events GROUP BY 1),
        |per AS (SELECT g, y, e, y/e AS r FROM per0 WHERE e > 0),
        |pr AS (SELECT count(*)::BIGINT AS gk, sum(r) AS sr, sum(r*r) AS srr FROM per),
        |pr2 AS (SELECT gk, sr/gk::DOUBLE AS m,
        |    CASE WHEN gk > 1
        |      THEN (srr - sr*sr/gk::DOUBLE)/(gk - 1)::DOUBLE END AS v FROM pr)
        |SELECT g AS user_id, y::BIGINT AS y,
        |  floor(e*1e6+0.5)/1e6 AS exposure,
        |  floor(r*1e6+0.5)/1e6 AS rate_raw,
        |  CASE WHEN v > 0
        |    THEN floor((y + m*m/v)/(e + m/v)*1e6+0.5)/1e6 END AS rate_shrunk,
        |  CASE WHEN v > 0 THEN floor(m*m/v*1e6+0.5)/1e6 END AS alpha,
        |  CASE WHEN v > 0 THEN floor(m/v*1e6+0.5)/1e6 END AS beta
        |FROM per CROSS JOIN pr2 ORDER BY user_id""".stripMargin
    )
  )

  // ---- T107: Bland–Altman agreement (FULL oracle — one moment pass +
  // one recount against the broadcast limits) --------------------------
  val q297 = Q(
    "q297_bland_altman",
    (s, dir) => {
      val df = Tables.lineitem(s, dir).select(
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / lit(1000.0)).as("a"),
        (col("l_extendedprice") / lit(1000.0)).as("b"))
      graft.ops.Agreement.blandAltman(df, "a", "b")
    },
    Some(
      """WITH b AS (SELECT l_extendedprice*(1.0 - l_discount)/1000.0 AS a,
        |    l_extendedprice/1000.0 AS bb FROM lineitem),
        |m AS (SELECT count(*)::BIGINT AS n, sum(a - bb) AS sd1,
        |    sum((a - bb)*(a - bb)) AS sdd FROM b),
        |st AS (SELECT n, sd1/n::DOUBLE AS mean_,
        |    CASE WHEN (sdd - sd1*sd1/n::DOUBLE)/(n - 1)::DOUBLE >= 0 AND n > 1
        |      THEN sqrt((sdd - sd1*sd1/n::DOUBLE)/(n - 1)::DOUBLE) END AS sd_ FROM m),
        |oc AS (SELECT sum(CASE WHEN a - bb < mean_ - 1.96*sd_
        |        OR a - bb > mean_ + 1.96*sd_ THEN 1 ELSE 0 END)::BIGINT AS n_outside
        |  FROM b CROSS JOIN st)
        |SELECT n, floor(mean_*1e6+0.5)/1e6 AS bias,
        |  floor(sd_*1e6+0.5)/1e6 AS sd_diff,
        |  floor((mean_ - 1.96*sd_)*1e6+0.5)/1e6 AS loa_lo,
        |  floor((mean_ + 1.96*sd_)*1e6+0.5)/1e6 AS loa_hi,
        |  n_outside,
        |  CASE WHEN n > 0
        |    THEN floor(n_outside::DOUBLE/n::DOUBLE*1e6+0.5)/1e6 END AS share_outside
        |FROM st CROSS JOIN oc""".stripMargin
    )
  )

  // ---- C98: Deming regression (FULL oracle — closed form on centered
  // moments; OLS slope beside it for the attenuation readout) ----------
  val q298 = Q(
    "q298_deming",
    (s, dir) =>
      graft.ml.Robust.deming(
        Tables.lineitem(s, dir)
          .select(col("l_quantity").as("x"),
            (col("l_extendedprice") / lit(1000.0)).as("y")),
        "x", "y", lambda = 1.0),
    Some(
      """WITH b AS (SELECT l_quantity::DOUBLE AS x, l_extendedprice/1000.0 AS y FROM lineitem),
        |m AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM b),
        |c AS (SELECT n, sx, sy,
        |    sxx - sx*sx/n::DOUBLE AS cxx, sxy - sx*sy/n::DOUBLE AS cxy,
        |    syy - sy*sy/n::DOUBLE AS cyy FROM m),
        |f AS (SELECT n, sx, sy, cxx, cxy, cyy, cyy - 1.0*cxx AS d FROM c),
        |g2 AS (SELECT n, sx, sy, cxx, cxy, cyy,
        |    (d + sqrt(d*d + 4.0*cxy*cxy))/(2.0*cxy) AS slope FROM f)
        |SELECT n,
        |  CASE WHEN n > 2 AND cxx > 0 AND cyy > 0 AND abs(cxy) > 0
        |    THEN floor(slope*1e6+0.5)/1e6 END AS slope,
        |  CASE WHEN n > 2 AND cxx > 0 AND cyy > 0 AND abs(cxy) > 0
        |    THEN floor((sy/n::DOUBLE - slope*(sx/n::DOUBLE))*1e6+0.5)/1e6 END AS icept,
        |  CASE WHEN n > 2 AND cxx > 0
        |    THEN floor(cxy/cxx*1e6+0.5)/1e6 END AS slope_ols
        |FROM g2""".stripMargin
    )
  )

  // ---- T1b follow-through: byte-level no-OOV under UNSEEN scripts
  // (rows-only, q71's in-query roundtrip convention: the merge table is
  // trained on the ASCII-ish synthetic corpus, then must losslessly
  // round-trip text carrying CJK/emoji/accents it never saw — the exact
  // property whitespace-word tokenizers cannot have; BpeSpec pins the
  // trainer determinism and local multibyte round trips) ---------------
  val q299 = Q(
    "q299_bpe_bytelevel",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.text.Bpe.trainOn(docs, "text", numMerges = 150, maxWords = 20000)
      val salted = docs
        .where(col("doc_id") % 5 === 0)
        .withColumn("text2",
          concat(col("text"), lit(" café 東京 🚀 naïve Ω"), col("doc_id").cast("string")))
      val toks = graft.text.Bpe.withTokens(salted, "text2", vocab)
      graft.text.Bpe.decodeCol(toks, "tokens", "__rt", vocab)
        .select(
          col("doc_id"),
          col("n_tokens_bpe"),
          (col("__rt") === col("text2")).as("roundtrip_ok"),
          // every id must be a raw byte or one of the 150 merges
          aggregate(col("tokens"), lit(true),
            (acc, t) => acc && t >= 0 && t < lit(256 + 150)).as("ids_in_vocab"))
        .orderBy(col("doc_id"))
    },
    None
  )

  // ---- C99: Callaway–Sant'Anna staggered DiD (FULL oracle — the whole
  // estimator is (cohort, period) cell means + three broadcast cell
  // joins; sum/count means per the DuckDB-parity convention; staggered
  // cohorts derived from each user's first purchase week) --------------
  val q300 = Q(
    "q300_cs_did",
    (s, dir) => {
      // staggered adoption derived deterministically: a third of users
      // adopt, cohorts spread over ten start days from day 5 of the
      // window; the other two thirds are the never-treated controls
      val ev = Tables.events(s, dir)
      val base = ev.select(
        col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).as("day"),
        col("value").cast("double").as("v"))
      val d0 = base.agg(min(col("day"))).head().getLong(0)
      val panel = base.groupBy("user_id", "day")
        .agg((sum(col("v")) / count(lit(1))).as("y"))
        .withColumn("g",
          when(col("user_id") % 3 === 0,
            lit(d0) + lit(5) + col("user_id") % 10).otherwise(lit(0L)))
      graft.ml.Panel.csDid(panel, "user_id", "day", "y", "g").orderBy("g", "t")
    },
    Some(
      """WITH b AS (SELECT user_id AS u, floor(epoch(ts)/86400)::BIGINT AS day,
        |             value::DOUBLE AS v
        |           FROM events),
        |d0 AS (SELECT min(day) AS d FROM b),
        |p2 AS (SELECT u, day AS t, sum(v)/count(*) AS y,
        |         CASE WHEN u % 3 = 0 THEN (SELECT d FROM d0) + 5 + u % 10
        |              ELSE 0 END AS g
        |       FROM b GROUP BY u, day),
        |cells AS (SELECT g, t, count(*)::BIGINT AS n, sum(y)/count(*) AS m
        |          FROM p2 GROUP BY 1, 2),
        |tb AS (SELECT g, m AS m_g_base FROM cells WHERE g > 0 AND t = g - 1),
        |c AS (SELECT t, m AS m_c FROM cells WHERE g = 0),
        |cb AS (SELECT t AS bt, m AS m_c_base FROM cells WHERE g = 0),
        |att AS (SELECT cells.g, cells.t, cells.t - cells.g AS event_time,
        |          cells.n AS n_treated,
        |          (cells.m - tb.m_g_base) - (c.m_c - cb.m_c_base) AS a
        |        FROM cells JOIN tb ON cells.g = tb.g JOIN c ON c.t = cells.t
        |          JOIN cb ON cb.bt = cells.g - 1
        |        WHERE cells.g > 0),
        |ov AS (SELECT sum(n_treated * a)/sum(n_treated) AS ao FROM att
        |       WHERE event_time >= 0)
        |SELECT g, t, event_time, n_treated,
        |  floor(a*1e6+0.5)/1e6 AS att,
        |  floor((SELECT ao FROM ov)*1e6+0.5)/1e6 AS att_overall
        |FROM att ORDER BY g, t""".stripMargin
    )
  )

  // ---- T110: Markov removal-effect attribution (FULL oracle — journey
  // pairs replay as keyed windows, the bounded transition matrix as
  // exact count ratios, and the fixed-100-sweep Jacobi absorption as a
  // recursive CTE with absorbing self-loops; per-sweep sums differ in
  // ulps only, absorbed by the 6dp quantizer) --------------------------
  val q301 = Q(
    "q301_markov_attribution",
    (s, dir) =>
      graft.ops.Attribution.markovRemoval(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id",
        conversionType = "purchase",
        touchTypes = Seq("click", "view", "signup", "share"))
        .orderBy("channel"),
    Some(
      """WITH RECURSIVE ev AS (
        |  SELECT user_id AS u, epoch_us(ts) AS us, event_id AS id, event_type AS et
        |  FROM events),
        |fc AS (SELECT u, us AS cus, id AS cid FROM (
        |    SELECT u, us, id,
        |      row_number() OVER (PARTITION BY u ORDER BY us, id) AS rn
        |    FROM ev WHERE et = 'purchase') WHERE rn = 1),
        |tch AS (SELECT e.u, e.us, e.id, e.et AS ch, fc.u IS NOT NULL AS conv
        |        FROM ev e LEFT JOIN fc ON e.u = fc.u
        |        WHERE e.et IN ('click', 'view', 'signup', 'share')
        |          AND (fc.u IS NULL OR e.us < fc.cus
        |               OR (e.us = fc.cus AND e.id < fc.cid))),
        |tt AS (SELECT u, ch, conv,
        |         coalesce(lag(ch) OVER w, '(start)') AS src,
        |         lead(ch) OVER w AS nxt
        |       FROM tch WINDOW w AS (PARTITION BY u ORDER BY us, id)),
        |pairs AS (
        |  SELECT src, ch AS dst FROM tt
        |  UNION ALL
        |  SELECT ch, CASE WHEN conv THEN '(conv)' ELSE '(null)' END FROM tt
        |  WHERE nxt IS NULL
        |  UNION ALL
        |  SELECT '(start)', '(conv)' FROM fc
        |  WHERE u NOT IN (SELECT DISTINCT u FROM tch)),
        |tr AS (SELECT src, dst, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2),
        |tot AS (SELECT src, sum(n) AS t FROM tr GROUP BY 1),
        |tpx AS (SELECT tr.src, tr.dst, tr.n::DOUBLE / tot.t::DOUBLE AS pr
        |        FROM tr JOIN tot ON tr.src = tot.src
        |        UNION ALL SELECT '(conv)', '(conv)', 1.0::DOUBLE
        |        UNION ALL SELECT '(null)', '(null)', 1.0::DOUBLE),
        |rm AS (SELECT '(none)' AS removed
        |       UNION ALL SELECT DISTINCT src FROM tr
        |       WHERE src NOT IN ('(start)', '(conv)', '(null)')),
        |sts AS (SELECT DISTINCT src AS st FROM tpx),
        |rec AS (
        |  SELECT rm.removed, s.st AS state,
        |    CASE WHEN s.st = '(conv)' THEN 1.0 ELSE 0.0 END::DOUBLE AS p, 0 AS it
        |  FROM rm, sts s
        |  UNION ALL
        |  SELECT DISTINCT q.removed, q.src AS state, q.np AS p, q.it + 1
        |  FROM (
        |    SELECT r.removed, t.src, r.it,
        |      sum(t.pr * (CASE WHEN r.state = r.removed THEN 0.0 ELSE r.p END))
        |        OVER (PARTITION BY r.removed, t.src) AS np
        |    FROM rec r JOIN tpx t ON t.dst = r.state
        |    WHERE r.it < 100
        |  ) q
        |),
        |fin AS (SELECT removed, p FROM rec WHERE it = 100 AND state = '(start)'),
        |base AS (SELECT p AS pb FROM fin WHERE removed = '(none)'),
        |re AS (SELECT removed AS channel,
        |         CASE WHEN (SELECT pb FROM base) > 0
        |           THEN ((SELECT pb FROM base) - p) / (SELECT pb FROM base) END AS r
        |       FROM fin WHERE removed <> '(none)'),
        |rtot AS (SELECT sum(r) AS s FROM re)
        |SELECT channel,
        |  CASE WHEN (SELECT pb FROM base) > 0
        |    THEN floor((SELECT pb FROM base)*1e6+0.5)/1e6 END AS p_conv,
        |  floor(r*1e6+0.5)/1e6 AS removal_effect,
        |  CASE WHEN (SELECT s FROM rtot) > 0
        |    THEN floor(r/(SELECT s FROM rtot)*1e6+0.5)/1e6 END AS share
        |FROM re ORDER BY channel""".stripMargin
    )
  )

  // ---- T111: Shapley attribution on observed coalitions (FULL oracle —
  // coalition sets via list aggregation, the collapsed permutation sum
  // as factorial-weight closed forms; w(n) ≡ 0 convention on both
  // sides; exact integer factorials, one scalar subquery) --------------
  val q302 = Q(
    "q302_shapley_attribution",
    (s, dir) =>
      graft.ops.Attribution.shapley(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id",
        conversionType = "purchase",
        touchTypes = Seq("click", "view", "signup", "share"))
        .orderBy("channel"),
    Some(
      """WITH ev AS (
        |  SELECT user_id AS u, epoch_us(ts) AS us, event_id AS id, event_type AS et
        |  FROM events),
        |fc AS (SELECT u, us AS cus, id AS cid FROM (
        |    SELECT u, us, id,
        |      row_number() OVER (PARTITION BY u ORDER BY us, id) AS rn
        |    FROM ev WHERE et = 'purchase') WHERE rn = 1),
        |tch AS (SELECT e.u, e.et AS ch, fc.u IS NOT NULL AS conv
        |        FROM ev e LEFT JOIN fc ON e.u = fc.u
        |        WHERE e.et IN ('click', 'view', 'signup', 'share')
        |          AND (fc.u IS NULL OR e.us < fc.cus
        |               OR (e.us = fc.cus AND e.id < fc.cid))),
        |usr AS (SELECT u,
        |          array_to_string(list_sort(list_distinct(list(ch))), '|') AS sk,
        |          max(CASE WHEN conv THEN 1 ELSE 0 END) AS cv
        |        FROM tch GROUP BY u),
        |s2 AS (SELECT sk, len(string_split(sk, '|')) AS sz,
        |         sum(cv)::DOUBLE / count(*)::DOUBLE AS v
        |       FROM usr GROUP BY sk),
        |nn AS (SELECT count(DISTINCT c) AS n FROM
        |        (SELECT unnest(string_split(sk, '|')) AS c FROM s2)),
        |tw AS (SELECT sum(
        |         CASE WHEN sz = (SELECT n FROM nn) THEN 0.0
        |           ELSE factorial(sz::INT)::DOUBLE
        |             * factorial(((SELECT n FROM nn) - sz - 1)::INT)::DOUBLE
        |             / factorial((SELECT n FROM nn)::INT)::DOUBLE END * v) AS t
        |       FROM s2),
        |pc AS (SELECT c AS channel, count(*)::BIGINT AS n_sets,
        |         sum((
        |           (CASE WHEN sz - 1 = (SELECT n FROM nn) THEN 0.0
        |              ELSE factorial((sz - 1)::INT)::DOUBLE
        |                * factorial(((SELECT n FROM nn) - sz)::INT)::DOUBLE
        |                / factorial((SELECT n FROM nn)::INT)::DOUBLE END)
        |           + (CASE WHEN sz = (SELECT n FROM nn) THEN 0.0
        |              ELSE factorial(sz::INT)::DOUBLE
        |                * factorial(((SELECT n FROM nn) - sz - 1)::INT)::DOUBLE
        |                / factorial((SELECT n FROM nn)::INT)::DOUBLE END)) * v) AS plus
        |       FROM (SELECT unnest(string_split(sk, '|')) AS c, sz, v FROM s2)
        |       GROUP BY 1),
        |tp AS (SELECT sum(plus - (SELECT t FROM tw)) AS t FROM pc)
        |SELECT channel, n_sets,
        |  floor((plus - (SELECT t FROM tw))*1e6+0.5)/1e6 AS shapley,
        |  CASE WHEN (SELECT t FROM tp) > 0
        |    THEN floor((plus - (SELECT t FROM tw))/(SELECT t FROM tp)*1e6+0.5)/1e6 END
        |    AS share
        |FROM pc ORDER BY channel""".stripMargin
    )
  )

  // ---- T112: Benjamini–Yekutieli FDR under arbitrary dependence (FULL
  // oracle — q179's replay with the harmonic c(m) divisor; ascending
  // harmonic fold on both sides) ---------------------------------------
  val q306 = Q(
    "q306_by_fdr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      val ks = graft.ops.Drift.ksTest(docs, "n_chars", "lang")
      val withP = ks.withColumn(
        "p",
        round(
          least(
            lit(1.0),
            lit(2.0) * exp(lit(-2.0) *
              (col("n_group").cast("double") * n / (col("n_group").cast("double") + n)) *
              (col("d_stat") * col("d_stat")))),
          6))
      graft.ml.Diagnostics
        .bhFdr(withP, "p", alpha = 0.10, tieBreak = Seq("lang"), dependent = true)
        .select(
          col("lang"), col("n_group"), col("d_stat"), col("p"),
          col("rank"), col("bh_crit"), col("significant"))
        .orderBy("rank")
    },
    Some(
      """WITH c AS (SELECT lang AS g, n_chars AS v, count(*)::BIGINT AS c
        |           FROM documents GROUP BY 1, 2),
        |vals AS (SELECT v, sum(c)::BIGINT AS cv FROM c GROUP BY 1),
        |grps AS (SELECT g, sum(c)::BIGINT AS ng FROM c GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM c),
        |dense AS (SELECT grps.g, grps.ng, vals.v, vals.cv, COALESCE(c.c, 0) AS cc
        |          FROM grps CROSS JOIN vals LEFT JOIN c ON c.g = grps.g AND c.v = vals.v),
        |cum AS (SELECT g, ng, v,
        |          sum(cc) OVER (PARTITION BY g ORDER BY v) AS cg,
        |          sum(cv) OVER (PARTITION BY g ORDER BY v) AS ca
        |        FROM dense),
        |ks AS (SELECT g AS lang, max(ng) AS n_group,
        |         round(max(abs(cg::DOUBLE/ng - ca::DOUBLE/(SELECT n FROM tot))), 4) AS d_stat
        |       FROM cum GROUP BY 1),
        |p AS (SELECT lang, n_group, d_stat,
        |        round(least(1.0,
        |          2.0*exp(-2.0*(n_group::DOUBLE*(SELECT n FROM tot)
        |                         /(n_group::DOUBLE + (SELECT n FROM tot)))
        |                 *(d_stat*d_stat))), 6) AS p
        |      FROM ks),
        |r AS (SELECT *, row_number() OVER (ORDER BY p ASC, lang ASC) AS rank,
        |        round(0.10*row_number() OVER (ORDER BY p ASC, lang ASC)
        |              /((SELECT count(*) FROM p)::DOUBLE
        |                * (SELECT sum(1.0/i.k) FROM
        |                    (SELECT unnest(range(1, (SELECT count(*) FROM p) + 1)) AS k) i)),
        |          10) AS bh_crit
        |      FROM p),
        |k AS (SELECT COALESCE(max(CASE WHEN p <= bh_crit THEN rank END), 0) AS k_star FROM r)
        |SELECT lang, n_group, d_stat, p, rank, bh_crit,
        |  (rank <= (SELECT k_star FROM k))::INT AS significant
        |FROM r ORDER BY rank""".stripMargin
    )
  )

  // ---- T118: Storey q-values (FULL oracle — π̂₀ plug-in + the suffix
  // running min, which is EXACT under any regrouping, so the
  // distributed per-partition-window + carry result replays as one
  // plain following-frame window; same KS p inputs as q306) ------------
  val q324 = Q(
    "q324_storey_q",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      val ks = graft.ops.Drift.ksTest(docs, "n_chars", "lang")
      val withP = ks.withColumn(
        "p",
        round(
          least(
            lit(1.0),
            lit(2.0) * exp(lit(-2.0) *
              (col("n_group").cast("double") * n / (col("n_group").cast("double") + n)) *
              (col("d_stat") * col("d_stat")))),
          6))
      graft.ml.Diagnostics
        .storeyQ(withP, "p", tieBreak = Seq("lang"))
        .select(col("lang"), col("n_group"), col("p"), col("rank"),
          col("pi0"), col("q_value"))
        .orderBy("rank")
    },
    Some(
      """WITH c AS (SELECT lang AS g, n_chars AS v, count(*)::BIGINT AS c
        |           FROM documents GROUP BY 1, 2),
        |vals AS (SELECT v, sum(c)::BIGINT AS cv FROM c GROUP BY 1),
        |grps AS (SELECT g, sum(c)::BIGINT AS ng FROM c GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM c),
        |dense AS (SELECT grps.g, grps.ng, vals.v, vals.cv, COALESCE(c.c, 0) AS cc
        |          FROM grps CROSS JOIN vals LEFT JOIN c ON c.g = grps.g AND c.v = vals.v),
        |cum AS (SELECT g, ng, v,
        |          sum(cc) OVER (PARTITION BY g ORDER BY v) AS cg,
        |          sum(cv) OVER (PARTITION BY g ORDER BY v) AS ca
        |        FROM dense),
        |ks AS (SELECT g AS lang, max(ng) AS n_group,
        |         round(max(abs(cg::DOUBLE/ng - ca::DOUBLE/(SELECT n FROM tot))), 4) AS d_stat
        |       FROM cum GROUP BY 1),
        |p AS (SELECT lang, n_group, d_stat,
        |        round(least(1.0,
        |          2.0*exp(-2.0*(n_group::DOUBLE*(SELECT n FROM tot)
        |                         /(n_group::DOUBLE + (SELECT n FROM tot)))
        |                 *(d_stat*d_stat))), 6) AS p
        |      FROM ks),
        |s AS (SELECT count(*)::BIGINT AS m,
        |        sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END)::BIGINT AS ngt FROM p),
        |pi AS (SELECT least(1.0, ngt/((1.0 - 0.5)*m)) AS pi0, m FROM s),
        |r AS (SELECT p.*, row_number() OVER (ORDER BY p ASC, lang ASC) AS rank FROM p),
        |w AS (SELECT r.*,
        |        least(1.0, ((SELECT pi0 FROM pi)*(SELECT m FROM pi))*p/rank) AS raw
        |      FROM r)
        |SELECT lang, n_group, p, rank::INT AS rank,
        |  round((SELECT pi0 FROM pi), 6) AS pi0,
        |  round(min(raw) OVER (ORDER BY rank
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS q_value
        |FROM w ORDER BY rank""".stripMargin
    )
  )

  // ---- T113: continuous-outcome experiment sizing (FULL oracle — the
  // q226 convention: probit constants as binary64 literals, sd from a
  // 4dp-floored corpus moment, exactly-rounded squares) ----------------
  val q307 = Q(
    "q307_power_continuous",
    (s, dir) => {
      val sdRaw = Tables.events(s, dir)
        .agg(stddev_samp(col("value").cast("double"))).head().getDouble(0)
      graft.ops.Abtest.requiredNContinuous(
        s, math.max(0.01, math.floor(sdRaw * 1e4) / 1e4), mde = 5.0)
    },
    Some {
      val za = graft.ops.Abtest.probit(1 - 0.05 / 2).toString
      val zb = graft.ops.Abtest.probit(0.8).toString
      s"""WITH b AS (SELECT stddev_samp(value::DOUBLE) AS sr FROM events),
         |p AS (SELECT greatest(0.01::DOUBLE, floor(sr * 1e4) / 1e4) AS sd FROM b),
         |s AS (SELECT sd, CAST('$za' AS DOUBLE) + CAST('$zb' AS DOUBLE) AS zs FROM p)
         |SELECT sd, 5.0::DOUBLE AS mde, 0.05::DOUBLE AS alpha, 0.8::DOUBLE AS "power",
         |  CAST(ceil(2.0 * (zs * zs) * (sd * sd) / (5.0::DOUBLE * 5.0::DOUBLE)) AS BIGINT)
         |    AS n_per_arm
         |FROM s""".stripMargin
    }
  )

  // ---- T114: two-sample rate z-test (FULL oracle — four integer
  // cells, closed forms, the shared portable Φ for the p-value) --------
  val q308 = Q(
    "q308_two_rates",
    (s, dir) =>
      graft.ops.Abtest.twoRates(
        Tables.events(s, dir),
        when(col("user_id") % 2 === 0, "A").otherwise("B"),
        col("event_type") === "purchase",
        armA = "A", armB = "B"),
    Some {
      val phi = graft.functions.NormalDist
      s"""WITH a AS (SELECT
         |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS x_a,
         |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         |    sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS x_b
         |  FROM events),
         |r AS (SELECT *, x_a::DOUBLE / n_a::DOUBLE AS ra, x_b::DOUBLE / n_b::DOUBLE AS rb
         |      FROM a),
         |z AS (SELECT *, (rb - ra) / sqrt(ra / n_a::DOUBLE + rb / n_b::DOUBLE) AS zs
         |      FROM r)
         |SELECT n_a, x_a, n_b, x_b,
         |  floor(ra*1e6+0.5)/1e6 AS rate_a,
         |  floor(rb*1e6+0.5)/1e6 AS rate_b,
         |  floor((rb - ra)*1e6+0.5)/1e6 AS diff,
         |  CASE WHEN x_a + x_b > 0 THEN floor(zs*1e6+0.5)/1e6 END AS z,
         |  CASE WHEN x_a + x_b > 0
         |    THEN floor(${phi.pTwoSidedSql("zs")}*1e6+0.5)/1e6 END AS p_value
         |FROM z""".stripMargin
    }
  )

  // ---- T115: Krippendorff's alpha, nominal + interval (FULL oracle —
  // both disagreements are pure moment aggregates, replayed in the
  // identical closed forms; no coincidence matrix on either side) ------
  val q309 = Q(
    "q309_krippendorff",
    (s, dir) => {
      val nom = graft.ops.Agreement.krippendorffAlpha(
        Tables.documents(s, dir).select(col("source").as("u"), col("lang").as("v")),
        "u", "v", "nominal")
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), floor(col("value") / lit(50.0)).as("v"))
      val itv = graft.ops.Agreement.krippendorffAlpha(ev, "u", "v", "interval")
      nom.unionByName(itv).orderBy("metric")
    },
    Some(
      """WITH b AS (SELECT source AS u, lang AS c FROM documents),
        |puc AS (SELECT u, c, count(*)::BIGINT AS nuc FROM b GROUP BY 1, 2),
        |pu AS (SELECT u, sum(nuc)::BIGINT AS m FROM puc GROUP BY 1
        |       HAVING sum(nuc) >= 2),
        |us AS (SELECT puc.u,
        |         sum(nuc::DOUBLE * (pu.m - nuc)::DOUBLE / (pu.m - 1)::DOUBLE) AS dou
        |       FROM puc JOIN pu ON puc.u = pu.u GROUP BY puc.u),
        |ct AS (SELECT sum(nc)::BIGINT AS n, sum(nc*nc)::BIGINT AS snc2 FROM
        |        (SELECT c, sum(nuc)::BIGINT AS nc FROM puc
        |         JOIN pu ON puc.u = pu.u GROUP BY c)),
        |ua AS (SELECT count(*)::BIGINT AS units, sum(dou) AS dos FROM us),
        |e AS (SELECT user_id AS u, floor(value/50.0) AS v FROM events),
        |per AS (SELECT u, count(*)::BIGINT AS m, sum(v) AS s1, sum(v*v) AS s2
        |        FROM e GROUP BY 1 HAVING count(*) >= 2),
        |ia AS (SELECT count(*)::BIGINT AS units, sum(m)::BIGINT AS n,
        |         sum(s1) AS gs1, sum(s2) AS gs2,
        |         sum(2.0*(m::DOUBLE*s2 - s1*s1)/(m - 1)::DOUBLE) AS dos
        |       FROM per)
        |SELECT 'interval' AS metric, units AS n_units_used, n AS n_ratings,
        |  floor((1.0 - (dos/n::DOUBLE)
        |    / (2.0*(n::DOUBLE*gs2 - gs1*gs1)/(n::DOUBLE*(n::DOUBLE - 1.0))))*1e6+0.5)/1e6
        |    AS alpha
        |FROM ia
        |UNION ALL
        |SELECT 'nominal', units, n,
        |  floor((1.0 - (dos/n::DOUBLE)
        |    / ((n::DOUBLE*n::DOUBLE - snc2::DOUBLE)/(n::DOUBLE*(n::DOUBLE - 1.0))))*1e6+0.5)/1e6
        |FROM ua, ct
        |ORDER BY metric""".stripMargin
    )
  )

  // ---- C105: Weibull AFT parametric survival (rows-only: Newton MLE
  // with backtracking; SurvivalSpec pins planted Weibull recovery with
  // and without censoring and the exponential shape=1 special case) ----
  val q312 = Q(
    "q312_weibull_aft",
    (s, dir) => {
      // time-to-first-purchase per user (censored at span end when the
      // user never purchases), log time regressed on scaled event volume
      val ev = Tables.events(s, dir)
        .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).as("day"),
          (col("event_type") === "purchase").cast("int").as("isp"))
      val per = ev.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"), count(lit(1)).as("nev"),
          min(when(col("isp") === 1, col("day"))).as("pday"))
      val spans = per.select(
        when(col("pday").isNotNull, col("pday") - col("d0") + 1)
          .otherwise(col("d1") - col("d0") + 1).cast("double").as("dur"),
        col("pday").isNotNull.cast("int").as("ev"),
        (col("nev").cast("double") / lit(100.0)).as("xv"))
      val m = graft.ml.WeibullAft.fit(spans, "dur", "ev", Seq("xv"))
      graft.ml.WeibullAft.summary(s, m).orderBy("name")
    },
    None
  )

  // ---- T116: Cohen's d / Hedges' g effect size (FULL oracle — one
  // conditional moment aggregate + closed forms) -----------------------
  val q313 = Q(
    "q313_effect_size",
    (s, dir) =>
      graft.ops.Abtest.effectSize(
        Tables.events(s, dir),
        when(col("user_id") % 2 === 0, "A").otherwise("B"),
        col("value"), armA = "A", armB = "B"),
    Some(
      """WITH a AS (SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value::DOUBLE ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value::DOUBLE*value::DOUBLE ELSE 0.0 END) AS qa,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value::DOUBLE ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value::DOUBLE*value::DOUBLE ELSE 0.0 END) AS qb
        |  FROM events),
        |c AS (SELECT *, n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
        |        qa - sa*sa/n_a::DOUBLE AS ssa, qb - sb*sb/n_b::DOUBLE AS ssb,
        |        n_a::DOUBLE + n_b::DOUBLE - 2.0 AS dfree
        |      FROM a),
        |e AS (SELECT *, (sb/nb - sa/na) / sqrt((ssa + ssb)/dfree) AS d FROM c),
        |g AS (SELECT *, (1.0 - 3.0/(4.0*dfree - 1.0)) * d AS hg,
        |        sqrt((na + nb)/(na*nb)
        |          + ((1.0 - 3.0/(4.0*dfree - 1.0)) * d)
        |            * ((1.0 - 3.0/(4.0*dfree - 1.0)) * d) / (2.0*dfree)) AS seg
        |      FROM e)
        |SELECT n_a, n_b,
        |  floor((sa/na)*1e6+0.5)/1e6 AS mean_a,
        |  floor((sb/nb)*1e6+0.5)/1e6 AS mean_b,
        |  CASE WHEN ssa + ssb > 0 AND n_a > 1 AND n_b > 1
        |    THEN floor(d*1e6+0.5)/1e6 END AS cohens_d,
        |  CASE WHEN ssa + ssb > 0 AND n_a > 1 AND n_b > 1
        |    THEN floor(hg*1e6+0.5)/1e6 END AS hedges_g,
        |  CASE WHEN ssa + ssb > 0 AND n_a > 1 AND n_b > 1
        |    THEN floor((hg - 1.959964*seg)*1e6+0.5)/1e6 END AS g_lo,
        |  CASE WHEN ssa + ssb > 0 AND n_a > 1 AND n_b > 1
        |    THEN floor((hg + 1.959964*seg)*1e6+0.5)/1e6 END AS g_hi
        |FROM g""".stripMargin
    )
  )

  // ---- C106: zero-inflated Poisson (rows-only: GEM; GlmSpec pins
  // planted (π, β) recovery and the pure-Poisson π→0 collapse) ---------
  val q315 = Q(
    "q315_zip",
    (s, dir) => {
      // purchases per user-day: structural zeros from never-buyers plus
      // Poisson day-to-day variation
      val ev = Tables.events(s, dir)
      val perDay = ev
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 86400).as("day"),
          (col("event_type") === "purchase").cast("int").as("isp"))
        .groupBy("user_id", "day")
        .agg(sum(col("isp")).cast("double").as("y"),
          count(lit(1)).cast("double").as("vol"))
        .withColumn("xv", col("vol") / lit(10.0))
      val m = graft.ml.Zip.fit(perDay, "y", Seq("xv"))
      graft.ml.Zip.summary(s, m).orderBy("name")
    },
    None
  )

  // ---- T117: MAP@k + MRR@k ranking metrics (FULL oracle — integer
  // rank arithmetic via keyed windows, TREC min(R, k) AP denominator,
  // the only floats are the final rationals) -----------------------------
  val q319 = Q(
    "q319_map_mrr",
    (s, dir) =>
      graft.ml.Eval.mapMrr(
        Tables.documents(s, dir)
          .withColumn("rel", (col("lang") === "en").cast("int")),
        "source", "n_chars", "rel", "doc_id", k = 10)
        .orderBy("source"),
    Some(
      """WITH r AS (SELECT source, doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
        |    row_number() OVER w AS rs,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY source ORDER BY n_chars DESC, doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS relcum
        |  FROM documents
        |  WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id)),
        |g AS (SELECT source, count(*)::BIGINT AS n_results,
        |    sum(rel)::BIGINT AS nrel,
        |    sum(CASE WHEN rs <= 10 AND rel = 1
        |          THEN relcum::DOUBLE / rs::DOUBLE END) AS apnum,
        |    min(CASE WHEN rs <= 10 AND rel = 1 THEN rs END) AS firstrel
        |  FROM r GROUP BY 1)
        |SELECT source, n_results, nrel AS n_relevant,
        |  floor((CASE WHEN nrel > 0
        |    THEN coalesce(apnum, 0.0)/least(nrel, 10)::DOUBLE
        |    ELSE 0.0 END)*1e6 + 0.5)/1e6 AS ap,
        |  floor(coalesce(1.0/firstrel::DOUBLE, 0.0)*1e6 + 0.5)/1e6 AS rr
        |FROM g ORDER BY source""".stripMargin
    )
  )

  // ---- Z22: stratified survey mean with FPC (FULL oracle — one
  // sample groupBy + population-count join, strata-sized windows;
  // deterministic modulo sample) ----------------------------------------
  val q320 = Q(
    "q320_survey_mean",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val pop = cust.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_pop"))
      val sample = cust.where(col("c_custkey") % 7 === 0)
      graft.ops.Survey.stratifiedMean(sample, pop, "c_nationkey", "c_acctbal")
        .orderBy("c_nationkey")
    },
    Some(
      """WITH pop AS (SELECT c_nationkey, count(*)::DOUBLE AS np
        |  FROM customer GROUP BY 1),
        |per AS (SELECT c_nationkey, count(*)::DOUBLE AS ns,
        |    sum(c_acctbal) AS sy, sum(c_acctbal*c_acctbal) AS syy
        |  FROM customer WHERE c_custkey % 7 = 0 GROUP BY 1),
        |j AS (SELECT pop.c_nationkey, np, ns, sy, syy
        |  FROM pop LEFT JOIN per USING (c_nationkey)),
        |t AS (SELECT sum(np) AS ntot,
        |    max(CASE WHEN ns IS NULL OR ns < 2 THEN 1 ELSE 0 END) AS miss
        |  FROM j),
        |o AS (SELECT
        |    sum((np/(SELECT ntot FROM t))*(sy/ns)) AS om,
        |    sqrt(sum(CASE WHEN ns >= 2 THEN
        |      (np/(SELECT ntot FROM t))*(np/(SELECT ntot FROM t))
        |        *(1.0 - ns/np)
        |        *((syy - sy*sy/ns)/(ns - 1.0))/ns END)) AS ose
        |  FROM j)
        |SELECT j.c_nationkey,
        |  coalesce(ns, 0.0)::BIGINT AS n_sample,
        |  np::BIGINT AS n_pop,
        |  floor((np/(SELECT ntot FROM t))*1e6 + 0.5)/1e6 AS w,
        |  floor((sy/ns)*1e6 + 0.5)/1e6 AS mean,
        |  CASE WHEN (SELECT miss FROM t) = 0
        |    THEN floor((SELECT om FROM o)*1e6 + 0.5)/1e6 END AS mean_stratified,
        |  CASE WHEN (SELECT miss FROM t) = 0
        |    THEN floor((SELECT ose FROM o)*1e6 + 0.5)/1e6 END AS se_fpc,
        |  CASE WHEN (SELECT miss FROM t) = 0
        |    THEN floor(((SELECT om FROM o) - 1.959964*(SELECT ose FROM o))*1e6 + 0.5)/1e6
        |    END AS ci_lo,
        |  CASE WHEN (SELECT miss FROM t) = 0
        |    THEN floor(((SELECT om FROM o) + 1.959964*(SELECT ose FROM o))*1e6 + 0.5)/1e6
        |    END AS ci_hi
        |FROM j ORDER BY c_nationkey""".stripMargin
    )
  )

  // ---- P27: Matryoshka (MRL) truncated-tier ANN shortlist (FULL
  // oracle — q25's replay restricted to the leading 16 dims; cosine
  // over truncated raw slices, no renormalization needed) ----------------
  val q321 = Q(
    "q321_matryoshka_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.Embed.matryoshkaTopK(
        emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", d = 16, k = 5)
    },
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |f16 AS (SELECT * FROM f WHERE i < 16),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f16 GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
        |      FROM f16 a JOIN f16 b ON a.i = b.i AND a.vec_id < 10
        |        AND b.vec_id <> a.vec_id
        |      GROUP BY 1, 2),
        |c AS (SELECT qid, nid, dot/(na.nrm*nb.nrm) AS cos FROM d
        |      JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid),
        |r AS (SELECT qid, nid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        |      FROM c)
        |SELECT qid, nid, round(cos, 4) AS cos_sim FROM r WHERE rk <= 5""".stripMargin
    )
  )

  // ---- P28: mutual-kNN pairs (FULL oracle — both directions' brute
  // top-5 replayed with q25's windows, reciprocal join, id-ordered) ------
  val q322 = Q(
    "q322_mutual_knn",
    (s, dir) =>
      graft.sim.Cosine.mutualKnn(Tables.embeddings(s, dir), "vec_id", "embedding", k = 5)
        .orderBy("id_a", "id_b"),
    Some(
      """WITH f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v*b.v) AS dot
        |      FROM f a JOIN f b ON a.i = b.i AND b.vec_id <> a.vec_id
        |      GROUP BY 1, 2),
        |c AS (SELECT qid, nid, dot/(na.nrm*nb.nrm) AS cos FROM d
        |      JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid),
        |r AS (SELECT qid, nid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        |      FROM c),
        |tk AS (SELECT qid, nid, cos FROM r WHERE rk <= 5)
        |SELECT a.qid AS id_a, a.nid AS id_b, round(a.cos, 4) AS cos_sim
        |FROM tk a JOIN tk b ON a.qid = b.nid AND a.nid = b.qid
        |WHERE a.qid < a.nid
        |ORDER BY id_a, id_b""".stripMargin
    )
  )

  // ---- X5: video frame-sampling near-dup (rows+spec: DuckDB cannot
  // decode PNG frames; VideoSpec pins planted duplicate classes, the
  // stride/audit semantics, and the hot-bucket cap). Videos are built
  // EXECUTOR-SIDE from per-source document ids — real binary payloads
  // through the real container/codec path ------------------------------
  val q323 = Q(
    "q323_video_neardup",
    (s, dir) => {
      import s.implicits._
      import graft.media.{Multimodal, VideoDedup}
      val docs = Tables.documents(s, dir).select(col("source"), col("doc_id"))
      val vids = docs.as[(String, Long)].groupByKey(_._1).flatMapGroups {
        (src: String, it: Iterator[(String, Long)]) =>
          val ids = it.map(_._2).toSeq.sorted.take(8)
          if (ids.size < 8) Iterator.empty
          else {
            // per source: a base cut, a re-cut sharing 6 of 8 frames
            // (sampled overlap 3/4), and unrelated footage
            def png(seed: Long) = Multimodal.encodePng(32, 32, seed)
            val vbase = (src.hashCode & 0x7FFFFFFF).toLong * 100L
            Iterator(
              VideoDedup.VideoRow(vbase,
                VideoDedup.encodeVideo(ids.map(png))),
              VideoDedup.VideoRow(vbase + 1,
                VideoDedup.encodeVideo(
                  ids.take(6).map(png) ++ ids.drop(6).map(i => png(i + 1000000007L)))),
              VideoDedup.VideoRow(vbase + 2,
                VideoDedup.encodeVideo(ids.map(i => png(i + 2000000011L)))))
          }
      }
      graft.media.VideoDedup.nearDup(vids, stride = 2, maxHamming = 3, minOverlap = 0.6)
        .orderBy("id_a", "id_b")
    },
    None
  )

  // ---- X6: audio fingerprint near-dup (rows-only: WAV decode +
  // block-energy fingerprints have no SQL form; AudioSpec pins gain
  // invariance, stride-trim collision, the silent-class cap, and
  // fingerprint determinism) -------------------------------------------

  val q330 = Q(
    "q330_audio_neardup",
    (s, dir) => {
      import s.implicits._
      import graft.media.{AudioDedup, Multimodal}
      val docs = Tables.documents(s, dir).select("doc_id")
        .where(col("doc_id") < 1000)
      val recordings = docs.as[Long].map { id =>
        val cls = (id % 50L).toInt
        val payload =
          if (id % 17 == 0) ("not audio " + id).getBytes("UTF-8") // undecodable
          else {
            // class-specific beat envelope; per-member gain varies —
            // same-class members are gain-changed copies (near-dups)
            val gain = 1.0 / (1 + (id / 50L) % 3).toDouble
            val f = 200.0 + 17.0 * cls
            Multimodal.encodeWavMix(4096, 8000, Seq(
              (f, 9000.0 * gain), (f + 5.0 + cls % 3, 9000.0 * gain),
              (2.3 * f, 4000.0 * gain)))
          }
        Multimodal.MediaRow(id, "audio", payload, 0, 0)
      }
      AudioDedup.nearDup(recordings, minOverlap = 0.5)
        .orderBy("id_a", "id_b")
    },
    None
  )

  // ---- T119: Heaps'-law vocabulary-growth fit (FULL oracle — doc
  // ranks/cumulative token counts are exact integers on both engines,
  // first-occurrence ranks one grouped min, checkpoint vocab an m-sized
  // fold, and the log-log OLS replays the same Cramer closed form) -----

  val q331 = Q(
    "q331_heaps_law",
    (s, dir) =>
      graft.text.Heaps.fit(Tables.documents(s, dir), "text", "doc_id", checkpoints = 8),
    Some(
      """WITH pd AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS ntok
        |            FROM documents),
        |r AS (SELECT doc_id, ntok,
        |        row_number() OVER (ORDER BY doc_id) AS rank,
        |        sum(ntok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |          AS cum_tok
        |      FROM pd),
        |dd AS (SELECT max(rank)::BIGINT AS d FROM r),
        |ck AS (SELECT j, (d*j + 7)//8 AS rj
        |       FROM generate_series(1, 8) AS t(j), dd),
        |nj AS (SELECT ck.j, r.cum_tok AS n FROM ck JOIN r ON r.rank = ck.rj),
        |fr AS (SELECT token, min(rank) AS first_rank
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents) t
        |       JOIN r USING (doc_id)
        |       WHERE len(token) > 0 GROUP BY 1),
        |vj AS (SELECT ck.j, count(*) AS v
        |       FROM ck JOIN fr ON fr.first_rank <= ck.rj GROUP BY 1),
        |l AS (SELECT ln(n::DOUBLE) AS x, ln(v::DOUBLE) AS y
        |      FROM nj JOIN vj USING (j)),
        |s AS (SELECT count(*)::DOUBLE AS m, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(x*y) AS sxy FROM l),
        |b AS (SELECT (m*sxy - sx*sy)/(m*sxx - sx*sx) AS beta, s.* FROM s),
        |f AS (SELECT beta, (sy - beta*sx)/m AS logk FROM b)
        |SELECT floor(beta*1e6 + 0.5)/1e6 AS beta,
        |  floor(logk*1e6 + 0.5)/1e6 AS log_k,
        |  floor(exp(logk)*1e6 + 0.5)/1e6 AS k_coef,
        |  8::INT AS n_checkpoints,
        |  (SELECT max(cum_tok)::BIGINT FROM r) AS total_tokens,
        |  (SELECT count(*)::BIGINT FROM fr) AS total_vocab
        |FROM f""".stripMargin
    )
  )

  // ---- T120: Good–Turing / Chao1 corpus coverage (FULL oracle —
  // frequency-of-frequencies and every closed form are exact integer
  // arithmetic until the final divisions) ------------------------------

  val q332 = Q(
    "q332_coverage",
    (s, dir) =>
      graft.text.Heaps.coverage(Tables.documents(s, dir), "text", "doc_id"),
    Some(
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |cts AS (SELECT tok, count(*)::BIGINT AS c FROM toks
        |        WHERE len(tok) > 0 GROUP BY 1),
        |fof AS (SELECT c, count(*)::BIGINT AS n_r FROM cts GROUP BY 1),
        |agg AS (SELECT sum(c*n_r)::BIGINT AS n, sum(n_r)::BIGINT AS v,
        |    coalesce(sum(CASE WHEN c = 1 THEN n_r END), 0)::BIGINT AS n1,
        |    coalesce(sum(CASE WHEN c = 2 THEN n_r END), 0)::BIGINT AS n2
        |  FROM fof)
        |SELECT n AS n_tokens, v AS vocab, n1, n2,
        |  floor((n1::DOUBLE/n)*1e6 + 0.5)/1e6 AS p_unseen,
        |  floor((1.0 - n1::DOUBLE/n)*1e6 + 0.5)/1e6 AS coverage,
        |  CASE WHEN n2 > 0
        |    THEN floor((v + n1::DOUBLE*n1/(2.0*n2))*1e6 + 0.5)/1e6 END AS chao1,
        |  floor((v + n1::DOUBLE*(n1 - 1.0)/(2.0*(n2 + 1.0)))*1e6 + 0.5)/1e6
        |    AS chao1_bc
        |FROM agg""".stripMargin
    )
  )

  // ---- P44: farthest-point k-center sampling (FULL oracle — the
  // greedy loop as a recursive CTE whose single state row CARRIES the
  // chosen set as lists; per step the min-distance per vector comes
  // from a lateral unnest of the center list joined through the q97
  // component frame, and the argmax replays the (dist DESC, id ASC)
  // struct order; selection gaps probed) -------------------------------

  val q333 = Q(
    "q333_fps_sample",
    (s, dir) =>
      graft.sim.Fps.sample(Tables.embeddings(s, dir), "vec_id", "embedding", k = 6),
    Some(
      """WITH RECURSIVE f AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS x,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |cset AS (
        |  SELECT 1 AS it,
        |    [(SELECT min(vec_id) FROM embeddings)] AS cids,
        |    [0.0::DOUBLE] AS mds
        |  UNION ALL
        |  SELECT it + 1, list_append(cids, vec_id), list_append(mds, md)
        |  FROM (
        |    SELECT s3.*,
        |      row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
        |    FROM (
        |      SELECT DISTINCT it, cids, mds, vec_id,
        |        min(d) OVER (PARTITION BY vec_id) AS md
        |      FROM (
        |        SELECT DISTINCT q.it, q.cids, q.mds, fv.vec_id, c.cid,
        |          sum((fv.x - fc.x)*(fv.x - fc.x))
        |            OVER (PARTITION BY fv.vec_id, c.cid) AS d
        |        FROM cset q,
        |             unnest(q.cids) AS c(cid),
        |             f fc, f fv
        |        WHERE q.it < 6 AND fc.vec_id = c.cid AND fv.i = fc.i
        |          AND NOT list_contains(q.cids, fv.vec_id)
        |      ) s2
        |    ) s3
        |  ) s4
        |  WHERE rn = 1
        |),
        |fin AS (SELECT cids, mds FROM cset WHERE it = 6),
        |ex AS (SELECT unnest(cids) AS id, unnest(mds) AS md,
        |         generate_subscripts(cids, 1) AS sel_order FROM fin)
        |SELECT sel_order::INT AS sel_order, id::BIGINT AS id,
        |  floor(md*1e4 + 0.5)/1e4 AS min_dist
        |FROM ex ORDER BY sel_order""".stripMargin
    )
  )

  // ---- P45: moment-based MMD embedding drift (FULL oracle — means and
  // second-moment matrices via the q97 component frame, Frobenius inner
  // products by an (i, j) join, all closed forms; V-statistic
  // convention documented) ---------------------------------------------

  val q337 = Q(
    "q337_mmd_drift",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.sim.Embed.mmdDrift(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1), "embedding")
    },
    Some(
      """WITH f AS (
        |  SELECT vec_id, vec_id % 2 AS side, unnest(embedding)::DOUBLE AS x,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |nn AS (SELECT side, count(DISTINCT vec_id)::BIGINT AS n
        |       FROM f GROUP BY 1),
        |mu AS (SELECT side, i, sum(x)/(SELECT n FROM nn WHERE nn.side = f.side)
        |         AS m FROM f GROUP BY side, i),
        |sm AS (SELECT a.side, a.i AS i, b.i AS j,
        |         sum(a.x*b.x)/(SELECT n FROM nn WHERE nn.side = a.side) AS m
        |       FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.side = b.side
        |       GROUP BY 1, 2, 3),
        |lin AS (SELECT sum((a.m - b.m)*(a.m - b.m)) AS v
        |        FROM mu a JOIN mu b ON a.i = b.i AND a.side = 0 AND b.side = 1),
        |dots AS (SELECT
        |    (SELECT sum(a.m*b.m) FROM mu a JOIN mu b ON a.i = b.i
        |       AND a.side = 0 AND b.side = 0) AS daa,
        |    (SELECT sum(a.m*b.m) FROM mu a JOIN mu b ON a.i = b.i
        |       AND a.side = 1 AND b.side = 1) AS dbb,
        |    (SELECT sum(a.m*b.m) FROM mu a JOIN mu b ON a.i = b.i
        |       AND a.side = 0 AND b.side = 1) AS dab),
        |frobs AS (SELECT
        |    (SELECT sum(a.m*b.m) FROM sm a JOIN sm b ON a.i = b.i AND a.j = b.j
        |       AND a.side = 0 AND b.side = 0) AS faa,
        |    (SELECT sum(a.m*b.m) FROM sm a JOIN sm b ON a.i = b.i AND a.j = b.j
        |       AND a.side = 1 AND b.side = 1) AS fbb,
        |    (SELECT sum(a.m*b.m) FROM sm a JOIN sm b ON a.i = b.i AND a.j = b.j
        |       AND a.side = 0 AND b.side = 1) AS fab)
        |SELECT (SELECT n FROM nn WHERE side = 0) AS n_a,
        |  (SELECT n FROM nn WHERE side = 1) AS n_b,
        |  floor(lin.v*1e6 + 0.5)/1e6 AS mmd2_lin,
        |  floor(sqrt(lin.v)*1e6 + 0.5)/1e6 AS mean_shift_l2,
        |  floor(((faa + 2.0*daa + 1.0) + (fbb + 2.0*dbb + 1.0)
        |    - 2.0*(fab + 2.0*dab + 1.0))*1e6 + 0.5)/1e6 AS mmd2_quad
        |FROM lin, dots, frobs""".stripMargin
    )
  )

  val all: Seq[Q] =
    Seq(q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q39, q40,
      q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q54, q55, q56, q57, q58, q60, q61, q62,
      q63, q64, q65, q66, q67, q69, q71, q72, q73, q75, q76, q77, q78, q81, q82, q83, q84, q85,
      q86, q87, q88, q89, q92, q93, q95, q96, q97, q98, q99, q100, q101, q102, q103, q104, q105,
      q106, q107, q108, q109, q110, q111, q112, q113, q114, q115, q116, q117, q118, q119, q120, q121, q122, q123, q124, q125, q126, q127, q128, q129, q130, q131, q132, q133, q134, q135, q136, q137, q138, q139, q140, q141, q142, q143,
      q151, q152, q153, q154, q155, q160, q161, q162, q166, q167, q168, q169, q170, q171, q172, q173, q174, q175, q176, q177, q178, q179, q180, q181, q182, q183, q184, q185, q186, q187, q188, q189, q190, q191, q192, q193, q194, q195, q196, q197, q198, q199, q200, q201, q202, q203, q204, q205, q206, q207, q208, q209, q210, q211, q212, q213, q214, q215, q216, q217, q218, q219, q220, q221, q222, q223, q224, q225, q226, q227, q228, q229, q230, q231, q232, q233, q234, q235, q236, q237, q238, q239, q240, q241, q242, q243, q244, q245, q246, q247, q248, q249, q250, q251, q252, q253, q254, q255, q256, q257, q258, q259, q260, q261, q262, q263, q264, q265, q266, q267, q268, q269, q270, q271, q272, q273, q274, q275, q276,
      q277, q278, q279, q280, q281, q282, q283, q284, q285, q286, q287, q288, q289, q290,
      q291, q292, q293, q294, q295, q296, q297, q298, q299, q300, q301, q302, q306, q307, q308, q309, q312, q313, q315,
      q319, q320, q321, q322, q323, q324, q330, q331, q332, q333, q337)
}
