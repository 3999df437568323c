package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh

/** Streaming document-pipeline operators: the batch decontamination /
  * span-audit semantics ([[graft.dedup.SpanDedup]]) compiled for a
  * continuous ingest stream.
  *
  * The batch span pipeline shingles via posexplode + window `lead`
  * (split once, codegen) — but window functions over arbitrary keys are
  * not allowed on unbounded streams, and a span-level stream-static
  * join would need a stateful per-doc re-aggregation. Instead each
  * STREAMED row computes its own distinct sorted span-hash array
  * (per-row column algebra, stateless, append-mode), and the probe side
  * — small BY DEFINITION: it is the eval/benchmark set — is reduced to
  * ONE row carrying its sorted span-hash array and broadcast, so
  * contamination is a codegen'd sorted-merge intersect
  * ([[graft.functions.SetOps.sortedIntersectSize]]) per document. The
  * corpus stream is never shuffled and never keyed: 100 TB of backlog
  * drains at scan speed with zero state store.
  */
object DocStream {

  /** Distinct sorted xxhash64 span hashes of `textCol`, as one array
    * column — hash-identical to [[MinHashLsh.shingleHashes]] (including
    * the whole-text hash for docs shorter than `n` tokens), but built
    * row-locally: the interpreted higher-order `transform` costs more
    * CPU per token than the batch window form, the price of statelessness.
    */
  def spanArray(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    val nt = size(toks)
    val spans = transform(
      sequence(lit(0), greatest(nt - n, lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
    array_sort(array_distinct(when(nt < n, array(xxhash64(textCol))).otherwise(spans)))
  }

  /** Streaming near-duplicate detection against a STATIC historical
    * corpus — "is this incoming document a fuzzy copy of anything we
    * already have?", the ingest-time gate in front of a training-data
    * lake. Pure append mode with ZERO state store:
    *
    *  - The static side is indexed once (shingle → minhash signature →
    *    banded buckets + verify sets, the [[MinHashLsh]] pipeline) and
    *    persisted; every micro-batch joins against it.
    *  - Each streamed row computes its own signature row-locally
    *    (span hashes via [[spanArray]], then each lane's affine-
    *    permutation min over a literal coefficient array) — identical
    *    values to [[MinHashLsh.signaturesFromShingles]], pinned by
    *    `StreamingSpec`.
    *  - Candidates come from a hash join on (band, bucket) — never all
    *    pairs. A pair colliding in several bands would duplicate output
    *    rows, and streaming can't `distinct()` without state; instead
    *    each joined row carries BOTH signatures, and a row survives only
    *    if NO EARLIER band also collides — each pair emits from exactly
    *    one deterministic band.
    *  - Verification is the codegen'd sorted-set intersect against the
    *    corpus doc's shingle set, exactly like the batch verify stage.
    */
  def nearDupAgainstCorpus(
      stream: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    // ---- static index (computed once, reused every micro-batch; the
    // same frame `MinHashLsh.saveIndex` persists — see
    // [[nearDupAgainstIndex]] for the load-don't-rebuild serve path) ----
    val corpusBands = MinHashLsh
      .corpusIndex(corpus, textCol, idCol, numHashes, shingleSize, numBands, seed)
      .persist()
    serveNearDup(stream, corpusBands, textCol, idCol, threshold,
      numHashes, shingleSize, numBands, seed)
  }

  /** [[nearDupAgainstCorpus]] against a LOADED persisted index
    * ([[MinHashLsh.loadIndex]]): a fresh ingest session gates against
    * yesterday's corpus without a single corpus pass. The stream side
    * hashes row-locally with xxhash64 ([[spanArray]]), so the index
    * must have been built with the same gram hash.
    */
  def nearDupAgainstIndex(
      stream: DataFrame,
      idx: MinHashLsh.Index,
      textCol: String,
      idCol: String,
      threshold: Double
  ): DataFrame = {
    require(
      idx.gramHashName == "xxhash64",
      s"streaming serve hashes row-locally with xxhash64; index was built with '${idx.gramHashName}'")
    serveNearDup(stream, idx.bands, textCol, idCol, threshold,
      idx.numHashes, idx.shingleSize, idx.numBands, idx.seed)
  }

  private def serveNearDup(
      stream: DataFrame,
      corpusBands: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int,
      shingleSize: Int,
      numBands: Int,
      seed: Long
  ): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val coefs = MinHashLsh.coefficients(numHashes, seed)
    val prime = 2147483647L

    // ---- per-row signature on the stream side ----
    val aLit = lit(coefs.map(_._1).toArray)
    val bLit = lit(coefs.map(_._2).toArray)
    val withSig = stream
      .withColumn("__spans", spanArray(col(textCol), shingleSize))
      .withColumn(
        "__sig",
        transform(
          sequence(lit(0), lit(numHashes - 1)),
          i =>
            array_min(
              transform(
                col("__spans"),
                h => pmod(element_at(aLit, i + 1) * pmod(h, lit(prime)) + element_at(bLit, i + 1), lit(prime))))))
    val streamBands = withSig.select(
      col(idCol),
      col("__spans"),
      col("__sig"),
      posexplode(array((0 until numBands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64(concat_ws(",", slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
      }: _*)).as(Seq("__pos", "bb")))
      .select(col(idCol), col("__spans"), col("__sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // ---- candidate join + first-matching-band dedup + verify ----
    val sliceEq = (b: Column) =>
      slice(col("__sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand)) ===
        slice(col("corpus_sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))
    // NB sequence(0, band-1) would be DESCENDING for band=0 (Spark infers
    // step -1); filter a constant 0..numBands-1 range instead
    streamBands
      .join(corpusBands, Seq("band", "bucket"))
      .where(size(filter(
        sequence(lit(0), lit(numBands - 1)),
        b => b < col("band") && sliceEq(b))) === 0)
      .withColumn(
        "inter",
        graft.functions.SetOps.sortedIntersectSize(col("__spans"), col("corpus_set")).cast("double"))
      .withColumn(
        "jaccard",
        round(col("inter") / (size(col("__spans")) + size(col("corpus_set")) - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select(col(idCol), col("corpus_id"), col("jaccard"))
  }

  /** Row-local form of [[graft.text.Repetition.stats]]: identical
    * `n_tokens` / `frac_top_token` / `frac_unique` / `frac_top_bigram`
    * values (pinned by `StreamingSpec`), but computed per row with array
    * algebra instead of posexplode + window + groupBy — window functions
    * over arbitrary keys are not allowed on unbounded streams. The
    * interpreted HOF counting costs O(unique × tokens) CPU per document
    * (the [[spanArray]] trade: CPU per row is the price of
    * statelessness); the batch form stays the corpus-scale choice.
    */
  def withRowLocalRepetition(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val topTok =
      array_max(transform(array_distinct(toks), t => size(filter(toks, x => x === t))))
    val bis = transform(
      sequence(lit(1), greatest(n - 1, lit(0))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val topBi = when(n < 2, lit(0.0)).otherwise(
      array_max(transform(array_distinct(bis), b => size(filter(bis, x => x === b))))
        .cast("double") / (n - 1))
    df.withColumn("n_tokens", n.cast("long"))
      .withColumn("frac_top_token", topTok.cast("double") / n)
      .withColumn("frac_unique", size(array_distinct(toks)).cast("double") / n)
      .withColumn("frac_top_bigram", topBi)
  }

  /** The ingest-time QUALITY GATE every training pipeline runs, as one
    * stateless append-mode stream: heuristic quality score
    * ([[graft.text.TextStats.withQuality]]), language ID
    * ([[graft.text.LangId.withLangId]]) and Gopher/C4 repetition filters
    * ([[withRowLocalRepetition]]) composed into a single codegen'd
    * filter over the micro-batch — no state store, no shuffle, no
    * watermark; 100 TB of backlog drains at scan speed. Diagnostic
    * columns stay on the output so the reject stream can be audited by
    * routing the complement (`gate = false` rows) elsewhere.
    *
    * Batch/stream parity is pinned by `StreamingSpec`: the same rows
    * through the batch composition (quality + langid + Repetition.stats
    * join) keep exactly the same ids.
    */
  def qualityGateStream(
      stream: DataFrame,
      textCol: String,
      minQuality: Double = 0.5,
      maxFracTopToken: Double = 0.2,
      minFracUnique: Double = 0.3,
      maxFracTopBigram: Double = 0.2,
      allowedLangs: Seq[String] = Seq("en")
  ): DataFrame = {
    val scored = withRowLocalRepetition(
      graft.text.LangId.withLangId(
        graft.text.TextStats.withQuality(stream, textCol), textCol),
      textCol)
    scored.where(
      col("quality") >= minQuality &&
        col("frac_top_token") <= maxFracTopToken &&
        col("frac_unique") >= minFracUnique &&
        col("frac_top_bigram") <= maxFracTopBigram &&
        col("pred_lang").isin(allowedLangs: _*))
  }

  /** S31: streaming HTML extraction gate — [[graft.text.Extract]] at
    * the stream's front door: each arriving raw-HTML document is
    * extracted (row-local regex/HOF algebra — stateless, so it streams
    * with NO state store and no watermark), and kept when the extracted
    * body clears `minBodyWords` and is not flagged malformed (malformed
    * rows route to the complement, the flagged-not-failed convention).
    * The natural upstream of [[qualityGateStream]]; batch/stream parity
    * is exact by construction and pinned by `StreamingSpec`.
    */
  def extractGateStream(
      stream: DataFrame,
      htmlCol: String,
      idCol: String,
      minBodyWords: Int = 10,
      dropMalformed: Boolean = false
  ): DataFrame = {
    // the ROW-LOCAL extraction variant: no posexplode/groupBy, so the
    // stream carries no aggregation state at all
    val extracted = graft.text.Extract.fromHtmlRowLocal(stream, htmlCol, idCol)
    val bodyWords = when(col("body_text") === "", 0)
      .otherwise(size(split(col("body_text"), " ")))
    val keep = bodyWords >= minBodyWords &&
      (!lit(dropMalformed) || col("malformed") === 0L)
    extracted.where(keep)
  }

  /** S17: streaming DSIR importance gate — the online form of
    * [[graft.text.Dsir]]: each arriving document is scored
    * log w = Σ_tokens (log p_tgt − log p_bg) against two STATIC
    * stupid-backoff LMs (train once batch-side, persist via
    * [[graft.text.NgramLm.saveModel]], load in the serving session) and
    * kept when log_w ≥ `minLogW` — the threshold a batch
    * [[graft.text.Dsir.selectFraction]] calibration produces, so the
    * stream admits "documents the batch selection would have kept" as
    * the corpus grows.
    *
    * Scale shape: the per-token lookups are stream–static broadcast
    * joins against the vocabulary-sized count frames (LM totals are
    * driver scalars read once at plan-build); the per-document reduce is
    * a [[org.apache.spark.sql.streaming.GroupState]]-free
    * `flatMapGroupsWithState` that aggregates the micro-batch's token
    * rows per doc and emits immediately — no retained state, no
    * watermark (a document is one input row, so its tokens never span a
    * trigger). Output: (idCol, n_tokens, log_w), append-mode safe.
    *
    * Per-token probabilities follow [[graft.text.NgramLm.score]]'s
    * backoff cases exactly; parity with the batch
    * [[graft.text.Dsir.logWeights]] is pinned by `StreamingSpec`.
    */
  def dsirGateStream(
      stream: DataFrame,
      textCol: String,
      idCol: String,
      target: graft.text.NgramLm.Model,
      background: graft.text.NgramLm.Model,
      minLogW: Double,
      oovCount: Double = 0.5
  ): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    // the typed per-doc reduce keys on a long id; a non-integral id
    // column would either die per-batch under ANSI or (ANSI off) cast
    // every id to null and collapse the whole corpus into one bogus
    // group — fail loudly instead (hash/map string ids upstream)
    require(
      {
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        Seq(ByteType, ShortType, IntegerType, LongType).contains(stream.schema(idCol).dataType)
      },
      s"dsirGateStream needs an integral id column; '$idCol' is " +
        s"${stream.schema(idCol).dataType.simpleString}")
    val tTot = target.totalDf.head().getDouble(0)
    val bTot = background.totalDf.head().getDouble(0)

    val toks = stream
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "token")), col("__toks"))
      .withColumn("prev", when(col("pos") >= 1, element_at(col("__toks"), col("pos"))))
      .drop("__toks")

    def joined(base: DataFrame, m: graft.text.NgramLm.Model, tag: String): DataFrame =
      base
        .join(broadcast(m.uni.select(col("token"), col("c1").as(s"__c1t_$tag"))),
          Seq("token"), "left")
        .join(broadcast(m.uni.select(col("token").as("prev"), col("c1").as(s"__c1p_$tag"))),
          Seq("prev"), "left")
        .join(broadcast(m.bi.select(col("prev"), col("token"), col("c2").as(s"__c2_$tag"))),
          Seq("prev", "token"), "left")

    def logp(m: graft.text.NgramLm.Model, tag: String, total: Double): Column = {
      val cu = coalesce(col(s"__c1t_$tag").cast("double"), lit(oovCount))
      when(col("pos") === 0, log(cu / total))
        .otherwise(
          when(col(s"__c2_$tag").isNotNull,
            log(col(s"__c2_$tag").cast("double") / col(s"__c1p_$tag")))
            .otherwise(log(lit(m.alpha) * cu / total)))
    }

    val lr = joined(joined(toks, target, "t"), background, "b")
      .withColumn("__lr", logp(target, "t", tTot) - logp(background, "b", bTot))
      .select(col(idCol).cast("long").as("__id"), col("__lr"))
      .as[(Long, Double)]

    lr.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Double)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (id: Long, rows: Iterator[(Long, Double)], _: GroupState[Boolean]) =>
        var n = 0L
        var s = 0.0
        rows.foreach { r => n += 1; s += r._2 }
        Iterator((id, n, s))
      }
      .toDF(idCol, "n_tokens", "log_w")
      .where(col("log_w") >= minLogW)
  }

  /** Streaming CDC boilerplate gate (S18): chunk each streamed document
    * with the SAME content-defined boundary rule as
    * [[graft.dedup.CdcChunks]] — row-local HOFs reproduce identical cut
    * positions, chunk offsets, and 60-bit chunk hashes (pinned by
    * `StreamingSpec` against the batch chunker) — then stream-static
    * join the chunk hashes against a static corpus
    * [[graft.dedup.CdcChunks.hashIndex]] (corpus-sized: joined, never
    * broadcast) and reassemble the per-document dup share with a
    * state-free `flatMapGroupsWithState` (a document's chunk rows ride
    * one micro-batch, so no state crosses batches — the S17 pattern).
    * Emits (idCol, n_chunks, dup_chunks, dup_chars, n_chars, dup_share)
    * for documents whose share of corpus-known chars stays BELOW
    * `maxDupShare`; mostly-boilerplate documents are gated out. Empty
    * documents are dropped (the batch chunker yields no rows for them).
    */
  def cdcGateStream(
      stream: DataFrame,
      corpusIndex: DataFrame,
      textCol: String,
      idCol: String,
      maxDupShare: Double = 0.5,
      window: Int = 8,
      divisor: Int = 32
  ): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    require(
      {
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        Seq(ByteType, ShortType, IntegerType, LongType).contains(stream.schema(idCol).dataType)
      },
      s"cdcGateStream needs an integral id column; '$idCol' is " +
        s"${stream.schema(idCol).dataType.simpleString}")
    val n = length(col(textCol))
    val w = window
    val hash60 = graft.functions.SharedHash.md5Long60 _
    // cut candidates w..n-1, guarded: Spark's sequence() runs DESCENDING
    // when stop < start (same guard as the batch chunker)
    val cutsArr = when(
      n >= w + 1,
      filter(
        sequence(lit(w), n - 1),
        i => hash60(col(textCol).substr(i - (w - 1), lit(w))) % divisor === 0))
      .otherwise(array().cast("array<int>"))
    val bounds = transform(
      sequence(lit(0), size(col("__cuts"))),
      j =>
        struct(
          when(j === 0, 1).otherwise(element_at(col("__cuts"), j) + 1).as("s"),
          when(j === size(col("__cuts")), n).otherwise(element_at(col("__cuts"), j + 1)).as("e")))
    val chunkArr = transform(
      bounds,
      b =>
        struct(
          (b("e") - b("s") + 1).as("len"),
          hash60(col(textCol).substr(b("s"), b("e") - b("s") + 1)).as("hash")))

    val chunkRows = stream
      .where(n >= 1)
      .withColumn("__cuts", cutsArr)
      .select(col(idCol), posexplode(chunkArr).as(Seq("__ci", "__ck")))
      .select(col(idCol).cast("long").as("__id"),
        col("__ck.len").as("__len"), col("__ck.hash").as("__h"))
      .join(
        corpusIndex.select(col("chunk_hash").as("__h"), lit(1).as("__hit")), Seq("__h"), "left")
      .select(col("__id"), col("__len"), col("__hit").isNotNull.as("__dup"))
      .as[(Long, Int, Boolean)]

    chunkRows
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (id: Long, rows: Iterator[(Long, Int, Boolean)], _: GroupState[Boolean]) =>
        var nc = 0L; var dc = 0L; var chars = 0L; var dchars = 0L
        rows.foreach { r =>
          nc += 1; chars += r._2
          if (r._3) { dc += 1; dchars += r._2 }
        }
        Iterator((id, nc, dc, dchars, chars))
      }
      .toDF(idCol, "n_chunks", "dup_chunks", "dup_chars", "n_chars")
      .withColumn("dup_share", round(col("dup_chars").cast("double") / col("n_chars"), 4))
      .where(col("dup_share") < maxDupShare)
  }

  /** Per streamed document: `n_spans` distinct n-token spans and
    * `n_hits` of them appearing anywhere in the static `probe` set —
    * the streaming form of [[graft.dedup.SpanDedup.contamination]]
    * (identical output on identical rows; pinned by `StreamingSpec`).
    * Filter `n_hits = 0` downstream to keep only clean documents.
    */
  def contaminationStream(
      stream: DataFrame,
      probe: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8
  ): DataFrame = {
    val probeSpans = broadcast(
      MinHashLsh
        .shingleHashes(probe, textCol, idCol, n)
        .agg(sort_array(collect_set(col("sh"))).as("__probe"))
        .withColumn("__j", lit(1)))
    stream
      .withColumn("__spans", spanArray(col(textCol), n))
      .withColumn("__j", lit(1))
      .join(probeSpans, Seq("__j"))
      .select(
        col(idCol),
        size(col("__spans")).cast("long").as("n_spans"),
        graft.functions.SetOps
          .sortedIntersectSize(col("__spans"), col("__probe"))
          .cast("long")
          .as("n_hits"))
  }

  /** Streaming VARIABLE-LENGTH decontamination — the q76 criterion
    * ([[graft.dedup.RepeatedSpans]]: any shared span of ≥ `minLen`
    * tokens) at ingest. Same zero-state shape as
    * [[contaminationStream]]: the probe corpus's span-start fingerprint
    * keys fold into ONE sorted broadcast array; each streamed row
    * computes its own doubling-fingerprint keys ROW-LOCALLY
    * (`RepeatedSpans.fingerprintKeys` — the window chain re-expressed
    * inside the token array, identical hash values) and counts hits
    * with the codegen'd sorted-merge intersect. `n_spans` counts the
    * row's DISTINCT ≥minLen span fingerprints; `n_hits > 0` means the
    * doc shares a ≥minLen token run with the probe set and must not
    * reach training.
    */
  def longSpanContaminationStream(
      stream: DataFrame,
      probe: DataFrame,
      textCol: String,
      idCol: String,
      minLen: Int = 50
  ): DataFrame = {
    val probeFps = broadcast(
      graft.dedup.RepeatedSpans
        .probeFingerprints(probe, textCol, minLen)
        .agg(sort_array(collect_set(col("fp"))).as("__probe"))
        .withColumn("__j", lit(1)))
    stream
      .withColumn(
        "__fps", graft.dedup.RepeatedSpans.fingerprintKeys(col(textCol), minLen))
      .withColumn("__j", lit(1))
      .join(probeFps, Seq("__j"))
      .select(
        col(idCol),
        size(col("__fps")).cast("long").as("n_spans"),
        graft.functions.SetOps
          .sortedIntersectSize(col("__fps"), col("__probe"))
          .cast("long")
          .as("n_hits"))
  }

  /** Continuous per-stratum frequent-token telemetry (S15): the
    * Misra–Gries counters ([[graft.functions.MisraGries]] — the same
    * moves as the batch T17 sketch) carried as `mapGroupsWithState`
    * state, updated with each micro-batch's tokens, emitting the
    * current (stratum, tokens-so-far, candidate list) every trigger.
    * MG is a one-pass streaming algorithm, so the containment guarantee
    * is LIVE at every emission: any token whose frequency over
    * everything ingested so far exceeds n/(capacity+1) is in the
    * candidate list, with its counter undershooting by at most that
    * bound (candidate CONTENTS may vary with arrival order; the
    * guarantee does not — pinned by `StreamingSpec`). State per stratum
    * is ≤ capacity counters, forever. Run the batch
    * [[graft.text.Vocab.heavyHitters]] exact pass over the accumulated
    * corpus whenever the dashboard needs verified counts.
    */
  /** Streaming per-stratum Count-Min sketch — S19, the online form of
    * [[graft.text.Vocab.cmsSketch]] (T29). State is the depth·width
    * counter array + token total per stratum, updated through the SAME
    * [[graft.functions.CountMinAgg.updateCells]] the batch aggregate
    * uses; because CMS counters add element-wise, the streamed sketch
    * CONTENT equals the batch sketch bit-for-bit on any batch split
    * (stronger than S15's containment-only parity — the spec asserts
    * cell equality). Emits the current sketch every trigger; point
    * queries go through [[graft.functions.CmsQuery]] on the emitted
    * frame. State size is fixed (depth·width longs per stratum)
    * forever, the S15 argument.
    */
  def cmsStream(
      stream: DataFrame,
      textCol: String,
      strataCol: String,
      width: Int,
      depth: Int,
      seed: Long,
      tokenHash: Column => Column
  ): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = stream.sparkSession
    import spark.implicits._
    val coefs = MinHashLsh.coefficients(depth, seed)
    stream
      .select(
        col(strataCol).cast("string"),
        transform(split(col(textCol), " "), tokenHash).as("hs"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapGroupsWithState[(Seq[Long], Long), (String, Long, Seq[Long])](
        GroupStateTimeout.NoTimeout) { (stratum, rows, state) =>
        val (c0, n0) = state.getOption.getOrElse((Seq.fill(depth * width)(0L), 0L))
        val cells = c0.toArray
        var n = n0
        rows.foreach(_._2.foreach { h =>
          graft.functions.CountMinAgg.updateCells(cells, h, width, coefs); n += 1
        })
        val out = cells.toSeq
        state.update((out, n))
        (stratum, n, out)
      }
      .toDF(strataCol, "n_tokens", "cms")
  }

  /** Streaming per-corpus KMV distinct-vocabulary sketch — the online
    * [[graft.text.CorpusOverlap]]: state = the k smallest distinct
    * token hashes per corpus, updated through the SAME
    * [[graft.functions.Kmv]] insert the batch aggregate uses, so the
    * streamed sketch CONTENT equals the batch sketch BIT-FOR-BIT on
    * any batch split (k smallest of a union is symmetric — the S19
    * CMS argument). Emits (corpus, kmv, n_kept, theta, distinct_est)
    * every trigger, the batch `sketches` schema, so the emitted frame
    * feeds `pairOverlap`/`saveSketches` unchanged: the live "how big
    * is each source's vocabulary, how much does today's crawl overlap"
    * dashboard. State ≤ k longs per corpus forever.
    */
  def kmvStream(
      stream: DataFrame,
      textCol: String,
      corpusCol: String,
      k: Int,
      tokenHash: Column => Column
  ): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(
        col(corpusCol).cast("string"),
        transform(split(col(textCol), " "), tokenHash).as("hs"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], (String, Seq[Long], Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (corpus, rows, state) =>
        val s = scala.collection.mutable.TreeSet.empty[Long]
        state.getOption.foreach(_.foreach(s.add))
        rows.foreach(_._2.foreach(h => graft.functions.Kmv.insert(s, h, k)))
        val kept = s.toSeq // ascending
        state.update(kept)
        val m = graft.text.CorpusOverlap.M
        val (theta, est) =
          if (kept.size >= k) {
            val t = kept.last
            // the batch column's double arithmetic, including rounding
            (t, BigDecimal((k - 1).toDouble * (m.toDouble / t.toDouble))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          } else (m, kept.size.toDouble)
        (corpus, kept, kept.size.toLong, theta, est)
      }
      .toDF(corpusCol, "kmv", "n_kept", "theta", "distinct_est")
  }

  def heavyHittersStream(
      stream: DataFrame,
      textCol: String,
      strataCol: String,
      capacity: Int = 256
  ): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(strataCol).cast("string"), split(col(textCol), " "))
      .as[(String, Seq[String])]
      .groupByKey(_._1)
      .mapGroupsWithState[(Map[String, Long], Long), (String, Long, Seq[(String, Long)])](
        GroupStateTimeout.NoTimeout) { (stratum, rows, state) =>
        val (m0, n0) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
        val m = scala.collection.mutable.HashMap.from(m0)
        var n = n0
        rows.foreach(_._2.foreach { t =>
          graft.functions.MisraGries.updateOne(m, t, capacity); n += 1
        })
        state.update((m.toMap, n))
        (stratum, n, m.toSeq.sortBy { case (t, c) => (-c, t) })
      }
      .toDF(strataCol, "n_tokens", "candidates")
  }

  /** Streaming categorical-drift gate (S22) — the categorical member of
    * the drift family ([[graft.streaming.EmbedStream.driftMonitor]]
    * embeddings, [[graft.ops.Drift.ksTest]] batch numeric): per
    * stratum, each micro-batch's category histogram is chi-square
    * tested against the RUNNING histogram, scored BEFORE the batch
    * folds into state (the driftMonitor convention — drift is measured
    * against history, so batch 1 scores 0). Expected counts
    * e_c = m·n_c/N over the categories history knows; batch rows in
    * categories history has NEVER seen carry no expected mass and are
    * reported separately as `novel_rows` (a new language code appearing
    * in an ingest feed is exactly the alarm this gate exists to raise).
    * State per stratum: the category→count map (bounded by category
    * cardinality, the [[graft.ops.Stats.chiSquare]] honest cost).
    */
  def categoryDriftMonitor(
      stream: DataFrame,
      catCol: String,
      strataCol: String,
      minHistory: Long = 50L
  ): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(strataCol).cast("string"), col(catCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], (String, Long, Long, Double, Long, Long)](
        GroupStateTimeout.NoTimeout) { (stratum, rows, state) =>
        val hist = state.getOption.getOrElse(Map.empty[String, Long])
        val nHist = hist.valuesIterator.sum
        val batch = scala.collection.mutable.HashMap.empty[String, Long]
        rows.foreach { r => batch(r._2) = batch.getOrElse(r._2, 0L) + 1L }
        val m = batch.valuesIterator.sum
        val novel = batch.filterNot { case (c, _) => hist.contains(c) }.valuesIterator.sum
        val chi2 =
          if (nHist < minHistory) 0.0
          else
            hist.iterator.map { case (c, nc) =>
              val e = m.toDouble * nc / nHist
              val o = batch.getOrElse(c, 0L).toDouble
              val d = o - e
              d * d / e
            }.sum
        val merged = (hist.keySet ++ batch.keySet).iterator
          .map(c => c -> (hist.getOrElse(c, 0L) + batch.getOrElse(c, 0L))).toMap
        state.update(merged)
        (stratum, nHist + m, m, chi2, math.max(0L, hist.size.toLong - 1L), novel)
      }
      .toDF(strataCol, "n_seen", "batch_rows", "chi2", "dof", "novel_rows")
  }
}
