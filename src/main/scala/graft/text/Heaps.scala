package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heaps'-law vocabulary-growth fit V(N) = K·N^β (Heaps 1978) — the
  * corpus-growth companion of the Zipf rank-frequency slope (SURVEY §2
  * T119 beside T13's q114): how fast does the vocabulary grow as the
  * corpus grows? β ≈ 0.4–0.6 for natural text; template/boilerplate
  * corpora flatten (β → 0) and OCR-noise or ID-heavy corpora inflate
  * (β → 1) — a one-number dedup/quality gauge, and the capacity dial
  * for tokenizer-vocab and hash-embedding sizing at 100 TB.
  *
  * Scale shape: per-doc token counts + ONE distributed prefix pass in
  * id order ([[graft.ops.Rank.withPrefixSums]] — never a
  * single-partition window) give each doc its rank and cumulative
  * token count; each token's FIRST-occurrence rank is one
  * (token)-grouped min; vocabulary at the m prefix checkpoints is an
  * m-sized histogram fold — the corpus is scanned twice (counts,
  * explode), everything downstream is checkpoint-sized. The log-log
  * OLS is a driver closed form over m points.
  */
object Heaps {

  /** One row: beta (the Heaps exponent), log_k, k_coef = exp(log_k),
    * n_checkpoints, total_tokens, total_vocab. Checkpoints are the
    * cumulative corpus prefixes at doc ranks ceil(D·j/m), j = 1..m in
    * `idCol` order (a DOCUMENTED deterministic convention — Heaps fits
    * need an ordering; shuffled corpora give the same asymptote with
    * different small-prefix noise). Tokens are whitespace splits;
    * empty-string tokens count toward N (the `size(split(..))`
    * convention shared with the oracle) but not toward the vocabulary.
    */
  def fit(
      df: DataFrame,
      textCol: String,
      idCol: String,
      checkpoints: Int = 8): DataFrame = {
    require(checkpoints >= 2, "Heaps.fit: need at least 2 checkpoints")
    val spark = df.sparkSession
    val perDoc = df.select(
      col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("ntok"),
      lit(1L).as("one"))
    val cum = graft.ops.Rank
      .withPrefixSums(perDoc, Seq(col("id")), Seq("ntok", "one"))
      .select(col("id"), col("__cum_ntok").as("cum_tok"), col("__cum_one").as("rank"))
      .localCheckpoint(true) // read thrice: totals, checkpoint rows, rank join
    val dRow = cum.agg(max(col("rank")), max(col("cum_tok"))).head()
    val d = dRow.getLong(0)
    val totalTokens = dRow.getLong(1)
    require(d >= checkpoints, s"Heaps.fit: need >= $checkpoints docs, got $d")
    val rjs = (1 to checkpoints).map(j => (d * j + checkpoints - 1) / checkpoints)
    // cumulative token count at each checkpoint rank — m rows collected
    val njByRank = cum.where(col("rank").isin(rjs.distinct: _*))
      .select(col("rank"), col("cum_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each token's first-occurrence rank, folded into the m-bucket
    // histogram row-locally (smallest j whose checkpoint covers it)
    val bucket: Column = rjs.zipWithIndex.foldRight(lit(checkpoints + 1): Column) {
      case ((rj, i), acc) => when(col("first_rank") <= rj, lit(i + 1)).otherwise(acc)
    }
    val hist = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .join(cum.select(col("id"), col("rank")), Seq("id"))
      .groupBy(col("tok")).agg(min(col("rank")).as("first_rank"))
      .withColumn("b", bucket)
      .groupBy(col("b")).agg(count(lit(1)).as("nv"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val vjs = rjs.indices.scanLeft(0L)((acc, i) => acc + hist.getOrElse(i + 1, 0L)).tail
    // R_m = D covers every token, so the overflow bucket is always empty
    val totalVocab = vjs.last
    require(vjs.head > 0, "Heaps.fit: first checkpoint has no vocabulary")
    // log-log OLS over the m checkpoints, Cramer closed form (the
    // dickeyFuller convention — the oracle replays the same arithmetic)
    val xs = rjs.indices.map(i => math.log(njByRank(rjs(i)).toDouble))
    val ys = rjs.indices.map(i => math.log(vjs(i).toDouble))
    val m = checkpoints.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val det = m * sxx - sx * sx
    require(det > 0, "Heaps.fit: degenerate checkpoint spacing")
    val beta = (m * sxy - sx * sy) / det
    val logK = (sy - beta * sx) / m
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(beta), q6(logK), q6(math.exp(logK)), checkpoints, totalTokens, totalVocab))
      .toDF("beta", "log_k", "k_coef", "n_checkpoints", "total_tokens", "total_vocab")
  }

  /** Good–Turing / Chao1 corpus-coverage estimates — "how much
    * vocabulary is left to see?", the asymptote question next to
    * [[fit]]'s growth-rate one: the Good–Turing unseen probability
    * mass P₀ = n₁/N (Good 1953 — the chance the NEXT token is a new
    * type), sample coverage Ĉ = 1 − P₀ (Turing/Gale), and the Chao1
    * richness lower bound V̂ = V + n₁²/(2n₂) (Chao 1984 — how many
    * types exist including the unseen ones; the classic bias-corrected
    * form n₁(n₁−1)/(2(n₂+1)) is emitted too, defined even at n₂ = 0).
    *
    * Scale shape: one (token) count aggregate → one frequency-of-
    * frequencies aggregate (output is max-count-sized) → closed forms;
    * the corpus is scanned once.
    */
  def coverage(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val fof = counts.groupBy(col("c")).agg(count(lit(1)).as("n_r"))
    val row = fof.agg(
      sum(col("c") * col("n_r")).as("n_tokens"),
      sum(col("n_r")).as("vocab"),
      coalesce(sum(when(col("c") === 1, col("n_r"))), lit(0L)).as("n1"),
      coalesce(sum(when(col("c") === 2, col("n_r"))), lit(0L)).as("n2")).head()
    val n = row.getAs[Long]("n_tokens")
    val v = row.getAs[Long]("vocab")
    val n1 = row.getAs[Long]("n1")
    val n2 = row.getAs[Long]("n2")
    require(n > 0, "Heaps.coverage: empty corpus")
    val p0 = n1.toDouble / n
    val chao1 = if (n2 > 0) v + n1.toDouble * n1 / (2.0 * n2) else Double.NaN
    val chao1Bc = v + n1.toDouble * (n1 - 1.0) / (2.0 * (n2 + 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    Seq((n, v, n1, n2, q6(p0), q6(1.0 - p0),
      if (chao1.isNaN) None else Some(q6(chao1)), q6(chao1Bc)))
      .toDF("n_tokens", "vocab", "n1", "n2", "p_unseen", "coverage",
        "chao1", "chao1_bc")
  }
}
