package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation (statistical phrase) mining via pointwise mutual
  * information — SURVEY.md §2 T25.
  *
  * PMI(a, b) = ln( c(a,b) · N / (c(a) · c(b)) ) over adjacent token
  * pairs, the standard phrase-detection signal (Church & Hanks 1990;
  * the word2vec phrase pass of Mikolov et al. 2013 is the same score
  * minus a discount). A training-data pipeline uses it to build phrase
  * tables for tokenizer pretraining and to spot templated boilerplate
  * (a corpus whose top collocations are navigation chrome is telling
  * you something).
  *
  * Scale shape: one row-local pass builds the per-document bigram list
  * (no self-join — `transform` over token positions), then two
  * hash-aggregates (unigram and bigram counts) and two joins of the
  * bigram frame against the unigram frame. Every stage is
  * whole-stage-codegen column algebra; the only shuffles are the two
  * count aggregates and the count-to-count joins, all keyed on token
  * text. At 100 TB the unigram table is vocabulary-sized (≪ corpus);
  * AQE turns the joins into broadcasts when it fits, and the selection
  * gate is the INTEGER min-count — never a float threshold — so the
  * result set is stable across engines and runs.
  */
object Collocations {

  /** All adjacent-pair collocations with occurrence count ≥ `minCount`,
    * scored by PMI (natural log, rounded to 4 decimals). N is the total
    * token count. Deterministic: selection is on integer counts only.
    *
    * Output: prev, token, c_pair, c_prev, c_tok, pmi.
    */
  def pmi(df: DataFrame, textCol: String, minCount: Int = 5): DataFrame = {
    val toks = split(col(textCol), " ")
    // row-local adjacent pairs: struct(t[i], t[i+1]) for i in [0, n-2]
    // the >= 2 guard must precede the sequence() — Spark's sequence
    // auto-negates its step when start > stop, so sequence(0, -1) is
    // NOT empty
    val pairs = df
      .where(size(toks) >= 2)
      .select(
        explode(
          transform(
            sequence(lit(0), size(toks) - 2),
            i => struct(element_at(toks, i + 1).as("prev"), element_at(toks, i + 2).as("token"))
          )
        ).as("p")
      )
      .select(col("p.prev"), col("p.token"))

    // the unigram count table is referenced three times (total, prev
    // join, token join) — materialize it ONCE (it is vocabulary-sized,
    // not corpus-sized) or each reference re-scans the corpus
    val uni = df
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("c1"))
      .localCheckpoint()

    val bi = pairs
      .groupBy("prev", "token")
      .agg(count(lit(1)).as("c_pair"))
      .where(col("c_pair") >= minCount)

    val total = uni.agg(sum("c1").cast("double").as("n_total"))

    bi.join(uni.withColumnRenamed("token", "prev").withColumnRenamed("c1", "c_prev"), "prev")
      .join(uni.withColumnRenamed("c1", "c_tok"), "token")
      .crossJoin(broadcast(total))
      .select(
        col("prev"),
        col("token"),
        col("c_pair"),
        col("c_prev"),
        col("c_tok"),
        round(
          log(col("c_pair").cast("double") * col("n_total") /
            (col("c_prev").cast("double") * col("c_tok").cast("double"))),
          4
        ).as("pmi")
      )
  }
}
