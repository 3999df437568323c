package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity partitioning (Wenzek et al. 2020): score every
  * document against a target-domain n-gram LM ([[NgramLm]] — in CCNet a
  * Wikipedia-trained KenLM), cut the corpus at perplexity quantiles, and
  * label each document's bucket (`head` = lowest perplexity, i.e. most
  * target-like). Downstream pipelines mix buckets at chosen rates or
  * drop the tail outright.
  *
  * Scale shape (100 TB): the cut points come from the corpus's
  * distinct-perplexity HISTOGRAM — one scoring pass aggregated down to
  * the 2-decimal perplexity grid (bounded by the ppl range, not the
  * corpus), cumulative-summed on that tiny frame, reduced to ONE row of
  * cut values that broadcast-joins back onto the scored stream for a
  * row-local CASE. No global sort of the corpus, no window over it, no
  * driver-side collect of anything corpus-sized. The cut rule is the
  * exact order statistic — `min(ppl : cumCount >= ceil(phi * n))` — so
  * a DuckDB oracle can replay it verbatim (q98), unlike an
  * approx-sketch cut. Corpora whose ppl spread makes even the 2dp
  * histogram heavy should fall back to the sketch path the DSIR
  * selector uses ([[Dsir.selectFraction]]); the bucket SEMANTICS stay
  * identical.
  *
  * Like [[Dsir.selectFraction]], the scored frame is deliberately NOT
  * persisted: scoring runs once for the histogram and once when the
  * caller consumes the result — two scans beat silently parking a
  * corpus-sized frame in the session cache (the Bm25 lifecycle lesson).
  */
object PplBuckets {

  /** Bucket every document by LM perplexity at `fractions` quantile
    * cuts. Returns (idCol, n_tokens, ppl, bucket); `labels` must have
    * one more entry than `fractions`. Cut j is the smallest perplexity
    * whose cumulative document count reaches `ceil(fractions(j) * n)`;
    * a document lands in the first bucket whose cut its (2dp-rounded)
    * perplexity does not exceed.
    */
  def bucket(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      model: NgramLm.Model,
      fractions: Seq[Double] = Seq(1.0 / 3.0, 2.0 / 3.0),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      oovCount: Double = 0.5
  ): DataFrame = {
    require(labels.size == fractions.size + 1,
      s"need ${fractions.size + 1} labels for ${fractions.size} cuts, got ${labels.size}")
    require(fractions.nonEmpty && fractions == fractions.sorted &&
      fractions.head > 0.0 && fractions.last < 1.0,
      s"fractions must be sorted within (0, 1), got $fractions")

    val scored = NgramLm.score(docs, textCol, idCol, model, oovCount)

    // distinct-ppl histogram: tiny by construction (score() rounds ppl
    // to 2dp), so the unpartitioned running-sum window is over a frame
    // of at most (ppl range / 0.01) rows, never the corpus
    val hist = scored.groupBy(col("ppl")).agg(count(lit(1)).as("__c"))
    val cumW = Window.orderBy(col("ppl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(cumW))
    val tot = hist.agg(sum(col("__c")).cast("double").as("__n"))

    // ONE row of cut values; ceil(phi * n) on doubles so the DuckDB
    // replay computes bit-identical ranks from the same literals
    val cutCols = fractions.zipWithIndex.map { case (phi, j) =>
      min(when(col("__cum") >= ceil(lit(phi) * col("__n")), col("ppl"))).as(s"__cut$j")
    }
    val cuts = cum.crossJoin(broadcast(tot)).agg(cutCols.head, cutCols.tail: _*)

    val bucketCol: Column = fractions.indices
      .foldRight(lit(labels.last): Column) { (j, rest) =>
        when(col("ppl") <= col(s"__cut$j"), lit(labels(j))).otherwise(rest)
      }

    scored
      .crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_tokens"), col("ppl"), bucketCol.as("bucket"))
  }
}
