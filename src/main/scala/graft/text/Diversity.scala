package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-n lexical diversity per corpus stratum (Li et al. 2016's
  * distinct-1/distinct-2, corpus-level): the ratio of DISTINCT token
  * n-grams to TOTAL n-gram occurrences within each group. The
  * generation-diversity / template-collapse gauge — a source whose
  * distinct-2 craters is emitting boilerplate, which dedup (P-family)
  * then confirms; tracked per ingest source it catches the collapse a
  * scalar token count misses.
  *
  * Scale shape per n: one row-local shingling pass, then a single
  * groupBy(group) carrying count + approx-free distinct via a
  * (group, gram)-keyed pre-aggregate — two shuffles, both on 8-byte
  * hashed gram keys (`gramHash`), never on gram strings. Exact counts
  * (no sketch): distinct-n is a RATIO of like magnitudes, and the HLL
  * ±2% noise would swamp the drift signal the metric exists to catch;
  * the [[Vocab.strataProfile]] sketch covers the dashboard case.
  */
object Diversity {

  /** One row per group: n_docs, total tokens, and for each n in `ns`
    * the total gram occurrences, distinct grams, and their 4dp ratio.
    */
  def distinctN(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      ns: Seq[Int] = Seq(1, 2),
      gramHash: Column => Column = xxhash64(_)
  ): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = df.select(col(groupCol).as("g"), toks.as("t"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_docs"), sum(size(col("t"))).as("n_tokens"))

    ns.foldLeft(base) { (acc, n) =>
      val grams = df.select(
        col(groupCol).as("g"),
        explode(
          when(
            size(toks) >= n,
            transform(
              sequence(lit(0), size(toks) - n),
              i => gramHash(concat_ws(" ", slice(toks, i + 1, lit(n))))))
            .otherwise(array(gramHash(col(textCol))))).as("gram"))
      // (g, gram) pre-aggregate: map-side combine collapses repeats
      // before the exchange, and the distinct is then a plain count
      val perGram = grams.groupBy("g", "gram").agg(count(lit(1)).as("c"))
      val stats = perGram.groupBy("g").agg(
        sum("c").as(s"grams_$n"),
        count(lit(1)).as(s"distinct_$n"))
      acc.join(stats, Seq("g"))
        .withColumn(
          s"d$n",
          round(col(s"distinct_$n").cast("double") / col(s"grams_$n").cast("double"), 4))
    }.withColumnRenamed("g", groupCol)
  }
}
