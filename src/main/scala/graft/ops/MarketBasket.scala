package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules over (basket, item) rows — the
  * support/confidence/lift core of market-basket analysis (Agrawal
  * 1993), which is also the "what co-occurs with what" primitive for
  * corpus curation (tags per document, domains per user, parts per
  * order). Full FP-growth is unnecessary for the pairwise tier that
  * dominates practical use; pairs come from ONE self-equi-join on the
  * basket key over the DISTINCT (basket, item) frame — quadratic only
  * in per-basket cardinality (the standard market-basket shape), never
  * in corpus size — and every statistic is an integer-count closed
  * form: support = n_ab/N, confidence = n_ab/n_a, lift = N·n_ab/(n_a·n_b).
  */
object MarketBasket {

  /** One row per unordered item pair with ≥ `minSupport` joint baskets:
    * (item_a, item_b, n_ab, n_a, n_b, n_baskets, support, conf_a_to_b,
    * conf_b_to_a, lift), item_a < item_b.
    */
  def pairRules(
      df: DataFrame,
      basket: String,
      item: String,
      minSupport: Long = 2L
  ): DataFrame = {
    // one exchange on the basket key, then: the dedup aggregate runs on
    // hash(b) without another exchange (b ⊆ (b,i)), the frame is sorted
    // + checkpointed with its layout pinned, and the pair self-join is
    // co-partitioned AND pre-sorted — zero Exchange, zero Sort (the
    // former shape exchanged both self-join sides; opt guide §2.4).
    // All statistics are integer counts — order-free, bit-identical.
    val bi = org.apache.spark.sql.graftbridge.Bridge.staticCheckpointKeyed(
      df.select(col(basket).cast("string").as("b"), col(item).cast("string").as("i"))
        .repartition(col("b"))
        .dropDuplicates("b", "i")
        .sortWithinPartitions("b", "i"))
    val nBaskets = bi.select("b").distinct().count()
    val itemCounts = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))

    val pairs = bi.as("l")
      .join(bi.as("r"), col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)

    val out = pairs
      .join(broadcast(itemCounts.withColumnRenamed("i", "item_a").withColumnRenamed("n_i", "n_a")), Seq("item_a"))
      .join(broadcast(itemCounts.withColumnRenamed("i", "item_b").withColumnRenamed("n_i", "n_b")), Seq("item_b"))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        lit(nBaskets).as("n_baskets"),
        round(col("n_ab").cast("double") / lit(nBaskets.toDouble), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6).as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b").cast("double"), 6).as("conf_b_to_a"),
        round(lit(nBaskets.toDouble) * col("n_ab").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
    // bi is a checkpoint leaf the returned lazy frame still reads — its
    // blocks are released by the harness once the query's action is done
    out
  }
}
