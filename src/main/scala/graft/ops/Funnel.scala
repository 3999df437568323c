package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — "how far through
  * signup → view → click → purchase does each user get, in order?" —
  * the classic product-analytics query, with strict sequential
  * semantics: step k counts only at the FIRST qualifying event at or
  * after the time step k−1 completed.
  *
  * Scale shape: filter to funnel-type events (predicate pushed to the
  * scan), ONE groupBy(user) collecting the sorted (ts, step) list, and
  * a per-user fold (`aggregate` HOF) that walks the funnel — one
  * shuffle total, versus the k sequential join-aggregate rounds the
  * naive form runs. Per-user state is that user's funnel events only.
  *
  * Tie rule: events at the SAME timestamp are consumed in step order
  * (earlier funnel steps first), which makes the fold equivalent to
  * the sequential-minimum definition t_k = min{ts ≥ t_{k−1}, type =
  * step_k} — the form the DuckDB oracle replays; a planted spec pins
  * the equality on the tie case itself.
  */
object Funnel {

  /** (userCol, steps_completed, t_first, t_done) — t_done is the
    * completion time of the furthest step reached; users with no
    * step-1 event are absent (count them from the base table).
    */
  def userFunnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val stepIdx = steps.zipWithIndex.toMap
    val idx = steps.foldLeft(lit(-1)) { (acc, s) =>
      when(col(typeCol) === s, lit(stepIdx(s))).otherwise(acc)
    }
    val ev = events
      .where(col(typeCol).isin(steps: _*))
      .select(
        col(userCol),
        struct(col(tsCol).cast("timestamp").as("ts"), idx.as("step")).as("e"))
    // fold state: (stage reached so far, ts of first step-1, ts of last
    // advance); events sorted by (ts, step) — struct order — so ties
    // consume earlier steps first
    val folded = ev
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .withColumn(
        "st",
        aggregate(
          col("es"),
          struct(lit(0).as("stage"),
            lit(null).cast("timestamp").as("t1"),
            lit(null).cast("timestamp").as("td")),
          (st, e) =>
            when(
              st.getField("stage") < steps.length &&
                e.getField("step") === st.getField("stage"),
              struct(
                (st.getField("stage") + 1).as("stage"),
                coalesce(st.getField("t1"), e.getField("ts")).as("t1"),
                e.getField("ts").as("td")))
              .otherwise(st)))
    folded
      .where(col("st.stage") > 0)
      .select(
        col(userCol),
        col("st.stage").as("steps_completed"),
        col("st.t1").as("t_first"),
        col("st.td").as("t_done"))
  }

  /** Per-step funnel summary: users reaching step k (in order) and the
    * conversion rate vs step 1, 4dp.
    */
  def conversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val uf = userFunnel(events, userCol, typeCol, tsCol, steps)
    val perStage = uf.groupBy(col("steps_completed")).agg(count(lit(1)).as("n"))
    val stepFrame = steps.indices.map(i => (i + 1, steps(i))).toDF("step", "step_name")
    // users at step k = users whose steps_completed >= k
    val summary = stepFrame
      .join(broadcast(perStage), col("steps_completed") >= col("step"), "left")
      .groupBy("step", "step_name")
      .agg(coalesce(sum("n"), lit(0L)).as("users"))
    val base = summary.where(col("step") === 1)
      .select(col("users").as("__base"))
    summary
      .crossJoin(broadcast(base))
      .withColumn(
        "conv_rate",
        when(col("__base") > 0,
          round(col("users").cast("double") / col("__base").cast("double"), 4))
          .otherwise(lit(0.0)))
      .drop("__base")
  }
}
