package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming compilation of the event operators
  * (SURVEY.md §2 S4): the same tumbling-window aggregate as
  * [[EventOps.hourlyAgg]], expressed with `window()` + a watermark so it
  * runs incrementally with bounded state on an unbounded stream.
  */
object EventStream {

  /** Streaming scan of an events parquet path. The file schema is taken
    * from a batch read (streaming sources need an explicit schema); the
    * nanosecond ts column is normalized exactly like the batch path.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema: StructType = spark.read.parquet(path).schema
    graft.util.Tables.normalizeTs(spark.readStream.schema(fileSchema).parquet(path))
  }

  /** Custom stateful sessionization via flatMapGroupsWithState
    * (SURVEY.md §2 S4): per-user state carries the open session's
    * (index, count, sum, last event time) across micro-batches; events
    * in a batch are gap-split exactly like the batch
    * [[EventOps.sessionize]]. Sessions are emitted as soon as observed
    * (including the still-open one) — a production pipeline would emit
    * only on close via event-time timeout; this keeps single-batch
    * parity with the batch operator testable.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    case class SessState(session: Long, lastMs: Long)

    val typed = events
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ts_ms", "value")
      .as[(Long, Long, Long, Double)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Double)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (userId: Long, rows: Iterator[(Long, Long, Long, Double)], state: GroupState[(Long, Long)]) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var (session, lastMs) = state.getOption.getOrElse((0L, Long.MinValue))
        val bySession = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Double)]
        for ((_, _, tsMs, value) <- sorted) {
          if (lastMs == Long.MinValue || tsMs - lastMs > gapMs) session += 1
          lastMs = tsMs
          val (n, sum) = bySession.getOrElse(session, (0L, 0.0))
          bySession(session) = (n + 1, sum + value)
        }
        state.update((session, lastMs))
        bySession.iterator.map { case (s, (n, sum)) => (userId, s, n, sum) }
      }
      .toDF("user_id", "session", "n_events", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 4))
  }

  /** Production-shaped sessionization: sessions are emitted ONLY when
    * they close — either an in-batch gap splits them, or the event-time
    * watermark passes the open session's gap deadline
    * (`GroupStateTimeout.EventTimeTimeout`). Late events beyond the
    * watermark are dropped by the watermark itself; state is bounded by
    * the number of users with an open session.
    */
  def sessionizeStreamOnClose(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "10 minutes"
  ): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    // the WATERMARKED ts column must flow into flatMapGroupsWithState
    // unchanged — projecting it through unix_millis() strips the
    // event-time tag and Spark rejects EventTimeTimeout
    val typed = events
      .withWatermark("ts", watermark)
      .selectExpr("user_id", "event_id", "ts", "value")
      .as[(Long, Long, java.sql.Timestamp, Double)]

    typed
      .groupByKey(_._1)
      // state: (session index, last event ms, open-session count, open-session sum)
      .flatMapGroupsWithState[(Long, Long, Long, Double), (Long, Long, Long, Double)](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (userId: Long,
           rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
           state: GroupState[(Long, Long, Long, Double)]) =>
        if (state.hasTimedOut) {
          // watermark passed lastMs + gap: the open session is final
          val (session, _, n, sum) = state.get
          state.remove()
          Iterator.single((userId, session, n, sum))
        } else {
          val sorted = rows.map(r => (r._1, r._2, r._3.getTime, r._4)).toSeq.sortBy(r => (r._3, r._2))
          var (session, lastMs, n, sum) = state.getOption.getOrElse((0L, Long.MinValue, 0L, 0.0))
          val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
          for ((_, _, tsMs, value) <- sorted) {
            if (lastMs == Long.MinValue || tsMs - lastMs > gapMs) {
              if (n > 0) closed += ((userId, session, n, sum))
              session += 1; n = 0L; sum = 0.0
            }
            lastMs = tsMs
            n += 1; sum += value
          }
          state.update((session, lastMs, n, sum))
          // the deadline must sit strictly past the current watermark or
          // Spark rejects it (a gap that already expired fires next batch)
          val deadline = math.max(lastMs + gapMs, state.getCurrentWatermarkMs() + 1L)
          state.setTimeoutTimestamp(deadline)
          closed.iterator
        }
      }
      .toDF("user_id", "session", "n_events", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 4))
  }

  /** Streaming exact dedup: keep the FIRST occurrence of each key,
    * with state bounded by the event-time watermark horizon (a plain
    * `dropDuplicates` would keep every key ever seen — unbounded state
    * on an unbounded stream). The batch analogue is
    * [[graft.dedup.Exact]]; a streaming ingest pipeline runs this
    * before the expensive fuzzy-dedup passes.
    */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "1 hour"
  ): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)

  /** Watermarked tumbling-window aggregate; append-safe output. */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("ws"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )

  /** Streaming ordered funnel — the online [[graft.ops.Funnel]]: per
    * user, state = (stage, t_first, t_done), advanced by each
    * micro-batch's events sorted by the SAME (ts, step) tie rule the
    * batch fold uses. Emits every user's current funnel row per
    * trigger.
    *
    * Guarantee: equal to the batch `userFunnel` ROW-FOR-ROW when each
    * user's events arrive timestamp-ordered ACROSS batches (the
    * per-key-ordered source assumption, e.g. a Kafka partition per
    * user). The funnel stage only advances, so an out-of-order EARLIER
    * event cannot be retro-fitted — streams that violate per-key order
    * need the batch form over a corrected log; stated here rather than
    * silently approximated.
    */
  def funnelStream(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .select(
        col(userCol).cast("long"),
        col(typeCol).cast("string"),
        col(tsCol).cast("timestamp"))
      .as[(Long, String, java.sql.Timestamp)]
      .filter(e => stepIdx.contains(e._2))
      .groupByKey(_._1)
      .mapGroupsWithState[(Int, java.sql.Timestamp, java.sql.Timestamp),
        (Long, Int, java.sql.Timestamp, java.sql.Timestamp)](
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        val zero = new java.sql.Timestamp(0L)
        var (stage, t1, td) = state.getOption.getOrElse((0, zero, zero))
        // full-microsecond ordering: Timestamp.getTime is millis only
        def micros(t: java.sql.Timestamp): Long =
          (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
        val sorted = rows.toArray.sortBy(e => (micros(e._3), stepIdx(e._2)))
        sorted.foreach { case (_, tp, ts) =>
          if (stage < steps.length && stepIdx(tp) == stage) {
            if (stage == 0) t1 = ts
            td = ts
            stage += 1
          }
        }
        state.update((stage, t1, td))
        (user, stage, t1, td)
      }
      .toDF(userCol, "steps_completed", "t_first", "t_done")
      .where(col("steps_completed") > 0)
  }

  /** Stream-stream interval join (S24): attribute each click to every
    * impression of the same user within `windowMinutes` BEFORE it —
    * the canonical two-stream workload (ad attribution, request/
    * response pairing, order/shipment matching). BOTH sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire join state: without the interval bound the
    * engine must hold every impression forever (unbounded state — the
    * failure mode this operator exists to avoid). Inner join: matches
    * emit as soon as both sides arrive; pass `joinType = "leftOuter"`
    * to also emit watermark-expired unmatched impressions with null
    * click columns.
    */
  def attributionJoin(
      impressions: DataFrame,
      clicks: DataFrame,
      userCol: String,
      tsCol: String,
      windowMinutes: Int = 30,
      watermark: String = "1 hour",
      joinType: String = "inner"
  ): DataFrame = {
    val imp = impressions
      .withWatermark(tsCol, watermark)
      .select(
        col(userCol).as("user"),
        col(tsCol).as("imp_ts"))
    val clk = clicks
      .withWatermark(tsCol, watermark)
      .select(
        col(userCol).as("c_user"),
        col(tsCol).as("click_ts"))
    imp
      .join(
        clk,
        col("user") === col("c_user") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .select(
        col("user"),
        col("imp_ts"),
        col("click_ts"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts"))).as("lag_seconds"))
  }

  /** Streaming per-key EWMA spike monitor (S27) — the live form of
    * [[graft.ops.Ewma.smooth]]: state is ONE double per key (the last
    * smoothed level), each micro-batch folds its rows in (ts, tie)
    * order and emits every row with its ewma/resid/spike. Same
    * per-key-ordered arrival guarantee as [[funnelStream]] (S21b):
    * rows must not arrive across batches out of event order within a
    * key — the batch parity spec pins that contract, and within a
    * batch the fold sorts. Identical IEEE recurrence as batch, so
    * multi-batch output ≡ the batch operator row-for-row.
    */
  def ewmaStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double,
      delta: Double): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col(keyCol).cast("long"),
        col(tsCol).cast("timestamp"),
        col(tieCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Boolean, Double),
        (Long, Long, Double, Double, Option[Double], Boolean)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        def micros(t: java.sql.Timestamp): Long =
          (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
        var (has, s) = state.getOption.getOrElse((false, 0.0))
        val out = rows.toArray.sortBy(e => (micros(e._2), e._3)).map {
          case (_, _, tie, v) =>
            val resid = if (has) Some(v - s) else None
            s = if (has) alpha * v + (1.0 - alpha) * s else v
            has = true
            (key, tie,
              v,
              math.floor(s * 1e6 + 0.5) / 1e6,
              resid.map(r => math.floor(r * 1e6 + 0.5) / 1e6),
              resid.exists(r => math.abs(r) > delta))
        }
        state.update((has, s))
        out.iterator
      }
      .toDF(keyCol, tieCol, valueCol, "ewma", "resid", "spike")
  }

  /** Streaming per-key CUSUM mean-shift monitor (S28) — the live form
    * of [[graft.ops.Changepoint.cusum]] in its control-chart reading:
    * the baseline (per-key μ, σ — yesterday's corpus, joined
    * broadcast) is FIXED, state is the two accumulators per key, each
    * micro-batch folds rows in (ts, tie) order through the textbook
    * recursion C⁺ = max(0, C⁺ + v − μ − kσ), C⁻ = max(0, C⁻ + μ − v −
    * kσ). The batch operator's prefix-sum identity equals this
    * recursion exactly in real arithmetic and to summation-order ulps
    * in floats (the identity subtracts two accumulated prefix sums
    * where the recursion re-accumulates from each reset), so a stream
    * fed the batch's own μ/σ reproduces the batch output to 1e-9
    * across any micro-batch split (the spec pins it). Same
    * in-order-arrival contract as [[ewmaStream]].
    */
  def cusumStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      baseline: DataFrame, // (keyCol, mu, sigma)
      kSigma: Double = 0.5,
      hSigma: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .join(broadcast(baseline), Seq(keyCol))
      .select(
        col(keyCol).cast("long"),
        col(tsCol).cast("timestamp"),
        col(tieCol).cast("long"),
        col(valueCol).cast("double"),
        col("mu").cast("double"),
        col("sigma").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double),
        (Long, Long, Double, Double, Double, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        def micros(t: java.sql.Timestamp): Long =
          (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
        var (cp, cn) = state.getOption.getOrElse((0.0, 0.0))
        val out = rows.toArray.sortBy(e => (micros(e._2), e._3)).map {
          case (_, _, tie, v, mu, sigma) =>
            cp = math.max(0.0, cp + v - mu - kSigma * sigma)
            cn = math.max(0.0, cn + mu - v - kSigma * sigma)
            val cpQ = q6(cp); val cnQ = q6(cn)
            val alarm =
              if (sigma > 0 && (cpQ > hSigma * sigma || cnQ > hSigma * sigma)) 1L else 0L
            (key, tie, v, cpQ, cnQ, alarm)
        }
        state.update((cp, cn))
        out.iterator
      }
      .toDF(keyCol, tieCol, valueCol, "cusum_pos", "cusum_neg", "alarm")
  }

  /** Streaming per-key Page–Hinkley drift detector (S33) — the live
    * fold of [[graft.ops.Changepoint.pageHinkley]]: unlike
    * [[cusumStream]] there is NO baseline join — the reference level is
    * the running mean, carried in state, so the monitor self-calibrates
    * from the first row it sees. State per key is six doubles
    * (n, Σx, m↑, min m↑, m↓, min m↓); each micro-batch folds rows in
    * (ts, tie) order through the identical arithmetic the batch
    * operator's prefix windows evaluate (running sum ÷ count, then the
    * deviation sums), so multi-batch output ≡ batch row-for-row (the
    * parity spec pins it). Same in-order-arrival contract as
    * [[ewmaStream]].
    */
  def pageHinkleyStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      delta: Double,
      lambda: Double): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6 // batch parity
    events
      .select(
        col(keyCol).cast("long"),
        col(tsCol).cast("timestamp"),
        col(tieCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double, Double, Double, Double),
        (Long, Long, Double, Double, Double, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        def micros(t: java.sql.Timestamp): Long =
          (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
        var (n, sumX, mUp, minUp, mDn, minDn) =
          state.getOption.getOrElse((0L, 0.0, 0.0, Double.MaxValue, 0.0, Double.MaxValue))
        val out = rows.toArray.sortBy(e => (micros(e._2), e._3)).map {
          case (_, _, tie, v) =>
            n += 1L; sumX += v
            val dev = v - sumX / n
            mUp += dev - delta
            mDn += -dev - delta
            minUp = math.min(minUp, mUp)
            minDn = math.min(minDn, mDn)
            val phUp = q6(mUp - minUp); val phDn = q6(mDn - minDn)
            val alarm = if (phUp > lambda || phDn > lambda) 1L else 0L
            (key, tie, v, phUp, phDn, alarm)
        }
        state.update((n, sumX, mUp, minUp, mDn, minDn))
        out.iterator
      }
      .toDF(keyCol, tieCol, valueCol, "ph_up", "ph_dn", "alarm")
  }

  /** Streaming last-touch attribution (S35) — the live form of
    * [[graft.ops.Attribution.credit]]'s last-touch model: state is ONE
    * (channel, ts-micros, touch-id) triple per user (the latest touch
    * seen), each micro-batch folds its rows in (ts, tie) order, and
    * every conversion emits the channel of the newest touch at-or-
    * before it within `lookbackSec` (same-instant touch counts, the
    * batch tie convention: latest ts wins, ties by HIGHEST touch id —
    * matching the batch `rd` ordering). Conversions with no touch in
    * the window emit a null channel (counted, not dropped). Same
    * per-key in-order-arrival contract as [[ewmaStream]]; within a
    * batch the fold sorts.
    */
  def lastTouchStream(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      lookbackSec: Long): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    val touchSet = touchTypes.toSet
    val lookbackUs = lookbackSec * 1000000L
    events
      .select(
        col(userCol).cast("long"),
        col(tsCol).cast("timestamp"),
        col(idCol).cast("long"),
        col(typeCol).cast("string"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long, Long),
        (Long, Long, Long, Option[String], Option[Long])](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        def micros(t: java.sql.Timestamp): Long =
          (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
        var last = state.getOption // (channel, tsUs, touchId)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Option[String], Option[Long])]
        // (ts, isConversion, id): all touches at instant T fold BEFORE
        // conversions at T, so a same-microsecond touch counts no matter
        // how its id compares to the conversion's — exactly the batch
        // operator's time-only filter (__dt >= 0). A plain (ts, id) sort
        // would miss a same-instant touch whose id exceeds the
        // conversion's.
        rows.toArray
          .sortBy(e => (micros(e._2), if (e._4 == conversionType) 1 else 0, e._3))
          .foreach {
          case (_, t, id, tpe) =>
            val us = micros(t)
            if (touchSet(tpe)) {
              // latest ts wins; same-instant ties to the HIGHER id (batch rd order)
              if (last.forall(s => us > s._2 || (us == s._2 && id > s._3)))
                last = Some((tpe, us, id))
            } else if (tpe == conversionType) {
              val hit = last.filter(s => us - s._2 >= 0L && us - s._2 <= lookbackUs)
              out += ((user, id, us, hit.map(_._1), hit.map(_._3)))
            }
        }
        last.foreach(state.update)
        out.iterator
      }
      .toDF(userCol, "conv_id", "conv_ts_us", "channel", "touch_id")
  }
}
