package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — "which channel gets credit for the
  * conversion" across the five standard models in one pass: linear
  * (1/k), time-decay (exponential half-life, normalized per
  * conversion), position-based (40/20/40 U-shape), last-touch and
  * first-touch. The credit table is the marketing-mix counterpart of
  * the funnel ([[Funnel]]) and transition ([[Transitions]]) readouts.
  *
  * Scale shape: conversions join touches on the USER key (equi-join;
  * the time filter rides on top), so the shuffle is keyed by user and
  * the per-conversion windows are keyed by conversion id — per-user /
  * per-conversion cardinalities are bounded by the lookback window,
  * never corpus-sized, and nothing sorts globally. Timestamps compare
  * as integer microseconds (`unix_micros` ≡ DuckDB `epoch_us` — no
  * second-truncation drift); every weight is a closed form the oracle
  * replays, quantized 6dp only at the emitted sums.
  */
object Attribution {

  /** Per-channel credit under all five models.
    *
    * A touch attributes to a conversion of the same user when
    * `0 ≤ t_conv − t_touch ≤ lookbackSec` (a same-microsecond touch
    * counts — it is upstream-or-simultaneous, and the conversion event
    * type itself is never a touch type). Ties inside a conversion
    * break by (timestamp, touch id): the earliest touch is "first",
    * the latest "last"; with k = 1 the single touch is both. The
    * position model pays 0.4/0.4 to first/last and splits 0.2 over the
    * middle (k = 1 → 1.0, k = 2 → 0.5/0.5 — the degenerate
    * conventions made explicit).
    *
    * Returns one row per channel: `touches` (attributed touch rows),
    * `conversions` (distinct conversions the channel touched), and
    * `credit_linear/decay/position/last/first` (6dp).
    */
  def credit(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      lookbackSec: Long,
      halfLifeSec: Double): DataFrame = {
    require(!touchTypes.contains(conversionType),
      "Attribution.credit: the conversion type cannot also be a touch type")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val lookbackUs = lookbackSec * 1000000L
    val halfLifeUs = halfLifeSec * 1e6

    val conv = events
      .where(col(typeCol) === conversionType)
      .select(
        col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("__cts"),
        col(idCol).as("__cid"))
    val touch = events
      .where(col(typeCol).isin(touchTypes: _*))
      .select(
        col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("__tts"),
        col(typeCol).as("channel"),
        col(idCol).as("__tid"))

    val j = conv
      .join(touch, Seq("__u"))
      .withColumn("__dt", col("__cts") - col("__tts"))
      .where(col("__dt") >= 0L && col("__dt") <= lookbackUs)

    val byConv = Window.partitionBy("__cid")
    // earliest touch first: largest dt; ties by touch id ascending
    val firstW = Window.partitionBy("__cid").orderBy(col("__dt").desc, col("__tid").asc)
    // latest touch first: smallest dt; ties by touch id DESCENDING so a
    // two-way same-instant tie makes different touches first and last
    val lastW = Window.partitionBy("__cid").orderBy(col("__dt").asc, col("__tid").desc)

    val raw = pow(lit(2.0), -(col("__dt").cast("double") / lit(halfLifeUs)))
    val r = j
      .withColumn("__k", count(lit(1)).over(byConv))
      .withColumn("__ra", row_number().over(firstW))
      .withColumn("__rd", row_number().over(lastW))
      .withColumn("__raw", raw)
      .withColumn("__rawsum", sum(raw).over(byConv))

    val wPos = when(col("__k") === 1, lit(1.0))
      .when(col("__k") === 2, lit(0.5))
      .when(col("__ra") === 1 || col("__rd") === 1, lit(0.4))
      .otherwise(lit(0.2) / (col("__k") - lit(2)).cast("double"))

    r.groupBy("channel")
      .agg(
        count(lit(1)).as("touches"),
        countDistinct(col("__cid")).as("conversions"),
        q6(sum(lit(1.0) / col("__k").cast("double"))).as("credit_linear"),
        q6(sum(col("__raw") / col("__rawsum"))).as("credit_decay"),
        q6(sum(wPos)).as("credit_position"),
        q6(sum(when(col("__rd") === 1, lit(1.0)).otherwise(lit(0.0)))).as("credit_last"),
        q6(sum(when(col("__ra") === 1, lit(1.0)).otherwise(lit(0.0)))).as("credit_first"))
  }

  /** Markov-chain (removal-effect) attribution — the data-driven model
    * beside [[credit]]'s five heuristics (Anderl et al. 2016): user
    * journeys become a first-order chain `(start) → ch… → (conv)|(null)`,
    * and a channel's credit is its REMOVAL EFFECT — the relative drop
    * in the chain's start→conversion absorption probability when every
    * transition into that channel is redirected to `(null)`:
    * RE_c = (p − p_{−c})/p, shares normalized over channels.
    *
    * Journey construction: per user, the FIRST conversion event (by
    * (ts, id) — a total order, which a path model needs) ends the
    * journey; touches strictly before it in that order form the path,
    * in order, consecutive repeats kept (self-loops are real dwell
    * signal in a first-order chain). Converting users with no touches
    * contribute `(start)→(conv)` (baseline conversion mass no channel
    * may claim); non-converting users' paths end in `(null)`.
    *
    * Scale shape: journeys/pairs are two keyed windows over touch rows
    * (user-keyed, never global), the chain collapses to a
    * (channels+3)²-bounded transition-count aggregate — DRIVER-bounded
    * model state like every centroid/codebook in this repo — and the
    * absorption probabilities run `iters` synchronous Jacobi sweeps on
    * the driver (fixed iteration count, not a tolerance stop, so the
    * oracle's recursive-CTE replay is exactly reproducible; residual
    * decays geometrically in the non-absorption rate). Output: one row
    * per observed channel — (channel, p_conv 6dp, removal_effect 6dp,
    * share 6dp), nulls when the chain never converts.
    */
  /** Shared journey derivation for the path models: `fc` = each user's
    * FIRST conversion as a (us, id) struct (lexicographic min — the
    * total order a path model needs), `touches` = that user's touch
    * rows strictly before it in (us, id) order (all touches when the
    * user never converts), with `fc` joined on.
    */
  private def journeyTouches(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      touchTypes: Seq[String]): (DataFrame, DataFrame) = {
    val ev = events.select(
      col(userCol).as("u"),
      unix_micros(col(tsCol).cast("timestamp")).as("us"),
      col(idCol).cast("long").as("id"),
      col(typeCol).cast("string").as("et"))
    val fc = ev.where(col("et") === conversionType)
      .groupBy("u").agg(min(struct(col("us"), col("id"))).as("fc"))
    val touches = ev.where(col("et").isin(touchTypes: _*))
      .join(fc, Seq("u"), "left")
      .where(col("fc").isNull ||
        col("us") < col("fc.us") ||
        (col("us") === col("fc.us") && col("id") < col("fc.id")))
    (fc, touches)
  }

  def markovRemoval(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      iters: Int = 100): DataFrame = {
    require(touchTypes.nonEmpty, "Attribution.markovRemoval: need touch types")
    require(!touchTypes.contains(conversionType),
      "Attribution.markovRemoval: the conversion type cannot also be a touch type")
    require(iters > 0, "iters must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

    val (fc, touches) = journeyTouches(
      events, userCol, tsCol, typeCol, idCol, conversionType, touchTypes)
    val w = Window.partitionBy("u").orderBy("us", "id")
    val tt = touches
      .withColumn("src", coalesce(lag(col("et"), 1).over(w), lit("(start)")))
      .withColumn("nxt", lead(col("et"), 1).over(w))
    val pairs = tt.select(col("src"), col("et").as("dst"))
      .unionByName(tt.where(col("nxt").isNull).select(
        col("et").as("src"),
        when(col("fc").isNotNull, lit("(conv)")).otherwise(lit("(null)")).as("dst")))
      .unionByName(
        fc.join(touches.select("u").distinct(), Seq("u"), "left_anti")
          .select(lit("(start)").as("src"), lit("(conv)").as("dst")))

    val counts = pairs.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totBySrc = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // edges sorted by dst: a FIXED summation order (the SQL replay sums
    // unordered — ulp differences only, absorbed by the 6dp quantizer)
    val edges: Map[String, Seq[(String, Double)]] = counts
      .groupBy(_._1)
      .view.mapValues(es =>
        es.sortBy(_._2).map { case (s, d, n) => (d, n.toDouble / totBySrc(s).toDouble) }.toSeq)
      .toMap
    val channels = counts.map(_._1).distinct.filter(_ != "(start)").sorted
    val states = "(start)" +: channels

    def absorb(removed: Option[String]): Double = {
      var p: Map[String, Double] = states.map(_ -> 0.0).toMap
      var k = 0
      while (k < iters) {
        p = states.map { s =>
          s -> edges.getOrElse(s, Nil).iterator.map { case (dst, pr) =>
            val v =
              if (dst == "(conv)") 1.0
              else if (dst == "(null)") 0.0
              else if (removed.contains(dst)) 0.0
              else p.getOrElse(dst, 0.0)
            pr * v
          }.sum
        }.toMap
        k += 1
      }
      p.getOrElse("(start)", 0.0)
    }

    val pBase = absorb(None)
    val res = channels.map { c =>
      val re = if (pBase > 0) Some((pBase - absorb(Some(c))) / pBase) else None
      (c, re)
    }
    val reSum = res.flatMap(_._2).sum
    res.toSeq.map { case (c, re) =>
      (c,
        if (pBase > 0) Some(q6(pBase)) else None,
        re.map(q6),
        re.flatMap(r => if (reSum > 0) Some(q6(r / reSum)) else None))
    }.toDF("channel", "p_conv", "removal_effect", "share")
  }

  /** Shapley-value attribution on observed coalitions — the order-free
    * game-theoretic model beside [[markovRemoval]]'s order-sensitive
    * chain: each user's journey collapses to its SET of touched
    * channels, the characteristic function is the observed conversion
    * rate v(T) = conv(T)/n(T) per exact coalition (v ≡ 0 on unobserved
    * subsets — the standard observed-coalition simplification, Zhao et
    * al. 2018), and channel c's credit is the exact Shapley value over
    * the n observed channels. With v supported only on observed sets
    * the permutation sum COLLAPSES — no subset enumeration:
    * φ_c = Σ_{T∋c} [w(|T|−1) + w(|T|)]·v(T) − Σ_T w(|T|)·v(T),
    * with w(s) = s!(n−s−1)!/n! and w(n) ≡ 0 (the grand coalition is
    * never a proper subset). So the whole estimator is: one coalition
    * aggregate (distinct observed sets — bounded by users, typically
    * tiny), one member explode + keyed sum, one broadcast scalar.
    * Returns one row per observed channel: (channel, n_sets,
    * shapley 6dp, share 6dp — share null unless Σφ > 0).
    */
  def shapley(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty, "Attribution.shapley: need touch types")
    require(!touchTypes.contains(conversionType),
      "Attribution.shapley: the conversion type cannot also be a touch type")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val (_, touches) = journeyTouches(
      events, userCol, tsCol, typeCol, idCol, conversionType, touchTypes)
    val sets = touches
      .groupBy("u")
      .agg(
        array_join(array_sort(collect_set(col("et"))), "|").as("sk"),
        max(col("fc").isNotNull.cast("int")).as("cv"))
      .groupBy("sk")
      .agg(count(lit(1)).as("n_u"), sum(col("cv")).as("n_conv"))
      .withColumn("sz", size(split(col("sk"), "\\|")))
      .withColumn("v", col("n_conv").cast("double") / col("n_u").cast("double"))
      .localCheckpoint(true)
    val channels = sets.select(explode(split(col("sk"), "\\|")).as("c"))
      .distinct().collect().map(_.getString(0)).sorted
    val n = channels.length
    if (n == 0) {
      val spark = events.sparkSession
      import spark.implicits._
      return Seq.empty[(String, Long, Option[Double], Option[Double])]
        .toDF("channel", "n_sets", "shapley", "share")
    }
    def fact(k: Int): Double = (1 to k).foldLeft(1L)(_ * _.toLong).toDouble
    // w(s) = s!(n-s-1)!/n!, w(n) = 0 — literals computed once, identical
    // to the oracle's factorial()::DOUBLE arithmetic (exact small ints)
    val wOf: Map[Int, Double] =
      (0 until n).map(s => s -> fact(s) * fact(n - s - 1) / fact(n)).toMap + (n -> 0.0)
    def wCol(szCol: Column): Column =
      (0 to n).foldLeft(lit(0.0)) { (acc, s) => when(szCol === s, lit(wOf(s))).otherwise(acc) }
    val totalW = sets.agg(sum(wCol(col("sz")) * col("v")).as("__tw"))
    val perChannel = sets
      .select(explode(split(col("sk"), "\\|")).as("channel"), col("sz"), col("v"))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_sets"),
        sum((wCol(col("sz") - 1) + wCol(col("sz"))) * col("v")).as("__plus"))
      .crossJoin(broadcast(totalW))
      .withColumn("__phi", col("__plus") - col("__tw"))
    val totalPhi = perChannel.agg(sum(col("__phi")).as("__tp"))
    perChannel
      .crossJoin(broadcast(totalPhi))
      .select(
        col("channel"), col("n_sets"),
        q6(col("__phi")).as("shapley"),
        when(col("__tp") > 0, q6(col("__phi") / col("__tp"))).as("share"))
  }
}
