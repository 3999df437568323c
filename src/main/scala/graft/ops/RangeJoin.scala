package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match each point row to the interval rows
  * containing its timestamp (inclusive on both ends). Spark plans a raw
  * `ts BETWEEN start AND end` join as a broadcast-nested-loop /
  * cartesian; this is the scale-safe shape: intervals EXPLODE into the
  * fixed-width time bins they cover, points carry their own bin, and
  * the join is an equi-join on (keys, bin) with the exact containment
  * predicate applied only to same-bin candidates. Shuffle volume is
  * #points + #intervals × (avg interval length / bin width) — never a
  * cross product. Pick `binSeconds` near the typical interval length so
  * most intervals explode into 1–2 bins.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startTs: String,
      endTs: String,
      binSeconds: Long,
      keys: Seq[String] = Nil
  ): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("__bin", floor(unix_micros(col(pointTs)) / binUs))
    val i = intervals.withColumn(
      "__bin",
      explode(
        sequence(
          floor(unix_micros(col(startTs)) / binUs),
          floor(unix_micros(col(endTs)) / binUs))))
    p.join(i, keys :+ "__bin")
      .where(col(pointTs).between(col(startTs), col(endTs)))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join — pairs (l, r) whose spans
    * intersect: `l.start ≤ r.end AND r.start ≤ l.end` (closed-interval
    * convention, matching [[pointInInterval]]). The naive inequality
    * join is a cartesian; here BOTH sides explode into the fixed-width
    * bins they cover and the equi-join on (keys, bin) sees only co-bin
    * candidates. A pair overlapping k shared bins would surface k
    * times, so each candidate is emitted ONLY in the first bin both
    * intervals occupy — `bin == max(⌊l.start/w⌋, ⌊r.start/w⌋)` — a
    * row-local predicate, no distinct needed. Shuffle volume is
    * Σ interval-length/binWidth per side; pick `binSeconds` near the
    * typical span.
    *
    * Both inputs must carry the given start/end columns; every other
    * column passes through (caller disambiguates names).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      binSeconds: Long,
      keys: Seq[String] = Nil
  ): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binUs = binSeconds * 1000000L
    def binned(df: DataFrame, s: String, e: String) = df.withColumn(
      "__bin",
      explode(sequence(
        floor(unix_micros(col(s)) / binUs),
        floor(unix_micros(col(e)) / binUs))))
    val l = binned(left, leftStart, leftEnd)
    val r = binned(right, rightStart, rightEnd)
    l.join(r, keys :+ "__bin")
      .where(
        col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd) &&
          col("__bin") === greatest(
            floor(unix_micros(col(leftStart)) / binUs),
            floor(unix_micros(col(rightStart)) / binUs)))
      .drop("__bin")
  }
}
