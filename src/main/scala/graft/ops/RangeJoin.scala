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
}
