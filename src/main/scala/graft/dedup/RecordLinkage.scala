package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (1969) — entity
  * resolution across two rosters with no shared key: the structured-
  * record cousin of the fuzzy-dedup family (documents dedup by content,
  * records link by field agreement). Classic uses in a data-pipeline:
  * joining user tables across acquisitions, deduplicating crawled
  * author/site registries, matching eval-set provenance records.
  *
  * Each field rule carries match/unmatch agreement probabilities
  * (m = P(agree | same entity), u = P(agree | different entities)); an
  * agreeing field contributes log2(m/u), a disagreeing one
  * log2((1−m)/(1−u)), and the pair's total weight is the
  * log-likelihood-ratio score thresholded into links.
  *
  * Scale shape: candidate pairs come from BLOCKING — an equi-join on
  * the block key(s), the step that makes linkage feasible at all (the
  * unblocked cross product is |A|·|B|); everything after the join is
  * row-local arithmetic. Blocks shuffle on their key; a skewed block
  * key should be pre-salted with [[graft.ops.Salt]]. Weights are
  * driver-side constants folded into the plan.
  */
object RecordLinkage {

  /** One comparison rule: `agree(leftCol, rightCol)` is the field
    * agreement predicate (null-safe responsibility lies with the
    * caller's predicate; `<=>` composes fine).
    */
  final case class FieldRule(
      name: String,
      agree: (Column, Column) => Column,
      m: Double,
      u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"rule $name: need 0 < u < m < 1 (got m=$m u=$u)")
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    def disagreeWeight: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Score all blocked candidate pairs and keep those with total weight
    * ≥ `minScore`. Output: idA, idB, one `agree_<name>` flag per rule,
    * and `score` (rounded to `roundScore` decimals for cross-engine
    * replay — the score is a sum of ≤ #rules driver constants, so the
    * value set is finite and margins are probe-able).
    *
    * Column names shared by both rosters are disambiguated by suffixing
    * the right side with `_b` before the join.
    */
  def linkPairs(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      blockKeys: Seq[(String, String)],
      rules: Seq[(FieldRule, String, String)],
      minScore: Double,
      roundScore: Int = 4
  ): DataFrame = {
    require(blockKeys.nonEmpty, "blocking is mandatory — an unblocked linkage is |A|x|B|")
    val right = b.columns.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"${c}_b"))
    val cond = blockKeys
      .map { case (ka, kb) => col(ka) === col(s"${kb}_b") }
      .reduce(_ && _)
    val joined = a.join(right, cond)

    val flags = rules.map { case (r, fa, fb) =>
      r.agree(col(fa), col(s"${fb}_b")).as(s"agree_${r.name}")
    }
    val scored = joined.select((col(idA) +: col(s"${idB}_b").as(idB) +: flags): _*)
    val score = rules
      .map { case (r, _, _) =>
        when(col(s"agree_${r.name}"), lit(r.agreeWeight)).otherwise(lit(r.disagreeWeight))
      }
      .reduce(_ + _)
    scored
      .withColumn("score", round(score, roundScore))
      .where(col("score") >= minScore)
  }
}
