package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage scoring (Fellegi & Sunter, JASA 1969):
  * given candidate pairs (from any blocking strategy — the q109/q128
  * machinery) and per-field boolean agreement columns, weigh each field
  * by its evidential value — log2(m/u) on agreement, log2((1-m)/(1-u))
  * on disagreement, where m = P(agree | same entity) and
  * u = P(agree | different entities) — and classify by the two-threshold
  * decision rule (match / possible / non_match).
  *
  * The m/u priors are caller-supplied constants, so all 2·|fields| log
  * weights are computed ONCE in Scala at plan time and embedded as
  * DECIMAL(18,6) literals (the corpus-constant pattern): the score is a
  * pure narrow sum of literals selected by the agreement booleans — zero
  * shuffle, whole-stage codegen, no libm in either engine's runtime.
  * The oracle embeds the SAME printed literals.
  *
  * Scale shape: linear in candidate pairs; the pair generation upstream
  * owns the quadratic risk (blocking bounds it). Output: the input pair
  * columns + (fs_score, fs_class), score = exact DECIMAL(18,6) sum.
  */
object Linkage {

  /** Round log2(m/u)-style weights the way the engines round: half-up
    * to 6 decimals, via the same double rint the operators use. */
  private def w6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(math.rint(x * 1e6) / 1e6).setScale(6)

  /** Plan-time (agreeWeight, disagreeWeight) literals for a field. */
  def fieldWeights(m: Double, u: Double): (java.math.BigDecimal, java.math.BigDecimal) = {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    (w6(math.log(m / u) / math.log(2.0)),
      w6(math.log((1 - m) / (1 - u)) / math.log(2.0)))
  }

  /** Score candidate pairs. `fields` = (agreementColumn, m, u); the
    * agreement column must be boolean (null counts as disagreement —
    * the conservative reading of a missing field). */
  def fsScore(pairs: DataFrame, fields: Seq[(String, Double, Double)],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty && lower <= upper, "need fields and lower <= upper")
    val score = fields.map { case (c, m, u) =>
      val (wa, wd) = fieldWeights(m, u)
      when(coalesce(col(c), lit(false)),
        lit(wa).cast("decimal(18,6)")).otherwise(lit(wd).cast("decimal(18,6)"))
    }.reduce[Column](_ + _).cast("decimal(18,6)")
    pairs.withColumn("fs_score", score)
      .withColumn("fs_class",
        when(col("fs_score") >= upper, "match")
          .when(col("fs_score") <= lower, "non_match")
          .otherwise("possible"))
  }
}
