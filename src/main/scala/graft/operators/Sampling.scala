package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything derives from one arithmetic hash of the row id — no RNG state,
  * no seed plumbing, identical results on every engine, every partitioning,
  * and every rerun (the properties a 100 TB train/val/test split needs).
  * The hash is a 31-bit LCG step applied to `id mod 2^31`, kept in the range
  * where BIGINT arithmetic cannot overflow in engines that trap overflow
  * (DuckDB) — which makes it oracle-expressible, unlike xxhash64.
  */
object Sampling {

  private val M = 2147483648L // 2^31

  /** Uniform-ish u(id) in [0, 1): ((id mod M) * 1103515245 + 12345) mod M / M. */
  def unitHash(id: Column): Column =
    ((pmod(id, lit(M)) * 1103515245L + 12345L) % M).cast("double") / M.toDouble

  /** SQL mirror of [[unitHash]] (DuckDB dialect). */
  def unitHashSql(id: String): String =
    s"(CAST((($id % $M + $M) % $M * 1103515245 + 12345) % $M AS DOUBLE) / $M)"

  /** Keep rows with u(id) < fraction. Deterministic Bernoulli sampling. */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(unitHash(col(idCol)) < fraction)

  /** Stratified: per-stratum fraction looked up from `fractions`. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(acc)
    }
    df.filter(unitHash(col(idCol)) < frac)
  }

  /** Assign each row to a named split by cumulative weight thresholds, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Weights must sum to 1;
    * the last split also absorbs any floating residue. */
  def splitColumn(id: Column, splits: Seq[(String, Double)]): Column = {
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val u = unitHash(id)
    splits.zip(cum).dropRight(1).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(u < hi, name).otherwise(acc)
      }
  }
}
