package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns.
  *
  * Fold order is sequential left-to-right — bit-identical to DuckDB's
  * list_dot_product / list_sum, which the oracle SQL mirrors. The hot path
  * is a native codegen expression (expressions.DotProduct); [[dotHof]] keeps
  * the built-in higher-order-function formulation as a semantic cross-check
  * (it is CodegenFallback — interpreted — and ~an order of magnitude slower).
  */
object ArrayMath {

  /** Sequential-fold dot product of two numeric arrays (as double). */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorFunctions.vec_dot(a, b)

  /** Built-in HOF formulation of [[dot]] — same bits, interpreted eval. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to 6 decimals — the comparison/ranking key used by the
    * similarity operators so rankings are stable across engines despite
    * last-ulp libm differences. */
  def cosineKey(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
