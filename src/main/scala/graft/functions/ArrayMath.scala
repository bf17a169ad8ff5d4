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

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss):
    * project a `dim`-dimensional embedding onto `outDim` deterministic
    * pseudo-random hyperplanes — pairwise distances are preserved within
    * (1 ± ε) at outDim = O(ln n / ε²), independent of the input dimension.
    * The preprocessing step that makes every downstream vector operator
    * (ANN, near-dup, clustering) cheaper at 100 TB: 64 → 8 dims is an 8x
    * cut in vector bytes, dot-product cost, and broadcast size.
    *
    * The projection matrix is [[graft.functions.PortableHashes.planeComponent]]
    * — derived arithmetically, no driver-side randomness to generate, ship,
    * or version; any executor (and the SQL oracle) reproduces coefficient
    * (j, d) from its indices. The trade: multiplicative-hash coefficients
    * at adjacent indices are correlated, so the strict iid-JL variance
    * constants hold only approximately (pinned at order-of-magnitude in
    * VectorExprSpec); callers needing sharp ε bounds swap in a stored
    * random matrix at the same plan shape. Components round to 6 decimals
    * so the fold stays bit-portable. Narrow per-row math: no shuffle,
    * codegen'd. */
  def randomProject(emb: Column, outDim: Int, dim: Int): Column = {
    val v = emb.cast("array<double>")
    array((0 until outDim).map { j =>
      round((0 until dim).map(d =>
        element_at(v, d + 1) * lit(graft.functions.PortableHashes.planeComponent(j, d, dim)))
        .reduce(_ + _), 6)
    }: _*)
  }
}
