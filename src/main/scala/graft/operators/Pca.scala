package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column by power iteration,
  * expressed entirely as DataFrame passes — the "what single direction
  * explains this embedding table" diagnostic (anisotropy/rogue-dimension
  * checks a la Mu & Viswanath ICLR'18, whitening decisions, drift between
  * two embedding versions), computed without ever materializing the d×d
  * covariance matrix or handing the corpus to a linear-algebra library.
  *
  * Algorithm (classic power iteration, e.g. Golub & Van Loan §7.3):
  * v_{k+1} ∝ Σ_r c_r · (c_r ⋅ v_k), with c_r the mean-centered vectors —
  * i.e. Cv computed as X^T(Xv) in two streaming passes, never forming C.
  *
  * Scale shape per iteration: ONE narrow pass over the corpus (the dot
  * product c⋅v folds inside the array — no per-row aggregate, v enters as
  * plan literals) followed by a posexplode whose per-dimension partial
  * sums combine map-side — the exchange carries ≤ dim rows per partition.
  * Between iterations the dim-sized normalized vector is collected (the
  * bounded-collect contract: model-sized, like the Lloyd centroids in
  * [[Similarity]]). Nothing corpus-sized ever shuffles; at 100 TB each
  * iteration is a scan.
  *
  * Portability: mean components, iterates, and the per-row projection
  * round to 6 decimals (the projection is the sequential-fold double dot
  * — vec_dot ≡ DuckDB list_dot_product bit-for-bit, the q35 convention);
  * every CROSS-ROW sum is a DECIMAL sum of round-9 products, so the whole
  * trajectory — and therefore the final component — replays bit-for-bit
  * in the SQL oracle's unrolled CTEs. The sign convention (power
  * iteration converges up to sign) is fixed by the deterministic uniform
  * start vector; the eigenvalue estimate is ‖Σ c (c⋅v)‖ / (n−1), the
  * Rayleigh-quotient norm in sample-covariance units.
  *
  * Contract: vectors are non-degenerate (some variance in some dimension;
  * a rank-0 input would normalize by zero) and n ≥ 2.
  */
object Pca {

  /** (i, mu) mean per dimension: round-6 doubles, dim rows. */
  def meanVector(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(col("x").cast("decimal(18,9)")).as("sx"), count(lit(1)).as("n"))
      .select(col("i"),
        round(col("sx").cast("double") / col("n").cast("double"), 6).as("mu"))

  /** Mean-centered vectors as an array column `cvec` (round-6 components),
    * keeping the input's other columns. `mu` is the collected mean —
    * dim doubles baked in as literals so centering stays narrow. */
  private def centered(df: DataFrame, vecCol: String, mu: Seq[Double]): DataFrame = {
    val muLit = array(mu.map(lit): _*)
    df.withColumn("cvec",
      zip_with(col(vecCol).cast("array<double>"), muLit,
        (a, b) => round(a - b, 6)))
  }

  /** One power-iteration step: from the round-6 iterate `v`, produce the
    * un-normalized image w = Σ_r c_r (c_r ⋅ v) as a (i, w) frame. */
  private def image(cent: DataFrame, v: Seq[Double]): DataFrame = {
    val vLit = array(v.map(lit): _*)
    cent
      // per-row dot: the sequential double fold (vec_dot ≡ DuckDB
      // list_dot_product bit-for-bit — the q35 convention), round-6
      .withColumn("d",
        round(graft.functions.ArrayMath.dot(col("cvec"), vLit), 6))
      .select(posexplode(transform(col("cvec"), c => round(col("d") * c, 9)))
        .as(Seq("i", "wx")))
      .groupBy("i")
      .agg(sum(col("wx").cast("decimal(28,9)")).cast("double").as("w"))
  }

  /** ‖w‖ and the round-6 normalized next iterate, as a (i, v, nrm) frame. */
  private def normalized(w: DataFrame): DataFrame = {
    val nrm = w.agg(round(sqrt(
      sum(round(col("w") * col("w"), 6).cast("decimal(38,6)")).cast("double")), 6)
      .as("nrm"))
    w.crossJoin(nrm).select(col("i"), round(col("w") / col("nrm"), 6).as("v"),
      col("nrm"))
  }

  /** round(x, 6) with exactly Spark's/DuckDB's semantics — HALF_UP on the
    * canonical (Double.toString) decimal rendering, which is what Spark's
    * Round expression does for doubles (BigDecimal.valueOf). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Power-iterate `iters` rounds from the uniform start vector and return
    * (i, loading, eigval, var_pct): the round-6 component, the sample-
    * covariance eigenvalue estimate, and its share of total variance —
    * `dim` rows. */
  def pcaTopComponent(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 3): DataFrame = {
    require(dim > 0 && iters > 0, "dim and iters must be positive")
    val mu = meanVector(df, vecCol).orderBy("i").collect()
      .map(_.getDouble(1)).toSeq
    require(mu.size == dim, s"expected $dim dims, saw ${mu.size}")
    val cent = centered(df, vecCol, mu)
    var v = Seq.fill(dim)(round6(1.0 / math.sqrt(dim.toDouble)))
    for (_ <- 1 until iters) // all but the last round materialize the iterate
      v = normalized(image(cent, v)).orderBy("i").collect().map(_.getDouble(1)).toSeq
    val n = df.count()
    // total variance = Σ_{r,i} c²/(n−1): one word-count-shaped aggregate
    val tv = cent
      .select(posexplode(col("cvec")).as(Seq("i", "c")))
      .agg((sum(round(col("c") * col("c"), 9).cast("decimal(38,9)"))
        .cast("double") / lit((n - 1).toDouble)).as("tv"))
    // the final round stays a lazy plan: loading = v_K, eigval = ‖w_K‖/(n−1)
    normalized(image(cent, v)).crossJoin(tv)
      .select(col("i").cast("long").as("i"), col("v").as("loading"),
        round(col("nrm") / lit((n - 1).toDouble), 6).as("eigval"),
        round((col("nrm") / lit((n - 1).toDouble)) / col("tv"), 6).as("var_pct"))
      .orderBy("i")
  }
}
