package graft.functions

import graft.functions.expressions.TextFunctions.poly_hash
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash families for the approximate operators (MinHash, SimHash, feature
  * hashing, hyperplane LSH) built from the portable polynomial rolling hash
  * ([[graft.functions.expressions.PolyHash]]) instead of xxhash64.
  *
  * Purpose: every formula here is pure small-integer arithmetic — no 64-bit
  * wraparound — so the DuckDB oracle ([[graft.OracleSql]]) reproduces the
  * OPERATOR'S ALGORITHM bit-for-bit and the driver's hash-compare becomes a
  * full end-to-end check of the approximate pipeline (signatures, banding,
  * bucketing, verification), not a rows-only count. xxhash64 remains the
  * default family on every operator — better mixing and a native codegen hash
  * — these are the variants the oracle-gated demo queries plug in.
  *
  * All arithmetic stays within ~2^38 (values < 2^31-1, multipliers <= 131,
  * band folds re-reduce mod p every step), so no overflow under ANSI mode.
  */
object PortableHashes {

  /** 2^31 - 1: the polynomial-hash modulus shared by every family here. */
  val Mod = 2147483647L

  /** Feature-hash slotting: poly_hash, reduced mod dim by the vectorizer. */
  val tokenSlot: Column => Column = poly_hash

  /** MinHash family i: h_i(gram) = (poly(gram) * (2i+3) + i) mod p —
    * classic multiply-shift universal hashing off one base hash, computed
    * once per gram row (the operator projects the hashes before the min
    * aggregates, so subexpression elimination shares poly(gram)). */
  def minhashGramHashes(gram: Column, numHashes: Int): Seq[Column] = {
    val ph = poly_hash(gram)
    (0 until numHashes).map(i => (ph * lit(2L * i + 3) + lit(i.toLong)) % lit(Mod))
  }

  /** Band bucket: left fold (acc*131 + sig) mod p over the band's signature
    * values in hash-index order. */
  def minhashBandBucket(sigs: Seq[Column]): Column =
    sigs.foldLeft(lit(0L): Column)((acc, s) => (acc * lit(131L) + s) % lit(Mod))

  /** SimHash vote bit b of a token hash: parity of (h * (2b+3)) mod p. */
  def simhashBit(h: Column, b: Int): Column =
    ((h * lit(2L * b + 3)) % lit(Mod)) % lit(2L)

  /** Hyperplane component for (plane p, dim d): multiplicative hash of the
    * flattened index mapped to [-1, 1). Pure integer arithmetic then one
    * exact double division, so the plan-time literal here equals the value
    * DuckDB computes in SQL bit-for-bit. */
  def planeComponent(p: Int, d: Int, dim: Int): Double =
    ((p.toLong * dim + d + 1) * 2654435761L % Mod) / 1073741823.5 - 1.0

  /** Sign-signature LSH bucket from `nPlanes` portable hyperplanes; identical
    * semantics to Similarity.lshBucket with a SQL-expressible component hash.
    * Projections are static sums over element_at — fine for nPlanes*dim in
    * the hundreds; the xxhash64 codegen expression remains the scale path. */
  def lshBucket(emb: Column, nPlanes: Int, dim: Int): Column =
    lshBandBucket(emb, 0, nPlanes, dim)

  /** Band `band`'s sign-signature bucket: same plane family as [[lshBucket]]
    * but over the DISTINCT plane slice `[band*planesPerBand,
    * (band+1)*planesPerBand)`, so each band is an independent hash table and
    * OR-ing candidates over bands recovers neighbors a single bucketing
    * splits across a plane. Band 0 is bit-identical to
    * `lshBucket(emb, planesPerBand, dim)`. */
  def lshBandBucket(emb: Column, band: Int, planesPerBand: Int, dim: Int): Column = {
    val v = emb.cast("array<double>")
    (0 until planesPerBand).map { p =>
      val proj = (0 until dim)
        .map(d => element_at(v, d + 1) *
          lit(planeComponent(band * planesPerBand + p, d, dim)))
        .reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }
}
