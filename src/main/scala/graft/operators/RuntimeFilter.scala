package graft.operators

import graft.functions.PortableHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the semi-join reduction that makes
  * selective fact⋈dim joins viable at 100 TB: build a Bloom filter over the
  * (filtered) dim side's join keys, kill non-matching fact rows AT THE SCAN
  * STAGE with a pure codegen predicate, and only then shuffle the survivors
  * into the exact join. The result is provably identical to the plain join:
  * a Bloom filter has no false negatives (every dim key sets its own bits),
  * and the false positives it lets through are removed by the exact join
  * that follows. Spark's AQE `InjectRuntimeFilter` applies the same idea
  * when statistics justify it; this operator is the explicit, deterministic
  * form a pipeline can rely on (and the oracle checks it against the PLAIN
  * join — the filter must be semantically invisible).
  *
  * Scale shape: the dim-side build is one `bit_or` aggregate — the grid
  * (mBits/32 long words, e.g. 8 KB at 2^16 bits) partial-combines map-side
  * and collapses to at most mBits/32 rows on the exchange. The grid is then
  * collected to the driver and inlined as an ARRAY LITERAL, so the fact-side
  * probe is `(words[h div 32] >> (h%32)) & 1` per hash — a whole-stage-
  * codegen filter in the scan stage, zero joins, zero extra exchange, the
  * fact table never moves unless it probably matches. The collect is bounded
  * by mBits/32 rows by construction (the q42 bounded-collect contract — a
  * catalog-statistic analogue, not a data-sized driver loop).
  *
  * Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; at the default
  * m=2^16, k=4 a 5 000-key dim side sits around 1%. A fact row that
  * passes spuriously costs one shuffled row, not a wrong answer — undersize
  * the filter and the join just prunes less.
  */
object RuntimeFilter {

  /** The fact rows whose `factKey` PROBABLY appears in `dimKeys.keyCol`
    * (no false negatives; ~fpRate false positives). Pure narrow filter. */
  def bloomSemiFilter(fact: DataFrame, factKey: String, dimKeys: DataFrame,
      keyCol: String, mBits: Int = 65536, k: Int = 4): DataFrame = {
    require(mBits % 32 == 0, s"mBits must pack into 32-bit words, got $mBits")
    val words = new Array[Long](mBits / 32)
    // one bit_or aggregate; ≤ mBits/32 rows by construction
    Sketches.bloomBuild(dimKeys.select(col(keyCol).cast("string").as("k")),
        "k", mBits, k)
      .collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val wordsLit = typedlit(words.toSeq)
    val hit = PortableHashes
      .minhashGramHashes(col(factKey).cast("string"), k)
      .map(_ % lit(mBits.toLong))
      .map(p => (element_at(wordsLit, (p / 32).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          p.bitwiseAND(lit(31L)).cast("int"))) =!= 0L): Column)
      .reduce(_ && _)
    fact.filter(hit)
  }

  /** Inner equi-join `fact.factKey = dim.dimKey` with the fact side
    * Bloom-pruned first. Same rows as the plain join, fewer shuffled. */
  def bloomPrunedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, mBits: Int = 65536, k: Int = 4): DataFrame =
    bloomSemiFilter(fact, factKey, dim.select(dimKey), dimKey, mBits, k)
      .join(dim, col(factKey) === col(dimKey))
}
