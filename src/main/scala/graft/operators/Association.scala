package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: frequent items, frequent pairs, and
  * association rules (support / confidence / lift) — the classic Apriori
  * first two levels (Agrawal & Srikant, VLDB'94) re-expressed as DataFrame
  * plans. A training-data pipeline uses the same shape for tag/domain
  * co-occurrence and "docs that share source also share license" audits;
  * a warehouse uses it for basket affinity.
  *
  * Portability convention: every output is an exact integer — supports are
  * basket counts, confidence and lift are ppm via integer division
  * (`1e6 * sup_ab div sup_a`), so the oracle hash-matches bit-for-bit with
  * no IEEE parenthesization contract needed.
  *
  * Scale shape: the Apriori prune is the whole point at 100 TB. Infrequent
  * items are dropped BEFORE pair generation (a semi-join against the
  * frequent-item aggregate), so the quadratic per-basket pair blowup runs
  * over frequent items only. Pair generation is a self-equi-join on the
  * basket key — one hash exchange on basket, AQE skew-splittable when one
  * basket is huge; per-basket cost is C(b,2) over b = frequent items in
  * the basket (the standard Apriori bound, not corpus-quadratic). The
  * rule stage joins pair supports back to the item-support aggregate
  * (item-cardinality-sized, broadcastable) and the 1-row basket total.
  */
object Association {

  /** Distinct (basket, item) pairs — presence, not multiplicity. */
  private def presence(tx: DataFrame, basketCol: String, itemCol: String) =
    tx.select(col(basketCol).as("basket"), col(itemCol).as("item")).distinct()

  /** Items present in at least `minSupport` baskets: (item, sup). */
  def frequentItems(tx: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    presence(tx, basketCol, itemCol)
      .groupBy("item").agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSupport)

  /** Unordered item pairs co-present in at least `minSupport` baskets:
    * (item_a, item_b, sup_ab) with `item_a < item_b`. Both items must
    * individually be frequent (Apriori monotonicity makes this lossless:
    * sup(AB) <= min(sup(A), sup(B))). */
  def frequentPairs(tx: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val fi = frequentItems(tx, basketCol, itemCol, minSupport).select("item")
    val pruned = presence(tx, basketCol, itemCol)
      .join(fi, Seq("item"), "left_semi")
    val a = pruned.select(col("basket"), col("item").as("item_a"))
    val b = pruned.select(col("basket"), col("item").as("item_b"))
    a.join(b, Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSupport)
  }

  /** Top-`k` association rules `ante => cons` from the frequent pairs, both
    * directions of each pair, ranked by lift then (ante, cons). Output:
    * (ante, cons, sup_ab, sup_ante, sup_cons, conf_ppm, lift_ppm) — all
    * integers: `conf_ppm = 1e6*sup_ab div sup_ante`,
    * `lift_ppm = 1e6*sup_ab*n_baskets div (sup_ante*sup_cons)`. */
  def associationRules(tx: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, k: Int): DataFrame = {
    val items = frequentItems(tx, basketCol, itemCol, minSupport)
    val pairs = frequentPairs(tx, basketCol, itemCol, minSupport)
    val total = presence(tx, basketCol, itemCol)
      .agg(countDistinct(col("basket")).as("n_baskets"))
    val directed = pairs.select(col("item_a").as("ante"),
        col("item_b").as("cons"), col("sup_ab"))
      .unionByName(pairs.select(col("item_b").as("ante"),
        col("item_a").as("cons"), col("sup_ab")))
    directed
      .join(broadcast(items.select(col("item").as("ante"),
        col("sup").as("sup_ante"))), Seq("ante"))
      .join(broadcast(items.select(col("item").as("cons"),
        col("sup").as("sup_cons"))), Seq("cons"))
      .crossJoin(broadcast(total))
      .select(col("ante"), col("cons"), col("sup_ab"), col("sup_ante"),
        col("sup_cons"),
        expr("1000000L * sup_ab div sup_ante").as("conf_ppm"),
        expr("1000000L * sup_ab * n_baskets div (sup_ante * sup_cons)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("ante"), col("cons"))
      .limit(k)
  }

  /** Item-item co-occurrence similarity (the co-purchase / "customers who
    * bought X also bought Y" staple — Sarwar et al., WWW'01 item-based
    * CF, computed set-wise): for every frequent item pair, Jaccard and
    * cosine over their BASKET sets, from the same Apriori-pruned pair
    * counts as [[frequentPairs]].
    *
    * Scale shape: identical to frequentPairs (the prune bounds the
    * per-basket quadratic term) plus two broadcast item-support joins.
    * jaccard = round(c/(na + nb − c), 6) and
    * cosine = round(c/sqrt(na·nb), 6) — one fixed formula each over
    * exact integer counts, so both engines agree without a term-sum
    * contract. Output: (item_a, item_b, sup_a, sup_b, sup_ab, jaccard,
    * cosine). */
  def itemPairSimilarity(tx: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val items = frequentItems(tx, basketCol, itemCol, minSupport)
    frequentPairs(tx, basketCol, itemCol, minSupport)
      .join(broadcast(items.select(col("item").as("item_a"),
        col("sup").as("sup_a"))), Seq("item_a"))
      .join(broadcast(items.select(col("item").as("item_b"),
        col("sup").as("sup_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("sup_a"), col("sup_b"),
        col("sup_ab"),
        round(col("sup_ab").cast("double")
          / (col("sup_a") + col("sup_b") - col("sup_ab")).cast("double"), 6)
          .as("jaccard"),
        round(col("sup_ab").cast("double")
          / sqrt((col("sup_a") * col("sup_b")).cast("double")), 6)
          .as("cosine"))
  }
}
