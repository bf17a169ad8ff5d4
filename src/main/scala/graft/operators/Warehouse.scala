package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-maintenance operators: slowly-changing-dimension (type 2)
  * historization over a keyed changelog, and snapshot reconciliation
  * (added / removed / changed / unchanged) between two versions of a keyed
  * table. Together with [[Cdc]] (latest-wins compaction) these are the
  * at-rest table-maintenance primitives a warehouse layer needs around the
  * ingest pipeline: Cdc answers "what is the current row", scd2 answers
  * "what was the row at time t", snapshotDiff answers "what moved between
  * two loads".
  *
  * Scale shape (scd2): ONE hash exchange on the key, then two window
  * passes over the SAME (partitioning, ordering) — Catalyst plans a single
  * sort with no second exchange, so the whole historization is
  * one-shuffle. Per-key state is bounded by that key's change count (a
  * window, never a collect), and hot keys are a sort problem, not a heap
  * problem — they spill.
  *
  * Scale shape (snapshotDiff): one co-partitioned full-outer equi-join on
  * the key — AQE-splittable on skew, shuffle-free when both snapshots are
  * bucketed by key (the layout [[graft.sinks.Sinks]] writes). When only
  * the per-status COUNTS are needed, production would project each side
  * to (key, xxhash64(payload)) before the join so the network moves two
  * longs per row instead of the payload; that variant trades a 2^-64
  * collision (a changed row mistaken for unchanged) for the bandwidth,
  * and is deliberately NOT what [[snapshotDiff]] does — this operator
  * compares values exactly and emits both sides' payloads.
  */
object Warehouse {

  /** Build a type-2 slowly-changing-dimension history from a keyed
    * changelog: consecutive rows (per key, ordered by `orderCols`) whose
    * tracked attributes `attrCols` are unchanged are compacted away, and
    * each surviving change opens a validity interval
    * `[valid_from, valid_to)` where `valid_from` is the change's
    * `orderCols.head` value and `valid_to` is the NEXT change's (null —
    * and `is_current` true — for the key's latest state).
    *
    * `orderCols.head` is the event-time column (any orderable type);
    * the remaining orderCols are tie-breaks that must make the ordering
    * total per key (e.g. a sequence number) so the history is
    * deterministic under any partitioning. Attribute comparison is
    * null-safe: a null attribute value is a state like any other.
    *
    * Output: keyCols ++ attrCols ++ (valid_from, valid_to, is_current).
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs key, order, and attribute columns")
    val reserved = Seq("__prev", "valid_from", "valid_to", "is_current")
    require(!changes.columns.exists(reserved.contains),
      s"scd2 reserves columns ${reserved.mkString(", ")}")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    val tsCol = col(orderCols.head)
    // change rows: first per key, or attrs differ from the previous row
    // (null-safe compare — lag() is null only on the first row, which the
    // eqNullSafe then correctly reports as a change)
    val changed = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(!(attrs <=> col("__prev")))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    changed
      .withColumn("valid_from", tsCol)
      .withColumn("valid_to", lead(tsCol, 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col)
        ++ Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Reconcile two snapshots of a keyed table. Emits one row per key
    * present in either side with a `status` of `added` (new side only),
    * `removed` (old side only), `changed` (both, any non-key column
    * differs, null-safe), or `unchanged`, plus every non-key column from
    * both sides as `old_<c>` / `new_<c>`. Both inputs must share the
    * exact column set.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs key columns")
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      "snapshots must share the same columns")
    val reserved = Seq("__old", "__new", "__in_old", "__in_new", "status")
    require(!oldSnap.columns.exists(reserved.contains),
      s"snapshotDiff reserves columns ${reserved.mkString(", ")}")
    val payload = oldSnap.columns.toSeq.filterNot(keyCols.contains)
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(keyCols.map(col)
        :+ struct(payload.map(col): _*).as(s"__$tag")
        :+ lit(true).as(s"__in_$tag"): _*)
    val joined = side(oldSnap, "old")
      .join(side(newSnap, "new"), keyCols, "full_outer")
    val status = when(col("__in_old").isNull, lit("added"))
      .when(col("__in_new").isNull, lit("removed"))
      .when(col("__old") <=> col("__new"), lit("unchanged"))
      .otherwise(lit("changed"))
    joined.select(keyCols.map(col)
      ++ Seq(status.as("status"))
      ++ payload.map(c => col(s"__old.$c").as(s"old_$c"))
      ++ payload.map(c => col(s"__new.$c").as(s"new_$c")): _*)
  }

  /** Per-status row counts of [[snapshotDiff]] — the reconciliation
    * headline. Same join; the counts collapse map-side. */
  def snapshotDiffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame =
    snapshotDiff(oldSnap, newSnap, keyCols)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** Point-in-time (temporal) join of a fact table against a type-2
    * dimension: each fact row gets the dim attributes of the version valid
    * at the fact's `tsCol` — the lookup [[scd2]]'s output exists to serve
    * ("what WAS this key's state when the event happened").
    *
    * Relies on scd2's gapless-interval invariant: per key, each version's
    * `valid_to` equals the next version's `valid_from`, so "the version
    * valid at t" IS "the latest version with valid_from <= t" and the join
    * reduces to an as-of join on `valid_from` — no interval containment
    * predicate, no range join. A fact before the key's first version (or
    * with a key absent from the dim) gets null attributes. A version
    * starting exactly at the fact's ts applies to it (as-of inclusive
    * ties, matching scd2's closed-open `[valid_from, valid_to)`).
    *
    * Dim versions must be unique per (key, valid_from) — an scd2 run
    * whose `orderCols` tie-break resolves inside one `valid_from` value
    * can emit two versions at the same instant; pre-compact the changelog
    * to one change per (key, ts) first (the q111 query does).
    *
    * Scale shape: inherits [[AsOfJoin.asOf]]'s — union both sides, ONE
    * hash exchange on the key, one window carrying the latest version
    * struct forward. The dim (version-sized) rides along with the fact
    * scan; nothing is ever materialized per (fact × version).
    *
    * Output: every fact column plus `asof_<attr>` for each attrCol. */
  def pointInTime(fact: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "pointInTime needs dim attribute columns")
    val d = dim.select(col(keyCol) +: col("valid_from").as(tsCol)
      +: attrCols.map(col): _*)
    AsOfJoin.asOf(fact, d, keyCol, tsCol, attrCols)
  }

  /** RFM segmentation (Hughes, "Strategic Database Marketing", 1994):
    * score every customer 1–5 on Recency (latest activity), Frequency
    * (activity count), and Monetary (DECIMAL-exact spend), by ntile
    * quintiles under TOTAL orders (metric, entity) — deterministic, so
    * the 555/111 segments replay exactly in SQL. Higher = better on all
    * three axes (newest, most frequent, biggest spender = 5).
    *
    * Scale shape: ONE fact-sized aggregate (per-entity rollup, map-side
    * combined, then checkpointed — it feeds four sub-plans); each
    * quintile assignment routes through [[Stats.bucketedRanks]] (the q138
    * bucket refinement, bucket-partitioned windows + broadcast offsets)
    * instead of a global `ntile` window, so NO single-partition sort runs
    * at any entity count. The tile is computed from the exact global rank
    * with the standard NTILE rule (first n mod 5 tiles take ⌈n/5⌉ rows) —
    * value-identical to `ntile(5) OVER (ORDER BY metric, entity)`,
    * spec-pinned against the window form. Output: (entity, recency_ts,
    * frequency, monetary, r_score, f_score, m_score, segment). An entity
    * whose timestamps are ALL null cannot be ordered on recency and is
    * excluded after the rollup (explicitly, rather than falling into
    * [[Stats.bucketedRanks]]' null-exclusion path and silently vanishing
    * at the score join). Null handling is AGGREGATE-level, not row-level:
    * a row with an amount but a null timestamp still counts toward
    * frequency and monetary (max() already ignores nulls), so a
    * mixed-null entity keeps its full activity history — only the
    * recency axis is computed over the rows that can order it. */
  def rfm(df: DataFrame, entityCol: String, tsCol: String,
      amountCol: String): DataFrame = {
    graft.util.Checkpoints.ensureDir(df.sparkSession)
    val per = df.filter(col(amountCol).isNotNull)
      .groupBy(col(entityCol).cast("string").as("entity"))
      .agg(max(col(tsCol).cast("long")).as("recency_ts"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,2)")).as("m"))
      .filter(col("recency_ts").isNotNull)
      .checkpoint(eager = true)
    val n = per.count()
    // NTILE(5) from the exact rank: tiles 1..rem hold size+1 rows, the
    // rest hold size (the Spark/DuckDB bucket rule). Driver-side n makes
    // the cut a literal; the division operands stay < 2^53, so the
    // floor-of-double-division is exact.
    val size = n / 5
    val rem = n % 5
    val cut = rem * (size + 1)
    def tile(rank: Column): Column =
      if (size == 0) rank // n < 5: every row is its own tile
      else when(rank <= cut,
          floor((rank - 1L).cast("double") / (size + 1L).toDouble) + 1.0)
        .otherwise(lit(rem.toDouble) +
          floor((rank - cut - 1L).cast("double") / size.toDouble) + 1.0)
    def scored(c: String, name: String) =
      Stats.bucketedRanks(per, c, "entity")
        .select(col("entity"), tile(col("rank")).cast("long").as(name))
    per
      .join(scored("recency_ts", "r_score"), "entity")
      .join(scored("frequency", "f_score"), "entity")
      .join(scored("m", "m_score"), "entity")
      .select(col("entity"), col("recency_ts"), col("frequency"),
        col("m").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
  }

  /** ABC / Pareto contribution analysis: rank entities by a DECIMAL-exact
    * measure, accumulate their share of the total, and class them A
    * (the head up to `aPct`% cumulative), B (to `bPct`%), C (the tail) —
    * the BI staple behind "which 20% of parts carry 80% of revenue" and,
    * in a data pipeline, "which sources carry the token mass".
    *
    * Scale shape: ONE corpus-sized aggregate (per-entity measure, map-side
    * combined); the cumulative window runs over the ENTITY table —
    * dimension-sized, not fact-sized (same stance as the funnel/cohort
    * ops; entities at corpus scale route through the q138 refinement).
    * Cumulative shares are DECIMAL sums of exact per-entity decimals over
    * one exact total — order (measure desc, entity asc) is total, so the
    * running share is deterministic. Output: (entity, measure, share,
    * cum_share, abc_class), share/cum round-6. */
  def abcAnalysis(df: DataFrame, entityCol: String, measureCol: String,
      aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(aPct >= 1 && aPct < bPct && bPct <= 100, "need 1 <= aPct < bPct <= 100")
    val per = df.filter(col(measureCol).isNotNull)
      .groupBy(col(entityCol).cast("string").as("entity"))
      .agg(sum(col(measureCol).cast("decimal(18,2)")).as("m"))
    val tot = per.agg(sum(col("m")).as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("m").desc, col("entity").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per.crossJoin(tot)
      .withColumn("cum", sum(col("m")).over(w))
      .select(col("entity"), col("m").cast("double").as("measure"),
        round(col("m").cast("double") / col("t").cast("double") * 100.0, 6)
          .as("share"),
        round(col("cum").cast("double") / col("t").cast("double") * 100.0, 6)
          .as("cum_share"))
      .withColumn("abc_class",
        when(col("cum_share") <= aPct, "A")
          .when(col("cum_share") <= bPct, "B").otherwise("C"))
  }
}
