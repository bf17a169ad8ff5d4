package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed interval algebra — the "gaps and islands" operators a warehouse
  * layer runs over validity/activity intervals: coalesce overlapping or
  * touching intervals per key into maximal islands, and summarize covered
  * time. The complement of the point-gap audit (`operators/Audit`): Audit
  * finds holes in a SEQUENCE, this merges overlap in a set of RANGES —
  * on-call shifts, session windows, maintenance locks, span annotations.
  *
  * Semantics: intervals are closed-open `[start, end)`; two intervals
  * merge when they overlap OR touch (`next.start <= running_max(end)` —
  * `[1,3)` + `[3,5)` is one island `[1,5)`). Zero-length and contained
  * intervals fold in. Null starts/ends are rejected up front (an interval
  * without bounds is malformed, not mergeable).
  *
  * Scale shape: ONE hash exchange on the key. The island split point is a
  * running `max(end)` over the window EXCLUDING the current row, the
  * island id a running sum of split flags over the SAME (partition,
  * order) — Catalyst plans both windows over a single sort. The final
  * per-island aggregate groups by (key, island): hash-partitioning on the
  * key already clusters it, so EnsureRequirements inserts no second
  * exchange (PlanSpec-style single-exchange assert in IntervalsSpec).
  * Per-key state is the window frame, which spills; hot keys are a sort
  * problem, not a heap problem.
  */
object Intervals {

  /** Coalesce `[startCol, endCol)` intervals per key into maximal islands.
    * Output: keyCols ++ (island_start, island_end, n_merged), one row per
    * island; `n_merged` counts the source intervals folded in. */
  def coalesce(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "coalesce needs key columns")
    val reserved = Seq("__max_end", "__new_island", "__island")
    require(!df.columns.exists(reserved.contains),
      s"coalesce reserves columns ${reserved.mkString(", ")}")
    val s = col(startCol)
    val e = col(endCol)
    // deterministic total order per key: (start, end) — equal-start
    // intervals are interchangeable for island membership, so the island
    // boundaries (and therefore the output) do not depend on the tie
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(s.asc, e.asc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    df
      .filter(s.isNotNull && e.isNotNull)
      .withColumn("__max_end", max(e).over(wPrev))
      // first interval of the key (null running max) starts an island
      .withColumn("__new_island",
        when(col("__max_end").isNull || s > col("__max_end"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCols.map(col) :+ col("__island"): _*)
      .agg(min(s).as("island_start"), max(e).as("island_end"),
        count(lit(1)).as("n_merged"))
      .select(keyCols.map(col)
        ++ Seq(col("island_start"), col("island_end"), col("n_merged")): _*)
  }

  /** Total covered time per key: island durations summed — the gaps-and-
    * islands headline ("how long was this key actually active"). Numeric
    * `start`/`end` (sum of `end - start` over islands). Same plan as
    * [[coalesce]] plus one key-sized aggregate. */
  def coveredDuration(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String): DataFrame =
    coalesce(df, keyCols, startCol, endCol)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("island_end") - col("island_start")).as("covered"),
        count(lit(1)).as("n_islands"))
}
