package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality constraint audit: declarative checks (null rate, key
  * uniqueness, referential integrity, value ranges) evaluated as plain
  * aggregates, unioned into one `(constraint, violations, total,
  * violation_rate)` report — the load-time gate a warehouse runs before
  * promoting a batch (the assertion layer Great Expectations / deequ
  * provide, re-expressed as four Catalyst aggregate shapes).
  *
  * Every check is a single pass over its table: counts and conditional
  * counts partial-aggregate map-side, so each report row costs one
  * word-count-shaped exchange at most. [[uniqueKey]] is the one check
  * that shuffles keys (exact distinct); its scaladoc names the
  * `approx_count_distinct` downgrade for when the key space itself is the
  * thing that doesn't fit. [[foreignKey]] is a left-anti join — broadcast
  * when the parent's key side is small, co-partitioned hash otherwise,
  * Catalyst's choice. The report union is a union of 1-row frames.
  *
  * `violation_rate` is rounded to 6 decimals; a check over an empty table
  * reports 0 violations / 0 total / 0.0 rate (gates treat "no rows" as its
  * own signal, not a divide-by-zero).
  */
object Dq {

  private def rate(v: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.Column) =
    round(when(t === 0L, lit(0.0))
      .otherwise(v.cast("double") / t.cast("double")), 6)

  private def report(name: String, violations: org.apache.spark.sql.Column,
      total: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
    df.agg(violations.as("violations"), total.as("total"))
      .select(lit(name).as("constraint"), col("violations"), col("total"),
        rate(col("violations"), col("total")).as("violation_rate"))

  /** Null-rate check: violations = rows where `c` is null. */
  def notNull(df: DataFrame, c: String): DataFrame =
    report(s"not_null($c)",
      count(when(col(c).isNull, 1)), count(lit(1)))(df)

  /** Key-uniqueness check: violations = rows in excess of one per
    * duplicated key (so a clean table reports 0, and the count is "rows
    * you would drop to deduplicate"). Null-keyed rows count as violations
    * (a key with nulls identifies nothing). Exact distinct shuffles the
    * key space once; at 100 TB swap the count_distinct for
    * approx_count_distinct when an estimated excess suffices. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "uniqueKey needs key columns")
    val nonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val k = struct(keyCols.map(col): _*)
    report(s"unique(${keyCols.mkString(",")})",
      count(lit(1)) - count_distinct(when(nonNull, k)),
      count(lit(1)))(df)
  }

  /** Referential-integrity check: violations = child rows whose `fk` value
    * (non-null) has no match in `parent(pk)` — orphans. Null fks are NOT
    * violations here (that's [[notNull]]'s job; SQL FK semantics). */
  def foreignKey(child: DataFrame, fk: String, parent: DataFrame,
      pk: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("t"))
    val orphans = child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk)).distinct(),
        child(fk) === parent(pk), "left_anti")
      .agg(count(lit(1)).as("v"))
    orphans.crossJoin(total)
      .select(lit(s"foreign_key($fk->$pk)").as("constraint"),
        col("v").as("violations"), col("t").as("total"),
        rate(col("v"), col("t")).as("violation_rate"))
  }

  /** Range check: violations = non-null values outside `[lo, hi]`. Nulls
    * pass (again [[notNull]]'s job). */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    report(s"in_range($c,$lo,$hi)",
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)),
      count(lit(1)))(df)

  /** Stack individual checks into one report frame. */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    checks.reduce(_.unionByName(_))
  }

  /** Numeric column profile — the one-pass table summary (per column:
    * counts, nulls, exact distincts, range, round-6 mean) a warehouse
    * publishes next to every table. One melt (a row per (row, column)) +
    * ONE word-count-shaped aggregate; the exact distinct is the only
    * key-sized term (the [[graft.plans.ApproxDistinctRewrite]] conf is the
    * documented swap-in when a column's value space itself doesn't fit).
    * min/max are raw doubles (exact, portable); mean is a DECIMAL(18,6)
    * sum over non-nulls divided once. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("double").as("v"))): _*)).as("m"))
      .select(col("m.column").as("column"), col("m.v").as("v"))
    melted.groupBy("column")
      .agg(count(lit(1)).as("n"),
        count(when(col("v").isNull, 1)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(col("v").cast("decimal(18,6)")).as("sv"),
        count(col("v")).as("nv"))
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_v"), col("max_v"),
        round(col("sv").cast("double") / col("nv").cast("double"), 6)
          .as("mean_v"))
  }

  /** Benford first-digit conformance per group — the classic synthetic- /
    * tampered-data smell test (Benford '38; Nigrini's audit practice):
    * naturally occurring multi-magnitude amounts put digit d first with
    * probability log10(1 + 1/d); fabricated or clipped data doesn't.
    *
    * The amount is read as integer cents (`round(value·100)` cast to
    * BIGINT) and the leading digit taken from the integer's decimal string
    * — integer-to-string is bit-portable across engines where
    * double-to-string is not. Non-positive amounts are excluded (no
    * leading digit). One word-count-shaped aggregate (per-(group, digit)
    * counts, map-side combined, ≤ 9 rows per group on the exchange);
    * shares and deviations evaluate on the 9-row-per-group table.
    *
    * Output: (group, digit, n, share, expected, dev) — share and dev
    * rounded to 6; dev = share − expected, the per-digit excess a
    * reviewer scans for spikes. Absent digits report n=0 rows via the
    * dense digit grid so every group shows all 9 rows. */
  def benfordReport(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100.0, 0).cast("long")
    val obs = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0.0)
      .select(col(groupCol).cast("string").as("grp"),
        substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("grp", "digit").agg(count(lit(1)).as("ct"))
    val totals = obs.groupBy("grp").agg(sum(col("ct")).as("tot"))
    val grid = totals.select(col("grp"), col("tot"),
      explode(sequence(lit(1), lit(9))).as("digit"))
    grid.join(obs, Seq("grp", "digit"), "left")
      .select(col("grp"), col("digit"),
        coalesce(col("ct"), lit(0L)).as("n"),
        round(coalesce(col("ct"), lit(0L)).cast("double") /
          col("tot").cast("double"), 6).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("expected"))
      .withColumn("dev", round(col("share") - col("expected"), 6))
  }

  /** Categorical balance report: Shannon entropy per column — the
    * data-card line that says whether a mixture dimension (language,
    * source, label) is balanced or collapsed onto one value. Normalized
    * entropy = H/ln(k) ∈ [0,1] (1 = uniform over the observed values,
    * 0 = a single value; defined 0 when k = 1).
    *
    * One melt + two word-count-shaped aggregates per column — the
    * numericProfile stance; nothing wider than (column, value) reaches
    * an exchange. Entropy terms −p·ln p are round-6 doubles summed as
    * DECIMAL(38,6). Output: (column, n_rows, n_values, top_share,
    * entropy, norm_entropy). */
  def balanceReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "balanceReport needs columns")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
      .as("m"))
      .select(col("m.column").as("column"), col("m.value").as("value"))
      .filter(col("value").isNotNull)
    val counts = melted.groupBy("column", "value").agg(count(lit(1)).as("ct"))
    val tot = counts.groupBy("column").agg(sum(col("ct")).as("n_rows"),
      count(lit(1)).as("n_values"), max(col("ct")).as("top_ct"))
    val p = col("ct").cast("double") / col("n_rows").cast("double")
    counts.join(tot, "column")
      .select(col("column"), col("n_rows"), col("n_values"), col("top_ct"),
        round(-p * log(p), 6).cast("decimal(38,6)").as("term"))
      .groupBy("column", "n_rows", "n_values", "top_ct")
      .agg(sum(col("term")).cast("double").as("h"))
      .select(col("column"), col("n_rows"), col("n_values"),
        round(col("top_ct").cast("double") / col("n_rows").cast("double"), 6)
          .as("top_share"),
        round(col("h"), 6).as("entropy"),
        when(col("n_values") > 1,
          round(col("h") / log(col("n_values").cast("double")), 6))
          .otherwise(0.0).as("norm_entropy"))
  }
}
