package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: attach to each left row the latest right row with
  * the same key and `ts_right <= ts_left` — the standard "state at event
  * time" join (calibration readings, user-profile versions, model snapshots).
  *
  * Spark has no asof join; rather than a custom SparkPlan, this composes
  * built-ins the scalable way: union both sides, one window per key ordered
  * by (ts, side) carrying the latest right ROW forward as a single struct,
  * keep left rows. One shuffle on the key, fully parallel across keys,
  * codegen window — semantically identical to DuckDB's native ASOF LEFT JOIN
  * (the q47 oracle), including:
  *  - inclusive ts ties (the right side sorts before the left at equal ts);
  *  - NULL payload values in the matched right row stay NULL (the whole row
  *    is carried atomically — no per-column carry that could resurrect stale
  *    values or mix columns from different right rows);
  *  - NULL keys never match (SQL equality): null-key right rows are dropped,
  *    null-key left rows get null payload.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate otherwise (as the
  * q47 query does); with duplicates the winner depends on partition order.
  */
object AsOfJoin {

  /** @param left      rows to annotate; must contain keyCol and tsCol
    * @param right     state rows; must contain keyCol, tsCol, and payload cols
    * @param payload   right columns to carry (null when no prior state) */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val reserved = Seq("_side", "_p") ++ payload.map(c => s"asof_$c")
    require(!left.columns.exists(reserved.contains),
      s"left columns collide with asOf internals/outputs: " +
        left.columns.filter(reserved.contains).mkString(", "))

    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))))
    val r = right
      .filter(col(keyCol).isNotNull) // NULL keys never match in SQL equality
      .select((keyCol +: tsCol +: payload).map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_p", struct(payload.map(col): _*))
      .drop(payload: _*)
    // align columns: right side gets nulls for the left-only columns
    val leftOnly = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val rAligned = leftOnly.foldLeft(r) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rAligned)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c =>
        when(col(keyCol).isNull, lit(null)).otherwise(col(s"_asof.$c")).as(s"asof_$c")): _*)
  }
}
