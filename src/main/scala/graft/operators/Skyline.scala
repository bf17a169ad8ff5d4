package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) of a point set under two minimized dimensions
  * (Börzsönyi, Kossmann & Stocker, "The Skyline Operator", ICDE 2001 —
  * re-derived as DataFrame plans): keep every point no other point
  * dominates, where q dominates p iff q.x <= p.x AND q.y <= p.y and q is
  * strictly better in at least one dimension. The multi-objective
  * shortlist ("cheapest AND smallest", "highest quality AND shortest")
  * that replaces two correlated ORDER BY ... LIMIT queries.
  *
  * Physical shape — never the quadratic NOT EXISTS self-join:
  *
  *  1. Collapse to one row per DISTINCT X with that x's minimum y (hash
  *     aggregate, map-side combine — the corpus-sized pass).
  *  2. Running strict-prefix minimum over the distinct-x table ordered by
  *     x: prevMin(x) = min minY over all x' < x. A point's cross-x
  *     domination test needs ONLY this value: some q with q.x < p.x and
  *     q.y <= p.y exists iff prevMin(p.x) <= p.y.
  *  3. Join back (on x, both sides x-keyed): p survives iff
  *     (prevMin is null OR prevMin > y) — no strictly-cheaper point is as
  *     small — AND y == minY(x) — no equal-x point is strictly smaller.
  *     Equal (x, y) duplicates dominate nothing and both survive,
  *     matching the dominance definition.
  *
  * The window in step 2 runs on the distinct-x table only — fine up to
  * millions of distinct values (the recursive bucketing of
  * Audit.gapDetails is the drop-in fix beyond that); every corpus-sized
  * stage is a hash aggregate or an equi join. The oracle runs the plain
  * quadratic NOT EXISTS, so a green hash proves the prefix-min rewrite
  * loses no point and admits no dominated one.
  *
  * Output: (idCol, xCol, yCol), the skyline only. */
object Skyline {

  def skyline2D(points: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val pts = points.select(col(idCol).as("__id"),
      col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
    val perX = pts.groupBy("__x").agg(min("__y").as("__minY"))
    val w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    val withPrev = perX.withColumn("__prevMin", min("__minY").over(w))
    pts.join(withPrev, Seq("__x"))
      .filter((col("__prevMin").isNull || col("__prevMin") > col("__y")) &&
        col("__y") === col("__minY"))
      .select(col("__id").as(idCol), col("__x").as(xCol), col("__y").as(yCol))
  }
}
