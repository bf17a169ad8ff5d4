package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout planning diagnostics — the operators a data engineer
  * runs BEFORE sizing a 100 TB job, answering "will this key skew, and
  * what does it cost to re-layout": a key-skew report with a salt
  * recommendation, and a reshard move-cost plan comparing the naive
  * mod layout against a range-stable one.
  *
  * Both are one-aggregate-plus-dimension-table shapes: the corpus is
  * touched once; everything after runs on the key/shard table.
  */
object Layout {

  /** Key-skew report for a prospective join/groupBy key: per-key count
    * quantiles, the heavy hitters, and the salt factor that would level
    * the hottest key across `parts` reducers —
    * salt_rec = ceil(max_cnt · parts / n_rows), the factor by which the
    * hot key exceeds the average partition's share (1 = no salt needed).
    *
    * One corpus-sized count aggregate; quantiles by the integer
    * target-rank rule over the KEY table (dimension-sized sort, the
    * q138 refinement is the swap-in if keys outgrow it); the
    * TakeOrderedAndProject top-k rows carry the global stats. Output:
    * (rank, key, cnt, share, n_rows, n_keys, p50_cnt, p90_cnt, p99_cnt,
    * max_cnt, salt_rec), share round-6, rank by (cnt desc, key asc). */
  def skewReport(df: DataFrame, keyCols: Seq[String], parts: Int,
      topK: Int = 10): DataFrame = {
    require(keyCols.nonEmpty && parts >= 1 && topK >= 1)
    val key = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").asc, col("key").asc)
    val ranked = counts.withColumn("rn", row_number().over(wRank).cast("long"))
    val tot = counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    def q(p: Int) = {
      val t = ranked.crossJoin(tot)
        .filter(col("rn") === expr(s"(n_keys * $p + 99) div 100"))
        .select(col("cnt").as(s"p${p}_cnt"))
      t
    }
    val stats = tot.crossJoin(q(50)).crossJoin(q(90)).crossJoin(q(99))
      .withColumn("salt_rec",
        expr("greatest(1L, (max_cnt * " + parts + "L + n_rows - 1) div n_rows)"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key").asc)).cast("long"))
      .crossJoin(stats)
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"),
        col("n_rows"), col("n_keys"), col("p50_cnt"), col("p90_cnt"),
        col("p99_cnt"), col("max_cnt"), col("salt_rec"))
  }

  /** Reshard move-cost plan: how many rows change shard when the shard
    * count goes oldN → newN under (a) the mod layout (shard = id % N —
    * most rows move unless newN is a multiple of oldN) and (b) a
    * consistent-hash ring (Karger et al., STOC'97): every shard owns the
    * arc up to its [[Sampling.unitHash]] token, a row belongs to the
    * first token at or after its own unit hash (wrapping), and growing
    * the cluster only moves the rows whose arc a NEW token claims —
    * expected share 1 − oldN/newN. The measured answer to "can we grow
    * the cluster without rewriting the corpus".
    *
    * Each shard places `vnodes` tokens (ids shard·131071 + k — the
    * virtual-node smoothing from the Dynamo lineage; with ONE token per
    * shard the unit hash's near-arithmetic spacing for sequential ids
    * clustered the ring so badly that a measured 8→12 growth moved 67%
    * of rows, worse than mod — vnodes=16 brings it to the theoretical
    * ~1 − oldN/newN).
    *
    * One narrow pass hashes each row; the ring assignment is a
    * broadcast cross join against the (oldN + newN)·vnodes-row token
    * table + one argmin aggregate — corpus × tokens, with tokens in the
    * hundreds. All arithmetic is the portable unit hash and IEEE double
    * subtraction; the argmin tie-breaks by (distance, shard), replayed
    * by the oracle as a rank window. Output: (strategy, n_rows,
    * n_moved, moved_share round-6). */
  def reshardPlan(df: DataFrame, idCol: String, oldN: Int, newN: Int,
      vnodes: Int = 16): DataFrame = {
    require(oldN >= 1 && newN >= 1 && oldN != newN && vnodes >= 1)
    val spark = df.sparkSession
    val id = col(idCol).cast("long")
    val rows = df.select(id.as("rid"), Sampling.unitHash(id).as("u"))
    def ring(n: Int, era: String) = spark.range(n.toLong * vnodes)
      .select((col("id") % n).as("shard"),
        Sampling.unitHash((col("id") % n) * 131071L + expr(s"id div $n"))
          .as("pos"),
        lit(era).as("era"))
    val toks = ring(oldN, "old").unionByName(ring(newN, "new"))
    val assigned = rows.crossJoin(broadcast(toks))
      .withColumn("d", when(col("pos") >= col("u"), col("pos") - col("u"))
        .otherwise(col("pos") - col("u") + 1.0))
      .groupBy("rid")
      .agg(min(when(col("era") === "old", struct(col("d"), col("shard"))))
          .getField("shard").as("old_shard"),
        min(when(col("era") === "new", struct(col("d"), col("shard"))))
          .getField("shard").as("new_shard"))
    assigned
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("rid") % oldN =!= col("rid") % newN, 1L).otherwise(0L))
          .as("mod_moved"),
        sum(when(col("old_shard") =!= col("new_shard"), 1L).otherwise(0L))
          .as("ring_moved"))
      .select(explode(array(
        struct(lit("mod").as("strategy"), col("n_rows"),
          col("mod_moved").as("n_moved")),
        struct(lit("ring").as("strategy"), col("n_rows"),
          col("ring_moved").as("n_moved")))).as("s"))
      .select(col("s.strategy").as("strategy"), col("s.n_rows").as("n_rows"),
        col("s.n_moved").as("n_moved"),
        round(col("s.n_moved").cast("double")
          / col("s.n_rows").cast("double"), 6).as("moved_share"))
  }
}
