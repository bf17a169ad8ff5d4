package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality over an edge list — the quality-propagation primitive a
  * training-data pipeline uses to rank entities (hosts by link graph,
  * suppliers by order graph) before sampling or weighting by importance.
  *
  * PageRank as pure DataFrame plans: a FIXED number of power-iteration
  * rounds, each one join (ranks onto the edge list's src) plus one
  * aggregate (contribution sum per dst). No driver-side state beyond the
  * node count N (one scalar, the catalog-statistic analogue), no RDDs, no
  * mutable accumulators.
  *
  * Scale shape: per round the EDGE list is the big side and it shuffles on
  * src for the join — at rest the edge table would be bucketed/partitioned
  * by src so only the (node-sized) rank table moves. The contribution
  * aggregate partial-combines map-side, so the exchange carries one row per
  * (partition, dst). Rounds are fixed (power iteration converges
  * geometrically in the damping factor; 5 rounds ≈ 0.85^5 = 44% residual,
  * the standard "importance sketch" regime — callers wanting convergence
  * raise `iters`).
  *
  * The edge list and the degree table are each computed ONCE: persisted,
  * then re-wrapped as a LogicalRDD lineage barrier, so every round's join
  * reads the cache instead of re-deriving the caller's (possibly expensive)
  * edge plan — without the barrier the fold embeds that subtree 2x per
  * round (44 parquet scans at iters=5 on the q69 pipeline). The round fold
  * itself stays composed (~4 ops per round, no analyzer blowup through 20
  * rounds), and the result is materialized off the caches via a reliable
  * checkpoint so both persisted inputs are freed on return — nothing
  * outlives the call (the q53 leak lesson).
  *
  * Bit-stability for the oracle: rank is FIXED-POINT — a long count of
  * 1e-15 units. Every step is integer arithmetic (integer division for the
  * per-edge share, exact long SUM for the gather, integer damping as
  * `pct/100`), so the whole iteration is exact, order-independent under any
  * partial-aggregation schedule, and replayable verbatim by any engine with
  * 64-bit integers — no IEEE rounding to tie-break. The floor in each
  * division loses < 1e-15 per contribution (bounded by in-degree × 1e-15
  * per node per round — noise for an importance ranking). The damping
  * factor is quantized to hundredths so `d·x` stays integral.
  *
  * Contract: the input edge list must be dangling-free — every node
  * reachable as a dst must also appear as a src (a symmetrized/undirected
  * graph satisfies this; see [[symmetrize]]). Dangling dst nodes would
  * leak rank mass and, worse for determinism, drop out of the next round's
  * join. Self-loops are legal.
  */
object Graph {

  /** 1.0 of rank mass in fixed-point units (1e-15 granularity; total mass
    * across all nodes ≤ SCALE, so every intermediate fits a long with
    * ~3 decimal orders of headroom even after the ×damping-pct step). */
  val Scale: Long = 1000000000000000L

  /** Undirect a directed edge list: each distinct (src, dst) emitted both
    * ways. Distinct FIRST, so a directed duplicate cannot double an edge's
    * weight; an edge present in both directions stays deduplicated. */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** `iters` power-iteration rounds of PageRank with damping `d` (quantized
    * to hundredths):
    *   r_{k+1}(v) = (1-d)/N + d * sum over in-edges (u,v) of r_k(u)/deg(u)
    * computed entirely in 1e-15 fixed-point integer units. Output:
    * (node, deg, rank) — rank after the final round as a double, derived by
    * one deterministic `units / 1e15` division. */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val dPct = math.round(damping * 100).toInt
    require(dPct > 0 && dPct < 100, s"damping must quantize into (0,1) hundredths, got $damping")
    val spark = edges.sparkSession
    val eCache = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val degCache = eCache.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N via one scalar collect — the catalog-statistic analogue (same
    // pattern as BM25's corpus constants); folded into the per-round
    // expression as a plan-time literal. This one job also materializes
    // both caches (deg derives from the edge cache).
    val n = degCache.count()
    if (n == 0) { // empty graph: free the (empty) caches before failing
      eCache.unpersist(); degCache.unpersist()
      throw new IllegalArgumentException("pageRank on an empty edge list")
    }
    val e = spark.createDataFrame(eCache.rdd, eCache.schema)
    val deg = spark.createDataFrame(degCache.rdd, degCache.schema)
    val baseU = (100L - dPct) * Scale / (100L * n) // (1-d)/N in units, floored
    val r0 = deg.select(col("node"), col("deg"), lit(Scale / n).as("ru"))
    val ranked = (1 to iters).foldLeft(r0) { (ranks, _) =>
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(e("dst").as("node"), expr("ru div deg").as("c"))
      val sums = contrib.groupBy("node").agg(sum(col("c")).as("sc"))
      // every node has an in-edge under the dangling-free contract, so the
      // join on deg is complete — no node silently loses its rank row
      sums.join(deg, "node").select(col("node"), col("deg"),
        (lit(baseU) + expr(s"($dPct * sc) div 100")).as("ru"))
    }.select(col("node"), col("deg"),
      (col("ru").cast("double") / lit(Scale.toDouble)).as("rank"))
    // Materialize the (node-sized) result OFF the caches so both persisted
    // inputs can be freed here — a per-batch caller must not accumulate
    // edge-sized caches for the life of the session.
    graft.util.Checkpoints.ensureDir(spark)
    val out = ranked.checkpoint(eager = true)
    eCache.unpersist()
    degCache.unpersist()
    out
  }
}
