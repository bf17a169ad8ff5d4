package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-capacity context
  * windows ("bins") for training-batch construction. Documents are packed in
  * doc-id order; a document opens a new bin when it does not fit in the
  * current one, and a document longer than the capacity occupies a bin alone
  * (it is never split).
  *
  * Packing is a sequential fold — bin state depends on every earlier doc —
  * so it is not expressible as a window function. The scale design bounds
  * the sequential unit to a caller-chosen PACK GROUP (e.g.
  * `concat(source, '#', doc_id div shardSize)`): groups pack independently
  * and in parallel via `flatMapGroups`, and the per-task state is one
  * group's (id, n_tokens) list, bounded by the group design, never the
  * corpus. A 100 TB run packs millions of groups across the cluster; the
  * group key doubles as the shuffle key, one exchange total.
  */
object Packing {

  /** Pack each `groupCol` group greedily in ascending `idCol` order.
    * Output: (groupCol, idCol, n_tokens, bin_id), bin_id 0-based per group.
    * `nTokensCol` is the document's token count (>= 1 for any non-null
    * text under whitespace tokenization). */
  def packGreedy(df: DataFrame, groupCol: String, idCol: String,
      nTokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(nTokensCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        // sort within the group: flatMapGroups guarantees no iteration
        // order, and the group is bounded by the pack-group design
        val docs = it.map { case (_, id, n) => (id, n) }.toArray.sortBy(_._1)
        var bin = 0L
        var used = 0L
        docs.iterator.map { case (id, n) =>
          if (used > 0 && used + n > capacity) { bin += 1; used = 0L }
          used += n
          (g, id, n, bin)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "bin_id")
  }

  /** Packing-efficiency report over [[packGreedy]] output, per pack group:
    * bin count, doc count, token total, and fill ratio against `capacity`
    * in exact parts-per-million (can exceed 1e6 when a single oversize doc
    * overflows its bin — greedy packing never splits documents). The number
    * a capacity sweep optimizes: utilization near 1e6 means few padding
    * tokens wasted per context window. Integer ppm, not a rounded double,
    * because fill ratios are small binary fractions (denominator
    * n_bins * capacity) that land EXACTLY on decimal rounding ties, where
    * round-half-up and round-half-even engines disagree; floor division is
    * identical everywhere. One partial-agg shuffle; one row per group. */
  def packStats(packed: DataFrame, groupCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    packed.groupBy(groupCol).agg(
        (max("bin_id") + 1).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("utilization_ppm",
        expr(s"(n_tokens * 1000000L) div (n_bins * ${capacity}L)"))
  }
}
