package graft.operators

import graft.functions.PortableHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based frequency estimation: a count-min sketch over the corpus
  * token stream, with heavy-hitter extraction. The streaming-friendly
  * answer to "what are the most frequent tokens / domains / shingles"
  * when the exact groupBy's key space (every distinct token in 100 TB of
  * text) is itself too large to want materialized.
  *
  * The sketch is a depth x width counter grid: counter(i, b) = number of
  * token occurrences with h_i(token) mod width == b. Estimates read
  * min_i counter(i, h_i(t)) — always >= the true count, inflated only by
  * collisions (error <= 2N/width with prob 1 - 2^-depth).
  *
  * Scale shape: the grid build is an explode of `depth` (row, bucket)
  * entries per token occurrence into a hash aggregate — map-side partial
  * aggregation collapses every partition to <= depth*width rows BEFORE the
  * shuffle, so the exchange carries sketch-sized data regardless of corpus
  * size (the whole point of a sketch). The estimate join broadcasts the
  * depth*width-row grid. Hash family: the portable MinHash row hashes
  * ([[PortableHashes.minhashGramHashes]]) so the DuckDB oracle replays the
  * grid bit-for-bit; the xxhash64 family stays the production default
  * elsewhere.
  */
object Sketches {

  /** The count-min grid: (row, bucket, cnt), depth*width cells max. */
  def cmsBuild(docs: DataFrame, depth: Int, width: Int,
      textCol: String = "text"): DataFrame = {
    val tok = docs.select(explode(split(col(textCol), " ")).as("token"))
    val cells = PortableHashes.minhashGramHashes(col("token"), depth)
      .zipWithIndex.map { case (h, i) =>
        struct(lit(i.toLong).as("row"), (h % lit(width.toLong)).as("bucket"))
      }
    tok.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Heavy hitters: top `k` candidate tokens by CMS-estimated count, with
    * the exact count alongside (est >= exact always; equality when none of
    * the token's depth cells collided). Candidates here are the corpus's
    * distinct tokens; at 100 TB the candidate set would come from a cheap
    * pre-filter (sampled tokens, a per-partition top-m), never from
    * materializing every distinct key — the sketch itself is the point.
    * Output: (token, est, exact, rank), ties broken by token. */
  def cmsTopK(docs: DataFrame, depth: Int = 4, width: Int = 1024, k: Int = 20,
      textCol: String = "text"): DataFrame = {
    val sketch = cmsBuild(docs, depth, width, textCol)
    val exact = docs.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact"))
    val cells = PortableHashes.minhashGramHashes(col("token"), depth)
      .zipWithIndex.map { case (h, i) =>
        struct(lit(i.toLong).as("row"), (h % lit(width.toLong)).as("bucket"))
      }
    val probes = exact.select(col("token"), col("exact"),
      explode(array(cells: _*)).as("c"))
      .select(col("token"), col("exact"),
        col("c.row").as("row"), col("c.bucket").as("bucket"))
    val est = probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("token", "exact").agg(min(col("cnt")).as("est"))
    val top = est.orderBy(col("est").desc, col("token").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("est").desc, col("token").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select("token", "est", "exact", "rank")
  }
}
