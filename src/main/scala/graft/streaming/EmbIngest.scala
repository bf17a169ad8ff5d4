package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming embedding ingest — the [[DocIngest]] pattern for vectors:
  * a JSONL file-drop of (vec_id, embedding) records, each micro-batch
  * folded into the at-rest IVF index by [[Similarity.ivfCommitBatch]]
  * under the batch-id-keyed protocol (batch 0 trains the coarse
  * quantizer on itself and swap-commits it; every batch then LSM-appends
  * cell-assigned vectors). The daemon therefore serves fresh ANN top-k
  * ([[Similarity.ivfTopKIndexed]]) at batch cost — one broadcast
  * centroid assignment over the batch, never a corpus re-assignment.
  *
  * With `compactEvery > 0`, every Nth batch also runs
  * [[Similarity.ivfCompact]] inside the same single-writer slot, so
  * per-cell fragment counts stay bounded over an unbounded batch
  * history — the full LSM contract, matching [[DocIngest]]'s index
  * compaction.
  *
  * Crash posture: file-source offsets checkpoint the stream; a replayed
  * batch re-delivers the same rows and the fold is idempotent per the
  * operator scaladoc. Single writer by the checkpoint's exclusivity.
  */
object EmbIngest {

  /** JSONL embedding-event schema for the file drop. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Start the streaming fold: JSONL drops -> per-batch ivfCommitBatch. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      indexPath: String, nlist: Int = 16, dim: Int = 64,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    spark.readStream.schema(embSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.ivfCommitBatch(spark, indexPath, batch, batchId,
          nlist = nlist, dim = dim)
        if (compactEvery > 0 && batchId % compactEvery == 0)
          Similarity.ivfCompact(spark, indexPath)
        ()
      }
      .start()
}
