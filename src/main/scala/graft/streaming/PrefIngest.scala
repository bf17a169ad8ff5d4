package graft.streaming

import graft.operators.Experiment
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming preference ingest — the [[DocIngest]] pattern for match/
  * comparison events (human preference labels, A/B winners, pairwise LLM
  * judgments): a JSONL file-drop of (winner, loser) records, each
  * micro-batch folded into at-rest Bradley–Terry state by
  * [[Experiment.btCommitBatch]] under the batch-id-keyed two-phase
  * protocol. The daemon therefore serves fresh strength scores at batch
  * cost — the additive matchup-count fold plus a few warm MM rounds —
  * never re-aggregating the match history.
  *
  * Crash posture: file-source offsets checkpoint the stream; a replayed
  * batch re-delivers the same rows, and the fold is idempotent per its
  * scaladoc (marker no-op or deterministic redo from the unswapped
  * state). Single writer by the streaming checkpoint's own exclusivity.
  */
object PrefIngest {

  /** JSONL match-event schema for the file drop. */
  val matchSchema: StructType = StructType(Seq(
    StructField("match_id", LongType),
    StructField("winner", StringType),
    StructField("loser", StringType)))

  /** Start the streaming fold: JSONL drops -> per-batch btCommitBatch. */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
      statePath: String, iters: Int = 2,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    spark.readStream.schema(matchSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Experiment.btCommitBatch(spark, statePath, batch, batchId,
          iters = iters)
        ()
      }
      .start()
}
