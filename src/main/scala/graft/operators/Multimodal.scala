package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed by a batched per-partition "decoder".
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub ([[stubDecode]]); everything around it —
  * the schema (binary payload + metadata struct), the partition-level batching
  * shape (decoders amortize model/codec init per batch, like an mapInPandas /
  * mapInArrow decoder would), and the typed Dataset plumbing — is real and
  * tested. Swapping [[stubDecode]] for a JNI/codec call changes nothing else.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long)

  /** Attach a binary payload column (here derived from text — stands in for
    * image/audio bytes) plus source metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: deterministic fake feature extraction — the fake features
    * derive from the first two Unicode code points of the UTF-8 payload (not
    * raw bytes, so the DuckDB oracle's ascii() mirror holds for non-ASCII
    * payloads too). A real build replaces this body with the actual codec
    * call; signature and batch shape stay identical. */
  def stubDecode(batch: Seq[MediaRow]): Seq[MediaMeta] =
    batch.map { r =>
      val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      val c0 = if (text.nonEmpty) text.codePointAt(0) else 0
      val c1 = if (text.codePointCount(0, text.length) > 1)
        text.codePointAt(text.offsetByCodePoints(0, 1)) else 0
      MediaMeta(r.doc_id, r.payload.length.toLong,
        1L + c0 % 64, 1L + c1 % 64, 1L + r.payload.length % 8)
    }

  /** Batched per-partition decode: groups rows into fixed-size batches inside
    * each partition (the shape a vectorized decoder needs), no shuffle. */
  def decodeMeta(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => stubDecode(g.toSeq))
    }
  }
}
