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

  /** COLUMNAR decoder over one Arrow batch (`VectorSchemaRoot` — the exact
    * object a `mapInArrow` decoder receives): payloads arrive as one
    * contiguous data buffer + offsets (VarBinaryVector), the zero-copy
    * layout a real vectorized codec (or a C-Data-handed native library)
    * reads directly. This stub mirrors [[stubDecode]] value-for-value; only
    * the access path differs. Returns a STRICT Seq — callers reuse the
    * root's buffers for the next batch. */
  def stubDecodeArrow(root: org.apache.arrow.vector.VectorSchemaRoot): Seq[MediaMeta] = {
    val ids = root.getVector("doc_id")
      .asInstanceOf[org.apache.arrow.vector.BigIntVector]
    val pay = root.getVector("payload")
      .asInstanceOf[org.apache.arrow.vector.VarBinaryVector]
    (0 until root.getRowCount).map { i =>
      // pay.get(i) materializes the slice only because the stub needs a
      // String; a real codec would read the ArrowBuf range in place
      stubDecode(Seq(MediaRow(ids.get(i), pay.get(i)))).head
    }
  }

  /** Arrow-columnar variant of [[decodeMeta]]: inside each partition, rows
    * are transposed into Arrow `VectorSchemaRoot` batches (BigIntVector ids +
    * VarBinaryVector payloads — the very batch a `mapInArrow` decoder would
    * receive) and decoded column-wise. Same results as the row-batched form
    * for every batchSize (spec-pinned); the reason this path exists is the
    * handoff shape: a real codec consumes the Arrow buffers without
    * per-row JVM object materialization, and the same root can cross the
    * C Data Interface to a native decoder. Allocator lifecycle is per
    * partition (one allocator, one root reused across batches), freed when
    * the partition drains and on failure. */
  def decodeMetaArrow(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
    media.as[MediaRow].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val alloc = new RootAllocator()
        val ids = new BigIntVector("doc_id", alloc)
        val pay = new VarBinaryVector("payload", alloc)
        val root = VectorSchemaRoot.of(ids, pay)
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; root.close(); alloc.close()
        }
        // Native Arrow memory must be freed even when the iterator is never
        // drained (limit/take, a downstream failure mid-partition): the
        // task-completion listener fires on every exit path. The drain-time
        // close below stays as the eager fast path.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        val out = it.grouped(batchSize).flatMap { rows =>
          try {
            ids.allocateNew(rows.size)
            pay.allocateNew()
            rows.zipWithIndex.foreach { case (r, i) =>
              ids.setSafe(i, r.doc_id)
              pay.setSafe(i, r.payload)
            }
            root.setRowCount(rows.size)
            stubDecodeArrow(root)
          } catch { case e: Throwable => closeAll(); throw e }
        }
        // free the partition's Arrow memory after the last batch drains
        new Iterator[MediaMeta] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeAll()
            h
          }
          def next(): MediaMeta = out.next()
        }
      }
    }
  }
}
