package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("BMP encode→decode round trip, including row-padding edge cases") {
    // widths where 3w % 4 = 0,1,2,3 exercise every padding remainder
    for (w <- Seq(1, 2, 3, 4, 5, 64); h <- Seq(1, 7, 64)) {
      val bytes = Multimodal.encodeBmp(w, h, seed = w * 100L + h)
      val rowSize = ((3 * w + 3) / 4) * 4
      assert(bytes.length == 54 + rowSize * h)
      val m = Multimodal.decode(9L, bytes)
      assert((m.width, m.height, m.n_frames, m.n_bytes) ==
        ((w.toLong, h.toLong, 1L, bytes.length.toLong)))
    }
  }

  test("PPM multi-frame encode→decode round trip") {
    for (frames <- Seq(1, 2, 8); w <- Seq(1, 10); h <- Seq(1, 13)) {
      val bytes = Multimodal.encodePpm(w, h, frames, seed = 7L)
      val header = s"P6\n$w $h\n255\n".length
      assert(bytes.length == (header + 3 * w * h) * frames)
      val m = Multimodal.decode(3L, bytes)
      assert((m.width, m.height, m.n_frames, m.n_bytes) ==
        ((w.toLong, h.toLong, frames.toLong, bytes.length.toLong)))
    }
  }

  test("decoder handles foreign PPM headers: comments, extra whitespace, top-down BMP") {
    // netpbm allows '#' comments and arbitrary whitespace between header tokens
    val raster = Array.fill[Byte](3 * 2 * 3)(42)
    val foreign = ("P6 # a comment\n  2 \t3 # dims\n 255\n").getBytes("US-ASCII") ++ raster
    val m = Multimodal.decode(1L, foreign)
    assert((m.width, m.height, m.n_frames) == ((2L, 3L, 1L)))
    // negative BMP height = top-down row order; magnitude is the height
    val bmp = Multimodal.encodeBmp(4, 5, seed = 1L)
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -5)
    assert(Multimodal.decode(2L, bmp).height == 5L)
  }

  test("malformed payloads throw instead of returning silent zeros") {
    intercept[IllegalArgumentException](Multimodal.decode(0L, Array[Byte]('X', 'Y', 0)))
    intercept[IllegalArgumentException](Multimodal.decode(0L, Array[Byte]('B')))
    // truncated BMP raster (declared 64x64, bytes end after the header)
    intercept[IllegalArgumentException](
      Multimodal.decode(0L, Multimodal.encodeBmp(64, 64, 0L).take(60)))
    // truncated PPM raster mid-frame
    intercept[IllegalArgumentException](
      Multimodal.decode(0L, Multimodal.encodePpm(8, 8, 2, 0L).dropRight(1)))
  }

  test("synthMedia payloads decode back to the documented dimension contract") {
    val docs = Seq((0L, "hello world"), (1L, "x"), (2L, ""), (3L, "émoji"),
      (64L, "wrap"), (65L, "a" * 200)).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.synthMedia(spark, docs),
      batchSize = 2).collect().sortBy(_.doc_id)
    for ((id, text) <- Seq((0L, "hello world"), (1L, "x"), (2L, ""), (3L, "émoji"),
        (64L, "wrap"), (65L, "a" * 200))) {
      val m = meta.find(_.doc_id == id).get
      assert(m.width == 1 + text.getBytes("UTF-8").length % 64, s"doc $id width")
      assert(m.height == 1 + id % 64, s"doc $id height")
      assert(m.n_frames == (if (id % 2 == 0) 1L else 1 + id % 8), s"doc $id frames")
    }
    // payload bytes really are parsed containers, not metadata passed along:
    // the empty-text doc still carries a full 1-wide BMP
    val payload2 = Multimodal.synthMedia(spark, docs)
      .filter($"doc_id" === 2L).as[MediaRow].head().payload
    assert(payload2.length == 54 + 4 * 3) // 1px row pads 3->4 bytes, h=3
    assert(payload2(0) == 'B' && payload2(1) == 'M')
  }

  test("arrow-columnar decode matches the row-batched decoder exactly") {
    // mixed sizes, empty text, non-ASCII, multiple partitions, and
    // batch sizes that do / don't divide the partition sizes
    val docs = ((0L until 97L).map(i => (i, ("wörd" + i + " ") * (i.toInt % 7)))
      :+ (97L -> "")).toDF("doc_id", "text")
    val media = Multimodal.synthMedia(spark, docs).repartition(5)
    for (bs <- Seq(1, 3, 64, 1024)) {
      val rowPath = Multimodal.decodeMeta(spark, media, batchSize = bs)
        .collect().sortBy(_.doc_id).toSeq
      val arrowPath = Multimodal.decodeMetaArrow(spark, media, batchSize = bs)
        .collect().sortBy(_.doc_id).toSeq
      assert(arrowPath == rowPath, s"batchSize=$bs")
    }
  }

  test("decoder batching: batches never exceed batchSize and cover all rows") {
    val docs = (0L until 103L).map(i => (i, "t" * (i.toInt % 5 + 1))).toDF("doc_id", "text")
    val media = Multimodal.synthMedia(spark, docs).repartition(3)
    val batchSizes = media.as[Multimodal.MediaRow].mapPartitions { it =>
      it.grouped(8).map(_.size)
    }.collect()
    assert(batchSizes.sum == 103)
    assert(batchSizes.forall(_ <= 8))
    val meta = Multimodal.decodeMeta(spark, media, batchSize = 8).collect()
    assert(meta.length == 103)
  }
}
