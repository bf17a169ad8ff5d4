package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload metadata extraction through the batched decoder") {
    val docs = Seq((0L, "hello world"), (1L, "x"), (2L, ""), (3L, "émoji"))
      .toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.withPayload(docs), batchSize = 2)
      .collect().sortBy(_.doc_id)
    assert(meta(0).n_bytes == 11)
    assert(meta(0).width == 1 + 'h' % 64 && meta(0).height == 1 + 'e' % 64)
    assert(meta(0).n_frames == 1 + 11 % 8)
    assert(meta(1).n_bytes == 1 && meta(1).height == 1) // missing 2nd char -> c1=0
    assert(meta(2).n_bytes == 0 && meta(2).width == 1)  // empty payload
    // non-ASCII: features come from code points (= DuckDB ascii()), bytes from UTF-8
    assert(meta(3).n_bytes == 6)
    assert(meta(3).width == 1 + 0xE9 % 64 && meta(3).height == 1 + 'm' % 64)
  }

  test("arrow-columnar decode matches the row-batched decoder exactly") {
    // mixed sizes, empty payloads, non-ASCII, multiple partitions, and
    // batch sizes that do / don't divide the partition sizes
    val docs = ((0L until 97L).map(i => (i, ("wörd" + i + " ") * (i.toInt % 7)))
      :+ (97L -> "")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs).repartition(5)
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
    val media = Multimodal.withPayload(docs).repartition(3)
    import spark.implicits._
    val batchSizes = media.as[Multimodal.MediaRow].mapPartitions { it =>
      it.grouped(8).map(_.size)
    }.collect()
    assert(batchSizes.sum == 103)
    assert(batchSizes.forall(_ <= 8))
    val meta = Multimodal.decodeMeta(spark, media, batchSize = 8).collect()
    assert(meta.length == 103)
  }
}
