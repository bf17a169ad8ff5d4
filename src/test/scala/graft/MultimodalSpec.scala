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
    val fixture = Seq((0L, "hello world"), (1L, "x"), (6L, ""), (3L, "émoji"),
      (64L, "wrap"), (65L, "a" * 200))
    val docs = fixture.toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.synthMedia(spark, docs),
      batchSize = 2).collect().sortBy(_.doc_id)
    for ((id, text) <- fixture) {
      val m = meta.find(_.doc_id == id).get
      assert(m.width == 1 + text.getBytes("UTF-8").length % 64, s"doc $id width")
      assert(m.height == 1 + id % 64, s"doc $id height")
      assert(m.n_frames == (if (id % 2 == 0) 1L else 1 + id % 8), s"doc $id frames")
    }
    // payload bytes really are parsed containers, not metadata passed along:
    // the empty-text doc still carries a full 1-wide BMP
    val payload6 = Multimodal.synthMedia(spark, docs)
      .filter($"doc_id" === 6L).as[MediaRow].head().payload
    assert(payload6.length == 54 + 4 * 7) // 1px row pads 3->4 bytes, h=7
    assert(payload6(0) == 'B' && payload6(1) == 'M')
  }

  test("synthMedia plants one near-dup 32×32 BMP pair per 16-id block") {
    // ids ≡ 2 and ≡ 4 (mod 16) share a block seed; the ≡ 4 member is
    // perturbed at two aHash lattice sites, so the pair sits at a SMALL
    // NONZERO Hamming distance — the positive case the pigeonhole join
    // fixture needs — while different blocks stay uncorrelated (far apart)
    val docs = Seq((2L, "plant a"), (4L, "plant b, different text"),
      (18L, "next block"), (20L, "x")).toDF("doc_id", "text")
    val media = Multimodal.synthMedia(spark, docs)
    val meta = Multimodal.decodeMeta(spark, media).collect().sortBy(_.doc_id)
    for (m <- meta)
      assert((m.width, m.height, m.n_frames) == ((32L, 32L, 1L)), s"doc ${m.doc_id}")
    val hashes = Multimodal.imageHashes(spark, media).collect()
      .map(h => h.doc_id -> h.ahash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    // both planted pairs stay within the join's maxDist; the perturbation
    // only moves bits whose forced-white sample was previously below the
    // mean, so an individual pair may land at 0 (block 1 does, block 0
    // does not — both deterministic under the fixed block seeds)
    assert(ham(2L, 4L) > 0 && ham(2L, 4L) <= 6, s"block-0 pair ${ham(2L, 4L)}")
    assert(ham(18L, 20L) <= 6, s"block-1 pair ${ham(18L, 20L)}")
    assert(ham(2L, 18L) > 6, "cross-block hashes must stay uncorrelated")
    // the planted pair differs ONLY at the two perturbed lattice sites:
    // payload bytes are otherwise identical
    val payloads = media.as[MediaRow].collect().map(r => r.doc_id -> r.payload).toMap
    val diff = payloads(2L).zip(payloads(4L)).count { case (a, b) => a != b }
    assert(diff > 0 && diff <= 6, s"pair must differ in at most 2 pixels ($diff bytes)")
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

  /** A BMP whose pixel bytes are remapped through `f` — the near-dup
    * fixture builder (perturb pixels of a real container). */
  private def remappedBmp(seed: Long, w: Int, h: Int)(f: Int => Int): Array[Byte] = {
    val p = Multimodal.encodeBmp(w, h, seed).clone()
    val rowSize = ((3 * w + 3) / 4) * 4
    for (row <- 0 until h; i <- 0 until 3 * w) {
      val pos = 54 + row * rowSize + i
      p(pos) = f(p(pos) & 0xFF).toByte
    }
    p
  }

  test("aHash: invariant to uniform brightness shift; flips under inversion") {
    val base = remappedBmp(7L, 20, 12)(v => v & 0x7F) // headroom for +40
    val bright = remappedBmp(7L, 20, 12)(v => (v & 0x7F) + 40)
    val inverted = remappedBmp(7L, 20, 12)(v => 127 - (v & 0x7F))
    def h(p: Array[Byte]): Long = {
      val (w, hh, g) = Multimodal.grayGrid(1L, p)
      Multimodal.aHash(w, hh, g)
    }
    assert(h(base) == h(bright), "brightness must not move any bit")
    // inversion flips above-mean to below-mean for every strict sample
    assert(java.lang.Long.bitCount(h(base) ^ h(inverted)) > 20)
  }

  test("aHash: BMP and PPM grids decode to the declared pixel order") {
    // 2x2 PPM, grays (sum of RGB): tl=3, tr=300, bl=600, br=765
    val px = Array(1, 1, 1, 100, 100, 100, 200, 200, 200, 255, 255, 255)
      .map(_.toByte)
    val ppm = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    val (w, h, g) = Multimodal.grayGrid(5L, ppm)
    assert((w, h) == ((2, 2)) && g.toSeq == Seq(3, 300, 600, 765))
    // same grid as a BMP (bottom-up, BGR, padded): must decode identically
    val bmp = Multimodal.encodeBmp(2, 2, seed = 1L).clone()
    val rowSize = ((3 * 2 + 3) / 4) * 4
    // file row 0 = image bottom row: bl, br; file row 1 = tl, tr
    val bytes = Seq(200, 200, 200, 255, 255, 255, 1, 1, 1, 100, 100, 100)
    for (row <- 0 until 2; i <- 0 until 6)
      bmp(54 + row * rowSize + i) = bytes(row * 6 + i).toByte
    val (_, _, g2) = Multimodal.grayGrid(6L, bmp)
    assert(g2.toSeq == Seq(3, 300, 600, 765))
  }

  test("imageNearDupPairs: equals brute-force Hamming pairs on crafted images") {
    // three clusters: (1, 2) near-identical, (3) inverted, (4, 5) other seed
    val payloads = Seq(
      1L -> remappedBmp(7L, 20, 12)(v => v & 0x7F),
      2L -> remappedBmp(7L, 20, 12)(v => (v & 0x7F) + 10),
      3L -> remappedBmp(7L, 20, 12)(v => 127 - (v & 0x7F)),
      4L -> remappedBmp(99L, 16, 16)(identity),
      5L -> remappedBmp(99L, 16, 16)(v => math.min(255, v + 2)))
    val hashes = payloads.map { case (id, p) =>
      val (w, h, g) = Multimodal.grayGrid(id, p)
      id -> Multimodal.aHash(w, h, g)
    }
    val maxDist = 6
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
    } yield (a, b, d.toLong)).toSet
    assert(want.exists { case (a, b, _) => (a, b) == ((1L, 2L)) },
      "test premise: the brightness-shifted pair must be a near dup")
    val df = hashes.toSeq.map { case (id, h) => (id, h) }.toDF("doc_id", "ahash")
    val got = Multimodal.imageNearDupPairs(df, maxDist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"got $got want $want")
    // partitioning invariance
    val got13 = Multimodal.imageNearDupPairs(df.repartition(13), maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got13 == want)
  }

  test("imageHashes: end-to-end over synthesized media, deterministic") {
    val docs = (0L until 40L).map(i => (i, "txt" * (i.toInt % 7 + 1)))
      .toDF("doc_id", "text")
    val media = Multimodal.synthMedia(spark, docs)
    val a = Multimodal.imageHashes(spark, media).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.imageHashes(spark, media.repartition(5))
      .collect().sortBy(_.doc_id).toSeq
    assert(a == b && a.size == 40)
    // dims agree with the metadata decoder
    val meta = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.doc_id -> ((m.width, m.height))).toMap
    a.foreach(x => assert((x.width, x.height) == meta(x.doc_id)))
  }

  test("aHashFromPixels: bit-identical to the JVM aHash loop, both formats") {
    // wide spread of dims so lattice clamping, bit 63, and both codecs
    // (even=BMP, odd=PPM) are all exercised
    val docs = (0L until 80L).map(i => (i, "wxyz" * (i.toInt % 17 + 1)))
      .toDF("doc_id", "text")
    val media = Multimodal.synthMedia(spark, docs)
    val jvm = Multimodal.imageHashes(spark, media).collect()
      .map(h => h.doc_id -> ((h.ahash, h.width, h.height))).toMap
    val px = Multimodal.grayPixels(spark, media)
    val cols = Multimodal.aHashFromPixels(px.toDF()).collect()
    assert(cols.length == 80)
    cols.foreach { r =>
      assert(jvm(r.getLong(0)) == ((r.getLong(1), r.getLong(2), r.getLong(3))),
        s"doc ${r.getLong(0)}")
    }
    // at least one hash should carry the sign bit across 80 varied images,
    // or the Long.MinValue weight path would be dead code in this spec
    assert(cols.exists(_.getLong(1) < 0L))
    // pixel fixture round-trips through parquet unchanged
    val tmp = java.nio.file.Files.createTempDirectory("graypx").toString
    px.write.mode("overwrite").parquet(tmp)
    val back = Multimodal.aHashFromPixels(spark.read.parquet(tmp)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cols.foreach(r => assert(back(r.getLong(0)) == r.getLong(1)))
  }
}
