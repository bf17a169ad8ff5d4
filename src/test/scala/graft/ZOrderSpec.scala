package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-computed cases)") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (255L, 0L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 8)).collect().map(_.getLong(0)).toSeq
    // morton(x,y): x bits at even positions, y at odd
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    assert(got == cases.map { case (x, y) => morton(x, y) })
    assert(morton(1, 0) == 1 && morton(0, 1) == 2 && morton(1, 1) == 3)
  }

  test("z-sorted blocks prune BOTH dimensions; single-column sort prunes one") {
    // a 64x64 grid, one row per cell; blocks of 64 rows; a predicate on one
    // dimension value. A block must be read iff its [min,max] envelope
    // covers the predicate value — exactly parquet row-group min/max
    // semantics.
    val n = 64
    val grid = (0 until n * n).map { i => (i.toLong % n, i.toLong / n) }
    def overlapFraction(sorted: Seq[(Long, Long)], dim: ((Long, Long)) => Long,
        v: Long, block: Int = 64): Double = {
      val blocks = sorted.grouped(block).toSeq
      blocks.count { b =>
        val vals = b.map(dim); vals.min <= v && v <= vals.max
      }.toDouble / blocks.size
    }
    val byX = grid.sortBy(_._1)
    val byZ = grid.map { case (x, y) =>
      ((x, y), (0 until 6).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum)
    }.sortBy(_._2).map(_._1)
    // x-sort: perfect on x, hopeless on y (every block spans all y)
    assert(overlapFraction(byX, _._1, 17) <= 2.0 / 64)
    assert(overlapFraction(byX, _._2, 17) == 1.0)
    // z-sort: a 64-row block is an 8x8 tile — about 8/64 of blocks touch any
    // given x or y value; far from 100% on BOTH dims
    assert(overlapFraction(byZ, _._1, 17) <= 16.0 / 64)
    assert(overlapFraction(byZ, _._2, 17) <= 16.0 / 64)
  }

  test("writeZOrdered files carry rectangular min/max envelopes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-test")
    try {
      val n = 32
      val df = (0 until n * n).map(i => (i.toLong, i.toLong % n, i.toLong / n))
        .toDF("id", "x", "y")
      ZOrder.writeZOrdered(df.repartition(4), dir.toString, "x", "y",
        bits = 5, blockRows = 64)
      val back = spark.read.parquet(dir.toString)
      assert(back.count() == n * n)
      // per-file envelopes: each file's (x, y) min/max box must cover far
      // fewer cells than the full grid — the pruning surface
      val perFile = back.withColumn("f", input_file_name())
        .groupBy("f").agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("cnt"))
        .collect()
      assert(perFile.length > 1, "expected multiple output files")
      perFile.foreach { r =>
        val box = (r.getLong(2) - r.getLong(1) + 1) * (r.getLong(4) - r.getLong(3) + 1)
        assert(box <= 16L * r.getLong(5),
          s"file envelope $box cells for ${r.getLong(5)} rows — not clustered")
      }
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  /** Reference xy->d (the published bit recursion) for exhaustive checks. */
  private def refHilbert(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var (x, y, d) = (x0, y0, 0L)
    var bit = order - 1
    while (bit >= 0) {
      val s = 1L << bit
      val rx = (x >> bit) & 1L
      val ry = (y >> bit) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      bit -= 1
    }
    d
  }

  test("hilbert matches the reference recursion exhaustively (order 5)") {
    val order = 5; val n = 1 << order
    val grid = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("x", "y")
    val got = ZOrder.withHilbert(grid, "x", "y", order)
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == refHilbert(order, x, y), s"($x, $y)")
    }
    // the curve is a bijection onto 0 until n*n
    assert(got.map(_._3).sorted.toSeq == (0L until (n.toLong * n)))
  }

  test("hilbert locality: consecutive indices are Manhattan-adjacent cells") {
    val order = 5; val n = 1 << order
    val cells = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("x", "y")
    val walk = ZOrder.withHilbert(cells, "x", "y", order)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    walk.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("hilbert blocks prune at least as tightly as z-order on both dims") {
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
    def blockEnvelopeArea(sorted: Seq[(Long, Long)], block: Int = 64): Double = {
      val blocks = sorted.grouped(block).toSeq
      blocks.map { b =>
        val xs = b.map(_._1); val ys = b.map(_._2)
        ((xs.max - xs.min + 1) * (ys.max - ys.min + 1)).toDouble
      }.sum / blocks.size
    }
    val byZ = grid.map { case (x, y) =>
      ((x, y), (0 until 6).map(i =>
        (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum)
    }.sortBy(_._2).map(_._1)
    val byH = grid.map { case p => (p, refHilbert(6, p._1, p._2)) }
      .sortBy(_._2).map(_._1)
    // a 64-row block of either curve is a tile; Hilbert's snake ordering
    // keeps every envelope at the ideal 8x8 = 64 cells
    assert(blockEnvelopeArea(byH) <= blockEnvelopeArea(byZ))
    assert(blockEnvelopeArea(byH) == 64.0)
  }
}
