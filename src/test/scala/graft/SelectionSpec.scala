package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // target domain: spark-ish tokens; raw: two target-like docs, two off-domain
  private val targetRows = Seq(
    (100L, "spark shuffle join scan spark join"),
    (101L, "spark scan agg join shuffle"))
  private val rawRows = Seq(
    (0L, "spark join shuffle scan agg"),
    (1L, "lorem ipsum dolor sit amet"),
    (2L, "spark spark spark join join"),
    (3L, "red green blue yellow pink"))
  private val target = targetRows.toDF("doc_id", "text")
  private val raw = rawRows.toDF("doc_id", "text")

  // hand mirror of the operator's arithmetic (PolyHash, add-one smoothing,
  // per-ln round-6, exact decimal sum) — independent Scala reimplementation
  private val Mod = 2147483647L
  private def slot(tok: String, numSlots: Int): Long =
    tok.foldLeft(0L)((acc, ch) => (acc * 131 + ch.toLong) % Mod) % numSlots

  private def mirror(numSlots: Int): Map[Long, (Long, Double)] = {
    val tToks = targetRows.flatMap(_._2.split(" "))
    val rToks = rawRows.flatMap(_._2.split(" "))
    val cT = tToks.groupBy(slot(_, numSlots)).map { case (s, g) => s -> g.size.toLong }
    val cR = rToks.groupBy(slot(_, numSlots)).map { case (s, g) => s -> g.size.toLong }
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    rawRows.map { case (id, text) =>
      val toks = text.split(" ")
      val s = toks.map { tok =>
        val sl = slot(tok, numSlots)
        r6(math.log((cT.getOrElse(sl, 0L) + 1.0) / (tToks.size.toDouble + numSlots))) -
          r6(math.log((cR(sl) + 1.0) / (rToks.size.toDouble + numSlots)))
      }.sum
      id -> (toks.length.toLong, s.toDouble)
    }.toMap
  }

  test("importance weights match the hand mirror") {
    val got = Selection.importanceWeights(raw, target, numSlots = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === mirror(64))
  }

  test("target-like documents outweigh off-domain ones") {
    val w = Selection.importanceWeights(raw, target, numSlots = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) > w(1L) && w(2L) > w(1L) && w(0L) > w(3L))
  }

  test("topK keeps the k best, ranked") {
    val got = Selection.importanceTopK(raw, target, k = 2, numSlots = 64)
      .orderBy("rank").collect()
    assert(got.length === 2)
    val w = mirror(64)
    val expected = rawRows.map(_._1).sortBy(id => (-w(id)._2, id)).take(2)
    assert(got.map(_.getLong(0)).toSeq === expected)
    assert(got.map(_.getLong(3)).toSeq === Seq(1L, 2L))
    assert(got(0).getDouble(2) >= got(1).getDouble(2))
  }

  test("weights are partitioning-invariant") {
    val a = Selection.importanceWeights(raw, target, numSlots = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val b = Selection.importanceWeights(raw.repartition(7), target.repartition(3), numSlots = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a === b)
  }

  // ---- prototypicality pruning (Sorscher et al. 2022) --------------------

  test("prototypicalityPrune keeps the hardest k per cluster, not a global cut") {
    import graft.operators.Similarity
    // two tight clusters; per cluster, members 0..7 sit ON the direction
    // (prototypical) and members 8..9 carry large noise (hard). A GLOBAL
    // hardest cut at the same total budget would drain one cluster.
    val dirs = Array.tabulate(2, 16)((c, d) => math.sin(c * 2.9 + d * 0.61))
    val rows = for (c <- 0 until 2; j <- 0 until 10) yield {
      val r = new scala.util.Random(c * 100L + j)
      val noise = if (j >= 8) 0.6 else 0.02
      (c * 100L + j, Array.tabulate(16)(d =>
        (dirs(c)(d) + r.nextGaussian() * noise).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("proto").toString + "/idx"
    Similarity.writeIvfIndex(emb, path, nlist = 2, dim = 16)
    val kept = Selection.prototypicalityPrune(spark, path, emb, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(kept.length == 4, "2 clusters x keep 2")
    // each cluster keeps ITS OWN two noisy members (the hard ones)
    val byCluster = kept.groupBy(_._1)
    assert(byCluster.size == 2)
    for ((_, ms) <- byCluster) {
      assert(ms.map(_._2 % 100).toSet == Set(8L, 9L),
        s"the hard (noisy) members must be kept, got ${ms.mkString(",")}")
      assert(ms.map(_._4).sorted.toSeq == Seq(1L, 2L), "ranked 1..k")
    }
    // rank 1 is the hardest: proto ascending within each cluster
    for ((_, ms) <- byCluster) {
      val sorted = ms.sortBy(_._4)
      assert(sorted(0)._3 <= sorted(1)._3)
    }
    // partitioning invariance of the kept set
    val again = Selection.prototypicalityPrune(spark, path,
        emb.repartition(7), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again == kept.map(k0 => (k0._1, k0._2)).sorted.toSeq)
  }

  test("prototypicalityPrune resolves the MVCC version root: a retrained tree serves the CURRENT quantizer") {
    import graft.operators.Similarity
    import graft.util.Lsm
    val rows = (0 until 6).map(j => (j.toLong, Array.tabulate(16)(d =>
      (math.sin(d * 0.7) + j * 0.01).toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("protov").toString + "/idx"
    Similarity.writeIvfIndex(emb, path, nlist = 1, dim = 16)
    // simulate a daemon retrain: publish a v1 centroid table under the
    // MVCC protocol and RETIRE the legacy top-level tables (the state a
    // tree reaches after the post-retrain compaction slot)
    val fs = Lsm.fs(spark, path)
    spark.read.parquet(s"$path/centroids").write
      .parquet(s"$path/v1/centroids")
    fs.create(new org.apache.hadoop.fs.Path(s"$path/v1/_committed")).close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/centroids"), true)
    // a tree-top read would now throw (legacy centroids gone); the
    // versioned-root resolution must serve v1
    val kept = Selection.prototypicalityPrune(spark, path, emb, 100)
    assert(kept.count() == 6)
  }

  test("prototypicalityPrune with k >= cluster size keeps everything, ranked hardest-first") {
    import graft.operators.Similarity
    val rows = (0 until 6).map(j => (j.toLong, Array.tabulate(16)(d =>
      (math.sin(d * 0.7) + j * 0.01).toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("proto2").toString + "/idx"
    Similarity.writeIvfIndex(emb, path, nlist = 1, dim = 16)
    val kept = Selection.prototypicalityPrune(spark, path, emb, 100)
      .collect().map(r => (r.getDouble(2), r.getLong(3)))
    assert(kept.length == 6)
    assert(kept.sortBy(_._2).map(_._1).toSeq == kept.map(_._1).sorted.toSeq,
      "rank order must be proto ascending (hardest first)")
  }
}
