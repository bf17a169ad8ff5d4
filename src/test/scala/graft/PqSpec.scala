package graft

import graft.functions.ArrayMath
import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 16-dim corpus, 24 vectors
  private lazy val corpus = (0 until 24).map { i =>
    (i.toLong, (0 until 16).map(d => math.sin(i * 17 + d * 3).toFloat).toArray)
  }.toDF("vec_id", "embedding")

  private def withIndex[A](m: Int, ksub: Int)(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-test")
    try {
      Pq.writePqIndex(corpus, dir.toString, m = m, ksub = ksub, dim = 16)
      f(dir.toString)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("codes: m rows per vector, codes within [1, ksub]") {
    withIndex(m = 4, ksub = 8) { p =>
      val codes = spark.read.parquet(s"$p/codes")
      assert(codes.count() == 24L * 4)
      assert(codes.groupBy("vec_id").count().filter(col("count") =!= 4).count() == 0)
      val mm = codes.agg(min("code"), max("code")).head()
      assert(mm.getLong(0) >= 1 && mm.getLong(1) <= 8)
      val books = spark.read.parquet(s"$p/codebooks")
      assert(books.count() == 4L * 8) // full book: empty clusters kept
    }
  }

  test("Lloyd update keeps empty clusters: codebook stays at m*ksub rows") {
    // every vector identical => after assignment ALL mass lands on one
    // centroid per subspace (tie-break cid asc); the other ksub-1 clusters
    // capture nothing and must keep their previous centers instead of
    // vanishing from the book
    val flat = (0 until 12).map { i =>
      (i.toLong, Array.fill(8)(1.0f))
    }.toDF("vec_id", "embedding")
    val books = Pq.pqCodebooks(flat, m = 2, ksub = 4, dim = 8, iters = 2)
    assert(books.count() == 2L * 4, "empty clusters must not shrink the book")
    assert(books.filter(col("center").isNull).count() == 0)
    // the captured cluster's center is the (identical) data point
    val winner = books.filter(col("cid") === 1L).collect()
    winner.foreach { r =>
      r.getSeq[Double](2).foreach(v => assert(math.abs(v - 1.0) < 1e-12))
    }
  }

  test("ksub = corpus size degenerates to exact: ADC cosine tracks the true cosine") {
    // every vector seeds its own centroid and re-assigns to itself (d2 = 0),
    // so the reconstruction is exact and ADC differs from the true cosine
    // only by per-subspace fold association (< 1e-9 here)
    withIndex(m = 4, ksub = 24) { p =>
      val adc = Pq.pqTopKIndexed(spark, p, corpus, k = 23, m = 4, dim = 16)
        .select(col("q_id"), col("vec_id"), col("cos_pq"))
      val exact = corpus.select(col("vec_id").as("q_id"), col("embedding").as("a"))
        .crossJoin(corpus.select(col("vec_id"), col("embedding").as("b")))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id"), ArrayMath.cosine(col("a"), col("b")).as("cos"))
      val joined = adc.join(exact, Seq("q_id", "vec_id")).collect()
      assert(joined.length == 24 * 23)
      joined.foreach { r =>
        val d = math.abs(r.getDouble(2) - r.getDouble(3))
        assert(d < 1e-6, s"q=${r.getLong(0)} v=${r.getLong(1)} adc=${r.getDouble(2)} exact=${r.getDouble(3)}")
      }
    }
  }

  test("lossy codebooks still rank plausibly: top-1 recall vs brute force >= 50%") {
    withIndex(m = 4, ksub = 6) { p =>
      val queries = corpus.filter(col("vec_id") < 8)
      val adc1 = Pq.pqTopKIndexed(spark, p, queries, k = 1, m = 4, dim = 16)
        .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toMap
      val bf1 = Similarity.bruteForceTopK(queries, corpus, 1)
        .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toMap
      val hits = bf1.count { case (q, v) => adc1.get(q).contains(v) }
      assert(hits * 2 >= bf1.size, s"top-1 recall $hits/${bf1.size}")
    }
  }

  test("ivf-pq with nprobe = nlist equals plain PQ ADC (pruning off)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-test")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-pq-ref")
    try {
      // residual = false: the raw-coded composition is exactly plain PQ
      // once pruning is off; the residual coding is checked separately
      graft.operators.Pq.writeIvfPqIndex(corpus, dir.toString,
        nlist = 4, m = 4, ksub = 8, dim = 16, residual = false)
      graft.operators.Pq.writePqIndex(corpus, dir2.toString, m = 4, ksub = 8, dim = 16)
      val q = corpus.filter(col("vec_id") < 6)
      val composed = graft.operators.Pq.ivfPqTopK(spark, dir.toString, q,
        k = 10, nprobe = 4, m = 4, dim = 16).orderBy("q_id", "rank").collect().toSeq
      val plain = graft.operators.Pq.pqTopKIndexed(spark, dir2.toString, q,
        k = 10, m = 4, dim = 16).orderBy("q_id", "rank").collect().toSeq
      assert(composed == plain)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(dir.toFile); rm(dir2.toFile)
    }
  }

  test("residual coding reconstructs better: ADC error and recall beat raw coding") {
    val dirR = java.nio.file.Files.createTempDirectory("graft-ivfpq-res")
    val dirW = java.nio.file.Files.createTempDirectory("graft-ivfpq-raw")
    try {
      // same lossy budget (ksub = 6 < 24 vectors), same cells; only the
      // coding differs. All cells probed so candidate sets are identical
      // and the comparison isolates reconstruction quality.
      Pq.writeIvfPqIndex(corpus, dirR.toString, nlist = 4, m = 4, ksub = 6, dim = 16)
      Pq.writeIvfPqIndex(corpus, dirW.toString, nlist = 4, m = 4, ksub = 6, dim = 16,
        residual = false)
      val q = corpus.filter(col("vec_id") < 8)
      val exact = corpus.select(col("vec_id").as("q_id"), col("embedding").as("a"))
        .crossJoin(corpus.select(col("vec_id"), col("embedding").as("b")))
        .filter(col("q_id") =!= col("vec_id") && col("q_id") < 8)
        .select(col("q_id"), col("vec_id"), ArrayMath.cosine(col("a"), col("b")).as("cos"))
      def errAndRecall(path: String): (Double, Int) = {
        val adc = Pq.ivfPqTopK(spark, path, q, k = 23, nprobe = 4, m = 4, dim = 16)
        val errs = adc.join(exact, Seq("q_id", "vec_id"))
          .select(abs(col("cos_pq") - col("cos"))).as[Double].collect()
        val top1 = adc.filter(col("rank") === 1)
          .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toMap
        val bf1 = Similarity.bruteForceTopK(q, corpus, 1)
          .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toMap
        (errs.sum / errs.length,
          bf1.count { case (qq, v) => top1.get(qq).contains(v) })
      }
      val (errRes, recRes) = errAndRecall(dirR.toString)
      val (errRaw, recRaw) = errAndRecall(dirW.toString)
      assert(errRes <= errRaw,
        s"residual mean |cos_pq - cos| $errRes must not exceed raw $errRaw")
      assert(recRes >= recRaw, s"residual top-1 recall $recRes < raw $recRaw")
      // the meta table makes a parameter mismatch loud, not silently wrong
      intercept[IllegalArgumentException] {
        Pq.ivfPqTopK(spark, dirR.toString, q, k = 3, nprobe = 4, m = 8, dim = 16)
      }
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(dirR.toFile); rm(dirW.toFile)
    }
  }

  test("two-stage search with full coverage equals brute force exactly") {
    // even over HEAVILY lossy codes (ksub = 6 for 24 vectors), probing all
    // cells with kCoarse >= corpus-1 makes the refine stage see every
    // candidate, and the exact re-rank reproduces bruteForceTopK
    // bit-for-bit — compression error cannot reach the returned scores
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-refine")
    try {
      Pq.writeIvfPqIndex(corpus, dir.toString, nlist = 4, m = 4, ksub = 6, dim = 16)
      val q = corpus.filter(col("vec_id") < 6)
      val refined = Pq.ivfPqTopKRefined(spark, dir.toString, q, corpus,
          k = 5, kCoarse = 23, nprobe = 4, m = 4, dim = 16)
        .orderBy("q_id", "rank").collect().toSeq
      val brute = Similarity.bruteForceTopK(q, corpus, 5)
        .orderBy("q_id", "rank").collect().toSeq
      assert(refined == brute)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("ivf-pq codes scan is partition-pruned to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-prune")
    try {
      graft.operators.Pq.writeIvfPqIndex(corpus, dir.toString,
        nlist = 4, m = 4, ksub = 8, dim = 16)
      val df = graft.operators.Pq.ivfPqTopK(spark, dir.toString,
        corpus.filter(col("vec_id") === 0), k = 3, nprobe = 1, m = 4, dim = 16)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(cid"),
        s"probed cells must prune code partitions:\n$plan")
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("ADC scores are bit-identical across query-set partitionings") {
    withIndex(m = 4, ksub = 8) { p =>
      val q = corpus.filter(col("vec_id") < 6)
      val a = Pq.pqTopKIndexed(spark, p, q.repartition(1), 5, m = 4, dim = 16)
        .orderBy("q_id", "rank").collect().toSeq
      val b = Pq.pqTopKIndexed(spark, p, q.repartition(7), 5, m = 4, dim = 16)
        .orderBy("q_id", "rank").collect().toSeq
      assert(a == b)
    }
  }

  test("sq8: constant and exactly-representable dims reconstruct exactly") {
    // dim 0 constant (hi = lo -> code 0, exact); dim 1 endpoints only
    val df = Seq((1L, Seq(7.0, 0.0)), (2L, Seq(7.0, 1.0)), (3L, Seq(7.0, 0.0)))
      .toDF("vec_id", "embedding")
    val rows = Pq.sq8Report(df, "embedding").orderBy("i").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(1) == 7.0 && rows(0).getDouble(2) == 7.0)
    assert(rows(0).getDouble(3) == 0.0 && rows(0).getDouble(4) == 0.0)
    assert(rows(1).getDouble(3) == 0.0 && rows(1).getDouble(4) == 0.0)
  }

  test("sq8: mid-grid value carries the hand-computed quantization error") {
    // dim values {0, 0.3, 1}: code(0.3) = round(76.5) = 77 (HALF_UP),
    // dq = 77/255, err = |0.3 - 77/255|
    val df = Seq((1L, Seq(0.0)), (2L, Seq(0.3)), (3L, Seq(1.0)))
      .toDF("vec_id", "embedding")
    val Array(r) = Pq.sq8Report(df, "embedding").collect()
    val err = math.abs(0.3 - 77.0 / 255.0)
    val round9 = (x: Double) => BigDecimal(java.lang.Double.toString(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == round9(err))
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 4e-6) // err^2/3 scale
  }

  test("sq8: max_err bounded by half a grid step on smooth data") {
    val df = (0 until 200).map(i =>
      (i.toLong, Seq(math.sin(i * 0.1) * 3.0, i * 0.01))).toDF("vec_id", "embedding")
    val rows = Pq.sq8Report(df, "embedding").collect()
    rows.foreach { r =>
      val step = (r.getDouble(2) - r.getDouble(1)) / 255.0
      assert(r.getDouble(4) <= step / 2.0 + 1e-9,
        s"dim ${r.getLong(0)}: max_err ${r.getDouble(4)} > half-step ${step / 2}")
    }
  }

  // --- incremental fold (the compressed-index daemon path) ------------------

  private def codeRows(p: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(s"$p/codes")
      .select(col("vec_id"), col("cid").cast("long"), col("sub"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

  test("ivfPqInsert: folded codes == full re-encode; residual vnorms bit-identical; retry no-ops") {
    for (residual <- Seq(false, true)) {
      val p = java.nio.file.Files.createTempDirectory("ivfpq-inc").toString + "/idx"
      val base = corpus.filter(col("vec_id") % 4 =!= 0)
      val batch = corpus.filter(col("vec_id") % 4 === 0)
      Pq.writeIvfPqIndex(base, p, nlist = 4, m = 4, ksub = 8, dim = 16,
        residual = residual)
      Pq.ivfPqInsert(spark, p, batch, 1L)
      // reference: same frozen tables, full corpus encoded from scratch
      val ref = p + "_ref"
      val fs = graft.util.Lsm.fs(spark, p)
      for (t <- Seq("centroids", "codebooks", "meta"))
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(s"$p/$t"), fs,
          new org.apache.hadoop.fs.Path(s"$ref/$t"), false,
          spark.sparkContext.hadoopConfiguration)
      Pq.ivfPqInsert(spark, ref, corpus, 2L) // fold EVERYTHING in one batch
      assert(codeRows(p) == codeRows(ref),
        s"residual=$residual: folded tree must equal a full re-encode")
      if (residual) {
        def vn(x: String) = spark.read.parquet(s"$x/vnorms")
          .select(col("vec_id"), col("rnorm2").cast("string"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
        assert(vn(p) == vn(ref),
          "folded reconstruction norms must be bit-identical to built ones")
        // served results ride the folded tree unchanged
        val q = corpus.filter(col("vec_id") < 3)
        def served(x: String) = Pq.ivfPqTopK(spark, x, q, 5, nprobe = 2,
            m = 4, dim = 16).collect()
          .map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
        assert(served(p) == served(ref))
      }
      // retry of the committed batch must not double-append
      Pq.ivfPqInsert(spark, p, batch, 1L)
      assert(codeRows(p).map(_._1).groupBy(identity).forall(_._2.size == 4),
        "every vector exactly m=4 code rows after the retried fold")
    }
  }

  test("ivfPqCompact: both roots merge to one file per cell, served results identical") {
    val p = java.nio.file.Files.createTempDirectory("ivfpq-cpt").toString + "/idx"
    Pq.writeIvfPqIndex(corpus.filter(col("vec_id") % 3 === 0), p,
      nlist = 4, m = 4, ksub = 8, dim = 16, residual = true)
    Pq.ivfPqInsert(spark, p, corpus.filter(col("vec_id") % 3 === 1), 1L)
    Pq.ivfPqInsert(spark, p, corpus.filter(col("vec_id") % 3 === 2), 2L)
    val q = corpus.filter(col("vec_id") < 3)
    def served = Pq.ivfPqTopK(spark, p, q, 5, nprobe = 2, m = 4, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
      .sorted.toSeq
    val before = served
    val fs = graft.util.Lsm.fs(spark, p)
    def maxFiles(root: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/$root"))
        .filter(_.isDirectory).map { d =>
          fs.listStatus(d.getPath).count(f => f.isFile &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        }.max
    assert(maxFiles("codes") > 1 && maxFiles("vnorms") > 1,
      "fixture must actually be fragmented in both roots")
    Pq.ivfPqCompact(spark, p)
    assert(maxFiles("codes") == 1 && maxFiles("vnorms") == 1,
      "every cell must compact to one file in both roots")
    assert(served == before, "compaction must be content-preserving")
    // the compacted tree keeps accepting folds
    Pq.ivfPqInsert(spark, p,
      (100 until 104).map(i => (i.toLong,
        Array.tabulate(16)(d => math.sin(i * 17 + d * 3).toFloat)))
        .toDF("vec_id", "embedding"), 3L)
    assert(codeRows(p).map(_._1).distinct.size == 28)
  }

  test("ivfPqInsert: a crashed attempt's partial move is swept from both roots") {
    val p = java.nio.file.Files.createTempDirectory("ivfpq-crash").toString + "/idx"
    Pq.writeIvfPqIndex(corpus.filter(col("vec_id") % 4 =!= 0), p,
      nlist = 4, m = 4, ksub = 8, dim = 16, residual = true)
    val fs = graft.util.Lsm.fs(spark, p)
    for (root <- Seq("codes", "vnorms")) {
      val r = new org.apache.hadoop.fs.Path(s"$p/$root")
      val cell = fs.listStatus(r).filter(_.isDirectory).head.getPath
      val victim = fs.listStatus(cell).filter(_.isFile).head.getPath
      org.apache.hadoop.fs.FileUtil.copy(fs, victim, fs,
        new org.apache.hadoop.fs.Path(cell, "b2-crashed.parquet"), false,
        spark.sparkContext.hadoopConfiguration)
    }
    Pq.ivfPqInsert(spark, p, corpus.filter(col("vec_id") % 4 === 0), 2L)
    assert(codeRows(p).map(_._1).groupBy(identity).forall(_._2.size == 4),
      "planted partial moves must be swept, not double-counted")
    assert(spark.read.parquet(s"$p/vnorms").groupBy("vec_id").count()
      .filter(col("count") =!= 1).count() == 0, "one vnorm row per vector")
  }
}
