package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: 0/1 near-identical, 2 identical to 0, 3/4 share half,
  // 5.. unrelated, 9 short.
  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "one two three four five sixx seven eight nine ten"),
    (5L, "red orange yellow green blue indigo violet purple pink white"),
    (6L, "spark catalyst tungsten shuffle partition broadcast join agg scan sort"),
    (7L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    (8L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"),
    (9L, "tiny doc here")
  ).toDF("doc_id", "text")

  private def grams3(s: String): Set[String] =
    s.split(" ").sliding(3).map(_.mkString(" ")).toSet

  private def jaccard(a: String, b: String): Double = {
    val (ga, gb) = (grams3(a), grams3(b))
    ga.intersect(gb).size.toDouble / (ga.size + gb.size - ga.intersect(gb).size)
  }

  private val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  private def brutePairs(thr: Double): Set[(Long, Long)] =
    (for {
      a <- texts.keys; b <- texts.keys if a < b
      if jaccard(texts(a), texts(b)) >= thr
    } yield (a, b)).toSet

  test("exact dedup groups by key") {
    val groups = Dedup.exactGroups(docs, col("text")).filter(col("n_dups") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getLong(1) == 0L && groups.head.getLong(2) == 2L) // keep 0, count 2
  }

  test("containment pairs: an embedded doc scores 1.0 where jaccard misses it") {
    // doc 20 is doc 6's text embedded inside a much longer doc 21
    val extra = Seq(
      (20L, "spark catalyst tungsten shuffle partition broadcast join agg scan sort"),
      (21L, "intro words before the payload spark catalyst tungsten shuffle " +
        "partition broadcast join agg scan sort and a long tail of unrelated " +
        "filler content keeps the union large and the jaccard small")
    ).toDF("doc_id", "text")
    val all = docs.union(extra)
    val cont = Dedup.containmentPairs(all, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(cont((20L, 21L)) == 1.0) // every 3-gram of 20 appears in 21
    assert(cont((6L, 20L)) == 1.0) // identical docs contain each other
    assert(cont((6L, 21L)) == 1.0)
    // symmetric jaccard at the same threshold misses the embedding pair
    val jac = Dedup.ngramJaccardPairs(all, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((20L, 21L)))
    // brute-force value check at a loose threshold
    val txts = all.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Dedup.containmentPairs(all, 3, 0.1).collect().foreach { r =>
      val (ga, gb) = (grams3(txts(r.getLong(0))), grams3(txts(r.getLong(1))))
      val expected = ga.intersect(gb).size.toDouble / math.min(ga.size, gb.size)
      assert(math.abs(r.getDouble(3) - expected) < 1e-6)
      assert(r.getLong(2) == ga.intersect(gb).size)
    }
  }

  test("containment pairs: invariant under input partitioning") {
    def run(p: Int) = Dedup.containmentPairs(docs.repartition(p), 3, 0.3)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(run(1) == run(7))
  }

  test("ngram jaccard pairs match brute force") {
    val got = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brutePairs(0.5), s"got=$got expected=${brutePairs(0.5)}")
    // and the jaccard values themselves
    Dedup.ngramJaccardPairs(docs, 3, 0.1).collect().foreach { r =>
      val expected = jaccard(texts(r.getLong(0)), texts(r.getLong(1)))
      assert(math.abs(r.getDouble(3) - expected) < 1e-6)
    }
  }

  test("prefix-filtered jaccard equals the uncapped inverted-index form") {
    for (thr <- Seq(0.1, 0.5, 0.8)) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val expected = rows(Dedup.ngramJaccardPairs(docs, 3, thr, maxGramDocs = Int.MaxValue))
      val got = rows(Dedup.prefixJaccardPairs(docs, 3, thr))
      assert(got === expected, s"thr=$thr")
      assert(got.map(t => (t._1, t._2)).toSet === brutePairs(thr), s"thr=$thr")
    }
  }

  test("prefix filter is sound where the df cap loses pairs") {
    // cap=2 drops the df=3 grams shared by docs 0/2/8, so the inverted-index
    // heuristic misses the (0,2) identical pair; the prefix filter cannot
    val capped = Dedup.ngramJaccardPairs(docs, 3, 0.5, maxGramDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefix = Dedup.prefixJaccardPairs(docs, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((0L, 2L)))
    assert(prefix === brutePairs(0.5))
  }

  test("minhash LSH finds all high-similarity pairs, verified exactly") {
    val got = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall: every pair with true jaccard >= 0.8 must be found
    assert(brutePairs(0.8).subsetOf(got), s"missed: ${brutePairs(0.8) -- got}")
    // precision is exact by construction (candidates re-verified): no pair
    // below the 0.35 verify threshold may appear
    got.foreach { case (a, b) => assert(jaccard(texts(a), texts(b)) >= 0.35) }
  }

  test("incremental probe against the stored LSH index = in-memory cross pairs") {
    // "existing corpus" = even ids, "incoming batch" = odd ids
    val existing = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 =!= 0)
    val path = java.nio.file.Files.createTempDirectory("lsh-idx").toString
    Dedup.writeLshIndex(existing, path)
    val got = Dedup.minhashLshAgainstIndex(spark, path, incoming, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // reference: the full in-memory join over everything, keeping only
    // (new, existing) pairs, reoriented to (a = new, b = indexed)
    val all = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = all.collect {
      case (a, b, c, j) if a % 2 != 0 && b % 2 == 0 => (a, b, c, j)
      case (a, b, c, j) if a % 2 == 0 && b % 2 != 0 => (b, a, c, j)
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.nonEmpty) // 1 (new) collides with 0/2/8 (indexed)
  }

  test("consolidateLshSegments: per-batch dirs merge into one segment, probes identical, repeat consolidation folds the segment") {
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("lsh-seg").toString
    for (b <- 0 to 5)
      Dedup.appendToLshIndex(docs.filter(col("doc_id") % 6 === b), path,
        s"batch-$b")
    val probe = Seq((100L, texts(1)), (101L, "novel words only here now " +
      "nothing shared with anything stored at all ok")).toDF("doc_id", "text")
    def pairs() = Dedup.minhashLshAgainstIndex(spark, path, probe, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    def dirs(sub: String) = {
      val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new Path(s"$path/$sub")).filter(_.isDirectory)
        .map(_.getPath.getName).toSet
    }
    def rows(sub: String) = spark.read
      .option("recursiveFileLookup", "true").parquet(s"$path/$sub").count()
    val (before, rowsBefore) = (pairs(), lshSubsRows(path))
    Dedup.consolidateLshSegments(spark, path, 4L)
    assert(dirs("bands") == Set("seg-4", "batch-5"),
      s"committed dirs merge, the current batch's stays: ${dirs("bands")}")
    assert(dirs("grams") == Set("seg-4", "batch-5"))
    assert(dirs("sizes") == Set("seg-4", "batch-5"))
    assert(pairs() == before && lshSubsRows(path) == rowsBefore,
      "consolidation must be content-identical")
    // a later consolidation folds the earlier segment in with new batches
    for (b <- 6 to 7)
      Dedup.appendToLshIndex(docs.filter(col("doc_id") % 8 === b), path,
        s"batch-$b")
    Dedup.consolidateLshSegments(spark, path, 7L)
    assert(dirs("bands") == Set("seg-7"), s"got ${dirs("bands")}")
    assert(pairs() == before, "planted pairs unchanged through re-merge")
    // replay of the cadence batch: seg exists, nothing to merge — no-op
    Dedup.consolidateLshSegments(spark, path, 7L)
    assert(dirs("bands") == Set("seg-7") && rows("bands") > 0)
  }

  private def lshSubsRows(path: String): Seq[Long] =
    Seq("bands", "grams", "sizes").map(sub => spark.read
      .option("recursiveFileLookup", "true").parquet(s"$path/$sub").count())

  test("consolidateLshSegments: zero-admission (empty) batch dirs never wedge the slot and still consolidate away") {
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("lsh-segz").toString
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    def dirs(sub: String) =
      fs.listStatus(new Path(s"$path/$sub")).filter(_.isDirectory)
        .map(_.getPath.getName).toSet
    // an ALL-empty window (an idle cadence stretch): every committed
    // batch dir exists but holds no data files — the old read-all-sources
    // path failed schema inference here and re-threw on every replay
    for (sub <- Seq("bands", "grams", "sizes"); b <- 0 to 2)
      fs.mkdirs(new Path(s"$path/$sub/batch-$b"))
    Dedup.consolidateLshSegments(spark, path, 2L) // must not throw
    assert(dirs("bands").isEmpty,
      s"empty committed dirs delete outright (the directory bound holds " +
        s"through idle stretches): ${dirs("bands")}")
    // a MIXED window: one data-bearing batch among empties merges into a
    // segment; the empties delete with it
    Dedup.appendToLshIndex(docs.filter(col("doc_id") < 4), path, "batch-3")
    for (sub <- Seq("bands", "grams", "sizes"); b <- 4 to 5)
      fs.mkdirs(new Path(s"$path/$sub/batch-$b"))
    val rowsBefore = lshSubsRows(path)
    Dedup.consolidateLshSegments(spark, path, 5L)
    assert(dirs("bands") == Set("seg-5"), s"got ${dirs("bands")}")
    assert(lshSubsRows(path) == rowsBefore, "content-identical merge")
  }

  test("consolidateLshSegments crash windows: torn staging sweeps, a committed marker rolls forward, duplicates never visible") {
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("lsh-segc").toString
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    for (b <- 0 to 3)
      Dedup.appendToLshIndex(docs.filter(col("doc_id") % 4 === b), path,
        s"batch-$b")
    val rowsBefore = lshSubsRows(path)
    // crash BEFORE the marker: a staged twin alone is possibly partial —
    // the retry must sweep it and keep the sources authoritative
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/bands").limit(3)
      .write.parquet(s"$path/bands_seg_staged_3")
    Dedup.consolidateLshSegments(spark, path, 3L)
    assert(!fs.exists(new Path(s"$path/bands_seg_staged_3")) ||
      fs.exists(new Path(s"$path/bands/seg-3")))
    assert(lshSubsRows(path) == rowsBefore,
      s"rows must survive consolidation exactly: $rowsBefore -> ${lshSubsRows(path)}")
    // crash AFTER the marker commit but BEFORE the source deletes: the
    // segment AND its sources coexist on disk — recovery (the next
    // call's entry) must delete the sources, never double-read
    val seg = new Path(s"$path/bands/seg-3")
    assert(fs.exists(seg))
    // manufacture: copy seg back out as a "source" dir + a marker listing it
    org.apache.hadoop.fs.FileUtil.copy(fs, seg, fs,
      new Path(s"$path/bands/batch-0"), false,
      spark.sparkContext.hadoopConfiguration)
    val dupRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/bands").count()
    assert(dupRows > rowsBefore.head, "fixture: duplicates ARE on disk")
    val out = fs.create(new Path(s"$path/bands_seg_commit"), true)
    out.write("seg-3\nbatch-0".getBytes("UTF-8")); out.close()
    Dedup.consolidateLshSegments(spark, path, 3L) // entry recovery
    assert(!fs.exists(new Path(s"$path/bands/batch-0")) &&
      !fs.exists(new Path(s"$path/bands_seg_commit")),
      "recovery must finish the deletes and drop the marker")
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/bands").count() == rowsBefore.head,
      "exactly-once rows after roll-forward")
  }

  test("simhash chunk-join finds exactly the hamming<=3 pairs of its signatures") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got=$got expected=$expected")
    // identical docs must collide at hamming 0
    assert(got.contains((0L, 2L)))
  }

  test("LSH embedding near-dup: subset of exact pairs, exact cosines") {
    val rnd = new scala.util.Random(3)
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin((i % 6) * 2.1 + d * 0.8) + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupPairsLsh(emb, 0.9, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH precision must be exact (candidates re-scored)")
    assert(lsh.nonEmpty && lsh.size.toDouble / exact.size >= 0.5,
      s"clustered data should keep recall: ${lsh.size}/${exact.size}")
  }

  test("hashing vectorizer: deterministic dims, counts land in hashed slots") {
    import graft.operators.TextAnalysis
    val docs = Seq((0L, "a b a"), (1L, "a b a"), (2L, "z z z z")).toDF("doc_id", "text")
    val vecs = TextAnalysis.hashingVectorize(docs, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(0).length == 16 && vecs(0).sum == 3.0) // 3 tokens counted
    assert(vecs(0) == vecs(1), "identical text -> identical vector")
    assert(vecs(2).sum == 4.0 && vecs(2).count(_ > 0) == 1) // one token type
    // empty / whitespace-only docs stay present with true zero vectors
    val edge = Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text")
    val zeros = TextAnalysis.hashingVectorize(edge, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(zeros(9L).forall(_ == 0.0) && zeros(10L).forall(_ == 0.0))
  }

  test("embedding near-dup pairs: exact pairwise on planted vectors") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),   // near 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupPairs(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)))
  }

  test("connected components: chains, separate clusters, canonical min labels") {
    val pairs = Seq(
      (1L, 0L), (1L, 2L),                      // triangle-ish cluster -> rep 0
      (5L, 6L),                                // pair cluster -> rep 5
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L) // chain, diameter 4 -> rep 10
    ).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,
      5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L)
    assert(got == expected, s"got=$got")
  }

  test("connected components: 64-node chain converges in O(log n) star rounds") {
    // A path graph is the adversarial case for min-label propagation
    // (diameter rounds = n); the large-star/small-star contraction must
    // close it in ~2*log2(n) rounds, +1 to observe the fixpoint.
    val n = 64L
    val chain = (0L until n).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("a_id", "b_id")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("connected components frees every persisted RDD on the success path") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 0L), (1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(pairs)
    assert(labels.count() == 5)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
    // the checkpointed result stays consumable after cleanup
    assert(labels.filter($"doc_id" === 2L).collect().head.getLong(1) == 0L)
  }

  test("connected components raises instead of emitting unconverged labels") {
    val chain = (0L until 6L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 1).collect()
    }
  }

  test("ccInsert: warm fold equals the cold run over the unioned pair set") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base: two clusters {0,1,2} and {5,6}, plus a chain {10..14}
    val base = Seq((1L, 0L), (1L, 2L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("a_id", "b_id")
    // batch exercises every merge shape at once: a bridge joining two old
    // components through NON-rep members (2-6), a fresh node below an old
    // rep (4 < 5 via 4-6... no, 4 pairs into the {5,6} side pre-merge),
    // a fresh-only pair (20,21), and a stale duplicate of a base pair
    val batch = Seq((2L, 6L), (4L, 6L), (20L, 21L), (10L, 11L))
      .toDF("a_id", "b_id")
    val warm = Dedup.ccInsert(Dedup.connectedComponents(base), batch)
    val cold = Dedup.connectedComponents(base.unionByName(batch))
    assert(asMap(warm) == asMap(cold))
    // the merged {0,1,2}∪{4,5,6} component takes the global min 0
    assert(asMap(warm)(4L) == 0L && asMap(warm)(6L) == 0L)
    assert(asMap(warm)(20L) == 20L && asMap(warm)(21L) == 20L)
  }

  test("ccInsert: fresh node smaller than every old rep becomes the new rep") {
    val labels = Dedup.connectedComponents(Seq((5L, 6L), (6L, 7L)).toDF("a_id", "b_id"))
    val got = Dedup.ccInsert(labels, Seq((1L, 7L)).toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("ccInsert: an already-covered batch leaves the labels unchanged") {
    val base = Seq((1L, 0L), (1L, 2L)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(base)
    val got = Dedup.ccInsert(labels, Seq((0L, 2L)).toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("decontamination: shared distinct 5-grams against a broadcast eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different words nothing shared with anything else here"),
      (3L, "the quick brown fox jumps high above everything else now")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "prefix tokens the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminatedBy(train, eval, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: distinct 5-grams of each train doc vs the eval gram set
    def g5(t: String) = t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val eg = g5("prefix tokens the quick brown fox jumps over the lazy dog")
    val expected = Map(1L -> g5("the quick brown fox jumps over the lazy dog today"),
        3L -> g5("the quick brown fox jumps high above everything else now"))
      .view.mapValues(_.intersect(eg).size.toLong).filter(_._2 > 0).toMap
    assert(got == expected, s"got=$got expected=$expected")
    assert(!got.contains(2L))

    // the eval-side report: doc 100 is hit by train docs 1 and 3, with the
    // pair volume = sum of their per-doc shared-gram counts
    val report = Dedup.contaminationReport(train, eval, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(report.toSeq == Seq((100L, 2L, expected.values.sum)), report.toSeq)
  }

  test("dup windows: positional 8-token spans shared across (or within) docs") {
    val span = "w1 w2 w3 w4 w5 w6 w7 w8" // one exact 8-token window
    val docs = Seq(
      (0L, s"$span unique0 tail0 a b c"),     // shares `span` with doc 1
      (1L, s"lead1 $span unique1 x"),
      (2L, s"$span other $span"),             // repeats `span` WITHIN itself
      (3L, "no shared eight token window here at all exists truly"),
      (4L, "short doc")                        // < 8 tokens -> no rows
    ).toDF("doc_id", "text")
    val got = Dedup.dupWindowStats(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute force over sliding windows
    def wins(t: String) = t.split(" ").sliding(8).map(_.mkString(" ")).toSeq
    val all = docs.collect().map(r => r.getLong(0) -> wins(r.getString(1))).toMap
      .filter(_._2.head.split(" ").length == 8)
    val counts = all.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    all.foreach { case (id, ws) =>
      val dup = ws.count(w => counts(w) > 1).toLong
      val exp = (ws.size.toLong, dup, dup * 1000000L / ws.size)
      assert(got(id) == exp, s"doc $id: got ${got(id)} expected $exp")
    }
    assert(!got.contains(4L), "sub-window docs contribute no rows")
    assert(got(2L)._2 > 0, "within-doc repetition must count as duplication")
  }

  test("semantic near-dup: cell-local pairs are a subset of exact, cosines exact") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    // 6 tight clusters of 10 vectors: near-dups concentrate within clusters,
    // which is exactly the regime SemDeDup's cell bucketing exploits
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin((i % 6) * 2.1 + d * 0.8) + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    Similarity.writeIvfIndex(emb, dir, nlist = 6, dim = 16)
    val sem = Dedup.semanticNearDupPairs(spark, dir, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val exact = Dedup.embeddingNearDupPairs(emb, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(sem.keySet.subsetOf(exact.keySet),
      "precision must be exact (pairs re-scored within cells)")
    sem.foreach { case (k, c) =>
      assert(c == exact(k), s"cosine diverged for $k") }
    assert(sem.nonEmpty && sem.size.toDouble / exact.size >= 0.5,
      s"clustered data should keep recall: ${sem.size}/${exact.size}")
  }

  test("removeDupSpans: canonical copy survives, later copies stripped") {
    val corpus = Seq(
      // 10 (lowest id) holds the canonical window; 11 repeats it with a tail
      (10L, "a b c d e f g h x y z"),
      (11L, "a b c d e f g h p q r"),
      (12L, "k l m"),                          // shorter than the window: untouched
      (13L, "s1 s2 s3 s4 s5 s6 s7 s8 s1 s2 s3 s4 s5 s6 s7 s8"), // self-repeat
      (14L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (15L, "w1 w2 w3 w4 w5 w6 w7 w8")         // exact dup of 14: fully removed
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(corpus, 8).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == (("a b c d e f g h x y z", 11L, 0L)), s"canonical kept: ${out(10L)}")
    assert(out(11L) == (("p q r", 3L, 8L)), s"later copy stripped: ${out(11L)}")
    assert(out(12L) == (("k l m", 3L, 0L)))
    assert(out(13L) == (("s1 s2 s3 s4 s5 s6 s7 s8", 8L, 8L)), s"self-repeat: ${out(13L)}")
    assert(out(14L) == (("w1 w2 w3 w4 w5 w6 w7 w8", 8L, 0L)))
    assert(out(15L) == (("", 0L, 8L)), s"full removal: ${out(15L)}")
    // removal is idempotent: a clean corpus passes through unchanged
    val again = Dedup.removeDupSpans(
      corpus.filter(col("doc_id") isin (10L, 12L, 13L)), 8)
    assert(again.filter(col("n_removed") > 0).count() == 1) // only 13's self-repeat
  }

  test("canonicalPick: best member wins, ties to smallest id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("doc_id", "rep_id")
    val docs = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (7L, 0.2))
      .toDF("doc_id", "q")
    val got = Dedup.canonicalPick(labels, docs, "q").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((2L, 3L, 0.9, 2.3))) // 2 beats 3 on the id tie
    assert(got(7L) == ((7L, 1L, 0.2, 0.2))) // singleton keeps itself
  }

  test("lshPlan: divisor grid, S-curve monotonicity, one chosen row") {
    val plan = Dedup.lshPlan(spark, 16, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(plan.map(_._1).sorted.toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    assert(plan.forall(p => p._1 * p._2 == 16L))
    // b=1 (one band of 16 rows): s50 = 1, nearly everything below the
    // curve -> tiny FP, huge FN; b=16 (16 bands of 1 row): the opposite
    val byB = plan.map(p => p._1 -> p).toMap
    assert(byB(1L)._4 < byB(16L)._4)  // fp grows with bands
    assert(byB(1L)._5 > byB(16L)._5)  // fn shrinks with bands
    assert(plan.count(_._7) == 1)     // exactly one chosen split
    val chosen = plan.find(_._7).get
    assert(chosen._6 == plan.map(_._6).min) // it minimizes total error
    // s50 check: b=4, r=4 -> (1/4)^(1/4)
    assert(byB(4L)._3 == math.rint(math.pow(0.25, 0.25) * 1e6) / 1e6)
  }

}
