package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bm25: matches a hand-rolled reference on a tiny corpus") {
    val corpus = Seq(
      0L -> "cat dog cat bird",
      1L -> "dog dog dog dog dog dog dog dog",
      2L -> "cat cat cat cat",
      3L -> "fish bird fish bird")
    val got = Retrieval.bm25TopK(docsDf(corpus: _*), Seq("cat", "dog"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))

    // reference: same formula in plain scala over the same corpus
    val k1 = 1.2; val b = 0.75
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n.toDouble
    def df(term: String) = toks.count(_._2.contains(term))
    def score(id: Long): Double = Seq("cat", "dog").flatMap { term =>
      val tf = toks(id).count(_ == term)
      if (tf == 0) None else {
        val idf = math.log((n.toDouble - df(term) + 0.5) / (df(term) + 0.5) + 1.0)
        val dl = toks(id).size.toDouble
        Some(BigDecimal((idf * (tf * (k1 + 1.0))) /
          (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }
    }.sum.toDouble
    val expected = Seq(0L, 1L, 2L).map(id => id -> score(id))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, (i + 1).toLong) }
    assert(got.toSeq == expected, s"got=${got.toSeq} expected=$expected")
    // doc 3 has neither term -> absent
    assert(!got.exists(_._1 == 3L))
  }

  test("bm25: k bounds the result and ranks are dense from 1") {
    val docs = docsDf((0L until 50L).map(i => i -> s"term filler$i word"): _*)
    val got = Retrieval.bm25TopK(docs, Seq("term"), 7).collect()
    assert(got.length == 7)
    assert(got.map(_.getLong(2)).sorted.toSeq == (1L to 7L))
  }

  test("indexed bm25 equals the from-scratch form and prunes at directories") {
    val docs = docsDf((0L until 60L).map(i =>
      i -> s"alpha${i % 7} beta${i % 5} cat dog${i % 3} word$i"): _*)
    val path = java.nio.file.Files.createTempDirectory("inv-index").toString + "/idx"
    Retrieval.writeInvertedIndex(docs, path, nBuckets = 16)
    val terms = Seq("cat", "dog0", "alpha3")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._3).toSeq
    val fromIndex = Retrieval.bm25TopKIndexed(spark, path, terms, 10)
    assert(rows(fromIndex) === rows(Retrieval.bm25TopK(docs, terms, 10)))
    // the probe scan must prune at the DIRECTORY level: PartitionFilters on
    // tb, not a post-scan token filter over every bucket
    val plan = fromIndex.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(plan).isDefined,
      s"probed term buckets must reach PartitionFilters:\n$plan")
  }

  test("inverted index is self-describing: stats row drives the probe") {
    val docs = docsDf(0L -> "a b c", 1L -> "a a d")
    val path = java.nio.file.Files.createTempDirectory("inv-index").toString + "/idx"
    Retrieval.writeInvertedIndex(docs, path, nBuckets = 8)
    val stats = spark.read.parquet(s"$path/stats").collect()(0)
    assert(stats.getAs[Long]("n_docs") === 2L)
    assert(stats.getAs[Long]("sum_dl") === 6L)
    assert(stats.getAs[Long]("n_buckets") === 8L)
    // dl rides denormalized on every posting row
    val p = spark.read.parquet(s"$path/postings")
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tf"), r.getAs[Long]("dl"))).sortBy(t => (t._2, t._1)).toSeq
    assert(p === Seq(("a", 0L, 1L, 3L), ("b", 0L, 1L, 3L), ("c", 0L, 1L, 3L),
      ("a", 1L, 2L, 3L), ("d", 1L, 1L, 3L)))
  }

  test("incremental index fold serves exactly what a full rebuild serves") {
    val all = (0L until 80L).map(i =>
      i -> s"alpha${i % 7} beta${i % 5} cat dog${i % 3} word$i")
    val base = all.filter(_._1 % 10 != 0)
    val late = all.filter(_._1 % 10 == 0)
    val incPath = java.nio.file.Files.createTempDirectory("inv-inc").toString + "/idx"
    Retrieval.writeInvertedIndex(docsDf(base: _*), incPath, nBuckets = 16)
    Retrieval.invIndexInsert(spark, incPath, docsDf(late: _*), batchId = 1L)
    val fullPath = java.nio.file.Files.createTempDirectory("inv-full").toString + "/idx"
    Retrieval.writeInvertedIndex(docsDf(all: _*), fullPath, nBuckets = 16)
    val terms = Seq("cat", "dog0", "alpha3")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._3).toSeq
    assert(rows(Retrieval.bm25TopKIndexed(spark, incPath, terms, 10)) ===
      rows(Retrieval.bm25TopKIndexed(spark, fullPath, terms, 10)))
    // stats carry the folded constants; base posting files were not
    // rewritten (the append only ADDS files)
    val st = spark.read.parquet(s"$incPath/stats").collect()(0)
    assert(st.getAs[Long]("n_docs") === 80L)
    val fullSt = spark.read.parquet(s"$fullPath/stats").collect()(0)
    assert(st.getAs[Long]("sum_dl") === fullSt.getAs[Long]("sum_dl"))
  }

  test("invIndexInsert is crash/retry safe: completed folds no-op, partial moves sweep") {
    val all = (0L until 40L).map(i => i -> s"tok${i % 5} cat word$i")
    val base = all.filter(_._1 % 4 != 0)
    val late = all.filter(_._1 % 4 == 0)
    val p = java.nio.file.Files.createTempDirectory("inv-retry").toString + "/idx"
    Retrieval.writeInvertedIndex(docsDf(base: _*), p, nBuckets = 8)
    Retrieval.invIndexInsert(spark, p, docsDf(late: _*), batchId = 7L)
    val served = Retrieval.bm25TopKIndexed(spark, p, Seq("cat"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    // retry of the SAME batch id is a committed-fold no-op: stats and
    // served results are byte-identical, no posting file double-appends
    def postingFiles() = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/postings"))
        .filter(_.isDirectory)
        .flatMap(d => fs.listStatus(d.getPath).map(_.getPath.toString)).toSet
    }
    val filesAfterCommit = postingFiles()
    Retrieval.invIndexInsert(spark, p, docsDf(late: _*), batchId = 7L)
    assert(postingFiles() === filesAfterCommit, "retry must not re-append")
    assert(spark.read.parquet(s"$p/stats").collect()(0)
      .getAs[Long]("n_docs") === 40L)
    // simulate a crash mid-move of batch 9: a marked file is in place but
    // stats never advanced — the retry sweeps it and redoes the fold once
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val someTb = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/postings"))
      .filter(_.isDirectory).head.getPath
    val orphan = new org.apache.hadoop.fs.Path(someTb, "b9-orphan.parquet")
    fs.create(orphan).close()
    Retrieval.invIndexInsert(spark, p,
      docsDf(100L -> "cat extra", 101L -> "tok1 more").toDF("doc_id", "text"),
      batchId = 9L)
    assert(!fs.exists(orphan), "recovery sweep must remove the partial move")
    assert(spark.read.parquet(s"$p/stats").collect()(0)
      .getAs[Long]("n_docs") === 42L)
    val served2 = Retrieval.bm25TopKIndexed(spark, p, Seq("cat"), 50).collect()
    assert(served2.map(_.getLong(0)).contains(100L),
      "the redone fold must serve the new batch")
    assert(served.nonEmpty && served2.length >= served.length)
  }

  test("invIndexCompact: identical BM25, per-bucket file count drops, debris swept") {
    val p = java.nio.file.Files.createTempDirectory("inv-compact").toString + "/idx"
    Retrieval.writeInvertedIndex(
      docsDf((0L until 30L).map(i => i -> s"cat tok${i % 4} w$i"): _*),
      p, nBuckets = 4)
    // three daemon folds -> every hot bucket holds base + 3 LSM fragments
    for (bid <- 1L to 3L)
      Retrieval.invIndexInsert(spark, p,
        docsDf((30L + bid * 2) -> s"cat late$bid",
          (31L + bid * 2) -> s"tok1 more$bid"), batchId = bid)
    val terms = Seq("cat", "tok1", "tok3")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val before = rows(Retrieval.bm25TopKIndexed(spark, p, terms, 50))
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketFiles(): Map[String, Int] = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$p/postings"))
      .filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .count(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
      }.toMap
    assert(bucketFiles().values.max > 1, "folds must have fragmented a bucket")
    // plant a crashed-fold partial move (batch 9 never committed): the
    // compactor must sweep it, NOT merge it into an unmarked file where
    // batch 9's retry could no longer remove it
    val someTb = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/postings"))
      .filter(_.isDirectory).head.getPath
    val orphan = new org.apache.hadoop.fs.Path(someTb, "b9-orphan.parquet")
    fs.create(orphan).close()
    Retrieval.invIndexCompact(spark, p)
    assert(!fs.exists(orphan), "incomplete-fold debris must be swept, not merged")
    assert(bucketFiles().values.max == 1,
      s"every bucket must compact to one file: ${bucketFiles()}")
    assert(rows(Retrieval.bm25TopKIndexed(spark, p, terms, 50)) === before,
      "compaction must serve bit-identical BM25 results")
    // and the LSM keeps working: a post-compaction fold appends cleanly
    Retrieval.invIndexInsert(spark, p, docsDf(90L -> "cat post compact"),
      batchId = 4L)
    assert(rows(Retrieval.bm25TopKIndexed(spark, p, Seq("cat"), 60))
      .map(_._1).contains(90L))
    // crash-window recovery: bucket renamed away with its old twin intact
    val tb0 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/postings"))
      .filter(_.isDirectory).head.getPath
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/compact_old"))
    fs.rename(tb0, new org.apache.hadoop.fs.Path(s"$p/compact_old/${tb0.getName}"))
    val served = rows(Retrieval.bm25TopKIndexed(spark, p, terms, 50))
    Retrieval.invIndexCompact(spark, p) // entry recovery rolls the bucket back
    assert(fs.exists(tb0), "recovery must restore the renamed-away bucket")
    assert(rows(Retrieval.bm25TopKIndexed(spark, p, terms, 50)).size >= served.size)
  }

  test("stats swap is crash-safe: roll forward from staged, roll back from old") {
    val p = java.nio.file.Files.createTempDirectory("inv-swap").toString + "/idx"
    Retrieval.writeInvertedIndex(
      docsDf((0L until 20L).map(i => i -> s"cat tok${i % 3} w$i"): _*),
      p, nBuckets = 8)
    Retrieval.invIndexInsert(spark, p,
      docsDf(20L -> "cat late", 21L -> "tok1 late"), batchId = 6L)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pth(s: String) = new org.apache.hadoop.fs.Path(s"$p/$s")
    // crash window A: between commitSwap's two renames — live renamed
    // away (old twin present) with the staged twin complete. Batch 6's
    // postings are fully in place, so recovery rolls FORWARD from staged
    // and the retry of batch 6 is then a committed no-op. (A staged twin
    // with NO old twin is the cold-start partial-write state and sweeps
    // instead — LsmSpec pins that rule.)
    org.apache.hadoop.fs.FileUtil.copy(fs, pth("stats"), fs,
      pth("stats_staged_b6"), false, spark.sparkContext.hadoopConfiguration)
    fs.rename(pth("stats"), pth("stats_old_b6"))
    Retrieval.invIndexInsert(spark, p,
      docsDf(20L -> "cat late", 21L -> "tok1 late"), batchId = 6L)
    assert(fs.exists(pth("stats")) && !fs.exists(pth("stats_staged_b6")))
    assert(spark.read.parquet(s"$p/stats").collect()(0)
      .getAs[Long]("n_docs") === 22L)
    // crash window B (defensive): only the renamed-away old dir survives —
    // recovery rolls BACK and the interrupted batch redoes cleanly
    fs.rename(pth("stats"), pth("stats_old_b8"))
    Retrieval.invIndexInsert(spark, p, docsDf(30L -> "cat newest"),
      batchId = 8L)
    assert(fs.exists(pth("stats")) && !fs.exists(pth("stats_old_b8")))
    val st = spark.read.parquet(s"$p/stats").collect()(0)
    assert(st.getAs[Long]("n_docs") === 23L)
    assert(st.getAs[Long]("last_batch") === 8L)
    assert(Retrieval.bm25TopKIndexed(spark, p, Seq("cat"), 50).collect()
      .map(_.getLong(0)).contains(30L))
  }

  test("phraseHits: exact counts, overlaps, boundaries, short docs") {
    val docs = docsDf(
      0L -> "ban me not ban me",   // 2 hits of "ban me", at start and end
      1L -> "a a a a",             // overlapping windows: 3 hits of "a a"
      2L -> "ban",                 // shorter than every phrase -> no rows
      3L -> "clean text here",     // no hits -> no rows
      4L -> "x ban me stop now y") // one 2-token and one 3-token hit
    val phrases = Seq("ban me", "a a", "stop now y").toDF("phrase")
    val got = Retrieval.phraseHits(docs, phrases)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, "ban me") -> 2L,
      (1L, "a a") -> 3L,
      (4L, "ban me") -> 1L,
      (4L, "stop now y") -> 1L))
  }

  test("phraseFilter: only documents with zero phrase hits survive") {
    val docs = docsDf(
      0L -> "ban me not",
      1L -> "all clean",
      2L -> "ban",        // prefix of a phrase is not a hit
      3L -> "me ban")     // reversed order is not a hit
    val kept = Retrieval.phraseFilter(docs, Seq("ban me").toDF("phrase"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
  }

  private def rl(rows: (Long, Long)*) = rows.toDF("id", "rank")

  test("rrf: hand-computed fusion of two lists") {
    // id 1: ranks 1 and 2 -> 1/61 + 1/62; id 2 only list A rank 2 -> 1/62;
    // id 3 only list B rank 1 -> 1/61
    val a = rl(1L -> 1L, 2L -> 2L)
    val b = rl(3L -> 1L, 1L -> 2L)
    val got = Retrieval.rrfFuse(Seq(a, b), 10).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    def c(r: Long) = BigDecimal(1.0 / (60.0 + r))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L)) // both-lists id first
    assert(got(0)._2 == (c(1) + c(2)).toDouble && got(0)._3 == 2L)
    assert(got(1)._2 == c(1).toDouble && got(1)._3 == 1L)
    // equal-rrf tie (ids 3 and 2 differ: 1/61 vs 1/62) — check id tiebreak
    val tied = Retrieval.rrfFuse(Seq(rl(7L -> 1L), rl(4L -> 1L)), 10)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(4L, 7L))
  }

  test("rrf: k truncates and ranks are dense 1..k") {
    val a = rl((1L to 30L).map(i => i -> i): _*)
    val got = Retrieval.rrfFuse(Seq(a), 5).orderBy("rank").collect()
    assert(got.map(_.getLong(3)).toSeq == (1L to 5L))
    assert(got.map(_.getLong(0)).toSeq == (1L to 5L)) // best ranks win
  }

  test("ndcgAtK: hand-computed DCG/IDCG, unlabeled results, missing labels") {
    import spark.implicits._
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val res = Seq(("q0", 20L, 1L), ("q0", 30L, 2L), ("q0", 99L, 3L))
      .toDF("qid", "item", "rank") // b, a, unlabeled
    val lab = Seq(("q0", 30L, 3L), ("q0", 20L, 2L), ("q0", 40L, 1L))
      .toDF("qid", "item", "rel") // a=3, b=2, c=1 (c never retrieved)
    val Array(row) = Retrieval.ndcgAtK(res, lab, 3).collect()
    val dcg = r6(3.0 / 1.0) + r6(7.0 / (math.log(3.0) / math.log(2.0))) + 0.0
    val idcg = r6(7.0) + r6(3.0 / (math.log(3.0) / math.log(2.0))) +
      r6(1.0 / 2.0)
    assert(row.getLong(1) == 3L)
    assert(row.getDouble(2) == r6(dcg) && row.getDouble(3) == r6(idcg))
    assert(row.getDouble(4) == r6(dcg / idcg))
    assert(row.getDouble(4) > 0 && row.getDouble(4) < 1) // imperfect order
  }

  test("ndcgAtK: perfect ordering scores 1, no relevant labels scores 0") {
    import spark.implicits._
    val res = Seq(("p", 1L, 1L), ("p", 2L, 2L), ("z", 9L, 1L))
      .toDF("qid", "item", "rank")
    val lab = Seq(("p", 1L, 2L), ("p", 2L, 1L)).toDF("qid", "item", "rel")
    val got = Retrieval.ndcgAtK(res, lab, 5).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("p") == 1.0) // result order == ideal order
    assert(got("z") == 0.0) // query with no labeled item at all
  }
}
