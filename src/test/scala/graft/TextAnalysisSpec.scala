package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats and quality on hand-computed docs") {
    val docs = Seq(
      (0L, "the a the b"),
      (1L, "x y z"),
      (2L, "the the the the")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.docStats(docs).collect().sortBy(_.getLong(0))
    // doc 0: 4 tokens, 3 distinct (the,a,b), 3 stopwords
    assert(rows(0).getLong(1) == 4 && rows(0).getLong(2) == 3 && rows(0).getLong(3) == 3)
    val q0 = 0.4 * math.min(1.0, 4.0 / 100) + 0.3 * (1 - 3.0 / 4) + 0.3 * (3.0 / 4)
    assert(math.abs(rows(0).getDouble(4) - q0) < 1e-6)
    // doc 1: no stopwords, all distinct
    assert(rows(1).getLong(1) == 3 && rows(1).getLong(2) == 3 && rows(1).getLong(3) == 0)
    // doc 2: all stopwords, 1 distinct
    assert(rows(2).getLong(2) == 1 && rows(2).getLong(3) == 4)
  }

  test("htmlExtract: hand-built containers strip to exactly the main text") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script holding a bare '<' and an entity never leaks into the text
      (0L, "<html><script>if (a < b) { s = \"&amp;\"; }</script><p>hello world</p></html>",
        "hello world"),
      // style + comment removed; nav boilerplate keeps only its text
      (1L, "<style>p{x:1}</style><!-- hidden --><nav><a href=\"/x\">home</a></nav><p>body</p>",
        "home body"),
      // entity decode order: &amp;lt; is the LITERAL '&lt;' the author
      // wrote — must not double-decode into '<'
      (2L, "<p>a &amp;lt; b &lt;i&gt;c&#39;d&quot;e&nbsp;f</p>",
        "a &lt; b <i>c'd\"e f"),
      // multi-line script span ((?s)) and whitespace collapse
      (3L, "<script>\nvar a = 1;\nvar b = 2;\n</script>\n\n<p>one\n two</p>",
        "one two"))
    val got = cases.map(c => (c._1, c._2)).toDF("doc_id", "html")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.htmlExtract(col("html")).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"doc $id: got '${got(id)}' want '$want'")
    }
  }

  test("url parts and domain cap: hand cases, and the cap plans through the heap execs") {
    import org.apache.spark.sql.functions.col
    import graft.operators.TextAnalysis._
    val u = Seq(
      (1L, "https://a-1.example.com/p/1?ref=en", 10L),
      (2L, "https://a-1.example.com/p/2?ref=en", 30L),
      (3L, "https://a-1.example.com/p/3?ref=en", 20L),
      (4L, "https://b-2.example.org/x", 5L))
      .toDF("doc_id", "url", "n_chars")
      .select(col("doc_id"), col("n_chars"), col("url"),
        urlHost(col("url")).as("host"), urlDomain(col("url")).as("domain"),
        urlTld(col("url")).as("tld"), urlPath(col("url")).as("path"))
    val parts = u.collect().map(r => r.getLong(0) ->
      (r.getString(3), r.getString(4), r.getString(5), r.getString(6))).toMap
    assert(parts(1L) == (("a-1.example.com", "example.com", "com", "/p/1")))
    assert(parts(4L) == (("b-2.example.org", "example.org", "org", "/x")))
    val capped = domainCap(u, "host", col("n_chars"), k = 2)
    val kept = capped.collect().map(r => r.getLong(0)).toSet
    // host a-1: n_chars 30 (doc 2), 20 (doc 3) kept; 10 (doc 1) capped out
    assert(kept == Set(2L, 3L, 4L))
    val plan = capped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"),
      s"domain cap must plan through the bounded-heap execs:\n$plan")
    assert(!plan.contains("WindowExec"), "no rank window on the cap path")
  }

  test("fingerprint is the documented rolling hash") {
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    val fp = TextAnalysis.docStats(docs).collect().head.getLong(6)
    val expected = (('a'.toInt.toLong * 131) + 'b'.toInt) % 2147483647L
    assert(fp == expected)
  }

  test("native poly_hash == HOF fold on generated strings (property)") {
    import org.scalacheck.Gen
    // printable-ASCII strings incl. empties and runs of the same char
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val samples = Gen.listOfN(300, gen).sample.get
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val diff = df.select(
      TextAnalysis.fingerprint($"text").as("nat"),
      TextAnalysis.fingerprintHof($"text").as("hof"))
      .filter($"nat" =!= $"hof").count()
    assert(diff == 0)
    // and both equal the reference fold computed in plain Scala
    val direct = samples.map(s =>
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % 2147483647L))
    val got = df.orderBy("doc_id").select(TextAnalysis.fingerprint($"text"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == direct)
  }

  test("native poly_hash matches the interpreted HOF fold on fixture text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      TextAnalysis.fingerprint($"text").as("nat"),
      TextAnalysis.fingerprintHof($"text").as("hof"))
      .filter($"nat" =!= $"hof").count()
    assert(diff == 0)
    // edge cases: empty string and a single char
    val edge = Seq((0L, ""), (1L, "z")).toDF("doc_id", "text")
    val rows = edge.select(TextAnalysis.fingerprint($"text"),
      TextAnalysis.fingerprintHof($"text")).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    assert(rows(1).getLong(0) == 'z'.toInt.toLong)
  }

  test("normalization and BPE-ish subword counting") {
    val docs = Seq((0L, "Hello,  WORLD!! x9z"), (1L, "")).toDF("doc_id", "text")
    val rows = docs.select(
      TextAnalysis.normalizeText($"text").as("n"),
      TextAnalysis.subwordCount($"text").as("c")).collect()
    assert(rows(0).getString(0) == "hello world x9z")
    // hello , world ! ! x 9 z -> 8 subwords
    assert(rows(0).getLong(1) == 8)
    assert(rows(1).getString(0) == "" && rows(1).getLong(1) == 0)
  }

  test("repetition stats: hand-computed ngram-repeat and top-token ratios") {
    val docs = Seq(
      (0L, "a b c a b c a b"),   // grams: abc bca cab abc bca cab = 6, 3 distinct
      (1L, "x x x x"),            // grams: xxx xxx = 2, 1 distinct; top token 4/4
      (2L, "u v")                 // too short for 3-grams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got(0) == ((0L, 0.5, 0.375)))  // 1 - 3/6; 'a' 3 of 8
    assert(got(1) == ((1L, 0.5, 1.0)))    // 1 - 1/2; 'x' 4 of 4
    assert(got(2) == ((2L, 0.0, 0.5)))    // no grams
  }

  test("lang prediction: marker hits win; ties resolve alphabetically") {
    val docs = Seq(
      (0L, "join merge join"),      // zh markers
      (1L, "the batch"),            // tie de/en -> de
      (2L, "data query data fast")  // es 3 vs fr 1 -> es
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docStats(docs).collect().sortBy(_.getLong(0)).map(_.getString(5))
    assert(got.toSeq == Seq("zh", "de", "es"))
  }

  test("PII redaction scrubs emails then phones; counts match") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "reach me at alice.smith+spam@sub.example.org or +1 555 123 4567 thanks"),
      (2L, "no pii here just words and the number 42"),
      (3L, "two mails a@b.io c@d.co and digits 123-456-7890")
    ).toDF("doc_id", "text")
    val (ne, np) = TextAnalysis.piiCounts(col("text"))
    val got = df.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("r"), ne.as("ne"), np.as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L)._1 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(got(1L)._2 == 1L && got(1L)._3 == 1L)
    assert(got(2L)._1 == "no pii here just words and the number 42")
    assert(got(2L)._2 == 0L && got(2L)._3 == 0L)
    assert(got(3L)._1 == "two mails <EMAIL> <EMAIL> and digits <PHONE>")
    assert(got(3L)._2 == 2L && got(3L)._3 == 1L)
  }

  test("tfidf top-k: hand-computed scores, rank by rounded score then token") {
    val df = Seq(
      (1L, "cat cat dog"),   // cat tf=2 df=1, dog tf=1 df=2
      (2L, "dog bird"),      // bird tf=1 df=1
      (3L, "fish")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(df, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toList.sortBy(t => (t._1, t._5))
    def s(tf: Long, dfq: Long) =
      BigDecimal(tf * math.log(4.0 / (dfq + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == List(
      (1L, "cat", 2L, s(2, 1), 1L),  // 2*ln(2) > 1*ln(4/3)
      (1L, "dog", 1L, s(1, 2), 2L),
      (2L, "bird", 1L, s(1, 1), 1L), // ln(2) > ln(4/3)
      (2L, "dog", 1L, s(1, 2), 2L),
      (3L, "fish", 1L, s(1, 1), 1L)), s"got=$got")
    // k bounds the per-doc output
    assert(TextAnalysis.tfidfTopK(df, 1).groupBy("doc_id").count()
      .collect().forall(_.getLong(1) == 1L))
  }

  test("token chunking: overlap, tail window, and degenerate docs") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens
      (2L, "only"),
      (3L, "")
    ).toDF("doc_id", "text")
    // chunkSize 4, stride 3 -> doc 1 windows start at 0, 3, 6
    val got = TextAnalysis.chunkTokens(df, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, "t0 t1 t2 t3", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L),
      (1L, 2L, "t6", 1L)))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "only", 1L)))
    // split("", " ") yields one empty token -> one empty chunk (both engines)
    assert(got.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "", 1L)))
    // stride == chunkSize -> disjoint cover, every token exactly once
    val disjoint = TextAnalysis.chunkTokens(df, 3, 3)
      .filter(col("doc_id") === 1L).collect()
      .map(r => r.getString(2)).mkString(" ")
    assert(disjoint == "t0 t1 t2 t3 t4 t5 t6")
  }

  test("token diversity: hand-computed entropy and TTR extremes") {
    val df = Seq(
      0L -> "a b c d",     // all distinct: H = ln 4, TTR = 1
      1L -> "a a a a",     // one type:     H = 0,    TTR = 0.25
      2L -> "a a b b b c"  // mixed: H = ln 6 - (2ln2 + 3ln3)/6
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenDiversity(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) == ((4L, 4L, 1.0, r6(math.log(4)))))
    assert(got(1L) == ((4L, 1L, 0.25, r6(math.log(4) - (r6(4 * math.log(4)) / 4)))))
    val s2 = r6(2 * math.log(2)) + r6(3 * math.log(3)) // decimal sum of rounded terms
    assert(got(2L) == ((6L, 3L, 0.5, r6(math.log(6) - s2 / 6))))
  }

  test("noveltyScore: cross-doc unique-gram share, distinct grams, exact ppm") {
    val df = Seq(
      (0L, "s", "a b c d"), // grams {a b c, b c d}: first shared with doc 1
      (1L, "s", "a b c x"), // grams {a b c, b c x}
      (2L, "s", "z z z z")  // grams collapse to the single distinct {z z z}
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.noveltyScore(df, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((2L, 1L, 500000L)))
    assert(got(1L) == ((2L, 1L, 500000L)))
    assert(got(2L) == ((1L, 1L, 1000000L)), "repeated grams count once per doc")
  }

  test("quantileLengthGate: per-source ceil-rank bounds, sources independent") {
    // source A: lengths 1..10 => P10 target rank 1 (lo = 1), P90 rank 9
    // (hi = 9): the single longest doc is dropped. Source B: constant
    // length 5 => lo = hi = 5, everything survives.
    val a = (1 to 10).map(i => (i.toLong, "A", Seq.fill(i)("w").mkString(" ")))
    val b = (11 to 14).map(i => (i.toLong, "B", "w w w w w"))
    val df = (a ++ b).toDF("doc_id", "source", "text")
    val got = TextAnalysis.quantileLengthGate(df, 10, 90).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.count(_._2 == "A") == 9, s"A keeps ranks 1..9: ${got.toSeq}")
    assert(!got.exists(t => t._2 == "A" && t._3 == 10L), "A's longest dropped")
    assert(got.count(_._2 == "B") == 4, "constant-length source fully survives")
    intercept[IllegalArgumentException](TextAnalysis.quantileLengthGate(df, 90, 10))
  }

  test("keyness: target-exclusive word scores positive, shared word near zero") {
    // 'alpha' only in target docs, 'beta' only in background, 'common' in both
    val tgt = (1 to 20).map(i => (i.toLong, "en", ("alpha common " * 3).trim))
    val bg = (21 to 40).map(i => (i.toLong, "de", ("beta common " * 3).trim))
    val df = (tgt ++ bg).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.keyness(df, col("lang") === "en", minCount = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double](3), r.getAs[Double](4))).toMap
    assert(got.keySet == Set("alpha", "beta", "common"))
    assert(got("alpha")._1 == 60L && got("alpha")._2 == 0L)
    assert(got("alpha")._4 > 1.0, s"target-exclusive z: ${got("alpha")}")
    assert(got("beta")._4 < -1.0, s"background-exclusive z: ${got("beta")}")
    assert(math.abs(got("common")._4) < 0.5, s"balanced word z: ${got("common")}")
    // prior shrinkage: z is finite even for zero counts on one side
    assert(!got("alpha")._4.isInfinite && !got("beta")._4.isInfinite)
  }

  test("keyness: deterministic across partitionings, minCount gates rare words") {
    val docs = (1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else "xx",
        s"w${i % 7} w${i % 5} rare${i}"))
    val df = docs.toDF("doc_id", "lang", "text")
    val a = TextAnalysis.keyness(df.repartition(1), col("lang") === "en", minCount = 5)
      .orderBy("word").collect().toSeq
    val b = TextAnalysis.keyness(df.repartition(11), col("lang") === "en", minCount = 5)
      .orderBy("word").collect().toSeq
    assert(a == b)
    assert(!a.exists(_.getString(0).startsWith("rare")), "singletons gated out")
  }

  test("textrank: the hub word of a star corpus ranks first") {
    // "core" co-occurs with every spoke; spokes only see core + one chain
    val docs = Seq((1L, "core alpha"), (2L, "core beta"), (3L, "core gamma"),
      (4L, "core delta"), (5L, "core epsilon"), (6L, "alpha beta"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.textRankKeywords(docs, window = 2, k = 10).collect()
    assert(rows.head.getString(0) == "core")
    assert(rows.head.getDouble(2) > rows(1).getDouble(2))
  }

  test("textrank: stopwords and short tokens never become keywords") {
    val docs = Seq((1L, "the cat it the hat"), (2L, "a it of cat hat"),
      (3L, "cat hat mat")).toDF("doc_id", "text")
    val words = TextAnalysis.textRankKeywords(docs, window = 2, k = 10)
      .collect().map(_.getString(0)).toSet
    assert(words.subsetOf(Set("cat", "hat", "mat")))
    assert(!words.exists(_.length < 3))
  }

  test("textrank: partitioning-invariant (integer fixed-point rounds)") {
    val docs = (1 to 60).map(i =>
      (i.toLong, s"word${i % 7} word${i % 5} word${i % 3} filler${i % 11}"))
      .toDF("doc_id", "text")
    def run(p: Int) = TextAnalysis.textRankKeywords(docs.repartition(p), 2, 10)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(run(1) == run(9))
  }

  test("readability: hand-computed counts and both FK formulas") {
    // 4 words, 2 sentence runs (. and !!), 3 vowel runs + 1 no-vowel word
    val docs = Seq((1L, "the cat. sat!! xz")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 2L, 4L)))
    // wps = 2, spw = 1: fk = 0.39*2 + 11.8 - 15.59; ease = 206.835 - 2.03 - 84.6
    assert(r.getDouble(4) == math.rint((0.39 * 2 + 11.8 * 1 - 15.59) * 1e6) / 1e6)
    assert(r.getDouble(5) ==
      math.rint((206.835 - 1.015 * 2 - 84.6 * 1) * 1e6) / 1e6)
    // no terminal punctuation floors sentences at 1; 'y' counts as a vowel
    val r2 = TextAnalysis.readability(
      Seq((2L, "dry gym myth")).toDF("doc_id", "text")).collect().head
    assert((r2.getLong(2), r2.getLong(3)) == ((1L, 3L)))
  }

  test("gopher gate: hand-computed measures, each rule independently trips") {
    val long = ("the quick brown fox " * 15).trim // 60 words, stopword 'the' x15
    val docs = Seq(
      (0L, long), // passes every rule at minWords=50
      (1L, "short doc here"), // n_words = 3 < minWords
      (2L, ("the " * 60).trim), // top_token_share = 1 > 0.2
      (3L, ("aaaaaaaaaaaaaaa " * 60).trim + " the the") // mean len > 10
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherGate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d0 = got(0L)
    assert(d0.getLong(1) == 60)
    // chars: (3+5+5+3)*15 = 240 -> mean 4.0; alpha all; stops 15; top 15/60
    assert(d0.getDouble(2) == 4.0 && d0.getDouble(3) == 1.0)
    assert(d0.getLong(4) == 15 && d0.getDouble(5) == 0.25)
    // 'quick' x15 = 25% > 0.2 -> doc 0 FAILS the concentration cap, honest
    assert(!d0.getBoolean(6))
    assert(!got(1L).getBoolean(6) && !got(2L).getBoolean(6) && !got(3L).getBoolean(6))
    // relaxing only the concentration cap lets doc 0 through
    val relaxed = TextAnalysis.gopherGate(docs, maxTopTokenShare = 0.3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(relaxed(0L) && !relaxed(1L) && !relaxed(2L) && !relaxed(3L))
  }

  test("bleu: identical, hand-computed partial, clipped, brevity, disjoint") {
    val pairs = Seq(
      (0L, "a b c d", "a b c d"), // identical -> 1.0
      (1L, "a b c d", "a b x d"), // p1 = 3/4, p2 = 1/3 -> bleu 0.5
      (2L, "the the the the", "the cat"), // clipping: p1 = 1/4, p2 = 0
      (3L, "a b", "a b c d"), // brevity penalty engages
      (4L, "p q r s", "w x y z") // disjoint -> 0
    ).toDF("pair_id", "cand", "ref")
    val got = TextAnalysis.bleuPairs(pairs, "pair_id", "cand", "ref", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(0L) == ((4L, 4L, 1.0, 1.0, 1.0)))
    // p2 rounds to 0.333333; slog = round(ln .75) + round(ln .333333) =
    // -1.386295, exp(/2) rounds to 0.5, bp = 1
    assert(got(1L) == ((4L, 4L, 0.75, 0.333333, 0.5)))
    assert(got(2L) == ((4L, 2L, 0.25, 0.0, 0.0))) // min(4 cand 'the', 1 ref)
    // identical prefix pair: p1 = 1, p2 = 1, bp = round(exp(1-2), 6)
    assert(got(3L) == ((2L, 4L, 1.0, 1.0, 0.367879)))
    assert(got(4L) == ((4L, 4L, 0.0, 0.0, 0.0)))
  }

  test("bleu: partitioning-invariant and robust to one-token candidates") {
    val pairs = (1 to 60).map(i =>
      (i.toLong, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 5} common tail",
        s"w${i % 5} w${(i + 2) % 7} common tail end")).toDF("pid", "c", "r")
    def run(p: Int) = TextAnalysis.bleuPairs(pairs.repartition(p), "pid", "c", "r")
      .orderBy("pid").collect().toSeq
    assert(run(1) == run(9))
    // a one-token candidate has no bigram: kn < maxN -> bleu 0, p1 exact
    val tiny = Seq((0L, "common", "common tail")).toDF("pid", "c", "r")
    val Array(t) = TextAnalysis.bleuPairs(tiny, "pid", "c", "r").collect()
    assert(t.getDouble(3) == 1.0 && t.getDouble(4) == 0.0 && t.getDouble(5) == 0.0)
  }

  test("zipfFit matches a brute OLS over the same rounded log terms") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs).collect().head
    // counts: a:4 b:3 c:2 d:1 -> ranks 1..4
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 10L, 4L)))
    val pts = Seq((1, 4), (2, 3), (3, 2), (4, 1)).map { case (rk, c) =>
      (math.rint(math.log(rk) * 1e6) / 1e6, math.rint(math.log(c) * 1e6) / 1e6)
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(3) - slope) < 2e-6)
    assert(slope < -0.5 && slope > -1.5)
  }

  test("repetition signals: hand-computed gram fractions, short docs excluded") {
    val docs = Seq(
      (0L, "a b a b a"),             // 2g: ab,ba,ab,ba  3g: aba,bab,aba
      // all grams distinct, long enough that top2_share = 1/(n-1) <= 0.05
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")),
      (2L, "hi there"),              // 2 tokens -> excluded (no 3-gram)
      (3L, ("spam " * 10).trim)      // one phrase repeated: maximal repetition
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(2L), "docs under 3 tokens have no 3-gram denominator")
    val d0 = got(0L)
    // n_words=5; 2-grams total 4 distinct 2 max 2 -> dup 0.5, top 0.5;
    // 3-grams total 3 distinct 2 -> dup 1 - 2/3
    assert(d0.getLong(1) == 5L && d0.getDouble(2) == 0.5 &&
      d0.getDouble(3) == 0.5)
    assert(d0.getDouble(4) == math.rint((1.0 - 2.0 / 3.0) * 1e6) / 1e6)
    assert(!d0.getBoolean(5))
    val d1 = got(1L)
    assert(d1.getDouble(2) == 0.0 && d1.getDouble(4) == 0.0 &&
      d1.getBoolean(5), "a long all-distinct doc passes")
    // the top-share floor is 1/(n_words-1): 1/24 here
    assert(d1.getDouble(3) == math.rint(1.0 / 24.0 * 1e6) / 1e6)
    val d3 = got(3L)
    // "spam"x10: 9 identical 2-grams -> dup 8/9, top 1.0
    assert(d3.getDouble(2) == math.rint(8.0 / 9.0 * 1e6) / 1e6 &&
      d3.getDouble(3) == 1.0 && !d3.getBoolean(5))
  }
}
