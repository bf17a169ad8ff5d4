package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training picks the weighted-max pair with deterministic tie-break") {
    // "aaab"x3 + "aab"x2: (a,a)=6+2=8 beats (a,b)=3+2=5 -> merge 0.
    // After merging: [aa,a,b]x3 + [aa,b]x2: (aa,a)=3, (a,b)=3, (aa,b)=2 —
    // the 3-3 tie breaks lexicographically to (a,b).
    val merges = Bpe.trainMerges(Seq("aaab" -> 3L, "aab" -> 2L), 3)
    assert(merges.take(3) == Seq((0, "a", "a"), (1, "a", "b"), (2, "aa", "ab")))
  }

  test("training stops early when no pairs remain") {
    assert(Bpe.trainMerges(Seq("a" -> 5L, "b" -> 2L), 10).isEmpty)
  }

  /** Standard batch BPE application: merges applied in rank order, each
    * replacing every left-to-right non-overlapping occurrence — the
    * classical formulation, used here as an independent cross-check of
    * Bpe.encode's one-at-a-time form. */
  private def batchEncode(token: String,
      merges: Seq[(Int, String, String)]): Vector[String] = {
    var syms = token.map(_.toString).toVector
    var changed = true
    while (changed && syms.length > 1) {
      changed = false
      // lowest-rank merge present anywhere in the current symbol list
      val applicable = merges.find { case (_, l, r) =>
        syms.indices.dropRight(1).exists(i => syms(i) == l && syms(i + 1) == r)
      }
      applicable.foreach { case (_, l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            b += l + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result(); changed = true
      }
    }
    syms
  }

  test("encode equals classical batch application on a trained table") {
    val dict = Seq("lowest" -> 6L, "lower" -> 4L, "low" -> 8L, "newest" -> 5L,
      "wide" -> 3L, "widest" -> 2L, "news" -> 4L)
    val merges = Bpe.trainMerges(dict, 20)
    val ranks = merges.map { case (r, l, h) => (l, h) -> r }.toMap
    val probes = dict.map(_._1) ++ Seq("widely", "lowdown", "stew", "zzz", "a", "")
    probes.foreach { t =>
      assert(Bpe.encode(t, ranks) == batchEncode(t, merges), s"token=$t")
    }
  }

  test("encode with no merges yields characters; merged pieces concatenate back") {
    assert(Bpe.encode("abc", Map.empty) == Vector("a", "b", "c"))
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(Bpe.encode("abcabc", ranks).mkString == "abcabc")
    assert(Bpe.encode("abcabc", ranks) == Vector("abc", "abc"))
  }

  test("subwordCounts: broadcast piece counts aggregate per document") {
    val docs = Seq((1L, "ab ab cd"), (2L, "abcd")).toDF("doc_id", "text")
    val merges = Seq((0, "a", "b"))
    val got = Bpe.subwordCounts(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: ab->1 piece (x2), cd->2 pieces => 3 tokens, 4 subwords
    // doc 2: abcd->[ab,c,d] => 1 token, 3 subwords
    assert(got == Set((1L, 3L, 4L), (2L, 1L, 3L)))
  }

  test("subwordCounts: size gate flips broadcast to shuffle join, rows identical") {
    val docs = Seq((1L, "ab ab cd"), (2L, "abcd"), (3L, "cd x abx"))
      .toDF("doc_id", "text")
    val merges = Seq((0, "a", "b"))
    // disable stats-based auto-broadcast so the gate's hint is the only
    // possible broadcast source in the static plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bc = Bpe.subwordCounts(docs, merges, maxBroadcastTokens = Long.MaxValue)
      val sh = Bpe.subwordCounts(docs, merges, maxBroadcastTokens = 0L)
      assert(bc.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
      assert(!sh.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // doc 3: cd->[c,d], x->[x], abx->[ab,x] => 3 tokens, 5 subwords
      val expect = Set((1L, 3L, 4L), (2L, 1L, 3L), (3L, 3L, 5L))
      assert(rows(bc) == expect)
      assert(rows(sh) == expect)
      // auto gate on a tiny dictionary lands on the broadcast side
      val auto = Bpe.subwordCounts(docs, merges)
      assert(auto.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
      assert(rows(auto) == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fitMerges is deterministic end-to-end on a DataFrame corpus") {
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "the the cat"))
      .toDF("doc_id", "text")
    val m1 = Bpe.fitMerges(docs, numMerges = 10)
    val m2 = Bpe.fitMerges(docs, numMerges = 10)
    assert(m1 == m2 && m1.nonEmpty)
    // count-4 pairs are (t,h), (h,e) and (a,t) [cat x3 + sat]; the tie
    // breaks lexicographically to (a,t)
    assert(m1.head == ((0, "a", "t")))
  }
}
