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
}
