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
}
