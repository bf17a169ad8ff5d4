package graft

import graft.operators.Association

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // baskets: b1={x,y,z} (x twice — presence, not multiplicity), b2={x,y},
  // b3={x,z}, b4={x,w}, b5={y,z,w}
  private val tx = Seq(
    (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
    (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "z"),
    (4L, "x"), (4L, "w"),
    (5L, "y"), (5L, "z"), (5L, "w")
  ).toDF("basket", "item")

  test("frequentItems counts basket presence, not row multiplicity") {
    val got = Association.frequentItems(tx, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("x", 4L), ("y", 3L), ("z", 3L), ("w", 2L)))
  }

  test("frequentPairs prunes by min support on the PAIR") {
    val got = Association.frequentPairs(tx, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // (x,w),(y,w),(z,w) each co-occur once -> gone; survivors co-occur twice
    assert(got == Set(("x", "y", 2L), ("x", "z", 2L), ("y", "z", 2L)))
  }

  test("rules carry exact integer conf/lift ppm and rank by lift") {
    val got = Association.associationRules(tx, "basket", "item", 2L, 10)
      .collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // n_baskets = 5; lift(y,z) = 1e6*2*5 // (3*3) = 1111111 tops the board
    val byRule = got.map(t => (t._2, t._1) -> t).toMap
    assert(got.take(2).map(t => (t._2, t._1)).toSet ==
      Set(("y", "z"), ("z", "y")))
    assert(byRule(("y", "z")) == ("z", "y", 2L, 3L, 3L, 666666L, 1111111L))
    assert(byRule(("x", "y")) == ("y", "x", 2L, 4L, 3L, 500000L, 833333L))
    assert(byRule(("y", "x")) == ("x", "y", 2L, 3L, 4L, 666666L, 833333L))
    assert(got.length == 6)
  }

  test("rules are invariant to input partitioning") {
    val a = Association.associationRules(tx.repartition(1), "basket", "item",
      2L, 10).collect().toSeq
    val b = Association.associationRules(tx.repartition(7), "basket", "item",
      2L, 10).collect().toSeq
    assert(a == b)
  }

  test("itemPairSimilarity: hand-computed jaccard/cosine, infrequent pruned") {
    val tx = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (3L, "z")).toDF("basket", "item")
    val got = Association.itemPairSimilarity(tx, "basket", "item", 2L)
      .collect()
    assert(got.length == 1) // z (sup 1) pruned before pairing
    val r = got.head
    assert((r.getString(0), r.getString(1)) == (("x", "y")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((3L, 2L, 2L)))
    assert(r.getDouble(5) == 0.666667) // 2/(3+2-2)
    assert(r.getDouble(6) == math.rint(2.0 / math.sqrt(6.0) * 1e6) / 1e6)
  }
}
