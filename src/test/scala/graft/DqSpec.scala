package graft

import graft.operators.Dq
import org.apache.spark.sql.Row

class DqSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): (String, Long, Long, Double) = {
    val Array(Row(c: String, v: Long, t: Long, r: Double)) = df.collect()
    (c, v, t, r)
  }

  test("notNull counts null rows") {
    val d = Seq(Some("a"), None, Some("b"), None, Some("c")).toDF("x")
    assert(one(Dq.notNull(d, "x")) == (("not_null(x)", 2L, 5L, 0.4)))
  }

  test("uniqueKey counts excess rows per duplicate key; null keys violate") {
    val d = Seq(Some("a"), Some("a"), Some("b"), None).toDF("k")
    assert(one(Dq.uniqueKey(d, Seq("k"))) == (("unique(k)", 2L, 4L, 0.5)))
    val clean = Seq("x", "y", "z").toDF("k")
    assert(one(Dq.uniqueKey(clean, Seq("k"))) == (("unique(k)", 0L, 3L, 0.0)))
  }

  test("uniqueKey on a composite key") {
    val d = Seq(("a", 1), ("a", 2), ("a", 2)).toDF("k1", "k2")
    assert(one(Dq.uniqueKey(d, Seq("k1", "k2")))
      == (("unique(k1,k2)", 1L, 3L, 0.333333)))
  }

  test("foreignKey counts orphans; null fks pass") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    assert(one(Dq.foreignKey(child, "fk", parent, "pk"))
      == (("foreign_key(fk->pk)", 1L, 4L, 0.25)))
  }

  test("inRange counts out-of-band values; nulls pass") {
    val d = Seq(Some(0.5), Some(1.5), None, Some(-1.0)).toDF("v")
    assert(one(Dq.inRange(d, "v", 0.0, 1.0))
      == (("in_range(v,0.0,1.0)", 2L, 4L, 0.5)))
  }

  test("empty tables report 0/0 with rate 0.0, not a divide-by-zero") {
    val d = Seq.empty[Option[String]].toDF("x")
    assert(one(Dq.notNull(d, "x")) == (("not_null(x)", 0L, 0L, 0.0)))
  }

  test("audit stacks checks into one report") {
    val d = Seq(Some("a"), None).toDF("x")
    val rep = Dq.audit(Seq(Dq.notNull(d, "x"), Dq.uniqueKey(d, Seq("x"))))
      .collect()
    assert(rep.length == 2 && rep.map(_.getString(0)).toSet
      == Set("not_null(x)", "unique(x)"))
  }

  test("numericProfile: hand-computed counts, nulls, distincts, range, mean") {
    val df = Seq((Some(1.0), 10.0), (Some(2.0), 10.0), (None, 30.0),
      (Some(2.0), 20.0)).toDF("a", "b")
    val got = Dq.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 1 && a.getLong(3) == 2)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 2.0)
    assert(a.getDouble(6) == 1.666667) // (1+2+2)/3 round-6
    val b = got("b")
    assert(b.getLong(2) == 0 && b.getLong(3) == 3 && b.getDouble(6) == 17.5)
  }

  test("benford: hand-computed digit shares, dense 1..9 grid") {
    // cents: 100, 250, 1999, 5 -> leading digits 1, 2, 1, 5; <= 0 excluded
    val df = Seq(("g", 1.00), ("g", 2.50), ("g", 19.99), ("g", 0.05),
      ("g", -3.0), ("g", 0.0)).toDF("grp", "amt")
    val rows = Dq.benfordReport(df, "grp", "amt").orderBy("digit").collect()
    assert(rows.length == 9) // all digits present even with zero counts
    val byDigit = rows.map(r => r.getInt(1) -> r).toMap
    assert(byDigit(1).getLong(2) == 2 && byDigit(1).getDouble(3) == 0.5)
    assert(byDigit(2).getLong(2) == 1 && byDigit(5).getLong(2) == 1)
    assert(byDigit(3).getLong(2) == 0 && byDigit(3).getDouble(3) == 0.0)
    // expected(1) = log10(2) = 0.30103; dev = 0.5 - 0.30103
    assert(byDigit(1).getDouble(4) == 0.30103)
    assert(byDigit(1).getDouble(5) == 0.19897)
  }

  test("benford: conforming magnitudes deviate less than clipped ones") {
    // spread over 3 decades (roughly Benford) vs all clipped to 5xx.xx
    val spread = (1 to 300).map(i => ("spread", i * i * 0.037 + 1.0))
    val clipped = (1 to 300).map(i => ("clip", 500.0 + i * 0.31))
    val rep = Dq.benfordReport((spread ++ clipped).toDF("grp", "amt"), "grp", "amt")
    val maxDev = rep.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => math.abs(r.getDouble(5))).max).toMap
    assert(maxDev("clip") > maxDev("spread"))
    assert(maxDev("clip") > 0.5) // every clipped amount leads with 5
  }

  test("balanceReport: uniform is 1, constant is 0, nulls dropped") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val df = Seq(("a", "x", Some("only")), ("b", "x", Some("only")),
      ("c", "y", None), ("d", "y", Some("only")))
      .toDF("u4", "u2", "k1")
    val got = Dq.balanceReport(df, Seq("u4", "u2", "k1")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // per-term round-6 then sum (the DECIMAL contract): H = k*round6(term),
    // a hair above ln(k), so norm lands at 1.000001 — pinned, not hidden
    val h4 = 4 * r6(0.25 * math.log(4.0))
    val h2 = 2 * r6(0.5 * math.log(2.0))
    assert(got("u4") == ((4L, 4L, 0.25, r6(h4), r6(h4 / math.log(4.0)))))
    assert(got("u2") == ((4L, 2L, 0.5, r6(h2), r6(h2 / math.log(2.0)))))
    assert(got("k1") == ((3L, 1L, 1.0, 0.0, 0.0))) // null row dropped, k=1
    // skew: 3-vs-1 over two values sits strictly between 0 and 1
    val skew = Dq.balanceReport(Seq("a", "a", "a", "b").toDF("s"), Seq("s"))
      .collect().head
    assert(skew.getDouble(5) > 0.0 && skew.getDouble(5) < 1.0)
  }
}
