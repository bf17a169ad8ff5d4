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
}
