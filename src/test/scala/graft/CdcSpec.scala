package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // (key, seq, payload, op)
    ("u1", 1L, "a", "u"),
    ("u1", 3L, "c", "u"),
    ("u1", 2L, "b", "u"),   // out of order: seq 3 still wins
    ("u2", 1L, "x", "u"),
    ("u2", 2L, "x", "d"),   // deleted last -> dropped
    ("u3", 1L, "p", "d"),
    ("u3", 2L, "q", "u"),   // delete then re-insert -> survives with q
    ("u4", 9L, "only", "u")
  ).toDF("k", "seq", "payload", "op")

  test("latest row per key wins regardless of arrival order") {
    val got = Cdc.latestPerKey(log, Seq("k"), Seq("seq"))
      .select("k", "seq", "payload", "op")
      .as[(String, Long, String, String)].collect().toSet
    assert(got == Set(("u1", 3L, "c", "u"), ("u2", 2L, "x", "d"),
      ("u3", 2L, "q", "u"), ("u4", 9L, "only", "u")))
  }

  test("applyChangelog drops keys whose LATEST op is a delete") {
    val got = Cdc.applyChangelog(log, Seq("k"), Seq("seq"), "op")
      .select("k", "payload").as[(String, String)].collect().toSet
    assert(got == Set(("u1", "c"), ("u3", "q"), ("u4", "only")))
  }

  test("version ties resolve deterministically through the payload fields") {
    val tied = Seq(("k", 1L, "aaa"), ("k", 1L, "zzz")).toDF("k", "seq", "p")
    val got = Cdc.latestPerKey(tied, Seq("k"), Seq("seq"))
      .select("p").as[String].collect().toSeq
    assert(got == Seq("zzz")) // lexicographic struct max
  }

  test("identical result under any partitioning (partial-combine safe)") {
    val big = (0 until 5000).map { i =>
      (s"k${i % 97}", (i * 2654435761L) % 10007, s"v$i",
        if (i % 11 == 0) "d" else "u")
    }.toDF("k", "seq", "payload", "op")
    val a = Cdc.applyChangelog(big.repartition(1), Seq("k"), Seq("seq", "payload"), "op")
      .orderBy("k").collect().toSeq
    val b = Cdc.applyChangelog(big.repartition(17), Seq("k"), Seq("seq", "payload"), "op")
      .orderBy("k").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
