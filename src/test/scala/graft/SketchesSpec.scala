package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    0L -> "apple apple apple banana cherry",
    1L -> "apple banana banana date egg",
    2L -> "fig grape apple banana cherry date").toDF("doc_id", "text")

  test("cms estimates never undercount, and are exact without collisions") {
    // width >> distinct tokens => collisions are possible only by hash
    // accident; assert the CMS invariant est >= exact for every token and
    // exactness for the top hitter
    val rows = Sketches.cmsTopK(docs, depth = 4, width = 4096, k = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, est, exact) =>
      assert(est >= exact, s"CMS undercounted $t: est=$est exact=$exact")
    }
    val exact = Map("apple" -> 5L, "banana" -> 4L)
    rows.filter(r => exact.contains(r._1)).foreach { case (t, _, ex) =>
      assert(ex == exact(t), s"exact count wrong for $t: $ex")
    }
  }

  test("cms grid never exceeds depth*width cells and counts every token") {
    val grid = Sketches.cmsBuild(docs, depth = 3, width = 8).collect()
    assert(grid.length <= 3 * 8)
    // each of the 3 rows partitions the full token stream
    val totalToks = 16L
    val perRow = grid.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.toMap == Map(0L -> totalToks, 1L -> totalToks, 2L -> totalToks))
  }

  test("cms top-k ordering: est desc, token asc, dense ranks") {
    val rows = Sketches.cmsTopK(docs, depth = 4, width = 4096, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._3).toSeq == (1L to rows.length))
    val resorted = rows.sortBy { case (t, est, _) => (-est, t) }
    assert(rows.toSeq == resorted.toSeq)
    assert(rows.head._1 == "apple") // unambiguous top hitter
  }
}
