package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy packing matches the sequential fold, per group") {
    val docs = Seq(
      // group a: 100+300 | 400+90+10 | 200 (cap 500)
      ("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 400L),
      ("a", 4L, 90L), ("a", 5L, 10L), ("a", 6L, 200L),
      // group b: an oversized doc occupies a bin alone
      ("b", 1L, 700L), ("b", 2L, 100L),
      // group c: single doc
      ("c", 9L, 1L)
    ).toDF("g", "id", "n")
    val got = Packing.packGreedy(docs, "g", "id", "n", 500L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val expected = Map(
      ("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 1L, ("a", 5L) -> 1L, ("a", 6L) -> 2L,
      ("b", 1L) -> 0L, ("b", 2L) -> 1L,
      ("c", 9L) -> 0L)
    assert(got == expected, s"got=$got")
  }

  test("packing properties hold on a generated corpus") {
    val docs = (0L until 2000L)
      .map(i => (s"g${i % 5}", i, 1L + (i * 37) % 400)).toDF("g", "id", "n")
    val out = Packing.packGreedy(docs, "g", "id", "n", 512L)
    // every multi-doc bin fits the capacity
    val binSums = out.groupBy("g", "bin_id")
      .agg(sum("n_tokens").as("s"), count(lit(1)).as("c")).collect()
    binSums.foreach { r =>
      assert(r.getLong(2) <= 512L || r.getLong(3) == 1L,
        s"overfull multi-doc bin: $r")
    }
    // bin ids are contiguous from 0 per group
    val byGroup = out.select("g", "bin_id").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
    byGroup.foreach { case (g, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.size.toLong).toSeq,
        s"$g: ${ids.toSeq}")
    }
    // greedy is maximal: a doc never fits in its predecessor bin
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      val used = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      sorted.foreach { case (_, _, n, bin) =>
        if (bin > 0 && used(bin) == 0L)
          assert(used(bin - 1) + n > 512L, s"doc of $n tokens fit in bin ${bin - 1}")
        used(bin) += n
      }
    }
    // determinism under different partitioning
    val out2 = Packing.packGreedy(docs.repartition(13), "g", "id", "n", 512L)
    assert(out.orderBy("g", "id").collect().toSeq ==
      out2.orderBy("g", "id").collect().toSeq)
  }

  test("packStats reports bins, totals, and exact integer ppm utilization") {
    // group a: docs 3+3 tokens cap 5 -> two bins of 3 -> util 6/(2*5) = 600000 ppm
    // group b: one 7-token doc (oversize) -> one bin -> 7/5 = 1400000 ppm
    val packed = Seq(
      ("a", 1L, 3L, 0L), ("a", 2L, 3L, 1L),
      ("b", 3L, 7L, 0L)).toDF("g", "id", "n_tokens", "bin_id")
    val got = Packing.packStats(packed, "g", 5L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(("a", 2L, 2L, 6L, 600000L), ("b", 1L, 1L, 7L, 1400000L)))
  }
}
