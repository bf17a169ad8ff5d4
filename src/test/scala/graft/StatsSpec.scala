package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exact line: slope/intercept recovered, corr = 1") {
    val df = (0L until 50L).map(x => ("g", x, 3 * x + 7)).toDF("grp", "x", "y")
    val Array(r) = Stats.trendPerGroup(df, "grp", "x", "y").collect()
    assert(r.getLong(1) == 50)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0 && r.getDouble(4) == 1.0)
  }

  test("anti-correlated line: slope negative, corr = -1") {
    val df = (0L until 30L).map(x => ("g", x, 100 - 2 * x)).toDF("grp", "x", "y")
    val Array(r) = Stats.trendPerGroup(df, "grp", "x", "y").collect()
    assert(r.getDouble(2) == -2.0 && r.getDouble(4) == -1.0)
  }

  test("hand-computed noisy slope; degenerate groups dropped") {
    // y = (0, 2, 1, 3): n=4, sx=6, sy=6, sxy=13, sxx=14 -> slope = (52-36)/(56-36) = 0.8
    val noisy = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 1L), ("a", 3L, 3L),
      ("onepoint", 5L, 5L), // n < 2: dropped
      ("novar", 4L, 1L), ("novar", 4L, 9L)) // zero x-variance: dropped
      .toDF("grp", "x", "y")
    val rows = Stats.trendPerGroup(noisy, "grp", "x", "y").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("a"))
    assert(rows("a") == ((0.8, 0.3)))
  }

  test("constant y: corr reported 0, slope 0") {
    val df = (0L until 10L).map(x => ("g", x, 42L)).toDF("grp", "x", "y")
    val Array(r) = Stats.trendPerGroup(df, "grp", "x", "y").collect()
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("bit-identical across partitionings (integer sufficient statistics)") {
    val df = (0 until 3000).map { i =>
      (s"g${i % 5}", i.toLong % 371, (i.toLong * 2654435761L) % 997)
    }.toDF("grp", "x", "y")
    val a = Stats.trendPerGroup(df.repartition(1), "grp", "x", "y")
      .orderBy("grp").collect().toSeq
    val b = Stats.trendPerGroup(df.repartition(23), "grp", "x", "y")
      .orderBy("grp").collect().toSeq
    assert(a == b && a.size == 5)
  }
}
