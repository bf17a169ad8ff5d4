package graft

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("meanVector: hand-computed per-dimension means") {
    val df = Seq((1L, Seq(1.0, 10.0)), (2L, Seq(3.0, 20.0)), (3L, Seq(5.0, 30.0)))
      .toDF("vec_id", "embedding")
    val rows = Pca.meanVector(df, "embedding").orderBy("i").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(3.0, 20.0))
  }

  test("top component of a 1-D point cloud recovers the axis exactly") {
    // points t * (0.6, 0.8, 0, 0) for t in -5..5: ALL variance along the
    // axis; eigval = sum(t^2)/(n-1) = 110/10 = 11, var share 1
    val df = (-5 to 5).map(t => (t.toLong + 10L,
      Seq(0.6 * t, 0.8 * t, 0.0, 0.0))).toDF("vec_id", "embedding")
    val rows = Pca.pcaTopComponent(df, "embedding", dim = 4, iters = 3)
      .orderBy("i").collect()
    val loading = rows.map(_.getDouble(1))
    assert(math.abs(loading(0)) - 0.6 < 1e-4 && math.abs(loading(1)) - 0.8 < 1e-4)
    // sign convention: the uniform start has positive dot with +(0.6, 0.8)
    assert(loading(0) > 0 && loading(1) > 0)
    assert(math.abs(loading(0) - 0.6) < 1e-4 && math.abs(loading(1) - 0.8) < 1e-4)
    assert(loading(2) == 0.0 && loading(3) == 0.0)
    assert(math.abs(rows.head.getDouble(2) - 11.0) < 1e-3)
    assert(rows.head.getDouble(3) >= 0.999998) // var_pct ~ 1 (round-6 noise)
  }

  test("anisotropic cloud: dominant axis wins, var share matches ratio") {
    // axis u = e0 with spread 10x the e1 spread: top component ~ e0 and
    // explains ~ 100/101 of the variance
    val df = (0 until 80).map { i =>
      val a = (i % 9) - 4.0 // -4..4 along e0, scaled 10x
      val b = ((i / 9) % 9) / 4.0 - 1.0 // small spread on e1
      (i.toLong, Seq(10.0 * a, b, 0.0, 0.0))
    }.toDF("vec_id", "embedding")
    val rows = Pca.pcaTopComponent(df, "embedding", dim = 4, iters = 3)
      .orderBy("i").collect()
    val loading = rows.map(_.getDouble(1))
    assert(math.abs(math.abs(loading(0)) - 1.0) < 1e-3)
    assert(math.abs(loading(1)) < 0.02)
    assert(rows.head.getDouble(3) > 0.99)
  }

  test("partitioning-invariant: identical component under any layout") {
    val df = (0 until 120).map(i =>
      (i.toLong, Seq((i % 13) * 0.7, (i % 7) * 1.1, (i % 5) * 0.3, i % 3 * 1.0)))
      .toDF("vec_id", "embedding")
    def run(p: Int) = Pca.pcaTopComponent(df.repartition(p), "embedding", 4, 3)
      .orderBy("i").collect().toSeq
    assert(run(1) == run(11))
  }
}
