package graft

import graft.functions.ArrayMath
import graft.functions.expressions.VectorFunctions
import org.apache.spark.sql.functions._
import scala.util.Random

/** The native DotProduct expression must be bit-identical to the built-in
  * HOF formulation in both interpreted and codegen paths. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)
  private val data: Seq[(Long, Array[Float], Array[Float])] = (0 until 200).map { i =>
    (i.toLong,
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1))
  }

  test("native vec_dot == HOF dot, bitwise, on float arrays") {
    val df = data.toDF("id", "a", "b")
      .withColumn("native", ArrayMath.dot(col("a"), col("b")))
      .withColumn("hof", ArrayMath.dotHof(col("a"), col("b")))
    val rows = df.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"row ${r.getLong(0)}")
    }
  }

  test("vec_dot matches local sequential fold and handles double arrays") {
    val df = data.toDF("id", "a", "b")
      .withColumn("d", ArrayMath.dot(col("a").cast("array<double>"), col("b").cast("array<double>")))
    val got = df.select("id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    data.foreach { case (id, a, b) =>
      val expected = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      assert(got(id) == expected, s"id=$id")
    }
  }

  test("vec_dot: null array -> null; null element -> null; length mismatch -> min-length fold") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f))
    ).toDF("id", "a", "b")
      .withColumn("d", ArrayMath.dot(col("a"), col("b")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDouble(3) == 11.0)
    assert(rows(1).isNullAt(3))
    VectorFunctions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d, 9.0d), array(3.0d, 4.0d)) d")
      .collect().head.getDouble(0) == 11.0)
    assert(spark.sql("SELECT vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 1.0d)) d")
      .collect().head.isNullAt(0))
  }

  test("native hyperplane signature == HOF lshBucket, all rows") {
    import graft.operators.Similarity
    val df = data.toDF("id", "a", "b")
      .withColumn("native", Similarity.lshBucket(col("a"), 8))
      .withColumn("hof", Similarity.lshBucketHof(col("a"), 8))
    val rows = df.select("id", "native", "hof").collect()
    assert(rows.length == 200)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}"))
    // signatures spread across buckets (not degenerate)
    assert(rows.map(_.getLong(1)).distinct.length > 10)
  }

  test("native portable_band_sig == interpreted per-band lshBandBucket, all rows") {
    import graft.functions.PortableHashes
    val df = data.toDF("id", "a", "b")
      .withColumn("native", VectorFunctions.portable_band_sig(col("a"), 4, 8))
      .withColumn("hof", array((0 until 4).map(g =>
        PortableHashes.lshBandBucket(col("a"), g, 8, 64)): _*))
    val rows = df.select("id", "native", "hof").collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"row ${r.getLong(0)}")
    }
    // band 0 equals the pre-banding single-bucket family exactly
    val b0 = df.withColumn("b0", PortableHashes.lshBucket(col("a"), 8, 64))
      .select(element_at(col("native"), 1), col("b0")).collect()
    b0.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // bands are independent hash tables, not copies of each other
    val native = rows.map(_.getSeq[Long](1))
    assert(native.exists(s => s.distinct.length > 1))
    // null element -> null signature array
    val withNull = Seq((1L, Array[java.lang.Float](1.0f, null))).toDF("id", "a")
      .withColumn("s", VectorFunctions.portable_band_sig(col("a"), 2, 4))
    assert(withNull.select("s").collect().head.isNullAt(0))
  }

  test("SQL registration via extensions-style registry works") {
    VectorFunctions.register(spark)
    val d = spark.sql("SELECT vec_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) d")
      .collect().head.getDouble(0)
    assert(d == 3.0)
  }

  test("random projection: hand-computed fold, JL norm scaling, determinism") {
    import spark.implicits._
    import graft.functions.{ArrayMath, PortableHashes}
    val dim = 16; val out = 4
    val vecs = (0 until 40).map(i =>
      (i.toLong, (0 until dim).map(d => math.cos(i * 13 + d * 5)).toArray))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = df.select($"vec_id",
        ArrayMath.randomProject($"embedding", out, dim).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // component 0 of vector 0 replicated exactly (same fold, same rounding)
    val expected = BigDecimal((0 until dim)
      .map(d => vecs(0)._2(d) * PortableHashes.planeComponent(0, d, dim))
      .foldLeft(0.0)(_ + _)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(proj(0L).head == expected)
    // energy sanity: an ideal iid uniform[-1,1) matrix gives
    // E[|proj|^2] = out/3 * |v|^2; the deterministic multiplicative-hash
    // planes are CORRELATED across adjacent indices (the price of
    // coordination-free reproducibility), so only an order-of-magnitude
    // band holds for structured inputs — projections neither vanish nor
    // blow up
    val ratios = vecs.map { case (id, v) =>
      val p2 = proj(id).map(x => x * x).sum
      val v2 = v.map(x => x * x).sum
      p2 / v2
    }
    val mean = ratios.sum / ratios.length
    val ideal = out / 3.0
    assert(mean > ideal / 4 && mean < ideal * 4,
      s"mean |proj|^2/|v|^2 = $mean, ideal-matrix value ${ideal}")
    assert(ratios.forall(r => !r.isNaN && !r.isInfinite))
  }
}
