package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 20000L).toDF("id")

  test("deterministic: same input -> identical sample, any partitioning") {
    val a = Sampling.sample(ids, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids.repartition(13), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // approximate proportion
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02, s"${a.size}")
  }

  test("splits are exhaustive, disjoint, and near the requested weights") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = ids.withColumn("s", Sampling.splitColumn(col("id"), splits))
    val counts = assigned.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, counts.toString)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02)
    // sample-of-sample nesting: a 0.1 sample is a subset of the 0.3 sample
    val s01 = Sampling.sample(ids, "id", 0.1).collect().map(_.getLong(0)).toSet
    val s03 = Sampling.sample(ids, "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(s01.subsetOf(s03), "fractions must nest for reproducible curricula")
  }

  test("sampling and splitting are independent hash streams") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // inside a 0.3 sample, the split mix must still be ~80/10/10 — with a
    // shared hash every sampled row would have u < 0.3 < 0.8 => all "train"
    val sampled = Sampling.sample(ids, "id", 0.3)
      .withColumn("s", Sampling.splitColumn(col("id"), splits))
    val counts = sampled.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0,
      s"degenerate split inside sample: $counts")
    assert(math.abs(counts("train") / total - 0.8) < 0.03, counts.toString)
  }

  test("ids beyond 2^31 do not alias their low-31-bit twins") {
    val big = (0L until 4000L).flatMap(i => Seq(i, i + (1L << 31))).toDF("id")
    val sampled = Sampling.sample(big, "id", 0.5).collect().map(_.getLong(0)).toSet
    val pairsAgreeing = (0L until 4000L).count(i =>
      sampled.contains(i) == sampled.contains(i + (1L << 31)))
    assert(pairsAgreeing < 2600, // ~50% expected under independence, 100% under aliasing
      s"$pairsAgreeing/4000 low/high pairs agree — hash ignores high bits")
  }

  test("stratified fractions apply per stratum") {
    val df = (0L until 10000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val out = Sampling.sampleStratified(df, "id", "grp", Map("a" -> 1.0, "b" -> 0.0))
    assert(out.filter(col("grp") === "b").count() == 0)
    assert(out.filter(col("grp") === "a").count() == 5000)
  }

  test("per-group quota matches the window formulation and caps group size") {
    val df = (0L until 3000L).map(i => (i, s"src${i % 7}")).toDF("id", "grp")
    val got = Sampling.quotaPerGroup(df, "grp", "id", 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // brute force: rank by (unitHash(id), id) within each group
    val u = df.select(col("id"), Sampling.unitHash(col("id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = (0L until 3000L).groupBy(i => s"src${i % 7}").toSeq.flatMap {
      case (g, ids) =>
        ids.sortBy(i => (u(i), i)).take(25).zipWithIndex
          .map { case (id, rk) => (g, id, rk + 1L) }
    }.toSet
    assert(got.toSet == expected)
    assert(got.groupBy(_._1).values.forall(_.size == 25))
    // a group smaller than the quota keeps all members, ranked
    val small = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val caps = Sampling.quotaPerGroup(small, "grp", "id", 10)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(caps == Map("a" -> 2L, "b" -> 1L))
  }

  test("weighted sample matches its brute-force form and biases toward weight") {
    import spark.implicits._
    val df = (0L until 600L).map(i => (s"s${i % 2}", i, (i % 10) + 1.0))
      .toDF("grp", "id", "w")
    val out = Sampling.weightedPerGroup(df, "grp", "id", "w", 40)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // brute force: same key, full sort per group
    def u(id: Long): Double = {
      val m = 2147483648L
      val lo = id & (m - 1); val hi = (id >> 31) & (m - 1)
      val mixed = (lo ^ ((hi * 1103515245L + 12345L) % m))
      ((mixed * 1103515245L + 12345L) % m).toDouble / m
    }
    val expected = (0L until 600L).groupBy(i => s"s${i % 2}").toSeq.flatMap {
      case (g, ids) =>
        ids.map { i =>
          val w = (i % 10) + 1.0
          val key = BigDecimal(math.log(u(i) + 1.0 / 2147483648L) / w)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
          (i, key)
        }.sortBy { case (i, key) => (-key, i) }.take(40).zipWithIndex
          .map { case ((i, _), rk) => (g, i, rk + 1L) }
    }.toSet
    assert(out.toSet == expected)
    // weight bias: the sampled mean weight must exceed the population mean
    val meanW = out.map(_._2 % 10 + 1.0).sum / out.length
    assert(meanW > 5.5, s"weighted sample should skew heavy, mean=$meanW")
    // determinism across partitionings
    val again = Sampling.weightedPerGroup(df.repartition(13), "grp", "id", "w", 40)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(again.toSet == out.toSet)
  }

  test("mixture draws floor(weight*total) per source, unlisted sources excluded") {
    val df = (0L until 900L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val out = Sampling.mixtureSample(df, "grp", "id",
      Map("s0" -> 0.5, "s1" -> 0.25), 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map("s0" -> 50, "s1" -> 25)) // s2 absent from weights
    // the draw is the quota draw: smallest (unitHash, id) first, ranked
    val u = df.select(col("id"), Sampling.unitHash(col("id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = (0L until 900L).groupBy(i => s"s${i % 3}")
      .filterKeys(Set("s0", "s1")).toSeq.flatMap { case (g, ids) =>
        val quota = if (g == "s0") 50 else 25
        ids.sortBy(i => (u(i), i)).take(quota).zipWithIndex
          .map { case (id, rk) => (g, id, rk + 1L) }
      }.toSet
    assert(out.toSet == expected)
    // quota above group size keeps the whole source; weight 0 drops it
    val degenerate = Sampling.mixtureSample(df, "grp", "id",
      Map("s0" -> 10.0, "s1" -> 0.0), 1000L)
    val dSizes = degenerate.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dSizes == Map("s0" -> 300L))
    // binary-float quota edge: 0.29 * 100 = 28.999999999999996 in doubles;
    // the quota must still be the mathematical floor, 29
    val edge = Sampling.mixtureSample(df, "grp", "id", Map("s0" -> 0.29), 100L)
    assert(edge.count() == 29)
  }

  test("shardAssign: deterministic layout, dense positions, decorrelated order") {
    val df = (0L until 400L).map(Tuple1.apply).toDF("id")
    val a = Sampling.shardAssign(df, "id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // partitioning-independent: same layout from a different physical split
    val b = Sampling.shardAssign(df.repartition(13), "id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
    // every row lands in [0, 8) and each shard's positions are dense from 1
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    for ((_, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
    // hash-uniform: no shard is pathologically empty or dominant on 400 rows
    val sizes = a.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.min > 20 && sizes.values.max < 90, sizes.toMap.toString)
    // the within-shard order is NOT id order (independent salt stream)
    val shard0 = a.filter(_._2 == sizes.maxBy(_._2)._1).sortBy(_._3).map(_._1)
    assert(shard0 != shard0.sorted)
  }

  test("temperature quotas: alpha=1 is proportional, alpha=0 is uniform") {
    val df = (Seq.fill(80)("big") ++ Seq.fill(15)("mid") ++ Seq.fill(5)("small"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("src", "id")
    val prop = Sampling.temperatureQuotas(df, "src", 1.0, 1000L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(prop == Map("big" -> 800L, "mid" -> 150L, "small" -> 50L))
    // uniform share rounds to 0.333333, so each quota floors to 332 of 999
    val unif = Sampling.temperatureQuotas(df, "src", 0.0, 999L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(unif == Map("big" -> 332L, "mid" -> 332L, "small" -> 332L))
  }

  test("temperature alpha=0.5 lifts tail sources, preserves order, quotas fit budget") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(9)("mid") ++ Seq.fill(1)("small"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("src", "id")
    val rows = Sampling.temperatureQuotas(df, "src", 0.5, 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    val byName = rows.map(t => t._1 -> t).toMap
    // sqrt flattening: small's share rises from 1% toward sqrt(0.01)-scaled
    assert(byName("small")._3 > 0.05 && byName("small")._3 < 0.10)
    assert(byName("big")._3 > byName("mid")._3 &&
      byName("mid")._3 > byName("small")._3)
    assert(rows.map(_._4).sum <= 1000L)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
  }

  test("temperature quotas are invariant to partitioning") {
    val df = (0 until 500).map(i => (s"s${i % 7}", i.toLong)).toDF("src", "id")
    val a = Sampling.temperatureQuotas(df.repartition(1), "src", 0.5, 10000L)
      .orderBy("src").collect().toSeq
    val b = Sampling.temperatureQuotas(df.repartition(13), "src", 0.5, 10000L)
      .orderBy("src").collect().toSeq
    assert(a == b)
  }

  test("leakageSafeSplit: every cluster member lands in the same split") {
    val docs = (1L to 300L).toDF("doc_id")
    // clusters of 3: {1,2,3} -> 1, {4,5,6} -> 4, ...
    val clusters = (1L to 300L).map(i => (i, ((i - 1) / 3) * 3 + 1))
      .toDF("doc_id", "rep_id")
    val rows = Sampling.leakageSafeSplit(docs, clusters)
      .as[(Long, Long, String)].collect()
    assert(rows.length == 300)
    val byCluster = rows.groupBy(_._2).values
    assert(byCluster.forall(_.map(_._3).distinct.length == 1))
    // all three splits occur across 100 clusters at 80/10/10
    val splits = rows.map(_._3).distinct.toSet
    assert(splits == Set("train", "valid", "test"))
  }

  test("leakageSafeSplit: unlabeled docs are singleton clusters, fractions track") {
    val docs = (1L to 5000L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("doc_id", "rep_id")
    val rows = Sampling.leakageSafeSplit(docs, none)
      .as[(Long, Long, String)].collect()
    assert(rows.forall(r => r._1 == r._2))
    val n = rows.length.toDouble
    val train = rows.count(_._3 == "train") / n
    val valid = rows.count(_._3 == "valid") / n
    assert(math.abs(train - 0.8) < 0.03, s"train frac $train")
    assert(math.abs(valid - 0.1) < 0.02, s"valid frac $valid")
  }

  test("leakageSafeSplit: deterministic and partitioning-invariant") {
    val docs = (1L to 400L).toDF("doc_id")
    val clusters = (1L to 400L).filter(_ % 2 == 0).map(i => (i, i / 2))
      .toDF("doc_id", "rep_id")
    val a = Sampling.leakageSafeSplit(docs.repartition(1), clusters)
      .orderBy("doc_id").collect().toSeq
    val b = Sampling.leakageSafeSplit(docs.repartition(17), clusters.repartition(3))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("negativeSamples: k picks per anchor, never the anchor itself") {
    val ids = (1L to 500L).toDF("a_id")
    val cand = (1L to 500L).toDF("c_id")
    val rows = Sampling.negativeSamples(ids, cand, k = 3, buckets = 8)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 500 * 3) // 8 buckets over 500 candidates: none empty
    assert(rows.forall(r => r._1 != r._3))
    assert(rows.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L)))
  }

  test("negativeSamples: picks are spread, not concentrated on few candidates") {
    val ids = (1L to 400L).toDF("a_id")
    val cand = (1L to 400L).toDF("c_id")
    val negs = Sampling.negativeSamples(ids, cand, k = 4, buckets = 16)
      .select("neg_id").as[Long].collect()
    // 1600 draws over 400 candidates: distinct picks should cover a wide
    // share of the candidate set (argmin-per-bucket reuses winners within a
    // bucket epoch, but hj varies per anchor/draw so winners rotate)
    assert(negs.distinct.length > 150, s"only ${negs.distinct.length} distinct")
  }

  test("negativeSamples: deterministic and partitioning-invariant") {
    val ids = (1L to 200L).toDF("a_id")
    val cand = (1L to 300L).toDF("c_id")
    val a = Sampling.negativeSamples(ids.repartition(1), cand.repartition(1), 2, 8)
      .orderBy("a_id", "draw").collect().toSeq
    val b = Sampling.negativeSamples(ids.repartition(9), cand.repartition(5), 2, 8)
      .orderBy("a_id", "draw").collect().toSeq
    assert(a == b)
  }

  test("negativeSamples: ids above 2^31 do not alias") {
    val big = Seq(5L, 5L + (1L << 31), 5L + (2L << 31)).toDF("c_id")
    val anchors = Seq(1L).toDF("a_id")
    // all three candidates are distinct to the hash: with 1 bucket and 3
    // draws, picks must be drawn from the true id set
    val rows = Sampling.negativeSamples(anchors, big, k = 3, buckets = 1)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 3)
    assert(rows.map(_._3).toSet.subsetOf(Set(5L, 5L + (1L << 31), 5L + (2L << 31))))
  }

  test("bootstrap CI: brackets the sample mean, deterministic, one output row") {
    val df = (1L to 4000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val rows = Sampling.bootstrapMeanCI(df, "id", "v").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (n, mean, lo, hi) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(n == 4000L && r.getLong(4) == 24L)
    assert(mean == 49.5)
    assert(lo <= mean && mean <= hi, s"[$lo, $hi] should bracket $mean")
    assert(lo < hi)
    // replica spread should be in the right ballpark: sd(v)/sqrt(n) ~ 0.46,
    // so a 90% CI spans well under ±3 of the mean
    assert(hi - lo < 6.0, s"CI [$lo, $hi] implausibly wide")
  }

  test("bootstrap CI: partitioning-invariant (hash draws, decimal sums)") {
    val df = (1L to 2000L).map(i => (i, math.sin(i.toDouble))).toDF("id", "v")
    val a = Sampling.bootstrapMeanCI(df.repartition(1), "id", "v").collect().head
    val b = Sampling.bootstrapMeanCI(df.repartition(13), "id", "v").collect().head
    assert(a == b)
  }

  test("bootstrap CI: hyperparameters validated") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException](
      Sampling.bootstrapMeanCI(df, "id", "v", replicas = 2))
    intercept[IllegalArgumentException](
      Sampling.bootstrapMeanCI(df, "id", "v", alpha = 0.0))
  }

  test("leakageSafeSplit: bad fractions are rejected") {
    val docs = Seq(1L).toDF("doc_id")
    val c = Seq((1L, 1L)).toDF("doc_id", "rep_id")
    intercept[IllegalArgumentException](
      Sampling.leakageSafeSplit(docs, c, trainFrac = 0.95, validFrac = 0.1))
    intercept[IllegalArgumentException](
      Sampling.leakageSafeSplit(docs, c, trainFrac = 0.0))
  }

  test("tokenBudgetMixture: hand-computed targets and epochs") {
    // src A: 2 docs x 4 tokens = 8; src B: 1 doc x 2 tokens; C unlisted
    val docs = Seq(("A", "w w w w"), ("A", "x x x x"), ("B", "y y"),
      ("C", "z z z")).toDF("source", "text")
    val got = Sampling.tokenBudgetMixture(docs, "source", "text",
      Seq("A" -> 0.75, "B" -> 0.25), budgetTokens = 100L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set("A", "B")) // unlisted sources excluded
    assert(got("A") == ((2L, 8L, 75L, 9.375))) // 75 target / 8 tokens
    assert(got("B") == ((1L, 2L, 25L, 12.5)))
    // epochs > 1 everywhere: the budget forces repetition on this corpus
  }

  test("neyman: constant strata get zero; noisier+bigger strata get more") {
    // A: sd 0; B: n=2 sd sqrt(50); C: n=3 sd 20 -> w_C / w_B = 60 / 14.14
    val df = (Seq(("A", 5.0), ("A", 5.0), ("A", 5.0), ("B", 0.0), ("B", 10.0),
      ("C", 0.0), ("C", 20.0), ("C", 40.0))).toDF("s", "v")
    val got = Sampling.neymanAllocation(df, "s", "v", 1000).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getLong(4)))).toMap
    assert(got("A") == ((0.0, 0L)))
    assert(got("B")._1 == 7.071068 && got("C")._1 == 20.0)
    assert(got("C")._2 > got("B")._2 && got("B")._2 > 0)
    // round(budget·share) drifts at most 1 per stratum from the budget
    assert(math.abs(got.values.map(_._2).sum - 1000L) <= got.size)
  }

  test("neyman: equal strata split the budget evenly; invariance") {
    val df = (1 to 300).map(i =>
      (s"s${i % 3}", (i % 10).toDouble)).toDF("s", "v")
    def run(p: Int) = Sampling.neymanAllocation(df.repartition(p), "s", "v", 999)
      .orderBy("stratum").collect().toSeq
    assert(run(1) == run(7))
    val allocs = run(1).map(_.getLong(4))
    assert(allocs.toSet == Set(333L))
  }
}
