package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions.col

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

  test("hll estimate lands within 3 sigma of exact, duplicates ignored") {
    // ~3k distinct 3-grams in one group; HLL with m=64 has standard error
    // 1.04/sqrt(64) ~ 13%, so 3 sigma ~ 39%
    val many = (0 until 400)
      .map(i => (i.toLong, "src0", (0 until 10).map(j => s"w${i * 7 + j}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val Array((est, exact)) = Sketches.hllDistinct(many)
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(exact > 2000, s"fixture too small: $exact")
    assert(math.abs(est - exact) / exact < 0.39, s"est=$est exact=$exact")
    // duplicated corpus (fresh doc_ids, same text): identical registers,
    // identical estimate, identical exact count
    val dup = many.union(many.withColumn("doc_id", col("doc_id") + 1000000L))
    val Array((est2, exact2)) = Sketches.hllDistinct(dup)
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(est2 == est && exact2 == exact)
  }

  test("hll estimate is partitioning-independent (exact register sums)") {
    val many = (0 until 300)
      .map(i => (i.toLong, s"src${i % 3}", (0 until 8).map(j => s"t${i * 5 + j}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val a = Sketches.hllDistinct(many.repartition(1)).orderBy("source").collect()
    val b = Sketches.hllDistinct(many.repartition(13)).orderBy("source").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 3)
  }

  test("minhash overlap: identical sets read 1, disjoint read 0, estimate tracks exact") {
    val mk = (src: String, off: Int, n: Int) =>
      (0 until n).map(i => (src, (0 until 8).map(j => s"t${off + i * 3 + j}").mkString(" ")))
    val df = (mk("a", 0, 40) ++ mk("b", 0, 40) ++ mk("c", 100000, 40) ++
      mk("d", 60, 40)).toDF("source", "text")
    val rows = Sketches.minhashOverlap(df.toDF("source", "text")).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    // a == b exactly; c is disjoint from both
    assert(rows(("a", "b")) == ((1.0, 1.0)))
    assert(rows(("a", "c")) == ((0.0, 0.0)) && rows(("b", "c")) == ((0.0, 0.0)))
    // d half-overlaps a/b: estimate within 3 sigma (sigma ~ sqrt(J(1-J)/64))
    val (estAd, exAd) = rows(("a", "d"))
    assert(exAd > 0.1 && exAd < 0.9, s"fixture overlap degenerate: $exAd")
    assert(math.abs(estAd - exAd) < 3 * math.sqrt(exAd * (1 - exAd) / 64) + 1e-9,
      s"est=$estAd exact=$exAd")
    // duplication-blind: signatures min over DISTINCT grams
    val dup = df.union(df)
    val again = Sketches.minhashOverlap(dup).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    assert(again == rows)
  }

  test("hist quantiles: estimate within one bin of exact, duplication-stable") {
    val rnd = new scala.util.Random(7)
    val vals = (0 until 2000).map(i => (s"g${i % 2}", rnd.nextDouble() * 100))
      .toDF("grp", "v")
    val q = Sketches.histQuantiles(vals, "grp", "v", binWidth = 2.0,
      percents = Seq(25, 50, 75, 90, 99)).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(q.size == 10)
    q.foreach { case ((g, p), (est, exact)) =>
      assert(math.abs(est - exact) <= 2.0, s"$g p$p est=$est exact=$exact")
    }
    // duplicated corpus: every bucket count and n double, so each integer
    // rank target lands in the same bucket at the same relative offset —
    // near-identical estimates (only the ceil residue can move inside one
    // count unit) and identical exact values
    val dup = vals.union(vals)
    val q2 = Sketches.histQuantiles(dup, "grp", "v", binWidth = 2.0,
      percents = Seq(25, 50, 75, 90, 99)).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    q.foreach { case (k, (est, exact)) =>
      assert(q2(k)._2 == exact, s"$k exact moved under duplication")
      assert(math.abs(q2(k)._1 - est) < 0.1, s"$k est moved under duplication")
    }
  }

  test("bloom: zero false negatives, and misses at low load factor") {
    val members = (0 until 50).map(i => s"key-$i").toDF("key")
    val grid = Sketches.bloomBuild(members, "key", mBits = 4096, k = 4)
    val cands = ((0 until 50).map(i => s"key-$i") ++
      (0 until 200).map(i => s"other-$i")).toDF("key")
    val hits = Sketches.bloomContains(grid, cands, "key", mBits = 4096, k = 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // the defining guarantee: every member hits
    (0 until 50).foreach(i => assert(hits(s"key-$i"), s"false negative key-$i"))
    // at n=50, m=4096, k=4 the FP probability is ~1e-7 per key; this
    // fixture is deterministic, so any collision would have been pinned here
    val fps = (0 until 200).count(i => hits(s"other-$i"))
    assert(fps == 0, s"$fps unexpected false positives")
  }

  test("bloom probe: duplicate candidate rows each keep their own output row") {
    val members = (0 until 20).map(i => s"key-$i").toDF("key")
    val grid = Sketches.bloomBuild(members, "key")
    // 3 copies of a member, 2 of a non-member: one result row PER INPUT ROW
    val cands = (Seq.fill(3)("key-7") ++ Seq.fill(2)("nope")).toDF("key")
    val out = Sketches.bloomContains(grid, cands, "key")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(out.length == 5, s"duplicates must not collapse: ${out.toSeq}")
    assert(out.count(_ == ("key-7", true)) == 3)
    assert(out.count(_ == ("nope", false)) == 2)
    // reserved internal names are required absent, loudly
    intercept[IllegalArgumentException] {
      Sketches.bloomContains(grid, cands.withColumnRenamed("key", "__bloom_pos"),
        "__bloom_pos")
    }
  }

  test("bloom grids merge by bit_or (build per batch, OR the words)") {
    val a = (0 until 30).map(i => s"a-$i").toDF("key")
    val b = (0 until 30).map(i => s"b-$i").toDF("key")
    val whole = Sketches.bloomBuild(a.union(b), "key")
      .orderBy("word").collect().toSeq
    val merged = Sketches.bloomBuild(a, "key").union(Sketches.bloomBuild(b, "key"))
      .groupBy("word").agg(org.apache.spark.sql.functions.expr("bit_or(bits)").as("bits"))
      .orderBy("word").collect().toSeq
    assert(whole == merged)
  }

  test("cms top-k ordering: est desc, token asc, dense ranks") {
    val rows = Sketches.cmsTopK(docs, depth = 4, width = 4096, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._3).toSeq == (1L to rows.length))
    val resorted = rows.sortBy { case (t, est, _) => (-est, t) }
    assert(rows.toSeq == resorted.toSeq)
    assert(rows.head._1 == "apple") // unambiguous top hitter
  }

  private def kmvDocs(rows: (String, String)*) =
    rows.map { case (src, text) => (1L, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("kmv: identical sources read jaccard 1 and inter == union == per-source est") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ") // 58 distinct 3-grams >= k=32
    val r = Sketches.kmvSetOps(kmvDocs("a" -> text, "b" -> text)).collect().head
    assert(r.getAs[Double]("est_jaccard") == 1.0)
    assert(r.getAs[Double]("est_inter") == r.getAs[Double]("est_union"))
    assert(r.getAs[Double]("est_a") == r.getAs[Double]("est_union"))
    assert(r.getAs[Long]("exact_inter") == r.getAs[Long]("exact_union"))
  }

  test("kmv: disjoint sources read jaccard 0 and inter 0") {
    val ta = (1 to 50).map(i => s"a$i").mkString(" ")
    val tb = (1 to 50).map(i => s"b$i").mkString(" ")
    val r = Sketches.kmvSetOps(kmvDocs("a" -> ta, "b" -> tb)).collect().head
    assert(r.getAs[Double]("est_jaccard") == 0.0)
    assert(r.getAs[Double]("est_inter") == 0.0)
    assert(r.getAs[Long]("exact_inter") == 0L)
  }

  test("kmv: below-k sets are exact on every estimate") {
    // 10 and 12 distinct grams, overlapping: sketches hold the full sets
    val ta = (1 to 12).map(i => s"w$i").mkString(" ")
    val tb = (5 to 18).map(i => s"w$i").mkString(" ")
    val r = Sketches.kmvSetOps(kmvDocs("a" -> ta, "b" -> tb)).collect().head
    assert(r.getAs[Double]("est_a") == 10.0)
    assert(r.getAs[Double]("est_b") == 12.0)
    assert(r.getAs[Double]("est_union") == r.getAs[Long]("exact_union").toDouble)
    assert(r.getAs[Double]("est_inter") == r.getAs[Long]("exact_inter").toDouble)
  }

  test("kmv: estimates track exact within 3 relative-sigma at k=32") {
    // two overlapping 600-gram universes; KMV relative error ~ 1/sqrt(k-1)
    val ta = (1 to 600).map(i => s"t$i").mkString(" ")
    val tb = (300 to 900).map(i => s"t$i").mkString(" ")
    val r = Sketches.kmvSetOps(kmvDocs("a" -> ta, "b" -> tb)).collect().head
    val sigma = 3.0 / math.sqrt(31.0)
    val exU = r.getAs[Long]("exact_union").toDouble
    assert(math.abs(r.getAs[Double]("est_union") - exU) / exU <= sigma,
      s"union ${r.getAs[Double]("est_union")} vs $exU")
    val exA = 598.0 // 600 words -> 598 3-grams
    assert(math.abs(r.getAs[Double]("est_a") - exA) / exA <= sigma)
  }

  test("kmv: duplication-blind — repeating every doc changes nothing") {
    val ta = (1 to 200).map(i => s"x$i").mkString(" ")
    val tb = (100 to 260).map(i => s"x$i").mkString(" ")
    val once = Sketches.kmvSetOps(kmvDocs("a" -> ta, "b" -> tb)).collect().head
    val thrice = Sketches.kmvSetOps(kmvDocs(
      "a" -> ta, "a" -> ta, "a" -> ta, "b" -> tb, "b" -> tb)).collect().head
    assert(once.toSeq == thrice.toSeq)
  }

  test("kmv: partitioning-invariant") {
    val docs = kmvDocs((1 to 40).map(i =>
      (if (i % 2 == 0) "a" else "b") -> (i to i + 80).map(j => s"g$j").mkString(" ")): _*)
    val one = Sketches.kmvSetOps(docs.repartition(1)).collect().head
    val many = Sketches.kmvSetOps(docs.repartition(11)).collect().head
    assert(one.toSeq == many.toSeq)
  }

  test("joinSize: exact side is the true key-join cardinality; CMS never undercounts") {
    // a: key k repeated k times (k=1..10); b: keys 5..14 twice each
    // true join size = sum over k=5..10 of k*2 = 90
    val a = (1 to 10).flatMap(k => Seq.fill(k)(k.toLong)).toDF("uid")
    val b = (5 to 14).flatMap(k => Seq.fill(2)(k.toLong)).toDF("uid")
    val Array(r) = Sketches.joinSizeEstimate(a, b, "uid").collect()
    assert(r.getLong(1) == 90L)
    assert(r.getLong(0) >= 90L, "CMS inner product can only overestimate")
    assert(r.getDouble(2) >= 0.0)
  }

  test("joinSize: disjoint key spaces estimate near zero; invariance") {
    val a = (1 to 50).map(i => i.toLong).toDF("uid")
    val b = (1000 to 1050).map(i => i.toLong).toDF("uid")
    val Array(r) = Sketches.joinSizeEstimate(a, b, "uid").collect()
    assert(r.getLong(1) == 0L && r.isNullAt(2)) // no meaningful rel_err
    // est itself must be tiny (collision noise bounded by n_a*n_b/width
    // per row, min over 4 rows)
    assert(r.getLong(0) <= 50L * 51 / 1024 + 3)
    val big = (1 to 400).map(i => (i % 37).toLong).toDF("uid")
    def run(p: Int) = Sketches.joinSizeEstimate(big.repartition(p), big, "uid")
      .collect().head.toSeq
    assert(run(1) == run(7))
  }

  test("joinSize: a depth-row with no shared cells drives the min to 0") {
    // crafted disjoint key sets where rows 0/2/3 each have exactly one
    // bucket collision but row 1 has none (verified against the portable
    // hash family offline): the true inner product of row 1 is 0, so the
    // estimate must be 0 — a min that skips non-overlapping rows would
    // report >= 1 here
    val a = (1 to 30).map(i => 7919L * i + 3).toDF("uid")
    val b = (1 to 30).map(i => 104729L * i).toDF("uid")
    val ga = Sketches.cmsKeyGrid(a, "uid")
    val gb = Sketches.cmsKeyGrid(b, "uid")
    val overlappedRows = ga.join(gb, Seq("row", "bucket"))
      .select("row").distinct().count()
    assert(overlappedRows == 3, "fixture: exactly one row must have no overlap")
    val Array(r) = Sketches.joinSizeEstimate(a, b, "uid").collect()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 0L && r.isNullAt(2))
  }
}
