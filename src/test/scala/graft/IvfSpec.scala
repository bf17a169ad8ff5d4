package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 4 planted clusters x 12 vectors, 16-dim: cluster direction + small noise
  private val rnd = new Random(11)
  private val dirs = Array.tabulate(4, 16)((c, d) => math.sin(c * 2.3 + d * 0.7))
  private val vecs: Seq[(Long, Array[Float])] = (0 until 48).map { i =>
    val c = i % 4
    (i.toLong, Array.tabulate(16)(d => (dirs(c)(d) + rnd.nextGaussian() * 0.05).toFloat))
  }
  private lazy val emb = vecs.toDF("vec_id", "embedding").cache()

  test("ivf with nprobe == nlist equals exact brute force") {
    val q = emb.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(q, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
    val ivf = Similarity.ivfTopK(q, emb, 5, nlist = 6, nprobe = 6, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
    assert(ivf == exact)
  }

  test("ivf with narrow probe keeps high recall on clustered data") {
    val q = emb.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, 5, nlist = 4, nprobe = 1, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // neighbors found under nprobe=1 are overwhelmingly same-cluster
    val sameCluster = ivf.count { case (a, b) => a % 4 == b % 4 }
    assert(sameCluster.toDouble / ivf.size >= 0.9)
  }

  test("at-rest cid-partitioned index: pruned probe reads match in-memory ivf") {
    val path = java.nio.file.Files.createTempDirectory("ivf-index").toString + "/idx"
    Similarity.writeIvfIndex(emb, path, nlist = 6, dim = 16)
    val q = emb.filter(col("vec_id") < 4)
    val fromIndex = Similarity.ivfTopKIndexed(spark, path, q, 5, nprobe = 2)
    val inMemory = Similarity.ivfTopK(q, emb, 5, nlist = 6, nprobe = 2, dim = 16)
    val a = fromIndex.collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
    val b = inMemory.collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted.toSeq
    assert(a == b, "indexed probe must return exactly the in-memory ivf results")
    // the probe scan must prune at the DIRECTORY level: PartitionFilters on
    // cid, not a post-scan filter over all cells
    val plan = fromIndex.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"probed cells must reach PartitionFilters:\n$plan")
  }

  test("centroid assignment is total and deterministic") {
    val centroids = Similarity.ivfCentroids(emb, 4, 16)
    val a1 = Similarity.assignToCentroids(emb, centroids).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = Similarity.assignToCentroids(emb, centroids).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2 && a1.size == 48)
  }
}
