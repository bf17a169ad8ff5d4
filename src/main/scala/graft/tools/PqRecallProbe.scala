package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: measured ADC-recall decay under corpus drift and its repair by
  * [[graft.operators.Pq.ivfPqRetrain]] — the operational evidence behind
  * wiring the compressed twin's drift escape hatch (r12 verdict ask #1).
  *
  * Fixture: 300 tight 10-member clusters per REGION. Region 0 (the
  * cold-start corpus — the only thing the frozen quantizer + codebooks
  * ever train on) spreads over near-orthogonal Gaussian directions.
  * Region 1 — folded afterwards in five batches — is a NARROW CONE: one
  * shared direction plus small per-cluster offsets, i.e. new data
  * concentrated at finer granularity than the old quantizer resolves.
  * That is the drift mode that actually kills a frozen IVF-PQ tree: the
  * whole cone lands in one or two old cells (routing survives), but the
  * per-cluster offsets sit BELOW the old codebooks' quantization
  * resolution, so reconstructions collapse onto the cone axis and ADC
  * cannot tell region-1 clusters apart. A retrain re-partitions the cone
  * across cells and re-trains codebooks on the offset scale. Queries are
  * held-out members of region-1 clusters, so each query's exact top-10
  * is exactly its own cluster's 10 stored members — recall is
  * unambiguous, not a tie-ordering artifact.
  *
  * Measured before and after the retrain, same queries:
  *   - ADC recall@10 ([[graft.operators.Pq.ivfPqTopK]], nprobe 4/16);
  *   - two-stage recall@10 ([[graft.operators.Pq.ivfPqTopKRefined]],
  *     kCoarse 50) — the production serving shape, where ADC only has to
  *     surface the right candidates, not rank them.
  * Before: region-1 residuals are coded against region-0 codebooks —
  * reconstructions are noise, candidates effectively random. After: full
  * re-encode under the MVCC version protocol restores both.
  *
  * Run: `sbt "runMain graft.tools.PqRecallProbe"`; one PQRECALL JSON
  * line for SCALING.md. */
object PqRecallProbe {

  private val dim = 64
  private val clustersPerRegion = 300
  private val membersPerCluster = 10

  private def clusterDir(region: Int, c: Int): Array[Double] = {
    val r = new scala.util.Random(region * 1000003L + c * 7919L + 13)
    if (region == 0) Array.fill(dim)(r.nextGaussian())
    else {
      // the drift cone: shared axis + a small per-cluster offset (~4% of
      // the axis norm per dimension) — cluster identity lives at a scale
      // the region-0 codebooks never trained on
      val axis = clusterDir(0, 999983) // one fixed direction, not in region 0
      axis.map(x => x + r.nextGaussian() * 0.35)
    }
  }

  private def member(id: Long, dir: Array[Double],
      noise: Double): (Long, Array[Float]) = {
    val r = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 7)
    (id, dir.map(x => (x + r.nextGaussian() * noise).toFloat))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("pq_recall").toString + "/pq"

    // region 0: ids c*100+j — the cold-start training corpus
    val base = (0 until clustersPerRegion).flatMap { c =>
      val d = clusterDir(0, c)
      (0 until membersPerCluster).map(j => member(c * 100L + j, d, 0.1))
    }.toDF("vec_id", "embedding")
    // region 1: ids 1_000_000 + c*100+j, folded in 5 batches of 2/cluster
    val driftBatches = (0 until 5).map { b =>
      (0 until clustersPerRegion).flatMap { c =>
        val d = clusterDir(1, c)
        (0 until 2).map(j =>
          member(1000000L + c * 100L + b * 2 + j, d, 0.1))
      }.toDF("vec_id", "embedding")
    }
    val corpus = driftBatches.foldLeft(base)(_ union _).cache()
    // held-out queries: fresh members of region-1 clusters 0..19
    val queries = (0 until 20).map(c =>
      member(2000000L + c, clusterDir(1, c), 0.1))
      .toDF("vec_id", "embedding").cache()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, coldWall) = timed {
      graft.operators.Pq.ivfPqCommitBatch(spark, path, base, 0L, nlist = 16,
        m = 8, ksub = 16, dim = dim, trainOn = Some(base))
    }
    var foldWall = 0.0
    for ((b, i) <- driftBatches.zipWithIndex) {
      val (_, w) = timed(
        graft.operators.Pq.ivfPqInsert(spark, path, b, i + 1L))
      foldWall += w
    }

    val k = 10
    def toSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = toSets(
      graft.operators.Similarity.bruteForceTopK(queries, corpus, k))
    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / k }
      per.sum / per.size
    }
    def measure(): (Double, Double) = (
      recallOf(toSets(graft.operators.Pq.ivfPqTopK(spark, path, queries, k,
        nprobe = 4, m = 8, dim = dim))),
      recallOf(toSets(graft.operators.Pq.ivfPqTopKRefined(spark, path,
        queries, corpus, k, kCoarse = 50, nprobe = 4, m = 8, dim = dim))))
    val (adcBefore, refinedBefore) = measure()
    val (_, retrainWall) = timed(
      graft.operators.Pq.ivfPqRetrain(spark, path, corpus))
    val (adcAfter, refinedAfter) = measure()
    println(f"""PQRECALL {"corpus":${corpus.count()},"queries":20,"k":$k,"nprobe":4,"adc_recall_before":$adcBefore%.3f,"adc_recall_after":$adcAfter%.3f,"refined_recall_before":$refinedBefore%.3f,"refined_recall_after":$refinedAfter%.3f,"cold_wall_s":$coldWall%.1f,"fold_wall_s":$foldWall%.1f,"retrain_wall_s":$retrainWall%.1f,"root":"${graft.operators.Pq.ivfPqRoot(spark, path)}"}""")
    spark.stop()
  }
}
