package graft.tools

import graft.operators.Multimodal
import graft.streaming.MediaIngest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media-daemon soak (r12 verdict ask #8): the last daemon without
  * operational evidence. Drives [[MediaIngest.commitMediaBatch]] — decode
  * where the payload lands, aHash, pigeonhole Hamming gate, fold,
  * compaction, Bloom-sidecar rebuild — for 100 micro-batches of real BMP
  * payloads and records what the other soaks record: per-batch wall
  * (flat), per-bucket LSM fragment counts (bounded by compaction),
  * sidecar fill, and served==rebuild equivalence at checkpoints (the
  * served hash table against a cold [[Multimodal.imageHashes]] pass over
  * the admitted corpus).
  *
  * Batch mix per 40 docs: ~10% exact re-deliveries of the previous
  * batch's docs, ~10% near-dups (an earlier doc's BMP with one pixel
  * nudged — Hamming ≤ maxDist of the stored hash) under new ids, rest
  * novel.
  *
  * Run: `tools/run_probe.sh graft.tools.MediaSoak [nBatches] [perBatch]`
  * (defaults 100 x 40); MEDIASOAK JSON lines for SCALING.md. */
object MediaSoak {

  /** A near-dup payload: re-encode the same seed at the same size, then
    * flip one low bit in the pixel area so the aHash moves by ≤1 bit. */
  private def nearDup(seed: Long, saltId: Long): Array[Byte] = {
    val b = Multimodal.encodeBmp(24, 16, seed)
    val out = b.clone()
    out(out.length - 1 - (saltId % 7).toInt) =
      (out(out.length - 1 - (saltId % 7).toInt) ^ 0x01).toByte
    out
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(100)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(40)
    val compactEvery = 10
    val checkpointEvery = 25
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_mediasoak").toString
    val (corpus, index) = (s"$root/corpus", s"$root/index")

    def mkBatch(b: Int): DataFrame = {
      val r = new scala.util.Random(b * 6700417L + 23)
      val rows = (0 until perBatch).map { j =>
        val roll = r.nextInt(100)
        val id = b * 1000L + j
        if (b > 0 && roll < 10) {
          val pid = (b - 1) * 1000L + r.nextInt(perBatch)
          (pid, Multimodal.encodeBmp(24, 16, pid))
        } else if (b > 0 && roll < 20) {
          val src = r.nextInt(b) * 1000L + r.nextInt(perBatch)
          (id, nearDup(src, id))
        } else (id, Multimodal.encodeBmp(24, 16, id))
      }
      rows.toDF("doc_id", "payload")
    }

    def maxFrag: Int = {
      val fs = graft.util.Lsm.fs(spark, index)
      val p = new Path(s"$index/chunks")
      if (!fs.exists(p)) 0
      else fs.listStatus(p).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("tb="))
        .map(d => fs.listStatus(d.getPath).count(f => f.isFile &&
          !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")))
        .foldLeft(0)(math.max)
    }

    val walls = scala.collection.mutable.ArrayBuffer[Double]()
    var totalAdmitted = 0L
    for (b <- 0 until nBatches) {
      val batch = mkBatch(b)
      val t0 = System.nanoTime()
      val r = MediaIngest.commitMediaBatch(spark, batch, b.toLong, corpus,
        index, maxDist = 6, nBuckets = 8, compactEvery = compactEvery)
      val wall = (System.nanoTime() - t0) / 1e9
      walls += wall
      totalAdmitted += r.admitted
      if (b % 10 == 0 || b == nBatches - 1) {
        val fill = graft.util.BloomSidecar.stats(spark, index)
          .map(s => f"${s.fill}%.4f").getOrElse("null")
        println(f"""MEDIASOAK {"batch":$b,"wall":$wall%.2f,"admitted":${r.admitted},"dropped_neardup":${r.droppedWithinBatch + r.droppedVsIndex},"dropped_redelivered":${r.droppedRedelivered},"total_admitted":$totalAdmitted,"chunks_max_frag":$maxFrag,"bloom_fill":$fill}""")
      }
      if (b > 0 && b % checkpointEvery == 0) {
        // served hash table == a cold decode+hash pass over the admitted
        // corpus (the fold never drifts from what a rebuild would serve)
        val servedRows = Multimodal.servedHashes(spark, index)
          .select("doc_id", "ahash").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        val rebuilt = Multimodal.imageHashes(spark,
            MediaIngest.readCorpus(spark, corpus)).toDF()
          .select("doc_id", "ahash").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        val ok = servedRows == rebuilt
        println(s"""MEDIASOAK_CHECKPOINT {"batch":$b,"served_eq_rebuild":$ok,"served_rows":${servedRows.size}}""")
        require(ok, s"checkpoint $b diverged")
      }
    }
    val sorted = walls.sorted
    def pct(p: Double) = sorted((p * (sorted.size - 1)).toInt)
    val q1 = walls.take(nBatches / 4)
    val q4 = walls.takeRight(nBatches / 4)
    println(f"""MEDIASOAK_SUMMARY {"batches":$nBatches,"per_batch":$perBatch,"total_admitted":$totalAdmitted,"wall_p50":${pct(0.5)}%.2f,"wall_p90":${pct(0.9)}%.2f,"wall_max":${sorted.last}%.2f,"first_quarter_mean":${q1.sum / q1.size}%.2f,"last_quarter_mean":${q4.sum / q4.size}%.2f}""")
    spark.stop()
  }
}
