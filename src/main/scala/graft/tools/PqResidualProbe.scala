package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: IVF-PQ build and probe cost, residual coding ON vs OFF, at the
  * bench fixture scale (and 10x via SPARK_GRAFT_SF_DIR). Pins the source
  * of the r8 x81 regression (0.76 -> 1.63 s the round residual landed):
  * how much of the probe doubling is the two extra broadcast joins +
  * wider aggregate, and how much goes away when the vector-side
  * reconstruction terms are precomputed at build time. */
object PqResidualProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(s"PROBE $name: count=$c ${(System.nanoTime() - t0) / 1000000} ms")
    }
    for (res <- Seq(false, true)) {
      val path = s"/tmp/pq_probe_${if (res) "res" else "raw"}"
      for (round <- 1 to 2)
        time(s"build_residual=${res}_r$round") {
          graft.operators.Pq.writeIvfPqIndex(emb, path,
            nlist = 16, m = 8, ksub = 16, dim = 64, residual = res)
          1L
        }
      for (round <- 1 to 3)
        time(s"probe_residual=${res}_r$round")(
          graft.operators.Pq.ivfPqTopK(spark, path, q, 10, nprobe = 4).count())
    }
    spark.stop()
  }
}
