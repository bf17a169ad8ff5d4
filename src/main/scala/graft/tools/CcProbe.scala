package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway profiling main for the q53 pipeline: times the pair generation
  * and the connected-components contraction separately, printing rounds. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    for (run <- 1 to 2) {
      val pairs = timed(s"run$run pairs")(
        Dedup.ngramJaccardPairs(docs, 3, 0.5).select("a_id", "b_id")
          .persist(StorageLevel.MEMORY_AND_DISK))
      println(s"[ccprobe] run$run n_pairs=" + timed(s"run$run pairs count")(pairs.count()))
      val (labels, rounds) =
        timed(s"run$run cc")(Dedup.connectedComponentsWithRounds(pairs))
      println(s"[ccprobe] run$run rounds=$rounds n_labels=" +
        timed(s"run$run labels collect")(labels.count()))
      pairs.unpersist()
    }
    spark.stop()
  }
}
