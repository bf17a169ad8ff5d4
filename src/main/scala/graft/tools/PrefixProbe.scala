package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: prefix-filtered exact Jaccard join (q101) vs the df-capped
  * inverted index (q31) at the bench fixture scale. Records the price of
  * soundness — the prefix filter loses no pairs by construction; the df cap
  * is a recall heuristic above its threshold. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(s"PROBE $name: count=$c ${(System.nanoTime() - t0) / 1000000} ms")
    }
    for (round <- 1 to 2) {
      time(s"prefix_join_r$round")(
        graft.operators.Dedup.prefixJaccardPairs(docs, 3, 0.5).count())
      time(s"q31_capped_r$round")(
        graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
      time(s"q31_uncapped_r$round")(
        graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.5,
          maxGramDocs = Int.MaxValue).count())
    }
    spark.stop()
  }
}
