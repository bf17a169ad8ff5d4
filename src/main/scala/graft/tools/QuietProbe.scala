package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: pin a query's HONEST cost on a quiet host — the PqResidualProbe
  * protocol generalized (warm JVM, min of N back-to-back runs, GC time
  * alongside each wall number so a GC-dominated run is visible instead of
  * argued about). Mirrors Bench's session config exactly (local[32],
  * shuffle=32, AQE, ANSI) so the number answers "what should the bench
  * read on an idle machine", not a differently-tuned question.
  *
  * SPARK_GRAFT_PROBE_QUERIES: comma-separated SparkEntry query names
  * (default q68_dup_windows,q69_pagerank — the r8→r9 disputed pair).
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_PROBE_RUNS as usual. */
object QuietProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
      "q68_dup_windows,q69_pagerank").split(",").map(_.trim).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      force(fn(spark, "/root/testdata/sf0.001")) // warm JIT + plan cache
      val times = (1 to runs).map { r =>
        val g0 = gcMs; val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name r$r: $wall%.2f s wall, ${gcMs - g0} ms gc")
        wall
      }
      println(f"PROBE $name MIN: ${times.min}%.2f s of $runs runs")
    }
    spark.stop()
  }
}
