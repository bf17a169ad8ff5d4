package graft.tools

import graft.operators.Stats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for the grouped quantile machinery at 10x/100x. */
object GqProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev0 = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val ev = (0 until k).map(i =>
      ev0.withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_.unionByName(_))
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"GQ $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }
    time("materialize")(ev.count())
    for (r <- 1 to 2) {
      time(s"quantiles_r$r")(
        Stats.exactQuantilesPerGroup(ev, "event_type", "value",
          Seq(0.25, 0.5, 0.9)).count())
      time(s"mad_r$r")(
        Stats.madPerGroup(ev, "event_type", "value").count())
    }
    spark.stop()
  }
}
