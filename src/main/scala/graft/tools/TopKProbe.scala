package graft.tools

import graft.plans.{TopKStrategy, TopKWindowRewrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the TopKPerKey heap execs vs Spark's built-in path
  * (InferWindowGroupLimit + sorts + WindowExec) on the same top-N-per-group
  * SQL — the numbers behind the rewrite's SCALING.md row. */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read
      .option("mergeSchema", "false").parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    // 10x amplification, distinct event ids
    val big = (0 until 10).map(i =>
      ev.withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_.unionByName(_))
    big.createOrReplaceTempView("ev")
    val manyKeys = // ~100k user keys, top 5 each
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, value, row_number() OVER
        |    (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM ev) WHERE rn <= 5""".stripMargin
    val fewKeys = // 4 event-type keys, quarter-corpus groups, top 10 each
      """SELECT event_type, event_id, value, rn FROM (
        |  SELECT event_type, event_id, value, row_number() OVER
        |    (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |  FROM ev) WHERE rn <= 10""".stripMargin
    def time(name: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      val n = spark.sql(sql).agg(count(lit(1))).first().getLong(0)
      println(f"PROBE $name: rows=$n ${(System.nanoTime() - t0) / 1000000} ms")
    }
    for (round <- 1 to 3) {
      time(s"builtin_many_r$round", manyKeys)
      time(s"builtin_few_r$round", fewKeys)
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKWindowRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKStrategy
    spark.conf.set(TopKWindowRewrite.EnabledConf, "true")
    for (round <- 1 to 3) {
      time(s"heap_many_r$round", manyKeys)
      time(s"heap_few_r$round", fewKeys)
    }
    spark.stop()
  }
}
