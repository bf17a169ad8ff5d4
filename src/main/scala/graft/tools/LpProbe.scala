package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: warm lpInsert vs cold labelPropagation on the bench graph —
  * the crossover row for SCALING.md (q194's steady-state claim). */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val directed = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"),
        (col("o_orderkey") % 10 === 0).as("late"))
    val base = graft.operators.Graph.symmetrize(
      directed.filter(!col("late")).drop("late"))
    val batch = graft.operators.Graph.symmetrize(
      directed.filter(col("late")).drop("late"))
    val merged = graft.operators.Graph.symmetrize(directed.drop("late"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(s"PROBE $name: count=$c ${(System.nanoTime() - t0) / 1000000} ms")
    }
    for (round <- 1 to 2) {
      var st: graft.operators.Graph.LabelState = null
      time(s"lp_init5_r$round") {
        st = graft.operators.Graph.lpRounds(graft.operators.Graph.lpInit(base), 5)
        st.labels.count()
      }
      time(s"lp_insert2_warm_r$round")(
        graft.operators.Graph.lpInsert(st, batch, rounds = 2).labels.count())
      time(s"lp_cold5_merged_r$round")(
        graft.operators.Graph.labelPropagation(merged, 5).count())
    }
    spark.stop()
  }
}
