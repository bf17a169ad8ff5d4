package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: warm btInsert vs cold bradleyTerry on the bench match stream —
  * the crossover row for SCALING.md (q206's steady-state claim). */
object BtProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Experiment
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val nxt = ev.select((col("event_id") - 1).as("event_id"),
      col("event_type").as("t2"), col("value").as("v2"))
    val win = col("value") > col("v2") ||
      (col("value") === col("v2") && col("event_type") < col("t2"))
    val m = ev.join(nxt, "event_id")
      .filter(col("event_type") =!= col("t2"))
      .select(when(win, col("event_type")).otherwise(col("t2")).as("winner"),
        when(win, col("t2")).otherwise(col("event_type")).as("loser"),
        (col("event_id") % 10 === 0).as("late"))
    val base = m.filter(!col("late")).drop("late")
    val batch = m.filter(col("late")).drop("late")
    val all = m.drop("late")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(s"PROBE $name: count=$c ${(System.nanoTime() - t0) / 1000000} ms")
    }
    for (round <- 1 to 2) {
      var st: Experiment.BtState = null
      time(s"bt_init5_r$round") {
        st = Experiment.btRounds(Experiment.btInit(base), 5)
        st.strengths.count()
      }
      time(s"bt_insert2_warm_r$round")(
        Experiment.btScores(Experiment.btInsert(st, batch, iters = 2)).count())
      time(s"bt_cold5_merged_r$round")(
        Experiment.bradleyTerry(all).count())
    }
    spark.stop()
  }
}
