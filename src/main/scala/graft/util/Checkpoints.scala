package graft.util

import org.apache.spark.sql.SparkSession

/** Shared checkpoint-root bootstrap for operators that materialize a result
  * OFF their round caches (connected components, PageRank): a reliable
  * checkpoint (files, not block-manager memory) lets every persisted input
  * be freed the moment the result exists, instead of leaking for the life
  * of the session — the difference between a one-shot query and a per-batch
  * daemon that runs the operator forever.
  *
  * On a cluster the deployment sets `spark.sparkContext.setCheckpointDir`
  * to durable storage and this helper never creates anything. In local mode
  * (tests, Verify, Bench) it creates a temp root once per JVM and removes
  * it at exit; the graft entrypoints additionally set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so each call's
  * checkpoint files are reclaimed when its result RDD is GC'd. */
object Checkpoints {
  def ensureDir(spark: SparkSession): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir.toFile)
      }
      spark.sparkContext.setCheckpointDir(dir.toString)
    }
}
