package graft.tools

import graft.operators.{Audit, Dedup, Enrich}
import graft.sources.SpotSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: amplify the sf0.1 fixtures by K via id-offset unions and
  * measure the heavy operators, to validate the scaling claims in SCALING.md
  * with observed numbers rather than assertions. Not part of the driver
  * contract; run manually. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def amplify(df: DataFrame, idCols: Seq[String], step: Long): DataFrame =
      (0 until k).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * step)))
      }.reduce(_.unionByName(_))

    val dir = "/root/testdata/sf0.1"
    val events = amplify(spark.read.parquet(s"$dir/events.parquet"),
      Seq("event_id"), 1000000L)
    val docs = amplify(spark.read.parquet(s"$dir/documents.parquet"),
      Seq("doc_id"), 1000000L)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s   rows=$n")
    }

    println(s"amplification x$k: events=${events.count()}, docs=${docs.count()}")
    time("enrich (events->27col)") {
      val e = Enrich.formatted(SpotSynth.fromEvents(events))
      e.select(xxhash64(e.columns.map(col): _*)).agg(count(lit(1))).first().getLong(0)
    }
    time("gap_audit bucketed") {
      Audit.gapAudit(events.filter(col("event_type") =!= "error"), "event_id")
        .collect().head.getLong(0)
    }
    time("ngram_jaccard") {
      Dedup.ngramJaccardPairs(docs, 3, 0.5).count()
    }
    time("minhash_lsh") {
      Dedup.minhashLshPairs(docs).count()
    }
    time("simhash") {
      Dedup.simhashPairs(docs).count()
    }
    val emb = amplify(spark.read.parquet(s"$dir/embeddings.parquet"),
      Seq("vec_id"), 1000000L)
    time("embed_exact_pairs") {
      Dedup.embeddingNearDupPairs(emb, 0.4).count()
    }
    time("embed_lsh_pairs") {
      Dedup.embeddingNearDupPairsLsh(emb, 0.4).count()
    }
    spark.stop()
  }
}
