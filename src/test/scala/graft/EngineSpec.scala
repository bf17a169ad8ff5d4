package graft

import graft.operators.Dedup
import graft.sinks.Sinks
import graft.sources.SpotSynth
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EngineSpec extends SparkSpec {

  test("SQL surface: tables, spots views, and vec_dot all reachable from spark.sql") {
    Engine.register(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) n FROM lineitem").first().getLong(0) == 6000L)
    assert(spark.sql("SELECT count(*) n FROM spots_enriched WHERE wd_band = 2200")
      .first().getLong(0) > 0)
    val d = spark.sql(
      """SELECT vec_dot(a.embedding, b.embedding) d
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .first().getDouble(0)
    assert(!d.isNaN)
    // the full custom-expression surface is SQL-reachable
    assert(spark.sql("SELECT poly_hash('abc') h").first().getLong(0) == 1677554L)
    val sig = spark.sql(
      "SELECT hyperplane_sig(embedding, 8) s FROM embeddings WHERE vec_id = 0")
      .first().getLong(0)
    assert(sig >= 0L && sig < 256L)
    val bandSig = spark.sql(
      "SELECT portable_band_sig(embedding, 4, 8) s FROM embeddings WHERE vec_id = 0")
      .first().getSeq[Long](0)
    assert(bandSig.length == 4 && bandSig.forall(b => b >= 0L && b < 256L))
  }

  test("salted exact dedup equals unsalted") {
    Engine.register(spark, "/root/testdata/sf0.001")
    val docs = spark.table("documents")
    val key = concat_ws(" ", slice(split(col("text"), " "), 1, 5))
    val plain = Dedup.exactGroups(docs, key)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Dedup.exactGroupsSalted(docs, key, salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("partitioned spot sink: day layout prunes partitions for time filters") {
    val out = Files.createTempDirectory("partsink").toString + "/spots"
    val sp = SpotSynth.fromDir(spark, "/root/testdata/sf0.001")
    Sinks.writeSpotsPartitioned(sp, out)
    val back = spark.read.parquet(out)
    assert(back.count() == sp.count())
    // filter on the partition column must prune the scan to one day's files
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // executes THIS plan instance, populating its metrics
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    }
    val oneDay = back.filter(col("wd_date") === "2024-01-02")
    val all = scannedFiles(back)
    val pruned = scannedFiles(oneDay)
    assert(pruned > 0 && pruned < all, s"expected pruning: $pruned of $all")
    assert(oneDay.count() > 0)
  }
}
