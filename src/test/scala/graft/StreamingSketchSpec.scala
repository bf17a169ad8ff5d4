package graft

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The sketch operators' merge property exercised in a REAL incremental
  * pipeline: per-batch grids folded into a running state table across
  * micro-batches (foreachBatch — the DocIngest pattern), final state equal
  * to the one-shot batch build over all data. This is the 100 TB ingest
  * shape: the sketch is maintained as data arrives, never rebuilt. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bloom grid folds incrementally across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[String]
    var state: DataFrame = Seq.empty[(Long, Long)].toDF("word", "bits")
    val q = source.toDF().toDF("key").writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        val grid = Sketches.bloomBuild(batch, "key")
        state = state.union(grid).groupBy("word")
          .agg(expr("bit_or(bits)").as("bits"))
          .localCheckpoint(true) // truncate lineage per batch, like DocIngest
        ()
    }.start()
    val batches = Seq(
      (0 until 40).map(i => s"doc-$i"),
      (40 until 70).map(i => s"doc-$i"),
      (30 until 90).map(i => s"doc-$i")) // overlap: bit_or is idempotent
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val oneShot = Sketches.bloomBuild(
      (0 until 90).map(i => s"doc-$i").toDF("key"), "key")
      .orderBy("word").collect().toSeq
    assert(state.orderBy("word").collect().toSeq == oneShot)
    // and the folded grid answers membership exactly like the batch one
    val probe = Sketches.bloomContains(state,
      Seq("doc-0", "doc-89", "absent-1").toDF("key"), "key")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probe("doc-0") && probe("doc-89") && !probe("absent-1"))
  }

  test("cc labels fold incrementally across micro-batches") {
    // the soft-dedup daemon shape: near-dup pairs arrive per batch and fold
    // into the at-rest cluster labeling via ccInsert — chained merges
    // across batches must land on the one-shot labels over all pairs
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, Long)]
    var labels: Option[DataFrame] = None
    val q = source.toDF().toDF("a_id", "b_id").writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        labels = Some(labels.fold(
          graft.operators.Dedup.connectedComponents(batch))(
          graft.operators.Dedup.ccInsert(_, batch)))
        ()
    }.start()
    val batches = Seq(
      Seq((1L, 2L), (3L, 4L), (20L, 21L)),
      Seq((2L, 3L)),            // merges {1,2} with {3,4} through members
      Seq((10L, 11L), (4L, 10L))) // extends the merged cluster again
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = labels.get.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.operators.Dedup
      .connectedComponents(batches.flatten.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == oneShot)
    assert(got(11L) == 1L && got(21L) == 20L)
  }

  test("hll registers fold incrementally by max, estimate unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(String, String)]
    // register-level build: the groupBy(grp, bucket) max(rho) core of
    // hllDistinct (single aggregate => streamable/foldable); estimates are
    // derived from registers, so equal registers => equal estimates
    def registers(df: DataFrame): DataFrame = {
      val grams = df.select(col("grp"),
        explode(graft.operators.Dedup.wordNGrams(col("text"), 3)).as("gram"))
      val ph = graft.functions.expressions.TextFunctions.poly_hash(col("gram"))
      grams.select(col("grp"), ph.as("ph"))
        .select(col("grp"), (col("ph") % lit(64L)).as("bucket"), expr("ph div 64").as("w"))
        .groupBy("grp", "bucket").agg(max(expr(
          "CASE WHEN w >= 16777216 THEN 1 WHEN w >= 8388608 THEN 2 ELSE 3 END")).as("r"))
    }
    // NOTE: coarse 3-level rho is enough to prove the fold; the real
    // operator's 26-level chain folds identically (same max-merge algebra)
    var state: DataFrame = Seq.empty[(String, Long, Int)].toDF("grp", "bucket", "r")
    val q = source.toDF().toDF("grp", "text").writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        state = state.union(registers(batch)).groupBy("grp", "bucket")
          .agg(max("r").as("r")).localCheckpoint(true)
        ()
    }.start()
    val docs = (0 until 90).map(i => ("s0", (0 until 12).map(j => s"w${i * 5 + j}").mkString(" ")))
    docs.grouped(30).foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val oneShot = registers(docs.toDF("grp", "text")).orderBy("grp", "bucket").collect().toSeq
    assert(state.orderBy("grp", "bucket").collect().toSeq == oneShot)
  }
}
