package graft

import graft.sinks.Sinks
import org.apache.spark.sql.functions._

/** Pins the storage-side co-location contract: two tables written with
  * [[Sinks.writeBucketedTable]] on the same key and bucket count join as a
  * sort-merge join with NO exchange on the join key — the at-rest layout
  * every per-job `repartition(col).checkpoint` in this library simulates.
  * (Read-side sort elision additionally needs one file per bucket, a
  * compaction property, not a layout one — not claimed here.)
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("same-bucket tables sort-merge join with no exchange on the join key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bspec LOCATION '$dir'")
    try {
      val facts = (1 to 5000).map(i => (i.toLong % 257, i.toLong, i * 1.5))
        .toDF("key", "seq", "amount")
      val dims = (0L until 257L).map(k => (k, s"name$k")).toDF("key", "name")
      Sinks.writeBucketedTable(facts, "bspec.facts", Seq("key"), 8)
      Sinks.writeBucketedTable(dims, "bspec.dims", Seq("key"), 8)
      // disable broadcast so the small dim doesn't dodge the layout question
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("bspec.facts").join(spark.table("bspec.dims"), "key")
          .groupBy("name").agg(sum("amount").as("total"))
        val plan = executed(j)
        assert(plan.contains("SortMergeJoin"), plan)
        // THE claim: neither side shuffles on the join key — the bucketed
        // layout satisfies the join's distribution requirement from disk.
        // (The later groupBy("name") exchange is on a different, post-join
        // key and carries aggregate-sized data — expected and fine.)
        assert(!plan.contains("Exchange hashpartitioning(key"),
          s"bucketed join must not shuffle on key:\n$plan")
        assert(plan.contains("Bucketed: true"), plan)
        val got = j.orderBy("name").limit(3).collect().map(_.getString(0)).toSeq
        assert(got == Seq("name0", "name1", "name10"))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bspec CASCADE")
    }
  }

  test("bucketed groupBy on the bucket key aggregates without an exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bspec2 LOCATION '$dir'")
    try {
      val facts = (1 to 4000).map(i => (i.toLong % 97, i.toLong)).toDF("key", "v")
      Sinks.writeBucketedTable(facts, "bspec2.facts", Seq("key"), 8)
      val agg = spark.table("bspec2.facts").groupBy("key").agg(sum("v").as("s"))
      val plan = executed(agg)
      assert(!plan.contains("Exchange hashpartitioning(key"),
        s"bucketed aggregate must not shuffle:\n$plan")
      assert(agg.count() == 97)
    } finally spark.sql("DROP DATABASE IF EXISTS bspec2 CASCADE")
  }
}
