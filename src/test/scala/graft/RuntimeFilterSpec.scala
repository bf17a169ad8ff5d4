package graft

import graft.operators.RuntimeFilter
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 400L).map(i => (i, s"f$i")).toDF("fk", "payload")
  // dim keys = multiples of 20 -> 20 of the 400 fact rows truly match
  private def dim = (1L to 20L).map(i => (i * 20, s"d$i")).toDF("dk", "attr")

  test("bloomPrunedJoin returns exactly the plain join's rows") {
    val plain = fact.join(dim, $"fk" === $"dk")
      .collect().map(_.toSeq).toSet
    val pruned = RuntimeFilter.bloomPrunedJoin(fact, "fk", dim, "dk")
      .collect().map(_.toSeq).toSet
    assert(pruned == plain && plain.size == 20)
  }

  test("semi filter has zero false negatives and real selectivity") {
    val kept = RuntimeFilter.bloomSemiFilter(fact, "fk", dim, "dk")
      .select("fk").as[Long].collect().toSet
    val truth = (1L to 20L).map(_ * 20).toSet
    assert(truth.subsetOf(kept), s"lost keys: ${truth -- kept}")
    // fp rate at m=65536, k=4, n=20 is ~0: the 380 non-members mostly die
    assert(kept.size <= 40, s"kept ${kept.size} of 400 — filter not selective")
  }

  test("duplicate fact rows each survive the filter") {
    val dup = fact.union(fact)
    val kept = RuntimeFilter.bloomSemiFilter(dup, "fk", dim, "dk")
      .groupBy("fk").count().filter($"count" =!= 2L).count()
    assert(kept == 0L)
  }

  test("the probe is a narrow filter: no exchange before the scan's filter") {
    val filtered = RuntimeFilter.bloomSemiFilter(fact, "fk", dim, "dk")
    val shuffles = filtered.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bloom semi filter must not shuffle the fact side:\n${filtered.queryExecution.executedPlan}")
  }

  test("undersized filter stays correct, just prunes less") {
    val pruned = RuntimeFilter.bloomPrunedJoin(fact, "fk", dim, "dk",
        mBits = 64, k = 2)
      .collect().map(_.toSeq).toSet
    val plain = fact.join(dim, $"fk" === $"dk").collect().map(_.toSeq).toSet
    assert(pruned == plain)
  }
}
