package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate parses history lines Bench itself wrote —
  * pin the parse + flag rules so a format tweak can't silently disarm it. */
class BenchRegressionSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private def hist(round: String, contaminated: Seq[String],
      qs: (String, Double)*): String = {
    val c = contaminated.map("\"" + _ + "\"").mkString("[", ",", "]")
    val q = qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    s"""{"round":"$round","sf":"$sf","contaminated":$c,"queries":$q,"bench_only":{}}"""
  }

  test("flags >1.5x slowdowns, worst ratio first; small deltas and new queries pass") {
    val lines = Seq(hist("r9", Seq.empty,
      "q68" -> 2.0, "q01" -> 0.9, "q05" -> 0.1, "q69" -> 3.5))
    val got = Bench.findRegressions(lines, sf,
      Seq("q68" -> 5.0, "q01" -> 1.0, "q05" -> 0.25, "q69" -> 5.4,
        "q_new" -> 9.9),
      contaminatedNow = Set.empty)
    // q05 is 2.5x but only +0.15 s (jitter floor); q01 within 1.5x;
    // q_new has no baseline; q68 ratio 2.5 > q69 ratio 1.54
    assert(got === Seq(("q68", 2.0, 5.0), ("q69", 3.5, 5.4)))
  }

  test("contamination in either round suppresses the flag") {
    val lines = Seq(hist("r9", Seq("q68"), "q68" -> 2.0, "q69" -> 3.5))
    val got = Bench.findRegressions(lines, sf,
      Seq("q68" -> 9.0, "q69" -> 9.0), contaminatedNow = Set("q69"))
    assert(got.isEmpty)
  }

  test("only the LAST same-sf entry is the baseline; other SFs are ignored") {
    val lines = Seq(
      hist("r8", Seq.empty, "q68" -> 9.0), // stale round: would not flag
      s"""{"round":"rX","sf":"/elsewhere","contaminated":[],"queries":{"q68":0.1},"bench_only":{}}""",
      hist("r9", Seq.empty, "q68" -> 2.0)) // the real baseline
    val got = Bench.findRegressions(lines, sf, Seq("q68" -> 5.0), Set.empty)
    assert(got === Seq(("q68", 2.0, 5.0)))
  }

  test("no history, or no same-sf line, means no flags") {
    assert(Bench.findRegressions(Seq.empty, sf, Seq("q" -> 9.0), Set.empty).isEmpty)
    val other = Seq(s"""{"round":"r9","sf":"/other","contaminated":[],"queries":{"q":1.0},"bench_only":{}}""")
    assert(Bench.findRegressions(other, sf, Seq("q" -> 9.0), Set.empty).isEmpty)
  }
}
