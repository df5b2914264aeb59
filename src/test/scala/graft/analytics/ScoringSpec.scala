package graft.analytics

import graft.corpus.Fixtures
import org.scalatest.funsuite.AnyFunSuite

/** Field-path comparator semantics (reference extraction_utils.py:127-233). */
class ScoringSpec extends AnyFunSuite {

  private def outcomes(gt: String, ext: String) =
    Scoring.compareJson("t", gt, ext)

  test("example_000 self-compare scores 49/49 = 100% perfect (reference report)") {
    val gt = Fixtures.ex000TruthJsonRaw
    val out = outcomes(gt, gt)
    assert(out.size == 49, s"reference counted 49 fields, got ${out.size}")
    assert(out.forall(_.outcome == "match"))
  }

  test("missing and extra keys classified like the reference key-set diff") {
    val out = outcomes("""{"a":1,"b":2}""", """{"a":1,"c":3}""")
    assert(out.map(o => (o.path, o.outcome)).toSet ==
      Set(("a", "match"), ("b", "missing"), ("c", "extra")))
  }

  test("array length mismatch short-circuits (no positional descent)") {
    val out = outcomes("""{"xs":[1,2,3]}""", """{"xs":[1,2]}""")
    assert(out.map(o => (o.path, o.outcome)) == Seq(("xs_length", "mismatch")))
  }

  test("equal-length arrays: length match row + positional compare") {
    val out = outcomes("""{"xs":[1,9]}""", """{"xs":[1,2]}""")
    assert(out.map(o => (o.path, o.outcome)).toSet ==
      Set(("xs_length", "match"), ("xs[0]", "match"), ("xs[1]", "mismatch")))
  }

  test("string normalization: strip + lowercase; numbers compare numerically") {
    assert(outcomes(""""  ABC  """", """"abc"""").head.outcome == "match")
    assert(outcomes("""{"n":2}""", """{"n":2.0}""").head.outcome == "match")
    assert(outcomes("""{"n":2}""", """{"n":"2"}""").head.outcome == "mismatch") // "2" != 2 (Python ==)
    assert(outcomes("""{"n":true}""", """{"n":1}""").head.outcome == "match") // True == 1
  }

  test("double-encoded ground truth unwraps twice (run_batch_benchmark.py:73-79)") {
    val doubly = "\"{\\\"k\\\": 5}\""
    assert(outcomes(doubly, """{"k":5}""").head.outcome == "match")
  }

  test("type mismatch dict-vs-list degrades to value mismatch, not a crash") {
    val out = outcomes("""{"x":{"a":1}}""", """{"x":[1]}""")
    assert(out.exists(_.outcome == "mismatch"))
  }

  test("accuracy rollup formulas (extraction_utils.py:211-233)") {
    val spark = graft.pipeline.SparkTestSession.spark
    import spark.implicits._
    val o = Scoring.fieldOutcomes(Seq(
      ("d1", """{"a":1,"b":2,"c":3,"d":4,"e":5}""", """{"a":1,"b":2,"c":3,"d":9,"x":7}""")).toDS())
    val s = Scoring.scores(o).collect().head
    // a,b,c match; d mismatch; e missing; x extra -> acc = 3/5 = 60%
    assert(s.matches == 3 && s.mismatches == 1 && s.missing == 1 && s.extra == 1)
    assert(math.abs(s.accuracy - 60.0) < 1e-9)
    assert(s.quality == "needs_improvement")
    assert(math.abs(s.completeness - 80.0) < 1e-9)
  }
}
