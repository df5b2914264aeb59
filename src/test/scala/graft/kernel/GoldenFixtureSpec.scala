package graft.kernel

import graft.corpus.Fixtures
import graft.model.Span
import org.scalatest.funsuite.AnyFunSuite

/** The correctness gate: span-sequence equality (kind, text, media_ref,
  * order) against golden fixtures transcribed from the reference
  * (north rule / FIXTURES.md §3). */
class GoldenFixtureSpec extends AnyFunSuite {

  private def diff(got: Seq[Span], want: Seq[Span]): String = {
    val sb = new StringBuilder
    val n = math.max(got.size, want.size)
    for (i <- 0 until n) {
      val g = got.lift(i).map(s => (s.kind, s.text.take(40), s.media_ref, s.offset))
      val w = want.lift(i).map(s => (s.kind, s.text.take(40), s.media_ref, s.offset))
      if (g != w) sb.append(s"  [$i] got=$g\n       want=$w\n")
    }
    sb.toString
  }

  for (doc <- Fixtures.inputDocs) {
    test(s"golden span-sequence equality: ${doc.doc_id}") {
      val want = Fixtures.expected(doc.doc_id)
      val got = Extract.extractDoc(doc)
      assert(got.spans == want.spans,
        s"\nspan mismatch for ${doc.doc_id}:\n" + diff(got.spans, want.spans))
      assert(got.failure_code == want.failure_code,
        s"failure_code: got ${got.failure_code}, want ${want.failure_code}")
      assert(got.success == want.success)
    }
  }

  test("category histogram of page 0: Text >= 8 and Picture == 1 (test_accuracy.py:126-143)") {
    val got = Extract.extractDoc(Fixtures.inputDocs.head)
    val hist = got.spans.groupBy(_.kind).view.mapValues(_.size).toMap
    assert(hist.getOrElse("Text", 0) >= 8)
    assert(hist.getOrElse("Picture", 0) == 1)
  }

  test("page 0 key Hindi substrings present (test_accuracy.py:37-68)") {
    val got = Extract.extractDoc(Fixtures.inputDocs.head)
    val text = got.spans.map(_.text).mkString(" ")
    val expectedTerms = Seq("प्रेषक", "भवदीय", "पत्रांक", "जिला प्रोबेशन अधिकारी")
    val found = expectedTerms.count(text.contains)
    assert(found.toDouble / expectedTerms.size >= 0.8)
  }

  test("page 0 Devanagari date regex found (test_accuracy.py:111-123)") {
    val got = Extract.extractDoc(Fixtures.inputDocs.head)
    val text = got.spans.map(_.text).mkString(" ")
    assert("[०-९]{2}/[०-९]{2}/[०-९]+".r.findFirstIn(text).isDefined)
  }

  test("truncated page keeps complete prefix and warns, not fails (test_accuracy.py:190-199)") {
    val got = Extract.extractDoc(Fixtures.inputDocs(1))
    assert(got.success)
    assert(got.failure_code == "TRUNCATED")
    assert(got.spans.nonEmpty)
  }

  test("offsets are dense 0..n-1 in every fixture result") {
    for (doc <- Fixtures.inputDocs) {
      val got = Extract.extractDoc(doc)
      assert(got.spans.map(_.offset) == got.spans.indices.map(identity))
    }
  }
}
