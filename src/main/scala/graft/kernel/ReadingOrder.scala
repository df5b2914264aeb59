package graft.kernel

import graft.model.Element

/** Deterministic human-reading-order reconstruction: recursive XY-cut over
  * bbox geometry plus baseline (text-line) clustering inside leaf blocks.
  *
  * The reference delegates ordering to the vision model via the prompt
  * ("sorted according to human reading order", modal_gpu.py:72) and its
  * consumers trust element index as order (tests/test_single_page.py:260-292).
  * This module is the clean-room deterministic replacement; the golden
  * fixtures transcribed from results/multi_page_results.json pin the expected
  * order and this algorithm reproduces it.
  *
  * Algorithm:
  *  1. XY-cut: project boxes onto Y; any zero-coverage gap splits the region
  *     into top/bottom, recursively. If no horizontal cut exists, project on
  *     X and split on gaps wider than `minVGap` (column detection), ordering
  *     columns left→right. Recurse until no cut applies.
  *  2. Leaf: baseline clustering — two boxes share a text line iff their
  *     vertical overlap ≥ 0.5 × min(height). Lines are ordered by top edge,
  *     members left→right.
  * All tie-breaks fall back to (y1, x1, input index) so the order is total
  * and partitioning-invariant.
  */
object ReadingOrder {

  /** Minimum width of a vertical whitespace gap to count as a column break
    * (pixels in the reference's ~1280-wide page space). */
  val minVGap: Double = 16.0

  def order(elements: Seq[Element]): Seq[Element] = {
    if (elements.size <= 1) return elements
    // Fast path for the dominant page shape (synthesized stacked layout:
    // Boilerplate/Markdown place every block at the same [x1,x2]): when all
    // x-extents are identical, no subset can ever produce a vertical gap,
    // and when the y-intervals are strictly separated, every horizontal cut
    // isolates the topmost element — the recursion provably reduces to a
    // plain y1 sort. O(k log k) instead of O(k²) re-sorts, bit-identical
    // output (pinned by the golden fixtures, the permutation-invariance
    // property and the Python cross-implementation, which runs the general
    // algorithm unconditionally).
    val hx1 = elements.head.x1
    val hx2 = elements.head.x2
    if (elements.forall(e => e.x1 == hx1 && e.x2 == hx2)) {
      val sorted = elements.sortBy(_.y1)
      var separated = true
      var i = 1
      while (separated && i < sorted.size) {
        if (!(sorted(i).y1 > sorted(i - 1).y2)) separated = false
        i += 1
      }
      if (separated) return sorted
    }
    // cut()'s result is a pure function of the element SET (every internal
    // step either sorts by element values + original index or is
    // order-independent), so the input may be pre-sorted by y1 once —
    // letting hGaps scan in list order instead of re-sorting at every
    // recursion level (partitions preserve the y1 order). The
    // permutation-invariance property test pins this.
    val idx = elements.zipWithIndex.toVector.sortBy(_._1.y1)
    cut(idx, allowV = true).map(_._1)
  }

  private type IE = (Element, Int)

  /** Invariant: `els` is sorted by y1 (maintained by every partition). */
  private def cut(els: Vector[IE], allowV: Boolean): Vector[IE] = {
    if (els.size <= 1) return els
    val h = hGaps(els)
    // a column split needs (a) substance on both sides — a lone label beside
    // a heading is one visual block, not two columns — and (b) a gap that is
    // wide relative to the block: forms have incidental 20-30px channels
    // between label and value columns that humans read row-wise (both rules
    // pinned by the reference form page, multi_page_results.json p1)
    val blockWidth = els.map(_._1.x2).max - els.map(_._1.x1).min
    val blockYSpan = els.last._1.y1 - els.head._1.y1 // y1-sorted
    val v = if (allowV) vGaps(els).filter { case (w, splitX) =>
      val (l, r) = els.partition(_._1.x2 <= splitX)
      def ySpan(s: Vector[IE]) = s.last._1.y1 - s.head._1.y1 // y1-sorted
      l.size >= 2 && r.size >= 2 && w >= 0.08 * blockWidth &&
        // true columns run tall on BOTH sides; a side collapsing to a single
        // text row is a row fragment, read inline, not a column
        ySpan(l) >= 0.5 * blockYSpan && ySpan(r) >= 0.5 * blockYSpan
    } else None
    (h, v) match {
      // widest whitespace gap wins (classic XY-cut); ties go horizontal
      case (Some((hw, _)), Some((vw, splitX))) if vw > hw =>
        val (left, right) = els.partition(_._1.x2 <= splitX)
        cut(left, allowV = false) ++ cut(right, allowV = false)
      case (Some((_, splitY)), _) =>
        val (top, bottom) = els.partition(_._1.y2 <= splitY)
        cut(top, allowV = true) ++ cut(bottom, allowV = true)
      case (None, Some((_, splitX))) =>
        val (left, right) = els.partition(_._1.x2 <= splitX)
        cut(left, allowV = false) ++ cut(right, allowV = false)
      case _ => lines(els)
    }
  }

  /** First full-width horizontal gap (scanning top-down): (width, splitY).
    * The FIRST gap (not widest) keeps top-to-bottom recursion stable; its
    * width only competes against a column gap. Relies on the cut()
    * invariant that `els` is already y1-sorted — no per-level re-sort. */
  private def hGaps(els: Vector[IE]): Option[(Double, Double)] = {
    var coverEnd = els.head._1.y2
    var i = 1
    while (i < els.length) {
      val e = els(i)._1
      if (e.y1 > coverEnd) return Some((e.y1 - coverEnd, (coverEnd + e.y1) / 2.0))
      if (e.y2 > coverEnd) coverEnd = e.y2
      i += 1
    }
    None
  }

  /** Widest vertical gap of width ≥ minVGap: (width, splitX). */
  private def vGaps(els: Vector[IE]): Option[(Double, Double)] = {
    val iv = els.map(e => (e._1.x1, e._1.x2)).sortBy(_._1)
    var coverEnd = iv.head._2
    var best: Option[(Double, Double)] = None // (gapWidth, mid)
    var i = 1
    while (i < iv.length) {
      val (s, e) = iv(i)
      if (s > coverEnd) {
        val w = s - coverEnd
        if (w >= minVGap && best.forall(_._1 < w))
          best = Some((w, (coverEnd + s) / 2.0))
      }
      if (e > coverEnd) coverEnd = e
      i += 1
    }
    best
  }

  /** Baseline clustering: greedy line building over boxes sorted by y1. */
  private def lines(els: Vector[IE]): Vector[IE] = {
    val sorted = els.sortBy { case (e, i) => (e.y1, e.x1, i) }
    val built = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[IE]]
    for (ie <- sorted) {
      val e = ie._1
      // join the last line whose band overlaps this box by ≥ half the
      // smaller height; greedy is stable because input is y-sorted
      // same text line iff vertical overlap covers ≥65% of the TALLER box:
      // a short label dipping into a tall paragraph's band is not the same
      // line. Veto: an element entering an existing line from the LEFT while
      // starting well below the line's top is a next-row label, not a line
      // member (both rules pinned by the reference fixture pages' ordering —
      // multi_page_results.json pages 1/2).
      val line = built.reverseIterator.find { ln =>
        val lineMinX = ln.map(_._1.x1).min
        val lineMinY = ln.map(_._1.y1).min
        val leftBelowVeto = e.x1 < lineMinX && (e.y1 - lineMinY) > 0.5 * e.height
        !leftBelowVeto && ln.exists { case (o, _) =>
          val ov = math.min(e.y2, o.y2) - math.max(e.y1, o.y1)
          ov > 0 && ov >= 0.65 * math.max(e.height, o.height)
        }
      }
      line match {
        case Some(ln) => ln += ie
        case None     => built += scala.collection.mutable.ArrayBuffer(ie)
      }
    }
    built.sortBy(ln => ln.map(x => (x._1.y1, x._1.x1)).min)
      .flatMap(_.sortBy { case (e, i) => (e.x1, e.y1, i) })
      .toVector
  }
}
