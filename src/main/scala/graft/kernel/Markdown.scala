package graft.kernel

import graft.model.Element
import scala.collection.mutable.ArrayBuffer

/** Markdown/plain-text page source → layout Elements.
  *
  * Covers the reference's markdown-facing surfaces: ground-truth pages are
  * markdown tables (benchmark/data/example_000_truth.md), OCR text output is
  * saved as markdown (client.py:487-511), and non-Table categories are
  * markdown-formatted text (modal_gpu.py:66-68). Geometry is synthesized with
  * the same deterministic layout model as Boilerplate so every page source
  * flows through the same ReadingOrder/offset machinery.
  */
object Markdown {

  private val headingRe = "^(#{1,6})\\s+(.*)$".r
  private val listRe = "^([-*+]|\\d{1,3}[.)])\\s+(.*)$".r
  private val imageRe = "^!\\[([^\\]]*)\\]\\(([^)]*)\\)\\s*$".r
  private val formulaRe = "^\\$\\$(.*)\\$\\$\\s*$".r

  // count('|') >= 2 ⇔ split("\\|", -1).length >= 3, without the regex
  // split allocating an array per line
  private def isTableLine(l: String): Boolean = {
    var pipes = 0
    var i = 0
    while (i < l.length && pipes < 2) {
      if (l.charAt(i) == '|') pipes += 1
      i += 1
    }
    pipes >= 2
  }

  def extract(text: String): Vector[Element] = {
    val out = Vector.newBuilder[Element]
    val layout = new Boilerplate.Layout
    def emit(category: String, txt: String, mediaRef: String = "", lines: Int = 1): Unit = {
      val (t, b) = layout.place(lines)
      out += Element(layout.x1, t, layout.x2, b, category, txt, mediaRef)
    }

    val lines = text.split('\n')
    var i = 0
    val para = ArrayBuffer.empty[String]
    def flushPara(): Unit = if (para.nonEmpty) {
      val t = para.mkString(" ").trim
      if (t.nonEmpty)
        emit("Text", t, lines = math.max(1, (t.length + 79) / 80))
      para.clear()
    }
    while (i < lines.length) {
      val line = lines(i).trim
      // first-char gates: each anchored pattern only matches a line that
      // starts with its marker char, so the regex machinery runs only on
      // candidate lines (most lines are plain text). Cascade order is
      // unchanged: heading, formula, image, table, list, paragraph.
      if (line.isEmpty) flushPara()
      else {
        val c0 = line.charAt(0)
        val head = if (c0 == '#') headingRe.unapplySeq(line) else None
        val form = if (head.isEmpty && c0 == '$') formulaRe.unapplySeq(line) else None
        val img = if (head.isEmpty && form.isEmpty && c0 == '!')
          imageRe.unapplySeq(line) else None
        if (head.isDefined) {
          flushPara()
          val hs = head.get
          emit(if (hs.head.length == 1) "Title" else "Section-header", hs(1).trim)
        } else if (form.isDefined) {
          flushPara(); emit("Formula", form.get.head.trim)
        } else if (img.isDefined) {
          flushPara(); emit("Picture", "", mediaRef = img.get(1), lines = 8)
        } else if (isTableLine(line)) {
          flushPara()
          // consume the whole pipe-table block
          val block = ArrayBuffer.empty[String]
          while (i < lines.length && isTableLine(lines(i).trim)) {
            block += lines(i).trim; i += 1
          }
          i -= 1
          Tables.parseMarkdownTable(block.mkString("\n")) match {
            case Some(rows) =>
              emit("Table", Tables.toHtml(rows), lines = rows.length + 1)
            case None =>
              val t = block.mkString(" ")
              emit("Text", t, lines = math.max(1, (t.length + 79) / 80))
          }
        } else {
          val lst = if (c0 == '-' || c0 == '*' || c0 == '+' || c0.isDigit)
            listRe.unapplySeq(line) else None
          if (lst.isDefined) {
            flushPara(); emit("List-item", lst.get(1).trim)
          } else para += line
        }
      }
      i += 1
    }
    flushPara()
    out.result()
  }
}
