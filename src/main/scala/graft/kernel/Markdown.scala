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

  private def isTableLine(l: String): Boolean =
    l.contains("|") && l.split("\\|", -1).length >= 3

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
      line match {
        case "" => flushPara()
        case headingRe(hashes, t) =>
          flushPara()
          emit(if (hashes.length == 1) "Title" else "Section-header", t.trim)
        case formulaRe(f) =>
          flushPara(); emit("Formula", f.trim)
        case imageRe(_, ref) =>
          flushPara(); emit("Picture", "", mediaRef = ref, lines = 8)
        case l if isTableLine(l) =>
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
        case listRe(_, item) =>
          flushPara(); emit("List-item", item.trim)
        case other =>
          para += other
      }
      i += 1
    }
    flushPara()
    out.result()
  }
}
