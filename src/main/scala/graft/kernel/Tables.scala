package graft.kernel

/** Markdown-table parsing and HTML-table serialization.
  *
  * Semantics mirror the reference's chart post-processing helpers:
  *  - extract_table_from_chart_analysis — tests/test_single_page.py:93-139:
  *    rows are lines splitting into ≥3 '|' cells; separator lines matching
  *    ^[\|\s\-]+$ are skipped; outside a table, lines shaped
  *    "Category: v1, v2" containing digits AND a finance keyword are
  *    accepted; a table needs ≥2 rows.
  *  - create_table_element_from_chart_data — tests/test_single_page.py:141-182:
  *    first row → <thead><th>, rest → <tbody><td>.
  *  - Table category text is HTML (prompt contract modal_gpu.py:67).
  */
object Tables {

  private val sepLine = "^[\\|\\s\\-]+$".r
  private val financeKeywords =
    Seq("Revenue", "Sales", "$", "%", "Total", "million", "billion")

  /** Parse markdown (or "Category: values" fallback) table text into rows of
    * cells. Returns None when fewer than 2 rows are found. */
  def parseMarkdownTable(text: String): Option[Vector[Vector[String]]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var n = 0
    var inTable = false
    var done = false
    for (rawLine <- text.split('\n') if !done) {
      val line = rawLine.trim
      if (line.contains("|") && line.split("\\|", -1).length >= 3) {
        if (sepLine.findFirstIn(line).isEmpty) {
          val row = line.split("\\|", -1).iterator.map(_.trim).filter(_.nonEmpty).toVector
          if (row.nonEmpty) { rows += row; n += 1; inTable = true }
        }
      } else if (inTable && line.isEmpty) {
        done = true // blank line after table ends collection
      } else if (!inTable) {
        if (line.contains(":") && line.exists(_.isDigit) &&
            financeKeywords.exists(line.contains)) {
          val parts = line.split(":", 2)
          if (parts.length == 2) {
            val category = parts(0).trim
            val values = parts(1).split("[,;]").iterator.map(_.trim).filter(_.nonEmpty).toVector
            if (values.nonEmpty) { rows += (category +: values); n += 1 }
          }
        }
      }
    }
    val out = rows.result()
    if (out.length >= 2) Some(out) else None
  }

  /** Serialize rows to the reference's HTML shape: header row in
    * thead/th, remaining rows in tbody/td. */
  def toHtml(rows: Seq[Seq[String]]): String = {
    val sb = new StringBuilder("<table>")
    if (rows.nonEmpty) {
      sb.append("<thead><tr>")
      rows.head.foreach(c => sb.append("<th>").append(c).append("</th>"))
      sb.append("</tr></thead>")
      if (rows.length > 1) {
        sb.append("<tbody>")
        rows.tail.foreach { r =>
          sb.append("<tr>")
          r.foreach(c => sb.append("<td>").append(c).append("</td>"))
          sb.append("</tr>")
        }
        sb.append("</tbody>")
      }
    }
    sb.append("</table>")
    sb.toString
  }
}
