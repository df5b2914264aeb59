package graft.kernel

import graft.model.Element

/** Chart detection and deterministic chart→table structuring.
  *
  * Mirrors the reference chart sub-pipeline (tests/test_single_page.py):
  *  - is_likely_chart predicate (:69-91): Picture, valid 4-bbox, width ≥ 100,
  *    height ≥ 100, aspect ratio max(w/h, h/w) ≤ 5.
  *  - the LLM "describe chart" step (:223-246) is replaced by a deterministic
  *    stand-in: a chart's media_ref may carry its own data payload
  *    (`...?md=<urlencoded markdown>`); the table extraction (:93-139) and
  *    HTML serialization (:141-182) then run unchanged on that payload.
  *  - a successfully structured chart gets a synthesized Table element with
  *    bbox [x1, y2+10, x2, y2+50] inserted immediately after the Picture
  *    (:163, :286-291), tagged source "chart_extraction".
  */
object Charts {

  def isLikelyChart(e: Element): Boolean =
    e.category == "Picture" &&
      e.width >= 100 && e.height >= 100 &&
      (e.height > 0 && math.max(e.width / e.height, e.height / e.width) <= 5.0)

  /** Pull the deterministic chart-description payload out of a media_ref
    * (`?md=` query param, URL-encoded). */
  def chartPayload(mediaRef: String): Option[String] = {
    val i = mediaRef.indexOf("?md=")
    if (i < 0) None
    else
      // malformed percent-encoding is data, not an exception (the kernel
      // never throws): an undecodable payload means "no structured chart"
      try Some(java.net.URLDecoder.decode(mediaRef.substring(i + 4), "UTF-8"))
      catch { case _: IllegalArgumentException => None }
  }

  /** Build the synthesized Table element for a structured chart. */
  def tableElementFor(chart: Element, rows: Seq[Seq[String]]): Element =
    Element(chart.x1, chart.y2 + 10, chart.x2, chart.y2 + 50,
      "Table", Tables.toHtml(rows))

  /** Rewrite an ordered element sequence, inserting a Table element after
    * each chart whose payload parses to ≥2 table rows. Order-preserving. */
  def process(ordered: Seq[Element]): Seq[Element] =
    ordered.flatMap { e =>
      if (isLikelyChart(e)) {
        chartPayload(e.mediaRef)
          .flatMap(Tables.parseMarkdownTable)
          .map(rows => Seq(e, tableElementFor(e, rows)))
          .getOrElse(Seq(e))
      } else Seq(e)
    }
}
