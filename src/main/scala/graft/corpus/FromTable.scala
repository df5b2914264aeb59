package graft.corpus

import graft.model.{Doc, Kinds, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Bridge from the driver's `documents` parquet table to interleaved
  * extraction Docs: each documents row becomes a deterministic multi-span
  * document whose page sources embed the row's actual text (markdown, HTML
  * or layout-JSON wrapper chosen by doc_id hash), plus media spans (every
  * third doc; chart-shaped with data payload every fifth). Deterministic in
  * doc_id alone → reproducible across partitionings and engines. */
object FromTable {

  def docFromRow(docId: Long, text: String, lang: String, source: String,
                 nChars: Long): Doc = {
    val r = new Synth.Rng(Synth.splitmix64(docId * 0x9e3779b97f4a7c15L + 17))
    val safe = Option(text).getOrElse("")
    val words = safe.split("\\s+").toSeq.filter(_.nonEmpty)
    val spans = Vector.newBuilder[Span]
    var off = 0

    def add(kind: String, t: String, ref: String): Unit = {
      spans += Span(kind, t, ref, off); off += 1
    }

    docId % 3 match {
      case 0 => // markdown page embedding the real text
        val md = new StringBuilder
        md.append("# Document ").append(docId).append("\n\n")
        md.append(safe).append("\n\n")
        md.append("| lang | source | n_chars |\n|---|---|---|\n")
        md.append(s"| $lang | $source | $nChars |\n")
        add(Kinds.TextKind, md.toString, "")
      case 1 => // HTML page with chrome around the real text
        val html = new StringBuilder("<html><body>")
        html.append("""<nav class="nav"><a href="/">home</a><a href="/l">lang</a></nav>""")
        html.append("<article><h1>Document ").append(docId).append("</h1>")
        html.append("<p>").append(safe).append("</p>")
        html.append("<ul><li>lang ").append(lang).append("</li><li>source ")
          .append(source).append("</li></ul>")
        html.append("</article><footer>").append(docId % 97).append("</footer></body></html>")
        add(Kinds.TextKind, html.toString, "")
      case _ => // model-style layout JSON carrying the text in Text elements
        val chunks = words.grouped(12).toSeq.take(6)
        val parts = chunks.zipWithIndex.map { case (ws, i) =>
          val y1 = 100 + i * 80
          s"""{"bbox": [80, $y1, 1100, ${y1 + 60}], "category": "${if (i == 0) "Title" else "Text"}", "text": "${Synth.jsonEscape(ws.mkString(" "))}"}"""
        }
        add(Kinds.TextKind, parts.mkString("[", ", ", "]"), "")
    }
    if (docId % 3 == 0) {
      val chart = docId % 5 == 0
      add(Kinds.MediaKind, "", Synth.mediaRefFor(r, chart))
    }
    Doc(s"tdoc_${"%08d".format(docId)}", spans.result())
  }

  def docs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)]
      .map { case (id, t, l, s, n) => docFromRow(id, t, l, s, n) }
  }
}
