package graft.ops

import graft.kernel.Router
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P5 smart prompt routing and P2 grounding validation as pure column
  * expressions — the query-battery (whole-corpus, codegen'd) form of the
  * per-row kernel in [[graft.kernel.Router]]. The reference applies the
  * same decision table per document before dispatch
  * (run_batch_benchmark.py:105-137) and rejects grounding requests without
  * a 4-number bbox (modal_deploy.py:459-477) — here both are CASE
  * expressions over document metadata, so Catalyst pushes/prunes/codegens
  * them like any other predicate. RoutingSpec asserts the expressions agree
  * with the kernel functions on the full mode matrix.
  */
object Routing {

  /** Deterministic format/quality derivation from doc_id: the `documents`
    * test table has no format column, so the battery derives one — the 9
    * reference formats (run_batch_benchmark.py:479-482) plus UNKNOWN to
    * exercise the allow-list reject path. SQL-expressible (list indexing),
    * shared verbatim with the DuckDB oracle. */
  val Formats: Seq[String] = Seq("TABLE", "FORM", "SLIDES", "PHOTO_NUTRITION",
    "SCANNED_TABLE", "WEB_TABLE", "PHOTO_TABLE", "SCANNED_FORM",
    "PHOTO_RECEIPT", "UNKNOWN")
  val Qualities: Seq[String] = Seq("PHOTO", "SCANNED", "DIGITAL")

  def formatOf(docId: Column): Column =
    element_at(lit(Formats.toArray), (docId % 10).cast("int") + 1)

  def qualityOf(docId: Column): Column =
    element_at(lit(Qualities.toArray), (docId % 3).cast("int") + 1)

  /** P5: Router.optimalPromptMode as a CASE expression
    * (run_batch_benchmark.py:105-137). */
  def routeOf(format: Column, quality: Column): Column =
    when(format.isin("TABLE", "PHOTO_TABLE", "WEB_TABLE", "SCANNED_TABLE"),
      when(quality === "PHOTO", Router.LayoutAll).otherwise(Router.LayoutOnly))
      .when(format.isin("FORM", "SCANNED_FORM"), Router.GroundingOcr)
      .when(format === "PHOTO_RECEIPT", Router.LayoutAll)
      .otherwise(Router.Ocr)

  /** P4: allow-list membership (run_batch_benchmark.py:476-502). */
  def allowedOf(format: Column): Column =
    format.isin(Router.AllowedFormats.toSeq.sorted: _*)

  /** Deterministic bbox-length derivation: every 7th doc carries no bbox,
    * every 11th a malformed 3-element one, the rest a valid 4-element box —
    * exercises all grounding-validation classes. */
  def bboxLenOf(docId: Column): Column =
    when(docId % 7 === 0, lit(0))
      .when(docId % 11 === 0, lit(3))
      .otherwise(lit(4))

  /** P2: grounding-bbox requirement as a failure-code column — errors are
    * rows, never exceptions (modal_deploy.py:459-477 raises; the engine
    * form records BBOX_REQUIRED and keeps going). */
  def groundingFailure(mode: Column, bboxLen: Column): Column =
    when(mode === Router.GroundingOcr && bboxLen =!= 4, lit("BBOX_REQUIRED"))
      .otherwise(lit(""))
}
