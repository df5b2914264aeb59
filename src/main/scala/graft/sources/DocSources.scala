package graft.sources

import graft.model.{Doc, DocResult}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks (SURVEY.md §2.1).
  *
  *  - S1/S2: raw page/image files come in through Spark's `binaryFile`
  *    source as opaque bytes + path metadata (the clean-room stand-in for
  *    the PDF/image rasterizer front door).
  *  - S3: corpus tables are parquet reads (`readDocs`).
  *  - S4/S5: result sinks — parquet partitioned by success for the batch
  *    results, markdown-ish text per doc (the reference's save_result
  *    shape, client.py:487-511), JSON metrics.
  */
object DocSources {

  /** S3: the Doc table (columnar parquet; pruning + pushdown apply). */
  def readDocs(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(path).as[Doc]
  }

  /** S1/S2: binary media files → (path, length, content, base64) rows.
    * Whole files as opaque bytes; decode happens in ops.Multimodal. */
  def readBinaryMedia(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"),
        col("content"), base64(col("content")).as("content_b64"))

  /** S3 variant: the Doc table from JSON-lines. Schema passed explicitly —
    * never inferSchema at scale (inference is a full sampling pass over the
    * input just to guess what we already know). */
  def readDocsJson(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.schema(org.apache.spark.sql.Encoders.product[Doc].schema)
      .json(path).as[Doc]
  }

  def writeDocsJson(docs: Dataset[Doc], path: String): Unit =
    docs.write.mode(SaveMode.Overwrite).json(path)

  /** S3 variant: CSV — no nested types, so spans travel as a JSON string
    * column and are restored with from_json on read (schema explicit). */
  def writeDocsCsv(docs: Dataset[Doc], path: String): Unit =
    docs.select(col("doc_id"), to_json(col("spans")).as("spans_json"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readDocsCsv(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    val spanArr = org.apache.spark.sql.Encoders.product[Doc].schema("spans").dataType
    spark.read.option("header", "true")
      .schema("doc_id string, spans_json string")
      .csv(path)
      .select(col("doc_id"), from_json(col("spans_json"), spanArr).as("spans"))
      .as[Doc]
  }

  /** S1/S2 fixture bootstrap: deterministic PNG page rasters (one per id,
    * `doc_<id>.png`, dims `(id%48+16, (id/7)%48+16)` — the formula the
    * DuckDB oracle recomputes) written once to a content-addressed tmp dir.
    * Returns the dir. Idempotent: the `_SUCCESS` marker skips rewrites, so
    * re-running a query battery costs one stat() call. */
  def pngFixtureDir(ids: Seq[Long]): String = {
    // content-digest key (not hashCode): a 32-bit hash collision between two
    // different id sets would silently reuse a stale PNG set and make the
    // ingest query diverge from its oracle with no error
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(ids.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val dir = new java.io.File(s"/tmp/graft_png_fixtures_${digest}_${ids.size}")
    val marker = new java.io.File(dir, "_SUCCESS")
    if (!marker.exists()) {
      dir.mkdirs()
      ids.foreach { id =>
        val w = (id % 48 + 16).toInt
        val h = (id / 7 % 48 + 16).toInt
        java.nio.file.Files.write(
          new java.io.File(dir, f"doc_$id%05d.png").toPath,
          graft.ops.Multimodal.renderPng(id, w, h))
      }
      java.nio.file.Files.write(marker.toPath, Array.empty[Byte])
    }
    dir.getAbsolutePath
  }

  /** S5: batch-result parquet sink, laid out for failure triage. */
  def writeResults(results: Dataset[DocResult], outDir: String): Unit =
    results.write.mode(SaveMode.Overwrite)
      .partitionBy("success")
      .parquet(outDir)

  /** S5: per-doc markdown text sink — one line per span, reading order,
    * mirroring the reference's OCR-text markdown dump. */
  def writeMarkdown(results: Dataset[DocResult], outDir: String): Unit = {
    val spark = results.sparkSession
    import spark.implicits._
    results
      .map(r => r.doc_id + "\n" +
        r.spans.map(s => if (s.kind == "Picture") s"![](${s.media_ref})" else s.text)
          .mkString("\n"))
      .write.mode(SaveMode.Overwrite).text(outDir)
  }
}
