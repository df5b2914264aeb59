package graft.analytics

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.DocResult
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Golden scoring: span-sequence verdicts and the recursive field-path
  * comparator (reference benchmark/extraction_utils.py:127-233).
  *
  * Spark shape (SURVEY.md §2.3 J3 / §2.4 A6-A7): the comparator flattens
  * both JSON trees to (path, outcome) rows — a per-document pure function
  * (documents are the unit of parallelism) — then plain `groupBy(doc_id)`
  * aggregations roll up accuracy, so no custom UDAF is needed.
  */
object Scoring {

  /** One field-level comparison outcome (exploded row). */
  final case class FieldOutcome(doc_id: String, path: String, outcome: String,
                                expected: String, got: String)

  final case class DocScore(doc_id: String, accuracy: Double, total_fields: Long,
                            matches: Long, mismatches: Long, missing: Long,
                            extra: Long, quality: String, completeness: Double)

  private val mapper = new ObjectMapper()

  /** Double-encoded JSON unwrap: parse; if the result is a string, parse
    * again (run_batch_benchmark.py:73-79). */
  def parseMaybeDoubleEncoded(s: String): JsonNode = {
    val first = mapper.readTree(s)
    if (first != null && first.isTextual) {
      try mapper.readTree(first.asText())
      catch { case _: Exception => first } // plain string, not JSON-in-JSON
    } else first
  }

  /** Python-equality normalization: strings strip+lower and never equal
    * numbers ("2" != 2); 2 == 2.0; True == 1 (bool is int in Python). The
    * type tag keeps cross-type values distinct. */
  private def norm(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isTextual) "s:" + n.asText().trim.toLowerCase
    else if (n.isBoolean) "n:" + (if (n.asBoolean()) "1" else "0")
    else if (n.isNumber) {
      // integral values compare exactly (Python int equality — doubles
      // collapse distinct ints beyond 2^53); integral floats normalize to
      // the same key so 2 == 2.0 holds like Python
      if (n.isIntegralNumber) "n:" + n.bigIntegerValue().toString
      else {
        val d = n.asDouble()
        "n:" + (if (d == math.rint(d) && !d.isInfinite)
          java.math.BigDecimal.valueOf(d).toBigInteger.toString
        else d.toString)
      }
    } else n.toString

  private def raw(n: JsonNode): String =
    if (n == null || n.isNull) "null" else if (n.isTextual) n.asText() else n.toString

  /** Faithful recursive comparison (extraction_utils.py:138-209): dict keys
    * full-outer; arrays compare `path_length` then positionally on equal
    * length (short-circuit on mismatch); strings strip+lower; numbers
    * numerically. Emits one row per field path. */
  def compareJson(docId: String, gtJson: String, extJson: String): Seq[FieldOutcome] = {
    val out = Vector.newBuilder[FieldOutcome]
    def walk(gt: JsonNode, ext: JsonNode, path: String): Unit = {
      if (gt != null && gt.isObject && ext != null && ext.isObject) {
        val gtKeys = iteratorToSet(gt.fieldNames())
        val extKeys = iteratorToSet(ext.fieldNames())
        for (k <- (gtKeys -- extKeys).toSeq.sorted)
          out += FieldOutcome(docId, join(path, k), "missing", raw(gt.get(k)), "")
        for (k <- (extKeys -- gtKeys).toSeq.sorted)
          out += FieldOutcome(docId, join(path, k), "extra", "", raw(ext.get(k)))
        for (k <- (gtKeys & extKeys).toSeq.sorted)
          walk(gt.get(k), ext.get(k), join(path, k))
      } else if (gt != null && gt.isArray && ext != null && ext.isArray) {
        if (gt.size == ext.size) {
          out += FieldOutcome(docId, s"${path}_length", "match",
            gt.size.toString, ext.size.toString)
          var i = 0
          while (i < gt.size) { walk(gt.get(i), ext.get(i), s"$path[$i]"); i += 1 }
        } else {
          out += FieldOutcome(docId, s"${path}_length", "mismatch",
            gt.size.toString, ext.size.toString)
        }
      } else {
        val p = if (path.isEmpty) "value" else path
        if (norm(gt) == norm(ext))
          out += FieldOutcome(docId, p, "match", raw(gt), raw(ext))
        else
          out += FieldOutcome(docId, p, "mismatch", raw(gt), raw(ext))
      }
    }
    def join(p: String, k: String) = if (p.isEmpty) k else s"$p.$k"
    def iteratorToSet(it: java.util.Iterator[String]): Set[String] = {
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    try walk(parseMaybeDoubleEncoded(gtJson), parseMaybeDoubleEncoded(extJson), "")
    catch {
      case _: Exception =>
        out += FieldOutcome(docId, "value", "mismatch", gtJson, extJson)
    }
    out.result()
  }

  /** Exploded field outcomes for (doc_id, truth_json, extracted_json) rows. */
  def fieldOutcomes(pairs: Dataset[(String, String, String)]): Dataset[FieldOutcome] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.flatMap { case (id, gt, ext) => compareJson(id, gt, ext) }
  }

  /** A6 rollup (extraction_utils.py:211-233): accuracy, quality label,
    * completeness — a single hash aggregation over the exploded outcomes. */
  def scores(outcomes: Dataset[FieldOutcome]): Dataset[DocScore] = {
    val spark = outcomes.sparkSession
    import spark.implicits._
    outcomes.groupBy($"doc_id")
      .agg(
        sum(when($"outcome" === "match", 1L).otherwise(0L)).as("matches"),
        sum(when($"outcome" === "mismatch", 1L).otherwise(0L)).as("mismatches"),
        sum(when($"outcome" === "missing", 1L).otherwise(0L)).as("missing"),
        sum(when($"outcome" === "extra", 1L).otherwise(0L)).as("extra"))
      .withColumn("total_fields", $"matches" + $"mismatches" + $"missing")
      .withColumn("accuracy",
        when($"total_fields" > 0, $"matches" / $"total_fields" * 100.0).otherwise(0.0))
      .withColumn("quality",
        when($"accuracy" === 100.0, "perfect")
          .when($"accuracy" >= 80.0, "good")
          .otherwise("needs_improvement"))
      .withColumn("completeness",
        when($"total_fields" > 0,
          ($"total_fields" - $"missing") / $"total_fields" * 100.0).otherwise(0.0))
      .select($"doc_id", $"accuracy", $"total_fields", $"matches", $"mismatches",
        $"missing", $"extra", $"quality", $"completeness")
      .as[DocScore]
  }

  /** Span-sequence equality verdicts: results ⋈ golden on doc_id, built-in
    * array<struct> equality on the ordered spans (the north-rule invariant).
    * The golden side is tiny → broadcast join, no shuffle of results. */
  def spanVerdicts(results: Dataset[DocResult], golden: Dataset[DocResult]): DataFrame = {
    val got = results.toDF("doc_id", "spans", "success", "failure_code",
      "n_spans", "n_pages", "partition_id", "kernel_nanos")
      .select(col("doc_id"), col("spans").as("got_spans"),
        col("failure_code").as("got_failure"))
    val want = golden.toDF().select(col("doc_id"), col("spans").as("want_spans"),
      col("failure_code").as("want_failure"))
    // full outer: a result doc missing from golden (or vice versa) is a
    // FAIL row, never a silently-shrunk verdict table. No broadcast hint:
    // Spark cannot broadcast either side of a full outer join (the hint is
    // ignored with a HintErrorLogger warning), and the golden side is a
    // handful of rows — SMJ is fine here.
    got.join(want, Seq("doc_id"), "full_outer")
      .withColumn("spans_match",
        coalesce(col("got_spans") === col("want_spans"), lit(false)))
      .withColumn("failure_match",
        coalesce(col("got_failure") === col("want_failure"), lit(false)))
      .withColumn("verdict",
        when(col("got_spans").isNull, "FAIL_MISSING_RESULT")
          .when(col("want_spans").isNull, "FAIL_NO_GOLDEN")
          .when(col("spans_match") && col("failure_match"), "PASS")
          .otherwise("FAIL"))
  }
}
