package graft.kernel

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import graft.model.{Element, FailureCodes}

import scala.collection.mutable.ArrayBuffer

/** Tolerant parser for model-style layout-element JSON arrays.
  *
  * Reference behaviors reproduced (file:line into /root/reference):
  *  - markdown fence strip (benchmark/extraction_utils.py:94-99)
  *  - leading-garbage recovery: if the text does not start with '[', find the
  *    first '[' and slice (tests/test_single_page.py:246-255; real need shown
  *    by benchmark/results/test_results_20250816_133103.json whose result
  *    begins with prose before the array)
  *  - truncated generations (max_tokens) yield a prefix of complete elements
  *    and a warn, not a failure (tests/test_accuracy.py:190-199;
  *    results/multi_page_results.json page 1 is cut mid-string)
  *  - structural validation: bbox = 4 numbers, category ∈ 11-enum, text
  *    required unless Picture (tests/test_accuracy.py:74-99)
  */
object LayoutJson {

  final case class ParseOutcome(elements: Vector[Element], failureCode: String)

  private val factory = new JsonFactory()

  /** Strip ```json fences and leading/trailing whitespace. */
  def stripFences(s: String): String = {
    var t = s.trim
    if (t.startsWith("```")) {
      val nl = t.indexOf('\n')
      t = if (nl >= 0) t.substring(nl + 1) else ""
    }
    if (t.endsWith("```")) t = t.substring(0, t.length - 3)
    t.trim
  }

  /** Recover the JSON array start: slice from the first '['. */
  def recoverArrayStart(s: String): Option[String] = {
    val t = stripFences(s)
    if (t.startsWith("[")) Some(t)
    else {
      val i = t.indexOf('[')
      if (i >= 0) Some(t.substring(i)) else None
    }
  }

  /** Parse a (possibly garbage-prefixed, possibly truncated) layout JSON
    * array into validated elements. Never throws. */
  def parse(raw: String): ParseOutcome = {
    recoverArrayStart(raw) match {
      case None => ParseOutcome(Vector.empty, FailureCodes.JsonRecoveryFailed)
      case Some(json) =>
        val buf = ArrayBuffer.empty[Element]
        var truncated = false
        var schemaViolated = false
        val parser = factory.createParser(json)
        try {
          if (parser.nextToken() != JsonToken.START_ARRAY) {
            return ParseOutcome(Vector.empty, FailureCodes.JsonRecoveryFailed)
          }
          var done = false
          while (!done) {
            val tok =
              try parser.nextToken()
              catch { case _: Exception => truncated = true; null }
            if (tok == null) { truncated = true; done = true } // EOF before ']'
            else if (tok == JsonToken.END_ARRAY) done = true
            else if (tok == JsonToken.START_OBJECT) {
              readObject(parser) match {
                case Right(Some(el)) => buf += el
                case Right(None)     => schemaViolated = true
                case Left(())        => truncated = true; done = true
              }
            } else {
              // non-object array member: schema violation. A nested ARRAY
              // must be skipped wholesale — iterating into it would misread
              // its END_ARRAY as the outer terminator and drop everything
              // after it
              schemaViolated = true
              if (tok == JsonToken.START_ARRAY) parser.skipChildren()
            }
          }
        } catch {
          case _: Exception => truncated = true
        } finally parser.close()

        val code =
          if (truncated) FailureCodes.Truncated
          else if (schemaViolated) FailureCodes.SchemaViolation
          else FailureCodes.Ok
        ParseOutcome(buf.toVector, code)
    }
  }

  /** Read one element object; Right(Some) = valid, Right(None) = structurally
    * invalid (dropped), Left(()) = input ended mid-object (truncation). */
  private def readObject(p: JsonParser): Either[Unit, Option[Element]] = {
    var bbox: Array[Double] = null
    var bboxOk = true
    var category: String = null
    var text: String = null
    try {
      var tok = p.nextToken()
      while (tok != JsonToken.END_OBJECT) {
        if (tok == null) return Left(())
        if (tok == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          val v = p.nextToken()
          if (v == null) return Left(())
          name match {
            case "bbox" =>
              if (v == JsonToken.START_ARRAY) {
                val nums = ArrayBuffer.empty[Double]
                var t2 = p.nextToken()
                while (t2 != JsonToken.END_ARRAY) {
                  if (t2 == null) return Left(())
                  if (t2.isNumeric) nums += p.getDoubleValue
                  else bboxOk = false
                  t2 = p.nextToken()
                }
                bbox = nums.toArray
              } else { bboxOk = false; p.skipChildren() }
            case "category" =>
              if (v == JsonToken.VALUE_STRING) category = p.getText
              else p.skipChildren()
            case "text" =>
              if (v == JsonToken.VALUE_STRING) text = p.getText
              else p.skipChildren()
            case _ =>
              p.skipChildren()
          }
        }
        tok = p.nextToken()
      }
    } catch {
      case _: Exception => return Left(())
    }
    // structural validation — tests/test_accuracy.py:74-99
    val valid =
      bbox != null && bbox.length == 4 && bboxOk &&
        category != null && graft.model.Categories.Set.contains(category) &&
        (text != null || category == "Picture")
    if (!valid) Right(None)
    else {
      val el = Element(bbox(0), bbox(1), bbox(2), bbox(3), category,
        if (category == "Picture") "" else text)
      Right(Some(el))
    }
  }
}
