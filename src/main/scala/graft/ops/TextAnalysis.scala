package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * column expressions (no UDFs in the hot path), so filters compose with
  * predicate pushdown and whole-stage codegen at 100 TB scale. Each
  * operator has an exact ANSI-SQL twin used as the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column (empty/whitespace-only text → empty
    * array). Spark's trim() strips only ASCII spaces, so a trailing tab or
    * newline would leave a phantom empty token in a bare split — filter
    * them instead of trimming (mirrored in the t1/t2 oracles). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), x => x =!= lit(""))

  def tokenCount(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), size(tokens(col(textCol))).as("n_tokens"))

  /** Stopword list used by the quality/language heuristics (fixed, public). */
  val EnStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "on")

  /** Quality scoring: length, punctuation/digit ratios, stopword ratio,
    * mean token length, and a coarse quality label — the classic C4-style
    * heuristics, all as column arithmetic. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nToks = size(toks)
    val nChars = length(t)
    val punct = nChars - length(regexp_replace(t, "[.,;:!?]", ""))
    val digits = nChars - length(regexp_replace(t, "[0-9]", ""))
    val stopHits = size(filter(toks, x => x.isin(EnStopwords: _*)))
    df.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round(punct.cast("double") / greatest(nChars, lit(1)), 6).as("punct_ratio"),
      round(digits.cast("double") / greatest(nChars, lit(1)), 6).as("digit_ratio"),
      round(stopHits.cast("double") / greatest(nToks, lit(1)), 6).as("stopword_ratio"),
      round((nChars - nToks + 1).cast("double") / greatest(nToks, lit(1)), 6)
        .as("mean_token_len"))
      .withColumn("quality_label",
        when(col("n_tokens") < 10, "too_short")
          .when(col("stopword_ratio") < 0.01, "suspicious")
          .when(col("mean_token_len") > 12.0, "suspicious")
          .otherwise("ok"))
  }

  /** Marker-token sets for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "und", "die", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "es", "una"))

  /** Language ID: count marker-token hits per language, pick the argmax
    * (fixed priority order on ties; "und" = undetermined when no hits,
    * "zh" when CJK codepoints are present). Deterministic and expressible
    * identically in the DuckDB oracle. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = LangMarkers.foldLeft(
      df.select(col("doc_id"), col(textCol).as("__t"), toks.as("__toks"))) {
      case (acc, (lang, markers)) =>
        acc.withColumn(s"score_$lang", size(filter(col("__toks"), x => x.isin(markers: _*))))
    }
    // argmax with deterministic priority = chained CASE in list order
    val maxScore = greatest(LangMarkers.map(m => col(s"score_${m._1}")): _*)
    val pick = LangMarkers.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
    scored
      .withColumn("lang_id",
        when(col("__t").rlike("[\\u4e00-\\u9fff]"), "zh").otherwise(pick))
      .select(col("doc_id") +: LangMarkers.map(m => col(s"score_${m._1}")) :+ col("lang_id"): _*)
  }

  /** Document fingerprint: md5 of the case/whitespace-normalized text —
    * the exact-dedup key. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
      md5(lower(trim(col(textCol))).cast("binary")).as("fingerprint"))

  /** The quality label as a single column expression over raw text — for
    * single-pass composites (c1) that gate on quality without paying a
    * separate scan per derived table. Same rounded-ratio semantics as
    * `qualityScore` (spec-pinned equal). */
  def qualityLabelCol(t: Column): Column = {
    val toks = tokens(t)
    val nToks = size(toks)
    val nChars = length(t)
    val stopHits = size(filter(toks, x => x.isin(EnStopwords: _*)))
    val stopRatio = round(stopHits.cast("double") / greatest(nToks, lit(1)), 6)
    val meanTokLen =
      round((nChars - nToks + 1).cast("double") / greatest(nToks, lit(1)), 6)
    when(nToks < 10, "too_short")
      .when(stopRatio < 0.01, "suspicious")
      .when(meanTokLen > 12.0, "suspicious")
      .otherwise("ok")
  }

  /** The language id as a single column expression (same argmax/tie/zh
    * semantics as `langId`; spec-pinned equal). */
  def langIdCol(t: Column): Column = {
    val toks = tokens(lower(t))
    val scores = LangMarkers.map { case (_, ms) =>
      size(filter(toks, x => x.isin(ms: _*)))
    }
    val maxScore = greatest(scores: _*)
    val pick = LangMarkers.zip(scores).foldRight(lit("und")) {
      case (((lang, _), sc), els) =>
        when(sc === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
    when(t.rlike("[\\u4e00-\\u9fff]"), "zh").otherwise(pick)
  }

  /** BPE-ish regex token counting: letter runs, digit runs, and single
    * non-alphanumeric marks — the tokenizer-shaped budget count used when a
    * real BPE vocab isn't loadable (the usual pre-tokenizer split classes).
    * The pattern set is the common Java-regex/RE2 subset so the DuckDB
    * oracle counts identically. Pure codegen'd regexp_count expressions. */
  def regexTokens(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(
      col("doc_id"),
      regexp_count(t, lit("[A-Za-z]+")).as("n_alpha_runs"),
      regexp_count(t, lit("[0-9]+")).as("n_digit_runs"),
      regexp_count(t, lit("[^A-Za-z0-9\\s]")).as("n_marks"))
      .withColumn("n_bpe_tokens",
        col("n_alpha_runs") + col("n_digit_runs") + col("n_marks"))
  }

  /** 64-bit polynomial rolling hash (Karp-Rabin) over tokens — the
    * shift-resistant fingerprint variant; pure Scala, used via a typed map
    * (not SQL-expressible, covered by rows-only verification). */
  def rollingHash(tokens: Seq[String]): Long = {
    val B = 1000003L
    var h = 0L
    tokens.foreach { t =>
      var th = 1125899906842597L
      var i = 0
      // per code point, not UTF-16 unit — the DuckDB oracle folds
      // unicode(c) per character, and the two must agree beyond the BMP
      while (i < t.length) {
        val cp = t.codePointAt(i)
        th = 31 * th + cp
        i += Character.charCount(cp)
      }
      h = h * B + th
    }
    h
  }
}
