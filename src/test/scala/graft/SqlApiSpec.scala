package graft

import graft.pipeline.{ExtractionPipeline, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface must compute exactly what the typed pipeline computes —
  * a SQL-only user switching from the reference gets identical results. */
class SqlApiSpec extends AnyFunSuite {

  private lazy val spark = { val s = SparkTestSession.spark; SqlApi.registerAll(s); s }

  test("driver contract: oracle keys pair with query keys; only x-series lack oracles") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q),
      s"oracle entries without a query (dead oracle rows): ${o -- q}")
    // every non-oracle query must be an x-series entry (kernel-bound,
    // pinned by the Python cross-implementation instead) — anything else
    // would silently downgrade to the driver's weaker rows-only check
    val noOracle = q -- o
    assert(noOracle.forall(_.startsWith("x")),
      s"non-x queries missing a DuckDB oracle: ${noOracle.filterNot(_.startsWith("x"))}")
    assert(noOracle == Set("x1_extract_spans", "x2_kind_histogram",
      "x3_partition_metrics", "x4_golden_verdicts", "x5_field_outcomes",
      "x6_field_scores"))
  }

  test("extract_spans via spark.sql equals the typed extraction pipeline") {
    import spark.implicits._
    val docs = ExtractionPipeline.synthDocs(spark, 30, seed = 17, parallelism = 2)
    docs.createOrReplaceTempView("sql_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, extract_spans(
        |  doc_id, spans.kind, spans.text, spans.media_ref, spans.offset) AS spans
        |FROM sql_docs""".stripMargin)
      .as[(String, Seq[graft.model.Span])].collect().toMap
    val viaTyped = ExtractionPipeline.extract(docs).collect()
      .map(r => r.doc_id -> r.spans).toMap
    assert(viaSql.keySet == viaTyped.keySet)
    viaTyped.foreach { case (id, spans) =>
      assert(viaSql(id) == spans, s"doc $id diverges between SQL and typed API")
    }
  }

  test("vec_dot in SQL plans the native expression and matches the column API") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    df.createOrReplaceTempView("sql_vecs")
    val viaSql = spark.sql("SELECT vec_dot(a, b) AS d FROM sql_vecs")
    assert(viaSql.queryExecution.analyzed.toString.contains("vec_dot"),
      "must plan the native expression, not a UDF wrapper")
    assert(viaSql.collect()(0).getDouble(0) == 32.0)
    val viaCol = df.select(graft.functions.VecMath.vecDot(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).collect()(0).getDouble(0)
    assert(viaCol == 32.0)
  }

  test("dedup/text operators are SQL-callable as native expressions ≡ the oracle-pinned operators") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("sql_tdocs")
    val viaSql = spark.sql(
      """SELECT doc_id, content_hash(text) AS h, token_count(text) AS n,
        | quality_label(text) AS q, lang_id(text) AS l
        |FROM sql_tdocs""".stripMargin)
    // the registered functions splice composed codegen'd expressions, not
    // UDF wrappers — the plan must carry no black-box ScalaUDF node
    assert(!viaSql.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "SQL surface must plan native expressions")
    val got = viaSql.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getString(3), r.getString(4)))
      .toMap
    // ≡ the battery operators that carry the d1/t1/t2/t3/t4 DuckDB oracles
    val h = graft.ops.TextAnalysis.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = graft.ops.TextAnalysis.tokenCount(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val q = graft.ops.TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("quality_label")).toMap
    val l = graft.ops.TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang_id")).toMap
    got.foreach { case (id, (gh, gn, gq, gl)) =>
      assert(gh == h(id) && gn == n(id) && gq == q(id) && gl == l(id),
        s"doc $id diverges between SQL surface and operators")
    }
    // content_hash is d1's exact-dedup key: the SQL-side keeper rollup
    // equals Dedup.exactDedup
    val viaSqlDedup = spark.sql(
      """SELECT content_hash(text) AS content_hash, min(doc_id) AS keeper_doc_id,
        | count(*) AS n_docs FROM sql_tdocs GROUP BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaOp = graft.ops.Dedup.exactDedup(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSqlDedup == viaOp)
    assert(docs.select(col("doc_id")).count() == got.size.toLong)
  }

  test("sketch and routing functions are SQL-callable with kernel semantics") {
    val r = spark.sql(
      """SELECT simhash60('the quick brown fox') AS sh,
        |  rolling_fp('the quick brown fox') AS fp,
        |  optimal_prompt_mode('FORM', 'DIGITAL') AS m1,
        |  optimal_prompt_mode('TABLE', 'PHOTO') AS m2,
        |  resolve_prompt('not_a_mode') AS passthrough""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.ops.Dedup.simhash60(
      Seq("the", "quick", "brown", "fox")))
    assert(r.getLong(1) == graft.ops.TextAnalysis.rollingHash(
      Seq("the", "quick", "brown", "fox")))
    assert(r.getString(2) == graft.kernel.Router.GroundingOcr)
    assert(r.getString(3) == graft.kernel.Router.LayoutAll)
    assert(r.getString(4) == "not_a_mode")
  }
}
