package graft

import graft.pipeline.{ExtractionPipeline, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression checks: the plans that must hold at 100 TB —
  * pushdown reaching the scan, small dims broadcast, single shuffle in the
  * extraction pipeline — asserted, not eyeballed. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q9 allow-list filter is pushed to the parquet scan") {
    val p = planOf("q9_source_allowlist")
    assert(p.contains("PushedFilters: [In(source"), p.take(800))
  }

  test("q9 scan is pruned to the two needed columns") {
    val p = planOf("q9_source_allowlist")
    assert(p.contains("ReadSchema: struct<lang:string,source:string>"), p.take(800))
  }

  test("q2 dimension joins are broadcast, not shuffled") {
    val p = planOf("q2_nation_order_stats")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "no SMJ expected for dims:\n" + p.take(1200))
  }

  test("s1 query side is broadcast") {
    val p = planOf("s1_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1200))
  }

  test("extraction pipeline has exactly one shuffle (the salting exchange)") {
    import spark.implicits._
    val docs = ExtractionPipeline.synthDocs(spark, 100, parallelism = 4)
    val results = ExtractionPipeline.extract(docs)
    val plan = results.queryExecution.executedPlan.toString
    val exchanges = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n${plan.take(1500)}")
  }

  test("production span dump has no global sort: one exchange, no range partitioning") {
    import spark.implicits._
    val docs = ExtractionPipeline.synthDocs(spark, 100, parallelism = 4)
    val plan = ExtractionPipeline.extractSpans(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "sortWithinPartitions must not add a range exchange:\n" + plan.take(1500))
    val exchanges = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected only the salting exchange, plan:\n${plan.take(1500)}")
  }

  test("q12 star join broadcasts the small dimensions") {
    val p = planOf("q12_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("d9 occurrence count is map-side combinable and its joins shuffle scalars only") {
    val p = planOf("d9_dup_spans")
    // partial_count before the exchange = the (hash, count) partials the
    // docstring promises; no shingle TEXT may cross any exchange (only
    // the 60-bit hash, doc_id, pos)
    assert(p.contains("partial_count"), p.take(1500))
    assert(!p.contains("SortMergeJoin") || !p.contains("_2#"),
      "join keys must be the scalar hash, not shingle text")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("shingle")), exchanges.mkString("\n"))
  }

  test("q1 aggregation is a partial/final hash agg over a pruned scan") {
    val p = planOf("q1_lineitem_rollup")
    assert(p.contains("HashAggregate"))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_returnflag:string,l_linestatus:string>")
      || p.contains("l_returnflag"), p.take(900))
  }

  /** Every exchange whose output already carries BOTH pair ids is the
    * pair-dedup shuffle — it must move only scalars. Shuffling the full
    * embedding/signature arrays per candidate pair was the dominant d5
    * cost at the 10x corpus (~0.5 KB/pair). */
  private def pairExchangesCarryNoArrays(name: String, idA: String, idB: String): Unit = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // AQE wraps the tree in AdaptiveSparkPlanExec whose children are not
    // traversable pre-execution — inspect the static physical plan instead
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val pairExchanges = plan.collect {
      case e: ShuffleExchangeLike
        if e.output.exists(_.name == idA) && e.output.exists(_.name == idB) => e
    }
    assert(pairExchanges.nonEmpty, s"$name: expected a pair-dedup exchange")
    pairExchanges.foreach { e =>
      val arrays = e.output.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrays.isEmpty,
        s"$name pair-dedup exchange must not shuffle arrays, found: " +
          arrays.map(_.name).mkString(", "))
    }
  }

  test("d5 pair dedup shuffles ids only, never the embedding arrays") {
    pairExchangesCarryNoArrays("d5_embedding_neardup", "id_a", "id_b")
  }

  test("d4 pair dedup shuffles ids only, never the signature arrays") {
    pairExchangesCarryNoArrays("d4_lsh_pairs", "doc_a", "doc_b")
  }
}
