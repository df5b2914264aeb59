package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-location: at warehouse scale the results and golden
  * tables are bucketed by doc_id so the verdict join needs NO exchange on
  * either side — asserted here on the physical plan, not assumed. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("doc_id-bucketed tables join without a shuffle") {
    import spark.implicits._
    val docs = ExtractionPipeline.synthDocs(spark, 60, seed = 17, parallelism = 2)
    val results = ExtractionPipeline.extract(docs)
      .select($"doc_id", $"n_spans", $"success")

    spark.sql("DROP TABLE IF EXISTS results_b")
    spark.sql("DROP TABLE IF EXISTS golden_b")
    // a fresh in-memory catalog can orphan warehouse dirs from a previous
    // JVM — clear them or CTAS refuses the location
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("results_b", "golden_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    results.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("results_b")
    results.select($"doc_id", $"n_spans".as("want_spans"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("golden_b")

    val joined = spark.table("results_b").join(spark.table("golden_b"), "doc_id")
      .filter($"n_spans" === $"want_spans")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + plan.take(1500))
    assert(joined.count() == 60)
  }
}
