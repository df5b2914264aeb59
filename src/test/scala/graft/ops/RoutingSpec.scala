package graft.ops

import graft.kernel.Router
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The routing/grounding column expressions must agree with the per-row
  * kernel functions on the complete mode matrix — the battery queries
  * (r1/r2) and their DuckDB oracles both lean on these expressions. */
class RoutingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("routeOf ≡ Router.optimalPromptMode on all format × quality combos") {
    import spark.implicits._
    val combos = for {
      f <- Routing.Formats
      q <- Routing.Qualities
    } yield (f, q)
    val got = combos.toDF("format", "quality")
      .withColumn("route", Routing.routeOf(col("format"), col("quality")))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
      .toMap
    combos.foreach { case (f, q) =>
      assert(got((f, q)) == Router.optimalPromptMode(f, q), s"combo $f/$q")
    }
  }

  test("groundingFailure ≡ Router.groundingOk on all mode × bbox classes") {
    import spark.implicits._
    val cases = for {
      m <- Router.PromptDict.keys.toSeq.sorted
      n <- Seq(0, 3, 4)
    } yield (m, n)
    val got = cases.toDF("mode", "bbox_len")
      .withColumn("fc", Routing.groundingFailure(col("mode"), col("bbox_len")))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getString(2)))
      .toMap
    cases.foreach { case (m, n) =>
      val bbox = if (n == 0) None else Some(Seq.fill(n)(1.0))
      val ok = Router.groundingOk(m, bbox)
      assert((got((m, n)) == "") == ok, s"case $m/$n")
      if (!ok) assert(got((m, n)) == "BBOX_REQUIRED")
    }
  }

  test("format derivation covers all 10 formats; only UNKNOWN is disallowed") {
    import spark.implicits._
    val rows = (0L until 30L).toDF("doc_id")
      .select(Routing.formatOf(col("doc_id")).as("format"),
        Routing.allowedOf(Routing.formatOf(col("doc_id"))).as("allowed"))
      .collect()
    assert(rows.map(_.getString(0)).toSet == Routing.Formats.toSet)
    rows.foreach { r =>
      assert(r.getBoolean(1) == (r.getString(0) != "UNKNOWN"), r.toString)
    }
  }
}
