package graft.functions

import graft.ops.Similarity
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen expressions must be bit-identical to the reference
  * forms they replace (the strict left-to-right double sum every DuckDB
  * oracle embeds) — not just close: the similarity thresholds compare
  * exact doubles. */
class VecMathSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("VecDot ≡ dotUdf bit-for-bit on random vectors (interpreted + codegen paths)") {
    import spark.implicits._
    val df = randomVecs(200, 64, seed = 11).toDF("id", "a")
      .withColumn("b", reverse(col("a")))
    val rows = df.select(
      VecMath.vecDot(col("a"), col("b")).as("native"),
      Similarity.dotUdf(col("a"), col("b")).as("udf"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "native vs udf")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), "native vs zip_with")
    }
  }

  test("VecDotConst ≡ the zip_with-literal form it replaced in lshBucket") {
    import spark.implicits._
    val plane = Similarity.hyperplanes(1, 64, seed = 42)(0)
    val df = randomVecs(200, 64, seed = 12).toDF("id", "a")
    val rows = df.select(
      VecMath.vecDotConst(col("a"), plane).as("native"),
      aggregate(zip_with(col("a"), lit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("nulls propagate; mismatched lengths use the shorter prefix; wrong type fails analysis") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (2L, Seq(1f, 2f), Seq(10f, 10f, 10f))).toDF("id", "a", "b")
      .union(Seq((3L, null.asInstanceOf[Seq[Float]], Seq(1f))).toDF("id", "a", "b"))
    val got = df.select(col("id"), VecMath.vecDot(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 32.0)
    assert(got(2L) == 30.0, "shorter-prefix semantics (same as dotUdf/min-length)")
    assert(got(3L) == null, "null array -> null result")
    val err = intercept[Exception] {
      Seq((1L, "nope")).toDF("id", "a")
        .select(VecMath.vecDot(col("a"), col("a"))).collect()
    }
    assert(err.getMessage.contains("vec_dot") || err.getMessage.contains("DATATYPE"),
      err.getMessage.take(200))
  }

  test("null array ELEMENTS contribute 0 (DuckDB list_sum semantics); equal expressions compare equal") {
    import spark.implicits._
    // array<float> with a null element: (1*2) + (null→0) = 2.0, matching
    // the oracles' list_sum-skips-nulls behavior
    val df = spark.sql("SELECT array(cast(1.0 as float), cast(null as float)) AS a, " +
      "array(cast(2.0 as float), cast(3.0 as float)) AS b")
    assert(df.select(VecMath.vecDot($"a", $"b")).collect()(0).getDouble(0) == 2.0)
    // same contract through the CODEGEN path: a parquet round-trip gives a
    // containsNull=true UnsafeArrayData with a real null bitmap (the local
    // relation above may fold through interpreted eval)
    val dir = java.nio.file.Files.createTempDirectory("graft_vecmath_null").toString
    df.write.mode("overwrite").parquet(dir)
    val rt = spark.read.parquet(dir)
    assert(rt.select(VecMath.vecDot($"a", $"b")).collect()(0).getDouble(0) == 2.0)
    assert(rt.select(VecMath.vecDotConst($"a", Array(2.0, 5.0)))
      .collect()(0).getDouble(0) == 2.0, "VecDotConst skips null elements too")
    // VecDotConst equality is value-based despite the Array field — two
    // independently built weight arrays must canonicalize equal
    val w1 = Array(1.0, 2.0, 3.0)
    val w2 = Array(1.0, 2.0, 3.0)
    val c = org.apache.spark.sql.graft.ColumnBridge.expression(
      org.apache.spark.sql.functions.col("a"))
    assert(VecDotConst(c, w1) == VecDotConst(c, w2))
    assert(VecDotConst(c, w1).hashCode == VecDotConst(c, w2).hashCode)
    assert(VecDotConst(c, w1) != VecDotConst(c, Array(9.0)))
  }

  test("expressions run inside whole-stage codegen (no fallback in the plan)") {
    import spark.implicits._
    // a parquet round-trip gives a real scan (ConvertToLocalRelation would
    // otherwise fold the whole query), so the filter actually codegens
    val dir = java.nio.file.Files.createTempDirectory("graft_vecmath").toString
    randomVecs(50, 64, seed = 13).toDF("id", "a")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(VecMath.vecDot(col("a"), col("a")) > lit(0.0))
    assert(df.count() == 50) // norms are positive; executes through codegen
    // "*(1) Filter (vec_dot(...))" — the * prefix is the WholeStageCodegen
    // marker: the filter containing our expression compiled into stage 1
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter (vec_dot("), plan.take(800))
    assert(!plan.contains("CodegenFallback"), plan.take(800))
  }
}
