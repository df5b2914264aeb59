package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math — the hot scalar kernels
  * of the similarity/dedup operators, with real `doGenCode` so they stay
  * inside whole-stage codegen (SURVEY §4: prefer a native Expression over a
  * Scala UDF over anything else).
  *
  * Semantics contract (shared with the DuckDB oracles): strict
  * left-to-right double summation of `(double)a[i] * (double)b[i]` — the
  * same bits as the previous `dotUdf` loop and DuckDB's sequential
  * `list_sum(list_transform(...))`, so swapping these in changes no result
  * hashes. Compared to the alternatives: a Scala UDF deserializes both
  * arrays to `Seq[Float]` per call and breaks codegen; the
  * `aggregate(zip_with(...))` column form materializes an n-element struct
  * array per pair (measured: the entire runtime of brute-force similarity
  * at 2M pairs). These loops run on `ArrayData` in place, allocating
  * nothing.
  *
  * Null ELEMENTS inside an array contribute 0 to the sum — deliberately the
  * DuckDB `list_sum` semantics the oracles use (list_sum skips nulls, so a
  * null product is a 0 contribution), NOT Spark's null-propagating scalar
  * arithmetic. The contract is enforced with explicit `isNullAt` checks in
  * both eval and codegen (not by relying on any particular `ArrayData`
  * representation zeroing its null slots). A wholly-null array input still
  * yields null (nullSafeEval). */
object VecMath {

  /** Dot product of two float-array columns, computed in double. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product of a float-array column with a fixed weight vector (e.g.
    * an LSH hyperplane): the weights ride along as a compiled double[]
    * reference, not a Catalyst literal array — no per-row zip_with structs. */
  def vecDotConst(a: Column, weights: Array[Double]): Column =
    ColumnBridge.column(VecDotConst(ColumnBridge.expression(a), weights))

  /** Euclidean norm of a float-array column. */
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(a, a))
}

case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

case class VecDotConst(child: Expression, weights: Array[Double])
  extends UnaryExpression {

  // case-class equality on Array is reference identity, which would make
  // two semantically identical expressions unequal — defeating Catalyst
  // canonicalization/subexpression elimination and producing unstable
  // explain output (Similarity rebuilds the weight arrays per call)
  override def equals(other: Any): Boolean = other match {
    case VecDotConst(c, w) => c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_const"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), weights.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) s += x.getFloat(i).toDouble * weights(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${weights.length});
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $s += ((double) $a.getFloat($i)) * $w[$i];
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecDotConst =
    copy(child = newChild)
}
