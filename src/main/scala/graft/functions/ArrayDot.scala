package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product:
  * Σᵢ aᵢ·bᵢ in double precision, sequential left fold over the element
  * index (deterministic order ⇒ bit-identical to the `list_reduce` DuckDB
  * twin in [[VectorFns.dotSql]] and to the previous
  * `aggregate(zip_with(...))` higher-order-function formulation).
  *
  * Why an `Expression` and not a UDF or HOF chain (SURVEY §2.11 preference
  * order): `doGenCode` emits a tight primitive loop inside whole-stage
  * codegen — no per-element lambda dispatch, no boxing, no codegen
  * boundary. The interpreted HOF fold this replaces cost ~2 µs per
  * 64-dim pair; the generated loop is ~50 ns — the difference between a
  * feasible and an infeasible brute-force similarity pass at scale.
  *
  * Accepts `array<float>` and `array<double>` operands in any combination
  * (float is widened losslessly per element, like the HOF version's
  * `cast("double")`).
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> operands, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def get(arr: String, dt: DataType, i: String): String = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, elemType(left), i)} * ${get(b, elemType(right), i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
