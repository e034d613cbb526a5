package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen vector kernels (SURVEY.md §2.11: "custom Catalyst
  * `Expression` beats a Scala UDF"): tight primitive loops over ArrayData
  * with `doGenCode`, no per-element lambda dispatch — ~10× over the
  * interpreted zip_with/aggregate composition on the all-pairs similarity
  * hot path, and they keep the surrounding operators inside one codegen
  * stage.
  *
  * Accumulation is sequential left-to-right in double precision — bit-for-bit
  * the same result the higher-order-function formulation produces, so the
  * DuckDB oracle parity is unchanged.
  */
abstract class VectorBinaryKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"expected float/double array, got $t")
  }

  protected def getter(isFloat: Boolean, arr: String, i: String): String =
    if (isFloat) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def get(isFloat: Boolean, arr: ArrayData, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** Σ aᵢ·bᵢ (lengths truncated to the shorter operand). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryKernel {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(lf, x, i) * get(rf, y, i); i += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(lf, a, i)} * ${getter(rf, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Σ (aᵢ−bᵢ)² */
case class SqDist(left: Expression, right: Expression) extends VectorBinaryKernel {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = get(lf, x, i) - get(rf, y, i); s += d * d; i += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(lf, a, i)} - ${getter(rf, b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDist =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def vec_sqdist(a: Column, b: Column): Column = column(SqDist(expression(a), expression(b)))
}
