package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-math hot path (SURVEY.md §4.2:
  * promote from higher-order functions to codegen'd Expressions on measured
  * need — the zip_with+aggregate folds are interpreted per element and
  * dominated the similarity benchmarks).
  *
  * Both expressions are strict left-to-right double folds, bit-identical to
  * the zip_with+aggregate formulation they replace and to DuckDB's
  * list_dot_product / list_reduce on DOUBLE[] — so oracle parity is
  * unchanged. Codegen emits a tight primitive loop inside WholeStageCodegen.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance, same fold discipline as [[ArrayDotProduct]]. */
case class ArraySquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_squared_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers (classic/non-Connect sessions). */
object VectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    Bridge.toColumn(ArrayDotProduct(
      Bridge.toExpression(a), Bridge.toExpression(b)))
  def squared_distance(a: Column, b: Column): Column =
    Bridge.toColumn(ArraySquaredDistance(
      Bridge.toExpression(a), Bridge.toExpression(b)))
}
