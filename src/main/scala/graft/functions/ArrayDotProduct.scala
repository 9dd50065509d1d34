package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential-fold dot product over two `array<double>` columns.
  *
  * The similarity-search hot kernel. The composable form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is semantically identical
  * but Spark evaluates higher-order-function lambdas interpreted, outside
  * whole-stage codegen — measured 35× slower on the all-pairs workload.
  * This expression generates a tight primitive loop instead, with the SAME
  * ascending-index fold order, so results are bit-identical to the HOF
  * form (and to the DuckDB oracle).
  *
  * Null elements inside the arrays are treated as 0 contribution is NOT
  * supported — callers guarantee dense embeddings (cast from parquet
  * `list<float>`, which this corpus never nulls element-wise).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  /** SQL-registered, so un-cast arguments must FAIL analysis: reading
    * float-array storage through `getDouble` would return garbage, not
    * error. Callers cast (`CAST(embedding AS ARRAY<DOUBLE>)`). */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def apply(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
