package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * The composable forms — `aggregate(zip_with(...))` (interpreted
  * higher-order functions) or an unrolled per-index sum (64 GetArrayItems
  * with per-element null checks) — both carry per-element overhead. This
  * is the textbook case for the brief's extension ladder step (b): a
  * scalar `Expression` with `doGenCode` emitting one tight primitive
  * loop over the underlying ArrayData.
  *
  * Accumulation order is ascending-index, identical to a sequential left
  * fold, so results are bit-identical to the composed forms (and to
  * DuckDB's list_dot_product) — required by the hash-compare gate.
  * A NULL input or a null array element yields NULL (built-in array
  * function semantics); lengths may differ, the shorter prefix is used.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_d expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"
  // NULL inputs AND null array elements produce NULL — must be declared
  // even when the child arrays are non-nullable, or codegen would plant
  // `${ev.isNull} = true` into a FalseLiteral slot
  override def nullable: Boolean = true

  // A NULL array element makes the whole result NULL (the semantics of
  // Spark's built-in array functions) — dot_d is SQL-exposed via
  // GraftExtensions, so arbitrary arrays can reach it.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  /** Column-level entry point: `dotD($"a", $"b")`. */
  def dotD(a: Column, b: Column): Column =
    SqlShim.column(DotProductD(SqlShim.expression(a), SqlShim.expression(b)))
}
