package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) clustering key: interleaves the low `bits` bits of
  * two non-negative integer columns — x on even positions, y on odd —
  * so lexicographic order on the key approximates locality on the 2D
  * plane. Sorting a table by this key before writing clusters rows so
  * that BOTH columns' parquet row-group min/max ranges stay tight: a
  * 2D range predicate then skips most row groups, where sorting by
  * either single column leaves the other's ranges spanning everything.
  * The layout lever behind Delta/Iceberg OPTIMIZE ZORDER, as a plain
  * codegen'd expression.
  *
  * Inputs coerce with `pmod(x, 2^bits)` upstream if they can exceed
  * the bit budget; here values are masked, so out-of-range inputs
  * fold deterministically rather than erroring. Null if either side
  * is null. `bits <= 32` (the interleaved key must fit a long).
  */
object ZOrderExpr {
  def zorder(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(
      ZOrder2Expr(ExpressionUtils.expression(x.cast("long")),
                  ExpressionUtils.expression(y.cast("long")), bits))
}

final case class ZOrder2Expr(left: Expression, right: Expression,
                             bits: Int)
  extends BinaryExpression {

  require(bits > 0 && bits <= 32, s"bits must be in [1, 32]; got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[Long]
    val b = y.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >>> $i) & 1L) << (2 * $i);
         |  $z |= (($b >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2Expr =
    copy(left = newLeft, right = newRight)
}
