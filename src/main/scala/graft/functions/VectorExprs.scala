package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Single-pass vector kernels as custom Catalyst expressions.
  *
  * The composable `zip_with` + `aggregate` cosine in
  * `graft.pipeline.Similarity` is the semantic reference (kept as the
  * test oracle), but it materializes an intermediate product array and
  * dispatches an interpreted lambda per element — and a full cosine
  * needs three such trees (dot, |a|, |b|). `CosineSimExpr` computes all
  * three accumulators in ONE loop over the raw `ArrayData` with zero
  * allocations per row. Element types float and double are both read
  * natively (no upfront array cast/copy).
  */
object VectorExprs {

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimExpr(ExpressionUtils.expression(a),
                    ExpressionUtils.expression(b)))
}

/** cosine(a, b) = dot/(|a||b|), 0.0 when either norm is 0 or any element
  * is null (a null element nulls that side's norm, so the HOF
  * `when(na > 0 && nb > 0, ...)` predicate falls to `otherwise(0.0)`),
  * null on length mismatch (zip_with null-pads, nulling the product
  * while both norms stay defined).
  */
final case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"graft_cosine expects array<float|double>, got $t")
  }

  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val na = aa.numElements()
    val nb = bb.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < na) {
      if (aa.isNullAt(i)) return 0.0
      val x = if (leftFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      sa += x * x
      i += 1
    }
    i = 0
    while (i < nb) {
      if (bb.isNullAt(i)) return 0.0
      val y = if (rightFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      sb += y * y
      i += 1
    }
    if (na != nb) return null // zip_with null-padding -> null product
    i = 0
    while (i < n) {
      val x = if (leftFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rightFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      dot += x * y
      i += 1
    }
    val prod = math.sqrt(sa) * math.sqrt(sb)
    if (math.sqrt(sa) > 0 && math.sqrt(sb) > 0) dot / prod else 0.0
  }
}
