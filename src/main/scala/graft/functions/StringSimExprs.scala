package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels as custom Catalyst expressions — the
  * fuzzy-scoring family Spark's built-ins lack (`levenshtein` is the
  * only distance shipped). Same discipline as [[TextHashExprs]]:
  * one JIT-compiled pass per row, zero per-row allocations beyond the
  * two flag arrays, interchangeable with the SQL oracle's arithmetic.
  */
object StringSimExprs {

  /** Jaro-Winkler similarity in [0, 1] — the standard ER name-match
    * score (Winkler 1990): Jaro similarity
    * `(m/|a| + m/|b| + (m-t)/m) / 3` over window-bounded character
    * matches (window `max(|a|,|b|)/2 - 1`, transpositions = half the
    * out-of-order matched pairs), plus the Winkler common-prefix boost
    * `j + l * 0.1 * (1 - j)` (prefix capped at 4) applied only when
    * `j > 0.7` — the same variant DuckDB's
    * `jaro_winkler_similarity` implements, verified value-equal on
    * the textbook pairs (martha/marhta 0.9611..., dixon/dicksonx
    * 0.8133...), so oracles replay it directly. Matching is over
    * Unicode code points.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinklerExpr(ExpressionUtils.expression(a),
                      ExpressionUtils.expression(b)))
}

final case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)

  /** Kernel entry for generated code. */
  def kernel(a: UTF8String, b: UTF8String): Double =
    nullSafeEval(a, b).asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jwExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
                    (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = TextHashExprs.codePoints(l.asInstanceOf[UTF8String].toString)
    val b = TextHashExprs.codePoints(r.asInstanceOf[UTF8String].toString)
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched characters compared in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var pfx = 0
    val maxPfx = math.min(4, math.min(la, lb))
    while (pfx < maxPfx && a(pfx) == b(pfx)) pfx += 1
    jaro + pfx * 0.1 * (1.0 - jaro)
  }
}
