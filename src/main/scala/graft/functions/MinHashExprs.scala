package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-permutation-hashing minhash slots as ONE codegen pass over the
  * shingle-hash array — the kernel replacement for the
  * `transform(sequence(0, k-1), j -> array_min(filter(h, pmod==j)))`
  * formulation, which evaluates k interpreted filter+min passes over
  * the array PER DOCUMENT (O(k·n) boxed lambda calls; ~30x the
  * necessary per-doc work at k = 32).
  *
  * Semantics are value-identical to the expression form: slot j holds
  * the minimum hash with `pmod(hash, k) == j`; empty slots densify to
  * the array's global minimum; null elements are skipped exactly as
  * `filter`/`array_min` skip them; an empty (or all-null) input yields
  * k null slots, as `coalesce(array_min(filter(..)), array_min(empty))`
  * did.
  */
object MinHashExprs {
  def minhashSlots(hashArr: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSlotsExpr(ExpressionUtils.expression(hashArr), k))
}

final case class MinHashSlotsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1; got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_slots"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array of LONG; got $t")
    }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSlotsExpr = copy(child = newChild)

  /** Kernel entry for generated code. */
  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    val has = new Array[Boolean](k)
    var globalMin = Long.MaxValue
    var hasAny = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        // pmod(h, k): Spark's positive modulus for a positive k
        val m = h % k
        val slot = (if (m < 0) m + k else m).toInt
        if (!has(slot) || h < mins(slot)) { mins(slot) = h; has(slot) = true }
        if (!hasAny || h < globalMin) { globalMin = h; hasAny = true }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) =
        if (has(j)) java.lang.Long.valueOf(mins(j))
        else if (hasAny) java.lang.Long.valueOf(globalMin)
        else null
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])
}
