package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Bounded top-k as a native aggregate.
  *
  * The textbook DataFrame top-k-per-group — `row_number` over
  * `Window.partitionBy(group)` then `filter(rn <= k)` — shuffles EVERY
  * row to its group's task and sorts the whole group there; a
  * mega-group (one language holding half a 100 TB corpus) lands on one
  * task's external sort. This aggregate keeps O(k) state per group and
  * combines map-side like any partial aggregate, so the shuffle carries
  * at most `k` (sortKey, id) pairs per group per map task — group skew
  * becomes irrelevant and no full sort ever happens.
  *
  * Ordering is integer-exact and total: sortKey DESC, id ASC on ties —
  * the same `ORDER BY` replays in ANSI SQL, so results hash-match a
  * `row_number` oracle. Null sortKey/id rows are ignored (SQL window
  * replays exclude them explicitly).
  */
object TopKAgg {

  /** `array<struct<key:long, id:long>>` of the k largest keys in the
    * group, ordered (key desc, id asc); ties beyond position k drop
    * the larger id, deterministically.
    *
    * SET semantics: an exact (key, id) duplicate is held ONCE (what
    * lets KMV sketches fold raw multiplicity-carrying streams). A
    * caller whose oracle is a row_number window — which ranks
    * duplicate rows separately — must therefore feed ids that are
    * unique per row, or the two sides diverge on repeated
    * (key, id) pairs. */
  def topkLongs(sortKey: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKLongsAgg(ExpressionUtils.expression(sortKey),
                   ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}

/** Fixed-capacity buffer: parallel arrays kept sorted by
  * (key desc, id asc), size ≤ k. Insert is O(k) array shift — k is
  * single-digit in practice, far below heap-management constants. */
final class TopKBuffer(val k: Int) extends Serializable {
  val keys = new Array[Long](k)
  val ids = new Array[Long](k)
  var n = 0

  def insert(key: Long, id: Long): Unit = {
    // find the insert position first (no mutation), so an exact
    // (key, id) duplicate can be rejected — set semantics, which lets
    // callers fold raw multiplicity-carrying streams (e.g. KMV hash
    // sketches) without a pre-distinct pass
    var i = n
    while (i > 0 &&
           (keys(i - 1) < key || (keys(i - 1) == key && ids(i - 1) > id))) {
      i -= 1
    }
    if (i > 0 && keys(i - 1) == key && ids(i - 1) == id) return // held
    if (i == k) return // sorts below a full buffer's tail
    if (n == k) n -= 1 // evict the tail
    var j = n
    while (j > i) { keys(j) = keys(j - 1); ids(j) = ids(j - 1); j -= 1 }
    keys(i) = key; ids(i) = id; n += 1
  }

  def merge_(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.keys(i), o.ids(i)); i += 1 }
  }
}

final case class TopKLongsAgg(
    keyExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive; got $k")

  override def children: Seq[Expression] = Seq(keyExpr, idExpr)
  // SQL callers can pass narrower integers; the analyzer widens them
  // to LONG instead of letting update() cast-crash at runtime.
  // (Return type inferred: AbstractDataType is private[sql], but the
  // covariant Seq[LongType.type] conforms without naming it.)
  override def inputTypes = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("key", LongType, nullable = false)
                    .add("id", LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "topk_longs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = keyExpr.eval(input)
    val iv = idExpr.eval(input)
    if (kv != null && iv != null)
      b.insert(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.merge_(o)
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { rows(i) = InternalRow(b.keys(i), b.ids(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k); bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.keys(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.keys(i) = bb.getLong; buf.ids(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongsAgg =
    copy(keyExpr = newChildren(0), idExpr = newChildren(1))
}
