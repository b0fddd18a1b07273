package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Misra-Gries heavy-hitter candidates as a native aggregate.
  *
  * Exact per-key counting of a frequency question ("which keys exceed
  * θ of the group?") shuffles every distinct key; at 100 TB the
  * distinct-key set IS the data. Misra-Gries keeps a fixed `capacity`
  * counters per group with the classic guarantee
  * `true − est ≤ n/(capacity+1)` (est never exceeds true), so every
  * key with frequency above `n/(capacity+1)` is guaranteed present —
  * a SUPERSET of the θ-heavy keys whenever `capacity + 1 > 1/θ`. The
  * intended production shape is sketch-routes/exact-verifies (the
  * [[graft.pipeline.Dedup]] Bloom pattern): explode the candidate
  * set, semi-join the corpus down to candidate rows only, count those
  * exactly, and keep `count·k > n` — the RESULT is exact, the sketch
  * only bounds what the exact pass must touch (≤ capacity keys per
  * group instead of all of them).
  *
  * Merging uses the mergeable-summaries rule (Agarwal et al., PODS
  * 2012): sum counters keywise, then subtract the (capacity+1)-th
  * largest count from all and drop non-positives — error bounds add
  * across partials, so the map-side-combined result keeps the
  * guarantee. Output is `array<struct<key, est>>` ordered
  * (est desc, key asc) — deterministic for a fixed partitioning, but
  * `est` values are partitioning-dependent (only the superset
  * property is portable: never hash-oracle the raw sketch, oracle the
  * exact verify pass downstream). Null keys are ignored.
  */
object FreqAgg {

  /** Heavy-hitter candidate set of `key` with `capacity` counters. */
  def freqLongs(key: Column, capacity: Int): Column =
    ExpressionUtils.column(
      FreqLongsAgg(ExpressionUtils.expression(key), capacity)
        .toAggregateExpression())
}

/** Counter map, size ≤ cap. The decrement-all overflow step is O(cap)
  * but amortized O(1) per insert (each decrement pays back a prior
  * increment). */
final class FreqBuffer(val cap: Int) extends Serializable {
  val m = new mutable.LongMap[Long](initialBufferSize = 16)

  def insert(key: Long): Unit = {
    val cur = m.getOrElse(key, 0L)
    if (cur > 0L) m.update(key, cur + 1L)
    else if (m.size < cap) m.update(key, 1L)
    else {
      // decrement every counter; evict zeros (the classic MG step)
      val dead = mutable.ArrayBuffer.empty[Long]
      m.foreachEntry { (k, v) =>
        if (v <= 1L) dead += k else m.update(k, v - 1L) }
      dead.foreach(m.remove)
    }
  }

  def merge_(o: FreqBuffer): Unit = {
    o.m.foreachEntry { (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
    if (m.size > cap) {
      // subtract the (cap+1)-th largest count, drop non-positives
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - cap - 1)
      val dead = mutable.ArrayBuffer.empty[Long]
      m.foreachEntry { (k, v) =>
        if (v <= d) dead += k else m.update(k, v - d) }
      dead.foreach(m.remove)
    }
  }
}

final case class FreqLongsAgg(
    keyExpr: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] with ImplicitCastInputTypes {

  require(cap > 0, s"capacity must be positive; got $cap")

  override def children: Seq[Expression] = Seq(keyExpr)
  override def inputTypes = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("key", LongType, nullable = false)
                    .add("est", LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "freq_longs"

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(cap)

  override def update(b: FreqBuffer, input: InternalRow): FreqBuffer = {
    val kv = keyExpr.eval(input)
    if (kv != null) b.insert(kv.asInstanceOf[Long])
    b
  }

  override def merge(b: FreqBuffer, o: FreqBuffer): FreqBuffer = {
    b.merge_(o)
    b
  }

  override def eval(b: FreqBuffer): Any = {
    val entries = b.m.toArray.sortBy { case (k, v) => (-v, k) }
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(entries(i)._1, entries(i)._2); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: FreqBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.m.size)
    bb.putInt(b.cap); bb.putInt(b.m.size)
    b.m.foreachEntry { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.m.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqLongsAgg =
    copy(keyExpr = newChildren(0))
}
