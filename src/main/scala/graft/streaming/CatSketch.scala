package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.operators.{BinningConfig, FittedOptimalBinning, OptimalBinning,
  Preprocess, SpecialList}

/** Mergeable categorical sketch (`bsketch.py:271-455` `BCatSketch`):
  * exact per-category event/nonevent counts plus missing/special
  * counters. The reference keeps these exact too — categorical
  * cardinality is bounded in practice, so the "sketch" is a counter map
  * and merge is counter addition (commutative monoid; order-insensitive
  * like the numeric GK sketch).
  */
final class CatSketch(val specialCodes: Array[String]) extends Serializable {

  // category -> (n, w0, w1)
  val counts: mutable.HashMap[String, (Long, Double, Double)] =
    mutable.HashMap.empty
  var missingNe: Long = 0L
  var missingE: Long = 0L
  var specialNe: Long = 0L
  var specialE: Long = 0L

  @transient private lazy val specialSet = specialCodes.toSet

  def add(x: String, y: Double): Unit = {
    if (x == null) {
      if (y == 0.0) missingNe += 1 else missingE += 1
    } else if (specialSet.contains(x)) {
      if (y == 0.0) specialNe += 1 else specialE += 1
    } else {
      val (n, w0, w1) = counts.getOrElse(x, (0L, 0.0, 0.0))
      counts(x) =
        if (y == 0.0) (n + 1, w0 + 1.0, w1) else (n + 1, w0, w1 + 1.0)
    }
  }

  def merge(o: CatSketch): Unit = {
    o.counts.foreach { case (c, (n, w0, w1)) =>
      val (n0, a0, a1) = counts.getOrElse(c, (0L, 0.0, 0.0))
      counts(c) = (n0 + n, a0 + w0, a1 + w1)
    }
    missingNe += o.missingNe; missingE += o.missingE
    specialNe += o.specialNe; specialE += o.specialE
  }

  def n: Long = counts.valuesIterator.map(_._1).sum
}

/** Input row for the categorical sketch aggregate. */
final case class CatSketchInput(x: Option[String], y: Double)

/** Keyed input row for the grouped one-scan multi-batch add. */
final case class KeyedCatSketchInput(g: Long, x: Option[String], y: Double)

final class CatSketchAggregator(specialCodes: Array[String])
    extends Aggregator[CatSketchInput, CatSketch, CatSketch] {
  override def zero: CatSketch = new CatSketch(specialCodes)
  override def reduce(b: CatSketch, in: CatSketchInput): CatSketch = {
    b.add(in.x.orNull, in.y); b
  }
  override def merge(a: CatSketch, b: CatSketch): CatSketch = {
    a.merge(b); a
  }
  override def finish(b: CatSketch): CatSketch = b
  override def bufferEncoder: Encoder[CatSketch] = Encoders.kryo[CatSketch]
  override def outputEncoder: Encoder[CatSketch] = Encoders.kryo[CatSketch]
}

/** Streaming/mergeable categorical optimal binning — the categorical
  * dtype of `OptimalBinningSketch` (`binning_sketch.py:224` with
  * `dtype="categorical"`, `_compute_cat_prebins binning_sketch.py:
  * 763-806`): accumulate exact category counts over batches or
  * micro-batches, then run the SAME driver categorical phase as the
  * batch fit (cutoff -> others, event-rate ordinalization, DP solve) —
  * so a converged stream solve equals the batch fit exactly.
  */
final class OptimalBinningCatSketch(
    val config: BinningConfig = BinningConfig(dtype = "categorical"))
    extends Serializable {

  private val specials: Array[String] = config.specialCodes match {
    case None                  => Array.empty[String]
    case Some(SpecialList(vs)) => vs.map(_.toString).toArray
    case Some(other) => throw new IllegalArgumentException(
      "OptimalBinningCatSketch supports only a flat special-code list " +
      s"(SpecialList) or none; got $other — grouped special codes need " +
      "the batch categorical fit, which bins each group separately")
  }

  private var _sketch: CatSketch = new CatSketch(specials)
  def sketch: CatSketch = _sketch

  /** Add a batch DataFrame (xCol string, yCol binary) via the typed
    * aggregate (partial add per partition, merge across). */
  def add(df: DataFrame, xCol: String, yCol: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new CatSketchAggregator(specials)
    val batch = df
      .select(col(xCol).cast("string").as("x"),
              col(yCol).cast("double").as("y"))
      .as[CatSketchInput]
      .select(agg.toColumn.name("sketch"))
      .head()
    _sketch.merge(batch)
  }

  def merge(other: OptimalBinningCatSketch): Unit =
    _sketch.merge(other._sketch)

  /** One-scan multi-batch add: builds an independent CatSketch per
    * `groupExpr` value (one grouped-aggregate job) and merges them in
    * ascending group order. Counter addition is commutative, so the
    * final state is IDENTICAL to one add() per group — at ONE data pass
    * instead of one per batch. */
  def addGrouped(df: DataFrame, groupExpr: org.apache.spark.sql.Column,
                 xCol: String, yCol: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new CatSketchAggregator(specials)
    val parts = df
      .select(groupExpr.cast("long").as("g"),
              col(xCol).cast("string").as("x"),
              col(yCol).cast("double").as("y"))
      .as[KeyedCatSketchInput]
      .groupByKey(_.g)
      .mapValues(r => CatSketchInput(r.x, r.y))
      .agg(agg.toColumn.name("sketch"))
      .collect()
    parts.sortBy(_._1).foreach { case (_, s) => _sketch.merge(s) }
  }

  /** Structured Streaming mode: accumulate per micro-batch and re-solve
    * at every trigger (`foreachBatch`, like the numeric sketch). Caller
    * starts/stops the returned query. */
  def streamingQuery(stream: DataFrame, xCol: String, yCol: String,
                     onSolve: FittedOptimalBinning => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        add(batch, xCol, yCol)
        onSolve(solve())
    }
  }

  /** Solve from current state: identical driver path to the batch
    * categorical fit, so stream == batch at every solve point. */
  def solve(): FittedOptimalBinning = {
    val missingIdx = Preprocess.missingClassIndex(config.specialCodes)
    val clean = _sketch.counts.toArray.sortBy(_._1).map {
      case (c, (n, w0, w1)) =>
        OptimalBinning.CatCountRow(Preprocess.CleanClass, c, n, w0, w1)
    }
    val extra = Array(
      OptimalBinning.CatCountRow(missingIdx, "",
        _sketch.missingNe + _sketch.missingE,
        _sketch.missingNe.toDouble, _sketch.missingE.toDouble)) ++
      (if (config.specialCodes.isDefined)
         Array(OptimalBinning.CatCountRow(1, "",
           _sketch.specialNe + _sketch.specialE,
           _sketch.specialNe.toDouble, _sketch.specialE.toDouble))
       else Array.empty[OptimalBinning.CatCountRow])
    OptimalBinning.fitCategoricalFromCounts(clean ++ extra, config)
  }
}
