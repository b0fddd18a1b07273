package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.Prebinning
import graft.operators.{BinningConfig, ClassTotals, FittedOptimalBinning,
  OptimalBinning, Preprocess, SpecialList}

/** Input row for the sketch aggregate (x nullable for missing). */
final case class SketchInput(x: Option[Double], y: Double)

/** Keyed input row for the grouped one-scan multi-batch add. */
final case class KeyedSketchInput(g: Long, x: Option[Double], y: Double)

/** Spark typed aggregate wrapping [[BSketch]]: partial aggregation = `add`
  * per partition, merge = sketch merge — the engine's one genuinely custom
  * aggregate physical operator (SURVEY §2.10), equivalent to the
  * reference's documented `mapPartitions(add) -> treeReduce(merge)`
  * PySpark pattern (`doc/source/tutorials/tutorial_sketch_binary_pyspark
  * .rst:27-52`) but expressed as a DataFrame aggregate so it composes with
  * groupBy (per-variable sketches) and Structured Streaming.
  */
final class BSketchAggregator(eps: Double, specialCodes: Array[Double],
                              sketchType: String = "gk")
    extends Aggregator[SketchInput, BSketch, BSketch] {
  override def zero: BSketch = new BSketch(eps, specialCodes, sketchType)
  override def reduce(b: BSketch, in: SketchInput): BSketch = {
    b.add(in.x.map(java.lang.Double.valueOf).orNull, in.y)
    b
  }
  override def merge(a: BSketch, b: BSketch): BSketch = { a.merge(b); a }
  override def finish(b: BSketch): BSketch = b
  override def bufferEncoder: Encoder[BSketch] = Encoders.kryo[BSketch]
  override def outputEncoder: Encoder[BSketch] = Encoders.kryo[BSketch]
}

/** Streaming/mergeable optimal binning
  * (`optbinning/binning/distributed/binning_sketch.py:224`): accumulate a
  * BSketch over batches or micro-batches, then solve on the driver — the
  * solve consumes only sketch entries, so results are identical whether
  * the data arrived in one batch or many (order-insensitive mergeable
  * state; no watermarking needed).
  */
object OptimalBinningSketch {
  /** One row of the solve trajectory (`binning_sketch.py:956-961`). */
  final case class SolveStat(nAdd: Long, nRecords: Long,
                             divergence: Double)
}

final class OptimalBinningSketch(
    val config: BinningConfig = BinningConfig(),
    val eps: Double = 1e-4,
    val sketchType: String = "gk") extends Serializable {

  private val specials: Array[Double] = config.specialCodes match {
    case None                  => Array.empty[Double]
    case Some(SpecialList(vs)) => vs.map(_.toString.toDouble).toArray
    case Some(other) => throw new IllegalArgumentException(
      "OptimalBinningSketch supports only a flat special-code list " +
      s"(SpecialList) or none; got $other — grouped special codes need " +
      "the batch fit, which bins each group separately (silently " +
      "treating them as clean values would corrupt the clean bins)")
  }

  private var _sketch: BSketch = new BSketch(eps, specials, sketchType)

  private var _nAdd = 0L
  private val _solveStats =
    scala.collection.mutable.ArrayBuffer.empty[OptimalBinningSketch.SolveStat]

  def sketch: BSketch = _sketch

  /** Per-solve streaming statistics (`binning_sketch.py:944-961`
    * `_update_streaming_stats` / `plots.py` progress trajectory): one
    * entry per solve() with the add-count, record-count, and the solved
    * table's divergence (config.divergence measure). */
  def solveStats: Seq[OptimalBinningSketch.SolveStat] = _solveStats.toSeq

  /** Add a batch DataFrame (xCol, yCol) into the sketch via the typed
    * aggregate (one job, partial agg per partition). */
  def add(df: DataFrame, xCol: String, yCol: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new BSketchAggregator(eps, specials, sketchType)
    val batchSketch = df
      .select(col(xCol).cast("double").as("x"),
              col(yCol).cast("double").as("y"))
      .as[SketchInput]
      .select(agg.toColumn.name("sketch"))
      .head()
    _sketch.merge(batchSketch)
    _nAdd += 1
  }

  /** Merge another OptimalBinningSketch (cross-node/stream merge). */
  def merge(other: OptimalBinningSketch): Unit = _sketch.merge(other._sketch)

  /** One-scan multi-batch add: builds an independent BSketch per
    * `groupExpr` value (one grouped-aggregate job) and merges them in
    * ascending group order — ONE data pass where sequential add() calls
    * would each rescan. Totals/missing/special counters end identical
    * to per-group sequential adds; the GK entry set may differ in which
    * (valid) summary it keeps, since compression cadence depends on the
    * partial-merge structure — quantiles stay within eps either way. */
  def addGrouped(df: DataFrame, groupExpr: org.apache.spark.sql.Column,
                 xCol: String, yCol: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new BSketchAggregator(eps, specials, sketchType)
    val parts = df
      .select(groupExpr.cast("long").as("g"),
              col(xCol).cast("double").as("x"),
              col(yCol).cast("double").as("y"))
      .as[KeyedSketchInput]
      .groupByKey(_.g)
      .mapValues(r => SketchInput(r.x, r.y))
      .agg(agg.toColumn.name("sketch"))
      .collect()
    parts.sortBy(_._1).foreach { case (_, s) =>
      _sketch.merge(s)
      _nAdd += 1
    }
  }

  /** Merge a raw BSketch (used by the multi-variable process sketch). */
  def mergeSketch(other: BSketch): Unit = _sketch.merge(other)

  /** Solve the optimal binning from the current sketch state
    * (`binning_sketch.py:570-647`): equi-quantile candidate splits from
    * the combined sketch, sketch-based prebin counts, then the standard
    * driver solve.
    */
  def solve(): FittedOptimalBinning = {
    val all = _sketch.mergedSketch
    // user splits replace the equi-quantile candidate generation, same
    // as the batch fit (`binning.py:1048-1054` user_splits branch):
    // the sketch then only supplies the per-bin counts
    val splits: Array[Double] = config.userSplits match {
      case Some(us) => us.sorted
      case None =>
        if (all.n == 0) Array.empty
        else (1 until config.maxNPrebins)
          .map(i => all.quantile(i.toDouble / config.maxNPrebins))
          .distinct.sorted.toArray
    }

    // class indices follow Preprocess.rowClass: special groups (if any)
    // then missing
    val missingIdx = Preprocess.missingClassIndex(config.specialCodes)
    val specialTotals = ClassTotals(
      _sketch.countSpecialNe.toDouble, _sketch.countSpecialE.toDouble,
      _sketch.countSpecialNe + _sketch.countSpecialE,
      (_sketch.countSpecialNe + _sketch.countSpecialE).toDouble)
    val missingTotals = ClassTotals(
      _sketch.countMissingNe.toDouble, _sketch.countMissingE.toDouble,
      _sketch.countMissingNe + _sketch.countMissingE,
      (_sketch.countMissingNe + _sketch.countMissingE).toDouble)
    val totals = Map(
      Preprocess.CleanClass -> ClassTotals(
        _sketch.nNonevent.toDouble, _sketch.nEvent.toDouble,
        _sketch.n, _sketch.n.toDouble),
      missingIdx -> missingTotals) ++
      (if (config.specialCodes.isDefined) Map(1 -> specialTotals)
       else Map.empty)
    val nSamples = _sketch.n + _sketch.countMissingE +
      _sketch.countMissingNe + _sketch.countSpecialE +
      _sketch.countSpecialNe

    val fitted = OptimalBinning.fitFromCounts(
      splits,
      s => { val (e, ne) = _sketch.bins(s); (ne, e) },
      totals, nSamples.toDouble, config,
      categories = null, catOthers = null)
    val dv = config.divergence match {
      case "js"         => fitted.table.js
      case "hellinger"  => fitted.table.hellinger
      case "triangular" => fitted.table.triangular
      case _            => fitted.table.iv
    }
    _solveStats += OptimalBinningSketch.SolveStat(_nAdd, nSamples, dv)
    fitted
  }

  /** Structured Streaming mode: accumulate per micro-batch and re-solve at
    * every trigger (`foreachBatch`; solve cost is driver-side ms). Caller
    * starts/stops the returned query.
    */
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
}
