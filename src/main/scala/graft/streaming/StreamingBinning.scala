package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators._

/** Stateful Structured Streaming binning: `flatMapGroupsWithState` keyed
  * by variable name, state = one mergeable [[BSketch]] per variable
  * (SURVEY §2.10's second streaming vehicle, complementing the
  * `foreachBatch` mode of [[OptimalBinningSketch]]). Each trigger folds
  * the micro-batch rows into the group's sketch and emits the re-solved
  * splits, so downstream consumers see a continuously updated binning
  * per variable. Because the sketch is a commutative monoid, the emitted
  * solution at every trigger equals the batch solve over all rows seen
  * so far, regardless of arrival order — stronger than watermark
  * semantics, which the reference's insertion-order-agnostic model
  * (`binning_sketch.py:461-491`) also guarantees.
  */
object StreamingBinning {

  /** One observation of one variable (melted long format). */
  final case class VarObs(variable: String, x: Option[Double], y: Double)

  /** Emitted per variable per trigger. */
  final case class SplitsUpdate(variable: String, nSamples: Long,
                                status: String, splits: Array[Double],
                                iv: Double)

  /** Continuous per-variable fits over a stream of [[VarObs]].
    * Start with `.writeStream.outputMode("update")`.
    */
  def perVariableFits(obs: Dataset[VarObs],
                      config: BinningConfig = BinningConfig(),
                      eps: Double = 1e-4): Dataset[SplitsUpdate] = {
    val specials: Array[Double] = config.specialCodes match {
      case Some(SpecialList(vs)) => vs.map(_.toString.toDouble).toArray
      case _                     => Array.empty[Double]
    }
    implicit val stateEnc: Encoder[BSketch] = Encoders.kryo[BSketch]
    implicit val outEnc: Encoder[SplitsUpdate] =
      Encoders.product[SplitsUpdate]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    obs.groupByKey(_.variable)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout()) {
        (variable: String, rows: Iterator[VarObs],
         state: GroupState[BSketch]) =>
          val sk = state.getOption.getOrElse(new BSketch(eps, specials))
          rows.foreach { r =>
            sk.add(r.x.map(Double.box).orNull, r.y)
          }
          state.update(sk)
          val solver = new OptimalBinningSketch(config, eps)
          solver.mergeSketch(sk)
          val fitted = solver.solve()
          val total = sk.n + sk.countMissingE + sk.countMissingNe +
            sk.countSpecialE + sk.countSpecialNe
          Iterator(SplitsUpdate(variable, total, fitted.status,
                                fitted.splits, fitted.table.iv))
      }
  }
}
