package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  StringType, StructField, StructType}

import graft.operators.{BinningConfig, FittedOptimalBinning, OptimalBinning}
import graft.sources.ModelIO

/** `spark.ml` Pipeline integration: the reference is an sklearn
  * `BaseEstimator` usable inside sklearn pipelines
  * (`optbinning/binning/binning.py:447`); the Spark-native analogue is
  * an `Estimator`/`Model` pair so optimal binning composes with
  * `org.apache.spark.ml.Pipeline`, CrossValidator, and the rest of
  * spark.ml. The fitted transform stays a pure generated CASE column —
  * whole-stage codegen, no UDF — appended as `outputCol`.
  *
  * PERSISTENCE (the reference saves every estimator,
  * `binning_process.py:317-349` / `scorecard.py:507-538`): both stages
  * are `DefaultParamsWritable`/`Readable`, so `Pipeline.save` /
  * `PipelineModel.load` round-trip through the standard spark.ml
  * metadata layout. The non-Param state rides in string Params holding
  * the engine's own portable JSON — the full [[BinningConfig]] on the
  * estimator (`configJson`, [[ModelIO.configToJson]]) and the fitted
  * binning on the model (`modelJson`, [[ModelIO.toJson]] — the same
  * document `ModelIO.save` writes, so a spark.ml-saved model is
  * readable by the native loader too).
  */
class OptimalBinningEstimator(override val uid: String)
    extends Estimator[OptimalBinningModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftOptBin"))

  final val inputCol = new Param[String](this, "inputCol", "feature column")
  final val labelCol = new Param[String](this, "labelCol", "binary target")
  final val outputCol = new Param[String](this, "outputCol", "output")
  final val metric = new Param[String](this, "metric",
    "woe | event_rate | indices | bins")
  /** Full [[BinningConfig]] as ModelIO JSON — a Param so the unfitted
    * Pipeline persists the ENTIRE configuration, not just the column
    * names. */
  final val configJson = new Param[String](this, "configJson",
    "BinningConfig as ModelIO JSON")
  setDefault(outputCol -> "binned", metric -> "woe", labelCol -> "label",
             configJson -> ModelIO.configToJson(BinningConfig()))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setMetric(v: String): this.type = set(metric, v)
  /** Full binning configuration (trend, constraints, special codes…).
    *
    * The config is stored as JSON (the persistence format), which
    * normalizes numeric special values to their widest type: Int /
    * Short / Byte special codes, `outlierParams` and `catUnknown`
    * come back as `Long`, `Float` as `Double`. `getConfig` (and a
    * reloaded pipeline) therefore returns the NORMALIZED config —
    * compare against `getConfig`, not the pre-`setConfig` instance,
    * when special values use narrow numeric types. */
  def setConfig(c: BinningConfig): this.type =
    set(configJson, ModelIO.configToJson(c))
  def getConfig: BinningConfig = ModelIO.configFromJson($(configJson))

  override def fit(dataset: Dataset[_]): OptimalBinningModel = {
    val fitted = OptimalBinning.fit(dataset.toDF(), $(inputCol),
                                    $(labelCol),
                                    getConfig.copy(name = $(inputCol)))
    val m = new OptimalBinningModel(uid, fitted)
    m.set(m.inputCol, $(inputCol))
    m.set(m.outputCol, $(outputCol))
    m.set(m.metric, $(metric))
    m.set(m.modelJson, ModelIO.toJson(fitted))
    m.setParent(this)
  }

  override def copy(extra: ParamMap): OptimalBinningEstimator =
    defaultCopy[OptimalBinningEstimator](extra)

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)),
            s"missing input column ${$(inputCol)}")
    StructType(schema.fields :+
      StructField($(outputCol), OptimalBinningStage.outputType($(metric)),
                  nullable = false))
  }
}

object OptimalBinningEstimator
    extends DefaultParamsReadable[OptimalBinningEstimator]

private[ml] object OptimalBinningStage {
  /** Output column type per transform metric — `bins` emits the string
    * bin labels and `indices` the integer bin ids; declaring DoubleType
    * for those would pass Pipeline schema validation and then break the
    * downstream stage at runtime. */
  def outputType(metric: String): DataType = metric match {
    case "bins"    => StringType
    case "indices" => IntegerType
    case _         => DoubleType // woe | event_rate
  }
}

class OptimalBinningModel(override val uid: String,
                          @transient private var fitted0: FittedOptimalBinning)
    extends Model[OptimalBinningModel] with DefaultParamsWritable {

  /** Reflection constructor for `DefaultParamsReader` — the fitted
    * state rehydrates lazily from the `modelJson` Param. */
  def this(uid: String) = this(uid, null)

  final val inputCol = new Param[String](this, "inputCol", "feature column")
  final val outputCol = new Param[String](this, "outputCol", "output")
  final val metric = new Param[String](this, "metric", "transform metric")
  /** The fitted binning as ModelIO JSON — the persisted model state. */
  final val modelJson = new Param[String](this, "modelJson",
    "fitted binning as ModelIO JSON")

  def fitted: FittedOptimalBinning = {
    if (fitted0 == null) fitted0 = ModelIO.fromJson($(modelJson))
    fitted0
  }

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.withColumn($(outputCol),
                       fitted.transform(col($(inputCol)), $(metric)))

  override def copy(extra: ParamMap): OptimalBinningModel = {
    val m = new OptimalBinningModel(uid, fitted0)
    copyValues(m, extra).setParent(parent)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField($(outputCol), OptimalBinningStage.outputType($(metric)),
                  nullable = false))
}

object OptimalBinningModel
    extends DefaultParamsReadable[OptimalBinningModel]
