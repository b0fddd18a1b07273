package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  StringType, StructField, StructType}

import graft.operators.{BinningConfig, FittedOptimalBinning, OptimalBinning}

/** `spark.ml` Pipeline integration: the reference is an sklearn
  * `BaseEstimator` usable inside sklearn pipelines
  * (`optbinning/binning/binning.py:447`); the Spark-native analogue is
  * an `Estimator`/`Model` pair so optimal binning composes with
  * `org.apache.spark.ml.Pipeline`, CrossValidator, and the rest of
  * spark.ml. The fitted transform stays a pure generated CASE column —
  * whole-stage codegen, no UDF — appended as `outputCol`.
  */
class OptimalBinningEstimator(override val uid: String)
    extends Estimator[OptimalBinningModel] {

  def this() = this(Identifiable.randomUID("graftOptBin"))

  final val inputCol = new Param[String](this, "inputCol", "feature column")
  final val labelCol = new Param[String](this, "labelCol", "binary target")
  final val outputCol = new Param[String](this, "outputCol", "output")
  final val metric = new Param[String](this, "metric",
    "woe | event_rate | indices | bins")
  setDefault(outputCol -> "binned", metric -> "woe", labelCol -> "label")

  private var config: BinningConfig = BinningConfig()

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setMetric(v: String): this.type = set(metric, v)
  /** Full binning configuration (trend, constraints, special codes…). */
  def setConfig(c: BinningConfig): this.type = { config = c; this }

  override def fit(dataset: Dataset[_]): OptimalBinningModel = {
    val fitted = OptimalBinning.fit(dataset.toDF(), $(inputCol),
                                    $(labelCol),
                                    config.copy(name = $(inputCol)))
    val m = new OptimalBinningModel(uid, fitted)
    m.set(m.inputCol, $(inputCol))
    m.set(m.outputCol, $(outputCol))
    m.set(m.metric, $(metric))
    m.setParent(this)
  }

  override def copy(extra: ParamMap): OptimalBinningEstimator = {
    val c = defaultCopy[OptimalBinningEstimator](extra)
    c.config = config
    c
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)),
            s"missing input column ${$(inputCol)}")
    StructType(schema.fields :+
      StructField($(outputCol), OptimalBinningStage.outputType($(metric)),
                  nullable = false))
  }
}

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
                          val fitted: FittedOptimalBinning)
    extends Model[OptimalBinningModel] {

  final val inputCol = new Param[String](this, "inputCol", "feature column")
  final val outputCol = new Param[String](this, "outputCol", "output")
  final val metric = new Param[String](this, "metric", "transform metric")

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.withColumn($(outputCol),
                       fitted.transform(col($(inputCol)), $(metric)))

  override def copy(extra: ParamMap): OptimalBinningModel = {
    val m = new OptimalBinningModel(uid, fitted)
    copyValues(m, extra).setParent(parent)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField($(outputCol), OptimalBinningStage.outputType($(metric)),
                  nullable = false))
}
