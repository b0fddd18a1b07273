package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Disk-path entry points mirroring the reference's chunked CSV/Parquet
  * fit/transform surface (`optbinning/binning/binning_process.py:65-72,
  * 637-787`). In Spark these are plain `spark.read` scans — Catalyst
  * prunes to the referenced columns and partitions replace chunking — so
  * the "disk variant" is the same fit on a lazily-read DataFrame.
  */
object Sources {

  /** Read csv (header, inferred schema) or parquet by extension. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(path)
    else spark.read.parquet(path)

  /** Fit a single variable straight from a file path
    * (`fit_disk`): only (x, y[, w]) columns are read from the scan. */
  def fitDisk(spark: SparkSession, path: String, xCol: String, yCol: String,
              config: BinningConfig = BinningConfig(),
              weightCol: Option[String] = None): FittedOptimalBinning = {
    val cols = Seq(xCol, yCol) ++ weightCol
    val df = readTable(spark, path).select(cols.head, cols.tail: _*)
    OptimalBinning.fit(df, xCol, yCol, config, weightCol)
  }

  /** Fit a multi-variable process from a file path. */
  def fitProcessDisk(spark: SparkSession, path: String,
                     variables: Seq[String], yCol: String,
                     config: BinningConfig = BinningConfig())
      : FittedBinningProcess = {
    val df = readTable(spark, path)
    BinningProcess.fit(df, variables, yCol, config = config)
  }

  /** Fit + transform + write (`fit_transform_disk`): the transform is a
    * projection, so the write streams through without a shuffle. */
  def fitTransformDisk(spark: SparkSession, inputPath: String,
                       outputPath: String, variables: Seq[String],
                       yCol: String,
                       config: BinningConfig = BinningConfig(),
                       metric: String = "woe"): FittedBinningProcess = {
    val df = readTable(spark, inputPath)
    val proc = BinningProcess.fit(df, variables, yCol, config = config)
    proc.transform(df, metric, keepCols = Seq(yCol))
      .write.mode("overwrite").parquet(outputPath)
    proc
  }
}
