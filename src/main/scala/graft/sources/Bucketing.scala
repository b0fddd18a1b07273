package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table source/sink: the co-located-join discipline for
  * repeatedly-joined 100 TB tables. Writing both sides bucketed by
  * the join key into the same bucket count lets every later join plan
  * WITHOUT a shuffle on either side — the exchange that dominates a
  * large equi-join simply disappears from the plan (verified by the
  * plan-shape spec: no Exchange below the SortMergeJoin).
  *
  * Spark's bucketing rides the catalog (`saveAsTable`), not bare
  * parquet paths — bucket metadata lives in the table definition, so
  * readers must go through `spark.table`.
  */
object Bucketing {

  /** Write `df` as a bucketed table (overwriting any previous run's
    * definition — the operation is idempotent for replay harnesses). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive; got $nBuckets")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata intact). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
