package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val sc = graft.operators.Scorecard.fitContinuousTarget(
      li, Seq("l_quantity"), "l_extendedprice",
      graft.operators.BinningConfig(name = "l_quantity",
        userSplits = Some(Array(10.0, 25.0, 40.0)),
        monotonicTrend = None))
    val expected = li.where(col("l_orderkey") % 2 === 0)
    val actual = li.where(col("l_orderkey") % 2 === 1)
    val mon = new graft.operators.ContinuousScorecardMonitoring(
      sc, psiNBins = 10)
    val st = mon.stabilityStats(expected, actual, "l_extendedprice")
    println(s"COEF=${sc.coefficients.mkString(",")}")
    println(s"INTERCEPT=${sc.estimatorIntercept}")
    println(s"BASE=${sc.pointsTable.map(r => (r.binId, r.points)).mkString(";")}")
    println(s"SPLITS=${st.scoreSplits.mkString(",")}")
    println(s"PSIBINS=${st.psiBins.mkString(";")}")
    spark.stop()
  }
}
