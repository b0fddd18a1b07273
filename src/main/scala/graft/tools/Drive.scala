package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .withColumn("y", F.when(F.col("l_returnflag")==="R",1.0).otherwise(0.0))
    // the melted histogram aggregate plan (BinningProcess pass B shape)
    val vars = Seq("l_extendedprice","l_quantity","l_discount","l_tax")
    val stackExpr = s"stack(${vars.length}, " + vars.map(v=>s"'$v', cast(`$v` as double)").mkString(", ") + ") as (var, x)"
    val melted = li.withColumn("__y", F.col("y")).selectExpr("__y as y", stackExpr)
    val agg = melted.groupBy("var","x").agg(
      F.count(F.lit(1)).as("n"),
      F.sum(F.when(F.col("y")===0.0, 1.0).otherwise(0.0)).as("w0"))
    agg.explain("formatted")
    spark.stop(); println("DRIVE_DONE")
  }
}
