package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

/** Scratch verification driver (not part of the public API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    // continuous: bin l_quantity (x) against l_extendedprice (continuous y)
    val cont = ContinuousOptimalBinning.fit(li, "l_quantity", "l_extendedprice",
      BinningConfig(name="l_quantity"))
    println("CONT_STATUS=" + cont.status)
    println("CONT_SPLITS=" + cont.splits.mkString(","))
    cont.table.rows.foreach(r => println(
      f"${r.bin}%-22s n=${r.count}%7.0f mean=${r.mean}%10.2f std=${r.std}%9.2f min=${r.min}%9.2f max=${r.max}%10.2f woe=${r.woe}%+10.2f"))
    val out = li.select(F.col("l_quantity"),
      cont.transform(F.col("l_quantity")).as("mean_y"))
    out.show(3)
    // categorical continuous
    val cc = ContinuousOptimalBinning.fit(li, "l_returnflag", "l_extendedprice",
      BinningConfig(name="rf", dtype="categorical"))
    println("CATCONT status=" + cc.status + " bins=" +
      cc.table.rows.map(r => s"${r.bin}:${r.count.toLong}").mkString(" | "))
    spark.stop()
    println("DRIVE_DONE")
  }
}
