package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._
import graft.sources._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .withColumn("y", F.when(F.col("l_returnflag")==="R",1.0).otherwise(0.0))
    // scorecard + monitoring end to end
    val sc = Scorecard.fit(li, Seq("l_extendedprice","l_quantity","l_discount"), "y",
      scaling = Scorecard.ScalingConfig(method=Some("pdo_odds"), rounding=true))
    println("POINTS_TABLE:")
    sc.pointsTable.take(6).foreach(r => println(f"  ${r.variable}%-16s ${r.bin}%-22s pts=${r.points}%8.1f"))
    val mon = new ScorecardMonitoring(sc, psiNBins=10)
    val e = li.where(F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    val a = li.where(F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
    println(f"PSI_TOTAL=${mon.psiTotal(e,a)}%.6f verdict=" + Monitoring.psiVerdict(mon.psiTotal(e,a)))
    mon.psiVariableTable(e,a).foreach{case (v,p)=>println(f"  var_psi $v%-18s $p%.6f")}
    val perf = mon.performance(e, a, "y")
    println("PERF=" + perf.map{case(k,v)=>f"$k=$v%.4f"}.mkString(" "))
    // model JSON round trip via file
    val fitted = OptimalBinning.fit(li, "l_extendedprice", "y", BinningConfig(name="x"))
    ModelIO.save(fitted, "/tmp/model.json")
    val re = ModelIO.load("/tmp/model.json")
    println("JSON_OK=" + (re.splits.toSeq == fitted.splits.toSeq) + " json_len=" + ModelIO.toJson(fitted).length)
    spark.stop()
    println("DRIVE_DONE")
  }
}
