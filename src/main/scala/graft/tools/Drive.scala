package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DRIVE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
    (1 to 2).foreach { pass =>
      println(s"DRIVE pass $pass")
      val sc = tm("scorecard.fit") {
        Scorecard.fit(li0, Seq("l_extendedprice", "l_quantity"), "y")
      }
      val expected = li0.where(col("l_orderkey") % 2 === 0)
      val actual = li0.where(col("l_orderkey") % 2 === 1)
      val mon = new ScorecardMonitoring(sc, psiNBins = 10,
        psiMethod = "cart", psiYCol = Some("y"))
      // fresh monitor: cart splits derive inside the fused aggregate
      val st = tm("stabilityStats(fused, fresh cart)") {
        mon.stabilityStats(expected, actual, "y")
      }
      // same monitor: multi-job methods reuse the cached splits
      val psi = tm("psiTotal(cached splits)") {
        mon.psiTotal(expected, actual)
      }
      val perf = tm("performance(multi-job)") {
        mon.performance(expected, actual, "y")
      }
      println(s"DRIVE fused=${st.psiTotal} psi=$psi " +
        s"giniF=${st.performance("gini_expected")} " +
        s"gini=${perf("gini_expected")}")
    }
  }
}
