package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BinningConfig, OptimalBinning, Scorecard}

/** Scale probe: fit the same operators on 1x / 4x / 16x multiplied
  * lineitem (in-memory explode — nothing written) and print wall times.
  * The aggregate-then-solve design claims fit cost is bounded by the
  * value histogram, not the row count: data passes should scale roughly
  * linearly in rows (scan-bound) while shuffle volume and driver work
  * stay constant. Usage: runMain graft.tools.ScaleProbe [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
      .select("l_extendedprice", "l_quantity", "y")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    Seq(1, 4, 16).foreach { mult =>
      val df =
        if (mult == 1) li
        else li.crossJoin(
          spark.range(mult.toLong).select(col("id").as("__rep")))
          .drop("__rep")
      val n = df.count()
      // warm + measure second run (steady state)
      (1 to 2).foreach { pass =>
        val tFit = timed {
          OptimalBinning.fit(df, "l_extendedprice", "y",
                             BinningConfig(name = "x"))
        }
        val tSc = timed {
          Scorecard.fit(df, Seq("l_extendedprice", "l_quantity"), "y")
        }
        if (pass == 2)
          println(f"PROBE mult=$mult%2d rows=$n%9d " +
            f"single_fit=$tFit%6.2f s scorecard_fit=$tSc%6.2f s")
      }
    }
    spark.stop()
  }
}
