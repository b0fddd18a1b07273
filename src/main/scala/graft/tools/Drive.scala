package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // weighted Scorecard.fit on real testdata: weight = l_linenumber
    // (integral 1..7), so the weighted fit must equal fitting on rows
    // duplicated l_linenumber times
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .withColumn("y", when(col("l_extendedprice") * (lit(1.0) - col("l_discount")) >= 40000, 1.0).otherwise(0.0))
      .select("l_extendedprice", "l_quantity", "y", "l_linenumber")
    val dup = li.withColumn("dup", explode(
        transform(sequence(lit(1), col("l_linenumber")), _ => lit(1))))
      .drop("dup", "l_linenumber")

    val ov = Map(
      "l_extendedprice" -> BinningConfig(userSplits = Some(Array(20000.0, 40000.0, 60000.0))),
      "l_quantity" -> BinningConfig(userSplits = Some(Array(10.0, 25.0, 40.0))))
    val sw = Scorecard.fit(li, Seq("l_extendedprice", "l_quantity"), "y",
                           varOverrides = ov, weightCol = Some("l_linenumber"))
    val sd = Scorecard.fit(dup, Seq("l_extendedprice", "l_quantity"), "y",
                           varOverrides = ov)
    println("DRIVE coefs weighted=" + sw.coefficients.map(c => f"$c%.8f").mkString(","))
    println("DRIVE coefs duplicat=" + sd.coefficients.map(c => f"$c%.8f").mkString(","))
    println(f"DRIVE intercept diff=${math.abs(sw.estimatorIntercept - sd.estimatorIntercept)}%.2e")
    val maxCoefDiff = sw.coefficients.zip(sd.coefficients)
      .map { case (a, b) => math.abs(a - b) }.max
    println(f"DRIVE max coef diff=$maxCoefDiff%.2e")
    sw.pointsTable.zip(sd.pointsTable).foreach { case (a, b) =>
      assert(a.variable == b.variable && a.bin == b.bin)
      assert(math.abs(a.count - b.count) < 1e-9, s"count $a vs $b")
      assert(math.abs(a.points - b.points) < 1e-9, s"points $a vs $b")
    }
    println("DRIVE pointsTable identical rows=" + sw.pointsTable.length)
    // score real rows with both models
    val scored = li.select(sw.scoreColumn().as("s_w"), sd.scoreColumn().as("s_d"))
      .agg(max(abs(col("s_w") - col("s_d"))).as("maxdiff"), avg("s_w").as("mean"))
      .head
    println(f"DRIVE score maxdiff=${scored.getDouble(0)}%.2e mean=${scored.getDouble(1)}%.3f")
    // free binning (no pinned splits) under weights also runs end-to-end
    val free = Scorecard.fit(li, Seq("l_extendedprice", "l_quantity"), "y",
                             weightCol = Some("l_linenumber"))
    println("DRIVE free-binning weighted fit bins=" +
      free.pointsTable.groupBy(_.variable).map { case (v, rs) => s"$v:${rs.size}" }.mkString(" "))
    spark.stop()
  }
}
