package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // plan audit: q_linreg_weighted's weighted-moment aggregate —
    // expect ONE hash-agg pair (partial/final) over the rollup, the
    // orders priority column joined, pruned ReadSchema on both scans
    val dir = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val w = when(col("o_orderpriority") === "1-URGENT", 3L)
      .when(col("o_orderpriority") === "2-HIGH", 2L)
      .otherwise(1L)
    val po = li
      .where(col("l_quantity").isNotNull &&
             col("l_extendedprice").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("l_quantity")).as("sq"),
           sum(round(col("l_extendedprice") * 100).cast("long"))
             .as("cents"))
      .join(spark.read.parquet(s"$dir/orders.parquet")
              .select(col("o_orderkey"), w.as("w")),
            col("l_orderkey") === col("o_orderkey"))
    val spec = graft.core.ExactFit.OLSSpec(
      Seq(1L, 10L), 1L, Seq(8.0, 4096.0))
    val aggs = graft.core.ExactFit.olsMomentAggsWeighted(
      spec, Seq(col("cnt"), col("sq")), col("cents"), col("w"))
    val plan = po.agg(aggs.head, aggs.tail: _*)
    plan.explain("formatted")
    println("[info] DRIVE OK")
    spark.stop()
  }
}
