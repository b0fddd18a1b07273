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
    // weighted exact logistic at the library surface, on real
    // testdata: priority-weighted fit on lineitem x orders, then
    // the same fit on the weight-replicated rows must be
    // bit-identical, and the coefficients must be finite/sane.
    val dir = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val w = when(col("o_orderpriority") === "1-URGENT", 3L)
      .when(col("o_orderpriority") === "2-HIGH", 2L).otherwise(1L)
    val joined = li.join(ord.select(col("o_orderkey"), w.as("w")),
                         col("l_orderkey") === col("o_orderkey"))
      .where(col("l_quantity").isNotNull)
    val y = when(col("l_returnflag") === "R", 1L).otherwise(0L)
    val fw = graft.core.ExactLogit.fitMultiWeighted(
      joined, Seq(round(col("l_quantity"))), y, col("w"), iters = 3)
    println(s"[info] weighted fit: $fw")
    val repl = joined.withColumn(
      "__rep", explode(sequence(lit(1L), col("w"))))
    val fr = graft.core.ExactLogit.fitMulti(
      repl, Seq(round(col("l_quantity"))), y, iters = 3)
    println(s"[info] replicated fit: $fr")
    assert(java.lang.Double.doubleToLongBits(fw.beta(0)) ==
             java.lang.Double.doubleToLongBits(fr.beta(0)) &&
           java.lang.Double.doubleToLongBits(fw.beta(1)) ==
             java.lang.Double.doubleToLongBits(fr.beta(1)),
           s"weighted != replicated: $fw vs $fr")
    assert(fw.n == fr.n && fw.sumMuQ.compareTo(fr.sumMuQ) == 0)
    assert(fw.beta.forall(b => !b.isNaN && !b.isInfinite))
    println("[info] DRIVE OK")
    spark.stop()
  }
}
