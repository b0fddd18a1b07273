package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.ExactFit

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("DRIVE_SF", "/root/testdata/sf0.01")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")

    // spec 1: monotone ascending quantity -> price (q_pw_monotone)
    val s1 = ExactFit.PWSpec(Array(23.5, 47.5), 10L, 100L, 512.0,
                             Some("ascending"))
    val f1 = ExactFit.fit(li, col("l_quantity"), col("l_extendedprice"), s1)
    // spec 2: unconstrained binary target on price (q_pw_transform)
    val s2 = ExactFit.PWSpec(Array(25000.0, 50000.0, 75000.0), 100L, 1L,
                             8388608.0, None)
    val y2 = when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
    val f2 = ExactFit.fit(li, col("l_extendedprice"), y2, s2)
    // spec 3: unconstrained quantity -> price (q_cont_pw)
    val s3 = ExactFit.PWSpec(Array(23.5, 47.5), 10L, 100L, 512.0, None)
    val f3 = ExactFit.fit(li, col("l_quantity"), col("l_extendedprice"), s3)

    def dump(tag: String, f: ExactFit.Solved): Unit = {
      val keys = f.values.keys.toSeq.sorted.filter(_.startsWith("w_"))
      keys.foreach { k =>
        println(s"BITS $tag $k ${java.lang.Double.doubleToLongBits(f.values(k))} ${f.values(k)}")
      }
    }
    dump("s1", f1); dump("s2", f2); dump("s3", f3)
    val w = new java.io.PrintWriter("/tmp/exactfit_sql.txt")
    def emit(tag: String, spec: ExactFit.PWSpec, xSql: String,
             ySql: String): Unit = {
      w.println(s"-- $tag")
      w.println("WITH " +
        ExactFit.coefCtes(spec, "lineitem", xSql, ySql) +
        "\nSELECT * FROM kf;")
      w.println(s"-- END $tag")
    }
    emit("s1", s1, "l_quantity", "l_extendedprice")
    emit("s2", s2, "l_extendedprice",
         "CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END")
    emit("s3", s3, "l_quantity", "l_extendedprice")
    w.close()
    println("active mask s1 = " + f1.mask)
    // plan shape of the ONE exact moment aggregate
    val aggs = ExactFit.momentAggs(s2, col("l_extendedprice"),
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val mdf = li.where(col("l_extendedprice").isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    val p = mdf.queryExecution.executedPlan.toString
    println("PLAN partial-agg: " + p.contains("HashAggregate"))
    println("PLAN single-exchange: " +
      ("Exchange".r.findAllIn(p).size == 1))
    val rs = mdf.queryExecution.executedPlan.toString
    val scan = rs.linesIterator.find(_.contains("Scan parquet"))
      .getOrElse("")
    println("PLAN scan: " + scan.trim.take(400))
    spark.stop()
  }
}
