package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    def phase(tag: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s jobs=${jobs.get() - j0}")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    li.count()

    val ov = Map(
      "l_extendedprice" -> BinningConfig(userSplits = Some(Array(20000.0, 40000.0, 60000.0))),
      "l_quantity" -> BinningConfig(userSplits = Some(Array(10.0, 25.0, 40.0))))

    // warm both code paths
    BinningProcess.fit(li, Seq("l_extendedprice", "l_quantity"), "y", varOverrides = ov)
    OptimalBinning.fit(li, "l_extendedprice", "y",
      BinningConfig(name = "x", userSplits = Some(Array(20000.0, 40000.0, 60000.0))))

    var proc: FittedBinningProcess = null
    phase("process.pinned(fused)") {
      proc = BinningProcess.fit(li, Seq("l_extendedprice", "l_quantity"), "y",
                                varOverrides = ov)
    }
    var single: FittedOptimalBinning = null
    phase("single.pinned") {
      single = OptimalBinning.fit(li, "l_extendedprice", "y",
        BinningConfig(name = "x", userSplits = Some(Array(20000.0, 40000.0, 60000.0))))
    }
    // fused batch fit must agree with the single-variable exact path
    val b = proc.fits("l_extendedprice")
    assert(b.splits.sameElements(single.splits),
           s"splits ${b.splits.toSeq} vs ${single.splits.toSeq}")
    val rows = b.table.rows.zip(single.table.rows)
    rows.foreach { case (a, s) =>
      assert(a.bin == s.bin, s"bin ${a.bin} vs ${s.bin}")
      assert(math.abs(a.count - s.count) < 1e-9, s"count $a vs $s")
      assert(math.abs(a.woe - s.woe) < 1e-9, s"woe ${a.woe} vs ${s.woe}")
    }
    println("DRIVE fused==single rows=" + rows.length +
      " iv=" + f"${b.iv}%.8f/${single.iv}%.8f")
    // totals: special + missing + clean must cover every input row
    val n = li.count()
    val binned = b.table.rows.map(_.count).sum
    println(f"DRIVE coverage table=${binned}%.1f rows=$n")
    assert(math.abs(binned - n) < 1e-6)
    // mixed pinned/unpinned still takes the general path and agrees
    var mixed: FittedBinningProcess = null
    phase("process.mixed(general)") {
      mixed = BinningProcess.fit(li, Seq("l_extendedprice", "l_quantity"), "y",
        varOverrides = Map("l_extendedprice" ->
          BinningConfig(userSplits = Some(Array(20000.0, 40000.0, 60000.0)))))
    }
    val m = mixed.fits("l_extendedprice")
    assert(m.splits.sameElements(single.splits))
    m.table.rows.zip(single.table.rows).foreach { case (a, s) =>
      assert(math.abs(a.count - s.count) < 1e-9 && math.abs(a.woe - s.woe) < 1e-9)
    }
    println("DRIVE mixed-path parity ok")
    spark.stop()
  }
}
