package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver (see .claude/skills/verify): exercises the r12
  * optimization-round changes end-to-end on the local testdata —
  * the one-scan histogram logistic rewrites, the one-pass batch
  * stager behind every staged streaming replay, and the persisted
  * set table in the exact set-similarity join. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()

    // (1) the rewritten logistic family — run each query fn as the
    // bench does and print its full (small) result
    Seq("q_logreg_exact", "q_logreg_multi", "q_logreg_weighted",
        "q_score_calibrate").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      val t = timed { rows = fn(spark, dir).collect() }
      println(f"[info] $q%-20s $t%6.2f s  ${rows.length} rows; " +
              s"head=${rows.headOption.getOrElse("-")}")
      spark.catalog.clearCache()
    }

    // (2) a staged streaming replay through the new one-pass stager
    Seq("q_stream_topk", "q_stream_windows").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      var n = 0L
      val t = timed { n = fn(spark, dir).count() }
      println(f"[info] $q%-20s $t%6.2f s  $n rows")
      spark.catalog.clearCache()
    }

    // (3) the exact set-sim join with the persisted set table
    val fn = graft.SparkEntry.queries("q_setsim_join")
    var r: org.apache.spark.sql.Row = null
    val t = timed { r = fn(spark, dir).collect()(0) }
    println(f"[info] q_setsim_join $t%6.2f s  $r")
    spark.catalog.clearCache()

    // (4) q_bfs_hops with the shared symmetrized-edge cache
    val fb = graft.SparkEntry.queries("q_bfs_hops")
    var rb: Array[org.apache.spark.sql.Row] = Array.empty
    val tb = timed { rb = fb(spark, dir).collect() }
    println(f"[info] q_bfs_hops $tb%6.2f s  ${rb.mkString(" | ")}")
    spark.stop()
  }
}
