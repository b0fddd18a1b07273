package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver (see .claude/skills/verify): exercises the r13
  * second-wave changes end-to-end on the local testdata — the sorted
  * merge kernel behind every pairwise set-similarity verify (exact
  * set-sim join, near-dup Jaccard, LSH quality truth, containment),
  * plus a graph-loop control on the eager lineage cuts. */
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
    spark.read.parquet(s"$dir/documents.parquet").count()

    // (1) the kernel itself, directly at the library surface
    import spark.implicits._
    val demo = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("x"), Seq("x")),
      (Seq[String](), Seq("q"))).toDF("a", "b")
    println("[info] kernel demo (inter, union, jaccard):")
    demo.select(
      graft.functions.ArraySetExprs.sortedInterSize(col("a"), col("b")),
      graft.functions.ArraySetExprs.sortedUnionSize(col("a"), col("b")),
      graft.pipeline.Dedup.sortedJaccardArrays(col("a"), col("b")))
      .collect().foreach(r => println(s"[info]   $r"))

    // (2) every query whose verify now runs the kernel, as the bench
    // runs them, with full (small) results printed
    Seq("q_setsim_join", "q_neardup_pairs", "q_dedup_clusters",
        "q_dedup_survivors", "q_cross_neardup", "q_lsh_quality",
        "q_ngram_jaccard", "q_containment").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      val t = timed { rows = fn(spark, dir).collect() }
      println(f"[info] $q%-20s $t%6.2f s  ${rows.length} rows; " +
              s"head=${rows.headOption.getOrElse("-")}")
      spark.catalog.clearCache()
    }

    // (3) a graph-loop control (eager per-round cuts retained)
    Seq("q_pagerank", "q_kcore").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      var n = 0L
      val t = timed { n = fn(spark, dir).count() }
      println(f"[info] $q%-20s $t%6.2f s  $n rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
