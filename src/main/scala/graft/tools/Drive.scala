package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // exact-merge semantics check at the library surface: the
    // fixpoint variant merges back-to-back repeats fully in one
    // round (`a a a a` -> `aa aa`), the single-pass default only
    // alternately (`aa a a`)
    val docs = Seq("aaaa aaaa", "aaaa aaaa").toDF("text")
    val exact = graft.pipeline.Tokenizer
      .bpeMerges(docs, "text", rounds = 1, exactMerge = true)
      .collect()(0)
    val loose = graft.pipeline.Tokenizer
      .bpeMerges(docs, "text", rounds = 1, exactMerge = false)
      .collect()(0)
    println(s"[info] exact round1: ${exact.mkString(",")}")
    println(s"[info] loose round1: ${loose.mkString(",")}")
    assert(exact.getLong(5) == 4 * 2,
           "exact: 4 occurrences x 2 syms ('aa aa')")
    assert(loose.getLong(5) == 4 * 3,
           "loose: 4 occurrences x 3 syms ('aa a a')")
    println("[info] DRIVE OK")
    spark.stop()
  }
}
