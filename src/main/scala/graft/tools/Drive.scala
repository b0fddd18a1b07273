package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    // 1. portable vs fast simhash: different hashes, similar popcount
    //    spread; portable top 4 bits (62/63) never set.
    val sh = d.select(Dedup.simhash(col("text")).as("fast"),
                      Dedup.simhash(col("text"), portable = true).as("port"))
      .collect()
    val maxBit = sh.map(r => 63 - java.lang.Long.numberOfLeadingZeros(
      math.max(r.getLong(1), 1L))).max
    println(s"DRIVE simhash rows=${sh.length} portableMaxBit=$maxBit " +
      s"distinctFast=${sh.map(_.getLong(0)).distinct.length} " +
      s"distinctPort=${sh.map(_.getLong(1)).distinct.length}")

    // 2. portable minhash candidates vs fast-path candidates: both find
    //    candidate pairs; portable count matches the DuckDB-oracle value.
    val fast = Dedup.minhashCandidates(d, "text", "doc_id",
                                       numHashes = 32, bands = 8).count()
    val port = Dedup.minhashCandidates(d, "text", "doc_id",
                                       numHashes = 32, bands = 8,
                                       portable = true).count()
    println(s"DRIVE minhash fastPairs=$fast portablePairs=$port")

    // 3. portable LSH near-dup: plan shape must stay scan -> project(sig)
    //    -> shuffle on sig -> join (no extra exchanges vs fast path).
    val nd = Similarity.cosineNearDupPairs(e, "embedding", "vec_id",
                                           threshold = 0.3, nPlanes = 8,
                                           portable = true)
    println(s"DRIVE neardup pairs=${nd.count()}")
    val plan = nd.queryExecution.executedPlan.toString
    println(s"DRIVE neardup exchanges=" +
      plan.linesIterator.count(_.contains("Exchange")) +
      s" hasUdf=${plan.contains("BatchEvalPython")}")

    // 4. ANN with portable planes: bucket join stays broadcast on the
    //    query side (corpus never shuffles for the join).
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding"))
    val ann = Similarity.annTopK(e, q, "embedding", "vec_id", "qid",
                                 k = 5, nPlanes = 8, portable = true)
    val annPlan = ann.queryExecution.executedPlan.toString
    println(s"DRIVE ann rows=${ann.count()} broadcast=" +
      annPlan.contains("BroadcastHashJoin"))
    spark.stop()
  }
}
