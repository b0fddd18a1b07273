package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)

    // trained + portable variants of all three ANN families post-refactor
    val ivf = Similarity.ivfTopK(emb, queries, "embedding", "vec_id",
                                 "vec_id", k = 3)
    println(s"DRIVE ivf rows=${ivf.count()}")
    val pq = Similarity.pqTopK(emb, queries, "embedding", "vec_id",
                               "vec_id", k = 3)
    println(s"DRIVE pq rows=${pq.count()}")
    val ivfpq = Similarity.ivfPqTopK(emb, queries, "embedding", "vec_id",
                                     "vec_id", k = 3)
    println(s"DRIVE ivfpq rows=${ivfpq.count()}")
    val ivfpqP = Similarity.ivfPqTopKPortable(emb, queries, "embedding",
                                              "vec_id", "vec_id",
                                              k = 3, dim = 64)
    ivfpqP.orderBy("qid", "rank").show(9, false)

    // zero-norm query must score 0.0 everywhere (NOT NaN ranked first)
    import spark.implicits._
    val zq = Seq((9999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val z = Similarity.pqTopK(emb, zq, "embedding", "vec_id", "vec_id",
                              k = 3)
    z.show(3, false)
    val zVals = z.select("cosine_pq").collect().map(_.getDouble(0))
    println(s"DRIVE zeroquery scores=${zVals.mkString(",")} " +
      s"allZero=${zVals.forall(_ == 0.0)} nan=${zVals.exists(_.isNaN)}")
    val z2 = Similarity.ivfPqTopK(emb, zq, "embedding", "vec_id",
                                  "vec_id", k = 3)
    val z2Vals = z2.select("cosine_pq").collect().map(_.getDouble(0))
    println(s"DRIVE zeroquery ivfpq allZero=${z2Vals.forall(_ == 0.0)} " +
      s"nan=${z2Vals.exists(_.isNaN)}")

    // empty corpus answers empty for every family
    val empty = emb.where(col("vec_id") < 0)
    println(s"DRIVE emptyIvf=${Similarity.ivfTopK(empty, queries,
      "embedding", "vec_id", "vec_id", 3).count()} " +
      s"emptyPq=${Similarity.pqTopK(empty, queries,
        "embedding", "vec_id", "vec_id", 3).count()} " +
      s"emptyIvfPq=${Similarity.ivfPqTopK(empty, queries,
        "embedding", "vec_id", "vec_id", 3).count()}")
    spark.stop()
  }
}
