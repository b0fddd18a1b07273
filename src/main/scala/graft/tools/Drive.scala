package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    println("DRIVE emb schema=" + e.schema.simpleString + " n=" + e.count())
    val queries = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding"))

    val pq = Similarity.pqTopKPortable(e, queries, "embedding", "vec_id",
                                       "qid", k = 5, dim = 64)
    val t0 = System.nanoTime()
    val rows = pq.collect()
    println(f"DRIVE pq_portable n=${rows.length} " +
      f"queries=${rows.map(_.getAs[Any]("qid")).distinct.length} " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    rows.take(5).foreach(r => println("DRIVE row " + r))

    // trained PQ recall@10 vs brute force for one query
    val trained = Similarity.pqTopK(e, queries, "embedding", "vec_id",
                                    "qid", k = 10)
    val got = trained.where(col("qid") === 3).collect()
      .map(_.getAs[Long]("cid")).toSet
    val qvec = e.where(col("vec_id") === 3)
      .select(col("embedding").cast("array<float>")).head
      .getSeq[Float](0).toArray
    val bf = Similarity.bruteForceTopK(e, "embedding", "vec_id", qvec, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    println(s"DRIVE trained recall@10=${(got & bf).size / 10.0}")
    spark.stop()
  }
}
