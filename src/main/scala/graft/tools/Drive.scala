package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object Drive {
  // OLD minhashCandidates shape (collect_list + conditional expansion)
  def oldCands(df: DataFrame, textCol: String, idCol: String,
               starThreshold: Int = 256): DataFrame = {
    val banded = Dedup.withMinhashBands(df, textCol, idCol, 64, 16, 5,
                                        portable = false)
    val buckets = banded.groupBy("band", "bh")
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")) > 1)
      .withColumn("ids", array_sort(col("ids")))
    val allPairs = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
                b => struct(a.as("id_a"), b.as("id_b")))))
    val starPairs = transform(
      slice(col("ids"), lit(2), size(col("ids")) - 1),
      b => struct(element_at(col("ids"), 1).as("id_a"), b.as("id_b")))
    buckets
      .select(col("band"),
              explode(when(size(col("ids")) > starThreshold, starPairs)
                        .otherwise(allPairs)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("band"))
      .select("id_a", "id_b").distinct()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count() // warm page cache
    def time(tag: String)(f: => Long): Unit = {
      // min of 2
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"DRIVE $tag ${ts.map(_._1).min}%.2f s rows=${ts.head._2}")
    }
    time("old")(oldCands(docs, "text", "doc_id").count())
    time("new")(Dedup.minhashCandidates(docs, "text", "doc_id",
                                        keepBand = false).count())
    time("old")(oldCands(docs, "text", "doc_id").count())
    time("new")(Dedup.minhashCandidates(docs, "text", "doc_id",
                                        keepBand = false).count())
    spark.stop()
  }
}
