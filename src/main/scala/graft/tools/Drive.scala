package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextHashExprs, VectorExprs}
import graft.pipeline.TextAnalysis

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // fail loudly if our doGenCode emits java that janino rejects
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.ui.explainMode", "extended")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DRIVE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      val cos = tm(s"cosine pass$pass") {
        e.crossJoin(e.limit(8).select(col("embedding").as("q")))
          .select(VectorExprs.cosineSim(col("embedding"), col("q")).as("c"))
          .agg(round(avg("c"), 9)).collect()(0).getDouble(0)
      }
      val lsh = tm(s"lsh    pass$pass") {
        e.select(VectorExprs.lshSig(col("embedding"), 16).as("s"))
          .agg(sum(col("s") % 97L)).collect()(0).getLong(0)
      }
      val mh = tm(s"minhash pass$pass") {
        d.select(TextHashExprs.minhashSig(lower(col("text")), 5, 16).as("m"))
          .select((element_at(col("m"), 1) % 97L).as("m0"))
          .agg(sum("m0")).collect()(0).getLong(0)
      }
      val sh = tm(s"simhash pass$pass") {
        d.select(TextHashExprs.simhash64(lower(col("text"))).as("s"))
          .agg(sum(col("s") % 97L)).collect()(0).getLong(0)
      }
      val rep = tm(s"repeat  pass$pass") {
        d.select(TextAnalysis.repetitionFeatures(col("text"))
          .toMap.apply("top_bigram_frac").as("t"))
          .agg(round(avg("t"), 9)).collect()(0).getDouble(0)
      }
      println(s"DRIVE cos=$cos lsh=$lsh mh=$mh sh=$sh rep=$rep")
    }
  }
}
