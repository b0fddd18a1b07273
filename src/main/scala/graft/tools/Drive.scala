package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$sf/documents.parquet")

    def timed(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val cands = Dedup.minhashCandidates(d, "text", "doc_id", 32, 8,
      portable = true, keepBand = false).persist()
    timed("cands")(cands.count())
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    timed("candIds")(candIds.count())
    val sh = d.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("id"),
              split(Dedup.normalizeText(col("text")), " ").as("__tok"))
      .select(col("id"), Dedup.shingleHashes(
        Dedup.wordShinglesOf(col("__tok"), 3)).as("sh"))
      .persist()
    timed("shingles")(sh.count())
    timed("verify-join")(
      cands.join(sh.toDF("id_a", "sh_a"), Seq("id_a"))
        .join(sh.toDF("id_b", "sh_b"), Seq("id_b"))
        .withColumn("jaccard",
                    Dedup.jaccardArrays(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= 0.5).count())
    timed("verify-join-2")(
      cands.join(sh.toDF("id_a", "sh_a"), Seq("id_a"))
        .join(sh.toDF("id_b", "sh_b"), Seq("id_b"))
        .withColumn("jaccard",
                    Dedup.jaccardArrays(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= 0.5).count())
    spark.stop()
  }
}
