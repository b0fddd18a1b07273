package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.pipeline.{Dedup, TextAnalysis}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()

    // vocabTopK: result + plan shape (partial agg before the shuffle,
    // TakeOrdered instead of a global sort)
    val vocab = TextAnalysis.vocabTopK(docs, "text", "doc_id", k = 10)
    phase("vocabTopK") {
      vocab.collect().foreach(r => println(s"DRIVE   vocab $r"))
    }
    val vplan = vocab.queryExecution.executedPlan.toString
    println("DRIVE vocab TakeOrdered=" + vplan.contains("TakeOrderedAndProject")
      + " partialAgg=" + vplan.contains("partial"))

    // dedupSurvivors on the 0.1 corpus: kept count vs corpus count
    phase("dedupSurvivors") {
      val kept = Dedup.dedupSurvivors(docs, "text", "doc_id",
        col("n_chars"), jaccardThreshold = 0.5, numHashes = 32, bands = 8,
        jaccardNgram = 3)
      val (n, nk) = (docs.count(), kept.count())
      println(s"DRIVE   corpus=$n kept=$nk dropped=${n - nk}")
      require(nk <= n && nk > 0)
    }

    // refine recall probe: does pqTopKRefinedPortable equal exact
    // brute-force top-k at the driver-tested scales?
    import graft.pipeline.Similarity
    for (sf <- Seq("sf0.01", "sf0.1"); rf <- Seq(2, 4, 8)) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val qs = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      val refined = Similarity.pqTopKRefinedPortable(
          e, qs, "embedding", "vec_id", "qid", k = 5, dim = 64,
          refineFactor = rf)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("c"))
      // exact: every (query, doc) pair, rounded-cosine ranking
      val c = e.select(col("vec_id").as("cid"),
                       col("embedding").cast("array<double>").as("cemb"))
      val q2 = qs.select(col("qid"),
                         col("embedding").cast("array<double>").as("qemb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("c"), col("cid"))
      val exact = c.crossJoin(q2)
        .withColumn("c",
          round(Similarity.cosine(col("cemb"), col("qemb")), 6))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("qid", "cid", "c")
      val miss = exact.except(refined).count()
      println(s"DRIVE refine $sf rf=$rf missed=$miss")
    }

    // 2D + PW information() surfaces on real lineitem data
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
    val f2 = OptimalBinning2D.fit(li, "l_extendedprice", "l_quantity",
                                  "y", OptimalBinning2D.Config2D())
    println(f2.information())
    val pw = PWBinning.fit(li, "l_extendedprice", "y")
    println(pw.information())
    spark.stop()
  }
}
