package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Packing, Similarity, TextAnalysis}

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
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count()

    // tokenChunks: plan must be scan -> generate -> project, NO shuffle
    val chunks = Packing.tokenChunks(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), chunkSize = 256, stride = 192)
    val cplan = chunks.queryExecution.executedPlan.toString
    println("DRIVE chunks noExchange=" + !cplan.contains("Exchange") +
      " generate=" + cplan.contains("Generate"))
    phase("tokenChunks") {
      val agg = chunks.agg(count(lit(1)), sum("chunk_tokens")).collect()(0)
      println(s"DRIVE   n_chunks=${agg.getLong(0)} tok=${agg.getLong(1)}")
    }

    // semanticDedup: one cell-assign projection + one equi self-join on
    // cell; count survivors at sf0.1
    phase("semanticDedup") {
      val flags = Similarity.semanticDedupPortable(emb, "embedding",
        "vec_id", dim = 64, threshold = 0.3, nLists = 16)
      val r = flags.agg(count(lit(1)),
        sum(when(col("is_dup"), 1L).otherwise(0L))).collect()(0)
      println(s"DRIVE   n=${r.getLong(0)} dups=${r.getLong(1)}")
    }
    val splan = Similarity.semanticDedupPortable(emb, "embedding",
      "vec_id", dim = 64, threshold = 0.3, nLists = 16)
      .queryExecution.executedPlan.toString
    println("DRIVE semdedup sortMergeOrHash=" +
      (splan.contains("SortMergeJoin") || splan.contains("ShuffledHashJoin")) +
      " noCartesian=" + !splan.contains("Cartesian"))

    // incrementalDedup at sf0.1: batch vs snapshot counts
    phase("incrementalDedup") {
      val surv = Dedup.incrementalDedup(
        docs.where(col("doc_id") % 3 === 0),
        docs.where(col("doc_id") % 3 =!= 0), "text", "doc_id")
      println(s"DRIVE   new=${surv.count()}")
    }

    // BinningProcess parity surface: information + updated
    phase("processInfo") {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0)
          .otherwise(0.0))
      val proc = graft.operators.BinningProcess.fit(
        li, Seq("l_extendedprice", "l_quantity"), "y",
        config = graft.operators.BinningConfig())
      println(proc.information())
      val refit = graft.operators.OptimalBinning.fit(li, "l_quantity", "y",
        graft.operators.BinningConfig(name = "l_quantity",
                                      maxNBins = Some(2)))
      val upd = proc.updated("l_quantity", refit)
      println(s"DRIVE   updated bins=" +
        upd.getBinnedVariable("l_quantity").nDataBins)
    }

    // unigramNll at sf0.1: per-source NLL summary
    phase("unigramNll") {
      val nll = TextAnalysis.unigramNll(docs, "text", "doc_id")
      val r = nll.agg(count(lit(1)), sum("n_tokens"),
                      sum("nll_micro_sum")).collect()(0)
      val avg = -r.getLong(2).toDouble / (1e6 * r.getLong(1))
      println(f"DRIVE   docs=${r.getLong(0)} tokens=${r.getLong(1)} " +
        f"avg_nll=$avg%.4f")
    }
    spark.stop()
  }
}
