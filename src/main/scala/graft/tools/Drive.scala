package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.pipeline.{Dedup, Similarity}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. IVF on a corpus smaller than nLists (ADVICE r03 medium): real
    //    embeddings table, 5 rows, nLists=16 — crashed before the clamp.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val tiny = e.limit(5).cache()
    val q = tiny.limit(1)
    val ivf = Similarity.ivfTopK(tiny, q, "embedding", "vec_id", "vec_id",
                                 k = 3, nLists = 16, nProbe = 4).collect()
    println(s"DRIVE ivf-tiny rows=${ivf.length} " +
      s"top=${ivf.minBy(_.getInt(3)).getLong(1)} " +
      s"cos=${ivf.minBy(_.getInt(3)).getDouble(2)}")
    val ivfEmpty = Similarity.ivfTopK(e.limit(0), q, "embedding",
                                      "vec_id", "vec_id", k = 3).collect()
    println(s"DRIVE ivf-empty rows=${ivfEmpty.length}")

    // 2. mdae semantics: y=0 rows must stay in median(abs(err)).
    val df = Seq((0.0, 1.0), (2.0, 1.0), (4.0, 1.0), (10.0, 1.0), (6.0, 1.0))
      .toDF("y", "p")
    val mm = ModelMetrics.regressionMetrics(df, "y", "p")
    println(s"DRIVE mdae=${mm("Median absolute error")} " +
      s"mdape=${mm("Median absolute percentage error")}")

    // 3. connected components: chain longer than maxIter must throw.
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ok = Dedup.connectedComponents(chain, maxIter = 25)
      .agg(countDistinct("comp")).head.getLong(0)
    println(s"DRIVE cc-converged comps=$ok")
    val threw =
      try { Dedup.connectedComponents(chain, maxIter = 2); false }
      catch { case _: IllegalStateException => true }
    println(s"DRIVE cc-nonconverged-throws=$threw")

    // 4. cat sketch rejects grouped special codes.
    val rejected =
      try {
        new graft.streaming.OptimalBinningCatSketch(
          BinningConfig(dtype = "categorical",
            specialCodes = Some(SpecialDict(Seq("g" -> Seq("A"))))))
        false
      } catch { case _: IllegalArgumentException => true }
    println(s"DRIVE catsketch-groups-rejected=$rejected")
    spark.stop()
  }
}
