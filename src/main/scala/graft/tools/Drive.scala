package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", F.when(F.col("l_returnflag")==="R",1.0).otherwise(0.0))
    li.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DRIVE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (1 to 2).foreach { p =>
      val proc = t(s"binproc_pass$p") {
        BinningProcess.fit(li, Seq("l_extendedprice", "l_quantity"), "y")
      }
      t(s"lr_pass$p") {
        val xt = proc.transform(li, metric = "woe", keepCols = Seq("y"))
        val assembled = new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(proc.selectedVariables.toArray)
          .setOutputCol("features").transform(xt)
          .select(F.col("features"), F.col("y").cast("double").as("label"))
        val cached = assembled.persist()
        val m = new org.apache.spark.ml.classification.LogisticRegression()
          .setStandardization(false).setTol(1e-4).fit(cached)
        cached.unpersist()
        m
      }
      t(s"full_scorecard_pass$p") {
        Scorecard.fit(li, Seq("l_extendedprice", "l_quantity"), "y")
      }
    }
  }
}
