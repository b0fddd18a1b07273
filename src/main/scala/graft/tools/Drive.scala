package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    // extensions applied at session build time — the production
    // spark.sql.extensions path
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("documents")
    val out = spark.sql(
      """SELECT graft_lang_id(text) AS lang,
                count(*) AS n,
                avg(bit_count(graft_simhash64(text, true))) AS avg_pop
         FROM documents GROUP BY 1 ORDER BY 1""").collect()
    out.foreach(r => println("DRIVE ext " + r))
    println("DRIVE ext functions=" +
      spark.catalog.listFunctions().where("name like 'graft%'").count())
    spark.stop()
  }
}
