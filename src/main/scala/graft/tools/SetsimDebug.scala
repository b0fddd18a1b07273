package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13: dissect q_setsim_join's pass-to-pass variance — print the
  * candidate volume, verify-input volume, and the executed plan's
  * join strategy for each pass. */
object SetsimDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sfDir
    // mirror setSimJoinExact's internals (thr 7/10 — same as the query)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tokArr = array_distinct(filter(
      split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))
    val sets = docs.where(col("text").isNotNull)
      .select(col("doc_id").as("__id"), array_sort(tokArr).as("__set"))
      .where(size(col("__set")) > 0)
      .persist()
    println("n_docs=" + sets.count())
    println("sum_set_size=" + sets.agg(sum(size(col("__set")))).head.getLong(0))
    val (thrNum, thrDen) = (19, 20)
    import org.apache.spark.sql.expressions.Window
    val toks = sets.select(col("__id"),
                           size(col("__set")).cast("long").as("__sz"),
                           explode(col("__set")).as("token"))
    val dfreq = toks.groupBy("token").agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy("__id").orderBy(col("__df"), col("token"))
    val ranked = toks.join(dfreq, Seq("token"))
      .withColumn("__pos", row_number().over(wDoc))
    val prefixLen = col("__sz") -
      expr(s"($thrNum * __sz + $thrDen - 1) div $thrDen") + 1
    val pre = ranked.where(col("__pos") <= prefixLen)
      .select(col("__id"), col("token"), col("__pos"), col("__sz"))
      .persist()
    println("n_prefix_rows=" + pre.count())
    val preA = pre.select(col("__id").as("id_a"), col("token"),
                          col("__pos").as("__pa"), col("__sz").as("__sa"))
    val preB = pre.select(col("__id").as("id_b"), col("token"),
                          col("__pos").as("__pb"), col("__sz").as("__sb"))
    val alpha = expr(
      s"($thrNum * (__sa + __sb) + $thrNum + $thrDen - 1) " +
      s"div ($thrNum + $thrDen)")
    val candRaw = preA.join(preB, Seq("token"))
      .where(col("id_a") < col("id_b") &&
             lit(thrDen.toLong) * least(col("__sa"), col("__sb")) >=
               lit(thrNum.toLong) * greatest(col("__sa"), col("__sb")) &&
             least(col("__sa") - col("__pa"),
                   col("__sb") - col("__pb")) + 1 >= alpha)
      .select("id_a", "id_b")
    println("n_cand_raw=" + candRaw.count())
    val cand = candRaw.distinct()
    println("n_cand=" + cand.count())
    // verify-join input volume: total array elements flowing into the
    // intersect = sum over pairs of (|A| + |B|)
    val aS = sets.select(col("__id").as("id_a"), size(col("__set")).as("na"))
    val bS = sets.select(col("__id").as("id_b"), size(col("__set")).as("nb"))
    val vol = cand.join(aS, Seq("id_a")).join(bS, Seq("id_b"))
      .agg(sum(col("na").cast("long") + col("nb").cast("long")),
           max(col("na")), max(col("nb"))).head
    println(s"verify_volume_elems=${vol.getLong(0)} maxA=${vol.getInt(1)} maxB=${vol.getInt(2)}")
    spark.stop()
  }
}
