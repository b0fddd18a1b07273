package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.ExactFit

    // 1. empty input through ExactFit.fit: was an opaque
    // IllegalStateException, must now be the guarded zero fit
    val li = spark.read
      .parquet("/root/testdata/sf0.01/lineitem.parquet")
    val empty = li.where(col("l_quantity") < -1)
    val pwSpec = ExactFit.PWSpec(
      knots = Array(10.0, 25.0, 40.0), xScale = 100L, yScale = 100L,
      condPow2 = 4096.0, trend = Some("ascending"))
    val z = ExactFit.fit(empty, col("l_quantity"),
                         col("l_extendedprice"), pwSpec)
    println(s"[info] EMPTY-PW a=${z.a} s0=${z.slope(0)} mask=${z.mask}")
    assert(z.a == 0.0 && z.slope(0) == 0.0)

    // 2. empty input through the OLS surface
    val olsSpec = ExactFit.OLSSpec(Seq(1L, 10L), 1L, Seq(8.0, 4096.0))
    val zo = ExactFit.fitOLS(empty, Seq(col("l_linenumber"),
                                        col("l_quantity")),
                             col("l_extendedprice"), olsSpec)
    println(s"[info] EMPTY-OLS a=${zo.intercept} b0=${zo.slope(0)} " +
            s"r2=${zo.r2}")
    assert(zo.intercept == 0.0 && zo.r2 == 0.0)

    // 3. non-degenerate fits still solve (guards must not change the
    // live branch): OLS on the per-order rollup, r2 in (0, 1)
    val po = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sq"),
           sum(round(col("l_extendedprice") * 100).cast("long"))
             .as("cents"))
    val f = ExactFit.fitOLS(po, Seq(col("cnt"), col("sq")),
                            col("cents"), olsSpec)
    println(f"[info] LIVE-OLS r2=${f.r2}%.4f b0=${f.slope(0)}%.2f")
    assert(f.r2 > 0.5 && f.r2 < 1.0)

    // 4. bpeEncode with ZERO merges (single-char-word corpus) — was a
    // require-crash, must now equal the char-split baseline
    import spark.implicits._
    val chars = Seq("a b c", "a b", "c c c").toDF("text")
    val enc = graft.pipeline.Tokenizer.bpeEncode(chars, "text", Nil)
      .collect()(0)
    println(s"[info] EMPTY-MERGES $enc")
    assert(enc.getAs[Long]("base_tokens") ==
           enc.getAs[Long]("encoded_tokens"))
    assert(enc.getAs[Long]("merged_occurrences") == 0L)

    println("[info] DRIVE OK")
    spark.stop()
  }
}
