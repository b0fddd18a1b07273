package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy-hitter aggregate: the classic guarantee under
  * real eviction and distributed merging, SQL parity, and the exact
  * route-then-verify operator on a skewed distribution. */
class FreqAggSpec extends AnyFunSuite {

  /** Zipf-ish skewed keys: key i appears ~N/i times — heavy head,
    * long tail, far more distinct keys than sketch capacity. */
  private def skewed(n: Int): Seq[Long] =
    (1 to n).flatMap { i => Seq.fill(math.max(1, n / i))(i.toLong) }

  test("freqLongs: Misra-Gries guarantee holds under eviction — " +
       "est <= true and true - est <= n/(cap+1), superset of heavies") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keys = skewed(400) // 400 distinct >> capacity 32
    val n = keys.size.toLong
    val cap = 32
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = keys.toDF("k")
      .repartition(7) // force real partial-buffer merging
      .agg(graft.functions.FreqAgg.freqLongs(col("k"), cap).as("c"))
      .selectExpr("inline(c)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size <= cap)
    got.foreach { case (k, est) =>
      assert(est <= truth(k), s"overcount on $k")
      assert(truth(k) - est <= n / (cap + 1), s"error bound broken on $k")
    }
    // every key with freq > n/(cap+1) must be present
    truth.filter(_._2 > n / (cap + 1)).keys.foreach { k =>
      assert(got.contains(k), s"heavy key $k missing")
    }
  }

  test("graft_freq_longs SQL form matches the Column form") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.GraftExtensions.install(spark)
    skewed(100).toDF("k").createOrReplaceTempView("freq_in")
    val viaSql = spark.sql(
      "SELECT inline(graft_freq_longs(k, 16)) FROM freq_in")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCol = skewed(100).toDF("k")
      .agg(graft.functions.FreqAgg.freqLongs(col("k"), 16).as("c"))
      .selectExpr("inline(c)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaCol)
  }

  test("heavyHitters: exact theta-heavy set on a skewed multi-group " +
       "input with capacity far below the distinct-key count") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (for (g <- Seq("a", "b"); k <- skewed(300))
                yield (g, k * (if (g == "a") 1 else 7)))
    val df = rows.toDF("g", "k")
    val got = graft.operators.Ranking
      .heavyHitters(df, Seq("g"), "k", thetaDen = 50, capacity = 64)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expect = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq
      .map { case ((g, k), c) => (g, k, c) }
      .groupBy(_._1)
      .flatMap { case (g, ks) =>
        val tot = ks.map(_._3).sum
        ks.filter(_._3 * 50 > tot).map { case (_, k, c) => (g, k, c, tot) }
      }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("heavyHitters rejects a capacity below thetaDen") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("g", "k")
    assertThrows[IllegalArgumentException] {
      graft.operators.Ranking.heavyHitters(df, Seq("g"), "k",
                                           thetaDen = 100, capacity = 50)
    }
  }
}
