package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-10 session additions: the documented
  * shared-delimiter replace semantics of the BPE merge, ANSI-safe
  * argmax encodings on negative keys, and the zero-event guards in
  * the deployment analytics. */
class Round10OpsSpec extends AnyFunSuite {

  test("bpeMerges golden: back-to-back even repeats ('a a a a') merge " +
       "once per round — the shared boundary space is consumed") {
    val spark = TestSpark.spark
    import spark.implicits._
    // word "aaaa" -> syms "a a a a": round 1 counts (a,a) freq=3 but
    // the replace applies ONE merge (" a a a a " -> " aa a a "), so 3
    // symbols remain; round 2 ties (a,a) f=1 vs (aa,a) f=1 and the
    // left-asc tie-break picks (a,a) -> "aa aa", 2 symbols
    val got = graft.pipeline.Tokenizer
      .bpeMerges(Seq("aaaa").toDF("text"), "text", 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", "aa", 3L, 3L),
      (2L, "a", "a", "aa", 1L, 2L)))
  }

  test("bpeMerges golden: alternating repeats ('a b a b') also merge " +
       "alternately — freq reports 2, the replace applies 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.pipeline.Tokenizer
      .bpeMerges(Seq("abab").toDF("text"), "text", 1).collect()(0)
    assert((got.getString(1), got.getString(2), got.getString(3),
            got.getLong(4), got.getLong(5)) ==
           (("a", "b", "ab", 2L, 3L)))
  }

  test("lpaCommunities: NEGATIVE node ids are ANSI-safe and the " +
       "cnt-desc/label-asc argmax still holds") {
    val spark = TestSpark.spark
    import spark.implicits._
    // triangle on negative ids: converges to the min label -3
    val tri = Seq((-1L, -2L), (-1L, -3L), (-2L, -3L)).toDF("a", "b")
    val got = graft.operators.Graph.lpaCommunities(tri, "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    assert(got.toSeq == Seq((-3L, 3L, -3L, -1L)))
    spark.catalog.clearCache()
  }

  test("forecastEval: pre-1970 timestamps (negative epoch days) give " +
       "a valid worst_day_epoch_d") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ts = Seq(
      ("g", java.sql.Timestamp.valueOf("1969-12-20 01:00:00")),
      ("g", java.sql.Timestamp.valueOf("1969-12-21 01:00:00")),
      ("g", java.sql.Timestamp.valueOf("1969-12-21 02:00:00")),
      ("g", java.sql.Timestamp.valueOf("1969-12-22 01:00:00"))
    ).toDF("g", "ts")
    val got = graft.operators.Monitoring
      .forecastEval(ts, "g", "ts", lagDays = 1).collect()(0)
    // days: 12-20 n=1, 12-21 n=2, 12-22 n=1; lag-1 preds score
    // 12-21 (err +1) and 12-22 (err -1): abs tie -> EARLIEST day,
    // 1969-12-21 = epoch day -11
    assert(got.getAs[Long]("worst_day_epoch_d") == -11L)
    spark.catalog.clearCache()
  }

  test("gainsTable: a zero-event population degrades to null " +
       "capture/lift instead of an ANSI divide-by-zero") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, 0), (0L, 0), (1L, 0)).toDF("b", "y")
    val got = graft.operators.ScorecardAnalytics
      .gainsTable(df, col("b"), "y").collect()
    assert(got.length == 2)
    assert(got.forall(r => r.isNullAt(r.fieldIndex("capture_ppm")) &&
                           r.isNullAt(r.fieldIndex("lift6"))))
    // depth is population-only and stays defined
    assert(got.map(_.getAs[Long]("depth_ppm")).toSeq ==
           Seq(666666L, 1000000L))
  }
}
