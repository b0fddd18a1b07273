package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-9 session additions beyond the scorecard
  * analytics family: vintage curves and the pure-BIGINT seasonal
  * decomposition. */
class Round9OpsSpec extends AnyFunSuite {

  test("vintageCurves: per-cohort cumulative events, cohort totals, " +
       "truncated-ppm rate; age gaps emit no row") {
    val spark = TestSpark.spark
    import spark.implicits._
    // cohort A: ages 0 (n=2 e=1), 2 (n=1 e=1)   -- age 1 absent
    // cohort B: age 0 (n=3 e=0)
    val facts = Seq(
      ("A", 0L, 1L), ("A", 0L, 0L), ("A", 2L, 1L),
      ("B", 0L, 0L), ("B", 0L, 0L), ("B", 0L, 0L)
    ).toDF("cohort", "age", "ev")
    val got = graft.operators.Temporal
      .vintageCurves(facts, col("cohort"), col("age"), col("ev"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5),
                 r.getLong(6)))
    assert(got.toSeq == Seq(
      ("A", 0L, 2L, 1L, 1L, 3L, 333333L),
      ("A", 2L, 1L, 1L, 2L, 3L, 666666L),
      ("B", 0L, 3L, 0L, 0L, 3L, 0L)))
  }

  test("seasonalDecomposeDaily: zero-filled spine, centered 7-day " +
       "trend, interior-days-only dow profile, exact integers") {
    val spark = TestSpark.spark
    import spark.implicits._
    // group g over 9 consecutive days (2024-01-01 Mon .. 01-09 Tue),
    // counts: 1,2,3,4,5,6,7,0,9 (day 8 silent -> zero-filled).
    // Interior days are d4..d6 (i in 4..6 of 9):
    //   d4 (Thu): n=4, trend7=1+2+3+4+5+6+7=28, detr=28-28=0
    //   d5 (Fri): n=5, trend7=2+..+7+0=27,      detr=35-27=8
    //   d6 (Sat): n=6, trend7=3+..+7+0+9=34,    detr=42-34=8
    val counts = Seq(1, 2, 3, 4, 5, 6, 7, 9)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      val day = if (n == 9) 9 else i + 1 // day 8 silent
      Seq.fill(n)(("g", Timestamp.valueOf(f"2024-01-0$day 12:00:00")))
    }
    val got = graft.operators.Monitoring
      .seasonalDecomposeDaily(rows.toDF("event_type", "ts"),
                              "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5)))
    // dow: 2024-01-04 is Thursday=4, 05 Fri=5, 06 Sat=6 (Sunday=0)
    assert(got.toSeq == Seq(
      ("g", 4L, 1L, 4L, 0L, 28L),
      ("g", 5L, 1L, 5L, 8L, 27L),
      ("g", 6L, 1L, 6L, 8L, 34L)))
  }

  test("seasonalDecomposeDaily: a series shorter than 7 days yields " +
       "no interior rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 5).map(d =>
      ("g", Timestamp.valueOf(f"2024-01-0$d 00:00:01")))
    val got = graft.operators.Monitoring
      .seasonalDecomposeDaily(rows.toDF("event_type", "ts"),
                              "event_type", "ts")
    assert(got.count() == 0L)
    spark.catalog.clearCache()
  }

  test("itemNeighbors: basket-Jaccard top-k per item, exact ppm, " +
       "rate ties impossible by construction here") {
    val spark = TestSpark.spark
    import spark.implicits._
    // b1:{1,2,3} b2:{1,2} b3:{2,3} b4:{1}; supports c1=3 c2=3 c3=2
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
                 (30L, 2L), (30L, 3L), (40L, 1L))
      .toDF("basket", "item")
    val got = graft.operators.MarketBasket
      .itemNeighbors(df, "basket", "item", k = 2)
      .orderBy("item", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 500000L, 2L, 3L, 3L),   // j(1,2)=2/4
      (1L, 2L, 3L, 250000L, 1L, 3L, 2L),   // j(1,3)=1/4
      (2L, 1L, 3L, 666666L, 2L, 3L, 2L),   // j(2,3)=2/3
      (2L, 2L, 1L, 500000L, 2L, 3L, 3L),
      (3L, 1L, 2L, 666666L, 2L, 2L, 3L),
      (3L, 2L, 1L, 250000L, 1L, 2L, 3L)))
    spark.catalog.clearCache()
  }

  test("itemNeighbors: jaccard ties rank the smaller neighbor first " +
       "(the topkLongs id-asc tie-break)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // item 1 co-occurs once with each of 5 and 9, all supports equal:
    // identical jaccard, so rank 1 must be neighbor 5
    val df = Seq((10L, 1L), (10L, 5L), (20L, 1L), (20L, 9L),
                 (30L, 5L), (30L, 9L))
      .toDF("basket", "item")
    val got = graft.operators.MarketBasket
      .itemNeighbors(df, "basket", "item", k = 2)
      .where(col("item") === 1L).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 5L), (2L, 9L)))
    spark.catalog.clearCache()
  }

  test("bpeMerges: textbook two-round merge with weighted counts and " +
       "corpus token totals") {
    val spark = TestSpark.spark
    import spark.implicits._
    // vocab: "ab" x3, "abc" x3 -> round 1 merges (a,b) f=6,
    // round 2 merges (ab,c) f=3
    val docs = Seq("ab ab abc", "ab abc abc").toDF("text")
    val got = graft.pipeline.Tokenizer.bpeMerges(docs, "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", "ab", 6L, 9L),
      (2L, "ab", "c", "abc", 3L, 6L)))
  }

  test("bpeMerges: frequency ties break lexicographically; repeated " +
       "symbols merge left-to-right non-overlapping") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "xy" and "zw" tie at f=1 -> (x,y) wins; "aaa" has pair (a,a)
    // f=2 and merges to "aa a" (non-overlapping), 2 symbols left
    val tie = graft.pipeline.Tokenizer
      .bpeMerges(Seq("xy zw").toDF("text"), "text", 1).collect()(0)
    assert((tie.getString(1), tie.getString(2)) == (("x", "y")))
    val tri = graft.pipeline.Tokenizer
      .bpeMerges(Seq("aaa").toDF("text"), "text", 1).collect()(0)
    assert((tri.getString(3), tri.getLong(4), tri.getLong(5)) ==
           (("aa", 2L, 2L)))
  }

  test("lpaCommunities: a triangle converges to the min label; the " +
       "synchronous min-tie rounds replay exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val got = graft.operators.Graph.lpaCommunities(tri, "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 3L)))
    spark.catalog.clearCache()
  }

  test("lpaCommunities: the 3-path after 3 synchronous rounds lands " +
       "on the hand-computed oscillation state") {
    val spark = TestSpark.spark
    import spark.implicits._
    // path 1-2-3: r1 (2,1,2) r2 (1,2,1) r3 (2,1,2) — deterministic
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = graft.operators.Graph.lpaCommunities(path, "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 2L, 2L), (2L, 2L, 1L, 3L)))
    spark.catalog.clearCache()
  }

  test("freshness: per-source lag vs the freshest source, last-" +
       "calendar-day volume, stale flag at the exact boundary") {
    val spark = TestSpark.spark
    import spark.implicits._
    // corpus max = day 2 12:00 (source b). source a last delivered
    // day 1 12:00 -> lag exactly 86400s (> 21600 -> stale). a has 2
    // events on day 1, none on the last day; b has 1 on each day.
    val rows = Seq(
      ("a", Timestamp.valueOf("2024-01-01 11:00:00")),
      ("a", Timestamp.valueOf("2024-01-01 12:00:00")),
      ("b", Timestamp.valueOf("2024-01-01 09:00:00")),
      ("b", Timestamp.valueOf("2024-01-02 12:00:00")))
      .toDF("source", "ts")
    val got = graft.operators.QualityChecks
      .freshness(rows, "source", "ts", staleAfterS = 21600L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("a", 2L, 86400L, 0L, 1L),
                            ("b", 2L, 0L, 1L, 0L)))
  }

  test("forecastEval: lag-7 naive errors on the zero-filled spine; " +
       "|error| ties pick the earliest worst day") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 9 consecutive days with counts 1..9: only days 8 and 9 score
    // (full lag), both with error +7 — worst day is the EARLIER one
    val rows = (1 to 9).flatMap(d =>
      Seq.fill(d)(("g", Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"))))
    val got = graft.operators.Monitoring
      .forecastEval(rows.toDF("event_type", "ts"), "event_type", "ts",
                    lagDays = 7)
      .collect()(0)
    // 2024-01-08 is epoch day 19730
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
            got.getLong(4), got.getLong(5)) ==
           ((2L, 17L, 14L, 14L, 19730L)))
    spark.catalog.clearCache()
  }

  test("cuped: pooled theta from integer sufficient statistics and " +
       "covariate-adjusted arm means, hand-exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // n=4 Sx=6 Sy=8 Sxy=18 Sxx=14 -> theta = 24/20 = 1.2
    // t0: mean_y 1, adj 1 - 1.2*(1 - 1.5) = 1.6
    // t1: mean_y 3, adj 3 - 1.2*(2 - 1.5) = 2.4
    val units = Seq((0L, 0L, 0L), (0L, 2L, 2L), (1L, 1L, 2L),
                    (1L, 3L, 4L)).toDF("t", "x", "y")
    val got = graft.operators.Experiment.cuped(units, "t", "x", "y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq((0L, 2L, 2L, 2L, 1.2, 1.0, 1.6),
                            (1L, 2L, 4L, 6L, 1.2, 3.0, 2.4)))
  }

  test("cuped: zero covariate variance takes theta 0 (plain means)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val units = Seq((0L, 5L, 1L), (1L, 5L, 3L)).toDF("t", "x", "y")
    val got = graft.operators.Experiment.cuped(units, "t", "x", "y")
      .collect().map(r => (r.getDouble(4), r.getDouble(6)))
    assert(got.toSeq == Seq((0.0, 1.0), (0.0, 3.0)))
  }

  test("srmCheck: chi-square vs the 50/50 split; flags only past " +
       "the 95% critical value") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ok = graft.operators.Experiment
      .srmCheck(Seq(0L, 0L, 0L, 1L).toDF("t"), "t").collect()(0)
    assert((ok.getLong(0), ok.getLong(1), ok.getDouble(3),
            ok.getLong(4)) == ((3L, 1L, 1.0, 0L)))
    val bad = graft.operators.Experiment
      .srmCheck((Seq.fill(30)(0L) ++ Seq.fill(10)(1L)).toDF("t"), "t")
      .collect()(0)
    assert((bad.getDouble(3), bad.getLong(4)) == ((10.0, 1L)))
  }

  test("diffInDiff: 2x2 cell means and the interaction effect, " +
       "hand-exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, 0L, 1L), (0L, 0L, 3L), (0L, 1L, 4L),
                 (1L, 0L, 2L), (1L, 1L, 7L)).toDF("t", "p", "y")
    val got = graft.operators.Experiment.diffInDiff(df, "t", "p", "y")
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
            got.getLong(3)) == ((2L, 1L, 1L, 1L)))
    assert((got.getDouble(4), got.getDouble(5), got.getDouble(6),
            got.getDouble(7), got.getDouble(8)) ==
           ((2.0, 4.0, 2.0, 7.0, 3.0)))
  }

  test("diffInDiffBySegment: per-segment 2x2; an empty cell yields " +
       "NaN effect instead of dropping the segment") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("A", 0L, 0L, 1L), ("A", 0L, 0L, 3L), ("A", 0L, 1L, 4L),
                 ("A", 1L, 0L, 2L), ("A", 1L, 1L, 7L),
                 ("B", 0L, 0L, 5L), ("B", 1L, 1L, 9L))
      .toDF("seg", "t", "p", "y")
    val got = graft.operators.Experiment
      .diffInDiffBySegment(df, "seg", "t", "p", "y")
      .collect()
    assert(got(0).getString(0) == "A" && got(0).getDouble(9) == 3.0)
    assert(got(1).getString(0) == "B" &&
           got(1).getDouble(9).isNaN && got(1).getLong(2) == 0L)
  }

  test("abPower: pooled rate, MDE via IEEE sqrt, powered flag on the " +
       "rounded readouts") {
    val spark = TestSpark.spark
    import spark.implicits._
    // n0=100 conv0=10, n1=100 conv1=30 -> p=0.2, obs diff 0.2
    val units = (Seq.fill(10)((0L, 1L)) ++ Seq.fill(90)((0L, 0L)) ++
                 Seq.fill(30)((1L, 1L)) ++ Seq.fill(70)((1L, 0L)))
      .toDF("t", "conv")
    val got = graft.operators.Experiment.abPower(units, "t", "conv")
      .collect()(0)
    val mde = BigDecimal((1.959964 + 0.841621) *
        math.sqrt(2.0 * 0.2 * 0.8 / 100.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
            got.getLong(3), got.getLong(4)) ==
           ((100L, 10L, 100L, 30L, 200000L)))
    assert((got.getDouble(5), got.getDouble(6), got.getLong(7)) ==
           ((mde, 0.2, 1L)))
  }
}
