package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DistributedRank, QualityChecks, Segmentation}

/** RFM segmentation, global row number, FD profiling. */
class SegmentationSpec extends AnyFunSuite {

  test("withGlobalRowNumber: equals the single-window row_number " +
       "under (value, tie) for any bucket width") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((10L, 1L), (10L, 2L), (-5L, 3L), (7L, 4L), (10L, 0L),
                 (-5L, 9L), (0L, 8L)).toDF("v", "id")
    val expected = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("v", "id")))
      .select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    for (w <- Seq(1L, 3L, 100L)) {
      val got = DistributedRank.withGlobalRowNumber(df, "v", "id", w, "rn")
        .select(col("id"), col("rn"), col("__n")).collect()
      assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap === expected,
             s"width=$w")
      assert(got.forall(_.getLong(2) == 7L))
    }
  }

  test("rfmSegments: monotone customer ladder lands in the diagonal " +
       "segments; totals preserved") {
    val spark = TestSpark.spark
    import spark.implicits._
    // customer i (1..10): i orders of $i on day 2020-01-i — every
    // metric ranks customers 1..10 in the same order, so scores agree
    // across R/F/M and segments sit on the 111..555 diagonal, two
    // customers per band
    val rows = for {
      i <- 1 to 10
      _ <- 1 to i
    } yield (i.toLong, Timestamp.valueOf(f"2020-01-$i%02d 12:00:00"),
             i.toDouble)
    val orders = rows.toDF("c", "d", "p")
    val out = Segmentation.rfmSegments(orders, "c", "d", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(111L, 222L, 333L, 444L, 555L))
    assert(out.map(_._2).toSeq === Seq(2L, 2L, 2L, 2L, 2L))
    // customer i contributes i orders x i dollars = i*i*100 cents
    def cents(is: Seq[Int]) = is.map(i => i.toLong * i * 100).sum
    assert(out.map(_._3).toSeq ===
           Seq(cents(Seq(1, 2)), cents(Seq(3, 4)), cents(Seq(5, 6)),
               cents(Seq(7, 8)), cents(Seq(9, 10))))
  }

  test("behaviorCohorts: bit folds, untracked-only users land in " +
       "cohort 0") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = Seq((1L, "view"), (1L, "click"), (2L, "purchase"),
                (3L, "view"), (3L, "click"), (3L, "purchase"),
                (3L, "view"), (4L, "error")).toDF("u", "t")
    val out = graft.operators.Funnel
      .behaviorCohorts(e, "u", "t", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 1L, 1L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("eventGapProfile: per-key gaps under (ts, id) order; exact " +
       "discrete median; single-event keys contribute nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 25L, 3L),
                (2L, 100L, 4L))
      .toDF("u", "sec", "id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = graft.operators.Temporal
      .eventGapProfile(e, "u", "ts", "id").collect().head
    // gaps: 10, 15 -> median = ceil(2/2) = 1st smallest = 10
    assert(r.toSeq === Seq(2L, 10L, 15L, 25L, 10L))
    spark.catalog.clearCache()
  }

  test("keyGapAudit: bucketed adjacency equals the global-sort gaps, " +
       "empty buckets stitch, dense sequences report null gap") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 7L, 20L, 20L).toDF("k")
    val r = graft.operators.QualityChecks.keyGapAudit(df, "k", 5L)
      .collect().head
    // gaps: 4..6 after 3 (len 3), 8..19 after 7 (len 12)
    assert(r.toSeq === Seq(5L, 1L, 20L, 15L, 2L, 12L, 7L))
    val dense = graft.operators.QualityChecks
      .keyGapAudit((5L to 9L).toDF("k"), "k", 3L).collect().head
    assert((dense.getLong(0), dense.getLong(3), dense.getLong(4)) ===
           ((5L, 0L, 0L)))
    assert(dense.isNullAt(5) && dense.isNullAt(6))
    spark.catalog.clearCache()
  }

  test("periodDeltas: value-keyed lag skips gaps, truncated ppm on " +
       "negative deltas, null prev at the range start") {
    val spark = TestSpark.spark
    import spark.implicits._
    // type a: days 0 (2 events), 1 (3), 8 (5); day 8's prior week is
    // day 1; type b: day 8 (1) with prior-week day 1 (3)
    val rows = Seq.fill(2)(("a", 0L)) ++ Seq.fill(3)(("a", 1L)) ++
      Seq.fill(5)(("a", 8L)) ++ Seq.fill(3)(("b", 1L)) ++ Seq(("b", 8L))
    val e = rows.toDF("t", "day")
      .withColumn("ts", timestamp_seconds(col("day") * 86400L))
    val out = graft.operators.Temporal
      .periodDeltas(e, "ts", "t", 86400L, 7)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("a", 0L)).isNullAt(3)) // no prior week
    val a8 = out(("a", 8L))
    assert((a8.getLong(2), a8.getLong(3), a8.getLong(4), a8.getLong(5))
           === ((5L, 3L, 2L, 666666L)))
    val b8 = out(("b", 8L))
    assert((b8.getLong(4), b8.getLong(5)) === ((-2L, -666666L)))
    spark.catalog.clearCache()
  }

  test("rollingActive: coverage explode equals the window-distinct " +
       "definition; unobserved days emit nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = Seq((1L, 0L), (1L, 3L), (2L, 3L), (1L, 3L))
      .toDF("u", "day")
      .withColumn("ts", timestamp_seconds(col("day") * 86400L))
    val out = graft.operators.Temporal.rollingActive(e, "u", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 1L, 1L), (3L, 2L, 2L)))
    spark.catalog.clearCache()
  }

  test("growthAccounting: new/retained/resurrected partition dau; " +
       "churn equals yesterday's dau minus retained; gaps resurrect") {
    val spark = TestSpark.spark
    import spark.implicits._
    // u1 active d0,d1,d3; u2 active d1; u3 active d3
    val e = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L), (3L, 3L))
      .toDF("u", "day")
      .withColumn("ts", timestamp_seconds(col("day") * 86400L))
    val out = graft.operators.Temporal.growthAccounting(e, "u", "ts")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // d0: u1 new            -> dau 1, new 1, ret 0, res 0, churn 0
    assert(out(0L) === Seq(1L, 1L, 0L, 0L, 0L))
    // d1: u1 retained, u2 new -> churn = dau(0) - ret(1) = 0
    assert(out(1L) === Seq(2L, 1L, 1L, 0L, 0L))
    // d3: u1 resurrected (gap), u3 new; d2 unobserved -> churn 0
    assert(out(3L) === Seq(2L, 1L, 0L, 1L, 0L))
    spark.catalog.clearCache()
  }

  test("locfFill: corpus spine, carry-forward across gaps, null " +
       "before a key's first observation") {
    val spark = TestSpark.spark
    import spark.implicits._
    // key a observes periods 0 (2 events) and 2 (1); key b period 1
    // only -> corpus spine [0, 2]
    val e = Seq(("a", 0L), ("a", 0L), ("a", 2L), ("b", 1L))
      .toDF("k", "p")
      .withColumn("ts", timestamp_seconds(col("p") * 100L))
    val out = graft.operators.Temporal.locfFill(e, "k", "ts", 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(("a", 0L)) === ((Some(2L), Some(2L))))
    assert(out(("a", 1L)) === ((None, Some(2L)))) // carried
    assert(out(("a", 2L)) === ((Some(1L), Some(1L))))
    assert(out(("b", 0L)) === ((None, None))) // before first obs
    assert(out(("b", 1L)) === ((Some(1L), Some(1L))))
    assert(out(("b", 2L)) === ((None, Some(1L)))) // carried
    spark.catalog.clearCache()
  }

  test("dupStatsBySource: within-source groups, null-text uniqueness, " +
       "largest clone group") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = Seq(
      ("A", 1L, Some("same text")), ("A", 2L, Some("same  TEXT ")),
      ("A", 3L, Some("unique")), ("A", 4L, None),
      ("B", 5L, Some("same text"))
    ).toDF("source", "doc_id", "text")
    val out = graft.pipeline.Dedup
      .dupStatsBySource(d, "text", "doc_id", "source", portable = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("A") === ((4L, 3L, 1L, 2L))) // whitespace/case fold dups
    assert(out("B") === ((1L, 1L, 0L, 1L)))
  }

  test("crossSourceDupes: pair matrix over distinct fingerprints, " +
       "within-source copies and null text contribute nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = Seq(
      ("A", 1L, Some("x")), ("A", 2L, Some("x")), // within-A copy
      ("B", 3L, Some("x")), ("C", 4L, Some("x")), // x spans A,B,C
      ("B", 5L, Some("y")), ("C", 6L, Some("y")), // y spans B,C
      ("A", 7L, Some("z")), ("A", 8L, None), ("B", 9L, None)
    ).toDF("source", "doc_id", "text")
    val out = graft.pipeline.Dedup
      .crossSourceDupes(d, "text", "doc_id", "source", portable = true)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("A", "B") -> 1L, ("A", "C") -> 1L,
                       ("B", "C") -> 2L))
    spark.catalog.clearCache()
  }

  test("fdAudit: holding and violated dependencies, null-rhs world, " +
       "violating-row accounting") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, "a", Some(10L)), (1L, "a", Some(10L)), // group 1: clean
      (2L, "b", Some(20L)), (2L, "c", Some(20L)), // 2: x->y violated
      (3L, "d", None), (3L, "d", Some(30L)),      // 3: null+value = 2 worlds
      (4L, "e", None)                             // 4: null only -> dy=1
    ).toDF("x", "y", "z")
    val out = QualityChecks
      .fdAudit(df, Seq(("x", "y"), ("x", "z")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // x->y: group 2 violates (b,c); 4 groups, 2 rows inside
    assert(out("x->y") === ((4L, 1L, 2L, 2L)))
    // x->z: group 3 violates (null + 30); group 4 holds (dy = 1)
    assert(out("x->z") === ((4L, 1L, 2L, 2L)))
  }
}
