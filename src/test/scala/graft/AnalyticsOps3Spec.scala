package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 session-3 additions: lakehouse MERGE, the
  * survival life table, session-path mining, CUSUM change-point scan,
  * concentration (Gini) sums, grouped mode, and trend sums. */
class AnalyticsOps3Spec extends AnyFunSuite {

  test("mergeUpsert: compaction picks the latest op per key; U/D " +
       "apply with MERGE semantics, absent-key deletes are no-ops") {
    val spark = TestSpark.spark
    import spark.implicits._
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    // key 1: U then later D -> deleted; key 2: D then later U ->
    // resurrected with the new payload; key 4: U of a new key ->
    // insert; key 9: D of an absent key -> no-op
    val chg = Seq(
      (1L, "a2", 11L, "U", 1L, 1L), (1L, "gone", 0L, "D", 2L, 2L),
      (2L, "dead", 0L, "D", 1L, 3L), (2L, "b2", 22L, "U", 2L, 4L),
      (4L, "d", 40L, "U", 1L, 5L), (9L, "x", 0L, "D", 1L, 6L)
    ).toDF("k", "name", "v", "op", "ts", "oid")
    val got = graft.operators.Temporal
      .mergeUpsert(snap, chg, Seq("k"), "op", Seq("ts", "oid"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set((2L, "b2", 22L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("mergeUpsert: timestamp ties compact on the id tiebreaker") {
    val spark = TestSpark.spark
    import spark.implicits._
    val snap = Seq((1L, 0L)).toDF("k", "v")
    val chg = Seq((1L, 7L, "U", 5L, 1L), (1L, 8L, "U", 5L, 2L))
      .toDF("k", "v", "op", "ts", "oid")
    val got = graft.operators.Temporal
      .mergeUpsert(snap, chg, Seq("k"), "op", Seq("ts", "oid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 8L)))
  }

  test("lifeTable: churn vs censoring at the corpus horizon and " +
       "suffix-sum at-risk counts") {
    val spark = TestSpark.spark
    import spark.implicits._
    // periods (sec/1): u1 lives [0,2] churns (horizon 5), u2 [1,1]
    // churns at duration 0, u3 [3,5] censored (active at horizon),
    // u4 [5,5] censored at duration 0
    val e = Seq((1L, 0L), (1L, 2L), (2L, 1L), (3L, 3L), (3L, 5L),
                (4L, 5L))
      .toDF("k", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    val got = graft.operators.Temporal
      .lifeTable(e, "k", "ts", periodSeconds = 1L)
      .orderBy("duration")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // duration 0: events u2, censored u4, at risk all 4
    // duration 2: events u1, censored u3, at risk 2
    assert(got.toSeq == Seq((0L, 4L, 1L, 1L), (2L, 2L, 1L, 1L)))
  }

  test("topPaths: gap splits sessions, prefixes truncate with a " +
       "marker, and counts/ties are deterministic") {
    val spark = TestSpark.spark
    import spark.implicits._
    // user 1: a,b then (gap) a,b — two 'a>b' sessions
    // user 2: one 7-step session a>a>a>a>a>… (truncated at 5)
    // user 3: single c — path 'c'
    val rows =
      Seq((1L, 0L, "a"), (1L, 10L, "b"), (1L, 1000L, "a"),
          (1L, 1010L, "b"), (3L, 0L, "c")) ++
        (0 until 7).map(i => (2L, i.toLong * 10L, "a"))
    val e = rows.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t, ty, i.toLong) }
      .toDF("u", "sec", "t", "id")
      .withColumn("ts", col("sec").cast("timestamp"))
    val got = graft.operators.Funnel
      .topPaths(e, "u", "ts", "id", "t", gapSeconds = 100L,
                maxSteps = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b", 2L), ("a>a>a>a>a>…", 1L), ("c", 1L)))
  }

  test("cusumScan: the scaled CUSUM peaks at the level-shift point " +
       "with the earliest-period tie-break") {
    val spark = TestSpark.spark
    import spark.implicits._
    // group g: periods 1..4 with counts 1,1,5,5 — mean 3, S peaks
    // (in |.|) after period 2: n*S = 4*2-2*12 = -16
    val rows = Seq.fill(1)((0, "g", 1L)) ++ Seq.fill(1)((0, "g", 2L)) ++
      Seq.fill(5)((0, "g", 3L)) ++ Seq.fill(5)((0, "g", 4L))
    val df = rows.toDF("pad", "g", "p")
    val got = graft.operators.Monitoring.cusumScan(df, "g", "p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("g", 2L, 16L, 4L, 12L)))
  }

  test("groupedConcentration: doubled-rank sums match the sorted " +
       "brute force on a tied distribution, negatives excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val vals = Seq(5L, 5L, 10L, 0L, 20L, -3L)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = graft.operators.DistributedRank
      .groupedConcentration(df, "g", "v", bucketWidth = 4L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .head
    val sorted = vals.filter(_ >= 0).sorted // 0,5,5,10,20
    val n = sorted.size.toLong
    val s = sorted.sum
    // sum of i*v over ANY tie permutation = sorted-order sum; w2 = 2x
    val w2 = 2L * sorted.zipWithIndex
      .map { case (v, i) => (i + 1).toLong * v }.sum
    assert(got == (n, s, w2))
  }

  test("groupedMode: highest count wins, smallest value on ties") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 3L), ("a", 1L), ("a", 1L), ("a", 9L),
                 ("b", 2L)).toDF("g", "v")
    val got = graft.operators.Histograms.groupedMode(df, "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 1L, 2L, 5L), ("b", 2L, 1L, 1L)))
  }

  test("intervalUnion: overlapping and touching intervals merge, " +
       "gaps split runs, coverage is exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // key a: [0,10) ∪ [5,12) ∪ [12,15) -> one run covering 15;
    // [20,21) -> second run of 1. key b: empty interval dropped.
    val df = Seq(("a", 0L, 10L), ("a", 5L, 12L), ("a", 12L, 15L),
                 ("a", 20L, 21L), ("b", 3L, 3L))
      .toDF("k", "s", "e")
    val got = graft.operators.Temporal.intervalUnion(df, "k", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", 16L, 2L, 4L)))
  }

  test("groupedWeightedQuantile: cumulative-weight crossing picks " +
       "the weighted median; zero-weight rows excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    // g: values 1(w=1), 5(w=3), 9(w=2); W=6, ceil(6/2)=3 -> cum at
    // 5 is 4 >= 3 and 4-3 < 3 -> median 5. Zero-weight 100 ignored.
    val df = Seq(("g", 1L, 1L), ("g", 5L, 3L), ("g", 9L, 2L),
                 ("g", 100L, 0L)).toDF("g", "v", "w")
    val got = graft.operators.Histograms
      .groupedWeightedQuantile(df, "g", "v", "w", 1, 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("g", 5L, 6L, 3L)))
  }

  test("kCoreSurvivors: cascading peel strips a tail chain round by " +
       "round and keeps the triangle core") {
    val spark = TestSpark.spark
    import spark.implicits._
    // path 1-2-3-4 hanging off triangle {4,5,6}; k=2 peels one chain
    // vertex per round: r1 drops 1, r2 drops 2, r3 drops 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L),
                    (5L, 6L), (6L, 5L)) // reversed dup canonicalized
      .toDF("x", "y")
    val got = graft.operators.Graph
      .kCoreSurvivors(edges, "x", "y", k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got == Set((4L, 2L), (5L, 2L), (6L, 2L)))
    // one fewer round leaves the last chain vertex still attached
    val got2 = graft.operators.Graph
      .kCoreSurvivors(edges, "x", "y", k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got2 == Set((3L, 1L), (4L, 3L), (5L, 2L), (6L, 2L)))
  }

  test("groupedTrendSums: exact sufficient statistics recover the " +
       "known slope") {
    val spark = TestSpark.spark
    import spark.implicits._
    // y = 3x + 2 exactly: slope numerator/denominator must agree
    val df = Seq((0L, 2L), (1L, 5L), (2L, 8L), (3L, 11L))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = graft.operators.Histograms
      .groupedTrendSums(df, "g", "x", "y").collect().head
    val (n, sx, sy, sxy, sxx) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
       r.getLong(5))
    assert((n, sx, sy, sxy, sxx) == (4L, 6L, 26L, 54L, 14L))
    assert((n * sxy - sx * sy) == 3L * (n * sxx - sx * sx))
  }
}
