package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 analytics additions: 2-D skyline, sweep-line
  * peak concurrency, bounded-hop BFS, and PMI collocation lift. */
class AnalyticsOps2Spec extends AnyFunSuite {

  test("skyline2d matches the brute-force dominance frontier and " +
       "keeps exact-duplicate optima") {
    val spark = TestSpark.spark
    import spark.implicits._
    // deterministic scatter plus a duplicated frontier point
    val pts = ((1 to 60).map { i =>
      (i.toLong, (i * 37 % 50 + 1).toLong, (i * 53 % 40 + 1).toLong)
    } :+ (61L, 1L, 40L) :+ (62L, 1L, 40L)) // duplicate optimum pair
    val df = pts.toDF("id", "price", "quality")
    val got = graft.operators.Skyline
      .skyline2d(df, "price", "quality", Seq("id"), bucketWidth = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val expect = pts.filter { case (_, p, q) =>
      !pts.exists { case (_, p2, q2) =>
        p2 <= p && q2 >= q && (p2 < p || q2 > q) }
    }.toSet
    assert(got == expect)
    assert(got.exists(_._1 == 61L) && got.exists(_._1 == 62L))
  }

  test("skyline2d handles negative minimize values across the " +
       "floor-division bucket boundary") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pts = Seq((1L, -15L, 5L), (2L, -3L, 9L), (3L, -3L, 9L),
                  (4L, 0L, 10L), (5L, 2L, 11L), (6L, -15L, 4L))
    val got = graft.operators.Skyline
      .skyline2d(pts.toDF("id", "mn", "mx"), "mn", "mx", Seq("id"),
                 bucketWidth = 4L)
      .collect().map(_.getLong(0)).toSet
    // 6 dominated by 1; 4 dominated by 5? no: 5 has larger mn — both stay
    assert(got == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("peakConcurrency sweeps day-split intervals exactly: " +
       "touching intervals never overlap, midnight-crossers count " +
       "in both days") {
    val spark = TestSpark.spark
    import spark.implicits._
    val day = 86400L
    val iv = Seq(
      // day 0: [10,20) [15,25) [20,30) -> peak 2 (touch at 20 is not
      // an overlap), 3 segments
      ("a", 1L, 10L, 20L), ("a", 2L, 15L, 25L), ("a", 3L, 20L, 30L),
      // crosses midnight: one segment in day 0, one in day 1
      ("a", 4L, day - 5, day + 5),
      // zero-length: dropped
      ("a", 5L, 50L, 50L),
      // other key, day 1 only
      ("b", 6L, day + 1, day + 2)
    ).toDF("k", "i", "s", "e")
    val got = graft.operators.Temporal
      .peakConcurrency(iv, "k", "s", "e", "i")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3))).toSet
    assert(got == Set(("a", 0L, 2L, 4L), ("a", 1L, 1L, 1L),
                      ("b", 1L, 1L, 1L)))
  }

  test("bfsDistances finds exact hop distances within the bound and " +
       "omits nodes beyond it") {
    val spark = TestSpark.spark
    import spark.implicits._
    // path 1-2-3-4-5 plus shortcut 1-4 and an island 9-10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
                (9L, 10L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("s", "d")
    val seeds = Seq(1L).toDF("v")
    val got = graft.operators.Graph
      .bfsDistances(e, "s", "d", seeds, "v", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L,
                      5L -> 2L))
  }

  test("collocationTopK ranks by the exact integer lift") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "x y" always together (high lift); "a b" common words that
    // also appear apart (low lift)
    val docs = (Seq.fill(3)("x y") ++ Seq.fill(6)("a b") ++
                Seq.fill(6)("a c b")).toDF("text")
    val got = graft.pipeline.TextAnalysis
      .collocationTopK(docs, "text", k = 5, minCount = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // totals: tokens n=3*2+6*2+6*3=36; c(x)=c(y)=3, c(a)=c(b)=12, c(c)=6
    // lift(x y)  = 3*36*1e6  / 9   = 12_000_000
    // lift(a c)  = 6*36*1e6  / 72  =  3_000_000
    // lift(c b)  = 6*36*1e6  / 72  =  3_000_000
    // lift(a b)  = 6*36*1e6  / 144 =  1_500_000
    assert(got.length == 4)
    assert(got(0) == ("x y", 3L, 12000000L))
    assert(got.map(_._1).toSet == Set("x y", "a c", "c b", "a b"))
    assert(got.last == ("a b", 6L, 1500000L))
  }
}
