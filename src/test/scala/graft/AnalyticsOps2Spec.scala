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

  test("withGlobalRank matches a single-partition rank() including " +
       "cross-bucket ties and negatives") {
    val spark = TestSpark.spark
    import spark.implicits._
    val vals = Seq(-9L, -9L, -1L, 0L, 3L, 3L, 3L, 7L, 12L, 12L, 40L)
    val df = new scala.util.Random(7).shuffle(vals).toDF("v")
    val got = graft.operators.DistributedRank
      .withGlobalRank(df, "v", bucketWidth = 5L)
      .select("v", "rank", "__n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sorted = vals.sorted
    got.foreach { case (v, rk, n) =>
      assert(n == vals.length)
      assert(rk == sorted.indexOf(v) + 1, s"value $v")
    }
  }

  test("withGroupDoubledRank yields twice the average rank under ties") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("g", 10L), ("g", 10L), ("g", 20L), ("g", 30L),
                 ("h", 5L)).toDF("g", "v")
    val got = graft.operators.DistributedRank
      .withGroupDoubledRank(df, Seq("g"), "v", bucketWidth = 7L, "r2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // g: ranks of (10,10) avg 1.5 -> 3; 20 -> rank 3 -> 6; 30 -> 8
    assert(got == Set(("g", 10L, 3L), ("g", 20L, 6L), ("g", 30L, 8L),
                      ("h", 5L, 2L)))
  }

  test("groupedSpearman is exact on perfect and reversed orders") {
    val spark = TestSpark.spark
    import spark.implicits._
    val up = (1 to 10).map(i => ("up", i.toLong, i.toLong * 100))
    val down = (1 to 10).map(i => ("down", i.toLong, (11 - i).toLong))
    val df = (up ++ down).toDF("g", "x", "y")
    val got = graft.operators.DistributedRank
      .groupedSpearman(df, "g", "x", "y", 3L, 37L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // perfect agreement: sum d2 = 0; reversal: sum d2 = n(n^2-1)/3 = 330
    assert(got("up") == (10L, 0L))
    assert(got("down") == (10L, 1320L)) // 4 * sum d2 = 4 * 330
  }

  test("groupedDoubledMedian returns 2*median for odd and even groups") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("o", 1L), ("o", 5L), ("o", 9L),
                 ("e", 2L), ("e", 4L), ("e", 10L), ("e", 20L),
                 ("t", 7L), ("t", 7L), ("t", 7L), ("t", 99L))
      .toDF("g", "v")
    val got = graft.operators.Histograms
      .groupedDoubledMedian(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("o" -> (10L, 3L), "e" -> (14L, 4L),
                      "t" -> (14L, 4L)))
  }

  test("madAnomalySummary flags exactly the rows beyond k MADs") {
    val spark = TestSpark.spark
    import spark.implicits._
    // g: values 10,12,14,16,18 (median 14, MAD 2); 100 is >> 3 MAD
    val df = Seq(("g", 1L, 10L), ("g", 2L, 12L), ("g", 3L, 14L),
                 ("g", 4L, 16L), ("g", 5L, 18L), ("g", 6L, 100L))
      .toDF("g", "i", "v")
    val got = graft.operators.Outliers
      .madAnomalySummary(df, "g", "v", "i", kNum = 3L, kDen = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
    // n=6, lower med 14 upper 16 -> median2=30; devs |2v-30| =
    // 10,6,2,2,6,170 sorted 2,2,6,6,10,170 -> mad2 = 6+6 = 12 (=4*MAD,
    // MAD=3); anomaly iff 2*dev > 3*12=36 <=> dev>18: only 170 (id 6)
    assert(got.toSeq == Seq(("g", 6L, 30L, 12L, 1L, 6L)))
  }

  test("referentialOrphans counts orphans and null keys per " +
       "relationship") {
    val spark = TestSpark.spark
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = graft.operators.QualityChecks
      .referentialOrphans(Seq(("c->p", child, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("c->p", 4L, 1L, 1L, 9L)))
  }

  test("kAnonymity reports risky combos below k") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
              Seq.fill(1)(("FR", "A"))).toDF("country", "seg")
    val got = graft.operators.QualityChecks
      .kAnonymity(df, Seq("country", "seg"), k = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((8L, 3L, 2L, 3L, 1L)))
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
