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

  test("itemNeighbors maxBasketSize: oversized baskets drop from " +
       "pairs AND supports; basketCapReport tallies the dropped mass") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L), (3L, 40L), (3L, 50L)
    ).toDF("basket", "item")
    val capped = graft.operators.MarketBasket
      .itemNeighbors(df, "basket", "item", k = 3,
                     maxBasketSize = Some(4))
      .collect()
    // only baskets 1,2 survive: supports 10->2, 20->2, pair n=2,
    // jaccard 1e6*2/(2+2-2) = 1_000_000; items 30/40/50 never appear
    assert(capped.length == 2)
    capped.foreach { r =>
      assert(r.getAs[Long]("jaccard_ppm") == 1000000L)
      assert(r.getAs[Long]("c_item") == 2L)
      assert(r.getAs[Long]("c_pair") == 2L)
    }
    assert(!capped.exists(r => Set(30L, 40L, 50L)(
      r.getAs[Long]("neighbor"))))
    val rep = graft.operators.MarketBasket
      .basketCapReport(df, "basket", "item", maxBasketSize = 4)
      .collect()(0)
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2),
            rep.getLong(3)) == ((3L, 1L, 5L, 5L)))
    // uncapped keeps the behavior unchanged (mega-basket included)
    val un = graft.operators.MarketBasket
      .itemNeighbors(df, "basket", "item", k = 5)
      .where(col("item") === 30L).collect()
    assert(un.nonEmpty)
    spark.catalog.clearCache()
  }

  test("bpeEncode golden: merge list applied in order; exact corpus " +
       "tallies, compression and symbol census") {
    val spark = TestSpark.spark
    import spark.implicits._
    // vocab: "ab" x3, "abc" x3; one merge (a,b):
    // "a b" -> "ab" (1 sym), "a b c" -> "ab c" (2 syms)
    val docs = Seq("ab ab abc", "ab abc abc").toDF("text")
    val got = graft.pipeline.Tokenizer
      .bpeEncode(docs, "text", Seq(("a", "b"))).collect()(0)
    assert(got.getLong(0) == 2L)   // n_docs
    assert(got.getLong(1) == 6L)   // total_words
    assert(got.getLong(2) == 15L)  // base_tokens (chars)
    assert(got.getLong(3) == 9L)   // encoded_tokens
    assert(got.getLong(4) == 6L)   // merged_occurrences
    assert(got.getLong(5) == 3L)   // single_char_occurrences
    assert(got.getLong(6) == 2L)   // distinct symbols {ab, c}
    assert(got.getLong(7) == 600000L)  // 9/15 compression ppm
    assert(got.getLong(8) == 4500L)    // 9 tokens / 2 docs, milli
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

  test("ExactFit: data exactly on a piecewise line is recovered " +
       "exactly (intercept, per-segment slopes, knot values)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // knots 10, 20; slopes 2, 0.5, 3 from intercept 7 (y at x=0)
    def curve(x: Double): Double =
      7.0 + 2.0 * math.min(x, 10.0) +
        0.5 * math.max(0.0, math.min(x, 20.0) - 10.0) +
        3.0 * math.max(0.0, x - 20.0)
    val xs = (0 to 30).map(_.toDouble)
    val df = xs.map(x => (x, curve(x))).toDF("x", "y")
    // yScale 2: the 0.5-slope segment makes half-integer targets, and
    // the moment layer is exact only at the declared integer scale
    val spec = graft.core.ExactFit.PWSpec(
      Array(10.0, 20.0), 1L, 2L, 32.0, None)
    val f = graft.core.ExactFit.fit(df, col("x"), col("y"), spec)
    // intercept/slopes come back in SCALED units: a = 7 * yScale,
    // s_m = realSlope * yScale / xScale (the queries unscale explicitly)
    assert(math.abs(f.a - 14.0) < 1e-9)
    assert(math.abs(f.slope(0) - 4.0) < 1e-10)
    assert(math.abs(f.slope(1) - 1.0) < 1e-10)
    assert(math.abs(f.slope(2) - 6.0) < 1e-10)
    assert(math.abs(f.knotValue(1) - curve(10.0)) < 1e-8)
    assert(math.abs(f.knotValue(2) - curve(20.0)) < 1e-8)
    // moment closed-form mean equals the construction mean
    val mean = xs.map(curve).sum / xs.length
    assert(math.abs(f.values("w_avg") - mean) < 1e-8)
  }

  test("ExactFit ascending: a descending middle segment activates its " +
       "constraint; all reported slopes are non-negative and the " +
       "winner beats the flat fit") {
    val spark = TestSpark.spark
    import spark.implicits._
    // middle segment slopes hard down; outer segments rise
    def y(x: Double): Double =
      if (x < 10) 2.0 * x
      else if (x < 20) 20.0 - 5.0 * (x - 10)
      else -30.0 + 4.0 * (x - 20)
    val df = (0 to 30).map(i => (i.toDouble, y(i))).toDF("x", "t")
    val spec = graft.core.ExactFit.PWSpec(
      Array(10.0, 20.0), 1L, 1L, 32.0, Some("ascending"))
    val f = graft.core.ExactFit.fit(df, col("x"), col("t"), spec)
    assert((f.mask & 2) != 0, s"middle segment not active: ${f.mask}")
    (0 to 2).foreach(m => assert(f.slope(m) >= 0.0))
    // unconstrained fit on the same data HAS a negative middle slope
    val u = graft.core.ExactFit.fit(df, col("x"), col("t"),
                                    spec.copy(trend = None))
    assert(u.slope(1) < 0.0)
  }

  test("ExactFit agrees with PWBinning.fitContinuous (l2, pinned user " +
       "splits, unconstrained) on real data to solver tolerance") {
    val spark = TestSpark.spark
    val li = spark.read.parquet(TestSpark.sf0001 + "/lineitem.parquet")
    val spec = graft.core.ExactFit.PWSpec(
      Array(23.5, 47.5), 10L, 100L, 512.0, None)
    val ef = graft.core.ExactFit.fit(
      li, col("l_quantity"), col("l_extendedprice"), spec)
    val pw = graft.operators.PWBinning.fitContinuous(
      li, "l_quantity", "l_extendedprice",
      graft.operators.BinningConfig(
        name = "x", userSplits = Some(Array(23.5, 47.5))),
      monotonicTrend = None)
    // same math, two solvers: compare predictions across the range
    val grid = (1 to 50).map(_.toDouble)
    import spark.implicits._
    val both = grid.toDF("x")
      .select(ef.predictColumn(col("x")).as("e"),
              pw.curve.predict(col("x")).as("p"))
      .collect()
    both.foreach { r =>
      val (e, p) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(e - p) <= 1e-6 * math.max(1.0, math.abs(p)),
             s"exact $e vs histogram-LSQ $p")
    }
    spark.catalog.clearCache()
  }

  test("ExactFit OLS: exactly-linear data is recovered with r2 = 1; " +
       "noise drops r2 below 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    // y = 3 + 2*x1 - 0.5*x2 on an integer grid (x2 scale 2 for the
    // half-unit slope; y scale 2 keeps targets exact)
    val pts = for (a <- 0 to 9; b <- 0 to 9)
      yield (a.toDouble, b.toDouble, 3.0 + 2.0 * a - 0.5 * b)
    val df = pts.toDF("x1", "x2", "y")
    val spec = graft.core.ExactFit.OLSSpec(
      Seq(1L, 1L), 2L, Seq(16.0, 16.0))
    val f = graft.core.ExactFit.fitOLS(
      df, Seq(col("x1"), col("x2")), col("y"), spec)
    assert(math.abs(f.intercept - 3.0) < 1e-9)
    assert(math.abs(f.slope(0) - 2.0) < 1e-10)
    assert(math.abs(f.slope(1) + 0.5) < 1e-10)
    assert(math.abs(f.r2 - 1.0) < 1e-12)
    // perturb one point: r2 strictly below 1
    val df2 = (pts.init :+ (9.0, 9.0, pts.last._3 + 10.0)).toDF(
      "x1", "x2", "y")
    val f2 = graft.core.ExactFit.fitOLS(
      df2, Seq(col("x1"), col("x2")), col("y"), spec)
    assert(f2.r2 < 0.999 && f2.r2 > 0.5)
  }

  test("ExactFit OLS moments are additive: BigDecimal-summed disjoint " +
       "batches solve IDENTICALLY to the one-pass fit") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pts = for (a <- 0 to 9; b <- 0 to 9)
      yield (a.toLong, a.toDouble, b.toDouble, 3.0 + 2.0 * a - 1.0 * b)
    val df = pts.toDF("id", "x1", "x2", "y")
    val spec = graft.core.ExactFit.OLSSpec(
      Seq(1L, 1L), 1L, Seq(16.0, 16.0))
    val one = graft.core.ExactFit.fitOLS(
      df, Seq(col("x1"), col("x2")), col("y"), spec)
    val acc = scala.collection.mutable
      .Map.empty[String, java.math.BigDecimal]
    (0 until 3).foreach { g =>
      graft.core.ExactFit.olsMomentRow(
        df.where(col("id") % 3 === g),
        Seq(col("x1"), col("x2")), col("y"), spec)
        .foreach { case (k, v) =>
          acc(k) = acc.getOrElse(k, java.math.BigDecimal.ZERO).add(v)
        }
    }
    val streamed = graft.core.ExactFit.fitOLSFromMoments(acc.toMap, spec)
    // bit-identical, not just close: the moments are exact integers
    assert(java.lang.Double.doubleToLongBits(one.intercept) ==
           java.lang.Double.doubleToLongBits(streamed.intercept))
    (0 to 1).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(one.slope(i)) ==
             java.lang.Double.doubleToLongBits(streamed.slope(i)))
    }
    assert(java.lang.Double.doubleToLongBits(one.r2) ==
           java.lang.Double.doubleToLongBits(streamed.r2))
  }

  test("Markov removal attribution golden: hand-solved 2-channel " +
       "chain (base 2/3, effects 3/4 and 1/2, shares 0.6/0.4)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // u1: A -> conv ; u2: A -> B -> null ; u3: B -> conv
    val ev = Seq(
      (1L, "A", 1L), (1L, "purchase", 2L),
      (2L, "A", 1L), (2L, "B", 2L),
      (3L, "B", 1L), (3L, "purchase", 2L)
    ).map { case (u, c, t) =>
      (u, c, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$t"), t)
    }.toDF("u", "ch", "ts", "tie")
    val got = graft.operators.MarkovAttribution.removalAttribution(
      ev, col("u"), "ch", "ts", "tie", Seq("A", "B"), "purchase")
      .collect().map(r => (r.getString(0), r.getDouble(1),
                           r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", 0.666667, 0.75, 0.6),
      ("B", 0.666667, 0.5, 0.4)))
    spark.catalog.clearCache()
  }

  test("Shapley attribution golden: hand-solved 2-channel coalition " +
       "values (phi = 1/4 each, equal shares)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // journeys: {A}+conv, {A}, {B}+conv, {A,B}+conv, {}+conv, {B}
    val ev = Seq(
      (1L, Seq("A", "purchase")), (2L, Seq("A")),
      (3L, Seq("B", "purchase")), (4L, Seq("A", "B", "purchase")),
      (5L, Seq("purchase")), (6L, Seq("B"))
    ).flatMap { case (u, chs) =>
      chs.zipWithIndex.map { case (c, i) =>
        (u, c, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i"),
         i.toLong)
      }
    }.toDF("u", "ch", "ts", "tie")
    val got = graft.operators.MarkovAttribution.shapleyAttribution(
      ev, col("u"), "ch", "ts", "tie", Seq("A", "B"), "purchase")
      .collect().map(r => (r.getString(0), r.getDouble(1),
                           r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", 0.666667, 0.25, 0.5),
      ("B", 0.666667, 0.25, 0.5)))
    spark.catalog.clearCache()
  }

  test("Markov attribution: events AFTER the first conversion are " +
       "ignored (journey truncation)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // u1: A -> conv -> B(ignored): chain must be identical to A -> conv
    val ev = Seq(
      (1L, "A", 1L), (1L, "purchase", 2L), (1L, "B", 3L)
    ).map { case (u, c, t) =>
      (u, c, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$t"), t)
    }.toDF("u", "ch", "ts", "tie")
    val tr = graft.operators.MarkovAttribution.journeyTransitions(
      ev, col("u"), "ch", "ts", "tie", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(tr == Set(("start", "A", 1L), ("A", "conv", 1L)))
    spark.catalog.clearCache()
  }

  test("journeyTransitions is additive over user-disjoint splits — " +
       "the streaming twin's correctness argument") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Seq(
      (1L, "A", 1L), (1L, "purchase", 2L),
      (2L, "A", 1L), (2L, "B", 2L),
      (3L, "B", 1L), (3L, "purchase", 2L),
      (4L, "B", 1L), (4L, "A", 2L), (4L, "purchase", 3L)
    ).map { case (u, c, t) =>
      (u, c, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$t"), t)
    }.toDF("u", "ch", "ts", "tie")
    def counts(df: org.apache.spark.sql.DataFrame) =
      graft.operators.MarkovAttribution.journeyTransitions(
        df, col("u"), "ch", "ts", "tie", "purchase")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    val full = counts(ev)
    val a = counts(ev.where(col("u") % 2 === 0))
    val b = counts(ev.where(col("u") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == full)
    spark.catalog.clearCache()
  }

  test("layeredCtes: defs group into dependency layers, each name " +
       "appears exactly once, final CTE carries the last layer") {
    import graft.core.ExactFit._
    val defs = Seq(
      DefD("a", Op('+', R("m1"), R("m2"))),
      DefD("b", Op('*', R("a"), Cst(2.0))),
      DefD("b2", R("m1")),
      DefD("c", Op('-', R("b"), R("a"))))
    val sql = layeredCtes(defs, "m", "x", "last")
    // a and b2 are layer 1, b layer 2, c layer 3
    assert(sql.contains("x1 AS (") && sql.contains("x2 AS (") &&
           sql.contains("last AS ("))
    Seq("AS a", "AS b", "AS b2", "AS c").foreach { n =>
      assert(sql.split(java.util.regex.Pattern.quote(n + ",")).length +
             sql.split(java.util.regex.Pattern.quote(n + "\n")).length
             >= 2 || sql.contains(n), n)
    }
    val l1 = sql.substring(sql.indexOf("x1 AS ("), sql.indexOf("x2 AS ("))
    assert(l1.contains("AS a") && l1.contains("AS b2") &&
           !l1.contains("AS b\n") && !l1.contains("AS c"))
    val l3 = sql.substring(sql.indexOf("last AS ("))
    assert(l3.contains("AS c") && l3.contains("FROM x2"))
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
