package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.pipeline._

/** Round-7 additions: phrase retrieval, containment pairs,
  * hard-negative mining, k-center sampling, isotonic calibration,
  * seasonal anomaly baseline. */
class Round7OpsSpec extends AnyFunSuite {

  test("phraseSearch: postings intersection matches the scan-side " +
       "window counter, overlaps included") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "the query ran the query plan"),   // 2 hits
      (2L, "a a a a"),                         // self-overlap corpus
      (3L, "query the"),                       // reversed — no hit
      (4L, "the"),                             // shorter than phrase
      (5L, "THE  Query mixed case the query")  // fold + multi-space
    ).toDF("doc_id", "text")
    val phrase = Seq("the", "query")
    val viaPostings = Search.phraseSearch(docs, "text", "doc_id", phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPostings === Map(1L -> 2L, 5L -> 2L))
    // parity with the zero-shuffle scan-side counter on every doc
    val viaScan = docs
      .select(col("doc_id"),
              Search.phraseHitsOf(split(lower(trim(col("text"))), "\\s+"),
                                  phrase).as("n"))
      .where(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(viaScan === viaPostings)
    // self-overlapping phrase: sliding-window semantics count overlaps
    val aa = Search.phraseSearch(docs, "text", "doc_id", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa === Map(2L -> 3L))
    // 3-term phrase
    val tri = Search.phraseSearch(docs, "text", "doc_id",
                                  Seq("the", "query", "ran"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L))
  }

  test("containmentPairs: asymmetric quote-inclusion that Jaccard misses") {
    val spark = TestSpark.spark
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val host = s"intro words here $quote and a very long tail " +
      "of unrelated filler tokens that dilutes the union badly " +
      "one two three four five six seven eight nine ten"
    val docs = Seq((1L, quote), (2L, host), (3L, "totally different text"))
      .toDF("doc_id", "text")
    val ids = docs.select("doc_id")
    val pairs = ids.toDF("id_a")
      .join(ids.toDF("id_b"), col("id_a") =!= col("id_b"))
    val out = Dedup.containmentPairs(docs, "text", "doc_id", pairs,
                                     n = 3, minNum = 9L, minDen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getLong(3)))
    // 1 ⊂ 2 passes at 90%; the reverse direction must NOT (host has
    // many grams outside the quote); Jaccard would reject both
    assert(out.map(t => (t._1, t._2)).toSet === Set((1L, 2L)))
    val (_, _, inter, aGrams) = out.head
    assert(inter === aGrams) // every gram of the quote occurs in host
    val jacc = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(Dedup.ngramJaccard(col("a.text"), col("b.text"), 3))
      .collect().head.getDouble(0)
    assert(jacc < 0.5, s"jaccard $jacc should miss this inclusion")
  }

  test("hardNegatives: nearest different-label vectors, exact integer " +
       "ranking, same-label excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    // query q (label 0); same-label twin is CLOSEST but must be skipped
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // query
      (1L, Array(0.99f, 0.1f), 0),  // same label — excluded
      (2L, Array(0.9f, 0.2f), 1),   // best negative
      (3L, Array(0.5f, 0.5f), 1),
      (4L, Array(-1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        rows, rows.where(col("vec_id") === 0),
        "embedding", "vec_id", "label", "vec_id", "embedding", "label",
        k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 3L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
    // exact integer dot of floor(x*1e6) components
    val d0 = out.head.getLong(2)
    val expected = Seq(1.0f, 0.0f).map(v => math.floor(v * 1e6).toLong)
      .zip(Seq(0.9f, 0.2f).map(v => math.floor(v.toDouble * 1e6).toLong))
      .map { case (a, b) => a * b }.sum
    assert(d0 === expected)
  }

  test("kCenterSample matches a brute-force greedy reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val k = 6
    val got = Similarity.kCenterSample(df, "embedding", "vec_id",
                                       dim = 8, k = k)
      .orderBy("pick").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // driver reference: same quantization, same greedy, same ties
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong)
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var picked = Vector((q.head._1, q.head._2, 0L))
    for (_ <- 1 until k) {
      val best = q.map { case (id, v) =>
        (id, picked.map(p => d2(v, p._2)).min)
      }.maxBy { case (id, d) => (d, -id) }
      picked = picked :+ ((best._1, q.find(_._1 == best._1).get._2,
                           best._2))
    }
    val want = picked.zipWithIndex.map { case ((id, _, d), i) =>
      (i, id, d)
    }
    assert(got.toSeq === want)
  }

  test("isotonicEventRates: PAV equals minimax, output is monotone, " +
       "pools preserve mass") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // deliberately non-monotone rates over 9 bins
    val rows = (0 until 9).flatMap { b =>
      val n = 50 + rnd.nextInt(100)
      val rate = Seq(0.1, 0.5, 0.2, 0.2, 0.8, 0.3, 0.9, 0.4, 0.95)(b)
      (0 until n).map(i => (b.toLong, if (i < (n * rate).round) 1L else 0L))
    }
    val df = rows.toDF("bin", "y")
    val out = Isotonic.isotonicEventRates(df, "bin", "y")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // monotone non-decreasing fitted values
    assert(out.sliding(2).forall(p => p(0)._4 <= p(1)._4))
    // totals preserved
    assert(out.map(_._2).sum === rows.length.toLong)
    assert(out.map(_._3).sum === rows.map(_._2).sum)
    // minimax reference: iso(i) = max_{j<=i} min_{k>=i} key(avg(j..k))
    val s = BigInt(10).pow(16)
    val agg = out.map(t => (t._3, t._2)) // (e, n) per bin ascending
    def key(j: Int, k: Int): BigInt = {
      val e = agg.slice(j, k + 1).map(_._1).sum
      val n = agg.slice(j, k + 1).map(_._2).sum
      BigInt(e) * s / n
    }
    val minimax = agg.indices.map { i =>
      (0 to i).map { j =>
        (i until agg.length).map(k => key(j, k)).min
      }.max.toLong
    }
    assert(out.map(_._4).toSeq === minimax)
    // a 0/1 guard: non-binary y fails fast
    val bad = Seq((0L, 2L)).toDF("bin", "y")
    intercept[Exception] {
      Isotonic.isotonicEventRates(bad, "bin", "y").collect()
    }
  }

  test("isotonic calibrationExpr: CASE-chain transform, shuffle-free") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L)).toDF("bin", "y")
    val pairs = Isotonic.fitPairs(df, "bin", "y")
    val out = df.select(col("bin"),
                        Isotonic.calibrationExpr(pairs, col("bin"))
                          .as("p"))
      .distinct().collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(out(0L) === 0.5 && out(1L) === 1.0)
    // unseen bin -> null
    val unk = Seq(7L).toDF("bin")
      .select(Isotonic.calibrationExpr(pairs, col("bin")).as("p"))
      .collect().head
    assert(unk.isNullAt(0))
    // plan: one projection, no exchange/join
    val plan = df.select(Isotonic.calibrationExpr(pairs, col("bin")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("isotonicEventRates: already-monotone input is returned as-is") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq.tabulate(4) { b =>
      (0 until 100).map(i => (b.toLong, if (i < b * 20) 1L else 0L))
    }.flatten
    val out = Isotonic.isotonicEventRates(rows.toDF("bin", "y"), "bin", "y")
      .orderBy("bin").collect()
    val s = BigInt(10).pow(16)
    out.foreach { r =>
      assert(r.getLong(3) ===
        (BigInt(r.getLong(2)) * s / r.getLong(1)).toLong)
    }
  }

  test("winsorizedStats matches a sort-and-clamp reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 500).map(i =>
      (if (i % 2 == 0) "a" else "b",
       // heavy tail: occasional 100x spikes
       (if (rnd.nextInt(20) == 0) rnd.nextInt(100000)
        else rnd.nextInt(1000)).toLong))
    val got = Histograms
      .winsorizedStats(rows.toDF("g", "v"), "g", "v", 1, 10, 9, 10)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val vs = grp.map(_._2).sorted
      val n = vs.length
      def pick(num: Int, den: Int) = vs((n * num + den - 1) / den - 1)
      val lo = pick(1, 10); val hi = pick(9, 10)
      val wsum = vs.map(v => math.max(lo, math.min(hi, v))).sum
      assert(got(g) === ((n.toLong, lo, hi, wsum, vs.sum)))
    }
  }

  test("groupSplit: all rows of a group land in one split") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 1000).map(i => ((i % 37).toLong, i.toLong))
    val out = Curation.groupSplit(rows.toDF("user_id", "event_id"),
                                  "user_id")
    // leakage = a user appearing in more than one split: structurally 0
    val leaks = out.groupBy("user_id")
      .agg(countDistinct("split").as("k"))
      .where(col("k") > 1).count()
    assert(leaks === 0L)
    // and the assignment is hashSplit of the key itself
    val direct = rows.map(_._1).distinct.map { u =>
      u -> Seq(u).toDF("user_id")
        .select(Curation.hashSplit(col("user_id"))).collect().head
        .getString(0)
    }.toMap
    out.select("user_id", "split").distinct().collect().foreach { r =>
      assert(direct(r.getLong(0)) === r.getString(1))
    }
  }

  test("lshQualityReport: exact dups are always candidates; counts " +
       "reconcile with brute force") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    def doc(): String =
      (1 to 40).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
    val base = (0 until 60).map(i => (i.toLong, doc()))
    // 10 exact dup pairs: identical text -> identical signatures ->
    // guaranteed candidates AND truth
    val dups = (0 until 10).map(i => (100L + i, base(i)._2))
    val df = (base ++ dups).toDF("doc_id", "text")
    val rep = Dedup.lshQualityReport(df, "text", "doc_id",
                                     numHashes = 32, bands = 8,
                                     thrNum = 1L, thrDen = 2L, ngram = 3)
      .collect().head
    val (nCand, nTruth, idSum, nHits) =
      (rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getLong(3))
    assert(nTruth >= 10L)      // at least the planted exact dups
    assert(nHits >= 10L)       // identical sigs can never be missed
    assert(nHits <= nTruth && nHits <= nCand)
    // truth checksum reconciles with a driver brute force
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = base ++ dups
    val truthPairs = for {
      i <- all.indices; j <- (i + 1) until all.length
      a = grams(all(i)._2); b = grams(all(j)._2)
      if (a & b).size * 2 >= (a | b).size
    } yield (all(i)._1, all(j)._1)
    assert(nTruth === truthPairs.length.toLong)
    assert(idSum === truthPairs.map(p => p._1 + p._2).sum)
  }

  test("cohenKappaRational: exact rational vs hand computation") {
    val spark = TestSpark.spark
    import spark.implicits._
    // classic 2x2: gold a/b vs pred, known kappa = (po-pe)/(1-pe)
    // matrix: (a,a)=20 (a,b)=5 (b,a)=10 (b,b)=15, n=50
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = ModelMetrics
      .cohenKappaRational(rows.toDF("gold", "pred"), "gold", "pred")
      .collect().head
    // n=50 a=35; rows: a=25 b=25; cols: a=30 b=20
    // pe_num = 25*30 + 25*20 = 1250
    // kappa_num = 50*35 - 1250 = 500; kappa_den = 2500 - 1250 = 1250
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)) === ((50L, 35L, 1250L, 500L,
                                              1250L)))
    // kappa = 0.4, matching the textbook formula
    assert(math.abs(r.getLong(3).toDouble / r.getLong(4) - 0.4) < 1e-12)
    // degenerate: single class both sides -> kappa_den = 0 (undefined),
    // parts still exact
    val one = ModelMetrics.cohenKappaRational(
      Seq(("x", "x"), ("x", "x")).toDF("gold", "pred"), "gold", "pred")
      .collect().head
    assert(one.getLong(4) === 0L && one.getLong(3) === 0L)
  }

  test("round-7 operators: degenerate-input behavior") {
    val spark = TestSpark.spark
    import spark.implicits._
    // phraseSearch: empty corpus and all-miss corpus -> empty result
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Search.phraseSearch(empty, "text", "doc_id",
                               Seq("a", "b")).count() === 0)
    val miss = Seq((1L, "nothing here")).toDF("doc_id", "text")
    assert(Search.phraseSearch(miss, "text", "doc_id",
                               Seq("the", "query")).count() === 0)
    // kCenterSample with k > corpus: no crash, later picks repeat the
    // lowest id at distance 0 (all mass covered)
    val tiny = Seq((5L, Array(1.0f, 0.0f)), (9L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val ks = Similarity.kCenterSample(tiny, "embedding", "vec_id",
                                      dim = 2, k = 4)
      .orderBy("pick").collect()
    assert(ks.length === 4)
    assert(ks.take(2).map(_.getLong(1)).toSet === Set(5L, 9L))
    assert(ks.drop(2).forall(_.getLong(2) === 0L))
    // kCenterSample on an empty/ragged-only frame fails fast
    intercept[IllegalArgumentException] {
      Similarity.kCenterSample(
        Seq((1L, Array(1.0f))).toDF("vec_id", "embedding"),
        "embedding", "vec_id", dim = 2, k = 1)
    }
    // isotonic: empty input -> empty output; single bin -> its own rate
    assert(Isotonic.isotonicEventRates(
      Seq.empty[(Long, Long)].toDF("bin", "y"), "bin", "y").count() === 0)
    val one = Isotonic.isotonicEventRates(
      Seq((0L, 1L), (0L, 0L)).toDF("bin", "y"), "bin", "y").collect()
    assert(one.length === 1 &&
           one.head.getLong(3) === (BigInt(10).pow(16) / 2).toLong)
    // winsorized: one distinct value -> lo = hi = value, sums equal
    val w = Histograms.winsorizedStats(
      Seq(("g", 7L), ("g", 7L), ("g", 7L)).toDF("k", "v"),
      "k", "v", 1, 10, 9, 10).collect().head
    assert(w.getLong(2) === 7L && w.getLong(3) === 7L &&
           w.getLong(4) === 21L && w.getLong(5) === 21L)
    // seasonalAnomalies: empty input -> empty output, no NPE
    val noEv = Seq.empty[(java.sql.Timestamp, String)]
      .toDF("ts", "event_type")
    assert(Monitoring.seasonalAnomalies(noEv, "event_type", "ts")
             .count() === 0)
    spark.catalog.clearCache()
  }

  test("entityClusters: normalize -> block -> verify -> closure") {
    val spark = TestSpark.spark
    import spark.implicits._
    val entities = Seq(
      (10L, "Acme Corp"),    // exact-dup of 11 after case fold
      (11L, "ACME CORP"),
      (12L, "Acme Corpx"),   // 1 edit from "acme corp"
      (13L, "Acme Corpxy"),  // 1 edit from "acme corpx" -> same cluster
      (20L, "Widget Inc"),
      (21L, "Widget Ink"),   // 1 edit from "widget inc"
      (30L, "Unrelated LLC") // singleton: no fuzzy match, not emitted
    ).toDF("id", "name")
    val out = Dedup.entityClusters(entities, "id", "name")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node ids are min-owner per folded name: acme corp -> 10
    assert(out.keySet === Set(10L, 12L, 13L, 20L, 21L))
    assert(out(10L) === 10L && out(12L) === 10L && out(13L) === 10L)
    assert(out(20L) === 20L && out(21L) === 20L)
    spark.catalog.clearCache()
  }

  test("seasonalAnomalies: bursts against the slot median, all-integer") {
    val spark = TestSpark.spark
    import spark.implicits._
    // slot (click, 09:00) baseline: counts 2,2,2 across 3 days + one
    // burst day at 6 (= 3x median -> flagged); 5 on another slot's
    // day stays under 3x its median of 2
    val mk = (day: Int, hr: Int, cnt: Int) =>
      (0 until cnt).map(i =>
        (f"2024-01-0$day $hr%02d:0${i % 6}:00", "click"))
    val events = (mk(1, 9, 2) ++ mk(2, 9, 2) ++ mk(3, 9, 2) ++
                  mk(4, 9, 6) ++
                  mk(1, 10, 2) ++ mk(2, 10, 2) ++ mk(3, 10, 5))
      .toDF("ts_s", "event_type")
      .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"))
    val out = Monitoring
      .seasonalAnomalies(events, "event_type", "ts", kNum = 3L, kDen = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1),
                           r.getLong(2), r.getLong(3)))
    assert(out.length === 1)
    val (etype, _, n, median2) = out.head
    assert(etype === "click" && n === 6L && median2 === 4L)
  }
}
