package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-12 session additions: the suffix-array-
  * fidelity span audit and the exact-merge BPE contract row. */
class Round12OpsSpec extends AnyFunSuite {

  private def audit(rows: Seq[(Long, String, String)],
                    gramLen: Int = 50) = {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.pipeline.Dedup.spanFidelityAudit(
      rows.toDF("doc_id", "source", "text"),
      "text", "doc_id", "source",
      charGramLen = gramLen, wordGramN = 10, minOccurrences = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("span fidelity: a repeated LONG single-token substring is " +
       "EXACT-only (word grams need 10 tokens) — recall names the " +
       "word-gram pass's miss") {
    val blob = "z" * 60 // one 60-char token, repeated across docs
    val m = audit(Seq((1L, "s", blob), (2L, "s", blob)))
    val r = m("s")
    // exact: the 60-char run is repeated -> whole token marked in
    // both docs; approx: 1 token < 10 -> no word grams at all
    assert(r.getLong(r.fieldIndex("n_chars_removed_exact")) == 120L, r)
    assert(r.getLong(r.fieldIndex("n_chars_removed_approx")) == 0L, r)
    assert(r.getLong(r.fieldIndex("recall_ppm")) == 0L, r)
  }

  test("span fidelity: a repeated SHORT 10-token gram is " +
       "APPROX-only (under the 50-char exact threshold) — the " +
       "over-marking direction") {
    val shared = "a b c d e f g h i j" // 19 chars, 10 tokens
    val m = audit(Seq((1L, "s", s"unique1 $shared"),
                      (2L, "s", s"unique2 $shared")))
    val r = m("s")
    // word grams: tokens 1..10 repeat across docs (the gram starting
    // at token 0 differs via the unique prefix) -> 19 chars marked
    // per doc; exact: docs are 27 chars < 50 -> no char grams
    assert(r.getLong(r.fieldIndex("n_chars_removed_exact")) == 0L, r)
    assert(r.getLong(r.fieldIndex("n_chars_removed_approx")) == 38L, r)
    assert(r.getLong(r.fieldIndex("precision_ppm")) == 0L, r)
  }

  test("span fidelity: identical multi-token docs agree exactly — " +
       "recall and precision both 1e6 and masses equal") {
    val doc = Array.tabulate(20)(i => s"tok$i%02d").mkString(" ")
    assert(doc.length >= 50)
    val m = audit(Seq((1L, "s", doc), (2L, "s", doc)))
    val r = m("s")
    val ex = r.getLong(r.fieldIndex("n_chars_removed_exact"))
    val ap = r.getLong(r.fieldIndex("n_chars_removed_approx"))
    val ov = r.getLong(r.fieldIndex("n_chars_overlap"))
    assert(ex == 2L * doc.length, r)
    assert(ap == ex && ov == ex, r)
    assert(r.getLong(r.fieldIndex("recall_ppm")) == 1000000L, r)
    assert(r.getLong(r.fieldIndex("precision_ppm")) == 1000000L, r)
  }

  test("span fidelity: unique docs mark nothing and ppm guards " +
       "return 0 instead of dividing by zero") {
    val m = audit(Seq(
      (1L, "s", Array.tabulate(15)(i => s"aa$i").mkString(" ")),
      (2L, "s", Array.tabulate(15)(i => s"bb$i").mkString(" "))))
    val r = m("s")
    assert(r.getLong(r.fieldIndex("n_chars_removed_exact")) == 0L, r)
    assert(r.getLong(r.fieldIndex("n_chars_removed_approx")) == 0L, r)
    assert(r.getLong(r.fieldIndex("recall_ppm")) == 0L, r)
    assert(r.getLong(r.fieldIndex("precision_ppm")) == 0L, r)
  }

  test("ExactLogit: two-group data converges near the closed-form " +
       "MLE (logit of the group rates) in 3 quantized Newton steps") {
    val spark = TestSpark.spark
    import spark.implicits._
    // x=0: 250/1000 events (logit -ln 3), x=1: 750/1000 (logit ln 3)
    val rows = Seq.tabulate(2000) { i =>
      val x = i / 1000
      val r = i % 1000
      (x.toLong, if (x == 0) (if (r < 250) 1L else 0L)
                 else (if (r < 750) 1L else 0L))
    }
    val df = rows.toDF("x", "y")
    val f = graft.core.ExactLogit.fit(df, col("x"), col("y"), 3)
    val l3 = math.log(3.0)
    assert(math.abs(f.beta0 - (-l3)) < 0.01, f.toString)
    assert(math.abs(f.beta1 - 2 * l3) < 0.03, f.toString)
    assert(f.n == 2000L)
    // predicted event mass tracks the observed 1000 events
    assert(math.abs(f.sumMuQ.doubleValue / 16777216.0 - 1000.0) < 2.0)
    // deterministic: a refit reproduces the exact same bits
    val g = graft.core.ExactLogit.fit(df, col("x"), col("y"), 3)
    assert(java.lang.Double.doubleToLongBits(f.beta0) ==
           java.lang.Double.doubleToLongBits(g.beta0))
    assert(java.lang.Double.doubleToLongBits(f.beta1) ==
           java.lang.Double.doubleToLongBits(g.beta1))
  }

  test("ExactLogit: the (x, y)-histogram fit is BIT-identical to " +
       "the row fit — the streaming twin's exactness claim") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val rows = Seq.tabulate(5000) { _ =>
      val x = (rnd.nextInt(50) + 1).toLong
      // event rate rises with x so the slope is genuinely nonzero
      (x, if (rnd.nextDouble() < 0.1 + 0.012 * x) 1L else 0L)
    }
    val df = rows.toDF("x", "y")
    val cells = df.groupBy("x", "y").agg(count(lit(1)).as("c"))
    val a = graft.core.ExactLogit.fit(df, col("x"), col("y"), 3)
    val b = graft.core.ExactLogit.fitFromCells(
      cells, col("x"), col("y"), col("c"), 3)
    assert(java.lang.Double.doubleToLongBits(a.beta0) ==
           java.lang.Double.doubleToLongBits(b.beta0), s"$a vs $b")
    assert(java.lang.Double.doubleToLongBits(a.beta1) ==
           java.lang.Double.doubleToLongBits(b.beta1), s"$a vs $b")
    assert(a.n == b.n && a.sumMuQ.compareTo(b.sumMuQ) == 0)
    assert(a.beta1 > 0.0, a.toString)
  }

  test("ExactLogit: fitMulti at k=1 is BIT-identical to the " +
       "hand-paired fit — the IR step and the lockstep formula are " +
       "the same op sequence (multiplication commutes exactly)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(3000) { _ =>
      val x = (rnd.nextInt(40) + 1).toLong
      (x, if (rnd.nextDouble() < 0.15 + 0.01 * x) 1L else 0L)
    }.toDF("x", "y")
    val a = graft.core.ExactLogit.fit(df, col("x"), col("y"), 3)
    val m = graft.core.ExactLogit.fitMulti(
      df, Seq(col("x")), col("y"), 3)
    assert(java.lang.Double.doubleToLongBits(a.beta0) ==
           java.lang.Double.doubleToLongBits(m.beta(0)))
    assert(java.lang.Double.doubleToLongBits(a.beta1) ==
           java.lang.Double.doubleToLongBits(m.beta(1)))
    assert(a.n == m.n && a.sumMuQ.compareTo(m.sumMuQ) == 0)
  }

  test("ExactLogit: two-feature fitMulti recovers both closed-form " +
       "group logits on a 2x2 design") {
    val spark = TestSpark.spark
    import spark.implicits._
    // independent binary features, multiplicative-in-logit rates:
    // logit = -1 + 1*x1 + 0.5*x2 -> rates sigmoid(-1,-0.5,0,0.5)
    val sig = (v: Double) => 1.0 / (1.0 + math.exp(-v))
    val rows = for {
      x1 <- 0 to 1; x2 <- 0 to 1; i <- 0 until 2000
    } yield {
      val p = sig(-1.0 + 1.0 * x1 + 0.5 * x2)
      (x1.toLong, x2.toLong, if (i < (p * 2000).round) 1L else 0L)
    }
    val df = rows.toDF("x1", "x2", "y")
    val f = graft.core.ExactLogit.fitMulti(
      df, Seq(col("x1"), col("x2")), col("y"), 4)
    // saturated 2x2 logistic: empirical cell rates are within 1/4000
    // of the target, so the MLE sits near the generating coefficients
    assert(math.abs(f.beta(0) - (-1.0)) < 0.02, f.toString)
    assert(math.abs(f.beta(1) - 1.0) < 0.03, f.toString)
    assert(math.abs(f.beta(2) - 0.5) < 0.03, f.toString)
  }

  test("ExactLogit: weighted fit == row-replicated fit bit-for-bit, " +
       "and zero-weight rows are exactly invisible") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = Seq.tabulate(800) { _ =>
      val x = (rnd.nextInt(30) + 1).toLong
      (x, if (rnd.nextDouble() < 0.2 + 0.015 * x) 1L else 0L,
       (rnd.nextInt(3) + 1).toLong)
    }
    val wdf = base.toDF("x", "y", "w")
    val repl = base.flatMap { case (x, y, w) =>
      Seq.fill(w.toInt)((x, y)) }.toDF("x", "y")
    val fw = graft.core.ExactLogit.fitMultiWeighted(
      wdf, Seq(col("x")), col("y"), col("w"), 3)
    val fr = graft.core.ExactLogit.fitMulti(
      repl, Seq(col("x")), col("y"), 3)
    assert(java.lang.Double.doubleToLongBits(fw.beta(0)) ==
           java.lang.Double.doubleToLongBits(fr.beta(0)), s"$fw $fr")
    assert(java.lang.Double.doubleToLongBits(fw.beta(1)) ==
           java.lang.Double.doubleToLongBits(fr.beta(1)), s"$fw $fr")
    assert(fw.n == fr.n && fw.sumMuQ.compareTo(fr.sumMuQ) == 0)
    // zero-weight rows change nothing
    val withZero = (base :+ (7L, 1L, 0L)).toDF("x", "y", "w")
    val fz = graft.core.ExactLogit.fitMultiWeighted(
      withZero, Seq(col("x")), col("y"), col("w"), 3)
    assert(java.lang.Double.doubleToLongBits(fz.beta(1)) ==
           java.lang.Double.doubleToLongBits(fw.beta(1)))
    assert(fz.n == fw.n)
  }

  test("ExactLogit: fitMultiFromCells is BIT-identical to fitMulti " +
       "(k=2 histogram factoring) and to fitMultiWeighted (cnt = " +
       "sum of weights) — the one-scan rewrite's exactness claim") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = Seq.tabulate(4000) { _ =>
      val x0 = (rnd.nextInt(50) + 1).toLong
      val x1 = rnd.nextInt(11).toLong
      (x0, x1,
       if (rnd.nextDouble() < 0.1 + 0.01 * x0 - 0.02 * x1) 1L else 0L)
    }
    val df = rows.toDF("x0", "x1", "y")
    val cells = df.groupBy("x0", "x1", "y")
      .agg(count(lit(1)).as("c"))
    val a = graft.core.ExactLogit.fitMulti(
      df, Seq(col("x0"), col("x1")), col("y"), 3)
    val b = graft.core.ExactLogit.fitMultiFromCells(
      cells, Seq(col("x0"), col("x1")), col("y"), col("c"), 3)
    (0 to 2).foreach { u =>
      assert(java.lang.Double.doubleToLongBits(a.beta(u)) ==
             java.lang.Double.doubleToLongBits(b.beta(u)), s"$a vs $b")
    }
    assert(a.n == b.n && a.sumMuQ.compareTo(b.sumMuQ) == 0)
    // weighted: cells with cnt = sum(w) == row-level weighted fit
    val wrows = Seq.tabulate(900) { _ =>
      val x = (rnd.nextInt(30) + 1).toLong
      (x, if (rnd.nextDouble() < 0.2 + 0.015 * x) 1L else 0L,
       (rnd.nextInt(3) + 1).toLong)
    }
    val wdf = wrows.toDF("x", "y", "w")
    val wcells = wdf.groupBy("x", "y").agg(sum(col("w")).as("c"))
    val fw = graft.core.ExactLogit.fitMultiWeighted(
      wdf, Seq(col("x")), col("y"), col("w"), 3)
    val fc = graft.core.ExactLogit.fitMultiFromCells(
      wcells, Seq(col("x")), col("y"), col("c"), 3)
    (0 to 1).foreach { u =>
      assert(java.lang.Double.doubleToLongBits(fw.beta(u)) ==
             java.lang.Double.doubleToLongBits(fc.beta(u)),
             s"$fw vs $fc")
    }
    assert(fw.n == fc.n && fw.sumMuQ.compareTo(fc.sumMuQ) == 0)
  }

  test("stageBatchesOnePass: batch composition equals the per-batch " +
       "predicates, one file per batch, NULL tags unstaged, missing " +
       "batch values still yield a staged dir") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq.tabulate(90) { i =>
      (i.toLong, s"v$i")
    }.toDF("id", "s")
      // id 7 gets a NULL tag: must be unstaged, like the old
      // per-batch predicate loop dropped it
      .withColumn("id", when(col("id") === 7L, lit(null)).otherwise(col("id")))
    val stage = SparkEntry.tmpWorkDir("graft_stage_test")
    try {
      SparkEntry.stageBatchesOnePass(
        df, pmod(col("id"), lit(3)), 3, stage, Seq("id"))
      SparkEntry.stampStageMtimes(stage, 3)
      (0 until 3).foreach { g =>
        val got = spark.read.parquet(s"$stage/b$g")
        val want = df.where(pmod(col("id"), lit(3)) === g)
        assert(got.count() == want.count(), s"batch $g row count")
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
               s"batch $g content")
        val files = new java.io.File(s"$stage/b$g").listFiles()
          .filter(_.getName.startsWith("part-"))
        assert(files.length == 1, s"batch $g file count")
      }
      // total staged = all non-null-tag rows (the id=7 row dropped)
      val total = (0 until 3).map(g =>
        spark.read.parquet(s"$stage/b$g").count()).sum
      assert(total == 89L, s"total staged $total")
    } finally SparkEntry.deleteRecursively(stage)
    // a batch value absent from the data still gets its dir (trigger
    // count preserved): tag everything 0, ask for 3 batches
    val stage2 = SparkEntry.tmpWorkDir("graft_stage_test2")
    try {
      SparkEntry.stageBatchesOnePass(
        Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
        lit(0), 3, stage2, Seq("id"))
      (0 until 3).foreach { g =>
        assert(new java.io.File(s"$stage2/b$g").isDirectory,
               s"batch dir b$g exists")
      }
      assert(spark.read.parquet(s"$stage2/b0").count() == 2L)
    } finally SparkEntry.deleteRecursively(stage2)
  }

  test("ExactLogit: empty and degenerate inputs take the singular " +
       "guard — beta stays 0, no NaN") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val f = graft.core.ExactLogit.fit(empty, col("x"), col("y"), 3)
    assert(f.beta0 == 0.0 && f.beta1 == 0.0 && f.n == 0L)
    // constant x: the 2x2 normal matrix is rank-1 on the slope —
    // n*sxx - sx^2 = 0 exactly -> guarded, finite outputs
    val const = Seq.tabulate(100)(i =>
      (5L, (i % 4 == 0).compareTo(false).toLong)).toDF("x", "y")
    val g = graft.core.ExactLogit.fit(const, col("x"), col("y"), 3)
    assert(!g.beta0.isNaN && !g.beta1.isNaN, g.toString)
  }

  test("exact-merge BPE: back-to-back repeats merge to the per-word " +
       "fixpoint in one round; the single-pass default alternates") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq("aaaa aaaa", "aaaa aaaa").toDF("text")
    val exact = graft.pipeline.Tokenizer
      .bpeMerges(docs, "text", rounds = 1, exactMerge = true)
      .collect()(0)
    val loose = graft.pipeline.Tokenizer
      .bpeMerges(docs, "text", rounds = 1, exactMerge = false)
      .collect()(0)
    // both rounds pick (a, a) with the full adjacency count 12
    assert(exact.getString(3) == "aa" && loose.getString(3) == "aa")
    assert(exact.getLong(4) == 12L && loose.getLong(4) == 12L)
    // fixpoint: 'a a a a' -> 'aa aa' (2 syms x 4 occurrences);
    // single pass: 'aa a a' (3 syms x 4)
    assert(exact.getLong(5) == 8L, exact.toString)
    assert(loose.getLong(5) == 12L, loose.toString)
  }

  test("q_score_calibrate: bands partition the rows and the " +
       "calibrated predicted mass tracks observed events") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("q_score_calibrate")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val n = rows.map(_.getLong(1)).sum
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(n == li.where(
      org.apache.spark.sql.functions.col("l_extendedprice").isNotNull &&
      org.apache.spark.sql.functions.col("l_quantity").isNotNull).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // events <= n per band
      assert(!r.getDouble(4).isNaN && !r.getDouble(5).isNaN &&
             !r.getDouble(6).isNaN)
    }
    // Newton calibration: TOTAL predicted event mass (sum muq / 2^24)
    // lands within 1% of total observed events after 3 steps
    val pred = rows.map(_.getLong(3)).sum.toDouble / (1L << 24)
    val obs = rows.map(_.getLong(2)).sum.toDouble
    assert(math.abs(pred - obs) / obs < 0.01, s"pred=$pred obs=$obs")
  }

  test("q_bootstrap_ci: 32 Poisson replicas with n_eff ~ n, CI " +
       "bracketing the sample mean") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.{col, round => sqlRound}
    val rows = SparkEntry.queries("q_bootstrap_ci")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 32L))
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where(col("l_extendedprice").isNotNull)
    val n = li.count().toDouble
    // Poisson(1) total: mean n, sd sqrt(n) — 6 sigma bounds
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - n) < 6 * math.sqrt(n),
             s"n_eff=${r.getLong(1)} vs n=$n")
    }
    val lo = rows.head.getDouble(4); val hi = rows.head.getDouble(5)
    assert(lo < hi)
    val sampleMean = li
      .agg(org.apache.spark.sql.functions.sum(
        sqlRound(col("l_extendedprice") * 100).cast("long")))
      .head().getLong(0).toDouble / n
    assert(lo < sampleMean && sampleMean < hi,
           s"mean=$sampleMean not in [$lo, $hi]")
    // CI constants identical on every replica row
    assert(rows.forall(r => r.getDouble(4) == lo &&
                            r.getDouble(5) == hi))
  }
}
