package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-11 session additions: singular-guarded
  * ExactFit solves, weighted + ridge OLS, the incremental MinHash
  * banding equivalence behind q_stream_neardup, and the empty-merge
  * bpeEncode degradation. */
class Round11OpsSpec extends AnyFunSuite {

  test("ExactFit on EMPTY input returns the guarded zero fit " +
       "(null DECIMAL sums, singular Cramer systems) — no NaN, " +
       "no crash, both entry points consistent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val pw = graft.core.ExactFit.PWSpec(
      Array(1.0, 2.0), 10L, 10L, 16.0, Some("ascending"))
    val zp = graft.core.ExactFit.fit(empty, col("x"), col("y"), pw)
    assert(zp.a == 0.0 && zp.slope(0) == 0.0 && zp.slope(1) == 0.0)
    val spec = graft.core.ExactFit.OLSSpec(Seq(1L), 1L, Seq(1.0))
    val zo = graft.core.ExactFit.fitOLS(empty, Seq(col("x")),
                                        col("y"), spec)
    assert(zo.intercept == 0.0 && zo.slope(0) == 0.0 && zo.r2 == 0.0)
    // a COLLINEAR (rank-deficient) system is also guarded: x2 = 2*x1
    // makes the 2-feature normal matrix singular
    val collin = (1 to 20).map(i =>
      (i.toDouble, 2.0 * i, 3.0 + i)).toDF("x1", "x2", "y")
    val s2 = graft.core.ExactFit.OLSSpec(Seq(1L, 1L), 1L,
                                         Seq(1.0, 1.0))
    val fc = graft.core.ExactFit.fitOLS(
      collin, Seq(col("x1"), col("x2")), col("y"), s2)
    assert(!fc.intercept.isNaN && !fc.slope(0).isNaN &&
           !fc.slope(1).isNaN)
    assert(fc.intercept == 0.0) // guarded fallback, not garbage
  }

  test("weighted OLS == plain OLS on the row-replicated frame " +
       "(weight w is exactly 'this row counted w times'), and " +
       "weighted moments are ADDITIVE across disjoint batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = for (i <- 1 to 30)
      yield (i.toLong, i.toDouble, 5.0 + 2.0 * i + (i % 7) - 3.0,
             (i % 3 + 1).toLong) // weights 1..3
    val wdf = base.toDF("id", "x", "y", "w")
    val rep = base.flatMap { case (id, x, y, w) =>
      Seq.fill(w.toInt)((id, x, y)) }.toDF("id", "x", "y")
    val spec = graft.core.ExactFit.OLSSpec(Seq(1L), 1L, Seq(4.0))
    val fw = graft.core.ExactFit.fitOLSWeighted(
      wdf, Seq(col("x")), col("y"), col("w"), spec)
    val fp = graft.core.ExactFit.fitOLS(
      rep, Seq(col("x")), col("y"), spec)
    // bit-identical: the weighted moments ARE the replicated sums
    assert(java.lang.Double.doubleToLongBits(fw.intercept) ==
           java.lang.Double.doubleToLongBits(fp.intercept))
    assert(java.lang.Double.doubleToLongBits(fw.slope(0)) ==
           java.lang.Double.doubleToLongBits(fp.slope(0)))
    assert(java.lang.Double.doubleToLongBits(fw.r2) ==
           java.lang.Double.doubleToLongBits(fp.r2))
    // additivity (the q_stream_linreg accumulator argument, weighted
    // edition): per-batch weighted moments sum to the one-pass fit
    val acc = scala.collection.mutable
      .Map.empty[String, java.math.BigDecimal]
    (0 until 3).foreach { g =>
      val batch = wdf.where(col("id") % 3 === g)
      val aggs = graft.core.ExactFit.olsMomentAggsWeighted(
        spec, Seq(col("x")), col("y"), col("w"))
      val row = batch.agg(aggs.head, aggs.tail: _*).head()
      graft.core.ExactFit.olsMomentNames(spec).zipWithIndex.foreach {
        case (nm, i) =>
          val v = row.get(i) match {
            case d: java.math.BigDecimal  => d
            case d: scala.math.BigDecimal => d.bigDecimal
            case null => java.math.BigDecimal.ZERO
            case x => java.math.BigDecimal.valueOf(
              x.asInstanceOf[java.lang.Long])
          }
          acc(nm) = acc.getOrElse(nm, java.math.BigDecimal.ZERO).add(v)
      }
    }
    val fs = graft.core.ExactFit.fitOLSFromMoments(acc.toMap, spec)
    assert(java.lang.Double.doubleToLongBits(fw.slope(0)) ==
           java.lang.Double.doubleToLongBits(fs.slope(0)))
  }

  test("weighted piecewise fit == plain fit on the row-replicated " +
       "frame, bit-identically (monotone QP included)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = for (i <- 1 to 60) yield
      (i.toLong, i.toDouble / 2.0,
       math.min(i, 20).toDouble + 0.25 * math.max(0, i - 40) +
         (i % 5), (i % 3 + 1).toLong)
    val wdf = base.toDF("id", "x", "y", "w")
    val rep = base.flatMap { case (id, x, y, w) =>
      Seq.fill(w.toInt)((id, x, y)) }.toDF("id", "x", "y")
    val spec = graft.core.ExactFit.PWSpec(
      Array(10.0, 20.0), 2L, 4L, 16.0, Some("ascending"))
    val fw = graft.core.ExactFit.fitWeighted(
      wdf, col("x"), col("y"), col("w"), spec)
    val fp = graft.core.ExactFit.fit(rep, col("x"), col("y"), spec)
    assert(fw.mask == fp.mask)
    assert(java.lang.Double.doubleToLongBits(fw.a) ==
           java.lang.Double.doubleToLongBits(fp.a))
    (0 until spec.nSeg).foreach { m =>
      assert(java.lang.Double.doubleToLongBits(fw.slope(m)) ==
             java.lang.Double.doubleToLongBits(fp.slope(m)))
    }
  }

  test("zero-weight rows are exactly invisible: weighted fit == " +
       "plain fit on the w>0 subset (OLS and piecewise)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = for (i <- 1 to 40) yield
      (i.toDouble, 2.0 + 3.0 * i + (i % 4), if (i % 5 == 0) 0L else 1L)
    val wdf = base.toDF("x", "y", "w")
    val sub = base.filter(_._3 > 0L).map(t => (t._1, t._2))
      .toDF("x", "y")
    val ospec = graft.core.ExactFit.OLSSpec(Seq(1L), 1L, Seq(4.0))
    val fw = graft.core.ExactFit.fitOLSWeighted(
      wdf, Seq(col("x")), col("y"), col("w"), ospec)
    val fp = graft.core.ExactFit.fitOLS(
      sub, Seq(col("x")), col("y"), ospec)
    assert(java.lang.Double.doubleToLongBits(fw.slope(0)) ==
           java.lang.Double.doubleToLongBits(fp.slope(0)))
    assert(java.lang.Double.doubleToLongBits(fw.r2) ==
           java.lang.Double.doubleToLongBits(fp.r2))
    val pspec = graft.core.ExactFit.PWSpec(
      Array(15.0), 2L, 4L, 16.0, None)
    val pw = graft.core.ExactFit.fitWeighted(
      wdf, col("x"), col("y"), col("w"), pspec)
    val pp = graft.core.ExactFit.fit(sub, col("x"), col("y"), pspec)
    assert(java.lang.Double.doubleToLongBits(pw.a) ==
           java.lang.Double.doubleToLongBits(pp.a))
    assert(java.lang.Double.doubleToLongBits(pw.slope(0)) ==
           java.lang.Double.doubleToLongBits(pp.slope(0)))
  }

  test("ridge shrinks the equilibrated slopes toward zero and " +
       "lambda=0 reproduces the plain solve exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pts = (1 to 40).map(i =>
      (i.toDouble, 10.0 + 3.0 * i + (i % 5) - 2.0))
    val df = pts.toDF("x", "y")
    val spec = graft.core.ExactFit.OLSSpec(Seq(1L), 1L, Seq(4.0))
    val plain = graft.core.ExactFit.fitOLS(
      df, Seq(col("x")), col("y"), spec)
    val zero = graft.core.ExactFit.fitOLS(
      df, Seq(col("x")), col("y"), spec.copy(ridgeLambda = 0.0))
    assert(java.lang.Double.doubleToLongBits(plain.slope(0)) ==
           java.lang.Double.doubleToLongBits(zero.slope(0)))
    val r1 = graft.core.ExactFit.fitOLS(
      df, Seq(col("x")), col("y"), spec.copy(ridgeLambda = 100.0))
    val r2 = graft.core.ExactFit.fitOLS(
      df, Seq(col("x")), col("y"), spec.copy(ridgeLambda = 10000.0))
    assert(math.abs(r1.slope(0)) < math.abs(plain.slope(0)))
    assert(math.abs(r2.slope(0)) < math.abs(r1.slope(0)))
    // penalized fits explain no more variance than the LS optimum
    assert(r1.r2 <= plain.r2 + 1e-12 && r2.r2 <= r1.r2 + 1e-12)
  }

  test("incremental MinHash banding: per-batch banded rows unioned " +
       "into a store yield IDENTICAL candidates to the one-shot " +
       "batch operator (q_stream_neardup's correctness argument)") {
    val spark = TestSpark.spark
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val one = graft.pipeline.Dedup.minhashCandidates(
      d, "text", "doc_id", numHashes = 32, bands = 8,
      portable = true).collect().map(_.toString).sorted
    val banded = (0 until 3).map { g =>
      graft.pipeline.Dedup.withMinhashBands(
        d.where(col("doc_id") % 3 === g), "text", "doc_id",
        numHashes = 32, bands = 8, shingleLen = 5, portable = true)
    }.reduce(_ unionAll _)
    val inc = graft.pipeline.Dedup.candidatesFromBanded(banded)
      .collect().map(_.toString).sorted
    assert(one.nonEmpty && one.sameElements(inc))
  }

  test("exactMerge golden: 'a a a a' merges FULLY in one round " +
       "('aa aa' — replace-until-fixpoint), where the single-pass " +
       "default leaves 'aa a a'; encode agrees") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq("aaaa").toDF("text")
    val exact = graft.pipeline.Tokenizer
      .bpeMerges(docs, "text", rounds = 1, exactMerge = true)
      .collect()(0)
    assert(exact.getAs[String]("pair_left") == "a" &&
           exact.getAs[String]("pair_right") == "a")
    assert(exact.getAs[Long]("corpus_tokens_after") == 2L) // aa aa
    val single = graft.pipeline.Tokenizer
      .bpeMerges(docs, "text", rounds = 1).collect()(0)
    assert(single.getAs[Long]("corpus_tokens_after") == 3L) // aa a a
    // encode with the exact chain: 2 tokens, both merged symbols
    val enc = graft.pipeline.Tokenizer
      .bpeEncode(docs, "text", Seq(("a", "a")), exactMerge = true)
      .collect()(0)
    assert(enc.getAs[Long]("encoded_tokens") == 2L)
    assert(enc.getAs[Long]("merged_occurrences") == 2L)
    // an odd run still leaves the tail singleton: 'aaaaa' -> 'aa aa a'
    val odd = graft.pipeline.Tokenizer
      .bpeEncode(Seq("aaaaa").toDF("text"), "text", Seq(("a", "a")),
                 exactMerge = true).collect()(0)
    assert(odd.getAs[Long]("encoded_tokens") == 3L)
  }

  test("state-store-resident transition counts survive a kill + " +
       "restart: RocksDB-backed streaming aggregation keyed by " +
       "(from, to) recovers from its checkpoint and finishes " +
       "IDENTICAL to the batch operator") {
    val spark = TestSpark.spark
    val base = java.nio.file.Files
      .createTempDirectory("graft-recov").toFile.getAbsolutePath
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
    val ev = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .where(col("ts").isNotNull && col("event_type").isNotNull &&
             col("user_id").isNotNull)
    val key = concat(col("user_id").cast("string"), lit("_"),
                     to_date(col("ts")).cast("string"))
    def trans(df: org.apache.spark.sql.DataFrame) =
      graft.operators.MarkovAttribution.journeyTransitions(
        df, key, "event_type", "ts", "event_id", "purchase")
    val truth = trans(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // the transition-count state lives in the STATE STORE (a
    // streaming agg keyed by (from, to) — bounded by states², the
    // shape that survives driver loss), not in a driver map
    val acc = scala.collection.mutable
      .Map.empty[(String, String), Long]
    def runOnce(): Unit = {
      val staged = spark.readStream
        .schema("`from` STRING, `to` STRING, n BIGINT")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(stage)
      val q = staged.groupBy("from", "to")
        .agg(sum("n").as("total"))
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame,
                         _: Long) =>
          b.collect().foreach { r =>
            acc((r.getString(0), r.getString(1))) = r.getLong(2)
          }
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    val rocks = graft.streaming.StreamingSessionize.RocksDBProvider
    // phase 1: two user-shards staged, then the query is STOPPED
    trans(ev.where(pmod(col("user_id"), lit(3)) === 0))
      .coalesce(1).write.parquet(s"$stage/b0")
    trans(ev.where(pmod(col("user_id"), lit(3)) === 1))
      .coalesce(1).write.parquet(s"$stage/b1")
    graft.streaming.StreamingSessionize
      .withStateStoreProvider(spark, rocks) { runOnce() }
    val partial = acc.toMap
    assert(partial.values.sum < truth.values.sum) // genuinely partial
    // phase 2: third shard arrives AFTER the kill; a fresh query on
    // the SAME checkpoint must recover the RocksDB state and finish
    trans(ev.where(pmod(col("user_id"), lit(3)) === 2))
      .coalesce(1).write.parquet(s"$stage/b2")
    graft.streaming.StreamingSessionize
      .withStateStoreProvider(spark, rocks) { runOnce() }
    assert(acc.toMap == truth)
    // and the recovered counts solve to the identical attribution
    val channels = Seq("click", "error", "signup", "view")
    val a = graft.operators.MarkovAttribution
      .fromTransitionCounts(spark, acc.toMap, channels).collect()
    val b = graft.operators.MarkovAttribution
      .fromTransitionCounts(spark, truth, channels).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("bpeEncode with an empty merge list equals the char-split " +
       "baseline (zero-merge training degrades, not crashes)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq("a b c d", "e f", "a a").toDF("text")
    val r = graft.pipeline.Tokenizer.bpeEncode(docs, "text", Nil)
      .collect()(0)
    assert(r.getAs[Long]("encoded_tokens") ==
           r.getAs[Long]("base_tokens"))
    assert(r.getAs[Long]("merged_occurrences") == 0L)
    assert(r.getAs[Long]("compression_ppm") == 1000000L)
  }
}
