package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingCuration, StreamingDriftMonitor}

class StreamingCurationSpec extends AnyFunSuite {

  test("streaming exact dedup drops in-watermark duplicate content") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")
    val dedup = StreamingCuration.exactDedup(df, "text", "ts", "10 minutes")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("sc_dedup").start()

    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // batch 1: two distinct texts + one duplicate (differs only in case
    // and spacing — same fingerprint)
    stream.addData(Seq((t(1), 1L, "alpha beta gamma"),
                       (t(2), 2L, "delta epsilon"),
                       (t(3), 3L, "Alpha  beta   GAMMA")))
    q.processAllAvailable()
    // batch 2: another duplicate of doc 1 within the watermark + one new
    stream.addData(Seq((t(4), 4L, "alpha beta gamma"),
                       (t(5), 5L, "zeta eta")))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("sc_dedup").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L), kept.toString)
  }

  test("streaming exact dedup portable=true keys the same equivalence " +
       "classes on the rolling fingerprint") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")
    val dedup = StreamingCuration.exactDedup(df, "text", "ts",
                                             "10 minutes",
                                             portable = true)
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("sc_dedup_p").start()
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    stream.addData(Seq((t(1), 1L, "alpha beta gamma"),
                       (t(2), 2L, "delta epsilon"),
                       (t(3), 3L, "Alpha  beta   GAMMA")))
    q.processAllAvailable()
    stream.addData(Seq((t(4), 4L, "alpha beta gamma"),
                       (t(5), 5L, "zeta eta")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sc_dedup_p").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    spark.catalog.dropTempView("sc_dedup_p")
    assert(kept == Set(1L, 2L, 5L), kept.toString)
  }

  test("streaming drift monitor PSI equals batch PSI at every point") {
    val spark = TestSpark.spark
    import spark.implicits._
    val splits = Array(10.0, 20.0)
    val expected = (1 to 300).map(i => (i % 30).toDouble).toDF("score")
    val mon = StreamingDriftMonitor.fromExpected(expected, "score", splits)
    assert(mon.psiTotal == 0.0)

    // shifted production cohort arriving in two "micro-batches"
    val batch1 = (1 to 100).map(i => (i % 25 + 5).toDouble).toDF("score")
    val batch2 = (1 to 80).map(i => (i % 28 + 2).toDouble).toDF("score")
    mon.add(batch1)
    val psiAfter1 = mon.psiTotal
    mon.add(batch2)
    val psiAfter2 = mon.psiTotal

    // batch-PSI oracle over everything seen so far (Monitoring.psi)
    def batchPsi(actual: org.apache.spark.sql.DataFrame): Double =
      graft.operators.Monitoring.psi(expected, actual, "score", splits)
        .agg(sum("psi")).collect()(0).getDouble(0)
    assert(math.abs(psiAfter1 - batchPsi(batch1)) < 1e-12)
    assert(math.abs(psiAfter2 - batchPsi(batch1.union(batch2))) < 1e-12)
    assert(psiAfter2 > 0.0)
    assert(Set("Insignificant change", "Requires investigation",
               "Significance change").contains(mon.verdict))

    // null/NaN scores are excluded, not silently binned into the top bin
    val mon2 = StreamingDriftMonitor.fromExpected(expected, "score", splits)
    mon2.add(batch1)
    val counts1 = mon2.actualCounts
    mon2.add(Seq[Option[Double]](None, Some(Double.NaN))
      .toDF("score"))
    assert(mon2.actualCounts.toSeq == counts1.toSeq)
  }

  test("drift monitor via a real foreachBatch stream") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val splits = Array(50.0)
    val expected = (1 to 100).map(_.toDouble % 100).toDF("score")
    val mon = StreamingDriftMonitor.fromExpected(expected, "score", splits)

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Double]
    val q = stream.toDF().toDF("score").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        mon.add(df)
      }.start()
    stream.addData((1 to 60).map(_ => 75.0))
    q.processAllAvailable()
    stream.addData((1 to 40).map(_ => 25.0))
    q.processAllAvailable()
    q.stop()

    assert(mon.actualCounts.toSeq == Seq(40.0, 60.0))
    assert(mon.psiTotal > 0.0)
  }

  test("streaming sessionize: gap-closed sessions emit immediately, " +
       "quiet users close by event-time timeout, open sessions stay") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long, Double)]
    val df = stream.toDF().toDF("ts", "user_id", "value")
    val sess = graft.streaming.StreamingSessionize.sessions(
      df, "user_id", "ts", "value", gapSeconds = 600,
      watermarkDelay = "5 minutes")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("ss_out").start()
    def t(min: Int) = new Timestamp(86400000000L + min * 60000L)
    // batch 1: u1 two events 4 min apart (one session), u2 one event
    stream.addData(Seq((t(0), 1L, 1.0), (t(4), 1L, 2.0), (t(2), 2L, 5.0)))
    q.processAllAvailable()
    // batch 2: u1 event 30 min later -> closes u1's first session NOW
    // (gap exceeded in-data); watermark 30-5=25 min also times out u2's
    // session (2 + 10 < 25)
    stream.addData(Seq((t(30), 1L, 3.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_out")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      .sortBy(x => (x._1, x._2))
    // u1 session [0,4] (2 events, 3.0) and u2 session [2,2] closed;
    // u1's session at t(30) is still open -> NOT emitted
    assert(rows.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 5.0)),
           rows.mkString(";"))
  }

  test("sessionize through the RocksDB state store emits the identical " +
       "sessions; withStateStoreProvider restores the conf") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    def run(tag: String, rocks: Boolean): Seq[(Long, Long, Double)] = {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Timestamp, Long, Double)]
      val df = stream.toDF().toDF("ts", "user_id", "value")
      val sess = graft.streaming.StreamingSessionize.sessions(
        df, "user_id", "ts", "value", gapSeconds = 600,
        watermarkDelay = "5 minutes")
      def start() = sess.writeStream.outputMode("append")
        .format("memory").queryName(s"ss_rdb_$tag").start()
      val q =
        if (rocks) graft.streaming.StreamingSessionize
          .withStateStoreProvider(spark,
            graft.streaming.StreamingSessionize.RocksDBProvider)(start())
        else start()
      def t(min: Int) = new Timestamp(86400000000L + min * 60000L)
      stream.addData(Seq((t(0), 1L, 1.0), (t(4), 1L, 2.0),
                         (t(2), 2L, 5.0)))
      q.processAllAvailable()
      stream.addData(Seq((t(30), 1L, 3.0)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table(s"ss_rdb_$tag")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
        .sortBy(x => (x._1, x._2)).toSeq
      spark.catalog.dropTempView(s"ss_rdb_$tag")
      rows
    }
    val viaDefault = run("d", rocks = false)
    val viaRocks = run("r", rocks = true)
    assert(viaRocks == viaDefault && viaDefault.nonEmpty,
           s"$viaRocks vs $viaDefault")
    assert(spark.conf.getOption(key) == before,
           "withStateStoreProvider must restore the previous conf")
  }

  test("streaming sessionize: a stray event a full gap behind the open " +
       "session closes alone instead of merging across the gap") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long, Double)]
    val df = stream.toDF().toDF("ts", "user_id", "value")
    val q = graft.streaming.StreamingSessionize.sessions(
        df, "user_id", "ts", "value", gapSeconds = 60,
        watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_stray").start()
    def t(min: Int) = new Timestamp(86400000000L + min * 60000L)
    stream.addData(Seq((t(30), 1L, 1.0)))
    q.processAllAvailable()
    // 20 min older than the open session's start, still above the
    // watermark (delay 1 h): must NOT merge into [30, 30]
    stream.addData(Seq((t(10), 1L, 2.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_stray")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.dropTempView("ss_stray")
    assert(rows.toSeq == Seq((t(10).getTime, t(10).getTime, 1L)),
           rows.mkString(";"))
  }

  test("streaming sessionize: timeout eviction is STRICT (watermark " +
       "must pass last + gap, equality keeps the session open)") {
    // the q_stream_sessions oracle encodes `end + gap < max ts - delay`
    // — this pins that FlatMapGroupsWithStateExec really evicts
    // strictly, so an oracle drift would fail here first
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def run(otherTsSec: Long): Int = {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Timestamp, Long, Double)]
      val df = stream.toDF().toDF("ts", "user_id", "value")
      val name = s"ss_bound_$otherTsSec"
      val q = graft.streaming.StreamingSessionize.sessions(
          df, "user_id", "ts", "value", gapSeconds = 600,
          watermarkDelay = "300 seconds")
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      val base = 86400000000L
      stream.addData(Seq((new Timestamp(base), 1L, 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(
        (new Timestamp(base + otherTsSec * 1000L), 2L, 1.0)))
      q.processAllAvailable()
      q.stop()
      val n = spark.table(name)
        .where(col("user_id") === 1L).count().toInt
      spark.catalog.dropTempView(name)
      n
    }
    // watermark lands EXACTLY on last + gap (900s - 300s = 600s = gap):
    // strict eviction keeps u1's session open
    assert(run(900L) == 0, "equality must NOT evict")
    // one second past the boundary evicts
    assert(run(901L) == 1, "past the boundary must evict")
  }

  test("balanced class weights: n / (2 * class count)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (Seq.fill(90)(0.0) ++ Seq.fill(10)(1.0)).toDF("y")
    val w = graft.operators.OptimalBinning.balancedClassWeight(df, "y")
    assert(math.abs(w(0.0) - 100.0 / 180.0) < 1e-12)
    assert(math.abs(w(1.0) - 100.0 / 20.0) < 1e-12)
  }

  test("StreamingAsof: inclusive state-first ties, unmatched probes, " +
       "stale state ignored, cross-batch carry") {
    val spark = TestSpark.spark
    import spark.implicits._
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String, Double)]
    val df = stream.toDF().toDF("user_id", "ts", "event_type", "value")
    val enriched = graft.streaming.StreamingAsof.enrich(
      df, "user_id", "ts", "event_type", "value",
      stateType = "purchase", probeType = "view",
      watermarkDelay = "1 hour")
    val q = enriched.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sa_test").start()
    // batch 1: u1 probe BEFORE any state (unmatched), state@10,
    // probe@10 (tie -> state-first, inclusive match), probe@20
    stream.addData(Seq(
      (1L, t(5), "view", 0.0), (1L, t(10), "purchase", 2.5),
      (1L, t(10), "view", 0.0), (1L, t(20), "view", 0.0)))
    q.processAllAvailable()
    // batch 2: newer state@30, then a STALE state@25 arriving later in
    // the same batch is sorted before it (ts order), so probe@40 sees
    // state@30; u2 probe with no state ever (unmatched)
    stream.addData(Seq(
      (1L, t(30), "purchase", 7.0), (1L, t(25), "purchase", 4.0),
      (1L, t(40), "view", 0.0), (2L, t(40), "view", 0.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sa_test")
      .select("user_id", "probe_ms", "matched", "asof_ms",
              "asof_value_q")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1) - 1700000000000L) / 1000,
                 r.getBoolean(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    spark.catalog.dropTempView("sa_test")
    assert(rows.toSeq == Seq(
      (1L, 5L, false, -1L, -1L),
      (1L, 10L, true, t(10).getTime, 2500000L),
      (1L, 20L, true, t(10).getTime, 2500000L),
      (1L, 40L, true, t(30).getTime, 7000000L),
      (2L, 40L, false, -1L, -1L)), rows.toSeq)
  }
}
