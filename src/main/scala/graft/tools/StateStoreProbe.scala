package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.streaming.StreamingSessionize

/** State-store probe for stateful sessionization at >= 1M keyed
  * sessions: the same 2-trigger file replay (1M open sessions in batch
  * 1, a watermark-advancing event in batch 2 that times them all out)
  * through the default HDFS-backed (on-heap) store and through
  * RocksDB (`StreamingSessionize.RocksDBProvider`). Prints wall time,
  * peak reported state rows and state memory per provider, and checks
  * both providers emit the identical session count.
  *
  * Usage: runMain graft.tools.StateStoreProbe [nUsers]
  */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val nUsers = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = 1700000000L
    val stage = java.nio.file.Files
      .createTempDirectory("graft_ss_stage").toString
    // batch 1: one event per user inside a 600 s window -> nUsers open
    // sessions; batch 2: one far-future event pushing the watermark
    // past every last + gap, so every session closes by timeout
    spark.range(nUsers).select(
        col("id").as("user_id"),
        timestamp_seconds(lit(t0) + (col("id") % 600)).as("ts"),
        lit(1.0).as("value"))
      .repartition(1).write.mode("overwrite").parquet(s"$stage/b0")
    spark.range(1).select(
        lit(-1L).as("user_id"),
        timestamp_seconds(lit(t0 + 10000L)).as("ts"),
        lit(0.0).as("value"))
      .repartition(1).write.mode("overwrite").parquet(s"$stage/b1")
    SparkEntry.stampStageMtimes(stage, 2)

    def runWith(tag: String, provider: Option[String]): Long = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_ss_ckpt_$tag").toString
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
      val sess = StreamingSessionize.sessions(
        stream, "user_id", "ts", "value",
        gapSeconds = 3600L, watermarkDelay = "600 seconds")
      def start() = sess.writeStream.outputMode("append")
        .format("memory").queryName(s"ss_probe_$tag")
        .option("checkpointLocation", ckpt).start()
      val w0 = System.nanoTime()
      val q = provider match {
        case Some(p) =>
          StreamingSessionize.withStateStoreProvider(spark, p)(start())
        case None => start()
      }
      q.processAllAvailable()
      val wall = (System.nanoTime() - w0) / 1e9
      val peakRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      val peakMem = q.recentProgress
        .flatMap(_.stateOperators.map(_.memoryUsedBytes)).max
      q.stop()
      val n = spark.table(s"ss_probe_$tag").count()
      spark.catalog.dropTempView(s"ss_probe_$tag")
      SparkEntry.deleteRecursively(ckpt)
      println(f"PROBE state-store provider=$tag%-8s keys=$nUsers " +
        f"wall=$wall%6.2f s peak_state_rows=$peakRows " +
        f"peak_state_mem=${peakMem / 1048576.0}%8.1f MiB " +
        f"closed_sessions=$n")
      n
    }

    val nDefault = runWith("hdfs", None)
    val nRocks = runWith("rocksdb",
                         Some(StreamingSessionize.RocksDBProvider))
    assert(nDefault == nRocks && nDefault == nUsers,
           s"provider results diverge: $nDefault vs $nRocks ($nUsers)")
    SparkEntry.deleteRecursively(stage)

    // Second scenario: complete-mode streaming AGGREGATION at nUsers
    // distinct state keys — the state shape of q_stream_topk /
    // q_stream_hh / q_stream_distinct (StateStoreSaveExec, one
    // aggregate row per key) rather than flatMapGroupsWithState.
    // Two triggers of disjoint key halves; both providers must emit
    // the identical final (count, sum) table.
    val aggStage = java.nio.file.Files
      .createTempDirectory("graft_agg_stage").toString
    spark.range(nUsers / 2).select(
        col("id").as("k"), (col("id") % 97).as("v"))
      .repartition(1).write.mode("overwrite").parquet(s"$aggStage/b0")
    spark.range(nUsers / 2, nUsers).select(
        col("id").as("k"), (col("id") % 97).as("v"))
      .repartition(1).write.mode("overwrite").parquet(s"$aggStage/b1")
    SparkEntry.stampStageMtimes(aggStage, 2)

    def runAgg(tag: String, provider: Option[String]): (Long, Long) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_agg_ckpt_$tag").toString
      val stream = spark.readStream
        .schema("k BIGINT, v BIGINT")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(aggStage)
      def start() = stream.groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("vsum"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(s"agg_probe_$tag")
        .option("checkpointLocation", ckpt).start()
      val w0 = System.nanoTime()
      val q = provider match {
        case Some(p) =>
          StreamingSessionize.withStateStoreProvider(spark, p)(start())
        case None => start()
      }
      q.processAllAvailable()
      val wall = (System.nanoTime() - w0) / 1e9
      val peakRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      val peakMem = q.recentProgress
        .flatMap(_.stateOperators.map(_.memoryUsedBytes)).max
      q.stop()
      val chk = spark.table(s"agg_probe_$tag")
        .agg(count(lit(1)), sum(col("vsum"))).collect()(0)
      val (rows, vsum) = (chk.getLong(0), chk.getLong(1))
      spark.catalog.dropTempView(s"agg_probe_$tag")
      SparkEntry.deleteRecursively(ckpt)
      println(f"PROBE streaming-agg provider=$tag%-8s keys=$nUsers " +
        f"wall=$wall%6.2f s peak_state_rows=$peakRows " +
        f"peak_state_mem=${peakMem / 1048576.0}%8.1f MiB " +
        f"table_rows=$rows vsum=$vsum")
      (rows, vsum)
    }

    val aDefault = runAgg("hdfs", None)
    val aRocks = runAgg("rocksdb",
                        Some(StreamingSessionize.RocksDBProvider))
    assert(aDefault == aRocks && aDefault._1 == nUsers,
           s"agg provider results diverge: $aDefault vs $aRocks")
    SparkEntry.deleteRecursively(aggStage)

    // Third scenario (r10): CALENDAR-KEYED complete-mode freshness
    // state — the q_stream_freshness shape: one aggregate row per
    // (source, epoch-day) cell holding max event time + volume.
    // nUsers distinct cells over two triggers (1000 sources x
    // nUsers/1000 days); both providers must agree on the final
    // (cells, sum of max-times) readout.
    val frStage = java.nio.file.Files
      .createTempDirectory("graft_fr_stage").toString
    def frBatch(lo: Long, hi: Long, path: String): Unit =
      spark.range(lo, hi).select(
          (col("id") % 1000L).as("src"),
          expr("id div 1000").as("day"),
          (lit(t0) + col("id") % 86400L).as("sec"))
        .repartition(1).write.mode("overwrite").parquet(path)
    frBatch(0L, nUsers / 2, s"$frStage/b0")
    frBatch(nUsers / 2, nUsers, s"$frStage/b1")
    SparkEntry.stampStageMtimes(frStage, 2)

    def runFreshness(tag: String,
                     provider: Option[String]): (Long, Long) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_fr_ckpt_$tag").toString
      val stream = spark.readStream
        .schema("src BIGINT, day BIGINT, sec BIGINT")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(frStage)
      def start() = stream.groupBy("src", "day")
        .agg(count(lit(1)).as("n"), max("sec").as("latest"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(s"fr_probe_$tag")
        .option("checkpointLocation", ckpt).start()
      val w0 = System.nanoTime()
      val q = provider match {
        case Some(p) =>
          StreamingSessionize.withStateStoreProvider(spark, p)(start())
        case None => start()
      }
      q.processAllAvailable()
      val wall = (System.nanoTime() - w0) / 1e9
      val peakRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      val peakMem = q.recentProgress
        .flatMap(_.stateOperators.map(_.memoryUsedBytes)).max
      q.stop()
      val chk = spark.table(s"fr_probe_$tag")
        .agg(count(lit(1)), sum(col("latest"))).collect()(0)
      val out = (chk.getLong(0), chk.getLong(1))
      spark.catalog.dropTempView(s"fr_probe_$tag")
      SparkEntry.deleteRecursively(ckpt)
      println(f"PROBE streaming-freshness provider=$tag%-8s " +
        f"cells=$nUsers wall=$wall%6.2f s peak_state_rows=$peakRows " +
        f"peak_state_mem=${peakMem / 1048576.0}%8.1f MiB " +
        f"table_rows=${out._1} latest_sum=${out._2}")
      out
    }

    val fDefault = runFreshness("hdfs", None)
    val fRocks = runFreshness("rocksdb",
                              Some(StreamingSessionize.RocksDBProvider))
    assert(fDefault == fRocks && fDefault._1 == nUsers,
           s"freshness provider results diverge: $fDefault vs $fRocks")
    SparkEntry.deleteRecursively(frStage)
    spark.stop()
  }
}
