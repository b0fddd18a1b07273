package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKBuffer
import graft.operators.{Cardinality, Monitoring, QualityChecks}

/** KMV cardinality sketch, Benford audit, two-sample KS. */
class CardinalityAndKsSpec extends AnyFunSuite {

  test("TopKBuffer: exact (key,id) duplicates are held once, " +
       "including against a full buffer's interior and tail") {
    val b = new TopKBuffer(3)
    b.insert(10, 1); b.insert(10, 1)
    assert(b.n === 1)
    b.insert(9, 2); b.insert(8, 3) // full: [(10,1),(9,2),(8,3)]
    b.insert(10, 1) // interior duplicate must not evict the tail
    assert(b.n === 3 && b.keys.take(3).toSeq === Seq(10L, 9L, 8L))
    b.insert(8, 3) // tail duplicate
    assert(b.n === 3 && b.ids.take(3).toSeq === Seq(1L, 2L, 3L))
    b.insert(11, 0) // genuine insert still evicts the tail
    assert(b.keys.take(3).toSeq === Seq(11L, 10L, 9L))
    b.insert(5, 9) // below the tail of a full buffer: dropped
    assert(b.keys.take(3).toSeq === Seq(11L, 10L, 9L))
  }

  test("kmvDistinct: sketch is exact below k, estimate tracks truth " +
       "above k, row multiplicity is invisible, ALL merges correctly") {
    val spark = TestSpark.spark
    import spark.implicits._
    // group a: 3 distinct keys (< k=8) duplicated 5x each;
    // group b: 200 distinct keys (> k)
    val rows =
      (1 to 5).flatMap(_ => Seq(("a", 101L), ("a", 102L), ("a", 103L))) ++
        (1L to 200L).map(i => ("b", 1000L + i))
    val df = rows.toDF("g", "key")
    val out = Cardinality.kmvDistinct(df, "g", "key", k = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString.toLong),
         r.getLong(3))).toMap
    val (nA, kthA, estA) = out("a")
    assert(nA === 3L && kthA.isEmpty && estA === 3L) // below k: exact
    val (nB, kthB, estB) = out("b")
    assert(nB === 200L && kthB.nonEmpty)
    // KMV with k=8 is noisy, but must land within a broad band
    assert(estB > 50L && estB < 800L, s"est=$estB for truth 200")
    // kth hash replays as the 8th smallest 52-bit md5 prefix
    val kth = df.where($"g" === "b").select($"key").distinct()
      .select(Cardinality.hash52($"key").as("h"))
      .orderBy("h").limit(8).orderBy(desc("h")).limit(1)
      .collect().head.getLong(0)
    assert(kthB.get === kth)
    // ALL row: merged per-group sketches == global KMV
    val (nAll, kthAll, _) = out("ALL")
    assert(nAll === 203L)
    val kthGlobal = df.select($"key").distinct()
      .select(Cardinality.hash52($"key").as("h"))
      .orderBy("h").limit(8).orderBy(desc("h")).limit(1)
      .collect().head.getLong(0)
    assert(kthAll.get === kthGlobal)
    // multiplicity never moves the sketch: dedup the input, same rows
    val dedup = Cardinality.kmvDistinct(df.distinct(), "g", "key", k = 8)
      .collect().map(_.toSeq).toSet
    val full = Cardinality.kmvDistinct(df, "g", "key", k = 8)
      .collect().map(_.toSeq).toSet
    assert(dedup === full)
  }

  test("kmvOverlap: exact inclusion-exclusion, sub-k sets fall back " +
       "to exact, merged union sketch equals the direct union KMV") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = (1L to 100L).toDF("key")
    val b = (51L to 150L).toDF("key")
    val r = Cardinality.kmvOverlap(a, b, "key", k = 8).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
           ((100L, 100L, 150L, 50L)))
    // est_union must equal the direct KMV of the union's keys
    val kthU = (1L to 150L).toDF("key")
      .select(Cardinality.hash52($"key").as("h"))
      .orderBy("h").limit(8).orderBy(desc("h")).limit(1)
      .collect().head.getLong(0)
    assert(r.getLong(6) === (7L * (1L << 52)) / kthU)
    assert(r.getLong(7) === r.getLong(4) + r.getLong(5) - r.getLong(6))
    // both sets below k: every estimate is exact
    val tiny = Cardinality
      .kmvOverlap(Seq(1L, 2L, 2L).toDF("key"), Seq(3L).toDF("key"),
                  "key", k = 8)
      .collect().head
    assert(tiny.toSeq === Seq(2L, 1L, 3L, 0L, 2L, 1L, 3L, 0L))
  }

  test("skewReport: totals, heaviest key, exact discrete p90 count") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ (3L to 7L))
      .toDF("k")
    val r = graft.operators.QualityChecks.skewReport(df, "k")
      .collect().head
    // counts per key: [5,3,1,1,1,1,1] -> p90 = 7th smallest = 5
    assert(r.toSeq === Seq(13L, 7L, 5L, 1L, 5L))
    spark.catalog.clearCache()
  }

  test("joinCardinality: exact pair totals and worst key from count " +
       "aggregates only") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 1L, 1L, 3L, 3L, 4L).toDF("k")
    val r = graft.operators.QualityChecks
      .joinCardinality(a, "k", b, "k").collect().head
    // common keys {1, 3}: pairs 2*3 + 1*2 = 8, worst key 1 with 6
    assert(r.toSeq === Seq(4L, 6L, 2L, 8L, 6L, 1L))
    spark.catalog.clearCache()
  }

  test("benford: digit extraction, integer deviation identity, " +
       "sub-1 and null rows excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (Seq(1.0, 1.5, 19.99, 123.45, 2.0, 0.5, 9000.01) ++
      Seq.fill(3)(300.0)).toDF("v")
      .unionByName(Seq(Option.empty[Double]).toDF("v"))
    val rows = QualityChecks.benford(df, "v").collect()
    val byDigit = rows.map(r =>
      r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 0.5 and null dropped -> 9 rows total: digits 1x4, 2x1, 3x3, 9x1
    assert(byDigit.keySet === Set(1, 2, 3, 9))
    assert(byDigit(1)._1 === 4L && byDigit(3)._1 === 3L &&
           byDigit(2)._1 === 1L && byDigit(9)._1 === 1L)
    assert(rows.forall(_.getLong(2) == 9L)) // shared n_total
    // dev identity for digit 1: 4*1e9 - 9*301029995
    assert(byDigit(1)._3 === 4L * 1000000000L - 9L * 301029995L)
    assert(byDigit(9)._3 === 1L * 1000000000L - 9L * 45757490L)
  }

  test("embeddingHealth: null/dim/NaN/zero classification and exact " +
       "quantized norm checksums") {
    val spark = TestSpark.spark
    import spark.implicits._
    def v(xs: Float*): Option[Seq[Option[Float]]] =
      Some(xs.map(Option(_)).toSeq)
    val rows: Seq[Option[Seq[Option[Float]]]] = Seq(
      v(0.5f, 0.5f, 0.5f, 0.5f), // q=500 each, qnorm=1,000,000
      v(0f, 0f, 0f, 0f), // zero vector
      v(1f, Float.NaN, 0f, 0f), // NaN
      v(Float.PositiveInfinity, 0f, 0f, 0f), // Inf
      v(2e6f, 0f, 0f, 0f), // |x| > 1e5: checksum would wrap a long
      Some(Seq(Option(1f), None, Option(0f), Option(0f))), // null elem
      v(1.0f), // wrong dimension
      None) // null vector
    val df = rows.toDF("embedding")
    val r = graft.pipeline.Similarity
      .embeddingHealth(df, "embedding", dim = 4).collect().head
    // 8 vecs: 1 null, 1 wrong-dim, 4 bad-value (NaN/Inf/huge/null
    // element), 1 zero; checksum covers only the good and zero rows
    assert(r.toSeq === Seq(8L, 1L, 1L, 4L, 1L, 1000000L, 0L, 1000000L))
  }

  test("plan shapes: KMV folds map-side before its exchange; " +
       "joinCardinality never materializes the row join; ks2Sample " +
       "broadcasts its prefix table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i % 7, i)).toDF("g", "key")
    val kmvPlan = Cardinality.kmvDistinct(big, "g", "key", 8)
      .queryExecution.executedPlan.toString
    // partial_topk before the exchange: sketch state combines map-side
    assert(kmvPlan.contains("partial_topk_longs"), kmvPlan)
    spark.catalog.clearCache()
    val jc = graft.operators.QualityChecks
      .joinCardinality(big, "key", big, "key")
    val jcPlan = jc.queryExecution.executedPlan.toString
    // the only joins are the keys-sized count-table join + the
    // single-row totals cross join — row data never joins row data:
    // both join inputs are aggregates
    assert(!jcPlan.contains("SortMergeJoin") ||
           jcPlan.contains("partial_count"), jcPlan)
    jc.collect(); spark.catalog.clearCache()
    val ks = Monitoring.ks2Sample(
      big.select(col("key").as("v"), (col("g") === 0L).as("f")),
      "v", col("f"), 100L)
    val ksPlan = ks.queryExecution.executedPlan.toString
    assert(ksPlan.contains("BroadcastExchange"), ksPlan) // prefix table
    ks.collect(); spark.catalog.clearCache()
  }

  test("ks2Sample: exact rational D and smallest-arg tie rule; " +
       "bucketed prefix path agrees across widths and signs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, true), (2L, true), (3L, true),
                 (2L, false), (3L, false), (4L, false)).toDF("v", "f")
    val r = Monitoring.ks2Sample(df, "v", col("f"), bucketWidth = 2L)
      .collect().head
    // F1 over v=1,2,3,4: 1,2,3,3; F2: 0,1,2,3 -> |3F1-3F2| = 3,3,3,0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
           ((3L, 3L, 3L, 1L))) // max 3, first attained at v=1
    // identical distributions -> D = 0 (arg = smallest value)
    val same = Seq((5L, true), (7L, true), (5L, false), (7L, false))
      .toDF("v", "f")
    val r0 = Monitoring.ks2Sample(same, "v", col("f"), 10L)
      .collect().head
    assert(r0.getLong(2) === 0L && r0.getLong(3) === 5L)
    // bucket width must not change the answer, negative values incl.
    val shifted = df.select(($"v" - 3L).as("v"), $"f")
    val wide = Monitoring.ks2Sample(shifted, "v", col("f"), 1000L)
      .collect().head
    val narrow = Monitoring.ks2Sample(shifted, "v", col("f"), 1L)
      .collect().head
    assert(wide.toSeq === narrow.toSeq)
    assert(wide.getLong(3) === -2L) // arg shifts with the data
  }
}
