package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-13 optimization-round hardening: the bounded
  * histogram-collect gate behind the exact-logistic one-scan rewrites. */
class Round13OpsSpec extends AnyFunSuite {

  test("collectBoundedCells passes a domain-bounded histogram through " +
       "unchanged") {
    val spark = TestSpark.spark
    val cells = spark.range(0L, 50L)
      .select(col("id").as("x"), (col("id") % 2).as("y"),
              lit(3L).as("c"))
    val rows = SparkEntry.collectBoundedCells(cells)
    assert(rows.length == 50)
    assert(rows.map(_.getLong(2)).sum == 150L)
  }

  test("collectBoundedCells fails LOUDLY on a wide domain instead of " +
       "collecting it — the bounded-driver-gate claim is enforced, " +
       "not hoped") {
    val spark = TestSpark.spark
    // a synthetic continuous-ish feature: every row its own cell
    val wide = spark.range(0L, SparkEntry.MaxHistogramCells + 500L)
      .select(col("id").as("x"), lit(0L).as("y"), lit(1L).as("c"))
    val e = intercept[IllegalArgumentException] {
      SparkEntry.collectBoundedCells(wide)
    }
    assert(e.getMessage.contains("bounded"), e.getMessage)
  }

  test("sorted inter/union kernel == array_intersect/array_union sizes " +
       "on random LONG arrays (dupes, empties, disjoint, identical)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val cases = (0 until 200).map { i =>
      def arr(n: Int, dom: Int) =
        Array.fill(n)(rnd.nextInt(dom).toLong).sorted.toSeq
      val a = arr(rnd.nextInt(30), 1 + rnd.nextInt(40))
      val b = if (i % 7 == 0) a else arr(rnd.nextInt(30), 1 + rnd.nextInt(40))
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq.empty[Long], Seq.empty[Long]))
    val df = cases.toDF("a", "b")
    val checked = df.select(
      graft.functions.ArraySetExprs.sortedInterSize(col("a"), col("b"))
        .as("ki"),
      graft.functions.ArraySetExprs.sortedUnionSize(col("a"), col("b"))
        .as("ku"),
      size(array_intersect(col("a"), col("b"))).as("si"),
      size(array_union(col("a"), col("b"))).as("su")).collect()
    checked.foreach { r =>
      assert(r.getInt(0) == r.getInt(2), s"inter mismatch: $r")
      assert(r.getInt(1) == r.getInt(3), s"union mismatch: $r")
    }
  }

  test("sorted inter/union kernel == built-ins on STRING arrays, and " +
       "sortedJaccardArrays == jaccardArrays bit-for-bit") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Array("a", "ab", "abc", "b", "ba", "z", "zz", "", "0", "é")
    val cases = (0 until 200).map { i =>
      def arr(n: Int) =
        Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
          .sorted(Ordering.String).toSeq
      val a = arr(rnd.nextInt(12))
      val b = if (i % 5 == 0) a else arr(rnd.nextInt(12))
      (a, b)
    }
    val df = cases.toDF("a", "b")
    val checked = df.select(
      graft.functions.ArraySetExprs.sortedInterSize(col("a"), col("b"))
        .as("ki"),
      graft.functions.ArraySetExprs.sortedUnionSize(col("a"), col("b"))
        .as("ku"),
      size(array_intersect(col("a"), col("b"))).as("si"),
      size(array_union(col("a"), col("b"))).as("su"),
      graft.pipeline.Dedup.sortedJaccardArrays(col("a"), col("b"))
        .as("kj"),
      graft.pipeline.Dedup.jaccardArrays(col("a"), col("b")).as("sj"))
      .collect()
    checked.foreach { r =>
      assert(r.getInt(0) == r.getInt(2), s"inter mismatch: $r")
      assert(r.getInt(1) == r.getInt(3), s"union mismatch: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(5)),
             s"jaccard mismatch: $r")
    }
  }

  test("minhash-slots kernel == the transform/filter/array_min HOF " +
       "form on random hash arrays (negatives, empties, nulls)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = (0 until 100).map { _ =>
      Seq.fill(rnd.nextInt(40))(
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong()))
    } :+ Seq.empty[java.lang.Long] :+ Seq[java.lang.Long](null, null)
    val df = cases.toDF("h")
    Seq(1, 3, 32).foreach { k =>
      val hofForm = transform(sequence(lit(0), lit(k - 1)),
        j => coalesce(array_min(filter(col("h"),
                                       x => pmod(x, lit(k)) === j)),
                      array_min(col("h"))))
      val rows = df.select(
        graft.functions.MinHashExprs.minhashSlots(col("h"), k).as("a"),
        hofForm.as("b")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Any](0) == r.getSeq[Any](1), s"k=$k: $r")
      }
    }
  }

  test("sorted kernel matches built-ins in INTERPRETED eval too (the " +
       "non-codegen fallback path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 5L, 9L), Seq(2L, 5L, 6L)))
      .toDF("a", "b")
    // force the interpreted path by evaluating via the expression's
    // eval on a literal row
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    val conv = CatalystTypeConverters
      .createToCatalystConverter(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))
    val e = graft.functions.SortedInterUnionExpr(
      Literal.create(conv(Seq(1L, 2L, 5L, 9L)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      Literal.create(conv(Seq(2L, 5L, 6L)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    val packed = e.eval(null).asInstanceOf[Long]
    assert((packed >> 32).toInt == 2)           // {2, 5}
    assert((packed & 0xffffffffL).toInt == 5)   // {1,2,5,6,9}
    // and the codegen path over the same frame agrees
    val r = df.select(
      graft.functions.ArraySetExprs.sortedInterSize(col("a"), col("b")),
      graft.functions.ArraySetExprs.sortedUnionSize(col("a"), col("b")))
      .head
    assert(r.getInt(0) == 2 && r.getInt(1) == 5)
  }
}
