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
}
