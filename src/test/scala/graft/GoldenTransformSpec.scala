package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.sources.Sources

/** Strongest end-to-end parity test: the reference's
  * `tests/results/breast_cancer_woe.csv` is the default BinningProcess
  * fit_transform over all 30 breast-cancer variables — every cell matches
  * only if prebinning (CART), refinement, auto-trend, solver, table WoE,
  * and the transform CASE all reproduce the reference per variable.
  */
class GoldenTransformSpec extends AnyFunSuite {

  test("BinningProcess default woe transform matches reference golden CSV") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val variables = df.columns.filter(_ != "target").toSeq

    val proc = BinningProcess.fit(df, variables, "target",
                                  config = BinningConfig())

    val golden = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv("/root/reference/tests/results/breast_cancer_woe.csv")

    // row order: golden csv written in the same row order as the parquet —
    // add a join key via monotonically increasing position in both
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(monotonically_increasing_id())
    val mine = proc.transform(df, "woe")

    val mineRows = mine.collect()
    val goldRows = golden.select(variables.map(col): _*).collect()
    assert(mineRows.length == goldRows.length)

    var nMismatch = 0
    val mismatchVars = scala.collection.mutable.Set.empty[String]
    val myCols = mine.columns
    mineRows.zip(goldRows).foreach { case (m, g) =>
      variables.foreach { v =>
        val a = m.getDouble(m.fieldIndex(v))
        val b = g.getDouble(g.fieldIndex(v))
        if (math.abs(a - b) > 1e-6 * math.max(1.0, math.abs(b))) {
          nMismatch += 1
          mismatchVars += v
        }
      }
    }
    val totalCells = mineRows.length * variables.length
    info(s"cells=$totalCells mismatches=$nMismatch " +
         s"vars=${mismatchVars.mkString(",")}")
    // require full parity; report which variables diverge if not
    assert(nMismatch == 0,
           s"$nMismatch/$totalCells cells differ in vars: " +
             mismatchVars.mkString(", "))
  }

  test("fitTransformDisk csv->parquet matches the disk-path golden CSV") {
    // the reference's test_default_fit_transform_disk writes
    // breast_cancer_woe_2.csv via the chunked disk path with default
    // parameters; our disk path must reproduce every cell from the raw
    // csv input (column names carry spaces -> underscore them for the
    // parquet sink, mapping back for the golden compare)
    val spark = TestSpark.spark
    val raw = Sources.readTable(
      spark, "/root/reference/tests/data/breast_cancer.csv")
    val variables = raw.columns.filter(_ != "target").toSeq
    val safe = variables.map(v => v -> v.replace(' ', '_')).toMap
    val renamed = variables.foldLeft(raw) { (d, v) =>
      d.withColumnRenamed(v, safe(v))
    }
    val in = java.nio.file.Files
      .createTempDirectory("graft_golden_in").toString + "/bc.parquet"
    renamed.coalesce(1).write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files
      .createTempDirectory("graft_golden_out").toString + "/woe.parquet"

    Sources.fitTransformDisk(spark, in, out,
                             variables.map(safe), "target")

    val mine = spark.read.parquet(out).collect()
    // the reference test APPENDS chunks to the committed results file, so
    // the golden holds two stacked copies separated by a repeated header
    // line (1139 rows); compare against the first 569-row block, parsing
    // explicitly since the embedded header forces a string schema
    val golden = spark.read.option("header", "true")
      .csv("/root/reference/tests/results/breast_cancer_woe_2.csv")
      .collect()
      .filter(r => r.getString(0) != variables.head)
      .take(mine.length)
    assert(mine.length == golden.length)
    var nMismatch = 0
    mine.zip(golden).foreach { case (m, g) =>
      variables.foreach { v =>
        val a = m.getDouble(m.fieldIndex(safe(v)))
        val b = g.getString(g.fieldIndex(v)).toDouble
        if (math.abs(a - b) > 1e-6 * math.max(1.0, math.abs(b)))
          nMismatch += 1
      }
    }
    assert(nMismatch == 0,
           s"$nMismatch/${mine.length * variables.length} cells differ")
  }
}
