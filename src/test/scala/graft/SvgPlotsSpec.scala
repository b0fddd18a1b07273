package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BinningConfig, OptimalBinning}
import graft.plots.SvgPlots

/** The reference's plot surface (`binning_statistics.py:610`,
  * `scorecard/plots.py`, `monitoring.py:404`) rendered as
  * dependency-free SVG. Assertions: every artifact is well-formed XML
  * (JDK DocumentBuilder), mark counts equal data counts, and the
  * data-derived labels (AUC/Gini/KS) appear where the reference puts
  * them.
  */
class SvgPlotsSpec extends AnyFunSuite {

  private def parse(svg: String) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  private def count(svg: String, tag: String): Int = {
    val d = parse(svg)
    d.getElementsByTagNameNS("*", tag).getLength
  }

  test("binningPlot: fitted table renders stacked bars per bin + " +
       "metric line; well-formed XML") {
    val spark = TestSpark.spark
    val li = spark.read
      .parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .withColumn("y",
                  when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val fitted = OptimalBinning.fit(li, "l_extendedprice", "y",
                                    BinningConfig(name = "x"))
    val rows = fitted.table.rows.toSeq
    Seq("woe", "event_rate").foreach { m =>
      val svg = SvgPlots.binningPlot(rows, m)
      // 2 stacked rects per bin + 1 background + 3 legend swatches
      assert(count(svg, "rect") == 2 * rows.length + 1 + 3, m)
      assert(count(svg, "circle") == rows.length, m)
      assert(count(svg, "polyline") == 1, m)
      assert(svg.contains(m))
    }
    intercept[IllegalArgumentException] {
      SvgPlots.binningPlot(rows, "iv")
    }
  }

  test("rocPlot / capPlot: curve + guide lines, AUC and Gini labels") {
    val fpr = Seq(0.1, 0.3, 0.6)
    val tpr = Seq(0.5, 0.8, 0.95)
    val roc = SvgPlots.rocPlot(fpr, tpr, auc = 0.87654)
    assert(count(roc, "polyline") == 2)
    assert(roc.contains("AUC: 0.87654"))
    val cap = SvgPlots.capPlot(Seq(0.25, 0.5, 1.0), Seq(0.6, 0.85, 1.0),
                               gini = 0.75321, eventRate = 0.4)
    assert(count(cap, "polyline") == 3)
    assert(cap.contains("Gini: 0.75321"))
    assert(cap.contains("Perfect Model") && cap.contains("Random Model"))
  }

  test("ksPlot: marks the KS gap at its argmax with the reference's " +
       "percent-at-threshold label") {
    val th = Seq(0.1, 0.2, 0.3, 0.4)
    val pe = Seq(0.05, 0.10, 0.30, 1.0)
    val pn = Seq(0.20, 0.55, 0.80, 1.0)
    // diffs: .15 .45 .50 0 -> argmax at threshold 0.3, KS 50%
    val svg = SvgPlots.ksPlot(th, pe, pn)
    assert(svg.contains("KS: 50.00% at 0.3000"))
    assert(count(svg, "polyline") == 2)
    assert(count(svg, "line") >= 3) // 2 axes + the KS gap marker
  }

  test("psiPlot: side-by-side cohort bars per bin + two metric lines") {
    val svg = SvgPlots.psiPlot(
      pRecordsActual = Seq(0.2, 0.5, 0.3),
      pRecordsExpected = Seq(0.25, 0.45, 0.30),
      metricActual = Seq(0.1, 0.4, 0.7),
      metricExpected = Seq(0.12, 0.38, 0.72),
      metricLabel = "Event rate")
    // 2 bars per bin + background + 3 legend swatches
    assert(count(svg, "rect") == 2 * 3 + 1 + 3)
    assert(count(svg, "polyline") == 2)
    assert(svg.contains("Event rate"))
    // save round-trips bytes
    val p = java.nio.file.Files.createTempFile("graft_psi", ".svg")
    SvgPlots.save(p.toString, svg)
    assert(new String(java.nio.file.Files.readAllBytes(p),
                      "UTF-8") == svg)
    java.nio.file.Files.delete(p)
  }
}
