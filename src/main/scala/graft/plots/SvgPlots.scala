package graft.plots

import graft.core.BinningTables.{BinaryBinRow, ContinuousBinRow}

/** Dependency-free SVG renderers for the reference's plot surface —
  * the binning-table plot (`binning_statistics.py:610` — non-event /
  * event count bars + a WoE / event-rate line on a secondary axis),
  * the scorecard curves (`scorecard/plots.py:29-262` plot_auc_roc /
  * plot_cap / plot_ks) and the monitoring PSI plot
  * (`monitoring.py:404-480` — actual/expected population bars + the
  * per-bin metric lines).
  *
  * Design: every renderer is a pure `Seq[Double] -> String` function
  * over DRIVER-SIDE data that is bins- or curve-sized by construction
  * (bin tables are ≤ ~100 rows; ROC/CAP/KS curves come from the
  * bounded score aggregate the metrics already use, e.g. the
  * q_roc_points / q_cap_curve surfaces) — rendering never touches a
  * distributed row. The output is plain SVG 1.1 markup, no plotting
  * library: this container ships no matplotlib equivalent, and a
  * cluster driver writing a monitoring report wants an artifact it
  * can emit from a string builder.
  */
object SvgPlots {

  final val Width = 640
  final val Height = 420
  private val ML = 60.0 // margins: left
  private val MR = 60.0 // right (secondary axis)
  private val MT = 40.0
  private val MB = 50.0
  private val PW = Width - ML - MR  // plot width
  private val PH = Height - MT - MB // plot height

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.4f"

  /** Linear data->pixel scale over the plot area. */
  private final class Scale(lo: Double, hi: Double, pixLo: Double,
                            pixHi: Double) {
    private val span = if (hi == lo) 1.0 else hi - lo
    def apply(v: Double): Double =
      pixLo + (v - lo) / span * (pixHi - pixLo)
  }

  private def header(title: String): StringBuilder = {
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$Width""""
    sb ++= s""" height="$Height" viewBox="0 0 $Width $Height">"""
    sb ++= s"""<rect width="$Width" height="$Height" fill="white"/>"""
    sb ++= s"""<text x="${Width / 2}" y="24" text-anchor="middle"""" +
      s""" font-size="15" font-family="sans-serif">${esc(title)}</text>"""
    sb
  }

  private def axes(sb: StringBuilder, xlabel: String,
                   ylabel: String): Unit = {
    sb ++= s"""<line x1="$ML" y1="$MT" x2="$ML" y2="${MT + PH}"""" +
      """ stroke="black"/>"""
    sb ++= s"""<line x1="$ML" y1="${MT + PH}" x2="${ML + PW}"""" +
      s""" y2="${MT + PH}" stroke="black"/>"""
    sb ++= s"""<text x="${ML + PW / 2}" y="${Height - 12}"""" +
      """ text-anchor="middle" font-size="12"""" +
      s""" font-family="sans-serif">${esc(xlabel)}</text>"""
    sb ++= s"""<text x="16" y="${MT + PH / 2}" text-anchor="middle"""" +
      s""" font-size="12" font-family="sans-serif"""" +
      s""" transform="rotate(-90 16 ${MT + PH / 2})">""" +
      s"""${esc(ylabel)}</text>"""
  }

  private def polyline(sb: StringBuilder, xs: Seq[Double],
                       ys: Seq[Double], color: String,
                       dash: String = ""): Unit = {
    val pts = xs.zip(ys)
      .map { case (x, y) => f"$x%.2f,$y%.2f" }.mkString(" ")
    val d = if (dash.isEmpty) "" else s""" stroke-dasharray="$dash""""
    sb ++= s"""<polyline points="$pts" fill="none"""" +
      s""" stroke="$color" stroke-width="1.5"$d/>"""
  }

  private def legend(sb: StringBuilder,
                     entries: Seq[(String, String)]): Unit = {
    entries.zipWithIndex.foreach { case ((label, color), i) =>
      val y = MT + 14 + 16 * i
      sb ++= s"""<rect x="${ML + PW - 180}" y="${y - 9}" width="12"""" +
        s""" height="9" fill="$color"/>"""
      sb ++= s"""<text x="${ML + PW - 163}" y="$y" font-size="11"""" +
        s""" font-family="sans-serif">${esc(label)}</text>"""
    }
  }

  /** The standard binning plot (`binning_statistics.py:610`,
    * style="bin"): per bin, stacked non-event (blue) / event (red)
    * count bars on the primary axis and the metric (WoE or event
    * rate) as a marked line on the secondary axis. Pass the table's
    * rows; special/missing rows are the caller's add/drop choice,
    * as in the reference.
    */
  def binningPlot(rows: Seq[BinaryBinRow],
                  metric: String = "woe"): String = {
    require(rows.nonEmpty, "empty binning table")
    require(metric == "woe" || metric == "event_rate",
            s"metric must be woe or event_rate; got $metric")
    val mv = rows.map(r => if (metric == "woe") r.woe else r.eventRate)
    val maxC = math.max(rows.map(_.count).max, 1.0)
    val (mLo, mHi) = (math.min(mv.min, 0.0), math.max(mv.max, 0.0))
    val yC = new Scale(0, maxC, MT + PH, MT)
    val yM = new Scale(mLo, mHi, MT + PH, MT)
    val n = rows.length
    val slot = PW / n
    val bw = slot * 0.6
    val sb = header(s"Binning plot ($metric)")
    axes(sb, "Bin", "Count")
    sb ++= s"""<text x="${Width - 16}" y="${MT + PH / 2}"""" +
      s""" text-anchor="middle" font-size="12"""" +
      s""" font-family="sans-serif"""" +
      s""" transform="rotate(90 ${Width - 16} ${MT + PH / 2})">""" +
      s"""${esc(metric)}</text>"""
    rows.zipWithIndex.foreach { case (r, i) =>
      val x = ML + slot * i + (slot - bw) / 2
      // stacked: non-event below, event above
      val yNe = yC(r.nonevent)
      val hNe = MT + PH - yNe
      val hEv = (MT + PH - yC(r.event)) - 0.0
      sb ++= f"""<rect x="$x%.2f" y="$yNe%.2f" width="$bw%.2f"""" +
        f""" height="$hNe%.2f" fill="#4878cf"/>"""
      sb ++= f"""<rect x="$x%.2f" y="${yNe - hEv}%.2f"""" +
        f""" width="$bw%.2f" height="$hEv%.2f" fill="#d65f5f"/>"""
      sb ++= f"""<text x="${x + bw / 2}%.2f" y="${MT + PH + 14}%.2f"""" +
        s""" text-anchor="middle" font-size="10"""" +
        s""" font-family="sans-serif">$i</text>"""
    }
    val cx = rows.indices.map(i => ML + slot * i + slot / 2)
    polyline(sb, cx, mv.map(yM(_)), "black")
    cx.zip(mv).foreach { case (x, v) =>
      sb ++= f"""<circle cx="$x%.2f" cy="${yM(v)}%.2f" r="3"""" +
        """ fill="black"/>"""
    }
    legend(sb, Seq("Non-event" -> "#4878cf", "Event" -> "#d65f5f",
                   metric -> "black"))
    sb ++= "</svg>"
    sb.result()
  }

  /** Continuous-table variant: count bars + bin-mean line
    * (`binning_statistics.py:1700`). */
  def binningPlotContinuous(rows: Seq[ContinuousBinRow]): String = {
    require(rows.nonEmpty, "empty binning table")
    val maxC = math.max(rows.map(_.count).max, 1.0)
    val means = rows.map(_.mean)
    val yC = new Scale(0, maxC, MT + PH, MT)
    val yM = new Scale(math.min(means.min, 0.0),
                       math.max(means.max, 0.0), MT + PH, MT)
    val n = rows.length
    val slot = PW / n
    val bw = slot * 0.6
    val sb = header("Binning plot (mean)")
    axes(sb, "Bin", "Count")
    rows.zipWithIndex.foreach { case (r, i) =>
      val x = ML + slot * i + (slot - bw) / 2
      val y = yC(r.count)
      sb ++= f"""<rect x="$x%.2f" y="$y%.2f" width="$bw%.2f"""" +
        f""" height="${MT + PH - y}%.2f" fill="#4878cf"/>"""
    }
    val cx = rows.indices.map(i => ML + slot * i + slot / 2)
    polyline(sb, cx, means.map(yM(_)), "black")
    legend(sb, Seq("Count" -> "#4878cf", "Mean" -> "black"))
    sb ++= "</svg>"
    sb.result()
  }

  /** ROC curve (`plots.py:29-107` plot_auc_roc): the model curve over
    * (fpr, tpr) points — e.g. the q_roc_points surface — plus the
    * random-model diagonal and the AUC in the legend. Points need not
    * include the (0,0)/(1,1) anchors; they are added. */
  def rocPlot(fpr: Seq[Double], tpr: Seq[Double], auc: Double): String = {
    require(fpr.length == tpr.length && fpr.nonEmpty, "empty curve")
    val xs = 0.0 +: fpr :+ 1.0
    val ys = 0.0 +: tpr :+ 1.0
    val x = new Scale(0, 1, ML, ML + PW)
    val y = new Scale(0, 1, MT + PH, MT)
    val sb = header("ROC curve")
    axes(sb, "False positive rate", "True positive rate")
    polyline(sb, Seq(x(0), x(1)), Seq(y(0), y(1)), "black", "4 3")
    polyline(sb, xs.map(x(_)), ys.map(y(_)), "#2a9d2a")
    legend(sb, Seq(f"Model (AUC: $auc%.5f)" -> "#2a9d2a",
                   "Random Model" -> "black"))
    sb ++= "</svg>"
    sb.result()
  }

  /** CAP curve (`plots.py:110-178` plot_cap): model curve over
    * (fraction of population, fraction of events) — the q_cap_curve
    * surface — plus the random diagonal and the perfect-model
    * elbow at x = eventRate. */
  def capPlot(pPopulation: Seq[Double], pEvent: Seq[Double],
              gini: Double, eventRate: Double): String = {
    require(pPopulation.length == pEvent.length && pEvent.nonEmpty,
            "empty curve")
    val x = new Scale(0, 1, ML, ML + PW)
    val y = new Scale(0, 1, MT + PH, MT)
    val sb = header("Cumulative Accuracy Profile (CAP)")
    axes(sb, "Fraction of all population", "Fraction of event population")
    polyline(sb, Seq(x(0), x(1)), Seq(y(0), y(1)), "black", "4 3")
    polyline(sb, Seq(x(0), x(eventRate), x(1)),
             Seq(y(0), y(1), y(1)), "grey", "4 3")
    val xs = 0.0 +: pPopulation
    val ys = 0.0 +: pEvent
    polyline(sb, xs.map(x(_)), ys.map(y(_)), "#2a9d2a")
    legend(sb, Seq(f"Model (Gini: $gini%.5f)" -> "#2a9d2a",
                   "Perfect Model" -> "grey",
                   "Random Model" -> "black"))
    sb ++= "</svg>"
    sb.result()
  }

  /** KS plot (`plots.py:181-262` plot_ks): cumulative event and
    * non-event distributions over the score/probability threshold,
    * with the KS gap marked at its argmax. */
  def ksPlot(thresholds: Seq[Double], pEvent: Seq[Double],
             pNonevent: Seq[Double]): String = {
    require(thresholds.nonEmpty &&
              thresholds.length == pEvent.length &&
              thresholds.length == pNonevent.length, "empty curve")
    val diffs = pNonevent.zip(pEvent).map { case (a, b) => a - b }
    val kIdx = diffs.indices.maxBy(diffs(_))
    val ks = diffs(kIdx)
    val x = new Scale(thresholds.min, thresholds.max, ML, ML + PW)
    val y = new Scale(0, 1, MT + PH, MT)
    val sb = header("Kolmogorov-Smirnov")
    axes(sb, "Threshold", "Cumulative probability")
    polyline(sb, thresholds.map(x(_)), pEvent.map(y(_)), "#d65f5f")
    polyline(sb, thresholds.map(x(_)), pNonevent.map(y(_)), "#4878cf")
    val kx = x(thresholds(kIdx))
    sb ++= f"""<line x1="$kx%.2f" y1="${y(pEvent(kIdx))}%.2f"""" +
      f""" x2="$kx%.2f" y2="${y(pNonevent(kIdx))}%.2f"""" +
      """ stroke="black" stroke-dasharray="4 3"/>"""
    val ty = 0.5 * (y(pEvent(kIdx)) + y(pNonevent(kIdx)))
    sb ++= f"""<text x="${kx + 6}%.2f" y="$ty%.2f" font-size="12"""" +
      s""" font-family="sans-serif">KS: ${f"${ks * 100}%.2f"}%""" +
      s""" at ${fmt(thresholds(kIdx))}</text>"""
    legend(sb, Seq("Cumulative events" -> "#d65f5f",
                   "Cumulative non-events" -> "#4878cf"))
    sb ++= "</svg>"
    sb.result()
  }

  /** Monitoring PSI plot (`monitoring.py:404-480` psi_plot): per score
    * bin, side-by-side actual/expected population-share bars plus the
    * per-bin metric (event rate or mean) lines on the secondary axis. */
  def psiPlot(pRecordsActual: Seq[Double], pRecordsExpected: Seq[Double],
              metricActual: Seq[Double], metricExpected: Seq[Double],
              metricLabel: String): String = {
    val n = pRecordsActual.length
    require(n > 0 && pRecordsExpected.length == n &&
              metricActual.length == n && metricExpected.length == n,
            "ragged psi plot inputs")
    val maxP = math.max(
      math.max(pRecordsActual.max, pRecordsExpected.max), 1e-12)
    val mAll = metricActual ++ metricExpected
    val yP = new Scale(0, maxP, MT + PH, MT)
    val yM = new Scale(math.min(mAll.min, 0.0),
                       math.max(mAll.max, 0.0), MT + PH, MT)
    val slot = PW / n
    val bw = slot * 0.3
    val sb = header("PSI plot")
    axes(sb, "Bin ID", "Population distribution")
    (0 until n).foreach { i =>
      val xa = ML + slot * i + slot / 2 - bw
      val xe = ML + slot * i + slot / 2
      val ya = yP(pRecordsActual(i))
      val ye = yP(pRecordsExpected(i))
      sb ++= f"""<rect x="$xa%.2f" y="$ya%.2f" width="$bw%.2f"""" +
        f""" height="${MT + PH - ya}%.2f" fill="#d65f5f"""" +
        """ fill-opacity="0.75"/>"""
      sb ++= f"""<rect x="$xe%.2f" y="$ye%.2f" width="$bw%.2f"""" +
        f""" height="${MT + PH - ye}%.2f" fill="#4878cf"""" +
        """ fill-opacity="0.75"/>"""
    }
    val cx = (0 until n).map(i => ML + slot * i + slot / 2)
    polyline(sb, cx, metricActual.map(yM(_)), "#d65f5f")
    polyline(sb, cx, metricExpected.map(yM(_)), "#4878cf")
    legend(sb, Seq("Actual" -> "#d65f5f", "Expected" -> "#4878cf",
                   metricLabel -> "black"))
    sb ++= "</svg>"
    sb.result()
  }

  /** Write an SVG string to a file (UTF-8). */
  def save(path: String, svg: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(path), "UTF-8")
    try w.print(svg) finally w.close()
  }
}
