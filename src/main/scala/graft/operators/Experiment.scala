package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation (A/B) readouts. */
object Experiment {

  /** CUPED variance-reduced group means: adjust each unit's metric by
    * `theta * (x - mean(x))` where `x` is a pre-experiment covariate
    * and `theta = Cov(x, y) / Var(x)` pooled over all units — the
    * standard pre-period-spend adjustment that removes covariate noise
    * from the treatment/control comparison.
    *
    * ONE full-data aggregate keyed by the treatment arm accumulates
    * the integer sufficient statistics (`n`, `sum x`, `sum y`,
    * `sum xy`, `sum x^2` as BIGINTs — callers feed integer-unit
    * metrics, e.g. whole dollars; the squared sums bound inputs at
    * `|x| < ~3e9 * sqrt(1/n)`-ish scale, widen the inputs' unit or go
    * DECIMAL(38,0) past that, the benford convention). Pooled totals
    * come from a window over the arms-row table. Theta and the
    * adjusted means are then single IEEE double expressions over
    * exactly-agreed integers — every operand cast to double
    * explicitly, so the arithmetic replays bit-identically in SQL —
    * and the ROUNDED theta feeds the adjustment (the
    * characteristicShift convention).
    *
    * Output per arm: `t, n, sum_x, sum_y, theta6, mean_y6,
    * adj_mean_y6`.
    */
  def cuped(units: DataFrame, tCol: String, xCol: String,
            yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val arms = units
      .groupBy(col(tCol).cast("long").as("t"))
      .agg(count(lit(1)).as("n_g"), sum(x).as("sx_g"),
           sum(y).as("sy_g"), sum(x * y).as("sxy_g"),
           sum(x * x).as("sxx_g"))
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def d(c: String) = col(c).cast("double")
    val pooled = arms
      .withColumn("n", sum("n_g").over(wAll))
      .withColumn("sx", sum("sx_g").over(wAll))
      .withColumn("sy", sum("sy_g").over(wAll))
      .withColumn("sxy", sum("sxy_g").over(wAll))
      .withColumn("sxx", sum("sxx_g").over(wAll))
    val varX = d("n") * d("sxx") - d("sx") * d("sx")
    val covXY = d("n") * d("sxy") - d("sx") * d("sy")
    pooled
      .withColumn("theta6",
        round(when(varX === 0.0, 0.0).otherwise(covXY / varX), 6))
      .select(col("t"), col("n_g").as("n"), col("sx_g").as("sum_x"),
              col("sy_g").as("sum_y"), col("theta6"),
              round(d("sy_g") / d("n_g"), 6).as("mean_y6"),
              round(d("sy_g") / d("n_g") -
                    col("theta6") *
                      (d("sx_g") / d("n_g") - d("sx") / d("n")), 6)
                .as("adj_mean_y6"))
      .orderBy("t")
  }

  /** Sample-ratio-mismatch check for an intended 50/50 split: the
    * 1-df chi-square against equal arms simplifies to
    * `(n0 - n1)^2 / n`, computed as one IEEE expression over the two
    * BIGINT arm counts; flagged past the 95% critical value 3.841459.
    * An SRM flag invalidates the experiment readout BEFORE any metric
    * is compared — the first gate a trustworthy A/B system runs.
    * ONE count aggregate; everything else is arithmetic on two longs.
    */
  def srmCheck(units: DataFrame, tCol: String): DataFrame = {
    units
      .agg(sum(when(col(tCol).cast("long") === 0L, 1L).otherwise(0L))
             .as("n0"),
           sum(when(col(tCol).cast("long") === 0L, 0L).otherwise(1L))
             .as("n1"))
      .select(col("n0"), col("n1"), (col("n0") + col("n1")).as("n"),
              round((col("n0") - col("n1")).cast("double") *
                    (col("n0") - col("n1")).cast("double") /
                    (col("n0") + col("n1")).cast("double"), 6)
                .as("chi2_6"))
      .withColumn("srm_flag",
                  when(col("chi2_6") > 3.841459, 1L).otherwise(0L))
  }

  /** Difference-in-differences readout: arm x period integer metric
    * sums in ONE keyed aggregate, then the 2x2 means and the
    * interaction effect `(m11 - m10) - (m01 - m00)` as fully-cast
    * IEEE expressions over the 4-cell table (conditional sums — no
    * pivot, no join). Output is a single row with the four cell
    * counts/means and the DiD estimate. */
  def diffInDiff(df: DataFrame, tCol: String, periodCol: String,
                 yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(tCol).cast("long").as("t"),
               col(periodCol).cast("long").as("p"))
      .agg(count(lit(1)).as("n"),
           sum(col(yCol).cast("long")).as("sy"))
    def cell(t: Int, p: Int, c: String) =
      sum(when(col("t") === t && col("p") === p, col(c))
            .otherwise(0L))
    // explicit empty-cell guard: ANSI mode (the Spark 4 default)
    // raises DIVIDE_BY_ZERO even for double division, so an absent
    // cell must take NaN through a branch, not through 0.0/0.0
    def m(t: Int, p: Int) =
      when(cell(t, p, "n") === 0L, lit(Double.NaN))
        .otherwise(cell(t, p, "sy").cast("double") /
                   cell(t, p, "n").cast("double"))
    cells.agg(
      cell(0, 0, "n").as("n_00"), cell(0, 1, "n").as("n_01"),
      cell(1, 0, "n").as("n_10"), cell(1, 1, "n").as("n_11"),
      round(m(0, 0), 6).as("mean_00_6"),
      round(m(0, 1), 6).as("mean_01_6"),
      round(m(1, 0), 6).as("mean_10_6"),
      round(m(1, 1), 6).as("mean_11_6"),
      round((m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0)), 6).as("did6"))
  }

  /** [[diffInDiff]] per segment — the heterogeneous-treatment-effect
    * readout. ONE aggregate keyed (segment, arm, period); the 2x2
    * cells and the interaction effect then fold per segment with the
    * same conditional sums (no pivot, no join, no window). Segments
    * with an empty cell emit NaN means/effect (undefined by
    * construction) rather than being dropped. */
  def diffInDiffBySegment(df: DataFrame, segCol: String, tCol: String,
                          periodCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(segCol).as("segment"),
               col(tCol).cast("long").as("t"),
               col(periodCol).cast("long").as("p"))
      .agg(count(lit(1)).as("n"),
           sum(col(yCol).cast("long")).as("sy"))
    def cell(t: Int, p: Int, c: String) =
      sum(when(col("t") === t && col("p") === p, col(c))
            .otherwise(0L))
    // explicit empty-cell guard: ANSI mode (the Spark 4 default)
    // raises DIVIDE_BY_ZERO even for double division, so an absent
    // cell must take NaN through a branch, not through 0.0/0.0
    def m(t: Int, p: Int) =
      when(cell(t, p, "n") === 0L, lit(Double.NaN))
        .otherwise(cell(t, p, "sy").cast("double") /
                   cell(t, p, "n").cast("double"))
    cells.groupBy("segment").agg(
      cell(0, 0, "n").as("n_00"), cell(0, 1, "n").as("n_01"),
      cell(1, 0, "n").as("n_10"), cell(1, 1, "n").as("n_11"),
      round(m(0, 0), 6).as("mean_00_6"),
      round(m(0, 1), 6).as("mean_01_6"),
      round(m(1, 0), 6).as("mean_10_6"),
      round(m(1, 1), 6).as("mean_11_6"),
      round((m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0)), 6).as("did6"))
      .orderBy("segment")
  }

  /** Post-hoc power readout for a binary-conversion A/B: from the two
    * arm sizes and conversion counts, the pooled rate and the minimal
    * detectable absolute effect at 80% power / 5% two-sided alpha —
    * `(z_{a/2} + z_b) * sqrt(2 p (1-p) / n_min)` with the z literals
    * scaled to 6dp (1.959964, 0.841621, the benford literal
    * convention). `sqrt` is IEEE-correctly-rounded in both engines,
    * so the rounded readout replays exactly. Flags whether the
    * OBSERVED |rate difference| clears the MDE. One count aggregate.
    */
  def abPower(units: DataFrame, tCol: String,
              convCol: String): DataFrame = {
    val t = col(tCol).cast("long")
    val c = col(convCol).cast("long")
    val agg = units.agg(
      sum(when(t === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(t === 0L, c).otherwise(0L)).as("conv0"),
      sum(when(t === 0L, 0L).otherwise(1L)).as("n1"),
      sum(when(t === 0L, 0L).otherwise(c)).as("conv1"))
    def d(s: String) = col(s).cast("double")
    val p = (d("conv0") + d("conv1")) / (d("n0") + d("n1"))
    val nMin = least(col("n0"), col("n1")).cast("double")
    val mde = lit(1.959964 + 0.841621) *
      sqrt(lit(2.0) * p * (lit(1.0) - p) / nMin)
    val diff = abs(d("conv1") / d("n1") - d("conv0") / d("n0"))
    agg.select(col("n0"), col("conv0"), col("n1"), col("conv1"),
               expr("(1000000 * (conv0 + conv1)) div (n0 + n1)")
                 .as("p_pooled_ppm"),
               round(mde, 6).as("mde_abs6"),
               round(diff, 6).as("obs_diff6"))
      .withColumn("powered",
                  when(col("obs_diff6") > col("mde_abs6"), 1L)
                    .otherwise(0L))
  }
}
