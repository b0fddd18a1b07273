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
}
