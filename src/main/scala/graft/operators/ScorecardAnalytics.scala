package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deployment-side scorecard analytics: the reports a risk team runs
  * on a score that is already in production — gains/lift by band,
  * cost-optimal operating threshold, per-variable score-shift
  * attribution ("characteristic analysis"), and band migration between
  * snapshots. The reference stops at PSI / statistical tests
  * (`scorecard/monitoring.py`); these are the standard companions on
  * the same aggregates.
  *
  * Scale discipline shared by all four: ONE full-data aggregate keyed
  * on the (bounded) band/bin, then every ranking, cumulative sum and
  * share runs on the bands-row table — a single-task window over a
  * deliberately bounded frame (the documented bounded-rows window
  * discipline), never a window over raw rows. Shares are emitted as
  * truncated-ppm BIGINTs (`1e6 * part div whole`): exact integers that
  * replay bit-identically in ANSI SQL. The ppm scaling bounds inputs at
  * `part < 2^63 / 1e6` ≈ 9.2e12 rows per cell — comfortably above a
  * 100 TB table's row count; beyond that, widen to DECIMAL(38,0) (the
  * benford() convention).
  */
object ScorecardAnalytics {

  /** Gains / lift table: bands ranked by event rate (descending),
    * cumulative population and event capture at each depth.
    *
    * Rate ordering compares `e/n` as doubles — a single correctly-
    * rounded IEEE division on both engines, so the order (and the
    * `bin ASC` tie-break) replays exactly in SQL. Output per rank:
    * band sizes, cumulative tallies, `capture_ppm` (share of all
    * events caught at this depth), `depth_ppm` (share of population
    * scored positive), and `lift6` (capture/depth, rounded to 6).
    */
  def gainsTable(df: DataFrame, binCol: Column, yCol: String): DataFrame = {
    val byBin = df
      .groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("n"),
           sum(col(yCol).cast("long")).as("n_event"))
    // bounded frame from here on: one row per band
    val ord = graft.core.Windows.bounded(
      (col("n_event").cast("double") / col("n")).desc, col("bin").asc)
    val all = graft.core.Windows.boundedAll
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = graft.core.Windows.bounded(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a zero-event population degrades to null capture/lift instead of
    // raising DIVIDE_BY_ZERO under ANSI (the diffInDiff empty-cell
    // discipline); lift multiplies DOUBLE factors, never BIGINTs —
    // cum_event * tot_n as BIGINT overflows past ~3e9 rows, far below
    // the ppm arithmetic's own ~9.2e12 bound
    byBin
      .withColumn("rank", row_number().over(ord))
      .withColumn("cum_n", sum("n").over(cum))
      .withColumn("cum_event", sum("n_event").over(cum))
      .withColumn("tot_n", sum("n").over(all))
      .withColumn("tot_event", sum("n_event").over(all))
      .select(
        col("rank"), col("bin"), col("n"), col("n_event"),
        col("cum_n"), col("cum_event"),
        when(col("tot_event") > 0,
             expr("(1000000 * cum_event) div tot_event"))
          .as("capture_ppm"),
        expr("(1000000 * cum_n) div tot_n").as("depth_ppm"),
        when(col("tot_event") > 0,
             round(col("cum_event").cast("double") *
                   col("tot_n").cast("double") /
                   (col("cum_n").cast("double") *
                    col("tot_event").cast("double")), 6))
          .as("lift6"))
      .orderBy("rank")
  }

  /** Cost-optimal operating threshold sweep: classify the top-k rate-
    * ranked bands positive for every k, tally the confusion matrix
    * from the SAME cumulative sums the gains table uses, and flag the
    * smallest k minimizing `fnCost*FN + fpCost*FP`. Integer costs —
    * the argmin is exact, no float compare anywhere. */
  def thresholdSweep(df: DataFrame, binCol: Column, yCol: String,
                     fnCost: Long, fpCost: Long): DataFrame = {
    require(fnCost >= 0 && fpCost >= 0, "costs must be non-negative")
    val byBin = df
      .groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("n"),
           sum(col(yCol).cast("long")).as("n_event"))
    val ord = graft.core.Windows.bounded(
      (col("n_event").cast("double") / col("n")).desc, col("bin").asc)
    val all = graft.core.Windows.boundedAll
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = graft.core.Windows.bounded(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = byBin
      .withColumn("k", row_number().over(ord))
      .withColumn("tp", sum("n_event").over(cum))
      .withColumn("cum_n", sum("n").over(cum))
      .withColumn("tot_n", sum("n").over(all))
      .withColumn("tot_event", sum("n_event").over(all))
      .withColumn("fp", col("cum_n") - col("tp"))
      .withColumn("fn", col("tot_event") - col("tp"))
      .withColumn("tn", col("tot_n") - col("tot_event") - col("fp"))
      .withColumn("cost", lit(fnCost) * col("fn") + lit(fpCost) * col("fp"))
    swept
      .withColumn("min_cost", min("cost").over(all))
      .withColumn("best_k",
        min(when(col("cost") === col("min_cost"), col("k"))).over(all))
      .select(col("k"), col("bin"), col("tp"), col("fp"), col("fn"),
              col("tn"), col("cost"),
              when(col("k") === col("best_k"), 1L).otherwise(0L)
                .as("is_best"))
      .orderBy("k")
  }

  /** Characteristic analysis: decompose a population score shift into
    * per-variable, per-bin contributions `(pct_test - pct_train) *
    * woe_train`. The train cohort defines both the expected
    * distribution and the deployed per-bin WoE; any variable whose
    * bins drifted shows up with its signed score-shift mass.
    *
    * One aggregate per cohort per variable (the loop is over the
    * scorecard's variable list — bounded by model width, never data).
    * WoE uses the closed form `ln((ne/tne)/(e/te))` at the caller's
    * pinned splits, so the whole report replays in SQL at any SF. */
  def characteristicShift(train: DataFrame, test: DataFrame,
                          vars: Seq[(String, Column)],
                          yCol: String): DataFrame = {
    require(vars.nonEmpty, "characteristicShift needs >= 1 variable")
    val perVar = vars.map { case (name, binCol) =>
      val tr = train.groupBy(binCol.as("bin"))
        .agg(count(lit(1)).as("n_train"),
             sum(col(yCol).cast("long")).as("e_train"))
      val te = test.groupBy(binCol.as("bin"))
        .agg(count(lit(1)).as("n_test"))
      // bounded frame: one row per bin of ONE variable
      val all = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      tr.join(te, Seq("bin"), "full_outer")
        .na.fill(0L, Seq("n_train", "e_train", "n_test"))
        .withColumn("tot_train", sum("n_train").over(all))
        .withColumn("tot_e", sum("e_train").over(all))
        .withColumn("tot_test", sum("n_test").over(all))
        .withColumn("ne_train", col("n_train") - col("e_train"))
        .withColumn("tot_ne", col("tot_train") - col("tot_e"))
        .withColumn("woe6",
          round(when(col("e_train") > 0 && col("ne_train") > 0,
            log((col("ne_train").cast("double") / col("tot_ne")) /
                (col("e_train").cast("double") / col("tot_e"))))
            .otherwise(lit(0.0)), 6))
        .select(
          lit(name).as("variable"), col("bin"),
          col("n_train"), col("n_test"),
          // empty-cohort guard: an all-null cohort degrades to null
          // shares instead of an ANSI DIVIDE_BY_ZERO
          when(col("tot_train") > 0,
               expr("(1000000 * n_train) div tot_train"))
            .as("pct_train_ppm"),
          when(col("tot_test") > 0,
               expr("(1000000 * n_test) div tot_test"))
            .as("pct_test_ppm"),
          col("woe6"),
          when(col("tot_train") > 0 && col("tot_test") > 0,
               round((col("n_test").cast("double") / col("tot_test") -
                      col("n_train").cast("double") / col("tot_train")) *
                     col("woe6"), 6))
            .as("shift6"))
    }
    perVar.reduce(_.unionByName(_)).orderBy("variable", "bin")
  }

  /** Band migration matrix between two snapshots: entities present in
    * BOTH snapshots, counted by (band_then, band_now). One shuffle
    * join on the entity key (both sides pre-aggregated to one row per
    * entity), then the matrix itself is bounded by bands². Row shares
    * are truncated ppm within each origin band. */
  def bandMigration(before: DataFrame, after: DataFrame,
                    keyCol: String, bandCol: String): DataFrame = {
    val a = before.select(col(keyCol).as("__k"),
                          col(bandCol).as("band_from"))
    val b = after.select(col(keyCol).as("__k"),
                         col(bandCol).as("band_to"))
    val rowTot = Window.partitionBy("band_from")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    a.join(b, "__k")
      .groupBy("band_from", "band_to")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_tot", sum("n").over(rowTot))
      .select(col("band_from"), col("band_to"), col("n"),
              expr("(1000000 * n) div row_tot").as("share_ppm"))
      .orderBy("band_from", "band_to")
  }
}
