package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level data-quality audit (the Deequ/expectations shape): one
  * report row per (metric, column) over a single scan wherever the
  * metric allows it.
  *
  * Completeness metrics (`n_rows`, per-column null counts) and integer
  * bounds (min/max of long columns) fold into ONE global aggregate —
  * no shuffle, map-side partials only. Uniqueness metrics (distinct
  * counts) are the only shuffled part; with more than one uniqueness
  * column Spark plans them as an Expand (one duplicated pass per
  * count-distinct), so at cluster scale flip `approx = true` to use
  * HLL sketches (`approx_count_distinct`), which fold into the same
  * single aggregate with no Expand — the exact path is the oracle
  * surface, the approx path is the 100 TB path.
  *
  * Output: `metric` (e.g. `null_count:o_custkey`), `value` — all
  * BIGINT, ordered by metric name.
  */
object QualityChecks {

  def audit(df: DataFrame,
            nullCols: Seq[String] = Seq.empty,
            boundCols: Seq[String] = Seq.empty,
            distinctCols: Seq[String] = Seq.empty,
            approx: Boolean = false): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
      nullCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L))
          .as(s"null_count:$c")) ++
      boundCols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"min:$c"),
        max(col(c).cast("long")).as(s"max:$c"))) ++
      distinctCols.map(c =>
        (if (approx) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"distinct:$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = one.columns
    val stackArgs = names.map(n =>
      s"'${n.replace("'", "''")}', CAST(`$n` AS BIGINT)").mkString(", ")
    one.selectExpr(
      s"stack(${names.length}, $stackArgs) AS (metric, value)")
      .orderBy("metric")
  }
}
