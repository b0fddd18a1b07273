package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic CRM cohorting operator: score every customer 1..5 on each
  * dimension by exact global quantile band, then report the resulting
  * segments.
  *
  * Everything is integer-exact and SQL-replayable:
  *  - recency ranks on the customer's last-order epoch-day ascending
  *    (oldest = band 1, most recent = band 5; any "days since" anchor
  *    cancels out of a rank);
  *  - frequency = order count; monetary = total cents
  *    (`round(price*100)`);
  *  - each score is `((rn-1)*5) div n + 1` over the global row number
  *    under `(metric, custkey)` — the unique tie column makes the
  *    ordering total, so rank equals row_number and the replaying
  *    window agrees bit-for-bit.
  *
  * Scale shape: one groupBy(custkey) over orders (map-side combined),
  * then three [[DistributedRank.withGlobalRowNumber]] passes over the
  * customers-sized aggregate — bucketed-prefix rank, never a global
  * sort — and one tiny segment rollup. A 1e9-customer table holds.
  */
object Segmentation {

  /** Returns one row per populated RFM segment: `segment` (r*100 +
    * f*10 + m, e.g. 555 = best), `n_customers`, `sum_monetary_cents`.
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  priceCol: String): DataFrame = {
    val perCust = orders
      .where(col(custCol).isNotNull && col(dateCol).isNotNull)
      .groupBy(col(custCol).cast("long").as("cust"))
      // epoch-DAY index (`epoch_us // 1e6 // 86400` in the replay) —
      // the engine-portable day arithmetic of the retention matrix
      .agg(expr(s"max(unix_timestamp($dateCol)) div 86400")
             .as("last_day"),
           count(lit(1)).as("freq"),
           sum(round(col(priceCol) * 100).cast("long")).as("cents"))
    // ASCENDING rank on last_day puts the oldest customers in band 1
    // and the most recent in band 5, matching freq/monetary where
    // bigger = better; each pass banks its score and drops __n before
    // the next (the helper re-emits the count column).
    // NOTE (r12 audit): persisting each banded level was tried and
    // MEASURED 3x SLOWER (1.01 -> 3.09 s at sf0.1) — runtime
    // exchange/stage reuse already dedupes the repeated rank
    // subtrees, and three InMemoryRelation builds cost more than the
    // residual recompute. Left unpersisted deliberately.
    def banded(df: DataFrame, metric: String, tie: String, width: Long,
               score: String): DataFrame =
      DistributedRank.withGlobalRowNumber(df, metric, tie, width, "__rn")
        .withColumn(score, expr("((__rn - 1) * 5) div __n") + lit(1L))
        .drop("__rn", "__n")
    val scored =
      banded(banded(banded(perCust, "last_day", "cust", 16L, "r_score"),
                    "freq", "cust", 4L, "f_score"),
             "cents", "cust", 1000000L, "m_score")
    scored
      .groupBy((col("r_score") * 100 + col("f_score") * 10 +
                col("m_score")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
           sum("cents").as("sum_monetary_cents"))
      .orderBy("segment")
  }
}
