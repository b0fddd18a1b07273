package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence (market-basket) graph build: count how often two
  * items share a basket. The naive shape is a self-join of
  * (basket, item) on basket — a shuffle join whose output IS the
  * pair fan-out. This implementation instead collects each basket's
  * DISTINCT items into one sorted array (one shuffle; basket size is
  * bounded by the domain — an order holds a handful of lines, never
  * a corpus) and generates the ordered pairs per basket with a
  * generator, so the only shuffle after the group-by carries
  * (item_a, item_b) pairs straight into the count aggregate.
  *
  * A basket with b distinct items yields C(b,2) pairs; callers with
  * unbounded basket sizes (a user's lifetime history) should cap or
  * re-key baskets first — the fan-out is quadratic in basket size by
  * problem definition, not by plan choice.
  */
object MarketBasket {

  /** One row per unordered item pair (`item_a < item_b`) with its
    * basket co-occurrence count. Null basket/item rows are excluded. */
  def coOccurrence(df: DataFrame, basketCol: String,
                   itemCol: String): DataFrame = {
    val baskets = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol).as("__b"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    // pairs via a flattened nested transform over the sorted array:
    // index i pairs with every j > i, preserving item_a < item_b.
    // Singleton baskets are filtered FIRST — Spark's sequence(0, -1)
    // is a descending range, not empty.
    val pairs = baskets
      .where(size(col("__items")) >= 2)
      .select(
        explode(flatten(transform(
          sequence(lit(0), size(col("__items")) - 2),
          i => transform(
            sequence(i + 1, size(col("__items")) - 1),
            j => struct(element_at(col("__items"), i + 1).as("item_a"),
                        element_at(col("__items"), j + 1).as("item_b"))))))
          .as("__p"))
    pairs.select(col("__p.item_a").as("item_a"),
                 col("__p.item_b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n"))
  }
}
