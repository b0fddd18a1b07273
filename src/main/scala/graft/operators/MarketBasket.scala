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

  /** "Customers also bought": the top-k most-similar items per item by
    * basket Jaccard, as exact truncated-ppm integers
    * `1e6 * c_ij div (c_i + c_j - c_ij)`.
    *
    * Candidates come from [[coOccurrence]] (within-basket pair
    * generation — never an all-pairs item join), item supports from
    * one distinct-(basket, item) aggregate, and the per-item top-k is
    * the O(k)-state `topkLongs` aggregate (map-side combined; a
    * mega-item with millions of co-occurring neighbors never lands on
    * one task's sort — the knnLabelEval discipline, no window rank).
    * Ties order (jaccard desc, neighbor asc) — identical to the SQL
    * `row_number` replay. The pair support `c_pair` is re-attached by
    * joining the k-bounded exploded result back to the pair table, so
    * no packing-width bound on item ids is imposed.
    */
  def itemNeighbors(df: DataFrame, basketCol: String, itemCol: String,
                    k: Int,
                    /** Mega-basket guard: baskets with MORE distinct
                      * items are dropped from BOTH pair generation and
                      * supports (pair fan-out is quadratic in basket
                      * size — one bot account or default basket id
                      * would otherwise dominate a single task). Never
                      * silent: when anything is dropped the operator
                      * logs the dropped-basket/occurrence mass, and
                      * [[basketCapReport]] exposes the same tallies as
                      * a one-row DataFrame for pipelines that must
                      * record it. */
                    maxBasketSize: Option[Int] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxBasketSize.forall(_ >= 2),
            "maxBasketSize must be >= 2 when set")
    // ONE raw-table shuffle builds the per-basket distinct item sets;
    // both the pair generation and the item supports derive from it
    // (a separate distinct+count would re-shuffle the raw table).
    // r13 negative result: swapping these three persists for eager
    // localCheckpoints was MEASURED SLOWER (3.03 -> 3.79 s at 32
    // cores, clean windows) — the cuts serialize three
    // materialization jobs that the single final action otherwise
    // overlaps through the cached lazy plan; unlike the iterative
    // graph loops there is no plan growth here to pay for. Keep
    // persist.
    val basketsAll = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol).as("__b"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .persist()
    val baskets = maxBasketSize match {
      case None => basketsAll
      case Some(cap) =>
        val r = basketsAll.agg(
          count(lit(1)).as("nb"),
          sum(when(size(col("__items")) > cap, 1L).otherwise(0L))
            .as("nd"),
          sum(when(size(col("__items")) > cap,
                   size(col("__items")).cast("long")).otherwise(0L))
            .as("occ"),
          max(size(col("__items"))).as("mx")).head
        if (!r.isNullAt(1) && r.getLong(1) > 0L)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"itemNeighbors maxBasketSize=$cap dropped " +
            s"${r.getLong(1)} of ${r.getLong(0)} baskets " +
            s"(${r.getLong(2)} item occurrences; largest basket " +
            s"${r.getInt(3)})")
        basketsAll.where(size(col("__items")) <= cap)
    }
    val support = baskets
      .select(explode(col("__items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("c_item"))
      .persist() // read by the scoring join and the k-bounded re-attach
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
      .select(col("__p.item_a").as("item_a"),
              col("__p.item_b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n"))
      // the canonical (a < b) pair aggregate is the HALF-size table;
      // persist THIS (not the symmetrized/scored 2x expansion): it is
      // read by the scoring pass and by the k-bounded re-attach join
      // (caller releases via clearCache)
      .persist()
    // symmetrize in ONE pass over the cached pair aggregate, score
    // single-use (no persist of the 2x table). The support joins
    // auto-broadcast under AQE whenever the item dimension fits; at a
    // catalog too large to broadcast they degrade to shuffle joins on
    // the pair aggregate — still never the raw basket table.
    val scored = pairs
      .select(explode(array(
        struct(col("item_a").as("item"), col("item_b").as("neighbor")),
        struct(col("item_b").as("item"), col("item_a").as("neighbor"))))
        .as("__e"), col("n").as("c_pair"))
      .select(col("__e.item").as("item"),
              col("__e.neighbor").as("neighbor"), col("c_pair"))
      .join(support, Seq("item"))
      .join(support.select(col("item").as("neighbor"),
                           col("c_item").as("c_neighbor")),
            Seq("neighbor"))
      .withColumn("jaccard_ppm",
        expr("(1000000 * c_pair) div (c_item + c_neighbor - c_pair)"))
    val topk = scored
      .groupBy("item")
      .agg(graft.functions.TopKAgg
             .topkLongs(col("jaccard_ppm"), col("neighbor"), k)
             .as("__top"))
      .select(col("item"),
              posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col("item"), (col("__pos") + 1).cast("long").as("rank"),
              col("__t.id").as("neighbor"),
              col("__t.key").as("jaccard_ppm"))
    // k-bounded output side re-attaches the pair count from the
    // canonical half-size table and the supports from the dimension
    topk
      .withColumn("__a", least(col("item"), col("neighbor")))
      .withColumn("__b", greatest(col("item"), col("neighbor")))
      .join(pairs.select(col("item_a").as("__a"),
                         col("item_b").as("__b"),
                         col("n").as("c_pair")),
            Seq("__a", "__b"))
      .join(support, Seq("item"))
      .join(support.select(col("item").as("neighbor"),
                           col("c_item").as("c_neighbor")),
            Seq("neighbor"))
      .select("item", "rank", "neighbor", "jaccard_ppm", "c_pair",
              "c_item", "c_neighbor")
  }

  /** Dropped-mass report for [[itemNeighbors]]' mega-basket guard —
    * the no-silent-caps companion: one row
    * `(n_baskets, n_baskets_dropped, occurrences_dropped,
    * max_basket_size)` for the given cap, so a pipeline can RECORD
    * what the guard excluded instead of trusting a log line. */
  def basketCapReport(df: DataFrame, basketCol: String, itemCol: String,
                      maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    df.where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol).as("__b"))
      .agg(count_distinct(col(itemCol)).as("__sz"))
      .agg(count(lit(1)).as("n_baskets"),
           sum(when(col("__sz") > maxBasketSize, 1L).otherwise(0L))
             .as("n_baskets_dropped"),
           sum(when(col("__sz") > maxBasketSize, col("__sz"))
                 .otherwise(0L)).as("occurrences_dropped"),
           max(col("__sz")).as("max_basket_size"))
  }
}
