package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** KMV (k-minimum-values) distinct-cardinality sketch with an exact
  * side-by-side truth column.
  *
  * The estimator: hash every key into a 52-bit integer (uniform on
  * [0, 2^52)), keep the k SMALLEST distinct hash values per group, and
  * estimate the distinct count as `(k-1) * 2^52 / h_k` where `h_k` is
  * the k-th smallest kept hash (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002). State is O(k) per group
  * and merges by unioning the two k-min sets and re-taking the k
  * smallest — exactly [[graft.functions.TopKAgg]] on the negated hash,
  * whose buffer now rejects exact duplicates, so raw rows (with key
  * multiplicity) fold straight into the sketch with NO distinct
  * pre-pass. That is the 100 TB story: one map-side-combined aggregate
  * whose shuffle carries ≤ k (hash, key) pairs per group per map task,
  * versus the exact path's full distinct-key shuffle.
  *
  * Everything the sketch emits is integer-exact and replayable in ANSI
  * SQL: the hash is a 13-hex-digit md5 prefix (the engine-portable
  * hash discipline of [[graft.pipeline.Curation]]), the estimate is a
  * single BIGINT floor division, and ties order by (hash, key). The
  * oracle re-derives the same k-min set with a window rank.
  *
  * Reference anchor: the reference's closest surface is the
  * category-frequency scan behind `cat_cutoff`
  * (reference optbinning/binning/preprocessing.py:263-282), which
  * counts distincts exactly; this operator is the sketch-grade sibling
  * a 100 TB corpus needs.
  */
object Cardinality {

  /** 2^52 — the hash domain size; (k-1)*2^52 must fit a long, which
    * holds for k ≤ 2047. */
  private val Domain = 1L << 52

  /** 52-bit engine-portable hash of `key`: the first 13 hex digits of
    * md5 of the key's decimal string rendering (DuckDB:
    * `('0x' || substr(md5(key::VARCHAR), 1, 13))::BIGINT`). */
  def hash52(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  /** The k-th smallest kept hash of a k-min array (null while the
    * sketch holds fewer than k keys — it is then exact). */
  private def kthOf(top: Column, k: Int): Column =
    when(size(top) >= k, negate(element_at(top, k).getField("key")))

  /** KMV set-overlap profile of two cohorts — the audience-overlap
    * question (`|A∩B|`) answered from sketch ALGEBRA: the union
    * sketch is the MERGE of the two k-min sets (k smallest of A∪B =
    * k smallest of kminA ∪ kminB; duplicates collapse via the
    * buffer's set semantics), and the intersection estimate is
    * inclusion–exclusion `est_a + est_b - est_union` — no pairwise
    * key comparison anywhere. Exact truths ride alongside from plain
    * distinct passes. Output one row: `n_a, n_b, n_union, n_inter,
    * est_a, est_b, est_union, est_inter` — all BIGINT (estimates can
    * undershoot; `est_inter` may go negative on tiny overlaps, which
    * is the estimator being honest, not a bug).
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, keyCol: String,
                 k: Int): DataFrame = {
    require(k > 1 && k <= 2047, s"k must be in [2, 2047]; got $k")
    def sketch(df: DataFrame): DataFrame =
      df.where(col(keyCol).isNotNull)
        .select(col(keyCol).cast("long").as("__key"),
                hash52(col(keyCol)).as("__h"))
        .agg(TopKAgg.topkLongs(negate(col("__h")), col("__key"), k)
               .as("top"),
             countDistinct(col("__key")).as("nx"))
    // NOT persisted (r13): the merge branch and the final assembly
    // read each sketch through the identical scan+agg+Exchange subtree
    // — runtime exchange reuse dedupes to one scan-and-fold per side
    // within the single action (the seasonalAnomalies finding)
    val sa = sketch(a).select(col("top").as("ta"), col("nx").as("n_a"))
    val sb = sketch(b).select(col("top").as("tb"), col("nx").as("n_b"))
    // union sketch by MERGING the two k-min sets — no third data scan
    // for the estimate; only the exact truth reads the union
    val merged = sa.crossJoin(sb)
      .select(explode(concat(col("ta"), col("tb"))).as("__e"))
      .agg(TopKAgg.topkLongs(col("__e.key"), col("__e.id"), k).as("tu"))
    val nu = a.select(col(keyCol)).unionByName(b.select(col(keyCol)))
      .where(col(keyCol).isNotNull)
      .agg(countDistinct(col(keyCol)).as("n_union"))
    val est = (kth: String, nx: String) =>
      expr(s"CASE WHEN $kth IS NULL OR $kth = 0 THEN $nx " +
           s"ELSE ${(k - 1) * Domain}L DIV $kth END")
    sa.crossJoin(sb).crossJoin(merged).crossJoin(nu)
      .withColumn("__ka", kthOf(col("ta"), k))
      .withColumn("__kb", kthOf(col("tb"), k))
      .withColumn("__ku", kthOf(col("tu"), k))
      .withColumn("est_a", est("__ka", "n_a"))
      .withColumn("est_b", est("__kb", "n_b"))
      .withColumn("est_union", est("__ku", "n_union"))
      .select(col("n_a"), col("n_b"), col("n_union"),
              (col("n_a") + col("n_b") - col("n_union")).as("n_inter"),
              col("est_a"), col("est_b"), col("est_union"),
              (col("est_a") + col("est_b") - col("est_union"))
                .as("est_inter"))
  }

  /** Per-group KMV distinct estimate of `keyCol` next to the exact
    * distinct count. Output: `grp`, `n_exact`, `kth_hash` (null when
    * the group holds < k distinct keys — the sketch is then exact and
    * `est = n_exact`), `est`. Appends an `ALL` rollup row whose
    * estimate comes from MERGING the per-group sketches (the k
    * smallest hashes of a union are each among their own group's k
    * smallest, so the merged k-min set equals the global k-min set —
    * duplicates across groups collapse via the buffer's set
    * semantics); its truth column is the global exact distinct.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    require(k > 1 && k <= 2047, s"k must be in [2, 2047]; got $k")
    val rows = df.where(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
              col(keyCol).cast("long").as("__key"),
              hash52(col(keyCol)).as("__h"))
    // one aggregate: raw rows fold into the O(k) sketch map-side
    // (duplicate (hash, key) pairs are rejected by the buffer), while
    // the exact count rides a distinct pre-pass only because the
    // truth column demands one — drop n_exact and the whole distinct
    // shuffle disappears
    // NOT persisted (r13): the ALL-rollup merge branch and the main
    // output read the identical groupBy(grp) sketch subtree — runtime
    // exchange reuse dedupes to one scan-and-fold within the single
    // action (the seasonalAnomalies finding)
    val perGroup = rows.groupBy("grp")
      .agg(TopKAgg.topkLongs(negate(col("__h")), col("__key"), k)
             .as("__top"),
           countDistinct(col("__key")).as("n_exact"))
    // ALL row: merge the per-group sketches (explode + re-aggregate);
    // exact truth needs its own global distinct
    val merged = perGroup
      .select(explode(col("__top")).as("__e"))
      .agg(TopKAgg.topkLongs(col("__e.key"), col("__e.id"), k)
             .as("__top"))
      .crossJoin(rows.agg(countDistinct(col("__key")).as("n_exact")))
      .select(lit("ALL").as("grp"), col("__top"), col("n_exact"))
    perGroup.select(col("grp"), col("__top"), col("n_exact"))
      .unionByName(merged)
      .select(col("grp"), col("n_exact"),
              when(col("n_exact") >= k,
                   negate(element_at(col("__top"), k).getField("key")))
                .as("kth_hash"))
      .withColumn("est",
        when(col("kth_hash").isNull || col("kth_hash") === 0L,
             col("n_exact"))
          .otherwise(expr(s"${(k - 1) * Domain}L DIV kth_hash")))
  }
}
