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

  /** Referential-integrity audit across table pairs: for each named
    * (child, childKey, parent, parentKey) relationship, the child rows
    * whose non-null key has no parent — orphans — as one report row
    * `(relationship, n_child, n_orphans, orphan key checksum)`.
    *
    * Each relationship is a LEFT ANTI join on its key (AQE broadcasts
    * dimension-sized parents; fact-to-fact pairs shuffle on the key,
    * which is the minimum possible data movement for an exact check).
    * Null child keys are counted separately (`n_null_keys`) — null is
    * SQL's "no reference", not an orphan. At 100 TB run relationships
    * independently (they union, not join — no combinatorial blowup).
    */
  def referentialOrphans(rels: Seq[(String, DataFrame, String,
                                    DataFrame, String)]): DataFrame = {
    rels.map { case (name, child, ck, parent, pk) =>
      val keyed = child.select(col(ck).as("__k"))
      val orphans = keyed.where(col("__k").isNotNull)
        .join(parent.select(col(pk).as("__k")).distinct(),
              Seq("__k"), "left_anti")
      val tot = keyed.agg(
        count(lit(1)).as("n_child"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
      val orp = orphans.agg(
        count(lit(1)).as("n_orphans"),
        coalesce(sum(col("__k")), lit(0L)).as("orphan_key_sum"))
      tot.crossJoin(orp).select(lit(name).as("relationship"),
        col("n_child"), col("n_null_keys"), col("n_orphans"),
        col("orphan_key_sum"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity risk report over a quasi-identifier combination: how
    * many identifier combos are shared by fewer than k rows, and how
    * many rows that exposes. ONE grouped count on the quasi-identifier
    * tuple (map-side combined) + one tiny aggregate over the combo
    * histogram — the grouped shuffle carries one row per distinct
    * combo. Output: a single row (n_rows, n_combos, n_risky_combos,
    * n_risky_rows, min_combo_size).
    */
  def kAnonymity(df: DataFrame, quasiIdCols: Seq[String],
                 k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1; got $k")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(sum("__c").as("n_rows"),
           count(lit(1)).as("n_combos"),
           sum(when(col("__c") < k, 1L).otherwise(0L))
             .as("n_risky_combos"),
           sum(when(col("__c") < k, col("__c")).otherwise(0L))
             .as("n_risky_rows"),
           min("__c").as("min_combo_size"))
  }

  /** Join-key skew report — the shuffle-planning profile to run
    * BEFORE a big join: per-key count histogram reduced to one row of
    * distribution facts. `top_key` is the heaviest key (smallest key
    * on count ties), `p90_count` the exact discrete 90th-percentile
    * per-key count via [[Histograms.groupedDiscreteQuantile]]'s
    * bucketed crossing (no whole-histogram sort). A
    * `max_count >> n_rows/n_keys` reading is the salting/AQE-skew
    * trigger. One grouped count + tiny rollups; all BIGINT.
    */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("__k"))
      .agg(count(lit(1)).as("__c"))
    // NOT persisted (r13): both rollups read the identical grouped-
    // count subtree — runtime exchange reuse dedupes to one scan
    // within the single action (the seasonalAnomalies finding)
    val p90 = Histograms
      .groupedDiscreteQuantile(counts.withColumn("__g", lit(1)),
                               "__g", "__c", 9, 10)
      .select(col("quantile").as("p90_count"))
    counts
      .agg(coalesce(sum("__c"), lit(0L)).as("n_rows"),
           count(lit(1)).as("n_keys"),
           max(struct(col("__c").as("c"), negate(col("__k")).as("nk")))
             .as("__m"))
      .select(col("n_rows"), col("n_keys"),
              col("__m.c").as("max_count"),
              negate(col("__m.nk")).as("top_key"))
      // LEFT join: on an empty input the p90 table is empty and a
      // cross join would erase the totals row with it
      .join(broadcast(p90), lit(true), "left")
  }

  /** Exact join-cardinality profile of `a JOIN b ON keyA = keyB` —
    * what the join WOULD produce, computed from the two per-key count
    * aggregates alone (never the join itself): total output rows
    * `sum(cntA*cntB)` over common keys, the worst single key's pair
    * count, and that key. The aggregates shuffle each input once by
    * key; the count-table join is keys-sized. Fits a long while both
    * per-key counts stay under ~3e9. Output one row: `n_a, n_b,
    * n_common_keys, join_rows, max_pair_count, arg_key`.
    */
  def joinCardinality(a: DataFrame, keyA: String,
                      b: DataFrame, keyB: String): DataFrame = {
    def counted(df: DataFrame, k: String, cnt: String) =
      df.where(col(k).isNotNull)
        .groupBy(col(k).cast("long").as("__k"))
        .agg(count(lit(1)).as(cnt))
    // NOT persisted (r13): totals and the key join read each side's
    // identical grouped-count subtree — exchange reuse dedupes the
    // scans (see skewReport)
    val ca = counted(a, keyA, "__ca")
    val cb = counted(b, keyB, "__cb")
    val totals = ca.agg(sum("__ca").as("n_a"))
      .crossJoin(cb.agg(sum("__cb").as("n_b")))
    ca.join(cb, Seq("__k"))
      .select((col("__ca") * col("__cb")).as("__p"), col("__k"))
      .agg(count(lit(1)).as("n_common_keys"),
           sum("__p").as("join_rows"),
           max(struct(col("__p").as("p"), negate(col("__k")).as("nk")))
             .as("__m"))
      .crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("n_common_keys"),
              col("join_rows"), col("__m.p").as("max_pair_count"),
              negate(col("__m.nk")).as("arg_key"))
  }

  /** Surrogate-key continuity audit — gap detection in an
    * id sequence (lost batches, purged ranges, generator skips): over
    * the DISTINCT keys, report totals plus the gap census `n_gaps`
    * (adjacent-key differences > 1), the largest gap, and the key it
    * follows. Adjacency without a global sort: keys bucket by exact
    * floor division, in-bucket lag windows find within-bucket
    * neighbors, and a tiny per-bucket (min,max) aggregate stitched by
    * a lag over the BUCKET list covers the boundary pairs — empty
    * buckets stitch correctly because the lag skips to the previous
    * populated bucket. Output one row: `n_keys, min_key, max_key,
    * n_missing, n_gaps, max_gap, gap_after_key` (last two null when
    * the sequence is dense).
    */
  def keyGapAudit(df: DataFrame, keyCol: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0; got $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val keys = df.where(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("__b",
        expr(s"CASE WHEN k >= 0 THEN k div ${bucketWidth}L " +
             s"ELSE -((-k + ${bucketWidth - 1}L) div ${bucketWidth}L) " +
             "END"))
    // NOT persisted (r13): the window pass and both rollups read the
    // identical distinct-key subtree — exchange reuse dedupes the
    // scans (see skewReport)
    val wIn = Window.partitionBy("__b").orderBy("k")
    val inBucket = keys
      .withColumn("__p", lag(col("k"), 1).over(wIn))
      .where(col("__p").isNotNull)
      .select(col("k"), col("__p"))
    val wB = graft.core.Windows.bounded(col("__b"))
    val boundary = keys.groupBy("__b")
      .agg(min("k").as("__mn"), max("k").as("__mx"))
      .withColumn("__pmx", lag(col("__mx"), 1).over(wB))
      .where(col("__pmx").isNotNull)
      .select(col("__mn").as("k"), col("__pmx").as("__p"))
    val gaps = inBucket.unionByName(boundary)
      .select((col("k") - col("__p") - 1L).as("g"), col("__p"))
      .where(col("g") > 0L)
    keys.agg(count(lit(1)).as("n_keys"), min("k").as("min_key"),
             max("k").as("max_key"))
      .withColumn("n_missing",
                  col("max_key") - col("min_key") + 1L - col("n_keys"))
      .crossJoin(gaps.agg(
        count(lit(1)).as("n_gaps"),
        max(struct(col("g"), negate(col("__p")).as("np"))).as("__m")))
      .select(col("n_keys"), col("min_key"), col("max_key"),
              col("n_missing"), col("n_gaps"),
              col("__m.g").as("max_gap"),
              negate(col("__m.np")).as("gap_after_key"))
  }

  /** Functional-dependency audit (the data-profiling "does X
    * determine Y" question behind schema discovery and
    * denormalization checks): for each candidate `lhs -> rhs`, count
    * how many lhs groups map to MORE than one distinct rhs value, and
    * how many rows sit inside those violating groups. One
    * groupBy(lhs) per dependency (map-side combined) feeding a
    * single-row rollup — the per-group distinct-rhs count uses the
    * grouped `count(distinct)` form, never a self-join. Null lhs rows
    * are excluded; a null rhs counts as a value of its own (two-world
    * semantics match the SQL replay's `count(distinct rhs) +
    * max(rhs is null)` form).
    *
    * Output per dependency: `fd`, `n_groups`, `n_violating_groups`,
    * `n_violating_rows`, `max_distinct_rhs` — a dependency HOLDS when
    * `n_violating_groups = 0`.
    */
  def fdAudit(df: DataFrame, deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "need at least one candidate dependency")
    deps.map { case (lhs, rhs) =>
      df.where(col(lhs).isNotNull)
        .groupBy(col(lhs))
        .agg((countDistinct(col(rhs)) +
               max(when(col(rhs).isNull, 1L).otherwise(0L))).as("__dy"),
             count(lit(1)).as("__n"))
        .agg(count(lit(1)).as("n_groups"),
             sum(when(col("__dy") > 1, 1L).otherwise(0L))
               .as("n_violating_groups"),
             sum(when(col("__dy") > 1, col("__n")).otherwise(0L))
               .as("n_violating_rows"),
             max(col("__dy")).as("max_distinct_rhs"))
        .select(lit(s"$lhs->$rhs").as("fd"), col("n_groups"),
                col("n_violating_groups"), col("n_violating_rows"),
                col("max_distinct_rhs"))
    }.reduce(_ unionByName _)
  }

  /** Benford first-significant-digit deviations of `log10(1+1/d)`,
    * 1e9-scaled and floored to integer literals — the SAME constants
    * appear verbatim in the SQL oracle, so no engine ever computes a
    * log. Index d-1 holds digit d's scaled expected share. */
  private val BenfordScaled: Array[Long] = Array(
    301029995L, 176091259L, 124938736L, 96910013L, 79181246L,
    66946789L, 57991946L, 51152522L, 45757490L)

  /** Benford's-law first-digit audit of a positive numeric column —
    * the classic fabricated-amounts / unit-drift screen. Rows with
    * `value >= 1` contribute the first digit of their integer part;
    * one 9-row grouped count (map-side combined, no data shuffle to
    * speak of) plus an unbounded window over those 9 rows. All
    * integer: `dev_scaled = n_d * 1e9 - n_total * floor(log10(1+1/d)
    * * 1e9)`, positive where the digit is over-represented. Absent
    * digits are absent rows (identically in the oracle).
    *
    * Row bound (the ks2Sample/joinCardinality convention): the
    * `n_total * 301029995` term wraps a signed long once `n_total`
    * exceeds ~3.06e10 rows (Long.Max / 301029995). Past tens of
    * billions of contributing rows, compute `dev_scaled` in
    * DECIMAL(38,0) instead — the counts themselves are fine to 9.2e18.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = df
      .where(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"),
                        1, 1).cast("int").as("digit"))
    val expected = element_at(
      typedLit(BenfordScaled.toSeq), col("digit")) // 1-indexed by digit
    val wAll = graft.core.Windows.boundedAll
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    digits.groupBy("digit").agg(count(lit(1)).as("n_d"))
      .withColumn("n_total", sum("n_d").over(wAll))
      .withColumn("dev_scaled",
                  col("n_d") * lit(1000000000L) -
                    col("n_total") * expected)
      .orderBy("digit")
  }

  /** Data-freshness audit: per pipeline source, when did it last
    * deliver, how far behind the freshest source is it, and did it
    * deliver on the corpus's last calendar day — the staleness report
    * a multi-source ingest runs before training.
    *
    * ONE full-data aggregate to (source, epoch-day) cells; the corpus
    * maxima, per-source lag and last-day tallies all run on that
    * calendar-bounded table (windows over bounded rows — the
    * benford()/gains discipline). All epoch-second integers.
    */
  def freshness(df: DataFrame, sourceCol: String, tsCol: String,
                staleAfterS: Long): DataFrame = {
    val sec = col(tsCol).cast("timestamp").cast("long")
    val cells = df
      .where(col(sourceCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(sourceCol).as("source"),
               (sec / 86400L).cast("long").as("day"))
      .agg(count(lit(1)).as("n"), max(sec).as("max_s"))
    freshnessFromCells(cells, staleAfterS)
  }

  /** [[freshness]] report stage over an already-maintained
    * `(source, day, n, max_s)` cell table — the streaming twin feeds
    * its complete-mode state snapshot here, so stream == batch by
    * construction (daily cells are additive). */
  def freshnessFromCells(cells: DataFrame,
                         staleAfterS: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(staleAfterS > 0, "staleAfterS must be positive")
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("corpus_max_s", max("max_s").over(wAll))
      .withColumn("corpus_max_day", max("day").over(wAll))
      .groupBy("source")
      .agg(sum("n").as("n_events"),
           max("max_s").as("last_epoch_s"),
           (max("corpus_max_s") - max("max_s")).as("lag_s"),
           sum(when(col("day") === col("corpus_max_day"), col("n"))
                 .otherwise(0L)).as("n_on_last_day"))
      .withColumn("stale",
                  when(col("lag_s") > staleAfterS, 1L).otherwise(0L))
      .orderBy("source")
  }
}
