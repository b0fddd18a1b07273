package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * reproducible train/val/test assignment and quality-percentile
  * filtering, composing with the dedup/text-analysis stages into an
  * end-to-end curation pass.
  *
  * Everything here is a pure projection or a single bounded aggregate —
  * no RNG state, no driver-side row loops — so a re-run over 100 TB
  * assigns every document to the same split byte-for-byte.
  */
object Curation {

  /** Deterministic split assignment from the md5 of the id rendered as a
    * string: hex nibble '0'-'b' -> train (12/16), 'c'-'d' -> val (2/16),
    * 'e'-'f' -> test (2/16). Content-addressed (no RNG, no row order
    * dependence): adding or removing rows never reassigns any other row,
    * which is what makes incremental corpus refreshes reproducible.
    */
  def hashSplit(id: Column): Column = {
    val h = substring(md5(id.cast("string").cast("binary")), 1, 1)
    when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
  }

  /** Train/val/test LEAKAGE audit: exact-content fingerprint
    * collisions across [[hashSplit]] folds — the "is my eval split
    * contaminated by training duplicates" check a pretraining pipeline
    * runs after every split. The content key is
    * [[TextAnalysis.rollingFingerprint]] (whitespace-normalized exact
    * duplicates collide; route MinHash bands upstream for NEAR-dup
    * leakage). Output one row per leaking fold pair
    * (`split_a` < `split_b`): `n_shared_fps` distinct shared
    * fingerprints and `n_docs_a`/`n_docs_b` documents carrying them on
    * each side — all integers. Every fold pair is always present (a
    * clean split reports explicit zeros, so "no leakage" is a positive
    * assertion, not an absent row).
    *
    * Scale shape: one projection (fingerprint + split), one
    * (fp, split) count aggregate (8-byte fingerprint keys in the
    * shuffle, map-side combined), then a self-join bounded to
    * C(3 splits, 2) rows per fingerprint — the q_cross_source_dupes
    * discipline; never doc x doc.
    */
  def splitLeakage(df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val fps = df.where(col(textCol).isNotNull)
      .select(hashSplit(col(idCol)).as("split"),
              TextAnalysis.rollingFingerprint(col(textCol)).as("__fp"))
      .groupBy("__fp", "split")
      .agg(count(lit(1)).as("__n"))
    val a = fps.select(col("__fp"), col("split").as("split_a"),
                       col("__n").as("__na"))
    val b = fps.select(col("__fp"), col("split").as("split_b"),
                       col("__n").as("__nb"))
    val leaks = a.join(b, Seq("__fp"))
      .where(col("split_a") < col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("__fps"),
           sum("__na").as("__da"),
           sum("__nb").as("__db"))
    val spark = df.sparkSession
    import spark.implicits._
    val spine = Seq(("test", "train"), ("test", "val"),
                    ("train", "val")).toDF("split_a", "split_b")
    spine.join(broadcast(leaks), Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"),
              coalesce(col("__fps"), lit(0L)).as("n_shared_fps"),
              coalesce(col("__da"), lit(0L)).as("n_docs_a"),
              coalesce(col("__db"), lit(0L)).as("n_docs_b"))
  }

  /** Leakage-safe grouped split: [[hashSplit]] keyed on the GROUP
    * (user, session, document family) instead of the row, so every row
    * of a group lands in the same train/val/test partition — the split
    * discipline that keeps a user's history out of both train and
    * eval at once (row-hashed splits leak group signal across the
    * boundary and inflate eval metrics). A pure projection: no
    * shuffle, no state, and structurally zero leakage — the split is
    * a function of the group key alone. */
  def groupSplit(df: DataFrame, groupCol: String): DataFrame =
    df.withColumn("split", hashSplit(col(groupCol)))

  /** Exact percentile threshold of `metric` over `df` — ONE aggregate
    * job. Exact `percentile` buffers per-distinct-value counts: right
    * for metrics with bounded distinct values (token/subword counts,
    * small-int scores). For unbounded continuous metrics at cluster
    * scale set `approx = true` (mergeable GK sketch, bounded memory).
    */
  def percentileThreshold(df: DataFrame, metric: Column, frac: Double,
                          approx: Boolean = false): Double =
    percentileThresholdOpt(df, metric, frac, approx).getOrElse(
      throw new IllegalArgumentException(
        "percentile threshold is undefined: input is empty or the " +
        "metric is entirely null"))

  /** [[percentileThreshold]] that reports the undefined case (empty
    * input / all-null metric) as None instead of an NPE from the null
    * aggregate cell. */
  private def percentileThresholdOpt(df: DataFrame, metric: Column,
                                     frac: Double,
                                     approx: Boolean): Option[Double] = {
    val expr = if (approx) percentile_approx(metric, lit(frac), lit(10000))
               else percentile(metric, lit(frac))
    val r = df.agg(expr.cast("double")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** Keep rows whose quality metric reaches the `frac` percentile
    * (computed on the same data, one extra aggregate pass). The
    * "top-(1-frac) by quality" curation filter. When the percentile is
    * undefined (empty input or all-null metric) no row can reach it:
    * rows with a non-null metric would all qualify vacuously, but there
    * are none — the result keeps only non-null-metric rows, i.e. none.
    */
  def qualityFilter(df: DataFrame, metric: Column, frac: Double,
                    approx: Boolean = false): DataFrame =
    percentileThresholdOpt(df, metric, frac, approx) match {
      case Some(t) => df.where(metric >= lit(t))
      case None    => df.where(metric.isNotNull)
    }

  /** Per-stratum [[qualityFilter]]: each stratum (language, source,
    * domain) is gated at its OWN `frac` percentile, so a stratum with a
    * systematically different metric distribution (short-sentence
    * languages, code vs prose) is not wiped out by a global cut.
    *
    * One groupBy aggregate computes every threshold (strata are a
    * driver-sized set, the exact `percentile` buffer is bounded by
    * per-stratum distinct metric values — set `approx = true` for
    * unbounded continuous metrics at cluster scale), broadcast back
    * into the filter scan: no shuffle of the data itself.
    */
  def qualityFilterBy(df: DataFrame, strata: Column, metric: Column,
                      frac: Double,
                      approx: Boolean = false): DataFrame = {
    val expr = if (approx) percentile_approx(metric, lit(frac), lit(10000))
               else percentile(metric, lit(frac))
    val thr = df.groupBy(strata.as("__stratum"))
      .agg(expr.cast("double").as("__thr"))
    // null-safe equality: the null stratum is a stratum like any other
    // (as in stratifiedSample/sourceCap), gated at its own percentile
    df.join(broadcast(thr), strata <=> col("__stratum"))
      .where(metric >= col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Exact deterministic stratified sample: within every stratum keep the
    * `ceil(frac * n_stratum)` rows that rank first by `(md5(id), id)` —
    * exact per-stratum proportions (unlike Bernoulli `sampleBy`), no RNG,
    * and content-addressed order so re-runs pick the same rows.
    *
    * Scale shape: see [[topKByContent]] — a per-stratum counts
    * aggregate, an md5-prefix pre-filter that shrinks every
    * mega-stratum to a ~1.5*k candidate sliver, then the window rank
    * over the sliver only. A 1B-row stratum never reaches one task's
    * sort.
    */
  def stratifiedSample(df: DataFrame, strata: Column, id: Column,
                       frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1]; got $frac")
    // round before ceil: bare ceil(n * frac) overshoots on binary float
    // artifacts (30 * 0.1 = 3.0000000000000004 -> 4)
    topKByContent(df, strata, id,
                  ceil(round(col("__n") * lit(frac), 9)))
  }

  /** The shared content-addressed in-stratum ordering: rank by
    * `(md5(id), id)` — the one hash discipline behind
    * [[stratifiedSample]] and [[sourceCap]] (and mirrored by every
    * external-SQL oracle), kept in one place so it cannot drift. */
  private def contentRank(strata: Column, id: Column)
      : org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.partitionBy(strata)
      .orderBy(md5(id.cast("string").cast("binary")), id)

  /** 24-bit md5-prefix value of the id under the SAME rendering as
    * [[contentRank]]'s ordering hash — a prefix of the order key, so
    * ranking by the full key implies (non-strictly) ranking by it. */
  private def contentPrefix(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long")

  /** Exact per-stratum top-k by `(md5(id), id)` without ever sorting a
    * mega-stratum on one task — the engine of [[stratifiedSample]] and
    * [[sourceCap]]. `keepExpr` may reference the stratum size as
    * `__n` (a BIGINT column).
    *
    * Plan: (1) ONE narrow counts aggregate (strata column only) joined
    * back onto the scan — auto-broadcast for the usual driver-sized
    * strata (languages, sources, clusters), falling back to a shuffle
    * join at extreme stratum cardinality (per-site caps) rather than
    * forcing a driver collect; note the input subtree is evaluated
    * twice (counts + main), so persist expensive derived inputs
    * upstream; (2) a pre-filter keeping only rows
    * whose 24-bit md5 prefix falls below `~(1.5*k + 64)/n` of the hash
    * space, so each stratum's candidate sliver is ~1.5*k + 64 rows in
    * expectation regardless of n; (3) the window rank runs over the
    * sliver only. NOTE a window partition is ONE task's sort — AQE skew
    * handling applies to shuffle joins, not windows — which is exactly
    * why the sliver must be cut BEFORE the window.
    *
    * Exactness (not approximation): the true top-k rows all have md5
    * strictly below any row outside the prefix cut whenever the sliver
    * holds >= k rows (the prefix orders consistently with the full
    * key), so the sliver contains the exact answer. The margin makes
    * undershoot a < e^-40 Chernoff tail even at k = 1, and a window
    * count guard turns that tail into a loud `raise_error` instead of
    * a silently short sample; strata smaller than the margin skip the
    * pre-filter entirely (threshold saturates the hash space).
    */
  private def topKByContent(df: DataFrame, strata: Column, id: Column,
                            keepExpr: Column): DataFrame = {
    val counts = df.groupBy(strata.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    // null-safe join: the null stratum is a stratum like any other.
    // No broadcast() hint: strata are usually a driver-sized set and
    // auto-broadcast under the threshold, but a per-URL/per-site cap
    // with tens of millions of strata must be allowed to fall back to
    // a shuffle join instead of OOMing the driver on a forced hint
    val withN = df.join(counts, strata <=> col("__stratum"))
    val prefixMax = (1L << 24).toDouble
    val threshold = least(
      lit(1L << 24),
      ceil(lit(prefixMax) * (keepExpr * lit(1.5) + lit(64.0))
             / col("__n")).cast("long"))
    // a null id hashes to a null prefix, which ranks FIRST under the
    // window's nulls-first md5 ordering — so null-id rows are always
    // top-k candidates and must always enter the sliver (a bare
    // `null < threshold` would silently drop them AND could fire the
    // undershoot guard spuriously)
    val pfx = contentPrefix(id)
    val sliver = withN.where(pfx.isNull || pfx < threshold)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(strata)
    sliver
      .withColumn("__rn", row_number().over(contentRank(strata, id)))
      .withColumn("__c", count(lit(1)).over(w))
      .where(when(col("__c") < keepExpr && col("__c") < col("__n"),
                  raise_error(concat(
                    lit("graft: md5-prefix pre-filter undershot top-k "
                        + "in stratum "), strata.cast("string"))))
               .otherwise(col("__rn") <= keepExpr))
      .drop("__stratum", "__n", "__rn", "__c")
  }

  /** Per-source frequency cap: keep at most `cap` documents from each
    * source (crawl dump, domain, site) — the standard guard against a
    * single over-represented domain dominating a training mix. Within a
    * source the kept rows are the first `cap` by `(md5(id), id)`:
    * content-addressed, so re-runs and corpus refreshes keep the same
    * documents, and adding rows to OTHER sources never changes this
    * source's picks.
    *
    * Scale shape: see [[topKByContent]] — a mega-domain is pre-filtered
    * to a ~1.5*cap candidate sliver before the window rank, so no task
    * ever sorts a full domain. Sources under the cap pass through
    * untouched.
    */
  def sourceCap(df: DataFrame, source: Column, id: Column,
                cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive; got $cap")
    topKByContent(df, source, id, lit(cap.toLong))
  }

  /** Deterministic domain-mixture resampling: downsample sources so the
    * output matches target mixture `weights` (relative proportions, e.g.
    * web -> 0.6, code -> 0.3, books -> 0.1) at the largest feasible
    * size without upsampling.
    *
    * Waterfilling: with observed counts n_s and normalized target
    * proportions p_s, the largest corpus honoring the mixture is
    * `T = min_s n_s / p_s`; each source keeps `p_s * T / n_s` of its
    * rows. The keep decision is content-addressed (md5-uniform draw per
    * id, the same discipline as [[hashSplit]]): re-runs and incremental
    * refreshes keep exactly the same rows. Sources not listed in
    * `weights` are dropped.
    *
    * Scale shape: ONE bounded aggregate (per-source counts — sources
    * are domains, a driver-sized set) + ONE filter scan. No shuffle of
    * the kept data, no RNG state.
    */
  def domainMixture(df: DataFrame, sourceCol: String, idCol: String,
                    weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must name at least one source")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val wSum = weights.values.sum
    val target = weights.map { case (s, v) => s -> v / wSum }
    val counts = df.where(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = target.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty,
      "no source named in weights is present in the data")
    val t = present.map { case (s, ps) => counts(s) / ps }.min
    // integer threshold over the 24-bit md5-uniform draw; floor keeps
    // the draw strictly reproducible in external SQL
    val keepMax = (1L << 24).toDouble
    val thresholds = present.map { case (s, ps) =>
      s -> math.floor(math.min(1.0, ps * t / counts(s)) * keepMax).toLong
    }
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
      .cast("long")
    val thresholdExpr = thresholds.foldLeft(lit(-1L): Column) {
      case (acc, (s, thr)) =>
        when(col(sourceCol) === s, lit(thr)).otherwise(acc)
    }
    df.where(u < thresholdExpr)
  }

  /** Per-source TOKEN-budget sampling: keep documents from each source,
    * in the content-addressed `(md5(id), id)` order, while the source's
    * inclusive running token total stays within `budget` — the "fill
    * each source's token quota" primitive of a training-mix recipe
    * (mixtures are specified in tokens, not documents, so a doc-count
    * cap over- or under-shoots sources with atypical doc lengths).
    *
    * Rows whose `nTokens` is null or < 1 are dropped up front: a
    * document contributing no tokens has no claim on a token budget,
    * and excluding them is what bounds the kept set (<= budget rows).
    * The pick order is content-addressed like [[sourceCap]]: re-runs
    * and refreshes of OTHER sources never change this source's picks.
    *
    * Scale shape (the [[topKByContent]] discipline on token MASS
    * instead of row count): ONE per-source aggregate computes
    * (row count, token total); sources whose total fits the budget
    * pass through whole (threshold saturates the hash space); a
    * mega-source is pre-filtered to an md5-prefix sliver carrying
    * ~1.5x budget + 64-doc-margin tokens in expectation, and only the
    * sliver reaches the window cumsum — no task ever sorts a full
    * source. Exact, not approximate: the prefix cut orders
    * consistently with the full rank key, so whenever the sliver's
    * token mass exceeds the budget the boundary row is inside the
    * sliver; the undershoot tail (sliver mass <= budget while rows
    * remain outside) is Chernoff-negligible and guarded by a loud
    * `raise_error` instead of a silently short sample. NOTE `nTokens`
    * is evaluated in both the counts pass and the main pass — persist
    * expensive token-count inputs upstream.
    */
  def tokenBudgetSample(df: DataFrame, source: Column, id: Column,
                        nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive; got $budget")
    val tok = nTokens.cast("long")
    val rows = df.where(tok.isNotNull && tok >= 1)
    val counts = rows.groupBy(source.as("__stratum"))
      .agg(count(lit(1)).as("__n"), sum(tok).as("__tot"))
    // null-safe join, no forced broadcast — same reasoning as
    // topKByContent (sources are usually driver-sized; per-site budgets
    // at huge cardinality must be able to fall back to a shuffle join)
    val withN = rows.join(counts, source <=> col("__stratum"))
    val prefixMax = (1L << 24).toDouble
    val threshold = least(
      lit(1L << 24),
      ceil(lit(prefixMax)
             * (lit(1.5 * budget) + lit(64.0) * col("__tot") / col("__n"))
             / col("__tot")).cast("long"))
    // null ids rank FIRST under the nulls-first md5 window order, so
    // they must always enter the sliver (see topKByContent)
    val pfx = contentPrefix(id)
    val sliver = withN.where(pfx.isNull || pfx < threshold)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(source)
    val wCum = contentRank(source, id)
      .rowsBetween(org.apache.spark.sql.expressions.Window
                     .unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    sliver
      .withColumn("__cum", sum(tok).over(wCum))
      .withColumn("__smass", sum(tok).over(wAll))
      .withColumn("__srows", count(lit(1)).over(wAll))
      // strict <: a sliver carrying EXACTLY budget tokens is complete
      // (every excluded row has tok >= 1, so its inclusive total would
      // exceed the budget) — the topKByContent guard discipline
      .where(when(col("__smass") < lit(budget) &&
                  col("__srows") < col("__n"),
                  raise_error(concat(
                    lit("graft: md5-prefix pre-filter undershot the "
                        + "token budget in source "),
                    source.cast("string"))))
               .otherwise(col("__cum") <= lit(budget)))
      .drop("__stratum", "__n", "__tot", "__cum", "__smass", "__srows")
  }

  /** End-to-end curation pass: quality-percentile filter -> exact dedup
    * (min-id canonical per normalized fingerprint) -> PII scrub ->
    * deterministic split label. Returns the input columns with `textCol`
    * scrubbed plus a `split` column. Two aggregate jobs (threshold +
    * dedup key), everything else pipelines in the scan.
    */
  def curate(df: DataFrame, textCol: String, idCol: String,
             qualityFrac: Double = 0.25,
             approx: Boolean = false): DataFrame = {
    val filtered = qualityFilter(
      df, TextAnalysis.qualityScore(col(textCol)), qualityFrac, approx)
    val deduped = Dedup.exactDedup(filtered, textCol, idCol)
    deduped
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      .withColumn("split", hashSplit(col(idCol)))
  }

  /** Pretraining-corpus curation chain: exact dedup (min-id canonical)
    * -> absolute quality gate -> benchmark decontamination (drop any
    * doc sharing a word `gramN`-gram with the eval set). The stages are
    * the library's own operators composed as lazy DataFrames — Catalyst
    * fuses the dedup semi-join, the quality predicate, and the
    * decontamination anti-join into one pipeline over the corpus scan;
    * the benchmark side is a broadcast gram set.
    *
    * `portable = true` switches every stage to its external-SQL
    * replayable form (md5 keys, string grams) — used by the oracled
    * driver query; production uses the 8-byte hashed forms.
    */
  def curateForTraining(corpus: DataFrame, benchmark: DataFrame,
                        textCol: String, idCol: String,
                        qualityMin: Double = 0.5, gramN: Int = 5,
                        portable: Boolean = false): DataFrame = {
    val deduped = Dedup.exactDedup(corpus, textCol, idCol, portable)
    val quality = deduped.where(
      TextAnalysis.qualityScore(col(textCol)) >= qualityMin)
    val contaminated = Dedup
      .contamination(quality, benchmark, textCol, idCol, gramN, portable)
      .select(col("id").as(idCol))
    quality.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Corpus data-card report: the per-source summary a dataset card /
    * mixture-design pass needs, in ONE grouped aggregate — document
    * and null-text counts, exact token and character totals, distinct
    * content fingerprints (1 - unique/docs = the exact-dup rate), and
    * language spread. All counters are integers (map-side partial
    * aggregation, hash-oracle-able); rates are left to the reader so
    * the surface stays rounding-free.
    *
    * `portable = true` fingerprints with the arithmetic-only rolling
    * hash (external-SQL replayable); production uses xxhash64.
    * Scale shape: one shuffle on the source key carrying counter
    * tuples; `countDistinct` rewrites to a two-phase expand-aggregate
    * whose first phase dedups (source, fp) map-side — no row-level
    * data crosses the wire.
    */
  def corpusReport(df: DataFrame, textCol: String, idCol: String,
                   sourceCol: String, langCol: String,
                   portable: Boolean = false): DataFrame = {
    val text = col(textCol)
    val fp = if (portable) TextAnalysis.rollingFingerprint(text)
             else TextAnalysis.fingerprint(text)
    df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(text.isNull, 1L).otherwise(0L)).as("n_null_text"),
           sum(TextAnalysis.tokenCount(text).cast("long"))
             .as("total_tokens"),
           sum(coalesce(length(text).cast("long"), lit(0L)))
             .as("total_chars"),
           countDistinct(when(text.isNotNull, fp)).as("n_unique_fp"),
           countDistinct(col(langCol)).as("n_langs"))
  }
}
