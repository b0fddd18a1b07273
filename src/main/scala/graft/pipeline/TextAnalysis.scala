package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting. All are
  * pure Catalyst column expressions (codegen, no UDFs), so they pipeline
  * inside the scan stage at 100 TB scale.
  */
object TextAnalysis {

  /** Whitespace token count; empty/null-safe. */
  def tokenCount(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-piece regex matches (letters runs, digit
    * runs, single punctuation) — a deterministic proxy for tokenizer load.
    */
  def subwordCount(text: Column): Column =
    when(text.isNull, lit(0))
      .otherwise(size(regexp_extract_all(text,
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for",
                "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del",
                "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit",
                "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "du", "des",
                "est"))

  /** Per-language stopword-hit count over the whitespace tokens. */
  def stopwordHits(text: Column, lang: String): Column = {
    val words = stopwords(lang)
    val tokens = split(lower(text), "\\s+")
    size(array_intersect(tokens, array(words.map(lit(_)): _*)))
  }

  private[graft] val langOrder = Seq("en", "es", "de", "fr")

  /** N-gram/stopword heuristic language ID over {en, es, de, fr, zh}:
    * CJK characters vote zh; otherwise the language with the most stopword
    * hits wins, "und" (undetermined) when no hits. Deterministic tie-break
    * by language order en > es > de > fr. Single-pass native kernel
    * ([[graft.functions.TextHashExprs.langId]]); [[langIdHof]] is the
    * composable-HOF parity oracle.
    */
  def langId(text: Column): Column =
    when(text.isNull, lit("und"))
      .otherwise(graft.functions.TextHashExprs.langId(
        text, langOrder.map(l => l -> stopwords(l))))

  /** HOF formulation of [[langId]] — semantic reference and test oracle
    * for the native kernel. Re-tokenizes per language and duplicates the
    * hit expressions inside the argmax chain, so it is ~12 interpreted
    * split+intersect evaluations per row. */
  def langIdHof(text: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"),
                                      lit(0)))
    val hits = langOrder.map(l => l -> stopwordHits(text, l))
    val maxHits = greatest(hits.map(_._2): _*)
    // first language (in en,es,de,fr order) reaching maxHits wins
    val ordered = hits.reverse.foldLeft(lit("und"): Column) {
      case (acc, (l, h)) => when(h === maxHits && maxHits > 0, lit(l))
        .otherwise(acc)
    }
    when(text.isNull, lit("und"))
      .when(cjk > 0, lit("zh"))
      .otherwise(ordered)
  }

  /** Document quality features: length, token stats, punctuation/digit
    * ratios, stopword ratio — the standard pre-training quality signals.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val nPunct = size(regexp_extract_all(text,
      lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val nDigit = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
      .cast("double")
    val nStop = stopwordHits(text, "en").cast("double")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "mean_token_len" -> when(nTokens > 0,
        (nChars - (nTokens - 1)) / nTokens).otherwise(lit(0.0)),
      "punct_ratio" -> when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)),
      "digit_ratio" -> when(nChars > 0, nDigit / nChars).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nTokens > 0, nStop / nTokens)
        .otherwise(lit(0.0)))
  }

  /** Scalar quality score in [0,1]: logistic blend of the quality features
    * (heuristic weights; deterministic).
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val raw = lit(0.0) +
      when(f("n_tokens") >= 10 && f("n_tokens") <= 100000, lit(0.3))
        .otherwise(lit(0.0)) +
      when(f("mean_token_len") >= 2 && f("mean_token_len") <= 12, lit(0.3))
        .otherwise(lit(0.0)) +
      when(f("punct_ratio") <= 0.2, lit(0.2)).otherwise(lit(0.0)) +
      when(f("stopword_ratio") >= 0.05, lit(0.2)).otherwise(lit(0.0))
    raw
  }

  /** PII patterns (emails, URLs, NANP-style phone numbers). Restricted
    * to the RE2-compatible regex subset so an external SQL engine
    * reproduces match counts exactly; extraction order in [[redactPii]]
    * runs URL first so an address inside a URL is swallowed whole.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "url" -> "https?://[^\\s]+",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b")

  /** Per-kind PII match counts (url/email/phone) — one codegen'd regex
    * pass per pattern, no UDFs. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (k, p) =>
      k -> when(text.isNull, lit(0))
        .otherwise(size(regexp_extract_all(text, lit(p), lit(0))))
    }

  /** Text with every PII match replaced by `replacement` — the scrubbing
    * step of a training-data pipeline. Pure projection: pipelines inside
    * the scan stage, safe to run over 100 TB as a select. */
  def redactPii(text: Column, replacement: String = "<PII>"): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, p)) =>
      regexp_replace(acc, p, replacement)
    }

  /** Canonicalize text for dedup/fingerprinting — the standard cleanup
    * front of a web-scale curation pipeline: lowercase, strip HTML-ish
    * tags, URLs and email addresses, collapse whitespace runs to one
    * space, trim. A chain of codegen'd regexp_replace nodes (no UDF):
    * pure projection, pipelines inside the scan stage at any scale.
    * ASCII-regex only, so an external SQL engine replays it verbatim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(text), "<[^>]+>", " "),
          "https?://\\S+", " "),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", " "),
      "\\s+", " "))

  /** Word n-grams of `words` joined with single spaces; empty array when
    * the document has fewer than `n` words (guards Spark's descending
    * `sequence` when size - n < 0). */
  def wordNgrams(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(words, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Longest run of equal adjacent elements in an already-sorted array =
    * the count of its most frequent element. Higher-order `aggregate`
    * (single pass, per-row, no shuffle). */
  private def maxEqualRun(sortedArr: Column): Column = {
    def step(st: Column, x: Column): Column =
      when(x === st.getField("prev"), st.getField("run") + 1).otherwise(lit(1L))
    aggregate(sortedArr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => struct(
        x.as("prev"),
        step(st, x).as("run"),
        greatest(st.getField("best"), step(st, x)).as("best")),
      st => st.getField("best"))
  }

  /** Word-repetition quality signals (the Gopher/MassiveText repetition
    * filters, word-count flavor): `top_bigram_frac` = share of word
    * bigrams taken by the single most frequent bigram, `dup_trigram_frac`
    * = share of word trigrams that are repeats of an earlier trigram.
    * High values flag boilerplate/spam for the curation gate. Per-row
    * column expressions — embarrassingly parallel, no shuffle, safe in a
    * 100 TB scan stage; computed by the single-pass
    * `graft.functions.TextHashExprs.repetitionStats` kernel
    * (the HOF formulation below stays as its parity oracle).
    *
    * Reference scope note: the reference library has no text-curation
    * surface; this extends the pipeline operators (SURVEY §2 "beyond the
    * reference" set) alongside [[qualityFeatures]].
    */
  def repetitionFeatures(text: Column): Seq[(String, Column)] = {
    val stats = graft.functions.TextHashExprs.repetitionStats(
      coalesce(text, lit("")))
    Seq(
      "top_bigram_frac" -> element_at(stats, 1),
      "dup_trigram_frac" -> element_at(stats, 2))
  }

  /** Higher-order-function formulation of [[repetitionFeatures]] —
    * semantic reference and test oracle for the native kernel. */
  def repetitionFeaturesHof(text: Column): Seq[(String, Column)] = {
    val words = split(trim(text), "\\s+")
    val bi = wordNgrams(words, 2)
    val tri = wordNgrams(words, 3)
    Seq(
      "top_bigram_frac" -> when(size(bi) > 0,
        maxEqualRun(array_sort(bi)).cast("double") / size(bi))
        .otherwise(lit(0.0)),
      "dup_trigram_frac" -> when(size(tri) > 0,
        lit(1.0) - size(array_distinct(tri)).cast("double") / size(tri))
        .otherwise(lit(0.0)))
  }

  /** 64-bit content fingerprint of normalized text (case-folded,
    * whitespace-collapsed) — exact-dup key that survives formatting noise.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Order-sensitive polynomial rolling fingerprint (base 131, mod 1e9+7)
    * over the code points of normalized text. Same dedup-key role as
    * `fingerprint` but arithmetic-only, so an external SQL engine can
    * reproduce it bit-for-bit (`ascii` returns the full code point,
    * matching DuckDB `unicode`). Stays inside whole-stage codegen: one
    * regexp pass + a higher-order aggregate, no UDF.
    */
  def rollingFingerprint(text: Column): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val chars = regexp_extract_all(norm, lit("(?s)."), lit(0))
    aggregate(chars, lit(0L),
      (acc, c) => (acc * lit(131L) + ascii(c)) % lit(1000000007L))
  }

  /** Corpus vocabulary head: top-k case-folded whitespace tokens by
    * term frequency (ties broken by token), with document frequency —
    * the aggregate a tokenizer-training / vocab-coverage pass needs.
    *
    * Scale shape: explode -> hash aggregate on the token key. Partial
    * (map-side) aggregation bounds the shuffle by |vocab| x partitions,
    * not by corpus token count; the final top-k is a TakeOrdered over
    * the vocab-sized aggregate, never a global sort of the corpus.
    * Exact `countDistinct(id)` expands the pre-shuffle key to
    * (token, id) pairs — semantically required for exact doc frequency;
    * pass `approxDocFreq = true` at extreme scale to keep the shuffle
    * vocab-bounded (HLL, mergeable, ±2% default).
    */
  def vocabTopK(df: org.apache.spark.sql.DataFrame, textCol: String,
                idCol: String, k: Int = 20,
                approxDocFreq: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val toks = df.select(
      col(idCol).as("__id"),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
                     t => t =!= "")).as("token"))
    val docFreq =
      if (approxDocFreq) approx_count_distinct(col("__id"))
      else countDistinct(col("__id"))
    toks.groupBy("token")
      .agg(count(lit(1)).as("term_freq"), docFreq.as("doc_freq"))
      .orderBy(col("term_freq").desc, col("token"))
      .limit(k)
  }

  /** Vocabulary OOV coverage per source: build the corpus's top-k
    * token vocabulary (the [[vocabTopK]] head — term-frequency desc,
    * token-asc ties, so the cut is deterministic in any engine) and
    * report per source the total token instances, the OOV instances
    * (tokens outside the head) and the distinct OOV types — the
    * data-card numbers that decide whether a tokenizer's vocabulary
    * fits a NEW source before it enters the mixture. All integers.
    *
    * Scale shape: one explode into a (source, token) count aggregate
    * (map-side combined; bounded by |vocab| x |sources|, not corpus
    * tokens), a vocab-sized rollup with TakeOrdered for the head
    * (never a corpus sort), then a broadcast of the k-row vocabulary
    * back onto the per-source table — the corpus is scanned once.
    * The per-source table is persisted across its two uses (vocab
    * rollup + coverage join); released by the caller's clearCache.
    */
  def vocabCoverage(df: org.apache.spark.sql.DataFrame, textCol: String,
                    srcCol: String, k: Int = 1000)
      : org.apache.spark.sql.DataFrame = {
    val perSrc = df.where(col(textCol).isNotNull)
      .select(col(srcCol).as("source"),
              explode(filter(split(lower(trim(col(textCol))), "\\s+"),
                             t => t =!= "")).as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("__n"))
    // NOT persisted (r13): the vocab top-k and the coverage join read
    // the identical (source, token) aggregate subtree — runtime
    // exchange reuse dedupes to one corpus scan within the single
    // action (the seasonalAnomalies finding)
    val vocab = perSrc.groupBy("token")
      .agg(sum("__n").as("__tf"))
      .orderBy(col("__tf").desc, col("token"))
      .limit(k)
      .select(col("token"), lit(1).as("__in"))
    perSrc.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("source")
      .agg(sum("__n").as("n_tokens"),
           coalesce(sum(when(col("__in").isNull, col("__n"))), lit(0L))
             .as("n_oov"),
           count(when(col("__in").isNull, 1)).as("n_oov_types"))
  }

  /** CCNet-style language-model quality score: a unigram word LM with
    * add-one smoothing is trained on the corpus itself, and each
    * document is scored by its per-token negative log-likelihood
    * (low NLL = typical text, high NLL = rare-word noise — the standard
    * perplexity-bucket curation signal).
    *
    * Plan shape: one token explode + groupBy trains the LM (shuffle
    * bounded by |vocab| x partitions after map-side combine), a scalar
    * subquery-style cross of the (1-row) corpus totals, then one
    * token→count equi-join and a per-doc re-aggregate. At 100 TB the
    * vocab table is the only broadcast-unsafe piece — it stays an equi
    * shuffle join (hot tokens like "the" are high-frequency but the
    * count table has ONE row per token, so no skew on the build side).
    *
    * Determinism across engines: per-token log-probabilities are
    * integerized (`round(ln(p) * 1e6)` as BIGINT) before any sum, so
    * aggregation order cannot move the result — same discipline as the
    * seq-packing fix. Returns one row per non-empty document:
    * (idCol, n_tokens, nll_micro_sum) with
    * `avg_nll = -nll_micro_sum / (1e6 * n_tokens)` derivable exactly.
    */
  def unigramNll(df: org.apache.spark.sql.DataFrame, textCol: String,
                 idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(
      col(idCol),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
                     t => t =!= "")).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("n_corpus"),
                            count(lit(1)).as("n_vocab"))
    // add-one smoothed log-prob, integerized at 6 digits for
    // order-independent exact BIGINT sums downstream
    val logpMicro = round(
      log((col("cnt") + 1.0) / (col("n_corpus") + col("n_vocab"))) *
        lit(1e6)).cast("long")
    val scored = counts.crossJoin(broadcast(totals))
      .select(col("token"), logpMicro.as("logp_micro"))
    toks.join(scored, Seq("token"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
           sum("logp_micro").as("nll_micro_sum"))
  }

  /** Bigram head of the corpus LM: the top-k adjacent word pairs by
    * occurrence count, each with the exact conditional probability of
    * the second word given the first as parts-per-million — BIGINT
    * `(cnt * 1e6) div first_word_total`, integer division, so the
    * whole surface replays bit-exactly on any engine (the unigram-NLL
    * integerize-before-aggregate discipline, taken to the next n).
    *
    * Plan shape: per-doc bigrams come from a generator over the token
    * array (no shuffle), ONE groupBy counts bigrams (map-side combine
    * bounds the shuffle by distinct bigrams per partition), and the
    * first-word totals are an unordered window sum OVER THE COUNT
    * TABLE (one row per bigram, partitioned by first word) — a join
    * back would recompute the whole tokenize+count subtree for the
    * build side. A hot first word's window partition is bounded by its
    * distinct successors (<= vocab), not its corpus frequency. Top-k
    * is a TakeOrdered, never a full sort.
    */
  def bigramTopK(df: org.apache.spark.sql.DataFrame, textCol: String,
                 k: Int = 20): org.apache.spark.sql.DataFrame = {
    // STAGE the token array below the n-gram lambda: an expression-level
    // `words` here is re-split per element_at call inside the transform
    // (measured 10x slower at 5k docs) — same discipline as bm25TopK's
    // materialized __tok projection
    val words = filter(split(lower(trim(col(textCol))), "\\s+"),
                       t => t =!= "")
    val big = df.select(words.as("__tok"))
      .select(explode(wordNgrams(col("__tok"), 2)).as("bigram"))
    val counts = big.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .withColumn("__w1", substring_index(col("bigram"), " ", 1))
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy("__w1")
    counts
      .withColumn("__w1_cnt", sum(col("cnt")).over(wFirst))
      .select(col("bigram"), col("cnt"),
              expr("(cnt * 1000000L) div __w1_cnt").as("cond_ppm"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(k)
  }

  /** Collocation mining: the top-k bigrams by pointwise-mutual-
    * information LIFT — `P(xy) / (P(x)·P(y))`, the monotone core of
    * PMI without the log — among bigrams seen at least `minCount`
    * times. High-lift pairs are multiword expressions ("new york",
    * "machine learning"): the vocabulary-merge signal behind BPE-style
    * tokenizer construction and phrase-aware dedup shingling.
    *
    * The lift is the exact integer `(cnt_xy · N · scale) div
    * (cnt_x · cnt_y)` (N = total corpus tokens) — integer-only
    * end-to-end, so ranking replays bit-identically in ANSI SQL. The
    * triple product must fit a long: cnt_xy·N·scale < 2^63, i.e. at
    * webscale corpora drop `scale` a few decades (ranking granularity,
    * not correctness, is what scale buys).
    *
    * Plan shape: ONE tokenize feeds both generators; unigram and
    * bigram counts are map-side-combined aggregates whose shuffles
    * carry (token, count) pairs bounded by per-partition distinct
    * counts; the `minCount` filter prunes the bigram side BEFORE its
    * two vocabulary joins; N broadcasts as a one-row cross join.
    */
  def collocationTopK(df: org.apache.spark.sql.DataFrame, textCol: String,
                      k: Int = 20, minCount: Long = 5L,
                      scale: Long = 1000000L)
      : org.apache.spark.sql.DataFrame = {
    val words = filter(split(lower(trim(col(textCol))), "\\s+"),
                       t => t =!= "")
    val toks = df.select(words.as("__tok"))
    val uni = toks.select(explode(col("__tok")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val nTotal = uni.agg(sum(col("c")).as("n_total"))
    val big = toks
      .select(explode(wordNgrams(col("__tok"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .withColumn("__w1", substring_index(col("bigram"), " ", 1))
      .withColumn("__w2", substring_index(col("bigram"), " ", -1))
    big
      .join(uni.select(col("w").as("__w1"), col("c").as("__c1")),
            Seq("__w1"))
      .join(uni.select(col("w").as("__w2"), col("c").as("__c2")),
            Seq("__w2"))
      .crossJoin(broadcast(nTotal))
      .select(col("bigram"), col("cnt"),
              expr(s"(cnt * n_total * ${scale}L) div (__c1 * __c2)")
                .as("lift_scaled"))
      .orderBy(col("lift_scaled").desc, col("cnt").desc, col("bigram"))
      .limit(k)
  }

  /** Log2-bucketed document-length histogram — the standard corpus
    * report cut (power-of-two length bands keep the bucket count
    * bounded at any corpus scale). The bucket is the EXACT integer
    * `floor(log2(n_tokens))`, computed as the bit length of the count
    * via its binary string rendering — no float log on either engine
    * (`length(bin(n)) - 1` here, `length(printf('%b', n)) - 1` in the
    * replay). Empty/null docs land in bucket -1. One 9ish-row grouped
    * count, map-side combined.
    */
  def lengthHistogram(df: org.apache.spark.sql.DataFrame,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    df.select(tokenCount(col(textCol)).cast("long").as("__n"))
      .select(when(col("__n") === 0L, lit(-1L))
                .otherwise(length(bin(col("__n"))).cast("long") - 1L)
                .as("bucket"),
              col("__n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("sum_tokens"),
           min("__n").as("min_tokens"), max("__n").as("max_tokens"))
      .orderBy("bucket")
  }
}
