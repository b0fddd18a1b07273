package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tokenizer-training primitives: the byte-pair-encoding merge loop
  * over a corpus, run the way BPE trainers actually run at scale —
  * ONE corpus pass builds the weighted word vocabulary (distinct
  * words + occurrence counts), and every merge round then iterates on
  * that vocabulary table, which is bounded by the language (millions
  * of distinct words against trillions of corpus tokens). The corpus
  * is never rescanned.
  *
  * Merge semantics: each round counts adjacent symbol pairs weighted
  * by word frequency (with within-word multiplicity, the standard BPE
  * count), picks the most frequent pair with the deterministic
  * tie-break (freq desc, left asc, right asc), and applies the merge
  * via `replace(' '||syms||' ', ' p1 p2 ', ' merged ')` on the
  * space-delimited symbol string — the exact semantics of SQL
  * `replace()`, so every round replays bit-identically in ANSI SQL.
  * Two documented deviations from textbook BPE follow from that
  * replace: (a) true BPE re-scans overlaps after each merge within a
  * word — here a round applies the merge once per non-overlapping
  * occurrence; (b) BACK-TO-BACK occurrences sharing a delimiter
  * space merge only alternately within a round, because the shared
  * boundary space is consumed by the previous replacement: for the
  * winning pair (a, a), `a a a a` becomes `aa a a` (one merge, not
  * two — the second occurrence's leading ` a a ` pattern lost its
  * leading space), and for (a, b), `a b a b` becomes `ab a b`. The
  * skipped occurrences remain candidates for the NEXT round, and
  * `freq` reports the full adjacent-pair count (every adjacency,
  * including ones the replace leaves unmerged this round). Oracle
  * parity is unconditional — both engines share the same `replace`.
  */
object Tokenizer {

  /** Run `rounds` BPE merges; returns one row per round:
    * `(round, pair_left, pair_right, merged, freq,
    * corpus_tokens_after)` where `freq` is the merged pair's weighted
    * occurrence count and `corpus_tokens_after` the total corpus
    * symbol count after applying the merge.
    *
    * The per-round argmax is ONE collected row (freq-ordered
    * take-1 over the bounded vocabulary-pair aggregate — the
    * budget-gated driver-step discipline shared with the fit
    * solvers); everything else stays distributed on the vocabulary
    * table, persisted between rounds with the previous round's
    * lineage cut. */
  /** One space-padded replace pass of a merge over a symbol column.
    * The pass consumes the shared boundary space, so back-to-back
    * even repeats merge once per PASS (the documented `a a a a`
    * behavior of the single-pass default). */
  private def mergeOnce(syms: Column, p1: String, p2: String): Column =
    trim(replace(concat(lit(" "), syms, lit(" ")),
                 lit(s" $p1 $p2 "), lit(s" $p1$p2 ")))

  /** Replace-until-FIXPOINT merge application on the bounded vocab
    * table (`syms`, `cnt`): repeats [[mergeOnce]] until no row
    * changes — `a a a a` -> `aa aa` in one round, the classical
    * non-overlapping left-to-right BPE. Each inner step is one small
    * job over the vocabulary (never the corpus); the step count is
    * bounded by the longest pair-run in any word. */
  private def mergeToFixpoint(vocab: DataFrame, p1: String,
                              p2: String): DataFrame = {
    // r13: each step lineage-cuts with an eager localCheckpoint — the
    // previous persist+count pattern materialized the step too, but
    // kept the full LOGICAL chain, so every later round's plan (and
    // its analysis/codegen between jobs) grew with the total step
    // count across rounds; the checkpoint keeps each step's plan
    // O(one step) and drops one materialization job per step
    // (isEmpty probes the already-computed checkpoint directly).
    var cur = vocab
    var done = false
    while (!done) {
      val stepped = cur
        .select(col("syms").as("__prev"),
                mergeOnce(col("syms"), p1, p2).as("syms"),
                col("cnt"))
        .localCheckpoint()
      done = stepped.where(col("syms") =!= col("__prev")).isEmpty
      cur = stepped.select("syms", "cnt")
    }
    cur
  }

  def bpeMerges(docs: DataFrame, textCol: String,
                rounds: Int): DataFrame =
    bpeMerges(docs, textCol, rounds, exactMerge = false)

  /** `exactMerge = true` switches every round's replace to the
    * fixpoint variant (see [[applyMerge]]); the DEFAULT stays the
    * single-pass replace for oracle continuity with the q_bpe_merges
    * contract. */
  def bpeMerges(docs: DataFrame, textCol: String,
                rounds: Int, exactMerge: Boolean): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
            "rounds must be in [1, 16] — each round is a driver step")
    val spark = docs.sparkSession
    val vocab0 = docs
      .where(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), " +")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // char-split into the space-delimited symbol string
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("syms"),
              col("cnt"))
      .localCheckpoint() // r13 lineage cut, see mergeToFixpoint

    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var vocab = vocab0
    (1 to rounds).foreach { r =>
      val pairFreq = vocab
        .select(split(col("syms"), " ").as("a"), col("cnt"))
        // single-symbol words first: sequence(0, -1) is a DESCENDING
        // range in Spark, not empty (the coOccurrence lesson)
        .where(size(col("a")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(a) - 2),
             i -> struct(a[i] AS p1, a[i + 1] AS p2))""")).as("p"),
          col("cnt"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum("cnt").as("f"))
      val best = pairFreq
        .orderBy(col("f").desc, col("p1").asc, col("p2").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (p1, p2, f) = (best(0).getString(0), best(0).getString(1),
                           best(0).getLong(2))
        val merged = p1 + p2
        val next =
          if (exactMerge) mergeToFixpoint(vocab, p1, p2)
          else vocab
            .select(mergeOnce(col("syms"), p1, p2).as("syms"),
                    col("cnt"))
            .localCheckpoint() // r13 lineage cut, see mergeToFixpoint
        val tokensAfter = next
          .agg(sum(col("cnt") * size(split(col("syms"), " "))))
          .head.getLong(0)
        vocab = next
        out += Row(r.toLong, p1, p2, merged, f, tokensAfter)
      }
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("pair_left", StringType, nullable = false),
      StructField("pair_right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("freq", LongType, nullable = false),
      StructField("corpus_tokens_after", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }

  /** Tokenizer APPLY pass — encode the corpus with a trained merge
    * list (the other half of train->apply; [[bpeMerges]] trains).
    *
    * The merges are applied IN ORDER with the identical space-padded
    * `replace` semantics as training (including the documented
    * shared-delimiter behavior), over the same bounded weighted word
    * vocabulary — one corpus pass builds the vocab, every merge then
    * rewrites the vocabulary table only; the corpus is never
    * re-tokenized row by row. All readouts are exact BIGINT corpus
    * tallies, so the whole encode replays bit-identically in SQL.
    *
    * One summary row:
    *  - `n_docs`, `total_words` (corpus occurrences),
    *  - `base_tokens` (char-split baseline symbol count),
    *  - `encoded_tokens` (after the merges), and the split into
    *    `merged_occurrences` (multi-char symbols) +
    *    `single_char_occurrences`,
    *  - `distinct_symbols` (the effective vocabulary: base chars
    *    still in use + applied merge products),
    *  - `compression_ppm` = 1e6 * encoded div base (truncated ppm),
    *  - `tokens_per_doc_milli` = 1e3 * encoded div n_docs. */
  def bpeEncode(docs: DataFrame, textCol: String,
                merges: Seq[(String, String)]): DataFrame =
    bpeEncode(docs, textCol, merges, exactMerge = false)

  /** `exactMerge = true` applies each merge to its per-word fixpoint
    * (pair with [[bpeMerges]]' exactMerge-trained chain); the
    * default single-pass replace matches the q_bpe_encode oracle. */
  def bpeEncode(docs: DataFrame, textCol: String,
                merges: Seq[(String, String)],
                exactMerge: Boolean): DataFrame = {
    // an EMPTY merge list is valid (a corpus of single-character
    // words trains zero merges): the encode is then exactly the
    // char-split baseline
    require(merges.size <= 64, "at most 64 merges")
    val spark = docs.sparkSession
    val vocab0 = docs
      .where(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), " +")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("syms"),
              col("cnt"))
    val enc = (
      if (exactMerge)
        // each fixpoint output is already checkpoint-materialized;
        // old steps' blocks release via the ContextCleaner
        merges.foldLeft(vocab0)((v, m) =>
          mergeToFixpoint(v, m._1, m._2))
      else
        merges.foldLeft(vocab0) { case (v, (p1, p2)) =>
          v.select(mergeOnce(col("syms"), p1, p2).as("syms"),
                   col("cnt"))
        }
    ).persist()
    val agg = enc.agg(
      sum(col("cnt")).as("total_words"),
      sum(col("cnt") * length(replace(col("syms"), lit(" "), lit(""))))
        .as("base_tokens"),
      sum(col("cnt") * size(split(col("syms"), " ")))
        .as("encoded_tokens"),
      sum(col("cnt") * size(filter(split(col("syms"), " "),
                                   s => length(s) > 1)))
        .as("merged_occurrences")).head
    val distinctSymbols = enc
      .select(explode(split(col("syms"), " ")).as("s"))
      .distinct().count()
    enc.unpersist()
    val nDocs = docs.where(col(textCol).isNotNull).count()
    val (tw, base, encTok, mergedOcc) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    val row = Row(nDocs, tw, base, encTok, mergedOcc,
                  encTok - mergedOcc, distinctSymbols,
                  if (base > 0) 1000000L * encTok / base else 0L,
                  if (nDocs > 0) 1000L * encTok / nDocs else 0L)
    val schema = StructType(Seq(
      StructField("n_docs", LongType, nullable = false),
      StructField("total_words", LongType, nullable = false),
      StructField("base_tokens", LongType, nullable = false),
      StructField("encoded_tokens", LongType, nullable = false),
      StructField("merged_occurrences", LongType, nullable = false),
      StructField("single_char_occurrences", LongType, nullable = false),
      StructField("distinct_symbols", LongType, nullable = false),
      StructField("compression_ppm", LongType, nullable = false),
      StructField("tokens_per_doc_milli", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
  }
}
