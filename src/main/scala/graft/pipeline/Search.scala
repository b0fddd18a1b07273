package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text keyword search over a document corpus: BM25 ranking.
  *
  * Plan shape (the part that matters at 100 TB):
  *  - corpus-wide statistics (N, avg doc length) come from ONE narrow
  *    aggregate over a token-count projection — no explode, no shuffle
  *    of tokens;
  *  - the token explode is filtered to the query's terms BEFORE any
  *    shuffle (`array_contains` on a literal array), so the exploded
  *    relation is |docs matching any term| x |query terms| — for a
  *    10-term query this is a sliver of the corpus, not a token dump;
  *  - document length rides in the aggregate key (it is functionally
  *    dependent on the doc id), so no join back to the corpus is needed;
  *  - per-term document frequencies are a tiny aggregate (≤ |query|
  *    rows) broadcast into the scoring join.
  * Net: one full scan (stats) + one filtered scan (postings), two small
  * shuffles, a broadcast join, and a TakeOrdered top-k.
  */
object Search {

  /** BM25 top-k: rank documents for a bag-of-words query.
    * Standard Robertson/Sparck-Jones BM25 with the "+1" idf variant
    * (always positive, as used by Lucene):
    * idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)),
    * score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len/avgLen)).
    *
    * `scoreDigits` rounds the score before ranking (ties break by id)
    * so rankings replay identically across engines.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               query: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75, scoreDigits: Int = 6): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val nTok = TextAnalysis.tokenCount(col(textCol)).cast("double")

    // one narrow pass: corpus size and average length (exact int sums)
    val stats = df.agg(count(lit(1)).cast("double").as("n_corpus"),
                       sum(nTok).as("len_sum"))
      .select(col("n_corpus"),
              (col("len_sum") / col("n_corpus")).as("avg_len"))

    // postings: explode tokens, keep ONLY query matches — the IN filter
    // sits directly on the generator output, pipelined in the same
    // codegen stage, so non-matching tokens never leave the scan task.
    // The token array is STAGED as a materialized projection below the
    // Generate and doc length taken as size(__tok): an expression-level
    // token count here would be re-split PER TOKEN ROW above the
    // generator (measured 3.5x slower at 80k docs), and an ArrayFilter
    // lambda before the explode evaluates interpreted (4x slower).
    // size(__tok) == tokenCount for every surviving row (only docs with
    // >= 1 matching token reach the aggregate, so the empty-doc special
    // case cannot occur).
    val postings = df
      .select(col(idCol).as("id"),
              split(lower(trim(col(textCol))), "\\s+").as("__tok"))
      .select(col("id"), size(col("__tok")).cast("double").as("len"),
              explode(col("__tok")).as("token"))
      .where(col("token").isInCollection(query.map(_.toLowerCase)))
      .groupBy("id", "len", "token")
      .agg(count(lit(1)).cast("double").as("tf"))

    // per-term document frequency: at most |query| rows
    val dfc = postings.groupBy("token")
      .agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) +
      (col("n_corpus") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("len") / col("avg_len")))

    // per-term score contributions are integerized before the per-doc
    // sum (exact BIGINT adds are aggregation-order independent; a float
    // sum over shuffled term rows is not)
    val scale = math.pow(10, scoreDigits)
    postings
      .join(broadcast(dfc), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("id"),
              round(idf * tfNorm * lit(scale)).cast("long")
                .as("part_scaled"))
      .groupBy("id")
      .agg(round(sum(col("part_scaled")) / lit(scale), scoreDigits)
             .as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** Per-document top-k keywords by smoothed tf-idf
    * (idf = ln((1+N)/(1+df)) + 1, the sklearn smoothing): corpus-wide
    * document frequencies scored against each target document's term
    * counts — keyword tagging / topic features for a curation pipeline.
    *
    * Scale shape: document frequency is ONE aggregate over per-doc
    * DISTINCT tokens (array_distinct runs map-side inside the scan
    * task, so the shuffle carries each document's vocabulary once, not
    * every token occurrence); N is a narrow count. The corpus
    * vocabulary can be huge at scale, so the (token, df) side is first
    * SEMI-JOINED against the targets' (small, broadcast) token set —
    * a map-side filter, no vocab shuffle — and only the surviving
    * target-vocabulary rows broadcast into the scoring join. Ranking
    * windows partition by document — no global ordering anywhere.
    *
    * Ranking is on the `scoreDigits`-rounded score with ties broken by
    * token, so result rows replay identically in an external engine.
    */
  def tfidfTopTerms(corpus: DataFrame, targets: DataFrame,
                    textCol: String, idCol: String, k: Int,
                    scoreDigits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val nDocs = corpus.agg(count(lit(1)).cast("double").as("n_corpus"))
    val dfc = corpus
      .select(explode(array_distinct(toks)).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val tf = targets
      .select(col(idCol).as("id"), explode(toks).as("token"))
      .where(col("token") =!= "")
      .groupBy("id", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = log((lit(1.0) + col("n_corpus")) / (lit(1.0) + col("df"))) +
      lit(1.0)
    val w = Window.partitionBy("id")
      .orderBy(desc("score"), col("token"))
    val dfcNeeded = dfc.join(broadcast(tf.select("token").distinct()),
                             Seq("token"), "left_semi")
    // LEFT join + df=0 fallback: a target token absent from the corpus
    // is the MOST distinctive (maximal smoothed idf), not a dropped row
    tf.join(broadcast(dfcNeeded), Seq("token"), "left")
      .withColumn("df", coalesce(col("df"), lit(0.0)))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") * idf, scoreDigits))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "rank", "token", "score")
  }

  /** Hybrid retrieval: keyword (BM25) and semantic (embedding-cosine)
    * rank lists fused by reciprocal-rank fusion — the standard
    * two-tower RAG retrieval recipe. Each ranker contributes
    * `1e6 div (rrfK + rank)` (exact integer division on integer
    * ranks, so the fusion surface replays bit-exactly; float RRF
    * sums do not), a document in only one list gets only that list's
    * contribution, and the fused top-`k` orders by
    * (rrf_ppm DESC, id).
    *
    * Scale shape: each ranker bounds its own cost — BM25 prunes the
    * token explode to the query terms before any shuffle
    * ([[bm25TopK]]), the vector side is one narrow projection +
    * TakeOrdered (brute force here; swap in an IVF/PQ list from
    * [[Similarity]] behind the same (id, rank) contract at corpus
    * scale). The fusion itself joins two <= `kList`-row lists — a
    * broadcast full-outer join, driver-free.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
                textCol: String, idCol: String,
                embIdCol: String, embCol: String,
                query: Seq[String], queryVec: Array[Double],
                kList: Int = 20, k: Int = 10,
                rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kList >= k, s"kList ($kList) must be >= k ($k)")
    // both lists are <= kList rows: a global (unpartitioned) rank
    // window is a single tiny task, NOT a scale concern — the limits
    // run before it
    val bm = bm25TopK(docs, textCol, idCol, query, kList)
      .withColumn("r", row_number().over(
        graft.core.Windows.bounded(desc("score"), col("id"))))
      .select(col("id"), col("r").as("__rt"))
    val qv = array(queryVec.map(lit(_)): _*)
    val ve = embeddings
      .select(col(embIdCol).as("id"),
              round(Similarity.cosine(col(embCol).cast("array<double>"),
                                      qv), 6).as("cosine"))
      .orderBy(desc("cosine"), col("id")).limit(kList)
      .withColumn("r", row_number().over(
        graft.core.Windows.bounded(desc("cosine"), col("id"))))
      .select(col("id"), col("r").as("__rv"))
    bm.join(ve, Seq("id"), "full_outer")
      .select(col("id"),
              (coalesce(expr(s"1000000L div ($rrfK + __rt)"), lit(0L)) +
               coalesce(expr(s"1000000L div ($rrfK + __rv)"), lit(0L)))
                .as("rrf_ppm"))
      .orderBy(desc("rrf_ppm"), col("id"))
      .limit(k)
  }

  /** Exact phrase search: documents containing the query terms as a
    * CONTIGUOUS token run, with the per-document occurrence count —
    * the retrieval primitive BM25's bag-of-words scoring cannot
    * express (quote queries, boilerplate phrase hunting, template
    * detection in a crawl).
    *
    * Plan shape — the positional-postings intersection every inverted
    * index runs, expressed as relational operators so Catalyst keeps
    * it distributed:
    *  - ONE tokenize + posexplode per document, with the term filter
    *    (`isInCollection` on the literal query vocabulary) fused into
    *    the same codegen stage as the generator, so only positions of
    *    query terms ever leave the scan task — for an m-term phrase
    *    the exploded relation is O(matching positions), a sliver of
    *    the token stream;
    *  - the matched postings repartition by doc id ONCE; every
    *    per-term branch is a filter over that same reused exchange
    *    (one scan + tokenize total, not one per term), and the m-way
    *    positional intersection — equi-joins on `(id, pos)` with term
    *    i's positions shifted by -i — inherits the id partitioning
    *    (HashPartitioning(id) satisfies each join's clustered
    *    distribution), so no further shuffle exists anywhere;
    *  - occurrence count = one aggregate over surviving anchors,
    *    again on the inherited id partitioning.
    * No global sort, no token-array shuffle, no per-pair recompute.
    *
    * Each `(id, pos)` pair is unique by construction (one token per
    * position), so the inner joins cannot fan out: every surviving
    * anchor row is exactly one phrase occurrence (overlapping
    * occurrences of self-overlapping phrases included, matching the
    * sliding-window definition).
    */
  def phraseSearch(df: DataFrame, textCol: String, idCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val terms = phrase.map(_.toLowerCase)
    // repartition(id): the id co-partitioning serves every downstream
    // (id, pos) join/aggregate (HashPartitioning(id) satisfies their
    // clustered distributions — no further shuffle). The per-term
    // filters push THROUGH the repartition, specializing each branch's
    // exchange into its own term's postings sliver — m bounded
    // scan+tokenize passes for an m-term phrase, each filtered BEFORE
    // its shuffle. r13 measured this faster than persisting the
    // combined postings (0.55 -> 0.45 s at sf0.1): the cache build +
    // cached-read tasks cost more than the extra (tiny, early-
    // filtered) scans, and m is bounded by the phrase length.
    val postings = df
      .select(col(idCol).as("id"),
              split(lower(trim(col(textCol))), "\\s+").as("__tok"))
      .select(col("id"),
              posexplode(col("__tok")).as(Seq("pos", "token")))
      .where(col("token").isInCollection(terms.distinct))
      .repartition(col("id"))
    // NOT persisted (r13): every per-term filter reads the identical
    // explode+repartition(id) subtree — runtime exchange reuse dedupes
    // to one corpus scan across the fold's joins within the single
    // action (the seasonalAnomalies finding)
    val anchor = postings.where(col("token") === terms.head)
      .select(col("id"), col("pos"))
    val hits = terms.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        val shifted = postings.where(col("token") === t)
          .select(col("id"), (col("pos") - i).as("pos"))
        acc.join(shifted, Seq("id", "pos"))
    }
    hits.groupBy("id").agg(count(lit(1)).as("n_hits"))
  }

  /** Scan-side phrase-occurrence counter over a MATERIALIZED token
    * array: number of windows where the phrase matches. The zero-
    * shuffle formulation ([[phraseSearch]]'s parity oracle, and the
    * right plan when the corpus has no posting index to exploit —
    * one codegen'd projection pass, nothing leaves the scan task
    * but a (id, count) row). */
  def phraseHitsOf(tokens: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val m = phrase.size
    when(size(tokens) < m, lit(0)).otherwise(
      size(filter(sequence(lit(0), size(tokens) - m), i =>
        phrase.map(_.toLowerCase).zipWithIndex.map { case (t, j) =>
          element_at(tokens, i + j + 1) === lit(t)
        }.reduce(_ && _))))
  }
}
