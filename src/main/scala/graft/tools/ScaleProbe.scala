package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BinningConfig, OptimalBinning, Scorecard}
import graft.pipeline.{Dedup, Similarity}

/** Scale probe: fit the same operators on 1x / 4x / 16x multiplied
  * lineitem (in-memory explode — nothing written) and print wall times.
  * The aggregate-then-solve design claims fit cost is bounded by the
  * value histogram, not the row count: data passes should scale roughly
  * linearly in rows (scan-bound) while shuffle volume and driver work
  * stay constant. A second section scales the documents/embeddings
  * pipeline paths (near-dup LSH+verify, PQ ANN) the same way: candidate
  * generation is one bucket shuffle, verification cost follows the
  * dup-suspect fraction, and ADC scoring is one stationary scan.
  * Usage: runMain graft.tools.ScaleProbe [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional 2nd arg: comma-separated section filter (local
    // iteration without re-running every section), e.g. "events"
    val sections: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    def section(name: String)(body: => Unit): Unit =
      if (sections.forall(_.contains(name))) body
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
      .select("l_extendedprice", "l_quantity", "y")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    section("classic") {
    Seq(1, 4, 16).foreach { mult =>
      val df =
        if (mult == 1) li
        else li.crossJoin(
          spark.range(mult.toLong).select(col("id").as("__rep")))
          .drop("__rep")
      val n = df.count()
      // warm + measure second run (steady state)
      (1 to 2).foreach { pass =>
        val tFit = timed {
          OptimalBinning.fit(df, "l_extendedprice", "y",
                             BinningConfig(name = "x"))
        }
        val tSc = timed {
          Scorecard.fit(df, Seq("l_extendedprice", "l_quantity"), "y")
        }
        if (pass == 2)
          println(f"PROBE mult=$mult%2d rows=$n%9d " +
            f"single_fit=$tFit%6.2f s scorecard_fit=$tSc%6.2f s")
      }
    }

    // pipeline paths: replicate documents/embeddings with distinct ids.
    // Every copy is an exact duplicate of its original, so duplicate
    // CLUSTERS grow to mult members and candidate pairs grow
    // quadratically in mult (bounded by the star-expansion guard at
    // 256) — deliberately harsher than real corpus growth, where dup
    // density stays constant. Near-dup cost should track the candidate
    // pair count, never corpus^2
    Seq(1, 4, 16).foreach { mult =>
      def rep(df: org.apache.spark.sql.DataFrame, idCol: String) =
        if (mult == 1) df
        else df.crossJoin(
            spark.range(mult.toLong).select(col("id").as("__rep")))
          .withColumn(idCol,
            col(idCol) * mult + col("__rep")).drop("__rep")
      val d = rep(docs, "doc_id")
      val e = rep(emb, "vec_id")
      val nd = d.count(); val ne = e.count()
      (1 to 2).foreach { pass =>
        val tNd = timed {
          Dedup.nearDupPairs(d, "text", "doc_id",
                             jaccardThreshold = 0.5, numHashes = 32,
                             bands = 8, jaccardNgram = 3)
            .agg(count(lit(1))).collect()
        }
        val queries = e.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding"))
        val tPq = timed {
          Similarity.pqTopK(e, queries, "embedding", "vec_id", "qid",
                            k = 5).agg(count(lit(1))).collect()
        }
        if (pass == 2)
          println(f"PROBE mult=$mult%2d docs=$nd%9d vecs=$ne%8d " +
            f"neardup=$tNd%6.2f s pq_topk=$tPq%6.2f s")
        // nearDupPairs persists dup-suspect-sized intermediates per
        // call; drop them after EVERY pass so the measured pass is a
        // cold-cache warm-JIT run of the full pipeline, not a replay of
        // the warm-up's cached candidates
        spark.catalog.clearCache()
      }
    }

    // round-6 curation/search paths. semanticDedup's documented scaling
    // knob is nLists (cells stay ~constant-size as the corpus grows),
    // so the probe raises it with mult — cost should track corpus size,
    // not corpus^2. BM25 and the curation chain are scan-bound;
    // unigramNll adds one vocab-bounded shuffle + one token join.
    Seq(1, 4, 16).foreach { mult =>
      def rep(df: org.apache.spark.sql.DataFrame, idCol: String) =
        if (mult == 1) df
        else df.crossJoin(
            spark.range(mult.toLong).select(col("id").as("__rep")))
          .withColumn(idCol,
            col(idCol) * mult + col("__rep")).drop("__rep")
      val d = rep(docs, "doc_id")
      val e = rep(emb, "vec_id")
      val nd = d.count(); val ne = e.count()
      val bench = d.where(col("doc_id") < 20)
      val corpus = d.where(col("doc_id") >= 20)
      (1 to 2).foreach { pass =>
        val tSem = timed {
          Similarity.semanticDedupPortable(e, "embedding", "vec_id",
              dim = 64, threshold = 0.95, nLists = 16 * mult)
            .agg(count(lit(1))).collect()
        }
        val tCur = timed {
          graft.pipeline.Curation.curateForTraining(
              corpus, bench, "text", "doc_id", qualityMin = 0.9,
              gramN = 5)
            .agg(count(lit(1))).collect()
        }
        val tBm = timed {
          graft.pipeline.Search.bm25TopK(d, "text", "doc_id",
              Seq("spark", "window", "merge"), k = 10).collect()
        }
        val tNll = timed {
          graft.pipeline.TextAnalysis.unigramNll(d, "text", "doc_id")
            .agg(count(lit(1))).collect()
        }
        // topic clustering + cluster-balanced sample: per iteration one
        // narrow native assignment + one k x (dim+1) aggregate, then an
        // exact in-cluster sample — cost must track corpus size only
        val tKm = timed {
          val cl = Similarity.kmeansPortable(e, "embedding", dim = 64,
                                             k = 8, iters = 2)
          graft.pipeline.Curation
            .stratifiedSample(cl, col("cluster"), col("vec_id"), 0.25)
            .agg(count(lit(1))).collect()
        }
        // keyword tagging: vocab-bounded df aggregate, semi-joined to
        // the target token set before the broadcast scoring join
        val tTf = timed {
          graft.pipeline.Search.tfidfTopTerms(
              d, d.where(col("doc_id") % lit(1000L) === 0),
              "text", "doc_id", k = 3)
            .agg(count(lit(1))).collect()
        }
        if (pass == 2)
          println(f"PROBE mult=$mult%2d docs=$nd%9d vecs=$ne%8d " +
            f"semdedup=$tSem%6.2f s curate=$tCur%6.2f s " +
            f"bm25=$tBm%6.2f s nll=$tNll%6.2f s " +
            f"kmeans_sample=$tKm%6.2f s tfidf=$tTf%6.2f s")
        spark.catalog.clearCache()
      }
    }

    // Wide-batch BinningProcess: the ADVICE scenario — hundreds of
    // variables through the stats pass. Pass A runs as concurrent
    // <= 256-expression un-melted aggregates and Pass B as a chunked
    // stack melt, so fit wall time must stay roughly linear in vars
    // (a monolithic stage crossed HotSpot's JIT method ceiling and ran
    // interpreted: 72 s at 40 vars before the chunked rewrite, ~11 s
    // after; 120 vars ~16 s).
    {
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0)
          .otherwise(0.0))
      Seq(40, 120).foreach { nVars =>
        val wide = base.select(
          col("y") +: (0 until nVars).map(i =>
            (col("l_extendedprice") * (1.0 + i * 0.01) +
             col("l_quantity") * (i % 7)).as(s"v$i")): _*)
        val vars = (0 until nVars).map(i => s"v$i")
        (1 to 2).foreach { pass =>
          val t = timed {
            graft.operators.BinningProcess.fit(wide, vars, "y")
          }
          if (pass == 2)
            println(f"PROBE wide-batch nVars=$nVars%4d fit=$t%6.2f s")
        }
      }
    }

    // sf1-equivalent point (10x sf0.1 in-memory): the 6M-row
    // multi-variable batch fit and the 50k-doc curation chain — the
    // measured backing for the "scan-bound, histogram-bounded shuffle"
    // scaling claims at a full order of magnitude above the bench SF.
    {
      val li10 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0)
          .otherwise(0.0))
        .crossJoin(spark.range(10).select(col("id").as("__rep")))
        .drop("__rep")
      val nVars = 10
      val wide = li10.select(
        col("y") +: (0 until nVars).map(i =>
          (col("l_extendedprice") * (1.0 + i * 0.01) +
           col("l_quantity") * (i % 7)).as(s"v$i")): _*)
      val n = wide.count()
      val docs10 = docs
        .crossJoin(spark.range(10).select(col("id").as("__rep")))
        .withColumn("doc_id", col("doc_id") * 10 + col("__rep"))
        .drop("__rep")
      val nd = docs10.count()
      val bench10 = docs10.where(col("doc_id") < 200)
      val corpus10 = docs10.where(col("doc_id") >= 200)
      (1 to 2).foreach { pass =>
        val tFit = timed {
          graft.operators.BinningProcess.fit(
            wide, (0 until nVars).map(i => s"v$i"), "y")
        }
        val tCur = timed {
          graft.pipeline.Curation.curateForTraining(
              corpus10, bench10, "text", "doc_id", qualityMin = 0.9,
              gramN = 5)
            .agg(count(lit(1))).collect()
        }
        if (pass == 2)
          println(f"PROBE sf1-equiv rows=$n%9d vars=$nVars " +
            f"batch_fit=$tFit%6.2f s | docs=$nd%7d curate=$tCur%6.2f s")
        spark.catalog.clearCache()
      }
    }

    // Skewed sourceCap: a 10x-skewed mega-source at >= 10M rows. The
    // naive shape (window rank over everything) lands the whole
    // mega-source on ONE task's external sort — AQE skew splitting
    // applies to shuffle joins, not window partitions — while the
    // skew-safe shape pre-filters each source to a ~1.5*cap + 64
    // candidate sliver by md5 prefix BEFORE the window, so task time is
    // bounded by the sliver regardless of source size. Both must pick
    // the IDENTICAL rows (the pre-filter is exact, not approximate).
    {
      import org.apache.spark.sql.expressions.Window
      val n = 20_000_000L
      val skewed = spark.range(n).select(
        col("id"),
        when(col("id") < 10_000_000L, lit("mega"))
          .otherwise(concat(lit("s"), col("id") % 10)).as("source"))
      val cap = 1000
      def naiveCap(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("id").cast("string").cast("binary")),
                   col("id"))
        df.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= cap).drop("__rn")
      }
      (1 to 2).foreach { pass =>
        val safe = graft.pipeline.Curation
          .sourceCap(skewed, col("source"), col("id"), cap)
        val tSafe = timed { safe.agg(count(lit(1))).collect() }
        val tNaive = timed { naiveCap(skewed).agg(count(lit(1))).collect() }
        if (pass == 2) {
          val diff = safe.select("id")
            .except(naiveCap(skewed).select("id")).count()
          println(f"PROBE skew-cap rows=$n%9d cap=$cap " +
            f"safe=$tSafe%6.2f s naive_one_task_sort=$tNaive%6.2f s " +
            f"pick_diff=$diff")
        }
      }
    }
    } // section("classic")

    section("events") {
    // round-7 event/search operators at 1x / 4x / 16x events (and
    // docs for the text paths). funnel is k chained per-user min
    // aggregates (scan-bound, funnel sides shrink); rollingFeatures is
    // one shuffle + one shared window sort per key; tokenBudget's
    // window runs over md5-prefix slivers only; bigram is one
    // tokenize + one count shuffle; hybridRrf is two bounded lists +
    // a tiny fusion join — all should scale ~linearly in rows
    {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
                col("event_id"), col("event_type"), col("value"))
      Seq(1, 4, 16).foreach { mult =>
        val e =
          if (mult == 1) ev
          else ev.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            // spread replicas over users so per-key history (ONE
            // task's window sort) stays constant while rows scale;
            // the offset must clear every SF's real user_id range or
            // replica keys collide with original ones
            .withColumn("user_id",
              col("user_id") + col("__rep") * 10_000_000L)
            .withColumn("event_id",
              col("event_id") * mult + col("__rep")).drop("__rep")
        // the shared `docs` val is (doc_id, text) only; the token
        // budget needs the source column too
        val docsS = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text", "source")
        val d =
          if (mult == 1) docsS
          else docsS.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn("doc_id",
              col("doc_id") * mult + col("__rep")).drop("__rep")
        val n = e.count(); val nd = d.count()
        (1 to 2).foreach { pass =>
          val tFun = timed {
            graft.operators.Funnel.funnelCounts(e, "user_id", "ts",
                "event_type", Seq("signup", "view", "click", "purchase"))
              .collect()
          }
          val tRoll = timed {
            graft.streaming.EventWindows
              .rollingFeatures(e, "user_id", "ts", "event_id", "value")
              .agg(sum(col("roll_sum_q"))).collect()
          }
          val tTb = timed {
            graft.pipeline.Curation.tokenBudgetSample(d, col("source"),
                col("doc_id"),
                graft.pipeline.TextAnalysis.tokenCount(col("text")),
                budget = 800L * mult)
              .agg(count(lit(1))).collect()
          }
          val tBg = timed {
            graft.pipeline.TextAnalysis.bigramTopK(d, "text", k = 20)
              .collect()
          }
          val tRrf = timed {
            graft.pipeline.Search.hybridRrf(d, emb, "text", "doc_id",
                "vec_id", "embedding", Seq("spark", "window", "merge"),
                Array.fill(64)(1.0)).collect()
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d events=$n%9d docs=$nd%8d " +
              f"funnel=$tFun%6.2f s rolling=$tRoll%6.2f s " +
              f"token_budget=$tTb%6.2f s bigram=$tBg%6.2f s " +
              f"hybrid_rrf=$tRrf%6.2f s")
          spark.catalog.clearCache()
        }
      }
    }
    } // section("events")

    section("analytics") {
    // retention/top-k/CDC/attribution/novelty/co-occurrence at 1x/16x.
    // Replicas spread over NEW keys (users, orders, doc ids) so
    // per-key state — the activity-period set, a basket's item array,
    // one user's window sort — stays constant while rows scale; the
    // replicated corpus makes every copy an exact dup, so novelty's
    // df-1 set collapses toward 0 while its df-count shuffle still
    // carries the full gram volume (the cost being probed).
    {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
                col("event_id"), col("event_type"))
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      val ordRaw = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      val docsS = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "source", "lang", "n_chars")
      Seq(1, 16).foreach { mult =>
        def repKey(df: org.apache.spark.sql.DataFrame, kc: String,
                   stride: Long) =
          if (mult == 1) df
          else df.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn(kc, col(kc) + col("__rep") * stride)
            .drop("__rep")
        val e = repKey(ev, "user_id", 10_000_000L)
        // lineitem replicas must shift BOTH the basket key and the
        // item key: shifting only orders would put identical parts in
        // every replica's baskets, multiplying pair counts (and
        // flooding the n>=2 graph) instead of adding disjoint copies
        val li2 =
          if (mult == 1) liRaw
          else liRaw.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn("l_orderkey",
              col("l_orderkey") + col("__rep") * 1_000_000_000L)
            .withColumn("l_partkey",
              col("l_partkey") + col("__rep") * 1_000_000_000L)
            .drop("__rep")
        val ord2 = repKey(ordRaw, "o_orderkey", 1_000_000_000L)
        val d = repKey(docsS, "doc_id", 1_000_000_000L)
        val n = e.count(); val nl = li2.count()
        (1 to 2).foreach { pass =>
          val tRet = timed {
            graft.operators.Temporal
              .retentionMatrix(e, "user_id", "ts", 86400L)
              .agg(sum(col("n_keys"))).collect()
          }
          val tTk = timed {
            graft.operators.Ranking
              .topkPerGroup(d, Seq("lang"), "n_chars", "doc_id", 3)
              .agg(count(lit(1))).collect()
          }
          val tCdc = timed {
            val old = ord2.where(col("o_orderkey") % 7 =!= 0)
            val nw = ord2.where(col("o_orderkey") % 5 =!= 0)
              .withColumn("o_custkey",
                when(col("o_orderkey") % 3 === 0, col("o_custkey") + 1)
                  .otherwise(col("o_custkey")))
            graft.operators.Temporal
              .snapshotDiff(old, nw, Seq("o_orderkey"),
                            Seq("o_custkey", "o_orderstatus"))
              .groupBy("change").agg(count(lit(1))).collect()
          }
          val tAttr = timed {
            graft.operators.Funnel
              .lastTouchAttribution(e, "user_id", "ts", "event_id",
                "event_type", Seq("view", "click"), "purchase", 86400L)
              .groupBy("channel").agg(count(lit(1))).collect()
          }
          val tNov = timed {
            graft.pipeline.Dedup
              .ngramNovelty(d, "doc_id", "text", "source", 3)
              .agg(sum(col("n_novel"))).collect()
          }
          val tCo = timed {
            graft.operators.MarketBasket
              .coOccurrence(li2, "l_orderkey", "l_partkey")
              .agg(count(lit(1))).collect()
          }
          val tStk = timed {
            graft.operators.Temporal
              .activityStreaks(e, "user_id", "ts", 86400L)
              .groupBy("max_streak").agg(count(lit(1))).collect()
          }
          // graph ops run on the replicated basket table's derived
          // edges: replicas are disjoint copies of the base graph, so
          // edges/triangles scale by mult while per-node degree stays
          // constant — the orientation bound is what's probed
          val tGr = timed {
            val edges = graft.operators.MarketBasket
              .coOccurrence(li2, "l_orderkey", "l_partkey")
              .where(col("n") >= 2)
            val sym = edges.select(col("item_a").as("src"),
                                   col("item_b").as("dst"))
              .unionByName(edges.select(col("item_b").as("src"),
                                        col("item_a").as("dst")))
            graft.operators.Graph.pageRank(sym, "src", "dst", 2)
              .agg(sum(col("rank"))).collect()
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d events=$n%9d lineitem=$nl%9d " +
              f"retention=$tRet%6.2f s topk=$tTk%6.2f s cdc=$tCdc%6.2f s " +
              f"attribution=$tAttr%6.2f s novelty=$tNov%6.2f s " +
              f"copurchase=$tCo%6.2f s streaks=$tStk%6.2f s " +
              f"pagerank=$tGr%6.2f s")
          spark.catalog.clearCache()
        }
      }
    }
    } // section("analytics")

    // round-7 retrieval/sampling/calibration paths. Phrase search is
    // postings-bound (the explode is filtered to the phrase vocabulary
    // in the scan stage); hard negatives broadcast the bounded query
    // batch into one corpus pass; k-center costs k narrow kernel
    // scans; isotonic is one histogram aggregate + driver PAV;
    // seasonal is one calendar-bounded aggregate + histogram medians.
    section("round7") {
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_extendedprice", "l_returnflag")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select("event_type", "ts")
      Seq(1, 16).foreach { mult =>
        def rep(df: org.apache.spark.sql.DataFrame, idCol: String) =
          if (mult == 1) df
          else df.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn(idCol,
              col(idCol) * mult + col("__rep")).drop("__rep")
        val d = rep(docs, "doc_id")
        val e = rep(emb, "vec_id")
        val li2 =
          if (mult == 1) liRaw
          else liRaw.crossJoin(
            spark.range(mult.toLong).select(col("id").as("__rep")))
            .drop("__rep")
        // replicated events keep their timestamps: the hourly table
        // stays calendar-bounded while its input grows mult-fold —
        // exactly the claimed scale shape (the count aggregate is the
        // only data-sized pass)
        val e2 =
          if (mult == 1) ev
          else ev.crossJoin(
            spark.range(mult.toLong).select(col("id").as("__rep")))
            .drop("__rep")
        val nd = d.count(); val ne = e.count()
        val nl = li2.count(); val nev = e2.count()
        (1 to 2).foreach { pass =>
          val tPh = timed {
            graft.pipeline.Search
              .phraseSearch(d, "text", "doc_id", Seq("the", "query"))
              .agg(sum(col("n_hits"))).collect()
          }
          val tHn = timed {
            graft.pipeline.Similarity.hardNegatives(
                e, e.where(col("vec_id") < 5),
                "embedding", "vec_id", "vec_id", "vec_id", "embedding",
                "vec_id", k = 5)
              .agg(count(lit(1))).collect()
          }
          val tKc = timed {
            graft.pipeline.Similarity
              .kCenterSample(e, "embedding", "vec_id", dim = 64, k = 5)
              .collect()
          }
          val tIso = timed {
            graft.operators.Isotonic.isotonicEventRates(
              li2.withColumn("y",
                  when(col("l_returnflag") === "R", 1L).otherwise(0L))
                .withColumn("bin",
                  least(floor(col("l_extendedprice") / 10000), lit(10))),
              "bin", "y").collect()
          }
          val tSea = timed {
            graft.operators.Monitoring
              .seasonalAnomalies(e2, "event_type", "ts", 3L, 1L)
              .agg(count(lit(1))).collect()
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d docs=$nd%9d vecs=$ne%8d " +
              f"lineitem=$nl%9d events=$nev%9d phrase=$tPh%6.2f s " +
              f"hardneg=$tHn%6.2f s kcenter=$tKc%6.2f s " +
              f"isotonic=$tIso%6.2f s seasonal=$tSea%6.2f s")
          spark.catalog.clearCache()
        }
      }
    }
    section("session8") {
      // cardinality/profiling/segmentation operators at 1x/16x.
      // Replicas spread over NEW keys (customers, orders, parts,
      // users) so per-key state stays constant while rows scale; the
      // KS probe replicates VALUES unchanged, so its distinct-cents
      // histogram — the only windowed surface — stays fixed while the
      // scan grows 16x (the claimed shape).
      val ordRaw = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderdate",
                "o_orderpriority", "o_totalprice")
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_partkey", "l_extendedprice", "l_returnflag")
      val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
      Seq(1, 16).foreach { mult =>
        def withRep(df: org.apache.spark.sql.DataFrame) =
          if (mult == 1) df.withColumn("__rep", lit(0L))
          else df.crossJoin(
            spark.range(mult.toLong).select(col("id").as("__rep")))
        val o = withRep(ordRaw)
          .withColumn("o_custkey",
                      col("o_custkey") + col("__rep") * 10_000_000L)
          .withColumn("o_orderkey",
                      col("o_orderkey") + col("__rep") * 1_000_000_000L)
          .drop("__rep")
        val li2 = withRep(liRaw)
          .withColumn("l_partkey",
                      col("l_partkey") + col("__rep") * 1_000_000_000L)
          .drop("__rep")
        val e = withRep(evRaw)
          .withColumn("user_id",
                      col("user_id") + col("__rep") * 10_000_000L)
          .withColumn("event_id",
                      col("event_id") + col("__rep") * 1_000_000_000_000L)
          .drop("__rep")
        val no = o.count(); val nl = li2.count(); val nev = e.count()
        (1 to 2).foreach { pass =>
          val tKmv = timed {
            graft.operators.Cardinality
              .kmvDistinct(o, "o_orderpriority", "o_custkey", 64)
              .collect()
          }
          spark.catalog.clearCache()
          val tKs = timed {
            graft.operators.Monitoring.ks2Sample(
                li2.withColumn("cents",
                  round(col("l_extendedprice") * 100).cast("long")),
                "cents", col("l_returnflag") === "R", 100000L)
              .collect()
          }
          spark.catalog.clearCache()
          val tRfm = timed {
            graft.operators.Segmentation
              .rfmSegments(o, "o_custkey", "o_orderdate", "o_totalprice")
              .collect()
          }
          val tSkew = timed {
            graft.operators.QualityChecks
              .skewReport(li2, "l_partkey").collect()
          }
          spark.catalog.clearCache()
          val tJc = timed {
            graft.operators.QualityChecks.joinCardinality(
                li2, "l_partkey",
                li2.where(col("l_returnflag") === "R"), "l_partkey")
              .collect()
          }
          spark.catalog.clearCache()
          val tKg = timed {
            graft.operators.QualityChecks
              .keyGapAudit(o, "o_orderkey", 1000L).collect()
          }
          spark.catalog.clearCache()
          val tEg = timed {
            graft.operators.Temporal
              .eventGapProfile(e, "user_id", "ts", "event_id").collect()
          }
          spark.catalog.clearCache()
          val tBc = timed {
            graft.operators.Funnel
              .behaviorCohorts(e, "user_id", "event_type",
                               Seq("view", "click", "purchase"))
              .collect()
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d orders=$no%9d " +
              f"lineitem=$nl%9d events=$nev%9d kmv=$tKmv%6.2f s " +
              f"ks=$tKs%6.2f s rfm=$tRfm%6.2f s skew=$tSkew%6.2f s " +
              f"joincard=$tJc%6.2f s keygaps=$tKg%6.2f s " +
              f"evgaps=$tEg%6.2f s cohorts=$tBc%6.2f s")
          spark.catalog.clearCache()
        }
      }
    }
    section("round8") {
      // round-8 additions at 1x/16x: split-leakage audit (fingerprint
      // aggregate + bounded fold-pair join — replicated docs are exact
      // copies, so cross-fold leakage GROWS with mult, the harsh
      // shape), vocab OOV coverage (token-volume-bound explode into a
      // |vocab| x |sources| aggregate), and the continuous scorecard
      // monitor (fit + one tagged-union score aggregate; driver solve
      // constant).
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      Seq(1, 16).foreach { mult =>
        def rep(df: org.apache.spark.sql.DataFrame, idCol: String) =
          if (mult == 1) df
          else df.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn(idCol,
              col(idCol) * mult + col("__rep")).drop("__rep")
        val d = rep(docs, "doc_id")
        val li2 =
          if (mult == 1) liRaw
          else liRaw.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn("l_orderkey",
              col("l_orderkey") * mult + col("__rep")).drop("__rep")
        val nd = d.count(); val nl = li2.count()
        (1 to 2).foreach { pass =>
          val tLk = timed {
            graft.pipeline.Curation.splitLeakage(d, "doc_id", "text")
              .agg(sum(col("n_shared_fps"))).collect()
          }
          spark.catalog.clearCache()
          val tVc = timed {
            graft.pipeline.TextAnalysis
              .vocabCoverage(d.withColumn("source",
                               pmod(col("doc_id"), lit(20))),
                             "text", "source", k = 1000)
              .agg(sum(col("n_oov"))).collect()
          }
          spark.catalog.clearCache()
          val tSp = timed {
            graft.pipeline.Dedup
              .repeatedSpanAudit(
                d.withColumn("source", pmod(col("doc_id"), lit(20))),
                "text", "doc_id", "source",
                gramN = 10, minOccurrences = 2L)
              .agg(sum(col("n_tokens_removed"))).collect()
          }
          spark.catalog.clearCache()
          val tCm = timed {
            val sc = graft.operators.Scorecard.fitContinuousTarget(
              li2, Seq("l_quantity"), "l_extendedprice",
              graft.operators.BinningConfig(name = "l_quantity",
                userSplits = Some(Array(10.0, 25.0, 40.0)),
                monotonicTrend = None))
            new graft.operators.ContinuousScorecardMonitoring(
                sc, psiNBins = 10)
              .stabilityStats(
                li2.where(col("l_orderkey") % 2 === 0),
                li2.where(col("l_orderkey") % 2 === 1),
                "l_extendedprice", withPerformance = false)
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d docs=$nd%8d " +
              f"lineitem=$nl%9d leakage=$tLk%6.2f s " +
              f"vocab_cov=$tVc%6.2f s span_dedup=$tSp%6.2f s " +
              f"cont_monitor=$tCm%6.2f s")
          spark.catalog.clearCache()
        }
      }
    }
    section("round9") {
      // round-9 additions at 1x/16x. Replication shapes chosen to be
      // honest per operator: itemNeighbors gets DISJOINT basket copies
      // (remapped orderkeys — pair-aggregate input scales 16x, the
      // candidate pair SET stays the catalog's, supports scale);
      // bpeMerges gets exact doc replicas (the vocabulary is
      // IDENTICAL, so the corpus pass scales with tokens while every
      // merge round iterates the same bounded vocab — the design
      // claim); bandMigration gets remapped customers (16x entities,
      // same matrix shape); vintageCurves remaps orderkeys on BOTH
      // fact sides (join cardinality scales linearly, curve table
      // bounded by calendar).
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val ordRaw = spark.read.parquet(s"$sfDir/orders.parquet")
      Seq(1, 16).foreach { mult =>
        def remap(df: org.apache.spark.sql.DataFrame, idCol: String) =
          if (mult == 1) df
          else df.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn(idCol,
              col(idCol) * mult + col("__rep")).drop("__rep")
        val li2 = remap(liRaw, "l_orderkey")
        val ord2 = remap(ordRaw, "o_orderkey")
        val cust2 = remap(ordRaw, "o_custkey")
        val d = if (mult == 1) docs
                else docs.crossJoin(spark.range(mult.toLong)
                  .select(col("id").as("__rep"))).drop("__rep")
        val nl = li2.count(); val nd = d.count()
        (1 to 2).foreach { pass =>
          val tIn = timed {
            graft.operators.MarketBasket
              .itemNeighbors(li2, "l_orderkey", "l_partkey", k = 3)
              .agg(sum(col("jaccard_ppm"))).collect()
          }
          spark.catalog.clearCache()
          val tBpe = timed {
            graft.pipeline.Tokenizer.bpeMerges(d, "text", rounds = 4)
              .agg(sum(col("freq"))).collect()
          }
          spark.catalog.clearCache()
          val tMig = timed {
            def bands(df: org.apache.spark.sql.DataFrame) = df
              .groupBy("o_custkey")
              .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
                     .as("sp"))
              .select(col("o_custkey"),
                      (col("sp") / 15000000L).cast("long").as("band"))
            val pivot = lit("1998-06-01").cast("timestamp")
            graft.operators.ScorecardAnalytics.bandMigration(
              bands(cust2.where(col("o_orderdate") < pivot)),
              bands(cust2.where(col("o_orderdate") >= pivot)),
              "o_custkey", "band")
              .agg(sum(col("n"))).collect()
          }
          spark.catalog.clearCache()
          val tVin = timed {
            val o = ord2.select(col("o_orderkey"),
              (year(col("o_orderdate")) * 100 +
               month(col("o_orderdate"))).cast("long").as("cohort"),
              (year(col("o_orderdate")) * 12 +
               month(col("o_orderdate"))).as("om"))
            val lf = li2.select(col("l_orderkey"),
              (year(col("l_shipdate")) * 12 +
               month(col("l_shipdate"))).as("sm"),
              when(col("l_returnflag") === "R", 1L).otherwise(0L)
                .as("ev"))
            graft.operators.Temporal.vintageCurves(
              lf.join(o, lf("l_orderkey") === o("o_orderkey"))
                .where(col("sm") >= col("om")),
              col("cohort"), (col("sm") - col("om")).cast("long"),
              col("ev"))
              .agg(sum(col("n_event"))).collect()
          }
          // LPA on genuinely DISJOINT graph copies (both the basket
          // and the item ids remapped per replica IN ONE crossJoin —
          // two remap() calls would multiply twice and mix keys):
          // community count scales 16x, round count stays fixed
          val tLpa = timed {
            val liG =
              if (mult == 1) liRaw
              else liRaw.crossJoin(
                  spark.range(mult.toLong).select(col("id").as("__rep")))
                .withColumn("l_orderkey",
                  col("l_orderkey") * mult + col("__rep"))
                .withColumn("l_partkey",
                  col("l_partkey") * mult + col("__rep"))
                .drop("__rep")
            val edges = graft.operators.MarketBasket
              .coOccurrence(liG, "l_orderkey", "l_partkey")
              .where(col("n") >= 2)
            graft.operators.Graph
              .lpaCommunities(edges, "item_a", "item_b", rounds = 3)
              .agg(sum(col("n_members"))).collect()
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d lineitem=$nl%9d docs=$nd%8d " +
              f"item_neighbors=$tIn%6.2f s bpe=$tBpe%6.2f s " +
              f"migration=$tMig%6.2f s vintage=$tVin%6.2f s " +
              f"lpa=$tLpa%6.2f s")
          spark.catalog.clearCache()
        }
      }
    }
    section("round10") {
      // round-10 additions at 1x/16x: bpeEncode on exact doc replicas
      // (identical vocabulary — the corpus pass scales with tokens,
      // the merge-apply chain rewrites the same bounded vocab) and
      // ExactFit's exact-moment piecewise solve (ONE aggregate over
      // rows; expect near-linear scan-bound scaling, driver solve
      // constant microseconds).
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      Seq(1, 16).foreach { mult =>
        val d = if (mult == 1) docs
                else docs.crossJoin(spark.range(mult.toLong)
                  .select(col("id").as("__rep"))).drop("__rep")
        val li2 = if (mult == 1) liRaw
                  else liRaw.crossJoin(spark.range(mult.toLong)
                    .select(col("id").as("__rep"))).drop("__rep")
        val nd = d.count(); val nl = li2.count()
        (1 to 2).foreach { pass =>
          val tEnc = timed {
            val merges = graft.pipeline.Tokenizer
              .bpeMerges(d, "text", rounds = 4).collect()
              .map(r => (r.getString(1), r.getString(2))).toSeq
            graft.pipeline.Tokenizer.bpeEncode(d, "text", merges)
              .collect()
          }
          spark.catalog.clearCache()
          val tPw = timed {
            graft.core.ExactFit.fit(li2, col("l_quantity"),
              col("l_extendedprice"),
              graft.core.ExactFit.PWSpec(Array(23.5, 47.5), 10L, 100L,
                                         512.0, Some("ascending")))
          }
          spark.catalog.clearCache()
          // q_stability_cont's shape: continuous scorecard on pinned
          // splits, then the fused expected/actual stability aggregate
          val tStab = timed {
            val sc = graft.operators.Scorecard.fitContinuousTarget(
              li2, Seq("l_quantity"), "l_extendedprice",
              graft.operators.BinningConfig(name = "l_quantity",
                userSplits = Some(Array(10.0, 25.0, 40.0)),
                monotonicTrend = None))
            val mon = new graft.operators.ContinuousScorecardMonitoring(
              sc, psiNBins = 10, psiMethod = "uniform")
            mon.stabilityStats(
              li2.where(col("l_orderkey") % 2 === 0),
              li2.where(col("l_orderkey") % 2 === 1),
              "l_extendedprice", withPerformance = false)
          }
          spark.catalog.clearCache()
          // attribution: journeys shuffle by (user, day) key only;
          // replicas remap user ids so the journey COUNT scales 16x
          // while the chain/coalition tables stay model-bounded
          val tAttr = timed {
            val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
            val ev2 = if (mult == 1) ev0
              else ev0.crossJoin(spark.range(mult.toLong)
                .select(col("id").as("__rep")))
                .withColumn("user_id",
                  col("user_id") * mult + col("__rep")).drop("__rep")
            val key = concat(col("user_id").cast("string"), lit("_"),
                             to_date(col("ts")).cast("string"))
            graft.operators.MarkovAttribution.removalAttribution(
              ev2, key, "event_type", "ts", "event_id",
              Seq("click", "error", "signup", "view"), "purchase")
              .collect()
            graft.operators.MarkovAttribution.shapleyAttribution(
              ev2, key, "event_type", "ts", "event_id",
              Seq("click", "error", "signup", "view"), "purchase")
              .collect()
          }
          if (pass == 2)
            println(f"PROBE mult=$mult%2d docs=$nd%8d lineitem=$nl%9d " +
              f"bpe_encode=$tEnc%6.2f s exact_pw=$tPw%6.2f s " +
              f"stability_cont=$tStab%6.2f s attribution=$tAttr%6.2f s")
          spark.catalog.clearCache()
        }
      }
      // SKEWED basket probe: the catalog's baskets plus ONE synthetic
      // 10k-item bot basket. Uncapped, that basket alone fans out
      // C(10k,2) = 50M pairs on a single task; with maxBasketSize=64
      // the guard drops it (logged + reportable) and the plan stays
      // bounded by real basket sizes.
      val skewed = liRaw.select(col("l_orderkey").as("b"),
                                col("l_partkey").as("i"))
        .unionByName(spark.range(10000)
          .select(lit(-1L).as("b"), col("id").as("i")))
      (1 to 2).foreach { pass =>
        val tCap = timed {
          graft.operators.MarketBasket
            .itemNeighbors(skewed, "b", "i", k = 3,
                           maxBasketSize = Some(64))
            .agg(sum(col("jaccard_ppm"))).collect()
        }
        spark.catalog.clearCache()
        val tUncap = timed {
          graft.operators.MarketBasket
            .itemNeighbors(skewed, "b", "i", k = 3)
            .agg(sum(col("jaccard_ppm"))).collect()
        }
        spark.catalog.clearCache()
        if (pass == 2)
          println(f"PROBE skew10k capped=$tCap%6.2f s " +
            f"uncapped=$tUncap%6.2f s")
      }
    }
    section("sf1stream") {
      // sf1-equivalent STREAMING point: the sessionization replay at
      // 1x and 10x event volume (replicas spread over NEW user keys,
      // timestamps kept, so open-session state grows 10x with the
      // data — the honest worst case for keyed state). Reports wall,
      // peak state rows and peak state memory under both providers;
      // both must close the identical session count. 8 state
      // partitions, the q_stream_sessions discipline.
      val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
                col("value"))
      Seq(1, 10).foreach { mult =>
        val ev =
          if (mult == 1) evRaw
          else evRaw.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .withColumn("user_id",
                        col("user_id") + col("__rep") * 10_000_000L)
            .drop("__rep")
        val n = ev.count()
        val Array(mn, mx) = ev
          .agg(min(col("ts").cast("long")), max(col("ts").cast("long")))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        val (b1, b2) = (mn + (mx - mn) / 3, mn + 2 * ((mx - mn) / 3))
        val stage = java.nio.file.Files
          .createTempDirectory("graft_sf1s_stage").toString
        val tsSec = col("ts").cast("long")
        Seq(tsSec < b1, tsSec >= b1 && tsSec < b2, tsSec >= b2)
          .zipWithIndex.foreach { case (p, g) =>
            ev.where(p).repartition(1)
              .write.mode("overwrite").parquet(s"$stage/b$g")
          }
        graft.SparkEntry.stampStageMtimes(stage, 3)
        var closedCounts = List.empty[Long]
        Seq(("hdfs", Option.empty[String]),
            ("rocksdb", Some(graft.streaming.StreamingSessionize
                               .RocksDBProvider))).foreach {
          case (tag, prov) =>
            val ckpt = java.nio.file.Files
              .createTempDirectory(s"graft_sf1s_ckpt_$tag").toString
            val stream = spark.readStream
              .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(stage)
            val sess = graft.streaming.StreamingSessionize.sessions(
              stream, "user_id", "ts", "value",
              gapSeconds = 3600L, watermarkDelay = "600 seconds")
            val oldSp = spark.conf.get("spark.sql.shuffle.partitions")
            def start() = sess.writeStream.outputMode("append")
              .format("memory").queryName(s"sf1s_$tag")
              .option("checkpointLocation", ckpt).start()
            val w0 = System.nanoTime()
            val q = try {
              spark.conf.set("spark.sql.shuffle.partitions", "8")
              prov match {
                case Some(p) => graft.streaming.StreamingSessionize
                  .withStateStoreProvider(spark, p)(start())
                case None => start()
              }
            } finally spark.conf
              .set("spark.sql.shuffle.partitions", oldSp)
            q.processAllAvailable()
            val wall = (System.nanoTime() - w0) / 1e9
            val peakRows = q.recentProgress
              .flatMap(_.stateOperators.map(_.numRowsTotal)).max
            val peakMem = q.recentProgress
              .flatMap(_.stateOperators.map(_.memoryUsedBytes)).max
            q.stop()
            val closed = spark.table(s"sf1s_$tag").count()
            closedCounts ::= closed
            spark.catalog.dropTempView(s"sf1s_$tag")
            graft.SparkEntry.deleteRecursively(ckpt)
            println(f"PROBE sf1-stream mult=$mult%2d provider=$tag%-8s " +
              f"events=$n%8d wall=$wall%6.2f s " +
              f"peak_state_rows=$peakRows " +
              f"peak_state_mem=${peakMem / 1048576.0}%8.1f MiB " +
              f"closed_sessions=$closed")
        }
        assert(closedCounts.distinct.size == 1,
               s"providers diverge at mult=$mult: $closedCounts")
        graft.SparkEntry.deleteRecursively(stage)
      }
    }
    section("round11") {
      // the round-11 ExactFit variants at 1x/16x: weighted monotone
      // QP, weighted+ridge OLS, quadratic spline — each is ONE
      // DECIMAL moment aggregate + a constant driver solve, so wall
      // time must track the scan, not the model
      {
        val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val ordRaw = spark.read.parquet(s"$sfDir/orders.parquet")
        Seq(1, 16).foreach { mult =>
          val li2 = if (mult == 1) liRaw
            else liRaw.crossJoin(spark.range(mult.toLong)
              .select(col("id").as("__rep"))).drop("__rep")
          val n = li2.count()
          val w = when(col("o_orderpriority") === "1-URGENT", 3L)
            .when(col("o_orderpriority") === "2-HIGH", 2L)
            .otherwise(1L)
          val joined = li2.join(
            ordRaw.select(col("o_orderkey"), w.as("w")),
            col("l_orderkey") === col("o_orderkey"))
          (1 to 2).foreach { pass =>
            val tW = timed {
              graft.core.ExactFit.fitWeighted(
                joined, col("l_quantity"), col("l_extendedprice"),
                col("w"),
                graft.core.ExactFit.PWSpec(Array(23.5, 47.5), 10L,
                                           100L, 512.0,
                                           Some("ascending")))
            }
            spark.catalog.clearCache()
            val tQ = timed {
              val x = round(col("l_quantity") * 10).cast("long")
              def sq(c: org.apache.spark.sql.Column) = c * c
              graft.core.ExactFit.fitOLS(
                li2,
                Seq(x, sq(x), sq(greatest(lit(0L), x - 235L)),
                    sq(greatest(lit(0L), x - 475L)))
                  .map(_.cast("double")),
                col("l_extendedprice"),
                graft.core.ExactFit.OLSSpec(
                  Seq(1L, 1L, 1L, 1L), 100L,
                  Seq(256.0, 65536.0, 32768.0, 512.0)))
            }
            if (pass == 2)
              println(f"PROBE round11-exactfit mult=$mult%2d " +
                f"rows=$n%9d weighted_qp=$tW%6.2f s " +
                f"quad_spline=$tQ%6.2f s")
            spark.catalog.clearCache()
          }
        }
      }
      // state-store-resident attribution accumulator (the recovery
      // shape behind Round11OpsSpec's kill+restart test): per-shard
      // transition EXTRACTION runs the batch operator (scales with
      // events — the heavy stage), and the (from, to) counts then
      // accumulate in a streaming agg whose state lives in the store
      // (bounded by states² — what survives driver loss at cluster
      // scale). Both providers must drain identical counts.
      val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
        .where(col("ts").isNotNull && col("event_type").isNotNull &&
               col("user_id").isNotNull)
        .select("event_id", "user_id", "event_type", "ts")
      Seq(1, 16).foreach { mult =>
        val ev2 = if (mult == 1) evRaw
          else evRaw.crossJoin(spark.range(mult.toLong)
            .select(col("id").as("__rep")))
            .withColumn("user_id",
              col("user_id") * mult + col("__rep")).drop("__rep")
        val n = ev2.count()
        val key = concat(col("user_id").cast("string"), lit("_"),
                         to_date(col("ts")).cast("string"))
        val stage = java.nio.file.Files
          .createTempDirectory("graft_r11_stage").toString
        val tExtract = timed {
          (0 until 3).foreach { g =>
            graft.operators.MarkovAttribution.journeyTransitions(
              ev2.where(pmod(col("user_id"), lit(3)) === g), key,
              "event_type", "ts", "event_id", "purchase")
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$stage/b$g")
          }
        }
        graft.SparkEntry.stampStageMtimes(stage, 3)
        var finals = List.empty[Map[(String, String), Long]]
        Seq(("hdfs", Option.empty[String]),
            ("rocksdb", Some(graft.streaming.StreamingSessionize
                               .RocksDBProvider))).foreach {
          case (tag, prov) =>
            val ckpt = java.nio.file.Files
              .createTempDirectory(s"graft_r11_ckpt_$tag").toString
            val acc = scala.collection.mutable
              .Map.empty[(String, String), Long]
            val wall = timed {
              def start() = spark.readStream
                .schema("`from` STRING, `to` STRING, n BIGINT")
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true").parquet(stage)
                .groupBy("from", "to").agg(sum("n").as("total"))
                .writeStream.outputMode("update")
                .foreachBatch { (b: org.apache.spark.sql.DataFrame,
                                 _: Long) =>
                  b.collect().foreach { r =>
                    acc((r.getString(0), r.getString(1))) =
                      r.getLong(2)
                  }
                  ()
                }
                .option("checkpointLocation", ckpt).start()
              val q = prov match {
                case Some(p) => graft.streaming.StreamingSessionize
                  .withStateStoreProvider(spark, p)(start())
                case None => start()
              }
              try q.processAllAvailable() finally q.stop()
            }
            finals ::= acc.toMap
            graft.SparkEntry.deleteRecursively(ckpt)
            println(f"PROBE round11-attrib mult=$mult%2d " +
              f"provider=$tag%-8s events=$n%9d " +
              f"extract=$tExtract%6.2f s stream=$wall%6.2f s " +
              f"transitions=${acc.values.sum}%9d " +
              f"state_keys=${acc.size}%3d")
        }
        assert(finals.distinct.size == 1,
               s"providers diverge at mult=$mult")
        graft.SparkEntry.deleteRecursively(stage)
        spark.catalog.clearCache()
      }
    }
    section("hh1m") {
      // 1M-KEY state probe for the sketch-in-state aggregation shape
      // (q_stream_hh's FreqAgg in complete-mode groupBy state): the
      // events stream replicated 10x with rep-salted group keys gives
      // ONE MILLION distinct state keys, each holding a small
      // Misra-Gries buffer — per-key state-store overhead dominates,
      // which is exactly what the RocksDB provider must absorb at
      // cluster scale (the in-memory HDFS provider holds every
      // (key, buffer) pair on-heap). Both providers must drain the
      // identical group count.
      val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
        .where(col("user_id").isNotNull)
        .select("event_id", "event_type", "user_id")
      val ev = evRaw.crossJoin(
          spark.range(10L).select(col("id").as("__rep")))
        .select(
          (col("event_id") * 10 + col("__rep")).as("event_id"),
          concat(col("event_type"), lit("#"),
                 col("event_id") * 10 + col("__rep")).as("gkey"),
          col("user_id"))
      val n = ev.count()
      val stage = java.nio.file.Files
        .createTempDirectory("graft_hh1m_stage").toString
      (0 until 3).foreach { g =>
        ev.where(pmod(col("event_id"), lit(3)) === g)
          .repartition(1)
          .write.mode("overwrite").parquet(s"$stage/b$g")
      }
      graft.SparkEntry.stampStageMtimes(stage, 3)
      var groupCounts = List.empty[Long]
      Seq(("hdfs", Option.empty[String]),
          ("rocksdb", Some(graft.streaming.StreamingSessionize
                             .RocksDBProvider))).foreach {
        case (tag, prov) =>
          val ckpt = java.nio.file.Files
            .createTempDirectory(s"graft_hh1m_ckpt_$tag").toString
          val stream = spark.readStream
            .schema("event_id BIGINT, gkey STRING, user_id BIGINT")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(stage)
          val oldSp = spark.conf.get("spark.sql.shuffle.partitions")
          def start() = stream.groupBy("gkey")
            .agg(graft.functions.FreqAgg
                   .freqLongs(col("user_id"), 256).as("cand"),
                 count(lit(1)).as("total"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(s"hh1m_$tag")
            .option("checkpointLocation", ckpt).start()
          val w0 = System.nanoTime()
          val q = try {
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            prov match {
              case Some(p) => graft.streaming.StreamingSessionize
                .withStateStoreProvider(spark, p)(start())
              case None => start()
            }
          } finally spark.conf
            .set("spark.sql.shuffle.partitions", oldSp)
          q.processAllAvailable()
          val wall = (System.nanoTime() - w0) / 1e9
          val peakRows = q.recentProgress
            .flatMap(_.stateOperators.map(_.numRowsTotal)).max
          val peakMem = q.recentProgress
            .flatMap(_.stateOperators.map(_.memoryUsedBytes)).max
          q.stop()
          val groups = spark.table(s"hh1m_$tag").count()
          groupCounts ::= groups
          spark.catalog.dropTempView(s"hh1m_$tag")
          graft.SparkEntry.deleteRecursively(ckpt)
          println(f"PROBE hh1m provider=$tag%-8s events=$n%8d " +
            f"wall=$wall%6.2f s peak_state_rows=$peakRows " +
            f"peak_state_mem=${peakMem / 1048576.0}%8.1f MiB " +
            f"groups=$groups")
      }
      assert(groupCounts.distinct.size == 1,
             s"providers diverge: $groupCounts")
      graft.SparkEntry.deleteRecursively(stage)
    }
    section("round12") {
      // (1) incremental near-dup SIGNATURE STORE growth — the
      // q_stream_neardup shape at 16x docs over FIVE ingest batches:
      // each batch is banded once on arrival (cost tracks the batch
      // scan) and appended to the store; candidate generation then
      // runs over the WHOLE accumulated store. The claim under test:
      // the candidate stage is bucket-bounded — its cost tracks the
      // store's row count (one window over the (band, bh) shuffle,
      // star-guarded pairs), never batches^2 and never corpus^2.
      {
        val docsRep = docs.crossJoin(
            spark.range(16L).select(col("id").as("__rep")))
          .select((col("doc_id") * 16 + col("__rep")).as("doc_id"),
                  col("text"))
        val store = java.nio.file.Files
          .createTempDirectory("graft_r12_sigstore").toString
        try {
          var storeRows = 0L
          (0 until 5).foreach { b =>
            val batch = docsRep.where(pmod(col("doc_id"), lit(5)) === b)
            val nb = batch.count()
            val tBand = timed {
              Dedup.withMinhashBands(batch, "text", "doc_id",
                                     numHashes = 32, bands = 8,
                                     shingleLen = 5, portable = true)
                .write.mode("overwrite").parquet(s"$store/batch=$b")
            }
            val acc = spark.read.parquet(store)
              .select("id", "band", "bh")
            storeRows = acc.count()
            var pairs = 0L
            val tCand = timed {
              pairs = Dedup.candidatesFromBanded(acc)
                .agg(count(lit(1))).head.getLong(0)
            }
            println(f"PROBE round12-neardup batch=$b batch_docs=$nb%8d " +
              f"band=$tBand%6.2f s store_rows=$storeRows%9d " +
              f"candidates=$tCand%6.2f s pairs=$pairs%9d")
            spark.catalog.clearCache()
          }
        } finally graft.SparkEntry.deleteRecursively(store)
      }
      // (2) the 2D deployment twins' grid-cell monoid at 1x/16x: the
      // per-batch aggregate folds ANY input volume to <= 16 exact
      // LONG cells (the accumulated state is bounded by the GRID,
      // never the data), so batch cost must track the scan alone.
      {
        val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_extendedprice", "l_quantity", "l_returnflag")
        val xb = when(col("l_extendedprice") < 25000, 0)
          .when(col("l_extendedprice") < 50000, 1)
          .when(col("l_extendedprice") < 75000, 2).otherwise(3)
        val yb = when(col("l_quantity") < 10, 0)
          .when(col("l_quantity") < 25, 1)
          .when(col("l_quantity") < 40, 2).otherwise(3)
        Seq(1, 16).foreach { mult =>
          val df = if (mult == 1) liRaw
            else liRaw.crossJoin(spark.range(mult.toLong)
              .select(col("id").as("__rep"))).drop("__rep")
          val n = df.count()
          (1 to 2).foreach { pass =>
            var cells = 0L
            val tCells = timed {
              cells = df.groupBy(xb.as("xb"), yb.as("yb"))
                .agg(count(lit(1)).as("cn"),
                     sum(when(col("l_returnflag") === "R", 1L)
                           .otherwise(0L)).as("cev"))
                .count()
            }
            if (pass == 2)
              println(f"PROBE round12-grid2d mult=$mult%2d rows=$n%9d " +
                f"cells_agg=$tCells%6.2f s cells=$cells%2d")
            spark.catalog.clearCache()
          }
        }
      }
      // (3) the MDLP deployment twin at 1x/16x: the gate-solved cuts
      // are constants; the entropy/gain re-derivation is ONE
      // scan-bound aggregate to <= 6 bins + bounded-window readouts.
      {
        val cuts = Array(40807.044601, 41192.200023, 42139.474169,
                         43305.350041, 43950.745613)
        val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_extendedprice", "l_discount")
        val bin = cuts.indices.foldRight(lit(cuts.length)
            : org.apache.spark.sql.Column) { (i, acc) =>
          when(col("l_extendedprice") < cuts(i), lit(i)).otherwise(acc)
        }
        Seq(1, 16).foreach { mult =>
          val df = if (mult == 1) liRaw
            else liRaw.crossJoin(spark.range(mult.toLong)
              .select(col("id").as("__rep"))).drop("__rep")
          val n = df.count()
          (1 to 2).foreach { pass =>
            var bins = 0L
            val tAgg = timed {
              bins = df
                .withColumn("y",
                  when(col("l_extendedprice") *
                         (lit(1.0) - col("l_discount")) >= 40000, 1L)
                    .otherwise(0L))
                .groupBy(bin.cast("long").as("bin"))
                .agg(count(lit(1)).as("n"), sum(col("y")).as("event"))
                .count()
            }
            if (pass == 2)
              println(f"PROBE round12-mdlp mult=$mult%2d rows=$n%9d " +
                f"deploy_agg=$tAgg%6.2f s bins=$bins%2d")
            spark.catalog.clearCache()
          }
        }
      }
      // (3b) exact logistic at 1x/16x: the row path pays iters+1
      // scan-bound aggregates; the histogram path pays ONE corpus
      // scan + Newton passes over the ~100-cell table (bit-identical
      // result — Round12OpsSpec). At 100 TB the histogram path is
      // the default whenever x has bounded cardinality.
      {
        val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .where(col("l_quantity").isNotNull)
          .select(round(col("l_quantity")).cast("long").as("x"),
                  when(col("l_returnflag") === "R", 1L).otherwise(0L)
                    .as("y"))
        Seq(1, 16).foreach { mult =>
          val df = if (mult == 1) liRaw
            else liRaw.crossJoin(spark.range(mult.toLong)
              .select(col("id").as("__rep"))).drop("__rep")
          val n = df.count()
          (1 to 2).foreach { pass =>
            var fr: graft.core.ExactLogit.Fit = null
            var fc: graft.core.ExactLogit.Fit = null
            val tRows = timed {
              fr = graft.core.ExactLogit.fit(df, col("x"), col("y"), 3)
            }
            spark.catalog.clearCache()
            val tCells = timed {
              val cells = df.groupBy("x", "y")
                .agg(count(lit(1)).as("c"))
                .persist()
              fc = graft.core.ExactLogit.fitFromCells(
                cells, col("x"), col("y"), col("c"), 3)
              cells.unpersist()
            }
            assert(java.lang.Double.doubleToLongBits(fr.beta0) ==
                   java.lang.Double.doubleToLongBits(fc.beta0) &&
                   java.lang.Double.doubleToLongBits(fr.beta1) ==
                   java.lang.Double.doubleToLongBits(fc.beta1),
                   s"row vs cell fit diverge at mult=$mult")
            if (pass == 2)
              println(f"PROBE round12-logreg mult=$mult%2d rows=$n%9d " +
                f"row_fit=$tRows%6.2f s cell_fit=$tCells%6.2f s " +
                f"beta0=${fr.beta0}%.6f")
            spark.catalog.clearCache()
          }
        }
      }
      // (4) WIDE BinningProcess — 30 numeric variables (the
      // reference's breast-cancer width, binning_process.py:1066) at
      // 1x/16x: the chunked melt (16-var stack chunks unioned into
      // ONE downstream shuffle) and the chunked no-shuffle Pass A
      // must hold at realistic width, with the per-variable interval
      // DP solved on the driver in a .par loop. Cost claim: fit wall
      // time tracks rows x vars scan work, not vars^2.
      {
        val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_extendedprice", "l_quantity", "l_discount",
                  "l_tax", "l_returnflag")
        val vars = (0 until 30).map(i => s"v$i")
        val bases = Seq(col("l_extendedprice"), col("l_quantity") * 1000,
                        col("l_discount") * 400000, col("l_tax") * 800000)
        val wide0 = vars.zipWithIndex.foldLeft(
            liRaw.withColumn("y",
              when(col("l_returnflag") === "R", 1.0).otherwise(0.0))) {
          case (d, (v, i)) =>
            // distinct monotone blends so the 30 fits see 30 genuinely
            // different value distributions over the same scan
            d.withColumn(v, bases(i % 4) * (1.0 + 0.03 * i) +
                            bases((i + 1) % 4) * (0.11 * (i % 7)))
        }
        val wide = wide0.select(("y" +: vars).map(col): _*)
        Seq(1, 16).foreach { mult =>
          val df = if (mult == 1) wide
            else wide.crossJoin(spark.range(mult.toLong)
              .select(col("id").as("__rep"))).drop("__rep")
          val n = df.count()
          (1 to 2).foreach { pass =>
            var fitted = 0
            val tFit = timed {
              fitted = graft.operators.BinningProcess
                .fit(df, vars, "y").fits.size
            }
            if (pass == 2)
              println(f"PROBE round12-wide30 mult=$mult%2d rows=$n%9d " +
                f"vars=${vars.size}%2d fit=$tFit%6.2f s " +
                f"fitted=$fitted%2d")
            spark.catalog.clearCache()
          }
        }
      }
      // (5) WEIGHTED logistic — the weighted Newton chain is still
      // ONE scan-bound moment aggregate per step (the weight is one
      // extra multiply inside the DECIMAL casts), so fit wall time
      // tracks rows. Scale-invariance claim probed EXACTLY: fitting
      // the 16x-replicated rows at weight w is bit-identical to
      // fitting the 1x rows at weight 16w (integer moments are equal
      // as exact decimals, so the Newton chains are the same doubles).
      {
        val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .where(col("l_quantity").isNotNull)
          .join(spark.read.parquet(s"$sfDir/orders.parquet")
            .select(col("o_orderkey"),
              when(col("o_orderpriority") === "1-URGENT", 3L)
                .when(col("o_orderpriority") === "2-HIGH", 2L)
                .otherwise(1L).as("w")),
            col("l_orderkey") === col("o_orderkey"))
          .select(round(col("l_quantity")).cast("long").as("x"),
                  when(col("l_returnflag") === "R", 1L).otherwise(0L)
                    .as("y"),
                  col("w"))
        var f16w: graft.core.ExactLogit.FitK = null
        Seq(1, 16).foreach { mult =>
          val df = if (mult == 1) liRaw
            else liRaw.crossJoin(spark.range(mult.toLong)
              .select(col("id").as("__rep"))).drop("__rep")
          val n = df.count()
          (1 to 2).foreach { pass =>
            var f: graft.core.ExactLogit.FitK = null
            val tFit = timed {
              f = graft.core.ExactLogit.fitMultiWeighted(
                df, Seq(col("x")), col("y"), col("w"), 3)
            }
            if (pass == 2) {
              if (mult == 1) {
                f16w = graft.core.ExactLogit.fitMultiWeighted(
                  df, Seq(col("x")), col("y"), col("w") * 16, 3)
              } else {
                assert(f.beta.zip(f16w.beta).forall { case (a, b) =>
                  java.lang.Double.doubleToLongBits(a) ==
                    java.lang.Double.doubleToLongBits(b) } &&
                  f.n == f16w.n &&
                  f.sumMuQ.compareTo(f16w.sumMuQ) == 0,
                  s"16x-replicated-at-w != 1x-at-16w: $f vs $f16w")
              }
              println(f"PROBE round12-wlogreg mult=$mult%2d rows=$n%9d " +
                f"fit=$tFit%6.2f s beta1=${f.beta(1)}%.8f " +
                f"w_total=${f.n}%11d")
            }
            spark.catalog.clearCache()
          }
        }
      }
    }
    section("json") {
      // q_json_extract at 1x/16x: schema'd from_json over the events
      // props column (the suite's most expensive single query, 7.5 s
      // at sf0.1) — the claim under test is that cost is the raw JSON
      // PARSE, linear in input volume, with nothing super-linear
      // hiding in the aggregate (5 integer aggs over a 5-key groupBy).
      val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
        .select("event_type", "props")
      Seq(1, 16).foreach { mult =>
        val df =
          if (mult == 1) evRaw
          else evRaw.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .drop("__rep")
        val n = df.count()
        (1 to 2).foreach { pass =>
          val tJs = timed {
            df.select(col("event_type"),
                from_json(col("props"),
                          org.apache.spark.sql.types.StructType
                            .fromDDL("k INT")).getField("k").as("k"))
              .where(col("k").isNotNull)
              .groupBy("event_type")
              .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
                   min(col("k")).as("min_k"), max(col("k")).as("max_k"),
                   countDistinct(col("k")).as("nd_k"))
              .collect()
          }
          if (pass == 2)
            println(f"PROBE json mult=$mult%2d events=$n%9d " +
              f"json_extract=$tJs%6.2f s")
        }
      }
    }
    section("fuzzy") {
      // fuzzy-match / entity-resolution chain at 1x/16x. The
      // vocabulary itself must grow (identical replicas would
      // collapse in the distinct() prefix), so each replica gets a
      // one-to-two-char "#rep" suffix: within-rep edit-1 pairs
      // replicate 16x and same-name cross-rep suffixes ("x#3"/"x#4")
      // add one-substitution pairs, so the verified-pair output grows
      // FASTER than the vocabulary — a deliberately harsh shape. The
      // claimed scaling: variant generation linear in total name
      // chars, candidate shuffle 16 bytes/variant (hash-keyed), verify
      // linear in candidate pairs.
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .select(lower(col("c_name")).as("name"),
                col("c_custkey").cast("long").as("id"))
      Seq(1, 16).foreach { mult =>
        val c =
          if (mult == 1) cust
          else cust.crossJoin(
              spark.range(mult.toLong).select(col("id").as("__rep")))
            .select(
              concat(col("name"), lit("#"), col("__rep")).as("name"),
              (col("id") * mult + col("__rep")).as("id"))
        val n = c.count()
        (1 to 2).foreach { pass =>
          val tFz = timed {
            Dedup.editDistance1Pairs(c, "name")
              .agg(count(lit(1))).collect()
          }
          spark.catalog.clearCache()
          val tEr = timed {
            Dedup.entityClusters(c, "id", "name")
              .agg(count(lit(1))).collect()
          }
          spark.catalog.clearCache()
          if (pass == 2)
            println(f"PROBE mult=$mult%2d names=$n%8d " +
              f"fuzzy=$tFz%6.2f s er=$tEr%6.2f s")
        }
      }
    }
    spark.stop()
  }
}
