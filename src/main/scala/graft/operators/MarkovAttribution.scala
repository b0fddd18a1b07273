package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.ExactFit
import graft.core.ExactFit.{All, Cmp, Cst, Def, DefD, Env, Ex, Op, Pick, R}

/** Data-driven multi-touch attribution over user journeys — the two
  * standard model-based attributions marketing/risk teams run next to
  * the positional ones (`q_attribution` covers first/last/linear):
  *
  *  - MARKOV removal-effect attribution: fit a first-order Markov
  *    chain over (start, channels, conversion, null), compute the
  *    chain's start->conversion absorption probability, then each
  *    channel's removal effect = relative drop in that probability
  *    when the channel's node is removed (transitions into it become
  *    losses). Shares normalize the removal effects.
  *  - SHAPLEY attribution: channels are players, a coalition S's
  *    value v(S) = (converted users whose exposure set is contained
  *    in S) / all users; each channel's Shapley value is the exact
  *    weighted sum of its marginal contributions over all 2^(k-1)
  *    coalitions.
  *
  * Scale + parity design (the ExactFit discipline): ONE distributed
  * pass builds exact integer sufficient statistics — the
  * (from, to) transition counts for Markov (a lag window over each
  * user's truncated journey, shuffled by user only), the per-exposure-
  * set (users, conversions) table for Shapley (bounded by 2^k) — and
  * the absorption solve / Shapley weighting is a shared-IR program
  * (Cramer solves, guarded divisions, fixed-order sums) evaluated on
  * the driver AND rendered to oracle SQL, so both engines derive
  * bit-identical doubles from the same exact counts at ANY scale.
  * k (channels) is bounded by the model, never the data; k <= 6.
  */
object MarkovAttribution {

  /** States: start = 0, channels = 1..k (caller order), conv, null.
    * Journey: each user's events ordered by (tsCol, tieCol),
    * truncated at the FIRST conversion event (inclusive); events
    * after it are ignored. Emits the exact BIGINT transition counts
    * (from, to, n) with from in {start, channels}, to in {channels,
    * conv, null}; a non-converting journey closes with
    * (last channel -> null). */
  def journeyTransitions(df: DataFrame,
                         userKey: org.apache.spark.sql.Column,
                         channelCol: String, tsCol: String,
                         tieCol: String, convValue: String): DataFrame = {
    val conv = col(channelCol) === convValue
    // materialize the journey key ONCE: every window clusters on the
    // same attribute, so Catalyst reuses a single journey shuffle for
    // the first-conversion cut AND the lag/lead pass (a computed key
    // inside each windowspec would re-exchange per window)
    val base = df
      .where(userKey.isNotNull && col(channelCol).isNotNull &&
             col(tsCol).isNotNull)
      .withColumn("__jk", userKey)
    val cut = Window.partitionBy(col("__jk"))
    val w = Window.partitionBy(col("__jk"))
      .orderBy(col(tsCol), col(tieCol))
    val jt = base
      .withColumn("__ctie",
        min(when(conv, struct(col(tsCol), col(tieCol)))).over(cut))
      .where(col("__ctie").isNull ||
             struct(col(tsCol), col(tieCol)) <= col("__ctie"))
      .withColumn("__prev", lag(col(channelCol), 1).over(w))
      .withColumn("__next", lead(col(channelCol), 1).over(w))
    // ONE pass emits the step row and, for a non-converting journey's
    // last event, the closing (channel -> null) row — no union (a
    // union would re-derive the whole windowed chain per branch)
    val step = struct(
      when(col("__prev").isNull, lit("start")).otherwise(col("__prev"))
        .as("f"),
      when(conv, lit("conv")).otherwise(col(channelCol)).as("t"))
    val tail = struct(col(channelCol).as("f"), lit("null").as("t"))
    jt.select(explode(
        when(col("__next").isNull && !conv, array(step, tail))
          .otherwise(array(step))).as("__e"))
      .groupBy(col("__e.f").as("from"), col("__e.t").as("to"))
      .agg(count(lit(1)).as("n"))
  }

  /** The IR program over transition-count refs `t_<from>_<to>`
    * (state names with channel INDEXES 1..k; start = s). Defines the
    * base absorption probability `base_conv`, per-channel removal
    * conversions `rm_<c>`, removal effects `eff_<c>` (relative drop)
    * and normalized `share_<c>`. */
  def removalProgram(k: Int): Seq[Def] = {
    require(k >= 1 && k <= 6, "1..6 channels")
    val defs = collection.mutable.ArrayBuffer.empty[Def]
    val trans = 0 to k // 0 = start, 1..k channels
    def tRef(i: Int, j: String): Ex = R(s"t_${i}_$j")
    // row totals (exact integer sums of count refs)
    for (i <- trans) {
      val outs = (1 to k).map(j => tRef(i, j.toString)) ++
        Seq(tRef(i, "conv"), tRef(i, "null"))
      defs += DefD(s"rt_$i", outs.reduceLeft(Op('+', _, _)))
    }
    // guarded transition probabilities (an absent row -> all zero)
    def p(i: Int, j: String): Ex =
      Pick(Seq((Cmp(">=", R(s"rt_$i"), Cst(1.0)): ExactFit.Bx) ->
                 Op('/', tRef(i, j), R(s"rt_$i"))), Cst(0.0))
    // absorption solve on transient set T (subset of 0..k, always
    // containing 0): (I - Q) x = r, x(start) is the conversion prob
    def absorb(name: String, removed: Set[Int]): Unit = {
      val t = trans.filterNot(removed)
      val dim = t.length
      val mat = Vector.tabulate(dim, dim) { (r, c) =>
        val (i, j) = (t(r), t(c))
        val q = if (j == 0) Cst(0.0) else p(i, j.toString)
        if (r == c) Op('-', Cst(1.0), q) else Op('-', Cst(0.0), q)
      }
      val rhs = Vector.tabulate(dim)(r => p(t(r), "conv"))
      defs += DefD(s"${name}_d", ExactFit.det(mat))
      val rep = Vector.tabulate(dim, dim) { (r, c) =>
        if (c == 0) rhs(r) else mat(r)(c)
      }
      defs += DefD(s"${name}_n", ExactFit.det(rep))
      defs += DefD(name,
        Pick(Seq((Cmp(">=", Op('*', R(s"${name}_d"), R(s"${name}_d")),
                      Cst(1e-24)): ExactFit.Bx) ->
                   Op('/', R(s"${name}_n"), R(s"${name}_d"))),
             Cst(0.0)))
    }
    absorb("base_conv", Set.empty)
    for (c <- 1 to k) absorb(s"rm_$c", Set(c))
    for (c <- 1 to k)
      defs += DefD(s"eff_$c",
        Pick(Seq((Cmp(">=", R("base_conv"), Cst(1e-12)): ExactFit.Bx) ->
                   Op('/', Op('-', R("base_conv"), R(s"rm_$c")),
                      R("base_conv"))), Cst(0.0)))
    val effSum = (1 to k).map(c => R(s"eff_$c"): Ex)
      .reduceLeft(Op('+', _, _))
    defs += DefD("eff_sum", effSum)
    for (c <- 1 to k)
      defs += DefD(s"share_$c",
        Pick(Seq((Cmp(">=", Op('*', R("eff_sum"), R("eff_sum")),
                      Cst(1e-24)): ExactFit.Bx) ->
                   Op('/', R(s"eff_$c"), R("eff_sum"))), Cst(0.0)))
    defs.toSeq
  }

  /** Fit + attribute: one row per channel
    * `(channel, base_conv6, effect6, share6)`, deterministic order =
    * the caller's channel order. */
  def removalAttribution(df: DataFrame,
                         userKey: org.apache.spark.sql.Column,
                         channelCol: String, tsCol: String,
                         tieCol: String, channels: Seq[String],
                         convValue: String): DataFrame = {
    val counts = journeyTransitions(df, userKey, channelCol, tsCol,
                                    tieCol, convValue)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    fromTransitionCounts(df.sparkSession, counts, channels)
  }

  /** Solve + attribute from already-aggregated transition counts —
    * the streaming entry point: transition counts over COMPLETE
    * journeys are additive, so a foreachBatch accumulator over
    * journey-disjoint triggers feeds the IDENTICAL solve. */
  def fromTransitionCounts(spark: SparkSession,
                           counts: Map[(String, String), Long],
                           channels: Seq[String]): DataFrame = {
    val k = channels.length
    val idx = channels.zipWithIndex.toMap // channel -> 0-based
    def stateName(s: String): Option[String] = s match {
      case "start" => Some("0")
      case "conv"  => Some("conv")
      case "null"  => Some("null")
      case ch => idx.get(ch).map(i => (i + 1).toString)
    }
    val env = Env(collection.mutable.Map.empty,
                  collection.mutable.Map.empty)
    for (i <- 0 to k; j <- (1 to k).map(_.toString) ++ Seq("conv", "null"))
      env.d(s"t_${i}_$j") = 0.0
    counts.foreach { case ((f, t), n) =>
      for (fi <- stateName(f); tj <- stateName(t)
           if fi != "conv" && fi != "null")
        env.d(s"t_${fi}_$tj") = n.toDouble
    }
    removalProgram(k).foreach {
      case DefD(n, e) => env.d(n) = ExactFit.ev(e, env)
      case d => throw new IllegalStateException(d.toString)
    }
    val rows = channels.zipWithIndex.map { case (ch, i) =>
      Row(ch, sround(env.d("base_conv")), sround(env.d(s"eff_${i + 1}")),
          sround(env.d(s"share_${i + 1}")))
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("base_conv6", DoubleType, nullable = false),
      StructField("effect6", DoubleType, nullable = false),
      StructField("share6", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Spark-side round(x, 6) semantics (BigDecimal HALF_UP — the same
    * rounding the oracle's round(x, 6) applies). */
  private def sround(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  // ------------------------------------------------------------------
  // Shapley attribution
  // ------------------------------------------------------------------

  /** IR program over exposure-set refs `n_<mask>` / `cv_<mask>`
    * (mask = bitmask over channels 0..k-1, journeys counted by their
    * EXACT exposure set): coalition values
    * `v_<mask>` = (converted journeys with set SUBSET OF mask) / all
    * journeys, per-channel Shapley values `phi_<c>` and normalized
    * `share_<c>`. All subset sums are exact integer arithmetic; the
    * factorial weights are fixed doubles rendered exactly. */
  def shapleyProgram(k: Int): Seq[Def] = {
    require(k >= 1 && k <= 6, "1..6 channels")
    val defs = collection.mutable.ArrayBuffer.empty[Def]
    val full = (1 << k) - 1
    val masks = 0 to full
    defs += DefD("n_tot",
      masks.map(m => R(s"n_$m"): Ex).reduceLeft(Op('+', _, _)))
    for (s <- masks) {
      val subs = masks.filter(m => (m & s) == m)
      defs += DefD(s"cc_$s",
        subs.map(m => R(s"cv_$m"): Ex).reduceLeft(Op('+', _, _)))
    }
    for (s <- masks)
      defs += DefD(s"v_$s",
        Pick(Seq((Cmp(">=", R("n_tot"), Cst(1.0)): ExactFit.Bx) ->
                   Op('/', R(s"cc_$s"), R("n_tot"))), Cst(0.0)))
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    for (c <- 0 until k) {
      val terms = masks.filter(s => (s & (1 << c)) == 0).map { s =>
        val w = fact(Integer.bitCount(s)) *
          fact(k - 1 - Integer.bitCount(s)) / fact(k)
        Op('*', Cst(w),
           Op('-', R(s"v_${s | (1 << c)}"), R(s"v_$s"))): Ex
      }
      defs += DefD(s"phi_$c", terms.reduceLeft(Op('+', _, _)))
    }
    defs += DefD("phi_sum",
      (0 until k).map(c => R(s"phi_$c"): Ex).reduceLeft(Op('+', _, _)))
    for (c <- 0 until k)
      defs += DefD(s"shs_$c",
        Pick(Seq((Cmp(">=", Op('*', R("phi_sum"), R("phi_sum")),
                      Cst(1e-24)): ExactFit.Bx) ->
                   Op('/', R(s"phi_$c"), R("phi_sum"))), Cst(0.0)))
    defs.toSeq
  }

  /** Shapley attribution: one row per channel
    * `(channel, v_full6, shapley6, share6)`. ONE distributed pass
    * builds the per-journey exposure bitmask + converted flag, a
    * second bounded aggregate counts journeys per exact set (<= 2^k
    * rows); the weighting is the shared-IR program. */
  def shapleyAttribution(df: DataFrame,
                         userKey: org.apache.spark.sql.Column,
                         channelCol: String, tsCol: String,
                         tieCol: String, channels: Seq[String],
                         convValue: String): DataFrame = {
    val k = channels.length
    require(k >= 1 && k <= 6, "1..6 channels")
    val spark = df.sparkSession
    val conv = col(channelCol) === convValue
    // materialized journey key: the cut window and the per-journey
    // aggregate share ONE journey shuffle (see journeyTransitions)
    val base = df
      .where(userKey.isNotNull && col(channelCol).isNotNull &&
             col(tsCol).isNotNull)
      .withColumn("__jk", userKey)
    val cut = Window.partitionBy(col("__jk"))
    val jt = base
      .withColumn("__ctie",
        min(when(conv, struct(col(tsCol), col(tieCol)))).over(cut))
      .where(col("__ctie").isNull ||
             struct(col(tsCol), col(tieCol)) <= col("__ctie"))
    val maskCol = channels.zipWithIndex.map { case (ch, i) =>
      max(when(col(channelCol) === ch, 1L).otherwise(0L)) *
        lit(1L << i)
    }.reduceLeft(_ + _)
    val perJourney = jt.groupBy(col("__jk").as("__u"))
      .agg(maskCol.as("mask"),
           max(when(conv, 1L).otherwise(0L)).as("cv"))
    val sets = perJourney.groupBy("mask")
      .agg(count(lit(1)).as("n"), sum("cv").as("cvn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val env = Env(collection.mutable.Map.empty,
                  collection.mutable.Map.empty)
    for (m <- 0 until (1 << k)) {
      env.d(s"n_$m") = 0.0; env.d(s"cv_$m") = 0.0
    }
    sets.foreach { case (m, n, cvn) =>
      env.d(s"n_$m") = n.toDouble; env.d(s"cv_$m") = cvn.toDouble
    }
    shapleyProgram(k).foreach {
      case DefD(n, e) => env.d(n) = ExactFit.ev(e, env)
      case d => throw new IllegalStateException(d.toString)
    }
    val full = (1 << k) - 1
    val rows = channels.zipWithIndex.map { case (ch, i) =>
      Row(ch, sround(env.d(s"v_$full")), sround(env.d(s"phi_$i")),
          sround(env.d(s"shs_$i")))
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("v_full6", DoubleType, nullable = false),
      StructField("shapley6", DoubleType, nullable = false),
      StructField("share6", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Oracle CTEs for [[shapleyAttribution]]: journey-truncated
    * per-journey mask CTE, one-row per-set counts, and the layered
    * Shapley program as CTE `sf`. */
  def shapleyOracleCtes(table: String, userSql: String,
                        channelSql: String, tsSql: String,
                        tieSql: String, channels: Seq[String],
                        convValue: String): String = {
    val k = channels.length
    val maskExpr = channels.zipWithIndex.map { case (ch, i) =>
      s"max(CASE WHEN ch = '$ch' THEN 1 ELSE 0 END) * ${1L << i}"
    }.mkString(" + ")
    val cells = (0 until (1 << k)).flatMap { m =>
      Seq(s"sum(CASE WHEN mask = $m THEN 1 ELSE 0 END)::DOUBLE AS n_$m",
          s"sum(CASE WHEN mask = $m THEN cv ELSE 0 END)::DOUBLE" +
            s" AS cv_$m")
    }
    s"""s0 AS (
         SELECT $userSql AS u, $channelSql AS ch, $tsSql AS ts,
                $tieSql AS tie
         FROM $table
         WHERE $userSql IS NOT NULL AND $channelSql IS NOT NULL
           AND $tsSql IS NOT NULL),
       scut AS (
         SELECT *,
                min(CASE WHEN ch = '$convValue'
                         THEN struct_pack(a := ts, b := tie) END)
                  OVER (PARTITION BY u) AS ctie
         FROM s0),
       st AS (
         SELECT u, ch FROM scut
         WHERE ctie IS NULL
            OR struct_pack(a := ts, b := tie) <= ctie),
       sj AS (
         SELECT u, $maskExpr AS mask,
                max(CASE WHEN ch = '$convValue' THEN 1 ELSE 0 END) AS cv
         FROM st GROUP BY u),
       sm AS MATERIALIZED (
         SELECT ${cells.mkString(",\n                ")}
         FROM sj),
       ${ExactFit.layeredCtes(shapleyProgram(k), "sm", "sl", "sf")}"""
  }

  /** Oracle CTEs: journey extraction + one-row transition-count CTE
    * `tm` + the removal program as layered CTE `kf`. The
    * journey SQL mirrors [[journeyTransitions]] exactly (same
    * ordering keys, same first-conversion cut), so the integer counts
    * — and therefore every derived double — are identical. */
  def removalOracleCtes(table: String, userSql: String,
                        channelSql: String, tsSql: String,
                        tieSql: String, channels: Seq[String],
                        convValue: String): String = {
    val k = channels.length
    def chCase(src: String): String =
      channels.zipWithIndex.map { case (c, i) =>
        s"WHEN $src = '$c' THEN '${i + 1}'"
      }.mkString("CASE ", " ", " ELSE NULL END")
    val transSql =
      s"""j0 AS (
           SELECT $userSql AS u, $channelSql AS ch, $tsSql AS ts,
                  $tieSql AS tie
           FROM $table
           WHERE $userSql IS NOT NULL AND $channelSql IS NOT NULL
             AND $tsSql IS NOT NULL),
         jcut AS (
           SELECT *,
                  min(CASE WHEN ch = '$convValue' THEN ts END)
                    OVER (PARTITION BY u) AS cts,
                  min(CASE WHEN ch = '$convValue'
                           THEN struct_pack(a := ts, b := tie) END)
                    OVER (PARTITION BY u) AS ctie
           FROM j0),
         jt AS (
           SELECT u, ch, ts, tie FROM jcut
           WHERE cts IS NULL
              OR struct_pack(a := ts, b := tie) <= ctie),
         js AS (
           SELECT u, ch,
                  lag(ch) OVER w AS prev,
                  lead(ch) OVER w AS nxt
           FROM jt WINDOW w AS (PARTITION BY u ORDER BY ts, tie)),
         tr AS (
           SELECT CASE WHEN prev IS NULL THEN '0'
                       ELSE ${chCase("prev")} END AS f,
                  CASE WHEN ch = '$convValue' THEN 'conv'
                       ELSE ${chCase("ch")} END AS t
           FROM js
           UNION ALL
           SELECT ${chCase("ch")} AS f, 'null' AS t
           FROM js WHERE nxt IS NULL AND ch <> '$convValue')"""
    val cells = for (i <- 0 to k;
                     j <- (1 to k).map(_.toString) ++ Seq("conv", "null"))
      yield s"sum(CASE WHEN f = '$i' AND t = '$j' THEN 1 ELSE 0 END)" +
            s"::DOUBLE AS t_${i}_$j"
    s"""$transSql,
       tm AS MATERIALIZED (
         SELECT ${cells.mkString(",\n                ")}
         FROM tr),
       ${ExactFit.layeredCtes(removalProgram(k), "tm", "mk", "kf")}"""
  }
}
