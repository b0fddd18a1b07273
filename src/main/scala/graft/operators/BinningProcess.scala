package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

import scala.collection.parallel.CollectionConverters._

import graft.core.Prebinning

/** Multi-variable binning process
  * (`optbinning/binning/binning_process.py:438`), Spark-native
  * two-pass data plane per SURVEY §3.2:
  *
  *  - Pass A (class totals + range/ndv) is ALWAYS the no-shuffle
  *    global conditional aggregate over the UN-melted table — one
  *    partial row per partition — chunked into <= ~256-expression
  *    aggregates that run as CONCURRENT driver actions, so each
  *    generated method stays under HotSpot's JIT ceiling at any batch
  *    width and each chunk's scan prunes to its own columns.
  *  - Pass B (value histograms) melts all variables to long format via
  *    [[chunkedMelt]] (a union of small stack() generators, same JIT
  *    reasoning) and aggregates in ONE shuffle (`groupBy(variable,
  *    value)` with map-side partial aggregation, so shuffle volume is
  *    bounded by n_vars x histogram buckets per partition, not by row
  *    count); high-cardinality variables are collapsed onto
  *    per-variable uniform grids first, and all-pinned batches skip
  *    Pass A entirely (`fitPinnedBatch`).
  *
  * The per-variable solve loop runs on the driver over the collected
  * aggregates in parallel (replaces the reference's joblib threading).
  */
object BinningProcess {

  /** Per-metric selection rule (`selection_criteria` entry,
    * `binning_process.py:160-200`): min/max bounds plus an optional
    * top-k pick — `top` an integer count, or a (0,1) fraction of the
    * still-eligible variables (`binning_process.py:378-384`). */
  final case class MetricCriteria(
      min: Option[Double] = None, max: Option[Double] = None,
      strategy: Option[String] = None, // "highest" | "lowest"
      top: Option[Double] = None)

  final case class Selection(
      minIv: Option[Double] = None, maxIv: Option[Double] = None,
      minJs: Option[Double] = None, maxJs: Option[Double] = None,
      minGini: Option[Double] = None,
      minQuality: Option[Double] = None,
      strategy: Option[String] = None, // "highest" | "lowest"
      topK: Option[Int] = None,
      /** Reference-shaped criteria: metric ("iv"|"js"|"gini"|"quality")
        * -> rule, applied in metric order after the flat bounds above. */
      criteria: Map[String, MetricCriteria] = Map.empty,
      /** Always-selected variables (`fixed_variables`,
        * `binning_process.py:392-395`). */
      fixedVariables: Seq[String] = Seq.empty)

  def fit(df: DataFrame, variables: Seq[String], yCol: String,
          targetType: String = "binary",
          config: BinningConfig = BinningConfig(),
          varOverrides: Map[String, BinningConfig] = Map.empty,
          selection: Selection = Selection(),
          weightCol: Option[String] = None,
          maxGridBuckets: Int = 10000,
          /** Force these variables into the categorical batch regardless
            * of column type (`categorical_variables`,
            * `binning_process.py:559`; values are cast to string). */
          categoricalVariables: Seq[String] = Seq.empty)
      : FittedBinningProcess = {
    val schema = df.schema
    val forced = categoricalVariables.toSet
    val (catVars, numVars) = variables.partition { v =>
      forced(v) || schema(v).dataType == StringType
    }
    require((catVars ++ numVars).size == variables.size)

    val y = col(yCol).cast(DoubleType)
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))

    val numFits: Map[String, FittedOptimalBinning] =
      if (numVars.isEmpty) Map.empty
      else fitNumericBatch(df, numVars, y, w, targetType, config,
                           varOverrides, maxGridBuckets)

    val catFits: Map[String, FittedOptimalBinning] =
      if (catVars.isEmpty) Map.empty
      else fitCategoricalBatch(df, catVars, y, w, config, varOverrides)

    val all = numFits ++ catFits
    new FittedBinningProcess(variables.toArray, all, selection)
  }

  private def cfgFor(v: String, config: BinningConfig,
                     overrides: Map[String, BinningConfig],
                     dtype: String): BinningConfig =
    overrides.getOrElse(v, config).copy(name = v, dtype = dtype)

  /** Continuous-target process: same melted single-shuffle shape with the
    * continuous per-bucket stats; returns per-variable continuous fits. */
  /** UNION of <= `chunkSize`-variable stack() generators over
    * pre-projected per-variable value/class columns — the one melt
    * shape every batch path uses. One monolithic stack over hundreds
    * of columns compiles the stage into a single generated method that
    * crosses HotSpot's 8 KB JIT ceiling and runs INTERPRETED (measured
    * 4-5x slower at 40 vars, superlinear in width); chunked stages
    * each stay small (compiled), each chunk's parquet scan prunes to
    * its own columns, and the union feeds ONE downstream aggregate.
    * Per-var value/cls expressions sit in the chunk's projection, so
    * per-row work is O(1) per (row, var) — no when(var === v) chains.
    */
  private[graft] def chunkedMelt(df: DataFrame, vars: Seq[String],
                          y: Column,
                          w: Column, valExpr: String => Column,
                          clsExpr: String => Column,
                          chunkSize: Int = 16): DataFrame = {
    // a bare Nil would surface as an opaque empty.reduceLeft from the
    // final union — fail with the actual contract instead (public
    // entry points guard with an early Map.empty; this catches new
    // callers)
    require(vars.nonEmpty, "chunkedMelt requires at least one variable")
    vars.zipWithIndex.grouped(chunkSize).map { chunk =>
      val repCols = chunk.flatMap { case (v, i) =>
        Seq(valExpr(v).as(s"__x$i"), clsExpr(v).as(s"__c$i"))
      }
      val stackExpr = s"stack(${chunk.length}, " +
        chunk.map { case (v, i) => s"'$v', __x$i, __c$i" }
          .mkString(", ") + ") as (var, x, cls)"
      df.withColumn("__y", y).withColumn("__w", w)
        .select(col("__y").as("y") +: col("__w").as("w") +: repCols: _*)
        .selectExpr("y", "w", stackExpr)
    }.reduce(_ unionByName _)
  }

  def fitContinuous(df: DataFrame, variables: Seq[String], yCol: String,
                    config: BinningConfig = BinningConfig(),
                    varOverrides: Map[String, BinningConfig] = Map.empty,
                    weightCol: Option[String] = None)
      : Map[String, FittedContinuousBinning] = {
    if (variables.isEmpty) return Map.empty
    val y = col(yCol).cast(DoubleType)
    val w = weightCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))
    // class column follows each variable's OVERRIDE config (same
    // invariant as the binary batch path): a per-var specialCodes
    // override must class its own rows, or special rows pollute the
    // value histogram the override's solve expects to be clean
    def clsOf(v: String): Column =
      Preprocess.rowClass(col(v).cast(DoubleType), isNumeric = true,
        cfgFor(v, config, varOverrides, "numerical").specialCodes)
    val base = chunkedMelt(df, variables, y, w,
        v => col(v).cast(DoubleType), clsOf)
      .select(col("var"), col("x"), col("y"), col("w"), col("cls"))
    val aggExprs = Seq(
      count(lit(1)).as("n"), sum(col("w")).as("wt"),
      sum(col("w") * col("y")).as("wy"),
      sum(col("w") * col("y") * col("y")).as("wy2"),
      min(col("w") * col("y")).as("ymin"),
      max(col("w") * col("y")).as("ymax"),
      sum(when(col("w") * col("y") === 0.0, 1L).otherwise(0L)).as("zeros"),
      stddev_pop(col("w") * col("y")).as("ystd"))

    val statsRows = base.groupBy("var", "cls")
      .agg(aggExprs.head, aggExprs.tail :+
        approx_count_distinct(col("x")).as("ndv") :+
        min(col("x")).as("minx") :+ max(col("x")).as("maxx"): _*)
      .collect()
    val totalsByVar = statsRows.groupBy(_.getString(0)).map {
      case (v, rs) =>
        v -> rs.map { r =>
          r.getInt(1) -> ContClassTotals(r.getDouble(3), r.getDouble(4),
            Option(r.get(9)).map(_.asInstanceOf[Double]).getOrElse(0.0),
            r.getDouble(6), r.getDouble(7), r.getLong(8).toDouble)
        }.toMap
    }
    // NOTE column positions: groupBy(var, cls) -> 0 var, 1 cls, 2 n,
    // 3 wt, 4 wy, 5 wy2, 6 ymin, 7 ymax, 8 zeros, 9 ystd, 10 ndv,
    // 11 minx, 12 maxx

    // per-var uniform grid for high-cardinality variables — the same
    // Histograms.gridCompress semantics (and threshold) the single-var
    // continuous path applies, so the per-var (var, x) histogram and
    // the driver collect stay <= histogramMaxBuckets rows per variable
    // at ANY cardinality instead of collecting every raw double
    val gridInfo: Map[String, (Double, Double, Int)] =
      statsRows.filter(_.getInt(1) == Preprocess.CleanClass)
        .flatMap { r =>
          val v = r.getString(0)
          val cap = cfgFor(v, config, varOverrides, "numerical")
            .histogramMaxBuckets
          if (r.getLong(10) > cap && !r.isNullAt(11))
            Some(v -> ((r.getDouble(11), r.getDouble(12), cap)))
          else None
        }.toMap
    def repOf(v: String): Column = {
      val x = col(v).cast(DoubleType)
      gridInfo.get(v) match {
        case Some((mn, mx, cap)) =>
          val width = (mx - mn) / cap
          if (width <= 0 || !java.lang.Double.isFinite(width)) x
          else lit(mn) + floor((x - mn) / width) * lit(width)
        case None => x
      }
    }
    val histMelt =
      if (gridInfo.isEmpty) base
      else chunkedMelt(df, variables, y, w, repOf, clsOf)
    val histRows = histMelt.where(col("cls") === Preprocess.CleanClass)
      .groupBy("var", "x")
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()
    val histByVar = histRows.groupBy(_.getString(0)).map { case (v, rs) =>
      v -> rs.map { r =>
        ContBucket(r.getDouble(1), r.getLong(2), r.getDouble(3),
                   r.getDouble(4), r.getDouble(5), r.getDouble(6),
                   r.getDouble(7), r.getLong(8))
      }.sortBy(_.value)
    }
    variables.par.map { v =>
      val totals = totalsByVar.getOrElse(v, Map.empty)
      val nW = totals.values.map(_.n).sum
      v -> ContinuousOptimalBinning.fitFromHistogram(
        histByVar.getOrElse(v, Array.empty), totals, nW,
        cfgFor(v, config, varOverrides, "numerical"),
        categories = null, catOthers = null)
    }.toList.toMap
  }

  private def fitNumericBatch(df: DataFrame, vars: Seq[String], y: Column,
                              w: Column, targetType: String,
                              config: BinningConfig,
                              overrides: Map[String, BinningConfig],
                              maxGridBuckets: Int)
      : Map[String, FittedOptimalBinning] = {
    require(targetType == "binary",
            "continuous targets: use BinningProcess.fitContinuous")
    // per-variable configs may override specialCodes; the class column
    // and the class-space sizes must follow the OVERRIDE config per var
    // (fitFromHistogram interprets class indices by cfgFor(v))
    val cfgs: Map[String, BinningConfig] =
      vars.map(v => v -> cfgFor(v, config, overrides, "numerical")).toMap
    def nClassesOf(v: String): Int =
      Preprocess.missingClassIndex(cfgs(v).specialCodes) + 1

    // every melt below is a chunkedMelt (see scaladoc there) with the
    // per-var OVERRIDE specialCodes driving each variable's class column
    def meltedOf(valExpr: String => Column): DataFrame =
      chunkedMelt(df, vars, y, w, valExpr,
        v => Preprocess.rowClass(col(v).cast(DoubleType),
                                 isNumeric = true, cfgs(v).specialCodes))
    // variables with pinned user splits need no value histogram at all:
    // snap each row to an in-bin representative (exact split comparisons,
    // same rep convention as `Histograms.exactPrebinBuckets`), so the
    // histogram holds <= splits+1 exact per-bin rows at ANY cardinality —
    // no grid quantization drift across the pinned boundaries
    val pinnedSplits: Map[String, Array[Double]] = vars.flatMap { v =>
      cfgFor(v, config, overrides, "numerical").userSplits
        .map(ss => v -> ss.sorted)
    }.toMap

    // When EVERY variable is pinned, the stats pass is redundant: the
    // rep-level aggregate already carries the per-(var, cls) totals as
    // its margins, and min/max/ndv (only used to build compression
    // grids) are never needed. ONE scan + one bounded shuffle replaces
    // the two of the general path — on a scorecard refit over pinned
    // splits this halves the data passes at any scale.
    // each variable's in-bin representative is baked into its own melt
    // column (a when(var === v) rep-chain over melted rows would be
    // O(rows x vars^2) — see chunkedMelt)
    if (vars.nonEmpty && vars.forall(v =>
          pinnedSplits.get(v).exists(_.nonEmpty)))
      return fitPinnedBatch(
        meltedOf { v =>
          val x = col(v).cast(DoubleType)
          val ss = pinnedSplits(v)
          ss.indices.foldRight(lit(ss.last): Column) { (i, e) =>
            when(x < ss(i),
                 lit(if (i == 0) ss(0) - 1.0 else ss(i - 1))).otherwise(e)
          }
        }, vars, config, overrides)

    // Pass A: per-(var, cls) totals + clean range/ndv. The class space is
    // config-bounded (clean + special groups + missing), so instead of
    // melting vars x rows through a groupBy shuffle, emit one conditional
    // aggregate per (var, class, metric) over the UN-melted table: one
    // data pass, no vars-fold row explosion, and a no-shuffle global
    // aggregate (partial rows are a single row per partition) at any
    // scale. Wide batches are the exception: past ~a thousand aggregate
    // expressions a single generated aggregate risks Janino
    // constant-pool exhaustion and interpreted-mode fallback, so above
    // the cap Pass A reverts to the melted groupBy(var, cls) shape —
    // one shuffle whose volume is bounded by partitions x vars x
    // classes, regardless of batch width.
    val dbg = sys.env.contains("GRAFT_DEBUG_TIMING")
    var tMark = System.nanoTime()
    def mark(tag: String): Unit = if (dbg) {
      val now = System.nanoTime()
      println(f"BPTIME $tag ${(now - tMark) / 1e9}%.3f s")
      tMark = now
    }
    // Pass A is ALWAYS the un-melted no-shuffle conditional aggregate,
    // chunked so each generated aggregate stays a JIT-compilable
    // method: past ~256 aggregate expressions the monolithic codegen
    // method crosses HotSpot's 8 KB ceiling and the whole stage runs
    // interpreted (measured slower than a melted shuffle well before
    // the old 1024-expression Janino cap). Chunks run as CONCURRENT
    // driver actions — each is a single-stage scan whose parquet read
    // prunes to its own variables, so wide batches cost the same bytes
    // as one scan, split across simultaneously-running jobs.
    val passAChunks: Seq[Seq[(String, Int)]] = {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(String, Int)]]
      var width = 0
      vars.zipWithIndex.foreach { case (v, i) =>
        val w = 4 * nClassesOf(v) + 3
        if (buf.isEmpty || width + w > 256) {
          buf += scala.collection.mutable.ArrayBuffer((v, i)); width = w
        } else { buf.last += ((v, i)); width += w }
      }
      buf.map(_.toSeq).toSeq
    }

    val (totalsByVar, gridInfo):
        (Map[String, Map[Int, ClassTotals]], Map[String, (Double, Double)]) = {
      val wide = df.withColumn("__y", y).withColumn("__w", w)
      val groupRows: Seq[(Seq[(String, Int)], Row)] =
        passAChunks.par.map { group =>
          val aggCols: Seq[Column] = group.flatMap { case (v, i) =>
            val x = col(v).cast(DoubleType)
            val cls = Preprocess.rowClass(x, isNumeric = true,
                                          cfgs(v).specialCodes)
            val perClass = (0 until nClassesOf(v)).flatMap { c =>
              Seq(sum(when(cls === c && col("__y") === 0.0, col("__w"))
                    .otherwise(0.0)).as(s"w0_${i}_$c"),
                  sum(when(cls === c && col("__y") =!= 0.0, col("__w"))
                    .otherwise(0.0)).as(s"w1_${i}_$c"),
                  count(when(cls === c, lit(1))).as(s"n_${i}_$c"),
                  sum(when(cls === c, col("__w")).otherwise(0.0))
                    .as(s"wt_${i}_$c"))
            }
            val cleanX = when(cls === Preprocess.CleanClass, x)
            perClass ++ Seq(min(cleanX).as(s"minx_$i"),
                            max(cleanX).as(s"maxx_$i"),
                            approx_count_distinct(cleanX).as(s"ndv_$i"))
          }
          group -> wide.agg(aggCols.head, aggCols.tail: _*).collect()(0)
        }.toList

      val totals: Map[String, Map[Int, ClassTotals]] =
        groupRows.flatMap { case (group, statsRow) =>
          group.map { case (v, i) =>
            v -> (0 until nClassesOf(v)).flatMap { c =>
              val n = statsRow.getAs[Long](s"n_${i}_$c")
              if (n == 0L) None
              else Some(c -> ClassTotals(
                statsRow.getAs[Double](s"w0_${i}_$c"),
                statsRow.getAs[Double](s"w1_${i}_$c"),
                n,
                statsRow.getAs[Double](s"wt_${i}_$c")))
            }.toMap
          }
        }.toMap

      // per-var uniform grid constants for high-cardinality compression
      val grid: Map[String, (Double, Double)] =
        groupRows.flatMap { case (group, statsRow) =>
          group.flatMap { case (v, i) =>
            if (statsRow.getAs[Long](s"ndv_$i") > maxGridBuckets &&
                !pinnedSplits.contains(v) &&
                !statsRow.isNullAt(statsRow.fieldIndex(s"minx_$i")))
              Some(v -> (statsRow.getAs[Double](s"minx_$i"),
                         statsRow.getAs[Double](s"maxx_$i")))
            else None
          }
        }.toMap
      (totals, grid)
    }

    mark("passA")
    // Pass B input: the chunked melt with each variable's grid /
    // pinned-split representative baked into its own projected column
    // (no when(var === v) chains — see meltedOf).
    def repOf(v: String): Column = {
      val x = col(v).cast(DoubleType)
      gridInfo.get(v) match {
        case Some((mn, mx)) =>
          val width = (mx - mn) / maxGridBuckets
          if (width <= 0) x
          else lit(mn) + floor((x - mn) / width) * lit(width)
        case None => pinnedSplits.get(v) match {
          case Some(ss) if ss.nonEmpty =>
            ss.indices.foldRight(lit(ss.last): Column) { (i, e) =>
              when(x < ss(i),
                   lit(if (i == 0) ss(0) - 1.0 else ss(i - 1)))
                .otherwise(e)
            }
          case _ => x
        }
      }
    }

    // Pass B: the histogram shuffle for every variable at once
    val histRows = meltedOf(repOf)
      .where(col("cls") === Preprocess.CleanClass)
      .groupBy("var", "x")
      .agg(count(lit(1)).as("n"),
           sum(when(col("y") === 0.0, col("w")).otherwise(0.0)).as("w0"),
           sum(when(col("y") =!= 0.0, col("w")).otherwise(0.0)).as("w1"))
      .collect()
    mark("passB")

    val histByVar = histRows.groupBy(_.getString(0)).map { case (v, rs) =>
      v -> rs.map { r =>
        Prebinning.HistBucket(r.getDouble(1), r.getLong(2), r.getDouble(3),
                              r.getDouble(4))
      }.sortBy(_.value)
    }

    // driver-side parallel solve per variable
    val solved = vars.par.map { v =>
      val totals = totalsByVar.getOrElse(v, Map.empty)
      val nSamplesWeighted = totals.values.map(_.w).sum
      val fitted = OptimalBinning.fitFromHistogram(
        histByVar.getOrElse(v, Array.empty), totals, nSamplesWeighted,
        cfgFor(v, config, overrides, "numerical"),
        categories = null, catOthers = null)
      v -> fitted
    }.toList.toMap
    mark("solve")
    solved
  }

  /** All-pinned fast path: one `groupBy(var, cls, rep)` aggregate feeds
    * BOTH the per-(var, cls) totals (margins over rep) and the exact
    * per-prebin histogram (clean rows keyed by the in-bin
    * representative). Non-clean rows collapse to a null rep so the
    * shuffle key space stays `vars x (splits + row classes)` — bounded
    * by config, not data. */
  private def fitPinnedBatch(repMelted: DataFrame, vars: Seq[String],
                             config: BinningConfig,
                             overrides: Map[String, BinningConfig])
      : Map[String, FittedOptimalBinning] = {
    // the melt's x column already carries each variable's in-bin
    // representative (baked in per var by the caller); non-clean rows
    // collapse to a null rep so the shuffle key space stays
    // vars x (splits + row classes)
    val rep = when(col("cls") === Preprocess.CleanClass, col("x"))
      .otherwise(lit(null).cast(DoubleType))

    // 0 var, 1 cls, 2 rep, 3 w0, 4 w1, 5 n, 6 wt
    val rows = repMelted
      .select(col("var"), col("cls"), rep.as("rep"), col("y"), col("w"))
      .groupBy("var", "cls", "rep")
      .agg(sum(when(col("y") === 0.0, col("w")).otherwise(0.0)).as("w0"),
           sum(when(col("y") =!= 0.0, col("w")).otherwise(0.0)).as("w1"),
           count(lit(1)).as("n"),
           sum(col("w")).as("wt"))
      .collect()

    val byVar = rows.groupBy(_.getString(0))
    vars.par.map { v =>
      val rs = byVar.getOrElse(v, Array.empty)
      val totals: Map[Int, ClassTotals] =
        rs.groupBy(_.getInt(1)).map { case (c, cr) =>
          c -> ClassTotals(cr.map(_.getDouble(3)).sum,
                           cr.map(_.getDouble(4)).sum,
                           cr.map(_.getLong(5)).sum,
                           cr.map(_.getDouble(6)).sum)
        }
      val hist = rs.filter(r => r.getInt(1) == Preprocess.CleanClass)
        .map(r => Prebinning.HistBucket(r.getDouble(2), r.getLong(5),
                                        r.getDouble(3), r.getDouble(4)))
        .sortBy(_.value)
      val nSamplesWeighted = totals.values.map(_.w).sum
      v -> OptimalBinning.fitFromHistogram(
        hist, totals, nSamplesWeighted,
        cfgFor(v, config, overrides, "numerical"),
        categories = null, catOthers = null)
    }.toList.toMap
  }

  private def fitCategoricalBatch(df: DataFrame, vars: Seq[String],
                                  y: Column, w: Column,
                                  config: BinningConfig,
                                  overrides: Map[String, BinningConfig])
      : Map[String, FittedOptimalBinning] = {
    // class column per variable's override config, as in the numeric
    // and continuous batch paths
    val base = chunkedMelt(df, vars, y, w,
        v => col(v).cast(StringType),
        v => Preprocess.rowClass(col(v).cast(StringType),
          isNumeric = false,
          cfgFor(v, config, overrides, "categorical").specialCodes))
      .select(col("var"), col("x"), col("y"), col("w"), col("cls"))
    val agg = base
      .groupBy("var", "cls", "x")
      .agg(count(lit(1)).as("n"),
           sum(when(col("y") === 0.0, col("w")).otherwise(0.0)).as("w0"),
           sum(when(col("y") =!= 0.0, col("w")).otherwise(0.0)).as("w1"),
           sum(col("w")).as("wt"))

    // bounded driver collect (mirrors the single-variable categorical
    // path): beyond the per-variable histogram budget, keep the top-K
    // categories by weight and pool each variable's long tail into its
    // others bin — the collect stays O(vars * cap) at any cardinality
    val cap = config.histogramMaxBuckets
    val probe = agg.limit(vars.length * cap + 1).collect()
    val (rows, tails) =
      if (probe.length <= vars.length * cap)
        (probe, Map.empty[String, OptimalBinning.CatCountRow])
      else {
        val nonClean =
          agg.where(col("cls") =!= Preprocess.CleanClass).collect()
        val wnd = org.apache.spark.sql.expressions.Window
          // category tie-break keeps the top-K selection deterministic
          // when weights tie (re-runs must fit identical bins)
          .partitionBy("var").orderBy(desc("wt"), col("x"))
        val top = agg.where(col("cls") === Preprocess.CleanClass)
          .withColumn("__rn", row_number().over(wnd))
          .where(col("__rn") <= cap).drop("__rn").collect()
        val topByVar = top.groupBy(_.getString(0))
        val tailMap = base.where(col("cls") === Preprocess.CleanClass)
          .groupBy("var")
          .agg(count(lit(1)).as("n"),
               sum(when(col("y") === 0.0, col("w")).otherwise(0.0))
                 .as("w0"),
               sum(when(col("y") =!= 0.0, col("w")).otherwise(0.0))
                 .as("w1"))
          .collect().flatMap { t =>
            val v = t.getString(0)
            val kept = topByVar.getOrElse(v, Array.empty)
            val tailN = t.getLong(1) - kept.map(_.getLong(3)).sum
            if (tailN <= 0) None
            else Some(v -> OptimalBinning.CatCountRow(
              Preprocess.CleanClass, "", tailN,
              t.getDouble(2) - kept.map(_.getDouble(4)).sum,
              t.getDouble(3) - kept.map(_.getDouble(5)).sum))
          }.toMap
        (top ++ nonClean, tailMap)
      }

    val byVar = rows.groupBy(_.getString(0))
    vars.par.map { v =>
      val catRows = byVar.getOrElse(v, Array.empty).map { r =>
        OptimalBinning.CatCountRow(r.getInt(1),
                                   Option(r.getString(2)).getOrElse(""),
                                   r.getLong(3), r.getDouble(4),
                                   r.getDouble(5))
      }
      v -> OptimalBinning.fitCategoricalFromCounts(
        catRows, cfgFor(v, config, overrides, "categorical"),
        tailOthers = tails.get(v))
    }.toList.toMap
  }
}

/** Fitted multi-variable process: per-variable models, selection support,
  * wide transform (one generated CASE column per selected variable — a
  * single stage, no shuffle). */
final class FittedBinningProcess(
    val variables: Array[String],
    val fits: Map[String, FittedOptimalBinning],
    val selection: BinningProcess.Selection) extends Serializable {

  /** Per-variable summary metrics (`binning_process.py:397-435`). */
  lazy val summary: Seq[(String, String, String, Double, Double, Double,
                         Int)] =
    variables.toSeq.map { v =>
      val f = fits(v)
      (v, f.config.dtype, f.status, f.table.iv, f.table.js, f.table.gini,
       f.nDataBins)
    }

  /** Selection support mask (`_support_selection_criteria`
    * `binning_process.py:350-395`). */
  lazy val support: Map[String, Boolean] = {
    val s = selection
    val base = variables.map { v =>
      val f = fits(v)
      var ok = true
      s.minIv.foreach(b => ok &&= f.table.iv >= b)
      s.maxIv.foreach(b => ok &&= f.table.iv <= b)
      s.minJs.foreach(b => ok &&= f.table.js >= b)
      s.maxJs.foreach(b => ok &&= f.table.js <= b)
      s.minGini.foreach(b => ok &&= f.table.gini >= b)
      v -> ok
    }.toMap
    var mask = (s.strategy, s.topK) match {
      case (Some(strategy), Some(k)) =>
        val eligible = variables.filter(base)
        val ranked = eligible.sortBy(v =>
          (if (strategy == "highest") -1 else 1) * fits(v).table.iv)
        val keep = ranked.take(k).toSet
        variables.map(v => v -> (base(v) && keep(v))).toMap
      case _ => base
    }
    // reference-shaped per-metric criteria, metric order fixed like
    // `_METRICS` iteration (`binning_process.py:361-389`)
    def metricOf(v: String, m: String): Double = m match {
      case "iv" => fits(v).table.iv
      case "js" => fits(v).table.js
      case "gini" => fits(v).table.gini
      case "quality" | "quality_score" =>
        fits(v).table.analysis().qualityScore
      case other =>
        throw new IllegalArgumentException(s"unknown metric $other")
    }
    Seq("iv", "js", "gini", "quality", "quality_score").foreach { m =>
      s.criteria.get(m).foreach { c =>
        c.min.foreach { b =>
          mask = mask.map { case (v, ok) =>
            v -> (ok && metricOf(v, m) >= b)
          }
        }
        c.max.foreach { b =>
          mask = mask.map { case (v, ok) =>
            v -> (ok && metricOf(v, m) <= b)
          }
        }
        (c.strategy, c.top) match {
          case (Some(strategy), Some(top)) =>
            val eligible = variables.filter(mask)
            val n = math.min(
              eligible.length,
              if (top >= 1.0) top.toInt
              else math.ceil(eligible.length * top).toInt)
            val ranked = eligible.sortBy(v =>
              (if (strategy == "highest") -1 else 1) * metricOf(v, m))
            val keep = ranked.take(n).toSet
            mask = mask.map { case (v, ok) => v -> (ok && keep(v)) }
          case _ =>
        }
      }
    }
    // fixed variables are always selected
    s.fixedVariables.foreach { fv =>
      if (mask.contains(fv)) mask += fv -> true
    }
    mask
  }

  def selectedVariables: Array[String] = variables.filter(support)

  /** Fitted model for one variable (`get_binned_variable`,
    * `binning_process.py:944-961`). */
  def getBinnedVariable(name: String): FittedOptimalBinning =
    fits.getOrElse(name, throw new IllegalArgumentException(
      s"name $name does not match a binned variable"))

  /** Replace one variable's fitted model (`update_binned_variable`,
    * `binning_process.py:963-1016`) — e.g. after re-fitting it with
    * hand-tuned parameters. Returns a NEW process (immutability keeps
    * broadcast copies of the old one valid); support and summary are
    * re-derived lazily from the updated fit set. */
  def updated(name: String, optb: FittedOptimalBinning)
      : FittedBinningProcess = {
    if (!fits.contains(name))
      throw new IllegalArgumentException(
        s"name $name does not match a binned variable")
    if (optb.config.name.nonEmpty && optb.config.name != name)
      throw new IllegalArgumentException(
        s"name and object name must coincide; $name != ${optb.config.name}")
    new FittedBinningProcess(variables, fits + (name -> optb), selection)
  }

  /** Overview text (`information()`,
    * `binning_process.py:892-918`): variable counts by dtype and
    * status, and the selection outcome. */
  def information(): String = {
    val nNum = variables.count(v => fits(v).config.dtype == "numerical")
    val byStatus = variables.map(v => fits(v).status)
      .groupBy(identity).view.mapValues(_.length).toMap
      .toSeq.sortBy(_._1)
      .map { case (s, n) => s"$s=$n" }.mkString(", ")
    f"""binning process: ${variables.length}%d variables
       |  numerical        $nNum%d
       |  categorical      ${variables.length - nNum}%d
       |  selected         ${selectedVariables.length}%d
       |  status           $byStatus%s""".stripMargin
  }

  /** Wide transform: metric column per selected variable. */
  /** Wide transform: one generated CASE per selected variable in a
    * single projection. `transformParams` carries per-variable
    * (metric_special, metric_missing) overrides — the reference's
    * `binning_transform_params` (`binning_process.py:452-460`).
    */
  def transform(df: DataFrame, metric: String = "woe",
                keepCols: Seq[String] = Seq.empty,
                transformParams: Map[String, (Any, Any)] = Map.empty)
      : DataFrame = {
    val cols = keepCols.map(col) ++ selectedVariables.toSeq.map { v =>
      val (sp, mi) =
        transformParams.getOrElse(v, ("empirical", "empirical"))
      fits(v).transform(col(v), metric, metricSpecial = sp,
                        metricMissing = mi).as(v)
    }
    df.select(cols: _*)
  }
}
