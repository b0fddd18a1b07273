package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

import graft.core.BinningTables
import graft.operators.{BinningConfig, BinningProcess,
  FittedBinningProcess, FittedContinuousBinning,
  FittedContinuousScorecard, FittedOptimalBinning, FittedScorecard,
  Scorecard, SpecialCodes, SpecialDict, SpecialList}

/** Model persistence mirroring the reference's `to_json`/`read_json`
  * surface (`optbinning/binning/binning.py:1189-1255`): the model IS the
  * splits + per-bin counts, so a fitted binning round-trips through a
  * small JSON document (json4s ships on the Spark classpath).
  */
object ModelIO {

  // ------------------------------------------------------------------
  // special-code round-trip: JSON must preserve BOTH the group
  // structure (SpecialDict) and the value types — a string special like
  // "N/A" on a categorical column and a numeric -9.0 compare through
  // different isin() casts, and a flattened/stringified list would
  // silently re-bin every special row after load.
  // ------------------------------------------------------------------

  private def specialValueJson(v: Any): JValue = v match {
    case d: Double => JDouble(d)
    case f: Float  => JDouble(f.toDouble)
    case i: Int    => JInt(BigInt(i))
    case l: Long   => JInt(BigInt(l))
    case s: Short  => JInt(BigInt(s.toInt))
    case b: Byte   => JInt(BigInt(b.toInt))
    case other     => JString(other.toString)
  }

  private def specialValueFromJson(j: JValue): Any = j match {
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JInt(i)     => i.toLong
    case JString(s)  => s
    case other => throw new IllegalArgumentException(
      s"unsupported special-code JSON value: $other")
  }

  private def specialCodesJson(sc: Option[SpecialCodes]): JValue =
    sc match {
      case None => JNothing
      case Some(SpecialList(vs)) =>
        ("kind" -> "list") ~
        ("values" -> JArray(vs.map(specialValueJson).toList))
      case Some(SpecialDict(groups)) =>
        ("kind" -> "dict") ~
        ("groups" -> JArray(groups.map { case (name, vs) =>
          (("name" -> name) ~
           ("values" -> JArray(vs.map(specialValueJson).toList))): JValue
        }.toList))
    }

  private def specialCodesFromJson(j: JValue): Option[SpecialCodes] =
    j match {
      case JNothing | JNull => None
      // legacy format (pre-typed): a flat list of stringified values
      case JArray(items) =>
        if (items.isEmpty) None
        else Some(SpecialList(items.map {
          case JString(s) =>
            scala.util.Try(s.toDouble).getOrElse(s: Any)
          case v => specialValueFromJson(v)
        }))
      case obj => (obj \ "kind") match {
        case JString("list") =>
          Some(SpecialList((obj \ "values") match {
            case JArray(vs) => vs.map(specialValueFromJson)
            case _          => Nil
          }))
        case JString("dict") =>
          Some(SpecialDict((obj \ "groups") match {
            case JArray(gs) => gs.map { g =>
              val name = (g \ "name") match {
                case JString(n) => n
                case _          => ""
              }
              val vs = (g \ "values") match {
                case JArray(xs) => xs.map(specialValueFromJson)
                case _          => Nil
              }
              (name, vs)
            }
            case _ => Nil
          }))
        case _ => None
      }
    }

  private def boolAt(j: JValue): Boolean = j match {
    case JBool(b) => b
    case _        => false
  }

  // ------------------------------------------------------------------
  // full BinningConfig round-trip — the spark.ml Pipeline stage
  // persists its configuration through this codec (DefaultParamsWriter
  // only persists Params, so the config travels as one JSON string
  // Param). Every field serializes; a config that loads back must fit
  // identically.
  // ------------------------------------------------------------------

  def configToJson(c: BinningConfig): String = {
    val json: JObject =
      ("name" -> c.name) ~
      ("dtype" -> c.dtype) ~
      ("prebinning_method" -> c.prebinningMethod) ~
      ("divergence" -> c.divergence) ~
      ("max_n_prebins" -> c.maxNPrebins) ~
      ("min_prebin_size" -> c.minPrebinSize) ~
      ("min_n_bins" -> c.minNBins) ~
      ("max_n_bins" -> c.maxNBins) ~
      ("min_bin_size" -> c.minBinSize) ~
      ("max_bin_size" -> c.maxBinSize) ~
      ("min_bin_n_event" -> c.minBinNEvent) ~
      ("max_bin_n_event" -> c.maxBinNEvent) ~
      ("min_bin_n_nonevent" -> c.minBinNNonevent) ~
      ("max_bin_n_nonevent" -> c.maxBinNNonevent) ~
      ("monotonic_trend" -> c.monotonicTrend) ~
      ("min_event_rate_diff" -> c.minEventRateDiff) ~
      ("max_pvalue" -> c.maxPvalue) ~
      ("max_pvalue_policy" -> c.maxPvaluePolicy) ~
      ("gamma" -> c.gamma) ~
      ("outlier_detector" -> c.outlierDetector) ~
      ("outlier_params" -> JObject(
        c.outlierParams.toList.sortBy(_._1).map { case (k, v) =>
          k -> specialValueJson(v) })) ~
      ("fix_lb" -> c.fixLb) ~
      ("fix_ub" -> c.fixUb) ~
      ("cat_cutoff" -> c.catCutoff) ~
      ("cat_unknown" ->
        c.catUnknown.map(specialValueJson).getOrElse(JNothing)) ~
      ("user_splits" -> c.userSplits.map(_.toList)) ~
      ("user_splits_categorical" ->
        c.userSplitsCategorical.map(_.map(_.toList).toList)) ~
      ("user_splits_fixed" -> c.userSplitsFixed.map(_.toList)) ~
      ("special_codes" -> specialCodesJson(c.specialCodes)) ~
      ("split_digits" -> c.splitDigits) ~
      ("class_weight" -> c.classWeight.map(m => JObject(
        m.toList.sortBy(_._1).map { case (k, v) =>
          k.toString -> (JDouble(v): JValue) }))) ~
      ("time_limit_ms" -> c.timeLimitMs) ~
      ("histogram_max_buckets" -> c.histogramMaxBuckets)
    JsonMethods.compact(JsonMethods.render(json))
  }

  def configFromJson(s: String): BinningConfig = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val dflt = BinningConfig()
    def optD(k: String) = (j \ k).extractOpt[Double]
    def optI(k: String) = (j \ k).extractOpt[Int]
    def optL(k: String) = (j \ k).extractOpt[Long]
    def optS(k: String) = (j \ k).extractOpt[String]
    BinningConfig(
      name = optS("name").getOrElse(dflt.name),
      dtype = optS("dtype").getOrElse(dflt.dtype),
      prebinningMethod =
        optS("prebinning_method").getOrElse(dflt.prebinningMethod),
      divergence = optS("divergence").getOrElse(dflt.divergence),
      maxNPrebins = optI("max_n_prebins").getOrElse(dflt.maxNPrebins),
      minPrebinSize =
        optD("min_prebin_size").getOrElse(dflt.minPrebinSize),
      minNBins = optI("min_n_bins"),
      maxNBins = optI("max_n_bins"),
      minBinSize = optD("min_bin_size"),
      maxBinSize = optD("max_bin_size"),
      minBinNEvent = optL("min_bin_n_event"),
      maxBinNEvent = optL("max_bin_n_event"),
      minBinNNonevent = optL("min_bin_n_nonevent"),
      maxBinNNonevent = optL("max_bin_n_nonevent"),
      monotonicTrend = optS("monotonic_trend"),
      minEventRateDiff =
        optD("min_event_rate_diff").getOrElse(dflt.minEventRateDiff),
      maxPvalue = optD("max_pvalue"),
      maxPvaluePolicy =
        optS("max_pvalue_policy").getOrElse(dflt.maxPvaluePolicy),
      gamma = optD("gamma").getOrElse(dflt.gamma),
      outlierDetector = optS("outlier_detector"),
      outlierParams = (j \ "outlier_params") match {
        case JObject(fields) =>
          fields.map { case (k, v) => k -> specialValueFromJson(v) }
            .toMap
        case _ => Map.empty
      },
      fixLb = optD("fix_lb"),
      fixUb = optD("fix_ub"),
      catCutoff = optD("cat_cutoff"),
      catUnknown = (j \ "cat_unknown") match {
        case JNothing | JNull => None
        case v                => Some(specialValueFromJson(v))
      },
      // NOTE: json4s extracts a MISSING field as an empty list, which
      // would load None as Some(Array()) — match JNothing explicitly
      userSplits = (j \ "user_splits") match {
        case JNothing | JNull => None
        case v => Some(v.extract[List[Double]].toArray)
      },
      userSplitsCategorical = (j \ "user_splits_categorical") match {
        case JNothing | JNull => None
        case v => Some(v.extract[List[List[String]]]
                        .map(_.toArray).toArray)
      },
      userSplitsFixed = (j \ "user_splits_fixed") match {
        case JNothing | JNull => None
        case v => Some(v.extract[List[Boolean]].toArray)
      },
      specialCodes = specialCodesFromJson(j \ "special_codes"),
      splitDigits = optI("split_digits"),
      classWeight = (j \ "class_weight") match {
        case JObject(fields) if fields.nonEmpty =>
          Some(fields.map { case (k, v) =>
            k.toDouble -> (v match {
              case JDouble(d)  => d
              case JInt(i)     => i.toDouble
              case JDecimal(d) => d.toDouble
              case other => throw new IllegalArgumentException(
                s"class_weight: $other")
            })
          }.toMap)
        case _ => None
      },
      timeLimitMs = optL("time_limit_ms").getOrElse(dflt.timeLimitMs),
      histogramMaxBuckets = optI("histogram_max_buckets")
        .getOrElse(dflt.histogramMaxBuckets))
  }

  def toJson(f: FittedOptimalBinning): String = {
    val json: JObject =
      ("name" -> f.config.name) ~
      ("dtype" -> f.config.dtype) ~
      ("status" -> f.status) ~
      ("splits" -> f.splits.toList) ~
      ("n_nonevent" -> f.table.nNonevent.toList) ~
      ("n_event" -> f.table.nEvent.toList) ~
      ("bin_labels" -> f.table.binLabels.toList) ~
      ("n_data_bins" -> f.nDataBins) ~
      ("n_specials" -> f.table.nSpecials) ~
      ("categories" ->
        Option(f.categories).map(_.toList).getOrElse(Nil)) ~
      ("cat_bins" ->
        Option(f.catBins).map(_.map(_.toList).toList).getOrElse(Nil)) ~
      ("cat_others" ->
        Option(f.catOthers).map(_.toList).getOrElse(Nil)) ~
      ("others_catch_all" -> f.othersCatchAll) ~
      ("special_codes" -> specialCodesJson(f.config.specialCodes))
    JsonMethods.compact(JsonMethods.render(json))
  }

  def save(f: FittedOptimalBinning, path: String): Unit =
    Files.write(Paths.get(path),
                toJson(f).getBytes("UTF-8"),
                StandardOpenOption.CREATE,
                StandardOpenOption.TRUNCATE_EXISTING)

  def fromJson(s: String): FittedOptimalBinning = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val name = (j \ "name").extract[String]
    val dtype = (j \ "dtype").extract[String]
    val status = (j \ "status").extract[String]
    val splits = (j \ "splits").extract[List[Double]].toArray
    val nNonevent = (j \ "n_nonevent").extract[List[Double]].toArray
    val nEvent = (j \ "n_event").extract[List[Double]].toArray
    val labels = (j \ "bin_labels").extract[List[String]].toArray
    val nDataBins = (j \ "n_data_bins").extract[Int]
    val nSpecials = (j \ "n_specials").extract[Int]
    val categories = (j \ "categories").extract[List[String]].toArray
    val catBins = (j \ "cat_bins").extract[List[List[String]]]
      .map(_.toArray).toArray
    val catOthers = (j \ "cat_others").extract[List[String]].toArray

    val config = BinningConfig(
      name = name, dtype = dtype,
      specialCodes = specialCodesFromJson(j \ "special_codes"))
    val table = new BinningTables.BinaryBinningTable(
      name, dtype, splits, nNonevent, nEvent, labels, nSpecials)
    new FittedOptimalBinning(
      config, status, splits, table,
      if (categories.nonEmpty) categories else null,
      if (catBins.nonEmpty) catBins else null,
      if (catOthers.nonEmpty) catOthers else null,
      nDataBins,
      othersCatchAll = boolAt(j \ "others_catch_all"))
  }

  def load(path: String): FittedOptimalBinning =
    fromJson(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  // ------------------------------------------------------------------
  // multi-variable process + scorecard persistence
  // (`binning_process.py:317-349`, `scorecard.py:507-538` — the
  // reference pickles; JSON here so models are portable/inspectable)
  // ------------------------------------------------------------------

  private def optJson(o: Option[Double]): JValue =
    o.map(JDouble(_): JValue).getOrElse(JNothing)
  private def optFromJson(j: JValue): Option[Double] = j match {
    case JDouble(d)  => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JInt(i)     => Some(i.toDouble)
    case _           => None
  }
  private def optStr(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case _          => None
  }

  private def selectionJson(s: BinningProcess.Selection): JValue =
    ("min_iv" -> optJson(s.minIv)) ~ ("max_iv" -> optJson(s.maxIv)) ~
    ("min_js" -> optJson(s.minJs)) ~ ("max_js" -> optJson(s.maxJs)) ~
    ("min_gini" -> optJson(s.minGini)) ~
    ("min_quality" -> optJson(s.minQuality)) ~
    ("strategy" -> s.strategy.map(JString(_): JValue)
       .getOrElse(JNothing)) ~
    ("top_k" -> s.topK.map(k => JInt(BigInt(k)): JValue)
       .getOrElse(JNothing)) ~
    ("criteria" -> JObject(s.criteria.toList.map { case (m, c) =>
      m -> (("min" -> optJson(c.min)) ~ ("max" -> optJson(c.max)) ~
            ("strategy" -> c.strategy.map(JString(_): JValue)
               .getOrElse(JNothing)) ~
            ("top" -> optJson(c.top)): JValue)
    })) ~
    ("fixed_variables" -> s.fixedVariables.toList)

  private def selectionFromJson(j: JValue): BinningProcess.Selection =
    BinningProcess.Selection(
      minIv = optFromJson(j \ "min_iv"),
      maxIv = optFromJson(j \ "max_iv"),
      minJs = optFromJson(j \ "min_js"),
      maxJs = optFromJson(j \ "max_js"),
      minGini = optFromJson(j \ "min_gini"),
      minQuality = optFromJson(j \ "min_quality"),
      strategy = optStr(j \ "strategy"),
      topK = (j \ "top_k") match {
        case JInt(i) => Some(i.toInt)
        case _       => None
      },
      criteria = (j \ "criteria") match {
        case JObject(fields) => fields.map { case (m, c) =>
          m -> BinningProcess.MetricCriteria(
            min = optFromJson(c \ "min"), max = optFromJson(c \ "max"),
            strategy = optStr(c \ "strategy"),
            top = optFromJson(c \ "top"))
        }.toMap
        case _ => Map.empty[String, BinningProcess.MetricCriteria]
      },
      fixedVariables = (j \ "fixed_variables") match {
        case JArray(vs) => vs.collect { case JString(v) => v }
        case _          => Nil
      })

  def processToJson(p: FittedBinningProcess): String = {
    val json: JObject =
      ("variables" -> p.variables.toList) ~
      ("selection" -> selectionJson(p.selection)) ~
      ("fits" -> p.variables.toList.map(v =>
        JsonMethods.parse(toJson(p.fits(v)))))
    JsonMethods.compact(JsonMethods.render(json))
  }

  def processFromJson(s: String): FittedBinningProcess = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val variables = (j \ "variables").extract[List[String]]
    val fits = (j \ "fits").extract[List[JValue]]
      .map(v => fromJson(JsonMethods.compact(JsonMethods.render(v))))
    new FittedBinningProcess(
      variables.toArray,
      variables.zip(fits).toMap,
      selectionFromJson(j \ "selection"))
  }

  def saveProcess(p: FittedBinningProcess, path: String): Unit =
    Files.write(Paths.get(path), processToJson(p).getBytes("UTF-8"),
                StandardOpenOption.CREATE,
                StandardOpenOption.TRUNCATE_EXISTING)

  def loadProcess(path: String): FittedBinningProcess =
    processFromJson(
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  private def metricJson(m: Any): JValue = m match {
    case "empirical" => JString("empirical")
    case v: Double   => JDouble(v)
    case v: Int      => JDouble(v.toDouble)
    case other       => JString(other.toString)
  }

  private def metricFromJson(j: JValue): Any = j match {
    case JString(s) => s
    case JDouble(d) => d
    case JInt(i)    => i.toDouble
    case _          => 0.0
  }

  private def scalingJson(s: Scorecard.ScalingConfig): JValue =
    ("method" -> s.method.map(JString(_): JValue).getOrElse(JNothing)) ~
    ("pdo" -> s.pdo) ~ ("odds" -> s.odds) ~
    ("scorecard_points" -> s.scorecardPoints) ~
    ("min" -> s.min) ~ ("max" -> s.max) ~
    ("reverse_scorecard" -> s.reverseScorecard) ~
    ("intercept_based" -> s.interceptBased) ~
    ("rounding" -> s.rounding)

  private def scalingFromJson(j: JValue): Scorecard.ScalingConfig =
    j match {
      case JNothing | JNull => Scorecard.ScalingConfig()
      case _ =>
        val d = Scorecard.ScalingConfig()
        Scorecard.ScalingConfig(
          method = optStr(j \ "method"),
          pdo = optFromJson(j \ "pdo").getOrElse(d.pdo),
          odds = optFromJson(j \ "odds").getOrElse(d.odds),
          scorecardPoints = optFromJson(j \ "scorecard_points")
            .getOrElse(d.scorecardPoints),
          min = optFromJson(j \ "min").getOrElse(d.min),
          max = optFromJson(j \ "max").getOrElse(d.max),
          reverseScorecard = boolAt(j \ "reverse_scorecard"),
          interceptBased = boolAt(j \ "intercept_based"),
          rounding = boolAt(j \ "rounding"))
    }

  def scorecardToJson(sc: FittedScorecard): String = {
    val json: JObject =
      ("process" -> JsonMethods.parse(processToJson(sc.process))) ~
      ("selected" -> sc.selected.toList) ~
      ("coefficients" -> sc.coefficients.toList) ~
      ("estimator_intercept" -> sc.estimatorIntercept) ~
      ("base_intercept" -> sc.baseIntercept) ~
      ("scaling" -> scalingJson(sc.scaling)) ~
      ("woe_stats" -> sc.woeStats.map { case (mu, l) =>
        (("mean" -> mu.toList) ~
         ("chol" -> l.map(_.toList).toList)): JValue
      }.getOrElse(JNothing)) ~
      ("metric_special" -> metricJson(sc.metricSpecial)) ~
      ("metric_missing" -> metricJson(sc.metricMissing)) ~
      ("points" -> sc.pointsTable.toList.map { r =>
        ("variable" -> r.variable) ~ ("bin_id" -> r.binId) ~
        ("bin" -> r.bin) ~ ("count" -> r.count) ~
        ("event_rate" -> r.eventRate) ~ ("woe" -> r.woe) ~
        ("coefficient" -> r.coefficient) ~ ("points" -> r.points)
      })
    JsonMethods.compact(JsonMethods.render(json))
  }

  def scorecardFromJson(s: String): FittedScorecard = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val process = processFromJson(
      JsonMethods.compact(JsonMethods.render(j \ "process")))
    val selected = (j \ "selected").extract[List[String]].toArray
    val coefs = (j \ "coefficients").extract[List[Double]].toArray
    val intercept = (j \ "estimator_intercept").extract[Double]
    val base = (j \ "base_intercept").extract[Double]
    val points = (j \ "points").extract[List[JValue]].map { r =>
      Scorecard.PointsRow(
        (r \ "variable").extract[String], (r \ "bin_id").extract[Int],
        (r \ "bin").extract[String], (r \ "count").extract[Double],
        (r \ "event_rate").extract[Double], (r \ "woe").extract[Double],
        (r \ "coefficient").extract[Double],
        (r \ "points").extract[Double])
    }.toArray
    val woeStats = (j \ "woe_stats") match {
      case JNothing | JNull => None
      case ws =>
        val mu = (ws \ "mean").extract[List[Double]].toArray
        val l = (ws \ "chol").extract[List[List[Double]]]
          .map(_.toArray).toArray
        if (mu.nonEmpty) Some((mu, l)) else None
    }
    new FittedScorecard(process, selected, coefs, intercept, points,
                        base, scalingFromJson(j \ "scaling"), woeStats,
                        metricFromJson(j \ "metric_special"),
                        metricFromJson(j \ "metric_missing"))
  }

  def saveScorecard(sc: FittedScorecard, path: String): Unit =
    Files.write(Paths.get(path), scorecardToJson(sc).getBytes("UTF-8"),
                StandardOpenOption.CREATE,
                StandardOpenOption.TRUNCATE_EXISTING)

  def loadScorecard(path: String): FittedScorecard =
    scorecardFromJson(
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  // ------------------------------------------------------------------
  // continuous-target fits (`continuous_binning.py` to_json analogue:
  // the model is splits + per-bin sufficient statistics)
  // ------------------------------------------------------------------

  def continuousToJson(f: FittedContinuousBinning): String = {
    val t = f.table
    val json: JObject =
      ("name" -> f.config.name) ~
      ("dtype" -> f.config.dtype) ~
      ("status" -> f.status) ~
      ("splits" -> f.splits.toList) ~
      ("n_records" -> t.nRecords.toList) ~
      ("sums" -> t.sums.toList) ~
      ("stds" -> t.stds.toList) ~
      ("mins" -> t.mins.toList) ~
      ("maxs" -> t.maxs.toList) ~
      ("n_zeros" -> t.nZeros.toList) ~
      ("bin_labels" -> t.binLabels.toList) ~
      ("n_data_bins" -> f.nDataBins) ~
      ("categories" ->
        Option(f.categories).map(_.toList).getOrElse(Nil)) ~
      ("cat_bins" ->
        Option(f.catBins).map(_.map(_.toList).toList).getOrElse(Nil)) ~
      ("cat_others" ->
        Option(f.catOthers).map(_.toList).getOrElse(Nil)) ~
      ("others_catch_all" -> f.othersCatchAll) ~
      ("special_codes" -> specialCodesJson(f.config.specialCodes))
    JsonMethods.compact(JsonMethods.render(json))
  }

  def continuousFromJson(s: String): FittedContinuousBinning = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val name = (j \ "name").extract[String]
    val dtype = (j \ "dtype").extract[String]
    val status = (j \ "status").extract[String]
    val splits = (j \ "splits").extract[List[Double]].toArray
    val nRecords = (j \ "n_records").extract[List[Double]].toArray
    val sums = (j \ "sums").extract[List[Double]].toArray
    val stds = (j \ "stds").extract[List[Double]].toArray
    val mins = (j \ "mins").extract[List[Double]].toArray
    val maxs = (j \ "maxs").extract[List[Double]].toArray
    val nZeros = (j \ "n_zeros").extract[List[Double]].toArray
    val labels = (j \ "bin_labels").extract[List[String]].toArray
    val nDataBins = (j \ "n_data_bins").extract[Int]
    val categories = (j \ "categories").extract[List[String]].toArray
    val catBins = (j \ "cat_bins").extract[List[List[String]]]
      .map(_.toArray).toArray
    val catOthers = (j \ "cat_others").extract[List[String]].toArray
    val config = BinningConfig(
      name = name, dtype = dtype,
      specialCodes = specialCodesFromJson(j \ "special_codes"))
    val table = new BinningTables.ContinuousBinningTable(
      name, dtype, splits, nRecords, sums, stds, mins, maxs, nZeros,
      labels, nDataBins)
    new FittedContinuousBinning(
      config, status, splits, table,
      if (categories.nonEmpty) categories else null,
      if (catBins.nonEmpty) catBins else null,
      if (catOthers.nonEmpty) catOthers else null,
      nDataBins,
      othersCatchAll = boolAt(j \ "others_catch_all"))
  }

  def saveContinuous(f: FittedContinuousBinning, path: String): Unit =
    Files.write(Paths.get(path), continuousToJson(f).getBytes("UTF-8"),
                StandardOpenOption.CREATE,
                StandardOpenOption.TRUNCATE_EXISTING)

  def loadContinuous(path: String): FittedContinuousBinning =
    continuousFromJson(
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  def continuousScorecardToJson(sc: FittedContinuousScorecard): String = {
    val json: JObject =
      ("fits" -> sc.selected.toList.map(v =>
        JsonMethods.parse(continuousToJson(sc.fits(v))))) ~
      ("selected" -> sc.selected.toList) ~
      ("coefficients" -> sc.coefficients.toList) ~
      ("estimator_intercept" -> sc.estimatorIntercept) ~
      ("base_intercept" -> sc.baseIntercept) ~
      ("scaling" -> scalingJson(sc.scaling)) ~
      ("points" -> sc.pointsTable.toList.map { r =>
        ("variable" -> r.variable) ~ ("bin_id" -> r.binId) ~
        ("bin" -> r.bin) ~ ("count" -> r.count) ~
        ("event_rate" -> r.eventRate) ~ ("woe" -> r.woe) ~
        ("coefficient" -> r.coefficient) ~ ("points" -> r.points)
      })
    JsonMethods.compact(JsonMethods.render(json))
  }

  def continuousScorecardFromJson(s: String): FittedContinuousScorecard = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val selected = (j \ "selected").extract[List[String]].toArray
    val fits = (j \ "fits").extract[List[JValue]].map(v =>
      continuousFromJson(JsonMethods.compact(JsonMethods.render(v))))
    val coefs = (j \ "coefficients").extract[List[Double]].toArray
    val intercept = (j \ "estimator_intercept").extract[Double]
    val base = (j \ "base_intercept").extract[Double]
    val points = (j \ "points").extract[List[JValue]].map { r =>
      Scorecard.PointsRow(
        (r \ "variable").extract[String], (r \ "bin_id").extract[Int],
        (r \ "bin").extract[String], (r \ "count").extract[Double],
        (r \ "event_rate").extract[Double], (r \ "woe").extract[Double],
        (r \ "coefficient").extract[Double],
        (r \ "points").extract[Double])
    }.toArray
    new FittedContinuousScorecard(
      selected.zip(fits).toMap, selected, coefs, intercept, points,
      base, scalingFromJson(j \ "scaling"))
  }

  def saveContinuousScorecard(sc: FittedContinuousScorecard,
                              path: String): Unit =
    Files.write(Paths.get(path),
                continuousScorecardToJson(sc).getBytes("UTF-8"),
                StandardOpenOption.CREATE,
                StandardOpenOption.TRUNCATE_EXISTING)

  def loadContinuousScorecard(path: String): FittedContinuousScorecard =
    continuousScorecardFromJson(
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
}
