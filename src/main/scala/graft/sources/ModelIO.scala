package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

import graft.core.BinningTables
import graft.operators.{BinningConfig, BinningProcess,
  FittedBinningProcess, FittedContinuousBinning,
  FittedContinuousScorecard, FittedOptimalBinning, FittedScorecard,
  Scorecard, SpecialList}

/** Model persistence mirroring the reference's `to_json`/`read_json`
  * surface (`optbinning/binning/binning.py:1189-1255`): the model IS the
  * splits + per-bin counts, so a fitted binning round-trips through a
  * small JSON document (json4s ships on the Spark classpath).
  */
object ModelIO {

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
      ("special_codes" -> (f.config.specialCodes match {
        case Some(SpecialList(vs)) => vs.map(_.toString).toList
        case _                     => Nil
      }))
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
    val specials = (j \ "special_codes").extract[List[String]]

    val config = BinningConfig(
      name = name, dtype = dtype,
      specialCodes =
        if (specials.nonEmpty)
          Some(SpecialList(specials.map(_.toDouble)))
        else None)
    val table = new BinningTables.BinaryBinningTable(
      name, dtype, splits, nNonevent, nEvent, labels, nSpecials)
    new FittedOptimalBinning(
      config, status, splits, table,
      if (categories.nonEmpty) categories else null,
      if (catBins.nonEmpty) catBins else null,
      if (catOthers.nonEmpty) catOthers else null,
      nDataBins)
  }

  def load(path: String): FittedOptimalBinning =
    fromJson(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  // ------------------------------------------------------------------
  // multi-variable process + scorecard persistence
  // (`binning_process.py:317-349`, `scorecard.py:507-538` — the
  // reference pickles; JSON here so models are portable/inspectable)
  // ------------------------------------------------------------------

  def processToJson(p: FittedBinningProcess): String = {
    val json: JObject =
      ("variables" -> p.variables.toList) ~
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
      BinningProcess.Selection())
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

  def scorecardToJson(sc: FittedScorecard): String = {
    val json: JObject =
      ("process" -> JsonMethods.parse(processToJson(sc.process))) ~
      ("selected" -> sc.selected.toList) ~
      ("coefficients" -> sc.coefficients.toList) ~
      ("estimator_intercept" -> sc.estimatorIntercept) ~
      ("base_intercept" -> sc.baseIntercept) ~
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
    new FittedScorecard(process, selected, coefs, intercept, points,
                        base, Scorecard.ScalingConfig(), None,
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
      ("special_codes" -> (f.config.specialCodes match {
        case Some(SpecialList(vs)) => vs.map(_.toString).toList
        case _                     => Nil
      }))
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
    val specials = (j \ "special_codes").extract[List[String]]
    val config = BinningConfig(
      name = name, dtype = dtype,
      specialCodes =
        if (specials.nonEmpty)
          Some(SpecialList(specials.map(_.toDouble)))
        else None)
    val table = new BinningTables.ContinuousBinningTable(
      name, dtype, splits, nRecords, sums, stds, mins, maxs, nZeros,
      labels, nDataBins)
    new FittedContinuousBinning(
      config, status, splits, table,
      if (categories.nonEmpty) categories else null,
      if (catBins.nonEmpty) catBins else null,
      if (catOthers.nonEmpty) catOthers else null,
      nDataBins)
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
      base, Scorecard.ScalingConfig())
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
