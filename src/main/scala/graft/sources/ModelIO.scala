package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

import graft.core.BinningTables
import graft.operators.{BinningConfig, FittedOptimalBinning, SpecialList}

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
}
