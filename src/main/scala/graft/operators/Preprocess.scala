package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Special-code configuration: a flat list (one synthetic "Special" bin) or
  * an ordered dict of named groups, mirroring
  * `optbinning/binning/preprocessing.py:193-228`.
  */
sealed trait SpecialCodes {
  def groupNames: Seq[String]
  def allValues: Seq[Any]
}
final case class SpecialList(values: Seq[Any]) extends SpecialCodes {
  def groupNames: Seq[String] = Seq("Special")
  def allValues: Seq[Any] = values
}
final case class SpecialDict(groups: Seq[(String, Seq[Any])])
    extends SpecialCodes {
  def groupNames: Seq[String] = groups.map(_._1)
  def allValues: Seq[Any] = groups.flatMap(_._2)
}

/** Row-classification expressions: every input row is exactly one of
  * clean / special group k / missing (`preprocessing.py:45-285` split_data).
  * Pure Catalyst `when` chains — predicate pushdown and whole-stage codegen
  * apply; no UDFs.
  */
object Preprocess {

  /** 0 = clean, 1..k = special group index+1, k+1 = missing. */
  val CleanClass = 0

  def missingPredicate(x: Column, isNumeric: Boolean): Column =
    if (isNumeric) x.isNull || isnan(x) else x.isNull

  /** Build the row-class column. Missing is checked first (NaN cannot be a
    * special code member), then special groups in declared order.
    */
  def rowClass(x: Column, isNumeric: Boolean,
               specialCodes: Option[SpecialCodes]): Column = {
    val nGroups = specialCodes.map(_.groupNames.size).getOrElse(0)
    val missingIdx = nGroups + 1
    var expr: Column = when(missingPredicate(x, isNumeric), lit(missingIdx))
    specialCodes match {
      case Some(SpecialList(values)) =>
        expr = expr.when(x.isin(values: _*), lit(1))
      case Some(SpecialDict(groups)) =>
        groups.zipWithIndex.foreach { case ((_, values), i) =>
          expr = expr.when(x.isin(values: _*), lit(i + 1))
        }
      case None => ()
    }
    expr.otherwise(lit(CleanClass))
  }

  def missingClassIndex(specialCodes: Option[SpecialCodes]): Int =
    specialCodes.map(_.groupNames.size).getOrElse(0) + 1
}
