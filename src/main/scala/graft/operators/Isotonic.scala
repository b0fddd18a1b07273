package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Isotonic (monotone non-decreasing) calibration of binary event
  * rates by pool-adjacent-violators — the calibration layer between a
  * score and a probability (reliability curves, monotone WoE
  * smoothing; the same monotone-event-rate contract the binning
  * solvers enforce, here as a direct least-squares fit over an
  * ordered bin axis. Reference analogue: the monotonic-trend
  * constraints of optbinning/binning/binning.py's solver surface).
  *
  * Aggregate-then-solve (the engine's fit discipline): ONE distributed
  * (bin → n, events) aggregate with map-side partials, then the exact
  * PAV merge on the driver over the bounded bin table — the corpus is
  * scanned once and never sorted; the driver holds |bins| rows. The
  * caller supplies the bin projection (a grid/prebin index), so the
  * driver table is bounded by construction at any data scale.
  *
  * Exactness (what makes the fit hash-oracle-able on any engine): PAV
  * pools with INTEGER cross-multiplied rate comparisons
  * (`eL * nR > eR * nL` — no float division), and the fitted value is
  * emitted as `iso_scaled = floor(events_pool * S / n_pool)` computed
  * in BigInt. Because S > totalN², the map x -> floor(x*S) is
  * order-preserving AND injective on rationals with denominator
  * <= totalN, so `iso_scaled` is a faithful integer encoding of the
  * exact fitted rational — and equals
  * `max_{j<=i} min_{k>=i} floor(S * sum_e(j..k) / sum_n(j..k))`
  * (the PAV solution's minimax characterization commutes with any
  * order-preserving injection), which is how a SQL oracle replays it
  * without sequential state.
  */
object Isotonic {

  /** Fit: per ascending `binCol` value, the pooled isotonic event rate.
    * Returns (bin, n, events, iso_scaled) — bin as BIGINT, iso_scaled
    * = floor(fitted_rate * S).
    *
    * `yCol` must be 0/1 (rows outside are rejected by an in-plan
    * guard); null bins/y are excluded.
    */
  def isotonicEventRates(df: DataFrame, binCol: String, yCol: String,
                         scaleS: BigInt = BigInt(10).pow(16)): DataFrame = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    // guard the RAW value before any cast: a long cast would truncate
    // fractional labels (0.9 -> 0) and defeat the fail-fast contract
    val raw = col(yCol)
    val guarded = when(raw === 0 || raw === 1, raw.cast("long")).otherwise(
      raise_error(concat(lit(s"isotonicEventRates: $yCol must be 0/1, got "),
                         raw.cast("string"))))
    val agg = df.where(col(binCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(binCol).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(guarded).as("events"))
      .orderBy("bin")
      .collect()
    val totalN = agg.iterator.map(_.getLong(1)).sum
    require(BigInt(totalN) * totalN < scaleS,
            s"scaleS=$scaleS too small for n=$totalN rows: the integer " +
            "encoding is only injective while totalN^2 < S")
    // PAV over ascending bins: pool while the new block's rate sits
    // below its left neighbor's (exact cross-multiplied compare)
    final case class Pool(var e: Long, var n: Long, var span: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    agg.foreach { r =>
      stack += Pool(r.getLong(2), r.getLong(1), 1)
      while (stack.length > 1 && {
               val l = stack(stack.length - 2); val t = stack.last
               BigInt(l.e) * t.n > BigInt(t.e) * l.n
             }) {
        val t = stack.remove(stack.length - 1)
        val l = stack.last
        l.e += t.e; l.n += t.n; l.span += t.span
      }
    }
    val iso = stack.iterator.flatMap { p =>
      val v = (BigInt(p.e) * scaleS / p.n).toLong
      Iterator.fill(p.span)(v)
    }.toArray
    val rows = agg.zip(iso).map { case (r, v) =>
      Row(r.getLong(0), r.getLong(1), r.getLong(2), v)
    }
    val schema = StructType(Seq(
      StructField("bin", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("events", LongType, nullable = false),
      StructField("iso_scaled", LongType, nullable = false)))
    spark.createDataFrame(rows.toSeq.asJava, schema)
  }

  /** Calibration transform from a fitted table: maps a bin column to
    * its fitted probability (`iso_scaled / S` as double — display
    * precision; the exact integer stays in the table). A generated
    * CASE chain: one codegen projection, no join, no shuffle — the
    * WoE-transform discipline. Bins outside the fitted set yield null
    * (the caller's unknown-bin policy applies downstream).
    */
  def calibrationExpr(fit: Array[(Long, Long)], bin: Column,
                      scaleS: BigInt = BigInt(10).pow(16)): org.apache.spark.sql.Column = {
    require(fit.nonEmpty, "calibrationExpr needs at least one fitted bin")
    val s = scaleS.toDouble
    fit.foldLeft(lit(null).cast("double")) { case (acc, (b, isoScaled)) =>
      when(bin === b, lit(isoScaled.toDouble / s)).otherwise(acc)
    }
  }

  /** [[isotonicEventRates]] collected to (bin, iso_scaled) pairs for
    * [[calibrationExpr]] — the fit table is bounded by construction,
    * so this collect is the standard aggregate-then-solve driver hop. */
  def fitPairs(df: DataFrame, binCol: String, yCol: String,
               scaleS: BigInt = BigInt(10).pow(16)): Array[(Long, Long)] =
    isotonicEventRates(df, binCol, yCol, scaleS)
      .select("bin", "iso_scaled").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
}
