package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed LOGISTIC regression — the ExactFit bit-parity
  * discipline (`scorecard.py`'s estimator family; reference fits via
  * sklearn's LogisticRegression) extended to a model whose solve is
  * transcendental.
  *
  * The MDLP irreducibility argument says ln/exp evaluated by libm
  * differ across engines, so any statistic THROUGH a transcendental
  * cannot hash-match. This model dodges that without giving up the
  * sigmoid: it never asks either engine to evaluate exp at all.
  *
  *  - The linear predictor eta = b0 + b1*x quantizes to the 1/256
  *    grid: q = floor(clamp(eta * 256, +-2048)) — floor/clamp on
  *    doubles, IEEE-identical everywhere.
  *  - sigma(q/256) needs exp(-|q|/256) = prod over set bits k of
  *    |q| of exp(-2^k/256). Those 12 factors are CONSTANTS —
  *    computed ONCE with StrictMath.exp (reproducible fdlibm, not
  *    platform intrinsics) and shipped verbatim into both engines
  *    (Catalyst literal / SQL literal of the same double). The
  *    per-row product is a fixed left-assoc chain of CASE-selected
  *    multiplies: +,*,/ and comparisons only, bit-identical.
  *  - IRLS weights and residuals quantize to 2^-24 integers
  *    (wq = floor(mu(1-mu) * 2^24), gq = floor((y-mu) * 2^24)), so
  *    each Newton iteration's moments are EXACT DECIMAL/HUGEINT
  *    integer sums — order-independent, engine-independent.
  *  - Each Newton step is the 2x2 Cramer solve over those moments
  *    (the 2^24 scale cancels exactly between the Hessian and the
  *    gradient), evaluated in the same op order on the driver and
  *    in the oracle's CTE chain.
  *
  * The fitted model is therefore not "sklearn's logistic" but a
  * fully-specified quantized-Newton twin of it: sigmoid on a 1/256
  * eta grid (max |sigma error| ~ 1/1024 per step), weights at 2^-24
  * resolution, `iters` fixed Newton steps from beta = 0. Every
  * number it outputs — the coefficient DOUBLES included — is
  * bit-identical between Spark and DuckDB at any SF, so the
  * contract row carries full-precision floats with no rounding.
  *
  * Scale shape: `iters` + 1 scan-bound map-side-combined aggregates
  * (one per Newton step + one readout), constant driver work. The
  * per-row expression is ~40 codegen'd scalar ops; x must be an
  * integer-valued column with |x| bounded so wq*x*x fits a BIGINT
  * (|x| <= ~46000 at the 2^22 weight ceiling). */
object ExactLogit {

  val EtaScale = 256.0
  val EtaMaxQ = 2048.0 // clamp: |eta| <= 8, sigma within 3.4e-4 of 0/1
  val QScale = 16777216.0 // 2^24
  val NBits = 12 // bits 0..11 represent |q| <= 2048

  /** exp(-2^k/256) for k = 0..11 — StrictMath (fdlibm) so the
    * constant is the same double on every JVM; the SQL literal is
    * its shortest round-trip rendering, parsed back to the same
    * double by DuckDB. */
  val C: IndexedSeq[Double] =
    (0 until NBits).map(k => StrictMath.exp(-(1L << k).toDouble / 256.0))

  /** SQL double literal: DuckDB lexes bare decimals as DECIMAL (the
    * multiply chain then overflows scale 38), but E-notation floats
    * lex directly as DOUBLE with correctly-rounded strtod — the same
    * double the JVM holds. */
  private def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** Spark per-row quantities (wq, gq, muq) under (b0, b1) — keep in
    * LOCKSTEP with [[rowSql]]: same ops, same order, same literals. */
  def rowCols(x: Column, y: Column, b0: Double, b1: Double)
      : (Column, Column, Column) = {
    val eta = lit(b0) + (lit(b1) * x.cast("double"))
    val q = floor(greatest(lit(-EtaMaxQ),
                           least(lit(EtaMaxQ), eta * lit(EtaScale))))
    val aq = abs(q)
    val e = (0 until NBits).map { k =>
      when(shiftright(aq, k).bitwiseAND(lit(1L)) === 1L, lit(C(k)))
        .otherwise(lit(1.0))
    }.reduceLeft(_ * _)
    val mu = when(q >= 0, lit(1.0) / (lit(1.0) + e))
      .otherwise(e / (lit(1.0) + e))
    val wq = floor((mu * (lit(1.0) - mu)) * lit(QScale))
    val gq = floor((y.cast("double") - mu) * lit(QScale))
    val muq = floor(mu * lit(QScale))
    (wq, gq, muq)
  }

  /** DuckDB rendering of [[rowCols]] as a layered CTE block over
    * `dataCte(x BIGINT, y BIGINT)` and `betaCte(b0, b1)`; the final
    * CTE `${p}f` carries x, y, wq, gq, muq. */
  def rowSql(p: String, dataCte: String, betaCte: String): String =
    s"""${p}a AS (
           SELECT d.x, d.y,
                  (b.b0 + (b.b1 * CAST(d.x AS DOUBLE))) AS eta
           FROM $dataCte d, $betaCte b),
         ${p}b AS (
           SELECT *, CAST(floor(greatest(${dlit(-EtaMaxQ)},
                  least(${dlit(EtaMaxQ)}, (eta * ${dlit(EtaScale)}))))
                  AS BIGINT) AS q
           FROM ${p}a),
         ${p}c AS (SELECT *, abs(q) AS aq FROM ${p}b),
         ${p}d AS (
           SELECT *, ${(0 until NBits).map { k =>
             s"(CASE WHEN ((aq >> $k) & 1) = 1 THEN ${dlit(C(k))} " +
               "ELSE 1.0e0 END)"
           }.reduceLeft((a, b) => s"($a * $b)")} AS ex
           FROM ${p}c),
         ${p}e AS (
           SELECT *, CASE WHEN q >= 0 THEN (1.0e0 / (1.0e0 + ex))
                          ELSE (ex / (1.0e0 + ex)) END AS mu
           FROM ${p}d),
         ${p}f AS (
           SELECT x, y,
                  CAST(floor((mu * (1.0e0 - mu)) * ${dlit(QScale)})
                       AS BIGINT) AS wq,
                  CAST(floor((CAST(y AS DOUBLE) - mu) *
                             ${dlit(QScale)}) AS BIGINT) AS gq,
                  CAST(floor(mu * ${dlit(QScale)}) AS BIGINT) AS muq
           FROM ${p}e)"""

  final case class Fit(beta0: Double, beta1: Double, n: Long,
                       sumMuQ: java.math.BigDecimal)

  private def toD(v: Any): Double = v match {
    case l: java.lang.Long       => l.toDouble
    case d: java.math.BigDecimal => d.doubleValue
    case d: scala.math.BigDecimal => d.doubleValue
    case null                    => 0.0 // empty input
    case x => throw new IllegalStateException(s"moment: $x")
  }

  /** One Newton step over the (sw, swx, swxx, sg, sgx) moments —
    * keep in LOCKSTEP with [[stepSql]]. */
  private def step(b0: Double, b1: Double, m: Row)
      : (Double, Double) = {
    val sw = toD(m.get(1)); val swx = toD(m.get(2))
    val swxx = toD(m.get(3)); val sg = toD(m.get(4))
    val sgx = toD(m.get(5))
    val det = (sw * swxx) - (swx * swx)
    if ((det * det) >= 1e-24)
      (b0 + (((sg * swxx) - (sgx * swx)) / det),
       b1 + (((sw * sgx) - (swx * sg)) / det))
    else (b0, b1)
  }

  private def stepSql(t: Int): String =
    s"""dt$t AS (
           SELECT *, ((sw * swxx) - (swx * swx)) AS det FROM mt$t),
         bt$t AS (
           SELECT CASE WHEN (det * det) >= 1e-24
                       THEN (b.b0 + (((sg * swxx) - (sgx * swx))
                                     / det))
                       ELSE b.b0 END AS b0,
                  CASE WHEN (det * det) >= 1e-24
                       THEN (b.b1 + (((sw * sgx) - (swx * sg))
                                     / det))
                       ELSE b.b1 END AS b1
           FROM dt$t, bt${t - 1} b)"""

  private def momentSql(t: Int, rowsCte: String,
                        readoutOnly: Boolean): String =
    if (readoutOnly)
      s"""mt$t AS (
           SELECT count(*)::BIGINT AS n,
                  coalesce(sum(CAST(muq AS HUGEINT)), 0) AS smu
           FROM $rowsCte)"""
    else
      s"""mt$t AS (
           SELECT count(*)::DOUBLE AS n,
                  sum(CAST(wq AS HUGEINT))::DOUBLE AS sw,
                  sum(CAST(wq * x AS HUGEINT))::DOUBLE AS swx,
                  sum(CAST((wq * x) * x AS HUGEINT))::DOUBLE AS swxx,
                  sum(CAST(gq AS HUGEINT))::DOUBLE AS sg,
                  sum(CAST(gq * x AS HUGEINT))::DOUBLE AS sgx
           FROM $rowsCte)"""

  /** Fit: `iters` Newton steps from beta = 0, then one readout
    * aggregate (n + exact predicted-event mass) under the final
    * beta. iters + 1 scans total. */
  def fit(df: DataFrame, xCol: Column, yCol: Column,
          iters: Int = 3): Fit = {
    require(iters >= 1 && iters <= 8, "iters in [1, 8] — scans")
    val clean = df.where(xCol.isNotNull && yCol.isNotNull)
      .select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    var b0 = 0.0; var b1 = 0.0
    (1 to iters).foreach { _ =>
      val (wq, gq, _) = rowCols(col("__x"), col("__y"), b0, b1)
      val m = clean.agg(
        count(lit(1)).as("n"), dec(wq).as("sw"),
        dec(wq * col("__x")).as("swx"),
        dec((wq * col("__x")) * col("__x")).as("swxx"),
        dec(gq).as("sg"), dec(gq * col("__x")).as("sgx")).head()
      val (n0, n1) = step(b0, b1, m); b0 = n0; b1 = n1
    }
    val (_, _, muq) = rowCols(col("__x"), col("__y"), b0, b1)
    val r = clean.agg(count(lit(1)).as("n"), dec(muq).as("smu")).head()
    val smu = r.get(1) match {
      case d: java.math.BigDecimal  => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case null                     => java.math.BigDecimal.ZERO
      case x => throw new IllegalStateException(s"smu: $x")
    }
    Fit(b0, b1, r.getLong(0), smu)
  }

  /** The identical fit from an (x, y, cnt) HISTOGRAM — every per-row
    * quantity depends only on (x, y), so the row-level moments factor
    * EXACTLY through the cell table: sum_rows wq(x_i) =
    * sum_cells cnt * wq(x), an integer identity, making this
    * bit-identical to [[fit]] on the expanded rows. Two uses at
    * scale: (a) the streaming twin — cells are a bounded additive
    * monoid (|x domain| * 2 entries), so incremental ingest
    * accumulates cells and the fit never re-reads the corpus;
    * (b) bounded-cardinality x collapses the iters+1 corpus scans of
    * [[fit]] to ONE histogram scan plus driver-sized cell passes. */
  def fitFromCells(cells: DataFrame, xCol: Column, yCol: Column,
                   cntCol: Column, iters: Int = 3): Fit = {
    require(iters >= 1 && iters <= 8, "iters in [1, 8]")
    val clean = cells
      .where(xCol.isNotNull && yCol.isNotNull && cntCol.isNotNull)
      .select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"),
              cntCol.cast("long").as("__c"))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val cnt = col("__c")
    var b0 = 0.0; var b1 = 0.0
    (1 to iters).foreach { _ =>
      val (wq, gq, _) = rowCols(col("__x"), col("__y"), b0, b1)
      val m = clean.agg(
        dec(cnt).as("n"), dec(cnt * wq).as("sw"),
        dec((cnt * wq) * col("__x")).as("swx"),
        dec(((cnt * wq) * col("__x")) * col("__x")).as("swxx"),
        dec(cnt * gq).as("sg"),
        dec((cnt * gq) * col("__x")).as("sgx")).head()
      val (n0, n1) = step(b0, b1, m); b0 = n0; b1 = n1
    }
    val (_, _, muq) = rowCols(col("__x"), col("__y"), b0, b1)
    val r = clean.agg(dec(cnt).as("n"), dec(cnt * muq).as("smu"))
      .head()
    def big(v: Any): java.math.BigDecimal = v match {
      case d: java.math.BigDecimal  => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case null                     => java.math.BigDecimal.ZERO
      case x => throw new IllegalStateException(s"cell sum: $x")
    }
    Fit(b0, b1, big(r.get(0)).longValueExact, big(r.get(1)))
  }

  /** Full oracle CTE chain: `lgd` (integer inputs) + per-iteration
    * row/moment/step blocks + the `mt${iters + 1}` readout. Compose
    * the final SELECT over `bt$iters` (b0, b1) and
    * `mt${iters + 1}` (n, smu). */
  def oracleCtes(table: String, xSql: String, ySql: String,
                 where: String, iters: Int = 3): String = {
    val blocks = (1 to iters).map { t =>
      s"""${rowSql(s"rt$t", "lgd", s"bt${t - 1}")},
         ${momentSql(t, s"rt${t}f", readoutOnly = false)},
         ${stepSql(t)}"""
    }
    val ro = iters + 1
    s"""lgd AS MATERIALIZED (
           SELECT CAST($xSql AS BIGINT) AS x,
                  CAST($ySql AS BIGINT) AS y
           FROM $table$where),
         bt0 AS (SELECT 0.0e0 AS b0, 0.0e0 AS b1),
         ${blocks.mkString(",\n         ")},
         ${rowSql(s"rt$ro", "lgd", s"bt$iters")},
         ${momentSql(ro, s"rt${ro}f", readoutOnly = true)}"""
  }
}
