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
      // sigmoid chain computed once per cell in a project below the
      // aggregate (see fitMultiFromCells) — identical doubles, the
      // aggregate's multiply structure is unchanged
      val (wqE, gqE, _) = rowCols(col("__x"), col("__y"), b0, b1)
      val proj = clean.select(cnt, col("__x"),
                              wqE.as("__wq"), gqE.as("__gq"))
      val wq = col("__wq"); val gq = col("__gq")
      val m = proj.agg(
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

  // ------------------------------------------------------------------
  // MULTI-FEATURE logistic (k >= 1): the same quantized-Newton chain
  // with the (k+1)x(k+1) Cramer step expressed in ExactFit's shared
  // IR — ONE Def program evaluated on the driver and rendered to the
  // oracle's layered CTEs, so the step generalizes without a second
  // hand-paired formula. The k = 1 entry points above stay as the
  // documented lockstep pair behind the original q_logreg_exact
  // contract.
  // ------------------------------------------------------------------

  /** Per-row (wq, gq, muq) under beta(0..k) for feature columns
    * `xs` — the k-ary twin of [[rowCols]]; keep in LOCKSTEP with
    * [[rowSqlK]] (same fold order: b0, then + b_i * x_i left to
    * right). */
  def rowColsK(xs: Seq[Column], y: Column, beta: Seq[Double])
      : (Column, Column, Column) = {
    require(beta.length == xs.length + 1)
    val eta = xs.zipWithIndex.foldLeft(lit(beta(0)): Column) {
      case (acc, (x, i)) => acc + (lit(beta(i + 1)) * x.cast("double"))
    }
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

  /** DuckDB rendering of [[rowColsK]] over `dataCte(x0..x{k-1}, y)`
    * and `betaCte(b0..bk)`; final CTE `${p}f` carries the features,
    * y, wq, gq, muq. */
  def rowSqlK(p: String, dataCte: String, betaCte: String,
              k: Int, extra: Seq[String] = Nil): String = {
    val xCols = ((0 until k).map(i => s"d.x$i") ++
      extra.map(c => s"d.$c")).mkString(", ")
    val eta = (0 until k).foldLeft("b.b0") { (acc, i) =>
      s"($acc + (b.b${i + 1} * CAST(d.x$i AS DOUBLE)))"
    }
    val keep = ((0 until k).map(i => s"x$i") ++ extra).mkString(", ")
    s"""${p}a AS (
           SELECT $xCols, d.y, $eta AS eta
           FROM $dataCte d, $betaCte b),
         ${p}b AS (
           SELECT *, CAST(floor(greatest(${dlit(-EtaMaxQ)},
                  least(${dlit(EtaMaxQ)}, (eta * ${dlit(EtaScale)}))))
                  AS BIGINT) AS q
           FROM ${p}a),
         ${p}c AS (SELECT *, abs(q) AS aq FROM ${p}b),
         ${p}d AS (
           SELECT *, ${(0 until NBits).map { j =>
             s"(CASE WHEN ((aq >> $j) & 1) = 1 THEN ${dlit(C(j))} " +
               "ELSE 1.0e0 END)"
           }.reduceLeft((a, b) => s"($a * $b)")} AS ex
           FROM ${p}c),
         ${p}e AS (
           SELECT *, CASE WHEN q >= 0 THEN (1.0e0 / (1.0e0 + ex))
                          ELSE (ex / (1.0e0 + ex)) END AS mu
           FROM ${p}d),
         ${p}f AS (
           SELECT $keep, y,
                  CAST(floor((mu * (1.0e0 - mu)) * ${dlit(QScale)})
                       AS BIGINT) AS wq,
                  CAST(floor((CAST(y AS DOUBLE) - mu) *
                             ${dlit(QScale)}) AS BIGINT) AS gq,
                  CAST(floor(mu * ${dlit(QScale)}) AS BIGINT) AS muq
           FROM ${p}e)"""
  }

  /** The (k+1)x(k+1) Newton step as a shared IR program over the
    * moment refs (sw, swx_i, sww_i_j, sg, sgx_i) and the previous
    * beta refs (b0..bk): defines nb0..nbk. ONE tree — evaluated on
    * the driver with ExactFit.ev and rendered to SQL with
    * ExactFit.layeredCtes, so both engines run the identical op
    * sequence (the fitOLS precedent). */
  def stepDefs(k: Int): Seq[ExactFit.Def] = {
    import ExactFit._
    def w(i: Int, j: Int): Ex = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      R(s"sww_${a}_$b")
    }
    val dim = k + 1
    val mat = Vector.tabulate(dim, dim) { (r, c) =>
      (r, c) match {
        case (0, 0)   => R("sw")
        case (0, cc)  => R(s"swx${cc - 1}")
        case (rr, 0)  => R(s"swx${rr - 1}")
        case (rr, cc) => w(rr - 1, cc - 1)
      }
    }
    val rhs = Vector(R("sg"): Ex) ++
      (0 until k).map(i => R(s"sgx$i"): Ex)
    val defs = collection.mutable.ArrayBuffer.empty[Def]
    defs += DefD("lg_d", det(mat))
    for (u <- 0 until dim) {
      val rep = Vector.tabulate(dim, dim) { (r, c) =>
        if (c == u) rhs(r) else mat(r)(c)
      }
      defs += DefD(s"lg_n$u", det(rep))
    }
    val ok: Bx =
      Cmp(">=", Op('*', R("lg_d"), R("lg_d")), Cst(1e-24))
    for (u <- 0 until dim)
      defs += DefD(s"nb$u",
        Pick(Seq(ok -> Op('+', R(s"b$u"),
                          Op('/', R(s"lg_n$u"), R("lg_d")))),
             R(s"b$u")))
    defs.toSeq
  }

  final case class FitK(beta: Vector[Double], n: Long,
                        sumMuQ: java.math.BigDecimal)

  /** k-feature fit: `iters` IR-stepped Newton iterations from
    * beta = 0, then one readout aggregate. Feature columns must be
    * integer-valued with |x_i * x_j| * 2^22 inside BIGINT. */
  def fitMulti(df: DataFrame, xCols: Seq[Column], yCol: Column,
               iters: Int = 3): FitK = {
    require(iters >= 1 && iters <= 8 && xCols.nonEmpty)
    val k = xCols.length
    val clean = df.where(xCols.map(_.isNotNull)
                           .reduceLeft(_ && _) && yCol.isNotNull)
      .select(xCols.zipWithIndex.map { case (c, i) =>
                c.cast("long").as(s"__x$i") } :+
              yCol.cast("long").as("__y"): _*)
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val xs = (0 until k).map(i => col(s"__x$i"))
    var beta = Vector.fill(k + 1)(0.0)
    (1 to iters).foreach { _ =>
      val (wq, gq, _) = rowColsK(xs, col("__y"), beta)
      val aggs = Seq(dec(wq).as("sw")) ++
        xs.zipWithIndex.map { case (x, i) =>
          dec(wq * x).as(s"swx$i") } ++
        (for (i <- 0 until k; j <- i until k)
          yield dec((wq * xs(i)) * xs(j)).as(s"sww_${i}_$j")) ++
        Seq(dec(gq).as("sg")) ++
        xs.zipWithIndex.map { case (x, i) => dec(gq * x).as(s"sgx$i") }
      val row = clean.agg(aggs.head, aggs.tail: _*).head()
      val env = ExactFit.Env(collection.mutable.Map.empty,
                             collection.mutable.Map.empty)
      row.schema.fieldNames.zipWithIndex.foreach { case (nm, i) =>
        env.d(nm) = toD(row.get(i))
      }
      beta.zipWithIndex.foreach { case (b, u) => env.d(s"b$u") = b }
      stepDefs(k).foreach {
        case ExactFit.DefD(n, e) => env.d(n) = ExactFit.ev(e, env)
        case ExactFit.DefB(n, b) => env.b(n) = ExactFit.bv(b, env)
      }
      beta = Vector.tabulate(k + 1)(u => env.d(s"nb$u"))
    }
    val (_, _, muq) = rowColsK(xs, col("__y"), beta)
    val r = clean.agg(count(lit(1)).as("n"), dec(muq).as("smu")).head()
    val smu = r.get(1) match {
      case d: java.math.BigDecimal  => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case null                     => java.math.BigDecimal.ZERO
      case x => throw new IllegalStateException(s"smu: $x")
    }
    FitK(beta, r.getLong(0), smu)
  }

  /** Sample-WEIGHTED k-feature fit (the weighted-OLS/QP discipline:
    * an integer weight w means "this row counted w times", so every
    * moment multiplies by w and stays an exact DECIMAL sum —
    * weighted == row-replicated bit-identically, and zero-weight
    * rows are exactly invisible). The per-row sigmoid chain is
    * untouched: weights enter at the aggregate only. */
  def fitMultiWeighted(df: DataFrame, xCols: Seq[Column],
                       yCol: Column, wCol: Column,
                       iters: Int = 3): FitK = {
    require(iters >= 1 && iters <= 8 && xCols.nonEmpty)
    val k = xCols.length
    val clean = df.where(xCols.map(_.isNotNull)
                           .reduceLeft(_ && _) && yCol.isNotNull &&
                         wCol.isNotNull)
      .select(xCols.zipWithIndex.map { case (c, i) =>
                c.cast("long").as(s"__x$i") } ++
              Seq(yCol.cast("long").as("__y"),
                  round(wCol).cast("long").as("__w")): _*)
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val xs = (0 until k).map(i => col(s"__x$i"))
    val w = col("__w")
    var beta = Vector.fill(k + 1)(0.0)
    (1 to iters).foreach { _ =>
      val (wq, gq, _) = rowColsK(xs, col("__y"), beta)
      val aggs = Seq(dec(w * wq).as("sw")) ++
        xs.zipWithIndex.map { case (x, i) =>
          dec((w * wq) * x).as(s"swx$i") } ++
        (for (i <- 0 until k; j <- i until k)
          yield dec(((w * wq) * xs(i)) * xs(j)).as(s"sww_${i}_$j")) ++
        Seq(dec(w * gq).as("sg")) ++
        xs.zipWithIndex.map { case (x, i) =>
          dec((w * gq) * x).as(s"sgx$i") }
      val row = clean.agg(aggs.head, aggs.tail: _*).head()
      val env = ExactFit.Env(collection.mutable.Map.empty,
                             collection.mutable.Map.empty)
      row.schema.fieldNames.zipWithIndex.foreach { case (nm, i) =>
        env.d(nm) = toD(row.get(i))
      }
      beta.zipWithIndex.foreach { case (b, u) => env.d(s"b$u") = b }
      stepDefs(k).foreach {
        case ExactFit.DefD(n, e) => env.d(n) = ExactFit.ev(e, env)
        case ExactFit.DefB(n, b) => env.b(n) = ExactFit.bv(b, env)
      }
      beta = Vector.tabulate(k + 1)(u => env.d(s"nb$u"))
    }
    val (_, _, muq) = rowColsK(xs, col("__y"), beta)
    val r = clean.agg(dec(w).as("n"), dec(w * muq).as("smu")).head()
    def big(v: Any): java.math.BigDecimal = v match {
      case d: java.math.BigDecimal  => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case null                     => java.math.BigDecimal.ZERO
      case x => throw new IllegalStateException(s"wsum: $x")
    }
    FitK(beta, big(r.get(0)).longValueExact, big(r.get(1)))
  }

  /** The identical k-feature fit from an (x0..x{k-1}, y, cnt)
    * HISTOGRAM — [[fitFromCells]]' factoring applied to [[fitMulti]]
    * / [[fitMultiWeighted]]: every per-row quantity depends only on
    * (x_vec, y), so each row-level moment factors EXACTLY through
    * the cell table (sum_rows f = sum_cells cnt * f — the proven
    * weighted==replicated identity with cnt as the weight). For a
    * weighted fit, pass cnt = sum of the integer weights per cell:
    * sum_rows w_i * f(x_i, y_i) = sum_cells (sum w) * f(x, y) by the
    * same identity. The cnt multiply runs in DECIMAL, not DOUBLE:
    * per-row integer quantities stay < 2^53 by the [[fitMulti]]
    * precondition, but cnt * wq * x_i * x_j can pass 2^53 on large
    * cells, so each per-row product is cast to DECIMAL(38,0) BEFORE
    * the cnt multiply — the sum is the same exact integer
    * [[fitMulti]] accumulates row-wise, hence bit-identical betas
    * and readouts. Collapses the iters + 1 corpus scans to ONE
    * histogram scan plus cell-table passes whenever the x-domain is
    * bounded (guide §2.3/§2.4: aggregate before you iterate). */
  def fitMultiFromCells(cells: DataFrame, xCols: Seq[Column],
                        yCol: Column, cntCol: Column,
                        iters: Int = 3): FitK = {
    require(iters >= 1 && iters <= 8 && xCols.nonEmpty)
    val k = xCols.length
    val clean = cells.where(xCols.map(_.isNotNull)
                              .reduceLeft(_ && _) && yCol.isNotNull &&
                            cntCol.isNotNull)
      .select(xCols.zipWithIndex.map { case (c, i) =>
                c.cast("long").as(s"__x$i") } ++
              Seq(yCol.cast("long").as("__y"),
                  cntCol.cast("decimal(38,0)").as("__c")): _*)
    val cnt = col("__c")
    // exact cell moment: per-row quantity -> DECIMAL, then * cnt
    def dec(c: Column): Column = sum(cnt * c.cast("decimal(38,0)"))
    val xs = (0 until k).map(i => col(s"__x$i"))
    var beta = Vector.fill(k + 1)(0.0)
    (1 to iters).foreach { _ =>
      // the ~40-op sigmoid chain is materialized ONCE per cell in a
      // project below the aggregate (the bootstrapStats lesson) —
      // inlined into all (k+1)(k+4)/2 aggregate arguments it blows
      // the expression tree up ~10x, and Catalyst re-analyzes that
      // tree on the driver for every Newton job. Same doubles: the
      // aggregate multiplies the projected value exactly as before.
      val (wqE, gqE, _) = rowColsK(xs, col("__y"), beta)
      val proj = clean.select(
        (cnt +: xs) ++ Seq(wqE.as("__wq"), gqE.as("__gq")): _*)
      val wq = col("__wq"); val gq = col("__gq")
      val aggs = Seq(dec(wq).as("sw")) ++
        xs.zipWithIndex.map { case (x, i) =>
          dec(wq * x).as(s"swx$i") } ++
        (for (i <- 0 until k; j <- i until k)
          yield dec((wq * xs(i)) * xs(j)).as(s"sww_${i}_$j")) ++
        Seq(dec(gq).as("sg")) ++
        xs.zipWithIndex.map { case (x, i) => dec(gq * x).as(s"sgx$i") }
      val row = proj.agg(aggs.head, aggs.tail: _*).head()
      val env = ExactFit.Env(collection.mutable.Map.empty,
                             collection.mutable.Map.empty)
      row.schema.fieldNames.zipWithIndex.foreach { case (nm, i) =>
        env.d(nm) = toD(row.get(i))
      }
      beta.zipWithIndex.foreach { case (b, u) => env.d(s"b$u") = b }
      stepDefs(k).foreach {
        case ExactFit.DefD(n, e) => env.d(n) = ExactFit.ev(e, env)
        case ExactFit.DefB(n, b) => env.b(n) = ExactFit.bv(b, env)
      }
      beta = Vector.tabulate(k + 1)(u => env.d(s"nb$u"))
    }
    val (_, _, muq) = rowColsK(xs, col("__y"), beta)
    val r = clean.agg(sum(cnt).as("n"), dec(muq).as("smu")).head()
    def big(v: Any): java.math.BigDecimal = v match {
      case d: java.math.BigDecimal  => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case null                     => java.math.BigDecimal.ZERO
      case x => throw new IllegalStateException(s"cell sum: $x")
    }
    FitK(beta, big(r.get(0)).longValueExact, big(r.get(1)))
  }

  /** Weighted k-feature oracle chain — [[oracleCtesK]] with a weight
    * expression riding into every moment (`lgd` gains a `w` column;
    * the row blocks pass it through untouched). */
  def oracleCtesKWeighted(table: String, xSqls: Seq[String],
                          ySql: String, wSql: String, where: String,
                          iters: Int = 3): String = {
    val k = xSqls.length
    def momentK(t: Int): String = {
      val cols = Seq(s"sum(CAST(w * wq AS HUGEINT))::DOUBLE AS sw") ++
        (0 until k).map(i =>
          s"sum(CAST((w * wq) * x$i AS HUGEINT))::DOUBLE AS swx$i") ++
        (for (i <- 0 until k; j <- i until k) yield
          s"sum(CAST(((w * wq) * x$i) * x$j AS HUGEINT))::DOUBLE" +
            s" AS sww_${i}_$j") ++
        Seq("sum(CAST(w * gq AS HUGEINT))::DOUBLE AS sg") ++
        (0 until k).map(i =>
          s"sum(CAST((w * gq) * x$i AS HUGEINT))::DOUBLE AS sgx$i")
      s"""mt$t AS (
           SELECT ${cols.mkString(",\n                  ")}
           FROM rt${t}f)"""
    }
    def stepK(t: Int): String = {
      val stepped = ExactFit.layeredCtes(
        stepDefs(k), s"ct$t", s"cl${t}_", s"cf$t")
      s"""ct$t AS (SELECT * FROM mt$t, bt${t - 1}),
         $stepped,
         bt$t AS (SELECT ${(0 to k).map(u => s"nb$u AS b$u")
             .mkString(", ")} FROM cf$t)"""
    }
    def rowBlock(p: String, betaCte: String): String =
      rowSqlK(p, "lgd", betaCte, k, extra = Seq("w"))
    val blocks = (1 to iters).map { t =>
      s"""${rowBlock(s"rt$t", s"bt${t - 1}")},
         ${momentK(t)},
         ${stepK(t)}"""
    }
    val ro = iters + 1
    s"""lgd AS MATERIALIZED (
           SELECT ${xSqls.zipWithIndex.map { case (x, i) =>
             s"CAST($x AS BIGINT) AS x$i" }.mkString(",\n                  ")},
                  CAST($ySql AS BIGINT) AS y,
                  CAST(round($wSql) AS BIGINT) AS w
           FROM $table$where),
         bt0 AS (SELECT ${(0 to k).map(u => s"0.0e0 AS b$u")
             .mkString(", ")}),
         ${blocks.mkString(",\n         ")},
         ${rowBlock(s"rt$ro", s"bt$iters")},
         mt$ro AS (
           SELECT coalesce(sum(CAST(w AS HUGEINT)), 0)::BIGINT AS n,
                  coalesce(sum(CAST(w * muq AS HUGEINT)), 0) AS smu
           FROM rt${ro}f)"""
  }

  /** k-feature oracle chain: per-iteration row block + moment CTE +
    * the IR step rendered via layeredCtes over the (moments x prev
    * beta) cross join; final beta CTE `bt$iters` (b0..bk) and
    * readout `mt${iters + 1}` (n, smu). */
  def oracleCtesK(table: String, xSqls: Seq[String], ySql: String,
                  where: String, iters: Int = 3): String = {
    val k = xSqls.length
    def momentK(t: Int): String = {
      val cols = Seq(s"sum(CAST(wq AS HUGEINT))::DOUBLE AS sw") ++
        (0 until k).map(i =>
          s"sum(CAST(wq * x$i AS HUGEINT))::DOUBLE AS swx$i") ++
        (for (i <- 0 until k; j <- i until k) yield
          s"sum(CAST((wq * x$i) * x$j AS HUGEINT))::DOUBLE" +
            s" AS sww_${i}_$j") ++
        Seq("sum(CAST(gq AS HUGEINT))::DOUBLE AS sg") ++
        (0 until k).map(i =>
          s"sum(CAST(gq * x$i AS HUGEINT))::DOUBLE AS sgx$i")
      s"""mt$t AS (
           SELECT ${cols.mkString(",\n                  ")}
           FROM rt${t}f)"""
    }
    def stepK(t: Int): String = {
      val stepped = ExactFit.layeredCtes(
        stepDefs(k), s"ct$t", s"cl${t}_", s"cf$t")
      s"""ct$t AS (SELECT * FROM mt$t, bt${t - 1}),
         $stepped,
         bt$t AS (SELECT ${(0 to k).map(u => s"nb$u AS b$u")
             .mkString(", ")} FROM cf$t)"""
    }
    val blocks = (1 to iters).map { t =>
      s"""${rowSqlK(s"rt$t", "lgd", s"bt${t - 1}", k)},
         ${momentK(t)},
         ${stepK(t)}"""
    }
    val ro = iters + 1
    s"""lgd AS MATERIALIZED (
           SELECT ${xSqls.zipWithIndex.map { case (x, i) =>
             s"CAST($x AS BIGINT) AS x$i" }.mkString(",\n                  ")},
                  CAST($ySql AS BIGINT) AS y
           FROM $table$where),
         bt0 AS (SELECT ${(0 to k).map(u => s"0.0e0 AS b$u")
             .mkString(", ")}),
         ${blocks.mkString(",\n         ")},
         ${rowSqlK(s"rt$ro", "lgd", s"bt$iters", k)},
         mt$ro AS (
           SELECT count(*)::BIGINT AS n,
                  coalesce(sum(CAST(muq AS HUGEINT)), 0) AS smu
           FROM rt${ro}f)"""
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
