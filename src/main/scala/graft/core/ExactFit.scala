package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{lit => flit}

/** Exact distributed piecewise-linear least squares at PINNED knots —
  * the scale path of the piecewise binning family
  * (`optbinning/binning/piecewise/base.py:459-476`: the objective is
  * deterministic given the knots; the reference delegates to a convex
  * solver, here the pinned-knot degree-1 case is solved in closed
  * form from sufficient statistics).
  *
  * Why this exists next to [[graft.operators.PWBinning]]'s
  * histogram+IRLS solver: at 100 TB the fit should be ONE distributed
  * aggregate, not a value-histogram collect. With integer-scaled
  * inputs (cents, tenths) every basis value is an exact BIGINT, the
  * sufficient statistics are exact DECIMAL(38,0)/HUGEINT sums —
  * bit-identical in any engine — and the (k+2)-dim normal-equation
  * solve is a deterministic double-precision expression over them.
  * The whole fit therefore replays EXACTLY in ANSI SQL at any scale
  * factor: the same expression tree is evaluated on the driver and
  * rendered as oracle SQL (one shared IR, so the op order is
  * identical by construction), which is what de-pins the piecewise
  * driver oracles.
  *
  * Basis: segment-coverage lengths. For knots t_1 < .. < t_k (scaled
  * to integers T_j), `len_0(X) = min(X, T_1)`,
  * `len_m(X) = max(0, min(X, T_{m+1}) - T_m)`,
  * `len_k(X) = max(0, X - T_k)`; the curve is
  * `f(X) = a + sum_m s_m * len_m(X)` — continuous piecewise-linear
  * with per-segment slopes `s_m` (an exact reparametrization of the
  * truncated-power basis, much better conditioned). Monotone
  * ascending/descending solves the convex QP `s_m >= 0` (resp
  * `<= 0`) EXACTLY by enumerating equality active sets (2^(k+1)
  * candidates, k <= 6): the optimum's active set appears, every
  * feasible candidate's SSE is >= the optimum, and the winner
  * selection (min score, ties -> lowest mask) is replayed in SQL as
  * comparisons over the same bit-identical doubles.
  *
  * Conditioning: x-like moment columns are scaled by a caller-pinned
  * POWER OF TWO before the solve — exact in IEEE doubles, so parity
  * is untouched while the Cramer determinants stay well-conditioned.
  */
object ExactFit {

  // ------------------------------------------------------------------
  // shared scalar-expression IR: evaluated on the driver AND rendered
  // to SQL from the same tree, so both engines run the identical IEEE
  // op sequence over identical inputs
  // ------------------------------------------------------------------
  sealed trait Ex
  final case class R(name: String) extends Ex
  final case class Cst(v: Double) extends Ex
  final case class Op(op: Char, a: Ex, b: Ex) extends Ex
  final case class Pick(cases: Seq[(Bx, Ex)], otherwise: Ex) extends Ex

  sealed trait Bx
  final case class RB(name: String) extends Bx
  final case class Cmp(op: String, a: Ex, b: Ex) extends Bx
  final case class All(xs: Seq[Bx]) extends Bx
  final case class AnyB(xs: Seq[Bx]) extends Bx
  final case class NotB(x: Bx) extends Bx

  sealed trait Def
  final case class DefD(name: String, ex: Ex) extends Def
  final case class DefB(name: String, bx: Bx) extends Def

  final case class Env(d: collection.mutable.Map[String, Double],
                       b: collection.mutable.Map[String, Boolean])

  def ev(e: Ex, env: Env): Double = e match {
    case R(n)          => env.d(n)
    case Cst(v)        => v
    case Op('+', a, b) => ev(a, env) + ev(b, env)
    case Op('-', a, b) => ev(a, env) - ev(b, env)
    case Op('*', a, b) => ev(a, env) * ev(b, env)
    case Op('/', a, b) => ev(a, env) / ev(b, env)
    case Op(o, _, _)   => throw new IllegalArgumentException(o.toString)
    case Pick(cs, o) =>
      cs.find(c => bv(c._1, env)).map(c => ev(c._2, env))
        .getOrElse(ev(o, env))
  }

  def bv(x: Bx, env: Env): Boolean = x match {
    case RB(n)          => env.b(n)
    case Cmp(">=", a, b) => ev(a, env) >= ev(b, env)
    case Cmp("<=", a, b) => ev(a, env) <= ev(b, env)
    case Cmp("<", a, b)  => ev(a, env) < ev(b, env)
    case Cmp(o, _, _)    => throw new IllegalArgumentException(o)
    case All(xs)        => xs.forall(bv(_, env))
    case AnyB(xs)       => xs.exists(bv(_, env))
    case NotB(y)        => !bv(y, env)
  }

  /** Exact decimal expansion of the double — parses back to the same
    * bits in any correctly-rounding reader. */
  def dlit(v: Double): String =
    if (v == 0.0) "0.0"
    else if (v == v.toLong.toDouble && math.abs(v) < 9.0e15)
      s"${v.toLong}.0"
    else new java.math.BigDecimal(v).toPlainString

  def sqlEx(e: Ex): String = e match {
    case R(n)        => n
    case Cst(v)      => dlit(v)
    case Op(o, a, b) => s"(${sqlEx(a)} $o ${sqlEx(b)})"
    case Pick(cs, o) =>
      cs.map { case (c, v) => s"WHEN ${sqlBx(c)} THEN ${sqlEx(v)}" }
        .mkString("CASE ", " ", s" ELSE ${sqlEx(o)} END")
  }

  def sqlBx(x: Bx): String = x match {
    case RB(n)        => n
    case Cmp(o, a, b) => s"(${sqlEx(a)} $o ${sqlEx(b)})"
    case All(xs)  => if (xs.isEmpty) "TRUE"
                     else xs.map(sqlBx).mkString("(", " AND ", ")")
    case AnyB(xs) => if (xs.isEmpty) "FALSE"
                     else xs.map(sqlBx).mkString("(", " OR ", ")")
    case NotB(y)  => s"(NOT ${sqlBx(y)})"
  }

  // fixed-order helpers (left fold keeps the op sequence deterministic)
  private def sumEx(xs: Seq[Ex]): Ex = xs.reduceLeft(Op('+', _, _))
  private def mul(a: Ex, b: Ex): Ex = Op('*', a, b)

  /** Determinant by first-row cofactor expansion in a FIXED order —
    * the same tree evaluates on the driver and renders to SQL.
    * Public: the IR is a general exact-replay engine (the Markov
    * attribution solve reuses it). */
  def det(m: Vector[Vector[Ex]]): Ex = m.length match {
    case 1 => m(0)(0)
    case n =>
      val terms = (0 until n).map { j =>
        val minor = m.tail.map(row =>
          row.zipWithIndex.collect { case (e, c) if c != j => e })
        (j % 2 == 0, mul(m(0)(j), det(minor)))
      }
      terms.tail.foldLeft(terms.head._2) {
        case (acc, (pos, t)) =>
          if (pos) Op('+', acc, t) else Op('-', acc, t)
      }
  }

  // ------------------------------------------------------------------
  // piecewise-linear spec
  // ------------------------------------------------------------------

  /** @param knots      pinned knot positions in RAW x units; must be
    *                   exactly representable once scaled by xScale
    * @param xScale     integer scaling making x exact (100 for cents)
    * @param yScale     integer scaling making y exact (1 for a 0/1
    *                   target, 100 for money)
    * @param condPow2   power-of-two column equilibration for the
    *                   solve (pick near max |len|) — exact in IEEE
    * @param trend      None | Some("ascending") | Some("descending")
    */
  final case class PWSpec(knots: Array[Double], xScale: Long,
                          yScale: Long, condPow2: Double,
                          trend: Option[String]) {
    require(knots.nonEmpty && knots.sameElements(knots.sorted),
            "knots must be non-empty ascending")
    require(trend.forall(t => t == "ascending" || t == "descending"),
            s"trend $trend not supported")
    val tInt: Array[Long] = knots.map { t =>
      val s = t * xScale
      require(s == math.rint(s),
              s"knot $t not exact at scale $xScale")
      s.toLong
    }
    require({
      val b = java.lang.Double.doubleToLongBits(condPow2)
      condPow2 > 0 && (b & 0x000fffffffffffffL) == 0L
    }, "condPow2 must be a positive power of two")
    val nSeg: Int = knots.length + 1
    require(nSeg <= 7, "at most 6 knots (active-set enumeration)")
    val masks: Seq[Int] =
      if (trend.isDefined) 0 until (1 << nSeg) else Seq(0)
  }

  /** Segment-coverage length of segment m at integer point x (exact —
    * used for knot-value constants). */
  def lenAt(spec: PWSpec, m: Int, x: Long): Long = {
    val t = spec.tInt
    if (m == 0) math.min(x, t(0))
    else if (m < t.length)
      math.max(0L, math.min(x, t(m)) - t(m - 1))
    else math.max(0L, x - t(t.length - 1))
  }

  // ---------------- moment layer (must match 1:1 across engines) ----

  def momentNames(spec: PWSpec): Seq[String] = {
    val k = spec.nSeg
    Seq("n", "sy") ++
      (0 until k).map(i => s"s$i") ++
      (0 until k).map(i => s"sy$i") ++
      (for (i <- 0 until k; j <- i until k) yield s"s${i}_$j")
  }

  /** Spark-side exact moment aggregate expressions (DECIMAL(38,0)
    * sums of exact BIGINT products — bit-reproducible regardless of
    * partitioning). */
  def momentAggs(spec: PWSpec, xCol: Column, yCol: Column)
      : Seq[Column] = {
    val x = round(xCol * spec.xScale).cast("long")
    val y = round(yCol * spec.yScale).cast("long")
    val t = spec.tInt
    def len(m: Int): Column =
      if (m == 0) least(x, flit(t(0)))
      else if (m < t.length)
        greatest(flit(0L),
                 least(x, flit(t(m))) - flit(t(m - 1)))
      else greatest(flit(0L), x - flit(t(t.length - 1)))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val k = spec.nSeg
    Seq(count(flit(1)).as("n"), dec(y).as("sy")) ++
      (0 until k).map(i => dec(len(i)).as(s"s$i")) ++
      (0 until k).map(i => dec(len(i) * y).as(s"sy$i")) ++
      (for (i <- 0 until k; j <- i until k)
        yield dec(len(i) * len(j)).as(s"s${i}_$j"))
  }

  /** Sample-WEIGHTED piecewise moments (the binning family's
    * `sample_weight` fit parameter, `binning.py:538-562`): every
    * moment multiplied
    * by an integer weight, `n` = the weight total — exact DECIMAL
    * sums, so the weighted piecewise fit keeps full bit-parity. */
  def momentAggsWeighted(spec: PWSpec, xCol: Column, yCol: Column,
                         wCol: Column): Seq[Column] = {
    val x = round(xCol * spec.xScale).cast("long")
    val y = round(yCol * spec.yScale).cast("long")
    val w = round(wCol).cast("long")
    val t = spec.tInt
    def len(m: Int): Column =
      if (m == 0) least(x, flit(t(0)))
      else if (m < t.length)
        greatest(flit(0L),
                 least(x, flit(t(m))) - flit(t(m - 1)))
      else greatest(flit(0L), x - flit(t(t.length - 1)))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val k = spec.nSeg
    Seq(dec(w).as("n"), dec(w * y).as("sy")) ++
      (0 until k).map(i => dec(w * len(i)).as(s"s$i")) ++
      (0 until k).map(i => dec(w * len(i) * y).as(s"sy$i")) ++
      (for (i <- 0 until k; j <- i until k)
        yield dec(w * len(i) * len(j)).as(s"s${i}_$j"))
  }

  /** Weighted-moment oracle SQL (HUGEINT rendering of
    * [[momentAggsWeighted]]). */
  def momentSqlWeighted(spec: PWSpec, table: String, xSql: String,
                        ySql: String, wSql: String,
                        where: String = ""): String = {
    val x = s"CAST(round(($xSql) * ${spec.xScale}) AS BIGINT)"
    val y = s"CAST(round(($ySql) * ${spec.yScale}) AS BIGINT)"
    val w = s"CAST(round($wSql) AS BIGINT)"
    val t = spec.tInt
    def len(m: Int): String =
      if (m == 0) s"least($x, ${t(0)})"
      else if (m < t.length)
        s"greatest(0, least($x, ${t(m)}) - ${t(m - 1)})"
      else s"greatest(0, $x - ${t(t.length - 1)})"
    def dec(e: String): String = s"sum(CAST($e AS HUGEINT))::DOUBLE"
    val k = spec.nSeg
    val cols = Seq(s"${dec(w)} AS n", s"${dec(s"$w * $y")} AS sy") ++
      (0 until k).map(i => s"${dec(s"$w * ${len(i)}")} AS s$i") ++
      (0 until k).map(i =>
        s"${dec(s"$w * ${len(i)} * $y")} AS sy$i") ++
      (for (i <- 0 until k; j <- i until k)
        yield s"${dec(s"$w * ${len(i)} * ${len(j)}")} AS s${i}_$j")
    s"SELECT ${cols.mkString(",\n                ")}\n" +
      s"         FROM $table$where"
  }

  /** Weighted fit: one weighted moment aggregate + the shared
    * program (trend/QP supported — only the moments change). */
  def fitWeighted(df: DataFrame, xCol: Column, yCol: Column,
                  wCol: Column, spec: PWSpec): Solved = {
    val clean = df.where(xCol.isNotNull && yCol.isNotNull &&
                         wCol.isNotNull)
    val aggs = momentAggsWeighted(spec, xCol, yCol, wCol)
    val row: Row = clean.agg(aggs.head, aggs.tail: _*).head()
    val names = momentNames(spec)
    val env = Env(collection.mutable.Map.empty,
                  collection.mutable.Map.empty)
    names.zipWithIndex.foreach { case (nm, i) =>
      env.d(nm) = row.get(i) match {
        case l: java.lang.Long            => l.toDouble
        case d: java.math.BigDecimal      => d.doubleValue
        case d: scala.math.BigDecimal     => d.doubleValue
        case null                         => 0.0 // empty input
        case x => throw new IllegalStateException(s"$nm: $x")
      }
    }
    program(spec).foreach {
      case DefD(n, e) => env.d(n) = ev(e, env)
      case DefB(n, b) => env.b(n) = bv(b, env)
    }
    Solved(spec, env.d.toMap)
  }

  /** Weighted oracle CTEs `m` + `kf`. */
  def coefCtesWeighted(spec: PWSpec, table: String, xSql: String,
                       ySql: String, wSql: String,
                       where: String = ""): String =
    s"""m AS (
         ${momentSqlWeighted(spec, table, xSql, ySql, wSql, where)}),
       ${layeredCtes(program(spec), "m", "kl", "kf")}"""

  /** DuckDB-side moment CTE body — the same exact sums (HUGEINT),
    * cast to DOUBLE exactly like the driver's BigDecimal→double. */
  def momentSql(spec: PWSpec, table: String, xSql: String,
                ySql: String, where: String = ""): String = {
    val x = s"CAST(round(($xSql) * ${spec.xScale}) AS BIGINT)"
    val y = s"CAST(round(($ySql) * ${spec.yScale}) AS BIGINT)"
    val t = spec.tInt
    def len(m: Int): String =
      if (m == 0) s"least($x, ${t(0)})"
      else if (m < t.length)
        s"greatest(0, least($x, ${t(m)}) - ${t(m - 1)})"
      else s"greatest(0, $x - ${t(t.length - 1)})"
    def dec(e: String): String = s"sum(CAST($e AS HUGEINT))::DOUBLE"
    val k = spec.nSeg
    val cols = Seq(s"count(*)::DOUBLE AS n", s"${dec(y)} AS sy") ++
      (0 until k).map(i => s"${dec(len(i))} AS s$i") ++
      (0 until k).map(i => s"${dec(s"${len(i)} * $y")} AS sy$i") ++
      (for (i <- 0 until k; j <- i until k)
        yield s"${dec(s"${len(i)} * ${len(j)}")} AS s${i}_$j")
    s"SELECT ${cols.mkString(",\n                ")}\n" +
      s"         FROM $table$where"
  }

  // ---------------- solve program (shared tree) ---------------------

  /** The full solve as an ordered definition list over the moment
    * columns: scaled normal equations, per-active-set Cramer solves,
    * feasibility + score, winner CASE, final intercept `w_a`, segment
    * slopes `w_s<m>` (scaled-unit), winning mask `w_m`. */
  def program(spec: PWSpec): Seq[Def] = {
    val k = spec.nSeg
    val d = Cst(spec.condPow2)
    val defs = collection.mutable.ArrayBuffer.empty[Def]
    // scaled first/second moments (exact power-of-two divisions)
    for (i <- 0 until k)
      defs += DefD(s"b$i", Op('/', R(s"s$i"), d))
    for (i <- 0 until k)
      defs += DefD(s"by$i", Op('/', R(s"sy$i"), d))
    for (i <- 0 until k; j <- i until k)
      defs += DefD(s"b${i}_$j", Op('/', Op('/', R(s"s${i}_$j"), d), d))
    def bb(i: Int, j: Int): Ex =
      R(s"b${math.min(i, j)}_${math.max(i, j)}")

    val asc = spec.trend.forall(_ == "ascending")
    for (mask <- spec.masks) {
      val free = (0 until k).filter(m => (mask & (1 << m)) == 0)
      val dim = 1 + free.length
      // normal-equation matrix over [a] ++ free scaled slopes
      val mat = Vector.tabulate(dim, dim) { (r, c) =>
        (r, c) match {
          case (0, 0) => R("n")
          case (0, cc) => R(s"b${free(cc - 1)}")
          case (rr, 0) => R(s"b${free(rr - 1)}")
          case (rr, cc) => bb(free(rr - 1), free(cc - 1))
        }
      }
      val rhs = Vector(R("sy")) ++ free.map(f => R(s"by$f"))
      defs += DefD(s"c${mask}_d", det(mat))
      for (u <- 0 until dim) {
        val rep = Vector.tabulate(dim, dim) { (r, c) =>
          if (c == u) rhs(r) else mat(r)(c)
        }
        defs += DefD(s"c${mask}_n$u", det(rep))
      }
      // singular normal matrix (empty segment at some SF/filter):
      // both engines take the SAME guarded branch -> zero
      // coefficients, and the mask is marked infeasible below, so
      // winner selection stays bit-identical on degenerate inputs
      // (JVM NaN compares false, DuckDB NULL/NaN order differently —
      // neither may ever reach a comparison). The absolute threshold
      // covers exactly-singular/empty inputs only — see the scope
      // note at the OLS guard below for why it is not made relative.
      val nsing: Bx = Cmp(">=", Op('*', R(s"c${mask}_d"),
                                   R(s"c${mask}_d")), Cst(1e-24))
      defs += DefD(s"c${mask}_a",
                   Pick(Seq(nsing -> Op('/', R(s"c${mask}_n0"),
                                        R(s"c${mask}_d"))), Cst(0.0)))
      for ((f, fi) <- free.zipWithIndex)
        defs += DefD(s"c${mask}_z$f",
                     Pick(Seq(nsing ->
                                Op('/', R(s"c${mask}_n${fi + 1}"),
                                   R(s"c${mask}_d"))), Cst(0.0)))
      for (m <- 0 until k)
        defs += DefD(s"c${mask}_s$m",
          if (free.contains(m)) Op('/', R(s"c${mask}_z$m"), d)
          else Cst(0.0))
      if (spec.trend.isDefined) {
        defs += DefB(s"c${mask}_ok",
          All(nsing +: free.map(f =>
            Cmp(if (asc) ">=" else "<=", R(s"c${mask}_s$f"),
                Cst(0.0)))))
        // score = SSE - Syy over the RAW moments (lower is better):
        // -2(a*sy + sum s_m sy_m) + a^2 n + 2a sum s_m S_m
        //   + sum_{m,m'} s_m s_m' S_{mm'}
        val a = R(s"c${mask}_a")
        def s(m: Int) = R(s"c${mask}_s$m")
        def raw(i: Int, j: Int): Ex =
          R(s"s${math.min(i, j)}_${math.max(i, j)}")
        val lin = sumEx(mul(a, R("sy")) +:
                        (0 until k).map(m => mul(s(m), R(s"sy$m"))))
        val quad = sumEx(
          Seq(mul(mul(a, a), R("n")),
              mul(Cst(2.0),
                  mul(a, sumEx((0 until k).map(m =>
                    mul(s(m), R(s"s$m"))))))) ++
          (for (i <- 0 until k; j <- 0 until k)
            yield mul(mul(s(i), s(j)), raw(i, j))))
        defs += DefD(s"c${mask}_j",
                     Op('+', mul(Cst(-2.0), lin), quad))
      }
    }
    // winner: min score among feasible; ties -> lowest mask
    if (spec.trend.isDefined) {
      def beats(i: Int): Bx = All(
        RB(s"c${i}_ok") +: spec.masks.filter(_ != i).map { j =>
          val cmp = if (j < i) Cmp("<", R(s"c${i}_j"), R(s"c${j}_j"))
                    else Cmp("<=", R(s"c${i}_j"), R(s"c${j}_j"))
          AnyB(Seq(NotB(RB(s"c${j}_ok")), cmp))
        })
      for (i <- spec.masks) defs += DefB(s"win$i", beats(i))
      val last = spec.masks.last
      def pick(f: Int => Ex): Ex =
        Pick(spec.masks.init.map(i => (RB(s"win$i"): Bx, f(i))),
             f(last))
      defs += DefD("w_m", pick(i => Cst(i.toDouble)))
      defs += DefD("w_a", pick(i => R(s"c${i}_a")))
      for (m <- 0 until k)
        defs += DefD(s"w_s$m", pick(i => R(s"c${i}_s$m")))
    } else {
      defs += DefD("w_m", Cst(0.0))
      defs += DefD("w_a", R("c0_a"))
      for (m <- 0 until k) defs += DefD(s"w_s$m", R(s"c0_s$m"))
    }
    // curve values at the knots, in RAW y units (exact len constants)
    for (j <- spec.knots.indices) {
      val f = sumEx(R("w_a") +: (0 until k).map(m =>
        mul(R(s"w_s$m"), Cst(lenAt(spec, m, spec.tInt(j)).toDouble))))
      defs += DefD(s"w_v${j + 1}", Op('/', f, Cst(spec.yScale.toDouble)))
    }
    // exact output aggregates: the mean of a piecewise-linear curve is
    // a closed form of the SAME moments — (a n + sum s_m S_m)/n — so
    // avg_pred / avg_actual carry NO row-level float-summation noise
    // (they are bit-identical across engines like the coefficients)
    defs += DefD("w_avg",
      Op('/', Op('/',
        sumEx(mul(R("w_a"), R("n")) +:
              (0 until k).map(m => mul(R(s"w_s$m"), R(s"s$m")))),
        R("n")), Cst(spec.yScale.toDouble)))
    defs += DefD("w_avgy",
      Op('/', Op('/', R("sy"), R("n")), Cst(spec.yScale.toDouble)))
    defs.toSeq
  }

  // ---------------- two renderings of the same program --------------

  final case class Solved(spec: PWSpec, values: Map[String, Double]) {
    /** Per-phase wall times (`binning.py:670-702` information()
      * convention, like every other fit surface): `data_pass` = the
      * one moment aggregate, `solver` = the driver program, `total`.
      * Empty when the Solved came from pre-computed moments. */
    @transient var timings: Map[String, Double] = Map.empty
    def a: Double = values("w_a")
    def slope(m: Int): Double = values(s"w_s$m")
    def mask: Int = values("w_m").toInt
    def knotValue(j: Int): Double = values(s"w_v$j")

    /** Engine-side prediction in RAW y units: the identical
      * `a + sum s_m len_m(round(x * xScale))` over exact integer
      * lens, divided by yScale. */
    def predictColumn(xCol: Column): Column = {
      val x = round(xCol * spec.xScale).cast("long")
      val t = spec.tInt
      def len(m: Int): Column =
        if (m == 0) least(x, flit(t(0)))
        else if (m < t.length)
          greatest(flit(0L),
                   least(x, flit(t(m))) -
                     flit(t(m - 1)))
        else greatest(flit(0L),
                      x - flit(t(t.length - 1)))
      val f = (0 until spec.nSeg).foldLeft(
        flit(a): Column) { (acc, m) =>
        acc + flit(slope(m)) * len(m).cast("double")
      }
      f / flit(spec.yScale.toDouble)
    }
  }

  /** Driver-side solve: ONE exact aggregate then the shared program. */
  def fit(df: DataFrame, xCol: Column, yCol: Column,
          spec: PWSpec): Solved = {
    val t0 = System.nanoTime()
    val clean = df.where(xCol.isNotNull && yCol.isNotNull)
    val aggs = momentAggs(spec, xCol, yCol)
    val row: Row = clean.agg(aggs.head, aggs.tail: _*).head()
    val tData = (System.nanoTime() - t0) / 1e9
    val names = momentNames(spec)
    val env = Env(collection.mutable.Map.empty,
                  collection.mutable.Map.empty)
    names.zipWithIndex.foreach { case (nm, i) =>
      env.d(nm) = row.get(i) match {
        case l: java.lang.Long            => l.toDouble
        case d: java.math.BigDecimal      => d.doubleValue
        case d: scala.math.BigDecimal     => d.doubleValue
        case null                         => 0.0 // empty input: sums
        // are null when count=0 — treat as zero like olsMomentRow,
        // so the guarded program returns the zero fit, not a crash
        case x => throw new IllegalStateException(s"$nm: $x")
      }
    }
    val t1 = System.nanoTime()
    program(spec).foreach {
      case DefD(n, e) => env.d(n) = ev(e, env)
      case DefB(n, b) => env.b(n) = bv(b, env)
    }
    val tSolve = (System.nanoTime() - t1) / 1e9
    val s = Solved(spec, env.d.toMap)
    s.timings = Map("data_pass" -> tData, "solver" -> tSolve,
                    "total" -> (tData + tSolve))
    s
  }

  // ------------------------------------------------------------------
  // layered SQL rendering of a Def program. Lateral column aliases
  // would EXPAND textually through reference chains (each alias
  // substitutes its full expression — a def referencing two earlier
  // defs doubles their trees), which for deep programs (Cramer solves
  // feeding effects feeding shares) blows the planner up
  // exponentially. Instead each dependency layer becomes its own CTE
  // with `SELECT *, <defs> FROM prev`: every def is materialized ONCE
  // as a real column. Identical arithmetic, linear SQL size.
  // ------------------------------------------------------------------

  private def refsOf(e: Ex): Set[String] = e match {
    case R(n)        => Set(n)
    case Cst(_)      => Set.empty
    case Op(_, a, b) => refsOf(a) ++ refsOf(b)
    case Pick(cs, o) =>
      cs.flatMap(c => refsOfB(c._1) ++ refsOf(c._2)).toSet ++ refsOf(o)
  }
  private def refsOfB(x: Bx): Set[String] = x match {
    case RB(n)        => Set(n)
    case Cmp(_, a, b) => refsOf(a) ++ refsOf(b)
    case All(xs)      => xs.flatMap(refsOfB).toSet
    case AnyB(xs)     => xs.flatMap(refsOfB).toSet
    case NotB(y)      => refsOfB(y)
  }

  /** Render an ordered Def program as a chain of CTEs over `baseCte`
    * (whose columns are the moment refs); the FINAL CTE is named
    * `lastName` and carries every defined column. */
  def layeredCtes(defs: Seq[Def], baseCte: String, prefix: String,
                  lastName: String): String = {
    val layer = collection.mutable.Map.empty[String, Int]
    val grouped = collection.mutable.ArrayBuffer
      .empty[collection.mutable.ArrayBuffer[Def]]
    defs.foreach { d =>
      val (name, refs) = d match {
        case DefD(n, e) => (n, refsOf(e))
        case DefB(n, b) => (n, refsOfB(b))
      }
      val l = refs.flatMap(layer.get).foldLeft(0)(math.max) + 1
      layer(name) = l
      while (grouped.size < l)
        grouped += collection.mutable.ArrayBuffer.empty[Def]
      grouped(l - 1) += d
    }
    val ctes = grouped.zipWithIndex.map { case (ds, i) =>
      val cols = ds.map {
        case DefD(n, e) => s"${sqlEx(e)} AS $n"
        case DefB(n, b) => s"${sqlBx(b)} AS $n"
      }
      val name = if (i == grouped.size - 1) lastName
                 else s"$prefix${i + 1}"
      val from = if (i == 0) baseCte else s"$prefix$i"
      s"""$name AS (
         SELECT *, ${cols.mkString(",\n                ")}
         FROM $from)"""
    }
    ctes.mkString(",\n       ")
  }

  /** Oracle CTEs `m` (exact moments) and `kf` (the solved program,
    * layered — DuckDB evaluates the identical op sequence once per
    * def). Compose as
    * `WITH ${coefCtes(...)}, p AS (SELECT ... FROM table, kf ...)`. */
  def coefCtes(spec: PWSpec, table: String, xSql: String,
               ySql: String, where: String = ""): String = {
    s"""m AS (
         ${momentSql(spec, table, xSql, ySql, where)}),
       ${layeredCtes(program(spec), "m", "kl", "kf")}"""
  }

  // ------------------------------------------------------------------
  // exact multiple linear regression (same discipline, plain feature
  // basis instead of segment lengths): y ~ intercept + sum b_i x_i,
  // all inputs integer-scaled, ONE DECIMAL moment aggregate, Cramer
  // solve + R^2 in the shared IR — bit-identical in both engines.
  // ------------------------------------------------------------------

  /** @param xScales  integer scale per feature (x_i * scale exact)
    * @param yScale   integer scale for the target
    * @param condPow2 power-of-two equilibration per feature
    * @param ridgeLambda L2 penalty on the EQUILIBRATED slopes (the
    *   z_i, i.e. after condPow2 scaling — documented semantics; the
    *   intercept is never penalized). Added as an exact constant to
    *   the normal-matrix diagonal, so the solve stays inside the
    *   IR's +,-,*,/ closure and both engines remain bit-identical. */
  final case class OLSSpec(xScales: Seq[Long], yScale: Long,
                           condPow2: Seq[Double],
                           ridgeLambda: Double = 0.0) {
    require(xScales.nonEmpty && xScales.length == condPow2.length)
    require(xScales.length <= 5, "at most 5 features (Cramer)")
    condPow2.foreach { d =>
      val b = java.lang.Double.doubleToLongBits(d)
      require(d > 0 && (b & 0x000fffffffffffffL) == 0L,
              "condPow2 must be positive powers of two")
    }
    val k: Int = xScales.length
  }

  def olsMomentNames(spec: OLSSpec): Seq[String] = {
    val k = spec.k
    Seq("n", "sy", "syy") ++
      (0 until k).map(i => s"f$i") ++
      (0 until k).map(i => s"fy$i") ++
      (for (i <- 0 until k; j <- i until k) yield s"f${i}_$j")
  }

  def olsMomentAggs(spec: OLSSpec, xCols: Seq[Column], yCol: Column)
      : Seq[Column] = {
    require(xCols.length == spec.k)
    val xs = xCols.zip(spec.xScales).map { case (c, s) =>
      round(c * s).cast("long")
    }
    val y = round(yCol * spec.yScale).cast("long")
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    Seq(count(flit(1)).as("n"), dec(y).as("sy"),
        dec(y * y).as("syy")) ++
      xs.zipWithIndex.map { case (x, i) => dec(x).as(s"f$i") } ++
      xs.zipWithIndex.map { case (x, i) => dec(x * y).as(s"fy$i") } ++
      (for (i <- 0 until spec.k; j <- i until spec.k)
        yield dec(xs(i) * xs(j)).as(s"f${i}_$j"))
  }

  /** Sample-WEIGHTED moments (reference precedent: the estimators'
    * `sample_weight` fit parameter, `binning.py:538-562,704-735` —
    * a weight of w means "this row counted w times"): every moment
    * is multiplied by an integer weight and
    * `n` becomes the weight total, so the weighted normal equations
    * are still exact DECIMAL(38,0) sums — the weighted fit keeps the
    * full bit-parity contract. Weights must be non-negative integers
    * (they are cast via round(); a weight of w is exactly "this row
    * counted w times"). */
  def olsMomentAggsWeighted(spec: OLSSpec, xCols: Seq[Column],
                            yCol: Column, wCol: Column): Seq[Column] = {
    require(xCols.length == spec.k)
    val xs = xCols.zip(spec.xScales).map { case (c, s) =>
      round(c * s).cast("long")
    }
    val y = round(yCol * spec.yScale).cast("long")
    val w = round(wCol).cast("long")
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    Seq(dec(w).as("n"), dec(w * y).as("sy"),
        dec(w * y * y).as("syy")) ++
      xs.zipWithIndex.map { case (x, i) => dec(w * x).as(s"f$i") } ++
      xs.zipWithIndex.map { case (x, i) =>
        dec(w * x * y).as(s"fy$i") } ++
      (for (i <- 0 until spec.k; j <- i until spec.k)
        yield dec(w * xs(i) * xs(j)).as(s"f${i}_$j"))
  }

  /** Weighted-moment oracle SQL — the DuckDB rendering of
    * [[olsMomentAggsWeighted]]. */
  def olsMomentSqlWeighted(spec: OLSSpec, table: String,
                           xSqls: Seq[String], ySql: String,
                           wSql: String,
                           where: String = ""): String = {
    val xs = xSqls.zip(spec.xScales).map { case (x, s) =>
      s"CAST(round(($x) * $s) AS BIGINT)"
    }
    val y = s"CAST(round(($ySql) * ${spec.yScale}) AS BIGINT)"
    val w = s"CAST(round($wSql) AS BIGINT)"
    def dec(e: String): String = s"sum(CAST($e AS HUGEINT))::DOUBLE"
    val cols = Seq(s"${dec(w)} AS n", s"${dec(s"$w * $y")} AS sy",
                   s"${dec(s"$w * $y * $y")} AS syy") ++
      xs.zipWithIndex.map { case (x, i) =>
        s"${dec(s"$w * $x")} AS f$i" } ++
      xs.zipWithIndex.map { case (x, i) =>
        s"${dec(s"$w * $x * $y")} AS fy$i" } ++
      (for (i <- 0 until spec.k; j <- i until spec.k)
        yield s"${dec(s"$w * ${xs(i)} * ${xs(j)}")} AS f${i}_$j")
    s"SELECT ${cols.mkString(",\n                ")}\n" +
      s"         FROM $table$where"
  }

  /** Weighted exact OLS: one weighted moment aggregate + the shared
    * solve (with optional ridge from the spec). */
  def fitOLSWeighted(df: DataFrame, xCols: Seq[Column], yCol: Column,
                     wCol: Column, spec: OLSSpec): OLSSolved = {
    val clean = df.where(
      (xCols :+ yCol :+ wCol).map(_.isNotNull).reduce(_ && _))
    val aggs = olsMomentAggsWeighted(spec, xCols, yCol, wCol)
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    val moments = olsMomentNames(spec).zipWithIndex.map {
      case (nm, i) =>
        nm -> (row.get(i) match {
          case l: java.lang.Long        => java.math.BigDecimal.valueOf(l)
          case d: java.math.BigDecimal  => d
          case d: scala.math.BigDecimal => d.bigDecimal
          case null => java.math.BigDecimal.ZERO // empty input
          case x => throw new IllegalStateException(s"$nm: $x")
        })
    }.toMap
    fitOLSFromMoments(moments, spec)
  }

  /** Oracle CTEs for the weighted fit (`om` moments + `of` solve). */
  def olsCtesWeighted(spec: OLSSpec, table: String,
                      xSqls: Seq[String], ySql: String, wSql: String,
                      where: String = ""): String =
    s"""om AS (
         ${olsMomentSqlWeighted(spec, table, xSqls, ySql, wSql, where)}),
       ${layeredCtes(olsProgram(spec), "om", "ol", "of")}"""

  def olsMomentSql(spec: OLSSpec, table: String, xSqls: Seq[String],
                   ySql: String, where: String = ""): String = {
    val xs = xSqls.zip(spec.xScales).map { case (x, s) =>
      s"CAST(round(($x) * $s) AS BIGINT)"
    }
    val y = s"CAST(round(($ySql) * ${spec.yScale}) AS BIGINT)"
    def dec(e: String): String = s"sum(CAST($e AS HUGEINT))::DOUBLE"
    val cols = Seq(s"count(*)::DOUBLE AS n", s"${dec(y)} AS sy",
                   s"${dec(s"$y * $y")} AS syy") ++
      xs.zipWithIndex.map { case (x, i) => s"${dec(x)} AS f$i" } ++
      xs.zipWithIndex.map { case (x, i) =>
        s"${dec(s"$x * $y")} AS fy$i" } ++
      (for (i <- 0 until spec.k; j <- i until spec.k)
        yield s"${dec(s"${xs(i)} * ${xs(j)}")} AS f${i}_$j")
    s"SELECT ${cols.mkString(",\n                ")}\n" +
      s"         FROM $table$where"
  }

  /** Solve program: intercept `w_a` (scaled-y units), scaled slopes
    * `w_b<i>`, and `w_r2` = 1 - SSE/SST (guarded). */
  def olsProgram(spec: OLSSpec): Seq[Def] = {
    val k = spec.k
    val defs = collection.mutable.ArrayBuffer.empty[Def]
    for (i <- 0 until k)
      defs += DefD(s"a$i", Op('/', R(s"f$i"), Cst(spec.condPow2(i))))
    for (i <- 0 until k)
      defs += DefD(s"ay$i", Op('/', R(s"fy$i"), Cst(spec.condPow2(i))))
    for (i <- 0 until k; j <- i until k)
      defs += DefD(s"a${i}_$j",
        Op('/', Op('/', R(s"f${i}_$j"), Cst(spec.condPow2(i))),
           Cst(spec.condPow2(j))))
    def aa(i: Int, j: Int): Ex =
      R(s"a${math.min(i, j)}_${math.max(i, j)}")
    val dim = 1 + k
    val mat = Vector.tabulate(dim, dim) { (r, c) =>
      (r, c) match {
        case (0, 0)   => R("n")
        case (0, cc)  => R(s"a${cc - 1}")
        case (rr, 0)  => R(s"a${rr - 1}")
        case (rr, cc) if rr == cc && spec.ridgeLambda != 0.0 =>
          // ridge on the equilibrated slope diagonal (intercept
          // excluded) — an exact-constant addition, same IR both sides
          Op('+', aa(rr - 1, cc - 1), Cst(spec.ridgeLambda))
        case (rr, cc) => aa(rr - 1, cc - 1)
      }
    }
    val rhs = Vector(R("sy")) ++ (0 until k).map(i => R(s"ay$i"))
    defs += DefD("ols_d", det(mat))
    for (u <- 0 until dim) {
      val rep = Vector.tabulate(dim, dim) { (r, c) =>
        if (c == u) rhs(r) else mat(r)(c)
      }
      defs += DefD(s"ols_n$u", det(rep))
    }
    // singular-guard every Cramer division (empty/degenerate input):
    // guarded branch identical in both engines, zero fallback.
    // SCOPE: the absolute d^2 >= 1e-24 threshold covers the
    // exactly-singular / empty-input cases only (duplicate columns,
    // zero rows — where the exact-integer determinant rounds to a
    // double that is 0 or denormal in BOTH engines identically). It
    // is deliberately NOT scale-invariant: a relative threshold
    // (eps^2 * prod of normal diagonals) would itself be a product
    // of moment-magnitude doubles that can overflow to Inf on wide
    // specs, and ANY threshold is evaluated on the same IR in both
    // engines, so near-singular-but-nonzero systems take the SAME
    // (possibly ill-conditioned) Cramer branch on both sides —
    // bit-parity holds regardless; conditioning is the caller's
    // contract via OLSSpec.condPow2 equilibration.
    val nsing: Bx =
      Cmp(">=", Op('*', R("ols_d"), R("ols_d")), Cst(1e-24))
    defs += DefD("w_a",
      Pick(Seq(nsing -> Op('/', R("ols_n0"), R("ols_d"))), Cst(0.0)))
    for (i <- 0 until k) {
      defs += DefD(s"z$i",
        Pick(Seq(nsing -> Op('/', R(s"ols_n${i + 1}"), R("ols_d"))),
             Cst(0.0)))
      defs += DefD(s"w_b$i",
        Op('/', R(s"z$i"), Cst(spec.condPow2(i))))
    }
    // SSE = syy - 2(a sy + sum b_i fy_i)
    //       + a^2 n + 2a sum b_i f_i + sum b_i b_j f_ij
    val a = R("w_a")
    def b(i: Int) = R(s"w_b$i")
    def raw(i: Int, j: Int): Ex =
      R(s"f${math.min(i, j)}_${math.max(i, j)}")
    val lin = (mul(a, R("sy")) +:
      (0 until k).map(i => mul(b(i), R(s"fy$i"))))
      .reduceLeft(Op('+', _, _))
    val quad = (Seq(mul(mul(a, a), R("n")),
                    mul(Cst(2.0), mul(a,
                      (0 until k).map(i => mul(b(i), R(s"f$i")))
                        .reduceLeft(Op('+', _, _))))) ++
      (for (i <- 0 until k; j <- 0 until k)
        yield mul(mul(b(i), b(j)), raw(i, j))))
      .reduceLeft(Op('+', _, _))
    defs += DefD("w_sse",
      Op('+', Op('-', R("syy"), mul(Cst(2.0), lin)), quad))
    defs += DefD("w_sst",
      Pick(Seq((Cmp(">=", R("n"), Cst(1.0)): Bx) ->
                 Op('-', R("syy"),
                    Op('/', mul(R("sy"), R("sy")), R("n")))),
           Cst(0.0)))
    defs += DefD("w_r2",
      Pick(Seq((Cmp(">=", R("w_sst"), Cst(1e-9)): Bx) ->
                 Op('-', Cst(1.0), Op('/', R("w_sse"), R("w_sst")))),
           Cst(0.0)))
    defs.toSeq
  }

  final case class OLSSolved(spec: OLSSpec,
                             values: Map[String, Double]) {
    /** Intercept in RAW y units. */
    def intercept: Double = values("w_a") / spec.yScale
    /** Slope of feature i in RAW y-per-RAW-x units
      * (b_scaled * xScale / yScale — the caller rounds). */
    def slope(i: Int): Double =
      values(s"w_b$i") * spec.xScales(i).toDouble / spec.yScale
    def r2: Double = values("w_r2")
  }

  /** Collect one batch's exact moments as BigDecimals (exact integer
    * arithmetic — ADDITIVE across disjoint batches, the streaming
    * accumulation unit). */
  def olsMomentRow(df: DataFrame, xCols: Seq[Column], yCol: Column,
                   spec: OLSSpec): Map[String, java.math.BigDecimal] = {
    val clean = df.where(
      xCols.map(_.isNotNull).reduce(_ && _) && yCol.isNotNull)
    val aggs = olsMomentAggs(spec, xCols, yCol)
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    olsMomentNames(spec).zipWithIndex.map { case (nm, i) =>
      nm -> (row.get(i) match {
        case l: java.lang.Long        => java.math.BigDecimal.valueOf(l)
        case d: java.math.BigDecimal  => d
        case d: scala.math.BigDecimal => d.bigDecimal
        case null => java.math.BigDecimal.ZERO // empty batch
        case x => throw new IllegalStateException(s"$nm: $x")
      })
    }.toMap
  }

  /** Solve from exact moments — the streaming entry point: summed
    * BigDecimal moments over disjoint batches equal the one-pass
    * aggregate exactly, so the derived doubles (and therefore the
    * fit) are IDENTICAL to the batch path. */
  def fitOLSFromMoments(moments: Map[String, java.math.BigDecimal],
                        spec: OLSSpec): OLSSolved = {
    val env = Env(collection.mutable.Map.empty,
                  collection.mutable.Map.empty)
    olsMomentNames(spec).foreach { nm =>
      env.d(nm) = moments.getOrElse(nm, java.math.BigDecimal.ZERO)
        .doubleValue
    }
    olsProgram(spec).foreach {
      case DefD(n, e) => env.d(n) = ev(e, env)
      case DefB(n, b) => env.b(n) = bv(b, env)
    }
    OLSSolved(spec, env.d.toMap)
  }

  /** Exact distributed OLS: one moment aggregate + the shared-IR
    * solve. */
  def fitOLS(df: DataFrame, xCols: Seq[Column], yCol: Column,
             spec: OLSSpec): OLSSolved =
    fitOLSFromMoments(olsMomentRow(df, xCols, yCol, spec), spec)

  /** Oracle CTEs `om` (exact moments) + layered program CTE `of`. */
  def olsCtes(spec: OLSSpec, table: String, xSqls: Seq[String],
              ySql: String, where: String = ""): String =
    s"""om AS (
         ${olsMomentSql(spec, table, xSqls, ySql, where)}),
       ${layeredCtes(olsProgram(spec), "om", "ol", "of")}"""

  /** Oracle-side prediction expression in RAW y units (references the
    * `kf` CTE columns). */
  def predictSql(spec: PWSpec, xSql: String): String = {
    val x = s"CAST(round(($xSql) * ${spec.xScale}) AS BIGINT)"
    val t = spec.tInt
    def len(m: Int): String =
      if (m == 0) s"least($x, ${t(0)})"
      else if (m < t.length)
        s"greatest(0, least($x, ${t(m)}) - ${t(m - 1)})"
      else s"greatest(0, $x - ${t(t.length - 1)})"
    val f = (0 until spec.nSeg).foldLeft("kf.w_a") { (acc, m) =>
      s"($acc + (kf.w_s$m * ${len(m)}::DOUBLE))"
    }
    s"($f / ${dlit(spec.yScale.toDouble)})"
  }
}
