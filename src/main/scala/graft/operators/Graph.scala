package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph diagnostics over an edge list. */
object Graph {

  /** Per-iteration lineage cut for the bounded loops (r13, guide §3.3
    * "materialising an intermediate truncates the plan" / §5
    * localCheckpoint): `persist` alone substitutes InMemoryRelations
    * at PLANNING time but keeps the full logical chain, so the
    * analyzer/optimizer re-walks a plan that GROWS with every round
    * (the r12 kcore after-plan was ~7,000 formatted lines with 329
    * InMemoryRelation references) — driver planning cost scales with
    * iteration count even though the data work is cached. An eager
    * `localCheckpoint` materializes the round's output once and
    * replaces its lineage with the computed RDD: each round's plan is
    * O(one round), not O(all rounds so far). Executor-loss recompute
    * of a checkpointed round is not possible — on a fault-tolerant
    * production run use durable `checkpoint` dirs instead; for these
    * bounded diagnostic loops the data per round is the (shrinking)
    * edge/label/rank table. Old rounds' blocks are released by the
    * ContextCleaner once unreferenced (or session `clearCache`).
    *
    * EAGER on purpose (r13 second wave, negative result): lazy cuts
    * (`eager = false`) were tried to fold the per-round
    * materialization jobs into the final action — and MEASURED WORSE
    * on this family (same 32-core window: pagerank 2.74 -> 4.17 s
    * with 8-27 s spikes, bfs 2.15 -> 2.61, kcore 1.53 -> 1.76,
    * untouched controls flat). Deferred checkpoint materialization
    * stacks every round's AQE stage submission into one action and
    * re-runs the checkpoint-fill pass per marked RDD; the dedicated
    * eager job per round is cheaper and far more stable. Don't
    * re-try. */
  private def cut(df: DataFrame): DataFrame =
    df.localCheckpoint()

  /** Exact triangle count (plus node/edge totals) of the undirected
    * graph given as an edge list — duplicate edges, reversed copies,
    * and self-loops are canonicalized away first.
    *
    * The count uses degree-ordered orientation: every edge points
    * from its lower-(degree, id)-ranked endpoint to the higher, so
    * each triangle is counted exactly once — as the wedge at its
    * lowest-ranked corner closed by the third edge. The orientation
    * is the scale lever: out-degrees are bounded by O(sqrt(m)) after
    * orienting (Schank/Wagner), so the wedge join's fan-out is
    * m^{3/2} worst-case instead of the sum of squared RAW degrees —
    * a celebrity node with 10M neighbors contributes nothing to the
    * wedge side because all its edges point INTO it.
    *
    * Plan shape: degree aggregate, two broadcast-or-shuffle joins to
    * attach ranks, one self-join on the wedge apex, one equi-join
    * closure check against the canonical edge set — all equi-joins
    * on integer keys; AQE skew handling applies throughout.
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
                    /** persist the canonical edge set — it feeds four
                      * plan branches (degrees, orientation, closure,
                      * edge count), and the distilled graph is tiny
                      * next to whatever produced it (a basket table, a
                      * near-dup candidate join). Release via
                      * `spark.catalog.clearCache()` when done. */
                    materialize: Boolean = true): DataFrame = {
    val eRaw = edges
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
             col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
              greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
    val e = if (materialize) cut(eRaw) else eRaw
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val ranked = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"),
            Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"),
            Seq("b"))
    // orient low rank -> high rank; rank = (degree, id) lexicographic
    val oRaw = ranked.select(
      when(col("da") < col("db") ||
           (col("da") === col("db") && col("a") < col("b")),
           struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst")))
        .as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
    // r13: the oriented list feeds BOTH sides of the wedge self-join;
    // cutting it materializes the degree-attach joins once instead of
    // once per side (and keeps the wedge plan flat)
    val o = if (materialize) cut(oRaw) else oRaw
    val wedges = o.select(col("src"), col("dst").as("v1"))
      .join(o.select(col("src"), col("dst").as("v2")), Seq("src"))
      .where(col("v1") < col("v2"))
      .select(col("v1").as("a"), col("v2").as("b"))
    val tri = wedges.join(e, Seq("a", "b"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Fixed-iteration PageRank on a DIRECTED edge list, in exact
    * integer arithmetic so every iteration replays bit-identically in
    * ANSI SQL (the float-in-oracle lesson): ranks are scaled longs
    * (`scale`, default 1e12), the damping factor is the rational
    * `dampNum/dampDen`, and each neighbor contribution is the
    * integral `(dampNum * r) div (dampDen * outdeg)` — floor-per-edge,
    * then summed, plus the constant base `(scale * (dampDen -
    * dampNum)) div dampDen`. Nodes with no in-edges keep the base
    * (left join from the node set); dangling-node mass is dropped,
    * the usual simplification when ranking rather than modeling a
    * distribution.
    *
    * Plan shape per iteration: one equi-join of the rank table onto
    * the out-degree-annotated edges and one map-side-partial sum by
    * dst. Iteration count is a query constant; each iteration's rank
    * table is lineage-CUT (see [[cut]], r13) — the unrolled chain's
    * logical plan previously grew by one join+aggregate per
    * iteration, so driver analysis/planning cost scaled with the
    * iteration count even though each iteration's data is only the
    * (v, rank) aggregate output.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampNum: Long = 85L,
               dampDen: Long = 100L, scale: Long = 1000000000000L,
               /** persist the degree-annotated edge list and node
                 * set — the loop's STATIONARY inputs, consumed once
                 * per iteration (the GraphX discipline: pin the
                 * graph, stream the ranks). Without this a derived
                 * edge input (a co-occurrence join, an LSH candidate
                 * set) re-executes its whole producing subtree every
                 * iteration. Release via `spark.catalog.clearCache()`
                 * when done. */
               materialize: Boolean = true): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0; got $iterations")
    require(dampNum > 0 && dampDen > dampNum,
      s"damping must be a rational in (0, 1); got $dampNum/$dampDen")
    def mat(df: DataFrame): DataFrame =
      if (materialize) cut(df) else df
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val ed = mat(e.join(deg, Seq("src")))
    // derive nodes from the CACHED edge list, so a derived edge input
    // computes exactly once (for ed's fill), not once more here
    val nodes = mat(ed.select(col("src").as("v"))
      .unionByName(ed.select(col("dst").as("v"))).distinct())
    val base = (scale * (dampDen - dampNum)) / dampDen
    val r0 = nodes.select(col("v"), lit(scale).as("rank"))
    (1 to iterations).foldLeft(r0) { (r, it) =>
      val contrib = ed
        .join(r.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst").as("v"))
        .agg(sum(expr(s"($dampNum * rank) div ($dampDen * __od)"))
               .as("__in"))
      val next = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
                (lit(base) + coalesce(col("__in"), lit(0L))).as("rank"))
      // cut every iteration but the last (the caller's action
      // materializes that one); without the cut the logical plan is
      // the whole unrolled chain
      if (materialize && it < iterations) cut(next) else next
    }
  }

  /** Bounded-hop BFS: exact shortest-path distance (≤ `maxHops`) from
    * a seed set over a DIRECTED edge list. Returns `(v, dist)` for
    * every vertex reachable within the bound — the k-hop neighborhood
    * expansion behind "related items within 3 links" queries.
    *
    * Frontier-based: each iteration joins ONLY the newly-discovered
    * frontier onto the (cached) edge list, dedups candidates, and
    * anti-joins the visited set — so per-iteration work is
    * O(frontier-adjacent edges), not O(all edges), and the visited
    * set grows monotonically. All-integer distances; the whole
    * expansion replays as `maxHops` unrolled SQL CTEs (full min-
    * recompute per level reaches the identical fixpoint — BFS levels
    * are order-insensitive).
    *
    * The hop bound is the scale contract: unbounded iteration on a
    * 100 TB graph belongs to a Pregel loop with convergence checks;
    * a fixed small k unrolls into one bounded Catalyst plan — with
    * each hop's frontier/visited lineage-cut ([[cut]]) so the plan
    * stays O(one hop).
    */
  /** Bounded k-core peeling: `rounds` synchronous iterations of
    * "drop every vertex with degree < k, then re-derive degrees over
    * the surviving subgraph" over the canonicalized undirected edge
    * list (duplicates/reversals/self-loops removed). The true k-core
    * is this peel run to fixpoint; a FIXED round count is the scale
    * contract (the [[bfsDistances]] discipline: a bounded unrolled
    * plan beats an unbounded convergence loop at 100 TB, and each
    * round only shrinks the graph — the peel converges
    * monotonically, most graphs within a handful of rounds). Returns
    * `(v, deg)` for vertices surviving all rounds, with their degree
    * in the surviving subgraph — deterministic and integer-only, so
    * the whole peel replays as `rounds` unrolled SQL CTEs.
    *
    * Plan shape per round: one degree aggregate + two semi-joins of
    * the (cached, shrinking) edge list against the kept vertex set —
    * all equi-joins on integer keys; the kept set is a degree
    * aggregate output, ≤ |V| rows, and AQE broadcast-converts it as
    * it shrinks. Each round's surviving edges are lineage-cut
    * ([[cut]]); blocks release via the ContextCleaner.
    */
  def kCoreSurvivors(edges: DataFrame, aCol: String, bCol: String,
                     k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    require(rounds >= 1, s"rounds must be >= 1; got $rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("v"))
        .unionByName(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
    // each round's surviving edge list is lineage-CUT (see [[cut]]):
    // it feeds 3 consumers (degrees + both semi-joins of the next
    // round), and under plain persist the logical plan grew by one
    // round's joins every round
    var e = cut(edges
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
             col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
              greatest(col(aCol), col(bCol)).as("b"))
      .distinct())
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("deg") >= k).select("v")
      e = cut(e
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi"))
    }
    degrees(e)
  }

  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0; got $maxHops")
    // per-hop lineage cut (see [[cut]]): frontier/visited both feed
    // the next hop's join + anti-join, and under plain persist the
    // visited chain accumulated every hop's subtree in the final plan
    val e = cut(edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val d0 = cut(seeds.select(col(seedCol).as("v")).distinct()
      .withColumn("dist", lit(0L)))
    var visited = d0
    var frontier = d0
    for (h <- 1 to maxHops) {
      val next = cut(frontier
        .join(e, frontier("v") === e("src"))
        .select(col("dst").as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .withColumn("dist", lit(h.toLong)))
      visited = cut(visited.unionByName(next))
      frontier = next
    }
    visited
  }

  /** Synchronous label-propagation communities, `rounds` fixed
    * iterations: every node starts as its own label; each round every
    * node adopts the most frequent label among its neighbors, ties to
    * the SMALLEST label — fully deterministic (the classic async LPA
    * is order-dependent; the synchronous min-tie variant replays
    * bit-identically in SQL).
    *
    * Per round: one shuffle join (edges x labels) and one aggregate to
    * (node, label) counts; the argmax folds into the same aggregate
    * via `min(struct(-cnt, label))` — integer-exact (cnt desc, label
    * asc) for arbitrary long ids, no window, no sort. Labels are
    * lineage-cut per round ([[cut]], the bfs/kcore discipline).
    * Output: one row per community
    * `(community, n_members, min_member, max_member)`.
    */
  def lpaCommunities(edges: DataFrame, aCol: String, bCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8,
            s"rounds must be in [1, 8]; got $rounds")
    // per-round lineage cut (see [[cut]]); the old explicit
    // labels.unpersist() release is subsumed by the ContextCleaner
    // collecting the unreferenced checkpoint RDDs
    def mat(df: DataFrame): DataFrame = cut(df)
    // symmetric distinct edge list, self-loops dropped
    val sym = mat(edges
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
             col(aCol) =!= col(bCol))
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges
        .where(col(aCol).isNotNull && col(bCol).isNotNull &&
               col(aCol) =!= col(bCol))
        .select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct())
    var labels = mat(sym.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v")))
    for (_ <- 1 to rounds) {
      val counted = sym
        .join(labels.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst").as("v"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      // argmax via min(struct(-cnt, lbl)): cnt is a count (>= 1, never
      // near Long.MinValue) so the negation is ANSI-safe for ARBITRARY
      // label ids — the previous MaxValue - lbl encoding overflowed for
      // negative ids, and node ids are caller-provided longs
      val next = mat(counted
        .groupBy("v")
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("m"))
        .select(col("v"), col("m.lbl").as("lbl")))
      labels = next
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"), min("v").as("min_member"),
           max("v").as("max_member"))
      .orderBy("community")
  }
}
