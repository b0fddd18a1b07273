package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph diagnostics over an edge list. */
object Graph {

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
    val e =
      if (materialize)
        eRaw.persist(org.apache.spark.storage.StorageLevel
          .MEMORY_AND_DISK)
      else eRaw
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val ranked = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"),
            Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"),
            Seq("b"))
    // orient low rank -> high rank; rank = (degree, id) lexicographic
    val o = ranked.select(
      when(col("da") < col("db") ||
           (col("da") === col("db") && col("a") < col("b")),
           struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst")))
        .as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
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
    * the out-degree-annotated edges (both sides hash-partitioned on
    * the same key, so the edge side's exchange is planned once and
    * reused across iterations) and one map-side-partial sum by dst.
    * Iteration count is a query constant — the loop unrolls into a
    * bounded chain Catalyst sees whole; persist-per-iteration is
    * deliberately NOT done because each iteration's input is the
    * previous aggregate output (k × 16-byte rows), already shuffled.
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
      if (materialize)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
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
    (1 to iterations).foldLeft(r0) { (r, _) =>
      val contrib = ed
        .join(r.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst").as("v"))
        .agg(sum(expr(s"($dampNum * rank) div ($dampDen * __od)"))
               .as("__in"))
      nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
                (lit(base) + coalesce(col("__in"), lit(0L))).as("rank"))
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
    * a fixed small k unrolls into one bounded Catalyst plan. Both
    * the edge list and the visited set persist across iterations
    * (released via `spark.catalog.clearCache()`).
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
    * it shrinks. Edges persist between rounds; release with
    * `spark.catalog.clearCache()`.
    */
  def kCoreSurvivors(edges: DataFrame, aCol: String, bCol: String,
                     k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    require(rounds >= 1, s"rounds must be >= 1; got $rounds")
    def mat(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("v"))
        .unionByName(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
    var e = mat(edges
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
             col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
              greatest(col(aCol), col(bCol)).as("b"))
      .distinct())
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("deg") >= k).select("v")
      e = mat(e
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi"))
    }
    degrees(e)
  }

  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0; got $maxHops")
    def mat(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = mat(edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val d0 = mat(seeds.select(col(seedCol).as("v")).distinct()
      .withColumn("dist", lit(0L)))
    var visited = d0
    var frontier = d0
    for (h <- 1 to maxHops) {
      val next = mat(frontier
        .join(e, frontier("v") === e("src"))
        .select(col("dst").as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .withColumn("dist", lit(h.toLong)))
      visited = mat(visited.unionByName(next))
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
    * asc) for arbitrary long ids, no window, no sort. Labels persist per
    * round with the previous round released (the bfs/kcore lineage-cut
    * discipline). Output: one row per community
    * `(community, n_members, min_member, max_member)`.
    */
  def lpaCommunities(edges: DataFrame, aCol: String, bCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8,
            s"rounds must be in [1, 8]; got $rounds")
    def mat(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
      labels.unpersist()
      labels = next
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"), min("v").as("min_member"),
           max("v").as("max_member"))
      .orderBy("community")
  }
}
