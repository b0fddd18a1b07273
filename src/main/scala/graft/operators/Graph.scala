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
}
