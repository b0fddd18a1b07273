package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k (one scan, one
  * `TakeOrderedAndProject` — no shuffle of the full data). Scale path:
  * deterministic random-hyperplane LSH bucketing so the candidate set per
  * query is a bucket, not the corpus; bucket join is an equi shuffle join
  * on the signature.
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions —
  * evaluated inside codegen, no UDF.
  */
object Similarity {

  /** dot(a, b) for two array<float/double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d),
              (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k against a literal query vector: Catalyst
    * plans scan -> project(cosine) -> TakeOrderedAndProject(k) — the sort
    * never materializes beyond k rows per partition.
    */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    df.select(col(idCol),
              cosine(col(embCol).cast("array<double>"), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component h_{p,i} in [-1, 1]:
    * derived from xxhash64((p, i)) — no RNG state, reproducible across
    * executors and runs.
    */
  private def hyperplaneComponent(plane: Int, i: Column): Column =
    (xxhash64(lit(plane), i).cast("double") / lit(Long.MaxValue.toDouble))

  /** nPlanes-bit signature: bit p = sign of dot(x, h_p). */
  def lshSignature(emb: Column, nPlanes: Int = 16): Column = {
    val dims = sequence(lit(0), size(emb) - 1)
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, dims, (v, i) => v * hyperplaneComponent(p, i)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN top-k: corpus and queries are signed with the same
    * hyperplanes; candidates = equal signature (plus optional 1-bit
    * neighbors), ranked by exact cosine within bucket. Returns per-query
    * top-k. `queries` must carry (qidCol, embCol).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
              idCol: String, qidCol: String, k: Int,
              nPlanes: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("cid"),
                          col(embCol).cast("array<double>").as("cemb"))
      .withColumn("sig", lshSignature(col("cemb"), nPlanes))
    val q = queries.select(col(qidCol).as("qid"),
                           col(embCol).cast("array<double>").as("qemb"))
      .withColumn("sig", lshSignature(col("qemb"), nPlanes))
    // query set << corpus by construction: broadcast it so the corpus
    // never shuffles (bucket matching happens map-side in every scan task)
    val scored = c.join(broadcast(q), Seq("sig"))
      .withColumn("cosine", cosine(col("qemb"), col("cemb")))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** IVF (inverted-file) ANN top-k: a k-means coarse quantizer
    * (`spark.ml.clustering.KMeans`, distributed fit) partitions the
    * corpus into nLists cells; each query probes its nProbe nearest
    * cells and ranks candidates by exact cosine. Scale shape: corpus is
    * assigned once (narrow `model.transform`), the probe join is an
    * equi-join on cell id with the (small) query side broadcast, so the
    * corpus never shuffles and each query scans ~nProbe/nLists of it.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
              idCol: String, qidCol: String, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

    val c = corpus.select(col(idCol).as("cid"),
                          col(embCol).cast("array<double>").as("cemb"))
    val feat = c.withColumn("features", array_to_vector(col("cemb")))
    val model = new KMeans().setK(nLists).setSeed(7)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(feat)
    val assigned = model.transform(feat).select("cid", "cemb", "cell")

    // per-query nProbe nearest centroids (centroids are a tiny literal)
    val centroids = model.clusterCenters.map(_.toArray)
    val centroidLit = array(centroids.map(ctr =>
      array(ctr.map(lit(_)): _*)): _*)
    val q = queries.select(col(qidCol).as("qid"),
                           col(embCol).cast("array<double>").as("qemb"))
      .withColumn("__cells",
        slice(transform(
          array_sort(transform(centroidLit, (ctr, ci) =>
            struct(aggregate(zip_with(col("qemb"), ctr,
                                      (a, b) => (a - b) * (a - b)),
                             lit(0.0d), (acc, v) => acc + v).as("d2"),
                   ci.as("cell")))),
          s => s.getField("cell")), 1, nProbe))
      .select(col("qid"), col("qemb"),
              explode(col("__cells")).as("cell"))

    val scored = assigned.join(broadcast(q), Seq("cell"))
      .withColumn("cosine", cosine(col("qemb"), col("cemb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs within a
    * bucket with cosine >= threshold. */
  def cosineNearDupPairs(df: DataFrame, embCol: String, idCol: String,
                         threshold: Double = 0.95,
                         nPlanes: Int = 12): DataFrame = {
    val e = df.select(col(idCol).as("id"),
                      col(embCol).cast("array<double>").as("emb"))
      .withColumn("sig", lshSignature(col("emb"), nPlanes))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .withColumn("cosine", cosine(col("a.emb"), col("b.emb")))
      .where(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
