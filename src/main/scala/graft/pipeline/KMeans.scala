package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over `embeddings(vec_id, embedding:
  * array<float>)` — the real coarse quantizer for IVF search (the `label`
  * column was a stand-in).
  *
  * Dataflow per iteration: centroids (k × dim, tiny) broadcast to an
  * assignment scan (argmin over k distances per row, computed as a codegen-
  * friendly min-of-structs — no explode of the embedding), then one
  * shuffle keyed by cluster to re-average. Deterministic: init = first k
  * vec_ids, fixed iteration count, distance ties broken by cluster id.
  */
object KMeans {

  private def centroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("cluster", "i").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)").as("centroid"))

  /** Squared-distance argmin assignment against broadcast centroids.
    *
    * The hot path is the codegen'd [[graft.functions.VectorL2Argmin]]
    * (two primitive loops inside whole-stage codegen) — this scan runs
    * once per Lloyd iteration over the FULL table, so an interpreted HOF
    * fold here would put the interpreter on the hottest loop in the
    * operator. The one-row packed centroid table (ids + vectors, sorted
    * by cluster so argmin's lowest-index tie-break ≡ lowest cluster id)
    * is broadcast; the per-row HOFs are gone.
    */
  private[graft] def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.vector_l2_argmin
    val packed = centroids.groupBy()
      .agg(expr("array_sort(collect_list(struct(cluster, centroid)))").as("cs"))
      .select(expr("transform(cs, c -> c.cluster)").as("cids"),
              expr("transform(cs, c -> c.centroid)").as("cents"))
    embeddings.crossJoin(broadcast(packed))
      .withColumn("cluster",
        element_at(col("cids"), vector_l2_argmin(col("embedding"), col("cents")) + 1))
      .drop("cids", "cents")
  }

  /** The assignment scan against seed centroids, UNexecuted — exposes the
    * per-iteration hot-path plan (codegen'd argmin over a broadcast packed
    * centroid row) for plan audits; [[fit]] checkpoints each iteration so
    * the scan never appears in the final query's plan.
    */
  private[graft] def assignPlan(embeddings: DataFrame, k: Int): DataFrame = {
    val base = embeddings.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    assign(base, seedCentroids(base, k))
  }

  /** Seed centroids = the k smallest vec_ids, TakeOrdered to the driver
    * (parameter-scale) and restarted as a local relation — no global
    * window (Spark 4 folds constant partition keys away, so a lit(0)
    * partition would still be a one-partition WindowExec).
    */
  private def seedCentroids(base: DataFrame, k: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val seeds = base.orderBy("vec_id").limit(k).select("embedding").collect()
    seeds.toSeq.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](0).map(_.toDouble)) }
      .toDF("cluster", "centroid")
  }

  /** Returns (vec_id, embedding, cluster) after `iters` Lloyd iterations,
    * eagerly materialized. Initial centroids: the `k` smallest vec_ids
    * (deterministic).
    *
    * `base` is persisted for the duration of fit — each of the iters+1
    * assignment actions would otherwise re-read the source parquet — and
    * released after the final assignment materializes. At 100 TB the scale
    * plan is: fit the quantizer on a sample (pass `embeddings.sample(...)`),
    * then [[assign]] the full corpus once against the learned centroids;
    * full-corpus Lloyd is never the plan.
    */
  def fit(embeddings: DataFrame, k: Int = 10, iters: Int = 5): DataFrame = {
    val base = embeddings.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids = seedCentroids(base, k)
      for (_ <- 1 to iters) {
        centroids = centroidsOf(assign(base, centroids)).localCheckpoint(true) // iteration barrier
      }
      // eager: the final assignment must materialize while base is cached
      assign(base, centroids).localCheckpoint(true)
    } finally { base.unpersist(blocking = false); () }
  }

  /** Simplified silhouette of the learned clustering (the centroid-based
    * variant of Rousseeuw 1987 — per point, a = squared distance to its
    * OWN centroid, b = min squared distance to any OTHER centroid,
    * s = (b − a) / max(a, b); the full silhouette's per-point pairwise
    * means are O(V²) and never the plan at scale, while the centroid form
    * needs only V·k distances). The quality gate a curation pipeline puts
    * behind its quantizer: clusters with low mean s are the ones whose
    * IVF probes and SemDeDup buckets leak.
    *
    * Scale: ONE scan of the fitted assignment cross-joined with the
    * BROADCAST k-row centroid table (V·k rows, k tiny), one cluster-keyed
    * aggregate. The degenerate max(a,b) = 0 case (vector identical to
    * both centroids) maps to s = 0 by the exact predicate — ANSI-safe in
    * both engines. Output: (cluster, n_vectors, mean_silhouette 4 dp)
    * ordered by cluster.
    */
  def silhouette(embeddings: DataFrame, k: Int = 10, iters: Int = 3): DataFrame = {
    val fitted = fit(embeddings, k, iters) // (vec_id, embedding, cluster)
    val cents = centroidsOf(fitted)
      .select(col("cluster").as("c2"), col("centroid")).localCheckpoint(true)
    val dists = fitted.crossJoin(broadcast(cents))
      .withColumn("dist", aggregate(
        zip_with(col("embedding"), col("centroid"),
          (x, y) => { val d = x.cast("double") - y; d * d }),
        lit(0.0), (acc, v) => acc + v))
      .groupBy("vec_id", "cluster")
      .agg(max(when(col("c2") === col("cluster"), col("dist"))).as("da"),
        min(when(col("c2") =!= col("cluster"), col("dist"))).as("db"))
    dists
      .withColumn("s",
        when(greatest(col("da"), col("db")) === 0.0, lit(0.0))
          .otherwise((col("db") - col("da")) / greatest(col("da"), col("db"))))
      .groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_vectors"),
        round(avg("s"), 4).as("mean_silhouette"))
      .orderBy("cluster")
  }

  /** IVF search with the learned quantizer: rank clusters by centroid
    * distance to the query, scan only the best `nprobe` clusters with the
    * exact cosine. Same contract as Similarity.cosineTopK, approximate
    * recall.
    */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int = 10,
              nlist: Int = 10, nprobe: Int = 2, iters: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.vector_cosine
    val fitted = fit(embeddings, nlist, iters) // already eagerly checkpointed
    val qv = Similarity.queryVector(fitted, queryId)
    val qe = typedlit(qv)
    val qd = typedlit(qv.map(_.toDouble))
    val best = centroidsOf(fitted)
      .withColumn("d", aggregate(
        zip_with(qd, col("centroid"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))
      .orderBy(col("d"), col("cluster")).limit(nprobe).select("cluster")
    fitted.join(broadcast(best), "cluster")
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(vector_cosine(col("embedding"), qe), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
