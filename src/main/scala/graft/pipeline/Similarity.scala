package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.vector_cosine

/** Embedding similarity search over `embeddings(vec_id, embedding: array<float>, label)`.
  *
  * Scale design: the query vector is a broadcast (single row); scoring is
  * the native codegen'd [[graft.functions.VectorCosine]] expression (a tight
  * primitive loop inside whole-stage codegen — HOF folds fall back to the
  * interpreter); top-k is Spark's TakeOrdered (per-partition heap + driver
  * merge of k). The cluster-pruned variant cuts the scan by restricting to
  * the best coarse partitions first (IVF shape).
  */
object Similarity {

  /** `aggregate` fold over double arrays — used only for tiny centroid
    * tables where the input is array<double> (the native expression is
    * float-typed).
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Fetch the single query embedding to the driver (it is a *parameter* of
    * the search, not data): one job, then the vector rides into the scan as
    * a literal — no existence-check job, no broadcast-subquery re-scan.
    * Throws if the id is absent (typed, not silently empty).
    */
  private[pipeline] def queryVector(embeddings: DataFrame, queryId: Long): Seq[Float] = {
    val rows = embeddings.filter(col("vec_id") === queryId).select("embedding").head(1)
    require(rows.nonEmpty, s"query vector vec_id=$queryId not found in embeddings")
    rows.head.getSeq[Float](0)
  }

  /** Brute-force cosine top-k against the embedding of `queryId`.
    * Output: (vec_id, cosine) ordered by (cosine DESC, vec_id), k rows.
    * Ordering uses the 4-decimal rounded cosine so ranking is stable across
    * engines (ties broken by vec_id).
    */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val qe = typedlit(queryVector(embeddings, queryId))
    embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id").cast("long"),
        round(vector_cosine(col("embedding"), qe), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-style pruned search: coarse-quantize by `label` (stand-in for a
    * k-means centroid id), rank clusters by centroid cosine against the
    * query, scan only the best `nprobe` clusters. At 100 TB the full scan
    * touches every row; this touches nprobe/nlist of them.
    */
  /** Matryoshka-style truncate-then-RERANK (Kusupati et al. 2022,
    * arXiv:2205.13147 — MRL serving): a COARSE pass ranks every vector by
    * cosine over only the first `dims` coordinates and keeps `coarseK`
    * survivors; the exact full-dimension cosine then reranks the
    * survivors to the final top-`k`. Both stages use the [[cosineTopK]]
    * replay contract (rounded-score ordering, vec_id ties) so the whole
    * two-stage pipeline is a deterministic relation DuckDB replays; the
    * recall cost vs the exact full ranking is floored in
    * PropertyOracleSpec. Scale: the coarse pass reads dims/64 of the
    * vector bytes (at 100 TB the prefix is its own narrow column so the
    * scan prunes physically) and is a joinless distributed TakeOrdered;
    * the rerank re-fetches ONLY the survivors via a broadcast semi-join —
    * full vectors for coarseK rows, never the corpus.
    */
  def cosineTopKRerank(embeddings: DataFrame, queryId: Long, k: Int = 10,
                       dims: Int = 16, coarseK: Int = 200): DataFrame = {
    val qv = queryVector(embeddings, queryId)
    val qTr = typedlit(qv.take(dims))
    val qFull = typedlit(qv)
    val survivors = embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(vector_cosine(slice(col("embedding"), 1, dims), qTr), 4).as("cc"))
      .orderBy(col("cc").desc, col("vec_id"))
      .limit(coarseK)
      .select("vec_id")
    embeddings.join(broadcast(survivors), "vec_id")
      .select(col("vec_id").cast("long"),
        round(vector_cosine(col("embedding"), qFull), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Element-wise mean centroid per coarse cell (label): explode+agg, one
    * shuffle over nlist × dim rows — tiny. Factored out of
    * [[cosineTopKIvf]] so the streaming ingest twin can derive the SAME
    * relation from its incrementally maintained (label, i, sum, count)
    * moment state ([[graft.streaming.StreamOps.embeddingTopKReplayBatch]]).
    */
  private[graft] def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)").as("centroid"))

  /** Probe-and-rank kernel shared VERBATIM by [[cosineTopKIvf]] and the
    * streaming ingest twin (the one-kernel-two-twins rule): rank cells by
    * centroid cosine against the query, scan only the best `nprobe`
    * cells of `embeddings` (over a label-partitioned store that scan is
    * partition-pruned — the broadcast probe list is a join on the
    * partition column), exact rounded-cosine re-rank with vec_id ties.
    * Cell CHOICE rides unrounded centroid cosines; the Nprobe-th /
    * (Nprobe+1)-th gap floor (IvfParams.Label) is what makes that choice
    * robust to summation-order ulps in either twin's centroid path.
    */
  private[graft] def ivfProbeTopK(embeddings: DataFrame, cent: DataFrame,
                                  queryId: Long, k: Int,
                                  nprobe: Int): DataFrame = {
    val qv = queryVector(embeddings, queryId)
    val qe = typedlit(qv)
    val qd = typedlit(qv.map(_.toDouble))
    val best = cent
      .select(col("label"),
        (dot(col("centroid"), qd) / (norm(col("centroid")) * norm(qd))).as("cc"))
      .orderBy(col("cc").desc, col("label")).limit(nprobe).select("label")
    embeddings.join(broadcast(best), "label")
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id").cast("long"),
        round(vector_cosine(col("embedding"), qe), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  def cosineTopKIvf(embeddings: DataFrame, queryId: Long, k: Int = 10,
                    nprobe: Int = 1): DataFrame =
    ivfProbeTopK(embeddings, labelCentroids(embeddings), queryId, k, nprobe)

  /** The probe-SELECTION half of [[ivfProbeTopK]], shared verbatim with
    * [[ivfAdcTopK]] and the streaming IVFADC twin: the best `nprobe`
    * labels by unrounded centroid cosine (the IvfParams.Label margin
    * floor is what keeps this choice stable across engines and twins).
    */
  private[graft] def probeLabels(cent: DataFrame, qv: Seq[Float],
                                 nprobe: Int): DataFrame = {
    val qd = typedlit(qv.map(_.toDouble))
    cent.select(col("label"),
        (dot(col("centroid"), qd) / (norm(col("centroid")) * norm(qd))).as("cc"))
      .orderBy(col("cc").desc, col("label")).limit(nprobe).select("label")
  }

  /** Int8 scalar-quantized top-k: per-dimension corpus [min, max] maps
    * each float to an integer code `least(255, floor((x−mn)/(mx−mn)·256))`
    * and scoring becomes an EXACT integer dot product — at 100 TB the
    * quantized corpus is 4× smaller to scan (64 int8 codes vs 64 floats)
    * and the hot loop is integer multiply-add. The [mn,mx] frame (64
    * rows) is a search-structure *parameter* like the k-means seeds: one
    * tiny aggregate job, then the codebook rides into the scan as array
    * literals. Everything downstream of the codebook is integer-exact, so
    * unlike the float cosine paths this needs no rounding contract at
    * all — the oracle matches on BIGINT equality.
    * Output: (vec_id, score) ordered by (score DESC, vec_id), k rows.
    */
  def quantizedTopK(embeddings: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val stats = embeddings
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
    val mins = stats.map(_.getDouble(1))
    val ranges = stats.indices.map(i => stats(i).getDouble(2) - mins(i)).toArray
    // driver-side quantization of the query uses the SAME IEEE op sequence
    // as the distributed expression below — identical codes by construction
    def quantize(x: Double, i: Int): Long =
      if (ranges(i) == 0.0) 0L
      else math.min(255L, math.floor((x - mins(i)) / ranges(i) * 256.0).toLong)
    val qCodes = queryVector(embeddings, queryId).zipWithIndex
      .map { case (x, i) => quantize(x.toDouble, i) }
    val minsL = typedlit(mins.toSeq)
    val rangesL = typedlit(ranges.toSeq)
    val codes = zip_with(
      zip_with(col("embedding"), minsL, (x, mn) => x.cast("double") - mn),
      rangesL,
      (d, r) => when(r === 0.0, 0L)
        .otherwise(least(lit(255L), floor(d / r * lit(256.0)))))
    embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id").cast("long"),
        aggregate(zip_with(codes, typedlit(qCodes), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Product-quantization (PQ) top-k, the third point on the ANN
    * accuracy/cost curve after IVF (cosineTopKIvf: prune WHICH vectors
    * to score) and SQ (quantizedTopK: shrink HOW each is scored): PQ
    * compresses each vector to `m` small codes — here 8 subspaces of 8
    * dims, 16 centroids each, so 8 bytes per vector instead of 256 — and
    * scores via an asymmetric-distance (ADC) lookup table built once
    * from the query (Jégou et al., TPAMI 2011). Everything runs on the
    * SAME int8 grid as [[quantizedTopK]], and the codebook is
    * data-anchored (centroid j of every subspace = the int8 subvector of
    * vec_id j) — deterministically reconstructable by the oracle, and
    * swappable for [[KMeans]] centroids without touching the dataflow.
    * At 100 TB the scan reads 8 codes/vector, the per-row work is m
    * argmins over 16 candidates in exact integers, the ADC table (m×16
    * BIGINTs) rides into codegen as literals, and the top-k is a
    * TakeOrdered — no shuffle, no FP, no rounding contract.
    * Output: (vec_id, adc_dist) ordered by (adc_dist ASC, vec_id).
    */
  def pqTopK(embeddings: DataFrame, queryId: Long, k: Int = 10,
             m: Int = 8, nCentroids: Int = 16): DataFrame = {
    val cb = fitPq(embeddings, queryId, m, nCentroids)
    embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id").cast("long").as("vec_id"), cb.codes.as("codes"))
      .select(col("vec_id") +: cb.adcCols: _*)
      .select(col("vec_id"),
        (0 until m).map(s => col(s"adc_$s")).reduce(_ + _).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
      .limit(k)
  }

  /** The query-independent half of the PQ model: the per-dim [mn,mx]
    * 256-grid, the anchor codebook, and the scan-side expressions built
    * from them. Factored out of [[fitPq]] (r15) so the streaming IVFADC
    * twin can (a) CODE vectors at ingest (the `assigns` column is the
    * 8-byte-per-vector PQ code it stores) and (b) rebuild the identical
    * quantizer at refit time from its ADDITIVE per-dim min/max state —
    * min/max are associative and duplicate-insensitive, so the
    * batch-fold equals [[fitPqQuantizer]]'s corpus-scan stats exactly.
    */
  private[graft] final case class PqQuantizer(m: Int, sub: Int,
      nCentroids: Int, mins: Array[Double], ranges: Array[Double],
      anchors: Array[Array[Long]]) {
    def quantize(x: Double, i: Int): Long =
      if (ranges(i) == 0.0) 0L
      else math.min(255L, math.floor((x - mins(i)) / ranges(i) * 256.0).toLong)

    /** 256-grid codes from an `embedding` column. */
    def codes: Column = {
      val minsL = typedlit(mins.toSeq)
      val rangesL = typedlit(ranges.toSeq)
      zip_with(
        zip_with(col("embedding"), minsL, (x, mn) => x.cast("double") - mn),
        rangesL,
        (d, r) => when(r === 0.0, 0L)
          .otherwise(least(lit(255L), floor(d / r * lit(256.0)))))
    }

    /** Per-subspace 1-based anchor assignment from a `codes` column —
      * argmin over the literal centroids, first-min = lowest anchor id
      * (array_position returns the first index of the minimum).
      */
    def assignExpr(s: Int): Column = {
      val arr = slice(col("codes"), s * sub + 1, sub)
      val dists = array((0 until nCentroids).map { j =>
        aggregate(
          zip_with(arr, typedlit(anchors(j).slice(s * sub, s * sub + sub).toSeq),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v)
      }: _*)
      array_position(dists, array_min(dists)).cast("int")
    }

    /** All m assignments as one array<int> — the stored PQ code. */
    def assigns: Column = array((0 until m).map(assignExpr): _*)

    /** Query ADC table T(s)(j) = ‖query_s − anchor_j,s‖² in exact ints. */
    def adcTableFor(q: Seq[Float]): Array[Array[Long]] = {
      val qCodes = q.zipWithIndex.map { case (x, i) => quantize(x.toDouble, i) }
      Array.tabulate(m) { s =>
        Array.tabulate(nCentroids) { j =>
          (0 until sub).map { d =>
            val diff = qCodes(s * sub + d) - anchors(j)(s * sub + d); diff * diff
          }.sum
        }
      }
    }
  }

  private[graft] object PqQuantizer {
    /** Build from precomputed per-dim stats + the 16 anchor embeddings
      * (vec_ids 0..nCentroids-1, in id order) — the streaming refit path.
      */
    def from(mins: Array[Double], ranges: Array[Double],
             anchorEmbs: Seq[Seq[Float]], m: Int,
             nCentroids: Int): PqQuantizer = {
      val dim = mins.length
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      require(anchorEmbs.length == nCentroids,
        s"need vec_ids 0..${nCentroids - 1} as anchors")
      def quantize(x: Double, i: Int): Long =
        if (ranges(i) == 0.0) 0L
        else math.min(255L, math.floor((x - mins(i)) / ranges(i) * 256.0).toLong)
      val anchors = anchorEmbs.map(_.zipWithIndex
        .map { case (x, i) => quantize(x.toDouble, i) }.toArray).toArray
      PqQuantizer(m, dim / m, nCentroids, mins, ranges, anchors)
    }
  }

  /** Corpus-scan fit of the quantizer: per-dim [mn,mx] stats plus the
    * anchor rows — parameter-scale collects (dim + 16 rows), like the SQ
    * [mn,mx] frame and the k-means seeds.
    */
  private[graft] def fitPqQuantizer(embeddings: DataFrame, m: Int,
                                    nCentroids: Int): PqQuantizer = {
    val stats = embeddings
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
    val mins = stats.map(_.getDouble(1))
    val ranges = stats.indices.map(i => stats(i).getDouble(2) - mins(i)).toArray
    val anchorEmbs = embeddings
      .filter(col("vec_id") < nCentroids).select("vec_id", "embedding")
      .collect().sortBy(_.getLong(0)).toSeq.map(_.getSeq[Float](1))
    PqQuantizer.from(mins, ranges, anchorEmbs, m, nCentroids)
  }

  /** Fitted PQ model — the quantizer plus the query ADC table and the
    * scan-side ADC expressions. Factored out of [[pqTopK]] VERBATIM so
    * [[ivfAdcTopK]] scores its probed cells on the identical integer
    * grid (same codes, same assignments, same table — the oracle replays
    * both from one CTE chain).
    */
  private[pipeline] final case class PqModel(qz: PqQuantizer,
      adcTable: Array[Array[Long]]) {
    def codes: Column = qz.codes
    /** Per-subspace assignment feeding the ADC lookup — one scan-side
      * select over a `codes` column.
      */
    def adcCols: Seq[Column] = (0 until qz.m).map { s =>
      element_at(typedlit(adcTable(s).toSeq), qz.assignExpr(s)).as(s"adc_$s")
    }
  }

  private[pipeline] def fitPq(embeddings: DataFrame, queryId: Long,
                              m: Int, nCentroids: Int): PqModel = {
    val qz = fitPqQuantizer(embeddings, m, nCentroids)
    PqModel(qz, qz.adcTableFor(queryVector(embeddings, queryId)))
  }

  /** IVFADC — the standard at-scale composition of the repo's two ANN
    * rungs (Jégou et al., TPAMI 2011, §IV): IVF cell pruning decides
    * WHICH vectors to consider ([[cosineTopKIvf]]'s centroid-cosine
    * probe over the label cells), PQ/ADC decides how CHEAPLY each is
    * scored ([[pqTopK]]'s int8 codes — 8 bytes/vector instead of 256),
    * and an exact float re-rank of the short ADC head restores precision
    * on the few candidates that matter. At 100 TB this is the vector-
    * store default: the scan touches nprobe/nlist of the corpus, reads
    * codes not embeddings, and the full-precision vectors are fetched
    * for only `rerankN` rows.
    *
    * Determinism/oracle: the probe set rides the [[IvfParams.Label]]
    * margin floor (same contract as `embedding_topk_ivf`); everything
    * between probe and re-rank is EXACT integers (codes, assignments,
    * ADC sums — the [[pqTopK]] grid verbatim, stats and anchors fit on
    * the FULL corpus so the codebook is probe-invariant); the head cut
    * is (BIGINT adc_dist, vec_id) — replayed bit-for-bit in SQL; the
    * final k rides the rounded-cosine + vec_id contract.
    * Output: (vec_id, cosine) ordered by (cosine DESC, vec_id), k rows.
    */
  def ivfAdcTopK(embeddings: DataFrame, queryId: Long, k: Int = 10,
                 nprobe: Int = 4, m: Int = 8, nCentroids: Int = 16,
                 rerankN: Int = 50): DataFrame = {
    val qv = queryVector(embeddings, queryId)
    val qe = typedlit(qv)
    val best = probeLabels(labelCentroids(embeddings), qv, nprobe)
    val cb = fitPq(embeddings, queryId, m, nCentroids)
    val head = embeddings.join(broadcast(best), "label")
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        cb.codes.as("codes"))
      .select(col("vec_id") +: col("embedding") +: cb.adcCols: _*)
      .select(col("vec_id"), col("embedding"),
        (0 until m).map(s => col(s"adc_$s")).reduce(_ + _).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
      .limit(rerankN)
    head.select(col("vec_id"),
        round(vector_cosine(col("embedding"), qe), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch k-NN join — one dataflow answers MANY similarity searches:
    * every vector with `vec_id < maxQueryId` gets its top-k cosine
    * neighbors from the whole table. The batch analogue of [[cosineTopK]]
    * (and of the multi-start BFS request batching): n queries cost one
    * scan against a broadcast query side, not n scans. Scoring is the
    * codegen'd native cosine on the 4-dp-rounded score
    * (cross-engine-stable, vec_id tiebreak). Per-query pruning DOGFOODS
    * the engine's own [[graft.plans.GroupTopK]] whole-operator extension:
    * the shuffle carries ≤ k rows per query per partition instead of the
    * full n×q scored product — the exact shape the window formulation
    * (`row_number() OVER (PARTITION BY qid)`) gets wrong at scale. The
    * rank is then a window over only the ≤k survivors, which reuses the
    * GroupTopK final pass's hash partitioning (no second Exchange). Scale
    * path for huge query sets: coarse-quantize BOTH sides (the
    * [[KMeans]] IVF quantizer) so the product becomes per-cluster blocks.
    * Output: (query_id, neighbor_id, rn, cosine) ordered.
    */
  def knnJoin(embeddings: DataFrame, maxQueryId: Long = 16L, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = embeddings.select(col("vec_id"), col("embedding"))
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine", round(vector_cosine(col("embedding"), col("qe")), 4))
    val pruned = graft.plans.GroupTopK.topKPerKey(scored, Seq(col("qid")),
      Seq(col("cosine").desc, col("vec_id")), k)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    pruned.withColumn("rn", row_number().over(w))
      .select(col("qid").cast("long").as("query_id"),
        col("vec_id").cast("long").as("neighbor_id"),
        col("rn").cast("long").as("rn"), col("cosine"))
      .orderBy("query_id", "rn")
  }

  /** Label-noise candidates by k-NN label voting (the neighbor-vote
    * variant of confident learning, Northcutt et al. 2021,
    * arXiv:1911.00068 — what "find mislabeled rows" tools do): each
    * vector's declared label vs the MAJORITY label among its `k` nearest
    * neighbors by cosine; disagreement flags the row for review. Majority
    * ties break to the smallest label (`max_by` struct `(n, −label)`),
    * neighbor ranking uses the rounded-cosine replay contract — fully
    * deterministic, DuckDB-replayable.
    *
    * Scale: this is the EXACT all-queries baseline (every vector is a
    * query; the scored join is |V|·|V| at heart) kept for oracle truth —
    * at corpus scale the declared pruned path is [[labelNoiseAnn]]
    * (in-cluster candidates from the learned quantizer, agreement
    * floored in PropertyOracleSpec), with this exact kernel as the
    * quality referee on a sample. Per-query state is
    * bounded by GroupTopK's heaps (never a full sort of the scored
    * table). Output: (vec_id, label, knn_label, n_votes, suspect)
    * ordered.
    */
  def labelNoise(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val q = embeddings.select(col("vec_id").as("qid"),
      col("embedding").as("qe"), col("label").as("qlabel"))
    val scored = embeddings.select(col("vec_id"), col("embedding"), col("label"))
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine", round(vector_cosine(col("embedding"), col("qe")), 4))
    labelVote(scored, k)
  }

  /** The k-NN label-vote/verdict kernel shared by [[labelNoise]] (exact
    * candidates) and [[labelNoiseAnn]] (coarse-quantizer candidates):
    * GroupTopK heaps prune each query's scored candidates to its k
    * nearest (rounded-cosine replay contract, vec_id ties), the majority
    * label wins, ties to the smallest label. Input columns:
    * (qid, qlabel, vec_id, label, cosine).
    */
  private def labelVote(scored: DataFrame, k: Int): DataFrame = {
    val pruned = graft.plans.GroupTopK.topKPerKey(scored, Seq(col("qid")),
      Seq(col("cosine").desc, col("vec_id")), k)
    pruned.groupBy("qid", "qlabel", "label")
      .agg(count(lit(1)).cast("long").as("n"))
      .groupBy("qid", "qlabel")
      .agg(max_by(struct(col("label"), col("n")),
        struct(col("n"), -col("label"))).as("m"))
      .select(col("qid").cast("long").as("vec_id"),
        col("qlabel").cast("long").as("label"),
        col("m.label").cast("long").as("knn_label"),
        col("m.n").as("n_votes"),
        (col("m.label").cast("long") =!= col("qlabel").cast("long")).as("suspect"))
      .orderBy("vec_id")
  }

  /** Label-noise via the LEARNED coarse quantizer — the at-scale default
    * the exact [[labelNoise]] referees: neighbor candidates come only
    * from each vector's own k-means cluster (the SemDeDup pruning
    * structure — pair space Σ|cluster|², never |V|²), then the SAME
    * [[labelVote]] kernel votes among the k nearest in-cluster
    * neighbors. Clusters are [[KMeans.fit]]'s deterministic Lloyd
    * assignment, so the whole composition (rounds + assignment + vote)
    * replays in SQL through the unrolled-Lloyd CTE chain.
    *
    * Contract notes: a vector alone in its cluster has no candidates and
    * is absent from the output (both engines agree); verdict agreement
    * vs the exact kernel is floored in PropertyOracleSpec and recorded
    * in AGREEMENT.json — the IVF-recall pattern. Scale: one fit (at
    * 100 TB: fit on a sample, assign the corpus once), one
    * cluster-keyed shuffle, per-cluster pair fan-out bounded by the
    * quantizer's cluster sizes (nlist grows with the corpus).
    * Output: same schema as [[labelNoise]], ordered by vec_id.
    */
  def labelNoiseAnn(embeddings: DataFrame, k: Int = 10, nlist: Int = 8,
                    iters: Int = 3): DataFrame = {
    val fitted = KMeans.fit(embeddings, nlist, iters) // (vec_id, embedding, cluster)
    val lab = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      col("label").cast("long").as("label"))
    val m = fitted.join(lab, "vec_id")
      .localCheckpoint(true) // feeds both sides of the in-cluster pair join
    val q = m.select(col("cluster"), col("vec_id").as("qid"),
      col("embedding").as("qe"), col("label").as("qlabel"))
    val scored = m.join(q, Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", round(vector_cosine(col("embedding"), col("qe")), 4))
    labelVote(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * label to avoid the full cross join (pairs across labels are assumed
    * dissimilar — the LSH/IVF contract). Exact within each label bucket:
    * O(bucket²) — the reference semantics; [[cosineNearDupPairsLsh]] is
    * the sub-quadratic candidate path with identical output.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = embeddings.select(col("label"), col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, Seq("label")).filter(col("va") < col("vb"))
      .withColumn("cos", vector_cosine(col("ea"), col("eb")))
      .filter(col("cos") >= threshold)
      .select(col("va").cast("long").as("vec_a"),
              col("vb").cast("long").as("vec_b"),
              round(col("cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication inside embedding clusters — the pruning structure that
    * makes web-scale semantic dedup tractable: candidate pairs form only
    * WITHIN a cluster (here the label coarse partition, swappable for
    * [[KMeans]] assignments), never across the corpus, so the pair space
    * is Σ|cluster|², not |corpus|². Keep policy is deterministic
    * greedy-by-id: a vector is dropped iff some LOWER-id vector in its
    * cluster clears the cosine threshold — ONE distinct projection of
    * the pair join (no iterative group collapse), order-free,
    * oracle-exact. Scoring is the codegen'd native cosine.
    * Output: (label, n_vectors, n_dropped, n_kept) per cluster.
    */
  def semDedup(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = embeddings.select(col("label"), col("vec_id").as("vb"), col("embedding").as("eb"))
    val dropped = a.join(b, Seq("label")).filter(col("va") < col("vb"))
      .filter(vector_cosine(col("ea"), col("eb")) >= threshold)
      .select(col("label").cast("long").as("dl"), col("vb").as("dropv")).distinct()
    val base = embeddings.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).cast("long").as("n_vectors"))
    val drops = dropped.groupBy(col("dl").as("label"))
      .agg(count(lit(1)).cast("long").as("n_dropped"))
    base.join(drops, Seq("label"), "left")
      .select(col("label"), col("n_vectors"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_vectors") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
      .orderBy("label")
  }

  /** Near-dup pairs via hyperplane-LSH banding: `words` 64-bit sign
    * sketches per vector ([[graft.functions.VectorSignSketch]], seeds
    * 1..words), cut into `rowsPerBand`-bit bands; candidates = pairs
    * sharing (label, band, band value); exact cosine verifies candidates.
    * Same output columns and semantics as [[cosineNearDupPairs]] whenever
    * banding recall is 100% (deterministic per corpus — fixed seeds).
    *
    * Scale honesty (measured on the test corpora): banding cost is
    * O(n·bands) keys and bucket-sized joins — the sub-quadratic shape.
    * HOW MUCH it prunes depends on the threshold regime: at a true
    * near-dup threshold (≥0.9, bit-agreement ≥0.85) a few 4-bit bands
    * catch every dup while random pairs collide rarely (see
    * SimilarityLshSpec: >85% of candidate pairs pruned on planted dups).
    * At this corpus's tuned t=0.4 the qualifying pairs sit barely above
    * the orthogonal background (bit agreement 0.63 vs 0.50), so 48 bands
    * are needed for full recall and pruning is necessarily thin (~6%) —
    * an information limit of sign-LSH at weak thresholds, not a plan
    * defect; the shuffle topology stays bucket-sized either way.
    */
  def cosineNearDupPairsLsh(embeddings: DataFrame, threshold: Double = 0.95,
                            words: Int = 3, rowsPerBand: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.vector_sign_sketch
    require(64 % rowsPerBand == 0, "rowsPerBand must divide 64")
    val sketchCols = (1 to words).map(s =>
      vector_sign_sketch(col("embedding"), s).as(s"sig$s"))
    val base = embeddings
      .select(Seq(col("label"), col("vec_id"), col("embedding")) ++ sketchCols: _*)
      .localCheckpoint(true) // feeds both join sides + the verify join
    val mask = (1L << rowsPerBand) - 1
    val bandCols = (0 until words * 64 / rowsPerBand).map { b =>
      val word = b * rowsPerBand / 64 + 1
      val off = b * rowsPerBand % 64
      struct(lit(b).as("band"),
        shiftright(col(s"sig$word"), off).bitwiseAND(lit(mask)).as("bandsig"))
    }
    val banded = base.select(col("label"), col("vec_id"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("label"), col("vec_id"), col("bb.band").as("band"),
        col("bb.bandsig").as("bandsig"))
    val l = banded.select(col("label"), col("band"), col("bandsig"), col("vec_id").as("va"))
    val r = banded.select(col("label"), col("band"), col("bandsig"), col("vec_id").as("vb"))
    val candidates = l.join(r, Seq("label", "band", "bandsig"))
      .filter(col("va") < col("vb"))
      .select("va", "vb").distinct()
      .localCheckpoint(true) // small; feeds the two-sided verify join
    val ea = base.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val eb = base.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    candidates.join(ea, "va").join(eb, "vb")
      .withColumn("cos", vector_cosine(col("ea"), col("eb")))
      .filter(col("cos") >= threshold)
      .select(col("va").cast("long").as("vec_a"),
              col("vb").cast("long").as("vec_b"),
              round(col("cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** HARD-NEGATIVE mining for contrastive training (the ANCE/DPR
    * candidate step, Xiong et al. 2020, arXiv:2007.00808): for each query
    * vector, the `k` most-similar vectors carrying a DIFFERENT label —
    * close in embedding space but wrong by supervision, the negatives
    * that actually move a contrastive loss (random negatives are too easy
    * to inform the gradient).
    *
    * Same single broadcast-join scan as [[knnJoin]] — the label
    * disequality rides the join condition, so the filter cuts candidates
    * BEFORE GroupTopK's bounded heaps, and per-query state never exceeds
    * k. At corpus scale the scan side comes from an IVF/rerank candidate
    * pool instead; the kernel is unchanged. Output: (query_id,
    * query_label, neighbor_id, neighbor_label, rn, cosine) ordered.
    */
  def hardNegatives(embeddings: DataFrame, maxQueryId: Long = 8L,
                    k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = embeddings.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val scored = embeddings.select(col("vec_id"), col("embedding"), col("label"))
      .join(broadcast(q),
        col("vec_id") =!= col("qid") && col("label") =!= col("qlabel"))
      .withColumn("cosine", round(vector_cosine(col("embedding"), col("qe")), 4))
    val pruned = graft.plans.GroupTopK.topKPerKey(scored, Seq(col("qid")),
      Seq(col("cosine").desc, col("vec_id")), k)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    pruned.withColumn("rn", row_number().over(w))
      .select(col("qid").cast("long").as("query_id"),
        col("qlabel").cast("long").as("query_label"),
        col("vec_id").cast("long").as("neighbor_id"),
        col("label").cast("long").as("neighbor_label"),
        col("rn").cast("long").as("rn"), col("cosine"))
      .orderBy("query_id", "rn")
  }

  /** Greedy k-center coreset seeds (Gonzalez 1985 2-approximation — the
    * seeding step of core-set selection à la Sener & Savarese 2018,
    * arXiv:1708.00489): start from `startId`, then `k−1` times pick the
    * vector FARTHEST (max min-squared-L2) from everything chosen so far —
    * the maximally-diverse sample a labeling budget is best spent on.
    *
    * Scale shape: the classic incremental-min trick — each round scores
    * ONLY the newest seed (one codegen'd distance per row) and folds it
    * into a running `mind` column, so k seeds cost k linear scans, not
    * k·|chosen| — and the per-round reduction is a single max_by struct
    * aggregate (map-side combined to one row per partition), never a
    * global sort. The chosen seed is a PARAMETER of the next scan
    * (1-row collect, IvfParams-style), and the running state is
    * localCheckpoint'd per round to keep lineage flat. Rounded distances
    * (4 dp) make the argmax replayable in DuckDB; ties break to the
    * smaller vec_id.
    *
    * Output: (seed_rank, vec_id, dist2) — dist2 = the min-squared-
    * distance to the prior seeds that made the pick (0.0 for the start).
    */
  def kCenterSeeds(embeddings: DataFrame, k: Int = 5,
                   startId: Long = 0L): DataFrame = {
    import graft.functions.VectorFunctions.vector_dist2
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding")).localCheckpoint(true)

    var seedVec: Seq[Float] = queryVector(embeddings, startId)
    val seeds = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)](
      (1L, startId, 0.0))
    var state = base.filter(col("vec_id") =!= startId)
      .withColumn("mind", round(vector_dist2(col("embedding"), typedlit(seedVec)), 4))
      .localCheckpoint(true)
    var rank = 2
    while (rank <= k) {
      val top = state
        .agg(max_by(struct(col("vec_id"), col("embedding"), col("mind")),
          struct(col("mind"), -col("vec_id"))).as("m"))
        .select("m.vec_id", "m.embedding", "m.mind").head()
      val chosenId = top.getLong(0)
      seedVec = top.getSeq[Float](1)
      seeds += ((rank.toLong, chosenId, top.getDouble(2)))
      if (rank < k)
        state = state.filter(col("vec_id") =!= chosenId)
          .withColumn("mind", least(col("mind"),
            round(vector_dist2(col("embedding"), typedlit(seedVec)), 4)))
          .localCheckpoint(true)
      rank += 1
    }
    seeds.toSeq.toDF("seed_rank", "vec_id", "dist2").orderBy("seed_rank")
  }
}
