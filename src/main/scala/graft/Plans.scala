package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump formatted physical plans of the headline queries to PLANS.md —
  * the evidence trail for the scale-design claims (pushdown, pruning,
  * broadcast, codegen spans). Usage: `sbt "runMain graft.Plans [sfDir]"`.
  */
object Plans {
  private val Commentary = Map(
    "q1_agg" -> "Filter must appear in PushedFilters; ReadSchema pruned to 7 columns; two-phase HashAggregate inside one WholeStageCodegen span.",
    "top_revenue" -> "customer broadcast (BroadcastHashJoin); orders⋈lineitem shuffles once on the join key; final TakeOrdered.",
    "embedding_topk" -> "single-row query vector broadcast; native vector_cosine inside the codegen'd Project; TakeOrderedAndProject = distributed top-k, no global sort.",
    "bfs_levels" -> "one iteration shown: frontier (localCheckpointed) joins edges, anti-joins visited; AQE picks broadcast for the small frontier.",
    "minhash_lsh" -> "persisted shingles feed minhash_agg (ObjectHashAggregate, one 64-long buffer per doc through the shuffle); band self-join on (band, bandsig); candidate-only Jaccard verification.",
    "events_sessions" -> "single shuffle on user_id; both window functions and the session aggregation reuse that partitioning (no second Exchange).",
    "embedding_topk_ivf_kmeans" -> "final probe over the checkpointed fit: broadcast of the nprobe best clusters, codegen'd vector_cosine scoring, TakeOrdered top-k (the per-iteration assignment scan is a separate section below).",
    "embedding_neardup" -> "declared at t=0.9 (sign-LSH's strong regime, 24×8-bit bands) over the planted-dup corpus: hyperplane sign sketches (vector_sign_sketch ×3, codegen'd) materialized once; band explode + self-join on (label, band, bandsig); candidates checkpointed small; exact-cosine verify joins only candidate vectors.",
    "winnow_fingerprint" -> "one shuffle (per-doc window sort); 60-bit md5-derived BIGINT k-gram hashes (8-byte window payload, not 32-char hex) and the window-min run inside the same WindowExec partition; distinct reuses the doc partitioning.",
    "simhash_pairs" -> "md5-derived BIGINT token hashes feed simhash_agg (ObjectHashAggregate, one 64-counter buffer per doc through the shuffle); 4×16-bit pigeonhole block self-join generates candidates; bit_count verify — fully DuckDB-replayable end to end.",
    "sssp_bounded" -> "final Bellman-Ford round shown (earlier rounds are checkpointed away): the V-sized distance table joins the persisted edge set, unions, min-aggregates — never a path enumeration; weights are floored to BIGINT identically in both engines (explicit floor — double→long cast rounding differs).",
    "neighbor_degree_stats" -> "two natural-key shuffles: degree aggregation, then the neighbor join re-aggregated on src; both HashAggregates two-phase (partial map-side).",
    "char_entropy" -> "NO Exchange before the final sort: the native char_entropy_stats expression computes the per-row code-point histogram inside WholeStageCodegen — the old explode+double-aggregate shape shuffled one row per character.",
    "embedding_knn_join" -> "query side broadcast (nested-loop by design — the scan IS the k-NN product); codegen'd vector_cosine scoring; per-query pruning DOGFOODS the engine's own GroupTopK operator (map-side k-row heaps, the single hash Exchange carries ≤ k rows per query per partition, spill-safe key cap); the rank window runs over only the ≤k survivors and reuses the GroupTopK final pass's partitioning — no second Exchange.",
    "triangle_counts" -> "degree-ordered (round 12): the checkpointed ORIENTED edge set (low-(degree,id) → high, built pre-checkpoint — see the census-orientation section) feeds the middle-vertex wedge join and the LeftSemi closing-edge probe; each triangle enumerates once as u≺v≺w, corner explode + two-phase count; hub wedge fan-out bounded by the O(√m) out-degree.",
    "decontaminate" -> "benchmark gram set is broadcast (LeftSemi BroadcastHashJoin) — the corpus-side grams never shuffle; the overlap count is a per-doc aggregate over the semi-join survivors.",
    "sorted_neighborhood" -> "blocked sorted-neighborhood candidates: ONE Exchange on the block key feeds the sort window (no global-order single partition); candidate pairs checkpoint small; the Jaccard verify joins shingles pair-keyed — cost ∝ candidates × doc size, never corpus².",
    "label_propagation" -> "one data Exchange per round beyond the message join: the explicit repartition(vertex) satisfies the clustered distribution of BOTH aggregates (label count on (vertex,label) and the max_by argmax on vertex — subset partitioning satisfies the superset), replacing the row_number window's sort Exchange.",
    "revenue_percentiles" -> "deliberately NOT a window plan: orderBy is a range-partitioned distributed sort and zipWithIndex assigns global ranks with per-partition offsets (the ExistingRDD scan is the indexed result) — the global-ORDER-BY window would serialize the dataset onto one task; percent/ntile are column arithmetic against one broadcast count row.",
    "bm25_top_docs" -> "no token-stream explode: tf is a per-row array filter inside the projection; the corpus stats (N, Σdl, per-term df) reduce to ONE row that rides back via BroadcastNestedLoopJoin; the fixed-order score expression evaluates in the same Project; TakeOrderedAndProject top-k.",
    "skyline_parts" -> "groupBy(price) pre-aggregate shrinks to the distinct-price frame; the strict prefix-max is the two-pass RDD scan (per-partition maxima → broadcast offsets — no single-partition window); survivors broadcast back as a BroadcastHashJoin against the full table.",
    "passage_dedup" -> "per-doc DISTINCT 8-grams come out of the native word_kgrams expression before the explode (no global DISTINCT); ONE Exchange on the passage key; two-phase HashAggregate counts docs per passage.",
    "cms_term_counts" -> "count_min_agg is an ObjectHashAggregate carrying ONE d×w counter array through the shuffle (the exploded formulation would shuffle d rows per token); the estimate read is a broadcast cross join of the one-row sketch against the term dictionary; exact counts shuffle once on term.",
    "equi_depth_hist" -> "exact NTILE without `ntile() OVER (ORDER BY …)`: range-partitioned sort + zipWithIndex global index, bucket arithmetic against one broadcast count row, final per-bucket aggregate — nothing ever serializes onto one task.",
    "merge_upsert" -> "MERGE INTO as one co-partitioned full-outer SortMergeJoin on the key; the upsert/delete/pass-through CASE is a codegen'd projection; no driver-side state anywhere.",
    "zorder_zonemap" -> "Morton z-values are pure BIGINT bit arithmetic inside the scan Project; file assignment is the two-pass global index (range-partitioned sort + zipWithIndex — the ExistingRDD), zone maps one per-file aggregate.",
    "attribution_last_touch" -> "as-of as union-and-carry: both event sides union, ONE Exchange on user_id, one window sort carries the latest click struct forward — no range cross-join, no per-row probe.",
    "drift_ks" -> "the distinct-value frame aggregates once; cumulative counts are the two-pass prefix-sum scan (ExistingRDD, no single-partition window); the KS max is decided on exact integer numerators with one broadcast totals row.",
    "media_phash" -> "perceptual hashing is a partition-local Dataset map (one codec context per partition, payloads never shuffle); the only Exchange is the final order by media_id.",
    "topk_per_group" -> "the custom whole-operator extension: GroupTopKPartial keeps a bounded k-row heap per key on the MAP side, so the single hash Exchange carries ≤ k·|keys| rows per partition instead of the table; GroupTopKFinal repeats the heap pass on clustered input for the exact answer — the partial-aggregation shape for top-k, vs the window plan's full shuffle + full per-partition sort.",
    "assoc_rules_top50" -> "market-basket association rules: the pair explosion is per-basket (okey equi-join, basket-bounded); item counts and the one-row basket total ride back as broadcast joins; confidence/lift are fixed-order double expressions over exact BIGINT counts; TakeOrdered top-50.",
    "rfm_segments" -> "three quantile dimensions WITHOUT ntile() OVER (ORDER BY …)'s single task: each pass is a range-partitioned sort + zipWithIndex global index (the ExistingRDD scans) + bucket arithmetic against one broadcast count row; the customer aggregate shuffles once on custkey.",
    "hourly_drawdown" -> "pure-BIGINT prefix-max: hourly counts aggregate once, then the two-pass distributed scan (per-partition maxima collected as a tiny offset array, broadcast back) — no max() OVER (ORDER BY) serialization point anywhere; every value integer-exact.",
    "bigram_pmi_top50" -> "one exploded-token Exchange feeds both the unigram aggregate and (via the native kGrams builder) the bigram counts; score joins key on DISTINCT grams/words — never token instances; the corpus total is one broadcast row; TakeOrdered on the raw double with the shipped score rounded.",
    "matrix_sink_roundtrip" -> "the DSv2 WRITE path: the sink's RequiresDistributionAndOrdering (clustered by graph_id, sorted graph_id/src/dst) makes the planner insert the shuffle+sort — look for the Exchange/Sort the sink itself demanded; each writer then streams whole graphs and lands one deterministic file per graph boundary.",
    "wpagerank_top20" -> "final weighted-PageRank round shown (earlier rounds checkpointed away): the rank vector joins the once-persisted normalized edge table, aggregates contributions per destination, and left-joins back onto the vertex frame — one join + one agg per round, bounded lineage; transition weights normalized once, not per round.",
    "segment_priority_revenue" -> "the TPC-H Q3 shape: segment-pruned customer dim broadcast; BOTH date filters appear in PushedFilters of their parquet scans; revenue aggregates once per order key — nothing wide ever shuffles.",
    "nation_flow_pairs" -> "the TPC-H Q7 shape: customer and supplier nation maps broadcast; the only wide shuffle is orders⋈lineitem; the cross-border predicate drops rows before the aggregate; revenue sums exact BIGINT ten-thousandths with one final division.",
    "kmv_distinct_users" -> "KMV sketch: the k smallest distinct hashes ARE a distributed TakeOrderedAndProject (per-partition heaps, driver merge of k) — no window, no global sort; estimate arithmetic against one broadcast exact-count row.",
    "hll_distinct_users" -> "HyperLogLog with a pure-integer harmonic sum: bucket/rank arithmetic inside the scan Project; the register build is ONE two-phase aggregate with map-side partial max — no pre-distinct on the hash (max-rank is duplicate-insensitive, the HLL insert rule), so ≤256 register rows cross the wire per partition; Σ2^(53−Mj) kept BIGINT so both engines agree bit-for-bit; one double expression at the end.",
    "kmv_users_per_type" -> "per-group KMV: the per-key min-k state is the engine's own GroupTopKPartial/Final pair (bounded map-side heaps, spill-safe) — per-key min-k IS the sketch; no window fallback anywhere.",
    "two_hop_reach" -> "2-hop neighborhood size: ONE wedge self-join over the basket-guarded co-purchase edges unioned with the 1-hop set, distinct, one vertex-key count — never a matrix power, never per-vertex BFS.",
    "zipf_alpha_terms" -> "vocabulary-health scalar: term ranks come from the range-partitioned sort + zipWithIndex global index (the ExistingRDD scan), never ROW_NUMBER() OVER (ORDER BY) — the five OLS moments reduce in one aggregate.",
    "kmv_segment_overlap" -> "set operations on sketches: three TakeOrdered min-k sketches (segment A, segment B, union), membership flags via two ≤k-row joins, estimates from a fixed IEEE op tree — the raw user sets are never co-shuffled.",
    "bootstrap_ci_mean" -> "Poisson bootstrap: the 64-replica explode is scan-local and feeds a PARTIAL aggregate (map-side combine), so the only shuffle carries ≤ B rows per partition; weights come from integer hash thresholds inside codegen; CI bounds are a parameter-scale 64-row sort.",
    "events_ewma" -> "EWMA without a time-axis window: the 10-hour kernel is a banded equi-join (bin = hour div 10, targets cover bin and bin−1); power-of-two weights stay exact BIGINT; one IEEE division per smoothed value.",
    "sequence_packing" -> "concat-then-chunk packing: hash-shuffled doc order, token prefix sums from the two-pass running-sums scan (per-partition subtotals broadcast as offsets — the ExistingRDD), chunk assignment is pure integer arithmetic in the projection.",
    "incremental_agg_maintenance" -> "aggregate-level view maintenance: base and delta aggregates merge through ONE co-partitioned full-outer join on the key; exact integer cents; equals the full recompute bit-for-bit.",
    "bloom_semijoin" -> "the runtime-filter shape: the one-row BloomFilterAggregate scalar subquery broadcasts into the orders scan's Filter — might_contain sits BELOW the LeftSemi BroadcastHashJoin, so non-members die at the scan before any join exchange; the exact semi-join then strips the ~2% false positives; orders ReadSchema pruned to 3 columns.",
    "walk_pmi" -> "skip-gram pairs from the walk-keyed self-join (a walk is ≤ 4 positions — bounded fan-out), one two-phase (a,b) count; occurrence counts join on DISTINCT vertices; totals ride one broadcast row; the final ranking is TakeOrdered on the ratio — each factor cast to double BEFORE multiplying (the BIGINT n·T² product overflowed past ~3e9 positions), still one fixed cross-engine op tree.",
    "label_noise_ann" -> "the at-scale label-noise path: the learned-quantizer membership (checkpointed fit ⋈ labels) self-joins on CLUSTER — pair fan-out Σ|c|², never |V|²; codegen'd vector_cosine scoring; per-query pruning through the engine's own GroupTopKPartial/Final heaps; the vote is two two-phase aggregates (label count, max_by argmax).",
    "neyman_sample" -> "Neyman allocation at parameter scale: the stratum moment aggregate map-combines to one row per source; the weight total is one broadcast row; allocation is integer floor-division in the projection; the ranked take is ONE source-keyed window whose partitions are stratum-sized.",
    "events_quantiles_sampled" -> "the read-pruned percentile path: the md5-threshold sample predicate is a codegen'd hash compare in the scan Filter (1/8 of rows survive to the sort), then the same two-phase PERCENTILE_DISC aggregate as the exact plan over 8× fewer rows.",
    "rich_club" -> "both histograms are explode-aggregates — each vertex/edge Generates into the ≤32 thresholds it clears, then a two-phase HashAggregate map-combines to ≤32 rows per partition; the checkpointed pair table feeds degrees and the edge min-degree join; no per-k rescan anywhere.",
    "audio_vad_segments" -> "framing is a partition-local Dataset map (each 32-byte frame reduces to two longs at the scan — payload bytes never shuffle); ONE Exchange on media_id serves both gaps-and-islands windows, whose partitions are single-payload frame lists, never corpus-sized keys.",
    "kneser_ney_bigrams" -> "counts aggregate to DISTINCT bigrams before any join (token instances never cross the wire after the map-side combine); both marginals and the one-row type count derive from the checkpointed gram table; the interpolated probability is two BIGINT polynomials + ONE division in the projection; TakeOrdered on the exact count.",
    "community_conductance" -> "one label join per edge endpoint (the LPA labeling is vertex-keyed and checkpointed), one community-keyed two-phase aggregate for volumes and cuts, a one-row 2m broadcast; φ is a single division in the projection — no per-community rescan, no window.",
    "leakage_safe_split" -> "split-by-cluster: the near-dup clustering plan (sketch-banded candidates + GraphX CC on the pair graph only) with the split decided by a per-row hash of the cluster id — zero additional Exchanges on top of the clustering.",
    "matrix_source_topk" -> "the r13 DSv2 TopN pushdown: the BatchScan description shows PushedTopN [ORDER BY graph_id, src, dst LIMIT 12 (partial)] — each file's parse stops at the 12th edge (row-major cell order IS the ascending sort), and the retained TakeOrderedAndProject merges the per-file heads; no full n²-cell decode anywhere.",
    "embedding_topk_ivfadc" -> "the composed ANN rung: nprobe best cells broadcast into the scan (partition-pruned on a label-partitioned store); PQ codes + per-subspace argmin + ADC table lookups are ALL literal integer arithmetic inside one codegen'd Project; the head is a TakeOrderedAndProject on (BIGINT adc_dist, vec_id); the exact vector_cosine re-rank runs on only the rerankN=200 head rows — full-precision embeddings never leave the probed cells.",
    "pipeline_curation_e2e" -> "the composed curation chain (r15 verdict #7): exact dedup hands survivors to near-dup clustering through ONE doc_id semi-join (the md5 groupBy is the stage's own semantic shuffle); the clustering subplan is dedup_clusters' pinned shape feeding from the checkpointed survivor set; gopher gates are scan-local flag arithmetic joined back on doc_id (no extra wide shuffle); the benchmark gram set stays BROADCAST into the decon semi-join; the split is per-row hash arithmetic (zero Exchanges); per-split packing is the two-pass prefix-sum scan (ExistingRDD) — every Exchange in this plan belongs to a stage's own semantics, none to the stage boundaries.",
    "skew_hot_key_join" -> "the adversarial-skew shape (r15 verdict #6): 90% of fact rows collapse onto ONE derived key; the dim is user-keyed — NOT broadcastable at 100 TB, shuffle_hash-hinted so the local plan shows the real shape; SkewUtils.saltedJoin turns the join key into (k, __salt), spreading the hot key's mass over 16 reducers with the dim exploded ×16 (the Generate under the build side); AQE's skew-join is the runtime lever when partition sizes are honest, but it declines at local data volume — the explicit salt is planner-independent and this plan pins it.",
    "stream_ivfadc_topk" -> "the SERVE plan over the MAINTAINED code store (dumped after the sf0.001 ingest replay): nprobe probe labels broadcast into the label-partitioned cell scan (partition-pruned); the ADC pass reads ONLY (vec_id, pq) — ReadSchema must NOT contain the embedding column, that pruning is the point of serving from stored codes; TakeOrderedAndProject head on (BIGINT adc_dist, vec_id); the exact re-rank fetches full-precision vectors via a broadcast join on just the rerankN head ids.",
    "curation_funnel" -> "the dataset-card numbers: seven ONE-ROW two-phase HashAggregates (map-side partial counts — nothing wider than one row per stage crosses the wire) unioned over the pipeline's own checkpointed stage sets; the stage subplans are pipeline_curation_e2e's pinned shapes (shared curationStages), so the funnel adds only the count tails.",
    "stream_media_dup" -> "the SERVE plan over the MAINTAINED media dup-group store (dumped after the sf0.001 ingest replay): a partition-pruned scan of the composite-key bucketed additive store, row-local n_media > 1 filter, sort by keeper — per-BATCH maintenance is the batch kernel's partition-local Dataset hash map (payload bytes never shuffle; only 2xBIGINT hash halves do) plus the bucket-footprint (SUM, MIN) fold, exercised by StreamSpec.",
    "stream_curation_e2e" -> "the SERVE plan over the MAINTAINED curation stores (dumped after the sf0.001 ingest replay, r16 verdict #4): final keepers LeftSemi the doc store, CC labels join on doc_id, the representative/gate filter (doc_id = cluster, gopher_keep, !contaminated) is row-local arithmetic on stored flags; the split is per-row hash arithmetic and per-split packing the two-pass prefix-sum scan (ExistingRDD) — the batch tail's exact shape over incrementally-maintained state. The per-BATCH maintenance plans are |Δ|-driven by construction (batch side BROADCAST into every store probe, hash/shingle AND CC-label reads partition-pruned to the batch's bucket footprint — since r18 new-vertex detection is a pruned broadcast left_semi probe + anti against the ≤|Δ| match set, not a verts-vs-whole-store left_anti that shuffled O(corpus) labels per batch — CC on the contracted delta graph only) and are exercised by StreamSpec's supersede replay rather than pinned here; store file maintenance is size-tiered (tieredCompactStore, r18: each merge touches one level's fan-in, O(data·log B) total rewrite, never the r17 O(B·store) wholesale fold; r19: at most ONE merge per dir per batch with cascades deferred, all same-level dirs merged in one basePath-read job, the listing skipped via an in-memory tally when no level can be full — the on/off A/B priced the policy at +0.2–0.8 s per replay).",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` on `$sfDir`. Regenerate: ")
    sb.append("`sbt \"runMain graft.Plans\"`.\n")
    for ((name, note) <- Commentary) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    // the k-means per-iteration hot path never survives into the final
    // query's plan (each Lloyd iteration is checkpointed) — dump it
    // directly: vector_l2_argmin must sit inside WholeStageCodegen
    val assignDf = pipeline.KMeans.assignPlan(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), k = 8)
    sb.append("\n## kmeans_assignment (per-iteration scan)\n\n")
    sb.append("the Lloyd-iteration hot path: one broadcast packed-centroid row, ")
    sb.append("native vector_l2_argmin + element_at inside the codegen'd Project — ")
    sb.append("no interpreted HOF on the full-table scan.\n\n```\n")
    sb.append(assignDf.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
    sb.append("\n```\n")
    // the random-walk per-step hot path is checkpointed away each round
    // (like the k-means assignment) — dump the step body directly
    locally {
      import org.apache.spark.sql.functions.col
      val e = spark.read.parquet(s"$sfDir/nation.parquet")
        .select((col("n_nationkey") % 5).as("src"),
          ((col("n_nationkey") * 3) % 5).as("dst")).localCheckpoint(true)
      val cur = e.select(col("src").as("walk")).distinct()
        .select(col("walk"), col("walk").as("v")).localCheckpoint(true)
      val stepDf = graph.GraphOps.walkStep(cur, e, 1)
      sb.append("\n## random_walk_step (per-iteration body)\n\n")
      sb.append("the per-step hot path graph_random_walks checkpoints every round: ")
      sb.append("candidates via the positions×edges equi-join, winner via the ")
      sb.append("per-walk (hash, dst) min_by argmin — a two-phase aggregate ")
      sb.append("whose map-side partial_min_by collapses candidates before the exchange.\n\n```\n")
      sb.append(stepDf.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    // the HyperBall gather round is checkpointed away each radius (like
    // the k-means assignment) — dump the round body directly
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.Sketches.{hll_reg_build_agg, hll_reg_merge_agg}
      val e = spark.read.parquet(s"$sfDir/nation.parquet")
        .select((col("n_nationkey") % 7).cast("long").as("src"),
          ((col("n_nationkey") * 3) % 7).cast("long").as("dst"))
        .localCheckpoint(true)
      val regs0 = e.select(col("src").as("v"))
        .unionAll(e.select(col("dst").as("v"))).distinct()
        .select(col("v"),
          graft.functions.PortableHash.md5Bits60(col("v").cast("string")).as("h"))
        .select(col("v"), (col("h") % 256).as("bucket"), expr("h div 256").as("rem"))
        .select(col("v"), col("bucket"),
          when(col("rem") === 0L, lit(53L))
            .otherwise(lit(53L) - length(bin(col("rem")))).cast("long").as("rank"))
        .groupBy("v").agg(hll_reg_build_agg(col("bucket"), col("rank"), 256).as("regs"))
        .localCheckpoint(true)
      val roundDf = regs0.join(e, regs0("v") === e("dst"))
        .select(e("src").as("v"), col("regs")).unionAll(regs0)
        .groupBy("v").agg(hll_reg_merge_agg(col("regs"), 256).as("regs"))
      sb.append("\n## hyperball_gather (per-radius body)\n\n")
      sb.append("the HyperBall propagation round each radius checkpoints away: ")
      sb.append("the packed 256-byte register blob rides ONE edge equi-join, ")
      sb.append("unions the current state, and max-merges in a two-phase ")
      sb.append("ObjectHashAggregate (hll_reg_merge_agg) — map-side partial ")
      sb.append("merge sends ≤ |V| blobs per partition, 256 B each regardless ")
      sb.append("of ball size.\n\n```\n")
      sb.append(roundDf.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    // the census orientation build is eagerly checkpointed before the
    // wedge joins (the final plans read a Scan ExistingRDD) — dump the
    // un-checkpointed composition directly: degree aggregate joined to
    // both endpoints, the (degree, id) CASE WHEN flip, then the
    // middle-vertex wedge join + closing-edge LeftSemi over it
    locally {
      import org.apache.spark.sql.functions.col
      val pairs = spark.read.parquet(s"$sfDir/nation.parquet")
        .select((col("n_nationkey") % 7).cast("long").as("a"),
          ((col("n_nationkey") % 7) + 1 + col("n_regionkey")).cast("long").as("b"))
        .filter(col("a") < col("b")).distinct().localCheckpoint(true)
      val tri = graph.GraphOps.orientedTriangles(
        graph.GraphOps.orientByDegree(pairs, graph.GraphOps.pairDegrees(pairs)))
      sb.append("\n## census_orientation (pre-checkpoint build + wedge join)\n\n")
      sb.append("the round-12 degree-ordered census build the checkpoint hides: ")
      sb.append("the degree HashAggregate joins back onto both edge endpoints, ")
      sb.append("the CASE WHEN (da < db …) projection flips each edge low-(degree, id) ")
      sb.append("→ high, and the wedge join pairs in-edges with out-edges on the ")
      sb.append("MIDDLE vertex (fan-out indeg·outdeg, outdeg O(√m) by the arboricity ")
      sb.append("bound) before the LeftSemi closing-edge probe — no cartesian, no ")
      sb.append("post-join dedup.\n\n```\n")
      sb.append(tri.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${Commentary.size} plans)")
    spark.stop()
  }
}
