package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * splitting and per-source quota sampling. Both are pure dataflow — the
  * split is a per-row hash (no global state, stable under re-partitioning
  * and re-runs, the property reservoir/rand sampling lacks), the quota is
  * one window over the natural (source) partitioning.
  */
object Curation {

  /** UniMax language/source sampling (Chung et al. 2023, ICLR,
    * arXiv:2304.09151): allocate a token BUDGET across sources as
    * uniformly as possible subject to a per-source epoch cap — the
    * waterfilling answer to "how much of each source does one training
    * run read", fairer than temperature sampling because no source is
    * repeated past `epochCap` epochs. alloc_s = min(cap_s, λ) with
    * cap_s = c_s·epochCap and the level λ chosen so Σ alloc = budget
    * (= total·budgetNum/budgetDen, integer floor).
    *
    * The waterfill is CLOSED FORM on sources sorted by cap ascending:
    * a source saturates iff cap_s·(remaining sources) < remaining budget
    * — an EXACT BIGINT cross-multiplied test (no FP level comparison);
    * saturation is a prefix of the sort, λ is ONE final division of
    * exact integers, and epochs_s divides the unrounded alloc. Scale:
    * the per-source token count is the only data-sized aggregate;
    * everything after runs on one row per source (global-index +
    * prefix-sum passes, parameter-scale). Output: (source, n_tokens,
    * cap, saturated, alloc, epochs) ordered by source.
    */
  def unimaxAllocation(documents: DataFrame, epochCap: Long = 2L,
                       budgetNum: Long = 9L, budgetDen: Long = 5L): DataFrame = {
    val cs = documents
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy("source").agg(sum("tk").cast("long").as("c"))
      .localCheckpoint(true) // one data-sized pass; feeds sort + totals
    val idx = Ranking.withGlobalIndex(
      cs.withColumn("cap", col("c") * lit(epochCap)), col("cap"), col("source"))
    val cum = Ranking.withRunningSums(idx, Seq("cap"), col("idx"))
      .withColumn("pprev", col("cum_cap") - col("cap"))
    val tot = broadcast(cs.agg(sum("c").cast("long").as("nn"),
      count(lit(1)).cast("long").as("n")))
    val flagged = cum.crossJoin(tot)
      .withColumn("budget", expr(s"(nn * $budgetNum) div $budgetDen"))
      .withColumn("sat",
        col("cap") * (col("n") - col("idx")) < col("budget") - col("pprev"))
      .localCheckpoint(true) // parameter-scale; feeds j*, P_{j*} and output
    val jstar = broadcast(flagged.agg(
      coalesce(min(when(!col("sat"), col("idx"))), max(col("n"))).as("js")))
    val withJs = flagged.crossJoin(jstar)
    val pj = broadcast(withJs.agg(
      sum(when(col("idx") < col("js"), col("cap")).otherwise(0L))
        .cast("long").as("pj")))
    withJs.crossJoin(pj)
      .withColumn("saturated", col("idx") < col("js"))
      .withColumn("rawalloc",
        when(col("saturated"), col("cap").cast("double"))
          .otherwise((col("budget") - col("pj")) * lit(1.0) / (col("n") - col("js"))))
      .select(col("source"), col("c").as("n_tokens"), col("cap"),
        col("saturated"), round(col("rawalloc"), 4).as("alloc"),
        round(col("rawalloc") / col("c"), 4).as("epochs"))
      .orderBy("source")
  }

  /** TEMPORAL leave-last-out split over an event stream: each user's
    * chronologically LAST event is the held-out test point, everything
    * before it is train — the split every sequential-recommendation /
    * next-event benchmark uses (and the only split that cannot leak the
    * future into training, the complement of the hash-based
    * [[trainValSplit]] which is leakage-safe across DOCS but blind to
    * time). Last = max (event-time ms, event_id) — the exact-integer
    * tiebreak makes the pick deterministic cross-engine.
    *
    * Scale: ONE user-keyed max_by aggregate (map-side combined), no
    * window, no sort. Output: (user_id, n_events, test_event_id,
    * test_ms) ordered by user — n_events − 1 rows land in train.
    */
  def temporalSplit(events: DataFrame): DataFrame = {
    val ms = graft.TsCompat.msOf(events)
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), ms.as("ms"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        max_by(struct(col("event_id"), col("ms")),
          struct(col("ms"), col("event_id"))).as("t"))
      .select(col("user_id"), col("n_events"),
        col("t.event_id").as("test_event_id"), col("t.ms").as("test_ms"))
      .orderBy("user_id")
  }

  /** Temperature-scaled source sampling weights (the multilingual-NMT /
    * mT5 mixing rule, Arivazhagan et al. 2019, arXiv:1907.05019 §4;
    * Raffel et al. 2020 §3.4.3): q_s ∝ p_s^(1/T) with T = 2 — the
    * square-root flattening that keeps head sources dominant but lifts
    * the tail enough to learn it. The sqrt exponent is chosen
    * deliberately: `sqrt` is an IEEE-exact primitive both engines compute
    * bit-identically (a general `pow(x, 1/T)` is libm-dependent), so the
    * only cross-engine jitter is the denominator's sum order —
    * 4-dp-rounded like every order-jittered double sum here (the
    * powerlaw_alpha precedent).
    *
    * Scale: ONE data-sized aggregate (per-source token counts); the
    * weight math runs on one row per source against a broadcast 1-row
    * total. Output: (source, n_tokens, p_raw, weight) ordered by source —
    * p_raw the natural proportion, weight the temperature-scaled one.
    */
  def temperatureWeights(documents: DataFrame): DataFrame = {
    val cs = documents
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy("source").agg(sum("tk").cast("long").as("c"))
      .localCheckpoint(true) // one data-sized pass; feeds totals + output
    val tot = broadcast(cs.agg(sum("c").cast("long").as("nn"),
      sum(sqrt(col("c").cast("double"))).as("sq")))
    cs.crossJoin(tot)
      .select(col("source"), col("c").as("n_tokens"),
        round(col("c").cast("double") / col("nn"), 4).as("p_raw"),
        round(sqrt(col("c").cast("double")) / col("sq"), 4).as("weight"))
      .orderBy("source")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359 §4.3): split each SOURCE's documents into
    * head / middle / tail thirds by language-model score — CCNet keeps
    * "head" (lowest perplexity ≈ most fluent) and drops or downweights
    * "tail"; this emits the assignment so the downstream mix can choose.
    * The LM here is the corpus bigram model ([[TextStats.bigramLmScore]]);
    * ranking uses its ROUNDED 4-dp cross-entropy plus a doc_id tie-break —
    * deliberately the rounded value, because the shipped score is the
    * cross-engine-stable quantity (ranking on the raw double would let a
    * last-ulp `log2` divergence flip bucket boundaries; on the rounded
    * value both engines rank identical bits identically).
    *
    * Scale: per-source thirds need per-source ranks; a
    * `Window.partitionBy(source)` would serialize each source (a handful
    * of giant partitions at corpus scale), so ranks come from ONE global
    * two-pass index ordered (source, ce, doc_id) ([[Ranking
    * .withGlobalIndex]] — range-partitioned sort + zipWithIndex) minus
    * the source's broadcast min-index. Docs with no bigram (single-token)
    * carry no score and are excluded, matching the LM relation. Output:
    * (doc_id, source, cross_entropy, bucket) ordered by doc_id.
    */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    val base = TextStats.bigramLmScore(documents)
      .join(documents.select(col("doc_id").cast("long").as("doc_id"),
        col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("cross_entropy"))
    val idx = Ranking.withGlobalIndex(base,
      col("source"), col("cross_entropy"), col("doc_id"))
    val srcStats = idx.groupBy("source")
      .agg(min("idx").as("idx0"), count(lit(1)).cast("long").as("n_src"))
    idx.join(broadcast(srcStats), "source")
      .withColumn("rk", col("idx") - col("idx0"))
      .withColumn("bucket",
        when(col("rk") * 3 < col("n_src"), "head")
          .when(col("rk") * 3 < col("n_src") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("source"), col("cross_entropy"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Weighted MIXTURE sampling — the data-mixing step that assembles a
    * training corpus from per-source quotas (upsample curated sources,
    * downsample crawl): rank each source's documents by the deterministic
    * id hash (reproducible across engines/runs/partitionings, like
    * [[trainValSplit]]) and keep the top `quota` rows, where `quota` is a
    * per-row column (typically a function of `source`). One shuffle on
    * source; the window reuses that partitioning. Output:
    * (source, doc_id, rn) ordered.
    */
  def mixtureSample(documents: DataFrame,
                    quota: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    documents
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        quota.as("quota"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= col("quota"))
      .select("source", "doc_id", "rn")
      .orderBy("source", "rn")
  }

  /** Benchmark DECONTAMINATION — the overlap check every serious training
    * pipeline runs before a model ships: count, per corpus document, the
    * distinct word `k`-grams it shares with a benchmark/eval set (here the
    * docs with `doc_id < benchmarkMaxId` stand in for the benchmark
    * suite), and flag any overlap. Grams come from the shared native
    * builder ([[TextStats.kGrams]], distinct per doc).
    *
    * Scale: the benchmark gram set is SMALL by contract (eval suites are
    * thousands of documents, the corpus is billions) — it broadcasts, so
    * the check is one semi-join at scan speed over the corpus grams; no
    * shuffle of corpus-sized data. Output:
    * (doc_id, n_shared_grams, contaminated) for non-benchmark docs,
    * ordered.
    */
  /** Shared parameters of the batch and streaming decontamination twins —
    * one definition so the pair (and their common oracle) cannot drift.
    */
  val DefaultBenchmarkMaxId = 10L
  val DefaultDeconK = 5

  /** Distinct k-grams per doc — the gram construction both twins share. */
  private[graft] def docGrams(documents: DataFrame, k: Int): DataFrame =
    documents.select(col("doc_id").cast("long").as("doc_id"),
      explode(TextStats.kGrams(split(col("text"), " "), k, distinct = true)).as("s"))

  /** Per-doc contamination flags of `corpus` against a benchmark gram
    * set — the shared kernel of [[decontaminate]] and
    * [[graft.streaming.StreamOps.decontaminateReplayBatch]]: any change
    * to the gram/semi-join/flag logic lands in BOTH twins by
    * construction, which is what lets one DuckDB oracle check both.
    * Unordered (callers order).
    */
  private[graft] def contaminationFlags(corpus: DataFrame, benchGrams: DataFrame,
                                        k: Int): DataFrame = {
    val shared = docGrams(corpus, k)
      .join(broadcast(benchGrams), Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corpus.select(col("doc_id").cast("long").as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).cast("long").as("n_shared_grams"))
      .withColumn("contaminated",
        when(col("n_shared_grams") > 0, 1L).otherwise(0L))
  }

  def decontaminate(documents: DataFrame,
                    benchmarkMaxId: Long = DefaultBenchmarkMaxId,
                    k: Int = DefaultDeconK): DataFrame = {
    val bench = docGrams(documents.filter(col("doc_id") < benchmarkMaxId), k)
      .select("s").distinct()
    contaminationFlags(
      documents.filter(col("doc_id").cast("long") >= benchmarkMaxId), bench, k)
      .orderBy("doc_id")
  }

  /** FUZZY decontamination — the near-duplicate upgrade of
    * [[decontaminate]]'s exact k-gram flags (benchmark rephrasings and
    * partial copies slip past exact 5-grams; shingle-Jaccard against the
    * benchmark set catches them — the contamination check modern dataset
    * cards actually report): per corpus doc, Jaccard over distinct
    * `w`-gram shingles against EVERY benchmark doc (doc_id <
    * `benchmarkMaxId`), flagged when any benchmark doc clears 1/2.
    *
    * Exactness: the threshold test is the cross-multiplied exact-integer
    * predicate `2·inter ≥ csz + bsz − inter` (never a float compare);
    * max_jaccard ships as the raw ratio of exact BIGINTs (bit-identical
    * IEEE division, unrounded). Scale: the benchmark shingle set is
    * BROADCAST (benchmarks are thousands of docs, not corpora), so the
    * candidate join costs one map-side probe per corpus shingle — never
    * corpus², never a shuffle of the corpus text; per-pair state exists
    * only for docs that actually share a shingle.
    * Output: (doc_id, n_bench_matches, max_jaccard, contaminated) for
    * every corpus doc, ordered.
    */
  def decontaminateFuzzy(documents: DataFrame,
                         benchmarkMaxId: Long = DefaultBenchmarkMaxId,
                         w: Int = 3): DataFrame = {
    val sh = Dedup.shingles(
        documents.select(col("doc_id").cast("long").as("doc_id"), col("text")), w)
      .localCheckpoint(true) // feeds benchmark AND corpus sides + sizes
    val bench = sh.filter(col("doc_id") < benchmarkMaxId)
      .select(col("doc_id").as("bid"), col("s"))
    val corpus = sh.filter(col("doc_id") >= benchmarkMaxId)
    val bsz = bench.groupBy("bid").agg(count(lit(1)).cast("long").as("bsz"))
    val csz = corpus.groupBy("doc_id").agg(count(lit(1)).cast("long").as("csz"))
    val inter = corpus.join(broadcast(bench), "s")
      .groupBy("doc_id", "bid").agg(count(lit(1)).cast("long").as("inter"))
    val hits = inter.join(csz, "doc_id").join(broadcast(bsz), "bid")
      .withColumn("match", col("inter") * 2 >= col("csz") + col("bsz") - col("inter"))
      .groupBy("doc_id")
      .agg(sum(when(col("match"), 1L).otherwise(0L)).cast("long").as("n_bench_matches"),
        max(col("inter").cast("double") /
          (col("csz") + col("bsz") - col("inter")).cast("double")).as("max_jaccard"))
    documents.select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") >= benchmarkMaxId)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_matches"), lit(0L)).as("n_bench_matches"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
        (coalesce(col("n_bench_matches"), lit(0L)) > 0L).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val assignment by content-independent id hash:
    * first hex nibble of md5(doc_id) < 'c' → train (12/16 = 75%), else
    * val. Hash-based (not rand()) so the split is reproducible across
    * engines, runs, and partitionings — the invariant that makes
    * decontamination and incremental re-runs possible at 100 TB.
    * Output: (doc_id, split) ordered.
    */
  def trainValSplit(documents: DataFrame, trainNibbles: String = "0123456789ab"): DataFrame = {
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).as("nib"))
      .select(col("doc_id"),
        when(expr(s"nib IN (${trainNibbles.map(c => s"'$c'").mkString(", ")})"), "train")
          .otherwise("val").as("split"))
      .orderBy("doc_id")
  }

  /** Leakage-safe split: assign train/val by the hash of the document's
    * near-dup CLUSTER representative, not the document itself, so a
    * near-duplicate pair can never straddle the split boundary — the
    * eval-contamination failure mode of per-doc splitting (a val doc
    * whose near-dup twin sits in train leaks the answer). `clustered` is
    * [[graft.pipeline.Dedup.dedupClusters]] output (doc_id, cluster, …);
    * the split hash is computed per ROW from the cluster id (no extra
    * join, no cluster-table materialization — the cluster id is already
    * on every row), so the operator adds zero shuffles on top of the
    * clustering. Same nibble rule as [[trainValSplit]] (12/16 → train).
    * Output: (doc_id, cluster, split) ordered.
    */
  def clusterSafeSplit(clustered: DataFrame,
                       trainNibbles: String = "0123456789ab"): DataFrame = {
    clustered
      .select(col("doc_id").cast("long").as("doc_id"),
        col("cluster").cast("long").as("cluster"),
        substring(md5(col("cluster").cast("string").cast("binary")), 1, 1).as("nib"))
      .select(col("doc_id"), col("cluster"),
        when(expr(s"nib IN (${trainNibbles.map(c => s"'$c'").mkString(", ")})"), "train")
          .otherwise("val").as("split"))
      .orderBy("doc_id")
  }

  /** Context-window sequence packing — the LLM-training assembly step:
    * documents are (deterministically) shuffled, concatenated, and
    * chunked into fixed `window`-token training sequences; each doc
    * learns which sequence it starts in and at what offset (docs
    * spanning a boundary continue into the next sequence — GPT-style
    * concat-then-chunk). The shuffle order is the id-hash total order
    * (reproducible, like every sampler here); the global token prefix
    * sum is [[Ranking.withRunningSums]] — per-partition subtotals become
    * broadcast offsets, NEVER a single-partition `SUM() OVER` window
    * (the vocabulary-scale trap: at 100 TB the corpus is billions of
    * docs). Pure integer arithmetic end to end. Output:
    * (doc_id, n_tokens, seq_id, seq_offset) ordered.
    */
  def sequencePacking(documents: DataFrame, window: Long = 2048L): DataFrame = {
    val d = documents.select(col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      graft.functions.PortableHash.md5Bits60(col("doc_id").cast("string")).as("h"))
    Ranking.withRunningSums(d, Seq("n_tokens"), col("h"), col("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum_n_tokens - n_tokens) div $window").as("seq_id"),
        ((col("cum_n_tokens") - col("n_tokens")) % window).as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Deterministic fixed-size uniform sample: the `n` docs with the
    * smallest md5(doc_id) — a hash-ranked top-n, so the sample is stable
    * across runs, engines, and partitionings (rand()-based sampling is
    * none of those), and any two samples of sizes n < m nest
    * (sample(n) ⊂ sample(m) — the property that makes growing an eval
    * set reproducible). Executes as distributed TakeOrdered (per-partition
    * heap + driver merge of n), never a global sort. Output:
    * (doc_id, sample_rank) ordered by the hash rank.
    */
  def hashSample(documents: DataFrame, n: Int = 100): DataFrame = {
    val w = Window.orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(n)
      // the window runs over the n surviving rows only — parameter scale
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .select("doc_id", "sample_rank")
      .orderBy("sample_rank")
  }

  /** Deterministic WEIGHTED-priority sample: rank every doc by
    * priority = md5₆₀(doc_id) / weight ascending and keep the first `n` —
    * heavier docs draw proportionally smaller priorities, so selection
    * probability grows with weight while staying fully reproducible (the
    * exponential-jump A-Res scheme needs pow(), whose libm bits differ
    * across engines; this rational form needs ONE IEEE division, which
    * doesn't). TakeOrdered shape like [[hashSample]] — no global sort
    * materialization, per-partition heaps + driver merge of n.
    * Output: (doc_id, w, priority) ordered by (priority, doc_id).
    */
  def weightedSample(documents: DataFrame, weight: org.apache.spark.sql.Column,
                     n: Int = 100): DataFrame = {
    documents
      .select(col("doc_id").cast("long").as("doc_id"), weight.cast("long").as("w"),
        graft.functions.PortableHash.md5Bits60(col("doc_id").cast("string")).as("h"))
      .withColumn("priority", col("h").cast("double") / col("w"))
      .orderBy(col("priority"), col("doc_id")).limit(n)
      .select("doc_id", "w", "priority")
  }

  /** Length stratification: assign every doc an equi-depth decile bucket
    * of its length WITHIN its source (ntile over (n_chars, doc_id) — the
    * doc_id tiebreak makes bucket boundaries deterministic across engines
    * and partitionings). Curation pipelines mix strata to balance short/
    * long documents; one shuffle on source. Output:
    * (doc_id, source, n_chars, stratum) ordered.
    */
  def lengthStrata(documents: DataFrame, buckets: Int = 10): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    documents
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .withColumn("stratum", ntile(buckets).over(w).cast("long"))
      .orderBy("doc_id")
  }

  /** Neyman-allocated stratified sample (Neyman 1934 — the optimal
    * allocation a survey-grade eval set uses): the sample budget `n`
    * splits across the source strata proportionally to N_h·S_h (stratum
    * size × stratum std-dev of doc length), so variable strata get more
    * of the budget than uniform ones; within each stratum the picks are
    * the md5-smallest docs (the [[hashSample]] determinism contract —
    * stable across runs, engines, partitionings, and nested for growing
    * budgets).
    *
    * Cross-engine exactness: N_h·S_h = sqrt(N_h·Σx² − (Σx)²) — moments
    * are exact BIGINTs; the cross-product runs in DOUBLE (each moment
    * cast once, then one fixed IEEE multiply/subtract tree — identical
    * bits in both engines, and overflow-safe: the exact-integer form
    * would wrap int64 at N_h·Σx² ≈ 1e32 for 10⁴-char docs × 10¹²-doc
    * strata, the 100 TB design point), clamped at 0 (a zero-variance
    * stratum's cancellation may land an ulp below zero; the clamp keeps
    * sqrt out of NaN in BOTH engines and preserves the w = 0 Neyman
    * semantics), ONE IEEE sqrt (bit-identical), then `floor(·1e6)`
    * (floor of identical bits, no half-up ambiguity) re-enters exact
    * integers: the weight total, the floor-division allocation
    * `n·w_h div ΣW` and the rank filter are all integer ops. The double
    * cross-product costs ≤1 cancelled digit of weight precision —
    * allocation-grade, and at corpus scale the moments are parameter
    * ESTIMATION anyway — fit them on a per-stratum sample (the
    * [[KMeans.fit]] guidance), then the ranked take streams the full
    * corpus once.
    *
    * Scale: one stratum aggregate (map-side combined), a broadcast 1-row
    * total, a broadcast allocation join, one source-keyed window over
    * rows that survive the rank filter. Output:
    * (doc_id, source, n_h, w_int, n_alloc, rn) ordered by doc_id.
    */
  def neymanSample(documents: DataFrame, n: Long = 50L): DataFrame = {
    val d = documents.select(col("doc_id").cast("long").as("doc_id"),
      col("source"), col("n_chars").cast("long").as("x"),
      graft.functions.PortableHash.md5Bits60(col("doc_id").cast("string")).as("h"))
    val stats = d.groupBy("source").agg(
        count(lit(1)).cast("long").as("n_h"),
        sum("x").cast("long").as("sx"),
        sum(col("x") * col("x")).cast("long").as("sxx"))
      .withColumn("w_int",
        floor(sqrt(greatest(
          col("n_h").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"),
          lit(0.0))) * lit(1000000.0)).cast("long"))
    val tot = broadcast(stats.agg(sum("w_int").cast("long").as("w_tot")))
    val alloc = stats.crossJoin(tot)
      .withColumn("n_alloc", expr(s"($n * w_int) div w_tot"))
      .select("source", "n_h", "w_int", "n_alloc")
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    d.join(broadcast(alloc), "source")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= col("n_alloc"))
      .select("doc_id", "source", "n_h", "w_int", "n_alloc", "rn")
      .orderBy("doc_id")
  }

  /** Per-source quality quota: keep the top `perSource` docs of each
    * source by quality score (ties to the smaller doc_id) — the
    * "N best pages per domain" curation rule. One shuffle on source.
    * Output: (source, doc_id, rk, quality) ordered.
    */
  def sourceQuota(documents: DataFrame, perSource: Int = 5): DataFrame = {
    val quality = TextStats.qualityScore(documents).select("doc_id", "quality")
    val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    documents.select(col("doc_id").cast("long").as("doc_id"), col("source"))
      .join(quality, "doc_id")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perSource)
      .select("source", "doc_id", "rk", "quality")
      .orderBy("source", "rk")
  }

  /** The WHOLE curation pipeline as one declared dataflow (r15 verdict
    * #7): exact dedup → near dedup → Gopher hard filters → benchmark
    * decontamination → leakage-safe split → per-split sequence packing,
    * each stage the engine's existing kernel — this operator tests the
    * COMPOSITION (column contracts, survivor-set handoff, ordering
    * stability across stages) that the stages' standalone queries never
    * exercise together.
    *
    * Stage semantics (the DuckDB oracle replays the identical chain):
    *   0. docs below `benchmarkMaxId` are the held-out benchmark —
    *      pipeline INPUT (decon reference), never pipeline DATA;
    *   1. exact dedup keeps the min-doc_id copy per md5(text);
    *   2. near dedup ([[graft.pipeline.Dedup.dedupClusters]]: minhash-LSH
    *      candidates, exact-Jaccard ≥ 0.8 verify, connected components)
    *      keeps cluster representatives;
    *   3. [[TextStats.gopherRules]] hard gates (word count, mean word
    *      length, stopwords, max-token repetition);
    *   4. [[contaminationFlags]] drops survivors sharing any benchmark
    *      5-gram;
    *   5. [[clusterSafeSplit]] assigns train/val by the CLUSTER hash;
    *   6. [[sequencePacking]] packs each split independently into
    *      `window`-token sequences (train sequences never contain val
    *      text — per-split packing is semantic, not an implementation
    *      convenience).
    *
    * Scale: no stage adds a shuffle beyond its own semantic one — the
    * exact-dedup handoff is a hash semi-join on doc_id, the gopher gate
    * is scan-local flags joined back on doc_id, the benchmark grams stay
    * broadcast, the split is per-row hash arithmetic (zero shuffles),
    * and the per-split packing is the two-pass prefix-sum scan. The
    * survivor set is localCheckpointed once where three stages fan out
    * of it. Output: (doc_id, cluster, split, n_tokens, seq_id,
    * seq_offset) ordered by doc_id.
    */
  def curationPipelineE2e(documents: DataFrame, window: Long = 2048L,
                          benchmarkMaxId: Long = DefaultBenchmarkMaxId,
                          k: Int = DefaultDeconK): DataFrame = {
    val (_, _, _, _, d4) = curationStages(documents, benchmarkMaxId, k)
    // 5. leakage-safe split by cluster hash (per-row arithmetic)
    val sp = clusterSafeSplit(d4.select("doc_id", "cluster"))
    // 6. per-split packing — a train sequence never contains val text
    val packed = Seq("train", "val").map { s =>
      sequencePacking(
        d4.join(sp.filter(col("split") === s).select("doc_id"), Seq("doc_id")),
        window)
    }.reduce(_.unionByName(_))
    sp.select("doc_id", "cluster", "split")
      .join(packed.select("doc_id", "n_tokens", "seq_id", "seq_offset"),
        Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** Stages 0–4 of the composed curation chain, shared by
    * [[curationPipelineE2e]] and [[curationFunnel]] (one definition so
    * the funnel's stage counts can never drift from the pipeline's
    * survivor sets). Returns (corpus, d1 exact-dedup keepers, d2 cluster
    * representatives with cluster id, d3 gopher survivors, d4 decon
    * survivors); d1 and d4 are eagerly checkpointed at the fan-out
    * points exactly as the pipeline Scaladoc describes.
    */
  private[graft] def curationStages(documents: DataFrame,
                                    benchmarkMaxId: Long = DefaultBenchmarkMaxId,
                                    k: Int = DefaultDeconK)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val corpus = documents
      .filter(col("doc_id").cast("long") >= benchmarkMaxId)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // 1. exact dedup: min-doc_id keeper per text hash
    val keepers = corpus.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val d1 = corpus.join(keepers, Seq("doc_id"), "left_semi")
      .localCheckpoint(true) // fans out: LSH clustering + the survivor join
    // 2. near dedup: keep cluster representatives, carry the cluster id
    val d2 = d1.join(
      Dedup.dedupClusters(d1).filter(col("keep") === 1L)
        .select("doc_id", "cluster"), Seq("doc_id"))
    // 3. Gopher hard filters
    val d3 = d2.join(
      TextStats.gopherRules(d2).filter(col("keep") === 1L).select("doc_id"),
      Seq("doc_id"))
    // 4. decontaminate vs the held-out benchmark gram set
    val bench = docGrams(
      documents.filter(col("doc_id").cast("long") < benchmarkMaxId), k)
      .select("s").distinct()
    val d4 = d3.join(
      contaminationFlags(d3.select("doc_id", "text"), bench, k)
        .filter(col("contaminated") === 0L).select("doc_id"), Seq("doc_id"))
      .localCheckpoint(true) // fans out: split + two per-split packs
    (corpus, d1, d2, d3, d4)
  }

  /** The curation FUNNEL — per-stage survivor counts of
    * [[curationPipelineE2e]], the numbers a dataset card reports (docs
    * in, docs after each gate, final split sizes). One tiny frame: each
    * stage contributes a single two-phase COUNT over its survivor set
    * (map-side partial counts — nothing wider than one row per stage
    * ever crosses the wire), and the stages reuse the pipeline's own
    * checkpointed fan-out points, so the funnel costs the pipeline's
    * stage chain plus seven one-row aggregates. Output:
    * (stage, n_docs) ordered by stage.
    */
  def curationFunnel(documents: DataFrame,
                     benchmarkMaxId: Long = DefaultBenchmarkMaxId,
                     k: Int = DefaultDeconK): DataFrame = {
    val (corpus, d1, d2, d3, d4) = curationStages(documents, benchmarkMaxId, k)
    val sp = clusterSafeSplit(d4.select("doc_id", "cluster"))
    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(name).as("stage"), col("n_docs"))
    cnt("1_corpus", corpus)
      .unionByName(cnt("2_exact_dedup", d1))
      .unionByName(cnt("3_near_dedup", d2))
      .unionByName(cnt("4_gopher", d3))
      .unionByName(cnt("5_decontaminated", d4))
      .unionByName(cnt("6_train", sp.filter(col("split") === "train")))
      .unionByName(cnt("7_val", sp.filter(col("split") === "val")))
      .orderBy("stage")
  }
}
