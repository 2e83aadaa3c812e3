package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Scale design: everything here is groupBy/join dataflow — no driver-side
  * state, no collect. The shingle self-join is the classic candidate
  * generation for exact Jaccard: it shuffles on the shingle key, so hot
  * shingles (stopword trigrams at web scale) can be frequency-capped via
  * `maxShingleFreq` to bound the quadratic blowup per key.
  */
object Dedup {

  /** Word-level w-shingles (default trigrams), distinct per doc.
    * Output: (doc_id, s). Mirrors the DuckDB oracle expression exactly
    * (element_at is 1-based in both engines).
    */
  def shingles(documents: DataFrame, w: Int = 3): DataFrame = {
    // Dedup happens per row INSIDE the gram builder, before the explode:
    // "distinct shingles per doc" never needs a global shuffle (doc_id is in
    // every key), and the explode emits the already-unique set. Gram
    // construction is the shared native TextStats.kGrams expression.
    documents
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(TextStats.kGrams(col("t"), w, distinct = true)).as("s"))
  }

  /** Duplicated passages: every distinct `k`-word window that appears in
    * ≥ `minDocs` DISTINCT documents — the passage-level building block of
    * exact substring dedup (quotes, boilerplate, licence blocks survive
    * whole-doc hashing and Jaccard thresholds; they show up here).
    *
    * Per-doc distinct k-grams come out of the native codegen'd gram
    * builder BEFORE the explode, so the group count is a doc count with
    * no DISTINCT aggregate; the one shuffle groups on the passage. At
    * 100 TB the group key would be xxhash64(passage) with the text
    * recovered by a min-doc join — kept as the string here because the
    * passage IS the payload the curation pipeline wants back.
    * Output: (passage, n_docs, first_doc) ordered by passage.
    */
  def duplicatePassages(documents: DataFrame, k: Int = 8,
                        minDocs: Long = 2L): DataFrame = {
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(TextStats.kGrams(col("t"), k, distinct = true)).as("passage"))
      .groupBy("passage")
      .agg(count(lit(1)).cast("long").as("n_docs"),
           min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .orderBy("passage")
  }

  /** ExactSubstr-style duplicate SPANS (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 §4.1):
    * for each document, the MAXIMAL token ranges covered by k-word windows
    * that also appear in at least one OTHER document. `duplicatePassages`
    * answers "which windows are duplicated"; this answers the question the
    * curation pipeline actually acts on — "which byte ranges of THIS doc
    * should be cut". Overlapping or touching duplicated windows merge into
    * one span (gaps-and-islands: a new island starts when the next window
    * start exceeds the previous start by more than k).
    *
    * Scale: the paper builds a suffix array; a suffix array is a
    * single-machine data structure. The relational rendition is two
    * aggregates + one equi-join + one PER-DOC window: (1) per-(window,doc)
    * dedup, (2) per-window doc count >= 2, (3) join window starts against
    * the duplicated-window set, (4) islands under
    * Window.partitionBy(doc_id) — never a SinglePartition. At 100 TB the
    * join key becomes xxhash64(passage) (the string never shuffles) and
    * web-scale boilerplate grams get frequency-capped like `shingles`;
    * here the passage is kept as the key so DuckDB can replay bit-for-bit.
    * Output: (doc_id, span_start, span_end, span_tokens) — 0-based
    * inclusive token indices — ordered by (doc_id, span_start).
    */
  def duplicateSpans(documents: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = documents
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        posexplode(TextStats.kGrams(col("t"), k, distinct = false)).as(Seq("i", "passage")))
    // duplicated windows = present in >= 2 DISTINCT docs; two cheap
    // aggregates (map-side combinable) instead of a countDistinct
    val dup = pos.groupBy("passage", "doc_id").agg(count(lit(1)).as("_c"))
      .groupBy("passage").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2L)
      .select("passage")
    val w = Window.partitionBy("doc_id").orderBy("i")
    pos.join(dup, "passage")
      .select("doc_id", "i")
      .withColumn("prev", lag("i", 1).over(w))
      .withColumn("ni",
        when(col("prev").isNull || col("i") > col("prev") + lit(k), 1L).otherwise(0L))
      .withColumn("island", sum("ni").over(w))
      .groupBy("doc_id", "island")
      .agg(min("i").cast("long").as("span_start"),
        (max("i") + lit(k - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  /** Per-document OFF-TOPIC score: cosine of each doc's bag-of-words tf
    * vector to its own source's LEAVE-ONE-OUT centroid (the sum of the
    * other docs' tf vectors) — low cosine = the doc doesn't look like its
    * source, the "domain purity" outlier signal a curation pipeline uses
    * to catch mislabeled or boilerplate rows. Leave-one-out matters: with
    * the doc included, its own mass inflates the similarity exactly for
    * the outliers you want to catch.
    *
    * Everything is EXACT BIGINT until one final divide-by-sqrt (the
    * [[tfCosinePairs]] discipline): with c = source centroid and d = the
    * doc, dot(d, c−d) = Σtf·cent − Σtf² and ‖c−d‖² = Σcent² − 2Σtf·cent
    * + Σtf² — all integer moments, no per-term FP sums, so the shipped
    * double is bit-identical cross-engine unrounded. Single-doc sources
    * (zero leave-one-out centroid) are excluded by an integer predicate.
    * Scale: one (source, term) centroid aggregate + one (source,
    * term)-keyed join of the doc tf table; all moments reduce per doc or
    * per source. Output: (doc_id, source, centroid_cos) ordered.
    */
  def sourceOutliers(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "source", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // feeds centroid, norms and the dot join
    val cent = tf.groupBy("source", "term").agg(sum("tf").as("cent"))
      .localCheckpoint(true) // feeds its own norm AND the dot join
    val sc = cent.groupBy("source").agg(sum(col("cent") * col("cent")).as("sc2"))
    val sa = tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("sa2"))
    val dotc = tf.join(cent, Seq("source", "term"))
      .groupBy("doc_id", "source").agg(sum(col("tf") * col("cent")).as("dotc"))
    dotc.join(sa, "doc_id").join(sc, "source")
      .withColumn("dotp", col("dotc") - col("sa2"))
      .withColumn("n2", col("sc2") - lit(2) * col("dotc") + col("sa2"))
      .filter(col("n2") > 0)
      .select(col("doc_id"), col("source"),
        (col("dotp").cast("double") /
          sqrt((col("sa2") * col("n2")).cast("double"))).as("centroid_cos"))
      .orderBy("doc_id")
  }

  /** The CUT that [[duplicateSpans]] prescribes, materialized: every
    * token inside a duplicated span is removed and the survivors are
    * re-joined in order — the Lee et al. ExactSubstr cleaning step
    * itself, producing the training corpus a pipeline would actually
    * feed downstream. A document whose every token is duplicated
    * elsewhere is cut entirely and drops out of the relation (the paper's
    * behavior for full duplicates).
    *
    * Scale: the span table is doc-keyed and tiny relative to the token
    * stream; membership is ONE doc-keyed equi-join with a per-row range
    * predicate (anti-join keeps survivors — never a theta join), and
    * reassembly is a per-doc aggregate over structs sorted by position.
    * Output: (doc_id, n_tokens, n_removed, clean_text) ordered, only for
    * docs with ≥ 1 surviving token.
    */
  def removeDuplicateSpans(documents: DataFrame, k: Int = 8): DataFrame = {
    val spans = duplicateSpans(documents, k)
      .select(col("doc_id").as("sdoc"), col("span_start"), col("span_end"))
      .localCheckpoint(true)
    val toks = documents
      .select(col("doc_id").cast("long").as("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        posexplode(col("t")).as(Seq("i", "tok")))
    val kept = toks.join(spans,
      col("doc_id") === col("sdoc") &&
        col("i") >= col("span_start") && col("i") <= col("span_end"),
      "left_anti")
    kept.groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"),
        count(lit(1)).cast("long").as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            x => x.getField("tok"))).as("clean_text"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).as("n_removed"), col("clean_text"))
      .orderBy("doc_id")
  }

  /** Corpus/arriving split point for the near-dup ingest pair: documents
    * with doc_id below this are the STATIC corpus store, the rest arrive
    * (in one batch for `neardup_ingest`, micro-batched for
    * `stream_neardup_ingest`). One hoisted literal, shared by both
    * operators and their common oracle.
    */
  val DefaultCorpusMaxId: Long = 250L

  /** Near-duplicate flags of an ARRIVING document set against a STATIC
    * corpus store — the ingest-time analogue of [[minhashLshPairs]] (which
    * pairs a corpus with itself) and the NEAR-dup sibling of the exact
    * [[incrementalDedup]]: each arriving doc is checked for Jaccard ≥
    * `threshold` against any stored doc. The kernel is shared VERBATIM by
    * the batch query and the streaming foreachBatch replay (the
    * decontamination-pair pattern: equivalence by construction, not twin
    * copies) — a document row is atomic, so the per-doc aggregate never
    * spans micro-batches and the stream needs no state store.
    *
    * Shape: one shingle equi-join (arriving shingles × corpus shingles on
    * the shingle key) + one (arriving, corpus)-doc count + the exact
    * integer-derived Jaccard test. The arriving side is batch-sized; the
    * corpus side is pre-shingled ONCE by the caller (checkpointed) with
    * sizes precomputed, so a micro-batch costs |batch shingles| join
    * probes, not a corpus rescan. At web scale the corpus side of the
    * join becomes its LSH band store (join on band signature instead of
    * raw shingle, [[minhashLshPairs]] banding) and hot shingles get the
    * [[shingles]] frequency cap; the verify-side arithmetic is unchanged.
    * Output: (doc_id, n_near_dups, best_jaccard) for arriving docs with
    * ≥ 1 near-dup, ordered by doc_id.
    */
  def nearDupAgainstCorpus(arriving: DataFrame, corpusShingles: DataFrame,
                           corpusSizes: DataFrame, w: Int = 3,
                           threshold: Double = 0.8): DataFrame = {
    val bsh = shingles(arriving, w).localCheckpoint(true)
    val bsz = bsh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = bsh
      .join(corpusShingles.select(col("doc_id").as("cid"), col("s")), "s")
      .groupBy("doc_id", "cid").agg(count(lit(1)).as("inter"))
    inter.join(bsz, "doc_id")
      .join(corpusSizes.select(col("doc_id").as("cid"), col("sz").as("csz")), "cid")
      .withColumn("jac",
        col("inter") * lit(1.0) / (col("sz") + col("csz") - col("inter")))
      .filter(col("jac") >= threshold)
      .groupBy(col("doc_id").cast("long").as("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_near_dups"),
        round(max("jac"), 4).as("best_jaccard"))
      .orderBy("doc_id")
  }

  /** Batch twin of the near-dup ingest pair: split `documents` at
    * [[DefaultCorpusMaxId]] and run the arriving half through
    * [[nearDupAgainstCorpus]] in one batch.
    */
  def nearDupIngest(documents: DataFrame, w: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val corpus = documents.filter(col("doc_id") < DefaultCorpusMaxId)
    val csh = shingles(corpus, w).localCheckpoint(true)
    val csz = csh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    nearDupAgainstCorpus(
      documents.filter(col("doc_id") >= DefaultCorpusMaxId), csh, csz,
      w, threshold)
  }

  /** Exact duplicate groups by content hash: one row per distinct text,
    * keeping the smallest doc_id. Output: (keep_id, n_copies) ordered.
    */
  def exactDedup(documents: DataFrame): DataFrame = {
    documents
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").cast("long").as("keep_id"),
           count(lit(1)).cast("long").as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")
  }

  /** Per-SOURCE exact-duplication report — the curation dashboard number
    * ("crawl X is 40% boilerplate reprints") that decides which sources
    * get the expensive near-dup passes: a document counts as a dup when
    * its text's canonical keeper (min doc_id over the WHOLE corpus, the
    * [[exactDedup]] rule) is some other document — so cross-source
    * reprints are charged to the copy's source, not the original's.
    *
    * Scale: one md5-groupBy (hashes, never text, cross the wire —
    * the [[exactDedup]] shape), one hash-keyed join back, one source
    * aggregate. dup_rate divides two exact BIGINTs (one IEEE division,
    * unrounded). Output: (source, n_docs, n_dups, dup_rate) ordered.
    */
  def dedupRateBySource(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("doc_id").cast("long").as("doc_id"),
      col("source"), md5(col("text").cast("binary")).as("h"))
      .localCheckpoint(true) // feeds the keeper aggregate AND the join back
    val keep = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    docs.join(keep, "h")
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
          .cast("long").as("n_dups"))
      .withColumn("dup_rate", col("n_dups").cast("double") / col("n_docs"))
      .orderBy("source")
  }

  /** INCREMENTAL exact dedup — the shape a production ingest actually
    * runs: a new batch arrives, the corpus store is already deduplicated,
    * and each batch row is classified as `dup_of_corpus` (content hash
    * already stored), `dup_in_batch` (first occurrence wins within the
    * batch — smallest doc_id), or `new`. Output: (doc_id, status) ordered.
    *
    * Scale: both sides reduce to md5 hashes before any join, so the
    * corpus ships 16 bytes/doc through the hash-key shuffle; the standard
    * further prune at 100 TB is a Bloom filter on the corpus hash set
    * semi-joined map-side first (Spark's runtime-filter rule injects
    * exactly this when statistics merit it).
    */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame): DataFrame = {
    val ch = corpus.select(md5(col("text").cast("binary")).as("h")).distinct()
    // hashed batch feeds the first-occurrence aggregate AND the joins —
    // materialize once (repo convention for multi-consumer intermediates)
    val bh = batch.select(col("doc_id").cast("long").as("doc_id"),
        md5(col("text").cast("binary")).as("h"))
      .localCheckpoint(true)
    val firsts = bh.groupBy("h").agg(min("doc_id").as("keep_id"))
    bh.join(ch.withColumn("in_corpus", lit(1)), Seq("h"), "left")
      .join(firsts, "h")
      .select(col("doc_id"),
        when(col("in_corpus").isNotNull, "dup_of_corpus")
          .when(col("doc_id") =!= col("keep_id"), "dup_in_batch")
          .otherwise("new").as("status"))
      .orderBy("doc_id")
  }

  /** Exact Jaccard for a given set of (da, db) intersection counts.
    * Shared tail of the exact and LSH paths.
    */
  private def jaccardOf(inter: DataFrame, sizes: DataFrame,
                        threshold: Double): DataFrame = {
    val sa = sizes.select(col("doc_id").as("da"), col("sz").as("sza"))
    val sb = sizes.select(col("doc_id").as("db"), col("sz").as("szb"))
    inter.join(sa, "da").join(sb, "db")
      .withColumn("jac", col("inter") * lit(1.0) / (col("sza") + col("szb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("da").cast("long").as("doc_a"),
              col("db").cast("long").as("doc_b"),
              round(col("jac"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard similarity for all candidate pairs (docs sharing
    * ≥1 shingle), thresholded. Output: (doc_a, doc_b, jaccard) ordered.
    *
    * Timing provenance: an apparent 2.67→3.70 s "regression" between
    * shared-session and isolated benches was cross-query cache reuse, not a
    * plan change — with several dedup queries in one session, Spark's
    * CacheManager substitutes any persisted [[shingles]] fragment (same
    * logical plan) into later queries, so the shared-session number was
    * cache-warmed. The gram builder is now the native codegen'd
    * [[graft.functions.WordKGrams]] (the HOF it replaced was
    * CodegenFallback), worth ~15% on this query measured isolated
    * median-of-3.
    *
    * `maxShingleFreq`: drop shingles present in more docs than this before
    * the self-join (0 = no cap). The oracle queries use no cap; at 100 TB a
    * cap (or minhash prefiltering — [[minhashLshPairs]]) bounds the
    * quadratic blowup on hot shingle keys.
    */
  def ngramJaccardPairs(documents: DataFrame, w: Int = 3,
                        threshold: Double = 0.1,
                        maxShingleFreq: Long = 0L): DataFrame = {
    // Shingles feed both self-join sides plus sizes — materialize once
    // (eager localCheckpoint) so the scan+shingle+distinct stage runs once,
    // not three times. Unlike a bare persist, the checkpointed RDD is owned
    // by this DataFrame: when it goes out of scope the ContextCleaner
    // reclaims it, so declared queries leave no session-lifetime cache.
    val sh0 = shingles(documents, w).localCheckpoint(true)
    val sh =
      if (maxShingleFreq <= 0) sh0
      else {
        val hot = sh0.groupBy("s").agg(count(lit(1)).as("f"))
          .filter(col("f") > maxShingleFreq).select("s")
        sh0.join(hot, Seq("s"), "left_anti")
      }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // Fresh aliases on both sides (not a raw self-reference) so the join
    // condition compares two distinct attributes, not `s == s`.
    val a = sh.select(col("doc_id").as("da"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("db"), col("s").as("sb"))
    val inter = a.join(b, col("sa") === col("sb") && col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    jaccardOf(inter, sizes, threshold)
  }

  /** DIRECTIONAL n-gram containment `|A∩B| / |A|` — quote/subset
    * detection: a small doc wholly quoted inside a large one scores 1.0
    * while its Jaccard stays low, so thresholded Jaccard dedup misses
    * exactly the containment cases. Output: one row per ORDERED pair
    * (doc_a = the contained doc, doc_b = the container) with
    * containment ≥ `threshold`, ordered.
    *
    * Scale: same shingle-key candidate self-join as [[ngramJaccardPairs]]
    * (one intersection count per unordered pair, then two directed rows),
    * same `maxShingleFreq` hot-key cap. The containment divides two exact
    * integers — bit-identical double on any IEEE engine, emitted
    * unrounded.
    */
  def ngramContainmentPairs(documents: DataFrame, w: Int = 3,
                            threshold: Double = 0.5,
                            maxShingleFreq: Long = 0L): DataFrame = {
    val sh0 = shingles(documents, w).localCheckpoint(true)
    val sh =
      if (maxShingleFreq <= 0) sh0
      else {
        val hot = sh0.groupBy("s").agg(count(lit(1)).as("f"))
          .filter(col("f") > maxShingleFreq).select("s")
        sh0.join(hot, Seq("s"), "left_anti")
      }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("da"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("db"), col("s").as("sb"))
    val inter = a.join(b, col("sa") === col("sb") && col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    // sized pair counts feed BOTH directed branches — materialize once
    val withSizes = inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .localCheckpoint(true)
    val directed = withSizes
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("inter").cast("double") / col("sza").cast("double")).as("containment"))
      .unionAll(withSizes.select(col("db").as("doc_a"), col("da").as("doc_b"),
        (col("inter").cast("double") / col("szb").cast("double")).as("containment")))
    directed.filter(col("containment") >= threshold)
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"), col("containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** Sorted-neighborhood dedup (Hernández & Stolfo 1995, the BLOCKED
    * variant): sort documents by a normalized key, compare each doc only
    * with its next `window` neighbors in sort order, verify candidates by
    * exact w-shingle Jaccard. The third candidate-generation family next
    * to the inverted-index join ([[ngramJaccardPairs]]) and LSH banding
    * ([[minhashLshPairs]]): near-identical texts share long prefixes, so
    * they land adjacent in sort order and are found in O(n·window)
    * comparisons — no quadratic key, no sketch.
    *
    * Scale: a GLOBAL sort window would serialize on one partition, so the
    * sort is blocked — `blockLen` prefix chars of the key partition the
    * window (`PARTITION BY block ORDER BY key, doc_id`), which is the
    * standard multi-pass/blocked form and exactly what range-partitioned
    * executors give you. The miss cases are inherent to the method (docs
    * differing in their first words sort apart); that is why it composes
    * with the other families rather than replacing them. Candidate pairs
    * then drive a pair-keyed shingle join (cost ∝ candidates × doc size,
    * not corpus²). Output: (doc_a, doc_b, jaccard ≥ threshold) ordered,
    * same shape/arithmetic as [[ngramJaccardPairs]].
    */
  def sortedNeighborhoodPairs(documents: DataFrame, window: Int = 3,
                              w: Int = 3, threshold: Double = 0.1,
                              blockLen: Int = 8): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    import org.apache.spark.sql.expressions.Window
    val keyed = documents
      .select(col("doc_id"), lower(col("text")).as("k"))
      .withColumn("blk", substring(col("k"), 1, blockLen))
    val ws = Window.partitionBy("blk").orderBy(col("k"), col("doc_id"))
    // one lead per offset (lead offsets must be literals), unioned; the
    // pair is canonicalized (sort order ≠ id order) and deduped
    val cands = (1 to window).map { i =>
        keyed.select(col("doc_id").as("x"),
          lead(col("doc_id"), i).over(ws).as("y"))
      }.reduce(_ unionAll _)
      .filter(col("y").isNotNull)
      .select(least(col("x"), col("y")).as("da"),
        greatest(col("x"), col("y")).as("db"))
      .distinct()
      .localCheckpoint(true)
    val sh = shingles(documents, w).localCheckpoint(true)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // candidate-keyed intersection: expand each pair by side-a shingles,
    // then match side-b's copy of the same shingle
    val inter = cands
      .join(sh.select(col("doc_id").as("da"), col("s").as("sa")), "da")
      .join(sh.select(col("doc_id").as("db2"), col("s").as("sb")),
        col("db") === col("db2") && col("sa") === col("sb"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    jaccardOf(inter, sizes, threshold)
  }

  /** Bag-of-words cosine similarity join — the sparse-vector complement of
    * the set-based Jaccard family: documents as term-frequency vectors, one
    * row per unordered pair with cosine ≥ `threshold`, found via the
    * inverted-index join (pairs meet only on shared terms — the classic
    * sparse all-pairs-similarity plan, Bayardo et al. WWW'07 shape).
    *
    * Cross-engine determinism, with NO rounding: tf values and the squared
    * norms `s = Σtf²` are exact BIGINTs, the pair dot product `Σ tfa·tfb`
    * is an exact BIGINT, so the threshold test is evaluated in integer form
    * `dot² ≥ t²·sa·sb` (one double multiply of exact inputs — a fixed IEEE
    * op tree, no summation-order jitter) and the emitted
    * `cosine = dot / sqrt(sa·sb)` is likewise a single-op tree over exact
    * integers — bit-identical on any IEEE engine.
    *
    * Scale: the inverted-index join shuffles on the term key; hot terms
    * (stopwords) make that key quadratic, so `maxDocFreq` drops terms with
    * document frequency above the cap BEFORE norms are computed — the
    * standard df-cutoff of sparse similarity search (a term in half the
    * corpus carries no discriminative weight; dropping it is both the
    * speed and the quality move). Output: (doc_a, doc_b, cosine) ordered.
    */
  def tfCosinePairs(documents: DataFrame, threshold: Double = 0.6,
                    maxDocFreq: Long = 0L): DataFrame = {
    val tf0 = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // feeds the df cap, norms, and both join sides
    val tf =
      if (maxDocFreq <= 0) tf0
      else {
        val hot = tf0.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("term")
        tf0.join(hot, Seq("term"), "left_anti")
      }
    val norms = tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("s2"))
    val dots = tf.select(col("doc_id").as("da"), col("term"), col("tf").as("tfa"))
      .join(tf.select(col("doc_id").as("db"), col("term"), col("tf").as("tfb")),
        "term")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(sum(col("tfa") * col("tfb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("da"), col("s2").as("sa")), "da")
      .join(norms.select(col("doc_id").as("db"), col("s2").as("sb")), "db")
      .filter(col("dot") * col("dot") >=
        lit(threshold * threshold) * (col("sa") * col("sb")))
      .select(col("da").cast("long").as("doc_a"),
        col("db").cast("long").as("doc_b"),
        (col("dot").cast("double") /
          sqrt((col("sa") * col("sb")).cast("double"))).as("cosine"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures: `numHashes` permutations simulated as
    * `xxhash64(shingle, seed)`; signature k = min over shingles.
    * Output: (doc_id, k, mh).
    */
  def minhashSignatures(documents: DataFrame, w: Int = 3,
                        numHashes: Int = 64): DataFrame = {
    shingles(documents, w)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${numHashes - 1}), k -> struct(k AS k, xxhash64(s, k) AS h))")).as("kh"))
      .groupBy(col("doc_id"), col("kh.k").as("k"))
      .agg(min("kh.h").as("mh"))
  }

  /** MinHash + LSH banding near-dup detection: band the signature
    * (`bands` × `rowsPerBand` = numHashes), bucket-join on (band, band
    * signature), then verify candidates with exact Jaccard ≥ `threshold`.
    *
    * Deterministic (fixed seeds), so for a fixed dataset the output is
    * stable; with 16×4 banding the catch probability at j=0.8 is
    * 1-(1-0.8^4)^16 ≈ 0.9998 per pair and recall is exact on every
    * dataset we test. Output schema matches [[ngramJaccardPairs]].
    */
  def minhashLshPairs(documents: DataFrame, w: Int = 3,
                      bands: Int = 16, rowsPerBand: Int = 4,
                      threshold: Double = 0.8): DataFrame = {
    // Shingles feed three branches (signatures, sizes, verification) —
    // materialize once (eager localCheckpoint, owner-released like `banded`
    // and `candidates` below) so the scan+shingle stage runs once.
    val sh = shingles(documents, w).localCheckpoint(true)
    // One row per (doc, band); feeds BOTH sides of the self-join below —
    // materialize once so the sketch aggregation doesn't run twice.
    val banded = bandedSignatures(sh, bands, rowsPerBand).localCheckpoint(true)
    val l = banded.select(col("doc_id").as("da"), col("band"), col("bandsig"))
    val r = banded.select(col("doc_id").as("db"), col("band"), col("bandsig"))
    // Candidate pairs are the (small) output of the whole sketch+band
    // pipeline and feed BOTH the doc-id semi-join and the verify join —
    // materialize once (eager localCheckpoint) so the banded self-join
    // doesn't run twice, and the verify joins see a tiny flat relation.
    val candidates = l.join(r, Seq("band", "bandsig"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
      .localCheckpoint(true)
    verifyCandidates(candidates, sh, threshold)
  }

  /** LSH banding of the MinHash signature: one row per (doc, band), key =
    * xxhash64 of the band's signature slice. Shared by [[minhashLshPairs]]
    * and the streaming curation twin
    * ([[graft.streaming.StreamOps.curationReplayBatch]]) — one definition
    * so the batch pair set and the incrementally-maintained band store
    * cannot drift. Input is a [[shingles]] relation (callers own its
    * materialization). The signature rides the native sketch aggregate:
    * the shuffle carries one `bands × rowsPerBand`-long array per doc
    * instead of an exploded row per (shingle, hash).
    * Output: (doc_id, band, bandsig), unordered.
    */
  private[graft] def bandedSignatures(sh: DataFrame, bands: Int = 16,
                                      rowsPerBand: Int = 4): DataFrame = {
    val sig = sh.groupBy("doc_id")
      .agg(graft.functions.Sketches.minhash_agg(col("s"), bands * rowsPerBand).as("sig"))
    sig.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), b))"))
      .as(Seq("band", "bandsig")))
  }

  /** Exact-Jaccard verification of LSH candidate pairs `(da, db)` against
    * a shingle relation — the verify half [[minhashLshPairs]] and the
    * streaming curation twin share. Semi-joins the shingle set down to
    * candidate docs FIRST: the verify joins then touch only
    * |candidate docs| × shingles-per-doc rows instead of the full corpus
    * twice (sizes are per-doc totals, so computing them on the pruned set
    * is exact for every doc that can appear in the output).
    * Output: (doc_a, doc_b, jaccard ≥ threshold) ordered.
    */
  private[graft] def verifyCandidates(candidates: DataFrame, sh: DataFrame,
                                      threshold: Double): DataFrame = {
    val candDocs = candidates.select(col("da").as("doc_id"))
      .unionAll(candidates.select(col("db").as("doc_id")))
      .distinct()
    val shc = sh.join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(shc.select(col("doc_id").as("da"), col("s")), "da")
      .join(shc.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    jaccardOf(inter, sizes, threshold)
  }

  /** Near-dup CLUSTERING — the capstone of the dedup pipeline: connected
    * components over the MinHash-LSH pair graph. Every document gets
    * `cluster` = the smallest doc_id in its near-dup component (GraphX CC's
    * label), singletons cluster to themselves, and `keep = 1` marks the
    * canonical representative — the row a training pipeline actually
    * retains. Output: (doc_id, cluster, keep) ordered.
    *
    * Scale: pairs come from the sketch+banded candidate path (sub-
    * quadratic); the CC runs on the PAIR graph only (≪ corpus size — near
    * -dup components are sparse by construction), and the final join back
    * to the corpus is a broadcast-sized left join in practice.
    */
  def dedupClusters(documents: DataFrame, w: Int = 3,
                    bands: Int = 16, rowsPerBand: Int = 4,
                    threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLshPairs(documents, w, bands, rowsPerBand, threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true) // small; feeds edges AND vertices
    val verts = pairs.select(col("doc_a").as("vertex"))
      .unionAll(pairs.select(col("doc_b").as("vertex"))).distinct()
    val cc = graft.graph.GraphOps.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")), verts)
    documents.select(col("doc_id").cast("long").as("doc_id"))
      .join(cc.withColumnRenamed("vertex", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
      .withColumn("keep",
        when(col("doc_id") === col("cluster"), 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  /** SimHash per doc (sign-sum of token-hash bits, weight 1 per distinct
    * token). Output: (doc_id, simhash). Uses the native
    * [[graft.functions.Sketches.SimHashAgg]] sketch: one 64-counter buffer
    * per doc, no 64× bit explosion.
    *
    * Token hash = first 60 bits of md5 as BIGINT
    * (`conv(substr(md5,1,15),16,10)`), which DuckDB reproduces exactly as
    * `('0x'||substr(md5(tok),1,15))::BIGINT` — so the resulting simhashes
    * (and the pair set of [[simhashPairs]]) are fully oracle-replayable.
    * Bits 60–63 of every token hash are 0, so those simhash bits are
    * identically 0 on both engines and Hamming distances are unaffected.
    *
    * Cost note: hashing per (doc, distinct-token) INSTANCE is deliberate.
    * Median-of-3 isolated timing at sf0.1 puts the whole pair pipeline at
    * ~1.3 s — at parity with the pre-md5 xxhash64 path (the once-reported
    * 1.63× was single-shot timing jitter). The alternative — hash each
    * distinct token once and join the dictionary back — trades
    * embarrassingly parallel scan-side CPU (no shuffle, ~100 ns/token) for
    * TWO extra shuffles of the full token-instance table, which is the
    * wrong direction at any scale: shuffle bytes, not md5 cycles, are the
    * 100 TB bottleneck.
    */
  def simhash(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"),
        graft.functions.PortableHash.md5Bits60(col("tok")).as("th"))
      .groupBy("doc_id")
      .agg(graft.functions.Sketches.simhash_agg(col("th")).as("simhash"))
      .select(col("doc_id").cast("long").as("doc_id"), col("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidate
    * generation by 4×16-bit block equality (a pair within distance 3 must
    * agree on ≥1 of 4 blocks — pigeonhole).
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(documents)
    // blocks feed BOTH sides of the self-join — materialize once (eager
    // localCheckpoint, 4 small rows per doc) so the token-hash sketch
    // aggregation doesn't run twice (the plan otherwise duplicates the
    // whole scan+explode+ObjectHashAggregate pipeline per side).
    val blocks = sh.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), q -> struct(q AS q, shiftright(simhash, CAST(q * 16 AS INT)) & 65535 AS blk))")).as("qb"))
      .select(col("doc_id"), col("simhash"), col("qb.q"), col("qb.blk"))
      .localCheckpoint(true)
    val l = blocks.select(col("doc_id").as("da"), col("simhash").as("ha"), col("q"), col("blk"))
    val r = blocks.select(col("doc_id").as("db"), col("simhash").as("hb"), col("q"), col("blk"))
    l.join(r, Seq("q", "blk")).filter(col("da") < col("db"))
      .select("da", "db", "ha", "hb").distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("da").cast("long").as("doc_a"),
              col("db").cast("long").as("doc_b"),
              col("hamming").cast("long"))
      .orderBy("doc_a", "doc_b")
  }
}
