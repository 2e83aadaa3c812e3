package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents(doc_id, text, lang, source, n_chars)`.
  * All are per-row codegen'd expressions (no UDFs, no shuffles except the
  * final sort) — they stream at scan speed at any scale.
  */
object TextStats {

  /** Stopword list shared verbatim with the DuckDB oracle. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "for")
  private val stopList = Stopwords.map(s => s"'$s'").mkString(", ")

  /** The array of space-joined k-grams over a token array column, in
    * sequence order (empty below k tokens) — the native codegen'd
    * [[graft.functions.WordKGrams]] expression, shared by [[ngramFreq]],
    * [[winnowedFingerprint]] and (with `distinct = true`)
    * [[graft.pipeline.Dedup.shingles]] so gram construction cannot
    * silently diverge between operators. Replaces a
    * `transform(sequence(...), i -> concat_ws(...))` HOF, which is
    * CodegenFallback (per-gram interpreter round-trip).
    */
  private[pipeline] def kGrams(t: org.apache.spark.sql.Column, k: Int,
                               distinct: Boolean): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.word_kgrams(t, k, distinct)

  /** n-gram/stopword-heuristic language ID: fraction of tokens that are
    * common-English stopwords ≥ 8% ⇒ 'en', else 'unk'. Output one row per
    * doc with the prediction and the ground-truth label for accuracy eval.
    */
  def langId(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id").cast("long"), col("lang"), split(col("text"), " ").as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_stop", expr(s"size(filter(t, x -> x IN ($stopList)))").cast("long"))
      .withColumn("pred_lang",
        when(col("n_stop") * lit(1.0) / col("n_tokens") >= 0.08, "en").otherwise("unk"))
      .select("doc_id", "lang", "n_tokens", "n_stop", "pred_lang")
      .orderBy("doc_id")
  }

  /** Gopher-style RULE-BASED quality gate (Rae et al. 2021 §A1.1.1,
    * arXiv:2112.11446): each document gets a boolean per rule plus the
    * conjunction. Rules (bounds calibrated to this synthetic corpus so
    * every rule discriminates; the production knobs are the same shape):
    *  1. word count within [30, 50000];
    *  2. mean word length within [4.5, 5.0] — compared EXACTLY as
    *     9·n_tokens ≤ 2·chars and chars ≤ 5·n_tokens (no FP division);
    *  3. at least 2 distinct stopwords present (the "stop word filter"
    *     that kills boilerplate/navigation pages);
    *  4. most frequent token ≤ 20% of the document — 5·max_tok ≤
    *     n_tokens exact.
    * The max-token frequency is a per-row sort + linear run-length scan
    * (a higher-order aggregate over the sorted token array) — NO
    * explode/shuffle, so the gate runs at parquet-scan speed and scales
    * embarrassingly at 100 TB. Complements [[qualityScore]] (a soft
    * score) with the hard-filter stage a training pipeline actually
    * gates ingestion on.
    */
  def gopherRules(documents: DataFrame): DataFrame = {
    val stop = array(Seq("the", "a", "of", "to", "and", "in", "that", "is").map(lit): _*)
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("t"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("max_tok", expr(
        "aggregate(sort_array(t), " +
          "struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS best), " +
          "(acc, x) -> struct(x AS prev, " +
          "  IF(x = acc.prev, acc.run + 1, 1) AS run, " +
          "  GREATEST(acc.best, IF(x = acc.prev, acc.run + 1, 1)) AS best), " +
          "acc -> acc.best)").cast("long"))
      .withColumn("n_stop", size(array_intersect(array_distinct(col("t")), stop)).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= 30 && col("n_tokens") <= 50000).cast("long").as("wc_ok"),
        (lit(9) * col("n_tokens") <= lit(2) * col("nc") &&
          col("nc") <= lit(5) * col("n_tokens")).cast("long").as("mwl_ok"),
        (col("n_stop") >= 2).cast("long").as("stop_ok"),
        (lit(5) * col("max_tok") <= col("n_tokens")).cast("long").as("rep_ok"))
      .withColumn("keep",
        (col("wc_ok") * col("mwl_ok") * col("stop_ok") * col("rep_ok")).cast("long"))
      .orderBy("doc_id")
  }

  /** Quality score: 0.5·min(1, n_tokens/100) + 0.5·[avg token length ∈ [4,8]].
    * Also emits the raw components (punct count over `.,!`).
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id").cast("long"), col("text"), split(col("text"), " ").as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("avg_tok_len", round(length(col("text")) * lit(1.0) / col("n_tokens"), 4))
      .withColumn("n_punct",
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!]", ""))).cast("long"))
      .withColumn("quality", round(
        least(lit(1.0), col("n_tokens") / lit(100.0)) * 0.5 +
          when((length(col("text")) * lit(1.0) / col("n_tokens")).between(4, 8), 0.5).otherwise(0.0),
        4))
      .select("doc_id", "n_tokens", "avg_tok_len", "n_punct", "quality")
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens plus a BPE-ish estimate (chars/4,
    * the common rule of thumb) and a subword-regex count (runs of letters /
    * digits / single punctuation, a crude GPT-style pre-tokenizer).
    */
  def tokenStats(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id").cast("long"), col("text"), col("n_chars"))
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bpe_est", ceil(col("n_chars") / lit(4.0)).cast("long"))
      .withColumn("subword_tokens",
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")).cast("long"))
      .select("doc_id", "ws_tokens", "bpe_est", "subword_tokens")
      .orderBy("doc_id")
  }

  /** Document fingerprint: 128-bit content hash (md5 hex) — the exact-dedup
    * key — plus a 64-bit xxhash64 for compact storage.
    */
  def fingerprints(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id").cast("long"),
        md5(col("text").cast("binary")).as("md5_fp"),
        xxhash64(col("text")).as("xx64_fp"))
      .orderBy("doc_id")
  }

  /** Corpus term frequencies — the canonical distributed word count.
    * Output: (term, freq) top `topN` by (freq DESC, term).
    */
  def termFreq(documents: DataFrame, topN: Int = 50): DataFrame = {
    documents
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(topN)
  }

  /** Zipf exponent of the corpus term-frequency distribution: OLS slope
    * of ln(freq) on ln(rank) over terms with `freq >= minFreq`, alpha =
    * −slope — the vocabulary-health scalar (natural corpora sit near 1;
    * template/spam corpora drift far off). Ranks come from the two-pass
    * global index ([[Ranking.withGlobalIndex]] — range-partitioned sort +
    * per-partition offsets), NEVER a single-partition row_number window:
    * at 100 TB the vocabulary is hundreds of millions of terms. The five
    * regression moments reduce in one aggregate; per-row `ln` is libm and
    * sums are shuffle-order-jittered → alpha ships rounded 3 dp.
    * Degenerate corpora (fewer than 2 ranked terms — zero x-variance)
    * yield zero rows identically in both engines.
    * Output: one row (n_terms, alpha).
    */
  def zipfAlpha(documents: DataFrame, minFreq: Long = 2L): DataFrame = {
    val freqs = documents
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("freq"))
      .filter(col("freq") >= minFreq)
    Ranking.withGlobalIndex(freqs, col("freq").desc, col("term"))
      .select(log((col("idx") + 1L).cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(col("n_terms") >= 2)
      .select(col("n_terms"),
        round(-(col("n_terms").cast("double") * col("sxy") - col("sx") * col("sy")) /
          (col("n_terms").cast("double") * col("sxx") - col("sx") * col("sx")), 3)
          .as("alpha"))
  }

  /** Corpus n-gram frequencies with duplicates KEPT (language-model
    * counting — unlike [[graft.pipeline.Dedup.shingles]], which dedups per
    * doc for set similarity). Output: (gram, freq) top `topN` by
    * (freq DESC, gram). One shuffle on the gram key; map-side partial
    * aggregation bounds it.
    */
  def ngramFreq(documents: DataFrame, n: Int = 2, topN: Int = 50): DataFrame = {
    documents
      .select(split(col("text"), " ").as("t"))
      .select(explode(kGrams(col("t"), n, distinct = false)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).cast("long").as("freq"))
      .orderBy(col("freq").desc, col("gram"))
      .limit(topN)
  }

  /** Character-distribution Shannon entropy per doc (bits/char) — the
    * gibberish/boilerplate detector real corpus filters pair with the
    * length/stopword heuristics: natural text sits ~4 bits, repeated
    * padding near 0, random base64 near 6. The histogram and
    * `-Σ p·log2 p` are computed per row in one pass by the native
    * [[graft.functions.CharEntropyStats]] expression — no Exchange, no
    * (doc, char) row amplification; the op runs at scan speed like the
    * rest of TextStats. 4-dp rounding absorbs float jitter (same
    * convention as tf-idf). Output: (doc_id, n_chars_distinct, entropy)
    * ordered.
    */
  def charEntropy(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.TextFunctions.char_entropy_stats(col("text")).as("st"))
      .select(col("doc_id"),
        col("st.n_distinct").as("n_chars_distinct"),
        round(col("st.entropy"), 4).as("entropy"))
      .orderBy("doc_id")
  }

  /** Repetition / boilerplate score — the Gopher/C4-style duplication
    * filter corpus curation runs next to length and stopword checks:
    * per doc, the fraction of n-grams (default bigrams, duplicates kept)
    * that are repeats of an earlier gram. Formulaic spam and
    * template-stamped pages score high; natural prose near 0. Entirely
    * per-row ([[graft.functions.WordKGrams]] + array_distinct inside the
    * projection) — no Exchange except the final sort; streams at scan
    * speed at any corpus size. Output:
    * (doc_id, n_grams, n_distinct_grams, dup_frac) ordered.
    */
  def repetitionScore(documents: DataFrame, n: Int = 2): DataFrame = {
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        kGrams(split(col("text"), " "), n, distinct = false).as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct_grams"))
      .withColumn("dup_frac", round(
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct_grams") * lit(1.0) / col("n_grams")), 4))
      .orderBy("doc_id")
  }

  /** Bigram language-model quality score — the CCNet-style LM filter: fit
    * a bigram LM on the corpus itself (MLE, no smoothing — every doc
    * bigram is in the corpus by construction), then score each document by
    * its cross-entropy under that model,
    * `-Σ tf·log2( c(w1 w2) / c(w1·) ) / Σ tf` bits per bigram.
    * Low = formulaic/templated text the corpus has seen many times; high =
    * rare constructions. The real pipeline shape: corpus-level model fit
    * and per-document scoring in ONE dataflow.
    *
    * Scale: the exploded bigram table is materialized once (eager
    * localCheckpoint, owner-released) and feeds the two model aggregates
    * and the per-doc term frequencies; the score joins key on gram/w1
    * AFTER aggregation, so join-side cardinality is distinct grams, not
    * token instances. 4-dp rounding absorbs summation-order float jitter
    * (TF-IDF convention). Output: (doc_id, n_bigrams, cross_entropy)
    * ordered.
    */
  def bigramLmScore(documents: DataFrame): DataFrame = {
    val bg = documents
      .select(col("doc_id"), explode(
        kGrams(split(col("text"), " "), 2, distinct = false)).as("gram"))
      .withColumn("w1", expr("split_part(gram, ' ', 1)"))
      .localCheckpoint(true)
    val cntBig = bg.groupBy("gram").agg(count(lit(1)).as("c12"))
    val cntCtx = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val perDoc = bg.groupBy("doc_id", "w1", "gram").agg(count(lit(1)).as("tf"))
    perDoc.join(cntBig, "gram").join(cntCtx, "w1")
      .groupBy(col("doc_id").cast("long").as("doc_id"))
      .agg(sum("tf").cast("long").as("n_bigrams"),
        round((lit(0.0) - sum(col("tf") * log2(col("c12") * lit(1.0) / col("c1"))))
          / sum("tf"), 4).as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** DSIR importance weight (Xie et al. 2023, arXiv:2302.03169): score
    * every raw-corpus document by how TARGET-like it is — the
    * importance-resampling selector that picks pretraining data matching
    * a trusted domain. Target = one source's documents; weight(d) =
    * log p_target(d) − log p_raw(d) under two Laplace-smoothed unigram
    * LMs, i.e. Σ_w tf·ln[ (ct(w)+1)·(Nr+V) / ((cr(w)+1)·(Nt+V)) ].
    * Positive = looks like the target domain; a pipeline resamples
    * ∝ exp(weight). All counts exact BIGINT; each token contributes ONE
    * ln of a fixed-order double ratio (integer products < 2^53, so the
    * ratio is bit-identical cross-engine and only the libm ln diverges
    * in the last ulp — absorbed by 4-dp shipping + doc_id ordering, the
    * bigram_lm_score convention). Scale: the exploded token table is
    * materialized once and feeds both LMs and the per-doc tfs; score
    * joins key on DISTINCT words, never token instances; the two LM
    * normalizers broadcast as one-row frames.
    * Output: (doc_id, n_tokens, dsir_weight) ordered by doc_id.
    */
  def dsirWeights(documents: DataFrame, targetSource: String = "src0"): DataFrame = {
    val toks = documents
      .select(col("doc_id").cast("long").as("doc_id"),
        (col("source") === targetSource).cast("int").as("is_target"),
        explode(split(col("text"), " ")).as("w"))
      .localCheckpoint(true)
    val raw = toks.groupBy("w").agg(count(lit(1)).cast("long").as("cr"))
      .localCheckpoint(true) // feeds the vocab/normalizer row AND the join
    val tgt = toks.filter(col("is_target") === 1)
      .groupBy("w").agg(count(lit(1)).cast("long").as("ct"))
    val norms = raw.agg(count(lit(1)).cast("long").as("v"), sum("cr").as("nr"))
      .crossJoin(toks.filter(col("is_target") === 1)
        .agg(count(lit(1)).cast("long").as("nt")))
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).cast("long").as("tf"))
    tf.join(raw, "w").join(tgt, Seq("w"), "left")
      .crossJoin(broadcast(norms))
      .withColumn("ct0", coalesce(col("ct"), lit(0L)))
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_tokens"),
        // + 0.0 normalizes IEEE −0.0 (a near-zero negative sum rounds to
        // −0.0 in one engine and 0.0 in the other — measured at sf0.1)
        (round(sum(col("tf") * log(
          ((col("ct0") + lit(1.0)) * (col("nr") + col("v")).cast("double")) /
            ((col("cr") + lit(1.0)) * (col("nt") + col("v")).cast("double")))), 4)
          + lit(0.0)).as("dsir_weight"))
      .orderBy("doc_id")
  }

  /** PMI collocation mining: pointwise mutual information of each corpus
    * bigram, `pmi = ln( c12·T / (c1·c2) )` (c12 bigram count, c1/c2
    * unigram counts, T total tokens). Every count is an exact BIGINT and
    * the ln argument is ONE fixed-order double expression (products in
    * double — BIGINT products of 1e12-scale counts would overflow at
    * corpus scale) — but `ln` itself is a libm call the JVM and DuckDB
    * round differently in the last ulp (measured: 1-ulp diff on this
    * corpus), so the SHIPPED score rounds to 4 dp while the ORDERING uses
    * the raw double with a gram tiebreak (identical ranking wherever
    * scores differ by more than a ulp — the tfidf precedent). `minCount`
    * drops unstable rare bigrams. Scale: one exploded-token shuffle feeds both
    * count aggregates; the score join keys on DISTINCT grams/words, never
    * token instances; T broadcasts as one row.
    * Output: top `topN` by (pmi DESC, gram) — (gram, c12, pmi).
    */
  def bigramPmi(documents: DataFrame, minCount: Long = 5L, topN: Int = 50): DataFrame = {
    val toks = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .localCheckpoint(true) // feeds unigram counts and the total
    val uni = toks.groupBy("w").agg(count(lit(1)).cast("long").as("c"))
    val total = toks.agg(count(lit(1)).cast("long").as("t_tok"))
    val big = documents
      .select(explode(kGrams(split(col("text"), " "), 2, distinct = false)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).cast("long").as("c12"))
      .filter(col("c12") >= minCount)
      .withColumn("w1", expr("split_part(gram, ' ', 1)"))
      .withColumn("w2", expr("split_part(gram, ' ', 2)"))
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("gram"), col("c12"),
        log((col("c12").cast("double") * col("t_tok").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))).as("pmi_raw"))
      .orderBy(col("pmi_raw").desc, col("gram"))
      .limit(topN)
      .select(col("gram"), col("c12"), round(col("pmi_raw"), 4).as("pmi"))
  }

  /** TF-IDF: top `perDoc` highest-scoring terms per document for docs with
    * id < `maxDocId` (bounded output for the oracle). tf = raw count in
    * doc; idf = ln(N / df) over the WHOLE corpus. Deterministic tiebreak
    * (score DESC, term) via row_number.
    */
  def tfIdfTopTerms(documents: DataFrame, perDoc: Int = 5,
                    maxDocId: Long = 20L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.select(count(lit(1)).as("n"))
    // Rank on the ROUNDED score: JVM Math.log and libm ln can differ in the
    // last ulp, and an unrounded rank could flip across engines (same
    // convention as Similarity.cosineTopK).
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_r").desc, col("term"))
    tf.filter(col("doc_id") < maxDocId)
      .join(df_, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n") * lit(1.0) / col("df")))
      .withColumn("score_r", round(col("score"), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perDoc)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("term"), col("rn").cast("long").as("rn"),
        col("score_r").as("score"))
      .orderBy("doc_id", "rn")
  }

  /** PII scrubbing: redact email addresses and long digit runs (7+ —
    * phone/account-number shaped), reporting match counts on the ORIGINAL
    * text and the md5 of the scrubbed text. Patterns are plain character
    * classes only (no lookaround/backrefs), the regex subset Java and RE2
    * evaluate identically — the cross-engine-parity constraint.
    * Per-row codegen'd expressions; streams at scan speed.
    */
  def scrubPii(documents: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val longNum = "[0-9]{7,}"
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(longNum), lit(0))).cast("long").as("n_longnums"),
        md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          longNum, "<NUM>").cast("binary")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** Corpus profile per source: doc count, mean chars, exact p50/p95 of
    * doc length (Spark's exact `percentile` ⇔ DuckDB `quantile_cont`,
    * both linear-interpolating). Profiling is the first query of any
    * curation run; exact percentiles keep it oracle-checkable
    * (approx_percentile is partition-order-dependent).
    */
  def corpusProfile(documents: DataFrame): DataFrame = {
    documents.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        round(avg("n_chars"), 2).as("avg_chars"),
        round(expr("percentile(n_chars, 0.5)"), 2).as("p50_chars"),
        round(expr("percentile(n_chars, 0.95)"), 2).as("p95_chars"))
      .orderBy("source")
  }

  /** Winnowing document fingerprint — the published algorithm (Schleimer,
    * Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD 2003): hash every k-gram IN SEQUENCE ORDER
    * (duplicates kept), slide a window of `w` consecutive hashes, keep the
    * minimum of each window; the distinct kept hashes are the fingerprint.
    * Guarantee: any shared token run of ≥ w + k - 1 tokens produces at
    * least one shared fingerprint (property-tested).
    *
    * Hash = the first 60 bits of the gram's md5 as a BIGINT
    * (`conv(substr(md5,1,15),16,10)` — DuckDB replays it as
    * `('0x'||substr(md5,1,15))::BIGINT`, bit-identical), so the window
    * sort/min carries an 8-byte long instead of a 32-char hex string
    * (~4× smaller shuffle payload; xxhash64 would be Spark-only). One
    * shuffle: the per-doc window sort. Docs with fewer than k tokens emit
    * no fingerprints; docs with fewer than w+k-1 tokens emit the single
    * min over all their gram hashes (the truncated first window).
    *
    * Output: (doc_id, fp: BIGINT) — one row per distinct fingerprint hash.
    */
  def winnowedFingerprint(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = documents
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), (size(col("t")) - lit(k - 1)).as("m"),
        posexplode(kGrams(col("t"), k, distinct = false)).as(Seq("pos", "g")))
      .withColumn("h", graft.functions.PortableHash.md5Bits60(col("g")))
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    grams
      .withColumn("fp", min("h").over(win))
      // full windows only (starts 0..m-w); if m < w the truncated first
      // window (min of all hashes) is the whole fingerprint
      .filter(col("pos") <= greatest(col("m") - lit(w), lit(0)))
      .select(col("doc_id").cast("long").as("doc_id"), col("fp"))
      .distinct()
      .orderBy("doc_id", "fp")
  }

  /** Distributed BPE tokenizer training (Sennrich et al. 2016,
    * arXiv:1508.07909), the merge-rule learning loop every LLM data
    * pipeline runs before token counting: start from characters, then
    * `rounds` times pick the most frequent adjacent symbol pair
    * (weighted by word frequency, tiebreak lexicographic) and fuse it
    * everywhere. The corpus-scale work is ONE pass: corpus → word
    * vocabulary with counts (the classic BPE trick — merges operate on
    * the vocab, weighted by count, never on raw text again). Each round
    * is then a pair-explode + sum over the vocab (distributed; vocab ≪
    * corpus but can itself be huge — nothing here collects it) and the
    * argmax rule is the ONLY driver-side row (control-plane, like the
    * k-means seeds). Symbol sequences ride as FULLY-DELIMITED strings —
    * `(t)(a)(b)` — so a merge is a literal `replace('(l)(r)', '(lr)')`:
    * consecutive occurrences share no characters, which makes one
    * non-overlapping left-to-right replace pass exactly the greedy BPE
    * application in both engines (a shared-space sentinel would skip
    * every second occurrence of back-to-back pairs). The vocab is
    * localCheckpointed per round: 5 chained replaces, not a 5-deep lazy
    * plan re-derived each round.
    * Output: (step, l, r, pair_n) — one row per learned merge rule.
    */
  def bpeMerges(documents: DataFrame, rounds: Int = 5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeTrain(documents, rounds)._1.toDF("step", "l", "r", "pair_n")
      .orderBy("step")
  }

  /** BPE ENCODING applied corpus-wide: train `rounds` merges
    * ([[bpeMerges]]' loop), then count the resulting tokens. Because the
    * merges already operate on the counted word vocabulary, "encode the
    * corpus" costs ONE more explode over the final vocab weighted by word
    * count — the corpus text is never touched again (at 100 TB the vocab
    * is millions of rows where the corpus is trillions of tokens).
    * Output: the `k` most frequent post-merge tokens, `(token, cnt)`,
    * count-desc with lexicographic tiebreak — exact BIGINT counts.
    */
  def bpeTokenFrequencies(documents: DataFrame, rounds: Int = 5,
                          k: Int = 30): DataFrame = {
    val vocab = bpeTrain(documents, rounds)._2
    vocab
      .select(explode(split(expr("substring(seq, 2, length(seq) - 2)"),
        "\\)\\(")).as("token"), col("n"))
      .groupBy("token").agg(sum("n").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
  }

  /** Per-document sequence lengths under the trained tokenizer — the
    * input every packing/length-bucketing stage needs. Train `rounds`
    * merges ([[bpeMerges]]' loop), derive tokens-per-word from the final
    * vocabulary, then ONE equi-join from exploded corpus words back to
    * that word table: the heavy side streams, the vocabulary side is the
    * small one (≪ corpus at any scale — AQE broadcasts it when it fits).
    * Output: (doc_id, n_words, n_tokens), exact BIGINTs, ordered by doc.
    */
  def bpeDocTokenCounts(documents: DataFrame, rounds: Int = 5): DataFrame = {
    val vocab = bpeTrain(documents, rounds)._2
    val wordLen = vocab.select(col("w"),
      size(split(expr("substring(seq, 2, length(seq) - 2)"), "\\)\\("))
        .cast("long").as("w_tokens"))
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .join(wordLen, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("w_tokens").cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1998's benchmark smoothing — what KenLM computes):
    *   P(w2|w1) = (c(w1w2) − D)/c(w1·) + λ(w1)·P_cont(w2),
    * with D = 3/4, λ(w1) = D·N1+(w1·)/c(w1·) and
    * P_cont(w2) = N1+(·w2)/N1+(··) — the continuation probability that
    * makes "Francisco" unlikely outside "San Francisco" no matter how
    * frequent the token is. The fixed D = 3/4 keeps EVERYTHING an exact
    * BIGINT: multiplying through by 4·c(w1·)·N1+(··) gives
    *   P = [(4c−3)·Nt + 3·N1fwd·N1back] / (4·c1·Nt),
    * two integer polynomials and ONE final IEEE division — bit-identical
    * cross-engine, shipped unrounded with an exact-integer ordering
    * (c12 desc, then gram), the strongest parity class here.
    *
    * Scale: one bigram aggregate (distinct grams, not instances, cross
    * the wire after map-side combine), two marginal aggregates over the
    * GRAM table, a one-row type count broadcast. Output: the `topN` most
    * frequent bigrams (w1, w2, c12, c1, n1_fwd, n1_back, p_kn).
    */
  def kneserNeyBigrams(documents: DataFrame, topN: Int = 50): DataFrame = {
    val c12 = documents
      .select(explode(kGrams(split(col("text"), " "), 2, distinct = false)).as("gram"))
      .select(expr("split_part(gram, ' ', 1)").as("w1"),
        expr("split_part(gram, ' ', 2)").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("c12"))
      .localCheckpoint(true) // feeds both marginals, the type count, the join
    val c1 = c12.groupBy("w1")
      .agg(sum("c12").cast("long").as("c1"), count(lit(1)).cast("long").as("n1_fwd"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).cast("long").as("n1_back"))
    val nt = broadcast(c12.agg(count(lit(1)).cast("long").as("nt")))
    c12.join(c1, "w1").join(cont, "w2").crossJoin(nt)
      .withColumn("p_kn",
        ((col("c12") * 4 - 3) * col("nt") +
          lit(3L) * col("n1_fwd") * col("n1_back")).cast("double") /
          (lit(4L) * col("c1") * col("nt")).cast("double"))
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(topN)
      .select("w1", "w2", "c12", "c1", "n1_fwd", "n1_back", "p_kn")
  }

  /** Tokenizer FERTILITY per language — tokens-per-word under the trained
    * BPE merges, grouped by `lang` (the tokenizer-equity audit of
    * Ács 2019 / Rust et al. 2021, arXiv:2012.15613: a tokenizer trained
    * on a skewed mix fragments under-represented languages into more
    * pieces, inflating their effective sequence length and training
    * cost). Builds on [[bpeDocTokenCounts]]' join plan — corpus words
    * stream once against the small vocabulary side — then ONE lang-keyed
    * aggregate; fertility divides two exact BIGINTs (one final IEEE
    * division, emitted unrounded). Output:
    * (lang, n_docs, n_words, n_tokens, fertility) ordered by lang.
    */
  def tokenizerFertility(documents: DataFrame, rounds: Int = 5): DataFrame =
    bpeDocTokenCounts(documents, rounds)
      .join(documents.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_words").cast("long").as("n_words"),
        sum("n_tokens").cast("long").as("n_tokens"))
      .withColumn("fertility", col("n_tokens").cast("double") / col("n_words"))
      .orderBy("lang")

  /** Shared BPE training loop: returns (merge rules, final encoded word
    * vocabulary `(w, seq, n)` with all `rounds` merges applied — the raw
    * word `w` rides through every round so encoders can join corpus words
    * back to their token sequences without un-delimiting `seq`, which
    * would corrupt words that themselves contain parentheses).
    */
  private def bpeTrain(documents: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var vocab = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
      .select(col("w"), regexp_replace(col("w"), "(.)", "($1)").as("seq"), col("n"))
      .localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to rounds) {
      val best = vocab
        .select(col("n"),
          split(expr("substring(seq, 2, length(seq) - 2)"), "\\)\\(").as("syms"))
        // zip of two shifted slices (NOT sequence(1, size-1): Spark's
        // sequence DESCENDS when stop < start, so 1-symbol words would
        // index out of bounds under ANSI)
        .select(col("n"), explode(expr(
          "zip_with(slice(syms, 1, greatest(size(syms) - 1, 0)), " +
            "slice(syms, 2, greatest(size(syms) - 1, 0)), " +
            "(a, b) -> struct(a AS l, b AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("pn"))
        .orderBy(col("pn").desc, col("l"), col("r"))
        .limit(1).collect()
      require(best.nonEmpty, s"BPE round $step: corpus has no adjacent " +
        "symbol pairs to merge (vocabulary is all single-symbol words)")
      val (l, r, pn) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      rules += ((step.toLong, l, r, pn))
      // lit() keeps learned symbols out of SQL text — a token containing a
      // quote or backslash merges correctly instead of breaking the parse
      vocab = vocab
        .select(col("w"),
          replace(col("seq"), lit(s"($l)($r)"), lit(s"($l$r)")).as("seq"),
          col("n"))
        .localCheckpoint(true)
    }
    (rules.toSeq, vocab)
  }

  /** Count-min-sketch term frequencies: build ONE d×w sketch over every
    * token occurrence (the native [[graft.functions.Sketches.CountMinAgg]]
    * — fixed-size buffer through the shuffle, elementwise-add merge), then
    * read the point estimate for every distinct term back out of the
    * broadcast one-row sketch, next to the exact count. The md5-addressed
    * buckets make the whole sketch — not just its error bounds —
    * bit-reproducible in the oracle engine; est_n ≥ true_n always, with
    * overestimates exactly where bucket collisions land.
    * Output: (term, est_n, true_n) ordered by term.
    */
  def cmsTermCounts(documents: DataFrame, depth: Int = 4,
                    width: Int = 256): DataFrame = {
    import graft.functions.{PortableHash, Sketches}
    val tok = documents.select(explode(split(col("text"), " ")).as("term"))
    val sk = tok.agg(Sketches.count_min_agg(col("term"), depth, width).as("sk"))
    val tru = tok.groupBy("term").agg(count(lit(1)).cast("long").as("true_n"))
    val reads = (0 until depth).map { j =>
      element_at(col("sk"),
        (PortableHash.md5Bits60(concat(col("term"), lit(s":$j"))) % width
          + lit(j * width) + 1).cast("int"))
    }
    tru.crossJoin(broadcast(sk))
      .select(col("term"), least(reads: _*).as("est_n"), col("true_n"))
      .orderBy("term")
  }
}
