package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over `documents(doc_id, text, ...)`: BM25 scoring for
  * a literal query-term set, and reciprocal-rank fusion of two rankings —
  * the retrieval half of a training-data curation stack (the embedding
  * half lives in [[Similarity]]).
  *
  * Engine-portability contract (shared with the DuckDB oracles): every
  * floating-point score is built from EXACT integer statistics (tf, dl,
  * df, N — all BIGINT) combined in ONE fixed left-to-right expression, so
  * both engines evaluate the identical IEEE operation sequence — except
  * `ln`, a libm call the JVM and DuckDB round differently in the last ulp
  * (measured on bigram PMI). So every ORDERING decision uses the raw
  * double with doc_id tie-breaks (identical ranking wherever scores
  * differ by more than a ulp), and the SHIPPED bm25 rounds to 4 dp to
  * absorb the ulp (tfidf precedent); rrf itself is built from exact
  * integer ranks (two IEEE divides) and ships unrounded.
  *
  * Scale: tf is a per-row array scan (no shuffle); N/avgdl/df reduce to a
  * ONE-ROW stats frame that broadcasts back (`crossJoin(broadcast(...))`),
  * so the whole scorer is scan + one tiny aggregate — no per-term join,
  * no explode of the token stream. Rankings avoid the single-partition
  * `Window.orderBy` trap via [[Ranking.withGlobalIndex]] (range-partitioned
  * sort + zipWithIndex).
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** The declared benchmark query: one common term, one rare term (df 25
    * of 500 at sf0.01 — the idf contrast), one mid term.
    */
  val QueryTerms: Seq[String] = Seq("spark", "dup", "merge")

  /** Per-doc INDEX projection — the narrow frame a serving store holds
    * instead of the corpus text: (doc_id, dl, tf_i per query term), all
    * exact BIGINTs, built in one tokenizing scan. Factored out of
    * [[bm25TopDocs]] so the streaming ingest twin
    * ([[graft.streaming.StreamOps.bm25ReplayBatch]]) can append exactly
    * these rows per micro-batch — at 100 TB the maintained index is the
    * integer frame, never a re-read of the corpus.
    */
  private[graft] def docFrame(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z]+")),
      s"terms must be simple lowercase words, got $terms")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      expr(s"size(filter(tk, x -> x = '$t'))").cast("long").as(s"tf$i")
    }
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("tk"))
      .select(Seq(col("doc_id"), size(col("tk")).cast("long").as("dl")) ++ tfCols: _*)
  }

  /** One-row corpus stats of an index frame — n, Σdl, df_i, ALL exact
    * BIGINT sums, hence purely ADDITIVE: the streaming twin merges
    * per-batch stat rows losslessly (integer addition is associative),
    * so its final stats are bit-identical to the batch aggregate.
    */
  private[graft] def statsOf(frame: DataFrame, terms: Seq[String]): DataFrame = {
    val aggs =
      Seq(count(lit(1)).cast("long").as("n"),
        sum(col("dl")).cast("long").as("sdl")) ++
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("long").as(s"df$i"))
    frame.agg(aggs.head, aggs.tail: _*)
  }

  /** BM25 scoring of an index frame against a one-row stats frame —
    * shared VERBATIM by the batch query and the streaming twin (the
    * one-kernel-two-twins rule): identical integer stats in, identical
    * score bits out.
    */
  private[graft] def scoreFrame(frame: DataFrame, stats: DataFrame,
                                terms: Seq[String]): DataFrame = {
    // avgdl as explicit integer-sum / count division — Spark's and DuckDB's
    // avg() may accumulate differently; sdl/n is bit-identical by contract
    val avgdl = col("sdl").cast("double") / col("n")
    // one fixed left-to-right sum of per-term contributions
    val contribution: Int => Column = i =>
      log(lit(1.0) + (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))) *
        (col(s"tf$i") * lit(K1 + 1.0)) /
        (col(s"tf$i") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    val score = terms.indices.map(contribution).reduceLeft(_ + _)
    frame.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), score.as("bm25"))
  }

  /** Per-doc BM25 frame: doc_id, dl (token count), tf_i per query term,
    * with the corpus stats (n, sdl, df_i) broadcast onto every row.
    */
  private def scored(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val d = docFrame(docs, terms)
    scoreFrame(d, statsOf(d, terms), terms)
  }

  /** Final ranking step shared by both twins: top-`k` by (bm25 DESC,
    * doc_id), shipped rounded 4 dp (the ln-ulp contract above).
    */
  private[graft] def bm25TopDocsFromFrame(frame: DataFrame, stats: DataFrame,
                                          terms: Seq[String],
                                          k: Int): DataFrame =
    scoreFrame(frame, stats, terms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))

  /** Top-`k` documents by BM25 for the literal `terms` (ties by doc_id).
    * Output: (doc_id, bm25) ordered by (bm25 DESC, doc_id).
    */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame = {
    val d = docFrame(docs, terms)
    bm25TopDocsFromFrame(d, statsOf(d, terms), terms, k)
  }

  /** Rocchio pseudo-relevance-feedback query expansion (Rocchio 1971 via
    * the standard PRF formulation, e.g. Manning et al., IIR §9.1.1): take
    * the top-`kDocs` BM25 documents as the pseudo-relevant set, weight
    * every term they contain (minus the original query terms) by the
    * positive Rocchio centroid mass Σ_d tf_{t,d} · ln(N/df_t), and emit
    * the top-`kTerms` expansion candidates — the classic second-pass
    * retrieval step when no click/relevance signal exists.
    *
    * Parity: the weight is an exact BIGINT tf sum times ONE `ln` of a
    * ratio of exact integers — ordering uses the raw double with a term
    * tie-break, shipping rounds to 4 dp (the bm25/tfidf contract; same
    * accepted ulp-inversion risk class). Scale: the feedback set is
    * `kDocs` rows (broadcast); its term frame is tiny and joins the
    * corpus-wide df table on the term key — one term-keyed shuffle, no
    * per-doc join, the full token stream explodes exactly once for df.
    * Output: (term, sum_tf, df, score) ordered (score DESC, term).
    */
  def prfExpansionTerms(docs: DataFrame, terms: Seq[String],
                        kDocs: Int = 10, kTerms: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("tk"))
      .localCheckpoint(true) // feeds feedback tf AND corpus df/N
    val fbIds = scored(docs, terms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(kDocs)
      .select("doc_id")
    val fbTf = toks.join(broadcast(fbIds), "doc_id")
      .select(explode(col("tk")).as("term"))
      .filter(!col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).cast("long").as("sum_tf"))
    val df = toks
      .select(col("doc_id"), explode(array_distinct(col("tk"))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val n = broadcast(toks.agg(count(lit(1)).cast("long").as("n")))
    fbTf.join(df, "term")
      .crossJoin(n)
      .withColumn("raw", col("sum_tf") * log(col("n").cast("double") / col("df")))
      .orderBy(col("raw").desc, col("term"))
      .limit(kTerms)
      .select(col("term"), col("sum_tf"), col("df"),
        round(col("raw"), 4).as("score"))
  }

  /** Reciprocal-rank fusion of the BM25 ranking with a document-length
    * ranking (the stand-in for any second retriever): rrf =
    * 1/(60+rank_lex) + 1/(60+rank_len), both ranks 1-based over the FULL
    * corpus with deterministic (score, doc_id) tie-breaks.
    *
    * Both rankings are computed with the two-pass global index — a fused
    * multi-retriever ranking at corpus scale must not serialize onto one
    * task, which `row_number() OVER (ORDER BY ...)` would.
    * Output: (doc_id, rank_lex, rank_len, rrf) top-`k` by (rrf DESC, doc_id).
    */
  def rrfFusion(docs: DataFrame, terms: Seq[String], k: Int = 20,
                rrfK: Int = 60): DataFrame = {
    val base = scored(docs, terms).localCheckpoint(true) // feeds both rankings
    val lex = Ranking.withGlobalIndex(
        base.select(col("doc_id"), col("bm25")), col("bm25").desc, col("doc_id"))
      .select(col("doc_id"), (col("idx") + 1).as("rank_lex"))
    val len = Ranking.withGlobalIndex(
        base.select(col("doc_id"), col("dl")), col("dl").desc, col("doc_id"))
      .select(col("doc_id"), (col("idx") + 1).as("rank_len"))
    // rrf is two IEEE divides + one add on exact integers — bit-identical
    // cross-engine, so it ships UNROUNDED (rounding a bit-identical double
    // can diverge: Spark rounds the shortest decimal repr, DuckDB the
    // binary value)
    lex.join(len, Seq("doc_id"))
      .select(col("doc_id"), col("rank_lex"), col("rank_len"),
        (lit(1.0) / (lit(rrfK) + col("rank_lex")) +
          lit(1.0) / (lit(rrfK) + col("rank_len"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
