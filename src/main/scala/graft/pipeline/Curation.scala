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
}
