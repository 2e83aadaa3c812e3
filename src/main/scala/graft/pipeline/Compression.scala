package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal — the public-knowledge Gopher
  * companion: repetitive/boilerplate text DEFLATEs far below natural
  * prose, so `compressed/raw` is a cheap, language-agnostic repetition
  * signal a training-data pipeline thresholds next to the rule-based
  * Gopher filters (used e.g. by CCNet/RefinedWeb-style curation stacks).
  *
  * Determinism contract: one pinned codec configuration
  * ([[newDeflater]]: level [[Level]], raw/nowrap stream, default
  * strategy), byte input = UTF-8 of `text`. DEFLATE output for a fixed
  * input and configuration is a pure function inside one JVM/zlib, which
  * is what the replay oracle relies on: [[graft.Verify]] recomputes
  * `comp_len` SEQUENTIALLY on the driver through the SAME kernel
  * ([[deflateLen]]) and dumps it as a parquet fixture the DuckDB oracle
  * joins against — so the correctness gate checks the DISTRIBUTED
  * execution (partitioning, codec-context reuse, ordering, arithmetic)
  * against an independent sequential run, DuckDB re-derives `raw_len`
  * and `ratio_bp` from the documents table, and CompressionSpec proves
  * the stream is genuine DEFLATE by round-tripping it through Inflater.
  *
  * Scale: mapPartitions with ONE native zlib context per partition
  * (reset per row — allocating a Deflater per row leaks native memory
  * pressure and measured ~3× slower); text bytes never shuffle (the
  * operator reduces each doc to 4 BIGINTs before the final order).
  */
object Compression {
  /** Pinned DEFLATE level (zlib default — best-ratio-per-cpu knee). */
  val Level = 6

  /** One pinned-configuration codec context. Caller must `end()` it. */
  def newDeflater(): java.util.zip.Deflater =
    new java.util.zip.Deflater(Level, /* nowrap = raw stream */ true)

  /** Compressed length of one payload — the sequential kernel SHARED by
    * the distributed operator and the Verify replay fixture (equivalence
    * by construction, the decontamination-kernel discipline).
    */
  def deflateLen(bytes: Array[Byte], d: java.util.zip.Deflater): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Per-document compression stats:
    * `(doc_id, raw_len, comp_len, ratio_bp)` with
    * `ratio_bp = comp_len * 10000 div raw_len` — EXACT integer basis
    * points (no FP anywhere), ordered by doc_id. Empty docs are excluded
    * (ratio undefined; ANSI division would throw).
    */
  def compressionRatio(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"))
      .where(length(col("text")) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = newDeflater()
        // drain the partition eagerly so the native context can be
        // released deterministically (a lazy map would outlive `d`)
        val out = it.map { case (id, text) =>
          val b = text.getBytes("UTF-8")
          val cl = deflateLen(b, d)
          (id, b.length.toLong, cl, cl * 10000L / b.length)
        }.toVector
        d.end()
        out.iterator
      }
      .toDF("doc_id", "raw_len", "comp_len", "ratio_bp")
      .orderBy("doc_id")
  }
}
