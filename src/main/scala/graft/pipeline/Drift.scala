package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection: the exact two-sample Kolmogorov–Smirnov
  * statistic between two groups' value distributions — the check a
  * curation pipeline runs when a new source (or a new crawl of an old
  * one) lands: "does this batch's length/quality profile match?"
  */
object Drift {

  /** Exact KS = max over values of |CDF_A − CDF_B|, computed on the
    * INTEGER numerator |cumA·nB − cumB·nA| (cross-multiplied CDFs) so the
    * max is decided in exact arithmetic and the ONE division at the end
    * is bit-identical cross-engine — no per-value FP comparisons anywhere.
    * The cumulative counts come from the distributed prefix-sum scan
    * ([[Ranking.withRunningSums]]) over the distinct-value frame, not a
    * single-partition window.
    * Output: one row (at_value, ks_num, n_a, n_b, ks), at_value = the
    * smallest value attaining the max.
    */
  /** Population Stability Index of every source's value distribution
    * against the REST of the corpus — the industry-standard drift score
    * alongside [[ksStatistic]] (PSI < 0.1 stable, 0.1–0.25 moderate,
    * > 0.25 shifted): PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i) over
    * fixed-width value bins, with add-one (Laplace) smoothing so empty
    * bins never hit ln(0) — p is the source's smoothed bin share, q the
    * rest-of-corpus share, B the global bin count.
    *
    * Parity: counts are exact BIGINT; p and q are single divisions of
    * exact integers and each bin term is one fixed (p−q)·ln(p/q) op tree,
    * summed over ≤ a few dozen bins and shipped rounded 4 dp (the
    * zipf/powerlaw contract for ln sums). Scale: ONE (source, bin) count
    * aggregate is the only data-sized shuffle; everything after is
    * parameter-scale (sources × bins grid, both broadcast). Output:
    * (source, n_bins, psi) ordered by source.
    */
  /** The ONE data-sized pass of [[psiPerSource]]: exact (source, bin)
    * BIGINT counts — purely ADDITIVE, so the streaming twin
    * ([[graft.streaming.StreamOps.psiReplayBatch]]) folds per-batch
    * count frames into a running state losslessly and the final PSI is
    * bit-identical to the batch computation.
    */
  private[graft] def sourceBinCounts(df: DataFrame, value: Column,
                                     binWidth: Long = 50L): DataFrame =
    df.select(col("source"),
        floor(value / lit(binWidth)).cast("long").as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).cast("long").as("cs"))

  /** The parameter-scale tail of [[psiPerSource]] over a materialized
    * (source, bin, cs) count frame — shared VERBATIM by the batch query
    * and the streaming twin.
    */
  private[graft] def psiOfBinCounts(sb: DataFrame): DataFrame = {
    val gb = sb.groupBy("bin").agg(sum("cs").cast("long").as("cg"))
    val ns = sb.groupBy("source").agg(sum("cs").cast("long").as("n"))
    val tot = broadcast(gb.agg(sum("cg").cast("long").as("nn"),
      count(lit(1)).cast("long").as("nb")))
    ns.crossJoin(broadcast(gb))
      .join(sb, Seq("source", "bin"), "left")
      .withColumn("cs", coalesce(col("cs"), lit(0L)))
      .crossJoin(tot)
      .withColumn("p", (col("cs") + lit(1.0)) / (col("n") + col("nb")))
      .withColumn("q",
        (col("cg") - col("cs") + lit(1.0)) / (col("nn") - col("n") + col("nb")))
      .groupBy("source")
      .agg(max("nb").as("n_bins"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 4).as("psi"))
      .orderBy("source")
  }

  def psiPerSource(df: DataFrame, value: Column,
                   binWidth: Long = 50L): DataFrame =
    psiOfBinCounts(sourceBinCounts(df, value, binWidth)
      .localCheckpoint(true)) // the one data-sized pass; feeds all totals

  def ksStatistic(df: DataFrame, group: Column, value: Column,
                  groupA: String, groupB: String): DataFrame = {
    val d = df.filter(group.isin(groupA, groupB))
      .select(group.as("g"), value.cast("long").as("v"))
      .localCheckpoint(true) // feeds the counts and the totals
    val counts = d.groupBy("v").agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("a"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("b"))
    val cum = Ranking.withRunningSums(counts, Seq("a", "b"), col("v"))
    val tot = d.agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"),
        abs(col("cum_a") * col("nb") - col("cum_b") * col("na")).as("ks_num"),
        col("na"), col("nb"))
      .orderBy(col("ks_num").desc, col("v"))
      .limit(1)
      .select(col("v").as("at_value"), col("ks_num"),
        col("na").as("n_a"), col("nb").as("n_b"),
        (col("ks_num").cast("double") / (col("na") * col("nb"))).as("ks"))
  }
}
