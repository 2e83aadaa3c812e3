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
