package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — error bars for aggregate metrics at
  * data scale. The classic bootstrap (sample n rows WITH replacement, B
  * times) is unrunnable distributed: it needs global coordinated draws.
  * The Poisson bootstrap replaces the multinomial with independent
  * per-row Poisson(1) replica weights — one pass, no coordination, the
  * standard large-scale substitute (weight sum concentrates around n).
  *
  * Determinism: the "draw" for (row, replica) is the portable 60-bit md5
  * of (id, replica) compared against PRECOMPUTED integer thresholds
  * T_k = floor(CDF_Poisson(1)(k) · 2^60) — pure BIGINT comparisons, no
  * floating point, no rand(); reproducible across engines, runs, and
  * partitionings, and exactly replayable by a SQL oracle carrying the
  * same literals. Weights cap at 9 (P ≈ 1.1e-6, same branch both
  * engines).
  *
  * Scale shape: the per-row replica explode is SCAN-LOCAL (explode →
  * project → partial aggregate inside one stage); map-side combine
  * reduces each partition to ≤ B rows before the only shuffle, so
  * shuffle volume is B × partitions regardless of input size. Replica
  * sums stay exact BIGINT (value pre-scaled to integer cents by the
  * caller); each replica mean spends ONE IEEE division, and the CI
  * bounds are order statistics over the B replica means (a B-row
  * parameter-scale sort).
  */
object Bootstrap {

  private val poissonThresholds: Seq[Long] = Seq(
    424136118829305344L, 848272237658610688L, 1060340297073263360L,
    1131029650211480960L, 1148701988496035328L, 1152236456152946176L,
    1152825534095764608L, 1152909688087595776L, 1152920207336574720L)

  /** Poisson(1) replica weight for hash column `h` (0 ≤ h < 2^60). */
  private def poissonWeight(h: Column): Column =
    poissonThresholds.zipWithIndex.foldRight(lit(9L): Column) {
      case ((t, k), rest) => when(h < t, k.toLong).otherwise(rest)
    }

  /** Bootstrap CI for the MEAN of an integer-cents value column.
    * `df` must carry (`id` BIGINT, `cents` BIGINT); the point estimate
    * and B replica means are exact-BIGINT sums with one final division
    * each; `loRank`/`hiRank` are 1-indexed order statistics over the B
    * replica means (defaults ≈ the 2.5th/97.5th percentile at B=64).
    * Output: one row (n_rows, mean_value, ci_lo, ci_hi).
    */
  def poissonCiMean(df: DataFrame, b: Int = 64,
                    loRank: Int = 2, hiRank: Int = 63): DataFrame = {
    val reps = df
      .select(col("id"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .select(col("b"), col("cents"),
        poissonWeight(graft.functions.PortableHash.md5Bits60(
          concat_ws("_", col("id"), col("b")))).as("w"))
    val means = reps.groupBy("b")
      .agg(sum(col("w") * col("cents")).cast("long").as("swc"),
        sum(col("w")).cast("long").as("sw"))
      .select(col("b"),
        (col("swc").cast("double") / (col("sw").cast("double") * 100.0)).as("m"))
    // order statistics over B rows — parameter-scale window by design
    val ranked = means
      .withColumn("rn", row_number().over(Window.orderBy(col("m"), col("b"))))
    val lo = ranked.filter(col("rn") === loRank).select(col("m").as("ci_lo"))
    val hi = ranked.filter(col("rn") === hiRank).select(col("m").as("ci_hi"))
    df.agg(count(lit(1)).cast("long").as("n_rows"),
        sum("cents").cast("long").as("sc"))
      .select(col("n_rows"),
        (col("sc").cast("double") / (col("n_rows").cast("double") * 100.0))
          .as("mean_value"))
      .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
  }
}
