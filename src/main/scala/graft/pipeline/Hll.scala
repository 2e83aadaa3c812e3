package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct sketch with a PURE-INTEGER harmonic sum — the
  * kernel behind `hll_distinct_users`, factored so the streaming serving
  * twin maintains the SAME register relation incrementally and replays
  * the same oracle (the one-kernel-two-twins rule, like
  * Search/Drift/Events before it).
  *
  * m = 256 registers over the portable 60-bit hash (bucket = h mod m,
  * rank = leading-zero count of the remaining 52 bits + 1 via exact
  * bit-length ops — no libm log2). Register state is 256 rows regardless
  * of cardinality, and the per-register max is duplicate-insensitive AND
  * associative — precisely the fold that makes the sketch ingest-able:
  * any batch split of the rows maxes to the same registers.
  */
object Hll {
  val M = 256

  /** Per-bucket register maxes of `ids` (one string-castable column named
    * by `idCol`): (bucket, mj), ≤ m rows, built by ONE aggregation with
    * map-side partial max — never a pre-distinct on the hash (the
    * distinct would shuffle the full hash set first, the opposite of how
    * an HLL streams).
    */
  def registers(df: DataFrame, idCol: String): DataFrame =
    df.select(
        graft.functions.PortableHash.md5Bits60(col(idCol).cast("string")).as("h"))
      .select((col("h") % M).as("bucket"), expr("h div 256").as("rem"))
      .select(col("bucket"),
        when(col("rem") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("rem")))).as("rank"))
      .groupBy("bucket").agg(max("rank").as("mj"))

  /** Fold (bucket, mj) registers + a one-row `exact` frame
    * (exact_users BIGINT) into the shipped estimate row. Σ 2^(−Mj) is
    * kept scaled as Σ 2^(53−Mj) in BIGINT so both engines agree
    * bit-for-bit; ONE double expression at the end (+ the standard
    * small-range linear-counting branch, whose single ln is why est
    * ships rounded 4 dp).
    */
  def estimate(registers: DataFrame, exact: DataFrame): DataFrame = {
    val regs = registers
      .agg(count(lit(1)).cast("long").as("n_used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mj)")).cast("long").as("sp_used"))
    val sprime = (col("sp_used") +
      (lit(M.toLong) - col("n_used")) * lit(9007199254740992L)) // + 2^53 per empty register
    val rawEst = lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
      lit(9007199254740992.0) / sprime.cast("double")
    regs.crossJoin(broadcast(exact))
      .select(col("n_used"), (lit(M.toLong) - col("n_used")).as("n_empty"),
        sprime.cast("long").as("sprime"),
        round(when(rawEst <= lit(640.0) && col("n_used") < M, // small-range correction
            lit(256.0) * log(lit(256.0) / (lit(M.toLong) - col("n_used")).cast("double")))
          .otherwise(rawEst), 4).as("est_users"),
        col("exact_users"))
  }
}
