package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for joins whose key distribution is heavy-
  * tailed (hot vertices in a power-law graph, hot shingles in web text).
  *
  * AQE's skew-join handles shuffle-size skew at runtime; salting is the
  * explicit, planner-independent lever when one key dominates so badly that
  * even a split partition is one task's worth of a single key, or when the
  * join is a self-join AQE won't rebalance.
  */
object SkewUtils {

  /** Inner-join `big ⋈ small` on `key`, salting the big side's hot keys.
    *
    * The big side gets a random salt in [0, salts); the small side is
    * replicated `salts` times. The join key becomes (key, salt), so a hot
    * key's rows spread over `salts` reducers instead of one. Row-level
    * results are identical to a plain inner join.
    *
    * Cost model: small side grows ×salts — only salt when
    * |small| × salts ≪ shuffle size of the hot keys. For selective salting,
    * pre-split `big` on a hot-key list and union the two join plans.
    *
    * `seed` keeps the salt deterministic (stable bench plans) while
    * letting two salted joins composed in ONE plan use uncorrelated salt
    * streams — with a shared constant seed their spreads would correlate
    * and the second join's hot rows could re-collapse (r16 verdict #5).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N hottest keys of a column with their frequencies — the input to a
    * selective-salting or frequency-cap decision (same scan used by
    * Dedup.ngramJaccardPairs's maxShingleFreq lever).
    */
  def hotKeys(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col(key))
      .limit(topN)
}
