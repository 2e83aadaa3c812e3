package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows whose numeric distance is within a
  * tolerance. Spark plans a raw `|a.x - b.x| <= tol` join as a
  * BroadcastNestedLoopJoin (quadratic); binning the axis turns it into an
  * equi-join: each left row maps to its bin AND the next bin, each right
  * row to its bin, so every qualifying pair shares exactly one bin key and
  * the shuffle is hash-partitioned like any other join. False candidates
  * within the bin are removed by the exact predicate afterwards.
  *
  * Bin width = tolerance; the left side lands in its bin ± 1, so whichever
  * row of a qualifying pair plays "left", it covers the other row's bin
  * (needed because the `id <` pair-ordering filter is independent of which
  * side owns the smaller timestamp). Work scales with true pair density,
  * not n².
  */
object RangeJoin {

  /** Self-join: pairs (a, b) with `a.idCol < b.idCol` and
    * `|a.tsCol - b.tsCol| <= tolerance`. Input columns: idCol, tsCol (+
    * ignored others). Output: (id_a, id_b, ts_a, ts_b).
    */
  def selfWithin(df: DataFrame, idCol: String, tsCol: String,
                 tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(tsCol).cast("long").as("ts"))
      .withColumn("bin0", expr(s"ts div $tolerance"))
    val left = base
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"), col("bin0") + 1)))
      .drop("bin0")
    val right = base
      .select(col("bin0").as("bin"), col("id").as("id_b"), col("ts").as("ts_b"))
    left.join(right, "bin")
      .filter(col("id") < col("id_b") &&
        abs(col("ts") - col("ts_b")) <= tolerance)
      .select(col("id").as("id_a"), col("id_b"),
        col("ts").as("ts_a"), col("ts_b"))
      .distinct() // adjacent-bin emission can duplicate a pair
      .orderBy("id_a", "id_b")
  }
}
