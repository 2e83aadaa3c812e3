package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two sort
  * dimensions so range predicates on EITHER dimension map to bounded
  * runs of the curve — the multi-dimensional clustering a lakehouse
  * table layout (and its file-level zone maps) uses for data skipping.
  * A plain sort by x gives files with tight x ranges but unbounded y
  * ranges; the z-sort bounds both, so min/max pruning works for both
  * predicate shapes.
  */
object ZOrder {

  /** The Morton z-value: low `bits` bits of `x` and `y` interleaved
    * (x even positions, y odd). Pure BIGINT bit arithmetic — the sum of
    * disjoint bit positions is the OR — evaluated engine-identically, so
    * layouts built on it are oracle-reproducible.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduceLeft(_ + _)
  }

  /** Lay `df` out in z-order across `files` equal-size files and report
    * each file's ZONE MAP: row count and per-dimension [min, max]. The
    * file assignment is the exact NTILE over (z, tieCols) — built on the
    * two-pass global index, the same distributed sort a real write of
    * `files` output files would do. Output: (file_id, n_rows, x_lo,
    * x_hi, y_lo, y_hi) ordered by file_id.
    */
  def zonemap(df: DataFrame, x: Column, y: Column, tieCols: Seq[Column],
              files: Int = 16, bits: Int = 16): DataFrame = {
    val mask = (1L << bits) - 1
    val base = df.select(
        (x.cast("long").bitwiseAND(lit(mask))).as("x") +:
        (y.cast("long").bitwiseAND(lit(mask))).as("y") +: tieCols: _*)
      .withColumn("z", zValue(col("x"), col("y"), bits))
    val sortCols = col("z") +: base.schema.names.filterNot(c =>
      c == "x" || c == "y" || c == "z").toSeq.map(col)
    Ranking.withNtile(base, files, sortCols: _*)
      .groupBy(col("bucket").as("file_id"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min("x").as("x_lo"), max("x").as("x_hi"),
        min("y").as("y_lo"), max("y").as("y_hi"))
      .orderBy("file_id")
  }
}
