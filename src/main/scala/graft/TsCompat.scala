package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Physical-type compatibility for the `events.ts` column — THE single
  * place that knows every flavor the testdata has shipped it in:
  *
  *  - parquet TIMESTAMP(NANOS), which Spark (under
  *    `spark.sql.legacy.parquet.nanosAsLong=true`) surfaces as a LONG of
  *    epoch nanoseconds;
  *  - parquet TIMESTAMP(MICROS) without timezone → `TIMESTAMP_NTZ`
  *    (what the regenerated 2026-08 testdata ships);
  *  - a session-zoned `TIMESTAMP` (what a user's own table most likely
  *    holds).
  *
  * Every engine query and streaming path goes through these helpers, so a
  * driver-side regeneration that flips the physical type again cannot
  * break 20+ queries at once. All conversions floor to epoch millis
  * exactly like DuckDB's `epoch_ms`, keeping the oracle contract
  * ("timestamps compared as epoch millis") intact; the NTZ → TIMESTAMP
  * cast is a wall-clock reinterpretation, an identity under the engine's
  * fixed UTC session timezone.
  */
object TsCompat {

  /** Epoch-millis expression for a `ts` of physical type `t`. LONG nanos
    * are integer-divided (double division would lose precision past
    * 2^53) with an explicit FLOOR — Spark's `div` truncates toward zero,
    * which would put pre-epoch instants 1 ms above what `unix_millis`
    * (floorDiv) and DuckDB `epoch_ms` (floor) produce; the positive-mod
    * correction keeps all three flavors identical on any instant.
    * Timestamps floor through `unix_millis`.
    */
  def msExpr(t: DataType): Column = t match {
    case LongType =>
      expr("(ts - ((ts % 1000000) + 1000000) % 1000000) div 1000000")
    case TimestampType => unix_millis(col("ts"))
    case TimestampNTZType => unix_millis(col("ts").cast("timestamp"))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported physical type $other")
  }

  /** Epoch-millis Column for `df`'s `ts` column. */
  def msOf(df: DataFrame): Column = msExpr(df.schema("ts").dataType)

  /** Millisecond-precision event-time TIMESTAMP for watermarks/windows —
    * identical values whatever the source flavor, so streaming window
    * starts (and their DuckDB `epoch_ms - epoch_ms % len` oracles) are
    * physical-type-independent.
    */
  def eventTimeOf(df: DataFrame): Column = timestamp_millis(msOf(df))

  /** [[eventTimeOf]] from a known `ts` physical type — for streaming
    * readers, whose source schema is captured before the stream exists.
    */
  def eventTimeExpr(t: DataType): Column = timestamp_millis(msExpr(t))

  /** Epoch-nanos LONG (exact for the nanos-long flavor; micro-precision
    * ×1000 otherwise). For code that stores or offsets raw `ts` values.
    */
  def nanosOf(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => col("ts")
    case TimestampType => unix_micros(col("ts")) * lit(1000L)
    case TimestampNTZType => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported physical type $other")
  }

  /** `ts + n days`, staying in `ts`'s own physical type (for replica
    * builders that must write the source schema back out).
    */
  def plusDays(t: DataType, days: Long): Column = t match {
    case LongType => col("ts") + lit(days * 86400L * 1000000000L)
    case TimestampType | TimestampNTZType =>
      col("ts") + expr(s"INTERVAL $days DAYS")
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported physical type $other")
  }
}
