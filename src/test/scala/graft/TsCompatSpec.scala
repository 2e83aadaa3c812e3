package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import SparkTestSession._

/** The ts physical-flavor contract: every helper must produce IDENTICAL
  * values for the same instant shipped as LONG nanos (the pre-round-10
  * testdata under nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ (the
  * regenerated testdata) — the invariant that kept 23 queries alive when
  * the driver flipped the parquet type. Sub-ms precision floors, like
  * DuckDB's epoch_ms.
  */
class TsCompatSpec extends AnyFunSuite {
  import spark.implicits._

  // one instant with sub-millisecond detail: 2023-11-14T22:13:20.123456789
  private val nanos = 1700000000123456789L
  private val wantMs = 1700000000123L

  private lazy val asLong = Seq(nanos).toDF("ts")
  private lazy val asTimestamp = Seq(1).toDF("i")
    .select(expr(s"timestamp_micros(${nanos / 1000})").as("ts"))
  private lazy val asNtz = Seq(1).toDF("i")
    .select(expr(s"timestamp_micros(${nanos / 1000})").cast("timestamp_ntz").as("ts"))

  private def one(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Long =
    df.select(c.cast("long")).head.getLong(0)

  test("msOf floors the same epoch-ms from all three flavors") {
    for (df <- Seq(asLong, asTimestamp, asNtz))
      assert(one(df, TsCompat.msOf(df)) == wantMs,
        s"flavor ${df.schema("ts").dataType} diverged")
  }

  test("msOf FLOORS pre-epoch instants on every flavor (div truncation would round up)") {
    // 1.5 ms BEFORE epoch: floor is -2 ms. A truncating `ts div 1000000`
    // on the nanos flavor would give -1, diverging from unix_millis
    // (floorDiv) and DuckDB epoch_ms (floor) by one millisecond.
    val negNanos = -1500000L
    val negLong = Seq(negNanos).toDF("ts")
    val negTs = Seq(1).toDF("i")
      .select(expr(s"timestamp_micros(${negNanos / 1000})").as("ts"))
    val negNtz = Seq(1).toDF("i")
      .select(expr(s"timestamp_micros(${negNanos / 1000})").cast("timestamp_ntz").as("ts"))
    for (df <- Seq(negLong, negTs, negNtz))
      assert(one(df, TsCompat.msOf(df)) == -2L,
        s"flavor ${df.schema("ts").dataType} did not floor")
  }

  test("eventTimeOf yields the same ms-precision TIMESTAMP from all three flavors") {
    for (df <- Seq(asLong, asTimestamp, asNtz))
      assert(one(df, unix_millis(TsCompat.eventTimeOf(df))) == wantMs,
        s"flavor ${df.schema("ts").dataType} diverged")
  }

  test("nanosOf: exact on the nanos flavor, micro-truncated on timestamps") {
    assert(one(asLong, TsCompat.nanosOf(asLong)) == nanos)
    for (df <- Seq(asTimestamp, asNtz))
      assert(one(df, TsCompat.nanosOf(df)) == (nanos / 1000) * 1000,
        s"flavor ${df.schema("ts").dataType} diverged")
  }

  test("plusDays shifts identically (and stays in-flavor) across flavors") {
    val dayMs = 86400000L
    for (df <- Seq(asLong, asTimestamp, asNtz)) {
      val t = df.schema("ts").dataType
      val shifted = df.select(TsCompat.plusDays(t, 365L).cast(t).as("ts"))
      assert(shifted.schema("ts").dataType == t, "plusDays left its flavor")
      assert(one(shifted, TsCompat.msOf(shifted)) == wantMs + 365L * dayMs,
        s"flavor $t diverged")
    }
  }

  test("unsupported ts types fail loud, not wrong") {
    val bad = Seq("oops").toDF("ts")
    intercept[IllegalArgumentException](TsCompat.msOf(bad))
    intercept[IllegalArgumentException](TsCompat.nanosOf(bad))
    intercept[IllegalArgumentException](
      TsCompat.plusDays(bad.schema("ts").dataType, 1L))
  }
}
