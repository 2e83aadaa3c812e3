package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.AsOf
import SparkTestSession._

class AsOfSpec extends AnyFunSuite {
  import spark.implicits._

  test("backward as-of join carries the latest build row at or before each probe ts") {
    val probe = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 15L, "e3"),
      (1L, 25L, "e4"), (2L, 100L, "e5"))
      .toDF("k", "ts", "eid")
    val build = Seq((1L, 10L, 100L), (1L, 20L, 200L))
      .toDF("k", "ts", "v")
    val out = AsOf.joinBackward(probe, build, "k", "ts", Seq("v"))
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(out("e1").isEmpty)          // before any build row
    assert(out("e2").contains(100L))   // tie at ts=10 matches
    assert(out("e3").contains(100L))
    assert(out("e4").contains(200L))
    assert(out("e5").isEmpty)          // key 2 has no build rows
  }

  test("banded range self-join equals the naive quadratic join") {
    val rng = new scala.util.Random(11)
    val rows = (1L to 300L).map(i => (i, rng.nextLong(100000L)))
    val df = rows.toDF("event_id", "ms")
    val got = graft.pipeline.RangeJoin.selfWithin(df, "event_id", "ms", 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib && math.abs(ta - tb) <= 500L
    } yield (ia, ib)).toSet
    assert(got == naive)
  }

  test("a build row with a NULL field wins wholesale (no cross-row chimera)") {
    val probe = Seq((1L, 20L, "p")).toDF("k", "ts", "eid")
    val build = Seq((1L, 5L, Some(2L), Some(100L)), (1L, 10L, Some(5L), None))
      .toDF("k", "ts", "v1", "v2")
    val r = AsOf.joinBackward(probe, build, "k", "ts", Seq("v1", "v2")).collect()(0)
    assert(r.getLong(r.fieldIndex("v1")) == 5L)     // from the ts=10 row
    assert(r.isNullAt(r.fieldIndex("v2")))          // its NULL field, not ts=5's 100
  }

  test("value-column collision with probe columns is rejected") {
    val probe = Seq((1L, 1L, 2L)).toDF("k", "ts", "v")
    val build = Seq((1L, 1L, 3L)).toDF("k", "ts", "v")
    assertThrows[IllegalArgumentException] {
      AsOf.joinBackward(probe, build, "k", "ts", Seq("v"))
    }
  }
}
